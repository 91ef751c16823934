"""resolve_media_refs invariants: every ``media://`` span in the
flagship output resolves exactly once against the per-doc media
feature table, the parsed ref fields round-trip the constructors in
``core/schema.py``, and the attached features equal the decode stub's
derivations (north-star step 3: span sequences with media refs
resolved)."""

import hashlib

import pandas as pd
import pyarrow.parquet as pq

SF = "/root/testdata/sf0.001"


def test_resolve_media_refs_invariants(ray_session):
    from pdf_parser_ray.pipelines.extract import flagship
    from pdf_parser_ray.stages.media import q_resolve_media_refs

    spans = flagship(SF).to_pandas()
    media_spans = spans[spans.media_ref.str.startswith("media://")]
    got = q_resolve_media_refs(SF).to_pandas()

    # exactly one resolved row per media span — the join neither drops
    # (missing feature row) nor duplicates (non-unique feature side)
    assert len(got) == len(media_spans)
    assert got.media_ref.is_unique == media_spans.media_ref.is_unique

    # ref parse round-trips the make_*_ref constructors: checkbox refs
    # come from label spans, highlight refs from answer spans
    assert set(got.elem) == {"cb", "hl"}
    assert (got.loc[got.elem == "cb", "kind"] == "label").all()
    assert (got.loc[got.elem == "hl", "kind"] == "answer").all()
    assert (got.page >= 1).all()
    assert (got.elem_idx >= 0).all()

    # attached features equal the decode stub's text-derived values
    docs = pq.read_table(
        f"{SF}/documents.parquet", columns=["doc_id", "text"]
    ).to_pandas()
    docs = docs.set_index("doc_id")
    sample = got.drop_duplicates("doc_id").head(20)
    for row in sample.itertuples(index=False):
        text = docs.loc[row.doc_id, "text"]
        payload = (text or "").encode("utf-8")
        assert row.sha256 == hashlib.sha256(payload).hexdigest()
        assert row.width == len(payload) % 64 + 1
        assert row.height == len(payload) % 48 + 1
        want_type = "image" if row.doc_id % 3 else "audio"
        assert row.media_type == want_type
