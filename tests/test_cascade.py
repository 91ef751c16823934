"""Unit pins for the tiered extraction cascade (stages/cascade.py):
routing correctness against hand-assembled tier signals and on-corpus
tier variety so the gates provably fire in every direction."""

import numpy as np
import pyarrow as pa
import pytest

from pdf_parser_ray.stages.cascade import (
    DOM_MIN_SCORE,
    JX_MIN_WORDS,
    _cascade_table,
)


def test_routing_against_recomputed_signals():
    """The cascade's routing must agree with the component tiers
    recomputed independently: dom iff the Readability winner clears
    DOM_MIN_SCORE, else justext iff good words >= JX_MIN_WORDS,
    else raw with the full word count."""
    from pdf_parser_ray.stages.domheur import _cand_scores, _synth_dom, _winners
    from pdf_parser_ray.stages.justext import _GOOD, _block_arrays, classify_blocks

    doc_ids = np.arange(1, 41, dtype=np.int64)
    texts = [
        " ".join(("the kernel maps a block of" if i % 3 else "alpha beta").split()
                 * (i % 5 + 1))
        for i in range(40)
    ]
    out = _cascade_table(pa.table({"doc_id": doc_ids, "text": texts})).to_pandas()

    doc, cand, _, w, l = _synth_dom(doc_ids)
    _, gdoc, gcand, final, gw, _, _ = _cand_scores(doc, cand, w, l)
    win = _winners(gdoc, gcand, final)
    best = np.zeros(40, np.int64)
    kept = np.zeros(40, np.int64)
    best[gdoc[win]] = final[win]
    kept[gdoc[win]] = gw[win]

    jdoc, _, nw, nl, ns, _ = _block_arrays(doc_ids.tolist(), texts)
    _, _, _, jfinal = classify_blocks(jdoc, nw, nl, ns)
    bounds = np.flatnonzero(np.r_[True, jdoc[1:] != jdoc[:-1]])
    good = np.add.reduceat(np.where(jfinal == _GOOD, nw, 0), bounds)

    for i in range(40):
        row = out.iloc[i]
        if best[i] >= DOM_MIN_SCORE:
            assert row["tier"] == "dom"
            assert row["content_words"] == kept[i]
            assert row["tier_score"] == best[i]
        elif good[i] >= JX_MIN_WORDS:
            assert row["tier"] == "justext"
            assert row["content_words"] == good[i] == row["tier_score"]
        else:
            assert row["tier"] == "raw"
            assert row["content_words"] == len(texts[i].split())
            assert row["tier_score"] == 0


def test_empty_batch_schema():
    out = _cascade_table(
        pa.table(
            {
                "doc_id": pa.array([], pa.int64()),
                "text": pa.array([], pa.string()),
            }
        )
    )
    assert out.num_rows == 0
    assert out.column_names == ["doc_id", "tier", "content_words", "tier_score"]


def test_spans_consistent_with_routing():
    """cascade_spans must agree with extract_cascade on every doc:
    span kind == routed tier, and the spans' word mass sums to the
    routed content_words (dom kept_words is the winner's FULL word
    mass, which is exactly its paragraph words summed)."""
    from pdf_parser_ray.stages.cascade import _cascade_spans_table

    doc_ids = np.arange(100, 160, dtype=np.int64)
    texts = [
        " ".join("the quick brown fox of a kind".split() * (i % 7 + 1))
        for i in range(60)
    ]
    batch = pa.table({"doc_id": doc_ids, "text": texts})
    route = _cascade_table(batch).to_pandas().set_index("doc_id")
    spans = _cascade_spans_table(batch).to_pandas()

    assert set(spans["doc_id"]) == set(doc_ids)
    per_doc = spans.groupby("doc_id").agg(
        kinds=("kind", "nunique"),
        kind=("kind", "first"),
        words=("n_words", "sum"),
    )
    assert (per_doc["kinds"] == 1).all()  # one tier per document
    for d, row in per_doc.iterrows():
        assert row["kind"] == route.loc[d, "tier"]
        assert row["words"] == route.loc[d, "content_words"]


@pytest.mark.usefixtures("ray_session")
def test_corpus_exercises_every_tier():
    """On the sf0.001 corpus every tier wins somewhere — the gates are
    calibrated (DOM_MIN_SCORE at the synthesis median), not vacuous."""
    from pdf_parser_ray.stages.cascade import q_extract_cascade

    df = q_extract_cascade("/root/testdata/sf0.001").to_pandas()
    assert set(df["tier"]) == {"dom", "justext", "raw"}
    assert (df.loc[df["tier"] == "raw", "tier_score"] == 0).all()
    assert (df.loc[df["tier"] != "raw", "content_words"] > 0).all()


def test_routing_rollup_consistent_with_cascade(ray_session):
    """The per-source rollup must re-aggregate exactly from the
    per-document cascade output joined to labels — shared pass, so
    drift between them is a fold bug. Shares sum to 1e6 ± rounding
    per source."""
    import duckdb

    from pdf_parser_ray.stages.cascade import (
        q_cascade_routing_by_source,
        q_extract_cascade,
    )

    sf = "/root/testdata/sf0.001"
    got = q_cascade_routing_by_source(sf)
    casc = q_extract_cascade(sf).to_pandas()
    labels = (
        duckdb.connect()
        .execute(f"SELECT doc_id, source FROM read_parquet('{sf}/documents.parquet')")
        .df()
    )
    want = (
        casc.merge(labels, on="doc_id")
        .groupby(["source", "tier"])
        .agg(n_docs=("doc_id", "size"), sum_content_words=("content_words", "sum"))
        .reset_index()
    )
    m = got.merge(want, on=["source", "tier"], suffixes=("", "_want"))
    assert len(m) == len(got) == len(want)
    assert (m["n_docs"] == m["n_docs_want"]).all()
    assert (m["sum_content_words"] == m["sum_content_words_want"]).all()
    for _, sub in got.groupby("source"):
        assert abs(int(sub["share_ppm"].sum()) - 1_000_000) < len(sub) + 1
