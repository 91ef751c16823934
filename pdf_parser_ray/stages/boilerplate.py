"""HTML boilerplate stripping via text-density + link-density block
scoring (Readability/jusText-style — north-star component 1).

The tokenizer turns an HTML-ish document into blocks of ``word`` /
``link`` spans; the classifier keeps blocks whose link density and
length mark them as content and drops navigation/footer chrome. Both
steps are pure per-document batch transforms.

Sandbox corpus: each ``documents`` row is wrapped into a deterministic
page — nav header (all links), the text as content blocks, a
link-dense "related articles" box, and a footer — so the stripped
output must equal the whitespace-normalized original text. That gives
this operator a *real* SQL oracle: the classifier must drop exactly
the injected chrome and keep every content block.

Classifier rule (jusText-inspired, simplified to be deterministic):
a block is boilerplate iff ``link_density > 0.33`` or it contains
links and fewer than 5 words; all-text blocks are content.
"""

from __future__ import annotations

import pyarrow as pa

_NAV = ["Home", "About", "Contact", "Login", "Register"]
_RELATED = ["Related", "articles:", "Top", "stories", "Trending", "now"]
_FOOTER = ["Privacy", "Policy", "Terms", "Copyright", "2024"]
_CHUNK = 12


def html_tokenize(doc_id: int, text: str) -> list[dict]:
    """Deterministic HTML-ish span stream for one document: nav links,
    content word blocks (12 words per block), a link-dense related box,
    footer links. ``block`` groups spans; kind ∈ {word, link}."""
    spans = []
    block = 0

    def emit_block(words: list[str], kind: str) -> None:
        nonlocal block
        block += 1
        for w in words:
            spans.append({"block": block, "kind": kind, "text": w})

    emit_block(_NAV, "link")
    words = (text or "").split()
    for i in range(0, len(words), _CHUNK):
        emit_block(words[i : i + _CHUNK], "word")
    # link-dense box: links + one stray word (link_density 6/7 > 0.33)
    emit_block(_RELATED[:3], "link")
    spans.append({"block": block, "kind": "word", "text": "ad"})
    emit_block(_FOOTER, "link")
    return spans


def score_blocks(spans: list[dict]) -> list[dict]:
    """Per-block text/link densities (the jusText-style features)."""
    blocks: dict[int, dict] = {}
    for s in spans:
        b = blocks.setdefault(
            s["block"], {"block": s["block"], "n_words": 0, "n_links": 0, "words": []}
        )
        if s["kind"] == "link":
            b["n_links"] += 1
        else:
            b["n_words"] += 1
            b["words"].append(s["text"])
    out = []
    for b in sorted(blocks.values(), key=lambda x: x["block"]):
        total = b["n_words"] + b["n_links"]
        b["link_density"] = b["n_links"] / total if total else 0.0
        out.append(b)
    return out


def strip_boilerplate(spans: list[dict]) -> str:
    """Keep content blocks, join their words in order."""
    kept: list[str] = []
    for b in score_blocks(spans):
        if b["link_density"] > 0.33:
            continue
        if b["n_links"] > 0 and b["n_words"] < 5:
            continue
        kept.extend(b["words"])
    return " ".join(kept)


def q_boilerplate_strip(sf_dir: str):
    """documents → HTML-ish span stream → block scoring → content
    text. Oracle: content must equal the whitespace-normalized source
    text (the injected chrome — nav/related/footer — must all go)."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        content = [strip_boilerplate(html_tokenize(i, t)) for i, t in zip(ids, texts)]
        return pa.table(
            {"doc_id": pa.array(ids, pa.int64()), "content_text": pa.array(content, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_SQL_BOILERPLATE = r"""
SELECT doc_id,
       array_to_string(regexp_extract_all(text, '\S+'), ' ') AS content_text
FROM documents
"""

QUERIES = {"boilerplate_strip": q_boilerplate_strip}
ORACLE_SQL = {"boilerplate_strip": _SQL_BOILERPLATE}
