"""jusText-style block classification with a context-propagation pass.

The north rule names "Readability/jusText-style block scoring" as the
HTML-side extraction heuristic. ``stages/boilerplate.py`` carries the
Readability half (candidate scoring, ``domheur.py``) and a simplified
two-rule block filter; this module implements the full jusText shape
(Pomikálek 2011, "Removing boilerplate and duplicate content from web
corpora", ch. 4 — public thesis):

1. **context-free classification** of each block from three features —
   link density, length, stopword density:
   ``bad``      if link_ppm > 333_333
   ``short``    elif n_words < SHORT_WORDS
   ``good``     elif stop_ppm >= GOOD_STOP_PPM (stopword-dense =
                natural language, the jusText core signal)
   ``neargood`` otherwise (long but stopword-poor)
2. **context pass**: ``good``/``bad`` are *hard* classes and final;
   a *soft* block (``short``/``neargood``) becomes ``good`` iff its
   nearest preceding OR nearest following hard neighbour within the
   document is ``good`` (document edges count as ``bad``), else
   ``bad``. This is the deterministic simplification of jusText's
   neighbour-vote rule, stated here as the spec both engine and
   oracle implement.

Densities are integer ppm (floor division) so the distributed result
hash-matches the DuckDB oracle bit-for-bit — the same exact-integer
discipline as the rest of the surface.

Sandbox corpus: each ``documents`` row becomes a deterministic page —
nav (5 links), a 3-word cookie banner (``short``), the text in
12-word body chunks (words only), a link-dense related box, a footer
(5 links). On the test corpus the thresholds are exercised in every
direction: ~17% of long body chunks are stopword-dense enough to be
context-free ``good``, the rest are ``neargood`` and flip to ``good``
or ``bad`` by neighbourhood, and the cookie banner resolves both ways
depending on whether the first body chunk is hard-``good``.

Scale shape: one zero-shuffle ``map_batches`` — block synthesis is a
per-document expansion, classification is numpy over the whole batch,
and the context pass is a grouped ffill/bfill that never leaves the
batch (a document's blocks are built contiguously). At 10^12 docs this
is embarrassingly parallel; no exchange, no driver state.
"""

from __future__ import annotations

import math

import numpy as np
import pandas as pd
import pyarrow as pa

#: classic stopword list (public jusText ships per-language lists; the
#: synthetic corpus draws from a SQL-ish vocabulary in which only
#: ``the``/``a`` occur, giving 0/1/2-per-chunk density variation)
STOPWORDS = ("the", "a", "of", "to", "and", "in", "is", "it", "for", "on")
_STOP = frozenset(STOPWORDS)

SHORT_WORDS = 5  # fewer words than this (and not link-dense) → short
BAD_LINK_PPM = 333_333  # link density above 1/3 → bad outright
GOOD_STOP_PPM = 150_000  # ≥2 stopwords per 12-word chunk → good
_CHUNK = 12  # body words per block (matches boilerplate._CHUNK)

_NAV_LINKS = 5
_COOKIE = "we use cookies"
_FOOTER_LINKS = 5

_CLS = np.array(["bad", "short", "neargood", "good"])
_BAD, _SHORT, _NEARGOOD, _GOOD = 0, 1, 2, 3


def _block_arrays(doc_ids, texts):
    """Deterministic block feature stream for a batch of documents:
    (doc, blk, n_words, n_links, n_stop, btext) with one document's
    blocks contiguous and in reading order. ``btext`` holds the
    block's *word* spans only (links are never content)."""
    o_doc: list[int] = []
    o_blk: list[int] = []
    o_nw: list[int] = []
    o_nl: list[int] = []
    o_ns: list[int] = []
    o_txt: list[str] = []

    def emit(d: int, b: int, nw: int, nl: int, ns: int, txt: str) -> None:
        o_doc.append(d)
        o_blk.append(b)
        o_nw.append(nw)
        o_nl.append(nl)
        o_ns.append(ns)
        o_txt.append(txt)

    cookie_stop = sum(w in _STOP for w in _COOKIE.split())
    for d, t in zip(doc_ids, texts):
        ws = (t or "").split()
        nb = math.ceil(len(ws) / _CHUNK)
        emit(d, 0, 0, _NAV_LINKS, 0, "")
        emit(d, 1, 3, 0, cookie_stop, _COOKIE)
        for i in range(nb):
            ch = ws[i * _CHUNK : (i + 1) * _CHUNK]
            emit(d, 2 + i, len(ch), 0, sum(w in _STOP for w in ch), " ".join(ch))
        emit(d, 2 + nb, 1, 3, 0, "ad")  # link-dense related box
        emit(d, 3 + nb, 0, _FOOTER_LINKS, 0, "")
    return (
        np.asarray(o_doc, np.int64),
        np.asarray(o_blk, np.int64),
        np.asarray(o_nw, np.int64),
        np.asarray(o_nl, np.int64),
        np.asarray(o_ns, np.int64),
        o_txt,
    )


def classify_blocks(doc, nw, nl, ns):
    """Vectorized jusText classification over one batch's block
    stream: returns (link_ppm, stop_ppm, cf, final) int64/int8 arrays.
    ``doc`` must have each document's blocks contiguous and ordered —
    the context pass ffill/bfills hard classes within each document."""
    tot = nw + nl
    link_ppm = nl * 1_000_000 // np.maximum(tot, 1)
    stop_ppm = np.where(nw > 0, ns * 1_000_000 // np.maximum(nw, 1), 0)
    cf = np.where(
        link_ppm > BAD_LINK_PPM,
        _BAD,
        np.where(
            nw < SHORT_WORDS,
            _SHORT,
            np.where(stop_ppm >= GOOD_STOP_PPM, _GOOD, _NEARGOOD),
        ),
    ).astype(np.int64)
    hard = (cf == _BAD) | (cf == _GOOD)
    s = pd.Series(np.where(hard, cf.astype(float), np.nan))
    g = pd.Series(doc)
    prev = s.groupby(g, sort=False).ffill().to_numpy()
    nxt = s[::-1].groupby(g[::-1], sort=False).ffill().to_numpy()[::-1]
    # NaN (no hard neighbour on that side) compares False → edge = bad
    soft_good = (prev == _GOOD) | (nxt == _GOOD)
    final = np.where(hard, cf, np.where(soft_good, _GOOD, _BAD))
    return link_ppm, stop_ppm, cf, final


def _blocks_table(batch: pa.Table) -> pa.Table:
    doc, blk, nw, nl, ns, txt = _block_arrays(
        batch["doc_id"].to_pylist(), batch["text"].to_pylist()
    )
    link_ppm, stop_ppm, cf, final = classify_blocks(doc, nw, nl, ns)
    return pa.table(
        {
            "doc_id": pa.array(doc, pa.int64()),
            "blk": pa.array(blk, pa.int64()),
            "n_words": pa.array(nw, pa.int64()),
            "n_links": pa.array(nl, pa.int64()),
            "n_stop": pa.array(ns, pa.int64()),
            "link_ppm": pa.array(link_ppm, pa.int64()),
            "stop_ppm": pa.array(stop_ppm, pa.int64()),
            "cls_cf": pa.array(_CLS[cf].tolist(), pa.string()),
            "cls": pa.array(_CLS[final].tolist(), pa.string()),
            "btext": pa.array(txt, pa.string()),
        }
    )


def q_justext_blocks(sf_dir: str):
    """Per-block jusText classification table: features, the
    context-free class, and the final class after the context pass."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    return ds.map_batches(_blocks_table, batch_format="pyarrow", batch_size=None)


def q_justext_strip(sf_dir: str):
    """Per-document content rollup: final-``good`` blocks' words
    joined in reading order, plus kept/total block counts. The rollup
    happens inside the same batch fn (a document never spans batches
    here), so the whole pipeline is still zero-shuffle."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        t = _blocks_table(batch)
        doc = t["doc_id"].to_numpy()
        good_mask = pc.equal(t["cls"], "good")
        good = np.asarray(good_mask.combine_chunks())
        starts = np.flatnonzero(np.r_[True, doc[1:] != doc[:-1]])
        ends = np.r_[starts[1:], len(doc)]
        n_good = np.add.reduceat(good.astype(np.int64), starts)
        # kept block texts, grouped per doc by an offsets list array;
        # binary_join of an empty sub-list yields '' (= the oracle's
        # COALESCE) — the whole rollup is Arrow kernels, no row loop
        kept = pc.filter(t["btext"], good_mask)
        if isinstance(kept, pa.ChunkedArray):
            kept = (
                pa.concat_arrays(kept.chunks)
                if kept.num_chunks
                else pa.array([], pa.string())
            )
        offsets = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(n_good, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "content_text": pc.binary_join(lists, " "),
                "n_good": pa.array(n_good, pa.int64()),
                "n_blocks": pa.array(ends - starts, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_STOP_SQL = "[" + ", ".join(f"'{w}'" for w in STOPWORDS) + "]"
_COOKIE_STOP = sum(w in _STOP for w in _COOKIE.split())

# SQL replay of the block synthesis + both classification passes.
_SQL_BLOCKS_CTE = f"""
w AS (
    SELECT doc_id, regexp_extract_all(text, '\\S+') AS words FROM documents
),
c AS (
    SELECT doc_id, words,
           CAST(ceil(len(words) / {_CHUNK}.0) AS BIGINT) AS nb
    FROM w
),
blocks AS (
    SELECT doc_id, CAST(0 AS BIGINT) AS blk, CAST(0 AS BIGINT) AS n_words,
           CAST({_NAV_LINKS} AS BIGINT) AS n_links, CAST(0 AS BIGINT) AS n_stop,
           '' AS btext
    FROM c
    UNION ALL
    SELECT doc_id, 1, 3, 0, {_COOKIE_STOP}, '{_COOKIE}' FROM c
    UNION ALL
    SELECT doc_id, 2 + CAST(i AS BIGINT),
           len(words[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}]),
           0,
           len(list_filter(words[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}],
                           x -> list_contains({_STOP_SQL}, x))),
           array_to_string(words[i*{_CHUNK}+1 : i*{_CHUNK}+{_CHUNK}], ' ')
    FROM c, LATERAL unnest(range(nb)) AS t(i)
    UNION ALL
    SELECT doc_id, 2 + nb, 1, 3, 0, 'ad' FROM c
    UNION ALL
    SELECT doc_id, 3 + nb, 0, {_FOOTER_LINKS}, 0, '' FROM c
),
feat AS (
    SELECT *,
           n_links * 1000000 // GREATEST(n_words + n_links, 1) AS link_ppm,
           CASE WHEN n_words > 0 THEN n_stop * 1000000 // n_words
                ELSE 0 END AS stop_ppm
    FROM blocks
),
cf AS (
    SELECT *,
           CASE WHEN link_ppm > {BAD_LINK_PPM} THEN 'bad'
                WHEN n_words < {SHORT_WORDS} THEN 'short'
                WHEN stop_ppm >= {GOOD_STOP_PPM} THEN 'good'
                ELSE 'neargood' END AS cls_cf
    FROM feat
),
ctx AS (
    SELECT *,
           COALESCE(LAST_VALUE(CASE WHEN cls_cf IN ('good','bad')
                                    THEN cls_cf END IGNORE NULLS)
                    OVER (PARTITION BY doc_id ORDER BY blk
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                    'bad') AS prev_hard,
           COALESCE(FIRST_VALUE(CASE WHEN cls_cf IN ('good','bad')
                                     THEN cls_cf END IGNORE NULLS)
                    OVER (PARTITION BY doc_id ORDER BY blk
                          ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING),
                    'bad') AS next_hard
    FROM cf
),
final AS (
    SELECT doc_id, blk, n_words, n_links, n_stop, link_ppm, stop_ppm, cls_cf,
           CASE WHEN cls_cf IN ('good','bad') THEN cls_cf
                WHEN prev_hard = 'good' OR next_hard = 'good' THEN 'good'
                ELSE 'bad' END AS cls,
           btext
    FROM ctx
)
"""

_SQL_JUSTEXT_BLOCKS = f"WITH {_SQL_BLOCKS_CTE} SELECT * FROM final"

_SQL_JUSTEXT_STRIP = f"""
WITH {_SQL_BLOCKS_CTE}
SELECT doc_id,
       COALESCE(string_agg(CASE WHEN cls = 'good' THEN btext END,
                           ' ' ORDER BY blk), '') AS content_text,
       CAST(SUM(CASE WHEN cls = 'good' THEN 1 ELSE 0 END) AS BIGINT) AS n_good,
       CAST(COUNT(*) AS BIGINT) AS n_blocks
FROM final
GROUP BY doc_id
"""

QUERIES = {
    "justext_blocks": q_justext_blocks,
    "justext_strip": q_justext_strip,
}
ORACLE_SQL = {
    "justext_blocks": _SQL_JUSTEXT_BLOCKS,
    "justext_strip": _SQL_JUSTEXT_STRIP,
}
