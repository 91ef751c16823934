"""Boilerpipe-style densitometric block classification (Kohlschütter,
Fankhauser, Nejdl, WSDM 2010, "Boilerplate detection using shallow
text features" — public paper).

The paper's headline result: a 3-block window of SHALLOW features —
word count and link density of the previous, current, and next block
— classifies content vs boilerplate nearly as well as deep DOM
models. Its published decision tree (the classifier known as
``NumWordsRulesClassifier`` in the paper's reference implementation):

    curr.link_density > 1/3                      → boilerplate
    else if prev.link_density ≤ 0.555556:
        curr_words > 16                          → content
        else next_words > 15                     → content
        else prev_words > 4                      → content
        else                                     → boilerplate
    else (link-dense previous block):
        curr_words > 40                          → content
        else next_words > 17                     → content
        else                                     → boilerplate

This module runs that tree over the shared deterministic block stream
(``justext._block_arrays``) — the FIFTH independent tier signal next
to jusText (stopword densities), CETR (tag ratios), BTE (slope
curve), and the Readability DOM scores. Link densities are integer
ppm with floor division (thresholds 333333 / 555555 ppm compare
exactly the same as the paper's fractions for every rational density
our blocks can produce except exact 1/3, where the floor-ppm value
333333 > 1/3·10⁶ − 1 keeps the comparison faithful), so the result
hash-matches DuckDB bit-for-bit.

Scale shape: like the other signals — ONE zero-shuffle
``map_batches``; the prev/next window is a shifted-array lookup with
document-edge replication to an empty virtual block (0 words, 0
links), exactly the paper's document-boundary convention.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .justext import _SQL_BLOCKS_CTE, _block_arrays

CURR_LINK_PPM = 333_333  # curr link density > 1/3 → boilerplate
PREV_LINK_PPM = 555_555  # prev link density ≤ 0.555556 → low-link branch
CURR_WORDS_LO, NEXT_WORDS_LO, PREV_WORDS_LO = 16, 15, 4
CURR_WORDS_HI, NEXT_WORDS_HI = 40, 17


def boilerpipe_blocks(doc, nw, nl):
    """Vectorized decision tree over one batch's block stream: returns
    (link_ppm, content) int64 arrays. ``doc`` must have each
    document's blocks contiguous and in reading order; the window at
    document edges sees a virtual empty block."""
    link_ppm = nl * 1_000_000 // np.maximum(nw + nl, 1)

    first = np.r_[True, doc[1:] != doc[:-1]]
    last = np.r_[doc[1:] != doc[:-1], True]

    def shift_prev(a):
        out = np.empty_like(a)
        out[1:] = a[:-1]
        out[first] = 0  # virtual empty block before the document
        return out

    def shift_next(a):
        out = np.empty_like(a)
        out[:-1] = a[1:]
        out[last] = 0  # virtual empty block after the document
        return out

    prev_link = shift_prev(link_ppm)
    prev_words = shift_prev(nw)
    next_words = shift_next(nw)

    low_link_prev = prev_link <= PREV_LINK_PPM
    content = np.where(
        link_ppm > CURR_LINK_PPM,
        False,
        np.where(
            low_link_prev,
            (nw > CURR_WORDS_LO)
            | (next_words > NEXT_WORDS_LO)
            | (prev_words > PREV_WORDS_LO),
            (nw > CURR_WORDS_HI) | (next_words > NEXT_WORDS_HI),
        ),
    )
    return link_ppm, content.astype(np.int64)


def q_boilerpipe_blocks(sf_dir: str):
    """Per-block boilerpipe verdicts: the shallow window features and
    the decision-tree content flag."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, _, _ = _block_arrays(dids, texts)
        link_ppm, content = boilerpipe_blocks(doc, nw, nl)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "blk": pa.array(blk, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "link_ppm": pa.array(link_ppm, pa.int64()),
                "content": pa.array(content, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# CTE chain from the shared ``blocks`` stream to the per-block
# ``bpk(doc_id, blk, n_words, link_ppm, bp)`` verdict table —
# composable (tier_eval and block_signals reuse it verbatim).
_SQL_BP_CHAIN = f"""
feat2 AS (
    SELECT doc_id, blk, n_words,
           n_links * 1000000 // GREATEST(n_words + n_links, 1) AS link_ppm
    FROM blocks
),
win AS (
    SELECT *,
           COALESCE(LAG(link_ppm) OVER w, 0) AS prev_link,
           COALESCE(LAG(n_words) OVER w, 0) AS prev_words,
           COALESCE(LEAD(n_words) OVER w, 0) AS next_words
    FROM feat2 WINDOW w AS (PARTITION BY doc_id ORDER BY blk)
),
bpk AS (
    SELECT doc_id, blk, n_words, link_ppm,
           CAST(CASE
                WHEN link_ppm > {CURR_LINK_PPM} THEN FALSE
                WHEN prev_link <= {PREV_LINK_PPM}
                    THEN n_words > {CURR_WORDS_LO}
                         OR next_words > {NEXT_WORDS_LO}
                         OR prev_words > {PREV_WORDS_LO}
                ELSE n_words > {CURR_WORDS_HI} OR next_words > {NEXT_WORDS_HI}
            END AS BIGINT) AS bp
    FROM win
)"""

_SQL_BOILERPIPE = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_BP_CHAIN}
SELECT doc_id, blk, n_words, link_ppm, bp AS content FROM bpk
"""

QUERIES = {
    "boilerpipe_blocks": q_boilerpipe_blocks,
}
ORACLE_SQL = {
    "boilerpipe_blocks": _SQL_BOILERPIPE,
}
