"""BTE-style body text extraction (Finn, Kushmerick, Smyth 2001,
"Fact or fiction: Content classification for digital libraries" —
public paper; the "document slope curve" algorithm).

BTE picks the single token interval ``[i, j]`` maximizing

    tags outside [i, j]  +  text tokens inside [i, j]

Since total tag count is a per-document constant T, the objective is
``T + Σ_{k∈[i,j]} (words_k − tags_k)`` — i.e. the MAXIMUM SUBARRAY of
the per-block score ``words − tags`` (Kadane's problem). That
reduction is what makes the operator vectorizable AND exactly
SQL-expressible: within-document prefix sums, a running prefix
minimum, and a deterministic argmax (greatest gain, then smallest end
block; the interval start is the first block attaining the running
minimum — provably unique, see ``bte_spans``).

The block stream is the same deterministic page synthesis the other
HTML tiers share (``stages/justext.py:_block_arrays``: nav header,
cookie banner, word chunks, ad box, footer), so BTE lands as the
FOURTH independent content signal next to jusText's stopword
densities, CETR's tag ratios, and the DOM Readability scores — on
real pages the four tiers vote through the cascade.

Scale shape: identical to the other tiers — ONE zero-shuffle
``map_batches``; every array step (cumsum, cummin, reduceat argmax)
is segment-local to a document and documents never leave their batch.
Output is one fixed-width row per document.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa

from .justext import _SQL_BLOCKS_CTE, _block_arrays


def bte_spans(doc, blk, nw, nl):
    """Vectorized BTE over one batch's block stream. Returns per-doc
    arrays (doc_out, start_blk, end_blk, bte_score, content_words).

    Tie rules (mirrored in SQL): the end block is the FIRST block
    attaining the maximal gain; the start block is the first block
    whose before-prefix equals the running minimum at the end block —
    an earlier block with an equal before-prefix cannot exist, because
    the running minimum is non-increasing and would already have
    attained that value there."""
    tags = 1 + nl  # one enclosing tag per block + one per link
    s = nw - tags
    first = np.r_[True, doc[1:] != doc[:-1]]
    starts = np.flatnonzero(first)
    seg_len = np.diff(np.append(starts, len(doc)))

    cs = np.cumsum(s)
    offs = np.repeat(np.r_[0, cs[starts[1:] - 1]], seg_len)
    csum = cs - offs  # within-doc inclusive prefix of s
    p_prev = csum - s  # prefix BEFORE each block (0 at doc start)
    m = pd.Series(p_prev).groupby(pd.Series(doc)).cummin().to_numpy()
    gain = csum - m  # best subarray sum ending at this block

    # per-doc first argmax of gain (pandas idxmax keeps the first)
    k = pd.Series(gain).groupby(pd.Series(doc)).idxmax().to_numpy()
    k.sort()  # restore batch order (groupby sorts by doc key)

    # first index where the running minimum attained its value
    newmin = first | (m != np.r_[m[:1], m[:-1]])
    fm = np.maximum.accumulate(np.where(newmin, np.arange(len(doc)), -1))
    st = fm[k]

    cw_all = np.cumsum(nw)
    cw_offs = np.repeat(np.r_[0, cw_all[starts[1:] - 1]], seg_len)
    cw = cw_all - cw_offs
    content_words = cw[k] - (cw[st] - nw[st])

    return doc[k], blk[st], blk[k], gain[k], content_words


def q_bte_spans(sf_dir: str):
    """Per-document BTE main-content interval: start/end block of the
    slope-curve optimum, its gain, and the word mass it captures."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, _, _ = _block_arrays(dids, texts)
        d, sb, eb, score, cwords = bte_spans(doc, blk, nw, nl)
        return pa.table(
            {
                "doc_id": pa.array(d, pa.int64()),
                "start_blk": pa.array(sb, pa.int64()),
                "end_blk": pa.array(eb, pa.int64()),
                "bte_score": pa.array(score, pa.int64()),
                "content_words": pa.array(cwords, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


# CTE chain from the shared ``blocks`` stream to the per-doc ``bte``
# interval table — composable (tier_agreement reuses it verbatim).
_SQL_BTE_CHAIN = """
s AS (
    SELECT doc_id, blk, n_words AS nw,
           CAST(n_words - (1 + n_links) AS BIGINT) AS sc
    FROM blocks
),
cum AS (
    SELECT *,
           SUM(sc) OVER w AS csum,
           SUM(nw) OVER w AS cw
    FROM s WINDOW w AS (PARTITION BY doc_id ORDER BY blk)
),
mm AS (
    SELECT *, csum - sc AS pprev,
           MIN(csum - sc) OVER (PARTITION BY doc_id ORDER BY blk) AS mn
    FROM cum
),
best AS (
    SELECT doc_id, blk AS end_blk, csum - mn AS bte_score,
           mn AS mstar, cw AS cw_end
    FROM (SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                       ORDER BY csum - mn DESC, blk ASC) AS rn
          FROM mm)
    WHERE rn = 1
),
st AS (
    SELECT b.doc_id, MIN(m2.blk) AS start_blk
    FROM best b
    JOIN mm m2 ON m2.doc_id = b.doc_id
              AND m2.blk <= b.end_blk AND m2.pprev = b.mstar
    GROUP BY b.doc_id
),
bte AS (
    SELECT b.doc_id, st.start_blk, b.end_blk,
           CAST(b.bte_score AS BIGINT) AS bte_score,
           CAST(b.cw_end - (c2.cw - c2.nw) AS BIGINT) AS content_words
    FROM best b
    JOIN st USING (doc_id)
    JOIN cum c2 ON c2.doc_id = b.doc_id AND c2.blk = st.start_blk
)"""

_SQL_BTE_SPANS = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_BTE_CHAIN}
SELECT * FROM bte
"""

QUERIES = {
    "bte_spans": q_bte_spans,
}
ORACLE_SQL = {
    "bte_spans": _SQL_BTE_SPANS,
}
