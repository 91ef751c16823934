"""CETR-style content extraction via tag ratios (Weninger, Hsu, Han,
WWW 2010 — public paper).

The published algorithm computes, per HTML line, the text-to-tag
ratio TTR = chars / max(tags, 1), smooths the ratio histogram, and
keeps lines whose smoothed ratio clears a corpus threshold (the paper
clusters; the standard deterministic simplification thresholds at the
document mean). This module implements that block-stream variant over
the same deterministic page synthesis the jusText tier uses
(``stages/justext.py:_block_arrays``) — a third, structure-free
signal next to jusText's stopword densities and Readability's DOM
scores:

* ``chars``      = length of the block's word text
* ``tags``       = 1 + n_links (each link is one anchor tag)
* ``ttr_micro``  = chars · 10⁶ // tags
* ``smooth``     = 3-tap mean ⌊(prev + cur + next) / 3⌋ within the
                   document (edges replicate the boundary block —
                   the paper's radius-1 moving average)
* ``keep``       = smooth ≥ ⌊Σ smooth / n_blocks⌋ (document-mean
                   threshold), the content mask.

All features are exact integers (floor division), so the distributed
result hash-matches the DuckDB twin (LAG/LEAD + windowed integer
mean) bit-for-bit.

Scale shape: identical to the other HTML tiers — ONE zero-shuffle
``map_batches``; the smoothing and the mean are per-document
(contiguous in the synthesized block stream), so nothing leaves the
batch and cost is linear in documents at any corpus size.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .justext import _SQL_BLOCKS_CTE, _block_arrays


def cetr_blocks(doc, chars, tags):
    """Vectorized CETR over one batch's block stream: returns
    (ttr_micro, smooth, keep) int64/bool arrays. ``doc`` must have
    each document's blocks contiguous and in reading order."""
    ttr = chars * 1_000_000 // np.maximum(tags, 1)
    first = np.r_[True, doc[1:] != doc[:-1]]
    last = np.r_[doc[1:] != doc[:-1], True]
    prev = np.empty_like(ttr)
    prev[1:] = ttr[:-1]
    prev[first] = ttr[first]  # edge replicates the boundary block
    nxt = np.empty_like(ttr)
    nxt[:-1] = ttr[1:]
    nxt[last] = ttr[last]
    smooth = (prev + ttr + nxt) // 3
    starts = np.flatnonzero(first)
    n_blocks = np.diff(np.append(starts, len(doc)))
    mean = np.add.reduceat(smooth, starts) // n_blocks
    keep = smooth >= np.repeat(mean, n_blocks)
    return ttr, smooth, keep


def q_cetr_blocks(sf_dir: str):
    """Per-block CETR table: tag-ratio features, the smoothed ratio,
    and the document-mean content mask."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, _, nl, _, txt = _block_arrays(dids, texts)
        chars = np.fromiter((len(t) for t in txt), dtype=np.int64, count=len(txt))
        tags = 1 + nl
        ttr, smooth, keep = cetr_blocks(doc, chars, tags)
        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "blk": pa.array(blk, pa.int64()),
                "chars": pa.array(chars, pa.int64()),
                "tags": pa.array(tags, pa.int64()),
                "ttr_micro": pa.array(ttr, pa.int64()),
                "smooth_micro": pa.array(smooth, pa.int64()),
                "keep": pa.array(keep.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_SQL_CETR_BLOCKS = f"""
WITH {_SQL_BLOCKS_CTE},
cetr AS (
    SELECT doc_id, blk,
           CAST(length(btext) AS BIGINT) AS chars,
           CAST(1 + n_links AS BIGINT) AS tags,
           CAST(length(btext) AS BIGINT) * 1000000
               // GREATEST(1 + n_links, 1) AS ttr_micro
    FROM blocks
),
sm AS (
    SELECT *,
           (COALESCE(LAG(ttr_micro) OVER w, ttr_micro)
            + ttr_micro
            + COALESCE(LEAD(ttr_micro) OVER w, ttr_micro)) // 3
               AS smooth_micro
    FROM cetr
    WINDOW w AS (PARTITION BY doc_id ORDER BY blk)
)
SELECT doc_id, blk, chars, tags, ttr_micro, smooth_micro,
       CAST(smooth_micro >=
            SUM(smooth_micro) OVER (PARTITION BY doc_id)
            // COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS keep
FROM sm
"""

QUERIES = {
    "cetr_blocks": q_cetr_blocks,
}
ORACLE_SQL = {
    "cetr_blocks": _SQL_CETR_BLOCKS,
}
