"""Tier-agreement analysis: how much do the three independent
block-level content signals — jusText classes (Pomikálek 2011), CETR
tag ratios (Weninger 2010), and the BTE slope-curve interval (Finn
2001) — agree on what the main content IS?

Real extraction pipelines run several heuristics and vote (the
cascade in ``stages/cascade.py`` routes between tiers); this operator
is the measurement behind that design choice: per document it emits
each tier's kept-block count, the pairwise Jaccard overlap of the
kept sets (exact integer micro units), and the three-way
intersection. Low agreement flags documents where tier choice
matters; corpus-level rollups of these columns are the calibration
evidence for cascade thresholds.

Scale shape: the best one — all THREE signals compute in the SAME
zero-shuffle ``map_batches`` pass over the shared block synthesis
(``justext._block_arrays``), so the corpus is read once, nothing is
joined, and each document contributes one fixed-width output row.
The SQL twin composes the three tiers' published CTEs and must join
them on (doc_id, blk); the engine gets the join for free because the
signals are columns over one in-memory block stream.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .bte import _SQL_BTE_CHAIN, bte_spans
from .cetr import cetr_blocks
from .justext import _GOOD, _SQL_BLOCKS_CTE, _block_arrays, classify_blocks


def q_tier_agreement(sf_dir: str):
    """Per-document agreement table over the three tier signals:
    kept-block counts, pairwise Jaccard (micro), and the unanimous
    intersection size."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, ns, txt = _block_arrays(dids, texts)

        _, _, _, final = classify_blocks(doc, nw, nl, ns)
        jt = final == _GOOD

        chars = np.fromiter((len(t) for t in txt), dtype=np.int64, count=len(txt))
        _, _, ce = cetr_blocks(doc, chars, 1 + nl)

        _, sb, eb, _, _ = bte_spans(doc, blk, nw, nl)
        first = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(doc)))
        bt = (blk >= np.repeat(sb, seg_len)) & (blk <= np.repeat(eb, seg_len))

        def cnt(mask):
            return np.add.reduceat(mask.astype(np.int64), starts)

        def jac(a, b):
            inter = cnt(a & b)
            union = cnt(a | b)
            return np.where(union > 0, inter * 1_000_000 // np.maximum(union, 1), 0)

        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "n_blocks": pa.array(seg_len.astype(np.int64), pa.int64()),
                "jt_keep": pa.array(cnt(jt), pa.int64()),
                "ce_keep": pa.array(cnt(ce), pa.int64()),
                "bte_keep": pa.array(cnt(bt), pa.int64()),
                "jac_jt_ce_micro": pa.array(jac(jt, ce), pa.int64()),
                "jac_jt_bte_micro": pa.array(jac(jt, bt), pa.int64()),
                "jac_ce_bte_micro": pa.array(jac(ce, bt), pa.int64()),
                "all3_keep": pa.array(cnt(jt & ce & bt), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _jac_sql(a: str, b: str) -> str:
    return (
        f"CASE WHEN SUM(CAST({a} = 1 OR {b} = 1 AS BIGINT)) > 0 "
        f"THEN CAST(SUM({a} * {b}) AS BIGINT) * 1000000 "
        f"// CAST(SUM(CAST({a} = 1 OR {b} = 1 AS BIGINT)) AS BIGINT) "
        f"ELSE 0 END"
    )


_SQL_TIER_AGREEMENT = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_BTE_CHAIN},
cetr AS (
    SELECT doc_id, blk,
           CAST(length(btext) AS BIGINT) * 1000000
               // GREATEST(1 + n_links, 1) AS ttr
    FROM blocks
),
smo AS (
    SELECT *,
           (COALESCE(LAG(ttr) OVER w, ttr) + ttr
            + COALESCE(LEAD(ttr) OVER w, ttr)) // 3 AS smooth
    FROM cetr WINDOW w AS (PARTITION BY doc_id ORDER BY blk)
),
cek AS (
    SELECT doc_id, blk,
           CAST(smooth >= SUM(smooth) OVER (PARTITION BY doc_id)
                // COUNT(*) OVER (PARTITION BY doc_id) AS BIGINT) AS ce
    FROM smo
),
sig AS (
    SELECT f.doc_id, f.blk,
           CAST(f.cls = 'good' AS BIGINT) AS jt,
           ck.ce AS ce,
           CAST(f.blk BETWEEN b.start_blk AND b.end_blk AS BIGINT) AS bt
    FROM final f
    JOIN cek ck ON ck.doc_id = f.doc_id AND ck.blk = f.blk
    JOIN bte b ON b.doc_id = f.doc_id
)
SELECT doc_id,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(SUM(jt) AS BIGINT) AS jt_keep,
       CAST(SUM(ce) AS BIGINT) AS ce_keep,
       CAST(SUM(bt) AS BIGINT) AS bte_keep,
       {_jac_sql('jt', 'ce')} AS jac_jt_ce_micro,
       {_jac_sql('jt', 'bt')} AS jac_jt_bte_micro,
       {_jac_sql('ce', 'bt')} AS jac_ce_bte_micro,
       CAST(SUM(jt * ce * bt) AS BIGINT) AS all3_keep
FROM sig
GROUP BY doc_id
"""

QUERIES = {
    "tier_agreement": q_tier_agreement,
}
ORACLE_SQL = {
    "tier_agreement": _SQL_TIER_AGREEMENT,
}
