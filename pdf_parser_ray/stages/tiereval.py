"""Extraction-quality evaluation: per-tier precision / recall against
the ground-truth content mask.

The synthesized page structure (``justext._block_arrays``) KNOWS which
blocks are content by construction: the body chunks (``blk`` in
``[2, 2 + nb)``) are the document text; nav header, cookie banner, ad
box and footer are chrome. That gives every tier signal — jusText
classes, CETR tag ratios, the BTE slope-curve interval — an exact
gold standard, so this operator emits the numbers an extraction paper
reports: per document and per tier, the confusion counts (tp / fp /
fn) and integer-micro precision / recall / F1. Corpus rollups of
these columns are the evidence for choosing cascade tiers and
thresholds (``stages/cascade.py``), closing the loop that
``tier_agreement`` opens (agreement says where tiers differ; this
says which one is RIGHT).

F1 is computed as ``2·tp·10⁶ // (2·tp + fp + fn)`` — one exact
integer division, no floating point, no chained rounding.

Scale shape: all three signals and the gold mask come out of the SAME
zero-shuffle ``map_batches`` pass (the corpus is read once); each
document contributes three fixed-width rows (one per tier). The SQL
twin composes the tiers' published CTEs against the same gold rule.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .boilerpipe import _SQL_BP_CHAIN
from .bte import _SQL_BTE_CHAIN, bte_spans
from .cetr import cetr_blocks
from .justext import _GOOD, _SQL_BLOCKS_CTE, _block_arrays, classify_blocks

#: "vote" is the block-grain majority ensemble over the jusText /
#: CETR / BTE trio (keep iff ≥2 keep it) — the standard multi-
#: heuristic combination, scored so "should we vote or pick one
#: tier?" is a measured decision: on the sandbox corpus the vote
#: beats BTE and jusText but CETR alone edges it (jusText's low
#: precision drags the majority), which is exactly the kind of fact
#: a cascade design needs before routing. "boilerpipe" (the fifth
#: signal, ``stages/boilerpipe.py``) is scored alongside but kept out
#: of the vote so the trio ensemble's number stays comparable across
#: rounds.
TIERS = ("justext", "cetr", "bte", "vote", "boilerpipe")


def q_tier_eval(sf_dir: str):
    """Per-document, per-tier confusion counts and exact-micro
    precision / recall / F1 against the construction gold mask."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, ns, txt = _block_arrays(dids, texts)

        first = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(doc)))

        # gold: body chunks only — blocks 2 .. n_blocks-3 (the stream
        # is nav, cookie, chunks..., ad, footer)
        gold = (blk >= 2) & (blk < np.repeat(seg_len - 2, seg_len))

        _, _, _, final = classify_blocks(doc, nw, nl, ns)
        jt = final == _GOOD
        chars = np.fromiter((len(t) for t in txt), dtype=np.int64, count=len(txt))
        _, _, ce = cetr_blocks(doc, chars, 1 + nl)
        _, sb, eb, _, _ = bte_spans(doc, blk, nw, nl)
        bt = (blk >= np.repeat(sb, seg_len)) & (blk <= np.repeat(eb, seg_len))

        def cnt(mask):
            return np.add.reduceat(mask.astype(np.int64), starts)

        vote = (jt.astype(np.int64) + ce.astype(np.int64) + bt.astype(np.int64)) >= 2
        from .boilerpipe import boilerpipe_blocks as _bp

        _, bp = _bp(doc, nw, nl)
        bp = bp.astype(bool)

        n_docs = len(starts)
        out_doc = np.tile(doc[starts], len(TIERS))
        out_tier, out_tp, out_fp, out_fn = [], [], [], []
        for tier, pred in zip(TIERS, (jt, ce, bt, vote, bp)):
            out_tier.extend([tier] * n_docs)
            out_tp.append(cnt(pred & gold))
            out_fp.append(cnt(pred & ~gold))
            out_fn.append(cnt(~pred & gold))
        tp = np.concatenate(out_tp)
        fp = np.concatenate(out_fp)
        fn_ = np.concatenate(out_fn)
        prec = np.where(tp + fp > 0, tp * 1_000_000 // np.maximum(tp + fp, 1), 0)
        rec = np.where(tp + fn_ > 0, tp * 1_000_000 // np.maximum(tp + fn_, 1), 0)
        denom = 2 * tp + fp + fn_
        f1 = np.where(denom > 0, 2 * tp * 1_000_000 // np.maximum(denom, 1), 0)
        return pa.table(
            {
                "doc_id": pa.array(out_doc, pa.int64()),
                "tier": pa.array(out_tier, pa.string()),
                "tp": pa.array(tp, pa.int64()),
                "fp": pa.array(fp, pa.int64()),
                "fn": pa.array(fn_, pa.int64()),
                "precision_micro": pa.array(prec, pa.int64()),
                "recall_micro": pa.array(rec, pa.int64()),
                "f1_micro": pa.array(f1, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def q_block_signals(sf_dir: str):
    """Per-block feature/label matrix: shallow features (word count,
    link ppm, stopword ppm), all four heuristic verdicts, and the
    construction gold label — the training table a LEARNED content
    classifier consumes (the CleanEval setup: fit on heuristic
    features, supervise on gold). Same single zero-shuffle pass as
    the scoreboards; one fixed-width row per block."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        from .boilerpipe import boilerpipe_blocks as _bp

        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, ns, txt = _block_arrays(dids, texts)

        first = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(doc)))
        gold = (blk >= 2) & (blk < np.repeat(seg_len - 2, seg_len))

        link_ppm, stop_ppm, _, final = classify_blocks(doc, nw, nl, ns)
        jt = final == _GOOD
        chars = np.fromiter((len(t) for t in txt), dtype=np.int64, count=len(txt))
        _, _, ce = cetr_blocks(doc, chars, 1 + nl)
        _, sb, eb, _, _ = bte_spans(doc, blk, nw, nl)
        bt = (blk >= np.repeat(sb, seg_len)) & (blk <= np.repeat(eb, seg_len))
        _, bp = _bp(doc, nw, nl)

        return pa.table(
            {
                "doc_id": pa.array(doc, pa.int64()),
                "blk": pa.array(blk, pa.int64()),
                "n_words": pa.array(nw, pa.int64()),
                "link_ppm": pa.array(link_ppm, pa.int64()),
                "stop_ppm": pa.array(stop_ppm, pa.int64()),
                "jt": pa.array(jt.astype(np.int64), pa.int64()),
                "ce": pa.array(ce.astype(np.int64), pa.int64()),
                "bt": pa.array(bt.astype(np.int64), pa.int64()),
                "bp": pa.array(bp, pa.int64()),
                "gold": pa.array(gold.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_SQL_BLOCK_SIGNALS = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_BTE_CHAIN}, {_SQL_BP_CHAIN},
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
)
SELECT f.doc_id, f.blk,
       CAST(f.n_words AS BIGINT) AS n_words,
       CAST(f.link_ppm AS BIGINT) AS link_ppm,
       CAST(f.stop_ppm AS BIGINT) AS stop_ppm,
       CAST(f.cls = 'good' AS BIGINT) AS jt,
       ck.ce AS ce,
       CAST(f.blk BETWEEN b.start_blk AND b.end_blk AS BIGINT) AS bt,
       k.bp AS bp,
       CAST(f.blk >= 2 AND f.blk < (c.nb + 2) AS BIGINT) AS gold
FROM final f
JOIN c ON c.doc_id = f.doc_id
JOIN cek ck ON ck.doc_id = f.doc_id AND ck.blk = f.blk
JOIN bte b ON b.doc_id = f.doc_id
JOIN bpk k ON k.doc_id = f.doc_id AND k.blk = f.blk
"""


_SQL_TIER_EVAL = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_BTE_CHAIN}, {_SQL_BP_CHAIN},
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
gold AS (
    SELECT f.doc_id, f.blk,
           CAST(f.blk >= 2 AND f.blk < (c.nb + 2) AS BIGINT) AS g,
           CAST(f.cls = 'good' AS BIGINT) AS jt,
           ck.ce AS ce,
           CAST(f.blk BETWEEN b.start_blk AND b.end_blk AS BIGINT) AS bt,
           k.bp AS bp
    FROM final f
    JOIN c ON c.doc_id = f.doc_id
    JOIN cek ck ON ck.doc_id = f.doc_id AND ck.blk = f.blk
    JOIN bte b ON b.doc_id = f.doc_id
    JOIN bpk k ON k.doc_id = f.doc_id AND k.blk = f.blk
),
long_form AS (
    SELECT doc_id, 'justext' AS tier, jt AS pred, g FROM gold
    UNION ALL
    SELECT doc_id, 'cetr', ce, g FROM gold
    UNION ALL
    SELECT doc_id, 'bte', bt, g FROM gold
    UNION ALL
    SELECT doc_id, 'vote', CAST(jt + ce + bt >= 2 AS BIGINT), g FROM gold
    UNION ALL
    SELECT doc_id, 'boilerpipe', bp, g FROM gold
),
conf AS (
    SELECT doc_id, tier,
           CAST(SUM(pred * g) AS BIGINT) AS tp,
           CAST(SUM(pred * (1 - g)) AS BIGINT) AS fp,
           CAST(SUM((1 - pred) * g) AS BIGINT) AS fn
    FROM long_form GROUP BY doc_id, tier
)
SELECT doc_id, tier, tp, fp, fn,
       CASE WHEN tp + fp > 0 THEN tp * 1000000 // (tp + fp) ELSE 0 END
           AS precision_micro,
       CASE WHEN tp + fn > 0 THEN tp * 1000000 // (tp + fn) ELSE 0 END
           AS recall_micro,
       CASE WHEN 2 * tp + fp + fn > 0
            THEN 2 * tp * 1000000 // (2 * tp + fp + fn) ELSE 0 END
           AS f1_micro
FROM conf
"""

QUERIES = {
    "tier_eval": q_tier_eval,
    "block_signals": q_block_signals,
}
ORACLE_SQL = {
    "tier_eval": _SQL_TIER_EVAL,
    "block_signals": _SQL_BLOCK_SIGNALS,
}
