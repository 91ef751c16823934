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


_KAPPA_PAIRS = (
    ("justext", "cetr"),
    ("justext", "bte"),
    ("justext", "boilerpipe"),
    ("cetr", "bte"),
    ("cetr", "boilerpipe"),
    ("bte", "boilerpipe"),
)


def q_tier_kappa(sf_dir: str):
    """Cohen's kappa between every pair of the four block classifiers
    (jusText, CETR, BTE, boilerpipe) at corpus grain — chance-corrected
    inter-annotator agreement, the statistic extraction papers report
    when raw agreement is inflated by the majority class (most blocks
    are chrome, so two tiers that both say "drop everything" agree 80%
    by chance alone). ``tier_agreement`` gives per-document Jaccard of
    the kept sets; this gives the corpus-level chance-corrected scalar
    per pair — the number that actually ranks which tiers are
    redundant vs complementary in the cascade.

    Exactness: kappa = (pₒ − pₑ)/(1 − pₑ) is a ratio of integers from
    the 2×2 confusion sums — ``kappa_num = n·(n11+n00) − a1·b1 −
    a0·b0`` over ``kappa_den = n² − a1·b1 − a0·b0``. kappa can be
    NEGATIVE and Python floors negative division while DuckDB
    truncates, so the surface is division-free: the exact
    (kappa_num, kappa_den) pair ships verbatim (consumer divides),
    plus the nonnegative raw ``agree_ppm``.

    Scale shape: all four signals in ONE zero-shuffle map pass over
    the shared block synthesis; each batch folds to SIX fixed-width
    partial rows (one per pair) → one tiny ``groupby(pair)`` Sum →
    bignum read-off on 6 rows."""
    import pandas as pd
    from ray.data.aggregate import Sum

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

        _, _, _, final = classify_blocks(doc, nw, nl, ns)
        jt = final == _GOOD
        chars = np.fromiter((len(t) for t in txt), dtype=np.int64, count=len(txt))
        _, _, ce = cetr_blocks(doc, chars, 1 + nl)
        _, sb, eb, _, _ = bte_spans(doc, blk, nw, nl)
        bt = (blk >= np.repeat(sb, seg_len)) & (blk <= np.repeat(eb, seg_len))
        _, bp = _bp(doc, nw, nl)
        sig = {"justext": jt, "cetr": ce, "bte": bt, "boilerpipe": bp.astype(bool)}

        rows = {"pair": [], "n": [], "n11": [], "n00": [], "a1": [], "b1": []}
        for a, b in _KAPPA_PAIRS:
            sa, sb_ = sig[a], sig[b]
            rows["pair"].append(f"{a}|{b}")
            rows["n"].append(len(sa))
            rows["n11"].append(int((sa & sb_).sum()))
            rows["n00"].append(int((~sa & ~sb_).sum()))
            rows["a1"].append(int(sa.sum()))
            rows["b1"].append(int(sb_.sum()))
        return pa.table(
            {
                "pair": pa.array(rows["pair"], pa.string()),
                **{
                    c: pa.array(np.asarray(rows[c], dtype=np.int64), pa.int64())
                    for c in ("n", "n11", "n00", "a1", "b1")
                },
            }
        )

    g = (
        ds.map_batches(fn, batch_format="pyarrow", batch_size=None)
        .groupby("pair")
        .aggregate(*[Sum(c, alias_name=c) for c in ("n", "n11", "n00", "a1", "b1")])
        .to_pandas()  # exactly 6 rows
    )
    out = {"pair": [], "n_blocks": [], "agree_ppm": [], "kappa_num": [], "kappa_den": []}
    for _, r in g.iterrows():
        n, n11, n00 = int(r["n"]), int(r["n11"]), int(r["n00"])
        a1, b1 = int(r["a1"]), int(r["b1"])
        chance = a1 * b1 + (n - a1) * (n - b1)
        out["pair"].append(str(r["pair"]))
        out["n_blocks"].append(n)
        out["agree_ppm"].append((n11 + n00) * 1_000_000 // n if n else 0)
        out["kappa_num"].append(n * (n11 + n00) - chance)
        out["kappa_den"].append(n * n - chance)
    return pd.DataFrame(
        {
            "pair": out["pair"],
            **{
                c: pd.Series(out[c], dtype=np.int64)
                for c in ("n_blocks", "agree_ppm", "kappa_num", "kappa_den")
            },
        }
    )


_SQL_TIER_KAPPA = f"""
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
sig AS (
    SELECT f.doc_id, f.blk,
           CAST(f.cls = 'good' AS BIGINT) AS jt,
           ck.ce AS ce,
           CAST(f.blk BETWEEN b.start_blk AND b.end_blk AS BIGINT) AS bt,
           k.bp AS bp
    FROM final f
    JOIN cek ck ON ck.doc_id = f.doc_id AND ck.blk = f.blk
    JOIN bte b ON b.doc_id = f.doc_id
    JOIN bpk k ON k.doc_id = f.doc_id AND k.blk = f.blk
),
long_form AS (
    SELECT 'justext|cetr' AS pair, jt AS a, ce AS b FROM sig
    UNION ALL SELECT 'justext|bte', jt, bt FROM sig
    UNION ALL SELECT 'justext|boilerpipe', jt, bp FROM sig
    UNION ALL SELECT 'cetr|bte', ce, bt FROM sig
    UNION ALL SELECT 'cetr|boilerpipe', ce, bp FROM sig
    UNION ALL SELECT 'bte|boilerpipe', bt, bp FROM sig
),
conf AS (
    SELECT pair, CAST(COUNT(*) AS HUGEINT) AS n,
           CAST(SUM(a * b) AS HUGEINT) AS n11,
           CAST(SUM((1 - a) * (1 - b)) AS HUGEINT) AS n00,
           CAST(SUM(a) AS HUGEINT) AS a1,
           CAST(SUM(b) AS HUGEINT) AS b1
    FROM long_form GROUP BY pair
)
SELECT pair,
       CAST(n AS BIGINT) AS n_blocks,
       CAST(CASE WHEN n > 0 THEN (n11 + n00) * 1000000 // n ELSE 0 END
            AS BIGINT) AS agree_ppm,
       CAST(n*(n11 + n00) - (a1*b1 + (n - a1)*(n - b1)) AS BIGINT)
           AS kappa_num,
       CAST(n*n - (a1*b1 + (n - a1)*(n - b1)) AS BIGINT) AS kappa_den
FROM conf
"""


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
    "tier_kappa": q_tier_kappa,
}
ORACLE_SQL = {
    "tier_eval": _SQL_TIER_EVAL,
    "block_signals": _SQL_BLOCK_SIGNALS,
    "tier_kappa": _SQL_TIER_KAPPA,
}
