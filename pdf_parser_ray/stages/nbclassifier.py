"""Trained Naive Bayes content classifier over the block signals —
the train → broadcast → apply shape of a distributed ML pipeline,
with an EXACT integer oracle.

``block_signals`` (``stages/tiereval.py``) exports the per-block
feature/label matrix; this module actually trains on it: a
categorical Naive Bayes with Laplace smoothing over three discretized
shallow features (word-count bucket, link-density class, stopword-
density class), supervised by the construction gold mask —
CleanEval's classic learned-extractor setup (Spousta 2008 used richer
features; the NB-over-shallow-features baseline is standard).

Exactness: every score term is the integer-micro ln of an integer
(``textstats.lnm_micro`` / the shared-ln SQL device), so training
counts, per-class scores, and the argmax are bit-reproducible in
DuckDB — a TRAINED model whose train+apply pipeline is hash-exact
end to end, which k-means (rows-only centroids) cannot offer.

Decision rule (per block, class g ∈ {0, 1}, features f with value
v_f and vocabulary size V_f ∈ {7, 3, 3}):

    score_g = lnm(N_g) + Σ_f [ lnm(C_f[v_f, g] + 1) − lnm(N_g + V_f) ]
    predict 1 iff score_1 > score_0          (ties → 0, deterministic)

(The shared −lnm(N_total) prior denominator cancels and is dropped.)

Scale shape: pass 1 reduces the corpus to O(feature-vocabulary)
partial count rows per batch (≤ 26 keys total) — the model the driver
pulls is bounded by the schema, never the corpus. Pass 2 broadcasts
that model into a zero-shuffle classify map whose output is
pre-aggregated per batch to the 4-row confusion grain; one tiny
groupby folds the partials. Two corpus passes, no corpus-scale
exchange anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .justext import _GOOD  # noqa: F401  (documentational: gold ≠ jusText)
from .justext import _SQL_BLOCKS_CTE, _block_arrays, classify_blocks
from .textstats import _shared_ln_cte, lnm_micro

#: word-count bucket boundaries: bucket = #{b : n_words ≥ b}
WORD_BUCKETS = (1, 2, 4, 8, 16, 32)
V_WORDS = len(WORD_BUCKETS) + 1  # 7 values
V_LINK = 3  # 0: no links, 1: ≤ 1/3, 2: link-dense
V_STOP = 3  # 0: no stopwords, 1: < good threshold, 2: stopword-dense
LINK_MID_PPM = 333_333
STOP_MID_PPM = 150_000


def _features(nw, link_ppm, stop_ppm):
    """Discretize the shallow features — the single spelling shared by
    train and apply (and mirrored in SQL)."""
    wb = np.searchsorted(np.asarray(WORD_BUCKETS, np.int64), nw, side="right")
    lb = np.where(link_ppm == 0, 0, np.where(link_ppm <= LINK_MID_PPM, 1, 2))
    sb = np.where(stop_ppm == 0, 0, np.where(stop_ppm < STOP_MID_PPM, 1, 2))
    return wb.astype(np.int64), lb.astype(np.int64), sb.astype(np.int64)


def _block_features(batch: pa.Table):
    dids = batch["doc_id"].to_pylist()
    texts = batch["text"].to_pylist()
    doc, blk, nw, nl, ns, _ = _block_arrays(dids, texts)
    link_ppm, stop_ppm, _, _ = classify_blocks(doc, nw, nl, ns)
    first = np.r_[True, doc[1:] != doc[:-1]]
    starts = np.flatnonzero(first)
    seg_len = np.diff(np.append(starts, len(doc)))
    gold = ((blk >= 2) & (blk < np.repeat(seg_len - 2, seg_len))).astype(np.int64)
    wb, lb, sb = _features(nw, link_ppm, stop_ppm)
    return wb, lb, sb, gold


def train_nb(sf_dir: str):
    """Pass 1: corpus → per-batch partial counts → tiny groupby →
    model dict. The pulled grain is O(feature vocabulary): ≤ 26 rows
    regardless of corpus size."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def partials(batch: pa.Table) -> pa.Table:
        wb, lb, sb, gold = _block_features(batch)
        keys, cnts = [], []
        for fid, vals in ((0, wb), (1, lb), (2, sb)):
            for g in (0, 1):
                mask = gold == g
                bc = np.bincount(vals[mask], minlength=8)
                for v, c in enumerate(bc):
                    if c:
                        keys.append(fid * 100 + v * 10 + g)
                        cnts.append(int(c))
        return pa.table(
            {"key": pa.array(keys, pa.int64()), "cnt": pa.array(cnts, pa.int64())}
        )

    from ray.data.aggregate import Sum

    rows = (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby("key")
        .aggregate(Sum("cnt", alias_name="n"))
        .to_pandas()  # bounded: ≤ 26 rows (the model, not the corpus)
    )
    counts = dict(zip(rows["key"].tolist(), rows["n"].tolist()))
    n_class = {g: sum(v for k, v in counts.items() if k < 100 and k % 10 == g)
               for g in (0, 1)}
    return counts, n_class


def compile_model(sf_dir: str):
    """Train and compile the integer-micro score tables driver-side
    (the model is O(vocabulary); this is model compilation, not data
    movement). Returns (prior, score_tbl)."""
    counts, n_class = train_nb(sf_dir)
    vocab = {0: V_WORDS, 1: V_LINK, 2: V_STOP}
    prior = {g: lnm_micro(max(n_class[g], 1)) for g in (0, 1)}
    denom = {
        (fid, g): lnm_micro(max(n_class[g], 1) + vocab[fid])
        for fid in vocab
        for g in (0, 1)
    }
    like = {}
    for fid, v_f in vocab.items():
        for v in range(v_f):
            for g in (0, 1):
                c = counts.get(fid * 100 + v * 10 + g, 0)
                like[(fid, v, g)] = lnm_micro(c + 1) - denom[(fid, g)]
    score_tbl = {
        g: {
            fid: np.asarray([like[(fid, v, g)] for v in range(vocab[fid])], np.int64)
            for fid in vocab
        }
        for g in (0, 1)
    }
    return prior, score_tbl


def _nb_predict(prior, score_tbl, wb, lb, sb):
    scores = {}
    for g in (0, 1):
        t = score_tbl[g]
        scores[g] = prior[g] + t[0][wb] + t[1][lb] + t[2][sb]
    return (scores[1] > scores[0]).astype(np.int64)


def q_nb_content_eval(sf_dir: str):
    """Train on the corpus, classify every block with the broadcast
    model, and emit the corpus confusion matrix (pred, gold,
    n_blocks) — the end-to-end learned-extractor evaluation."""
    from ..io.sources import read_parquet_clean

    prior, score_tbl = compile_model(sf_dir)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def classify(batch: pa.Table) -> pa.Table:
        wb, lb, sb, gold = _block_features(batch)
        pred = _nb_predict(prior, score_tbl, wb, lb, sb)
        # pre-aggregate to the confusion grain inside the batch
        cell = pred * 2 + gold
        bc = np.bincount(cell, minlength=4)
        return pa.table(
            {
                "pred": pa.array([0, 0, 1, 1], pa.int64()),
                "gold": pa.array([0, 1, 0, 1], pa.int64()),
                "n_blocks": pa.array(bc.astype(np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(classify, batch_format="pyarrow", batch_size=None)
        .groupby(["pred", "gold"])
        .aggregate(Sum("n_blocks", alias_name="n"))
        .filter(expr="n > 0")
    )


def q_nb_content_strip(sf_dir: str):
    """The learned extractor EMITTING: per document, the text of the
    blocks the trained model keeps, joined in reading order (the
    ``justext_strip`` rollup shape with the NB verdict in place of
    the heuristic) plus kept/total counts. Same zero-shuffle classify
    pass; the rollup is Arrow kernels (filter → offsets ListArray →
    ``binary_join``), no row loop."""
    import pyarrow.compute as pc

    from ..io.sources import read_parquet_clean

    prior, score_tbl = compile_model(sf_dir)

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def strip(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        doc, blk, nw, nl, ns, txt = _block_arrays(dids, texts)
        link_ppm, stop_ppm, _, _ = classify_blocks(doc, nw, nl, ns)
        wb, lb, sb = _features(nw, link_ppm, stop_ppm)
        pred = _nb_predict(prior, score_tbl, wb, lb, sb).astype(bool)

        first = np.r_[True, doc[1:] != doc[:-1]]
        starts = np.flatnonzero(first)
        seg_len = np.diff(np.append(starts, len(doc)))
        n_kept = np.add.reduceat(pred.astype(np.int64), starts)
        kept = pc.filter(pa.array(txt, pa.string()), pa.array(pred))
        offsets = np.zeros(len(starts) + 1, dtype=np.int32)
        np.cumsum(n_kept, out=offsets[1:])
        lists = pa.ListArray.from_arrays(pa.array(offsets, pa.int32()), kept)
        return pa.table(
            {
                "doc_id": pa.array(doc[starts], pa.int64()),
                "content_text": pc.binary_join(lists, " "),
                "n_kept": pa.array(n_kept, pa.int64()),
                "n_blocks": pa.array(seg_len.astype(np.int64), pa.int64()),
            }
        )

    return ds.map_batches(strip, batch_format="pyarrow", batch_size=None)


def _lnm_sql(src: str) -> str:
    """lnm table over integer column v of ``src``: (v, lnm)."""
    return (
        f"SELECT v, CAST(FLOOR(lnk * CAST(1000000.0 AS DOUBLE)"
        f" + CAST(0.5 AS DOUBLE)) AS BIGINT) AS lnm"
        f" FROM {_shared_ln_cte(src, 'v')}"
    )


# CTE chain (composes after the shared blocks CTE) ending at
# ``predt(doc_id, blk, gold, pred)`` — shared by the confusion-matrix
# eval and the content-strip rollup.
_SQL_NB_CHAIN = f"""
sig AS (
    SELECT f.doc_id, f.blk,
           CASE WHEN f.n_words >= 32 THEN 6 WHEN f.n_words >= 16 THEN 5
                WHEN f.n_words >= 8 THEN 4 WHEN f.n_words >= 4 THEN 3
                WHEN f.n_words >= 2 THEN 2 WHEN f.n_words >= 1 THEN 1
                ELSE 0 END AS wb,
           CASE WHEN f.link_ppm = 0 THEN 0
                WHEN f.link_ppm <= {LINK_MID_PPM} THEN 1 ELSE 2 END AS lb,
           CASE WHEN f.stop_ppm = 0 THEN 0
                WHEN f.stop_ppm < {STOP_MID_PPM} THEN 1 ELSE 2 END AS sb,
           CAST(f.blk >= 2 AND f.blk < (c.nb + 2) AS BIGINT) AS g
    FROM final f JOIN c ON c.doc_id = f.doc_id
),
nclass AS (SELECT g, COUNT(*) AS n FROM sig GROUP BY g),
fv AS (
    SELECT 0 AS fid, wb AS v, g, COUNT(*) AS c FROM sig GROUP BY wb, g
    UNION ALL SELECT 1, lb, g, COUNT(*) FROM sig GROUP BY lb, g
    UNION ALL SELECT 2, sb, g, COUNT(*) FROM sig GROUP BY sb, g
),
-- every (fid, value, class) cell, zero-filled, Laplace +1
grid AS (
    SELECT f.fid, t.v, cl.g,
           COALESCE(fv.c, 0) + 1 AS cp1,
           nc.n AS ng,
           nc.n + f.vf AS ngv
    FROM (VALUES (0, {V_WORDS}), (1, {V_LINK}), (2, {V_STOP})) AS f(fid, vf)
    CROSS JOIN (SELECT unnest(range(7)) AS v) t
    CROSS JOIN (VALUES (0), (1)) AS cl(g)
    JOIN nclass nc ON nc.g = cl.g
    LEFT JOIN fv ON fv.fid = f.fid AND fv.v = t.v AND fv.g = cl.g
    WHERE t.v < f.vf
),
nums AS (
    SELECT DISTINCT v FROM (
        SELECT cp1 AS v FROM grid
        UNION SELECT ngv FROM grid
        UNION SELECT GREATEST(n, 1) FROM nclass
    )
),
lns AS ({_lnm_sql('nums')}),
-- integer-micro likelihood table and class priors
liket AS (
    SELECT g2.fid, g2.v, g2.g,
           l1.lnm - l2.lnm AS lk
    FROM grid g2
    JOIN lns l1 ON l1.v = g2.cp1
    JOIN lns l2 ON l2.v = g2.ngv
),
priort AS (
    SELECT nc.g, l.lnm AS pr FROM nclass nc JOIN lns l ON l.v = GREATEST(nc.n, 1)
),
scored AS (
    SELECT s.doc_id, s.blk, s.g AS gold, p.g AS cls,
           p.pr + lw.lk + ll.lk + ls.lk AS score
    FROM sig s
    CROSS JOIN priort p
    JOIN liket lw ON lw.fid = 0 AND lw.v = s.wb AND lw.g = p.g
    JOIN liket ll ON ll.fid = 1 AND ll.v = s.lb AND ll.g = p.g
    JOIN liket ls ON ls.fid = 2 AND ls.v = s.sb AND ls.g = p.g
),
predt AS (
    SELECT doc_id, blk, gold,
           CAST(MAX(CASE WHEN cls = 1 THEN score END)
                > MAX(CASE WHEN cls = 0 THEN score END) AS BIGINT) AS pred
    FROM scored GROUP BY doc_id, blk, gold
)"""

_SQL_NB_EVAL = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_NB_CHAIN}
SELECT pred, gold, CAST(COUNT(*) AS BIGINT) AS n
FROM predt GROUP BY pred, gold
HAVING COUNT(*) > 0
"""

_SQL_NB_STRIP = f"""
WITH {_SQL_BLOCKS_CTE}, {_SQL_NB_CHAIN}
SELECT p.doc_id,
       COALESCE(string_agg(CASE WHEN p.pred = 1 THEN f.btext END,
                           ' ' ORDER BY p.blk), '') AS content_text,
       CAST(SUM(p.pred) AS BIGINT) AS n_kept,
       CAST(COUNT(*) AS BIGINT) AS n_blocks
FROM predt p JOIN final f ON f.doc_id = p.doc_id AND f.blk = p.blk
GROUP BY p.doc_id
"""

QUERIES = {
    "nb_content_eval": q_nb_content_eval,
    "nb_content_strip": q_nb_content_strip,
}
ORACLE_SQL = {
    "nb_content_eval": _SQL_NB_EVAL,
    "nb_content_strip": _SQL_NB_STRIP,
}
