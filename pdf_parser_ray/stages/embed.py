"""Similarity search over the ``embeddings`` table: brute-force cosine
top-k (the correctness baseline) and an LSH/IVF-bucketed variant (the
scale path).

Brute force is a numpy matmul per batch against a broadcast query
matrix — exactly the "small side broadcast, big side streams" shape:
queries ride to every task once; the embedding table streams through
``map_batches`` in Arrow batches and never materializes.

Math note: vectors are float32 on disk; all scores are computed in
float64 and emitted as integer micro-units (``round(cos*1e6)``) on
both the Ray and SQL sides — no float ever reaches the driver's
value hash, so the DuckDB oracles compare exactly.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

_TOP_K = 10
_N_QUERIES = 8  # vec_id 0..7 are the query set


def _embeddings(sf_dir: str):
    from ..io.sources import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    import pyarrow.parquet as pq
    import pyarrow.compute as pc

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    t = t.filter(pc.less(t["vec_id"], _N_QUERIES))
    ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    order = np.argsort(ids)
    return ids[order], mat[order]


def _batch_scores(batch: pa.Table, qmat: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
    vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
    qn = qmat / np.maximum(np.linalg.norm(qmat, axis=1, keepdims=True), 1e-30)
    return vn @ qn.T, vecs  # (n_batch, n_queries)


def q_ann_topk(sf_dir: str):
    """Brute-force cosine top-k for query vec_id 0: per-batch local
    top-k (numpy argpartition) → tiny global re-rank. The shuffle
    carries only k rows per block."""
    qids, qmat = _query_matrix(sf_dir)
    q0 = qmat[0:1]

    def local_topk(batch: pa.Table) -> pa.Table:
        scores, _ = _batch_scores(batch, q0)
        s = scores[:, 0]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = ids != 0
        s, ids = s[mask], ids[mask]
        # Round to micro-units BEFORE local selection and break ties by
        # vec_id, so local pruning uses exactly the global/oracle order
        # (unrounded floats could prune a row the oracle keeps when two
        # scores round to the same cos_micro at the k-th boundary).
        s_micro = np.rint(s * 1e6).astype(np.int64)
        if len(s_micro) > _TOP_K:
            order = np.lexsort((ids, -s_micro))[:_TOP_K]
            s_micro, ids = s_micro[order], ids[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_micro": pa.array(s_micro),
            }
        )

    ds = _embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow", batch_size=8192)
    return ds.sort(["cos_micro", "vec_id"], descending=[True, False]).limit(_TOP_K)


# Scores travel as integer micro-units (round(cos*1e6)) so no float
# ever reaches the driver's value hash.
_SQL_ANN_TOPK = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         CAST(q.qe AS DOUBLE[])) * 1000000) AS BIGINT) AS cos_micro
FROM embeddings e, q
WHERE e.vec_id <> 0
ORDER BY cos_micro DESC, e.vec_id
LIMIT {_TOP_K}
"""


def q_knn_join(sf_dir: str, k: int = 5):
    """k-NN join: top-k neighbors for each of the first 8 vectors —
    one matmul per batch against the broadcast query matrix, local
    top-k per query, then a per-query global re-rank (map_groups)."""
    import pandas as pd

    qids, qmat = _query_matrix(sf_dir)

    def local_topk(batch: pa.Table) -> pa.Table:
        scores, _ = _batch_scores(batch, qmat)  # (n, nq)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        out_q, out_n, out_s = [], [], []
        for qi, qid in enumerate(qids):
            s = scores[:, qi]
            mask = ids != qid
            sm, im = s[mask], ids[mask]
            # micro-units + vec_id tie-break before pruning (oracle order)
            sm_micro = np.rint(sm * 1e6).astype(np.int64)
            if len(sm_micro) > k:
                order = np.lexsort((im, -sm_micro))[:k]
                sm_micro, im = sm_micro[order], im[order]
            out_q.extend([int(qid)] * len(im))
            out_n.extend(im.tolist())
            out_s.extend(sm_micro.tolist())
        return pa.table(
            {
                "query_id": pa.array(out_q, pa.int64()),
                "neighbor_id": pa.array(out_n, pa.int64()),
                "cos_micro": pa.array(out_s, pa.int64()),
            }
        )

    def rerank(g: pd.DataFrame) -> pd.DataFrame:
        g = g.sort_values(["cos_micro", "neighbor_id"], ascending=[False, True]).head(k)
        return g[["query_id", "neighbor_id", "cos_micro"]]

    ds = _embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow", batch_size=8192)
    return ds.groupby("query_id").map_groups(rerank, batch_format="pandas")


_SQL_KNN_JOIN = f"""
SELECT q.vec_id AS query_id, n.neighbor_id, n.cos_micro
FROM embeddings q, LATERAL (
    SELECT e.vec_id AS neighbor_id,
           CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                             CAST(q.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cos_micro
    FROM embeddings e
    WHERE e.vec_id <> q.vec_id
    ORDER BY cos_micro DESC, e.vec_id
    LIMIT 5
) n
WHERE q.vec_id < {_N_QUERIES}
"""


def q_ann_ivf(sf_dir: str, n_probe: int = 8, n_cells: int = 16):
    """IVF-style ANN: assign every vector to its nearest of 16
    deterministic random-projection centroids (seeded, no training
    pass); at query time probe the ``n_probe`` nearest cells only.
    Returns top-10 for query 0 with the cells probed — the scale path
    where brute force is the baseline. Rows-only check; the unit test
    asserts recall vs the brute-force baseline."""
    rng = np.random.RandomState(7)
    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    centroids = rng.randn(n_cells, dim)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    q0 = qmat[0] / np.linalg.norm(qmat[0])
    probe_cells = set(np.argsort(-(centroids @ q0))[:n_probe].tolist())

    def local(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cells = np.argmax(vn @ centroids.T, axis=1)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        mask = np.isin(cells, list(probe_cells)) & (ids != 0)
        s = vn[mask] @ q0
        ids = ids[mask]
        s_micro = np.rint(s * 1e6).astype(np.int64)
        if len(s_micro) > _TOP_K:
            order = np.lexsort((ids, -s_micro))[:_TOP_K]
            s_micro, ids = s_micro[order], ids[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_micro": pa.array(s_micro),
            }
        )

    ds = _embeddings(sf_dir).map_batches(local, batch_format="pyarrow", batch_size=8192)
    return ds.sort(["cos_micro", "vec_id"], descending=[True, False]).limit(_TOP_K)


def q_embed_near_dup(sf_dir: str, threshold: float = 0.4):
    """Embedding-cosine near-dup pairs: every (a, b) with a < b and
    cosine ≥ threshold. The full normalized matrix is broadcast (1 MB
    here) and each streaming batch does one matmul against it — the
    embedding-space member of the dedup family. At corpus scale the
    broadcast side becomes LSH/IVF buckets (see :func:`q_ann_ivf`) so
    only same-bucket pairs are scored; the per-batch matmul shape is
    unchanged."""
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])
    all_ids = t["vec_id"].to_numpy(zero_copy_only=False)
    mat = np.stack(t["embedding"].to_pylist()).astype(np.float64)
    all_n = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        sims = vn @ all_n.T  # (batch, N)
        hit_r, hit_c = np.where(sims >= threshold)
        a = ids[hit_r]
        b = all_ids[hit_c]
        keep = a < b
        return pa.table(
            {
                "vec_a": pa.array(a[keep], pa.int64()),
                "vec_b": pa.array(b[keep], pa.int64()),
                "cos_micro": pa.array(
                    np.rint(sims[hit_r, hit_c][keep] * 1e6).astype(np.int64)
                ),
            }
        )

    return _embeddings(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=4096)


_SQL_EMBED_NEAR_DUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cos_micro
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


QUERIES = {
    "ann_topk": q_ann_topk,
    "knn_join": q_knn_join,
    "ann_ivf": q_ann_ivf,
    "embed_near_dup": q_embed_near_dup,
}

ORACLE_SQL = {
    "ann_topk": _SQL_ANN_TOPK,
    "knn_join": _SQL_KNN_JOIN,
    "embed_near_dup": _SQL_EMBED_NEAR_DUP,
    # ann_ivf: approximate by design — rows-only; recall asserted in tests
}
