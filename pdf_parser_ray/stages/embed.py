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
import pyarrow.compute as pc

_TOP_K = 10
_N_QUERIES = 8  # vec_id 0..7 are the query set


def _embeddings(sf_dir: str):
    from ..io.sources import read_parquet_clean

    return read_parquet_clean(f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding"])


def _query_matrix(sf_dir: str) -> tuple[np.ndarray, np.ndarray]:
    """Read ONLY the 8 query vectors onto the driver.

    ``filters=`` pushes the predicate into the parquet scan: row groups
    whose vec_id statistics exclude [0, _N_QUERIES) are never decoded
    (and never leave storage), so driver memory is O(queries), not
    O(table) — at a 100-TB embedding table the old full-table read was
    the last driver-OOM path in the repo (round-2 verdict item 1)."""
    import pyarrow.parquet as pq

    t = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", _N_QUERIES)],
    )
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

    ds = _embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow", batch_size=None)
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


def q_ann_topk_filtered(sf_dir: str, label: int = 3):
    """FILTERED vector search — brute-force cosine top-k restricted to
    vectors carrying a metadata predicate (``label = 3`` stands in for
    the lang/source/license filters a retrieval stack applies). This
    is pre-filtering: the predicate applies INSIDE the scan before
    scoring (`label` is a read column, so parquet row-group statistics
    prune at storage when the table is label-clustered), which keeps
    top-k exact under the filter — post-filtering an unfiltered ANN
    result can return < k survivors. Same broadcast-query /
    streaming-table shape and integer micro-unit scoring as
    :func:`q_ann_topk`."""
    qids, qmat = _query_matrix(sf_dir)
    q0 = qmat[0:1]

    def local_topk(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        keep = (labels == label) & (ids != 0)
        batch = batch.filter(pa.array(keep))
        if batch.num_rows == 0:
            return pa.table(
                {
                    "vec_id": pa.array([], pa.int64()),
                    "cos_micro": pa.array([], pa.int64()),
                }
            )
        scores, _ = _batch_scores(batch, q0)
        s_micro = np.rint(scores[:, 0] * 1e6).astype(np.int64)
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        if len(s_micro) > _TOP_K:
            order = np.lexsort((ids, -s_micro))[:_TOP_K]
            s_micro, ids = s_micro[order], ids[order]
        return pa.table(
            {
                "vec_id": pa.array(ids, pa.int64()),
                "cos_micro": pa.array(s_micro, pa.int64()),
            }
        )

    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "embedding", "label"]
    )
    ds = ds.map_batches(local_topk, batch_format="pyarrow", batch_size=None)
    return ds.sort(["cos_micro", "vec_id"], descending=[True, False]).limit(_TOP_K)


_SQL_ANN_TOPK_FILTERED = f"""
WITH q AS (SELECT embedding AS qe FROM embeddings WHERE vec_id = 0)
SELECT e.vec_id,
       CAST(ROUND(list_cosine_similarity(CAST(e.embedding AS DOUBLE[]),
                                         CAST(q.qe AS DOUBLE[])) * 1000000) AS BIGINT) AS cos_micro
FROM embeddings e, q
WHERE e.vec_id <> 0 AND e.label = 3
ORDER BY cos_micro DESC, e.vec_id
LIMIT {_TOP_K}
"""


def q_label_centroids(sf_dir: str):
    """Grouped VECTOR aggregation — the per-class centroid table (the
    reduce step of k-means, exposed as its own operator for class
    prototypes / nearest-centroid classification). Element sums travel
    as integer micro-units so the distributed accumulation is
    order-independent and hash-exact against SQL: each batch emits
    per-(label, dim) partial sums — O(labels × dim) rows per block, a
    few KB regardless of batch size — and one ``groupby([label, dim])
    .Sum`` merges them. The long (label, dim, sum, n) layout IS the
    exchange format; a consumer pivots its ≤ labels×dim rows back to
    matrices for free."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["label", "embedding"]
    )

    def partials(batch: pa.Table) -> pa.Table:
        labels = batch["label"].to_numpy(zero_copy_only=False).astype(np.int64)
        raw = np.stack(batch["embedding"].to_pylist()).astype(np.float64) * 1e6
        # half-AWAY-FROM-ZERO to match DuckDB ROUND: unlike the cosine
        # scores (where exact .5 micro-boundaries are unreachable),
        # raw stored float32 components CAN be odd multiples of 2⁻ᵏ
        # whose ×1e6 lands exactly on .5 — np.rint's banker's rounding
        # would diverge from the oracle there.
        vecs = (np.sign(raw) * np.floor(np.abs(raw) + 0.5)).astype(np.int64)
        uniq = np.unique(labels)
        dim = vecs.shape[1]
        out_l, out_d, out_s, out_n = [], [], [], []
        for lb in uniq:
            sel = vecs[labels == lb]
            out_l.extend([int(lb)] * dim)
            out_d.extend(range(dim))
            out_s.extend(sel.sum(axis=0).tolist())
            out_n.extend([len(sel)] * dim)
        return pa.table(
            {
                "label": pa.array(out_l, pa.int64()),
                "dim": pa.array(out_d, pa.int64()),
                "sum_micro": pa.array(out_s, pa.int64()),
                "n": pa.array(out_n, pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    return (
        ds.map_batches(partials, batch_format="pyarrow", batch_size=None)
        .groupby(["label", "dim"])
        .aggregate(Sum("sum_micro", alias_name="sum_micro"), Sum("n", alias_name="n"))
    )


_SQL_LABEL_CENTROIDS = """
WITH ex AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           UNNEST(embedding) AS e
    FROM embeddings
)
SELECT label,
       CAST(dim AS BIGINT) AS dim,
       CAST(SUM(CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT)) AS BIGINT) AS sum_micro,
       CAST(count(*) AS BIGINT) AS n
FROM ex GROUP BY 1, 2
"""




def q_label_centroid_affinity(sf_dir: str):
    """Pairwise geometry of the per-label centroids — for every label
    pair, the exact integer ingredients of the centroid cosine:
    ``(dot_num, sq_a, sq_b)`` plus ``cos2_sign_ppm =
    sign(dot)·(dot²·10⁶ // (sq_a·sq_b))`` (signed squared cosine in
    ppm — division-free up to one final snap, no square root). The
    embedding-space drift monitor a curation pipeline runs between
    class prototypes: collapsing affinity (cos² → 1) means two
    labels' populations are merging, the vector-space counterpart of
    :func:`~pdf_parser_ray.stages.textstats.q_source_js_divergence`.

    Exactness: consumes :func:`q_label_centroids`' long-format
    exchange (micro-snapped element sums — already order-free), snaps
    each centroid element ONCE with truncating division
    ``c = sign(s)·(|s| // n)`` (DuckDB ``//`` truncates; the spec
    says so explicitly), and all pair arithmetic is exact Python int
    on the ≤ labels×dim driver grain. Envelope: |c| ≤ 10⁶·|x|ₘₐₓ, so
    dot² ≲ (dim·10¹²·|x|²)² — HUGEINT-safe for unit-scale embeddings
    at any corpus size (the magnitudes are data-scale-free).

    Shape: ONE ``groupby(label, dim)`` exchange (inherited) and a
    label-bounded driver fold — pairs are O(labels²), the same grain
    class as the JSD matrix."""
    import pandas as pd

    long = q_label_centroids(sf_dir).to_pandas()  # ≤ labels × dim rows

    def tdiv(a: int, b: int) -> int:
        return abs(a) // b * (1 if a >= 0 else -1)

    cents: dict[int, list[int]] = {}
    counts: dict[int, int] = {}
    for lb, grp in long.groupby("label"):
        g = grp.sort_values("dim")
        n = int(g["n"].iloc[0])
        counts[int(lb)] = n
        cents[int(lb)] = [tdiv(int(s), n) for s in g["sum_micro"]]
    labels = sorted(cents)
    rows = []
    for i, a in enumerate(labels):
        for b in labels[i + 1 :]:
            ca, cb = cents[a], cents[b]
            dot = sum(x * y for x, y in zip(ca, cb))
            sa = sum(x * x for x in ca)
            sb = sum(y * y for y in cb)
            if sa and sb:
                c2 = (dot * dot * 1_000_000) // (sa * sb)
                c2 = c2 if dot >= 0 else -c2
            else:
                c2 = 0
            rows.append((a, b, counts[a], counts[b], dot, sa, sb, c2))
    return pd.DataFrame(
        rows,
        columns=[
            "label_a", "label_b", "n_a", "n_b",
            "dot_num", "sq_a", "sq_b", "cos2_sign_ppm",
        ],
    ).astype(np.int64)


_SQL_LABEL_CENTROID_AFFINITY = """
WITH ex AS (
    SELECT label,
           generate_subscripts(embedding, 1) - 1 AS dim,
           UNNEST(embedding) AS e
    FROM embeddings
),
p AS (SELECT label, dim,
             CAST(SUM(CAST(ROUND(CAST(e AS DOUBLE) * 1000000) AS BIGINT))
                  AS BIGINT) AS s,
             CAST(COUNT(*) AS BIGINT) AS n
      FROM ex GROUP BY 1, 2),
c AS (SELECT label, dim, n, CAST(s // n AS BIGINT) AS c FROM p),
pr AS (SELECT a.label AS la, b.label AS lb,
              MAX(a.n) AS n_a, MAX(b.n) AS n_b,
              CAST(SUM(CAST(a.c AS HUGEINT) * b.c) AS HUGEINT) AS dot,
              CAST(SUM(CAST(a.c AS HUGEINT) * a.c) AS HUGEINT) AS sa,
              CAST(SUM(CAST(b.c AS HUGEINT) * b.c) AS HUGEINT) AS sb
       FROM c a JOIN c b ON a.dim = b.dim AND a.label < b.label
       GROUP BY 1, 2)
SELECT CAST(la AS BIGINT) AS label_a, CAST(lb AS BIGINT) AS label_b,
       CAST(n_a AS BIGINT) AS n_a, CAST(n_b AS BIGINT) AS n_b,
       CAST(dot AS BIGINT) AS dot_num,
       CAST(sa AS BIGINT) AS sq_a, CAST(sb AS BIGINT) AS sq_b,
       CAST(CASE WHEN sa > 0 AND sb > 0
                 THEN (CASE WHEN dot >= 0 THEN 1 ELSE -1 END)
                      * ((dot * dot * 1000000) // (sa * sb))
                 ELSE 0 END AS BIGINT) AS cos2_sign_ppm
FROM pr
"""


def q_label_token_stats(sf_dir: str, n_buckets: int = 16):
    """Cross-modal join — the one table pair no other query touches:
    ``documents.text`` statistics aggregated per ``embeddings.label``
    (the "token budget per semantic cluster" readout a curriculum
    builder wants). Bucket join on ``doc_id = vec_id`` with BOTH sides
    reduced before the exchange: the documents side ships
    ``(doc_id, n_tokens)`` ints (never text), the embeddings side
    ``(vec_id, label)`` (never vectors); per-bucket merge emits
    per-label partials and a k-group Sum finishes. At 100 TB neither
    raw column crosses the wire."""
    import pandas as pd
    import pyarrow.compute as pc

    from ..io.sources import read_parquet_clean

    docs = read_parquet_clean(
        f"{sf_dir}/documents.parquet", columns=["doc_id", "text"]
    )
    emb = read_parquet_clean(
        f"{sf_dir}/embeddings.parquet", columns=["vec_id", "label"]
    )

    def doc_side(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        toks = pc.cast(
            pc.count_substring_regex(batch["text"], r"\S+"), pa.int64()
        ).to_numpy(zero_copy_only=False)
        return pa.table(
            {
                "bucket": pa.array(ids % n_buckets, pa.int64()),
                "side": pa.array(np.zeros(len(ids), dtype=np.int8)),
                "key": pa.array(ids, pa.int64()),
                "n_tokens": pa.array(toks, pa.int64()),
                "label": pa.nulls(len(ids), pa.int64()),
            }
        )

    def emb_side(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False).astype(np.int64)
        return pa.table(
            {
                "bucket": pa.array(ids % n_buckets, pa.int64()),
                "side": pa.array(np.ones(len(ids), dtype=np.int8)),
                "key": pa.array(ids, pa.int64()),
                "n_tokens": pa.nulls(len(ids), pa.int64()),
                "label": pc.cast(batch["label"], pa.int64()),
            }
        )

    both = docs.map_batches(doc_side, batch_format="pyarrow", batch_size=None).union(
        emb.map_batches(emb_side, batch_format="pyarrow", batch_size=None)
    )

    def join_bucket(g: pd.DataFrame) -> pa.Table:
        d = g[g["side"] == 0][["key", "n_tokens"]]
        e = g[g["side"] == 1][["key", "label"]]
        j = e.merge(d, on="key", how="inner")
        agg = j.groupby("label", sort=False).agg(
            total_tokens=("n_tokens", "sum"), n_docs=("n_tokens", "size")
        )
        return pa.table(
            {
                "label": pa.array(agg.index.to_numpy(dtype=np.int64), pa.int64()),
                "total_tokens": pa.array(
                    agg["total_tokens"].to_numpy(dtype=np.int64), pa.int64()
                ),
                "n_docs": pa.array(agg["n_docs"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    from ray.data.aggregate import Sum

    per_bucket = both.groupby("bucket").map_groups(join_bucket, batch_format="pandas")
    return per_bucket.groupby("label").aggregate(
        Sum("total_tokens", alias_name="total_tokens"), Sum("n_docs", alias_name="n_docs")
    )


_SQL_LABEL_TOKEN_STATS = r"""
SELECT CAST(e.label AS BIGINT) AS label,
       CAST(SUM(length(regexp_extract_all(d.text, '\S+'))) AS BIGINT) AS total_tokens,
       CAST(count(*) AS BIGINT) AS n_docs
FROM embeddings e JOIN documents d ON d.doc_id = e.vec_id
GROUP BY 1
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

    ds = _embeddings(sf_dir).map_batches(local_topk, batch_format="pyarrow", batch_size=None)
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

    ds = _embeddings(sf_dir).map_batches(local, batch_format="pyarrow", batch_size=None)
    return ds.sort(["cos_micro", "vec_id"], descending=[True, False]).limit(_TOP_K)


def _pairs_from_sims(ids_a, ids_b, sims, threshold, intra: bool):
    """Thresholded (a, b, cos_micro) with a < b from a similarity
    block; ``intra=True`` means both axes are the same vector set (use
    the strict upper triangle so each pair scores once)."""
    if intra:
        hit_r, hit_c = np.where(np.triu(sims >= threshold, 1))
    else:
        hit_r, hit_c = np.where(sims >= threshold)
    a = ids_a[hit_r]
    b = ids_b[hit_c]
    lo = np.minimum(a, b)
    hi = np.maximum(a, b)
    keep = lo < hi  # drop self-pairs (distinct ids guaranteed upstream)
    return (
        lo[keep],
        hi[keep],
        np.rint(sims[hit_r, hit_c][keep] * 1e6).astype(np.int64),
    )


def q_embed_near_dup(sf_dir: str, threshold: float = 0.4, n_buckets: int = 8):
    """Embedding-cosine near-dup pairs: every (a, b) with a < b and
    cosine ≥ threshold — EXACT, via a blocked all-pairs join.

    Vectors hash into B buckets (``vec_id % B``); every unordered
    bucket pair (i ≤ j) is one task, and each vector ships (full
    embedding payload included) to the B tasks its bucket participates
    in — the exchange carries N·B rows ≈ N·B·dim·4 bytes, B× the
    corpus's vector bytes. B trades per-task memory (O(2N/B) vectors,
    so a bucket pair fits a worker's heap) against shuffle volume;
    every vector pair is scored exactly once (in the task of its
    sorted bucket pair) — no driver broadcast, no O(N)-per-task
    state, no dedup pass needed.

    O(N²) compute is inherent to an exact threshold join at θ = 0.4:
    that is a 66° angle, far too wide for sketch bucketing to keep
    recall 1 (measured here: random-projection IVF needs 8 of 16
    probed cells for full recall — see :func:`q_embed_near_dup_ivf`
    for the approximate scale path and the recall/threshold
    interaction)."""

    def fan_out(batch: pa.Table) -> pa.Table:
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        bucket = ids % n_buckets
        idx = np.repeat(np.arange(batch.num_rows), n_buckets)
        other = np.tile(np.arange(n_buckets), batch.num_rows)
        bi = np.repeat(bucket, n_buckets)
        i = np.minimum(bi, other)
        j = np.maximum(bi, other)
        task = i * n_buckets - (i * (i - 1)) // 2 + (j - i)
        out = batch.take(idx)
        out = out.append_column("task", pa.array(task, pa.int64()))
        return out.append_column("bucket", pa.array(bi, pa.int64()))

    import pandas as pd

    def _task_to_pair(task: int) -> tuple[int, int]:
        # invert the triangular task index: i is the largest bucket
        # with tri_start(i) <= task (B is small — a linear scan is fine)
        for i in range(n_buckets):
            start = i * n_buckets - (i * (i - 1)) // 2
            width = n_buckets - i
            if task < start + width:
                return i, i + (task - start)
        raise ValueError(f"task {task} out of range for {n_buckets} buckets")

    def score_task(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        buckets = g["bucket"].to_numpy()
        mat = np.stack(g["embedding"].to_list()).astype(np.float64)
        vn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        # decode (i, j) from the task id — NEVER from the observed
        # buckets: a cross-bucket task whose other bucket is globally
        # empty would otherwise look intra and double-count its pairs
        i, j = _task_to_pair(int(g["task"].iloc[0]))
        if i == j:  # intra-bucket task
            a, b, s = _pairs_from_sims(ids, ids, vn @ vn.T, threshold, intra=True)
        else:
            ma = buckets == i
            mb = buckets == j
            a, b, s = _pairs_from_sims(
                ids[ma], ids[mb], vn[ma] @ vn[mb].T, threshold, intra=False
            )
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "cos_micro": pa.array(s),
            }
        )

    ds = _embeddings(sf_dir).map_batches(fan_out, batch_format="pyarrow", batch_size=None)
    return ds.groupby("task").map_groups(score_task, batch_format="pandas")


def q_embed_near_dup_ivf(sf_dir: str, threshold: float = 0.4, n_cells: int = 16, m_probe: int = 8):
    """Approximate embedding near-dup via multi-probe IVF cells — the
    sub-quadratic scale path. Every vector is assigned to its
    ``m_probe`` nearest of ``n_cells`` random-projection centroids;
    pairs are scored only inside shared cells, then deduped with a
    coarse pair-bucket groupby.

    Recall/threshold interaction (measured on this corpus, 64-dim):
    θ = 0.4 is a 66° angle, so cell membership of the two vectors is
    only weakly correlated — m_probe 2/3/4/6/8 of 16 leaves
    425/184/54/1/0 of 920 true pairs missed at sf0.1. m=8 reaches
    recall 1.0 here (and hash-matches the exact oracle), but ships
    each vector 8× — the win over the exact blocked join grows as the
    threshold tightens (at θ ≥ 0.9, m = 2 suffices and cells are
    small). Exactness is data-dependent by construction; use
    :func:`q_embed_near_dup` when the answer must be exact."""
    rng = np.random.RandomState(7)
    import pyarrow.parquet as pq

    # centroid build needs only the dim — read one row-group's worth
    first = pq.ParquetFile(f"{sf_dir}/embeddings.parquet").read_row_group(0, columns=["embedding"])
    dim = len(first["embedding"][0])
    centroids = rng.randn(n_cells, dim)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)

    def fan_out(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cells = np.argsort(-(vn @ centroids.T), axis=1)[:, :m_probe]  # (n, m)
        idx = np.repeat(np.arange(batch.num_rows), m_probe)
        out = batch.take(idx)
        return out.append_column("cell", pa.array(cells.reshape(-1), pa.int64()))

    import pandas as pd

    def score_cell(g: pd.DataFrame) -> pa.Table:
        ids = g["vec_id"].to_numpy(dtype=np.int64)
        mat = np.stack(g["embedding"].to_list()).astype(np.float64)
        vn = mat / np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-30)
        a, b, s = _pairs_from_sims(ids, ids, vn @ vn.T, threshold, intra=True)
        return pa.table(
            {
                "vec_a": pa.array(a, pa.int64()),
                "vec_b": pa.array(b, pa.int64()),
                "cos_micro": pa.array(s),
            }
        )

    cand = (
        _embeddings(sf_dir)
        .map_batches(fan_out, batch_format="pyarrow", batch_size=None)
        .groupby("cell")
        .map_groups(score_cell, batch_format="pandas")
    )

    # a pair sharing several cells scores several times → distinct via
    # a coarse pair-bucket groupby (values identical, keep first)
    def add_bucket(batch: pa.Table) -> pa.Table:
        a = batch["vec_a"].to_numpy(zero_copy_only=False)
        b = batch["vec_b"].to_numpy(zero_copy_only=False)
        return batch.append_column(
            "pair_bucket", pa.array((a * np.int64(1_000_003) + b) % 16, pa.int64())
        )

    def distinct(g: pd.DataFrame) -> pa.Table:
        g = g.drop_duplicates(["vec_a", "vec_b"], ignore_index=True)
        return pa.table(
            {
                "vec_a": pa.array(g["vec_a"].to_numpy(dtype=np.int64), pa.int64()),
                "vec_b": pa.array(g["vec_b"].to_numpy(dtype=np.int64), pa.int64()),
                "cos_micro": pa.array(g["cos_micro"].to_numpy(dtype=np.int64), pa.int64()),
            }
        )

    return (
        cand.map_batches(add_bucket, batch_format="pyarrow", batch_size=None)
        .groupby("pair_bucket")
        .map_groups(distinct, batch_format="pandas")
    )


_SQL_EMBED_NEAR_DUP = """
SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
       CAST(ROUND(list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                                         CAST(b.embedding AS DOUBLE[])) * 1000000) AS BIGINT) AS cos_micro
FROM embeddings a JOIN embeddings b ON a.vec_id < b.vec_id
WHERE list_cosine_similarity(CAST(a.embedding AS DOUBLE[]),
                             CAST(b.embedding AS DOUBLE[])) >= 0.4
"""


# ---------------------------------------------------------------------------
# Distributed k-means (trained centroids — the iterative-algorithm shape)
# ---------------------------------------------------------------------------


def _train_centroids(
    sf_dir: str, k: int, iters: int, normalize: bool = False
) -> np.ndarray:
    """Distributed Lloyd's training loop shared by :func:`q_kmeans`
    and the trained-IVF index: per iteration the k×dim centroid matrix
    broadcasts into the map stage (closure here; ``ray.put`` on a real
    cluster), each batch assigns vectorized (one matmul) and emits
    per-cluster PARTIAL sums (k rows per block — the exchange never
    carries vectors per row), a k-group reduce merges them, and the
    driver materializes exactly k tiny rows per iteration. Driver and
    shuffle state are O(k·dim·blocks) at any corpus size.

    ``normalize=True`` is spherical k-means: vectors are L2-normalized
    before assignment/summing and centroids renormalize after each
    update, so cells quantize cosine direction — what an IVF index for
    cosine search needs.

    Determinism: init is the first ``k`` vectors by ``vec_id`` (read
    with predicate pushdown, O(k) driver memory); partial sums carry
    their block's min vec_id and every reduce sorts on it before
    summing, so float accumulation order — and hence the fixpoint —
    is identical across runs at a given session width (block ARRIVAL
    order is not deterministic; block CONTENT at fixed parallelism
    is). Across widths the block partition changes, so centroid BITS
    may differ by float-rounding — assignments on non-degenerate
    clusters do not (pinned in the unit test)."""
    import pandas as pd
    import pyarrow.parquet as pq

    def _norm_rows(m: np.ndarray) -> np.ndarray:
        return m / np.maximum(np.linalg.norm(m, axis=1, keepdims=True), 1e-30)

    init = pq.read_table(
        f"{sf_dir}/embeddings.parquet",
        columns=["vec_id", "embedding"],
        filters=[("vec_id", "<", k)],
    )
    ids0 = init["vec_id"].to_numpy(zero_copy_only=False)
    centroids = np.stack(init["embedding"].to_pylist()).astype(np.float64)[
        np.argsort(ids0)
    ]
    if len(centroids) < k:
        raise ValueError(f"corpus has fewer than k={k} vectors")
    if normalize:
        centroids = _norm_rows(centroids)
    dim = centroids.shape[1]

    def partials_fn(cents: np.ndarray):
        def fn(batch: pa.Table) -> pa.Table:
            vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
            if normalize:
                vecs = _norm_rows(vecs)
            ids = batch["vec_id"].to_numpy(zero_copy_only=False)
            # ‖v−c‖² argmin ⟺ argmin(‖c‖² − 2·v·c): one matmul per batch
            d2 = (cents**2).sum(axis=1)[None, :] - 2.0 * (vecs @ cents.T)
            assign = np.argmin(d2, axis=1)
            out_c, out_n, out_mv, out_s = [], [], [], []
            for c in np.unique(assign):
                m = assign == c
                out_c.append(int(c))
                out_n.append(int(m.sum()))
                out_mv.append(int(ids[m].min()))
                out_s.append(vecs[m].sum(axis=0))
            return pa.table(
                {
                    "cluster": pa.array(out_c, pa.int64()),
                    "n": pa.array(out_n, pa.int64()),
                    "min_vec_id": pa.array(out_mv, pa.int64()),
                    "vsum": pa.array([s.tolist() for s in out_s], pa.list_(pa.float64())),
                }
            )

        return fn

    for _ in range(iters):
        cents = centroids  # bind the CURRENT matrix into this iteration's closure

        def reduce_cluster(g: pd.DataFrame) -> pd.DataFrame:
            g = g.sort_values("min_vec_id", kind="stable")
            s = np.zeros(dim, dtype=np.float64)
            for v in g["vsum"]:
                s = s + np.asarray(v, dtype=np.float64)
            return pd.DataFrame(
                {
                    "cluster": [int(g["cluster"].iloc[0])],
                    "n": [int(g["n"].sum())],
                    "vsum": [s.tolist()],
                }
            )

        merged = (
            _embeddings(sf_dir)
            .map_batches(partials_fn(cents), batch_format="pyarrow", batch_size=None)
            .groupby("cluster")
            .map_groups(reduce_cluster, batch_format="pandas")
            .to_pandas()  # exactly k tiny rows — bounded driver aggregate
        )
        new = centroids.copy()  # empty clusters keep their centroid
        for _, row in merged.iterrows():
            new[int(row["cluster"])] = np.asarray(row["vsum"]) / row["n"]
        centroids = _norm_rows(new) if normalize else new

    return centroids


def q_kmeans(sf_dir: str, k: int = 8, iters: int = 5):
    """Distributed Lloyd's k-means over the embedding column — the
    cluster-then-curate stage (SemDeDup-style pruning, per-cluster
    sampling) of a large-scale corpus pipeline, and the engine's
    iterative-refinement shape (training loop shared with the trained
    IVF index — see :func:`_train_centroids` for the exchange design
    and determinism contract). Returns ``(vec_id, cluster,
    dist_micro)``; no SQL oracle (iterative, non-SQL-expressible) —
    unit tests pin determinism, agreement with a local Lloyd reference
    on separated clusters, and non-increasing inertia."""
    final = _train_centroids(sf_dir, k, iters)

    def assign_fn(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        d2 = ((vecs[:, None, :] - final[None, :, :]) ** 2).sum(axis=2)
        assign = np.argmin(d2, axis=1)
        dist = np.sqrt(d2[np.arange(len(vecs)), assign])
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "cluster": pa.array(assign.astype(np.int64), pa.int64()),
                "dist_micro": pa.array(
                    np.rint(dist * 1_000_000).astype(np.int64), pa.int64()
                ),
            }
        )

    return _embeddings(sf_dir).map_batches(
        assign_fn, batch_format="pyarrow", batch_size=None
    )


def q_ann_ivf_trained(
    sf_dir: str, n_probe: int = 4, n_cells: int = 16, train_iters: int = 3
):
    """IVF ANN with a TRAINED coarse quantizer — spherical-k-means
    centroids from :func:`_train_centroids` instead of
    :func:`q_ann_ivf`'s seeded random projections. Cells follow the
    corpus's actual direction density, so the query's mass concentrates
    in fewer cells and the same recall needs fewer probes (the unit
    test pins trained@4 probes ≥ random@4 probes on the real table;
    FAISS's IVF makes the identical trade). Training cost is
    ``train_iters`` passes of k-row-per-block partials; at corpus scale
    an IVF index trains on a sample once and is reused per query —
    here it retrains per call so the query stays self-contained.

    Caveat measured in the unit tests: when ``n_cells`` far exceeds
    the corpus's natural cluster count, training SPLITS each true
    neighborhood across several cells and per-probe recall drops
    (16 trained cells on 4 tight blobs: 0.4 recall at 1 probe, where
    whole-blob-per-cell layouts reach 1.0) — size ``n_cells`` to the
    corpus, exactly as FAISS guidance does. On the real (near-uniform)
    table trained@4 probes = 0.90 recall vs random projections' 0.20.
    Rows-only (approximate by construction): returns top-10 for query
    vec_id 0."""
    cents = _train_centroids(sf_dir, n_cells, train_iters, normalize=True)
    qids, qmat = _query_matrix(sf_dir)
    q0 = qmat[0] / np.linalg.norm(qmat[0])
    probe_cells = set(np.argsort(-(cents @ q0))[:n_probe].tolist())

    def local(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        cells = np.argmax(vn @ cents.T, axis=1)
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

    ds = _embeddings(sf_dir).map_batches(local, batch_format="pyarrow", batch_size=None)
    return ds.sort(["cos_micro", "vec_id"], descending=[True, False]).limit(_TOP_K)


# ---------------------------------------------------------------------------
# Exact vector norms (integer micro² — the no-sqrt discipline)
# ---------------------------------------------------------------------------

def q_embedding_norms(sf_dir: str):
    """Per-vector squared L2 norm in exact integer micro² units — the
    vector-hygiene profile (zero/degenerate/outlier vectors) a training
    pipeline runs before indexing, done with NO float reduction: each
    float32 element widens to double exactly, snaps to integer micro
    (``rint``, mirroring ``ROUND``), and the squares sum as exact int64
    in any order — the same snap-then-reduce discipline as the entropy
    op, applied element-wise to vectors. Embarrassingly parallel over
    batches; headroom: dim·(10⁶·|x|)² per vector must stay under 2⁶³
    (|x| ≲ 380 at dim 64 — generous for unit-scale embeddings, and a
    pre-scale shifts it)."""
    ds = _embeddings(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        emb = batch["embedding"]
        flat = pc.list_flatten(emb).to_numpy(zero_copy_only=False).astype(np.float64)
        y = flat * 1_000_000.0
        # half-away-from-zero, NOT np.rint: DuckDB ROUND is half-away,
        # banker's rounding diverges on reachable .5 boundaries
        micro = (np.sign(y) * np.floor(np.abs(y) + 0.5)).astype(np.int64)
        offs = np.asarray(emb.combine_chunks().offsets).astype(np.int64)
        # prefix-sum difference, not reduceat: reduceat raises on a
        # trailing empty list (start index == len) and mis-sums
        # interior empties — the cumsum form is total for any offsets
        cs = np.concatenate([[0], np.cumsum(micro * micro)])
        sq = cs[offs[1:]] - cs[offs[:-1]]
        return pa.table(
            {
                "vec_id": batch["vec_id"],
                "dim": pa.array((offs[1:] - offs[:-1]).astype(np.int64), pa.int64()),
                "sq_norm_micro2": pa.array(sq, pa.int64()),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


_SQL_EMBEDDING_NORMS = """
WITH e AS (
    SELECT vec_id,
           CAST(ROUND(CAST(x AS DOUBLE) * 1000000.0) AS BIGINT) AS m
    FROM (SELECT vec_id, UNNEST(embedding) AS x FROM embeddings)
)
SELECT vec_id, CAST(COUNT(*) AS BIGINT) AS dim,
       CAST(SUM(m * m) AS BIGINT) AS sq_norm_micro2
FROM e GROUP BY vec_id
"""


def q_ann_recall_sweep(sf_dir: str, n_cells: int = 16, probe_levels=(1, 2, 4, 8)):
    """Recall/cost curve of the IVF index — the evaluation harness an
    ANN deployment runs before picking ``n_probe``: for each probe
    level, the exact top-10 hits recovered and the number of
    candidate vectors scanned, against the brute-force baseline (the
    full-probe level, appended automatically, whose recall is 1 by
    construction).

    ONE streaming pass computes every level simultaneously: a vector
    in the query's ``r``-th nearest cell is a candidate for every
    level ``p > r``, so each batch emits, per level, its local top-10
    (pruned on the same integer-micro / vec_id order the global
    re-rank uses — the :func:`q_ann_topk` tie discipline) plus one
    candidate-count summary row. The exchange carries O(levels × (k +
    1) × blocks) rows; the driver folds O(levels × k) rows into the
    recall table. Rows-only by nature (recall of an index is not a
    SQL-expressible quantity); determinism comes from the seeded
    centroids and integer scores."""
    import pandas as pd

    rng = np.random.RandomState(7)
    qids, qmat = _query_matrix(sf_dir)
    dim = qmat.shape[1]
    centroids = rng.randn(n_cells, dim)
    centroids /= np.linalg.norm(centroids, axis=1, keepdims=True)
    q0 = qmat[0] / np.linalg.norm(qmat[0])
    cell_rank = np.empty(n_cells, dtype=np.int64)
    cell_rank[np.argsort(-(centroids @ q0))] = np.arange(n_cells)
    levels = sorted(set(int(p) for p in probe_levels) | {n_cells})

    def local(batch: pa.Table) -> pa.Table:
        vecs = np.stack(batch["embedding"].to_pylist()).astype(np.float64)
        vn = vecs / np.maximum(np.linalg.norm(vecs, axis=1, keepdims=True), 1e-30)
        ranks = cell_rank[np.argmax(vn @ centroids.T, axis=1)]
        ids = batch["vec_id"].to_numpy(zero_copy_only=False)
        s_micro = np.rint((vn @ q0) * 1e6).astype(np.int64)
        base = ids != 0  # the query vector never scores itself
        out_p, out_id, out_s, out_c = [], [], [], []
        for p in levels:
            m = base & (ranks < p)
            idsp, sp = ids[m], s_micro[m]
            out_p.append(np.full(1, p))
            out_id.append(np.full(1, -1))  # summary row: candidates only
            out_s.append(np.zeros(1, np.int64))
            out_c.append(np.full(1, len(idsp)))
            if len(idsp) > _TOP_K:
                order = np.lexsort((idsp, -sp))[:_TOP_K]
                idsp, sp = idsp[order], sp[order]
            out_p.append(np.full(len(idsp), p))
            out_id.append(idsp)
            out_s.append(sp)
            out_c.append(np.zeros(len(idsp), np.int64))
        return pa.table(
            {
                "p": pa.array(np.concatenate(out_p), pa.int64()),
                "vec_id": pa.array(np.concatenate(out_id), pa.int64()),
                "cos_micro": pa.array(np.concatenate(out_s), pa.int64()),
                "cand": pa.array(np.concatenate(out_c), pa.int64()),
            }
        )

    def fold_level(g: pd.DataFrame) -> pa.Table:
        cand = int(g["cand"].sum())
        top = (
            g[g["vec_id"] >= 0]
            .sort_values(["cos_micro", "vec_id"], ascending=[False, True], kind="mergesort")
            .head(_TOP_K)
        )
        k = len(top)
        return pa.table(
            {
                "p": pa.array(np.full(k, int(g["p"].iloc[0])), pa.int64()),
                "vec_id": pa.array(top["vec_id"].to_numpy(dtype=np.int64), pa.int64()),
                "cand": pa.array(np.full(k, cand), pa.int64()),
            }
        )

    folded = (
        _embeddings(sf_dir)
        .map_batches(local, batch_format="pyarrow", batch_size=None)
        .groupby("p")
        .map_groups(fold_level, batch_format="pandas")
        .to_pandas()  # bounded: O(levels × k) rows
    )

    exact = set(folded.loc[folded["p"] == n_cells, "vec_id"].tolist())
    out = []
    for p, g in folded.groupby("p", sort=True):
        hits = len(set(g["vec_id"].tolist()) & exact)
        out.append(
            {
                "n_probe": int(p),
                "n_candidates": int(g["cand"].iloc[0]),
                "hits": hits,
                "recall_ppm": (1_000_000 * hits) // _TOP_K,
            }
        )
    return pd.DataFrame(out)


def q_hybrid_search_rrf(sf_dir: str, rrf_k: int = 60):
    """Hybrid retrieval — reciprocal-rank fusion of the lexical
    (BM25) and vector (brute-force cosine) top-k lists, the standard
    RAG-stack combiner: ``score = Σ_lists 1/(k + rank)``.

    Both source lists are the registered queries themselves
    (:func:`~.textstats.q_bm25_search`, :func:`q_ann_topk`), each a
    full streaming pass whose shuffle carries only top-k rows per
    block; the fusion then runs on ≤ 2·k driver-side rows — bounded at
    any corpus size, the same driver-bounded read-off discipline as
    the ppm ratios. Exactness: ranks are total orders ((score DESC,
    id) — both lists carry integer scores with id tie-breaks), and the
    fused score is Σ 10⁹ // (k + rank) in integer floor division, so
    the sum is order-free and hash-identical to the oracle's HUGEINT
    arithmetic."""
    import pandas as pd

    from .textstats import q_bm25_search

    bm = q_bm25_search(sf_dir).to_pandas()
    an = q_ann_topk(sf_dir).to_pandas()
    bm = bm.sort_values(
        ["bm25_micro", "doc_id"], ascending=[False, True]
    ).reset_index(drop=True)
    an = an.sort_values(
        ["cos_micro", "vec_id"], ascending=[False, True]
    ).reset_index(drop=True)
    score: dict[int, int] = {}
    in_bm: dict[int, int] = {}
    in_an: dict[int, int] = {}
    for rank, doc in enumerate(bm["doc_id"].astype(int), start=1):
        score[doc] = score.get(doc, 0) + 1_000_000_000 // (rrf_k + rank)
        in_bm[doc] = 1
    for rank, doc in enumerate(an["vec_id"].astype(int), start=1):
        score[doc] = score.get(doc, 0) + 1_000_000_000 // (rrf_k + rank)
        in_an[doc] = 1
    ids = sorted(score, key=lambda d: (-score[d], d))
    return pd.DataFrame(
        {
            "doc_id": pd.Series(ids, dtype=np.int64),
            "rrf_nano": pd.Series([score[d] for d in ids], dtype=np.int64),
            "in_bm25": pd.Series([in_bm.get(d, 0) for d in ids], dtype=np.int64),
            "in_ann": pd.Series([in_an.get(d, 0) for d in ids], dtype=np.int64),
        }
    )


def _sql_hybrid_rrf() -> str:
    from .textstats import _SQL_BM25

    return f"""
WITH bm AS (
    SELECT doc_id, ROW_NUMBER() OVER (ORDER BY bm25_micro DESC, doc_id) AS r
    FROM ({_SQL_BM25})),
an AS (
    SELECT vec_id, ROW_NUMBER() OVER (ORDER BY cos_micro DESC, vec_id) AS r
    FROM ({_SQL_ANN_TOPK}))
SELECT CAST(COALESCE(bm.doc_id, an.vec_id) AS BIGINT) AS doc_id,
       CAST(COALESCE(1000000000 // (60 + bm.r), 0)
          + COALESCE(1000000000 // (60 + an.r), 0) AS BIGINT) AS rrf_nano,
       CAST(CASE WHEN bm.doc_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_bm25,
       CAST(CASE WHEN an.vec_id IS NULL THEN 0 ELSE 1 END AS BIGINT) AS in_ann
FROM bm FULL OUTER JOIN an ON bm.doc_id = an.vec_id
"""


QUERIES = {
    "ann_topk": q_ann_topk,
    "hybrid_search_rrf": q_hybrid_search_rrf,
    "ann_recall_sweep": q_ann_recall_sweep,
    "ann_topk_filtered": q_ann_topk_filtered,
    "label_centroids": q_label_centroids,
    "label_centroid_affinity": q_label_centroid_affinity,
    "label_token_stats": q_label_token_stats,
    "knn_join": q_knn_join,
    "ann_ivf": q_ann_ivf,
    "ann_ivf_trained": q_ann_ivf_trained,
    "embed_near_dup": q_embed_near_dup,
    "embed_near_dup_ivf": q_embed_near_dup_ivf,
    "kmeans": q_kmeans,
    "embedding_norms": q_embedding_norms,
}

ORACLE_SQL = {
    "ann_topk": _SQL_ANN_TOPK,
    "hybrid_search_rrf": _sql_hybrid_rrf(),
    "ann_topk_filtered": _SQL_ANN_TOPK_FILTERED,
    "label_centroids": _SQL_LABEL_CENTROIDS,
    "label_centroid_affinity": _SQL_LABEL_CENTROID_AFFINITY,
    "label_token_stats": _SQL_LABEL_TOKEN_STATS,
    "knn_join": _SQL_KNN_JOIN,
    "embed_near_dup": _SQL_EMBED_NEAR_DUP,
    "embedding_norms": _SQL_EMBEDDING_NORMS,
    # embed_near_dup_ivf matches the same exact-pair spec at m_probe=8
    # on this corpus (recall 1.0 measured at every sf — see docstring);
    # approximate by construction, exact here, so it carries the oracle
    "embed_near_dup_ivf": _SQL_EMBED_NEAR_DUP,
    # ann_ivf: approximate by design — rows-only; recall asserted in tests
}
