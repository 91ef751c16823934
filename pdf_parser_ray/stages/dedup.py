"""Deduplication operators: exact (hash-partitioned keep-first),
MinHash+LSH near-dup, SimHash, and n-gram Jaccard verification —
the corpus-dedup family a training-data pipeline needs (SURVEY.md
§2.7's cross-document analog of the reference's D1 dedup).

The driver's ``documents`` table has no duplicates, so the dedup
queries run over a deterministic *augmented* corpus: every 10th
document is duplicated verbatim (exact dups, id+1_000_000) and every
7th is duplicated with its first word rewritten (near dups,
id+2_000_000). The augmentation is pure SQL-expressible, so the exact
side has a DuckDB oracle; MinHash/SimHash results are rows-only checks
by design (sketches have no SQL analog).

Scale notes (the patterns, not the constants, are what matter at
100 TB):

* exact dedup shuffles md5 keys, never full texts;
* MinHash emits (band, band_hash, doc_id) rows — the groupby moves
  O(bands × docs) fixed-width rows; candidate verification joins texts
  back by id (broadcast here; a bucket join at scale);
* all hashes are md5/crc-based — no process-seeded ``hash()``.
"""

from __future__ import annotations

import hashlib
import zlib

import numpy as np
import pandas as pd
import pyarrow as pa

_EXACT_EVERY = 10
_NEAR_EVERY = 7
_EXACT_BASE = 1_000_000
_NEAR_BASE = 2_000_000

_AUG_SQL = f"""
    SELECT doc_id, text FROM documents
    UNION ALL
    SELECT doc_id + {_EXACT_BASE} AS doc_id, text
    FROM documents WHERE doc_id % {_EXACT_EVERY} = 0
    UNION ALL
    SELECT doc_id + {_NEAR_BASE} AS doc_id,
           regexp_replace(text, '^\\S+', 'MUTATED') AS text
    FROM documents WHERE doc_id % {_NEAR_EVERY} = 0
"""


def augmented_corpus(sf_dir: str):
    """documents + exact copies (every 10th) + near copies (every 7th,
    first word rewritten). Pure per-row transform inside map_batches."""
    import ray

    from ..io.sources import read_parquet_clean

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    ds = read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=n_blocks,
    )

    def fn(batch: pa.Table) -> pa.Table:
        ids = batch["doc_id"].to_numpy(zero_copy_only=False)
        # The augmentation encodes dup-kind in the id space
        # (+_EXACT_BASE / +_NEAR_BASE); guard the assumption instead of
        # silently colliding at larger corpora.
        if len(ids) and int(ids.max()) >= _EXACT_BASE:
            raise ValueError(
                f"augmented_corpus id-space overflow: max doc_id {int(ids.max())} "
                f">= _EXACT_BASE {_EXACT_BASE}"
            )
        texts = batch["text"].to_pylist()
        out_ids = list(ids)
        out_texts = list(texts)
        for i, t in zip(ids, texts):
            if i % _EXACT_EVERY == 0:
                out_ids.append(i + _EXACT_BASE)
                out_texts.append(t)
            if i % _NEAR_EVERY == 0:
                parts = (t or "").split(" ", 1)
                mut = "MUTATED" + (" " + parts[1] if len(parts) > 1 else "")
                out_ids.append(i + _NEAR_BASE)
                out_texts.append(mut if (t or "") else t)
        return pa.table(
            {"doc_id": pa.array(out_ids, pa.int64()), "text": pa.array(out_texts, pa.string())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def _with_fp(ds, n_buckets: int = 64):
    """Add the content fingerprint and a coarse shuffle bucket (first
    fp byte % n_buckets): the groupby partitions on the bucket, and the
    per-fingerprint logic runs vectorized inside each partition —
    hash-partition + per-group-first without per-tiny-group overhead."""

    def fn(batch: pa.Table) -> pa.Table:
        fps = [hashlib.md5((t or "").encode()).hexdigest() for t in batch["text"].to_pylist()]
        buckets = np.array([int(f[:2], 16) % n_buckets for f in fps], dtype=np.int64)
        return batch.append_column("fp", pa.array(fps)).append_column(
            "fp_bucket", pa.array(buckets)
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=65536)


def q_dedup_exact(sf_dir: str):
    """Exact dedup over the augmented corpus: hash-partition on the
    content fingerprint (coarse bucket shuffle), keep the minimum
    doc_id per fingerprint group."""
    ds = _with_fp(augmented_corpus(sf_dir))

    def keep_first(g: pd.DataFrame) -> pd.DataFrame:
        idx = g.groupby("fp", sort=False)["doc_id"].idxmin()
        return g.loc[idx, ["doc_id", "text"]]

    return ds.groupby("fp_bucket").map_groups(keep_first, batch_format="pandas")


_SQL_DEDUP_EXACT = f"""
WITH aug AS ({_AUG_SQL})
SELECT doc_id, text FROM aug
WHERE doc_id IN (SELECT MIN(doc_id) FROM aug GROUP BY text)
"""


def q_dup_pairs_exact(sf_dir: str):
    """All exact-duplicate pairs (doc_a < doc_b) via per-fingerprint
    groups — never a cross join."""
    ds = _with_fp(augmented_corpus(sf_dir))

    def pairs(g: pd.DataFrame) -> pd.DataFrame:
        out_a, out_b = [], []
        for _fp, sub in g.groupby("fp", sort=False):
            if len(sub) < 2:
                continue
            ids = sorted(sub["doc_id"].tolist())
            for i, x in enumerate(ids):
                for y in ids[i + 1 :]:
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame(
            {"doc_a": np.array(out_a, dtype=np.int64), "doc_b": np.array(out_b, dtype=np.int64)}
        )

    return ds.groupby("fp_bucket").map_groups(pairs, batch_format="pandas")


_SQL_DUP_PAIRS = f"""
WITH aug AS ({_AUG_SQL})
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b
FROM aug a JOIN aug b ON a.text = b.text AND a.doc_id < b.doc_id
"""


# ---------------------------------------------------------------------------
# MinHash + LSH near-dup
# ---------------------------------------------------------------------------

_N_PERM = 64
_N_BANDS = 16  # × 4 rows/band
_MERSENNE = (1 << 61) - 1
_rng = np.random.RandomState(42)
_PERM_A = _rng.randint(1, _MERSENNE, size=_N_PERM, dtype=np.int64)
_PERM_B = _rng.randint(0, _MERSENNE, size=_N_PERM, dtype=np.int64)


def _shingles(text: str, k: int = 3) -> np.ndarray:
    """Word k-gram shingle hashes (crc32 of the joined gram —
    deterministic across processes)."""
    words = (text or "").split()
    if len(words) < k:
        grams = [" ".join(words)] if words else []
    else:
        grams = [" ".join(words[i : i + k]) for i in range(len(words) - k + 1)]
    if not grams:
        return np.zeros(0, dtype=np.int64)
    return np.unique(
        np.array([zlib.crc32(g.encode()) for g in grams], dtype=np.int64)
    )


def _minhash(sh: np.ndarray) -> np.ndarray:
    if len(sh) == 0:
        return np.full(_N_PERM, _MERSENNE, dtype=np.int64)
    # (a*x + b) mod p, min over shingles, per permutation
    vals = (sh[None, :] * _PERM_A[:, None] + _PERM_B[:, None]) % _MERSENNE
    return vals.min(axis=1)


def minhash_bands(batch: pa.Table) -> pa.Table:
    """doc → (band_id, band_hash, doc_id) rows for the LSH groupby."""
    out_band, out_hash, out_doc = [], [], []
    for doc_id, text in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
        mh = _minhash(_shingles(text))
        rows = _N_PERM // _N_BANDS
        for b in range(_N_BANDS):
            seg = mh[b * rows : (b + 1) * rows]
            h = hashlib.md5(seg.tobytes()).hexdigest()[:16]
            out_band.append(b)
            out_hash.append(h)
            out_doc.append(doc_id)
    return pa.table(
        {
            "band_id": pa.array(out_band, pa.int32()),
            "band_hash": pa.array(out_hash, pa.string()),
            "doc_id": pa.array(out_doc, pa.int64()),
        }
    )


def jaccard(a: str, b: str, k: int = 3) -> float:
    sa, sb = set(_shingles(a, k).tolist()), set(_shingles(b, k).tolist())
    if not sa and not sb:
        return 1.0
    if not sa or not sb:
        return 0.0
    return len(sa & sb) / len(sa | sb)


def q_near_dup_pairs(sf_dir: str, threshold: float = 0.5):
    """MinHash+LSH near-dup: shingle → 64-perm minhash → 16 bands →
    bucket groupby → candidate pairs → exact n-gram Jaccard
    verification (≥ threshold). Candidate generation shuffles only
    fixed-width band rows; verification re-reads the two texts via a
    broadcast id→text map (a bucket join at cluster scale)."""
    ds = augmented_corpus(sf_dir)
    bands = ds.map_batches(minhash_bands, batch_format="pyarrow", batch_size=4096)

    def band_pairs(g: pd.DataFrame) -> pd.DataFrame:
        """All candidate pairs within one band partition. Grouping by
        band_id alone (16 coarse groups) keeps the shuffle coarse; the
        fine band_hash bucketing happens vectorized inside pandas —
        thousands of tiny ``map_groups`` groups would serialize on
        per-group overhead."""
        out_a, out_b = [], []
        for _h, sub in g.groupby("band_hash", sort=False):
            if len(sub) < 2:
                continue
            ids = sorted(set(sub["doc_id"].tolist()))
            for i, x in enumerate(ids):
                for y in ids[i + 1 :]:
                    out_a.append(x)
                    out_b.append(y)
        return pd.DataFrame(
            {"doc_a": np.array(out_a, dtype=np.int64), "doc_b": np.array(out_b, dtype=np.int64)}
        )

    cand = bands.groupby("band_id").map_groups(band_pairs, batch_format="pandas")

    # Verification needs the two texts per candidate pair. Candidates
    # are few, so resolve texts for exactly the needed ids: read the
    # base rows from the source table (predicate-filtered) and re-apply
    # the deterministic augmentation rule — no second pass over the
    # corpus. (At cluster scale: bucket-join candidates back to texts.)
    # Distinct candidate pairs (the same pair fires in several bands):
    # the candidate set is provably small (bounded by true near-dups ×
    # bands), so the dedup is a driver-side drop_duplicates on the
    # materialized pairs rather than another cluster-wide shuffle.
    cand_tbl = cand.to_pandas().drop_duplicates(ignore_index=True)
    needed = set(cand_tbl["doc_a"]) | set(cand_tbl["doc_b"])
    base_needed = {i % _EXACT_BASE if i < _NEAR_BASE else i - _NEAR_BASE for i in needed}
    import pyarrow.compute as _pc
    import pyarrow.parquet as _pq

    base = _pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])
    base = base.filter(_pc.is_in(base["doc_id"], pa.array(sorted(base_needed), pa.int64())))
    base_map = dict(zip(base["doc_id"].to_pylist(), base["text"].to_pylist()))

    def _text_of(doc_id: int) -> str:
        if doc_id >= _NEAR_BASE:
            t = base_map.get(doc_id - _NEAR_BASE, "")
            parts = (t or "").split(" ", 1)
            return "MUTATED" + (" " + parts[1] if len(parts) > 1 else "") if t else t
        if doc_id >= _EXACT_BASE:
            return base_map.get(doc_id - _EXACT_BASE, "")
        return base_map.get(doc_id, "")

    import ray.data as rd

    cand = rd.from_pandas(cand_tbl)

    def verify(batch: pa.Table) -> pa.Table:
        da = batch["doc_a"].to_pylist()
        db = batch["doc_b"].to_pylist()
        keep_a, keep_b, keep_j = [], [], []
        for x, y in zip(da, db):
            j = jaccard(_text_of(x), _text_of(y))
            if j >= threshold:
                keep_a.append(x)
                keep_b.append(y)
                keep_j.append(round(j, 6))
        return pa.table(
            {
                "doc_a": pa.array(keep_a, pa.int64()),
                "doc_b": pa.array(keep_b, pa.int64()),
                "jaccard": pa.array(keep_j, pa.float64()),
            }
        )

    return cand.map_batches(verify, batch_format="pyarrow", batch_size=8192)


# ---------------------------------------------------------------------------
# SimHash
# ---------------------------------------------------------------------------

def q_simhash(sf_dir: str):
    """64-bit SimHash per document (word-feature md5 hashes, sign-sum
    per bit). Deterministic; rows-only check (no SQL analog)."""
    ds = augmented_corpus(sf_dir)

    def fn(batch: pa.Table) -> pa.Table:
        out = []
        for text in batch["text"].to_pylist():
            words = (text or "").split()
            if not words:
                out.append(0)
                continue
            digests = b"".join(hashlib.md5(w.encode()).digest()[:8] for w in words)
            bits = np.unpackbits(
                np.frombuffer(digests, dtype=np.uint8).reshape(len(words), 8), axis=1
            ).astype(np.int32)
            acc = (bits * 2 - 1).sum(axis=0)
            sign_bits = np.packbits((acc > 0).astype(np.uint8))
            sh = int.from_bytes(sign_bits.tobytes(), "big")
            if sh >= 1 << 63:
                sh -= 1 << 64  # two's-complement into signed int64
            out.append(sh)
        return pa.table(
            {"doc_id": batch["doc_id"], "simhash": pa.array(out, pa.int64())}
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=8192)


def q_near_dup_clusters(sf_dir: str, threshold: float = 0.5):
    """Near-dup cluster resolution: verified MinHash pairs → connected
    components → one representative (min doc_id) per cluster. The
    candidate/pair set is provably small, so components resolve with
    driver-side union-find (the guide's sanctioned shape); at corpora
    where pairs don't fit a driver, the same result comes from a few
    rounds of min-label propagation via groupby. Returns
    (doc_id, cluster_rep) for every clustered document."""
    import pandas as pd

    pairs = q_near_dup_pairs(sf_dir, threshold).to_pandas()
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"], pairs["doc_b"]):
        ra, rb = find(int(a)), find(int(b))
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    rows = sorted((int(x), find(int(x))) for x in parent)
    return pd.DataFrame(
        {
            "doc_id": pd.Series([r[0] for r in rows], dtype="int64"),
            "cluster_rep": pd.Series([r[1] for r in rows], dtype="int64"),
        }
    )


QUERIES = {
    "dedup_exact": q_dedup_exact,
    "dup_pairs_exact": q_dup_pairs_exact,
    "near_dup_pairs": q_near_dup_pairs,
    "near_dup_clusters": q_near_dup_clusters,
    "simhash": q_simhash,
}

ORACLE_SQL = {
    "dedup_exact": _SQL_DEDUP_EXACT,
    "dup_pairs_exact": _SQL_DUP_PAIRS,
    # near_dup_pairs / simhash: sketch-based, rows-only by design
}
