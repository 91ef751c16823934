"""Small shared helpers."""

from __future__ import annotations

import hashlib


# Default heap budget for a broadcast join build side: the key set
# rides inside every map task, so it must stay far below a worker's
# heap. 64 MiB ≈ 8M int64 keys — past that the shuffle twin wins
# (millions of keys re-shipped to thousands of tasks).
BROADCAST_BUDGET_BYTES = 64 << 20


def broadcast_build_fits(
    parquet_path: str,
    bytes_per_key: int = 8,
    budget_bytes: int = BROADCAST_BUDGET_BYTES,
) -> bool:
    """Measured broadcast-vs-shuffle crossover for a join build side.

    Reads ONLY the parquet footer (row count — no data pages touched),
    upper-bounds the broadcast key set as ``rows × bytes_per_key``, and
    returns whether it fits the heap budget. Callers use this to pick
    the broadcast shape (key set rides to every task; no second
    shuffle) while it is safe and the bucket-shuffle twin beyond —
    one measured rule instead of shipping the choice as two queries."""
    import pyarrow.parquet as pq

    n_rows = pq.ParquetFile(parquet_path).metadata.num_rows
    return n_rows * bytes_per_key <= budget_bytes


def hash_bucket(value, n_buckets: int) -> int:
    """Deterministic md5-prefix bucket for an arbitrary value — never
    the process-seeded builtin ``hash``. The single definition backing
    both the resumable sink's partition routing and the coarse-bucket
    shuffles that key on strings."""
    return (
        int.from_bytes(hashlib.md5(str(value).encode()).digest()[:4], "big")
        % n_buckets
    )
