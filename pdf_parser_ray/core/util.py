"""Small shared helpers."""

from __future__ import annotations

import hashlib


def hash_bucket(value, n_buckets: int) -> int:
    """Deterministic md5-prefix bucket for an arbitrary value — never
    the process-seeded builtin ``hash``. The single definition backing
    both the resumable sink's partition routing and the coarse-bucket
    shuffles that key on strings."""
    return (
        int.from_bytes(hashlib.md5(str(value).encode()).digest()[:4], "big")
        % n_buckets
    )
