"""simhash_dup_pairs: the pigeonhole banding must be LOSSLESS for
Hamming ≤ 3 — the banded engine result equals the brute-force
all-pairs set, and every exact-duplicate pair (Hamming 0) appears."""

import numpy as np

SF = "/root/testdata/sf0.001"


def _popcount(x: np.ndarray) -> np.ndarray:
    tbl = np.unpackbits(np.arange(256, dtype=np.uint8)[:, None], axis=1).sum(axis=1)
    return tbl[x.view(np.uint8).reshape(len(x), 8)].sum(axis=1)


def test_banding_is_lossless_vs_bruteforce(ray_session):
    from pdf_parser_ray.stages.dedup import (
        SIMHASH_MAX_HAMMING,
        q_simhash,
        q_simhash_dup_pairs,
    )

    sh = q_simhash(SF).to_pandas().sort_values("doc_id")
    ids = sh["doc_id"].to_numpy(dtype=np.int64)
    h = sh["simhash"].to_numpy(dtype=np.int64).view(np.uint64)

    brute = set()
    for i in range(len(ids) - 1):
        ham = _popcount(np.bitwise_xor(h[i + 1 :], h[i]))
        for j in np.flatnonzero(ham <= SIMHASH_MAX_HAMMING):
            brute.add((int(ids[i]), int(ids[i + 1 + j])))

    got = q_simhash_dup_pairs(SF).to_pandas()
    got_pairs = set(zip(got.doc_a.tolist(), got.doc_b.tolist()))
    assert got_pairs == brute
    assert len(got) == len(got_pairs)  # no duplicate pair rows

    # the augmented corpus plants exact duplicates — Hamming 0 pairs
    # must be present (the banding can never drop them)
    zero = {
        (int(a), int(b))
        for (a, b) in brute
        if h[np.searchsorted(ids, a)] == h[np.searchsorted(ids, b)]
    }
    assert zero and zero <= got_pairs
