"""BTE slope-curve tests: the vectorized Kadane (prefix sums +
running minima + first-win argmax) must equal a brute-force O(n²)
interval enumeration under the documented tie rules (max gain, then
smallest end block, then smallest start block)."""

import numpy as np

from pdf_parser_ray.stages.bte import bte_spans


def brute(doc, blk, nw, nl):
    tags = 1 + nl
    s = nw - tags
    out = []
    for d in np.unique(doc):
        idx = np.flatnonzero(doc == d)
        best = None
        for a in range(len(idx)):
            for b in range(a, len(idx)):
                seg = idx[a : b + 1]
                key = (-int(s[seg].sum()), b, a)
                if best is None or key < best[0]:
                    best = (key, a, b)
        _, a, b = best
        seg = idx[a : b + 1]
        out.append(
            (
                int(d),
                int(blk[idx[a]]),
                int(blk[idx[b]]),
                int(s[seg].sum()),
                int(nw[seg].sum()),
            )
        )
    return out


def test_bte_matches_bruteforce_random_streams():
    rng = np.random.RandomState(0)
    for trial in range(20):
        n_docs = rng.randint(1, 6)
        doc, blk, nw, nl = [], [], [], []
        for d in range(n_docs):
            n = rng.randint(1, 12)
            doc.extend([d] * n)
            blk.extend(range(n))
            nw.extend(rng.randint(0, 6, n).tolist())
            nl.extend(rng.randint(0, 4, n).tolist())
        doc = np.asarray(doc, np.int64)
        blk = np.asarray(blk, np.int64)
        nw = np.asarray(nw, np.int64)
        nl = np.asarray(nl, np.int64)
        d, sb, eb, sc, cw = bte_spans(doc, blk, nw, nl)
        got = list(zip(d.tolist(), sb.tolist(), eb.tolist(), sc.tolist(), cw.tolist()))
        assert got == brute(doc, blk, nw, nl), f"trial {trial}"


def test_bte_hand_case_with_ties():
    # doc 0: scores [-2, 3, -3, 3] — two intervals sum 3; first end wins
    # doc 1: all-negative scores — the single least-bad block wins
    doc = np.array([0, 0, 0, 0, 1, 1], np.int64)
    blk = np.array([0, 1, 2, 3, 0, 1], np.int64)
    nw = np.array([0, 4, 0, 4, 0, 1], np.int64)
    nl = np.array([1, 0, 2, 0, 2, 1], np.int64)  # tags = 1 + nl
    d, sb, eb, sc, cw = bte_spans(doc, blk, nw, nl)
    assert d.tolist() == [0, 1]
    assert sb.tolist() == [1, 1]
    assert eb.tolist() == [1, 1]
    assert sc.tolist() == [3, -1]
    assert cw.tolist() == [4, 1]
