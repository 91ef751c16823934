"""Classic document-layout-analysis kernels: connected-component
block segmentation and XY-cut reading-order recovery.

These are the two published layout algorithms the north star names as
the replacement for the reference's bespoke CV pipeline (the
reference recovers structure with hand-tuned row clustering and
ordered scans — extractor.py:340-420's line grouping and
sections/region growth); here the same recovery is expressed as the
standard public algorithms over box geometry:

* **connected components** (block segmentation): two boxes belong to
  the same block when their rectangles, dilated by a (gx, gy)
  structuring margin, intersect — the box-space equivalent of
  morphological closing followed by connected-component labelling on
  a rendered page mask.
* **recursive XY-cut** (Nagy & Seth 1984): alternately split a region
  at the widest empty gap in its y- then x-projection profile until
  neither axis has a qualifying gap; reading order is the depth-first
  top/left-first traversal of the cut tree.

Both kernels are pure functions over ``(x0, y0, x1, y1)`` int arrays —
no raster, no I/O — so the Ray stage (:mod:`..stages.layout`) can run
them inside ``map_batches`` and the exact same arithmetic can be
replayed by a DuckDB oracle (integer comparisons only, no floats).
"""

from __future__ import annotations

import numpy as np

# Dilation margins for block segmentation: generous in x (labels and
# their answer boxes sit on one line far apart), tight in y (lines on
# different bands must not fuse) — same intent as the reference's
# row-gap constants (extractor.py:69-75), but applied symmetrically.
BLOCK_GX = 150
BLOCK_GY = 20

# Minimum projection-gap width that justifies a cut, per axis. A
# y-gap is cheap to create (line leading), an x-gap must be wider to
# count as a column gutter.
XY_TY = 40
XY_TX = 60


def connected_boxes(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    gx: int = BLOCK_GX,
    gy: int = BLOCK_GY,
) -> np.ndarray:
    """Label boxes by connected component; label = min box index
    reachable through the dilated-overlap relation.

    Overlap after dilation is the closed test
    ``a.x0 <= b.x1 + gx AND b.x0 <= a.x1 + gx`` (and likewise in y) —
    closed on both sides so the relation is symmetric and the DuckDB
    twin can state it identically. O(n²) pair test via broadcasting;
    page-level n is tens of boxes, so the quadratic term is bounded by
    the page, never the corpus (same argument as the reference's
    per-page scans, extractor.py:340-420).
    """
    n = len(x0)
    labels = np.arange(n, dtype=np.int64)
    if n < 2:
        return labels
    ox = (x0[:, None] <= x1[None, :] + gx) & (x0[None, :] <= x1[:, None] + gx)
    oy = (y0[:, None] <= y1[None, :] + gy) & (y0[None, :] <= y1[:, None] + gy)
    adj = ox & oy
    # Union-find over the upper triangle; path-halving keeps it tiny.
    parent = list(range(n))

    def find(a: int) -> int:
        while parent[a] != a:
            parent[a] = parent[parent[a]]
            a = parent[a]
        return a

    rows, cols = np.nonzero(np.triu(adj, k=1))
    for a, b in zip(rows.tolist(), cols.tolist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by smaller root so the representative IS the min
            # index — matches the oracle's MIN(reachable) labelling.
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    for k in range(n):
        labels[k] = find(k)
    return labels


def _widest_gap(
    s: np.ndarray, e: np.ndarray, members: np.ndarray, threshold: int
) -> int | None:
    """Cut coordinate of the widest qualifying gap in the projection
    ``[s, e)`` of ``members``, or None. The gap between the running
    max of interval ends and the next interval start; widest wins,
    ties break to the smallest cut coordinate. Sort key includes the
    box index purely to make the scan order total — equal (s, e) rows
    cannot create distinct gaps, so the result is order-independent.
    """
    if len(members) < 2:
        return None
    order = np.lexsort((members, e[members], s[members]))
    ss = s[members][order]
    ee = e[members][order]
    runmax = np.maximum.accumulate(ee)
    gap_w = ss[1:] - runmax[:-1]
    ok = gap_w >= threshold
    if not ok.any():
        return None
    w = gap_w[ok]
    c = ss[1:][ok]
    best = np.lexsort((c, -w))[0]
    return int(c[best])


def xy_cut_order(
    x0: np.ndarray,
    y0: np.ndarray,
    x1: np.ndarray,
    y1: np.ndarray,
    ty: int = XY_TY,
    tx: int = XY_TX,
    max_depth: int | None = None,
) -> np.ndarray:
    """Reading-order rank per box by recursive XY-cut.

    Depth ``d`` cuts along y when ``d`` is even, x when odd — top-to-
    bottom before left-to-right, the Manhattan reading order. Each
    level splits at the single WIDEST projection gap (ties: smallest
    cut coordinate); a region whose axis has no qualifying gap passes
    through to the next level unchanged, and becomes a leaf when both
    axes are dry. ``max_depth=D`` is the unrolled variant the Ray
    stage ships (D fixed vectorized passes and an exactly replayable
    DuckDB oracle — the PageRank unrolling precedent, stages/graph.py);
    since a twice-dry region never cuts again, ``max_depth=None`` and
    any sufficiently deep D agree (pinned by the hypothesis suite).
    Leaf regions order by ``(y0, x0, index)``.
    """
    n = len(x0)
    rank = np.empty(n, dtype=np.int64)
    pos = 0

    def emit(members: np.ndarray) -> None:
        nonlocal pos
        order = np.lexsort((members, x0[members], y0[members]))
        m = members[order]
        rank[m] = np.arange(pos, pos + len(m))
        pos += len(m)

    def walk(members: np.ndarray, depth: int, dry_streak: int) -> None:
        if len(members) <= 1 or dry_streak >= 2 or (
            max_depth is not None and depth >= max_depth
        ):
            emit(members)
            return
        vertical = depth % 2 == 0
        s, e = (y0, y1) if vertical else (x0, x1)
        c = _widest_gap(s, e, members, ty if vertical else tx)
        if c is None:
            walk(members, depth + 1, dry_streak + 1)
            return
        sv = s[members]
        walk(members[sv < c], depth + 1, 0)
        walk(members[sv >= c], depth + 1, 0)

    walk(np.arange(n, dtype=np.int64), 0, 0)
    return rank
