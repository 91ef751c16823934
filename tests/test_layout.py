"""Layout-analysis kernels and stage (kernels/layout.py, stages/layout.py):
connected-component block segmentation, morphological table-grid
recovery, and XY-cut reading order.

Covers: hand-built geometry units for each kernel, the hypothesis pin
that the batch-vectorized depth-unrolled XY-cut (the Ray stage's path)
equals the recursive reference kernel wherever four levels converge,
and a small engine-vs-naive check for the grid merge semantics.
"""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.kernels.layout import (
    BLOCK_GX,
    BLOCK_GY,
    XY_TX,
    XY_TY,
    connected_boxes,
    xy_cut_order,
)
from pdf_parser_ray.stages.layout import (
    GRID_MIN_LEN,
    GRID_TOL,
    XY_DEPTH,
    _synth_boxes,
    _xycut_unrolled,
)


def _arr(*vals):
    return np.array(vals, dtype=np.int64)


# ---------------------------------------------------------------------------
# connected_boxes
# ---------------------------------------------------------------------------


class TestConnectedBoxes:
    def test_empty_and_singleton(self):
        assert connected_boxes(_arr(), _arr(), _arr(), _arr()).tolist() == []
        assert connected_boxes(_arr(0), _arr(0), _arr(10), _arr(10)).tolist() == [0]

    def test_two_far_boxes_stay_separate(self):
        # x-gap of BLOCK_GX+1 between box0.x1 and box1.x0 → no merge
        lab = connected_boxes(
            _arr(0, 100 + BLOCK_GX + 1), _arr(0, 0), _arr(100, 200 + BLOCK_GX), _arr(10, 10)
        )
        assert lab.tolist() == [0, 1]

    def test_gap_exactly_at_margin_merges(self):
        # closed test: b.x0 == a.x1 + gx merges (boundary inclusive)
        lab = connected_boxes(
            _arr(0, 100 + BLOCK_GX), _arr(0, 0), _arr(100, 300), _arr(10, 10)
        )
        assert lab.tolist() == [0, 0]

    def test_transitive_chain_gets_min_label(self):
        # a-b overlap, b-c overlap, a-c do not: one component labelled 0
        lab = connected_boxes(
            _arr(0, 120, 240),
            _arr(0, 0, 0),
            _arr(100, 220, 340),
            _arr(10, 10, 10),
            gx=30,
            gy=5,
        )
        assert lab.tolist() == [0, 0, 0]

    def test_y_margin_blocks_merge_across_bands(self):
        # same x span, y separated by 2*BLOCK_GY + 1 → distinct blocks
        lab = connected_boxes(
            _arr(0, 0), _arr(0, 10 + BLOCK_GY + 1), _arr(100, 100), _arr(10, 20 + BLOCK_GY)
        )
        assert lab.tolist() == [0, 1]

    def test_label_is_min_reachable_index(self):
        # boxes given in an order where the chain closes late; every
        # member must still carry the MIN index of its component.
        lab = connected_boxes(
            _arr(500, 0, 250),
            _arr(0, 0, 0),
            _arr(600, 300, 550),
            _arr(10, 10, 10),
            gx=0,
            gy=0,
        )
        assert lab.tolist() == [0, 0, 0]


# ---------------------------------------------------------------------------
# xy_cut_order (recursive kernel)
# ---------------------------------------------------------------------------


class TestXYCutOrder:
    def test_single_column_is_top_to_bottom(self):
        # three stacked lines, wide y gaps: rank follows y
        r = xy_cut_order(_arr(0, 0, 0), _arr(200, 0, 100), _arr(50, 50, 50), _arr(210, 10, 110))
        assert r.tolist() == [2, 0, 1]

    def test_two_columns_left_before_right(self):
        # no y gap ≥ ty; one x gutter ≥ tx → left column fully
        # precedes right column, each top-to-bottom
        x0 = _arr(0, 0, 300, 300)
        y0 = _arr(0, 20, 0, 20)
        x1 = _arr(100, 100, 400, 400)
        y1 = _arr(15, 35, 15, 35)
        r = xy_cut_order(x0, y0, x1, y1, ty=XY_TY, tx=XY_TX)
        assert r.tolist() == [0, 1, 2, 3]

    def test_widest_gap_wins_over_first_gap(self):
        # two y gaps: 50 then 120 — the cut must land in the 120 gap,
        # so the top region keeps boxes 0 and 1 together at depth 0.
        y0 = _arr(0, 60, 200)
        y1 = _arr(10, 80, 240)
        r = xy_cut_order(_arr(0, 0, 0), y0, _arr(50, 50, 50), y1, ty=40, tx=60)
        assert r.tolist() == [0, 1, 2]

    def test_no_gap_leaf_orders_by_y_then_x(self):
        # dry on both axes: plain (y0, x0, index) ordering
        r = xy_cut_order(_arr(30, 0, 0), _arr(0, 0, 5), _arr(60, 30, 30), _arr(10, 10, 15))
        assert r.tolist() == [1, 0, 2]


# ---------------------------------------------------------------------------
# unrolled stage kernel == recursive kernel (per-document)
# ---------------------------------------------------------------------------


def _rank_from_unrolled(doc_idx, box_i, x0, y0, x1, y1):
    return _xycut_unrolled(doc_idx, box_i, x0, y0, x1, y1, depth=XY_DEPTH)


boxes_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=1800),  # x
        st.integers(min_value=0, max_value=2300),  # y
        st.integers(min_value=1, max_value=220),  # w
        st.integers(min_value=1, max_value=80),  # h
    ),
    min_size=1,
    max_size=24,
)


@settings(max_examples=200, deadline=None)
@given(boxes_strategy)
def test_unrolled_equals_recursive_at_same_depth(boxes):
    """The Ray stage's batch-vectorized unrolled pass must compute the
    exact permutation of the recursive kernel capped at the same depth
    — same widest-gap choice, same tie-break, same dry pass-through."""
    x0 = np.array([b[0] for b in boxes], dtype=np.int64)
    y0 = np.array([b[1] for b in boxes], dtype=np.int64)
    x1 = x0 + np.array([b[2] for b in boxes], dtype=np.int64)
    y1 = y0 + np.array([b[3] for b in boxes], dtype=np.int64)
    n = len(boxes)
    doc_idx = np.zeros(n, dtype=np.int64)
    box_i = np.arange(n, dtype=np.int64)
    unrolled = _rank_from_unrolled(doc_idx, box_i, x0, y0, x1, y1)
    recursive = xy_cut_order(x0, y0, x1, y1, max_depth=XY_DEPTH)
    assert unrolled.tolist() == recursive.tolist()


@settings(max_examples=100, deadline=None)
@given(boxes_strategy)
def test_deep_cap_equals_unbounded(boxes):
    """Any capped rank is a valid permutation, and a cap beyond the
    deepest possible cut tree equals unbounded recursion.

    The earlier formulation inferred convergence from ``r4 == r6`` —
    unsound, and hypothesis eventually found the counterexample: a cut
    whose sub-regions happen to emit in the leaf ``(y0, x0)`` order is
    INVISIBLE to that comparison, so a later cut on the other axis can
    still reorder. The sound bound: every root-to-leaf path alternates
    cuts (each strictly shrinking the region, ≤ n−1 of them) with at
    most two consecutive dry pass-through levels, so depth
    ``2·n + 4`` can never be the binding constraint."""
    x0 = np.array([b[0] for b in boxes], dtype=np.int64)
    y0 = np.array([b[1] for b in boxes], dtype=np.int64)
    x1 = x0 + np.array([b[2] for b in boxes], dtype=np.int64)
    y1 = y0 + np.array([b[3] for b in boxes], dtype=np.int64)
    r4 = xy_cut_order(x0, y0, x1, y1, max_depth=4)
    assert sorted(r4.tolist()) == list(range(len(boxes)))
    deep = xy_cut_order(x0, y0, x1, y1, max_depth=2 * len(boxes) + 4)
    rinf = xy_cut_order(x0, y0, x1, y1, max_depth=None)
    assert deep.tolist() == rinf.tolist()


def test_unrolled_multi_doc_independence():
    """Ranks within one document must not depend on which other
    documents share the batch (doc boundaries are hard segment walls
    in the vectorized pass)."""
    rng = np.random.RandomState(7)
    n_docs, per = 12, 9
    x0 = rng.randint(0, 1800, n_docs * per).astype(np.int64)
    y0 = rng.randint(0, 2300, n_docs * per).astype(np.int64)
    x1 = x0 + rng.randint(1, 220, n_docs * per)
    y1 = y0 + rng.randint(1, 80, n_docs * per)
    doc_idx = np.repeat(np.arange(n_docs, dtype=np.int64), per)
    box_i = np.tile(np.arange(per, dtype=np.int64), n_docs)
    full = _rank_from_unrolled(doc_idx, box_i, x0, y0, x1, y1)
    for d in range(n_docs):
        m = doc_idx == d
        solo = _rank_from_unrolled(
            np.zeros(per, dtype=np.int64),
            box_i[m],
            x0[m],
            y0[m],
            x1[m],
            y1[m],
        )
        assert full[m].tolist() == solo.tolist()


# ---------------------------------------------------------------------------
# synthesized geometry invariants + grid merge semantics
# ---------------------------------------------------------------------------


def test_synth_boxes_band_clearance():
    """Band quantization promise from the stage docstring: content is
    ≤179 units tall inside a 300-unit band, so inter-band clearance
    (≥121) always exceeds 2·BLOCK_GY and blocks never fuse across
    bands."""
    doc_idx, _, x0, y0, x1, y1 = _synth_boxes(
        np.array([f"doc{k}" for k in range(50)], dtype=object)
    )
    assert ((y1 - y0) <= 60).all() and ((y0 % 300) < 120).all()
    assert (x1 > x0).all()
    band = y0 // 300
    top_in_band = y1 - band * 300
    assert (top_in_band <= 179).all()


def test_grid_merge_naive_equivalence():
    """table_grid's vectorized gap-split merge == a naive per-axis scan
    (close within GRID_TOL, open at GRID_MIN_LEN)."""
    rng = np.random.RandomState(3)
    pos = np.sort(rng.randint(0, 600, 14)).astype(np.int64)
    ln = rng.randint(100, 600, 14).astype(np.int64)
    # naive merge
    groups, cur = [], [0]
    for k in range(1, len(pos)):
        if pos[k] - pos[k - 1] > GRID_TOL:
            groups.append(cur)
            cur = []
        cur.append(k)
    groups.append(cur)
    naive = [
        (int(pos[g[0]]), int(ln[g].sum()))
        for g in groups
        if ln[g].sum() >= GRID_MIN_LEN
    ]
    # vectorized shape used by the stage
    brk = np.empty(len(pos), dtype=bool)
    brk[0] = True
    brk[1:] = pos[1:] - pos[:-1] > GRID_TOL
    gstart = np.flatnonzero(brk)
    mpos = pos[gstart]
    mlen = np.add.reduceat(ln, gstart)
    kept = mlen >= GRID_MIN_LEN
    vec = list(zip(mpos[kept].tolist(), mlen[kept].tolist()))
    assert vec == naive


@pytest.mark.usefixtures("ray_session")
def test_layout_queries_smoke():
    """All three layout queries run end-to-end at sf0.001 with stable
    schemas and full per-doc coverage."""
    from pdf_parser_ray.stages.layout import QUERIES

    sf = "/root/testdata/sf0.001"
    blocks = QUERIES["layout_blocks"](sf).to_pandas()
    assert set(blocks.columns) == {
        "doc_id", "n_boxes", "n_blocks", "max_block", "sum_rep"
    }
    assert (blocks["n_blocks"] <= blocks["n_boxes"]).all()
    assert (blocks["n_boxes"] >= 6).all() and (blocks["n_boxes"] <= 24).all()
    grid = QUERIES["table_grid"](sf).to_pandas()
    assert (grid["n_cells"] == grid["n_rows"] * grid["n_cols"]).all()
    order = QUERIES["reading_order_xycut"](sf).to_pandas()
    # pos is a permutation of 0..n-1 per doc
    g = order.groupby("doc_id")["pos"]
    assert (g.min() == 0).all()
    assert (g.max() == g.count() - 1).all()
    assert order.groupby("doc_id")["pos"].nunique().equals(g.count())
    assert len(blocks) == len(grid) == order["doc_id"].nunique()


def test_reading_order_inversions_brute_force():
    """The padded (docs × n × n) broadcast inversion count equals a
    per-doc Python brute force over the same synthesis + XY-cut."""
    import numpy as np

    from pdf_parser_ray.stages.layout import _synth_boxes, _xycut_unrolled

    dids = np.arange(40, dtype=np.int64)
    doc_idx, box_i, x0, y0, x1, y1 = _synth_boxes(dids)
    pos = _xycut_unrolled(doc_idx, box_i, x0, y0, x1, y1)

    # brute force per doc
    want = {}
    for d in range(len(dids)):
        p = pos[doc_idx == d]
        inv = sum(
            1
            for i in range(len(p))
            for j in range(i + 1, len(p))
            if p[i] > p[j]
        )
        want[int(dids[d])] = (len(p), inv)

    # padded broadcast (the engine formulation)
    n_docs = len(dids)
    nb = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
    w = int(nb.max())
    P = np.zeros((n_docs, w), dtype=np.int64)
    P[doc_idx, box_i] = pos
    valid = np.zeros((n_docs, w), dtype=bool)
    valid[doc_idx, box_i] = True
    iu, ju = np.triu_indices(w, 1)
    disc = ((P[:, iu] > P[:, ju]) & valid[:, iu] & valid[:, ju]).sum(axis=1)
    for d in range(n_docs):
        assert (int(nb[d]), int(disc[d])) == want[int(dids[d])]
