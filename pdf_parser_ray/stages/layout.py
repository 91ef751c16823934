"""Layout-analysis stage: block segmentation, table-grid recovery,
and XY-cut reading order as Ray Data queries with exact DuckDB twins.

The north star names three published layout algorithms as the
replacement for the reference's bespoke CV pipeline (extractor.py's
hand-tuned row clustering, line scans and template matching):
**connected-component block segmentation**, **morphological line
detection for table-cell grids**, and **XY-cut reading-order
recovery**. The geometric kernels live in :mod:`..kernels.layout`;
this module runs them over a deterministic md5-synthesized box/ruling
geometry derived from ``documents.doc_id`` (the established
engine↔DuckDB parity device — ``temperature mix``,
stages/corpus.py:900-930), so every query carries a hash-exact SQL
oracle instead of a self-referential fixture:

* ``layout_blocks`` — dilated-overlap connected components per page;
  oracle = recursive reachability CTE (the near-dup-clusters shape,
  stages/dedup.py:1040).
* ``table_grid`` — merge collinear ruling segments within a tolerance
  (morphological CLOSE along the ruling axis), drop merged rulings
  shorter than a minimum span (morphological OPEN with a long
  structuring element — exactly how raster pipelines isolate table
  grids), then intersect surviving H×V rulings into a cell grid;
  oracle = LAG/SUM window gap-split.
* ``reading_order_xycut`` — DEPTH-UNROLLED XY-cut: four alternating
  widest-gap cuts (y, x, y, x) as four fully vectorized numpy passes
  over the whole batch — no per-document Python recursion — with the
  recursion replayed level-by-level in SQL (the PageRank unrolling
  precedent, stages/graph.py). The unbounded recursive kernel
  (kernels/layout.py) is pinned equal to the unrolled pass by the
  hypothesis suite wherever four levels converge.

Scale shape: all three queries are a single ``map_batches`` over a
one-column read — per-page work is bounded by the page (≤24 boxes),
there is NO shuffle, no driver materialization, and the synthesized
geometry stands in for the box tables a real layout parse emits
per-batch. At 100 TB these stages ride whatever partitioning the
corpus already has.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa

from ..kernels.layout import BLOCK_GX, BLOCK_GY, XY_TX, XY_TY, connected_boxes

PAGE_W = 1800  # x-origin domain; box x1 < 1800 + 200
N_BANDS = 8
BAND_H = 300
Y_JITTER = 120
NB_MIN, NB_MOD = 6, 19  # boxes per page ∈ [6, 24]

GRID_DOMAIN = 600
GRID_TOL = 12  # CLOSE: merge rulings within 12 units
GRID_MIN_LEN = 300  # OPEN: keep merged rulings spanning ≥ 300 units
NR_MIN, NR_MOD = 3, 8  # raw rulings per axis ∈ [3, 10]

XY_DEPTH = 4

_H6_SQL = "CAST('0x' || substr(md5({expr}), 1, 6) AS BIGINT)"


def _h6(s: str) -> int:
    return int(hashlib.md5(s.encode()).hexdigest()[:6], 16)


def _read_doc_ids(sf_dir: str):
    from ..io.sources import read_parquet_clean, sized_blocks

    path = f"{sf_dir}/documents.parquet"
    return read_parquet_clean(
        path, columns=["doc_id"], override_num_blocks=sized_blocks(path)
    )


# ---------------------------------------------------------------------------
# Deterministic page geometry (engine side; SQL twin in _SQL_BOXES)
# ---------------------------------------------------------------------------


def _synth_boxes(doc_ids: np.ndarray):
    """Per-doc box geometry from md5(doc_id) — y is band-quantized
    (8 bands of 300 units, ≤179-unit tall content) so blocks read
    like text lines: components can merge along a band but never
    across bands (inter-band clearance 121 > 2·BLOCK_GY)."""
    ids = doc_ids.tolist()
    nb = np.array([NB_MIN + _h6(f"lay:{d}") % NB_MOD for d in ids], dtype=np.int64)
    total = int(nb.sum())
    doc_idx = np.repeat(np.arange(len(ids), dtype=np.int64), nb)
    box_i = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(nb)[:-1])), nb
    )
    x0 = np.empty(total, dtype=np.int64)
    y0 = np.empty(total, dtype=np.int64)
    x1 = np.empty(total, dtype=np.int64)
    y1 = np.empty(total, dtype=np.int64)
    j = 0
    for d, k in zip(ids, nb.tolist()):
        for i in range(k):
            pre = f"lay:{d}:{i}:"
            band = _h6(pre + "b") % N_BANDS
            x = _h6(pre + "x") % PAGE_W
            y = band * BAND_H + _h6(pre + "y") % Y_JITTER
            x0[j] = x
            y0[j] = y
            x1[j] = x + 40 + _h6(pre + "w") % 160
            y1[j] = y + 12 + _h6(pre + "h") % 48
            j += 1
    return doc_idx, box_i, x0, y0, x1, y1


def _sql_h6(expr: str) -> str:
    return _H6_SQL.format(expr=expr)


_DOC_V = "CAST(d.doc_id AS VARCHAR)"
_BOX_KEY = f"'lay:' || {_DOC_V} || ':' || CAST(g.i AS VARCHAR)"

_SQL_BOXES = f"""
boxes AS (
    SELECT d.doc_id, g.i,
           {_sql_h6(_BOX_KEY + " || ':x'")} % {PAGE_W} AS x0,
           ({_sql_h6(_BOX_KEY + " || ':b'")} % {N_BANDS}) * {BAND_H}
               + {_sql_h6(_BOX_KEY + " || ':y'")} % {Y_JITTER} AS y0,
           {_sql_h6(_BOX_KEY + " || ':x'")} % {PAGE_W}
               + 40 + {_sql_h6(_BOX_KEY + " || ':w'")} % 160 AS x1,
           ({_sql_h6(_BOX_KEY + " || ':b'")} % {N_BANDS}) * {BAND_H}
               + {_sql_h6(_BOX_KEY + " || ':y'")} % {Y_JITTER}
               + 12 + {_sql_h6(_BOX_KEY + " || ':h'")} % 48 AS y1
    FROM documents d, generate_series(0, {NB_MIN + NB_MOD - 2}) AS g(i)
    WHERE g.i < {NB_MIN} + {_sql_h6("'lay:' || " + _DOC_V)} % {NB_MOD}
)"""


# ---------------------------------------------------------------------------
# layout_blocks — connected-component block segmentation
# ---------------------------------------------------------------------------


def q_layout_blocks(sf_dir: str):
    """Per-page block segmentation summary: boxes → dilated-overlap
    connected components (kernels/layout.py:connected_boxes, the
    public replacement for the reference's row-cluster block grouping,
    extractor.py:340-420). Emits per doc the box count, block count,
    largest block size and the sum of min-index block labels — four
    integers that pin the whole labelling.

    One map over a one-column read; the O(n²) pair test is bounded by
    the page (≤24 boxes), so cost is linear in pages regardless of
    corpus size, with no exchange anywhere."""

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(dids) == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    "n_boxes": pa.array([], pa.int64()),
                    "n_blocks": pa.array([], pa.int64()),
                    "max_block": pa.array([], pa.int64()),
                    "sum_rep": pa.array([], pa.int64()),
                }
            )
        doc_idx, _, x0, y0, x1, y1 = _synth_boxes(dids)
        n_docs = len(dids)
        n_boxes = np.zeros(n_docs, dtype=np.int64)
        n_blocks = np.zeros(n_docs, dtype=np.int64)
        max_block = np.zeros(n_docs, dtype=np.int64)
        sum_rep = np.zeros(n_docs, dtype=np.int64)
        starts = np.concatenate(
            ([0], np.flatnonzero(np.diff(doc_idx)) + 1, [len(doc_idx)])
        )
        for a, b in zip(starts[:-1], starts[1:]):
            d = int(doc_idx[a])
            labels = connected_boxes(x0[a:b], y0[a:b], x1[a:b], y1[a:b])
            n_boxes[d] = b - a
            uniq, counts = np.unique(labels, return_counts=True)
            n_blocks[d] = len(uniq)
            max_block[d] = counts.max()
            sum_rep[d] = labels.sum()
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_boxes": pa.array(n_boxes),
                "n_blocks": pa.array(n_blocks),
                "max_block": pa.array(max_block),
                "sum_rep": pa.array(sum_rep),
            }
        )

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


_SQL_LAYOUT_BLOCKS = f"""
WITH RECURSIVE {_SQL_BOXES},
e2 AS (
    SELECT a.doc_id, a.i AS s, b.i AS t
    FROM boxes a JOIN boxes b
      ON a.doc_id = b.doc_id AND a.i < b.i
     AND a.x0 <= b.x1 + {BLOCK_GX} AND b.x0 <= a.x1 + {BLOCK_GX}
     AND a.y0 <= b.y1 + {BLOCK_GY} AND b.y0 <= a.y1 + {BLOCK_GY}
),
edges AS (
    SELECT doc_id, s, t FROM e2
    UNION ALL SELECT doc_id, t, s FROM e2
),
reach(doc_id, node, r) AS (
    SELECT doc_id, s, s FROM edges
    UNION
    SELECT e.doc_id, e.t, reach.r
    FROM reach JOIN edges e ON e.doc_id = reach.doc_id AND e.s = reach.node
),
lbl AS (
    SELECT b.doc_id, b.i, CAST(COALESCE(MIN(reach.r), b.i) AS BIGINT) AS l
    FROM boxes b LEFT JOIN reach
      ON reach.doc_id = b.doc_id AND reach.node = b.i
    GROUP BY b.doc_id, b.i
),
blocks AS (SELECT doc_id, l, COUNT(*) AS c FROM lbl GROUP BY doc_id, l)
SELECT doc_id,
       CAST(SUM(c) AS BIGINT) AS n_boxes,
       CAST(COUNT(*) AS BIGINT) AS n_blocks,
       CAST(MAX(c) AS BIGINT) AS max_block,
       CAST(SUM(l * c) AS BIGINT) AS sum_rep
FROM blocks GROUP BY doc_id
"""


# ---------------------------------------------------------------------------
# table_grid — morphological ruling merge → cell grid
# ---------------------------------------------------------------------------


def q_table_grid(sf_dir: str):
    """Table-cell grid recovery from ruling segments, the box-space
    analog of raster morphological line detection (erode/dilate with a
    long horizontal / vertical structuring element): per axis, sort
    ruling positions, MERGE segments closer than GRID_TOL (close),
    KEEP merged rulings whose summed span ≥ GRID_MIN_LEN (open), then
    intersect the survivors into an (n_h−1)×(n_v−1) cell grid. The
    reference finds its checkbox grid with template matching
    (extractor.py:139-153); this is the general table-structure form.

    Fully vectorized across the batch: one lexsort + diff gap-split +
    reduceat merge for ALL documents' rulings at once — no per-doc
    Python loop after synthesis. No shuffle."""

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        ids = dids.tolist()
        n_docs = len(ids)
        if n_docs == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    **{
                        c: pa.array([], pa.int64())
                        for c in ("n_h", "n_v", "n_rows", "n_cols",
                                  "n_cells", "grid_sig")
                    },
                }
            )
        doc_l, ori_l, pos_l, len_l = [], [], [], []
        for di, d in enumerate(ids):
            for oi, o in enumerate(("h", "v")):
                nr = NR_MIN + _h6(f"grid:{d}:{o}:n") % NR_MOD
                for k in range(nr):
                    pre = f"grid:{d}:{o}:{k}:"
                    doc_l.append(di)
                    ori_l.append(oi)
                    pos_l.append(_h6(pre + "p") % GRID_DOMAIN)
                    len_l.append(100 + _h6(pre + "l") % 500)
        doc = np.array(doc_l, dtype=np.int64)
        ori = np.array(ori_l, dtype=np.int64)
        pos = np.array(pos_l, dtype=np.int64)
        ln = np.array(len_l, dtype=np.int64)
        k_arr = np.arange(len(doc), dtype=np.int64)
        order = np.lexsort((k_arr, pos, ori, doc))
        doc, ori, pos, ln = doc[order], ori[order], pos[order], ln[order]
        axis_key = doc * 2 + ori
        new_axis = np.empty(len(doc), dtype=bool)
        new_axis[0] = True
        new_axis[1:] = axis_key[1:] != axis_key[:-1]
        brk = np.empty(len(doc), dtype=bool)
        brk[0] = True
        brk[1:] = new_axis[1:] | (pos[1:] - pos[:-1] > GRID_TOL)
        gstart = np.flatnonzero(brk)
        mpos = pos[gstart]  # min of group: positions sorted
        mlen = np.add.reduceat(ln, gstart)
        gaxis = axis_key[gstart]
        kept = mlen >= GRID_MIN_LEN
        n_ax = np.zeros(n_docs * 2, dtype=np.int64)
        s_ax = np.zeros(n_docs * 2, dtype=np.int64)
        np.add.at(n_ax, gaxis[kept], 1)
        np.add.at(s_ax, gaxis[kept], mpos[kept])
        n_h, n_v = n_ax[0::2], n_ax[1::2]
        n_rows = np.maximum(n_h - 1, 0)
        n_cols = np.maximum(n_v - 1, 0)
        return pa.table(
            {
                "doc_id": batch["doc_id"],
                "n_h": pa.array(n_h),
                "n_v": pa.array(n_v),
                "n_rows": pa.array(n_rows),
                "n_cols": pa.array(n_cols),
                "n_cells": pa.array(n_rows * n_cols),
                "grid_sig": pa.array(s_ax[0::2] * 31 + s_ax[1::2]),
            }
        )

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


_RUL_KEY = f"'grid:' || {_DOC_V} || ':' || o.orient || ':' || CAST(g.k AS VARCHAR)"

_SQL_TABLE_GRID = f"""
WITH rul AS (
    SELECT d.doc_id, o.orient, g.k,
           {_sql_h6(_RUL_KEY + " || ':p'")} % {GRID_DOMAIN} AS p,
           100 + {_sql_h6(_RUL_KEY + " || ':l'")} % 500 AS slen
    FROM documents d,
         (SELECT 'h' AS orient UNION ALL SELECT 'v') o,
         generate_series(0, {NR_MIN + NR_MOD - 2}) AS g(k)
    WHERE g.k < {NR_MIN}
        + {_sql_h6("'grid:' || " + _DOC_V + " || ':' || o.orient || ':n'")}
          % {NR_MOD}
),
brk AS (
    SELECT *, CASE WHEN p - LAG(p) OVER (PARTITION BY doc_id, orient
                                         ORDER BY p, k) > {GRID_TOL}
                   THEN 1 ELSE 0 END AS b
    FROM rul
),
grp AS (
    SELECT *, SUM(b) OVER (PARTITION BY doc_id, orient ORDER BY p, k
                           ROWS BETWEEN UNBOUNDED PRECEDING
                           AND CURRENT ROW) AS gid
    FROM brk
),
merged AS (
    SELECT doc_id, orient, gid, MIN(p) AS mp, SUM(slen) AS mlen
    FROM grp GROUP BY doc_id, orient, gid
),
kept AS (SELECT * FROM merged WHERE mlen >= {GRID_MIN_LEN}),
agg AS (
    SELECT doc_id,
           SUM(CASE WHEN orient = 'h' THEN 1 ELSE 0 END) AS n_h,
           SUM(CASE WHEN orient = 'v' THEN 1 ELSE 0 END) AS n_v,
           COALESCE(SUM(CASE WHEN orient = 'h' THEN mp END), 0) AS sh,
           COALESCE(SUM(CASE WHEN orient = 'v' THEN mp END), 0) AS sv
    FROM kept GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(COALESCE(a.n_h, 0) AS BIGINT) AS n_h,
       CAST(COALESCE(a.n_v, 0) AS BIGINT) AS n_v,
       CAST(GREATEST(COALESCE(a.n_h, 0) - 1, 0) AS BIGINT) AS n_rows,
       CAST(GREATEST(COALESCE(a.n_v, 0) - 1, 0) AS BIGINT) AS n_cols,
       CAST(GREATEST(COALESCE(a.n_h, 0) - 1, 0)
            * GREATEST(COALESCE(a.n_v, 0) - 1, 0) AS BIGINT) AS n_cells,
       CAST(COALESCE(a.sh, 0) * 31 + COALESCE(a.sv, 0) AS BIGINT) AS grid_sig
FROM documents d LEFT JOIN agg a ON a.doc_id = d.doc_id
"""


# ---------------------------------------------------------------------------
# reading_order_xycut — depth-unrolled vectorized XY-cut
# ---------------------------------------------------------------------------

_SEG_BIG = 4096  # > any coordinate (max y1 = 7·300 + 119 + 59 = 2278)


def _xycut_unrolled(doc_idx, box_i, x0, y0, x1, y1, depth: int = XY_DEPTH):
    """Batch-vectorized depth-unrolled XY-cut: ``depth`` passes, each a
    single lexsort + segmented running max + reduceat argmax over ALL
    (doc, region) groups at once. Semantics per level match
    kernels/layout.py:xy_cut_order exactly (widest gap, ties to the
    smallest cut coordinate, dry regions pass through)."""
    n = len(doc_idx)
    r = np.zeros(n, dtype=np.int64)
    idx = np.arange(n, dtype=np.int64)
    for level in range(depth):
        vertical = level % 2 == 0
        s = y0 if vertical else x0
        e = y1 if vertical else x1
        t = XY_TY if vertical else XY_TX
        key = doc_idx * (1 << depth) + r
        order = np.lexsort((box_i, e, s, key))
        ks, ss, ee = key[order], s[order], e[order]
        seg_change = np.empty(n, dtype=bool)
        seg_change[0] = True
        seg_change[1:] = ks[1:] != ks[:-1]
        seg_id = np.cumsum(seg_change) - 1
        p_incl = np.maximum.accumulate(ee + seg_id * _SEG_BIG)
        runmax = np.empty(n, dtype=np.int64)
        runmax[0] = -1
        runmax[1:] = p_incl[:-1] - seg_id[1:] * _SEG_BIG
        valid = ~seg_change & (ss - runmax >= t)
        score = np.where(valid, (ss - runmax) * _SEG_BIG + (_SEG_BIG - 1 - ss), -1)
        gstart = np.flatnonzero(seg_change)
        seg_max = np.maximum.reduceat(score, gstart)
        cand = valid & (score == seg_max[seg_id])
        cut_pos = np.maximum.reduceat(np.where(cand, ss, -1), gstart)
        has_cut = seg_max >= t * _SEG_BIG
        side = has_cut[seg_id] & (ss >= cut_pos[seg_id])
        new_r = 2 * r[order] + side
        r[order] = new_r
    out = np.empty(n, dtype=np.int64)
    final = np.lexsort((box_i, x0, y0, r, doc_idx))
    dsorted = doc_idx[final]
    doc_change = np.empty(n, dtype=bool)
    doc_change[0] = True
    doc_change[1:] = dsorted[1:] != dsorted[:-1]
    doc_start = np.maximum.accumulate(np.where(doc_change, idx, 0))
    out[final] = idx - doc_start
    return out


def q_reading_order_xycut(sf_dir: str):
    """Reading-order recovery by XY-cut over the synthesized page
    boxes: four alternating widest-gap cuts (y, x, y, x), then
    ``(region, y0, x0, i)`` ordering — emits the full per-document
    permutation ``(doc_id, i, pos)``. The reference recovers reading
    order implicitly through its ordered per-page scans
    (extractor.py:340-420, O1-O4 sort contracts); XY-cut is the
    published general form. Vectorized end to end: the level loop is
    over DEPTH (4), never over documents or rows."""

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        if len(dids) == 0:
            return pa.table(
                {c: pa.array([], pa.int64()) for c in ("doc_id", "i", "pos")}
            )
        doc_idx, box_i, x0, y0, x1, y1 = _synth_boxes(dids)
        pos = _xycut_unrolled(doc_idx, box_i, x0, y0, x1, y1)
        return pa.table(
            {
                "doc_id": pa.array(dids[doc_idx]),
                "i": pa.array(box_i),
                "pos": pa.array(pos),
            }
        )

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def _sql_xycut() -> str:
    parts = [f"WITH {_SQL_BOXES},"]
    parts.append(
        "lvl0 AS (SELECT doc_id, i, x0, y0, x1, y1, 0 AS r FROM boxes)"
    )
    for level in range(XY_DEPTH):
        a0, a1 = ("y0", "y1") if level % 2 == 0 else ("x0", "x1")
        t = XY_TY if level % 2 == 0 else XY_TX
        parts.append(
            f""",
rm{level} AS (
    SELECT *, MAX({a1}) OVER (PARTITION BY doc_id, r ORDER BY {a0}, {a1}, i
                              ROWS BETWEEN UNBOUNDED PRECEDING
                              AND 1 PRECEDING) AS runmax
    FROM lvl{level}
),
cut{level} AS (
    SELECT doc_id, r, c FROM (
        SELECT doc_id, r, {a0} AS c,
               ROW_NUMBER() OVER (PARTITION BY doc_id, r
                                  ORDER BY ({a0} - runmax) DESC, {a0} ASC) AS rn
        FROM rm{level}
        WHERE runmax IS NOT NULL AND {a0} - runmax >= {t}
    ) q WHERE rn = 1
),
lvl{level + 1} AS (
    SELECT p.doc_id, p.i, p.x0, p.y0, p.x1, p.y1,
           2 * p.r + CASE WHEN c.c IS NOT NULL AND p.{a0} >= c.c
                          THEN 1 ELSE 0 END AS r
    FROM lvl{level} p
    LEFT JOIN cut{level} c ON c.doc_id = p.doc_id AND c.r = p.r
)"""
        )
    parts.append(
        f"""
SELECT doc_id, i,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY r, y0, x0, i)
            - 1 AS BIGINT) AS pos
FROM lvl{XY_DEPTH}"""
    )
    return "".join(parts)


def q_reading_order_inversions(sf_dir: str):
    """Per-document Kendall-tau DISTANCE between the XY-cut recovered
    reading order and the synthesis order — the extraction-quality
    metric for reading-order recovery itself: 0 inversions means the
    cut tree reproduced the author order exactly, a high count flags
    multi-column or interleaved layouts where recovered order diverges
    (the number a layout-parser regression suite watches per corpus
    slice). Emits ``(doc_id, n_boxes, n_pairs, n_inversions,
    inversion_ppm)`` with ``inversion_ppm = _rhalf(10⁶·inv, pairs)``.

    Exactness: pure integer pair counting over the same deterministic
    box synthesis + depth-unrolled XY-cut as ``reading_order_xycut``;
    the oracle composes that query's full SQL as a CTE and counts
    discordant (i < j, pos_i > pos_j) pairs by self-join.

    Shape: zero-shuffle single map. Boxes per page are bounded
    (∈ [NB_MIN, NB_MIN + NB_MOD − 1] = [6, 24]), so per-batch
    inversion counting is ONE padded (docs × n × n) boolean
    broadcast — no per-doc Python loop, no pair rows ever leave the
    task."""
    from ..relational.ops import _rhalf

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cols = ("doc_id", "n_boxes", "n_pairs", "n_inversions", "inversion_ppm")
        if len(dids) == 0:
            return pa.table({c: pa.array([], pa.int64()) for c in cols})
        doc_idx, box_i, x0, y0, x1, y1 = _synth_boxes(dids)
        pos = _xycut_unrolled(doc_idx, box_i, x0, y0, x1, y1)
        n_docs = len(dids)
        nb = np.bincount(doc_idx, minlength=n_docs).astype(np.int64)
        w = int(nb.max())
        # padded position matrix: P[d, i] = reading pos of box i
        P = np.zeros((n_docs, w), dtype=np.int64)
        P[doc_idx, box_i] = pos
        valid = np.zeros((n_docs, w), dtype=bool)
        valid[doc_idx, box_i] = True
        iu, ju = np.triu_indices(w, 1)
        disc = (
            (P[:, iu] > P[:, ju]) & valid[:, iu] & valid[:, ju]
        ).sum(axis=1).astype(np.int64)
        pairs = nb * (nb - 1) // 2
        ppm = np.array(
            [_rhalf(10**6 * int(d), int(p)) for d, p in zip(disc, pairs)],
            dtype=np.int64,
        )
        return pa.table(
            {
                "doc_id": pa.array(dids.astype(np.int64), pa.int64()),
                "n_boxes": pa.array(nb, pa.int64()),
                "n_pairs": pa.array(pairs, pa.int64()),
                "n_inversions": pa.array(disc, pa.int64()),
                "inversion_ppm": pa.array(ppm, pa.int64()),
            }
        )

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


def _sql_inversions() -> str:
    return f"""
WITH xy AS ({_sql_xycut()})
SELECT a.doc_id,
       CAST(MAX(b.i) + 1 AS BIGINT) AS n_boxes,
       CAST(COUNT(*) AS BIGINT) AS n_pairs,
       CAST(SUM(CASE WHEN a.pos > b.pos THEN 1 ELSE 0 END) AS BIGINT)
           AS n_inversions,
       CAST((2*1000000*SUM(CASE WHEN a.pos > b.pos THEN 1 ELSE 0 END)
             + COUNT(*)) // (2*COUNT(*)) AS BIGINT) AS inversion_ppm
FROM xy a JOIN xy b ON a.doc_id = b.doc_id AND a.i < b.i
GROUP BY a.doc_id
"""


QUERIES = {
    "layout_blocks": q_layout_blocks,
    "table_grid": q_table_grid,
    "reading_order_xycut": q_reading_order_xycut,
    "reading_order_inversions": q_reading_order_inversions,
}

ORACLE_SQL = {
    "layout_blocks": _SQL_LAYOUT_BLOCKS,
    "table_grid": _SQL_TABLE_GRID,
    "reading_order_xycut": _sql_xycut(),
    "reading_order_inversions": _sql_inversions(),
}
