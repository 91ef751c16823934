"""DOM-heuristic main-content extraction: Readability-style candidate
scoring as Ray Data queries with exact DuckDB twins.

The north star's third extraction tier (after the HTML
boilerplate-strip block classifier, stages/boilerplate.py, and the
PDF/layout parse, stages/layout.py) is **DOM heuristics**: the
published Readability / Arc90 algorithm scores candidate container
nodes by the sum of their paragraph-child scores, down-weights the
winner by its link density, and extracts the winning subtree's
paragraphs in document order. The reference achieves the same
selection with its bespoke section detector + best-candidate argmax
(section_detector.py's region growth and scoring, A2/A3 in SURVEY §2);
here it is the standard public algorithm in integer-exact form:

* paragraph score  = ``max(words − 3·links, 0)``  (Readability's
  comma/length points, reduced to the deterministic word/link form)
* candidate score  = ``Σ paragraph scores``
* final score      = ``candidate · (10⁶ − link_density_ppm)`` where
  ``link_density_ppm = (links·10⁶) // (words + links)`` — the
  link-density down-weighting, in exact parts-per-million so the
  engine and the SQL twin agree bit-for-bit.
* winner           = argmax final, ties to the smallest node id.

Like the layout stage, the DOM tree is md5-synthesized from
``documents.doc_id`` (the established engine↔DuckDB parity device) —
2–5 candidate containers per document, 1–6 paragraphs each — so both
queries carry hash-exact SQL oracles instead of fixtures:

* ``main_content_dom``  — per-document winner + tree statistics.
* ``dom_main_spans``    — the winning container's paragraphs as an
  ordered span sequence (the north rule's span-sequence-equality
  shape: one row per span, position-keyed).

Scale shape: one ``map_batches`` over a one-column read; per-document
work is bounded by the tree (≤30 paragraph nodes), there is NO
shuffle and no driver materialization — the argmax is computed inside
the batch, never by a groupby exchange, because the whole tree of one
document always lives in one row of the input.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .layout import _H6_SQL, _h6, _read_doc_ids

N_CAND_MIN, N_CAND_MOD = 2, 4  # candidates per doc ∈ [2, 5]
N_PARA_MIN, N_PARA_MOD = 1, 6  # paragraphs per candidate ∈ [1, 6]
W_MIN, W_MOD = 5, 80  # words per paragraph ∈ [5, 84]
L_MOD = 8  # links per paragraph ∈ [0, 7]
LINK_PENALTY = 3
PPM = 1_000_000

_DOC_V = "CAST(d.doc_id AS VARCHAR)"


def _sql_h6(expr: str) -> str:
    return _H6_SQL.format(expr=expr)


# ---------------------------------------------------------------------------
# Deterministic DOM synthesis (engine side; SQL twin in _SQL_PARA)
# ---------------------------------------------------------------------------


def _synth_dom(doc_ids: np.ndarray):
    """Flat paragraph table for the batch: (doc_idx, cand, para,
    words, links), md5-derived per doc. Candidate/paragraph counts
    vary per key so tie-breaks and empty-ish shapes are exercised."""
    ids = doc_ids.tolist()
    doc_l, cand_l, para_l, w_l, l_l = [], [], [], [], []
    for di, d in enumerate(ids):
        nc = N_CAND_MIN + _h6(f"dom:{d}:n") % N_CAND_MOD
        for c in range(nc):
            np_ = N_PARA_MIN + _h6(f"dom:{d}:{c}:p") % N_PARA_MOD
            for p in range(np_):
                pre = f"dom:{d}:{c}:{p}:"
                doc_l.append(di)
                cand_l.append(c)
                para_l.append(p)
                w_l.append(W_MIN + _h6(pre + "w") % W_MOD)
                l_l.append(_h6(pre + "l") % L_MOD)
    return (
        np.array(doc_l, dtype=np.int64),
        np.array(cand_l, dtype=np.int64),
        np.array(para_l, dtype=np.int64),
        np.array(w_l, dtype=np.int64),
        np.array(l_l, dtype=np.int64),
    )


def _cand_scores(doc, cand, w, l):
    """Per-(doc, cand) Readability aggregation, vectorized: returns
    (group-start index array, per-group doc, cand, final score, sum
    words, sum links, paragraph count). Input is synthesis order, i.e.
    already sorted by (doc, cand, para)."""
    pscore = np.maximum(w - LINK_PENALTY * l, 0)
    key_change = np.empty(len(doc), dtype=bool)
    key_change[0] = True
    key_change[1:] = (doc[1:] != doc[:-1]) | (cand[1:] != cand[:-1])
    gstart = np.flatnonzero(key_change)
    gdoc = doc[gstart]
    gcand = cand[gstart]
    gs = np.add.reduceat(pscore, gstart)
    gw = np.add.reduceat(w, gstart)
    gl = np.add.reduceat(l, gstart)
    gn = np.diff(np.append(gstart, len(doc)))
    ld_ppm = (gl * PPM) // (gw + gl)
    final = gs * (PPM - ld_ppm)
    return gstart, gdoc, gcand, final, gw, gl, gn


def _winners(gdoc, gcand, final):
    """Per-doc argmax of final, ties to the smallest candidate id.
    Groups arrive sorted by (doc, cand), so a lexsort on
    (-final, cand) within doc reduces to: order by (doc, -final,
    cand) and take the first row per doc."""
    order = np.lexsort((gcand, -final, gdoc))
    d_sorted = gdoc[order]
    first = np.empty(len(order), dtype=bool)
    first[0] = True
    first[1:] = d_sorted[1:] != d_sorted[:-1]
    return order[first]


# ---------------------------------------------------------------------------
# main_content_dom — winner + tree statistics per document
# ---------------------------------------------------------------------------


def q_main_content_dom(sf_dir: str):
    """Readability candidate selection per document: the winning
    container id, its final link-density-weighted score, its word
    mass, and the tree shape (candidate / paragraph counts). One map,
    no exchange; the argmax happens inside the batch because a
    document's whole DOM lives in one input row."""

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cols = ("best_cand", "best_score", "kept_words", "n_cand", "n_para")
        if len(dids) == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    **{c: pa.array([], pa.int64()) for c in cols},
                }
            )
        doc, cand, _, w, l = _synth_dom(dids)
        _, gdoc, gcand, final, gw, _, gn = _cand_scores(doc, cand, w, l)
        win = _winners(gdoc, gcand, final)
        n_docs = len(dids)
        n_cand = np.zeros(n_docs, dtype=np.int64)
        n_para = np.zeros(n_docs, dtype=np.int64)
        np.add.at(n_cand, gdoc, 1)
        np.add.at(n_para, gdoc, gn)
        out = {
            "doc_id": batch["doc_id"],
            "best_cand": np.zeros(n_docs, dtype=np.int64),
            "best_score": np.zeros(n_docs, dtype=np.int64),
            "kept_words": np.zeros(n_docs, dtype=np.int64),
            "n_cand": n_cand,
            "n_para": n_para,
        }
        out["best_cand"][gdoc[win]] = gcand[win]
        out["best_score"][gdoc[win]] = final[win]
        out["kept_words"][gdoc[win]] = gw[win]
        return pa.table({k: v if isinstance(v, pa.ChunkedArray) else pa.array(v)
                         for k, v in out.items()})

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


_CAND_N = f"{N_CAND_MIN} + {{h}} % {N_CAND_MOD}"
_PARA_KEY = (
    f"'dom:' || {_DOC_V} || ':' || CAST(c.c AS VARCHAR)"
    f" || ':' || CAST(p.p AS VARCHAR)"
)

_SQL_PARA = f"""
para AS (
    SELECT d.doc_id, c.c, p.p,
           {W_MIN} + {_sql_h6(_PARA_KEY + " || ':w'")} % {W_MOD} AS words,
           {_sql_h6(_PARA_KEY + " || ':l'")} % {L_MOD} AS links
    FROM documents d,
         generate_series(0, {N_CAND_MIN + N_CAND_MOD - 2}) AS c(c),
         generate_series(0, {N_PARA_MIN + N_PARA_MOD - 2}) AS p(p)
    WHERE c.c < {N_CAND_MIN}
        + {_sql_h6("'dom:' || " + _DOC_V + " || ':n'")} % {N_CAND_MOD}
      AND p.p < {N_PARA_MIN}
        + {_sql_h6("'dom:' || " + _DOC_V + " || ':' || CAST(c.c AS VARCHAR) || ':p'")}
          % {N_PARA_MOD}
),
scored AS (
    SELECT doc_id, c,
           CAST(SUM(GREATEST(words - {LINK_PENALTY} * links, 0)) AS BIGINT) AS s,
           CAST(SUM(words) AS BIGINT) AS w,
           CAST(SUM(links) AS BIGINT) AS l,
           CAST(COUNT(*) AS BIGINT) AS np
    FROM para GROUP BY doc_id, c
),
fin AS (
    SELECT *, s * ({PPM} - (l * {PPM}) // (w + l)) AS final FROM scored
),
win AS (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY doc_id
                                 ORDER BY final DESC, c ASC) AS rn
    FROM fin
)"""

_SQL_MAIN_CONTENT_DOM = f"""
WITH {_SQL_PARA},
tree AS (
    SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_cand,
           CAST(SUM(np) AS BIGINT) AS n_para
    FROM scored GROUP BY doc_id
)
SELECT w.doc_id,
       CAST(w.c AS BIGINT) AS best_cand,
       CAST(w.final AS BIGINT) AS best_score,
       w.w AS kept_words,
       t.n_cand, t.n_para
FROM win w JOIN tree t ON t.doc_id = w.doc_id
WHERE w.rn = 1
"""


# ---------------------------------------------------------------------------
# dom_main_spans — the winning subtree as an ordered span sequence
# ---------------------------------------------------------------------------


def q_dom_main_spans(sf_dir: str):
    """Span-sequence extraction from the winning candidate: one row per
    paragraph of the Readability winner, position-keyed — the north
    rule's per-row invariant shape ((kind, text, media_ref, order)
    reduced to its deterministic numeric core: order ``pos``, content
    mass ``n_words``/``n_links``, and the paragraph score that kept
    it). Same single-map scale shape as main_content_dom."""

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_numpy(zero_copy_only=False)
        cols = ("pos", "n_words", "n_links", "para_score")
        if len(dids) == 0:
            return pa.table(
                {
                    "doc_id": batch["doc_id"],
                    **{c: pa.array([], pa.int64()) for c in cols},
                }
            )
        doc, cand, para, w, l = _synth_dom(dids)
        gstart, gdoc, gcand, final, _, _, gn = _cand_scores(doc, cand, w, l)
        win = _winners(gdoc, gcand, final)
        # expand winner groups back to their paragraph rows
        take = np.concatenate(
            [np.arange(gstart[g], gstart[g] + gn[g]) for g in win.tolist()]
        )
        take.sort()
        return pa.table(
            {
                "doc_id": pa.array(dids[doc[take]]),
                "pos": pa.array(para[take]),
                "n_words": pa.array(w[take]),
                "n_links": pa.array(l[take]),
                "para_score": pa.array(
                    np.maximum(w[take] - LINK_PENALTY * l[take], 0)
                ),
            }
        )

    return _read_doc_ids(sf_dir).map_batches(
        fn, batch_format="pyarrow", batch_size=4096
    )


_SQL_DOM_MAIN_SPANS = f"""
WITH {_SQL_PARA}
SELECT p.doc_id,
       CAST(p.p AS BIGINT) AS pos,
       CAST(p.words AS BIGINT) AS n_words,
       CAST(p.links AS BIGINT) AS n_links,
       CAST(GREATEST(p.words - {LINK_PENALTY} * p.links, 0) AS BIGINT)
           AS para_score
FROM para p JOIN win w ON w.doc_id = p.doc_id AND w.c = p.c AND w.rn = 1
"""


QUERIES = {
    "main_content_dom": q_main_content_dom,
    "dom_main_spans": q_dom_main_spans,
}

ORACLE_SQL = {
    "main_content_dom": _SQL_MAIN_CONTENT_DOM,
    "dom_main_spans": _SQL_DOM_MAIN_SPANS,
}
