"""DOM-heuristic main-content extraction (stages/domheur.py):
Readability-style candidate scoring, winner selection, and span
extraction — vectorized helpers pinned to a naive per-document
reference implementation, plus end-to-end smoke."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.stages.domheur import (
    LINK_PENALTY,
    PPM,
    _cand_scores,
    _synth_dom,
    _winners,
)


def _naive(doc, cand, w, l):
    """Per-(doc, cand) Readability aggregation + per-doc winner,
    straight-line reference."""
    groups = {}
    for i in range(len(doc)):
        k = (int(doc[i]), int(cand[i]))
        g = groups.setdefault(k, {"s": 0, "w": 0, "l": 0, "n": 0})
        g["s"] += max(int(w[i]) - LINK_PENALTY * int(l[i]), 0)
        g["w"] += int(w[i])
        g["l"] += int(l[i])
        g["n"] += 1
    fin = {
        k: g["s"] * (PPM - (g["l"] * PPM) // (g["w"] + g["l"]))
        for k, g in groups.items()
    }
    winners = {}
    for (d, c), f in sorted(fin.items()):
        cur = winners.get(d)
        if cur is None or f > cur[1] or (f == cur[1] and c < cur[0]):
            winners[d] = (c, f)
    return groups, fin, winners


dom_strategy = st.lists(
    st.tuples(
        st.integers(min_value=0, max_value=3),  # doc
        st.integers(min_value=0, max_value=4),  # cand
        st.integers(min_value=5, max_value=84),  # words
        st.integers(min_value=0, max_value=7),  # links
    ),
    min_size=1,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(dom_strategy)
def test_cand_scores_and_winners_match_naive(rows):
    """The reduceat aggregation and the lexsort argmax must equal the
    naive per-group scan on arbitrary (doc, cand) multisets — scores,
    word/link masses, counts, and the tie-broken winner per doc."""
    rows = sorted(rows)  # synthesis order: sorted by (doc, cand, ...)
    doc = np.array([r[0] for r in rows], dtype=np.int64)
    cand = np.array([r[1] for r in rows], dtype=np.int64)
    w = np.array([r[2] for r in rows], dtype=np.int64)
    l = np.array([r[3] for r in rows], dtype=np.int64)
    _, gdoc, gcand, final, gw, gl, gn = _cand_scores(doc, cand, w, l)
    groups, fin, winners = _naive(doc, cand, w, l)
    got = {
        (int(gdoc[i]), int(gcand[i])): (
            int(final[i]), int(gw[i]), int(gl[i]), int(gn[i])
        )
        for i in range(len(gdoc))
    }
    want = {
        k: (fin[k], g["w"], g["l"], g["n"]) for k, g in groups.items()
    }
    assert got == want
    win = _winners(gdoc, gcand, final)
    got_w = {int(gdoc[i]): (int(gcand[i]), int(final[i])) for i in win}
    assert got_w == winners


def test_tie_breaks_to_smallest_candidate():
    # two candidates with identical content → identical final score;
    # candidate 0 must win
    doc = np.zeros(2, dtype=np.int64)
    cand = np.array([0, 1], dtype=np.int64)
    w = np.array([20, 20], dtype=np.int64)
    l = np.array([2, 2], dtype=np.int64)
    _, gdoc, gcand, final, *_ = _cand_scores(doc, cand, w, l)
    win = _winners(gdoc, gcand, final)
    assert final[0] == final[1]
    assert int(gcand[win[0]]) == 0


def test_link_density_downweights_bigger_block():
    # a longer but link-stuffed block must lose to a shorter clean one:
    # cand0: 30 words 7 links → s=9, ld large; cand1: 25 words 0 links
    doc = np.zeros(2, dtype=np.int64)
    cand = np.array([0, 1], dtype=np.int64)
    w = np.array([30, 25], dtype=np.int64)
    l = np.array([7, 0], dtype=np.int64)
    _, gdoc, gcand, final, *_ = _cand_scores(doc, cand, w, l)
    win = _winners(gdoc, gcand, final)
    assert int(gcand[win[0]]) == 1


def test_synth_dom_shape_bounds():
    doc, cand, para, w, l = _synth_dom(
        np.array([f"d{k}" for k in range(40)], dtype=object)
    )
    assert ((w >= 5) & (w <= 84)).all()
    assert ((l >= 0) & (l <= 7)).all()
    assert ((cand >= 0) & (cand <= 4)).all()
    assert ((para >= 0) & (para <= 5)).all()
    # synthesis order is sorted by (doc, cand, para)
    key = doc * 100 + cand * 10 + para
    assert (np.diff(key) > 0).sum() + (np.diff(doc) > 0).sum() >= 0
    assert (np.lexsort((para, cand, doc)) == np.arange(len(doc))).all()


@pytest.mark.usefixtures("ray_session")
def test_dom_queries_smoke():
    """Both DOM queries run end-to-end at sf0.001; the span extract is
    consistent with the winner table (every doc present, spans belong
    to exactly one candidate, positions are 0..n-1 in order)."""
    from pdf_parser_ray.stages.domheur import QUERIES

    sf = "/root/testdata/sf0.001"
    main = QUERIES["main_content_dom"](sf).to_pandas()
    spans = QUERIES["dom_main_spans"](sf).to_pandas()
    assert set(main.columns) == {
        "doc_id", "best_cand", "best_score", "kept_words", "n_cand", "n_para"
    }
    assert (main["n_cand"] >= 2).all() and (main["n_cand"] <= 5).all()
    assert (main["best_score"] > 0).all()
    g = spans.groupby("doc_id")
    assert set(main["doc_id"]) == set(spans["doc_id"])
    assert (g["pos"].min() == 0).all()
    assert (g["pos"].max() == g["pos"].count() - 1).all()
    # winner's word mass matches between the two queries
    kw = g["n_words"].sum().rename("kept_words")
    merged = main.set_index("doc_id").join(kw, rsuffix="_spans")
    assert (merged["kept_words"] == merged["kept_words_spans"]).all()
