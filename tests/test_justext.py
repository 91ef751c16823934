"""Unit pins for the jusText-style classifier (stages/justext.py):
hand-built context-propagation cases, a hypothesis differential
against a naive per-document loop, and an on-corpus class-variety
assertion so the thresholds provably exercise every branch."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.stages.justext import (
    _BAD,
    _GOOD,
    _NEARGOOD,
    _SHORT,
    BAD_LINK_PPM,
    GOOD_STOP_PPM,
    SHORT_WORDS,
    classify_blocks,
)


def _classify(rows):
    doc = np.array([r[0] for r in rows], np.int64)
    nw = np.array([r[1] for r in rows], np.int64)
    nl = np.array([r[2] for r in rows], np.int64)
    ns = np.array([r[3] for r in rows], np.int64)
    return classify_blocks(doc, nw, nl, ns)


def test_context_free_classes():
    # (doc, n_words, n_links, n_stop)
    rows = [
        (1, 0, 5, 0),   # nav: link-dense -> bad
        (1, 3, 0, 0),   # 3 words -> short
        (1, 12, 0, 3),  # 250k ppm stopwords -> good
        (1, 12, 0, 1),  # 83k ppm -> neargood
        (1, 1, 3, 0),   # 750k link ppm -> bad (link rule precedes short)
    ]
    _, _, cf, _ = _classify(rows)
    assert cf.tolist() == [_BAD, _SHORT, _GOOD, _NEARGOOD, _BAD]


def test_context_pass_flips_soft_both_ways():
    # doc 1: neargood sandwiched between bad and good -> good (one good
    # neighbour suffices); doc 2: soft blocks with only bad hard
    # neighbours -> bad; doc 3: soft at document edge (no following
    # hard) -> edge counts bad, but preceding good rescues it.
    rows = [
        (1, 0, 5, 0),   # bad
        (1, 12, 0, 1),  # neargood -> good (next hard is good)
        (1, 12, 0, 3),  # good
        (2, 0, 5, 0),   # bad
        (2, 3, 0, 0),   # short -> bad (both hard neighbours bad)
        (2, 1, 3, 0),   # bad
        (3, 12, 0, 3),  # good
        (3, 12, 0, 0),  # neargood, trailing edge -> good via prev
    ]
    _, _, cf, final = _classify(rows)
    assert final.tolist() == [_BAD, _GOOD, _GOOD, _BAD, _BAD, _BAD, _GOOD, _GOOD]
    # the flips really were soft blocks
    assert cf.tolist()[1] == _NEARGOOD and cf.tolist()[4] == _SHORT


def test_all_soft_document_is_all_bad():
    # no hard-good anywhere: every soft block must resolve to bad
    rows = [(7, 0, 5, 0), (7, 12, 0, 0), (7, 12, 0, 1), (7, 0, 5, 0)]
    _, _, _, final = _classify(rows)
    assert final.tolist() == [_BAD, _BAD, _BAD, _BAD]


def test_context_pass_does_not_cross_documents():
    # doc 1 ends with hard good; doc 2 starts with a soft block whose
    # only hard neighbours are doc-2-internal bads -> must stay bad
    rows = [
        (1, 12, 0, 3),  # good
        (2, 12, 0, 1),  # neargood, leading edge of doc 2
        (2, 0, 5, 0),   # bad
    ]
    _, _, _, final = _classify(rows)
    assert final.tolist() == [_GOOD, _BAD, _BAD]


def _naive_classify(rows):
    """Straight-line per-document replay of the jusText spec (module
    docstring rules 1-2) — the differential oracle for the vectorized
    grouped-ffill implementation."""
    cf = []
    for _, nw, nl, ns in rows:
        tot = nw + nl
        link_ppm = nl * 1_000_000 // max(tot, 1)
        stop_ppm = ns * 1_000_000 // max(nw, 1) if nw > 0 else 0
        if link_ppm > BAD_LINK_PPM:
            cf.append(_BAD)
        elif nw < SHORT_WORDS:
            cf.append(_SHORT)
        elif stop_ppm >= GOOD_STOP_PPM:
            cf.append(_GOOD)
        else:
            cf.append(_NEARGOOD)
    final = []
    for i, (d, *_rest) in enumerate(rows):
        if cf[i] in (_BAD, _GOOD):
            final.append(cf[i])
            continue
        prev = next(
            (cf[j] for j in range(i - 1, -1, -1)
             if rows[j][0] == d and cf[j] in (_BAD, _GOOD)),
            _BAD,
        )
        nxt = next(
            (cf[j] for j in range(i + 1, len(rows))
             if rows[j][0] == d and cf[j] in (_BAD, _GOOD)),
            _BAD,
        )
        final.append(_GOOD if (prev == _GOOD or nxt == _GOOD) else _BAD)
    return cf, final


@settings(max_examples=200, deadline=None)
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),   # doc run id
            st.integers(min_value=0, max_value=30),  # n_words
            st.integers(min_value=0, max_value=10),  # n_links
            st.integers(min_value=0, max_value=30),  # n_stop
        ),
        min_size=1,
        max_size=40,
    )
)
def test_vectorized_matches_naive_loop(blocks):
    """classify_blocks' batch-wide grouped ffill/bfill must equal the
    naive per-document scan on arbitrary block streams (docs made
    contiguous by sorting the run id, n_stop clamped to n_words)."""
    rows = sorted(
        (d, nw, nl, min(ns, nw)) for d, nw, nl, ns in blocks
    )
    _, _, cf_v, final_v = classify_blocks(
        np.array([r[0] for r in rows], np.int64),
        np.array([r[1] for r in rows], np.int64),
        np.array([r[2] for r in rows], np.int64),
        np.array([r[3] for r in rows], np.int64),
    )
    cf_n, final_n = _naive_classify(rows)
    assert cf_v.tolist() == cf_n
    assert final_v.tolist() == final_n


@pytest.mark.usefixtures("ray_session")
def test_corpus_exercises_every_class():
    """On the sf0.001 corpus all four context-free classes appear and
    the context pass flips soft blocks in BOTH directions — the
    thresholds are calibrated, not vacuous."""
    from pdf_parser_ray.stages.justext import q_justext_blocks

    df = q_justext_blocks("/root/testdata/sf0.001").to_pandas()
    assert set(df["cls_cf"]) == {"bad", "short", "good", "neargood"}
    soft = df[df["cls_cf"].isin(["short", "neargood"])]
    assert (soft["cls"] == "good").any() and (soft["cls"] == "bad").any()
    # hard classes are never changed by the context pass
    hard = df[df["cls_cf"].isin(["good", "bad"])]
    assert (hard["cls"] == hard["cls_cf"]).all()
