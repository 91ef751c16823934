"""Unit pins for the CETR tag-ratio extractor (stages/cetr.py):
hand-built smoothing/threshold cases, a naive-loop differential, and
an on-corpus mask-variety assertion."""

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from pdf_parser_ray.stages.cetr import cetr_blocks


def test_hand_case_smoothing_and_threshold():
    # one doc, ttr = [0, 9, 3] micro-scaled; edge blocks replicate
    # themselves in the 3-tap mean: smooth = [(0+0+9)/3, (0+9+3)/3,
    # (9+3+3)/3] = [3, 4, 5], mean = 4 -> keep = [0, 1, 1]
    doc = np.zeros(3, np.int64)
    chars = np.array([0, 9, 3], np.int64)
    tags = np.ones(3, np.int64)
    ttr, smooth, keep = cetr_blocks(doc, chars, tags)
    assert ttr.tolist() == [0, 9_000_000, 3_000_000]
    assert smooth.tolist() == [3_000_000, 4_000_000, 5_000_000]
    assert keep.tolist() == [False, True, True]


def test_single_block_document_always_kept():
    # smooth == ttr == mean -> >= holds
    ttr, smooth, keep = cetr_blocks(
        np.array([5], np.int64), np.array([7], np.int64), np.array([2], np.int64)
    )
    assert smooth.tolist() == ttr.tolist() == [3_500_000]
    assert keep.tolist() == [True]


def test_smoothing_does_not_cross_documents():
    # doc 1 ends high, doc 2 starts at 0: doc 2's first block must
    # replicate ITSELF, not borrow doc 1's boundary value
    doc = np.array([1, 1, 2, 2], np.int64)
    chars = np.array([9, 9, 0, 3], np.int64)
    tags = np.ones(4, np.int64)
    _, smooth, _ = cetr_blocks(doc, chars, tags)
    assert smooth[2] == (0 + 0 + 3_000_000) // 3


def _naive(doc, chars, tags):
    ttr = [c * 1_000_000 // max(t, 1) for c, t in zip(chars, tags)]
    smooth, keep = [], []
    n = len(doc)
    for i in range(n):
        p = ttr[i - 1] if i > 0 and doc[i - 1] == doc[i] else ttr[i]
        x = ttr[i + 1] if i < n - 1 and doc[i + 1] == doc[i] else ttr[i]
        smooth.append((p + ttr[i] + x) // 3)
    for i in range(n):
        grp = [smooth[j] for j in range(n) if doc[j] == doc[i]]
        keep.append(smooth[i] >= sum(grp) // len(grp))
    return ttr, smooth, keep


@settings(max_examples=200, deadline=None)
@given(
    blocks=st.lists(
        st.tuples(
            st.integers(min_value=0, max_value=3),    # doc run id
            st.integers(min_value=0, max_value=200),  # chars
            st.integers(min_value=1, max_value=12),   # tags
        ),
        min_size=1,
        max_size=40,
    )
)
def test_vectorized_matches_naive_loop(blocks):
    rows = sorted(blocks)
    doc = np.array([r[0] for r in rows], np.int64)
    chars = np.array([r[1] for r in rows], np.int64)
    tags = np.array([r[2] for r in rows], np.int64)
    ttr_v, smooth_v, keep_v = cetr_blocks(doc, chars, tags)
    ttr_n, smooth_n, keep_n = _naive(doc.tolist(), chars.tolist(), tags.tolist())
    assert ttr_v.tolist() == ttr_n
    assert smooth_v.tolist() == smooth_n
    assert keep_v.tolist() == keep_n


@pytest.mark.usefixtures("ray_session")
def test_corpus_mask_fires_both_ways():
    from pdf_parser_ray.stages.cetr import q_cetr_blocks

    df = q_cetr_blocks("/root/testdata/sf0.001").to_pandas()
    assert set(df["keep"]) == {0, 1}
    # nav/footer blocks (chars=0) must never clear a positive mean
    zero = df[df["chars"] == 0]
    assert (zero.groupby("doc_id")["keep"].max() <= 1).all()
    assert (df[df["ttr_micro"] == df["smooth_micro"]].shape[0]) > 0
