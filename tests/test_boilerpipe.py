"""Boilerpipe decision-tree units: every branch of the published
NumWordsRules tree fires on a hand case, document edges see the
virtual empty block, and the real corpus exercises both verdicts."""

import numpy as np

from pdf_parser_ray.stages.boilerpipe import boilerpipe_blocks

SF = "/root/testdata/sf0.001"


def test_every_branch_of_the_tree():
    # one document per branch scenario; blocks laid out so the window
    # (prev, curr, next) hits each leaf
    doc = np.array(
        [0, 0, 1, 1, 2, 2, 3, 3, 3, 4, 4], np.int64
    )
    #          b0  b1  b2  b3  b4  b5  b6  b7  b8  b9 b10
    nw = np.array([5, 10, 17, 1, 1, 16, 1, 41, 1, 1, 1], np.int64)
    nl = np.array([0, 20, 0, 0, 0, 0, 9, 0, 0, 9, 0], np.int64)
    _, content = boilerpipe_blocks(doc, nw, nl)

    # doc 0 b0: low-link prev (edge), 5 ≤ 16 words, next 10 ≤ 15,
    #           prev (virtual) 0 ≤ 4 → boilerplate
    assert content[0] == 0
    # doc 0 b1: curr link density 20/30 > 1/3 → boilerplate
    assert content[1] == 0
    # doc 1 b2: 17 > 16 words on the low-link branch → content
    assert content[2] == 1
    # doc 1 b3: 1 word, next (virtual) 0, prev 17 > 4 → content
    assert content[3] == 1
    # doc 2 b4: 1 word but next has 16 > 15 → content
    assert content[4] == 1
    # doc 2 b5: 16 ≤ 16 words, virtual next, prev 1 ≤ 4 → boilerplate
    assert content[5] == 0
    # doc 3 b6: link-dense (9/10) → boilerplate
    assert content[6] == 0
    # doc 3 b7: prev link-dense branch, 41 > 40 words → content
    assert content[7] == 1
    # doc 3 b8: low-link prev (b7), 1 word, virtual next, prev 41 > 4 → content
    assert content[8] == 1
    # doc 4 b10: prev link-dense, 1 ≤ 40 words, virtual next ≤ 17 → boilerplate
    assert content[10] == 0


def test_boilerpipe_on_corpus_varies(ray_session):
    from pdf_parser_ray.stages.boilerpipe import q_boilerpipe_blocks

    df = q_boilerpipe_blocks(SF).to_pandas()
    share = df.content.mean()
    # both verdicts occur, and neither degenerately dominates
    assert 0.05 < share < 0.95
