"""Unit pins for the C4 cleaning rules (stages/c4.py)."""

import math

import pytest

from pdf_parser_ray.stages.c4 import (
    LINE_WORDS,
    MIN_KEPT_LINES,
    MIN_LINE_WORDS,
)


@pytest.mark.usefixtures("ray_session")
def test_corpus_verdicts_and_invariants():
    """On the sf0.001 corpus the page gate fires both ways, short
    trailing lines are really dropped by the word rule, and the
    bookkeeping is internally consistent."""
    import pyarrow.parquet as pq

    from pdf_parser_ray.stages.c4 import q_c4_rules

    df = q_c4_rules("/root/testdata/sf0.001").to_pandas().set_index("doc_id")
    assert set(df["passes"]) == {0, 1}
    assert (df["kept_lines"] <= df["n_lines"]).all()
    assert (df["kept_words"] <= df["kept_lines"] * LINE_WORDS).all()
    assert ((df["passes"] == 1) == (df["kept_lines"] >= MIN_KEPT_LINES)).all()

    # n_lines must equal ceil(word count / LINE_WORDS) on the real text
    t = pq.read_table(
        "/root/testdata/sf0.001/documents.parquet", columns=["doc_id", "text"]
    ).to_pylist()
    for row in t[:50]:
        nw = len(row["text"].split())
        assert df.loc[row["doc_id"], "n_lines"] == math.ceil(nw / LINE_WORDS)

    # the short-line word rule is REAL data, not synthesis: a doc whose
    # trailing chunk has < MIN_LINE_WORDS words can never count it
    short_tail = [
        r["doc_id"]
        for r in t
        if 0 < len(r["text"].split()) % LINE_WORDS < MIN_LINE_WORDS
    ]
    assert short_tail, "corpus should contain short trailing chunks"
    sub = df.loc[short_tail]
    assert (sub["kept_lines"] < sub["n_lines"]).all()
