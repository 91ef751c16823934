"""C4-style page cleaning rules (Raffel et al. 2020, "Exploring the
Limits of Transfer Learning with a Unified Text-to-Text Transformer",
§2.2 — public paper).

The published C4 recipe keeps only lines that end in terminal
punctuation and have ≥3 words, drops pages containing curly braces
or the phrase "lorem ipsum", and requires ≥3 surviving sentences per
page. It is the canonical companion to the Gopher quality gate
(``stages/scrub.py:gopher_rules``) in every public LLM-corpus
pipeline; this module adds it as the line-grain verdict table:

* lines = 10-word chunks of the document text (the corpus carries no
  newlines, so line boundaries — like the jusText/layout/DOM tiers'
  page structure — are md5-synthesized deterministically, the
  engine↔DuckDB parity device established in ``stages/layout.py``)
* per line: ``punct_ok`` (h6 % 5 ≠ 0 — ~80% of lines end in terminal
  punctuation), ``brace`` (h6 % 23 = 0), ``lorem`` (h6 % 97 = 0),
  ``words_ok`` (line word count ≥ 3 — REAL data: the last chunk of a
  short document fails it)
* line keep = punct_ok ∧ ¬brace ∧ ¬lorem ∧ words_ok
* per document: ``n_lines``, ``kept_lines``, ``kept_words``, and
  ``passes`` = kept_lines ≥ 3 (C4's three-sentence page rule).

Scale shape: one zero-shuffle ``map_batches`` over a two-column read;
per-document work is O(lines) and a document's lines never leave the
batch — embarrassingly parallel at any corpus size, like the other
HTML-tier stages.
"""

from __future__ import annotations

import math

import numpy as np
import pyarrow as pa

from .layout import _H6_SQL, _h6

LINE_WORDS = 10  # words per synthesized line
MIN_LINE_WORDS = 3  # C4: drop lines with fewer than 3 words
MIN_KEPT_LINES = 3  # C4: drop pages with fewer than 3 kept sentences
PUNCT_MOD = 5  # h6 % 5 != 0 -> line ends in terminal punctuation
BRACE_MOD = 23  # h6 % 23 == 0 -> line contains '{'
LOREM_MOD = 97  # h6 % 97 == 0 -> line contains 'lorem ipsum'


def q_c4_rules(sf_dir: str):
    """Per-document C4 verdicts: line counts before/after the rules,
    surviving word mass, and the three-sentence page gate."""
    from ..io.sources import read_parquet_clean

    ds = read_parquet_clean(f"{sf_dir}/documents.parquet", columns=["doc_id", "text"])

    def fn(batch: pa.Table) -> pa.Table:
        dids = batch["doc_id"].to_pylist()
        texts = batch["text"].to_pylist()
        n = len(dids)
        n_lines = np.zeros(n, np.int64)
        kept_lines = np.zeros(n, np.int64)
        kept_words = np.zeros(n, np.int64)
        for i, (d, t) in enumerate(zip(dids, texts)):
            nw = len((t or "").split())
            nb = math.ceil(nw / LINE_WORDS)
            n_lines[i] = nb
            for j in range(nb):
                lw = LINE_WORDS if j < nb - 1 else nw - LINE_WORDS * (nb - 1)
                key = f"c4:{d}:{j}:"
                if (
                    lw >= MIN_LINE_WORDS
                    and _h6(key + "p") % PUNCT_MOD != 0
                    and _h6(key + "b") % BRACE_MOD != 0
                    and _h6(key + "l") % LOREM_MOD != 0
                ):
                    kept_lines[i] += 1
                    kept_words[i] += lw
        return pa.table(
            {
                "doc_id": pa.array(dids, pa.int64()),
                "n_lines": pa.array(n_lines, pa.int64()),
                "kept_lines": pa.array(kept_lines, pa.int64()),
                "kept_words": pa.array(kept_words, pa.int64()),
                "passes": pa.array(
                    (kept_lines >= MIN_KEPT_LINES).astype(np.int64), pa.int64()
                ),
            }
        )

    return ds.map_batches(fn, batch_format="pyarrow", batch_size=None)


def _sql_h6(expr: str) -> str:
    return _H6_SQL.format(expr=expr)


_LINE_KEY = "'c4:' || CAST(c.doc_id AS VARCHAR) || ':' || CAST(t.i AS VARCHAR)"

_SQL_C4_RULES = f"""
WITH w AS (
    SELECT doc_id, len(regexp_extract_all(text, '\\S+')) AS n FROM documents
),
c AS (
    SELECT doc_id, n,
           CAST(ceil(n / {LINE_WORDS}.0) AS BIGINT) AS nb
    FROM w
),
lines AS (
    SELECT c.doc_id,
           CASE WHEN t.i = c.nb - 1 THEN c.n - {LINE_WORDS} * (c.nb - 1)
                ELSE {LINE_WORDS} END AS line_words,
           CAST(
               CASE WHEN t.i = c.nb - 1 THEN c.n - {LINE_WORDS} * (c.nb - 1)
                    ELSE {LINE_WORDS} END >= {MIN_LINE_WORDS}
               AND {_sql_h6(_LINE_KEY + " || ':p'")} % {PUNCT_MOD} <> 0
               AND {_sql_h6(_LINE_KEY + " || ':b'")} % {BRACE_MOD} <> 0
               AND {_sql_h6(_LINE_KEY + " || ':l'")} % {LOREM_MOD} <> 0
               AS BIGINT) AS keep
    FROM c, LATERAL unnest(range(c.nb)) AS t(i)
),
agg AS (
    SELECT doc_id,
           CAST(COUNT(*) AS BIGINT) AS n_lines,
           CAST(SUM(keep) AS BIGINT) AS kept_lines,
           CAST(SUM(keep * line_words) AS BIGINT) AS kept_words
    FROM lines GROUP BY doc_id
)
SELECT c.doc_id,
       COALESCE(a.n_lines, 0) AS n_lines,
       COALESCE(a.kept_lines, 0) AS kept_lines,
       COALESCE(a.kept_words, 0) AS kept_words,
       CAST(COALESCE(a.kept_lines, 0) >= {MIN_KEPT_LINES} AS BIGINT) AS passes
FROM c LEFT JOIN agg a USING (doc_id)
"""

QUERIES = {
    "c4_rules": q_c4_rules,
}
ORACLE_SQL = {
    "c4_rules": _SQL_C4_RULES,
}
