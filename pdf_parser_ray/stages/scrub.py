"""Corpus hygiene operators for training-data prep: PII redaction and
rule-based document quality gates (Gopher-style).

Both are single-pass ``map_batches`` stages over zero-copy Arrow
batches using RE2 kernels (``pyarrow.compute``) — no shuffle, no
state, embarrassingly parallel at any corpus size.

The synthetic ``documents`` table contains no PII-shaped strings, so
— following the same convention as the dedup family
(``stages/dedup.py``: augment deterministically inside the query,
mirror the augmentation in the oracle SQL) — the PII query appends a
deterministic contact line to every ``_PII_EVERY``-th document. The
augmentation is pure SQL-expressible (``printf``), so the DuckDB
oracle verifies the whole pipeline including the injection.

All emitted numbers are integers (counts / milli-units via integer
division) so the driver's value hash matches DuckDB bit-for-bit.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

_PII_EVERY = 3  # every 3rd doc gets the synthetic contact line

# RE2 patterns — identical engine on both sides (pyarrow.compute and
# DuckDB both compile RE2), so Ray and oracle agree by construction.
_RE_EMAIL = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
_RE_SSN = r"\b\d{3}-\d{2}-\d{4}\b"
_RE_PHONE = r"\b\d{3}-\d{4}\b"


def _docs(sf_dir: str):
    import ray

    from ..io.sources import read_parquet_clean

    n_blocks = max(8, int(ray.cluster_resources().get("CPU", 8)) * 2)
    return read_parquet_clean(
        f"{sf_dir}/documents.parquet",
        columns=["doc_id", "text"],
        override_num_blocks=n_blocks,
    )


def pii_batch(batch: pa.Table) -> pa.Table:
    """Batch kernel behind :func:`q_pii_scrub`, reusable by composed
    pipelines (``pipelines/prep.q_corpus_prep_v2``)."""
    return _pii_fn(batch)


def q_pii_scrub(sf_dir: str):
    """Redact emails / SSN-shaped / phone-shaped tokens from the
    (PII-augmented) corpus: emails → ``[EMAIL]``, SSNs → ``[SSN]``,
    phones → ``[PHONE]``, applied in that order (SSN before phone so
    the 4-digit tail of an SSN can never be half-matched as a phone).
    Counts are per-pattern matches on the ORIGINAL text. Output:
    (doc_id, clean_text, n_email, n_ssn, n_phone)."""
    return _docs(sf_dir).map_batches(_pii_fn, batch_format="pyarrow", batch_size=None)


def _augmented(batch: pa.Table) -> tuple[np.ndarray, pa.Array]:
    """(ids, PII-augmented text): every ``_PII_EVERY``-th doc carries
    the deterministic contact line — mirrored verbatim in both PII
    oracles."""
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    suffix = [
        (
            f" contact u{int(i)}@example.com ssn 123-45-{int(i) % 10000:04d}"
            f" phone 555-{int(i) % 10000:04d}"
            if int(i) % _PII_EVERY == 0
            else ""
        )
        for i in ids
    ]
    return ids, pc.binary_join_element_wise(
        batch["text"], pa.array(suffix, pa.string()), ""
    )


def _pii_fn(batch: pa.Table) -> pa.Table:
    ids, aug = _augmented(batch)
    n_email = pc.cast(pc.count_substring_regex(aug, _RE_EMAIL), pa.int64())
    n_ssn = pc.cast(pc.count_substring_regex(aug, _RE_SSN), pa.int64())
    n_phone = pc.cast(pc.count_substring_regex(aug, _RE_PHONE), pa.int64())
    clean = pc.replace_substring_regex(aug, _RE_EMAIL, "[EMAIL]")
    clean = pc.replace_substring_regex(clean, _RE_SSN, "[SSN]")
    clean = pc.replace_substring_regex(clean, _RE_PHONE, "[PHONE]")
    # n_phone counts the raw text, where the SSN tail is intact and
    # \b\d{3}-\d{4}\b cannot match inside it (digit runs are 3/2/4)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "clean_text": clean,
            "n_email": n_email,
            "n_ssn": n_ssn,
            "n_phone": n_phone,
        }
    )


_SQL_PII_SCRUB = rf"""
WITH aug AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % {_PII_EVERY} = 0
                        THEN printf(' contact u%d@example.com ssn 123-45-%04d phone 555-%04d',
                                    doc_id, doc_id % 10000, doc_id % 10000)
                        ELSE '' END AS text
    FROM documents
)
SELECT doc_id,
       regexp_replace(
           regexp_replace(
               regexp_replace(text, '{_RE_EMAIL}', '[EMAIL]', 'g'),
               '{_RE_SSN}', '[SSN]', 'g'),
           '{_RE_PHONE}', '[PHONE]', 'g') AS clean_text,
       CAST(length(regexp_extract_all(text, '{_RE_EMAIL}')) AS BIGINT) AS n_email,
       CAST(length(regexp_extract_all(text, '{_RE_SSN}')) AS BIGINT) AS n_ssn,
       CAST(length(regexp_extract_all(text, '{_RE_PHONE}')) AS BIGINT) AS n_phone
FROM aug
"""


# Gopher-style rule gate (Rae et al. 2021, "Scaling Language Models:
# Methods, Analysis & Insights from Training Gopher", §A1.1): simple
# per-document filters — word-count bounds, mean-word-length bounds,
# alphabetic-word ratio, stopword presence. Thresholds adapted to this
# corpus's scale (the paper's 50-word minimum would reject nothing /
# everything uniformly here; the SHAPE of the rules is what the
# operator implements).
_MIN_WORDS = 20
_MAX_WORDS = 100_000
_MIN_MEAN_WLEN_MILLI = 3_000
_MAX_MEAN_WLEN_MILLI = 10_000
_STOPWORDS = ("the", "a", "of", "to", "and", "with", "that", "for")
_MIN_STOPWORD_HITS = 2


def gopher_batch(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Batch kernel behind :func:`q_gopher_rules` (``text_col`` lets a
    composed pipeline gate on an upstream stage's cleaned column)."""
    return _gopher_fn(batch, text_col)


def q_gopher_rules(sf_dir: str):
    """Per-document quality gate: (doc_id, n_words, mean_wlen_milli,
    n_stopword_kinds, keep) where ``keep`` = word count in bounds AND
    mean word length in [3, 10] chars AND ≥2 distinct stopwords
    present. mean_wlen_milli = 1000·non-space-chars // words (integer
    milli-units — exact on both sides)."""
    return _docs(sf_dir).map_batches(
        _gopher_fn, batch_format="pyarrow", batch_size=None
    )


def _gopher_fn(batch: pa.Table, text_col: str = "text") -> pa.Table:
    stop_res = [rf"\b{w}\b" for w in _STOPWORDS]
    ids = batch["doc_id"].to_numpy(zero_copy_only=False)
    text = batch[text_col]
    n_words = pc.cast(pc.count_substring_regex(text, r"\S+"), pa.int64()).to_numpy(
        zero_copy_only=False
    )
    n_chars = pc.cast(
        pc.utf8_length(pc.replace_substring_regex(text, r"\s", "")), pa.int64()
    ).to_numpy(zero_copy_only=False)
    mean_milli = np.where(
        n_words > 0, (1000 * n_chars) // np.maximum(n_words, 1), 0
    ).astype(np.int64)
    kinds = np.zeros(len(ids), dtype=np.int64)
    for sre in stop_res:
        kinds += (
            pc.cast(pc.count_substring_regex(text, sre), pa.int64())
            .to_numpy(zero_copy_only=False)
            > 0
        ).astype(np.int64)
    keep = (
        (n_words >= _MIN_WORDS)
        & (n_words <= _MAX_WORDS)
        & (mean_milli >= _MIN_MEAN_WLEN_MILLI)
        & (mean_milli <= _MAX_MEAN_WLEN_MILLI)
        & (kinds >= _MIN_STOPWORD_HITS)
    ).astype(np.int64)
    return pa.table(
        {
            "doc_id": pa.array(ids, pa.int64()),
            "n_words": pa.array(n_words, pa.int64()),
            "mean_wlen_milli": pa.array(mean_milli, pa.int64()),
            "n_stopword_kinds": pa.array(kinds, pa.int64()),
            "keep": pa.array(keep, pa.int64()),
        }
    )


_STOPWORD_SQL = " + ".join(
    "CASE WHEN regexp_matches(text, '\\b" + w + "\\b') THEN 1 ELSE 0 END"
    for w in _STOPWORDS
)

_SQL_GOPHER_RULES = rf"""
WITH scored AS (
    SELECT doc_id,
           CAST(length(regexp_extract_all(text, '\S+')) AS BIGINT) AS n_words,
           CAST(length(regexp_replace(text, '\s', '', 'g')) AS BIGINT) AS n_chars,
           {_STOPWORD_SQL} AS n_stopword_kinds
    FROM documents
)
SELECT doc_id, n_words,
       CAST(CASE WHEN n_words > 0 THEN (1000 * n_chars) // n_words ELSE 0 END AS BIGINT) AS mean_wlen_milli,
       CAST(n_stopword_kinds AS BIGINT) AS n_stopword_kinds,
       CAST(CASE WHEN n_words >= {_MIN_WORDS} AND n_words <= {_MAX_WORDS}
                  AND (CASE WHEN n_words > 0 THEN (1000 * n_chars) // n_words ELSE 0 END)
                      BETWEEN {_MIN_MEAN_WLEN_MILLI} AND {_MAX_MEAN_WLEN_MILLI}
                  AND n_stopword_kinds >= {_MIN_STOPWORD_HITS}
             THEN 1 ELSE 0 END AS BIGINT) AS keep
FROM scored
"""


# ---------------------------------------------------------------------------
# PII inventory — regex extraction exploding docs into match rows
# ---------------------------------------------------------------------------

def q_pii_inventory(sf_dir: str):
    """Every PII match as its own row ``(doc_id, kind, hit)`` — the
    flat-map/extraction twin of the redaction scrub (audit-the-corpus
    instead of clean-it). Each kind extracts independently from the
    ORIGINAL augmented text, duplicates preserved (one row per
    occurrence, exactly what ``UNNEST(regexp_extract_all(...))``
    yields). The per-document ``re.finditer`` loop is a genuine string
    kernel (pyarrow's RE2 bindings expose count/replace but not
    extract-all); compiled with ``re.ASCII`` so ``\\d``/``\\b`` match
    RE2's byte-class semantics on any unicode corpus. Stateless
    single-pass map — no shuffle at any corpus size."""
    import re

    pats = [
        ("email", re.compile(_RE_EMAIL, re.ASCII)),
        ("ssn", re.compile(_RE_SSN, re.ASCII)),
        ("phone", re.compile(_RE_PHONE, re.ASCII)),
    ]

    def fn(batch: pa.Table) -> pa.Table:
        ids, aug = _augmented(batch)
        texts = aug.to_pylist()
        out_id, out_kind, out_hit = [], [], []
        for i, t in zip(ids, texts):
            for kind, pat in pats:
                for m in pat.finditer(t or ""):
                    out_id.append(int(i))
                    out_kind.append(kind)
                    out_hit.append(m.group(0))
        return pa.table(
            {
                "doc_id": pa.array(out_id, pa.int64()),
                "kind": pa.array(out_kind, pa.string()),
                "hit": pa.array(out_hit, pa.string()),
            }
        )

    return _docs(sf_dir).map_batches(fn, batch_format="pyarrow", batch_size=None)


_SQL_PII_INVENTORY = rf"""
WITH aug AS (
    SELECT doc_id,
           text || CASE WHEN doc_id % {_PII_EVERY} = 0
                        THEN printf(' contact u%d@example.com ssn 123-45-%04d phone 555-%04d',
                                    doc_id, doc_id % 10000, doc_id % 10000)
                        ELSE '' END AS text
    FROM documents
)
SELECT doc_id, kind, hit FROM (
    SELECT doc_id, 'email' AS kind,
           UNNEST(regexp_extract_all(text, '{_RE_EMAIL}')) AS hit FROM aug
    UNION ALL
    SELECT doc_id, 'ssn', UNNEST(regexp_extract_all(text, '{_RE_SSN}')) FROM aug
    UNION ALL
    SELECT doc_id, 'phone', UNNEST(regexp_extract_all(text, '{_RE_PHONE}')) FROM aug
)
"""


QUERIES = {
    "pii_scrub": q_pii_scrub,
    "gopher_rules": q_gopher_rules,
    "pii_inventory": q_pii_inventory,
}

ORACLE_SQL = {
    "pii_scrub": _SQL_PII_SCRUB,
    "gopher_rules": _SQL_GOPHER_RULES,
    "pii_inventory": _SQL_PII_INVENTORY,
}
