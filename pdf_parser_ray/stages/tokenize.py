"""Deterministic subword tokenizer stage (the ST1 stateful-actor
pattern applied to tokenization).

The reference holds its expensive per-worker state (templates, OCR
engine — ``extractor.py``, loaded once per process) in worker init;
a training-data pipeline's analog is the tokenizer: vocab/merges load
once per actor (``TokenizerActor.__init__``), then every batch
tokenizes against that state. Real BPE vocabularies aren't shippable
here, so the vocab is a PUBLIC deterministic stub — greedy
longest-match over a fixed list of common English letter bigrams with
single-codepoint fallback — chosen so the id sequence has an EXACT
SQL oracle (a recursive CTE replays the same greedy scan), unlike a
hash-based stub. The Ray-side plumbing (actor pool, exploded
list-free output, count wiring into pack_sequences/doc_chunks) is the
real deliverable; swapping in a real BPE vocab changes only the
``__init__`` payload and the per-word scan table.

Spec (shared by engine and oracle, no lowercasing/normalization):
words = ``\\S+`` runs of the raw text; within a word, scan left to
right: if the next TWO characters form a vocab bigram emit that piece
(id = 1_000_000 + vocab index) and advance 2, else emit the single
character (id = its Unicode codepoint) and advance 1.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa

from .textstats import _docs

# Fixed public vocab: the classic most-frequent English letter bigrams
# (frequency-ordered; any standard corpus table lists these).
BIGRAMS: tuple[str, ...] = (
    "th", "he", "in", "er", "an", "re", "on", "at", "en", "nd",
    "ti", "es", "or", "te", "of", "ed", "is", "it", "al", "ar",
    "st", "to", "nt", "ng", "se", "ha", "as", "ou", "io", "le",
    "ve", "co", "me", "de", "hi", "ri", "ro", "ic",
)
_BIGRAM_ID_BASE = 1_000_000


def tokenize_word(word: str, vocab: dict[str, int]) -> list[tuple[int, str]]:
    """Greedy longest-match scan of one word → [(token_id, piece)]."""
    out: list[tuple[int, str]] = []
    pos = 0
    n = len(word)
    while pos < n:
        pair = word[pos : pos + 2]
        tid = vocab.get(pair)
        if tid is not None:
            out.append((tid, pair))
            pos += 2
        else:
            ch = word[pos]
            out.append((ord(ch), ch))
            pos += 1
    return out


class TokenizerActor:
    """Actor-pool tokenizer stage: vocab built once per actor in
    ``__init__`` (the ST1 worker-state pattern — a real deployment
    loads vocab/merges files here), per-word results memoized across
    batches (corpus vocabularies are small, so the cache converges
    fast and the per-word scan amortizes to a dict hit)."""

    def __init__(self) -> None:
        self.vocab = {b: _BIGRAM_ID_BASE + i for i, b in enumerate(BIGRAMS)}
        self._word_cache: dict[str, list[tuple[int, str]]] = {}

    def _word(self, w: str) -> list[tuple[int, str]]:
        toks = self._word_cache.get(w)
        if toks is None:
            self._word_cache[w] = toks = tokenize_word(w, self.vocab)
        return toks

    def count_column(self, texts) -> np.ndarray:
        """Token counts per text — the cheap path pack/chunk consumers
        use (no exploded rows)."""
        out = np.zeros(len(texts), dtype=np.int64)
        for i, t in enumerate(texts):
            c = 0
            for w in (t or "").split():
                c += len(self._word(w))
            out[i] = c
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        o_id: list[int] = []
        o_idx: list[int] = []
        o_tid: list[int] = []
        o_piece: list[str] = []
        for d, t in zip(batch["doc_id"].to_pylist(), batch["text"].to_pylist()):
            k = 0
            for w in (t or "").split():
                for tid, piece in self._word(w):
                    o_id.append(d)
                    o_idx.append(k)
                    o_tid.append(tid)
                    o_piece.append(piece)
                    k += 1
        return pa.table(
            {
                "doc_id": pa.array(o_id, pa.int64()),
                "tok_idx": pa.array(o_idx, pa.int64()),
                "token_id": pa.array(o_tid, pa.int64()),
                "piece": pa.array(o_piece, pa.string()),
            }
        )


def q_tokenize(sf_dir: str):
    """Full corpus tokenization → exploded ``(doc_id, tok_idx,
    token_id, piece)`` rows: one row per token, ``tok_idx`` the
    position in the document's token sequence, so the oracle hash pins
    the exact id SEQUENCE, not just counts. Pure flat-map over an
    actor pool — zero shuffles, embarrassingly parallel; output is the
    training-ready token stream a pack/shuffle stage consumes."""
    return _docs(sf_dir, ["doc_id", "text"]).map_batches(
        TokenizerActor,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )


def _bigram_list_sql() -> str:
    return "[" + ", ".join(f"'{b}'" for b in BIGRAMS) + "]"


def tokenize_ctes(source_sql: str = "documents") -> str:
    """The recursive-CTE replay of the greedy scan, shared by every
    tokenizer oracle. ``source_sql`` is any table/subquery exposing
    ``(doc_id, text)``. Emits CTEs ``w`` (words with ordinality),
    ``scan`` and ``toks`` (one row per emitted token: doc_id, widx,
    pos, piece, token_id). Callers prepend ``WITH RECURSIVE`` and
    append their final SELECT."""
    blist = _bigram_list_sql()
    return rf"""w AS (
    SELECT doc_id,
           UNNEST(regexp_extract_all(text, '\S+')) AS word,
           UNNEST(range(1, len(regexp_extract_all(text, '\S+')) + 1)) AS widx
    FROM {source_sql} src
),
scan AS (
    SELECT doc_id, widx, word, 1 AS pos FROM w
    UNION ALL
    SELECT doc_id, widx, word,
           pos + CASE WHEN list_position({blist}, substr(word, pos, 2)) > 0
                      THEN 2 ELSE 1 END
    FROM scan WHERE pos <= length(word)
),
toks AS (
    SELECT doc_id, widx, pos,
           CASE WHEN list_position({blist}, substr(word, pos, 2)) > 0
                THEN substr(word, pos, 2) ELSE substr(word, pos, 1) END AS piece,
           CAST(CASE WHEN list_position({blist}, substr(word, pos, 2)) > 0
                THEN {_BIGRAM_ID_BASE} + list_position({blist}, substr(word, pos, 2)) - 1
                ELSE ord(substr(word, pos, 1)) END AS BIGINT) AS token_id
    FROM scan WHERE pos <= length(word)
)"""


_SQL_TOKENIZE = (
    "WITH RECURSIVE "
    + tokenize_ctes()
    + """
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY widx, pos) - 1
            AS BIGINT) AS tok_idx,
       token_id, piece
FROM toks
"""
)


def token_count_ctes(source_sql: str = "documents") -> str:
    """``counts`` CTE: per-document subword token count (docs with no
    tokens included at 0) — composed by the pack/chunk oracles."""
    return (
        tokenize_ctes(source_sql)
        + f""",
counts AS (
    SELECT d.doc_id, CAST(COALESCE(t.n, 0) AS BIGINT) AS n_tokens
    FROM {source_sql} d LEFT JOIN (
        SELECT doc_id, COUNT(*) AS n FROM toks GROUP BY doc_id
    ) t USING (doc_id)
)"""
    )


def q_pack_sequences_bpe(sf_dir: str, budget: int = 512):
    """Sequence packing driven by REAL subword token counts from the
    tokenizer actor (VERDICT r3 item 4's wiring requirement): the same
    distributed prefix-sum scan as ``pack_sequences``, but each
    document's budget contribution is its greedy-BPE token count, not
    its whitespace word count."""
    from .textstats import q_pack_sequences

    return q_pack_sequences(sf_dir, budget=budget, tokenizer="bigram")


_SQL_PACK_BPE = (
    "WITH RECURSIVE "
    + token_count_ctes()
    + """
SELECT doc_id, n_tokens,
       CAST(COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0) AS BIGINT)
           // 512 AS pack_id
FROM counts
"""
)


class _ChunkTokenCounter:
    """Appends the greedy-BPE token count of each chunk — the
    chunk-stage consumer of the tokenizer state."""

    def __init__(self) -> None:
        self.tok = TokenizerActor()

    def __call__(self, batch: pa.Table) -> pa.Table:
        n = self.tok.count_column(batch["chunk_text"].to_pylist())
        return batch.append_column("n_tokens", pa.array(n, pa.int64()))


def q_doc_chunks_tokens(sf_dir: str):
    """``doc_chunks`` composed with the tokenizer-count stage: every
    training-window chunk carries its real subword token count next to
    its word count. Two fused per-row stages, zero shuffles."""
    from .corpus import q_doc_chunks

    return q_doc_chunks(sf_dir).map_batches(
        _ChunkTokenCounter,
        batch_format="pyarrow",
        batch_size=256,
        concurrency=(1, 4),
        num_cpus=1,
    )


def _sql_doc_chunks_tokens() -> str:
    from .corpus import _SQL_DOC_CHUNKS

    # composite key: chunk_idx is bounded far below 1e6 per document
    keyed = (
        "(SELECT doc_id * 1000000 + chunk_idx AS doc_id, chunk_text AS text "
        f"FROM base)"
    )
    return (
        f"WITH RECURSIVE base AS ({_SQL_DOC_CHUNKS}), "
        + token_count_ctes(keyed)
        + """
SELECT b.doc_id, b.chunk_idx, b.chunk_text, b.n_words, c.n_tokens
FROM base b JOIN counts c ON c.doc_id = b.doc_id * 1000000 + b.chunk_idx
"""
    )


QUERIES = {
    "tokenize": q_tokenize,
    "pack_sequences_bpe": q_pack_sequences_bpe,
    "doc_chunks_tokens": q_doc_chunks_tokens,
}


ORACLE_SQL = {
    "tokenize": _SQL_TOKENIZE,
    "pack_sequences_bpe": _SQL_PACK_BPE,
    "doc_chunks_tokens": _sql_doc_chunks_tokens(),
}
