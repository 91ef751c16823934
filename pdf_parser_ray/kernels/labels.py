"""Label position matcher (operator C1, SURVEY.md §2.10).

Faithful reimplementation of ``CheckboxExtractor.get_label_positions``
(reference ``extractor.py:194-532``):

* Pass 1 (single-line): token-window scan — first/last configured word
  contained in the first/last OCR token, then IL1-flex containment of
  the concatenated cleaned sequence (``extractor.py:484-493``).
* Pass 1b (multiline): lookahead ≤5 lines with a 160-px x tolerance,
  best-start selection per line, relax-to-whole-line fallback
  (``extractor.py:378-470``); skip-k-leading-words fallback for noisy
  starts, k ≤ 4 (``extractor.py:502-510``).
* Pass 2 (cross-page): for labels still unfound, append ≤5 head
  line-groups of the next page (y-offset by page height) and retry
  (``extractor.py:512-528``).

Pure per-document function — runs inside ``map_batches`` on one row's
token lists; no cross-row state.
"""

from __future__ import annotations

from .lines import Line, Token, group_lines, lines_with_next_head
from .normalize import clean_label_sequence, expected, normalize_text

from ..core.constants import (
    LABEL_MULTILINE_BASE_X_TOLERANCE,
    LABEL_MULTILINE_MAX_LOOKAHEAD,
)


def try_multiline_on_lines(
    lines_input: list[Line], lbl_words_seq: list[str]
) -> tuple[int, int] | None:
    """Multiline label search (reference ``extractor.py:378-470``).

    Returns the (x, y) of the start token of a full multi-line match, or
    None. Continuation steps onto the *next list entry* only (not next
    y-group — that variant belongs to the section detector).
    """
    base_x_tolerance = LABEL_MULTILINE_BASE_X_TOLERANCE
    max_lookahead = LABEL_MULTILINE_MAX_LOOKAHEAD
    n_lbl = len(lbl_words_seq)
    exps = [expected(w) for w in lbl_words_seq]

    for i, line in enumerate(lines_input):
        words = line["words"]
        if not words:
            continue
        # Best contiguous leading-word match starting at any token.
        best_start = None
        best_matched_here = 0
        for start_idx in range(len(words)):
            matched_here = 0
            k = start_idx
            for lbl_idx in range(n_lbl):
                if k >= len(words):
                    break
                if exps[lbl_idx].contains(normalize_text(words[k]["text"])):
                    matched_here += 1
                    k += 1
                else:
                    break
            if matched_here > best_matched_here:
                best_matched_here = matched_here
                best_start = start_idx
            if matched_here == n_lbl:
                break
        if best_matched_here == 0:
            continue
        start_x = words[best_start]["x"]
        start_y = words[best_start]["y"]
        x_ref = start_x
        curr_lbl_idx = best_matched_here
        curr_idx = i
        matched_all = curr_lbl_idx == n_lbl
        lookahead_used = 0
        while not matched_all and lookahead_used < max_lookahead:
            if curr_idx + 1 >= len(lines_input):
                break
            next_tokens = lines_input[curr_idx + 1]["words"]
            if not next_tokens:
                break
            exp_next = exps[curr_lbl_idx]
            candidate_indices = [
                idx
                for idx, tok in enumerate(next_tokens)
                if abs(tok["x"] - x_ref) <= base_x_tolerance
                and exp_next.contains(normalize_text(tok["text"]))
            ]
            if not candidate_indices:
                # Relax: scan the whole line (reference extractor.py:435-437)
                candidate_indices = [
                    idx
                    for idx, tok in enumerate(next_tokens)
                    if exp_next.contains(normalize_text(tok["text"]))
                ]
            if not candidate_indices:
                break
            best_line_match = 0
            best_line_start = None
            for ci in candidate_indices:
                matched_in_line = 0
                k = ci
                for lbl_idx in range(curr_lbl_idx, n_lbl):
                    if k >= len(next_tokens):
                        break
                    if exps[lbl_idx].contains(normalize_text(next_tokens[k]["text"])):
                        matched_in_line += 1
                        k += 1
                    else:
                        break
                if matched_in_line > best_line_match:
                    best_line_match = matched_in_line
                    best_line_start = ci
            if best_line_match == 0:
                break
            curr_lbl_idx += best_line_match
            curr_idx += 1
            lookahead_used += 1
            x_ref = next_tokens[best_line_start]["x"]
            matched_all = curr_lbl_idx == n_lbl
        if matched_all:
            return (start_x, start_y)
    return None


def get_label_positions(
    tokens: list[Token],
    expected_labels: list[str],
    next_page_tokens: list[Token] | None = None,
    page_height: int = 10000,
    next_page_head_lines: int = 5,
    lines: list[Line] | None = None,
) -> dict[str, list[tuple[int, int]]]:
    """Locate label anchor positions (reference ``extractor.py:194-532``).

    ``tokens`` is this page's OCR token list (in OCR emission order —
    the single-line pass scans tokens in that order, exactly like the
    reference); ``next_page_tokens`` enables cross-page continuation
    for labels not found in-page. ``lines`` may carry the page's
    precomputed line groups (grouping is pure; sharing it across the
    per-page matcher calls is semantics-preserving).
    """
    label_positions: dict[str, list[tuple[int, int]]] = {}

    flat = [
        {
            "text": normalize_text(t["text"].strip()),
            "orig": t["text"].strip(),
            "x": int(t.get("x", 0)),
            "y": int(t.get("y", 0)),
        }
        for t in tokens
        if (t.get("text") or "").strip()
    ]
    if lines is None:
        lines = group_lines(tokens)

    # One newline-joined blob of the normalized tokens: finding every
    # token that *contains* a label's first word (the reference's
    # `first_word in normalize_text(...)` gate, extractor.py:489) is a
    # C-level substring sweep instead of a per-(label, token) Python
    # loop. Normalized tokens hold no '\n', so hits never cross tokens.
    from bisect import bisect_right

    _offs: list[int] = []
    _parts: list[str] = []
    pos = 0
    for tkn in flat:
        _offs.append(pos + 1)
        _parts.append("\n")
        _parts.append(tkn["text"])
        pos += 1 + len(tkn["text"])
    flat_blob = "".join(_parts)

    def first_word_candidates(first_word: str) -> list[int]:
        if not first_word:
            return list(range(len(flat)))
        out: list[int] = []
        start = 0
        last_tok = -1
        while True:
            hit = flat_blob.find(first_word, start)
            if hit == -1:
                break
            tok = bisect_right(_offs, hit) - 1
            if tok != last_tok:
                out.append(tok)
                last_tok = tok
            start = hit + 1
        return out

    # Pass 1: in-page search.
    for lbl in expected_labels:
        lbl_words = lbl.split()
        if not lbl_words:
            continue
        first_word = normalize_text(lbl_words[0])
        last_word = normalize_text(lbl_words[-1])
        exp_full = expected(lbl)
        n = len(flat)
        max_len = len(lbl_words)
        found = False
        # Single-line token-window scan (reference extractor.py:484-493);
        # outer loop restricted to tokens containing the first word —
        # the same set the reference's `in` gate admits.
        for i in first_word_candidates(first_word):
            for j in range(i, min(i + max_len, n)):
                seq = flat[i : j + 1]
                if not seq:
                    continue
                if (
                    first_word in normalize_text(seq[0]["orig"])
                    and last_word in normalize_text(seq[-1]["orig"])
                ):
                    seq_clean = clean_label_sequence([t["orig"] for t in seq])
                    if exp_full.contains(seq_clean):
                        label_positions.setdefault(lbl, []).append(
                            (seq[0]["x"], seq[0]["y"])
                        )
                        found = True
        if not found:
            pos = try_multiline_on_lines(lines, lbl_words)
            if pos is not None:
                label_positions.setdefault(lbl, []).append(pos)
            else:
                # Skip-k fallback for noisy line starts (extractor.py:502-510).
                for skip in range(1, min(5, len(lbl_words))):
                    pos2 = try_multiline_on_lines(lines, lbl_words[skip:])
                    if pos2 is not None:
                        label_positions.setdefault(lbl, []).append(pos2)
                        break

    # Pass 2: cross-page continuation for still-unfound labels
    # (reference extractor.py:512-528).
    if next_page_tokens is not None:
        lines_next = lines_with_next_head(
            lines, next_page_tokens, page_height, next_page_head_lines
        )
        for lbl in expected_labels:
            if label_positions.get(lbl):
                continue
            lbl_words = lbl.split()
            pos = try_multiline_on_lines(lines_next, lbl_words)
            if pos is not None:
                label_positions.setdefault(lbl, []).append(pos)
                continue
            for skip in range(1, min(5, len(lbl_words))):
                pos2 = try_multiline_on_lines(lines_next, lbl_words[skip:])
                if pos2 is not None:
                    label_positions.setdefault(lbl, []).append(pos2)
                    break

    return label_positions
