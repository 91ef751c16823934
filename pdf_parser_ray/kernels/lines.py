"""OCR token → line-group kernels (operator M3 + O5 in SURVEY.md §2).

The reference builds "lines" — tokens grouped by
``(block_num, par_num, line_num)``, words sorted by x, lines sorted by
y — in five near-identical clones (``extractor.py:304-322`` /
``546-567``, ``response_extractor.py:103-133`` / ``262-291`` /
``879-898``). Implemented once here, parameterized by which token
fields are kept.

Tokens are plain dicts ``{text, x, y, w, h, block, par, line}`` — the
columnar pytesseract ``Output.DICT`` converted row-wise for the
per-document fold (documents are small; the cross-document axis is
where Ray parallelizes).
"""

from __future__ import annotations

from operator import itemgetter
from typing import Any, Iterable

Token = dict[str, Any]
Line = dict[str, Any]

# C-level sort keys (itemgetter beats a Python lambda per comparison)
_BY_X = itemgetter("x")
_BY_Y = itemgetter("y")


def group_lines(tokens: Iterable[Token]) -> list[Line]:
    """Group tokens into reading-order lines.

    Mirrors ``response_extractor.py:262-291``: key =
    ``(block, par, line)``, words sorted by x within a line, lines
    sorted by y (stable). Empty-text tokens are skipped (the reference
    strips and skips blanks).
    """
    lines: dict[tuple, Line] = {}
    for tok in tokens:
        text = tok.get("text") or ""
        word = text.strip()
        if not word:
            continue
        key = (tok.get("block", 0), tok.get("par", 0), tok.get("line", 0))
        entry = lines.get(key)
        if word is text:
            # already-clean token dicts are reused as-is (never mutated
            # downstream) — avoids one dict per token per grouping pass
            w = tok
        else:
            w = {
                "text": word,
                "x": int(tok.get("x", 0)),
                "y": int(tok.get("y", 0)),
                "w": int(tok.get("w", 0)),
                "h": int(tok.get("h", 0)),
            }
        if entry is None:
            lines[key] = {
                "block": key[0],
                "par": key[1],
                "line_num": key[2],
                "words": [w],
                "y": int(w["y"]),
            }
        else:
            entry["words"].append(w)
    out = list(lines.values())
    for ln in out:
        ln["words"].sort(key=_BY_X)
    out.sort(key=_BY_Y)
    return out


def group_lines_with_height(tokens: Iterable[Token]) -> list[Line]:
    """Line grouping for the answer collector
    (reference ``response_extractor.py:879-898``): carries a per-line
    max height ``h`` and a precomputed joined ``text``.
    """
    lines: dict[tuple, Line] = {}
    for tok in tokens:
        text = tok.get("text") or ""
        word = text.strip()
        if not word:
            continue
        key = (tok.get("block", 0), tok.get("par", 0), tok.get("line", 0))
        if word is text:
            w = tok
        else:
            w = {
                "text": word,
                "x": int(tok.get("x", 0)),
                "y": int(tok.get("y", 0)),
                "w": int(tok.get("w", 0)),
                "h": int(tok.get("h", 0)),
            }
        entry = lines.get(key)
        if entry is None:
            lines[key] = {"words": [w], "y": int(w["y"]), "h": int(w.get("h", 0))}
        else:
            entry["words"].append(w)
            entry["h"] = max(entry["h"], int(w.get("h", 0)))
    out = sorted(lines.values(), key=_BY_Y)
    for ln in out:
        ln["words"].sort(key=_BY_X)
        ln["text"] = " ".join(w["text"] for w in ln["words"])
    return out


def lines_with_height_from(lines: list[Line]) -> list[Line]:
    """Derive the answer collector's line shape from an existing
    :func:`group_lines` result: same grouping keys, same insertion
    order, same stable sorts — so deriving (one max() per line) is
    bit-equivalent to regrouping the tokens from scratch, minus one
    full grouping pass per page. The joined line ``text`` that
    :func:`group_lines_with_height` precomputes is not consumed by any
    caller, so it is omitted here."""
    out: list[Line] = []
    for ln in lines:
        words = ln["words"]
        out.append(
            {
                "words": words,
                "y": ln["y"],
                "h": max((int(w.get("h", 0)) for w in words), default=0),
            }
        )
    return out


def head_line_groups(lines: list[Line], n_groups: int) -> list[Line]:
    """Keep the first ``n_groups`` distinct-y line groups.

    Mirrors the next-page head-limit loop (reference
    ``extractor.py:362-373``, ``response_extractor.py:332-343``):
    consecutive lines sharing the same y count as one group.
    """
    kept: list[Line] = []
    seen_groups = 0
    i = 0
    n = max(0, int(n_groups))
    while i < len(lines) and seen_groups < n:
        group_y = lines[i]["y"]
        while i < len(lines) and lines[i]["y"] == group_y:
            kept.append(lines[i])
            i += 1
        seen_groups += 1
    return kept


def offset_tokens(tokens: Iterable[Token], y_offset: int) -> list[Token]:
    """Shift token y into the virtual space below the current page
    (reference ``extractor.py:343``, ``response_extractor.py:308``)."""
    out = []
    for tok in tokens:
        t = dict(tok)
        t["y"] = int(t.get("y", 0)) + int(y_offset)
        out.append(t)
    return out


def lines_with_next_head(
    lines: list[Line],
    next_tokens: Iterable[Token] | None,
    page_height: int,
    n_groups: int = 5,
) -> list[Line]:
    """Current-page lines + the head of the next page, y-offset by this
    page's height (reference ``extractor.py:331-375``)."""
    if next_tokens is None:
        return lines
    next_lines = group_lines(offset_tokens(next_tokens, page_height))
    return lines + head_line_groups(next_lines, n_groups)
