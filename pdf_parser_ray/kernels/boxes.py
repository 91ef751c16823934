"""Checkbox box kernels: dedup (D1), row clustering (A1), region filter
(M9) — SURVEY.md §2.5/§2.7.

A "box" is ``{x, y, w, h, score, status, ref}`` — the Arrow struct
analog of the reference's template-match hit
(``extractor.py:139-153``). ``ref`` is the media reference of the
checkbox crop (carried into output spans). In the engine the boxes
arrive from ``kind='checkbox'`` spans (the stub occupying the
template-matching operator slot V1); the dedup/cluster semantics are
identical to the reference's.
"""

from __future__ import annotations

from typing import Any

from ..core.constants import DEDUPE_MAX_DIST, LABEL_ROW_GAP_PX

Box = dict[str, Any]


def deduplicate_matches(
    ticked_matches: list[Box],
    empty_matches: list[Box],
    max_dist: int = DEDUPE_MAX_DIST,
) -> list[Box]:
    """Greedy confidence-descending near-dedup of template hits
    (reference ``extractor.py:155-181``).

    Ticked hits are tagged and listed before empty hits, the union is
    stably sorted by score descending, and a hit is dropped when its
    top-left lies within ``max_dist`` px of a kept hit on both axes.
    Output is sorted by (y, x) — the stable reading order (O2).
    """
    all_boxes: list[Box] = []
    for box in ticked_matches:
        box = dict(box)
        box["status"] = "ticked"
        all_boxes.append(box)
    for box in empty_matches:
        box = dict(box)
        box["status"] = "empty"
        all_boxes.append(box)

    all_boxes.sort(key=lambda b: b["score"], reverse=True)

    deduped: list[Box] = []
    for box in all_boxes:
        x, y = box["x"], box["y"]
        is_duplicate = False
        for existing in deduped:
            if abs(x - existing["x"]) < max_dist and abs(y - existing["y"]) < max_dist:
                is_duplicate = True
                break
        if not is_duplicate:
            deduped.append(box)

    return sorted(deduped, key=lambda b: (b["y"], b["x"]))


def filter_checkboxes_in_region(
    checkboxes: list[Box], region: dict[str, int]
) -> list[Box]:
    """Keep boxes with ``y1 <= box.y <= y2``
    (reference ``extractor.py:831-832``)."""
    return [box for box in checkboxes if region["y1"] <= box["y"] <= region["y2"]]


def cluster_checkboxes_by_rows(
    checkboxes: list[Box], gap_threshold: int = LABEL_ROW_GAP_PX
) -> list[dict[str, Any]]:
    """Sort boxes by y and split into rows where the consecutive y gap
    exceeds ``gap_threshold``; each row carries its mean y
    (reference ``extractor.py:834-861``).
    """
    sorted_boxes = sorted(checkboxes, key=lambda b: b["y"])
    rows: list[dict[str, Any]] = []
    current_row: list[Box] = []
    for box in sorted_boxes:
        if not current_row:
            current_row.append(box)
            continue
        if abs(box["y"] - current_row[-1]["y"]) > gap_threshold:
            rows.append(
                {
                    "y": sum(b["y"] for b in current_row) / len(current_row),
                    "boxes": current_row,
                }
            )
            current_row = [box]
        else:
            current_row.append(box)
    if current_row:
        rows.append(
            {
                "y": sum(b["y"] for b in current_row) / len(current_row),
                "boxes": current_row,
            }
        )
    return rows
