"""Per-document extraction fold (operator C6, SURVEY.md §2.10) and the
span decode/flatten that bracket it.

``extract_document`` mirrors ``extract_pdf_with_sections`` (reference
``extractor.py:947-1126``): a strictly ordered page loop carrying
remaining/completed label and question state, with next-page lookahead
limited to the following page's head line groups. The whole fold runs
inside ONE ``map_batches`` task per document row — documents are
independent, so Ray parallelizes across documents and never across the
pages of one document (the only ordering dependency in the pipeline).

``decode_spans`` is the sandbox stand-in for the render/OCR/template
stages (S1/S2, M1/M2, V1 slots): it reads the geometry fragments of
``page`` / ``word`` / ``checkbox`` / ``highlight`` spans. In production
these slots are stateful actor stages (pdfium render + Tesseract +
template match); the surrounding plumbing is identical.
"""

from __future__ import annotations

from typing import Any

from .answers import augment_answers
from .assign import assign_checkboxes_sectionwise
from .boxes import deduplicate_matches
from .labels import get_label_positions
from .lines import group_lines
from .questions import match_sections_and_questions
from .sections import detect_section_regions
from ..core.constants import ANCHOR_OFFSET_PX, DEFAULT_PAGE_HEIGHT, DEFAULT_PAGE_WIDTH
from ..core.schema import media_id

Span = dict[str, Any]
Page = dict[str, Any]


def decode_spans(doc_id: str, spans: list[Span]) -> list[Page]:
    """Decode an input span sequence into per-page token/box/highlight
    structures (geometry read from media-ref fragments)."""
    pages: list[Page] = []
    current: Page | None = None
    for span in spans:
        kind = span["kind"]
        ref = span.get("media_ref") or ""
        if kind == "page":
            frag = ref.split("#", 1)[1] if "#" in ref else ""
            w, h = DEFAULT_PAGE_WIDTH, DEFAULT_PAGE_HEIGHT
            if frag:
                parts = frag.split("/")
                if len(parts) >= 2:
                    w, h = int(parts[0]), int(parts[1])
            current = {
                "page": len(pages) + 1,
                "width": w,
                "height": h,
                "tokens": [],
                "ticked": [],
                "empty": [],
                "highlights": [],
            }
            pages.append(current)
            continue
        if current is None:
            # Implicit first page for span streams without page markers.
            current = {
                "page": 1,
                "width": DEFAULT_PAGE_WIDTH,
                "height": DEFAULT_PAGE_HEIGHT,
                "tokens": [],
                "ticked": [],
                "empty": [],
                "highlights": [],
            }
            pages.append(current)
        if kind == "word":
            if ref.startswith("tok://"):
                parts = ref[6:].split("/")
                _p, x, y, w, h, block, par, line = (int(v) for v in parts[:8])
            else:
                x = y = w = h = block = par = line = 0
            current["tokens"].append(
                {
                    "text": span.get("text") or "",
                    "x": x,
                    "y": y,
                    "w": w,
                    "h": h,
                    "block": block,
                    "par": par,
                    "line": line,
                }
            )
        elif kind == "checkbox":
            frag = ref.split("#", 1)[1] if "#" in ref else ""
            parts = frag.split("/") if frag else []
            x, y, w, h = (int(parts[i]) if i < len(parts) else 0 for i in range(4))
            score = (int(parts[4]) / 100.0) if len(parts) > 4 else 0.0
            status = "ticked" if (len(parts) > 5 and parts[5] == "t") else "empty"
            box = {
                "x": x,
                "y": y,
                "w": w,
                "h": h,
                "score": round(score, 2),
                "status": status,
                "ref": media_id(ref),
            }
            (current["ticked"] if status == "ticked" else current["empty"]).append(box)
        elif kind == "highlight":
            frag = ref.split("#", 1)[1] if "#" in ref else ""
            parts = frag.split("/") if frag else []
            x, y, w, h = (int(parts[i]) if i < len(parts) else 0 for i in range(4))
            current["highlights"].append(
                {
                    "x": x,
                    "y": y,
                    "w": w,
                    "h": h,
                    "text": span.get("text") or "",
                    "ref": media_id(ref),
                }
            )
        # other kinds (header/image/link/...) carry no geometry to decode
    return pages


def classify_form_type(pages: list[Page]) -> str:
    """Form-type classifier (operator M14, reference
    ``extractor.py:1204-1238``): scan page 1's text for
    "female patient information" / "male patient information"; earliest
    match wins, default female.
    """
    if not pages:
        return "female"
    toks = sorted(pages[0]["tokens"], key=lambda t: (t["y"], t["x"]))
    text = " ".join(t["text"] for t in toks).lower()
    fi = text.find("female patient information")
    mi = text.find("male patient information")
    # "male patient information" is a substring of the female marker —
    # mirror the reference's index comparison (first occurrence wins).
    if fi != -1 and (mi == -1 or fi <= mi):
        return "female"
    if mi != -1:
        return "male"
    return "female"


def extract_document(pages: list[Page], sections: list[dict]) -> dict[str, Any]:
    """The per-document page fold (reference ``extractor.py:947-1126``).

    Returns ``{"pages": [{page_number, sections, responses}, ...]}``.
    """
    structured_data: dict[str, Any] = {"pages": []}

    label_sections: list[dict] | None = None
    remaining_labels_by_section: dict[str, set[str]] = {}
    completed_label_sections: set[str] = set()
    remaining_questions_by_section: dict[str, list[str]] = {}
    completed_question_sections: set[str] = set()

    n_pages = len(pages)
    for idx, page in enumerate(pages):
        page_number = idx + 1
        tokens = page["tokens"]
        page_w, page_h = page["width"], page["height"]
        checkboxes = deduplicate_matches(page["ticked"], page["empty"])

        if label_sections is None:
            label_sections = [
                sec
                for sec in sections
                if isinstance(sec.get("labels"), list) and sec.get("labels")
            ]
            for sec in label_sections:
                remaining_labels_by_section[sec["section_name"]] = set(sec["labels"])
        labels_to_search: list[str] = []
        active_label_sections: list[dict] = []
        for sec in label_sections:
            name = sec["section_name"]
            if name in completed_label_sections:
                continue
            rem = remaining_labels_by_section.get(name, set())
            if not rem:
                completed_label_sections.add(name)
                continue
            active_label_sections.append(sec)
            labels_to_search.extend(sorted(rem))

        next_tokens = pages[idx + 1]["tokens"] if idx + 1 < n_pages else None
        # One line-grouping per page, shared by the label, section and
        # question matchers (grouping is pure; the reference regroups
        # in each — SURVEY.md M3 notes the five clones).
        page_lines = group_lines(tokens)
        from .questions import PageIndex

        page_idx = PageIndex(page_lines)
        label_positions = get_label_positions(
            tokens,
            labels_to_search,
            next_page_tokens=next_tokens,
            page_height=page_h,
            lines=page_lines,
        )
        section_regions = detect_section_regions(
            tokens, sections, checkboxes, page_width=page_w, lines=page_lines,
            page_index=page_idx,
        )

        # Update remaining labels from OCR presence in region
        # (reference extractor.py:1034-1053).
        for sec in active_label_sections:
            sname = sec["section_name"]
            region = section_regions.get(sname)
            if not region:
                continue
            y1_effective = region["y1"] + ANCHOR_OFFSET_PX
            y2 = region["y2"]
            still_needed: set[str] = set()
            for lbl in remaining_labels_by_section.get(sname, set()):
                found_in_region = any(
                    y1_effective <= ly <= y2 for (_lx, ly) in label_positions.get(lbl, [])
                )
                if not found_in_region:
                    still_needed.add(lbl)
            remaining_labels_by_section[sname] = still_needed
            if not still_needed:
                completed_label_sections.add(sname)

        sections_data = assign_checkboxes_sectionwise(
            checkboxes, active_label_sections, label_positions, section_regions
        )

        # Question state (reference extractor.py:1065-1087).
        if page_number == 1:
            for sec in sections:
                qs = sec.get("questions") or []
                if qs:
                    remaining_questions_by_section[sec["section_name"]] = list(qs)
        question_sections_active: list[dict] = []
        for sec in sections:
            sname = sec["section_name"]
            qs = sec.get("questions") or []
            if not qs:
                continue
            if sname in completed_question_sections:
                continue
            remaining_qs = remaining_questions_by_section.get(sname, [])
            if not remaining_qs:
                completed_question_sections.add(sname)
                continue
            sec_copy = dict(sec)
            sec_copy["questions"] = list(remaining_qs)
            question_sections_active.append(sec_copy)

        matches = match_sections_and_questions(
            tokens,
            question_sections_active,
            section_regions,
            next_page_tokens=next_tokens,
            page_width=page_w,
            page_height=page_h,
            lines=page_lines,
            page_index=page_idx,
        )
        responses_data = augment_answers(
            matches,
            tokens,
            page["highlights"],
            checkboxes,
            page_width=page_w,
            page_height=page_h,
            lines=page_lines,
        )

        # Update remaining questions (reference extractor.py:1100-1114).
        for sec in responses_data or []:
            sname = sec.get("section")
            for q in sec.get("questions", []):
                qt = q.get("question")
                rem_list = remaining_questions_by_section.get(sname, [])
                if qt in rem_list:
                    rem_list.remove(qt)
                    remaining_questions_by_section[sname] = rem_list
            if not remaining_questions_by_section.get(sname):
                completed_question_sections.add(sname)

        structured_data["pages"].append(
            {
                "page_number": page_number,
                "sections": sections_data,
                "responses": responses_data,
            }
        )

    return structured_data


def flatten_to_spans(structured: dict[str, Any]) -> list[Span]:
    """Flatten the nested page records into the ordered output span
    sequence (the engine's output contract — FIXTURES.md F4).

    Per page, checkbox sections come first, then response sections —
    the order the reference assembles its page record
    (``extractor.py:1118-1122``). ``label`` spans encode status as
    ``"{label}={status}"`` and reference the assigned checkbox's media
    id; missing labels are pruned. ``answer`` spans reference the
    highlight media id when recovered from a highlight mark.
    """
    spans: list[Span] = []
    off = 0

    def emit(kind: str, text: str, media_ref: str = "") -> None:
        nonlocal off
        spans.append({"kind": kind, "text": text, "media_ref": media_ref, "offset": off})
        off += 1

    for page in structured.get("pages", []):
        for sec in page.get("sections", []):
            emit("section", sec["section"])
            for cb in sec.get("checkboxes", []):
                if cb.get("status") == "missing":
                    continue
                emit("label", f"{cb['label']}={cb['status']}", cb.get("ref", ""))
        for rsec in page.get("responses", []) or []:
            emit("qsection", rsec.get("section", ""))
            for q in rsec.get("questions", []):
                emit("question", q.get("question", ""))
                ans = q.get("answer")
                if ans:
                    emit("answer", ans, q.get("answer_ref", "") or "")
    return spans


def extract_spans(
    doc_id: str, spans: list[Span], sections_or_config: Any
) -> list[Span]:
    """End-to-end per-document extraction: decode → classify → fold →
    flatten. ``sections_or_config`` is either a plain sections list or
    a :class:`~pdf_parser_ray.core.config.FormConfig` (variant selected
    by the form-type classifier, reference ``extractor.py:1202-1238``).
    """
    pages = decode_spans(doc_id, spans)
    if hasattr(sections_or_config, "select"):
        form_type = classify_form_type(pages)
        sections = sections_or_config.select(form_type)
    else:
        sections = sections_or_config
    structured = extract_document(pages, sections)
    return flatten_to_spans(structured)
