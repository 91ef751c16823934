"""Sections-config model (the user-extension surface, SURVEY.md §2.12).

Mirrors the reference's ``sections.json`` schema — an array of
``{section_name: str, labels?: list[str], questions?: list[str]}``
where duplicate question texts are meaningful (reference
``sections.json:197-220`` repeats "Medical Conditions" ×10) — plus the
gender/form-type variant selection (reference ``extractor.py:1202-1238``:
OCR of page 1 picks ``female_sections.json`` vs ``male_sections.json``,
defaulting to female).

Configs are small broadcast state: loaded once on the driver, captured
in the parse actor's constructor, never shuffled.
"""

from __future__ import annotations

import json
from dataclasses import dataclass, field
from typing import Any


@dataclass(frozen=True)
class FormConfig:
    """A validated sections config plus its form-type variants."""

    sections: tuple[dict[str, Any], ...]
    variants: dict[str, tuple[dict[str, Any], ...]] = field(default_factory=dict)

    @staticmethod
    def validate_sections(sections: list[dict[str, Any]]) -> tuple[dict[str, Any], ...]:
        out = []
        for sec in sections:
            if not isinstance(sec, dict) or "section_name" not in sec:
                raise ValueError(f"invalid section entry: {sec!r}")
            entry: dict[str, Any] = {"section_name": str(sec["section_name"])}
            if sec.get("labels"):
                entry["labels"] = [str(x) for x in sec["labels"]]
            if sec.get("questions"):
                entry["questions"] = [str(x) for x in sec["questions"]]
            out.append(entry)
        return tuple(out)

    @classmethod
    def from_sections(
        cls,
        sections: list[dict[str, Any]],
        variants: dict[str, list[dict[str, Any]]] | None = None,
    ) -> "FormConfig":
        return cls(
            sections=cls.validate_sections(sections),
            variants={
                k: cls.validate_sections(v) for k, v in (variants or {}).items()
            },
        )

    @classmethod
    def from_json(cls, path: str, variant_paths: dict[str, str] | None = None) -> "FormConfig":
        with open(path, "r", encoding="utf-8") as f:
            sections = json.load(f)
        variants = {}
        for name, p in (variant_paths or {}).items():
            with open(p, "r", encoding="utf-8") as f:
                variants[name] = json.load(f)
        return cls.from_sections(sections, variants)

    def select(self, form_type: str | None) -> list[dict[str, Any]]:
        """Pick the variant for a classified form type (default base)."""
        if form_type and form_type in self.variants:
            return [dict(s) for s in self.variants[form_type]]
        return [dict(s) for s in self.sections]
