"""Shared test fixtures. Ray is initialised ONCE per pytest session."""

from __future__ import annotations

import pytest


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    import ray

    if not ray.is_initialized():
        ray.init(
            address="local",
            num_cpus=4,
            include_dashboard=False,
            ignore_reinit_error=True,
            logging_level="ERROR",
        )
    yield
    ray.shutdown()


def make_tokens(lines: list[tuple[list[str], int, int]], start_block: int = 1) -> list[dict]:
    """Build a token list from (words, x, y) line specs.

    Each entry becomes one visual line (unique block key); token width
    is 14*len(word)+8 with a 14px gap, height 28 — the same metrics the
    synthetic corpus uses.
    """
    tokens = []
    for i, (words, x, y) in enumerate(lines):
        cx = x
        for w in words:
            tw = 14 * len(w) + 8
            tokens.append(
                {
                    "text": w,
                    "x": cx,
                    "y": y,
                    "w": tw,
                    "h": 28,
                    "block": start_block + i,
                    "par": 1,
                    "line": 1,
                }
            )
            cx += tw + 14
    return tokens


def make_box(x: int, y: int, score: float = 0.9, status: str = "empty", ref: str = "") -> dict:
    return {"x": x, "y": y, "w": 37, "h": 37, "score": round(score, 2), "status": status, "ref": ref}
