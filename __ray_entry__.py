"""Driver contract for the Ray-Data-native extraction engine.

The driver calls ``ray.init`` itself before importing this module:
nothing here (or in the library) initialises or shuts down Ray.

* ``entry()`` — flagship extraction pipeline on sf0.001: documents →
  deterministic synthesized span corpus → per-document parse →
  exploded output span table.
* ``queries()`` — one callable per implemented operator/pipeline
  (SURVEY.md §2 inventory + the large-scale data-pipeline extras).
* ``oracle_sql()`` — DuckDB-equivalent SQL for every
  SQL-expressible query (money as exact integer cents so distributed
  sums hash-match the oracle bit-for-bit). The geometric extraction
  family is oracled against a frozen output fixture (see
  ``pipelines/extract.py``); only genuine sketches (hll, cm, simhash,
  ann_ivf) are rows-only by design.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from pdf_parser_ray.pipelines.extract import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_parser_ray.relational.ops import QUERIES as REL
    from pdf_parser_ray.pipelines.extract import flagship

    from pdf_parser_ray.pipelines.extract import extract_kind_stats

    out: dict[str, Callable[[str], Any]] = dict(REL)
    out["extract_spans"] = lambda sf_dir: flagship(sf_dir)
    # The staged (non-fused) path: synthesized corpus Dataset →
    # DocumentExtractor actor pool. Exercises the actor-pool parse
    # stage the production Lance-backed corpus would use; row-for-row
    # equal to the fused flagship (pinned by
    # TestEntry.test_fused_equals_two_stage). The pool autoscales from
    # 1 — a fixed pool equal to the session's CPU count starves the
    # upstream read task and backpressure-deadlocks small sessions.
    out["extract_spans_staged"] = lambda sf_dir: flagship(
        sf_dir, fused=False, concurrency=(1, 8)
    )
    out["extract_kind_stats"] = extract_kind_stats
    try:
        from pdf_parser_ray.pipelines.prep import QUERIES as PREP

        out.update(PREP)
    except ImportError:
        pass

    try:
        from pdf_parser_ray.stages.textstats import QUERIES as TEXT

        out.update(TEXT)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.dedup import QUERIES as DEDUP

        out.update(DEDUP)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.embed import QUERIES as EMBED

        out.update(EMBED)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.boilerplate import QUERIES as BOILER

        out.update(BOILER)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.media import QUERIES as MEDIA

        out.update(MEDIA)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.scrub import QUERIES as SCRUB

        out.update(SCRUB)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.corpus import QUERIES as CORPUS

        out.update(CORPUS)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.tokenize import QUERIES as TOKENIZE

        out.update(TOKENIZE)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.pipelines.ingest import QUERIES as INGEST

        out.update(INGEST)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.graph import QUERIES as GRAPH

        out.update(GRAPH)
    except ImportError:
        pass
    return out


def oracle_sql() -> dict[str, str]:
    from pdf_parser_ray.relational.ops import ORACLE_SQL as REL
    from pdf_parser_ray.pipelines.extract import ORACLE_SQL as EXTRACT

    out = dict(REL)
    # flagship extraction family: frozen-fixture oracles (the pipeline
    # is pure geometry; see pipelines/extract.py ORACLE_SQL note)
    out.update(EXTRACT)
    try:
        from pdf_parser_ray.stages.textstats import ORACLE_SQL as TEXT

        out.update(TEXT)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.dedup import ORACLE_SQL as DEDUP

        out.update(DEDUP)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.embed import ORACLE_SQL as EMBED

        out.update(EMBED)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.boilerplate import ORACLE_SQL as BOILER

        out.update(BOILER)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.media import ORACLE_SQL as MEDIA

        out.update(MEDIA)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.pipelines.prep import ORACLE_SQL as PREP

        out.update(PREP)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.scrub import ORACLE_SQL as SCRUB

        out.update(SCRUB)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.corpus import ORACLE_SQL as CORPUS

        out.update(CORPUS)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.tokenize import ORACLE_SQL as TOKENIZE

        out.update(TOKENIZE)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.pipelines.ingest import ORACLE_SQL as INGEST

        out.update(INGEST)
    except ImportError:
        pass
    try:
        from pdf_parser_ray.stages.graph import ORACLE_SQL as GRAPH

        out.update(GRAPH)
    except ImportError:
        pass
    return out
