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
  ``pipelines/extract.py``); only genuinely merge-order-dependent
  sketches (cm heaps, ann_ivf) are rows-only — simhash and both HLL
  variants gained exact bit-replay oracles in round 5 (md5 replay;
  integer-exact HLL estimate fold + limb-exact splitmix64).

The assembly lives in ``pdf_parser_ray.registry`` so the ``query``
CLI exposes the identical surface.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001."""
    from pdf_parser_ray.pipelines.extract import flagship

    return flagship("/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[str], Any]]:
    from pdf_parser_ray.registry import all_queries

    return all_queries()


def oracle_sql() -> dict[str, str]:
    from pdf_parser_ray.registry import all_oracle_sql

    return all_oracle_sql()
