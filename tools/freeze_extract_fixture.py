"""Freeze the flagship extraction output to a parquet fixture.

The flagship pipeline is deterministic given an sf dir (seed 42; every
document derives from documents.parquet rows). Freezing its output at
the driver's correctness sf (0.01) turns the rows-only extract queries
into hash-oracled ones: the DuckDB oracle is a plain SELECT over the
fixture, so any behavioral drift in the kernels shows up as a red
CORRECTNESS row instead of passing silently.

Semantic correctness of the kernels is pinned independently by the
40-doc golden (`tests/fixtures/golden_spans.json`, strict span-sequence
equality) and the property/equivalence suites; this fixture extends
that pin to the full sf corpus the driver actually grades.

Usage::

    python tools/freeze_extract_fixture.py [sf_dir] [out.parquet]
"""

from __future__ import annotations

import os
import sys

import pyarrow.parquet as pq


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    out = (
        sys.argv[2]
        if len(sys.argv) > 2
        else os.path.join(
            os.path.dirname(__file__), "..", "tests", "fixtures", "extract_spans_sf0.01.parquet"
        )
    )
    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False)
    from pdf_parser_ray.pipelines.extract import flagship

    table = (
        flagship(sf_dir)
        .sort(["doc_id", "offset"])
        .to_pandas()
    )
    import pyarrow as pa

    pq.write_table(
        pa.Table.from_pandas(table, preserve_index=False),
        os.path.abspath(out),
        compression="zstd",
    )
    print(f"wrote {len(table)} rows -> {os.path.abspath(out)}")
    ray.shutdown()


if __name__ == "__main__":
    main()
