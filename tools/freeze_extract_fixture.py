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

sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))

import pyarrow.parquet as pq


def _update_manifest(fixtures_dir: str, tag: str, fixture_name: str, sf_dir: str) -> None:
    """Record the frozen corpus's signature so the guarded oracle SQL
    (pipelines/extract._guarded_fixture_sql) can select the right
    fixture at query time. Asserts signature uniqueness across tags —
    two corpora with the same (n_docs, sum_len_text) would make the
    guarded UNION return both fixtures."""
    import json

    from pdf_parser_ray.pipelines.extract import corpus_signature

    n, s = corpus_signature(os.path.join(sf_dir, "documents.parquet"))
    path = os.path.join(fixtures_dir, "extract_fixtures.json")
    manifest = {}
    if os.path.exists(path):
        with open(path) as f:
            manifest = json.load(f)
    for other, m in manifest.items():
        if other != tag and (m["n_docs"], m["sum_len_text"]) == (n, s):
            raise SystemExit(
                f"signature collision: {tag} and {other} both ({n}, {s})"
            )
    manifest[tag] = {"fixture": fixture_name, "n_docs": n, "sum_len_text": s}
    with open(path, "w") as f:
        json.dump(manifest, f, indent=2, sort_keys=True)
        f.write("\n")
    print(f"manifest[{tag}] = fixture={fixture_name} n_docs={n} sum_len_text={s}")


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    tag = sf_dir.rstrip("/").rsplit("/", 1)[-1]  # e.g. "sf0.01"
    fixtures_dir = os.path.abspath(
        os.path.join(os.path.dirname(__file__), "..", "tests", "fixtures")
    )
    fixture_name = f"extract_spans_{tag}.parquet"
    out = sys.argv[2] if len(sys.argv) > 2 else os.path.join(fixtures_dir, fixture_name)
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
    _update_manifest(fixtures_dir, tag, os.path.basename(out), sf_dir)
    ray.shutdown()


if __name__ == "__main__":
    main()
