"""Local replica of the driver's correctness harness.

Runs every ``__ray_entry__.queries()`` entry and its ``oracle_sql()``
side by side on a chosen sf dir, compares row count, column names, and
an order-insensitive value hash (columns sorted by name, rows sorted,
values stringified with float rounding). Usage::

    python tools/check_oracle.py [sf_dir] [query ...]
    python tools/check_oracle.py --json OUT.json [sf_dir] [query ...]

``--json`` additionally writes one driver-format record per query
(rows_match / schema_match / hash_match / spark_rows / oracle_rows /
err) so the full 90+-query surface carries committed, auditable
correctness evidence each round — the driver itself samples only ~50
(VERDICT r3 "Next round" item 2).
"""

from __future__ import annotations

import sys

import duckdb
import pandas as pd

TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]


def to_pandas(result) -> pd.DataFrame:
    import pyarrow as pa

    if isinstance(result, pd.DataFrame):
        return result
    if isinstance(result, pa.Table):
        return result.to_pandas()
    return result.to_pandas()  # ray Dataset


def canon(df: pd.DataFrame) -> str:
    df = df[sorted(df.columns)].copy()
    for c in df.columns:
        if df[c].dtype == "float64" or df[c].dtype == "float32":
            df[c] = df[c].round(6)
    rows = sorted(tuple(str(v) for v in row) for row in df.itertuples(index=False))
    import hashlib

    return hashlib.md5(str(rows).encode()).hexdigest()


def main():
    argv = sys.argv[1:]
    json_out = None
    if argv and argv[0] == "--json":
        json_out = argv[1]
        argv = argv[2:]
    skip: set[str] = set()
    if argv and argv[0] == "--skip":
        # comma-separated exclusions (e.g. the quadratic-oracle dedup
        # queries at sf0.1, where the SQL side is intractable)
        skip = set(argv[1].split(","))
        argv = argv[2:]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.001"
    only = set(argv[1:])

    import ray

    if not ray.is_initialized():
        ray.init(address="local", num_cpus=8, include_dashboard=False, logging_level="ERROR")
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False

    import os

    sys.path.insert(0, os.path.abspath(os.path.join(os.path.dirname(__file__), "..")))
    import __ray_entry__ as entrymod

    queries = entrymod.queries()
    oracles = entrymod.oracle_sql()

    # The extraction-family oracles are self-gating (a guarded UNION
    # over the committed per-sf fixtures — pipelines/extract). When the
    # chosen sf matches NO committed fixture, the guards would return
    # zero rows; drop those entries to rows-only instead of recording
    # a false failure.
    from pdf_parser_ray.pipelines.extract import ORACLE_SQL as _EXTRACT_ORACLES
    from pdf_parser_ray.pipelines.extract import fixture_tag_for

    if _EXTRACT_ORACLES and fixture_tag_for(sf_dir) is None:
        for name in _EXTRACT_ORACLES:
            oracles.pop(name, None)  # no fixture for this sf → rows-only

    con = duckdb.connect()
    for t in TABLES:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    failures = []
    records = {}
    for name, fn in queries.items():
        if (only and name not in only) or name in skip:
            continue
        try:
            mine = to_pandas(fn(sf_dir))
        except Exception as e:
            print(f"[ERR ] {name}: query raised {type(e).__name__}: {e}")
            failures.append(name)
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": None, "oracle_rows": None,
                "err": f"query:{type(e).__name__}",
            }
            continue
        sql = oracles.get(name)
        if sql is None:
            print(f"[rows] {name}: {len(mine)} rows (no oracle)")
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(mine), "oracle_rows": None, "err": "no_oracle",
            }
            continue
        try:
            ref = con.sql(sql).df()
        except Exception as e:
            print(f"[ERR ] {name}: oracle raised {e}")
            failures.append(name)
            records[name] = {
                "rows_match": None, "schema_match": None, "hash_match": None,
                "spark_rows": len(mine), "oracle_rows": None,
                "err": f"oracle:{type(e).__name__}",
            }
            continue
        ok_rows = len(mine) == len(ref)
        ok_cols = sorted(mine.columns) == sorted(ref.columns)
        ok_hash = ok_cols and canon(mine) == canon(ref)
        status = "PASS" if (ok_rows and ok_cols and ok_hash) else "FAIL"
        records[name] = {
            "rows_match": ok_rows, "schema_match": ok_cols, "hash_match": ok_hash,
            "spark_rows": len(mine), "oracle_rows": len(ref), "err": None,
        }
        print(f"[{status}] {name}: rows {len(mine)}/{len(ref)} cols_ok={ok_cols} hash_ok={ok_hash}")
        if status == "FAIL":
            failures.append(name)
            if not ok_cols:
                print("   mine:", list(mine.columns), " ref:", list(ref.columns))
            else:
                m = mine[sorted(mine.columns)].sort_values(sorted(mine.columns)).head(3)
                r = ref[sorted(ref.columns)].sort_values(sorted(ref.columns)).head(3)
                print("   mine:\n", m.to_string(), "\n   ref:\n", r.to_string())
    ray.shutdown()
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(records, f, indent=2)
        print(f"wrote {len(records)} records to {json_out}")
    if failures:
        print("FAILURES:", failures)
        sys.exit(1)
    print("all checks passed")


if __name__ == "__main__":
    main()
