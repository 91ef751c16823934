"""CLI entry points — the engine analog of the reference's
``python extractor.py --pdf …`` surface (reference
``extractor.py:1266-1390``).

Commands::

    python -m pdf_parser_ray extract --input DIR_OR_SF --output OUT \
        [--config sections.json] [--partitions 16] [--resume]
    python -m pdf_parser_ray metrics --output OUT
    python -m pdf_parser_ray synth --sf-dir DIR --output OUT [--n 1000]

Owns its Ray session (guarded init + shutdown); the library never does.
"""

from __future__ import annotations

import argparse
import json
import sys


def _init_ray(num_cpus: int | None):
    import ray

    if not ray.is_initialized():
        kwargs = dict(address="local", include_dashboard=False, ignore_reinit_error=True,
                      logging_level="ERROR")
        if num_cpus:
            kwargs["num_cpus"] = num_cpus
        ray.init(**kwargs)
    import ray.data as rd

    rd.DataContext.get_current().enable_progress_bars = False


def cmd_extract(args) -> int:
    _init_ray(args.num_cpus)
    from .core.config import FormConfig
    from .io.checkpoint import resumable_write
    from .io.sources import read_corpus
    from .pipelines.extract import extract_pipeline

    config = None
    if args.config:
        config = FormConfig.from_json(args.config)
    ds = read_corpus(args.input)
    out = extract_pipeline(ds, config=config)
    summary = resumable_write(out, args.output, n_partitions=args.partitions)
    print(json.dumps(summary))
    return 0


def cmd_metrics(args) -> int:
    from .io.checkpoint import partition_metrics

    df = partition_metrics(args.output)
    print(df.to_string(index=False) if len(df) else "no completed partitions")
    return 0


def cmd_synth(args) -> int:
    _init_ray(args.num_cpus)
    from .io.sources import write_corpus
    from .io.synth import corpus_dataset

    ds = corpus_dataset(args.n, seed=args.seed)
    write_corpus(ds, args.output)
    print(json.dumps({"docs": args.n, "output": args.output}))
    return 0


def cmd_regress(args) -> int:
    """Golden-file regression harness — the engine analog of the
    reference's ``run_regression.py:75-165``: run the extractor over a
    span corpus, compare each document's span sequence to the golden
    file (strict (kind, text, media_ref, offset) equality), seed
    missing goldens, ``--update`` to rewrite, exit 1 on failures."""
    import os

    _init_ray(args.num_cpus)
    from .io.sources import read_corpus
    from .pipelines.extract import extract_pipeline

    out = extract_pipeline(read_corpus(args.corpus)).to_pandas()
    got: dict[str, list] = {}
    for doc_id, g in out.groupby("doc_id"):
        g = g.sort_values("offset")
        got[doc_id] = [
            [r.kind, r.text, r.media_ref, int(r.offset)] for r in g.itertuples()
        ]
    goldens: dict[str, list] = {}
    if os.path.exists(args.goldens):
        with open(args.goldens) as f:
            goldens = json.load(f)
    failures, seeded = [], []
    for doc_id, spans in sorted(got.items()):
        if doc_id not in goldens or args.update:
            if doc_id not in goldens:
                seeded.append(doc_id)
            goldens[doc_id] = spans
            continue
        if goldens[doc_id] != spans:
            failures.append(doc_id)
            print(f"[FAIL] {doc_id}: span sequence differs from golden")
        else:
            print(f"[PASS] {doc_id}")
    if seeded or args.update:
        with open(args.goldens, "w") as f:
            json.dump(goldens, f, indent=1)
        for d in seeded:
            print(f"[SEED] {d}")
    print(json.dumps({"passed": len(got) - len(failures) - len(seeded),
                      "failed": len(failures), "seeded": len(seeded)}))
    return 1 if failures else 0


def cmd_doctor(args) -> int:
    """Environment probe — the engine analog of the reference's
    ``--check`` flag (``extractor.py:1345-1364``): report availability
    of every dependency tier and smoke a local Ray session."""
    report = {}
    for mod in ("ray", "pyarrow", "pandas", "numpy", "duckdb"):
        try:
            m = __import__(mod)
            report[mod] = getattr(m, "__version__", "ok")
        except ImportError:
            report[mod] = "MISSING"
    try:
        import lance  # noqa: F401

        report["lance"] = "ok"
    except ImportError:
        report["lance"] = "absent (parquet fallback active)"
    try:
        _init_ray(args.num_cpus or 2)
        import ray
        import ray.data as rd

        n = rd.range(100).map_batches(lambda b: b, batch_size=10).count()
        report["ray_data_smoke"] = f"ok ({n} rows)"
        report["cpus"] = int(ray.cluster_resources().get("CPU", 0))
    except Exception as e:  # pragma: no cover
        report["ray_data_smoke"] = f"FAILED: {e}"
    print(json.dumps(report, indent=1))
    return 0 if "MISSING" not in report.values() else 1


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="pdf_parser_ray")
    p.add_argument("--num-cpus", type=int, default=None)
    sub = p.add_subparsers(dest="cmd", required=True)

    pe = sub.add_parser("extract", help="run the extraction pipeline resumably")
    pe.add_argument("--input", required=True, help="span corpus (parquet/lance)")
    pe.add_argument("--output", required=True)
    pe.add_argument("--config", default=None, help="sections JSON (reference schema)")
    pe.add_argument("--partitions", type=int, default=16)
    pe.set_defaults(fn=cmd_extract)

    pm = sub.add_parser("metrics", help="show per-partition lineage/metrics")
    pm.add_argument("--output", required=True)
    pm.set_defaults(fn=cmd_metrics)

    pd_ = sub.add_parser("doctor", help="environment probe (reference --check analog)")
    pd_.set_defaults(fn=cmd_doctor)

    pr = sub.add_parser("regress", help="golden-file regression over a corpus")
    pr.add_argument("--corpus", required=True)
    pr.add_argument("--goldens", required=True)
    pr.add_argument("--update", action="store_true")
    pr.set_defaults(fn=cmd_regress)

    ps = sub.add_parser("synth", help="generate a synthetic span corpus")
    ps.add_argument("--output", required=True)
    ps.add_argument("--n", type=int, default=1000)
    ps.add_argument("--seed", type=int, default=42)
    ps.set_defaults(fn=cmd_synth)

    args = p.parse_args(argv)
    try:
        return args.fn(args)
    finally:
        import ray

        if ray.is_initialized():
            ray.shutdown()


if __name__ == "__main__":
    sys.exit(main())
