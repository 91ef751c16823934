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
