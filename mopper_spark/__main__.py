"""CLI entry point: ``python -m mopper_spark -m mapping.ttl -l rml``.

Mirrors the reference CLI's argument surface (``/root/reference/src/main.rs:23-64``):
mapping file, mapping language (AlgeMapLoom plan JSON assumed when absent),
verbosity, ``--force-std-out`` / ``--force-to-file``, and ``-d`` per-sink
dedup.  ``--message-buffer-capacity`` is accepted for flag parity but is a
no-op: bounded-channel backpressure has no analogue in Spark's exchange
model (mopper_options.rs:33-36).

Relative source paths resolve against the mapping file's directory (the
reference resolves via ``working_dir_hint``, lib.rs:244-263).
"""

from __future__ import annotations

import argparse
import logging
import os
import sys


def build_parser() -> argparse.ArgumentParser:
    ap = argparse.ArgumentParser(
        prog="mopper_spark",
        description="PySpark-native declarative row-to-triple mapping engine",
    )
    ap.add_argument("-m", "--mapping-file", required=True, metavar="FILE",
                    help="path to the mapping file")
    ap.add_argument("-l", "--mapping-lang", choices=["rml", "shexml", "alge"],
                    default=None,
                    help="mapping language; AlgeMapLoom plan JSON if omitted")
    ap.add_argument("-v", "--verbose", action="count", default=0,
                    help="increase log level")
    ap.add_argument("-q", "--quiet", action="store_true", help="no logging")
    ap.add_argument("--force-std-out", action="store_true",
                    help="force output to stdout, ignoring plan targets")
    ap.add_argument("--force-to-file", metavar="FILE", default=None,
                    help="force output to a file, ignoring plan targets")
    ap.add_argument("--message-buffer-capacity", type=int, default=None,
                    metavar="N", help="accepted for reference-CLI parity; no-op")
    ap.add_argument("-d", "--deduplicate", action="store_true",
                    help="remove duplicate triples/quads per sink")
    return ap


def main(argv: list[str] | None = None) -> int:
    args = build_parser().parse_args(argv)

    if args.quiet:
        level = logging.CRITICAL
    else:
        level = {0: logging.WARNING, 1: logging.INFO}.get(args.verbose, logging.DEBUG)
    logging.basicConfig(level=level, format="%(levelname)s %(name)s: %(message)s")

    with open(args.mapping_file) as f:
        text = f.read()

    if args.mapping_lang in ("rml", "shexml"):
        from mopper_spark.rml import mapping_to_plan

        plan = mapping_to_plan(text, args.mapping_lang)
    else:
        plan = text  # AlgeMapLoom plan JSON

    from mopper_spark.engine import run_plan
    from mopper_spark.options import MopperOptions
    from mopper_spark.session import get_spark

    options = MopperOptions(
        force_to_std_out=args.force_std_out,
        force_to_file=args.force_to_file,
        deduplicate=args.deduplicate,
        working_dir_hint=os.path.dirname(os.path.abspath(args.mapping_file)),
    )
    spark = get_spark()
    out_path = args.force_to_file
    written: set[str] = set()  # first write per path this run truncates —
    # appending to a file left by a PREVIOUS run would duplicate output
    try:
        for target in run_plan(plan, spark, options):
            # Stream partition-by-partition: the driver holds at most one
            # partition of serialized statements, never the whole output
            # (the reference's sink is likewise a single sequential writer,
            # writer_sink.rs:57-66 — same contract, bounded memory).
            rows = target.statements.toLocalIterator(prefetchPartitions=True)
            lines = (ln for r in rows if r[0] for ln in r[0].split("\n"))
            target_type = target.config.get("target_type", "StdOut")
            if out_path or (target_type == "File" and not args.force_std_out):
                path = out_path or target.config.get("path", "output.nq")
                mode = "a" if path in written else "w"
                written.add(path)
                with open(path, mode) as f:
                    f.writelines(ln + "\n" for ln in lines)
            else:
                sys.stdout.writelines(ln + "\n" for ln in lines)
    finally:
        spark.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
