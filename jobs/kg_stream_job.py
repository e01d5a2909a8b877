"""spark-submit entrypoint: INCREMENTAL KG construction over a transcript
stream.

    spark-submit --py-files dist/mopper_spark.zip jobs/kg_stream_job.py \
        --input /landing/transcripts --state /path/state \
        --checkpoints /path/ckpt --graph /path/graph [--available-now]

Per micro-batch (``foreachBatch`` — the merge step is cross-key, see
``pipeline/incremental.py``):

1. extract the batch's statements (same vectorized path as the batch job —
   stream/batch parity is gate-checked by ``kg_stream_parity``);
2. advance the entity-linking dictionary with ``link_increment`` (order-
   insensitive: the end state equals the batch fixpoint);
3. append the statements to the graph table under ``batch={id}`` —
   a replayed micro-batch overwrites ITS OWN directory with identical
   deterministic content, so kill/replay cannot double-emit (the same
   partition-overwrite idempotence contract as the batch job's
   checkpoints).

The canonical dictionary is stored VERSIONED (``state/dict/v{n}`` +
``_LATEST``); consumers resolve canonical IRIs by broadcast-joining the
latest dictionary at read time, so late merges retroactively apply to
already-written statements without rewriting them.
"""

import argparse
import json
import os


def _intervals_count(spark, args) -> int:
    from mopper_spark.pipeline.temporal import read_intervals

    return read_intervals(spark, args.intervals_state).count()


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", required=True, help="streaming parquet dir")
    p.add_argument("--state", required=True, help="linking dictionary state dir")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--graph", required=True, help="graph table root")
    p.add_argument("--max-files-per-trigger", type=int, default=4)
    p.add_argument(
        "--intervals-state",
        help="also maintain temporal entity-activity intervals "
        "(pipeline/temporal.py::intervals_increment) as a second "
        "versioned state dir; the segment-monoid fold makes the end "
        "state equal the batch operator for any micro-batch split",
    )
    p.add_argument("--intervals-gap-s", type=int, default=3600)
    p.add_argument(
        "--available-now",
        action="store_true",
        help="drain what exists, then stop (backfill / test mode)",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mopper-spark-kg-stream").getOrCreate()
    # epoch-µs conversions assume a UTC session (same pin as get_spark)
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    spark.conf.set("spark.sql.adaptive.enabled", "true")
    spark.conf.set("spark.sql.execution.arrow.pyspark.enabled", "true")

    from mopper_spark.pipeline.extract import extract_mentions, extract_triples
    from mopper_spark.pipeline.incremental import (
        _read_latest,
        link_increment,
        read_dictionary,
    )
    from mopper_spark.streaming import stream_transcripts

    os.makedirs(args.state, exist_ok=True)
    if args.intervals_state:
        os.makedirs(args.intervals_state, exist_ok=True)

    def process(batch_df, batch_id: int) -> None:
        b = batch_df.localCheckpoint(eager=True)  # one pass over the input
        sp = b.sparkSession
        stmts = extract_triples(b)
        stmts.write.mode("overwrite").parquet(
            os.path.join(args.graph, f"batch={batch_id}")
        )
        version = f"v{batch_id:06d}"

        def advance(state_dir: str, nxt_df) -> None:
            """Versioned-state commit: write state/v{batch}, then the
            _LATEST pointer last (atomic rename) — the pointer IS the
            commit."""
            nxt_df.localCheckpoint(eager=True).write.mode(
                "overwrite"
            ).parquet(os.path.join(state_dir, version))
            tmp = os.path.join(state_dir, "_LATEST.tmp")
            with open(tmp, "w") as fh:
                fh.write(version)
            os.replace(tmp, os.path.join(state_dir, "_LATEST"))

        # Replay short-circuit PER STATE (see pipeline/incremental.py): a
        # kill can land after one state's _LATEST advanced but before the
        # streaming checkpoint committed — the replayed batch must skip
        # every already-committed state (reading state/v{batch} and
        # overwriting the same path crash-loops) while still folding the
        # states that had not committed yet.  An early return on the
        # first state would strand the second.
        if _read_latest(args.state) != version:
            current = read_dictionary(sp, args.state)
            advance(args.state, link_increment(current, extract_mentions(b)))
        if args.intervals_state and _read_latest(args.intervals_state) != version:
            from mopper_spark.pipeline.temporal import (
                intervals_increment,
                read_intervals,
            )

            mentions_ts = extract_mentions(b).join(
                b.select("conv_id", "turn_idx", "ts"),
                ["conv_id", "turn_idx"],
            )
            advance(
                args.intervals_state,
                intervals_increment(
                    read_intervals(sp, args.intervals_state),
                    mentions_ts,
                    max_gap_s=args.intervals_gap_s,
                ),
            )

    stream = stream_transcripts(
        spark, args.input, max_files_per_trigger=args.max_files_per_trigger
    )
    writer = stream.writeStream.foreachBatch(process).option(
        "checkpointLocation", args.checkpoints
    )
    if args.available_now:
        q = writer.trigger(availableNow=True).start()
        q.awaitTermination()
        graph = spark.read.parquet(args.graph)
        d = read_dictionary(spark, args.state)
        print(
            json.dumps(
                {
                    "graph_statements": graph.count(),
                    "dict_forms": d.count(),
                    "batches": len(
                        [x for x in os.listdir(args.graph) if x.startswith("batch=")]
                    ),
                    **(
                        {"intervals": _intervals_count(spark, args)}
                        if args.intervals_state
                        else {}
                    ),
                }
            )
        )
        spark.stop()
    else:
        writer.start().awaitTermination()


if __name__ == "__main__":
    main()
