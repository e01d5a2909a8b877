"""spark-submit entrypoint: the transcript -> knowledge-graph job.

Cluster run (north rule):
    spark-submit --py-files dist/mopper_spark.zip jobs/kg_job.py \
        --input <transcripts parquet/iceberg table> \
        --checkpoints /path/ckpt --output /path/graph

Local smoke:
    spark-submit --master 'local[8]' --py-files dist/mopper_spark.zip \
        jobs/kg_job.py --synth-turns 10000 --checkpoints /tmp/ck --output /tmp/g

The session comes from spark-submit (master/executors configured there);
this script only sets job-level SQL conf.
"""

import argparse
import json

KNOWN_STAGES = {"transcripts", "triples", "mentions", "edges", "canonical", "graph"}


def _parse_stages(arg: str | None) -> set[str] | None:
    if not arg:
        return None
    stages = {s.strip() for s in arg.split(",") if s.strip()}
    unknown = stages - KNOWN_STAGES
    if unknown:
        raise SystemExit(
            f"--checkpoint-stages: unknown stage(s) {sorted(unknown)}; "
            f"known: {sorted(KNOWN_STAGES)}"
        )
    return stages


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts parquet path or catalog table")
    p.add_argument("--synth-turns", type=int, help="generate a synthetic corpus instead")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--write-buckets", type=int, default=32)
    p.add_argument(
        "--validate-output",
        help="also run the SHACL-lite shape gate (pipeline/validate.py, "
        "default pipeline_shapes) over the written graph and store the "
        "violation table at this path; the summary line reports the count",
    )
    p.add_argument(
        "--intervals-out",
        help="also materialize temporal entity-activity intervals "
        "(pipeline/temporal.py) from the pipeline's mention stream to "
        "this path; the summary line reports the interval count",
    )
    p.add_argument(
        "--intervals-gap-s",
        type=int,
        default=3600,
        help="max mention silence (seconds) before an activity interval "
        "splits (default 3600)",
    )
    p.add_argument(
        "--checkpoint-stages",
        help="comma-separated stage names to persist as resume points "
        "(default: all); e.g. 'edges,graph' fuses the narrow stages",
    )
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mopper-spark-kg").getOrCreate()
    for k, v in {
        # epoch-µs conversions across the pipeline (temporal intervals,
        # as-of joins, SCD2 bounds) assume a UTC session — pin it here the
        # same way mopper_spark.session.get_spark does, so a cluster whose
        # driver defaults to a local zone cannot shift the emitted bounds
        "spark.sql.session.timeZone": "UTC",
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    from mopper_spark.pipeline.job import run_pipeline
    from mopper_spark.pipeline.materialize import write_graph_table

    transcripts = None
    if args.input:
        transcripts = (
            spark.read.table(args.input)
            if not args.input.startswith(("/", "file:", "s3:", "hdfs:"))
            else spark.read.parquet(args.input)
        )

    res = run_pipeline(
        spark,
        checkpoint_root=args.checkpoints,
        transcripts=transcripts,
        n_turns=args.synth_turns or 1000,
        checkpoint_stages=_parse_stages(args.checkpoint_stages),
    )
    write_graph_table(spark, res.graph, args.output, num_buckets=args.write_buckets)
    summary = {
        "turns": res.turns,
        "seconds": round(res.seconds, 2),
        "turns_per_sec": round(res.turns_per_sec, 1),
        "stages": res.metrics,
    }
    if args.intervals_out:
        from mopper_spark.pipeline.temporal import entity_activity_intervals

        mentions_ts = res.mentions.join(
            res.transcripts.select("conv_id", "turn_idx", "ts"),
            ["conv_id", "turn_idx"],
        )
        entity_activity_intervals(
            mentions_ts, max_gap_s=args.intervals_gap_s
        ).write.mode("overwrite").parquet(args.intervals_out)
        summary["intervals"] = spark.read.parquet(args.intervals_out).count()
    if args.validate_output:
        from mopper_spark.pipeline.validate import pipeline_shapes, validate_shapes

        # validate the MATERIALIZED table (one cheap columnar re-scan per
        # constraint), not the live extraction plan
        graph = spark.read.parquet(args.output)
        violations = validate_shapes(graph, pipeline_shapes())
        violations.write.mode("overwrite").parquet(args.validate_output)
        summary["violations"] = spark.read.parquet(args.validate_output).count()
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
