"""spark-submit entrypoint: transcripts → training-data preparation.

The end-to-end last mile every pretraining/SFT pipeline runs, as ONE
resumable job over the same checkpoint machinery as the KG job
(``pipeline/checkpoint.py``: fingerprint-gated stages, atomic manifests,
per-file lineage counters, partition-overwrite idempotence):

    transcripts → render (one doc per conversation, stable turn order)
               → PII scrub (Dolma-style regex classes)
               → paragraph dedup (corpus-wide first occurrence)
               → exact doc dedup (normalized-text fingerprint, keep min id)
               → near-dup dedup (MinHash-LSH, keep min id; optional)
               → quality filter (heuristic score >= threshold)
               → packing layout (distributed prefix sum → sequence spans)
               → leak-proof train/val split (hash of conv_id)

Cluster run:
    spark-submit --py-files dist/mopper_spark.zip jobs/prep_job.py \
        --input <transcripts parquet> --checkpoints /path/ckpt \
        --output /path/prep

Local smoke:
    spark-submit --master 'local[8]' --py-files dist/mopper_spark.zip \
        jobs/prep_job.py --synth-turns 5000 --checkpoints /tmp/pck \
        --output /tmp/prep

Re-running after a kill resumes at the first incomplete stage (manifest
fingerprint + _SUCCESS gate); changing a knob (threshold, seq-len, split
fractions) re-fingerprints exactly the stages downstream of it.
Every stage is native DataFrame ops — the whole job has zero Python in
the hot path (the same property pinned for the extraction pipeline).
"""

import argparse
import json

from pyspark.sql import functions as F


def build_stages(spark, args, transcripts):
    """Run the prep pipeline under a CheckpointManager; returns
    (ck, train_val_df)."""
    from mopper_spark.pipeline.checkpoint import CheckpointManager
    from mopper_spark.pipeline.job import _fp
    from mopper_spark.textops.analysis import quality_score
    from mopper_spark.textops.dedup import (
        dedup_keep_min,
        minhash_near_dup_pairs,
    )
    from mopper_spark.textops.packing import pack_sequences
    from mopper_spark.textops.prepare import (
        dedup_paragraphs,
        render_conversations,
        scrub_pii,
    )
    from mopper_spark.textops.sampling import hash_split

    ck = CheckpointManager(spark, args.checkpoints)

    # Fingerprints CHAIN (each stage folds in its upstream's fingerprint,
    # same discipline as pipeline/job.py): changing any knob invalidates
    # exactly that stage and every stage downstream of it.
    fp_in = _fp("prep-input", args.input or f"synth:{args.synth_turns}")
    tr = ck.stage("transcripts", fp_in, lambda: transcripts).df

    fp_rend = _fp(fp_in, "render-v1")
    rendered = ck.stage(
        "rendered", fp_rend, lambda: render_conversations(tr)
    ).df

    fp_pii = _fp(fp_rend, "pii-v1")
    scrubbed = ck.stage(
        "scrubbed",
        fp_pii,
        lambda: rendered.withColumn("text", scrub_pii(F.col("text"))),
    ).df

    fp_para = _fp(fp_pii, "paras-v1")
    paras = ck.stage(
        "para_dedup",
        fp_para,
        lambda: dedup_paragraphs(
            scrubbed.select(F.col("conv_id").alias("doc_id"), "text")
        ),
    ).df

    def _exact():
        norm = F.lower(F.regexp_replace(F.trim("text"), r"\s+", " "))
        fp = F.md5(norm.cast("binary"))
        keep = (
            paras.withColumn("_fp", fp)
            .groupBy("_fp")
            .agg(F.min("doc_id").alias("doc_id"))
            .select("doc_id")
        )
        return paras.join(keep, "doc_id")

    fp_exact = _fp(fp_para, "exact-v1")
    exact = ck.stage("exact_dedup", fp_exact, _exact).df

    if args.near_dup:
        fp_near = _fp(fp_exact, "minhash", args.near_dup_threshold)
        near = ck.stage(
            "near_dedup",
            fp_near,
            lambda: dedup_keep_min(
                exact,
                minhash_near_dup_pairs(
                    exact, threshold=args.near_dup_threshold
                ),
            ),
        ).df
    else:
        fp_near = fp_exact
        near = exact

    fp_q = _fp(fp_near, "quality", args.min_quality)
    quality = ck.stage(
        "quality",
        fp_q,
        lambda: near.withColumn("quality", quality_score(F.col("text"))).filter(
            F.col("quality") >= args.min_quality
        ),
    ).df

    def _packed():
        # pack_sequences' distributed prefix sum needs a numeric, totally
        # ordered doc id; conv_id is a string.  xxhash64 gives a
        # deterministic order key — any stable total order is a valid
        # packing layout.  Collisions would silently merge two documents'
        # token spans, so they are checked for explicitly (one hash-agg on
        # an 8-byte column; cheap even at trillion-doc scale).
        q = quality.withColumn("pack_id", F.xxhash64("doc_id"))
        n_rows = q.count()
        n_ids = q.select("pack_id").distinct().count()
        if n_ids != n_rows:
            raise RuntimeError(
                f"pack_id hash collision: {n_rows} docs -> {n_ids} ids; "
                "re-key with a salt or widen the id"
            )
        layout = pack_sequences(
            q.select(F.col("pack_id").alias("doc_id"), "text"),
            seq_len=args.seq_len,
        ).withColumnRenamed("doc_id", "pack_id")
        return q.join(layout, "pack_id").drop("pack_id")

    fp_pack = _fp(fp_q, "pack", args.seq_len)
    packed = ck.stage("packed", fp_pack, _packed).df

    split = ck.stage(
        "split",
        _fp(fp_pack, "split", args.val_fraction),
        lambda: hash_split(
            packed,
            "doc_id",
            {"train": 1.0 - args.val_fraction, "val": args.val_fraction},
        ),
        partition_by=["split"],
    ).df
    return ck, split


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--input", help="transcripts parquet path or catalog table")
    p.add_argument("--synth-turns", type=int,
                   help="generate a synthetic corpus instead")
    p.add_argument("--checkpoints", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--seq-len", type=int, default=2048)
    p.add_argument("--min-quality", type=float, default=0.35)
    p.add_argument("--val-fraction", type=float, default=0.05)
    p.add_argument("--near-dup", action="store_true",
                   help="also run MinHash-LSH near-dup dedup (keep min id)")
    p.add_argument("--near-dup-threshold", type=float, default=0.8)
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mopper-spark-prep").getOrCreate()
    for k, v in {
        "spark.sql.adaptive.enabled": "true",
        "spark.sql.adaptive.skewJoin.enabled": "true",
        "spark.sql.execution.arrow.pyspark.enabled": "true",
    }.items():
        spark.conf.set(k, v)

    if args.input:
        transcripts = (
            spark.read.table(args.input)
            if not args.input.startswith(("/", "file:", "s3:", "hdfs:"))
            else spark.read.parquet(args.input)
        )
    else:
        from mopper_spark.pipeline.transcripts import synth_transcripts

        transcripts = synth_transcripts(spark, args.synth_turns or 1000)

    ck, split = build_stages(spark, args, transcripts)
    split.write.mode("overwrite").partitionBy("split").parquet(args.output)

    out = spark.read.parquet(args.output)
    summary = {
        "stages": ck.metrics,
        "out_rows": out.count(),
        "splits": {
            r["split"]: r["count"]
            for r in out.groupBy("split").count().collect()
        },
    }
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
