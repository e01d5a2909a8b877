"""Structured Streaming surface: incremental KG construction.

The reference is a finite batch engine — its "streaming" is bounded
pipelined execution (``/root/reference/README.md:18-20``), so none of this
is parity surface; it is the scale path for continuously-arriving
transcripts (Kafka / files landing in object storage):

- ``stream_transcripts``: file-source stream over a transcripts directory
  (swap for ``spark.readStream.format("kafka")`` in production — the
  downstream graph is identical);
- ``stream_extract``: the SAME ``extract_triples`` compilation applied
  incrementally — it is stateless (narrow ops only), so it runs unchanged
  under the streaming planner;
- ``windowed_mention_counts``: event-time windowed aggregation with a
  watermark for late data;
- ``conversation_progress``: custom stateful operator via
  ``applyInPandasWithState`` (running per-conversation turn counter +
  max turn_idx — the streaming analogue of the stable-ordering invariant).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
    TimestampType,
)

TRANSCRIPT_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turn_idx", IntegerType()),
        StructField("role", StringType()),
        StructField("text", StringType()),
        StructField("tool", StringType()),
        StructField("ts", TimestampType()),
    ]
)

PROGRESS_SCHEMA = StructType(
    [
        StructField("conv_id", StringType()),
        StructField("turns_seen", LongType()),
        StructField("max_turn_idx", IntegerType()),
    ]
)


def stream_transcripts(
    spark: SparkSession, input_dir: str, max_files_per_trigger: int | None = None
) -> DataFrame:
    reader = spark.readStream.schema(TRANSCRIPT_SCHEMA)
    if max_files_per_trigger:
        reader = reader.option("maxFilesPerTrigger", max_files_per_trigger)
    return reader.parquet(input_dir)


def stream_transcripts_rate(
    spark: SparkSession, rows_per_second: int = 1000, n_convs: int = 50
) -> DataFrame:
    """Transcript-shaped stream from Spark's built-in unbounded ``rate``
    source — the Kafka-less stand-in for a true infinite feed (swap for
    ``format("kafka")`` + a deserializer in production; everything
    downstream is identical).  Turn content is the same deterministic
    column arithmetic as the batch generator, keyed by the rate source's
    monotonically increasing ``value``."""
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", rows_per_second)
        .load()
    )
    conv = F.pmod("value", F.lit(n_convs))
    return rate.select(
        F.format_string("conv_%05d", conv).alias("conv_id"),
        (F.col("value") / n_convs).cast("int").alias("turn_idx"),
        F.element_at(
            F.array(F.lit("user"), F.lit("assistant"), F.lit("tool")),
            (F.pmod(F.xxhash64("value"), 3) + 1).cast("int"),
        ).alias("role"),
        F.concat(
            F.lit("streamed turn about "),
            F.element_at(
                F.array(F.lit("Ada Lovelace"), F.lit("Grace Hopper"), F.lit("Alan Turing")),
                (F.pmod(F.xxhash64("value", F.lit(1)), 3) + 1).cast("int"),
            ),
        ).alias("text"),
        F.lit(None).cast("string").alias("tool"),
        F.col("timestamp").alias("ts"),
    )


def stream_extract(transcripts: DataFrame) -> DataFrame:
    """Incremental triple extraction — stateless, identical semantics to
    the batch path (stream/batch parity is asserted in tests)."""
    from mopper_spark.pipeline.extract import extract_triples

    return extract_triples(transcripts)


def windowed_mention_counts(
    transcripts: DataFrame,
    window: str = "10 minutes",
    watermark: str = "30 minutes",
) -> DataFrame:
    """Event-time mention counts per window; late data beyond the
    watermark is dropped and its state reclaimed."""
    from mopper_spark.pipeline.extract import extract_mentions
    from mopper_spark.pipeline.linking import normalize_surface

    mentions_src = transcripts.withWatermark("ts", watermark)
    m = extract_mentions(mentions_src.select("conv_id", "turn_idx", "text", "ts"))
    # extract_mentions keeps (conv_id, turn_idx, surface); re-join ts via
    # select on the same projection to stay stateless before the agg
    m = (
        mentions_src.select("conv_id", "turn_idx", "ts")
        .join(m, ["conv_id", "turn_idx"])
        .select("ts", normalize_surface(F.col("surface")).alias("norm"))
    )
    return m.groupBy(F.window("ts", window), "norm").agg(
        F.count("*").alias("n_mentions")
    )


def conversation_progress(transcripts: DataFrame) -> DataFrame:
    """Custom stateful operator: running per-conversation progress.

    State per conv_id: (turns_seen, max_turn_idx), updated each
    micro-batch via ``applyInPandasWithState`` (Arrow-batched)."""

    def update(
        key: tuple, pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        turns, max_idx = state.get if state.exists else (0, -1)
        for pdf in pdfs:
            turns += len(pdf)
            if len(pdf):
                max_idx = max(max_idx, int(pdf["turn_idx"].max()))
        state.update((turns, max_idx))
        yield pd.DataFrame(
            {"conv_id": [key[0]], "turns_seen": [turns], "max_turn_idx": [max_idx]}
        )

    return transcripts.groupBy("conv_id").applyInPandasWithState(
        update,
        outputStructType=PROGRESS_SCHEMA,
        stateStructType="turns_seen long, max_turn_idx int",
        outputMode="update",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def write_stream(
    df: DataFrame,
    output_dir: str,
    checkpoint_dir: str,
    output_mode: str = "append",
    available_now: bool = True,
):
    """Start a parquet sink; ``available_now`` drains the backlog and stops
    (the batch-like trigger used by tests and backfills).

    The parquet sink only supports append mode; update-mode streams (e.g.
    the stateful operators) are routed through ``foreachBatch`` appending
    each micro-batch's updates — downstream readers take the latest row
    per key."""
    writer = df.writeStream.outputMode(output_mode).option(
        "checkpointLocation", checkpoint_dir
    )
    if output_mode == "update":
        writer = writer.foreachBatch(
            lambda bdf, _id: bdf.write.mode("append").parquet(output_dir)
        )
    else:
        writer = writer.format("parquet").option("path", output_dir)
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
