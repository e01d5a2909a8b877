"""Structured Streaming tests: stream/batch parity for extraction, windowed
mention counts with watermark, custom stateful operator across batches."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.extract import extract_triples
from mopper_spark.pipeline.transcripts import synth_transcripts
from mopper_spark.streaming import (
    conversation_progress,
    stream_extract,
    stream_transcripts,
    windowed_mention_counts,
    write_stream,
)


@pytest.fixture(scope="module")
def corpus_dir(spark, tmp_path_factory):
    d = tmp_path_factory.mktemp("stream") / "transcripts"
    synth_transcripts(spark, n_turns=400, n_convs=8).write.parquet(str(d))
    return str(d)


def _drain(query):
    query.awaitTermination(120)


class TestStreamBatchParity:
    def test_extraction_identical(self, spark, corpus_dir, tmp_path):
        out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
        stream = stream_transcripts(spark, corpus_dir, max_files_per_trigger=2)
        assert stream.isStreaming
        q = write_stream(stream_extract(stream), out, ck)
        _drain(q)

        streamed = spark.read.parquet(out)
        batch = extract_triples(spark.read.parquet(corpus_dir))
        assert streamed.exceptAll(batch).count() == 0
        assert batch.exceptAll(streamed).count() == 0


class TestWindowedCounts:
    def test_counts_with_watermark(self, spark, corpus_dir, tmp_path):
        out, ck = str(tmp_path / "wout"), str(tmp_path / "wck")
        stream = stream_transcripts(spark, corpus_dir)
        q = write_stream(
            windowed_mention_counts(stream, window="1 hour", watermark="2 hours"),
            out,
            ck,
            output_mode="append",
        )
        _drain(q)
        got = spark.read.parquet(out)
        assert {"window", "norm", "n_mentions"} <= set(got.columns)
        # append mode emits only windows FINALIZED by the watermark at
        # stream end; every emitted (window, norm) count must match the
        # batch computation exactly, and open windows stay unemitted
        from mopper_spark.pipeline.extract import extract_mentions
        from mopper_spark.pipeline.linking import normalize_surface

        tr = spark.read.parquet(corpus_dir)
        m = (
            tr.select("conv_id", "turn_idx", "ts")
            .join(extract_mentions(tr), ["conv_id", "turn_idx"])
            .select("ts", normalize_surface(F.col("surface")).alias("norm"))
        )
        batch = m.groupBy(F.window("ts", "1 hour"), "norm").agg(
            F.count("*").alias("n_mentions")
        )
        emitted = got.count()
        assert emitted > 0
        # emitted rows ⊆ batch rows, value-exact
        assert got.exceptAll(batch).count() == 0
        assert batch.count() >= emitted


class TestStatefulOperator:
    def test_progress_accumulates_across_batches(self, spark, corpus_dir, tmp_path):
        out, ck = str(tmp_path / "pout"), str(tmp_path / "pck")
        # several micro-batches so state carries across triggers
        stream = stream_transcripts(spark, corpus_dir, max_files_per_trigger=1)
        q = write_stream(
            conversation_progress(stream), out, ck, output_mode="update"
        )
        _drain(q)
        got = spark.read.parquet(out)
        # last update per conversation must equal the batch totals
        final = (
            got.groupBy("conv_id")
            .agg(F.max("turns_seen").alias("turns_seen"),
                 F.max("max_turn_idx").alias("max_turn_idx"))
            .collect()
        )
        batch = {
            r["conv_id"]: (r["cnt"], r["mx"])
            for r in spark.read.parquet(corpus_dir)
            .groupBy("conv_id")
            .agg(F.count("*").alias("cnt"), F.max("turn_idx").alias("mx"))
            .collect()
        }
        assert len(final) == len(batch)
        for r in final:
            assert (r["turns_seen"], r["max_turn_idx"]) == batch[r["conv_id"]]


class TestRateSource:
    def test_rate_stream_extracts_triples(self, spark, tmp_path):
        """Unbounded rate source -> transcript shape -> the SAME extraction
        plan, trigger-bounded for the test."""
        from mopper_spark.streaming import stream_extract, stream_transcripts_rate

        tr = stream_transcripts_rate(spark, rows_per_second=500)
        assert tr.isStreaming
        triples = stream_extract(tr)
        q = (
            triples.writeStream.format("parquet")
            .option("path", str(tmp_path / "out"))
            .option("checkpointLocation", str(tmp_path / "ck"))
            .trigger(processingTime="1 second")
            .start()
        )
        import time

        deadline = time.time() + 60
        n = 0
        while time.time() < deadline:
            time.sleep(2)
            try:
                n = spark.read.parquet(str(tmp_path / "out")).count()
            except Exception:
                continue
            if n > 0:
                break
        q.stop()
        assert n > 0
        out = spark.read.parquet(str(tmp_path / "out"))
        assert set(out.columns) == {"subj", "pred", "obj", "okind", "graph"}
        assert out.filter(out.subj.startswith("<") | (out.subj == "INVALID")).count() == 0
