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


class TestSessionizeStream:
    def test_sessions_match_batch_with_watermark_cutoff(self, spark, tmp_path):
        """Streaming session_window + watermark (availableNow) must emit
        exactly the batch session set restricted to sessions finalized by
        the final watermark.  Fixture boundaries are placed well clear of
        the cutoff so the assertion is insensitive to < vs <= and to ms
        truncation of the watermark (the exact rule is pinned separately
        by the gate oracle at sf0.01)."""
        from mopper_spark.streaming import sessionize_stream, stream_events

        src = str(tmp_path / "events_src")
        # gap 10 s, watermark 60 s; max ts = 1000 s.  cutoff ≈ 940 s.
        # u1: two sessions, ends 320 and 520 — both emitted
        # u2: one session ending 890 — emitted
        # u3: session ending 995 (past cutoff) — held back
        rows = [
            (1, 1, 300.0), (2, 1, 305.0), (3, 1, 310.0),
            (4, 1, 505.0), (5, 1, 510.0),
            (6, 2, 875.0), (7, 2, 880.0),
            (8, 3, 980.0), (9, 3, 985.0),
            (10, 2, 1000.0),  # max-ts driver; its own session also open
            # gap EXACTLY equal to the 10 s duration -> still MERGES
            # (inclusive boundary, same as the batch diff > gap rule)
            (11, 4, 600.0), (12, 4, 610.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, sec double"
        ).select(
            "event_id",
            F.timestamp_micros((F.col("sec") * 1_000_000).cast("long"))
            .cast("timestamp_ntz")
            .alias("ts"),
            "user_id",
            F.lit("x").alias("event_type"),
            F.lit(0.0).alias("value"),
            F.lit("{}").alias("props"),
        )
        df.repartition(2).write.parquet(src)

        out, ck = str(tmp_path / "sout"), str(tmp_path / "sck")
        q = write_stream(
            sessionize_stream(
                stream_events(spark, src), gap="10 seconds", watermark="60 seconds"
            ),
            out,
            ck,
        )
        _drain(q)
        from mopper_spark.streaming import as_utc_instant

        got = {
            (r.user_id, r.s_us, r.e_us, r.n_events)
            for r in spark.read.parquet(out)
            .select(
                "user_id",
                F.unix_micros("session_start").alias("s_us"),
                F.unix_micros("session_end").alias("e_us"),
                "n_events",
            )
            .collect()
        }
        # batch equivalent: session_window works on batch frames too, over
        # the SAME utc-instant conversion the stream applies
        batch_all = {
            (r.user_id, r.s_us, r.e_us, r.n_events)
            for r in df.withColumn("ts", as_utc_instant("ts"))
            .groupBy(
                "user_id", F.session_window("ts", "10 seconds")
            )
            .agg(F.count("*").alias("n_events"))
            .select(
                "user_id",
                F.unix_micros("session_window.start").alias("s_us"),
                F.unix_micros("session_window.end").alias("e_us"),
                "n_events",
            )
            .collect()
        }
        emitted_users = {g[0] for g in got}
        assert got <= batch_all
        assert len(got) == 4  # u1 x2 + u2's first session + u4's merged one
        assert 3 not in emitted_users  # open/late session held back
        # exact-gap boundary merges: ONE session spanning both events
        u4 = sorted(g for g in got if g[0] == 4)
        assert [(g[1], g[2], g[3]) for g in u4] == [
            (600_000_000, 620_000_000, 2),
        ]
        # the emitted sessions carry exact batch values
        finalized = {b for b in batch_all if b in got}
        assert finalized == got


class TestDedupCountsStream:
    def test_running_counts_accumulate_to_batch_totals(self, spark, tmp_path):
        """applyInPandasWithState dedup ledger: across several
        micro-batches the final running count per fingerprint equals the
        batch GROUP BY — and intermediate emissions are monotone."""
        from mopper_spark.streaming import dedup_counts_stream

        src = str(tmp_path / "docs_src")
        texts = [f"doc body {i % 7}" for i in range(40)]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
        )
        # 4 files → 4 micro-batches with maxFilesPerTrigger=1
        df.repartition(4).write.parquet(src)

        stream = (
            spark.readStream.schema("doc_id long, text string")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        out, ck = str(tmp_path / "dout"), str(tmp_path / "dck")
        q = write_stream(dedup_counts_stream(stream), out, ck, output_mode="update")
        _drain(q)
        got = spark.read.parquet(out)
        final = {
            r.fingerprint: r.n_seen
            for r in got.groupBy("fingerprint")
            .agg(F.max("n_seen").alias("n_seen"))
            .collect()
        }
        batch = {
            r.fingerprint: r.n
            for r in df.select(
                F.md5(F.col("text").cast("binary")).alias("fingerprint")
            )
            .groupBy("fingerprint")
            .agg(F.count("*").alias("n"))
            .collect()
        }
        assert final == batch
        # state visibly accumulated across batches: some fingerprint was
        # emitted more than once with increasing totals
        multi = (
            got.groupBy("fingerprint").agg(F.count("*").alias("k")).filter("k > 1")
        )
        assert multi.count() > 0


class TestIntervalJoinStream:
    def test_cross_batch_matches_via_state(self, spark, tmp_path):
        """A view arriving in micro-batch 1 must still match a purchase
        arriving in micro-batch 2 (join state carries across triggers),
        and pairs outside the 1 h window must not join."""
        from mopper_spark.streaming import (
            interval_join_stream,
            stream_events,
            write_stream,
        )

        src = str(tmp_path / "ev_src")

        def mk(rows):
            return spark.createDataFrame(
                rows, "event_id long, user_id long, sec double, event_type string"
            ).select(
                "event_id",
                F.timestamp_micros((F.col("sec") * 1_000_000).cast("long"))
                .cast("timestamp_ntz")
                .alias("ts"),
                "user_id",
                "event_type",
                F.lit(0.0).alias("value"),
                F.lit("{}").alias("props"),
            )

        # file/batch 1: views
        mk([(1, 1, 100.0, "view"), (2, 2, 100.0, "view")]).repartition(1).write.parquet(src)
        # file/batch 2: purchases — u1 within 1 h of its view, u2 not
        mk([(3, 1, 1800.0, "purchase"), (4, 2, 9000.0, "purchase")]).repartition(
            1
        ).write.mode("append").parquet(src)

        purchases = (
            stream_events(spark, src, max_files_per_trigger=1)
            .filter(F.col("event_type") == "purchase")
            .select("user_id", F.col("ts").alias("p_ts"), F.col("event_id").alias("pid"))
        )
        views = (
            stream_events(spark, src, max_files_per_trigger=1)
            .filter(F.col("event_type") == "view")
            .select("user_id", F.col("ts").alias("v_ts"), F.col("event_id").alias("vid"))
        )
        j = interval_join_stream(
            purchases, views, by="user_id", left_ts="p_ts", right_ts="v_ts",
            max_span="1 hour", watermark="1 day",
        ).select(F.col("l.pid").alias("pid"), F.col("r.vid").alias("vid"))
        out, ck = str(tmp_path / "jout"), str(tmp_path / "jck")
        q = write_stream(j, out, ck)
        _drain(q)
        got = {(r.pid, r.vid) for r in spark.read.parquet(out).collect()}
        assert got == {(3, 1)}


class TestEntityIntervalsStream:
    def test_finalized_intervals_match_batch(self, spark, tmp_path):
        """Streaming entity_intervals_stream (session_window, inclusive
        gap boundary) must emit exactly the batch
        entity_activity_intervals rows for intervals finalized by the
        final watermark.  Boundaries sit well clear of the cutoff so the
        assertion is insensitive to < vs <= at the watermark itself."""
        from mopper_spark.pipeline.temporal import entity_activity_intervals
        from mopper_spark.streaming import entity_intervals_stream

        # gap 10 s, watermark 60 s; max ts = 1000 s -> cutoff ~ 940 s.
        # (c1, alice): two intervals (0-20 incl. an exactly-10s chain,
        # 200-200); (c1, bob): one; (c2, alice): ends 995 -> held back.
        rows = [
            ("c1", "alice", 0.0), ("c1", "alice", 10.0), ("c1", "alice", 20.0),
            ("c1", "alice", 200.0),
            ("c1", "bob", 150.0), ("c1", "bob", 155.0),
            ("c2", "alice", 990.0), ("c2", "alice", 995.0),
            ("c2", "bob", 1000.0),  # max-ts driver; own interval open
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, surface string, sec double"
        ).select(
            "conv_id",
            F.col("surface").alias("entity"),
            F.timestamp_micros((F.col("sec") * 1_000_000).cast("long")).alias("ts"),
        )
        src = str(tmp_path / "mentions_src")
        df.repartition(2).write.parquet(src)

        out, ck = str(tmp_path / "iout"), str(tmp_path / "ick")
        stream = (
            spark.readStream.schema("conv_id string, entity string, ts timestamp")
            .parquet(src)
        )
        q = write_stream(
            entity_intervals_stream(stream, gap="10 seconds", watermark="60 seconds"),
            out,
            ck,
        )
        _drain(q)
        got = {
            tuple(r)
            for r in spark.read.parquet(out)
            .select("conv_id", "entity", "valid_from_us", "valid_to_us", "n_mentions")
            .collect()
        }

        batch = {
            tuple(r)
            for r in entity_activity_intervals(
                df, max_gap_s=10, entity_col="entity"
            ).collect()
        }
        cutoff_us = (1000 - 60) * 1_000_000
        finalized = {
            r for r in batch if r[3] + 10 * 1_000_000 < cutoff_us
        }
        assert got == finalized
        # the exactly-10s chain stayed one interval on both sides
        assert ("c1", "alice", 0, 20_000_000, 3) in got


class TestHllStream:
    def test_stream_equals_batch_and_replay_idempotent(self, spark, tmp_path):
        """Register merge is associative+commutative: stream summary ==
        batch summary; a replayed micro-batch (same batch_id) is a no-op
        (the pointer short-circuit)."""
        from pyspark.sql import functions as F

        from mopper_spark.streaming import process_hll_batch, read_hll_registers
        from mopper_spark.textops.sketches import hll_distinct, hll_summary

        vals = spark.range(3000).selectExpr("concat('v', id % 1100) AS g")
        state = str(tmp_path / "state")
        import os
        os.makedirs(state)
        # feed in three arbitrary slices
        for bid, pred in enumerate(["id % 3 = 0", "id % 3 = 1", "id % 3 = 2"]):
            b = spark.range(3000).filter(pred).selectExpr("concat('v', id % 1100) AS g")
            process_hll_batch(b, bid, state)
        # replay the last batch — must be skipped, state unchanged
        before = sorted(map(tuple, read_hll_registers(spark, state).collect()))
        process_hll_batch(
            spark.range(3000).filter("id % 3 = 2").selectExpr("concat('v', id % 1100) AS g"),
            2, state)
        after = sorted(map(tuple, read_hll_registers(spark, state).collect()))
        assert before == after

        stream_row = tuple(hll_summary(read_hll_registers(spark, state)).collect()[0])
        batch_row = tuple(
            hll_distinct(vals, "g").select("m", "v_zero", "s_fp", "estimate").collect()[0]
        )
        assert stream_row == batch_row

    def test_batch_order_insensitive(self, spark, tmp_path):
        """Two feeds of the same slices in different orders end with the
        same register state (merge commutes)."""
        import os

        from mopper_spark.streaming import process_hll_batch, read_hll_registers

        slices = ["id % 3 = 0", "id % 3 = 1", "id % 3 = 2"]
        states = []
        for order in (slices, slices[::-1]):
            st = str(tmp_path / f"s{len(states)}")
            os.makedirs(st)
            for bid, pred in enumerate(order):
                b = spark.range(2000).filter(pred).selectExpr("concat('x', id % 700) AS g")
                process_hll_batch(b, bid, st)
            states.append(sorted(map(tuple, read_hll_registers(spark, st).collect())))
        assert states[0] == states[1]


class TestHeavyHittersStream:
    def test_stream_equals_batch_and_replay_idempotent(self, spark, tmp_path):
        """MG candidate recall is total under any merge order, so the
        finalized stream output == batch heavy_hitters; a replayed
        micro-batch (same batch_id) is a no-op; state stays ≤ k rows."""
        import os

        from mopper_spark.streaming import (
            heavy_hitters_from_state,
            process_mg_batch,
        )
        from mopper_spark.textops.sketches import heavy_hitters

        # skewed stream: value h0 dominates, long uniform tail
        vals = spark.range(4000).selectExpr(
            "CASE WHEN id % 4 < 2 THEN 'h0' ELSE concat('t', id % 900) END AS v"
        )
        state = str(tmp_path / "state")
        os.makedirs(state)
        k = 10
        for bid, pred in enumerate(["id % 3 = 0", "id % 3 = 1", "id % 3 = 2"]):
            b = spark.range(4000).filter(pred).selectExpr(
                "CASE WHEN id % 4 < 2 THEN 'h0' ELSE concat('t', id % 900) END AS v"
            )
            process_mg_batch(b, bid, state, k)
        with open(os.path.join(state, "_LATEST")) as fh:
            v = fh.read().strip()
        counters = spark.read.parquet(os.path.join(state, v, "counters"))
        assert counters.count() <= k
        n_total = spark.read.parquet(os.path.join(state, v, "meta")).first()[
            "n_total"
        ]
        assert n_total == 4000

        before = sorted(map(tuple, counters.collect()))
        process_mg_batch(
            spark.range(4000).filter("id % 3 = 2").selectExpr(
                "CASE WHEN id % 4 < 2 THEN 'h0' ELSE concat('t', id % 900) END AS v"
            ),
            2, state, k,
        )
        counters2 = spark.read.parquet(os.path.join(state, v, "counters"))
        assert sorted(map(tuple, counters2.collect())) == before

        got = sorted(
            map(tuple, heavy_hitters_from_state(spark, state, vals, "v", k).collect())
        )
        exp = sorted(map(tuple, heavy_hitters(vals, "v", k=k).collect()))
        assert got == exp == [("h0", 2000)]

    def test_order_insensitive_final_output(self, spark, tmp_path):
        """Intermediate counter SETS may differ with batch order (the trim
        is order-dependent) but the FINALIZED output may not — recall of
        every true heavy hitter is the mergeability guarantee."""
        import os

        from mopper_spark.streaming import (
            heavy_hitters_from_state,
            process_mg_batch,
        )

        expr = (
            "CASE WHEN id % 5 = 0 THEN 'a' WHEN id % 5 = 1 THEN 'b' "
            "ELSE concat('z', id % 300) END AS v"
        )
        vals = spark.range(3000).selectExpr(expr)
        slices = ["id % 3 = 0", "id % 3 = 1", "id % 3 = 2"]
        outs = []
        for i, order in enumerate((slices, slices[::-1])):
            st = str(tmp_path / f"s{i}")
            os.makedirs(st)
            for bid, pred in enumerate(order):
                process_mg_batch(
                    spark.range(3000).filter(pred).selectExpr(expr), bid, st, 6
                )
            outs.append(
                sorted(
                    map(
                        tuple,
                        heavy_hitters_from_state(spark, st, vals, "v", 6).collect(),
                    )
                )
            )
        assert outs[0] == outs[1]
        assert {v for v, _ in outs[0]} == {"a", "b"}


class TestLatenessAudit:
    def test_matches_replay(self, spark):
        import datetime as dt
        from mopper_spark.streaming import lateness_audit

        base = dt.datetime(2024, 1, 1)
        # (arrival, event-time offset minutes)
        obs = [(0, 0), (1, 60), (2, 30), (3, 5), (4, 90), (5, 85), (6, 10)]
        rows = [(a, base + dt.timedelta(minutes=m)) for a, m in obs]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        got = {
            r.event_id: (r.wm_us, r.late)
            for r in lateness_audit(df, "ts", "event_id",
                                    delay_seconds=1800, bucket_width=3).collect()
        }
        run = None
        want = {}
        for a, m in obs:
            ts = int((base + dt.timedelta(minutes=m)).timestamp() * 1e6)
            wm = run - 1800 * 1_000_000 if run is not None else -1
            want[a] = (wm, 1 if run is not None and ts < wm else 0)
            run = ts if run is None else max(run, ts)
        assert got == want
        # the 5-minute event after the 60-minute high water is late
        assert got[3][1] == 1 and got[2][1] == 0 and got[6][1] == 1

    def test_partition_invariance(self, spark):
        import datetime as dt
        from mopper_spark.streaming import lateness_audit

        base = dt.datetime(2024, 1, 1)
        rows = [(i, base + dt.timedelta(minutes=(i * 37) % 120)) for i in range(100)]
        df = spark.createDataFrame(rows, "event_id long, ts timestamp")
        a = sorted((r.event_id, r.wm_us, r.late) for r in
                   lateness_audit(df, "ts", "event_id", delay_seconds=600,
                                  bucket_width=7).collect())
        b = sorted((r.event_id, r.wm_us, r.late) for r in
                   lateness_audit(df.repartition(9), "ts", "event_id",
                                  delay_seconds=600).collect())
        assert a == b


class TestDriftCountsStream:
    def test_drained_state_equals_batch_groupby(self, spark, tmp_path):
        from mopper_spark.streaming import drift_counts_stream, read_band_counts

        src = str(tmp_path / "psi_src")
        state, ck = str(tmp_path / "psi_state"), str(tmp_path / "psi_ck")
        rows = [(float(v % 7) + 0.3,) for v in range(200)]
        spark.createDataFrame(rows, "value double").repartition(4).write.parquet(src)

        stream = (
            spark.readStream.schema("value double")
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        drift_counts_stream(stream, state, ck).awaitTermination(300)
        got = {r.band: r.n for r in read_band_counts(spark, state).collect()}
        import pyspark.sql.functions as F

        want = {
            r.band: r.n
            for r in spark.read.parquet(src)
            .select(F.floor("value").cast("long").alias("band"))
            .groupBy("band")
            .agg(F.count(F.lit(1)).cast("long").alias("n"))
            .collect()
        }
        assert got == want and len(got) == 7

    def test_replayed_batch_short_circuits(self, spark, tmp_path):
        from mopper_spark.streaming import process_band_count_batch, read_band_counts

        state = str(tmp_path / "replay_state")
        import os

        os.makedirs(state, exist_ok=True)
        bdf = spark.createDataFrame([(1,), (1,), (2,)], "band long")
        process_band_count_batch(bdf, 0, state)
        # replay of the SAME batch id must not double-count
        process_band_count_batch(bdf, 0, state)
        got = {r.band: r.n for r in read_band_counts(spark, state).collect()}
        assert got == {1: 2, 2: 1}
