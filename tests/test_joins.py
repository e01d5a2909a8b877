"""asof_join / range_join_buckets: semantics vs independent references
(DuckDB ASOF JOIN / a naive theta join) and the plan shapes that make
them scale."""

import duckdb
import pandas as pd
import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.joins import asof_join, range_join_buckets


@pytest.fixture(scope="module")
def trades_quotes(spark):
    trades = spark.createDataFrame(
        [
            ("A", 1000, 1),
            ("A", 2000, 2),
            ("A", 2500, 3),
            ("B", 1500, 4),
            ("B", 9999, 5),
            ("C", 500, 6),  # no quote at or before → null match
        ],
        "sym string, ts long, trade_id long",
    )
    quotes = spark.createDataFrame(
        [
            ("A", 900, 10.0),
            ("A", 2000, 11.0),  # tie with trade 2 → inclusive match
            ("A", 2400, 12.0),
            ("B", 1500, 20.0),
            ("B", 1600, 21.0),
            ("C", 600, 30.0),  # after the only C trade
        ],
        "sym string, ts long, px double",
    )
    return trades, quotes


class TestAsofJoin:
    def test_backward_inclusive_matches_duckdb(self, spark, trades_quotes):
        trades, quotes = trades_quotes
        got = {
            (r.sym, r.ts, r.trade_id, r.ts_right, r.px_right)
            for r in asof_join(trades, quotes, by="sym", on="ts").collect()
        }
        con = duckdb.connect()
        con.register("t", trades.toPandas())
        con.register("q", quotes.toPandas())
        want = {
            tuple(r)
            for r in con.execute(
                """
                SELECT t.sym, t.ts, t.trade_id, q.ts AS ts_right,
                       q.px AS px_right
                FROM t ASOF LEFT JOIN q
                  ON t.sym = q.sym AND t.ts >= q.ts
                """
            ).fetchall()
        }
        assert got == want
        # spot-check the semantics the oracle encodes
        by_trade = {r[2]: r for r in got}
        assert by_trade[2][3:] == (2000, 11.0)  # tie → inclusive
        assert by_trade[6][3:] == (None, None)  # no prior quote
        assert by_trade[5][3:] == (1600, 21.0)  # latest prior wins

    def test_tolerance_nulls_stale_matches(self, spark, trades_quotes):
        trades, quotes = trades_quotes
        got = {
            r.trade_id: r.ts_right
            for r in asof_join(
                trades, quotes, by="sym", on="ts", tolerance=F.lit(150)
            ).collect()
        }
        # trade 1 @1000: quote @900 within 150 → kept
        # trade 3 @2500: quote @2400 within 150 → kept
        # trade 5 @9999: quote @1600 is 8399 stale → nulled, row kept
        assert got[1] == 900 and got[3] == 2400 and got[5] is None
        assert len(got) == 6

    def test_single_shuffle_plan(self, spark, trades_quotes):
        """The whole as-of join must cost ONE hash partitioning on the key
        (plus the window sort) — never a cross/theta join."""
        trades, quotes = trades_quotes
        plan = asof_join(trades, quotes, by="sym", on="ts")._jdf.queryExecution().executedPlan().toString()
        assert "CartesianProduct" not in plan
        assert "BroadcastNestedLoopJoin" not in plan
        assert plan.count("Exchange hashpartitioning") == 1


class TestRangeJoinBuckets:
    def test_matches_naive_theta_join(self, spark):
        facts = spark.range(0, 500).select(
            F.col("id").alias("fact_id"),
            (F.col("id") % 97 * 2.13).alias("v"),
        )
        ranges = spark.createDataFrame(
            [(i, i * 8.0, i * 8.0 + 12.0) for i in range(26)],
            "band_id long, lo double, hi double",
        )
        got = {
            (r.fact_id, r.band_id)
            for r in range_join_buckets(
                facts, ranges, "v", "lo", "hi", bucket_width=8.0
            ).collect()
        }
        naive = {
            (r.fact_id, r.band_id)
            for r in facts.join(
                ranges, (F.col("v") >= F.col("lo")) & (F.col("v") < F.col("hi"))
            ).collect()
        }
        assert got == naive and len(got) > 500  # overlap → multi-match

    def test_half_open_boundaries(self, spark):
        facts = spark.createDataFrame([(1, 8.0), (2, 20.0)], "fact_id long, v double")
        ranges = spark.createDataFrame([(0, 0.0, 8.0), (1, 8.0, 20.0)], "band_id long, lo double, hi double")
        got = {(r.fact_id, r.band_id) for r in range_join_buckets(facts, ranges, "v", "lo", "hi", 8.0).collect()}
        assert got == {(1, 1)}  # v=8 excluded from [0,8), included in [8,20); v=20 matches nothing

    def test_broadcast_hash_join_plan(self, spark):
        facts = spark.range(0, 100).select(F.col("id").alias("fact_id"), (F.col("id") * 1.0).alias("v"))
        ranges = spark.createDataFrame([(0, 0.0, 50.0)], "band_id long, lo double, hi double")
        plan = range_join_buckets(facts, ranges, "v", "lo", "hi", 10.0)._jdf.queryExecution().executedPlan().toString()
        assert "BroadcastHashJoin" in plan
        assert "NestedLoop" not in plan and "CartesianProduct" not in plan


class TestTriangleCounts:
    def test_known_graph(self, spark):
        from mopper_spark.pipeline.graph import triangle_counts

        # K4 on a,b,c,d (4 triangles, each node in 3) plus a pendant edge
        # and a duplicate/reversed/self-loop noise row
        edges = spark.createDataFrame(
            [
                ("a", "b"), ("a", "c"), ("a", "d"),
                ("b", "c"), ("b", "d"), ("c", "d"),
                ("d", "e"),           # pendant — no triangle
                ("b", "a"),           # reversed duplicate
                ("c", "c"),           # self-loop
            ],
            "a string, b string",
        )
        got = {
            (r.node, r.n_triangles) for r in triangle_counts(edges).collect()
        }
        assert got == {("a", 3), ("b", 3), ("c", 3), ("d", 3)}

    def test_matches_naive_three_way_join(self, spark):
        from mopper_spark.pipeline.graph import triangle_counts

        # deterministic pseudo-random graph on 40 nodes
        edges = (
            spark.range(0, 400)
            .select(
                (F.xxhash64("id") % 40).alias("a"),
                (F.xxhash64("id", F.lit(1)) % 40).alias("b"),
            )
            .selectExpr("abs(a) as a", "abs(b) as b")
        )
        got = {
            (r.node, r.n_triangles)
            for r in triangle_counts(edges).collect()
        }
        e = (
            edges.selectExpr("least(a,b) as u", "greatest(a,b) as v")
            .filter("u != v")
            .distinct()
        )
        e.createOrReplaceTempView("tri_e")
        naive = {
            (r.node, r.n)
            for r in spark.sql(
                """
                SELECT node, CAST(COUNT(*) AS LONG) AS n FROM (
                  SELECT explode(array(e1.u, e1.v, e2.v)) AS node
                  FROM tri_e e1
                  JOIN tri_e e2 ON e2.u = e1.u AND e1.v < e2.v
                  JOIN tri_e e3 ON e3.u = e1.v AND e3.v = e2.v
                ) GROUP BY node
                """
            ).collect()
        }
        assert got == naive and len(got) > 5

    def test_degree_orientation_caps_wedges(self, spark):
        """Star + one closing edge: the naive wedge join on the hub
        generates C(n,2) wedges; degree orientation points every spoke AT
        the hub, so the hub has out-degree ~0 and wedge work stays linear.
        Assert correctness on the skewed shape (the plan property is the
        orientation itself, exercised here with a 200-spoke hub)."""
        from mopper_spark.pipeline.graph import triangle_counts

        hub = [("hub", f"s{i}") for i in range(200)] + [("s0", "s1")]
        edges = spark.createDataFrame(hub, "a string, b string")
        got = {
            (r.node, r.n_triangles) for r in triangle_counts(edges).collect()
        }
        assert got == {("hub", 1), ("s0", 1), ("s1", 1)}


class TestRateAnomaly:
    def test_z_matches_python_and_flags_burst(self, spark):
        import math
        from datetime import datetime

        from mopper_spark.textops.joins import rate_anomaly

        rows = []
        for h, n in [(0, 2), (1, 2), (2, 2), (3, 10)]:
            rows += [(datetime(2024, 1, 1, h, i), "A") for i in range(n)]
        rows += [(datetime(2024, 1, 1, 0, i), "B") for i in range(3)]  # one bucket
        df = spark.createDataFrame(rows, "ts timestamp, event_type string")
        got = {(r.event_type, r.bucket_us): (r.n, r.z)
               for r in rate_anomaly(df).collect()}
        K, S1, S2 = 4, 16, 112
        for (t, _), (n, z) in got.items():
            if t == "A":
                assert z == (n * K - S1) / math.sqrt(K * S2 - S1 * S1)
        # burst bucket is the only positive-z A bucket
        assert sum(1 for (t, _), (n, z) in got.items() if t == "A" and z > 0) == 1
        # single-bucket type: zero variance -> z = 0 guard
        assert [z for (t, _), (_, z) in got.items() if t == "B"] == [0.0]

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.joins import rate_anomaly

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = sorted(map(tuple, rate_anomaly(ev).collect()))
        b = sorted(map(tuple, rate_anomaly(ev.repartition(13)).collect()))
        assert a == b and len(a) > 10


class TestCohortRetention:
    def test_triangle_exact(self, spark):
        from datetime import datetime

        from mopper_spark.textops.joins import cohort_retention

        def d(day, h=0):
            return datetime(2024, 1, day, h)

        rows = [
            (1, d(1)), (2, d(1)),            # cohort day1: users 1,2
            (1, d(2)),                        # day2: only user 1 returns
            (3, d(2)),                        # cohort day2: user 3
            (1, d(3)), (2, d(3)), (3, d(3)),  # day3: everyone
            (1, d(1, 5)),                     # same-day dup: no double count
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {(r.cohort_us, r.bucket_us): (r.n_active, r.cohort_size, r.share)
               for r in cohort_retention(df).collect()}
        D = 86_400_000_000
        day1 = 1704067200000000
        assert got[(day1, day1)] == (2, 2, 1.0)
        assert got[(day1, day1 + D)] == (1, 2, 0.5)
        assert got[(day1, day1 + 2 * D)] == (2, 2, 1.0)
        assert got[(day1 + D, day1 + D)] == (1, 1, 1.0)
        assert got[(day1 + D, day1 + 2 * D)] == (1, 1, 1.0)
        assert len(got) == 5

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.joins import cohort_retention

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = sorted(map(tuple, cohort_retention(ev).collect()))
        b = sorted(map(tuple, cohort_retention(ev.repartition(11)).collect()))
        assert a == b and len(a) >= 3


class TestFunnelSteps:
    """joins.funnel_steps — earliest-chain conversion funnel."""

    def _ev(self, spark, rows):
        return spark.createDataFrame(
            rows, "user_id long, event_type string, ts timestamp"
        )

    def test_hand_computed_funnel(self, spark):
        from datetime import datetime as dt

        from mopper_spark.textops.joins import funnel_steps

        t = lambda s: dt(2024, 1, 1, 0, 0, s)
        rows = [
            # u1 completes signup -> view -> purchase
            (1, "signup", t(1)), (1, "view", t(2)), (1, "purchase", t(3)),
            # u2: view BEFORE signup; purchase after -> stops at signup
            (2, "view", t(1)), (2, "signup", t(2)), (2, "purchase", t(3)),
            # u3: signup + later view, no purchase -> two steps
            (3, "signup", t(1)), (3, "view", t(5)),
            # u4: never signs up -> counted nowhere
            (4, "view", t(1)), (4, "purchase", t(2)),
            # u5: view at the SAME instant as signup -> strictly-after fails
            (5, "signup", t(7)), (5, "view", t(7)),
        ]
        out = funnel_steps(
            self._ev(spark, rows), ["signup", "view", "purchase"]
        ).collect()
        got = {r.step_idx: (r.step, r.n_users, r.share) for r in out}
        assert got[0] == ("signup", 4, 1.0)
        assert got[1] == ("view", 2, 0.5)
        assert got[2] == ("purchase", 1, 0.25)

    def test_greedy_earliest_is_optimal(self, spark):
        """A later 'a' would block the chain; the earliest one admits it."""
        from datetime import datetime as dt

        from mopper_spark.textops.joins import funnel_steps

        t = lambda s: dt(2024, 1, 1, 0, 0, s)
        rows = [(1, "a", t(3)), (1, "b", t(2)), (1, "a", t(1))]
        out = {r.step_idx: r.n_users for r in funnel_steps(
            self._ev(spark, rows), ["a", "b"]).collect()}
        assert out == {0: 1, 1: 1}

    def test_validation_and_partitioning_invariance(self, spark):
        import pytest

        from mopper_spark.textops.joins import funnel_steps

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        with pytest.raises(ValueError):
            funnel_steps(ev, ["signup"])
        steps = ["signup", "view", "click", "purchase"]
        a = sorted(map(tuple, funnel_steps(ev, steps).collect()))
        b = sorted(
            map(tuple, funnel_steps(ev.repartition(13), steps).collect())
        )
        assert a == b and len(a) == 4
        counts = [r[2] for r in a]  # monotone non-increasing down the funnel
        assert all(x >= y for x, y in zip(counts, counts[1:]))


class TestSurvivalKM:
    """joins.survival_km — integer fixed-point Kaplan-Meier."""

    def test_hand_computed_curve(self, spark):
        from datetime import datetime as dt, timedelta as td

        from mopper_spark.textops.joins import survival_km

        day = lambda k: dt(2024, 1, 1) + td(days=k)
        rows = [
            (1, "signup", day(0)), (1, "purchase", day(2)),
            (2, "signup", day(0)), (2, "purchase", day(2)),
            (3, "signup", day(0)),                      # censored at day 4
            (4, "signup", day(0)), (4, "purchase", day(4)),
        ]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
        got = {r.t_days: r for r in survival_km(df, "signup", "purchase").collect()}
        assert set(got) == {2, 4}
        r2, r4 = got[2], got[4]
        assert (r2.n_risk, r2.n_events, r2.n_censored) == (4, 2, 0)
        assert (r4.n_risk, r4.n_events, r4.n_censored) == (2, 1, 1)
        assert r2.s_fp == 500_000_000_000_000 and r2.survival == 0.5
        assert r4.s_fp == 250_000_000_000_000 and r4.survival == 0.25

    def test_long_division_exactness(self, spark):
        """The reassociated step equals floor(S*(n-d)/n) even when the
        naive product S*(n-d) would overflow int64."""
        from datetime import datetime as dt, timedelta as td

        from mopper_spark.textops.joins import survival_km

        day = lambda k: dt(2024, 1, 1) + td(days=k)
        rows = []
        for u in range(7):   # 7 at risk; 1 event on day 1, 2 on day 3
            rows.append((u, "signup", day(0)))
        rows += [(0, "purchase", day(1)), (1, "purchase", day(3)),
                 (2, "purchase", day(3))]
        df = spark.createDataFrame(rows, "user_id long, event_type string, ts timestamp")
        got = {r.t_days: r.s_fp for r in survival_km(df, "signup", "purchase").collect()}
        s1 = 10**15 * 6 // 7
        assert got[1] == s1
        assert got[3] == (s1 // 6) * 4 + ((s1 % 6) * 4) // 6

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.joins import survival_km

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        a = sorted(map(tuple, survival_km(ev, "signup", "purchase").collect()))
        b = sorted(
            map(tuple, survival_km(ev.repartition(13), "signup", "purchase").collect())
        )
        assert a == b and len(a) >= 2
        # survival is non-increasing down the day axis
        surv = [r[5] for r in a]
        assert all(x >= y for x, y in zip(surv, surv[1:]))


class TestSessionPaths:
    """joins.session_paths — event-type n-gram mining per user-day."""

    def test_hand_computed_trigrams(self, spark):
        from datetime import datetime as dt, timedelta as td

        from mopper_spark.textops.joins import session_paths

        t0 = dt(2024, 1, 1, 10, 0, 0)
        rows = [
            # u1 day1: a b c d -> abc, bcd
            (1, 1, "a", t0), (2, 1, "b", t0 + td(minutes=1)),
            (3, 1, "c", t0 + td(minutes=2)), (4, 1, "d", t0 + td(minutes=3)),
            # u1 day2: a b c -> abc (second)
            (5, 1, "a", t0 + td(days=1)), (6, 1, "b", t0 + td(days=1, minutes=1)),
            (7, 1, "c", t0 + td(days=1, minutes=2)),
            # u2 day1: only 2 events -> no trigram
            (8, 2, "a", t0), (9, 2, "b", t0 + td(minutes=1)),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = {(r.t1, r.t2, r.t3): r.n_paths
               for r in session_paths(df).collect()}
        assert got == {("a", "b", "c"): 2, ("b", "c", "d"): 1}

    def test_tie_break_by_event_id(self, spark):
        """Same-timestamp events order by event_id — deterministic."""
        from datetime import datetime as dt

        from mopper_spark.textops.joins import session_paths

        t0 = dt(2024, 1, 1)
        rows = [(3, 1, "c", t0), (1, 1, "a", t0), (2, 1, "b", t0)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp"
        )
        got = [(r.t1, r.t2, r.t3) for r in session_paths(df).collect()]
        assert got == [("a", "b", "c")]

    def test_validation_and_partitioning_invariance(self, spark):
        import pytest

        from mopper_spark.textops.joins import session_paths

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        with pytest.raises(ValueError):
            session_paths(ev, n=1)
        a = sorted(map(tuple, session_paths(ev).collect()))
        b = sorted(map(tuple, session_paths(ev.repartition(13)).collect()))
        assert a == b and len(a) >= 5


class TestRFMScores:
    """joins.rfm_scores — value-boundary quintile scoring."""

    def test_scores_deterministic_and_bounded(self, spark):
        from mopper_spark.textops.joins import rfm_scores

        ev = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
        rows = rfm_scores(ev).collect()
        assert len(rows) >= 10
        for r in rows:
            assert 1 <= r.r_score <= 5 and 1 <= r.f_score <= 5 and 1 <= r.m_score <= 5
            assert r.rfm == f"{r.r_score}{r.f_score}{r.m_score}"
        again = sorted(map(tuple, rfm_scores(ev.repartition(11)).collect()))
        assert again == sorted(map(tuple, rows))

    def test_equal_metrics_equal_scores(self, spark):
        """Tied metric values always land in the same quintile — the
        property ntile cannot give."""
        from datetime import datetime as dt, timedelta as td

        from mopper_spark.textops.joins import rfm_scores

        t0 = dt(2024, 1, 1)
        rows = []
        eid = 0
        for u in range(10):
            for k in range(3):  # identical histories for all users
                eid += 1
                rows.append((eid, u, "purchase", t0 + td(days=k), 10.0))
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, event_type string, ts timestamp, value double"
        )
        out = rfm_scores(df).collect()
        assert len(out) == 10
        assert len({(r.r_score, r.f_score, r.m_score) for r in out}) == 1


class TestSubsequenceSupport:
    def _events(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 5, 1)
        # (user, day, seq)
        sessions = [
            (1, 0, ["view", "click", "view", "purchase"]),
            (1, 1, ["click", "view"]),
            (2, 0, ["view", "view", "view"]),
            (3, 0, ["purchase", "click", "purchase"]),
        ]
        rows, eid = [], 0
        for u, d, seq in sessions:
            for i, t in enumerate(seq):
                rows.append((eid, base + dt.timedelta(days=d, minutes=i), u, t))
                eid += 1
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string"
        )
        return df, [s[2] for s in sessions]

    @staticmethod
    def _contains(seq, pat):
        it = iter(seq)
        return all(any(x == p for x in it) for p in pat)

    def test_matches_bruteforce(self, spark):
        from itertools import product
        from mopper_spark.textops.joins import subsequence_support

        df, seqs = self._events(spark)
        types = ["view", "click", "purchase"]
        got = {
            (r.t1, r.t2, r.t3): r.support
            for r in subsequence_support(df, types).collect()
        }
        want = {}
        for pat in list(product(types, repeat=2)) + list(product(types, repeat=3)):
            n = sum(1 for s in seqs if self._contains(s, pat))
            if n:
                key = pat if len(pat) == 3 else (pat[0], pat[1], "")
                want[key] = n
        assert got == want
        # spot checks: gap-allowed (view..purchase skips click)
        assert got[("view", "purchase", "")] == 1
        assert got[("view", "view", "")] == 2          # repeats need two occurrences
        assert got[("view", "click", "view")] == 1     # strict between
        assert got[("purchase", "click", "purchase")] == 1

    def test_partition_invariance_and_validation(self, spark):
        import pytest as _pt
        from mopper_spark.textops.joins import subsequence_support

        df, _ = self._events(spark)
        a = sorted(map(tuple, subsequence_support(df, ["view", "click"]).collect()))
        b = sorted(map(tuple, subsequence_support(df.repartition(7), ["view", "click"]).collect()))
        assert a == b
        with _pt.raises(ValueError, match="alphabet"):
            subsequence_support(df, [])
        with _pt.raises(ValueError, match="duplicate"):
            subsequence_support(df, ["a", "a"])


class TestFrequentItemsets:
    def test_matches_bruteforce(self, spark):
        import datetime as dt
        from itertools import combinations
        from mopper_spark.textops.joins import frequent_itemsets

        base = dt.datetime(2024, 6, 1)
        sessions = [
            (1, 0, ["view", "click", "view", "purchase"]),
            (1, 1, ["click", "view"]),
            (2, 0, ["view"]),
            (3, 0, ["purchase", "click", "error"]),
        ]
        rows = [
            (u, base + dt.timedelta(days=d, minutes=i), t)
            for u, d, seq in sessions
            for i, t in enumerate(seq)
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp, event_type string")
        items = ["click", "error", "purchase", "view"]
        got = {
            (r.i1, r.i2, r.i3): r.support
            for r in frequent_itemsets(df, items).collect()
        }
        want = {}
        for _, _, seq in sessions:
            xs = sorted(set(seq))
            for pat in list(combinations(xs, 2)):
                want[(pat[0], pat[1], "")] = want.get((pat[0], pat[1], ""), 0) + 1
            for pat in combinations(xs, 3):
                want[pat] = want.get(pat, 0) + 1
        assert got == want
        assert got[("click", "view", "")] == 2
        assert got[("click", "purchase", "view")] == 1

    def test_min_support_and_validation(self, spark):
        import datetime as dt
        import pytest as _pt
        from mopper_spark.textops.joins import frequent_itemsets

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1), "a"), (1, dt.datetime(2024, 1, 1), "b")],
            "user_id long, ts timestamp, event_type string",
        )
        out = frequent_itemsets(df, ["a", "b"], min_support=2).collect()
        assert out == []
        with _pt.raises(ValueError, match="alphabet"):
            frequent_itemsets(df, [])


class TestLinearAttribution:
    def test_matches_bruteforce_exact_split(self, spark):
        import datetime as dt
        from mopper_spark.textops.joins import linear_attribution

        base = dt.datetime(2024, 7, 1)
        # user 1: touches at t=0,10,20 min; conversions at t=25 (val 1.01) and t=200
        rows = [
            (0, base, 1, "view", 0.0),
            (1, base + dt.timedelta(minutes=10), 1, "click", 0.0),
            (2, base + dt.timedelta(minutes=20), 1, "view", 0.0),
            (3, base + dt.timedelta(minutes=25), 1, "purchase", 1.01),
            (4, base + dt.timedelta(minutes=200), 1, "purchase", 5.0),
            # user 2: conversion with no touches in window
            (5, base, 2, "purchase", 9.0),
            (6, base + dt.timedelta(minutes=1), 2, "click", 0.0),
        ]
        df = spark.createDataFrame(
            rows, "event_id long, ts timestamp, user_id long, event_type string, value double"
        )
        got = {
            r.touch_id: (r.n_conversions, r.credit_fp)
            for r in linear_attribution(
                df, "purchase", ["view", "click"], window_seconds=3600
            ).collect()
        }
        # conversion 3: k=3, 101 div 3 = 33 rem 2 -> earliest two touches +1
        # conversion 4 (t=200): window [140,200) -> no touches
        assert got == {0: (1, 34), 1: (1, 34), 2: (1, 33)}
        # credits conserve the conversion value exactly
        assert sum(c for _, c in got.values()) == 101

    def test_validation(self, spark):
        import datetime as dt
        import pytest as _pt
        from mopper_spark.textops.joins import linear_attribution

        df = spark.createDataFrame(
            [(0, dt.datetime(2024, 1, 1), 1, "x", 1.0)],
            "event_id long, ts timestamp, user_id long, event_type string, value double",
        )
        with _pt.raises(ValueError, match="window_seconds"):
            linear_attribution(df, "x", ["y"], 0)


class TestPitJoin:
    def test_picks_version_valid_at_ts(self, spark):
        import datetime as dt
        from mopper_spark.textops.joins import pit_join

        T = lambda d: dt.datetime(2024, 1, d)
        dim = spark.createDataFrame(
            [
                (1, "bronze", T(1), T(10)),
                (1, "gold", T(10), None),       # current
                (2, "silver", T(5), None),
            ],
            "user_id long, tier string, valid_from timestamp, valid_to timestamp",
        )
        facts = spark.createDataFrame(
            [
                (100, 1, T(3)),    # bronze
                (101, 1, T(10)),   # boundary: valid_from inclusive -> gold
                (102, 1, T(20)),   # gold (open interval)
                (103, 2, T(1)),    # before first version -> NULL
                (104, 3, T(1)),    # unknown key -> NULL
            ],
            "fact_id long, user_id long, ts timestamp",
        )
        got = {
            r.fact_id: r.tier
            for r in pit_join(facts, dim, ["user_id"]).collect()
        }
        assert got == {100: "bronze", 101: "gold", 102: "gold", 103: None, 104: None}
        # each fact survives exactly once (disjoint intervals)
        assert pit_join(facts, dim, ["user_id"]).count() == 5


class TestSeasonalRateAnomaly:
    def test_cells_and_z(self, spark):
        import datetime as dt
        from mopper_spark.textops.joins import seasonal_rate_anomaly

        # two Mondays 9:00 with counts 2 and 4; one Sunday 3:00 with 100
        mon1 = dt.datetime(2024, 1, 1, 9)   # Monday
        mon2 = dt.datetime(2024, 1, 8, 9)
        sun = dt.datetime(2024, 1, 7, 3)
        rows = (
            [("click", mon1)] * 2 + [("click", mon2)] * 4 + [("click", sun)] * 100
        )
        df = spark.createDataFrame(
            [(i, t, ts) for i, (t, ts) in enumerate(rows)],
            "event_id long, event_type string, ts timestamp",
        )
        out = {
            (r.dow, r.hod, r.n): r.z
            for r in seasonal_rate_anomaly(df).collect()
        }
        # (epoch_day + 4) % 7: Sunday = 0, Monday = 1
        assert set(out) == {(1, 9, 2), (1, 9, 4), (0, 3, 100)}
        # the huge Sunday count is NOT anomalous (its own cell, k=1 -> z=0)
        assert out[(0, 3, 100)] == 0.0
        # Monday cell: mean 3, counts 2/4 -> symmetric z
        assert abs(out[(1, 9, 2)] + out[(1, 9, 4)]) < 1e-12
        assert out[(1, 9, 4)] > 0
