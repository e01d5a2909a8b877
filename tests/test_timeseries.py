"""Time-series operators: fixed-grid gap fill with LOCF, trailing
time-range rolling-window features (mopper_spark/textops/timeseries.py).
Python-replica equalities on synthetic frames with deliberate boundary
cases (inclusive window edges, microsecond precision, equal-ts peers,
single-observation keys)."""

from datetime import datetime

import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.timeseries import (
    gap_fill,
    rolling_window_features,
    time_bucket,
)


@pytest.fixture(scope="module")
def events(spark):
    rows = [
        # user 1: observations in hours 0, 1, 4 (gap at 2, 3)
        (0, 1, datetime(2024, 1, 1, 0, 15), 10),
        (1, 1, datetime(2024, 1, 1, 0, 45), 20),
        (2, 1, datetime(2024, 1, 1, 1, 0), 30),
        (3, 1, datetime(2024, 1, 1, 4, 59), 40),
        # user 2: single observation — grid is one bucket, no gaps
        (4, 2, datetime(2024, 1, 2, 12, 30), 99),
        # user 3: equal-timestamp peers (frame peers in a RANGE window)
        (5, 3, datetime(2024, 1, 1, 6, 0), 7),
        (6, 3, datetime(2024, 1, 1, 6, 0), 8),
    ]
    return spark.createDataFrame(rows, "event_id long, user_id long, ts timestamp_ntz, cents long")


class TestGapFill:
    def test_grid_fill_and_locf(self, spark, events):
        out = gap_fill(
            events,
            "user_id",
            "ts",
            unit_seconds=3600,
            aggs={
                "n": F.count("*"),
                "s": F.sum("cents"),
                "reading": F.max("cents"),
            },
            fill_zero=("n", "s"),
            locf=("reading",),
        )
        got = {
            (r.user_id, r.bucket): (r.n, r.s, r.reading, r.bucket_start)
            for r in out.collect()
        }
        base = 473352  # hours since epoch of 2024-01-01 00:00
        # user 1: 5 buckets (hours 0..4), gaps at 2 and 3 carry reading=30
        assert got[(1, base + 0)][:3] == (2, 30, 20)
        assert got[(1, base + 1)][:3] == (1, 30, 30)
        assert got[(1, base + 2)][:3] == (0, 0, 30)
        assert got[(1, base + 3)][:3] == (0, 0, 30)
        assert got[(1, base + 4)][:3] == (1, 40, 40)
        assert got[(1, base + 2)][3] == datetime(2024, 1, 1, 2, 0)
        # user 2: exactly one bucket, no gap rows
        u2 = [k for k in got if k[0] == 2]
        assert len(u2) == 1 and got[u2[0]][:3] == (1, 99, 99)
        # user 3: peers aggregate into one bucket
        assert got[(3, base + 6)][:3] == (2, 15, 8)
        # total row count = sum of per-key spans
        assert len(got) == 5 + 1 + 1

    def test_time_bucket_integer_div(self, spark):
        df = spark.createDataFrame(
            [(datetime(2024, 1, 1, 0, 59, 59),), (datetime(2024, 1, 1, 1, 0, 0),)],
            "ts timestamp_ntz",
        )
        b = [r[0] for r in df.select(time_bucket("ts", 3600)).collect()]
        assert b[1] == b[0] + 1  # hour boundary is exact


class TestRollingWindowFeatures:
    def test_inclusive_hour_boundary_and_peers(self, spark):
        rows = [
            (0, 1, datetime(2024, 1, 1, 10, 0, 0), 1),
            (1, 1, datetime(2024, 1, 1, 11, 0, 0), 2),  # exactly 1h after #0
            (2, 1, datetime(2024, 1, 1, 12, 0, 0), 4),  # exactly 1h after #1
            (5, 1, datetime(2024, 1, 1, 12, 0, 0, 1), 8),  # 1h+1µs after #1
            (3, 2, datetime(2024, 1, 1, 10, 30), 10),
            (4, 2, datetime(2024, 1, 1, 10, 30), 20),  # equal-ts peer shares frame
        ]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, cents long"
        )
        out = rolling_window_features(
            df, "user_id", "ts", window_seconds=3600,
            aggs={"cnt": F.count("*"), "s": F.sum("cents")},
        )
        got = {r.event_id: (r.cnt, r.s) for r in out.collect()}
        assert got[0] == (1, 1)
        assert got[1] == (2, 3)  # event 0 at exactly −1h is inside (inclusive)
        assert got[2] == (2, 6)  # event 1 inside; event 0 is 2h back: out
        assert got[5] == (2, 12)  # event 1 is 1h+1µs back: out; 2 and self in
        assert got[3] == (2, 30) and got[4] == (2, 30)  # peers share the frame

    def test_partitioning_invariance(self, spark, events):
        a = rolling_window_features(
            events, "user_id", "ts", window_seconds=3600, aggs={"c": F.count("*")}
        )
        b = rolling_window_features(
            events.repartition(7), "user_id", "ts", window_seconds=3600,
            aggs={"c": F.count("*")},
        )
        assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


class TestEwmaBinary:
    def test_python_replica_and_ramp(self, spark):
        from mopper_spark.textops.timeseries import ewma_binary

        vals = [100, 200, 300, 400]
        rows = [(i, 1, datetime(2024, 1, 1, 0, i), v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, cents long"
        )
        out = {
            r.event_id: (r.ewma_num, r.ewma_den, r.ewma)
            for r in ewma_binary(
                df, "user_id", "ts", "cents", depth=4, order_tiebreak="event_id"
            ).collect()
        }
        # depth 4 → weights newest..oldest = 8,4,2,1
        def replica(i):
            num = den = 0
            for j in range(min(i + 1, 4)):
                w = 1 << (3 - j)
                num += vals[i - j] * w
                den += w
            return num, den, num / den
        for i in range(4):
            n, d, e = replica(i)
            assert out[i][0] == n and out[i][1] == d
            assert out[i][2] == e
        # the first row is its own level; a constant series is a fixpoint
        assert out[0][2] == 100.0

    def test_tiebreak_makes_peers_deterministic(self, spark):
        from mopper_spark.textops.timeseries import ewma_binary

        ts = datetime(2024, 1, 1, 0, 0)
        df = spark.createDataFrame(
            [(0, 1, ts, 10), (1, 1, ts, 90)],
            "event_id long, user_id long, ts timestamp_ntz, cents long",
        )
        a = sorted(map(tuple, ewma_binary(df, "user_id", "ts", "cents",
                                          depth=2, order_tiebreak="event_id").collect()))
        b = sorted(map(tuple, ewma_binary(df.repartition(5), "user_id", "ts", "cents",
                                          depth=2, order_tiebreak="event_id").collect()))
        assert a == b
        got = {r[0]: (r[-3], r[-2]) for r in a}
        assert got[0] == (20, 2)         # first by tiebreak: 10*2 / 2
        assert got[1] == (90 * 2 + 10, 3)  # second: 90*2 + 10*1


class TestAbTest:
    def test_funnel_direction_and_exposure_filter(self, spark):
        """A purchase BEFORE the first view is not a conversion; a user with
        purchases but no view is not in the experiment at all."""
        from mopper_spark.textops.sampling import ab_test_two_proportions

        t = lambda m: datetime(2024, 1, 1, 0, m)
        rows = [
            # user 1: view then purchase → converted
            (1, t(0), "view"), (1, t(5), "purchase"),
            # user 2: purchase then view, nothing after → NOT converted
            (2, t(0), "purchase"), (2, t(5), "view"),
            # user 3: purchase only → not exposed, excluded entirely
            (3, t(0), "purchase"),
            # user 4: view only → exposed, not converted
            (4, t(0), "view"),
        ]
        ev = spark.createDataFrame(rows, "user_id long, ts timestamp_ntz, event_type string")
        row = ab_test_two_proportions(
            ev, "user_id", "ts",
            exposure=F.col("event_type") == "view",
            conversion=F.col("event_type") == "purchase",
        ).collect()[0]
        assert row.n_a + row.n_b == 3          # user 3 excluded
        assert row.conv_a + row.conv_b == 1    # only user 1 converted

    def test_z_replica_matches(self, spark):
        """z statistic equals the python closed form computed from the same
        four integers."""
        import math

        from mopper_spark.textops.sampling import ab_test_two_proportions

        ev = spark.read.parquet("/root/testdata/sf0.01/events.parquet")
        row = ab_test_two_proportions(
            ev, "user_id", "ts",
            exposure=F.col("event_type") == "view",
            conversion=(F.col("event_type") == "purchase") & (F.col("value") >= 150),
        ).collect()[0]
        n_a, c_a, n_b, c_b = row.n_a, row.conv_a, row.n_b, row.conv_b
        assert n_a > 0 and n_b > 0
        p_a, p_b = c_a / n_a, c_b / n_b
        p = (c_a + c_b) / (n_a + n_b)
        se = math.sqrt(p * (1.0 - p) * (1.0 / n_a + 1.0 / n_b))
        assert row.z_fp == math.floor((p_a - p_b) / se * 1e6)
        assert row.rate_a == round(p_a, 6) and row.rate_b == round(p_b, 6)


class TestCusumChangepoint:
    def test_level_shift_found_at_boundary(self, spark):
        """A clean 10→100 level shift at position 5 of 10: |S_k| peaks at
        the last low observation (k=5), matching the python replica."""
        from mopper_spark.textops.timeseries import cusum_changepoint

        vals = [10] * 5 + [100] * 5
        rows = [(i, 1, datetime(2024, 1, 1, 0, i), v) for i, v in enumerate(vals)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, cents long"
        )
        out = cusum_changepoint(df, "user_id", "ts", "cents",
                                order_tiebreak="event_id").collect()
        assert len(out) == 1
        r = out[0]
        n, total = len(vals), sum(vals)
        best = max(
            ((abs(n * sum(vals[: k]) - k * total), k) for k in range(1, n + 1)),
            key=lambda t: (t[0], -t[1]),
        )
        assert (r.n, r.cp_k, r.s_abs) == (n, best[1], best[0])
        assert r.cp_k == 5 and r.cp_ts == datetime(2024, 1, 1, 0, 4)

    def test_constant_series_ties_to_first(self, spark):
        """No shift → every S_k = 0; the tie-break lands on k=1."""
        from mopper_spark.textops.timeseries import cusum_changepoint

        rows = [(i, 7, datetime(2024, 1, 1, 0, i), 50) for i in range(6)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, cents long"
        )
        r = cusum_changepoint(df, "user_id", "ts", "cents",
                              order_tiebreak="event_id").collect()[0]
        assert (r.cp_k, r.s_abs) == (1, 0)

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.timeseries import cusum_changepoint

        rows = [(i, i % 3, datetime(2024, 1, 1, 0, i), (i * 37) % 101)
                for i in range(60)]
        df = spark.createDataFrame(
            rows, "event_id long, user_id long, ts timestamp_ntz, cents long"
        )
        a = sorted(map(tuple, cusum_changepoint(df, "user_id", "ts", "cents",
                                                order_tiebreak="event_id").collect()))
        b = sorted(map(tuple, cusum_changepoint(df.repartition(13), "user_id", "ts",
                                                "cents", order_tiebreak="event_id").collect()))
        assert a == b


class TestRollingActiveUsers:
    def test_matches_bruteforce(self, spark):
        import datetime as dt
        from mopper_spark.textops.timeseries import rolling_active_users

        base = dt.datetime(2024, 1, 1)
        # user 1 active days 0,2,9; user 2 days 2,3; user 3 day 0 twice
        obs = [(1, 0), (1, 2), (1, 9), (2, 2), (2, 3), (3, 0), (3, 0)]
        rows = [(u, base + dt.timedelta(days=d, hours=u)) for u, d in obs]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            str(r.day): r.au
            for r in rolling_active_users(df, "user_id", "ts", window_days=3).collect()
        }
        active_days = sorted({d for _, d in obs})
        want = {}
        for d in active_days:
            users = {u for u, dd in obs if d - 2 <= dd <= d}
            want[str((base + dt.timedelta(days=d)).date())] = len(users)
        assert got == want
        assert got["2024-01-01"] == 2      # users 1,3 (3's dup day counts once)
        assert got["2024-01-03"] == 3      # window d1..d3: users 1,2,3
        assert got["2024-01-10"] == 1

    def test_window_one_is_plain_dau(self, spark):
        import datetime as dt
        from mopper_spark.textops.timeseries import rolling_active_users

        base = dt.datetime(2024, 3, 1)
        rows = [(u, base + dt.timedelta(days=d)) for u, d in [(1, 0), (2, 0), (1, 1)]]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {str(r.day): r.au for r in rolling_active_users(df, "user_id", "ts", window_days=1).collect()}
        assert got == {"2024-03-01": 2, "2024-03-02": 1}
        import pytest as _pt
        with _pt.raises(ValueError, match=">= 1"):
            rolling_active_users(df, "user_id", "ts", window_days=0)


class TestSaxSymbols:
    def _df(self, spark, rows):
        return spark.createDataFrame(rows, "k string, ts timestamp, v double")

    def test_quartile_letters(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        # 8 daily windows with strictly increasing means 1..8
        rows = [("k", base + dt.timedelta(days=i), float(i + 1)) for i in range(8)]
        from mopper_spark.textops.timeseries import sax_symbols

        (r,) = sax_symbols(
            self._df(spark, rows), "k", "ts", "v", window_seconds=86400
        ).collect()
        # n=8: cuts at ranks 2,4,6 -> means 2,4,6 (fp 200,400,600)
        # symbols: 1,2<=200->a a; 3,4->b b; 5,6->c c; 7,8->d d
        assert (r.k, r.n_windows, r.sax) == ("k", 8, "aabbccdd")

    def test_paa_mean_and_flat_series(self, spark):
        import datetime as dt

        base = dt.datetime(2024, 1, 1)
        from mopper_spark.textops.timeseries import sax_symbols

        # two points in the same window average; flat series = all 'a'
        rows = [
            ("k", base, 2.0), ("k", base + dt.timedelta(hours=1), 4.0),
            ("k", base + dt.timedelta(days=1), 3.0),
        ]
        (r,) = sax_symbols(
            self._df(spark, rows), "k", "ts", "v", window_seconds=86400
        ).collect()
        assert r.n_windows == 2 and r.sax == "aa"  # means equal -> cuts equal

    def test_partitioning_invariance_and_alphabet_validation(self, spark):
        import datetime as dt

        import pytest as _pt

        from mopper_spark.textops.timeseries import sax_symbols

        base = dt.datetime(2024, 1, 1)
        rows = [
            ("k", base + dt.timedelta(days=i), float((i * 13) % 7))
            for i in range(20)
        ]
        df = self._df(spark, rows)
        a = sax_symbols(df, "k", "ts", "v").collect()
        b = sax_symbols(df.repartition(9), "k", "ts", "v").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        with _pt.raises(ValueError):
            sax_symbols(df, "k", "ts", "v", alphabet=1)


class TestTheilSenSlope:
    def test_median_slope_resists_outlier(self, spark):
        from mopper_spark.textops.timeseries import theil_sen_slope

        # y = 2x except one wild outlier; Theil-Sen stays at slope 2
        rows = [("k", x, 2 * x) for x in range(1, 7)] + [("k", 7, 1000)]
        df = spark.createDataFrame(rows, "k string, x long, y long")
        (r,) = theil_sen_slope(df, "k", "x", "y").collect()
        assert (r.med_dy, r.med_dx) == (2, 1) or r.med_dy / r.med_dx == 2
        assert r.slope_fp == 2_000_000
        assert r.n_points == 7 and r.n_pairs == 21

    def test_gate_excludes_oversize_groups(self, spark):
        from mopper_spark.textops.timeseries import theil_sen_slope

        rows = [("big", x, x) for x in range(10)] + [("ok", 1, 1), ("ok", 2, 3)]
        df = spark.createDataFrame(rows, "k string, x long, y long")
        got = {r.k: r.slope_fp
               for r in theil_sen_slope(df, "k", "x", "y", max_points=5).collect()}
        assert got == {"ok": 2_000_000}

    def test_negative_slope_floor(self, spark):
        from mopper_spark.textops.timeseries import theil_sen_slope

        rows = [("k", 0, 10), ("k", 3, 3)]
        df = spark.createDataFrame(rows, "k string, x long, y long")
        (r,) = theil_sen_slope(df, "k", "x", "y").collect()
        # -7/3 -> floor(-2333333.33..) = -2333334
        assert (r.med_dy, r.med_dx, r.slope_fp) == (-7, 3, -2333334)


class TestPsiDrift:
    def test_terms_match_replica(self, spark):
        import datetime as dt
        import math

        from mopper_spark.textops.timeseries import psi_drift

        before = dt.datetime(2024, 1, 1)
        after = dt.datetime(2024, 2, 1)
        rows = (
            [("e", before, 1.5)] * 6 + [("e", before, 2.5)] * 4
            + [("e", after, 1.5)] * 2 + [("e", after, 2.5)] * 8
            + [("e", after, 9.0)] * 3  # band 9 only on side b: excluded
        )
        df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
        got = {r.band: (r.n_a, r.n_b, r.ln_ratio_fp)
               for r in psi_drift(df, "ts", "value", "2024-01-15").collect()}
        assert set(got) == {1, 2}
        na, nb = 6, 2
        ln = math.floor(1e6 * math.log((na * 10) / (nb * 10)))
        assert got[1] == (6, 2, ln)
        assert got[2][0:2] == (4, 8)

    def test_common_support_totals(self, spark):
        import datetime as dt

        from mopper_spark.textops.timeseries import psi_drift

        rows = [
            ("e", dt.datetime(2024, 1, 1), 1.0),
            ("e", dt.datetime(2024, 2, 1), 1.0),
            ("e", dt.datetime(2024, 2, 1), 5.0),  # exclusive: dropped
        ]
        df = spark.createDataFrame(rows, "k string, ts timestamp, value double")
        (r,) = psi_drift(df, "ts", "value", "2024-01-15").collect()
        # common support is band 1 alone: ratio (1*1)/(1*1) -> ln 0
        assert (r.band, r.n_a, r.n_b, r.ln_ratio_fp) == (1, 1, 1, 0)


class TestBenfordAudit:
    def test_digits_and_expected(self, spark):
        import datetime as dt
        import math

        from mopper_spark.textops.timeseries import benford_audit

        rows = [("t", float(v)) for v in [1.2, 15, 19, 0.5, 250, 27, 9.9]]
        df = spark.createDataFrame(rows, "g string, value double")
        got = {r.digit: (r.n, r.expected_fp)
               for r in benford_audit(df, "g", "value").collect()}
        # 0.5 excluded; digits: 1 (1.2? no -> floor(1.2)=1), 1(15), 1(19),
        # 2(250), 2(27), 9(9.9)
        assert got[1][0] == 3 and got[2][0] == 2 and got[9][0] == 1
        n_tot = 6
        assert got[2][1] == math.floor(1e6 * n_tot * math.log10(1 + 1 / 2))

    def test_negative_values_use_magnitude(self, spark):
        from mopper_spark.textops.timeseries import benford_audit

        df = spark.createDataFrame([("g", -42.0), ("g", 41.0)], "g string, value double")
        got = {r.digit: r.n for r in benford_audit(df, "g", "value").collect()}
        assert got == {4: 2}


class TestGapHistogram:
    def test_log2_buckets_exact(self, spark):
        import datetime as dt

        from mopper_spark.textops.timeseries import gap_histogram

        base = dt.datetime(2024, 1, 1)
        # gaps: 1us (bucket 0), 7us (bucket 2), 1s = 1e6us (bucket 19)
        ts = [base,
              base + dt.timedelta(microseconds=1),
              base + dt.timedelta(microseconds=8),
              base + dt.timedelta(microseconds=8, seconds=1)]
        df = spark.createDataFrame([("k", t) for t in ts], "k string, ts timestamp")
        got = {r.bucket: r.n for r in gap_histogram(df, "k", "ts").collect()}
        assert got == {0: 1, 2: 1, 19: 1}

    def test_zero_gap_and_entity_scope(self, spark):
        import datetime as dt

        from mopper_spark.textops.timeseries import gap_histogram

        base = dt.datetime(2024, 1, 1)
        rows = [("k", "u1", base), ("k", "u1", base),               # 0-gap
                ("k", "u2", base), ("k", "u2", base + dt.timedelta(seconds=2))]
        df = spark.createDataFrame(rows, "k string, u string, ts timestamp")
        got = {r.bucket: r.n
               for r in gap_histogram(df, "k", "ts", per_entity_col="u").collect()}
        assert got[-1] == 1          # same-microsecond pair
        assert got[20] == 1          # 2s = 2e6us -> floor(log2) = 20
