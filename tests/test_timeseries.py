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
