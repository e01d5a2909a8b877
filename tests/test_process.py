"""Tests for process-mining primitives (textops/process.py)."""

import datetime as dt

import pytest

from mopper_spark.textops.process import (
    conformance_violations,
    directly_follows,
)

BASE = dt.datetime(2024, 1, 1)


def _log(spark, rows):
    return spark.createDataFrame(
        rows, "case string, act string, ts timestamp, eid long"
    )


class TestDirectlyFollows:
    def test_edges_and_durations(self, spark):
        rows = [
            ("c1", "view", BASE, 1),
            ("c1", "cart", BASE + dt.timedelta(seconds=5), 2),
            ("c1", "buy", BASE + dt.timedelta(seconds=9), 3),
            ("c2", "view", BASE, 4),
            ("c2", "cart", BASE + dt.timedelta(seconds=2), 5),
        ]
        got = {(r.prev_act, r.next_act): (r.n, r.total_gap_us, r.max_gap_us)
               for r in directly_follows(
                   _log(spark, rows), "case", "act", "ts", "eid").collect()}
        assert got[("view", "cart")] == (2, 7_000_000, 5_000_000)
        assert got[("cart", "buy")] == (1, 4_000_000, 4_000_000)
        assert got[("_START_", "view")] == (2, 0, 0)
        assert got[("buy", "_END_")] == (1, 0, 0)
        assert got[("cart", "_END_")] == (1, 0, 0)
        # case counts reconcile on the START edges
        assert sum(v[0] for k, v in got.items() if k[0] == "_START_") == 2

    def test_same_timestamp_tiebreak(self, spark):
        rows = [("c", "b", BASE, 2), ("c", "a", BASE, 1)]
        got = {(r.prev_act, r.next_act): r.n
               for r in directly_follows(
                   _log(spark, rows), "case", "act", "ts", "eid").collect()}
        # eid pins a before b
        assert got[("a", "b")] == 1 and ("b", "a") not in got


class TestConformance:
    MODEL = [
        ("_START_", "view"), ("view", "cart"), ("cart", "buy"),
        ("buy", "_END_"), ("cart", "_END_"),
    ]

    def test_conformant_and_violating_cases(self, spark):
        rows = [
            ("ok", "view", BASE, 1),
            ("ok", "cart", BASE + dt.timedelta(seconds=1), 2),
            ("ok", "buy", BASE + dt.timedelta(seconds=2), 3),
            ("bad", "cart", BASE, 4),                     # _START_>cart illegal
            ("bad", "view", BASE + dt.timedelta(seconds=1), 5),  # cart>view illegal
        ]
        got = {r.case: (r.n_steps, r.n_violations, r.first_violation)
               for r in conformance_violations(
                   _log(spark, rows), "case", "act", "ts", "eid",
                   self.MODEL).collect()}
        assert got["ok"] == (4, 0, "")
        # bad: edges _START_>cart, cart>view, view>_END_ — all 3 illegal
        assert got["bad"][1] == 3
        assert got["bad"][2] == "_START_>cart"

    def test_empty_model_raises(self, spark):
        with pytest.raises(ValueError):
            conformance_violations(
                _log(spark, [("c", "a", BASE, 1)]), "case", "act", "ts",
                "eid", [])

    def test_partitioning_invariance(self, spark):
        rows = [(f"c{i % 5}", ["view", "cart", "buy"][i % 3],
                 BASE + dt.timedelta(seconds=i), i) for i in range(60)]
        df = _log(spark, rows)
        a = sorted(map(tuple, conformance_violations(
            df, "case", "act", "ts", "eid", self.MODEL).collect()))
        b = sorted(map(tuple, conformance_violations(
            df.repartition(11), "case", "act", "ts", "eid",
            self.MODEL).collect()))
        assert a == b
