"""textops/ivm.py — incremental view maintenance.

The invariant under test everywhere: ``ivm_update(base, changelog, detail)``
== ``agg_snapshot(detail ⊎ changelog)`` — the incremental path must be
indistinguishable from the full recompute, including on the max-dirty
corner cases that self-maintainability cannot cover.
"""
import pytest

from pyspark.sql import functions as F

from mopper_spark.textops.ivm import agg_snapshot, ivm_update

KEYS = ["k"]


def _df(spark, rows):
    return spark.createDataFrame(rows, "k string, value_fp long")


def _chg(spark, rows):
    return spark.createDataFrame(rows, "k string, value_fp long, op int")


def _apply(spark, detail_rows, chg_rows):
    detail = _df(spark, detail_rows)
    base = agg_snapshot(detail, KEYS, "value_fp")
    chg = _chg(spark, chg_rows)
    got = {
        r["k"]: (r["cnt"], r["total"], r["mx"])
        for r in ivm_update(base, chg, detail, KEYS).collect()
    }
    return got


class TestIvmMaxCorners:
    def test_retract_max_with_multiplicity_keeps_it(self, spark):
        got = _apply(
            spark, [("a", 9), ("a", 9), ("a", 1)], [("a", 9, -1)]
        )
        assert got["a"] == (2, 10, 9)

    def test_retract_unique_max_falls_to_second(self, spark):
        got = _apply(spark, [("a", 9), ("a", 7), ("a", 1)], [("a", 9, -1)])
        assert got["a"] == (2, 8, 7)

    def test_retract_max_but_insert_recovers_it(self, spark):
        got = _apply(spark, [("a", 9), ("a", 1)], [("a", 9, -1), ("a", 9, 1)])
        assert got["a"] == (2, 10, 9)

    def test_retract_max_and_insert_higher(self, spark):
        got = _apply(spark, [("a", 9), ("a", 1)], [("a", 9, -1), ("a", 12, 1)])
        assert got["a"] == (2, 13, 12)

    def test_key_vanishes_when_all_retracted(self, spark):
        got = _apply(spark, [("a", 5), ("b", 3)], [("a", 5, -1)])
        assert "a" not in got and got["b"] == (1, 3, 3)

    def test_new_key_from_inserts_only(self, spark):
        got = _apply(spark, [("a", 5)], [("z", 4, 1), ("z", 6, 1)])
        assert got["z"] == (2, 10, 6)

    def test_untouched_key_passes_through(self, spark):
        got = _apply(spark, [("a", 5), ("b", 3)], [("a", 2, 1)])
        assert got["b"] == (1, 3, 3) and got["a"] == (2, 7, 5)


class TestIvmEqualsFullRecompute:
    def _detail_rows(self):
        return [
            (f"k{i % 7}", (i * 13) % 50) for i in range(200)
        ]

    def _chg_rows(self):
        rows = [(f"k{i % 7}", (i * 13) % 50, -1) for i in range(0, 200, 5)]
        rows += [(f"k{i % 5}", (i * 29) % 60, 1) for i in range(40)]
        return rows

    def test_matches_snapshot_of_effective_multiset(self, spark):
        detail = _df(spark, self._detail_rows())
        base = agg_snapshot(detail, KEYS, "value_fp")
        chg = _chg(spark, self._chg_rows())
        got = sorted(
            map(tuple, ivm_update(base, chg, detail, KEYS).collect())
        )
        # effective multiset: detail minus retracted rows plus inserts
        retracted = {}
        for k, v, op in self._chg_rows():
            if op < 0:
                retracted[(k, v)] = retracted.get((k, v), 0) + 1
        eff = []
        for k, v in self._detail_rows():
            if retracted.get((k, v), 0) > 0:
                retracted[(k, v)] -= 1
            else:
                eff.append((k, v))
        eff += [(k, v) for k, v, op in self._chg_rows() if op > 0]
        want = sorted(
            map(tuple, agg_snapshot(_df(spark, eff), KEYS, "value_fp").collect())
        )
        assert got == want

    def test_partitioning_invariance(self, spark):
        detail = _df(spark, self._detail_rows())
        base = agg_snapshot(detail, KEYS, "value_fp")
        chg = _chg(spark, self._chg_rows())
        a = sorted(map(tuple, ivm_update(base, chg, detail, KEYS).collect()))
        b = sorted(
            map(
                tuple,
                ivm_update(
                    base.repartition(5), chg.repartition(3), detail.repartition(7), KEYS
                ).collect(),
            )
        )
        assert a == b


class TestIvmPlanShape:
    def test_no_per_row_python(self, spark):
        import contextlib
        import io

        detail = _df(spark, [("a", 1), ("a", 9), ("b", 2)])
        base = agg_snapshot(detail, KEYS, "value_fp")
        chg = _chg(spark, [("a", 9, -1)])
        out = ivm_update(base, chg, detail, KEYS)
        buf = io.StringIO()
        with contextlib.redirect_stdout(buf):
            out.explain("formatted")
        assert "BatchEvalPython" not in buf.getvalue()
