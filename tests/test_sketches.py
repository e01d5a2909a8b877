"""Two-pass Misra-Gries heavy hitters (textops/sketches.py)."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.sketches import heavy_hitters


def _exact_hh(rows, k):
    from collections import Counter

    c = Counter(rows)
    n = len(rows)
    return {(v, f) for v, f in c.items() if f * (k + 1) > n}


def _df(spark, rows, parts=8):
    return spark.createDataFrame(
        [(r,) for r in rows], "v string"
    ).repartition(parts)


def test_matches_exact_definition(spark):
    # zipf-ish: value i appears 200//i times
    rows = [f"w{i}" for i in range(1, 40) for _ in range(200 // i)]
    got = {(r.value, r.freq) for r in heavy_hitters(_df(spark, rows), "v", k=8).collect()}
    assert got == _exact_hh(rows, 8)
    assert got  # non-trivial fixture


def test_recall_guarantee_total_under_any_partitioning(spark):
    rows = ["hot"] * 300 + [f"cold{i}" for i in range(900)]
    for parts in (1, 4, 32):
        got = {
            (r.value, r.freq)
            for r in heavy_hitters(_df(spark, rows, parts), "v", k=10).collect()
        }
        assert got == _exact_hh(rows, 10) == {("hot", 300)}


def test_nulls_ignored(spark):
    df = spark.createDataFrame([("a",), (None,), ("a",), (None,)], "v string")
    got = {(r.value, r.freq) for r in heavy_hitters(df, "v", k=3).collect()}
    assert got == {("a", 2)}  # n counts non-null only


def test_k_zero_refused(spark):
    with pytest.raises(ValueError, match="k must be"):
        heavy_hitters(_df(spark, ["a"]), "v", k=0)


class TestHllDistinct:
    def test_matches_python_replica_and_within_error(self, spark):
        """Registers, exact-integer denominator, and the double estimate
        replicate bit-for-bit; estimate lands within the ~3/sqrt(m)
        envelope of the true count."""
        import hashlib
        import math

        from mopper_spark.textops.sketches import hll_distinct

        df = spark.range(5000).selectExpr("concat('v', id % 3000) AS v")
        row = hll_distinct(df, "v").collect()[0]

        M = {}
        for i in range(3000):
            h = hashlib.md5(f"v{i}".encode()).hexdigest()
            b, w = int(h[:3], 16), int(h[3:15], 16)
            rho = 49 if w == 0 else 49 - len(bin(w)[2:])
            M[b] = max(M.get(b, 0), rho)
        v0 = 4096 - len(M)
        s = sum(1 << (50 - mj) for mj in M.values()) + v0 * (1 << 50)
        alpha = 0.7213 / (1.0 + 1.079 / 4096.0)
        est = alpha * 4096.0 * 4096.0 * 1125899906842624.0 / s
        if est <= 2.5 * 4096.0 and v0 > 0:
            est = 4096.0 * math.log(4096.0 / v0)
        assert (row.m, row.v_zero, row.s_fp, row.n_exact) == (4096, v0, s, 3000)
        assert row.estimate == est
        assert abs(row.rel_err) < 3.0 / math.sqrt(4096.0)

    def test_partitioning_invariance(self, spark):
        """Max-register aggregation is associative — the one-row summary
        (including the doubles) is identical under any partitioning."""
        from mopper_spark.textops.sketches import hll_distinct

        df = spark.range(2000).selectExpr("concat('k', id % 700) AS v")
        a = tuple(hll_distinct(df, "v").collect()[0])
        b = tuple(hll_distinct(df.repartition(13), "v").collect()[0])
        assert a == b

    def test_nulls_ignored(self, spark):
        from mopper_spark.textops.sketches import hll_distinct

        df = spark.range(100).selectExpr(
            "CASE WHEN id % 2 = 0 THEN concat('x', id) END AS v"
        )
        row = hll_distinct(df, "v").collect()[0]
        assert row.n_exact == 50


class TestCountMin:
    """sketches.cms_registers / cms_lookup — Count-Min sketch."""

    def _vals(self, spark, n=400, keys=40):
        return spark.createDataFrame(
            [(f"k{i % keys}",) for i in range(n)], "tok string"
        )

    def test_one_sided_guarantee_and_near_exactness(self, spark):
        from mopper_spark.textops.sketches import cms_lookup, cms_registers

        df = self._vals(spark)
        true = {r.tok: r.c for r in df.groupBy("tok").count()
                .withColumnRenamed("count", "c").collect()}
        # tight sketch: collisions in ALL 4 rows are ~impossible at 2^16
        regs = cms_registers(df, "tok", width=1 << 16, depth=4)
        est = {r.key: r.cms_count for r in
               cms_lookup(regs, df, "tok", width=1 << 16, depth=4).collect()}
        assert est == true
        # brutally small sketch: estimates may inflate but NEVER deflate
        regs2 = cms_registers(df, "tok", width=8, depth=2)
        est2 = {r.key: r.cms_count for r in
                cms_lookup(regs2, df, "tok", width=8, depth=2).collect()}
        assert all(est2[k] >= true[k] for k in true)

    def test_mergeable_registers(self, spark):
        from mopper_spark.textops.sketches import cms_registers

        a, b = self._vals(spark, 200), self._vals(spark, 300)
        whole = {(r.j, r.bucket): r.c for r in
                 cms_registers(a.union(b), "tok", width=64, depth=3).collect()}
        pa = {(r.j, r.bucket): r.c for r in
              cms_registers(a, "tok", width=64, depth=3).collect()}
        pb = {(r.j, r.bucket): r.c for r in
              cms_registers(b, "tok", width=64, depth=3).collect()}
        merged = {k: pa.get(k, 0) + pb.get(k, 0) for k in set(pa) | set(pb)}
        assert whole == merged

    def test_weighted_and_absent_key(self, spark):
        import pytest

        from mopper_spark.textops.sketches import cms_lookup, cms_registers

        df = spark.createDataFrame(
            [("a", 5), ("a", 7), ("b", 1)], "tok string, w long"
        )
        regs = cms_registers(df, "tok", width=1 << 12, depth=4, weight_col="w")
        probes = spark.createDataFrame([("a",), ("b",), ("zz",)], "tok string")
        est = {r.key: r.cms_count for r in
               cms_lookup(regs, probes, "tok", width=1 << 12, depth=4).collect()}
        assert est["a"] == 12 and est["b"] == 1 and est["zz"] == 0
        with pytest.raises(ValueError):
            cms_registers(df, "tok", width=1)


class TestHLLSetAlgebra:
    """sketches.hll_set_algebra — union/intersection from registers."""

    def _vals(self, spark):
        rows = (
            [("a", f"shared{i}") for i in range(300)]
            + [("a", f"only_a{i}") for i in range(200)]
            + [("b", f"shared{i}") for i in range(300)]
            + [("b", f"only_b{i}") for i in range(100)]
            + [("c", f"c{i}") for i in range(150)]
        )
        return spark.createDataFrame(rows, "g string, v string")

    def test_inclusion_exclusion_estimates(self, spark):
        from mopper_spark.textops.sketches import hll_set_algebra

        out = {(r.group_a, r.group_b): r
               for r in hll_set_algebra(self._vals(spark), "g", "v").collect()}
        assert set(out) == {("a", "b"), ("a", "c"), ("b", "c")}
        ab = out[("a", "b")]
        # linear-counting regime: estimates within a few % of truth
        assert abs(ab.est_a - 500) < 25 and abs(ab.est_b - 400) < 20
        assert abs(ab.est_union - 600) < 30
        assert abs(ab.est_intersection - 300) < 50
        ac = out[("a", "c")]   # disjoint: union ~ sum, intersection ~ 0
        assert abs(ac.est_union - 650) < 35
        assert ac.est_intersection < 35

    def test_per_group_estimate_matches_hll_summary(self, spark):
        from mopper_spark.textops.sketches import (
            hll_registers,
            hll_set_algebra,
            hll_summary,
        )

        df = self._vals(spark)
        out = hll_set_algebra(df, "g", "v").collect()
        est_a = [r.est_a for r in out if r.group_a == "a"][0]
        solo = hll_summary(
            hll_registers(df.filter("g = 'a'"), "v")
        ).collect()[0].estimate
        assert est_a == solo

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.sketches import hll_set_algebra

        df = self._vals(spark)
        a = sorted(map(tuple, hll_set_algebra(df, "g", "v").collect()))
        b = sorted(map(tuple, hll_set_algebra(df.repartition(13), "g", "v").collect()))
        assert a == b


class TestHllRollingDistinct:
    def test_merge_equals_rebuild_and_window_one(self, spark):
        import datetime as dt
        from mopper_spark.textops.sketches import hll_registers, hll_rolling_distinct

        base = dt.datetime(2024, 2, 1)
        rows = [
            (u, base + dt.timedelta(days=d))
            for u, d in [(1, 0), (2, 0), (3, 1), (1, 1), (4, 3), (1, 3)]
        ]
        df = spark.createDataFrame(rows, "user_id long, ts timestamp")
        got = {
            str(r.day): (r.v_zero, r.s_fp)
            for r in hll_rolling_distinct(df, "user_id", "ts", window_days=2).collect()
        }
        assert set(got) == {"2024-02-01", "2024-02-02", "2024-02-04"}
        # window state == sketch rebuilt from the window's raw values
        for day, lo, hi in [("2024-02-01", 0, 0), ("2024-02-02", 0, 1), ("2024-02-04", 3, 3)]:
            vals = [
                (u,) for u, d in [(1, 0), (2, 0), (3, 1), (1, 1), (4, 3), (1, 3)]
                if lo <= d <= hi
            ]
            regs = hll_registers(
                spark.createDataFrame(vals, "user_id long"), "user_id"
            ).collect()
            n_present = len(regs)
            s_fp = sum(1 << (50 - r.mj) for r in regs) + (4096 - n_present) * (1 << 50)
            assert got[day] == (4096 - n_present, s_fp), day

    def test_validation(self, spark):
        import datetime as dt
        import pytest as _pt
        from mopper_spark.textops.sketches import hll_rolling_distinct

        df = spark.createDataFrame(
            [(1, dt.datetime(2024, 1, 1))], "user_id long, ts timestamp"
        )
        with _pt.raises(ValueError, match=">= 1"):
            hll_rolling_distinct(df, "user_id", "ts", window_days=0)
