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
