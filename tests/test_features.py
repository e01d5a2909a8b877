"""Tests for ML feature preparation (textops/features.py) and the
grouped MAD statistic (rankstats.grouped_mad)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.features import (
    feature_hashing,
    target_encoding_loo,
)
from mopper_spark.textops.rankstats import grouped_mad


class TestGroupedMad:
    def test_known_values(self, spark):
        # group a: values 1..5 -> median 3, deviations {2,1,0,1,2} -> MAD 1
        # group b: values {1, 1, 10} -> median 1, devs {0,0,9} -> MAD 0
        rows = [("a", float(v)) for v in [1, 2, 3, 4, 5]] + [
            ("b", 1.0), ("b", 1.0), ("b", 10.0)
        ]
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r.g: (r.n, r.median_fp, r.mad_fp)
               for r in grouped_mad(df, "g", "v", scale=1).collect()}
        assert got["a"] == (5, 3, 1)
        assert got["b"] == (3, 1, 0)

    def test_even_group_lower_median(self, spark):
        df = spark.createDataFrame(
            [("g", 1.0), ("g", 2.0), ("g", 3.0), ("g", 4.0)], "g string, v double"
        )
        (r,) = grouped_mad(df, "g", "v", scale=1).collect()
        # lower median of {1,2,3,4} is 2; devs {1,0,1,2} -> lower median 1
        assert (r.n, r.median_fp, r.mad_fp) == (4, 2, 1)

    def test_scale_and_partitioning_invariance(self, spark):
        rows = [("g", 0.015 * i) for i in range(101)]
        df = spark.createDataFrame(rows, "g string, v double")
        a = grouped_mad(df, "g", "v").collect()
        b = grouped_mad(df.repartition(13), "g", "v").collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        (r,) = a
        # floor(0.015*i*100) cents for i in 0..100: median 75, MAD 38
        # (float rounding makes some cells floor down — replica-checked)
        assert (r.median_fp, r.mad_fp) == (75, 38)


class TestTargetEncodingLoo:
    def _df(self, spark):
        rows = [
            (1, "web", 1), (2, "web", 1), (3, "web", 0),
            (4, "book", 0), (5, "book", 0),
            (6, "solo", 1),
        ]
        return spark.createDataFrame(rows, "id long, key string, y int")

    def test_loo_counts_exclude_self(self, spark):
        got = {r.id: (r.loo_pos, r.loo_n)
               for r in target_encoding_loo(
                   self._df(spark), "key", "y", "id").collect()}
        assert got[1] == (1, 2)   # web without row 1: one positive of two
        assert got[3] == (2, 2)
        assert got[4] == (0, 1)
        assert got[6] == (0, 0)   # singleton: no evidence left

    def test_encoding_formula_exact(self, spark):
        got = {r.id: r.enc_fp
               for r in target_encoding_loo(
                   self._df(spark), "key", "y", "id",
                   smoothing=2, scale=1000).collect()}
        # g_pos=3, g_n=6. row 1: (1000*(1*6 + 2*3)) div ((2+2)*6) = 12000 div 24
        assert got[1] == 500
        # row 6 singleton: (1000*(0 + 2*3)) div ((0+2)*6) = 6000 div 12 = global rate
        assert got[6] == 500
        # row 4: (1000*(0*6 + 2*3)) div ((1+2)*6) = 6000 div 18 = 333
        assert got[4] == 333

    def test_smoothing_validation(self, spark):
        with pytest.raises(ValueError):
            target_encoding_loo(self._df(spark), "key", "y", "id", smoothing=0)


class TestFeatureHashing:
    def test_counts_and_python_replica(self, spark):
        df = spark.createDataFrame(
            [(1, "apple banana apple"), (2, ""), (3, "apple")],
            "id long, text string",
        )
        got = {(r.id, r.bucket): r.n
               for r in feature_hashing(df, "id", "text", n_buckets=64).collect()}

        def bucket(tok):
            h = hashlib.md5(f"fh-v1:{tok}".encode()).hexdigest()
            return int(h[:8], 16) % 64

        assert got[(1, bucket("apple"))] == 2
        assert got[(1, bucket("banana"))] == 1
        assert got[(3, bucket("apple"))] == 1
        assert not any(k[0] == 2 for k in got)  # empty doc emits nothing

    def test_determinism_across_partitioning(self, spark):
        df = spark.createDataFrame(
            [(i, f"tok{i % 7} tok{i % 3}") for i in range(50)],
            "id long, text string",
        )
        a = sorted(map(tuple, feature_hashing(df, "id", "text").collect()))
        b = sorted(
            map(tuple, feature_hashing(df.repartition(11), "id", "text").collect())
        )
        assert a == b and len(a) > 0

    def test_bucket_validation(self, spark):
        df = spark.createDataFrame([(1, "x")], "id long, text string")
        with pytest.raises(ValueError):
            feature_hashing(df, "id", "text", n_buckets=1)


class TestRobustOutliers:
    def test_mad_rule_and_degenerate_fallback(self, spark):
        from mopper_spark.textops.rankstats import robust_outliers

        rows = ([("a", float(v)) for v in [1, 2, 3, 4, 5, 100]]
                + [("b", 7.0)] * 5 + [("b", 9.0)])
        df = spark.createDataFrame(rows, "g string, v double")
        got = {r.g: (r.median_fp, r.mad_fp, r.n_outliers)
               for r in robust_outliers(df, "g", "v", scale=1).collect()}
        # a: median 3, MAD 1 (lower-median of {2,1,0,1,2,97}); only 100 is
        # beyond 3*MAD
        assert got["a"] == (3, 1, 1)
        # b: median 7, MAD 0 -> fallback: x != median
        assert got["b"] == (7, 0, 1)
