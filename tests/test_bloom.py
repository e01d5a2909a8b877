"""Bloom-filter runtime semi-join pre-filtering (textops/bloom.py)."""

import pytest
from pyspark.sql import functions as F


class TestBloomSemiJoin:
    def _sides(self, spark):
        big = spark.createDataFrame(
            [(i, f"row{i}") for i in range(2000)], "key long, payload string"
        )
        small = spark.createDataFrame(
            [(i * 7,) for i in range(50)], "key long"
        )
        return big, small

    def test_exact_vs_plain_semi_join(self, spark):
        from mopper_spark.textops.bloom import bloom_semi_join

        big, small = self._sides(spark)
        got = sorted(
            map(tuple, bloom_semi_join(big, small, "key", m_bits=4096).collect())
        )
        want = sorted(
            map(
                tuple,
                big.join(small.select("key").distinct(), "key", "left_semi").collect(),
            )
        )
        assert got == want and len(got) == 50  # 0,7,...,343 all < 2000? 49*7=343 yes

    def test_exact_even_at_brutal_fp_rate(self, spark):
        """m_bits=64, k=1 — the filter is nearly useless (almost every
        probe passes) but the output must STILL be exact: FPs are killed
        by the confirming semi-join."""
        from mopper_spark.textops.bloom import bloom_semi_join

        big, small = self._sides(spark)
        got = sorted(
            (r.key for r in bloom_semi_join(big, small, "key", m_bits=64, k=1).collect())
        )
        assert got == sorted(i * 7 for i in range(50))

    def test_prefilter_actually_filters(self, spark):
        """At 10+ bits/key the bitmap alone removes the vast majority of
        the 1950 non-matching probe rows before the join."""
        from mopper_spark.textops.bloom import bloom_build, bloom_prefilter

        big, small = self._sides(spark)
        bf = bloom_build(small, "key", m_bits=4096, k=5)
        survivors = bloom_prefilter(big, bf, "key", m_bits=4096, k=5).count()
        assert survivors >= 50          # no false negatives, ever
        assert survivors <= 50 + 200    # FP rate far below 10%

    def test_validation(self, spark):
        from mopper_spark.textops.bloom import bloom_build

        _, small = self._sides(spark)
        with pytest.raises(ValueError):
            bloom_build(small, "key", m_bits=32)
        with pytest.raises(ValueError):
            bloom_build(small, "key", m_bits=128, k=0)

    def test_no_python_and_single_row_broadcast(self, spark):
        from mopper_spark.textops.bloom import bloom_semi_join

        big, small = self._sides(spark)
        plan = bloom_semi_join(big, small, "key")._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
        assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan
