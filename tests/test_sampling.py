"""Deterministic per-group sampling (textops/sampling.py)."""

import pytest
from pyspark.sql import functions as F

class TestSamplePerGroup:
    """sampling.sample_per_group — deterministic bottom-k-of-hash."""

    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(f"s{i % 4}", f"doc{i}") for i in range(n)],
            "source string, doc_id string",
        )

    def test_k_per_group_and_determinism(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        df = self._docs(spark)
        out = sample_per_group(df, ["source"], F.col("doc_id"), k=5)
        rows = out.collect()
        from collections import Counter

        per = Counter(r.source for r in rows)
        assert set(per.values()) == {5}
        again = {
            tuple(r)
            for r in sample_per_group(
                df.repartition(16), ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        assert again == {tuple(r) for r in rows}

    def test_growth_stability(self, spark):
        """Adding corpus never swaps a kept row for a hash-LARGER one:
        the kept set of the grown corpus restricted to old rows is a
        prefix-superset relation — every survivor from the grown run
        that existed before was also kept before."""
        from mopper_spark.textops.sampling import sample_per_group

        small, big = self._docs(spark, 40), self._docs(spark, 80)
        keep_small = {
            r.doc_id
            for r in sample_per_group(
                small, ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        keep_big = {
            r.doc_id
            for r in sample_per_group(
                big, ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        old_ids = {f"doc{i}" for i in range(40)}
        assert keep_big & old_ids <= keep_small

    def test_small_group_kept_whole(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        df = spark.createDataFrame(
            [("a", "x"), ("a", "y")], "source string, doc_id string"
        )
        assert sample_per_group(df, ["source"], F.col("doc_id"), k=5).count() == 2

    def test_k_zero_refused(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        with pytest.raises(ValueError, match="k must be"):
            sample_per_group(self._docs(spark), ["source"], F.col("doc_id"), k=0)
