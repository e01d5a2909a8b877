"""Generic per-column table profiling (textops/profile.py)."""

import pytest


class TestTableProfile:
    def _df(self, spark):
        from datetime import datetime as dt

        rows = [
            (1, "alpha", 1.5, dt(2024, 1, 1)),
            (2, "bb", 2.5, dt(2024, 1, 3)),
            (2, None, None, dt(2024, 1, 2)),
        ]
        return spark.createDataFrame(
            rows, "id long, name string, score double, ts timestamp_ntz"
        )

    def test_profile_values(self, spark):
        from mopper_spark.textops.profile import table_profile

        got = {
            (r.column, r.metric): r.value_str
            for r in table_profile(self._df(spark)).collect()
        }
        assert got[("id", "n_null")] == "0"
        assert got[("id", "n_distinct")] == "2"
        assert got[("id", "min")] == "1" and got[("id", "max")] == "2"
        assert got[("name", "n_null")] == "1"
        assert got[("name", "n_distinct")] == "2"
        assert got[("name", "min")] == "alpha" and got[("name", "max")] == "bb"
        assert got[("name", "len_min")] == "2" and got[("name", "len_max")] == "5"
        assert got[("name", "len_sum")] == "7"
        # doubles: counts only — no rendered floats, ever
        assert got[("score", "n_distinct")] == "2"
        assert ("score", "min") not in got
        # NTZ timestamps render as epoch micros
        assert got[("ts", "min")] == "1704067200000000"
        assert got[("ts", "max")] == str(1704067200000000 + 2 * 86400 * 10**6)

    def test_column_subset_and_validation(self, spark):
        from mopper_spark.textops.profile import table_profile

        df = self._df(spark)
        out = table_profile(df, ["id"]).collect()
        assert {r.column for r in out} == {"id"}
        with pytest.raises(ValueError):
            table_profile(df, ["nope"])

    def test_single_job_partitioning_invariance(self, spark):
        import re

        from mopper_spark.textops.profile import table_profile

        df = self._df(spark)
        a = sorted(map(tuple, table_profile(df).collect()))
        b = sorted(map(tuple, table_profile(df.repartition(7)).collect()))
        assert a == b
        plan = table_profile(df)._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
        # multi-distinct via one Expand, never one scan per column
        assert len(re.findall(r"\(\d+\) Scan", plan)) <= 1
