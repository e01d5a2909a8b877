

class TestWinsorizedStats:
    def test_matches_python_replica(self, spark):
        import math
        from mopper_spark.textops.analysis import winsorized_stats

        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = winsorized_stats(df, "v", lo_q=0.2, hi_q=0.8).collect()[0]
        xs = sorted(vals)
        lo = xs[math.ceil(0.2 * len(xs)) - 1]
        hi = xs[math.ceil(0.8 * len(xs)) - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        assert tuple(got) == (
            len(vals), lo, hi, sum(clamped), sum(c * c for c in clamped)
        )
        assert got.hi == 8 and got.wsum < sum(vals)  # the 1000 is clamped

    def test_empty_and_validation(self, spark):
        import pytest as _pt
        from mopper_spark.textops.analysis import winsorized_stats

        empty = spark.createDataFrame([], "v long")
        row = winsorized_stats(empty, "v").collect()[0]
        assert row.n == 0 and row.wsum is None
        with _pt.raises(ValueError, match="lo_q"):
            winsorized_stats(empty, "v", lo_q=0.9, hi_q=0.1)
