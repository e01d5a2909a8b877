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
