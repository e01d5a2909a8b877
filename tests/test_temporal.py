"""Entity activity intervals (pipeline/temporal.py) vs a python
gaps-and-islands replica, with the boundary semantics pinned."""

from datetime import datetime, timezone

import pytest

from mopper_spark.pipeline.temporal import entity_activity_intervals


def _ts(s):
    return datetime.fromtimestamp(s, tz=timezone.utc)


def _replica(rows, gap_s):
    """rows: (conv, entity, epoch_s) -> set of interval tuples."""
    from collections import defaultdict

    by_key = defaultdict(list)
    for c, e, s in rows:
        by_key[(c, e)].append(s)
    out = set()
    for (c, e), times in by_key.items():
        times.sort()
        start, last, n = times[0], times[0], 1
        for t in times[1:]:
            if t - last > gap_s:
                out.add((c, e, start * 10**6, last * 10**6, n))
                start, n = t, 0
            last = t
            n += 1
        out.add((c, e, start * 10**6, last * 10**6, n))
    return out


def _run(spark, rows, gap_s):
    df = spark.createDataFrame(
        [(c, e, _ts(s)) for c, e, s in rows],
        "conv_id string, surface string, ts timestamp",
    )
    got = {
        (r.conv_id, r.entity, r.valid_from_us, r.valid_to_us, r.n_mentions)
        for r in entity_activity_intervals(df, max_gap_s=gap_s).collect()
    }
    assert got == _replica(rows, gap_s)
    return got


def test_islands_split_on_gap(spark):
    rows = [
        ("c1", "alice", 0),
        ("c1", "alice", 50),
        ("c1", "alice", 200),  # gap 150 > 100 -> new interval
        ("c1", "bob", 10),
        ("c2", "alice", 0),
    ]
    got = _run(spark, rows, gap_s=100)
    assert ("c1", "alice", 0, 50_000_000, 2) in got
    assert ("c1", "alice", 200_000_000, 200_000_000, 1) in got


def test_exact_gap_still_chains(spark):
    """A gap of exactly max_gap_s chains (strict > splits)."""
    rows = [("c", "e", 0), ("c", "e", 100), ("c", "e", 201)]
    got = _run(spark, rows, gap_s=100)
    # 0->100 chains (gap == 100); 100->201 splits (gap 101 > 100)
    assert ("c", "e", 0, 100_000_000, 2) in got
    assert len(got) == 2


def test_duplicate_instants_count_individually(spark):
    rows = [("c", "e", 5), ("c", "e", 5), ("c", "e", 5)]
    got = _run(spark, rows, gap_s=10)
    assert got == {("c", "e", 5_000_000, 5_000_000, 3)}


def test_partitioning_invariance(spark):
    rows = [
        (f"c{i % 3}", f"e{i % 5}", i * 37 % 1000) for i in range(60)
    ]
    df = spark.createDataFrame(
        [(c, e, _ts(s)) for c, e, s in rows],
        "conv_id string, surface string, ts timestamp",
    )
    a = {
        tuple(r)
        for r in entity_activity_intervals(
            df.repartition(1), max_gap_s=50
        ).collect()
    }
    b = {
        tuple(r)
        for r in entity_activity_intervals(
            df.repartition(16), max_gap_s=50
        ).collect()
    }
    assert a == b == _replica(rows, 50)


def test_negative_gap_refused(spark):
    df = spark.createDataFrame(
        [("c", "e", _ts(0))], "conv_id string, surface string, ts timestamp"
    )
    with pytest.raises(ValueError, match="max_gap_s"):
        entity_activity_intervals(df, max_gap_s=-1)
