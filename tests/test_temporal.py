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


def _cooc_replica(intervals):
    """Quadratic python replica: intervals = (conv, entity, lo, hi) rows."""
    out = {}
    for i, (c1, e1, lo1, hi1) in enumerate(intervals):
        for c2, e2, lo2, hi2 in intervals[i + 1 :]:
            if c1 != c2:
                continue
            a, b = ((e1, lo1, hi1), (e2, lo2, hi2))
            if a[0] == b[0]:
                continue
            if a[0] > b[0]:
                a, b = b, a
            ov = min(a[2], b[2]) - max(a[1], b[1])
            if ov < 0:
                continue
            k = (c1, a[0], b[0])
            tot, n = out.get(k, (0, 0))
            out[k] = (tot + ov, n + 1)
    return {(k[0], k[1], k[2], v[0], v[1]) for k, v in out.items()}


_COOC_INTERVALS = [
    # c1: alice [0,100], bob [50,150] -> overlap 50; carol [200,210] disjoint
    ("c1", "alice", 0, 100_000_000),
    ("c1", "bob", 50_000_000, 150_000_000),
    ("c1", "carol", 200_000_000, 210_000_000),
    # c1: alice second interval touches bob at exactly 150 -> overlap 0
    ("c1", "alice", 150_000_000, 180_000_000),
    # c2: long pair spanning many 10s buckets -> must count once
    ("c2", "alice", 0, 95_000_000),
    ("c2", "bob", 5_000_000, 90_000_000),
]


def test_interval_cooccurrence_matches_replica(spark):
    from mopper_spark.pipeline.temporal import interval_cooccurrence

    df = spark.createDataFrame(
        [(c, e, lo, hi, 1) for c, e, lo, hi in _COOC_INTERVALS],
        "conv_id string, entity string, valid_from_us long, "
        "valid_to_us long, n_mentions long",
    )
    got = {
        (r.conv_id, r.e1, r.e2, r.total_overlap_us, r.n_overlaps)
        for r in interval_cooccurrence(df, bucket_us=10_000_000).collect()
    }
    want = _cooc_replica(_COOC_INTERVALS)
    assert got == want
    assert ("c1", "alice", "bob", 50_000_000 + 0, 2) in got
    assert not any(r[1] == "carol" or r[2] == "carol" for r in got)


def test_cooccurrence_bucket_width_invariance(spark):
    """The once-per-pair anchor trick must make the result independent of
    bucket_us — pairs spanning many buckets still count exactly once."""
    from mopper_spark.pipeline.temporal import interval_cooccurrence

    rows = [
        (f"c{i % 2}", f"e{i % 7}", i * 13_000_000, i * 13_000_000 + 40_000_000)
        for i in range(40)
    ]
    df = spark.createDataFrame(
        [(c, e, lo, hi, 1) for c, e, lo, hi in rows],
        "conv_id string, entity string, valid_from_us long, "
        "valid_to_us long, n_mentions long",
    )
    outs = []
    for b in (1_000_000, 7_000_000, 3_600_000_000):
        outs.append(
            {
                tuple(r)
                for r in interval_cooccurrence(df, bucket_us=b).collect()
            }
        )
    assert outs[0] == outs[1] == outs[2] == _cooc_replica(rows)


def test_entities_active_at(spark):
    from mopper_spark.pipeline.temporal import entities_active_at

    df = spark.createDataFrame(
        [(c, e, lo, hi, 1) for c, e, lo, hi in _COOC_INTERVALS],
        "conv_id string, entity string, valid_from_us long, "
        "valid_to_us long, n_mentions long",
    )
    at = 150_000_000  # inclusive on both ends: bob's hi and alice2's lo
    got = {(r.conv_id, r.entity) for r in entities_active_at(df, at).collect()}
    assert got == {("c1", "bob"), ("c1", "alice")}


def test_negative_gap_refused(spark):
    df = spark.createDataFrame(
        [("c", "e", _ts(0))], "conv_id string, surface string, ts timestamp"
    )
    with pytest.raises(ValueError, match="max_gap_s"):
        entity_activity_intervals(df, max_gap_s=-1)


def test_interval_quads_round_trip(spark):
    """intervals → quads → N-Quads lines → parse → reconstruct == input."""
    from mopper_spark.ntriples import format_statements, parse_statements
    from mopper_spark.pipeline.temporal import interval_quads

    ivals = [
        ("c1", "Venus Williams", 0, 50_000_000, 2),
        ("c1", "René Müller", 200_000_000, 200_000_000, 1),
        ("c2", "A. Lovelace", 5_000_000, 90_000_000, 3),
    ]
    df = spark.createDataFrame(
        ivals,
        "conv_id string, entity string, valid_from_us long, "
        "valid_to_us long, n_mentions long",
    )
    quads = interval_quads(df)
    rows = quads.collect()
    assert len(rows) == 6 * len(ivals)
    assert {r.graph for r in rows} == {"http://example.com/graph/temporal"}

    back = parse_statements(format_statements(quads), col="statement")
    assert sorted(map(tuple, back.collect())) == sorted(map(tuple, rows))

    # reconstruct the interval table from the parsed quads
    ont = "http://example.com/ontology/"
    by_subj = {}
    for r in back.collect():
        by_subj.setdefault(r.subj, {})[r.pred] = r.obj
    rebuilt = {
        (
            p[ont + "inConversation"].rsplit("/", 1)[1],
            p[ont + "entity"],
            int(p[ont + "validFrom"]),
            int(p[ont + "validTo"]),
            int(p[ont + "mentionCount"]),
        )
        for p in by_subj.values()
    }
    enc = lambda s: "http://example.com/entity/" + s.replace(" ", "%20").replace(
        "é", "%C3%A9"
    ).replace("ü", "%C3%BC")
    assert rebuilt == {(c, enc(e), lo, hi, n) for c, e, lo, hi, n in ivals}


class TestIntervalsIncrement:
    """intervals_increment folds must equal the batch operator on the
    union of observations, for ANY micro-batch split and order."""

    def _fold(self, spark, batches, gap_s):
        from mopper_spark.pipeline.temporal import (
            entity_activity_intervals,
            intervals_increment,
        )

        state = spark.createDataFrame(
            [],
            "conv_id string, entity string, valid_from_us long, "
            "valid_to_us long, n_mentions long",
        )
        for batch in batches:
            df = spark.createDataFrame(
                [(c, e, _ts(s)) for c, e, s in batch],
                "conv_id string, surface string, ts timestamp",
            )
            state = intervals_increment(
                state, df, max_gap_s=gap_s
            ).localCheckpoint(eager=True)
        return {tuple(r) for r in state.collect()}

    def test_any_split_matches_batch(self, spark):
        rows = [
            (f"c{i % 2}", f"e{i % 3}", (i * 37) % 500) for i in range(48)
        ]
        want = _replica(rows, 50)
        # one batch, two uneven batches, many tiny batches, reversed order
        splits = [
            [rows],
            [rows[:10], rows[10:]],
            [rows[i : i + 7] for i in range(0, 48, 7)],
            [rows[30:], rows[:30]],
        ]
        for batches in splits:
            assert self._fold(spark, batches, 50) == want

    def test_bridge_merges_two_existing_intervals(self, spark):
        # two islands 0-10 and 100-110 (gap 90 > 50); a point at 55 is
        # within 50 of both (45 each side) and glues them into one island
        base = [("c", "e", 0), ("c", "e", 10), ("c", "e", 100), ("c", "e", 110)]
        assert self._fold(spark, [base], 50) == {
            ("c", "e", 0, 10_000_000, 2),
            ("c", "e", 100_000_000, 110_000_000, 2),
        }
        got = self._fold(spark, [base, [("c", "e", 55)]], 50)
        assert got == {("c", "e", 0, 110_000_000, 5)}

    def test_untouched_groups_pass_through(self, spark):
        from mopper_spark.pipeline.temporal import intervals_increment

        state = spark.createDataFrame(
            [("c", "quiet", 0, 5_000_000, 2)],
            "conv_id string, entity string, valid_from_us long, "
            "valid_to_us long, n_mentions long",
        )
        batch = spark.createDataFrame(
            [("c", "other", _ts(100))],
            "conv_id string, surface string, ts timestamp",
        )
        got = {
            tuple(r) for r in intervals_increment(state, batch, max_gap_s=10).collect()
        }
        assert ("c", "quiet", 0, 5_000_000, 2) in got
        assert ("c", "other", 100_000_000, 100_000_000, 1) in got


def test_interval_quads_encodes_conv_iri(spark):
    """conv IRIs are pct-encoded like the extraction layer's (review fix:
    a raw concat emitted invalid IRIs for conv ids with spaces)."""
    from mopper_spark.pipeline.temporal import interval_quads

    df = spark.createDataFrame(
        [("my conv", "alice", 0, 1, 1)],
        "conv_id string, entity string, valid_from_us long, "
        "valid_to_us long, n_mentions long",
    )
    ont = "http://example.com/ontology/"
    rows = {r.pred: r.obj for r in interval_quads(df).collect()}
    assert rows[ont + "inConversation"] == "http://example.com/conv/my%20conv"


class TestTemporalReachability:
    def test_time_respecting_vs_static(self, spark):
        from mopper_spark.pipeline.temporal import temporal_reachability

        # a -(t=10)-> b -(t=5)-> c : static closure reaches c, temporal does NOT
        # a -(t=10)-> b -(t=20)-> d : temporal reaches d at 20
        edges = spark.createDataFrame(
            [("a", "b", 10), ("b", "c", 5), ("b", "d", 20), ("x", "y", 1)],
            "src string, dst string, t_us long",
        )
        src = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.arrival_us for r in temporal_reachability(edges, src).collect()}
        assert got == {"a": -1, "b": 10, "d": 20}

    def test_earliest_arrival_and_partition_invariance(self, spark):
        from mopper_spark.pipeline.temporal import temporal_reachability

        # two routes to c: via b (arrive 30) and direct (arrive 40) -> min 30
        edges = spark.createDataFrame(
            [("a", "b", 10), ("b", "c", 30), ("a", "c", 40), ("c", "e", 35)],
            "src string, dst string, t_us long",
        )
        src = spark.createDataFrame([("a",)], "node string")
        got = {r.node: r.arrival_us for r in temporal_reachability(edges, src).collect()}
        # e via c@30 needs an edge >= 30: (c,e,35) qualifies
        assert got == {"a": -1, "b": 10, "c": 30, "e": 35}
        got2 = {
            r.node: r.arrival_us
            for r in temporal_reachability(edges.repartition(7), src, max_hops=4).collect()
        }
        assert got2 == got
