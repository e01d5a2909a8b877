"""Weisfeiler-Leman structural fingerprints (pipeline/graphsig.py)."""

from pyspark.sql import functions as F

from mopper_spark.pipeline.graphsig import wl_dedup, wl_fingerprints

COLS = ["gid", "src", "lbl", "dst"]


def _edges(spark, rows):
    return spark.createDataFrame(rows, COLS)


# a 3-turn conversation shape: chain + role edges + one shared mention
SHAPE_A = [
    ("t0", "next", "t1"),
    ("t1", "next", "t2"),
    ("t0", "role|user", "c"),
    ("t1", "role|assistant", "c"),
    ("t2", "role|user", "c"),
    ("t0", "mentions", "e1"),
    ("t2", "mentions", "e1"),
]


def _with_gid(gid, triples, rename=None):
    rename = rename or {}
    return [
        (gid, rename.get(s, s), l, rename.get(d, d)) for s, l, d in triples
    ]


def test_isomorphic_rename_same_sig(spark):
    """Node renaming (different turn ids, different entity names) must not
    change the signature — that is the whole point of the constant seed."""
    renamed = {"t0": "x9", "t1": "x5", "t2": "x7", "c": "k", "e1": "Zorblax"}
    edges = _edges(
        spark,
        _with_gid("g1", SHAPE_A) + _with_gid("g2", SHAPE_A, renamed),
    )
    fps = {r["gid"]: r for r in wl_fingerprints(edges, rounds=3).collect()}
    assert fps["g1"]["wl_sig"] == fps["g2"]["wl_sig"]
    assert fps["g1"]["n_nodes"] == fps["g2"]["n_nodes"] == 5
    assert fps["g1"]["n_edges"] == fps["g2"]["n_edges"] == 7


def test_structural_change_different_sig(spark):
    """Flipping one role label, or moving one mention edge, changes the
    signature."""
    flipped = [
        (s, l.replace("role|assistant", "role|user"), d) for s, l, d in SHAPE_A
    ]
    moved = [
        (("t1" if (s, l, d) == ("t2", "mentions", "e1") else s), l, d)
        for s, l, d in SHAPE_A
    ]
    edges = _edges(
        spark,
        _with_gid("base", SHAPE_A)
        + _with_gid("flip", flipped)
        + _with_gid("move", moved),
    )
    sigs = {r["gid"]: r["wl_sig"] for r in wl_fingerprints(edges, rounds=3).collect()}
    assert len(set(sigs.values())) == 3


def test_partitioning_invariance(spark):
    """The signature is md5-over-sorted-strings: any repartitioning or
    input row order must yield bit-identical results."""
    rows = _with_gid("g1", SHAPE_A) + _with_gid("g2", SHAPE_A[::-1])
    a = wl_fingerprints(_edges(spark, rows), rounds=3)
    b = wl_fingerprints(_edges(spark, rows[::-1]).repartition(7), rounds=3)
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # same edge multiset in both gids -> same sig
    got = {r["gid"]: r["wl_sig"] for r in a.collect()}
    assert got["g1"] == got["g2"]


def test_wl_dedup_groups_and_survivor(spark):
    # note: "c" is already the conversation node in SHAPE_A, so the
    # rename must avoid it or the "renamed" graph would merge two nodes
    renamed = {"t0": "a", "t1": "b", "t2": "z", "e1": "other"}
    extra = SHAPE_A + [("t1", "mentions", "e2")]
    edges = _edges(
        spark,
        _with_gid("g2", SHAPE_A)
        + _with_gid("g1", SHAPE_A, renamed)
        + _with_gid("g3", extra),
    )
    out = {r["gid"]: r for r in wl_dedup(wl_fingerprints(edges, rounds=3)).collect()}
    assert out["g1"]["canonical_gid"] == "g1" and out["g1"]["is_canonical"]
    assert out["g2"]["canonical_gid"] == "g1" and not out["g2"]["is_canonical"]
    assert out["g1"]["group_size"] == out["g2"]["group_size"] == 2
    assert out["g3"]["group_size"] == 1 and out["g3"]["is_canonical"]


def test_edge_multiplicity_counts(spark):
    """Parallel duplicate edges are multiset members — a doubled edge is a
    different structure than a single one."""
    single = [("u", "p", "v")]
    double = [("u", "p", "v"), ("u", "p", "v")]
    edges = _edges(spark, _with_gid("s", single) + _with_gid("d", double))
    sigs = {r["gid"]: r["wl_sig"] for r in wl_fingerprints(edges, rounds=1).collect()}
    assert sigs["s"] != sigs["d"]


def test_canonical_blank_labels_rename_invariant(spark):
    """Relabeling the input blanks must not change the canonical SET."""
    from mopper_spark.pipeline.graphsig import canonical_blank_labels

    t = [
        ("<t1>", "m", "_:x"),
        ("<t2>", "m", "_:x"),
        ("<t1>", "m", "_:y"),
        ("_:y", "in", "<c>"),
    ]
    renamed = [
        (s.replace("_:x", "_:qq").replace("_:y", "_:aa"), p,
         o.replace("_:x", "_:qq").replace("_:y", "_:aa"))
        for s, p, o in t
    ]
    cols = ["subj", "pred", "obj"]
    a = canonical_blank_labels(spark.createDataFrame(t, cols))
    b = canonical_blank_labels(spark.createDataFrame(renamed, cols))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    # ground terms untouched, blanks renamed to _:cN
    got = sorted(map(tuple, a.collect()))
    assert all(not x.startswith("_:") or x.startswith("_:c")
               for row in got for x in (row[0], row[2]))


def test_canonical_blank_labels_ties_interchangeable(spark):
    """Two blanks with IDENTICAL incident-edge multisets get distinct
    labels, and the output set is independent of their input names."""
    from mopper_spark.pipeline.graphsig import canonical_blank_labels

    cols = ["subj", "pred", "obj"]
    t = [("<t1>", "m", "_:x"), ("<t1>", "m", "_:y")]
    swapped = [("<t1>", "m", "_:y"), ("<t1>", "m", "_:x")]
    a = canonical_blank_labels(spark.createDataFrame(t, cols))
    b = canonical_blank_labels(spark.createDataFrame(swapped, cols))
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))
    labs = sorted(r["obj"] for r in a.collect())
    assert labs == ["_:c1", "_:c2"]


def test_canonical_blank_labels_refuses_blank_blank(spark):
    import pytest

    from mopper_spark.pipeline.graphsig import canonical_blank_labels

    df = spark.createDataFrame(
        [("_:a", "p", "_:b")], ["subj", "pred", "obj"]
    )
    with pytest.raises(ValueError, match="blank-blank"):
        canonical_blank_labels(df)


def test_sig_labels_stable_under_unrelated_edit(spark):
    """sig-style labels are a pure function of the blank's neighborhood:
    editing an unrelated part of the graph leaves them untouched (the
    property graph_diff relies on); rank-style labels renumber."""
    from mopper_spark.pipeline.graphsig import canonical_blank_labels

    cols = ["subj", "pred", "obj"]
    base = [("<t1>", "m", "_:x"), ("<t2>", "m", "_:z")]
    edited = base + [("<t3>", "m", "_:z")]  # only _:z's neighborhood changes

    def canon(rows):
        return sorted(
            map(
                tuple,
                canonical_blank_labels(
                    spark.createDataFrame(rows, cols), label_style="sig"
                ).collect(),
            )
        )

    tri_a, tri_b = canon(base), canon(edited)
    x_row_a = [t for t in tri_a if t[0] == "<t1>"]
    x_row_b = [t for t in tri_b if t[0] == "<t1>"]
    assert x_row_a == x_row_b  # _:x's label did not move
    z_row_a = {t for t in tri_a if t[0] == "<t2>"}
    z_row_b = {t for t in tri_b if t[0] == "<t2>"}
    assert z_row_a != z_row_b  # _:z's label did (its signature changed)


def test_graph_diff_localizes_changes(spark):
    from mopper_spark.pipeline.graphsig import graph_diff

    cols = ["subj", "pred", "obj"]
    old = [
        ("<t1>", "m", "_:keep"),
        ("<t2>", "m", "_:gone"),
        ("<t3>", "m", "_:grow"),
    ]
    # same graph with blanks RENAMED arbitrarily + one edge added + one
    # blank dropped: diff must ignore the renaming entirely
    new = [
        ("<t1>", "m", "_:a1"),
        ("<t3>", "m", "_:a2"),
        ("<t4>", "m", "_:a2"),
    ]
    out = graph_diff(
        spark.createDataFrame(old, cols), spark.createDataFrame(new, cols)
    ).collect()
    by_status = {}
    for r in out:
        by_status.setdefault(r["status"], set()).add((r["subj"], r["pred"]))
    # _:keep (<t1>) is untouched -> absent from the diff
    assert ("<t1>", "m") not in by_status.get("added", set())
    assert ("<t1>", "m") not in by_status.get("removed", set())
    # _:gone removed; _:grow's neighborhood changed -> its old statement
    # removed and two new statements added under the new signature label
    assert ("<t2>", "m") in by_status["removed"]
    assert ("<t3>", "m") in by_status["removed"]
    assert {("<t3>", "m"), ("<t4>", "m")} <= by_status["added"]


def test_graph_diff_identical_graphs_empty(spark):
    from mopper_spark.pipeline.graphsig import graph_diff

    cols = ["subj", "pred", "obj"]
    old = [("<t1>", "m", "_:x"), ("_:x", "in", "<c>")]
    renamed = [("<t1>", "m", "_:zz"), ("_:zz", "in", "<c>")]
    assert (
        graph_diff(
            spark.createDataFrame(old, cols),
            spark.createDataFrame(renamed, cols),
        ).count()
        == 0
    )


def test_graph_diff_driver_query_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    got = sorted(map(tuple, entry._q_kg_graph_diff(spark, "").collect()))
    want = sorted(map(tuple, duckdb.sql(entry._SQL_KG_GRAPH_DIFF).fetchall()))
    assert got == want
    statuses = {r[3] for r in got}
    assert statuses == {"added", "removed"}  # both directions exercised


def test_canonical_driver_query_matches_duckdb_oracle(spark):
    import duckdb

    import __spark_entry__ as entry

    got = sorted(map(tuple, entry._q_kg_blank_canonical(spark, "").collect()))
    want = sorted(map(tuple, duckdb.sql(entry._SQL_KG_BLANK_CANONICAL).fetchall()))
    assert got == want


def test_driver_query_matches_duckdb_oracle(spark):
    """The full driver entry vs its unrolled-SQL oracle, exact rows."""
    import duckdb

    import __spark_entry__ as entry

    got = sorted(
        map(
            tuple,
            entry._q_kg_wl_structural_dedup(spark, "").collect(),
        )
    )
    want = sorted(
        map(tuple, duckdb.sql(entry._SQL_KG_WL_STRUCTURAL_DEDUP).fetchall())
    )
    assert got == want
    # the fixture really exercises grouping: at least one structural
    # duplicate class exists (short no-mention conversations collide)
    assert any(r[5] > 1 for r in got)
