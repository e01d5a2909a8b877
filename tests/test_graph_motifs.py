"""Tests for Luby MIS, bipartite butterfly counting, and densest-subgraph
peeling — each against a pure-Python replica, plus the independence /
maximality / exactness invariants."""

import hashlib
from collections import defaultdict
from itertools import combinations

import pytest

from mopper_spark.pipeline.graph import (
    butterfly_counts,
    densest_peel_stats,
    luby_mis,
)


def _edges_df(spark, edges, schema="a long, b long"):
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges], schema)


def _py_luby(edges, seed="mis-v1"):
    adj = defaultdict(set)
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        if a != b:
            adj[a].add(b)
            adj[b].add(a)
    active = set(nodes)
    mis = set()
    r = 0
    while active:
        r += 1
        prio = {
            v: hashlib.md5(f"{seed}:{r}:{v}".encode()).hexdigest()
            for v in active
        }
        winners = {
            v
            for v in active
            if all(prio[v] < prio[u] for u in adj[v] if u in active)
        }
        mis |= winners
        dead = set(winners)
        for v in winners:
            dead |= adj[v] & active
        active -= dead
    return {v: (v in mis) for v in nodes}


def _py_butterflies(edges):
    items = defaultdict(set)
    for u, it in edges:
        items[it].add(u)
    pair_c = defaultdict(int)
    for it, us in items.items():
        for a, b in combinations(sorted(us), 2):
            pair_c[(a, b)] += 1
    bf = defaultdict(int)
    for (a, b), c in pair_c.items():
        if c >= 2:
            n = c * (c - 1) // 2
            bf[a] += n
            bf[b] += n
    return dict(bf)


def _py_peel(edges, eps_num=1, eps_den=4):
    sym = defaultdict(set)
    for a, b in edges:
        if a != b:
            sym[a].add(b)
            sym[b].add(a)
    thr = 2 * (eps_den + eps_num)
    stats = []
    r = 0
    while sym:
        n = len(sym)
        m = sum(len(v) for v in sym.values()) // 2
        stats.append((r, n, m))
        keep = {v for v, nb in sym.items() if len(nb) * n * eps_den >= thr * m}
        sym = {
            v: {u for u in nb if u in keep}
            for v, nb in sym.items()
            if v in keep
        }
        sym = {v: nb for v, nb in sym.items() if nb}
        r += 1
    return stats


def _mixed_graph():
    edges = set()
    for i in range(20):
        edges.add((i, (i + 1) % 20))
        edges.add((i, (3 * i + 7) % 20))
    for i in range(20, 40):
        edges.add((i, (i * 5 + 1) % 40))
    return sorted((a, b) for a, b in edges if a != b)


class TestLubyMis:
    def test_matches_replica(self, spark):
        edges = _mixed_graph()
        got = dict(luby_mis(_edges_df(spark, edges)).collect())
        assert got == _py_luby(edges)

    def test_independent_and_maximal(self, spark):
        edges = _mixed_graph()
        got = dict(luby_mis(_edges_df(spark, edges)).collect())
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        mis = {v for v, f in got.items() if f}
        for v in mis:  # independence
            assert not (adj[v] & mis), v
        for v, f in got.items():  # maximality
            if not f:
                assert adj[v] & mis, v

    def test_self_loop_dropped(self, spark):
        got = dict(luby_mis(_edges_df(spark, [(1, 1), (1, 2)])).collect())
        # 1-2 edge: exactly one of them wins; the self-loop doesn't veto 1
        assert got[1] != got[2]

    def test_triangle_one_winner(self, spark):
        got = dict(
            luby_mis(_edges_df(spark, [(1, 2), (2, 3), (1, 3)])).collect()
        )
        assert sum(got.values()) == 1


class TestButterflies:
    EDGES = [
        (1, 100), (1, 101), (1, 102),
        (2, 100), (2, 101),
        (3, 100), (3, 101), (3, 102),
        (4, 103),
        (5, 103),
    ]

    def test_matches_replica(self, spark):
        df = _edges_df(spark, self.EDGES, "u long, item long")
        got = dict(butterfly_counts(df).collect())
        assert got == _py_butterflies(self.EDGES)

    def test_single_square(self, spark):
        df = _edges_df(
            spark, [(1, 9), (1, 8), (2, 9), (2, 8)], "u long, item long"
        )
        got = dict(butterfly_counts(df).collect())
        assert got == {1: 1, 2: 1}

    def test_duplicate_edges_ignored(self, spark):
        df = _edges_df(
            spark,
            [(1, 9), (1, 9), (1, 8), (2, 9), (2, 8)],
            "u long, item long",
        )
        assert dict(butterfly_counts(df).collect()) == {1: 1, 2: 1}


class TestDensestPeel:
    def test_matches_replica(self, spark):
        # planted dense core (8-clique) + sparse periphery
        edges = {(a, b) for a, b in combinations(range(8), 2)}
        for i in range(8, 40):
            edges.add((i, i % 8))
            edges.add((i, (i * 3 + 1) % 8))
        edges = sorted(edges)
        got = [
            (r["round"], r["n_nodes"], r["n_edges"])
            for r in densest_peel_stats(_edges_df(spark, edges))
            .orderBy("round")
            .collect()
        ]
        assert got == _py_peel(edges)

    def test_clique_survives_to_best_round(self, spark):
        edges = sorted({(a, b) for a, b in combinations(range(8), 2)}) + [
            (i, i % 8) for i in range(8, 40)
        ]
        rows = (
            densest_peel_stats(_edges_df(spark, edges))
            .orderBy("round")
            .collect()
        )
        # best density round (cross-multiplied compare) must be ≥ the
        # clique's density 7/2 within the 2(1+ε) guarantee of the true max
        best_m, best_n = max(
            ((r["n_edges"], r["n_nodes"]) for r in rows),
            key=lambda t: t[0] / t[1],
        )
        assert best_m / best_n >= (7 / 2) / 2.5

    def test_terminates_and_monotone_nodes(self, spark):
        edges = _mixed_graph()
        rows = (
            densest_peel_stats(_edges_df(spark, edges))
            .orderBy("round")
            .collect()
        )
        ns = [r["n_nodes"] for r in rows]
        assert all(x > y for x, y in zip(ns, ns[1:]))
        assert ns[0] == len({x for e in edges for x in e})


class TestButterfliesSkew:
    """Celebrity-vertex stress for the vertex-priority orientation
    (VERDICT r4 #4): the naive wedge join's C(deg, 2) blow-up lives on a
    hot middle; priority orientation makes the hot vertex nobody's middle,
    and the count must stay exact either way."""

    def test_celebrity_item(self, spark):
        edges = [(u, 0) for u in range(200)]
        for u in range(200):
            edges.append((u, 1 + (u % 7)))
            edges.append((u, 8 + (u % 13)))
        df = _edges_df(spark, edges, "u long, item long")
        assert dict(butterfly_counts(df).collect()) == _py_butterflies(edges)

    def test_celebrity_user(self, spark):
        edges = [(0, it) for it in range(200)]
        for it in range(200):
            edges.append((1 + (it % 7), it))
            edges.append((8 + (it % 13), it))
        df = _edges_df(spark, edges, "u long, item long")
        assert dict(butterfly_counts(df).collect()) == _py_butterflies(edges)

    def test_random_bipartite_matches_replica(self, spark):
        import random

        rng = random.Random(5)
        edges = sorted(
            {(rng.randrange(40), rng.randrange(25)) for _ in range(500)}
        )
        df = _edges_df(spark, edges, "u long, item long")
        assert dict(butterfly_counts(df).collect()) == _py_butterflies(edges)
