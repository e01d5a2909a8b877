"""Tests for SCC (forward-backward coloring), exact harmonic centrality,
and the HyperBall neighborhood sketch — each against a pure-Python replica
(Kosaraju SCC / BFS / md5-register HLL), plus the bound-verification and
determinism contracts."""

import hashlib
import math
from collections import defaultdict, deque

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.centrality import harmonic_centrality, hyperball
from mopper_spark.pipeline.graph import scc_components


# ---------------------------------------------------------------- replicas
def _py_scc(nodes, edges):
    """Kosaraju: order by first DFS finish time, assign on reversed graph.
    Returns {node: min id of its SCC}."""
    fwd, bwd = defaultdict(list), defaultdict(list)
    for s, d in edges:
        fwd[s].append(d)
        bwd[d].append(s)
    seen, order = set(), []
    for start in nodes:
        if start in seen:
            continue
        stack = [(start, iter(fwd[start]))]
        seen.add(start)
        while stack:
            v, it = stack[-1]
            advanced = False
            for w in it:
                if w not in seen:
                    seen.add(w)
                    stack.append((w, iter(fwd[w])))
                    advanced = True
                    break
            if not advanced:
                order.append(v)
                stack.pop()
    comp = {}
    for start in reversed(order):
        if start in comp:
            continue
        members, dq = [], deque([start])
        comp[start] = None
        while dq:
            v = dq.popleft()
            members.append(v)
            for w in bwd[v]:
                if w not in comp:
                    comp[w] = None
                    dq.append(w)
        label = min(members)
        for v in members:
            comp[v] = label
    return comp


def _py_bfs_all(nodes, sym_adj, max_hops=30):
    """{origin: {node: dist}} over an adjacency dict."""
    out = {}
    for o in nodes:
        dist, dq = {o: 0}, deque([o])
        while dq:
            v = dq.popleft()
            if dist[v] >= max_hops:
                continue
            for w in sym_adj[v]:
                if w not in dist:
                    dist[w] = dist[v] + 1
                    dq.append(w)
        del dist[o]
        out[o] = dist
    return out


def _py_hll_regs(values):
    """{bucket: max rho} with the md5 bucket/rho derivation of
    centrality._init_registers (m=64)."""
    regs = {}
    for v in values:
        h = hashlib.md5(str(v).encode()).hexdigest()
        bucket = int(h[:2], 16) % 64
        w = int(h[2:14], 16)
        rho = 49 if w == 0 else 49 - len(bin(w)[2:])
        regs[bucket] = max(regs.get(bucket, 0), rho)
    return regs


def _py_hll_summary(regs):
    m, p50 = 64, 1 << 50
    v_zero = m - len(regs)
    s_fp = sum(1 << (50 - r) for r in regs.values()) + v_zero * p50
    alpha = 0.7213 / (1.0 + 1.079 / m)
    est_raw = alpha * m * m * float(p50) / float(s_fp)
    if est_raw <= 2.5 * m and v_zero > 0:
        est = m * math.log(m / float(v_zero))
    else:
        est = est_raw
    return v_zero, s_fp, est


def _edges_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "src long, dst long"
    )


# fixture graph: two guaranteed cycles + pseudo-random chords + a DAG tail
def _mixed_graph():
    edges = set()
    for i in range(6):  # cycle A: 0..5
        edges.add((i, (i + 1) % 6))
    for i in range(6, 14):  # cycle B: 6..13
        edges.add((i, 6 + ((i - 6 + 1) % 8)))
    edges.add((3, 8))  # A -> B (DAG edge between the two SCCs)
    for i in range(14, 30):  # tail chords, mostly acyclic
        edges.add((i, (3 * i + 5) % 30))
        if i % 3 == 0:
            edges.add((i, (7 * i + 11) % 30))
    nodes = sorted({x for e in edges for x in e})
    return nodes, sorted(edges)


class TestScc:
    def test_two_cycles_dag_edge(self, spark):
        edges = [(0, 1), (1, 2), (2, 0), (2, 5), (5, 6), (6, 7), (7, 5)]
        got = dict(
            scc_components(_edges_df(spark, edges))
            .select("node", "scc_id")
            .collect()
        )
        assert got == {0: 0, 1: 0, 2: 0, 5: 5, 6: 5, 7: 5}

    def test_path_graph_all_singletons(self, spark):
        edges = [(i, i + 1) for i in range(8)]
        got = dict(scc_components(_edges_df(spark, edges)).collect())
        assert got == {i: i for i in range(9)}

    def test_self_loop_is_singleton(self, spark):
        got = dict(scc_components(_edges_df(spark, [(4, 4), (4, 9)])).collect())
        assert got == {4: 4, 9: 9}

    def test_matches_kosaraju_replica(self, spark):
        nodes, edges = _mixed_graph()
        want = _py_scc(nodes, edges)
        got = dict(scc_components(_edges_df(spark, edges)).collect())
        assert got == want

    def test_bounded_rounds_verified(self, spark):
        nodes, edges = _mixed_graph()
        want = _py_scc(nodes, edges)
        got = dict(
            scc_components(_edges_df(spark, edges), prop_rounds=16).collect()
        )
        assert got == want

    def test_too_small_bound_raises(self, spark):
        # a 12-cycle needs ~11 propagation steps; bound 2 must be LOUD
        edges = [(i, (i + 1) % 12) for i in range(12)]
        with pytest.raises(ValueError, match="prop_rounds"):
            scc_components(_edges_df(spark, edges), prop_rounds=2).collect()

    def test_empty_input(self, spark):
        assert scc_components(_edges_df(spark, [])).count() == 0


class TestHarmonic:
    def test_path_graph_exact(self, spark):
        e = _edges_df(spark, [(1, 2), (2, 3)])
        got = {
            r["node"]: (r["reach"], r["dist_sum"], r["harmonic_fp"])
            for r in harmonic_centrality(e).collect()
        }
        s = 10**9
        assert got[2] == (2, 2, 2 * s)
        assert got[1] == (2, 3, s + s // 2)
        assert got[3] == (2, 3, s + s // 2)

    def test_matches_bfs_replica(self, spark):
        nodes, edges = _mixed_graph()
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        dists = _py_bfs_all(nodes, adj)
        s = 10**9
        want = {
            o: (
                len(d),
                sum(d.values()),
                sum(s // x for x in d.values()),
            )
            for o, d in dists.items()
            if d
        }
        got = {
            r["node"]: (r["reach"], r["dist_sum"], r["harmonic_fp"])
            for r in harmonic_centrality(_edges_df(spark, edges)).collect()
        }
        assert got == want


class TestHyperball:
    def test_matches_exact_ball_registers(self, spark):
        """After t rounds, hyperball's registers must EQUAL the HLL
        registers of the exact t-ball membership — the sketch is lossy
        vs the true count, but exact vs its own definition."""
        nodes, edges = _mixed_graph()
        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        dists = _py_bfs_all(nodes, adj)
        t = 3
        want = {}
        for v in nodes:
            ball = {v} | {u for u, d in dists[v].items() if d <= t}
            want[v] = _py_hll_summary(_py_hll_regs(ball))
        got = {
            r["node"]: (r["v_zero"], r["s_fp"], r["est"])
            for r in hyperball(_edges_df(spark, edges), rounds=t).collect()
        }
        assert set(got) == set(want)
        for v in nodes:
            assert got[v][0] == want[v][0], v
            assert got[v][1] == want[v][1], v
            assert got[v][2] == pytest.approx(want[v][2], rel=1e-12)

    def test_directed_forward_ball(self, spark):
        # 1 -> 2 -> 3: ball(1, 2) = {1,2,3}; ball(3, 2) = {3}
        got = {
            r["node"]: (r["v_zero"], r["s_fp"])
            for r in hyperball(
                _edges_df(spark, [(1, 2), (2, 3)]), rounds=2, directed=True
            ).collect()
        }
        v1 = _py_hll_summary(_py_hll_regs({1, 2, 3}))
        v3 = _py_hll_summary(_py_hll_regs({3}))
        assert got[1] == (v1[0], v1[1])
        assert got[3] == (v3[0], v3[1])

    def test_estimate_tracks_ball_size(self, spark):
        # a 200-node ring: ball(v, 5) has exactly 11 members; the m=64
        # estimate at n=11 sits in the linear-counting regime and must be
        # within the HLL error envelope for every node.
        edges = [(i, (i + 1) % 200) for i in range(200)]
        rows = hyperball(_edges_df(spark, edges), rounds=5).collect()
        assert len(rows) == 200
        for r in rows:
            assert 5 <= r["est"] <= 22, (r["node"], r["est"])


def _py_brandes_fp(edges, scale=10**9, directed=False):
    """Level-synchronous Brandes with the SAME fixed-point dependency
    arithmetic as betweenness_centrality."""
    adj = defaultdict(set)
    nodes = set()
    for a, b in edges:
        nodes.add(a)
        nodes.add(b)
        adj[a].add(b)
        if not directed:
            adj[b].add(a)
    bc = defaultdict(int)
    for o in sorted(nodes):
        dist = {o: 0}
        levels = defaultdict(list)
        levels[0] = [o]
        dq = deque([o])
        while dq:
            u = dq.popleft()
            for w in adj[u]:
                if w not in dist:
                    dist[w] = dist[u] + 1
                    levels[dist[w]].append(w)
                    dq.append(w)
        dmax = max(dist.values())
        sigma = {o: 1}
        for d in range(1, dmax + 1):
            for w in levels[d]:
                sigma[w] = sum(
                    sigma[u]
                    for u in nodes
                    if dist.get(u) == d - 1 and w in adj[u]
                )
        delta = defaultdict(int)
        for d in range(dmax - 1, -1, -1):
            for u in levels[d]:
                s = 0
                for v in adj[u]:
                    if dist.get(v) == d + 1:
                        s += (sigma[u] * (scale + delta[v])) // sigma[v]
                delta[u] = s
        for v in dist:
            if v != o:
                bc[v] += delta[v]
    return {v: bc.get(v, 0) for v in nodes}


class TestBetweenness:
    def test_path_graph(self, spark):
        from mopper_spark.pipeline.centrality import betweenness_centrality

        # 1-2-3: only node 2 lies between; pairs (1,3) and (3,1) each give
        # delta 1.0 -> bc_fp = 2 * scale exactly
        got = dict(
            betweenness_centrality(_edges_df(spark, [(1, 2), (2, 3)]))
            .collect()
        )
        assert got == {1: 0, 3: 0, 2: 2 * 10**9}

    def test_matches_replica_mixed(self, spark):
        from mopper_spark.pipeline.centrality import betweenness_centrality

        nodes, edges = _mixed_graph()
        got = dict(betweenness_centrality(_edges_df(spark, edges)).collect())
        assert got == _py_brandes_fp(edges)

    def test_matches_replica_directed(self, spark):
        from mopper_spark.pipeline.centrality import betweenness_centrality

        edges = [(1, 2), (2, 3), (3, 1), (2, 4), (4, 5), (1, 4)]
        got = dict(
            betweenness_centrality(
                _edges_df(spark, edges), directed=True
            ).collect()
        )
        assert got == _py_brandes_fp(edges, directed=True)

    def test_sigma_multiplicity(self, spark):
        from mopper_spark.pipeline.centrality import betweenness_centrality

        # diamond 1-2-4, 1-3-4: two shortest paths; each middle gets
        # delta (1*(scale+0))//2 = scale//2 from o=1 and o=4
        got = dict(
            betweenness_centrality(
                _edges_df(spark, [(1, 2), (1, 3), (2, 4), (3, 4)])
            ).collect()
        )
        assert got[2] == 2 * (10**9 // 2)
        assert got[3] == 2 * (10**9 // 2)
        # 1 and 4 each sit on the unique 2-3 shortest path through them:
        # delta scale/2 from o=2 plus scale/2 from o=3
        assert got[1] == 2 * (10**9 // 2)
        assert got[4] == 2 * (10**9 // 2)
