"""Tests for fixed-point HITS, longest-path DAG layering, and neighborhood
Jaccard — each against a pure-Python integer replica, plus the structural
invariants (rescale pinning, cycle detection, hub-cap consistency) and a
partitioning-invariance check on HITS (the reason it is fixed-point)."""

from collections import defaultdict

import pytest

from mopper_spark.pipeline.graph import hits_fixed, node_jaccard, topo_layers


def _edges_df(spark, edges, schema):
    return spark.createDataFrame([(int(a), int(b)) for a, b in edges], schema)


def _py_hits(edges, iters=2, scale=10**6):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = sorted({s for s, _ in e} | {d for _, d in e})
    hub = {v: scale for v in nodes}

    def push(state, forward):
        raw = defaultdict(int)
        for s, d in e:
            if forward:
                if s in state:
                    raw[d] += state[s]
            else:
                if d in state:
                    raw[s] += state[d]
        mx = max(raw.values(), default=0)
        return {v: (r * scale) // max(mx, 1) for v, r in raw.items()}

    auth = {}
    for _ in range(iters):
        auth = push(hub, forward=True)
        hub = push(auth, forward=False)
    return {v: (hub.get(v, 0), auth.get(v, 0)) for v in nodes}


def _py_layers(edges):
    e = sorted({(s, d) for s, d in edges if s != d})
    nodes = {s for s, _ in e} | {d for _, d in e}
    layer = {v: 0 for v in nodes}
    for _ in range(len(nodes) + 1):
        nxt = dict(layer)
        for s, d in e:
            nxt[d] = max(nxt[d], layer[s] + 1)
        if nxt == layer:
            return layer
        layer = nxt
    raise AssertionError("replica given a cyclic graph")


def _py_jaccard(edges, cap=256, scale=10**9):
    sym = defaultdict(set)
    for a, b in edges:
        if a != b:
            sym[a].add(b)
            sym[b].add(a)
    # hub-filtered neighborhoods: keep only low-degree CENTERS
    filt = {
        v: {u for u in nb if len(sym[u]) <= cap} for v, nb in sym.items()
    }
    out = {}
    nodes = sorted(sym)
    for i, x in enumerate(nodes):
        for y in nodes[i + 1 :]:
            common = len(filt[x] & filt[y])
            if common >= 1:
                denom = len(filt[x]) + len(filt[y]) - common
                out[(x, y)] = (common, (common * scale) // denom)
    return out


def _digraph():
    edges = set()
    for v in range(2, 60):
        edges.add((v, v // 2))
        edges.add((v, (7 * v + 3) % 60))
    return sorted((a, b) for a, b in edges if a != b)


class TestHitsFixed:
    def test_matches_replica(self, spark):
        edges = _digraph()
        got = {
            r["node"]: (r["hub_fp"], r["auth_fp"])
            for r in hits_fixed(
                _edges_df(spark, edges, "src long, dst long")
            ).collect()
        }
        assert got == _py_hits(edges)

    def test_top_scores_pin_at_scale(self, spark):
        """The max-rescale contract: the best hub and the best authority
        sit at exactly `scale`."""
        res = hits_fixed(
            _edges_df(spark, _digraph(), "src long, dst long"), scale=10**6
        ).collect()
        assert max(r["hub_fp"] for r in res) == 10**6
        assert max(r["auth_fp"] for r in res) == 10**6

    def test_pure_source_and_sink(self, spark):
        """A node with no in-edges has authority 0; no out-edges -> hub 0."""
        res = {
            r["node"]: (r["hub_fp"], r["auth_fp"])
            for r in hits_fixed(
                _edges_df(spark, [(1, 2), (2, 3), (1, 3)], "src long, dst long")
            ).collect()
        }
        assert res[1][1] == 0  # 1 is a pure source
        assert res[3][0] == 0  # 3 is a pure sink

    def test_partitioning_invariance(self, spark):
        """Bit-identical under different partition counts — the point of
        integer fixed point."""
        edges = _digraph()
        outs = []
        for parts in (1, 7):
            df = _edges_df(spark, edges, "src long, dst long").repartition(
                parts
            )
            outs.append(sorted(tuple(r) for r in hits_fixed(df).collect()))
        assert outs[0] == outs[1]


class TestTopoLayers:
    def test_matches_replica(self, spark):
        edges = [(v // 2, v) for v in range(2, 80)] + [
            (v // 4, v) for v in range(4, 80)
        ]
        got = {
            r["node"]: r["layer"]
            for r in topo_layers(
                _edges_df(spark, edges, "src long, dst long"), max_depth=8
            ).collect()
        }
        assert got == _py_layers(edges)

    def test_layering_is_schedulable(self, spark):
        """Every edge goes strictly up the layering — the property a wave
        scheduler needs."""
        edges = [(v // 2, v) for v in range(2, 80)] + [
            (v // 4, v) for v in range(4, 80)
        ]
        lay = {
            r["node"]: r["layer"]
            for r in topo_layers(
                _edges_df(spark, edges, "src long, dst long"), max_depth=8
            ).collect()
        }
        assert all(lay[s] < lay[d] for s, d in edges if s != d)

    def test_cycle_raises(self, spark):
        with pytest.raises(ValueError, match="cycle|fixpoint"):
            topo_layers(
                _edges_df(spark, [(1, 2), (2, 3), (3, 1)], "src long, dst long"),
                max_depth=6,
            ).collect()

    def test_too_small_bound_raises(self, spark):
        chain = [(i, i + 1) for i in range(10)]
        with pytest.raises(ValueError, match="fixpoint"):
            topo_layers(
                _edges_df(spark, chain, "src long, dst long"), max_depth=3
            ).collect()


class TestNodeJaccard:
    def test_matches_replica(self, spark):
        edges = [(v, v // 2) for v in range(2, 50)] + [
            (v, (v + 1) % 50) for v in range(50)
        ]
        got = {
            (r["x"], r["y"]): (r["common"], r["j_fp"])
            for r in node_jaccard(
                _edges_df(spark, edges, "a long, b long")
            ).collect()
        }
        assert got == _py_jaccard(edges)

    def test_identical_neighborhoods_score_one(self, spark):
        """Two nodes adjacent to exactly the same set score scale (J=1)."""
        edges = [(1, 10), (1, 11), (2, 10), (2, 11)]
        got = {
            (r["x"], r["y"]): r["j_fp"]
            for r in node_jaccard(
                _edges_df(spark, edges, "a long, b long")
            ).collect()
        }
        assert got[(1, 2)] == 10**9

    def test_hub_cap_drops_hub_mediated_pairs(self, spark):
        """With the cap below the star hub's degree, leaf pairs (whose only
        common neighbor is the hub) are not emitted — and the hub's own
        scores count only low-degree commons."""
        star = [(0, v) for v in range(1, 8)]  # hub 0, degree 7
        extra = [(1, 9), (2, 9)]  # 1,2 also share low-degree node 9
        res = node_jaccard(
            _edges_df(spark, star + extra, "a long, b long"),
            max_center_degree=3,
        ).collect()
        pairs = {(r["x"], r["y"]): (r["common"], r["j_fp"]) for r in res}
        assert (3, 4) not in pairs  # hub-only common neighbor: dropped
        assert pairs == _py_jaccard(star + extra, cap=3)


class TestSimrankFirstIteration:
    def _edges(self, spark, rows):
        return spark.createDataFrame(rows, "a long, b long")

    def test_closed_form_matches_textbook(self, spark):
        from mopper_spark.pipeline.graph import simrank_first_iteration

        # 1 -> {3, 4}; 2 -> {3, 4}; 5 -> 3.  I(3) = {1,2,5}, I(4) = {1,2}.
        e = self._edges(spark, [(1, 3), (1, 4), (2, 3), (2, 4), (5, 3)])
        got = {(r.x, r.y): (r.common, r.in_x, r.in_y, r.s_fp)
               for r in simrank_first_iteration(e).collect()}
        # s1(3,4) = 0.8 * |{1,2}| / (3*2) = 0.8*2/6 -> fp floor(8*2*1e8/(10*6))
        assert got[(3, 4)] == (2, 3, 2, (8 * 2 * 10**8) // (10 * 3 * 2))

    def test_hub_cap_drops_center_consistently(self, spark):
        from mopper_spark.pipeline.graph import simrank_first_iteration

        # hub 9 points at everything; with cap 2 it vanishes from wedges
        # AND from in-degree counts.
        e = self._edges(
            spark, [(9, 1), (9, 2), (9, 3), (7, 1), (7, 2)]
        )
        got = {(r.x, r.y): (r.common, r.in_x, r.in_y)
               for r in simrank_first_iteration(
                   e, max_center_out_degree=2).collect()}
        assert got == {(1, 2): (1, 1, 1)}

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import simrank_first_iteration

        rows = [(i // 6 + 100, (i * 7) % 23) for i in range(60)]
        e = self._edges(spark, rows)
        a = sorted(map(tuple, simrank_first_iteration(e).collect()))
        b = sorted(
            map(tuple, simrank_first_iteration(e.repartition(13)).collect())
        )
        assert a == b and len(a) > 0


class TestEccentricityFrom:
    def test_path_graph(self, spark):
        from mopper_spark.pipeline.graph import eccentricity_from

        # path 1-2-3-4-5: ecc(1)=4 witness 5, ecc(3)=2 witness min(1,5)=1
        e = spark.createDataFrame(
            [(1, 2), (2, 3), (3, 4), (4, 5)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,), (3,)], "origin long")
        got = {r.origin: (r.ecc, r.n_reached, r.farthest)
               for r in eccentricity_from(e, seeds).collect()}
        assert got[1] == (4, 4, 5)
        assert got[3] == (2, 4, 1)

    def test_disconnected_component_scope(self, spark):
        from mopper_spark.pipeline.graph import eccentricity_from

        e = spark.createDataFrame(
            [(1, 2), (8, 9)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,)], "origin long")
        got = eccentricity_from(e, seeds).collect()
        assert [(r.ecc, r.n_reached, r.farthest) for r in got] == [(1, 1, 2)]


class TestWeightedDistances:
    def _run(self, spark, edges, seeds, **kw):
        from mopper_spark.pipeline.graph import weighted_distances

        e = spark.createDataFrame(edges, "src long, dst long, w long")
        s = spark.createDataFrame([(x,) for x in seeds], "origin long")
        return {
            (r.origin, r.node): r.dist
            for r in weighted_distances(e, s, **kw).collect()
        }

    def test_cheaper_long_path_wins(self, spark):
        # 1->3 direct costs 10; 1->2->3 costs 2+3=5
        got = self._run(
            spark, [(1, 3, 10), (1, 2, 2), (2, 3, 3)], [1]
        )
        assert got == {(1, 2): 2, (1, 3): 5}

    def test_matches_bfs_on_unit_weights(self, spark):
        from mopper_spark.pipeline.graph import bfs_distances

        edges = [(v, v // 2, 1) for v in range(2, 40)]
        e = spark.createDataFrame(edges, "src long, dst long, w long")
        s = spark.createDataFrame([(1,)], "origin long")
        wd = self._run(spark, edges, [1], directed=False)
        bf = {
            (r.origin, r.node): r.dist
            for r in bfs_distances(
                e.select("src", "dst"), s, directed=False
            ).collect()
        }
        assert wd == bf

    def test_parallel_edges_and_nonpositive_rejection(self, spark):
        got = self._run(spark, [(1, 2, 9), (1, 2, 4)], [1])
        assert got == {(1, 2): 4}
        import pytest as _pt

        # contract is STRICTLY positive weights (ADVICE r4): zero-weight
        # edges would admit dist=0 rows against the documented
        # dist >= 1*min_w bound, so both -1 and 0 must be rejected
        with _pt.raises(ValueError, match="strictly positive"):
            self._run(spark, [(1, 2, -1)], [1])
        with _pt.raises(ValueError, match="strictly positive"):
            self._run(spark, [(1, 2, 0)], [1])

    def test_round_bound_raises(self, spark):
        import pytest as _pt

        chain = [(i, i + 1, 1) for i in range(12)]
        with _pt.raises(ValueError, match="fixpoint"):
            self._run(spark, chain, [0], max_rounds=3)


class TestRichClub:
    def test_phi_exact(self, spark):
        from mopper_spark.pipeline.graph import rich_club

        # clique on {1,2,3,4} plus pendant leaves on each: clique nodes
        # have degree 4, leaves degree 1.
        clique = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
        leaves = [(i, 10 + i) for i in range(1, 5)]
        e = spark.createDataFrame(clique + leaves, "a long, b long")
        got = {r.k: (r.n_nodes, r.n_edges, r.phi_fp)
               for r in rich_club(e, degree_cuts=(1, 3, 4)).collect()}
        # k=1: elite = clique nodes (deg 4): 6 edges, phi = 1
        assert got[1] == (4, 6, 10**6)
        assert got[3] == (4, 6, 10**6)
        # k=4: nobody qualifies
        assert got[4] == (0, 0, 0)

    def test_validation_and_degenerate(self, spark):
        import pytest as _pt

        from mopper_spark.pipeline.graph import rich_club

        e = spark.createDataFrame([(1, 2)], "a long, b long")
        with _pt.raises(ValueError):
            rich_club(e, degree_cuts=())
        (r,) = rich_club(e, degree_cuts=(0,)).collect()
        # both nodes have degree 1 > 0: elite = {1,2}, one edge, phi 1
        assert (r.n_nodes, r.n_edges, r.phi_fp) == (2, 1, 10**6)
