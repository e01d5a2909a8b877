"""Tests for ranking (BM25, bigram PMI), fixed-point PageRank, and the
explicit salted skew-join — each against an independent pure-Python
replica of the published formula, plus the determinism / plan properties
that make them safe at cluster scale."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.graph import pagerank_fixed
from mopper_spark.textops.joins import salted_join
from mopper_spark.textops.ranking import bigram_pmi, bm25_scores

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox"),
    (3, "lazy summer days drift by the quick fox river"),
    (4, "fox and dog play in the quick river"),
    (5, "completely unrelated tokens here"),
    (6, ""),
]


def _tok(text):
    return [t for t in text.strip().lower().split() if t]


def _py_bm25(docs, terms, k1=1.2, b=0.75):
    rows = [(i, _tok(t)) for i, t in docs]
    n = len(rows)
    dls = {i: len(t) for i, t in rows}
    avgdl = float(sum(dls.values())) / float(n)
    out = {}
    for i, toks in rows:
        score, matched = 0.0, False
        for term in terms:  # fixed order, left-to-right accumulation
            tf = float(toks.count(term))
            if tf > 0:
                matched = True
            df = float(sum(1 for _, t in rows if term in t))
            idf = math.log(1.0 + ((n - df) + 0.5) / (df + 0.5))
            denom = tf + k1 * ((1.0 - b) + (b * dls[i]) / avgdl)
            score = score + idf * ((tf * (k1 + 1.0)) / denom)
        if matched:
            out[i] = score
    return out


def _py_pagerank(edge_list, iters=3, scale=10**9):
    und = {(min(a, b), max(a, b)) for a, b in edge_list if a != b}
    adj = defaultdict(list)
    for u, v in und:
        adj[u].append(v)
        adj[v].append(u)
    pr = {n: scale for n in adj}
    base = (15 * scale) // 100
    for _ in range(iters):
        s = defaultdict(int)
        for n, vs in adj.items():
            c = pr[n] // len(vs)
            for v in vs:
                s[v] += c
        pr = {n: base + (85 * s[n]) // 100 for n in adj}
    return pr


class TestBM25:
    def test_matches_python_replica(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        terms = ["quick", "river", "dog"]
        got = {r.doc_id: r.bm25 for r in bm25_scores(docs, terms).collect()}
        want = _py_bm25(DOCS, terms)
        assert set(got) == set(want)
        for i in got:
            assert got[i] == pytest.approx(want[i], rel=1e-12, abs=1e-15)

    def test_unmatched_docs_excluded(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {r.doc_id for r in bm25_scores(docs, ["fox"]).collect()}
        assert got == {1, 2, 3, 4}

    def test_requires_terms(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            bm25_scores(docs, [])

    def test_higher_tf_scores_higher(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {r.doc_id: r.bm25 for r in bm25_scores(docs, ["quick"]).collect()}
        # doc 2 has tf=2 in a 4-token doc; doc 1 has tf=1 in a 9-token doc
        assert got[2] > got[1]


class TestBigramPMI:
    def test_matches_python_replica(self, spark):
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r.w1, r.w2): (r.n_pair, r.pmi)
            for r in bigram_pmi(docs, min_count=2).collect()
        }
        # python replica
        toks = [_tok(t) for _, t in DOCS if _tok(t)]
        uni, big = defaultdict(int), defaultdict(int)
        n_tok = n_big = 0
        for t in toks:
            n_tok += len(t)
            n_big += len(t) - 1
            for w in t:
                uni[w] += 1
            for x, y in zip(t, t[1:]):
                big[(x, y)] += 1
        want = {
            p: (c, math.log(((c * float(n_tok)) * n_tok) / ((float(n_big) * uni[p[0]]) * uni[p[1]])))
            for p, c in big.items()
            if c >= 2
        }
        assert set(got) == set(want)
        for p in got:
            assert got[p][0] == want[p][0]
            assert got[p][1] == pytest.approx(want[p][1], rel=1e-12)

    def test_collocation_ranks_above_chance(self, spark):
        # "quick fox" co-occurs twice; with min_count=2 its PMI must be
        # positive (above independence)
        docs = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {(r.w1, r.w2): r.pmi for r in bigram_pmi(docs, min_count=2).collect()}
        assert got[("quick", "fox")] > 0


class TestPagerankFixed:
    EDGES = [
        ("a", "b"), ("b", "c"), ("c", "a"),  # triangle
        ("c", "d"), ("d", "e"),              # tail
        ("e", "d"),                          # duplicate (reversed)
    ]

    def test_matches_python_replica(self, spark):
        edges = spark.createDataFrame(self.EDGES, "a string, b string")
        got = {r.node: r.pr_scaled for r in pagerank_fixed(edges).collect()}
        assert got == _py_pagerank(self.EDGES)

    def test_bit_identical_under_repartitioning(self, spark):
        # the reason for fixed-point arithmetic: ANY partitioning gives the
        # same ranks, bit for bit
        edges = spark.createDataFrame(self.EDGES, "a string, b string")
        r1 = {r.node: r.pr_scaled for r in pagerank_fixed(edges.repartition(7)).collect()}
        r2 = {r.node: r.pr_scaled for r in pagerank_fixed(edges.coalesce(1)).collect()}
        assert r1 == r2

    def test_hub_outranks_leaves(self, spark):
        star = [("hub", f"leaf{i}") for i in range(20)]
        edges = spark.createDataFrame(star, "a string, b string")
        got = {r.node: r.pr_scaled for r in pagerank_fixed(edges, iters=5).collect()}
        assert got["hub"] > got["leaf0"]
        assert len({got[f"leaf{i}"] for i in range(20)}) == 1  # symmetry

    def test_deeper_iterations_checkpoint(self, spark):
        # exercises the eager-checkpoint path (checkpoint_every=2) and that
        # iteration count changes results until convergence
        edges = spark.createDataFrame(self.EDGES, "a string, b string")
        deep = {
            r.node: r.pr_scaled
            for r in pagerank_fixed(edges, iters=6, checkpoint_every=2).collect()
        }
        assert deep == _py_pagerank(self.EDGES, iters=6)


class TestSaltedJoin:
    def _skewed(self, spark):
        rows = [(i, "hot") for i in range(500)] + [(10_000 + i, f"k{i % 5}") for i in range(50)]
        fact = spark.createDataFrame(rows, "id long, k string")
        dim = spark.createDataFrame(
            [("hot", 1), ("k0", 2), ("k1", 3), ("k2", 4)], "k string, payload int"
        )
        return fact, dim

    def test_identical_to_plain_join(self, spark):
        fact, dim = self._skewed(spark)
        got = sorted(
            tuple(r) for r in salted_join(fact, dim, "k", salts=16, salt_on=["id"]).collect()
        )
        want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
        assert got == want

    def test_left_join_preserves_unmatched(self, spark):
        fact, dim = self._skewed(spark)
        got = sorted(
            tuple(r)
            for r in salted_join(fact, dim, "k", salts=8, salt_on=["id"], how="left").collect()
        )
        want = sorted(tuple(r) for r in fact.join(dim, "k", "left").collect())
        assert got == want

    def test_salt_spreads_hot_key(self, spark):
        # the hot key's 500 rows must actually use >1 salt value — i.e. the
        # salt is doing work, not collapsing to a constant
        fact, _ = self._skewed(spark)
        n = (
            fact.filter(F.col("k") == "hot")
            .select(F.pmod(F.xxhash64("id"), F.lit(16)).alias("s"))
            .distinct()
            .count()
        )
        assert n >= 12

    def test_single_salt_degenerates_to_plain(self, spark):
        fact, dim = self._skewed(spark)
        got = sorted(tuple(r) for r in salted_join(fact, dim, "k", salts=1).collect())
        want = sorted(tuple(r) for r in fact.join(dim, "k").collect())
        assert got == want

    def test_rejects_bad_salts(self, spark):
        fact, dim = self._skewed(spark)
        with pytest.raises(ValueError):
            salted_join(fact, dim, "k", salts=0)


class TestLabelPropagation:
    """Synchronous LPA (pipeline/graph.py::label_propagation) vs a
    single-threaded python replica of the exact rule."""

    def _replica(self, edges, rounds):
        sym = edges + [(b, a) for a, b in edges]
        labels = {n: n for n, _ in sym}
        for _ in range(rounds):
            counts: dict = {}
            for s, d in sym:
                key = (d, labels[s])
                counts[key] = counts.get(key, 0) + 1
            new = {}
            for (node, label), cnt in counts.items():
                cur = new.get(node)
                if cur is None or (-cnt, label) < cur[0]:
                    new[node] = ((-cnt, label), label)
            labels = {n: v[1] for n, v in new.items()}
        return labels

    def test_two_cliques_bridge(self, spark):
        from mopper_spark.pipeline.graph import label_propagation

        clique1 = [("a1", "a2"), ("a1", "a3"), ("a2", "a3")]
        clique2 = [("b1", "b2"), ("b1", "b3"), ("b2", "b3")]
        edges = clique1 + clique2 + [("a3", "b1")]
        df = spark.createDataFrame(edges, "a string, b string")
        got = {r.node: r.label for r in label_propagation(df, rounds=3).collect()}
        assert got == self._replica(edges, 3)
        # the two cliques resolve to different communities
        assert len({got["a1"], got["a2"]} | {got["b2"], got["b3"]}) >= 2

    def test_bipartite_two_cycle_is_bounded(self, spark):
        """Synchronous LPA 2-cycles on bipartite graphs — fixed rounds must
        terminate and match the replica at every round count."""
        from mopper_spark.pipeline.graph import label_propagation

        edges = [("x1", "y1"), ("x1", "y2"), ("x2", "y1"), ("x2", "y2")]
        df = spark.createDataFrame(edges, "a string, b string")
        for rounds in (1, 2, 3):
            got = {
                r.node: r.label
                for r in label_propagation(df, rounds=rounds).collect()
            }
            assert got == self._replica(edges, rounds), rounds

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import label_propagation

        edges = [(f"n{i}", f"n{(i * 7) % 23}") for i in range(40) if i != (i * 7) % 23]
        df = spark.createDataFrame(edges, "a string, b string")
        a = sorted(map(tuple, label_propagation(df, rounds=3).collect()))
        b = sorted(
            map(tuple, label_propagation(df.repartition(11), rounds=3).collect())
        )
        assert a == b == sorted(self._replica(edges, 3).items())


class TestBfsDistances:
    def test_tree_depths_undirected(self, spark):
        from mopper_spark.pipeline.graph import bfs_distances

        # binary tree 1..15, edges child -> parent
        edges = spark.createDataFrame(
            [(i, i // 2) for i in range(2, 16)], "src long, dst long"
        )
        seeds = spark.createDataFrame([(1,)], "origin long")
        got = {
            r.node: r.dist
            for r in bfs_distances(edges, seeds, directed=False).collect()
        }
        import math

        # origin 1 is never emitted (undirected bounce 1->2->1 is not a
        # distance); every other node sits at its tree depth
        assert got == {i: int(math.floor(math.log2(i))) for i in range(2, 16)}

    def test_directed_respects_direction_and_k_hop(self, spark):
        from mopper_spark.pipeline.graph import bfs_distances

        edges = spark.createDataFrame(
            [("a", "b"), ("b", "c"), ("c", "d"), ("x", "a")],
            "src string, dst string",
        )
        seeds = spark.createDataFrame([("a",)], "origin string")
        got = {
            (r.origin, r.node): r.dist
            for r in bfs_distances(edges, seeds, max_hops=2).collect()
        }
        # directed: 'x' unreachable; k-hop: 'd' (dist 3) cut off
        assert got == {("a", "b"): 1, ("a", "c"): 2}

    def test_shortest_wins_on_diamond_with_cycle(self, spark):
        from mopper_spark.pipeline.graph import bfs_distances

        edges = spark.createDataFrame(
            [("s", "a"), ("s", "b"), ("a", "t"), ("b", "m"), ("m", "t"),
             ("t", "s")],  # cycle back
            "src string, dst string",
        )
        seeds = spark.createDataFrame([("s",)], "origin string")
        got = {
            r.node: r.dist for r in bfs_distances(edges, seeds).collect()
        }
        # the cycle walks back to the origin; self-distance is 0 by
        # definition, so 's' is never emitted
        assert got == {"a": 1, "b": 1, "t": 2, "m": 2}


class TestPagerankWeighted:
    """graph.pagerank_weighted vs an exact python replica of the same
    fixed-point share-quantized formula."""

    EDGES = [
        ("a", "b", 10), ("a", "c", 1), ("b", "c", 5),
        ("c", "d", 3), ("a", "b", 2),   # multi-edge combines to 12
    ]

    def _replica(self, edges, iters=3, scale=10**9, prec=10**6):
        from collections import defaultdict

        comb = defaultdict(int)
        for u, v, w in edges:
            if u == v:
                continue
            comb[(min(u, v), max(u, v))] += w
        directed = defaultdict(dict)
        for (u, v), w in comb.items():
            directed[u][v] = w
            directed[v][u] = w
        share = {
            (s, d): (w * prec) // sum(directed[s].values())
            for s, nbrs in directed.items()
            for d, w in nbrs.items()
        }
        pr = {n: scale for n in directed}
        base = (15 * scale) // 100
        for _ in range(iters):
            sums = defaultdict(int)
            for (s, d), sh in share.items():
                sums[d] += (pr[s] * sh) // prec
            pr = {n: base + (85 * sums[n]) // 100 for n in directed}
        return pr

    def _run(self, spark, edges, **kw):
        from mopper_spark.pipeline.graph import pagerank_weighted

        df = spark.createDataFrame(edges, "a string, b string, w long")
        return {
            r.node: r.pr_scaled
            for r in pagerank_weighted(df, **kw).collect()
        }

    def test_matches_replica_exactly(self, spark):
        assert self._run(spark, self.EDGES) == self._replica(self.EDGES)

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import pagerank_weighted

        df = spark.createDataFrame(
            [(f"n{i % 9}", f"n{(i * 5 + 1) % 9}", (i % 7) + 1) for i in range(40)],
            "a string, b string, w long",
        )
        a = {r.node: r.pr_scaled for r in pagerank_weighted(df.repartition(1)).collect()}
        b = {r.node: r.pr_scaled for r in pagerank_weighted(df.repartition(16)).collect()}
        assert a == b

    def test_weight_dominance(self, spark):
        # star: center x; y attached with weight 100, z with weight 1 —
        # y must outrank z (it receives a far larger share of x's rank)
        got = self._run(spark, [("x", "y", 100), ("x", "z", 1)])
        assert got["y"] > got["z"]


class TestKCore:
    def test_planted_core_and_cascade(self, spark):
        """A path dangling off a triangle peels away over MULTIPLE rounds
        (the cascade), leaving exactly the triangle as the 2-core."""
        from mopper_spark.pipeline.graph import k_core

        edges = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 6)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {(r.node, r.degree) for r in k_core(df, k=2).collect()}
        assert got == {(1, 2), (2, 2), (3, 2)}

    def test_empty_core(self, spark):
        """A tree has no 2-core."""
        from mopper_spark.pipeline.graph import k_core

        df = spark.createDataFrame(
            [(i, i // 2) for i in range(2, 40)], "a long, b long"
        )
        assert k_core(df, k=2).count() == 0

    def test_matches_networkx_style_replica(self, spark):
        """Python peeling replica on a mixed graph."""
        from mopper_spark.pipeline.graph import k_core

        edges = [(i, (i * 7 + 3) % 23) for i in range(60)]
        edges = [(a, b) for a, b in edges if a != b]
        df = spark.createDataFrame(edges, "a long, b long")
        got = {(r.node, r.degree) for r in k_core(df, k=3).collect()}

        adj: dict[int, set[int]] = {}
        for a, b in edges:
            adj.setdefault(a, set()).add(b)
            adj.setdefault(b, set()).add(a)
        alive = set(adj)
        while True:
            dead = {n for n in alive if sum(1 for m in adj[n] if m in alive) < 3}
            if not dead:
                break
            alive -= dead
        exp = {(n, sum(1 for m in adj[n] if m in alive)) for n in alive}
        assert got == exp

    def test_partitioning_invariance_and_validation(self, spark):
        import pytest

        from mopper_spark.pipeline.graph import k_core

        edges = [(i, (i * 5 + 1) % 17) for i in range(40) if i != (i * 5 + 1) % 17]
        df = spark.createDataFrame(edges, "a long, b long")
        a = sorted(map(tuple, k_core(df, k=2).collect()))
        b = sorted(map(tuple, k_core(df.repartition(7), k=2).collect()))
        assert a == b
        with pytest.raises(ValueError):
            k_core(df, k=0)


class TestPersonalizedPagerank:
    def test_matches_python_replica(self, spark):
        from mopper_spark.pipeline.graph import personalized_pagerank

        edges = [(1, 2), (2, 3), (3, 4), (4, 1), (2, 4)]
        df = spark.createDataFrame(edges, "a long, b long")
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.pr_scaled
               for r in personalized_pagerank(df, seeds, iters=3).collect()}

        sym = edges + [(b, a) for a, b in edges]
        from collections import defaultdict
        out_deg = defaultdict(int)
        for s, _ in sym:
            out_deg[s] += 1
        scale, base = 10**9, (15 * 10**9) // 100
        pr = {n: (scale if n == 1 else 0) for n in out_deg}
        for _ in range(3):
            sums = defaultdict(int)
            for s, d in sym:
                sums[d] += pr[s] // out_deg[s]
            pr = {n: (base if n == 1 else 0) + (85 * sums[n]) // 100
                  for n in out_deg}
        assert got == pr

    def test_mass_concentrates_near_seed(self, spark):
        """The seed's neighbor outranks a node 3 hops away."""
        from mopper_spark.pipeline.graph import personalized_pagerank

        chain = [(i, i + 1) for i in range(1, 8)]
        df = spark.createDataFrame(chain, "a long, b long")
        seeds = spark.createDataFrame([(1,)], "node long")
        got = {r.node: r.pr_scaled
               for r in personalized_pagerank(df, seeds, iters=3).collect()}
        assert got[2] > got[4] > got[6]

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import personalized_pagerank

        edges = [(i, (i * 5 + 1) % 31) for i in range(60) if i != (i * 5 + 1) % 31]
        df = spark.createDataFrame(edges, "a long, b long")
        seeds = spark.createDataFrame([(0,)], "node long")
        a = sorted(map(tuple, personalized_pagerank(df, seeds).collect()))
        b = sorted(map(tuple,
                       personalized_pagerank(df.repartition(7), seeds).collect()))
        assert a == b


class TestTextrankKeywords:
    def test_hub_token_wins(self, spark):
        """A token adjacent to many distinct tokens outranks peripherals."""
        from mopper_spark.textops.ranking import textrank_keywords

        rows = [(i, f"hub w{i}") for i in range(10)]  # hub adjacent to 10 tokens
        rows += [(100, "w0 w1"), (101, "w2 w3")]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        top = textrank_keywords(df, top_k=3).collect()
        assert top[0].node == "hub"

    def test_matches_python_replica(self, spark):
        from collections import defaultdict

        from mopper_spark.textops.ranking import textrank_keywords

        texts = ["a b c a", "b c d", "d e"]
        df = spark.createDataFrame(
            [(i, t) for i, t in enumerate(texts)], "doc_id long, text string")
        got = [(r.node, r.pr_scaled) for r in textrank_keywords(df, top_k=10).collect()]

        edges = set()
        for t in texts:
            tk = t.split()
            for i in range(len(tk) - 1):
                u, v = sorted((tk[i], tk[i + 1]))
                if u != v:
                    edges.add((u, v))
        sym = list(edges) + [(v, u) for u, v in edges]
        out_deg = defaultdict(int)
        for s, _ in sym:
            out_deg[s] += 1
        scale, base = 10**9, (15 * 10**9) // 100
        pr = {n: scale for n in out_deg}
        for _ in range(3):
            sums = defaultdict(int)
            for s, d in sym:
                sums[d] += pr[s] // out_deg[s]
            pr = {n: base + (85 * sums[n]) // 100 for n in out_deg}
        exp = sorted(pr.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        assert got == exp


class TestShortestPathWitness:
    def test_picks_shorter_and_lexeographic_path(self, spark):
        from mopper_spark.pipeline.graph import shortest_path_witness

        edges = [(1, 2), (2, 3), (3, 4), (1, 5), (5, 4), (4, 6)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = sorted(map(tuple, shortest_path_witness(df, 1, 6).collect()))
        assert got == [(0, 1), (1, 5), (2, 4), (3, 6)]

    def test_tie_break_min_parent(self, spark):
        """Two equal-length paths: parents resolve to the MIN neighbor."""
        from mopper_spark.pipeline.graph import shortest_path_witness

        edges = [(1, 2), (1, 3), (2, 4), (3, 4)]
        df = spark.createDataFrame(edges, "a long, b long")
        got = sorted(map(tuple, shortest_path_witness(df, 1, 4).collect()))
        assert got == [(0, 1), (1, 2), (2, 4)]  # via 2, not 3

    def test_unreachable_and_self(self, spark):
        from mopper_spark.pipeline.graph import shortest_path_witness

        df = spark.createDataFrame([(1, 2), (3, 4)], "a long, b long")
        assert shortest_path_witness(df, 1, 4).count() == 0
        assert [tuple(r) for r in shortest_path_witness(df, 1, 1).collect()] == [(0, 1)]


class TestDegreeAssortativity:
    def test_star_is_disassortative_clique_is_flat(self, spark):
        from mopper_spark.pipeline.graph import degree_assortativity

        star = spark.createDataFrame([(0, i) for i in range(1, 8)], "a long, b long")
        (rs,) = degree_assortativity(star).collect()
        assert rs.r < -0.99  # perfect star: r = -1
        clique = spark.createDataFrame(
            [(i, j) for i in range(5) for j in range(i + 1, 5)], "a long, b long")
        (rc,) = degree_assortativity(clique).collect()
        assert rc.r == 0.0  # all degrees equal: zero variance guard

    def test_matches_python_replica(self, spark):
        import math
        from collections import defaultdict

        from mopper_spark.pipeline.graph import degree_assortativity

        edges = [(i, (i * 7 + 1) % 19) for i in range(40)]
        edges = [(x, y) for x, y in edges if x != y]
        df = spark.createDataFrame(edges, "a long, b long")
        (row,) = degree_assortativity(df).collect()

        e = {(min(x, y), max(x, y)) for x, y in edges}
        sym = list(e) + [(v, u) for u, v in e]
        deg = defaultdict(int)
        for u, _ in sym:
            deg[u] += 1
        xs = [deg[u] for u, _ in sym]
        ys = [deg[v] for _, v in sym]
        k = len(sym)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        r = (k * sxy - sx * sy) / (
            math.sqrt(float(k * sxx - sx * sx)) * math.sqrt(float(k * syy - sy * sy)))
        assert (row.k, row.sx, row.sy, row.sxy, row.sxx, row.syy) == (k, sx, sy, sxy, sxx, syy)
        assert row.r == r


class TestClusteringCoefficients:
    def test_triangle_pendant_values(self, spark):
        from mopper_spark.pipeline.graph import clustering_coefficients

        df = spark.createDataFrame([(1, 2), (2, 3), (3, 1), (3, 4)], "a long, b long")
        got = {r.node: (r.degree, r.n_triangles, r.cc)
               for r in clustering_coefficients(df).collect()}
        assert got[1] == (2, 1, 1.0)
        assert got[2] == (2, 1, 1.0)
        assert got[3] == (3, 1, 2 / 6)
        assert got[4] == (1, 0, 0.0)

    def test_matches_networkx_style_replica(self, spark):
        from collections import defaultdict
        from itertools import combinations

        from mopper_spark.pipeline.graph import clustering_coefficients

        edges = {(min(a, b), max(a, b))
                 for a, b in ((i, (i * 7 + 3) % 23) for i in range(60)) if a != b}
        df = spark.createDataFrame(sorted(edges), "a long, b long")
        got = {r.node: (r.degree, r.n_triangles, r.cc)
               for r in clustering_coefficients(df).collect()}

        adj = defaultdict(set)
        for a, b in edges:
            adj[a].add(b)
            adj[b].add(a)
        for n, nbrs in adj.items():
            t = sum(1 for x, y in combinations(sorted(nbrs), 2) if y in adj[x])
            d = len(nbrs)
            cc = 2.0 * t / (d * (d - 1)) if d >= 2 else 0.0
            assert got[n] == (d, t, cc), n


class TestLinkPrediction:
    """graph.link_prediction — common-neighbors + Adamic-Adar."""

    def test_hand_computed(self, spark):
        import math

        from mopper_spark.pipeline.graph import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
        )
        got = {(r.u, r.v): r for r in link_prediction(edges).collect()}
        # only apex 3 (deg 3) closes non-adjacent wedges: (1,4) and (2,4)
        assert set(got) == {(1, 4), (2, 4)}
        w3 = math.floor(1e9 / math.log(3.0))
        for k in got:
            assert got[k].common_neighbors == 1
            assert got[k].aa_fp == w3
            assert abs(got[k].aa - 1.0 / math.log(3.0)) < 1e-6

    def test_adjacent_pairs_excluded_and_cap(self, spark):
        from mopper_spark.pipeline.graph import link_prediction

        edges = spark.createDataFrame(
            [(1, 2), (1, 3), (2, 3), (3, 4)], "a long, b long"
        )
        full = link_prediction(edges).collect()
        assert all((r.u, r.v) not in {(1, 2), (1, 3), (2, 3), (3, 4)} for r in full)
        # cap 2 excludes the only productive apex (deg 3) -> empty
        assert link_prediction(edges, max_apex_degree=2).count() == 0

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import link_prediction

        e = spark.createDataFrame(
            [(i % 23, (i * 7 + 3) % 23) for i in range(120)], "a long, b long"
        )
        x = sorted(map(tuple, link_prediction(e).collect()))
        y = sorted(map(tuple, link_prediction(e.repartition(17)).collect()))
        assert x == y and len(x) > 5


class TestRandomWalks:
    """graph.random_walks — deterministic DeepWalk corpus."""

    def test_matches_python_replica(self, spark):
        import hashlib

        from mopper_spark.pipeline.graph import random_walks

        raw = [(1, 2), (2, 3), (3, 1), (3, 4)]
        edges = spark.createDataFrame(raw, "a long, b long")
        adj = {}
        for u, v in raw:
            adj.setdefault(u, set()).add(v)
            adj.setdefault(v, set()).add(u)

        def pick(walk_id, t, neighbors):
            key = lambda d: (
                hashlib.md5(f"walk-v1:{walk_id}:{t}:{d}".encode()).hexdigest(),
                str(d),
            )
            return min(neighbors, key=key)

        want = {}
        for node in adj:
            for w in range(2):
                wid = f"{node}#{w}"
                cur = node
                want[(wid, 0)] = cur
                for t in range(1, 5):
                    cur = pick(wid, t, adj[cur])
                    want[(wid, t)] = cur
        got = {(r.walk_id, r.step): r.node
               for r in random_walks(edges, walk_len=4, walks_per_node=2).collect()}
        assert got == want

    def test_partitioning_invariance_and_shape(self, spark):
        import pytest

        from mopper_spark.pipeline.graph import random_walks

        e = spark.createDataFrame(
            [(i % 13, (i * 5 + 1) % 13) for i in range(40)], "a long, b long"
        )
        a = sorted(map(tuple, random_walks(e, walk_len=3).collect()))
        b = sorted(map(tuple, random_walks(e.repartition(7), walk_len=3).collect()))
        assert a == b
        n_nodes = len({x for p in e.collect() for x in p if True})
        # every walk has exactly walk_len+1 steps (undirected: no dead ends)
        from collections import Counter

        per_walk = Counter(w for (w, _, _) in a)
        assert set(per_walk.values()) == {4}
        with pytest.raises(ValueError):
            random_walks(e, walk_len=0)


class TestReciprocalRankFusion:
    def test_fusion_replica_and_absent_lists(self, spark):
        """Doc in both lists beats docs in one; absent-list contribution is
        exactly 0; ties broken by ascending id; k=60 closed form."""
        from mopper_spark.textops.ranking import reciprocal_rank_fusion

        a = spark.createDataFrame(
            [(10, 1), (11, 2), (12, 3)], "doc_id long, rank long"
        )
        b = spark.createDataFrame(
            [(12, 1), (13, 2), (11, 3)], "doc_id long, rank long"
        )
        out = reciprocal_rank_fusion({"lex": a, "dense": b}, top=4).collect()
        got = {r.doc_id: (r.rrf, r.rank) for r in out}
        exp = {
            10: 1 / 61,
            11: 1 / 62 + 1 / 63,
            12: 1 / 63 + 1 / 61,
            13: 1 / 62,
        }
        for d, s in exp.items():
            assert got[d][0] == s
        order = [r.doc_id for r in sorted(out, key=lambda r: r.rank)]
        assert order == [12, 11, 10, 13]  # 12 > 11 > 10 (=1/61 > 13's 1/62)

    def test_requires_a_list(self, spark):
        from mopper_spark.textops.ranking import reciprocal_rank_fusion

        with pytest.raises(ValueError):
            reciprocal_rank_fusion({})


class TestKTruss:
    def test_clique_survives_pendant_triangle_peels(self, spark):
        """K5 is a 4-truss (every edge closes 3 triangles); a triangle
        hanging off one K5 node peels (its edges close only 1), and the
        removal CASCADES — the bridge edges die once the pendant goes."""
        from mopper_spark.pipeline.graph import k_truss

        k5 = [(i, j) for i in range(1, 6) for j in range(i + 1, 6)]
        pendant = [(5, 10), (5, 11), (10, 11)]
        df = spark.createDataFrame(k5 + pendant, "a long, b long")
        got = {(r.u, r.v, r.supp) for r in k_truss(df, k=4).collect()}
        assert got == {(u, v, 3) for u, v in k5}

    def test_truss_vs_core_on_hub_and_spoke(self, spark):
        """Two triangles sharing a hub: every node is in the 2-core at
        k=3-ish density, but NO edge closes 2 triangles — the 4-truss is
        empty while the 4-clique sub-case survives."""
        from mopper_spark.pipeline.graph import k_truss

        bowtie = [(1, 2), (2, 3), (3, 1), (3, 4), (4, 5), (5, 3)]
        df = spark.createDataFrame(bowtie, "a long, b long")
        assert k_truss(df, k=4).count() == 0
        # each bowtie edge closes exactly one triangle → 3-truss = all 6
        got3 = {(r.u, r.v, r.supp) for r in k_truss(df, k=3).collect()}
        assert got3 == {(min(a, b), max(a, b), 1) for a, b in bowtie}

    def test_matches_python_peeling_replica(self, spark):
        from itertools import combinations

        from mopper_spark.pipeline.graph import k_truss

        edges = sorted(
            {
                (min(a, b), max(a, b))
                for a, b in ((i, (i * 7 + 3) % 23) for i in range(60))
                if a != b
            }
        )
        df = spark.createDataFrame(edges, "a long, b long")
        got = {(r.u, r.v, r.supp) for r in k_truss(df, k=3).collect()}

        es = set(edges)
        while True:
            adj: dict[int, set[int]] = {}
            for a, b in es:
                adj.setdefault(a, set()).add(b)
                adj.setdefault(b, set()).add(a)
            supp = {
                (a, b): sum(1 for c in adj[a] & adj[b]) for a, b in es
            }
            dead = {e for e, s in supp.items() if s < 1}
            if not dead:
                break
            es -= dead
        assert got == {(a, b, supp[(a, b)]) for a, b in es}

    def test_partitioning_invariance_and_validation(self, spark):
        import pytest

        from mopper_spark.pipeline.graph import k_truss

        edges = [(i, (i * 5 + 1) % 17) for i in range(50) if i != (i * 5 + 1) % 17]
        df = spark.createDataFrame(edges, "a long, b long")
        one = {tuple(r) for r in k_truss(df.coalesce(1), k=3).collect()}
        many = {tuple(r) for r in k_truss(df.repartition(16), k=3).collect()}
        assert one == many
        with pytest.raises(ValueError):
            k_truss(df, k=2)


class TestModularity:
    def test_two_cliques_closed_form(self, spark):
        """Two K4s joined by one bridge: LPA (3 rounds) labels each clique
        uniformly; modularity matches the hand-computed closed form and
        is strongly positive."""
        from mopper_spark.pipeline.graph import label_propagation, modularity

        k4a = [(i, j) for i in range(1, 5) for j in range(i + 1, 5)]
        k4b = [(i, j) for i in range(11, 15) for j in range(i + 1, 15)]
        edges = k4a + k4b + [(4, 11)]
        df = spark.createDataFrame(edges, "a long, b long")
        comm = label_propagation(df, rounds=3)
        got = {
            r.community: (r.n_nodes, r.m_intra, r.d_c, r.q_num, r.q_den)
            for r in modularity(df, comm).collect()
        }
        assert len(got) == 2
        m = 13  # 6 + 6 + 1 edges
        for n_nodes, m_intra, d_c, q_num, q_den in got.values():
            assert n_nodes == 4 and m_intra == 6
            assert d_c == 13  # 4 nodes × deg 3 + the bridge endpoint's +1
            assert q_num == 4 * m * m_intra - d_c * d_c
            assert q_den == 4 * m * m
            assert q_num > 0
        # total Q = Σ q_num / q_den ≈ 0.46 — strong structure
        assert sum(v[3] for v in got.values()) / (4 * m * m) > 0.4

    def test_single_community_is_zero(self, spark):
        """All nodes in one community ⇒ Q = 0 exactly (m_c = m, d_c = 2m)."""
        from mopper_spark.pipeline.graph import modularity

        edges = [(1, 2), (2, 3), (3, 1), (3, 4)]
        df = spark.createDataFrame(edges, "a long, b long")
        comm = spark.createDataFrame(
            [(i, 0) for i in range(1, 5)], "node long, label long"
        )
        rows = modularity(df, comm).collect()
        assert len(rows) == 1 and rows[0].q_num == 0

    def test_partitioning_invariance(self, spark):
        from mopper_spark.pipeline.graph import label_propagation, modularity

        edges = [(i, (i * 7 + 3) % 23) for i in range(60) if i != (i * 7 + 3) % 23]
        df = spark.createDataFrame(edges, "a long, b long")
        comm1 = label_propagation(df.coalesce(1), rounds=3)
        comm2 = label_propagation(df.repartition(16), rounds=3)
        one = {tuple(r) for r in modularity(df.coalesce(1), comm1).collect()}
        many = {tuple(r) for r in modularity(df.repartition(16), comm2).collect()}
        assert one == many


class TestReviewFixes:
    def test_ktruss_exhaustion_keeps_zero_support_edges(self, spark):
        """max_rounds exhaustion must not silently drop surviving edges
        with no triangles — they come back with supp 0 (reviewer
        finding)."""
        from mopper_spark.pipeline.graph import k_truss

        edges = [(1, 2), (2, 3), (3, 1), (3, 4)]  # triangle + pendant
        df = spark.createDataFrame(edges, "a long, b long")
        got = {(r.u, r.v): r.supp for r in k_truss(df, k=3, max_rounds=0).collect()}
        assert got == {(1, 2): 1, (2, 3): 1, (1, 3): 1, (3, 4): 0}

    def test_modularity_isolated_nodes_counted(self, spark):
        """An assignment covering degree-0 nodes keeps them in n_nodes,
        and an all-isolated community emits its zero row (reviewer
        finding)."""
        from mopper_spark.pipeline.graph import modularity

        edges = [(1, 2)]
        df = spark.createDataFrame(edges, "a long, b long")
        comm = spark.createDataFrame(
            [(1, 0), (2, 0), (9, 0), (7, 1), (8, 1)], "node long, label long"
        )
        got = {
            r.community: (r.n_nodes, r.m_intra, r.d_c, r.q_num)
            for r in modularity(df, comm).collect()
        }
        assert got[0] == (3, 1, 2, 4 * 1 * 1 - 4)
        assert got[1] == (2, 0, 0, 0)


class TestPerplexityBuckets:
    def test_equal_count_bands_and_ordering(self, spark):
        from mopper_spark.textops.ranking import perplexity_buckets

        train = spark.createDataFrame(
            [(100 + i, "the cat sat on the mat") for i in range(5)],
            "doc_id long, text string",
        )
        score = spark.createDataFrame(
            [
                (1, "the cat sat"),          # in-distribution: low xent
                (2, "the cat sat on"),
                (3, "zeb qux flurg"),        # OOV everywhere: high xent
                (4, "mat the cat"),
                (5, "qux the zeb on flurg"),
                (6, "on the mat"),
            ],
            "doc_id long, text string",
        )
        out = perplexity_buckets(train, score).collect()
        assert len(out) == 6
        by_bucket = {}
        for r in out:
            by_bucket.setdefault(r.bucket, []).append(r.xm_fp)
        # equal-count thirds
        assert [len(by_bucket[b]) for b in (0, 1, 2)] == [2, 2, 2]
        # bands are ordered: every head xm <= every tail xm
        assert max(by_bucket[0]) <= min(by_bucket[2])
        # the OOV docs land in the tail
        tail_ids = {r.doc_id for r in out if r.bucket == 2}
        assert 3 in tail_ids and 5 in tail_ids

    def test_zero_bigram_docs_excluded_and_validation(self, spark):
        import pytest as _pt

        from mopper_spark.textops.ranking import perplexity_buckets

        train = spark.createDataFrame(
            [(9, "a b a b")], "doc_id long, text string"
        )
        score = spark.createDataFrame(
            [(1, "a b"), (2, "single")], "doc_id long, text string"
        )
        out = perplexity_buckets(train, score).collect()
        assert {r.doc_id for r in out} == {1}
        with _pt.raises(ValueError):
            perplexity_buckets(train, score, n_buckets=1)
