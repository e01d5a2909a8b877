"""Exact-integer rank statistics (textops/rankstats.py): brute-force
python replicas over tied fixtures, plus partitioning invariance."""

import random

import pytest


def _fixture_pairs(n=200, seed=7):
    rnd = random.Random(seed)
    # heavy ties on both axes, correlated with noise, some negatives
    return [
        (v := rnd.randrange(-5, 15), (v * 2 + rnd.randrange(-4, 5)) // 3)
        for _ in range(n)
    ]


def _brute_mw(vals_a, vals_b):
    u2 = 0
    for a in vals_a:
        for b in vals_b:
            if a > b:
                u2 += 2
            elif a == b:
                u2 += 1
    from collections import Counter

    ties = Counter(vals_a + vals_b)
    cubes = sum(t**3 - t for t in ties.values())
    return u2, cubes


def _ranks2(vals):
    srt = sorted(vals)
    from collections import Counter

    cnt = Counter(vals)
    below = {}
    seen = 0
    for v in sorted(cnt):
        below[v] = seen
        seen += cnt[v]
    assert seen == len(srt)
    return [2 * below[v] + cnt[v] + 1 for v in vals]


class TestMannWhitney:
    def test_matches_bruteforce_with_ties(self, spark):
        from mopper_spark.textops.rankstats import mann_whitney_u

        pairs = _fixture_pairs()
        rows = [(x, 1 if i % 3 == 0 else 0) for i, (x, _) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "v long, grp int")
        got = mann_whitney_u(df, "v", "grp", bucket_width=4).collect()[0]
        vals_a = [x for x, g in rows if g]
        vals_b = [x for x, g in rows if not g]
        u2a, cubes = _brute_mw(vals_a, vals_b)
        assert (got.n_a, got.n_b) == (len(vals_a), len(vals_b))
        assert got.u2x_a == u2a
        assert got.u2x_b == 2 * len(vals_a) * len(vals_b) - u2a
        assert got.tie_cubes == cubes

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.rankstats import mann_whitney_u

        rows = [(x, i % 2) for i, (x, _) in enumerate(_fixture_pairs(150, 3))]
        df1 = spark.createDataFrame(rows, "v long, grp int").repartition(1)
        df7 = spark.createDataFrame(rows, "v long, grp int").repartition(7)
        r1 = mann_whitney_u(df1, "v", "grp").collect()[0]
        r7 = mann_whitney_u(df7, "v", "grp", bucket_width=2).collect()[0]
        assert r1 == r7


class TestKS:
    def test_matches_bruteforce_with_ties(self, spark):
        from mopper_spark.textops.rankstats import ks_statistic

        pairs = _fixture_pairs(180, 5)
        rows = [(x, 1 if i % 4 == 0 else 0) for i, (x, _) in enumerate(pairs)]
        df = spark.createDataFrame(rows, "v long, grp int")
        got = ks_statistic(df, "v", "grp", bucket_width=3).collect()[0]
        va = sorted(x for x, g in rows if g)
        vb = sorted(x for x, g in rows if not g)
        na, nb = len(va), len(vb)
        best, at = -1, None
        for v in sorted(set(va + vb)):
            ca = sum(1 for x in va if x <= v)
            cb = sum(1 for x in vb if x <= v)
            gap = abs(nb * ca - na * cb)
            if gap > best:
                best, at = gap, v
        assert (got.n_a, got.n_b) == (na, nb)
        assert got.d_num == best
        assert got.at_v == at

    def test_identical_distributions_gap_zero_somewhere(self, spark):
        from mopper_spark.textops.rankstats import ks_statistic

        rows = [(i % 10, g) for i in range(100) for g in (0, 1)]
        got = ks_statistic(
            spark.createDataFrame(rows, "v long, grp int"), "v", "grp"
        ).collect()[0]
        assert got.d_num == 0 and got.at_v == 0  # tie-break: smallest v


class TestSpearman:
    def test_matches_bruteforce_with_ties(self, spark):
        from mopper_spark.textops.rankstats import spearman_terms

        pairs = _fixture_pairs()
        df = spark.createDataFrame(pairs, "x long, y long")
        got = spearman_terms(df, "x", "y", bucket_width=4).collect()[0]
        rx = _ranks2([x for x, _ in pairs])
        ry = _ranks2([y for _, y in pairs])
        n = len(pairs)
        assert got.n == n
        assert sum(rx) == n * (n + 1) and sum(ry) == n * (n + 1)
        m = n + 1
        assert got.num == sum((a - m) * (b - m) for a, b in zip(rx, ry))
        assert got.den_x == sum((a - m) ** 2 for a in rx)
        assert got.den_y == sum((b - m) ** 2 for b in ry)

    def test_perfect_monotone_gives_equal_terms(self, spark):
        from mopper_spark.textops.rankstats import spearman_terms

        rows = [(i, i * 3 - 7) for i in range(50)]
        got = spearman_terms(
            spark.createDataFrame(rows, "x long, y long"), "x", "y"
        ).collect()[0]
        assert got.num == got.den_x == got.den_y > 0  # rho exactly 1


class TestKendall:
    def test_matches_bruteforce_with_ties(self, spark):
        from mopper_spark.textops.rankstats import kendall_tau_counts

        pairs = _fixture_pairs(120, 11)
        df = spark.createDataFrame(pairs, "x long, y long")
        got = kendall_tau_counts(df, "x", "y").collect()[0]
        c = d = tx = ty = tb = 0
        for i in range(len(pairs)):
            for j in range(i + 1, len(pairs)):
                (x1, y1), (x2, y2) = pairs[i], pairs[j]
                if x1 == x2 and y1 == y2:
                    tb += 1
                elif x1 == x2:
                    tx += 1
                elif y1 == y2:
                    ty += 1
                elif (x1 < x2) == (y1 < y2):
                    c += 1
                else:
                    d += 1
        assert (
            got.concordant,
            got.discordant,
            got.ties_x_only,
            got.ties_y_only,
            got.ties_both,
        ) == (c, d, tx, ty, tb)
        total = len(pairs) * (len(pairs) - 1) // 2
        assert c + d + tx + ty + tb == total

    def test_max_cells_guard(self, spark):
        from mopper_spark.textops.rankstats import kendall_tau_counts

        df = spark.createDataFrame(
            [(i, i) for i in range(20)], "x long, y long"
        )
        with pytest.raises(ValueError, match="max_cells"):
            kendall_tau_counts(df, "x", "y", max_cells=5)


class TestGini:
    def test_matches_bruteforce(self, spark):
        from mopper_spark.textops.rankstats import gini_terms

        vals = [1, 1, 2, 3, 3, 3, 10, 40, 40, 100]
        got = gini_terms(
            spark.createDataFrame([(v,) for v in vals], "v long"), "v",
            bucket_width=3,
        ).collect()[0]
        xs = sorted(vals)
        n, s = len(xs), sum(xs)
        w = sum((i + 1) * x for i, x in enumerate(xs))
        assert (got.n, got.total) == (n, s)
        assert got.g_num == 2 * w - (n + 1) * s
        # sanity: 0 <= G < 1
        assert 0 <= got.g_num < n * s

    def test_uniform_is_zero_and_partition_invariance(self, spark):
        from mopper_spark.textops.rankstats import gini_terms

        rows = [(7,) for _ in range(50)]
        df = spark.createDataFrame(rows, "v long")
        got = gini_terms(df, "v").collect()[0]
        assert got.g_num == 0
        r1 = gini_terms(df.repartition(1), "v", bucket_width=2).collect()[0]
        r7 = gini_terms(df.repartition(7), "v", bucket_width=64).collect()[0]
        assert tuple(r1) == tuple(r7) == tuple(got)


class TestGroupedMidrank:
    def test_matches_bruteforce_with_ties(self, spark):
        from mopper_spark.textops.rankstats import grouped_midrank

        rows = [("a", v) for v in [5, 5, 7, 9, 9, 9, 12]] + [
            ("b", v) for v in [1, 1, 1, 4]
        ]
        df = spark.createDataFrame(rows, "src string, v long")
        got = {
            (r.src, r.v): (r.m, r.rank2, r.n)
            for r in grouped_midrank(df, "src", "v", bucket_width=2).collect()
        }
        import collections
        bysrc = collections.defaultdict(list)
        for s, v in rows:
            bysrc[s].append(v)
        want = {}
        for s, vs in bysrc.items():
            for v in set(vs):
                below = sum(1 for x in vs if x < v)
                m = vs.count(v)
                want[(s, v)] = (m, 2 * below + m + 1, len(vs))
        assert got == want
        # spot: midrank of the 9-run in 'a' is ranks 4..6 -> mid 5 -> rank2 10
        assert got[("a", 9)] == (3, 10, 7)

    def test_partition_invariance(self, spark):
        from mopper_spark.textops.rankstats import grouped_midrank

        rows = [("g%d" % (i % 3), (i * 7) % 23) for i in range(200)]
        df = spark.createDataFrame(rows, "src string, v long")
        a = sorted(map(tuple, grouped_midrank(df, "src", "v", bucket_width=3).collect()))
        b = sorted(map(tuple, grouped_midrank(df.repartition(11), "src", "v", bucket_width=64).collect()))
        assert a == b
