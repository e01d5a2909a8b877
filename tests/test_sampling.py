"""Deterministic per-group sampling (textops/sampling.py)."""

import pytest
from pyspark.sql import functions as F

class TestSamplePerGroup:
    """sampling.sample_per_group — deterministic bottom-k-of-hash."""

    def _docs(self, spark, n=60):
        return spark.createDataFrame(
            [(f"s{i % 4}", f"doc{i}") for i in range(n)],
            "source string, doc_id string",
        )

    def test_k_per_group_and_determinism(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        df = self._docs(spark)
        out = sample_per_group(df, ["source"], F.col("doc_id"), k=5)
        rows = out.collect()
        from collections import Counter

        per = Counter(r.source for r in rows)
        assert set(per.values()) == {5}
        again = {
            tuple(r)
            for r in sample_per_group(
                df.repartition(16), ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        assert again == {tuple(r) for r in rows}

    def test_growth_stability(self, spark):
        """Adding corpus never swaps a kept row for a hash-LARGER one:
        the kept set of the grown corpus restricted to old rows is a
        prefix-superset relation — every survivor from the grown run
        that existed before was also kept before."""
        from mopper_spark.textops.sampling import sample_per_group

        small, big = self._docs(spark, 40), self._docs(spark, 80)
        keep_small = {
            r.doc_id
            for r in sample_per_group(
                small, ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        keep_big = {
            r.doc_id
            for r in sample_per_group(
                big, ["source"], F.col("doc_id"), k=5
            ).collect()
        }
        old_ids = {f"doc{i}" for i in range(40)}
        assert keep_big & old_ids <= keep_small

    def test_small_group_kept_whole(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        df = spark.createDataFrame(
            [("a", "x"), ("a", "y")], "source string, doc_id string"
        )
        assert sample_per_group(df, ["source"], F.col("doc_id"), k=5).count() == 2

    def test_k_zero_refused(self, spark):
        from mopper_spark.textops.sampling import sample_per_group

        with pytest.raises(ValueError, match="k must be"):
            sample_per_group(self._docs(spark), ["source"], F.col("doc_id"), k=0)


class TestWeightedSample:
    def test_matches_python_replica(self, spark):
        import hashlib
        import math

        from mopper_spark.textops.sampling import weighted_sample

        rows = [(i, (i % 7) + 1) for i in range(50)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        got = [tuple(r) for r in weighted_sample(df, "w", k=10, seed="s").collect()]

        keyed = []
        for i, w in rows:
            h = int(hashlib.md5(f"s{i}".encode()).hexdigest()[:12], 16)
            u = (h + 1) / 2**48
            keyed.append((i, w, math.floor(1e6 * math.log(u) / w)))
        keyed.sort(key=lambda r: (-r[2], r[0]))
        assert got == keyed[:10]

    def test_heavier_rows_oversampled(self, spark):
        """Across many disjoint seeds, weight-1000 rows appear far more
        often than weight-1 rows — the A-ES inclusion-probability
        direction (deterministic per seed, so this is exact replay, not
        a flaky statistical test)."""
        from mopper_spark.textops.sampling import weighted_sample

        rows = [(i, 1000 if i < 10 else 1) for i in range(110)]
        df = spark.createDataFrame(rows, "doc_id long, w long")
        heavy = 0
        for s in range(8):
            out = weighted_sample(df, "w", k=10, seed=f"seed{s}").collect()
            heavy += sum(1 for r in out if r.w == 1000)
        assert heavy >= 8 * 10 * 0.6  # heavy rows dominate the samples

    def test_nonpositive_weights_excluded_and_validation(self, spark):
        import pytest

        from mopper_spark.textops.sampling import weighted_sample

        df = spark.createDataFrame([(1, 0), (2, -3), (3, 5)], "doc_id long, w long")
        out = weighted_sample(df, "w", k=10).collect()
        assert [r.id for r in out] == [3]
        with pytest.raises(ValueError):
            weighted_sample(df, "w", k=0)


class TestStratifiedSplit:
    """sampling.stratified_split — exact floor-boundary stratification."""

    def _docs(self, spark, per=20, strata=3):
        return spark.createDataFrame(
            [(f"s{i % strata}", i) for i in range(per * strata)],
            "source string, doc_id long",
        )

    def test_exact_counts_per_stratum(self, spark):
        from collections import Counter

        from mopper_spark.textops.sampling import stratified_split

        out = stratified_split(self._docs(spark), "source", "doc_id").collect()
        per = Counter((r.source, r.split) for r in out)
        for s in ("s0", "s1", "s2"):  # n=20 -> floor(16)/floor(2)/rest
            assert per[(s, "train")] == 16
            assert per[(s, "val")] == 2
            assert per[(s, "test")] == 2

    def test_tiny_stratum_still_exact(self, spark):
        """n=3 stratum: floor(3*.8)=2 train, floor(3*.9)-2=0 val, 1 test —
        hash_split could give 3/0/0; the exact split cannot."""
        from collections import Counter

        from mopper_spark.textops.sampling import stratified_split

        df = spark.createDataFrame(
            [("only", i) for i in range(3)], "source string, doc_id long"
        )
        per = Counter(
            r.split for r in stratified_split(df, "source", "doc_id").collect()
        )
        assert per == {"train": 2, "test": 1}

    def test_deterministic_and_partitioning_invariant(self, spark):
        import pytest

        from mopper_spark.textops.sampling import stratified_split

        df = self._docs(spark)
        a = sorted(map(tuple, stratified_split(df, "source", "doc_id").collect()))
        b = sorted(
            map(
                tuple,
                stratified_split(df.repartition(17), "source", "doc_id").collect(),
            )
        )
        assert a == b
        with pytest.raises(ValueError):
            stratified_split(df, "source", "doc_id", splits={})


class TestShuffleRank:
    def test_matches_python_replica_and_is_stable(self, spark):
        import hashlib
        from mopper_spark.textops.sampling import shuffle_rank

        keys = [f"doc{i}" for i in range(200)]
        df = spark.createDataFrame([(k,) for k in keys], "doc_id string")
        got = {r.doc_id: r.ord for r in shuffle_rank(df, "doc_id", "s1").collect()}
        want_order = sorted(
            keys, key=lambda k: (hashlib.md5(f"s1{k}".encode()).hexdigest(), k)
        )
        assert got == {k: i for i, k in enumerate(want_order)}
        # partition-invariant
        got7 = {
            r.doc_id: r.ord
            for r in shuffle_rank(df.repartition(7), "doc_id", "s1").collect()
        }
        assert got7 == got

    def test_seed_changes_permutation_and_ties_break_on_key(self, spark):
        from mopper_spark.textops.sampling import shuffle_rank

        df = spark.createDataFrame([(f"d{i}",) for i in range(50)], "doc_id string")
        a = {r.doc_id: r.ord for r in shuffle_rank(df, "doc_id", "a").collect()}
        b = {r.doc_id: r.ord for r in shuffle_rank(df, "doc_id", "b").collect()}
        assert a != b and sorted(a.values()) == sorted(b.values()) == list(range(50))
        # duplicate keys: both copies ranked adjacently, total order still
        dup = spark.createDataFrame([("x",), ("x",), ("y",)], "doc_id string")
        ords = sorted(r.ord for r in shuffle_rank(dup, "doc_id", "a").collect())
        assert ords == [0, 1, 2]


class TestPoissonBootstrap:
    def test_matches_python_replica(self, spark):
        import hashlib
        from mopper_spark.textops.sampling import poisson_bootstrap, poisson_thresholds

        rows = [(f"d{i}", 10.0 + i * 0.25) for i in range(60)]
        df = spark.createDataFrame(rows, "doc_id string, v double")
        got = {
            r.rep: (r.n_eff, r.sum_fp)
            for r in poisson_bootstrap(
                df, "doc_id", "v", replicates=5, seed="s"
            ).collect()
        }
        ts = poisson_thresholds()
        import math
        want = {}
        for b in range(5):
            n_eff = s = 0
            for k_, v in rows:
                u = int(hashlib.md5(f"s:{b}:{k_}".encode()).hexdigest()[:12], 16)
                w = next((k for k, t in enumerate(ts) if u < t), len(ts) + 1)
                n_eff += w
                s += w * math.floor(v * 100)
            want[b] = (n_eff, s)
        assert got == want

    def test_mean_concentrates_and_partition_invariance(self, spark):
        from mopper_spark.textops.sampling import poisson_bootstrap

        rows = [(str(i), 50.0) for i in range(500)]
        df = spark.createDataFrame(rows, "k string, v double")
        out = poisson_bootstrap(df, "k", "v", replicates=8).collect()
        for r in out:
            assert r.sum_fp == r.n_eff * 5000  # constant value: mean exact
            assert 350 < r.n_eff < 650         # Poisson(1) mass around n
        a = sorted(map(tuple, out))
        b = sorted(map(tuple, poisson_bootstrap(df.repartition(13), "k", "v", replicates=8).collect()))
        assert a == b


class TestHrwShards:
    def test_matches_python_and_minimal_reshuffle(self, spark):
        import hashlib
        from mopper_spark.textops.sampling import hrw_shards

        keys = [f"k{i}" for i in range(300)]
        df = spark.createDataFrame([(k,) for k in keys], "k string")
        got8 = {r.k: r.shard for r in hrw_shards(df, "k", 8, "s").collect()}
        want = {
            k: max(
                (hashlib.md5(f"s:{s}:{k}".encode()).hexdigest(), s)
                for s in range(8)
            )[1]
            for k in keys
        }
        assert got8 == want
        # adding a 9th shard moves only the keys the new shard wins (~1/9)
        got9 = {r.k: r.shard for r in hrw_shards(df, "k", 9, "s").collect()}
        moved = {k for k in keys if got8[k] != got9[k]}
        assert all(got9[k] == 8 for k in moved)
        assert len(moved) < 300 * 2 / 9  # generous bound around 1/9

    def test_validation(self, spark):
        import pytest as _pt
        from mopper_spark.textops.sampling import hrw_shards

        df = spark.createDataFrame([("a",)], "k string")
        with _pt.raises(ValueError, match="n_shards"):
            hrw_shards(df, "k", 0)


class TestPoissonBootstrapGrouped:
    def test_groups_consistent_with_global_draws(self, spark):
        from mopper_spark.textops.sampling import poisson_bootstrap

        rows = [(f"d{i}", "a" if i % 2 else "b", 10.0) for i in range(100)]
        df = spark.createDataFrame(rows, "k string, src string, v double")
        grouped = {
            (r.src, r.rep): (r.n_eff, r.sum_fp)
            for r in poisson_bootstrap(
                df, "k", "v", replicates=4, group_cols=["src"]
            ).collect()
        }
        total = {
            r.rep: (r.n_eff, r.sum_fp)
            for r in poisson_bootstrap(df, "k", "v", replicates=4).collect()
        }
        # per-row draws are group-independent: group sums add to the total
        for rep in range(4):
            assert (
                grouped[("a", rep)][0] + grouped[("b", rep)][0]
                == total[rep][0]
            )
            assert (
                grouped[("a", rep)][1] + grouped[("b", rep)][1]
                == total[rep][1]
            )


class TestCurriculumInterleave:
    def test_round_robin_layout(self, spark):
        from mopper_spark.textops.sampling import curriculum_interleave

        rows = [
            # group a: 3 rows, metric = id value for easy ranking
            (1, "a", 30), (2, "a", 20), (3, "a", 10),
            # group b: 2 rows
            (4, "b", 99), (5, "b", 1),
        ]
        df = spark.createDataFrame(rows, "doc_id long, source string, m long")
        got = sorted(
            (r.global_pos, r.doc_id, r.source, r.src_rank)
            for r in curriculum_interleave(df, "source", "m", "doc_id").collect()
        )
        # interleaved: a1, b1, a2, b2, a3
        assert got == [
            (0, 1, "a", 1),
            (1, 4, "b", 1),
            (2, 2, "a", 2),
            (3, 5, "b", 2),
            (4, 3, "a", 3),
        ]

    def test_positions_are_a_permutation(self, spark):
        from mopper_spark.textops.sampling import curriculum_interleave

        rows = [(i, f"s{i % 4}", (i * 13) % 17) for i in range(40)]
        df = spark.createDataFrame(rows, "doc_id long, source string, m long")
        out = curriculum_interleave(df, "source", "m", "doc_id").collect()
        assert sorted(r.global_pos for r in out) == list(range(40))
        # same answer under different partitioning
        out2 = curriculum_interleave(
            df.repartition(11), "source", "m", "doc_id"
        ).collect()
        assert sorted(map(tuple, out)) == sorted(map(tuple, out2))


class TestSrmCheck:
    def test_chi2_formula_and_arm_consistency(self, spark):
        import hashlib

        from mopper_spark.textops.sampling import srm_check

        rows = [(i,) for i in range(200)] * 3  # duplicates: units distinct
        df = spark.createDataFrame(rows, "user_id long")
        (r,) = srm_check(df, "user_id").collect()
        n_a = sum(
            1 for i in range(200)
            if int(hashlib.md5(f"ab-v1{i}".encode()).hexdigest()[:4], 16)
            < 65536 // 2
        )
        assert (r.n_a, r.n_b) == (n_a, 200 - n_a)
        d = r.n_a - r.n_b
        assert r.chi2_fp == (d * d * 10**6) // 200

    def test_balanced_split_small_stat(self, spark):
        from mopper_spark.textops.sampling import srm_check

        df = spark.createDataFrame([(i,) for i in range(5000)], "u long")
        (r,) = srm_check(df, "u").collect()
        # hash split is near-balanced: chi2 well under the 3.84 line
        assert r.chi2_fp < 3_840_000
