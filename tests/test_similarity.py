

class TestJlProject:
    def test_matches_python_replica_and_distance_preservation(self, spark):
        import math
        from mopper_spark.textops.similarity import jl_project, jl_signs

        import random
        rng = random.Random(7)
        vecs = [(i, [rng.uniform(-1, 1) for _ in range(16)]) for i in range(40)]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {
            (r.vec_id, r.j): r.y_fp
            for r in jl_project(df, 16, 8, scale=10**6).collect()
        }
        signs = jl_signs(16, 8)
        want = {}
        for vid, v in vecs:
            vfp = [math.floor(x * 10**6) for x in v]
            for j in range(8):
                want[(vid, j)] = sum(s * x for s, x in zip(signs[j], vfp))
        assert got == want
        # distances roughly preserved in expectation (loose sanity bound):
        # E[||y||^2] = dim_out * ||v||^2 under +-1 JL
        import statistics
        ratios = []
        for vid, v in vecs:
            ny = sum(got[(vid, j)] ** 2 for j in range(8))
            nv = sum(math.floor(x * 10**6) ** 2 for x in v)
            if nv:
                ratios.append(ny / (8 * nv))
        assert 0.5 < statistics.median(ratios) < 2.0

    def test_validation(self, spark):
        import pytest as _pt
        from mopper_spark.textops.similarity import jl_project

        df = spark.createDataFrame([(1, [0.0])], "vec_id long, embedding array<double>")
        with _pt.raises(ValueError, match="out_dim"):
            jl_project(df, 1, 0)


class TestPowerIterationStep:
    def test_matches_python_replica(self, spark):
        import hashlib
        import math

        from mopper_spark.textops.similarity import power_iteration_step

        vecs = [
            (0, [0.5, -0.25, 0.125]),
            (1, [1.0, 0.0, -0.5]),
            (2, [-0.75, 0.5, 0.25]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {r.dim: (r.v0, r.w_fp)
               for r in power_iteration_step(df).collect()}

        scale = 1 << 14
        def sign(j):
            return 1 if hashlib.md5(f"pi-v1:{j}".encode()).hexdigest()[0] < "8" else -1
        x = [[math.floor(v * scale) for v in e] for _, e in vecs]
        s = [sum(xi[j] * sign(j) for j in range(3)) for xi in x]
        w = [sum(x[i][j] * s[i] for i in range(3)) for j in range(3)]
        assert got == {j: (sign(j), w[j]) for j in range(3)}

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.similarity import power_iteration_step

        rows = [(i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(8)])
                for i in range(40)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, power_iteration_step(df).collect()))
        b = sorted(map(tuple, power_iteration_step(df.repartition(9)).collect()))
        assert a == b and len(a) == 8
