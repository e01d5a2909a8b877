

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
