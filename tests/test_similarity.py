

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


class TestDominantEigen:
    def _replica(self, vecs, n_steps=3, xs=1 << 10, vs=1 << 10):
        import hashlib
        import math

        dim = len(vecs[0][1])
        x = [[math.floor(e * xs) for e in v] for _, v in vecs]
        v = [
            (1 if hashlib.md5(f"pi-v1:{j}".encode()).hexdigest()[0] < "8"
             else -1) * vs
            for j in range(dim)
        ]
        for _ in range(n_steps):
            s = [sum(xi[j] * v[j] for j in range(dim)) for xi in x]
            w = [sum(x[i][j] * s[i] for i in range(len(x))) for j in range(dim)]
            mx = max(abs(c) for c in w)
            # truncating division toward zero (Spark div / DuckDB // on
            # ints), exact for big ints — no float division
            v = [(abs(c) * vs // mx) * (1 if c >= 0 else -1) if mx > 0 else 0
                 for c in w]
        s = [sum(xi[j] * v[j] for j in range(dim)) for xi in x]
        num = sum(c * c for c in s)
        den = sum(c * c for c in v)
        return v, num, den

    def test_matches_replica_with_negatives(self, spark):
        from mopper_spark.textops.similarity import dominant_eigen

        vecs = [
            (0, [0.9, -0.1, 0.05]),
            (1, [-0.8, 0.2, 0.0]),
            (2, [0.85, -0.15, 0.1]),
            (3, [0.05, 0.9, -0.3]),
        ]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        rows = dominant_eigen(df).collect()
        v, num, den = self._replica(vecs)
        assert {r.dim: r.v_fp for r in rows} == {j: v[j] for j in range(3)}
        assert all((r.rq_num, r.rq_den) == (num, den) for r in rows)

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.similarity import dominant_eigen

        rows = [(i, [((i * 31 + j * 7) % 13 - 6) / 6.0 for j in range(6)])
                for i in range(30)]
        df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
        a = sorted(map(tuple, dominant_eigen(df).collect()))
        b = sorted(map(tuple, dominant_eigen(df.repartition(7)).collect()))
        assert a == b and len(a) == 6


class TestCovarianceDiag:
    def test_exact_moments(self, spark):
        import math

        from mopper_spark.textops.similarity import covariance_diag

        vecs = [(0, [0.5, -0.25]), (1, [1.0, 0.0]), (2, [-0.5, 0.25])]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {r.dim: (r.n, r.s1, r.s2)
               for r in covariance_diag(df).collect()}
        s = 1 << 14
        for j in range(2):
            xs = [math.floor(v[j] * s) for _, v in vecs]
            assert got[j] == (3, sum(xs), sum(x * x for x in xs))


class TestQuantizationAudit:
    def test_residuals_match_replica(self, spark):
        import math

        from mopper_spark.textops.similarity import quantization_audit

        vecs = [(0, [0.5, -0.3]), (1, [1.0, 0.1]), (2, [-0.25, 0.7])]
        df = spark.createDataFrame(vecs, "vec_id long, embedding array<double>")
        got = {r.dim: (r.max_abs_fp, r.n, r.sum_abs_err, r.max_abs_err)
               for r in quantization_audit(df).collect()}
        s = 1 << 14
        for j in range(2):
            xs = [math.floor(v[j] * s) for _, v in vecs]
            mx = max(abs(x) for x in xs)
            qs = [(abs(x) * 127 // mx) * (1 if x >= 0 else -1) for x in xs]
            errs = [abs(x * 127 - q * mx) for x, q in zip(xs, qs)]
            assert got[j] == (mx, 3, sum(errs), max(errs))

    def test_zero_dim_no_div_error(self, spark):
        from mopper_spark.textops.similarity import quantization_audit

        df = spark.createDataFrame(
            [(0, [0.0, 0.5]), (1, [0.0, 0.25])], "vec_id long, embedding array<double>"
        )
        got = {r.dim: (r.max_abs_fp, r.sum_abs_err)
               for r in quantization_audit(df).collect()}
        assert got[0] == (0, 0)
