"""Model-evaluation operators: calibration bins, Cohen's kappa
(mopper_spark/textops/evaluation.py) and the exact-integer ACF
(mopper_spark/textops/timeseries.py::autocorrelation).  Python-replica
equalities on synthetic frames with known closed-form answers, plus
partitioning-invariance for the aggregation-only operators."""

from fractions import Fraction

import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.evaluation import calibration_bins, cohens_kappa
from mopper_spark.textops.timeseries import autocorrelation


class TestCalibrationBins:
    def _replica(self, rows, n_bins=10, wmax=1000, scale=1_000_000):
        span = 2 * wmax * scale + 1
        bins = {}
        for score_fp, n_features, label in rows:
            if n_features <= 0:
                continue
            mean_fp = ((score_fp + wmax * n_features) * scale) // n_features
            b = (mean_fp * n_bins) // span
            n, p, s = bins.get(b, (0, 0, 0))
            bins[b] = (n + 1, p + label, s + mean_fp)
        return bins

    def test_matches_replica(self, spark):
        rows = [
            (-900, 3, 1),   # mean -300 → low bin
            (0, 5, 0),      # mean 0 → middle
            (2500, 5, 1),   # mean 500
            (999, 1, 1),    # near max mean
            (-1000, 1, 0),  # exact min mean → bin 0
            (0, 0, 1),      # zero features → excluded
        ]
        df = spark.createDataFrame(
            rows, "score_fp long, n_features long, label int"
        )
        got = {
            r["bin"]: (r["n_docs"], r["n_pos"], r["sum_mean_fp"])
            for r in calibration_bins(df).collect()
        }
        assert got == self._replica(rows)

    def test_min_mean_lands_in_bin_zero_max_in_last(self, spark):
        df = spark.createDataFrame(
            [(-1000, 1, 0), (1000, 1, 1)], "score_fp long, n_features long, label int"
        )
        got = sorted(r["bin"] for r in calibration_bins(df).collect())
        assert got == [0, 9]

    def test_partitioning_invariance(self, spark):
        rows = [(i * 7 % 1500 - 700, 1 + i % 9, i % 2) for i in range(200)]
        df = spark.createDataFrame(
            rows, "score_fp long, n_features long, label int"
        )
        one = {tuple(r) for r in calibration_bins(df.coalesce(1)).collect()}
        many = {tuple(r) for r in calibration_bins(df.repartition(13)).collect()}
        assert one == many == {
            (b, n, p, s)
            for b, (n, p, s) in self._replica(rows).items()
        }


class TestCohensKappa:
    def test_known_confusion(self, spark):
        # 20 both-pos, 5 A-only, 10 B-only, 15 both-neg (n=50)
        rows = (
            [(1, 1)] * 20 + [(1, 0)] * 5 + [(0, 1)] * 10 + [(0, 0)] * 15
        )
        df = spark.createDataFrame(rows, "a int, b int")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert (r["n"], r["n11"], r["n10"], r["n01"], r["n00"]) == (
            50, 20, 5, 10, 15,
        )
        assert r["agree"] == 35
        # po = 35/50, pe = (25*30 + 25*20)/2500 = 1250/2500
        pe_num = 25 * 30 + 25 * 20
        assert r["pe_num"] == pe_num
        kappa = Fraction(50 * 35 - pe_num, 50 * 50 - pe_num)
        assert Fraction(r["kappa_num"], r["kappa_den"]) == kappa
        assert kappa == Fraction(2, 5)

    def test_perfect_agreement_is_one(self, spark):
        df = spark.createDataFrame(
            [(1, 1)] * 4 + [(0, 0)] * 6, "a int, b int"
        )
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["kappa_num"] == r["kappa_den"] != 0

    def test_constant_raters_emit_zero_denominator(self, spark):
        df = spark.createDataFrame([(1, 1)] * 5, "a int, b int")
        r = cohens_kappa(df, "a", "b").collect()[0]
        assert r["kappa_den"] == 0 and r["kappa_num"] == 0


class TestAutocorrelation:
    def _replica(self, xs, max_lag):
        n, s = len(xs), sum(xs)
        c = [n * x - s for x in xs]
        den = sum(v * v for v in c)
        out = {}
        for k in range(1, max_lag + 1):
            if k >= n:
                break
            out[k] = (
                n - k,
                sum(c[t] * c[t + k] for t in range(n - k)),
                den,
            )
        return out

    def test_matches_replica_and_alternating_sign(self, spark):
        xs = [10, 2, 9, 1, 11, 3, 8, 2, 12, 1]  # strong period-2 series
        df = spark.createDataFrame(
            [(i, x) for i, x in enumerate(xs)], "pos long, x long"
        )
        got = {
            r["lag"]: (r["n_pairs"], r["num_scaled"], r["den_scaled"])
            for r in autocorrelation(df, "pos", "x", max_lag=3).collect()
        }
        rep = self._replica(xs, 3)
        assert got == rep
        assert got[1][1] < 0 < got[2][1]  # lag-1 anti, lag-2 positive

    def test_constant_series_zero_everything(self, spark):
        df = spark.createDataFrame(
            [(i, 5) for i in range(6)], "pos long, x long"
        )
        for r in autocorrelation(df, "pos", "x", max_lag=2).collect():
            assert r["num_scaled"] == 0 and r["den_scaled"] == 0

    def test_gaps_in_order_col_are_adjacent_positions(self, spark):
        # order values 0, 10, 20 — ACF must treat them as t=1,2,3
        xs = [4, 7, 1]
        df = spark.createDataFrame(
            [(i * 10, x) for i, x in enumerate(xs)], "pos long, x long"
        )
        got = {
            r["lag"]: (r["n_pairs"], r["num_scaled"], r["den_scaled"])
            for r in autocorrelation(df, "pos", "x", max_lag=2).collect()
        }
        assert got == self._replica(xs, 2)


class TestTokenChi2:
    def test_replica_and_degenerate_exclusion(self, spark):
        from mopper_spark.textops.analysis import token_chi2

        # 'pos' appears only in label-1 docs, 'neg' only in label-0,
        # 'both' everywhere (zero signal), 'rare' under min_df
        rows = (
            [(1, "pos both filler%d" % i) for i in range(6)]
            + [(0, "neg both filler%d" % i) for i in range(6)]
            + [(1, "rare both"), (0, "both x")]
        )
        df = spark.createDataFrame(rows, "y int, text string")
        got = {
            r.token: (r.df_t, r.a, r.b, r.chi2)
            for r in token_chi2(
                df, "text", F.col("y") == 1, top_k=50, min_df=5
            ).collect()
        }
        assert "rare" not in got            # min_df prune
        assert "both" not in got            # c+d == 0 → degenerate margin
        n, n1, n0 = 14, 7, 7
        for tok, (a, b) in (("pos", (6, 0)), ("neg", (0, 6))):
            c, d = n1 - a, n0 - b
            chi2 = (
                n * ((a * d - b * c) * (a * d - b * c))
                / ((a + b) * (c + d) * (a + c) * (b + d))
            )
            assert got[tok][:3] == (6, a, b)
            assert abs(got[tok][3] - chi2) < 1e-9
        assert got["pos"][3] == got["neg"][3] > 0

    def test_top_k_order_is_deterministic(self, spark):
        from mopper_spark.textops.analysis import token_chi2

        rows = [(i % 2, f"t{i % 7} u{i % 5} w") for i in range(40)]
        df = spark.createDataFrame(rows, "y int, text string")
        a = [tuple(r) for r in token_chi2(df.coalesce(1), "text", F.col("y") == 1, top_k=5, min_df=1).collect()]
        b = [tuple(r) for r in token_chi2(df.repartition(9), "text", F.col("y") == 1, top_k=5, min_df=1).collect()]
        assert a == b and len(a) == 5


class TestGroupTrendOls:
    def test_perfect_line_and_constant(self, spark):
        from fractions import Fraction

        from mopper_spark.textops.timeseries import group_trend_ols

        rows = (
            # key 'up': y = 3x + 2 exactly
            [("up", i, 3 * i + 2) for i in range(1, 8)]
            # key 'flat': constant 9
            + [("flat", i, 9) for i in range(1, 5)]
            # key 'one': a single point → undefined slope (den 0)
            + [("one", 1, 42)]
        )
        # order col deliberately != position: x must be the RANK
        df = spark.createDataFrame(
            [(k, o * 10, y) for k, o, y in rows], "k string, o long, y long"
        )
        got = {
            r.k: (r.n, r.slope_num, r.slope_den, r.icept_num, r.icept_den)
            for r in group_trend_ols(df, "k", "o", "y").collect()
        }
        assert got["up"][0] == 7
        assert Fraction(got["up"][1], got["up"][2]) == 3
        assert Fraction(got["up"][3], got["up"][4]) == 2
        assert got["flat"][1] == 0
        assert Fraction(got["flat"][3], got["flat"][4]) == 9
        assert got["one"][0] == 1 and got["one"][2] == 0

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.timeseries import group_trend_ols

        rows = [(f"k{i % 3}", i, (i * 7) % 11) for i in range(60)]
        df = spark.createDataFrame(rows, "k string, o long, y long")
        one = {tuple(r) for r in group_trend_ols(df.coalesce(1), "k", "o", "y").collect()}
        many = {tuple(r) for r in group_trend_ols(df.repartition(13), "k", "o", "y").collect()}
        assert one == many


    def test_null_labels_excluded_consistently(self, spark):
        """A NULL label must not count as a negative in the per-token
        cells while being skipped by the totals (reviewer finding): the
        doc is excluded everywhere, so a + b + c + d == n holds."""
        from mopper_spark.textops.analysis import token_chi2

        rows = [(1, "pos w"), (0, "neg w"), (None, "pos neg w")]
        df = spark.createDataFrame(rows, "y int, text string")
        got = {
            r.token: (r.df_t, r.a, r.b)
            for r in token_chi2(df, "text", F.col("y"), top_k=10, min_df=1).collect()
        }
        # the NULL-label doc contributes to NOTHING: pos has df_t 1 a 1 b 0
        assert got["pos"] == (1, 1, 0)
        assert got["neg"] == (1, 0, 1)
        assert "w" not in got  # present in both live docs -> c+d==0 degenerate


class TestClassificationReport:
    def test_per_class_exact(self, spark):
        from mopper_spark.textops.evaluation import classification_report

        rows = [("a", "a")] * 3 + [("a", "b")] * 1 + [("b", "b")] * 2 + [
            ("b", "a")
        ] * 2 + [("c", "a")]  # c never predicted
        df = spark.createDataFrame(rows, "y string, p string")
        got = {r.cls: (r.tp, r.fp, r.fn, r.precision_fp, r.recall_fp, r.f1_fp)
               for r in classification_report(df, "y", "p").collect()}
        s = 10**6
        assert got["a"] == (3, 3, 1, (3 * s) // 6, (3 * s) // 4,
                            (6 * s) // 10)
        assert got["b"] == (2, 1, 2, (2 * s) // 3, (2 * s) // 4,
                            (4 * s) // 7)
        assert got["c"] == (0, 0, 1, 0, 0, 0)  # zero_division=0

    def test_class_only_in_predictions(self, spark):
        from mopper_spark.textops.evaluation import classification_report

        df = spark.createDataFrame([("a", "z")], "y string, p string")
        got = {r.cls: (r.tp, r.fp, r.fn)
               for r in classification_report(df, "y", "p").collect()}
        assert got["z"] == (0, 1, 0) and got["a"] == (0, 0, 1)
