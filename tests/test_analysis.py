

class TestWinsorizedStats:
    def test_matches_python_replica(self, spark):
        import math
        from mopper_spark.textops.analysis import winsorized_stats

        vals = [1, 2, 3, 4, 5, 6, 7, 8, 9, 1000]
        df = spark.createDataFrame([(v,) for v in vals], "v long")
        got = winsorized_stats(df, "v", lo_q=0.2, hi_q=0.8).collect()[0]
        xs = sorted(vals)
        lo = xs[math.ceil(0.2 * len(xs)) - 1]
        hi = xs[math.ceil(0.8 * len(xs)) - 1]
        clamped = [min(max(v, lo), hi) for v in vals]
        assert tuple(got) == (
            len(vals), lo, hi, sum(clamped), sum(c * c for c in clamped)
        )
        assert got.hi == 8 and got.wsum < sum(vals)  # the 1000 is clamped

    def test_empty_and_validation(self, spark):
        import pytest as _pt
        from mopper_spark.textops.analysis import winsorized_stats

        empty = spark.createDataFrame([], "v long")
        row = winsorized_stats(empty, "v").collect()[0]
        assert row.n == 0 and row.wsum is None
        with _pt.raises(ValueError, match="lo_q"):
            winsorized_stats(empty, "v", lo_q=0.9, hi_q=0.1)


class TestTokenBurstiness:
    def test_matches_bruteforce(self, spark):
        from mopper_spark.textops.analysis import token_burstiness

        docs = [
            (0, "a a a b"), (1, "a b b"), (2, "b"), (3, "c"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.token: (r.df, r.s1, r.s2)
            for r in token_burstiness(df, min_df=1).collect()
        }
        assert got == {"a": (2, 4, 10), "b": (3, 4, 6), "c": (1, 1, 1)}
        # min_df prunes
        got2 = {r.token for r in token_burstiness(df, min_df=2).collect()}
        assert got2 == {"a", "b"}
        # bursty 'a' disperses more than flat 'b': N*s2-s1^2 scaled by s1
        N = 4
        disp = lambda d: (N * d[2] - d[1] ** 2) / (N * d[1])
        assert disp(got["a"]) > disp(got["b"])


class TestLexicalProfile:
    def test_counts_and_ratios(self, spark):
        from mopper_spark.textops.analysis import lexical_profile

        docs = spark.createDataFrame(
            [
                ("s", "the cat sat. the cat ran!"),
                ("s", "elephants remembered everything"),
            ],
            "source string, text string",
        )
        (r,) = lexical_profile(docs).collect()
        # tokens: the cat sat. the cat ran! elephants remembered everything
        assert r.n_docs == 2 and r.n_tokens == 9
        # types: the, cat, sat., ran!, elephants, remembered, everything
        assert r.n_types == 7
        assert r.n_hapax == 5
        assert r.n_sentences == 2 + 1  # two runs in doc1, fragment counts 1
        # long words (>=7 chars): elephants remembered everything
        assert r.n_long == 3
        assert r.ttr_fp == (7 * 10**6) // 9
        assert r.hapax_fp == (5 * 10**6) // 7
        assert r.lix_fp == (9 * 1000) // 3 + (100000 * 3) // 9

    def test_groups_independent(self, spark):
        from mopper_spark.textops.analysis import lexical_profile

        docs = spark.createDataFrame(
            [("a", "x x"), ("b", "x y")], "source string, text string"
        )
        got = {r.source: (r.n_types, r.n_hapax)
               for r in lexical_profile(docs).collect()}
        assert got["a"] == (1, 0) and got["b"] == (2, 2)


class TestZipfTerms:
    def test_terms_match_replica(self, spark):
        import math

        from mopper_spark.textops.analysis import zipf_terms

        text = " ".join(["a"] * 8 + ["b"] * 4 + ["c"] * 2 + ["d"])
        df = spark.createDataFrame([("s", text)], "source string, text string")
        (r,) = zipf_terms(df, top_k=4).collect()
        freqs = [8, 4, 2, 1]  # ranks 1..4 (a,b,c,d)
        xs = [math.floor(math.log(i + 1) * 1e6) for i in range(4)]
        ys = [math.floor(math.log(f) * 1e6) for f in freqs]
        assert (r.n, r.sx, r.sy) == (4, sum(xs), sum(ys))
        assert r.sxx == sum(x * x for x in xs)
        assert r.sxy == sum(x * y for x, y in zip(xs, ys))

    def test_tie_rank_deterministic_and_validation(self, spark):
        from mopper_spark.textops.analysis import zipf_terms

        df = spark.createDataFrame([("s", "b a b a")], "source string, text string")
        a = zipf_terms(df, top_k=2).collect()
        b = zipf_terms(df.repartition(5), top_k=2).collect()
        assert sorted(map(tuple, a)) == sorted(map(tuple, b))
        import pytest as _pt
        with _pt.raises(ValueError):
            zipf_terms(df, top_k=1)


class TestFrequencySpectrum:
    def test_spectrum_and_tail(self, spark):
        from mopper_spark.textops.analysis import frequency_spectrum

        text = " ".join(["a"] * 5 + ["b"] * 2 + ["c"] * 2 + ["d"])
        df = spark.createDataFrame([("s", text)], "source string, text string")
        got = {r.r: (r.n_types, r.n_tokens)
               for r in frequency_spectrum(df, max_r=3).collect()}
        assert got[1] == (1, 1)    # d
        assert got[2] == (2, 4)    # b, c
        assert got[4] == (1, 5)    # tail row r = max_r + 1 holds 'a'
        assert sum(t for _, t in got.values()) == 10
        import pytest as _pt
        with _pt.raises(ValueError):
            frequency_spectrum(df, max_r=0)
