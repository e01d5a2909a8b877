"""Distributed BPE tokenizer (textops/tokenizer.py) vs an independent
python replica — merge list, segmentation, encoding, and the
partitioning-invariance the deterministic tie-break guarantees."""
import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.tokenizer import (
    SEP,
    bpe_encode,
    bpe_segment_words,
    bpe_train,
    word_counts,
)


def py_bpe_train(wc: dict, n_merges: int):
    """Reference BPE (Sennrich et al. 2016, alg. 1) with the engine's
    tie-break: max frequency, then lexicographically smallest
    sentinel-wrapped pair string."""
    segs = {w: [c for c in w] for w in wc}
    merges = []
    for _ in range(n_merges):
        pairs: dict = {}
        for w, syms in segs.items():
            for a, b in zip(syms, syms[1:]):
                pairs[(a, b)] = pairs.get((a, b), 0) + wc[w]
        if not pairs:
            break
        (a, b), f = min(
            pairs.items(),
            key=lambda kv: (-kv[1], f"{SEP}{kv[0][0]}{SEP} {SEP}{kv[0][1]}{SEP}"),
        )
        merges.append((a, b, f))
        for w, syms in segs.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            segs[w] = out
    return merges, segs


SENNRICH = {"low": 5, "lower": 2, "newest": 6, "widest": 3}


class TestBpeTrain:
    def _wc_df(self, spark, wc):
        return spark.createDataFrame(list(wc.items()), "word string, n long")

    def test_matches_python_replica(self, spark):
        merges, final = bpe_train(self._wc_df(spark, SENNRICH), 8)
        py_merges, py_segs = py_bpe_train(SENNRICH, 8)
        assert merges == py_merges
        got = {
            r.word: [s.strip(SEP) for s in r.sym.split(" ")]
            for r in final.collect()
        }
        assert got == py_segs

    def test_overlapping_pair_left_to_right(self, spark):
        # [a,a,a] + merge (a,a) -> [aa, a], never [a, aa]
        wc = {"aaa": 3, "ab": 1}
        merges, final = bpe_train(self._wc_df(spark, wc), 1)
        assert merges == py_bpe_train(wc, 1)[0] == [("a", "a", 6)]
        segs = {r.word: r.sym.split(" ") for r in final.collect()}
        assert segs["aaa"] == [f"{SEP}aa{SEP}", f"{SEP}a{SEP}"]

    def test_symbol_never_matches_inside_another(self, spark):
        # after (a,b)->ab, a later (b,a) merge must not fire inside 'ab a'
        wc = {"aba": 10, "ba": 1}
        merges, _ = bpe_train(self._wc_df(spark, wc), 2)
        assert merges == py_bpe_train(wc, 2)[0]

    def test_early_stop_when_fully_merged(self, spark):
        merges, _ = bpe_train(self._wc_df(spark, {"ab": 5}), 10)
        assert merges == [("a", "b", 5)]  # then no pairs remain

    def test_partitioning_invariance(self, spark):
        df = self._wc_df(spark, SENNRICH)
        m1, _ = bpe_train(df.repartition(7), 6)
        m3, _ = bpe_train(df.coalesce(1), 6)
        assert m1 == m3 == py_bpe_train(SENNRICH, 6)[0]

    def test_tie_break_deterministic(self, spark):
        # 'xy' and 'xz' both appear twice -> freq tie; smallest pair wins
        wc = {"xy": 2, "xz": 2}
        merges, _ = bpe_train(self._wc_df(spark, wc), 1)
        assert merges == [("x", "y", 2)]

    def test_n_merges_validated(self, spark):
        with pytest.raises(ValueError, match="n_merges"):
            bpe_train(self._wc_df(spark, SENNRICH), 0)


class TestWordCounts:
    def test_counts_and_cap(self, spark):
        docs = spark.createDataFrame(
            [(1, "b b b a a c"), (2, "a  b\tb")], "doc_id long, text string"
        )
        wc = {r.word: r.n for r in word_counts(docs).collect()}
        assert wc == {"a": 3, "b": 5, "c": 1}
        capped = word_counts(docs, max_words=2)
        assert {r.word for r in capped.collect()} == {"b", "a"}
        # tie at the cut: deterministic by word
        docs2 = spark.createDataFrame([(1, "z q")], "doc_id long, text string")
        assert [r.word for r in word_counts(docs2, max_words=1).collect()] == ["q"]


class TestBpeEncode:
    def test_encode_matches_replica_segmentation(self, spark):
        text = "the lowest newest low lower"
        docs = spark.createDataFrame([(7, text)], "doc_id long, text string")
        merges, _ = bpe_train(
            spark.createDataFrame(list(SENNRICH.items()), "word string, n long"),
            6,
        )
        py_merges, _ = py_bpe_train(SENNRICH, 6)
        assert merges == py_merges

        # python-side encode: apply the merges per word, in order
        def seg(word):
            syms = [c for c in word]
            for a, b, _f in merges:
                out, i = [], 0
                while i < len(syms):
                    if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                        out.append(a + b)
                        i += 2
                    else:
                        out.append(syms[i])
                        i += 1
                syms = out
            return syms

        expected = [t for w in text.split() for t in seg(w)]
        row = bpe_encode(docs, merges).collect()[0]
        assert row.tokens == expected
        assert row.n_tokens == len(expected)

    def test_encode_order_proof_across_partitions(self, spark):
        docs = spark.createDataFrame(
            [(i, "ab ba aab") for i in range(20)], "doc_id long, text string"
        ).repartition(13)
        merges = [("a", "b", 0)]
        rows = bpe_encode(docs, merges).collect()
        assert all(r.tokens == ["ab", "b", "a", "a", "ab"] for r in rows)

    def test_segment_words_strips_sentinels(self, spark):
        words = spark.createDataFrame([("lowest",)], "word string")
        out = bpe_segment_words(words, [("l", "o", 0), ("e", "s", 0)]).collect()[0]
        assert out.tokens == ["lo", "w", "es", "t"]
        assert out.n_tokens == 4

    def test_encode_plan_has_no_python(self, spark):
        docs = spark.createDataFrame([(1, "a b")], "doc_id long, text string")
        plan = (
            bpe_encode(docs, [("a", "b", 0)])
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "EvalPython" not in plan  # all-native: no UDF stage


class TestUnigramViterbi:
    CHARS = [(c, 300) for c in "abcdefghijklmnopqrstuvwxyz"]

    def test_prefers_cheap_multichar_pieces(self, spark):
        from mopper_spark.textops.tokenizer import unigram_viterbi

        words = spark.createDataFrame([("table",), ("cat",)], "word string")
        vocab = self.CHARS + [("ta", 250), ("ble", 280), ("able", 700)]
        got = {r.word: (r.cost_fp, r.n_tokens)
               for r in unigram_viterbi(words, vocab).collect()}
        # table: ta(250)+ble(280)=530 beats t+able(1000), chars(1500)
        assert got["table"] == (530, 2)
        assert got["cat"] == (900, 3)

    def test_tie_breaks_on_fewest_pieces(self, spark):
        from mopper_spark.textops.tokenizer import unigram_viterbi

        words = spark.createDataFrame([("ab",)], "word string")
        # a+b = 600 and ab = 600: equal cost, ab wins with 1 token
        vocab = [("a", 300), ("b", 300), ("ab", 600)]
        (r,) = unigram_viterbi(words, vocab).collect()
        assert (r.cost_fp, r.n_tokens) == (600, 1)

    def test_uncoverable_word_absent(self, spark):
        from mopper_spark.textops.tokenizer import unigram_viterbi

        words = spark.createDataFrame([("ax",), ("aa",)], "word string")
        vocab = [("a", 300)]
        got = {r.word for r in unigram_viterbi(words, vocab).collect()}
        assert got == {"aa"}

    def test_length_cap_and_validation(self, spark):
        from mopper_spark.textops.tokenizer import unigram_viterbi

        words = spark.createDataFrame(
            [("short",), ("averyveryverylongword",)], "word string"
        )
        got = {r.word for r in unigram_viterbi(
            words, self.CHARS, max_word_len=8).collect()}
        assert got == {"short"}
        with pytest.raises(ValueError):
            unigram_viterbi(words, [])
        with pytest.raises(ValueError):
            unigram_viterbi(words, [("", 10)])
        with pytest.raises(ValueError):
            unigram_viterbi(words, [("a", 0)])

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.tokenizer import unigram_viterbi

        words = spark.createDataFrame(
            [(w,) for w in ["table", "tablet", "battle", "ab", "ba"]],
            "word string",
        )
        vocab = self.CHARS + [("ta", 200), ("ab", 200), ("ble", 250), ("t", 300)]
        a = sorted(map(tuple, unigram_viterbi(words, vocab).collect()))
        b = sorted(
            map(tuple, unigram_viterbi(words.repartition(7), vocab).collect())
        )
        assert a == b and len(a) == 5
