"""Tests for TransE scoring/eval (pipeline/embedding.py): python-replica
coordinate check, integer determinism under repartitioning, hinge
semantics, and plan nativeness."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.embedding import (
    hash_embedding,
    transe_distance,
    transe_margin_eval,
)


def _py_emb(ns: str, label: str, dim: int = 16, scale: int = 1000):
    out = []
    for i in range(dim):
        h = hashlib.md5(f"{ns}{label}:{i}".encode()).hexdigest()[:12]
        out.append(int(h, 16) % (2 * scale + 1) - scale)
    return out


def _py_dist(s: str, p: str, o: str) -> int:
    es, rp, eo = _py_emb("emb-v1/e", s), _py_emb("emb-v1/r", p), _py_emb("emb-v1/e", o)
    return sum(abs(a + b - c) for a, b, c in zip(es, rp, eo))


TRIPLES = [
    ("s1", "p1", "a"),
    ("s1", "p1", "b"),
    ("s2", "p1", "c"),
    ("s2", "p2", "a"),
    ("s3", "p2", "d"),
]


@pytest.fixture(scope="module")
def triples(spark):
    return spark.createDataFrame(TRIPLES, "subj string, pred string, obj string")


class TestEmbedding:
    def test_coordinates_match_python_replica(self, spark):
        df = spark.createDataFrame([("alice",)], "label string").select(
            hash_embedding(F.col("label"), seed="emb-v1/e").alias("e")
        )
        (row,) = df.collect()
        assert list(row.e) == _py_emb("emb-v1/e", "alice")
        assert all(-1000 <= v <= 1000 for v in row.e)

    def test_distance_matches_python_replica(self, triples):
        got = {
            (r.subj, r.pred, r.obj): r.d
            for r in triples.select(
                "subj", "pred", "obj",
                transe_distance(F.col("subj"), F.col("pred"), F.col("obj")).alias("d"),
            ).collect()
        }
        for s, p, o in TRIPLES:
            assert got[(s, p, o)] == _py_dist(s, p, o)

    def test_identity_translation_is_zero(self, spark):
        # e_s + 0-vector - e_s requires r_p = 0, which hash init never is;
        # instead: distance from a label to itself under zero relation
        df = spark.createDataFrame([("x",)], "l string").select(
            F.aggregate(
                F.zip_with(
                    hash_embedding(F.col("l"), seed="emb-v1/e"),
                    hash_embedding(F.col("l"), seed="emb-v1/e"),
                    lambda a, b: F.abs(a - b),
                ),
                F.lit(0).cast("long"),
                lambda acc, v: acc + v,
            ).alias("d")
        )
        assert df.collect()[0].d == 0


class TestMarginEval:
    def test_partitioning_invariance(self, triples):
        a = sorted(map(tuple, transe_margin_eval(triples).collect()))
        b = sorted(map(tuple, transe_margin_eval(triples.repartition(7)).collect()))
        assert a == b

    def test_aggregates_are_consistent(self, triples):
        for r in transe_margin_eval(triples, margin=100).collect():
            assert 0 <= r.n_violations <= r.n_pairs
            assert (r.total_hinge == 0) == (r.n_violations == 0)

    def test_huge_margin_violates_everything(self, triples):
        for r in transe_margin_eval(triples, margin=10**9).collect():
            assert r.n_violations == r.n_pairs

    def test_fully_native_plan(self, triples):
        plan = (
            transe_margin_eval(triples)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )
        assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan


def _py_distmult(s: str, p: str, o: str) -> int:
    es, rp, eo = (
        _py_emb("emb-v1/e", s),
        _py_emb("emb-v1/r", p),
        _py_emb("emb-v1/e", o),
    )
    return sum(a * b * c for a, b, c in zip(es, rp, eo))


class TestDistMult:
    def test_score_matches_python_replica(self, spark):
        from mopper_spark.pipeline.embedding import distmult_score

        df = spark.createDataFrame(
            [("ent:a", "rel:p", "ent:b")], "s string, p string, o string"
        )
        got = df.select(
            distmult_score(F.col("s"), F.col("p"), F.col("o")).alias("sc")
        ).collect()[0]["sc"]
        assert got == _py_distmult("ent:a", "rel:p", "ent:b")

    def test_symmetry_in_subject_object(self, spark):
        """DistMult's known expressiveness limit — score(s,p,o) ==
        score(o,p,s) — holds by construction (shared entity namespace,
        elementwise product commutes)."""
        from mopper_spark.pipeline.embedding import distmult_score

        df = spark.createDataFrame(
            [("ent:a", "rel:p", "ent:b"), ("ent:b", "rel:p", "ent:a")],
            "s string, p string, o string",
        )
        got = [
            r["sc"]
            for r in df.select(
                distmult_score(F.col("s"), F.col("p"), F.col("o")).alias("sc")
            ).collect()
        ]
        assert got[0] == got[1]

    def test_margin_eval_replica_and_invariance(self, triples):
        from mopper_spark.pipeline.curate import negative_samples
        from mopper_spark.pipeline.embedding import distmult_margin_eval

        one = {
            tuple(r)
            for r in distmult_margin_eval(triples.coalesce(1)).collect()
        }
        many = {
            tuple(r)
            for r in distmult_margin_eval(triples.repartition(8)).collect()
        }
        assert one == many and one

        pairs = negative_samples(triples, n_per=2, seed="neg-v1").collect()
        agg = {}
        for r in pairs:
            s_pos = _py_distmult(r.subj, r.pred, r.obj)
            s_neg = _py_distmult(r.subj, r.pred, r.neg_obj)
            hinge = max(0, 1_000_000 + s_neg - s_pos)
            n, v, t = agg.get(r.pred, (0, 0, 0))
            agg[r.pred] = (n + 1, v + (hinge > 0), t + hinge)
        assert one == {(p, n, v, t) for p, (n, v, t) in agg.items()}
