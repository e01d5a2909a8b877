"""Tests for SHACL-lite shape validation (pipeline/validate.py)."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.validate import Shape, validate_shapes

SCHEMA = "subj string, pred string, obj string, okind string, graph string"

TRIPLES = [
    ("http://ex/t1", "http://ex/role", "user", "lit", "g"),
    ("http://ex/t1", "http://ex/tool", "bash", "lit", "g"),
    ("http://ex/t2", "http://ex/role", "assistant", "lit", "g"),  # no tool
    ("http://ex/t2", "http://ex/role", "system", "lit", "g"),  # 2 roles
    ("http://ex/t3", "http://ex/mentions", "http://ex/e1", "iri", "g"),
    ("http://ex/t4", "http://ex/mentions", "oops literal", "lit", "g"),
    ("urn:other:t5", "http://ex/mentions", "http://ex/e2", "iri", "g"),
]


@pytest.fixture(scope="module")
def kg(spark):
    return spark.createDataFrame(TRIPLES, SCHEMA)


def _codes(df):
    return sorted((r.subj, r.code) for r in df.collect())


class TestValidateShapes:
    def test_range_kind(self, kg):
        out = validate_shapes(kg, [Shape("http://ex/mentions", range_kind="iri")])
        assert _codes(out) == [("http://ex/t4", "range_kind")]

    def test_domain_prefix(self, kg):
        out = validate_shapes(
            kg, [Shape("http://ex/mentions", domain_prefix="http://ex/")]
        )
        assert _codes(out) == [("urn:other:t5", "domain_prefix")]

    def test_max_count(self, kg):
        out = validate_shapes(kg, [Shape("http://ex/role", max_count=1)])
        assert _codes(out) == [("http://ex/t2", "max_count")]
        (row,) = out.collect()
        assert row.detail == "2"

    def test_requires(self, kg):
        out = validate_shapes(
            kg, [Shape("http://ex/role", requires="http://ex/tool")]
        )
        assert _codes(out) == [("http://ex/t2", "requires")]

    def test_conformant_graph_is_empty(self, kg):
        out = validate_shapes(
            kg.filter(F.col("subj") == "http://ex/t1"),
            [
                Shape("http://ex/role", range_kind="lit", max_count=1,
                      requires="http://ex/tool"),
                Shape("http://ex/tool", range_kind="lit"),
            ],
        )
        assert out.count() == 0

    def test_all_constraints_compose(self, kg):
        out = validate_shapes(
            kg,
            [
                Shape("http://ex/mentions", range_kind="iri",
                      domain_prefix="http://ex/"),
                Shape("http://ex/role", max_count=1, requires="http://ex/tool"),
            ],
        )
        assert _codes(out) == [
            ("http://ex/t2", "max_count"),
            ("http://ex/t2", "requires"),
            ("http://ex/t4", "range_kind"),
            ("urn:other:t5", "domain_prefix"),
        ]

    def test_no_constraints_raises(self, kg):
        with pytest.raises(ValueError, match="no constraints"):
            validate_shapes(kg, [Shape("http://ex/role")])
