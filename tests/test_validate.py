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


class TestNewConstraints:
    """sh:in / sh:pattern / sh:class additions (round 4)."""

    @pytest.fixture(scope="class")
    def kg2(self, spark):
        RT = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"
        rows = [
            ("http://ex/t1", "http://ex/role", "user", "lit", "g"),
            ("http://ex/t2", "http://ex/role", "robot", "lit", "g"),  # not in set
            ("http://ex/t1", "http://ex/score", "0.75", "lit", "g"),
            ("http://ex/t2", "http://ex/score", "high", "lit", "g"),  # not numeric
            ("http://ex/t3", "http://ex/mentions", "http://ex/e1", "iri", "g"),
            ("http://ex/t4", "http://ex/mentions", "http://ex/e2", "iri", "g"),
            ("http://ex/e1", RT, "http://ex/Entity", "iri", "g"),
            # e2 has no rdf:type Entity -> class_of violation on t4
        ]
        return spark.createDataFrame(rows, SCHEMA)

    def test_value_in(self, kg2):
        out = validate_shapes(
            kg2,
            [Shape("http://ex/role", value_in=("user", "assistant", "tool"))],
        )
        assert _codes(out) == [("http://ex/t2", "value_in")]

    def test_value_in_empty_refused(self, kg2):
        with pytest.raises(ValueError, match="non-empty"):
            validate_shapes(kg2, [Shape("http://ex/role", value_in=())]).collect()

    def test_obj_pattern(self, kg2):
        out = validate_shapes(
            kg2,
            [Shape("http://ex/score", obj_pattern=r"^[0-9]+\.[0-9]+$")],
        )
        assert _codes(out) == [("http://ex/t2", "obj_pattern")]

    def test_class_of(self, kg2):
        out = validate_shapes(
            kg2, [Shape("http://ex/mentions", class_of="http://ex/Entity")]
        )
        assert _codes(out) == [("http://ex/t4", "class_of")]
        assert [r.detail for r in out.collect()] == ["http://ex/e2"]

    def test_compose_with_existing(self, kg2):
        out = validate_shapes(
            kg2,
            [
                Shape(
                    "http://ex/role",
                    range_kind="lit",
                    value_in=("user", "assistant", "tool"),
                ),
                Shape("http://ex/mentions", class_of="http://ex/Entity"),
            ],
        )
        assert _codes(out) == [
            ("http://ex/t2", "value_in"),
            ("http://ex/t4", "class_of"),
        ]


def test_obj_pattern_is_full_match(spark):
    """sh:pattern anchors internally: a partial match must still violate
    (review fix — regexp_like alone is a substring search)."""
    df = spark.createDataFrame(
        [("http://ex/t1", "http://ex/score", "price 3.5 USD", "lit", "g"),
         ("http://ex/t2", "http://ex/score", "3.5", "lit", "g")],
        SCHEMA,
    )
    out = validate_shapes(
        df, [Shape("http://ex/score", obj_pattern=r"[0-9]+\.[0-9]+")]
    )
    assert _codes(out) == [("http://ex/t1", "obj_pattern")]
