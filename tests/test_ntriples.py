"""Tests for the N-Triples/N-Quads reader (mopper_spark/ntriples.py):
round-trip losslessness on every term kind and ECHAR escape, the file
path via spark.read.text, strict-mode refusals, and plan nativeness."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.ntriples import (
    format_statements,
    parse_statements,
    read_nquads,
)

STATEMENTS = [
    ("http://ex/s1", "http://ex/p", "http://ex/o", "iri", "http://ex/g"),
    ("http://ex/s2", "http://ex/p", "plain text", "lit", None),
    (
        "http://ex/s3",
        "http://ex/p",
        'quote " back \\ nl \n tab \t cr \r end',
        "lit",
        "http://ex/g",
    ),
    ("_:b0", "http://ex/p", "hello", "lit@en", None),
    (
        "http://ex/s4",
        "http://ex/p",
        "42",
        "lit^^http://www.w3.org/2001/XMLSchema#integer",
        None,
    ),
    ("http://ex/s5", "http://ex/p", "bn1", "blank", "_:bg"),
    ("http://ex/s6", "http://ex/p", "", "lit", None),  # empty literal
    ("http://ex/s7", "http://ex/p", "\\\\", "lit", None),  # only backslashes
]

SCHEMA = "subj string, pred string, obj string, okind string, graph string"


@pytest.fixture(scope="module")
def statements(spark):
    return spark.createDataFrame(STATEMENTS, SCHEMA)


class TestRoundTrip:
    def test_format_parse_identity(self, spark, statements):
        lines = format_statements(statements)
        back = parse_statements(lines, col="statement")
        assert sorted(map(tuple, back.collect())) == sorted(STATEMENTS)

    def test_file_round_trip(self, spark, statements, tmp_path):
        out = str(tmp_path / "graph.nq")
        format_statements(statements).write.mode("overwrite").text(out)
        back = read_nquads(spark, out)
        assert sorted(map(tuple, back.collect())) == sorted(STATEMENTS)

    def test_reads_reference_style_golden(self, spark, tmp_path):
        # the exact line shapes the reference's RMLTC goldens contain
        p = tmp_path / "golden.nq"
        p.write_text(
            "# comment line\n"
            "\n"
            "<http://example.com/Student10> <http://xmlns.com/foaf/0.1/name> "
            '"Venus Williams" .\n'
            "_:b1 <http://example.com/ontology/knows> _:b2 "
            "<http://example.com/graph> .\n"
        )
        rows = sorted(map(tuple, read_nquads(spark, str(p)).collect()))
        assert rows == [
            ("_:b1", "http://example.com/ontology/knows", "b2", "blank",
             "http://example.com/graph"),
            ("http://example.com/Student10", "http://xmlns.com/foaf/0.1/name",
             "Venus Williams", "lit", None),
        ]


class TestStrictness:
    def test_malformed_raises(self, spark):
        raw = spark.createDataFrame([("<a> <b> garbage",)], "value string")
        with pytest.raises(Exception, match="malformed"):
            parse_statements(raw).collect()

    def test_malformed_skipped_lenient(self, spark):
        raw = spark.createDataFrame(
            [("<a> <b> garbage",), ('<http://a> <http://b> "ok" .',)],
            "value string",
        )
        got = parse_statements(raw, strict=False).collect()
        assert len(got) == 1 and got[0].obj == "ok"

    def test_unicode_escape_refused(self, spark):
        raw = spark.createDataFrame(
            [('<http://a> <http://b> "x\\u0041y" .',)], "value string"
        )
        with pytest.raises(Exception, match="undecoded"):
            parse_statements(raw).collect()

    def test_comments_and_blanks_dropped(self, spark):
        raw = spark.createDataFrame(
            [("# c",), ("   ",), ('<http://a> <http://b> <http://c> .',)],
            "value string",
        )
        assert parse_statements(raw).count() == 1


class TestPlan:
    def test_parse_is_fully_native(self, spark, statements):
        plan = parse_statements(
            format_statements(statements), col="statement"
        )._jdf.queryExecution().executedPlan().toString()
        assert "EvalPython" not in plan
