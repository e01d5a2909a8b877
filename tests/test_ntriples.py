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


class TestTurtleWriter:
    """format_turtle / turtle_document — lossless Turtle round-trip via
    the (annotation-preserving) turtle.py parser."""

    @pytest.fixture(scope="class")
    def stmts(self, spark):
        rows = [
            ("http://ex/s1", "http://ex/ont/p", "plain lit", "lit"),
            ("http://ex/s1", "http://ex/ont/p", 'esc "q" \\ \n\t', "lit"),
            ("http://ex/s1", "http://www.w3.org/1999/02/22-rdf-syntax-ns#type",
             "http://ex/ont/Thing", "iri"),
            ("http://ex/s1", "http://ex/ont/q", "http://ex/s2", "iri"),
            ("http://ex/s2", "http://ex/ont/p", "bonjour", "lit@fr"),
            ("http://ex/s2", "http://ex/ont/n", "42",
             "lit^^http://www.w3.org/2001/XMLSchema#integer"),
            ("_:b0", "http://ex/ont/p", "node", "blank"),
            # IRI with PN_LOCAL-unsafe local part: stays <wrapped>
            ("http://ex/s2", "http://ex/ont/p", "http://ex/weird/a(b)", "iri"),
        ]
        return spark.createDataFrame(
            rows, "subj string, pred string, obj string, okind string"
        )

    def test_round_trip_lossless(self, spark, stmts):
        from mopper_spark.ntriples import turtle_document
        from mopper_spark.turtle import parse_turtle

        doc = turtle_document(
            stmts, {"ont": "http://ex/ont/", "ex": "http://ex/"}
        )
        assert "@prefix ont: <http://ex/ont/> ." in doc
        assert " a ont:Thing" in doc  # rdf:type renders as 'a'
        parsed = {
            (s[1], p, o[1], o[0] if o[0] != "bnode" else "blank")
            for (s, p, o) in parse_turtle(doc).triples
        }
        want = {
            (r.subj, r.pred, r.obj, r.okind) for r in stmts.collect()
        }
        # blank-node OBJECT labels survive; blank subject keeps _: prefix
        # in our schema, parser strips it
        want = {
            (s[2:] if s.startswith("_:") else s, p, o, k)
            for (s, p, o, k) in want
        }
        parsed = {
            (s, p, o, k) for (s, p, o, k) in parsed
        }
        assert parsed == want

    def test_deterministic_under_partitioning(self, spark, stmts):
        from mopper_spark.ntriples import turtle_document

        a = turtle_document(stmts, {"ont": "http://ex/ont/"})
        b = turtle_document(stmts.repartition(7), {"ont": "http://ex/ont/"})
        assert a == b

    def test_named_graph_refused_in_plan(self, spark):
        from mopper_spark.ntriples import format_turtle

        df = spark.createDataFrame(
            [("http://ex/s", "http://ex/p", "o", "lit", "http://ex/g")],
            "subj string, pred string, obj string, okind string, graph string",
        )
        out = format_turtle(df)
        with pytest.raises(Exception, match="named graph"):
            out.collect()
        # NULL graphs are fine
        df2 = spark.createDataFrame(
            [("http://ex/s", "http://ex/p", "o", "lit", None)],
            "subj string, pred string, obj string, okind string, graph string",
        )
        assert format_turtle(df2).count() == 1

    def test_unsafe_local_part_not_compacted(self, spark, stmts):
        from mopper_spark.ntriples import format_turtle

        blocks = {
            r.subj: r.block
            for r in format_turtle(stmts, {"ex": "http://ex/"}).collect()
        }
        assert "<http://ex/weird/a(b)>" in blocks["http://ex/s2"]

    def test_parser_preserves_annotations(self):
        from mopper_spark.turtle import parse_turtle

        doc = (
            '@prefix xsd: <http://www.w3.org/2001/XMLSchema#> .\n'
            '<http://ex/s> <http://ex/p> "bonjour"@fr , '
            '"42"^^xsd:integer , "plain" .\n'
        )
        kinds = sorted(o[0] for (_s, _p, o) in parse_turtle(doc).triples)
        assert kinds == [
            "lit",
            "lit@fr",
            "lit^^http://www.w3.org/2001/XMLSchema#integer",
        ]
