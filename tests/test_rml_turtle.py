"""RML Turtle front-end: parser units + golden end-to-end parity.

The reference's primary CLI path is ``mopper -m mapping.ttl -l rml``
(``/root/reference/src/main.rs:112-127``), delegating RML→plan translation
to the external ``ltranslator`` crate.  These tests drive our from-scratch
equivalent (``mopper_spark.turtle`` + ``mopper_spark.rml``) over the
reference's *actual* ``mapping.ttl`` files and compare set-wise against its
golden ``output.nq`` — the same contract as its own tests (tests.rs:52-66).
"""

import os

import pytest

from mopper_spark.engine import run_plan_to_lines
from mopper_spark.options import MopperOptions
from mopper_spark.rml import mapping_to_plan, parse_rml, rml_to_plan
from mopper_spark.sources import SourceRegistry
from mopper_spark.turtle import RDF_TYPE, parse_turtle
from tests.conftest import assert_pr, normalize_statements

REF = "/root/reference/test-resources/rml-testcases"

needs_reference = pytest.mark.skipif(
    not os.path.isdir(REF), reason="reference checkout not available"
)


# --------------------------------------------------------------------------
# turtle parser units
# --------------------------------------------------------------------------
def test_turtle_prefixes_and_base():
    doc = parse_turtle(
        """
        @prefix ex: <http://example.com/> .
        @base <http://example.com/base/> .
        <Thing1> a ex:Widget ; ex:label "hello" .
        """
    )
    s = ("iri", "http://example.com/base/Thing1")
    assert doc.value(s, RDF_TYPE) == ("iri", "http://example.com/Widget")
    assert doc.value(s, "http://example.com/label") == ("lit", "hello")


def test_turtle_blank_node_property_lists_nested():
    doc = parse_turtle(
        """
        @prefix ex: <http://ex.org/> .
        ex:s ex:p [ ex:q [ ex:r "deep" ] ; ex:flat "x" ] .
        """
    )
    outer = doc.value(("iri", "http://ex.org/s"), "http://ex.org/p")
    assert outer[0] == "bnode"
    assert doc.value(outer, "http://ex.org/flat") == ("lit", "x")
    inner = doc.value(outer, "http://ex.org/q")
    assert doc.value(inner, "http://ex.org/r") == ("lit", "deep")


def test_turtle_object_lists_and_escapes():
    doc = parse_turtle(
        '@prefix ex: <http://ex.org/> .\n'
        'ex:s ex:p "a", "b\\n\\"c" ; ex:q ex:o1 , ex:o2 .'
    )
    s = ("iri", "http://ex.org/s")
    assert [o[1] for o in doc.objects(s, "http://ex.org/p")] == ["a", 'b\n"c']
    assert len(doc.objects(s, "http://ex.org/q")) == 2


def test_turtle_comments_lang_and_datatype_consumed():
    doc = parse_turtle(
        """
        @prefix ex: <http://ex.org/> .  # a comment
        @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
        ex:s ex:p "tagged"@en ; ex:q "5"^^xsd:integer .  # trailing
        """
    )
    s = ("iri", "http://ex.org/s")
    # annotations are PRESERVED in the kind (engine okind encoding) since
    # the Turtle-writer round-trip landed; mapping consumers only ever
    # test kind == "iri", so RML semantics are unchanged
    assert doc.value(s, "http://ex.org/p") == ("lit@en", "tagged")
    assert doc.value(s, "http://ex.org/q") == (
        "lit^^http://www.w3.org/2001/XMLSchema#integer",
        "5",
    )


def test_turtle_errors_are_clear():
    with pytest.raises(Exception, match="Undefined prefix"):
        parse_turtle("nope:s nope:p nope:o .")


_RML_PREAMBLE = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://ex.org/> .
"""


def test_rml_refusals_are_named():
    """Malformed mappings raise RmlTranslateError with the offending node
    named — never a bare TypeError (ADVICE r1)."""
    from mopper_spark.rml import RmlTranslateError

    missing_child = _RML_PREAMBLE + """
    <TM> a rr:TriplesMap ;
      rml:logicalSource [ rml:source "a.csv" ; rml:referenceFormulation ql:CSV ] ;
      rr:subjectMap [ rr:template "http://ex.org/{id}" ] ;
      rr:predicateObjectMap [
        rr:predicate ex:p ;
        rr:objectMap [ rr:parentTriplesMap <TM> ;
                       rr:joinCondition [ rr:parent "id" ] ]
      ] .
    """
    with pytest.raises(RmlTranslateError, match="missing rr:child"):
        rml_to_plan(missing_child)

    bad_formulation = _RML_PREAMBLE + """
    <TM> a rr:TriplesMap ;
      rml:logicalSource [ rml:source "a.csv" ;
                          rml:referenceFormulation ql:SPARQLResults ] ;
      rr:subjectMap [ rr:template "http://ex.org/{id}" ] .
    """
    with pytest.raises(RmlTranslateError, match="CSV, JSONPath, XPath"):
        rml_to_plan(bad_formulation)


# --------------------------------------------------------------------------
# rml model extraction
# --------------------------------------------------------------------------
RML_DOC = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix foaf: <http://xmlns.com/foaf/0.1/> .
@base <http://example.com/base/> .

<TM1> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "people.csv" ; rml:referenceFormulation ql:CSV ] ;
  rr:subjectMap [ rr:template "http://example.com/p/{id}" ;
                  rr:class foaf:Person ;
                  rr:graph <http://example.com/g/people> ] ;
  rr:predicateObjectMap [
    rr:predicate foaf:name ;
    rr:objectMap [ rml:reference "name" ]
  ] .
"""


def test_parse_rml_model():
    maps, by_node, base = parse_rml(RML_DOC)
    assert base == "http://example.com/base/"
    (tm,) = maps
    assert tm.source_path == "people.csv"
    assert tm.subject.template == "http://example.com/p/{id}"
    assert tm.classes == ["http://xmlns.com/foaf/0.1/Person"]
    assert tm.subject_graphs[0].constant == "http://example.com/g/people"
    (pom,) = tm.poms
    assert pom.predicates[0].constant == "http://xmlns.com/foaf/0.1/name"
    assert pom.objects[0].reference == "name"
    assert pom.objects[0].term_type == "Literal"


def test_rml_simple_end_to_end(spark):
    registry = SourceRegistry()
    registry.register(
        "people.csv",
        spark.createDataFrame([("1", "Ada Lovelace")], "id string, name string"),
    )
    plan = rml_to_plan(RML_DOC)
    lines = normalize_statements(
        run_plan_to_lines(plan, spark, MopperOptions(), registry)
    )
    assert lines == {
        "<http://example.com/p/1> <http://www.w3.org/1999/02/22-rdf-syntax-ns#type> "
        "<http://xmlns.com/foaf/0.1/Person> <http://example.com/g/people> .",
        "<http://example.com/p/1> <http://xmlns.com/foaf/0.1/name> \"Ada Lovelace\" "
        "<http://example.com/g/people> .",
    }


def test_rml_literal_annotations_flagged(spark):
    """rr:datatype / rr:language serialize as "v"^^<dtype> / "v"@lang under
    MopperOptions(literal_annotations=True) and are omitted (reference
    parity, literal.rs:36-37 TODO) by default."""
    doc = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
    @prefix xsd: <http://www.w3.org/2001/XMLSchema#> .
    @prefix ex: <http://ex.org/> .

    <TM> a rr:TriplesMap ;
      rml:logicalSource [ rml:source "p.csv" ; rml:referenceFormulation ql:CSV ] ;
      rr:subjectMap [ rr:template "http://ex.org/p/{id}" ] ;
      rr:predicateObjectMap [
        rr:predicate ex:age ;
        rr:objectMap [ rml:reference "age" ; rr:datatype xsd:integer ]
      ] ;
      rr:predicateObjectMap [
        rr:predicate ex:label ;
        rr:objectMap [ rml:reference "label" ; rr:language "en" ]
      ] .
    """
    registry = SourceRegistry()
    registry.register(
        "p.csv",
        spark.createDataFrame([("1", "42", "hi")], "id string, age string, label string"),
    )
    plan = rml_to_plan(doc)
    parity = normalize_statements(
        run_plan_to_lines(plan, spark, MopperOptions(), registry)
    )
    assert '<http://ex.org/p/1> <http://ex.org/age> "42" .' in parity
    assert '<http://ex.org/p/1> <http://ex.org/label> "hi" .' in parity
    annotated = normalize_statements(
        run_plan_to_lines(
            plan, spark, MopperOptions(literal_annotations=True), registry
        )
    )
    assert (
        '<http://ex.org/p/1> <http://ex.org/age> '
        '"42"^^<http://www.w3.org/2001/XMLSchema#integer> .' in annotated
    )
    assert '<http://ex.org/p/1> <http://ex.org/label> "hi"@en .' in annotated


def test_rml_same_source_nonidentity_selfjoin(spark):
    """A RefObjectMap whose parent reads the SAME source but joins on
    different columns (employee→manager) must execute as a TRUE self-join:
    objects come from the matched parent row and unmatched rows emit
    nothing.  The reference would eliminate this join and mis-evaluate
    (documented divergence, rewriter.eliminate_self_joins)."""
    doc = """
    @prefix rr: <http://www.w3.org/ns/r2rml#> .
    @prefix rml: <http://semweb.mmlab.be/ns/rml#> .
    @prefix ql: <http://semweb.mmlab.be/ns/ql#> .
    @prefix ex: <http://ex.org/> .

    <TMEmp> a rr:TriplesMap ;
      rml:logicalSource [ rml:source "emp.csv" ; rml:referenceFormulation ql:CSV ] ;
      rr:subjectMap [ rr:template "http://ex.org/emp/{id}" ] ;
      rr:predicateObjectMap [
        rr:predicate ex:name ;
        rr:objectMap [ rml:reference "name" ]
      ] ;
      rr:predicateObjectMap [
        rr:predicate ex:manager ;
        rr:objectMap [ rr:parentTriplesMap <TMEmp> ;
                       rr:joinCondition [ rr:child "mgr_id" ; rr:parent "id" ] ]
      ] .
    """
    registry = SourceRegistry()
    registry.register(
        "emp.csv",
        spark.createDataFrame(
            [("1", "99", "A"), ("2", "1", "B"), ("3", "1", "C")],
            "id string, mgr_id string, name string",
        ),
    )
    produced = normalize_statements(
        run_plan_to_lines(rml_to_plan(doc), spark, MopperOptions(), registry)
    )
    assert produced == {
        '<http://ex.org/emp/1> <http://ex.org/name> "A" .',
        '<http://ex.org/emp/2> <http://ex.org/name> "B" .',
        '<http://ex.org/emp/3> <http://ex.org/name> "C" .',
        "<http://ex.org/emp/2> <http://ex.org/manager> <http://ex.org/emp/1> .",
        "<http://ex.org/emp/3> <http://ex.org/manager> <http://ex.org/emp/1> .",
    }


def test_shexml_dispatch():
    # -l shexml routes to the ShExML front-end (full tests: test_shexml.py)
    from mopper_spark.shexml import ShexmlTranslateError

    with pytest.raises(ShexmlTranslateError):
        mapping_to_plan("NOT A MAPPING", "shexml")
    with pytest.raises(ValueError, match="Unknown mapping language"):
        mapping_to_plan("x", "r2rmlish")


# --------------------------------------------------------------------------
# golden parity: the reference's own mapping.ttl files end-to-end
# --------------------------------------------------------------------------
def _run_ttl_case(spark, case, frames, schemas):
    registry = SourceRegistry()
    for path, rows in frames.items():
        registry.register(path, spark.createDataFrame(rows, schemas[path]))
    with open(f"{REF}/{case}/mapping.ttl") as f:
        plan = rml_to_plan(f.read())
    with open(f"{REF}/{case}/output.nq") as f:
        golden = normalize_statements(f.read().splitlines())
    produced = normalize_statements(
        run_plan_to_lines(plan, spark, MopperOptions(), registry)
    )
    return produced, golden


@needs_reference
def test_ttl_rmltc0000_empty(spark):
    produced, golden = _run_ttl_case(
        spark, "RMLTC0000-CSV", {"student.csv": []}, {"student.csv": "Name string"}
    )
    assert produced == golden == set()


@needs_reference
def test_ttl_rmltc0008b_selfjoin_uriencode(spark):
    produced, golden = _run_ttl_case(
        spark,
        "RMLTC0008b-CSV",
        {"student.csv": [("10", "Venus Williams", "Tennis")]},
        {"student.csv": "ID string, Name string, Sport string"},
    )
    assert_pr(produced, golden)
    assert produced == golden
    assert len(golden) == 5


@needs_reference
def test_ttl_rmltc1036_join_named_graphs(spark):
    students = [
        ("10", "100", "Venus Williams"),
        ("20", "200", "Demi Moore"),
        ("30", "100", "Roger F Rabbit"),
        ("40", "300", "De René"),
        ("50", "200", "Roger De Vlaeminck"),
        ("60", "300", "Het Loze Visserke"),
    ]
    sports = [
        ("100", "Tennis"),
        ("200", "Fietsen"),
        ("300", "Vissen"),
        ("400", "De sport die niemand doet"),
    ]
    produced, golden = _run_ttl_case(
        spark,
        "RMLTC1036-CSV",
        {"student.csv": students, "sport.csv": sports},
        {
            "student.csv": "ID string, Sport string, Name string",
            "sport.csv": "ID string, Name string",
        },
    )
    assert_pr(produced, golden)
    assert produced == golden
    assert len(golden) == 32


# --------------------------------------------------------------------------
# CLI (python -m mopper_spark), reference main.rs arg surface
# --------------------------------------------------------------------------
@needs_reference
def test_cli_rml_golden_to_file(tmp_path):
    import subprocess
    import sys

    out = tmp_path / "out.nq"
    proc = subprocess.run(
        [
            sys.executable, "-m", "mopper_spark",
            "-m", f"{REF}/RMLTC1036-CSV/mapping.ttl",
            "-l", "rml", "-q", "-d",
            "--force-to-file", str(out),
        ],
        capture_output=True, text=True, timeout=600,
        cwd=os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    )
    assert proc.returncode == 0, proc.stderr[-2000:]
    with open(f"{REF}/RMLTC1036-CSV/output.nq") as f:
        golden = normalize_statements(f.read().splitlines())
    produced = normalize_statements(out.read_text().splitlines())
    assert_pr(produced, golden)
    assert produced == golden


# --------------------------------------------------------------------------
# property: literal escape round-trip through the Turtle parser
# --------------------------------------------------------------------------
from hypothesis import given, settings  # noqa: E402
from hypothesis import strategies as st  # noqa: E402


def _escape_turtle(s: str) -> str:
    out = []
    for ch in s:
        if ch == "\\":
            out.append("\\\\")
        elif ch == '"':
            out.append('\\"')
        elif ch == "\n":
            out.append("\\n")
        elif ch == "\r":
            out.append("\\r")
        elif ch == "\t":
            out.append("\\t")
        else:
            out.append(ch)
    return "".join(out)


@settings(max_examples=200, deadline=None)
@given(st.text(max_size=60))
def test_turtle_literal_roundtrip(s):
    doc = parse_turtle(
        '@prefix ex: <http://ex.org/> .\n'
        f'ex:s ex:p "{_escape_turtle(s)}" .'
    )
    assert doc.value(("iri", "http://ex.org/s"), "http://ex.org/p") == ("lit", s)



def test_non_existing_file_source_errors(spark):
    """Mirror of the reference's negative-path case
    (test-resources/tests/non-existing-file-source, lib.rs:138-142): a
    SourceOp whose file is missing fails the run with a clear error."""
    import json

    from mopper_spark.engine import run_plan

    path = "/root/reference/test-resources/tests/non-existing-file-source/mapping.json"
    if os.path.exists(path):
        with open(path) as f:
            plan = f.read()
    else:
        plan = json.dumps({
            "nodes": [
                {"id": "S0", "operator": {"type": "SourceOp", "config": {
                    "path": "does-not-exist.csv", "source_type": "File",
                    "root_iterator": {"reference_formulation": "CSVRows", "fields": []}}}},
                {"id": "T1", "operator": {"type": "TargetOp", "config": {"target_type": "StdOut"}}},
            ],
            "edges": [[0, 1, {"fragment": "default"}]],
        })
    with pytest.raises(FileNotFoundError):
        run_plan(plan, spark, MopperOptions(working_dir_hint="/tmp"))



def test_rml_json_source_end_to_end(spark, tmp_path):
    """Beyond reference parity: ql:JSONPath logical source with a simple
    iterator executes through the same plan pipeline (the reference lists
    JSON as roadmap-only, README.md:62-65)."""
    doc = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/> .

<JMap> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "students.json" ;
                      rml:referenceFormulation ql:JSONPath ;
                      rml:iterator "$.students[*]" ] ;
  rr:subjectMap [ rr:template "http://example.com/student/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rml:reference "name" ] ] .
"""
    jf = tmp_path / "students.json"
    jf.write_text(
        '{"students": [{"id": 7, "name": "Ada L"}, {"id": 8, "name": "Grace H"}]}'
    )
    plan = rml_to_plan(doc)
    lines = normalize_statements(
        run_plan_to_lines(
            plan, spark, MopperOptions(working_dir_hint=str(tmp_path))
        )
    )
    assert lines == {
        '<http://example.com/student/7> <http://example.com/name> "Ada L" .',
        '<http://example.com/student/8> <http://example.com/name> "Grace H" .',
    }


def test_json_iterator_subset_errors(spark, tmp_path):
    from mopper_spark.sources import _json_iterate

    jf = tmp_path / "x.json"
    jf.write_text('{"a": {"b": [1, 2]}}')
    with pytest.raises(NotImplementedError, match="JSONPath iterator"):
        _json_iterate(spark, str(jf), "$..recursive")
    with pytest.raises(ValueError, match="not in"):
        _json_iterate(spark, str(jf), "$.nope[*]")



def test_rml_xml_source_end_to_end(spark, tmp_path):
    """Beyond reference parity: ql:XPath logical source (subset /a/b)."""
    doc = """
@prefix rr: <http://www.w3.org/ns/r2rml#> .
@prefix rml: <http://semweb.mmlab.be/ns/rml#> .
@prefix ql: <http://semweb.mmlab.be/ns/ql#> .
@prefix ex: <http://example.com/> .

<XMap> a rr:TriplesMap ;
  rml:logicalSource [ rml:source "students.xml" ;
                      rml:referenceFormulation ql:XPath ;
                      rml:iterator "/students/student" ] ;
  rr:subjectMap [ rr:template "http://example.com/student/{id}" ] ;
  rr:predicateObjectMap [ rr:predicate ex:name ; rr:objectMap [ rml:reference "name" ] ] .
"""
    xf = tmp_path / "students.xml"
    xf.write_text(
        "<students>"
        "<student id=\"7\"><name>Ada L</name></student>"
        "<student id=\"8\"><name>Grace H</name></student>"
        "</students>"
    )
    lines = normalize_statements(
        run_plan_to_lines(
            rml_to_plan(doc), spark, MopperOptions(working_dir_hint=str(tmp_path))
        )
    )
    assert lines == {
        '<http://example.com/student/7> <http://example.com/name> "Ada L" .',
        '<http://example.com/student/8> <http://example.com/name> "Grace H" .',
    }


def test_orc_and_jsonl_sources(spark, tmp_path):
    """resolve_source format surface: .orc (Spark-core columnar) and
    .jsonl / .ndjson (line-splittable JSON) next to parquet/CSV — all on
    the engine's all-string scan contract; nested JSONL values arrive as
    JSON-encoded strings (the discovery-mode contract)."""
    from mopper_spark.engine import MopperOptions
    from mopper_spark.sources import resolve_source

    orc = str(tmp_path / "t.orc")
    spark.createDataFrame(
        [(1, "x"), (2, "y")], "id int, v string"
    ).write.orc(orc)
    jl = str(tmp_path / "t.jsonl")
    with open(jl, "w") as fh:
        fh.write('{"id": 1, "nested": {"a": 2}}\n{"id": 3, "nested": {"a": 4}}\n')

    opts = MopperOptions(working_dir_hint=str(tmp_path))
    got_orc = resolve_source(spark, {"path": "t.orc"}, opts)
    assert got_orc.schema.simpleString() == "struct<id:string,v:string>"
    assert sorted(map(tuple, got_orc.collect())) == [("1", "x"), ("2", "y")]

    got_jl = resolve_source(spark, {"path": "t.jsonl"}, opts)
    rows = sorted(map(tuple, got_jl.collect()))
    assert rows == [("1", '{"a":2}'), ("3", '{"a":4}')]
