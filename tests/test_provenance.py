"""RDF reification + PROV-O provenance quads (pipeline/provenance.py)
vs a python replica, including the idempotent-replay merge semantics
(same assertion from two sources -> ONE statement node)."""

import hashlib

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.provenance import (
    PROV_DERIVED_FROM,
    PROV_GENERATED_AT,
    PROV_GENERATED_BY,
    RDF_OBJECT,
    RDF_PREDICATE,
    RDF_STATEMENT,
    RDF_SUBJECT,
    RDF_NS,
    reify_with_provenance,
)

GRAPH = "http://example.com/graph/provenance"
ACT = "http://example.com/activity/test-v1"


def _stmt(s, p, o, prefix="http://example.com/stmt/"):
    return prefix + hashlib.md5(f"{s}\x1f{p}\x1f{o}".encode()).hexdigest()


def _replica(rows, *, derived=True, at=None, act=None):
    out = set()
    for r in rows:
        s, p, o = r[0], r[1], r[2]
        okind = r[3] if len(r) > 3 else "iri"
        st = _stmt(s, p, o)
        out |= {
            (st, RDF_NS + "type", RDF_STATEMENT, "iri", GRAPH),
            (st, RDF_SUBJECT, s, "iri", GRAPH),
            (st, RDF_PREDICATE, p, "iri", GRAPH),
            (st, RDF_OBJECT, o, okind, GRAPH),
        }
        if derived:
            out.add((st, PROV_DERIVED_FROM, s, "iri", GRAPH))
        if at is not None:
            out.add((st, PROV_GENERATED_AT, str(at[(s, p, o)]), "lit", GRAPH))
        if act is not None:
            out.add((st, PROV_GENERATED_BY, act, "iri", GRAPH))
    return out


def test_reify_full_quads(spark):
    rows = [
        ("ex:t1", "ex:mentions", "ex:alice", "iri", 7),
        ("ex:t2", "ex:role", "user", "lit", 9),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string, at long"
    )
    got = {
        tuple(r)
        for r in reify_with_provenance(
            df, derived_from="subj", generated_at="at", activity_iri=ACT
        ).collect()
    }
    at = {(s, p, o): a for s, p, o, _, a in rows}
    assert got == _replica(rows, at=at, act=ACT)


def test_reify_merges_duplicate_assertions(spark):
    """The same (s,p,o) asserted twice (replayed batch) must collapse to
    ONE statement node with ONE reification skeleton."""
    rows = [("ex:t1", "ex:p", "ex:o"), ("ex:t1", "ex:p", "ex:o")]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    out = reify_with_provenance(df).collect()
    got = {tuple(r) for r in out}
    assert len(out) == len(got) == 5  # type/subject/predicate/object/derived
    assert got == _replica([rows[0]])


def test_reify_distinct_sources_share_statement(spark):
    """Two different source turns asserting the same statement: one
    statement node, TWO wasDerivedFrom edges."""
    df = spark.createDataFrame(
        [("ex:s", "ex:p", "ex:o", "ex:turn1"), ("ex:s", "ex:p", "ex:o", "ex:turn2")],
        "subj string, pred string, obj string, src string",
    )
    out = reify_with_provenance(df, derived_from="src")
    derived = {
        r.obj
        for r in out.filter(F.col("pred") == PROV_DERIVED_FROM).collect()
    }
    assert derived == {"ex:turn1", "ex:turn2"}
    assert out.select("subj").distinct().count() == 1


def test_reify_minimal_no_prov(spark):
    df = spark.createDataFrame([("s", "p", "o")], "subj string, pred string, obj string")
    got = {tuple(r) for r in reify_with_provenance(df, derived_from=None).collect()}
    assert got == _replica([("s", "p", "o")], derived=False)


def test_reify_okind_passthrough_literal_object(spark):
    df = spark.createDataFrame(
        [("s", "p", "some literal", "lit")],
        "subj string, pred string, obj string, okind string",
    )
    out = reify_with_provenance(df, derived_from=None)
    obj_row = out.filter(F.col("pred") == RDF_OBJECT).collect()
    assert len(obj_row) == 1 and obj_row[0].okind == "lit"
    # the reification skeleton itself is always IRIs
    others = out.filter(F.col("pred") != RDF_OBJECT).collect()
    assert all(r.okind == "iri" for r in others)
