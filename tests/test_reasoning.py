"""RDFS entailment materialization (pipeline/reasoning.py) vs a python
forward-chaining replica, including the pathological stratum-breaking
schema the staged pass alone would miss."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.reasoning import (
    RDF_TYPE,
    RDFS_DOMAIN,
    RDFS_RANGE,
    RDFS_SUBCLASS,
    RDFS_SUBPROP,
    rdfs_entailment,
)


def _python_rdfs_fixpoint(triples):
    """Naive forward chaining to fixpoint — the semantics oracle."""
    g = set(triples)
    while True:
        new = set()
        sub_p = {(s, o) for s, p, o in g if p == RDFS_SUBPROP}
        # transitive closures
        for a, b in list(sub_p):
            for c, d in list(sub_p):
                if b == c:
                    new.add((a, RDFS_SUBPROP, d))
        sub_c = {(s, o) for s, p, o in g if p == RDFS_SUBCLASS}
        for a, b in list(sub_c):
            for c, d in list(sub_c):
                if b == c:
                    new.add((a, RDFS_SUBCLASS, d))
        dom = {(s, o) for s, p, o in g if p == RDFS_DOMAIN}
        rng = {(s, o) for s, p, o in g if p == RDFS_RANGE}
        for s, p, o in list(g):
            for a, b in sub_p:
                if p == a:
                    new.add((s, b, o))
            for a, c in dom:
                if p == a:
                    new.add((s, RDF_TYPE, c))
            for a, c in rng:
                if p == a:
                    new.add((o, RDF_TYPE, c))
            if p == RDF_TYPE:
                for a, b in sub_c:
                    if o == a:
                        new.add((s, RDF_TYPE, b))
        if new <= g:
            return g
        g |= new


def _run(spark, rows, **kw):
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    got = {
        (r["subj"], r["pred"], r["obj"])
        for r in rdfs_entailment(df, **kw).collect()
    }
    assert got == _python_rdfs_fixpoint(rows)
    return got


def test_rdfs_rules_end_to_end(spark):
    rows = [
        # instance
        ("t1", "ex:mentions", "e1"),
        ("t2", "ex:mentions", "e2"),
        ("t1", "ex:inConv", "c1"),
        # property hierarchy (two levels -> exercises rdfs5 + rdfs7)
        ("ex:mentions", RDFS_SUBPROP, "ex:references"),
        ("ex:references", RDFS_SUBPROP, "ex:relatedTo"),
        # domain / range
        ("ex:mentions", RDFS_DOMAIN, "ex:Turn"),
        ("ex:mentions", RDFS_RANGE, "ex:Entity"),
        ("ex:inConv", RDFS_RANGE, "ex:Conversation"),
        # class hierarchy (two levels -> rdfs11 + rdfs9)
        ("ex:Entity", RDFS_SUBCLASS, "ex:Resource"),
        ("ex:Conversation", RDFS_SUBCLASS, "ex:Container"),
        ("ex:Container", RDFS_SUBCLASS, "ex:Resource"),
    ]
    got = _run(spark, rows)
    # spot entailments from every rule
    assert ("ex:mentions", RDFS_SUBPROP, "ex:relatedTo") in got  # rdfs5
    assert ("t1", "ex:relatedTo", "e1") in got  # rdfs7 via closure
    assert ("t1", RDF_TYPE, "ex:Turn") in got  # rdfs2
    assert ("e2", RDF_TYPE, "ex:Entity") in got  # rdfs3
    assert ("ex:Conversation", RDFS_SUBCLASS, "ex:Resource") in got  # rdfs11
    assert ("c1", RDF_TYPE, "ex:Resource") in got  # rdfs9 via closure


def test_rdfs_domain_on_inferred_property(spark):
    """rdfs2 must see triples minted by rdfs7 in the same pass: domain is
    declared on the SUPERproperty only."""
    rows = [
        ("s", "ex:p", "o"),
        ("ex:p", RDFS_SUBPROP, "ex:q"),
        ("ex:q", RDFS_DOMAIN, "ex:C"),
    ]
    got = _run(spark, rows)
    assert ("s", RDF_TYPE, "ex:C") in got


_STRATUM_BREAKER = [
    # ex:meta subPropertyOf rdfs:subPropertyOf: rdfs7 MINTS a
    # subPropertyOf edge (ex:a sub ex:b), which only the NEXT pass's
    # property closure can see — the staged order is genuinely broken.
    ("ex:a", "ex:meta", "ex:b"),
    ("ex:meta", RDFS_SUBPROP, RDFS_SUBPROP),
    ("s", "ex:a", "o"),
]


def test_rdfs_pathological_vocabulary_redefinition(spark):
    """A derived subPropertyOf edge feeds an earlier stratum — the
    verification loop must iterate past the first staged pass."""
    got = _run(spark, _STRATUM_BREAKER, max_rounds=4)
    assert ("ex:a", RDFS_SUBPROP, "ex:b") in got  # pass 1 (rdfs7)
    assert ("s", "ex:b", "o") in got  # pass 2 (rdfs7 over the new edge)


def test_rdfs_nonconvergence_raises(spark):
    df = spark.createDataFrame(
        _STRATUM_BREAKER, "subj string, pred string, obj string"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        rdfs_entailment(df, max_rounds=2)


def test_rdfs_partitioning_invariance(spark):
    rows = [
        (f"s{i}", "ex:p", f"o{i % 3}") for i in range(20)
    ] + [
        ("ex:p", RDFS_SUBPROP, "ex:q"),
        ("ex:p", RDFS_DOMAIN, "ex:A"),
        ("ex:p", RDFS_RANGE, "ex:B"),
        ("ex:A", RDFS_SUBCLASS, "ex:Top"),
        ("ex:B", RDFS_SUBCLASS, "ex:Top"),
    ]
    df = spark.createDataFrame(rows, "subj string, pred string, obj string")
    a = {tuple(r) for r in rdfs_entailment(df.repartition(1)).collect()}
    b = {tuple(r) for r in rdfs_entailment(df.repartition(16)).collect()}
    assert a == b == _python_rdfs_fixpoint(rows)
