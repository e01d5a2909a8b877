"""RDF reification: statement-level metadata round-trip.

Standard RDF 1.1 reification (W3C RDF Primer §5.3) represents a triple
(s, p, o) as four triples about a fresh statement resource:

    _stmt  rdf:type       rdf:Statement
    _stmt  rdf:subject    s
    _stmt  rdf:predicate  p
    _stmt  rdf:object     o

It is how a plain triple store attaches provenance/confidence to
individual statements without quads or RDF-star — directly relevant to a
KG-construction pipeline whose per-triple lineage (which turn, which
rule) must survive serialization to N-Triples.

``reify`` mints DETERMINISTIC statement IRIs (md5 of the canonical
subject/predicate/object/okind tuple) rather than blank nodes, so
re-running the pipeline — or running it on two clusters — yields the
same graph (the skolemization discipline of ``graphsig.py``), and
reification is idempotent over duplicate triples (distinct first).

``unreify`` inverts it with a 3-pattern BGP star join + one okind
recovery join — a real SPARQL-shaped query, not a column shuffle — so
``unreify(reify(kg)) == distinct(kg)`` is an executable contract (the
``kg_reify_roundtrip`` gate query pins it against a SQL oracle).

Scale shape: ``reify`` is one narrow pass (explode ×4, no shuffle);
``unreify`` is a star join on the statement IRI — equi-joins on a
uniformly-hashed md5 key, skew-free by construction, AQE-broadcastable
when the reified slice is small.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from .bgp import bgp_match

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"


def reify(
    kg: DataFrame,
    *,
    stmt_ns: str = "http://example.com/stmt/",
) -> DataFrame:
    """(subj, pred, obj, okind) → the 4-triple reification of each
    DISTINCT statement, as (subj, pred, obj, okind) rows.  The statement
    IRI is ``stmt_ns + md5(s␟p␟o␟okind)`` — deterministic and
    collision-safe for any corpus small enough to store (md5's 128 bits
    vs ~2^60 realistic statements)."""
    t = kg.select("subj", "pred", "obj", "okind").distinct()
    stmt = F.concat(
        F.lit(stmt_ns),
        F.md5(F.concat_ws("\x1f", "subj", "pred", "obj", "okind")),
    )
    four = F.array(
        F.struct(
            F.lit(RDF_NS + "type").alias("pred"),
            F.lit(RDF_NS + "Statement").alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_NS + "subject").alias("pred"),
            F.col("subj").alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_NS + "predicate").alias("pred"),
            F.col("pred").alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_NS + "object").alias("pred"),
            F.col("obj").alias("obj"),
            F.col("okind").alias("okind"),
        ),
    )
    return t.select(stmt.alias("subj"), F.explode(four).alias("x")).select(
        "subj",
        F.col("x.pred").alias("pred"),
        F.col("x.obj").alias("obj"),
        F.col("x.okind").alias("okind"),
    )


def unreify(reified: DataFrame) -> DataFrame:
    """Invert ``reify``: recover the DISTINCT (subj, pred, obj, okind)
    statements from their reification via the BGP star

        ?st rdf:type rdf:Statement . ?st rdf:subject ?subj .
        ?st rdf:predicate ?pred .

    plus one join to the rdf:object rows, whose ``okind`` column carries
    the original object kind (IRI vs literal) — the one bit RDF
    reification itself cannot express in the object position."""
    triples = reified.select("subj", "pred", "obj")
    star = bgp_match(
        triples,
        [
            ("?st", RDF_NS + "type", RDF_NS + "Statement"),
            ("?st", RDF_NS + "subject", "?subj"),
            ("?st", RDF_NS + "predicate", "?pred"),
        ],
        select=["st", "subj", "pred"],
    )
    objs = reified.filter(F.col("pred") == RDF_NS + "object").select(
        F.col("subj").alias("st"),
        F.col("obj").alias("obj"),
        F.col("okind").alias("okind"),
    )
    return star.join(objs, "st").select("subj", "pred", "obj", "okind").distinct()
