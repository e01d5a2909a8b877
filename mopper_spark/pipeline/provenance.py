"""Per-triple provenance: RDF reification + PROV-O derivation quads.

The reference engine emits bare triples (``src/operator/serializer.rs``
writes N-Triples/N-Quads with no statement identity); a KG built from
transcripts at scale needs the opposite discipline — every emitted
statement must answer "which turn produced you, when, by which rule?"
so that bad extractions can be traced, audited, and retracted
batch-wise.  This module materializes that as standard W3C vocabulary:

    RDF reification (RDF 1.1 Concepts §5.3):
        stmt  rdf:type       rdf:Statement
        stmt  rdf:subject    s
        stmt  rdf:predicate  p
        stmt  rdf:object     o
    PROV-O (W3C PROV-O recommendation):
        stmt  prov:wasDerivedFrom    <source entity, e.g. the turn IRI>
        stmt  prov:generatedAtTime   <literal, e.g. the turn's epoch-us>
        stmt  prov:wasGeneratedBy    <activity IRI, e.g. the rule id>

Statement identity is a deterministic skolem IRI minted from the md5 of
the (s, p, o) content — engine-portable (DuckDB ``md5(... || chr(31)
|| ...)`` reproduces it), partitioning-proof, and idempotent across
re-runs: the same assertion re-extracted from a replayed batch maps to
the SAME statement node, so provenance accumulates as extra
wasDerivedFrom edges instead of duplicate statement blobs (exactly the
merge semantics idempotent checkpoint replay needs).

Scale shape: ONE narrow pass — the per-triple fan-out (4 fixed quads +
up to 3 provenance quads) is an array-of-structs explode with the md5
computed once per input row below the explode, the same plan discipline
as the extraction stage (pipeline/extract.py); the only shuffle is the
final distinct, which collapses the duplicated reification skeletons of
repeated assertions and is keyed by the statement id (uniform md5 — no
skew regardless of how hot a source conversation is).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

RDF_NS = "http://www.w3.org/1999/02/22-rdf-syntax-ns#"
PROV_NS = "http://www.w3.org/ns/prov#"
RDF_STATEMENT = RDF_NS + "Statement"
RDF_SUBJECT = RDF_NS + "subject"
RDF_PREDICATE = RDF_NS + "predicate"
RDF_OBJECT = RDF_NS + "object"
PROV_DERIVED_FROM = PROV_NS + "wasDerivedFrom"
PROV_GENERATED_AT = PROV_NS + "generatedAtTime"
PROV_GENERATED_BY = PROV_NS + "wasGeneratedBy"

_US = "\x1f"


def statement_iri(prefix: str = "http://example.com/stmt/") -> Column:
    """Deterministic skolem statement IRI for the row's (subj, pred, obj)."""
    return F.concat(
        F.lit(prefix),
        F.md5(F.concat_ws(_US, "subj", "pred", "obj").cast("binary")),
    )


def reify_with_provenance(
    triples: DataFrame,
    *,
    derived_from: str | None = "subj",
    generated_at: str | None = None,
    activity_iri: str | None = None,
    stmt_prefix: str = "http://example.com/stmt/",
    graph_iri: str = "http://example.com/graph/provenance",
) -> DataFrame:
    """Reify ``triples`` (columns subj, pred, obj; okind honoured when
    present, else objects are treated as IRIs) into provenance quads
    ``(subj, pred, obj, okind, graph)`` in the ``graph_iri`` named graph.

    ``derived_from`` / ``generated_at`` name columns of ``triples``
    carrying the source entity IRI and the generation-time literal; pass
    ``None`` to omit that quad.  ``activity_iri`` is a constant (the
    extraction rule / job id) stamped on every statement.  Output column
    names match the pipeline's quad convention so the result unions
    cleanly with the asserted graph for a single materialize.
    """
    okind = (
        F.col("okind") if "okind" in triples.columns else F.lit("iri")
    )
    base = triples.select(
        statement_iri(stmt_prefix).alias("stmt"),
        "subj",
        "pred",
        "obj",
        okind.alias("_okind"),
        *(
            [F.col(derived_from).alias("_src")]
            if derived_from is not None
            else []
        ),
        *(
            [F.col(generated_at).cast("string").alias("_at")]
            if generated_at is not None
            else []
        ),
    )
    parts = [
        F.struct(
            F.lit(RDF_NS + "type").alias("pred"),
            F.lit(RDF_STATEMENT).alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_SUBJECT).alias("pred"),
            F.col("subj").alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_PREDICATE).alias("pred"),
            F.col("pred").alias("obj"),
            F.lit("iri").alias("okind"),
        ),
        F.struct(
            F.lit(RDF_OBJECT).alias("pred"),
            F.col("obj").alias("obj"),
            F.col("_okind").alias("okind"),
        ),
    ]
    if derived_from is not None:
        parts.append(
            F.struct(
                F.lit(PROV_DERIVED_FROM).alias("pred"),
                F.col("_src").alias("obj"),
                F.lit("iri").alias("okind"),
            )
        )
    if generated_at is not None:
        parts.append(
            F.struct(
                F.lit(PROV_GENERATED_AT).alias("pred"),
                F.col("_at").alias("obj"),
                F.lit("lit").alias("okind"),
            )
        )
    if activity_iri is not None:
        parts.append(
            F.struct(
                F.lit(PROV_GENERATED_BY).alias("pred"),
                F.lit(activity_iri).alias("obj"),
                F.lit("iri").alias("okind"),
            )
        )
    exploded = base.select(
        "stmt", F.explode(F.array(*parts)).alias("t")
    )
    return exploded.select(
        F.col("stmt").alias("subj"),
        F.col("t.pred").alias("pred"),
        F.col("t.obj").alias("obj"),
        F.col("t.okind").alias("okind"),
        F.lit(graph_iri).alias("graph"),
    ).distinct()
