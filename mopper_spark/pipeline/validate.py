"""SHACL-lite shape validation over the materialized graph table.

A construction pipeline needs a data-quality gate between extraction and
publication; the W3C vocabulary for that is SHACL.  This implements the
four constraint families that cover most production shape graphs
(cf. SHACL core, https://www.w3.org/TR/shacl/), compiled to native
DataFrame ops — each shape is a filter or one aggregation over the triple
scan, so a full validation pass is O(|G|) with word-count-shaped
shuffles, and on the subject-bucketed table (``materialize.py``)
cardinality and pairing checks are zero-Exchange:

- ``range_kind``    — sh:nodeKind / sh:datatype: the object kind of a
                      predicate must equal the declared kind (row filter);
- ``domain_prefix`` — sh:targetSubjectsOf + pattern: subjects of a
                      predicate must match an IRI prefix (row filter);
- ``max_count``     — sh:maxCount per (subj, pred) (one aggregation);
- ``requires``      — sh:minCount 1 on pred B for subjects of pred A
                      (distinct + anti-join);
- ``value_in``      — sh:in: literal objects must come from a closed
                      value set (NOT-IN row filter — the set is a plan
                      constant, never a join);
- ``obj_pattern``   — sh:pattern: object must FULLY match the regex
                      (anchored internally; RE2-portable subset, row
                      filter);
- ``class_of``      — sh:class: every OBJECT of the predicate must be
                      rdf:type the given class (distinct + anti-join on
                      the object column).

Violations come back as data, one row each — ``(subj, pred, code,
detail)`` — not exceptions: at 100 TB the report is itself a table to
write, triage, and diff between runs.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


@dataclass(frozen=True)
class Shape:
    """Constraints for one predicate.  Any subset may be set."""

    pred: str
    range_kind: str | None = None  # exact okind: 'iri' | 'lit' | 'blank' | ...
    domain_prefix: str | None = None  # subject IRI must start with this
    max_count: int | None = None  # max objects per subject
    requires: str | None = None  # subjects of `pred` must also have this pred
    value_in: tuple[str, ...] | None = None  # closed set of allowed objects
    obj_pattern: str | None = None  # regex the object must fully match
    class_of: str | None = None  # objects must be rdf:type this class


_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _v(subj, pred: str, code: str, detail) -> list:
    return [
        subj.alias("subj"),
        F.lit(pred).alias("pred"),
        F.lit(code).alias("code"),
        detail.alias("detail"),
    ]


def validate_shapes(triples: DataFrame, shapes: list[Shape]) -> DataFrame:
    """Validate the graph against ``shapes``; returns the violation table
    ``(subj, pred, code, detail)`` (empty = conformant).

    One scan per constraint, unioned; Catalyst collapses the scans into
    shared exchanges where possible and every constraint's shuffle (if
    any) is keyed on ``subj`` — co-located on a subject-bucketed table.
    """
    parts: list[DataFrame] = []
    for s in shapes:
        scoped = triples.filter(F.col("pred") == s.pred)
        if s.range_kind is not None:
            parts.append(
                scoped.filter(F.col("okind") != s.range_kind).select(
                    *_v(F.col("subj"), s.pred, "range_kind", F.col("okind"))
                )
            )
        if s.domain_prefix is not None:
            parts.append(
                scoped.filter(~F.col("subj").startswith(s.domain_prefix)).select(
                    *_v(F.col("subj"), s.pred, "domain_prefix", F.col("subj"))
                )
            )
        if s.max_count is not None:
            counts = scoped.groupBy("subj").agg(
                F.countDistinct("obj").alias("n")
            )
            parts.append(
                counts.filter(F.col("n") > s.max_count).select(
                    *_v(
                        F.col("subj"),
                        s.pred,
                        "max_count",
                        F.col("n").cast("string"),
                    )
                )
            )
        if s.requires is not None:
            have = scoped.select("subj").distinct()
            have_req = (
                triples.filter(F.col("pred") == s.requires)
                .select("subj")
                .distinct()
            )
            parts.append(
                have.join(have_req, "subj", "left_anti").select(
                    *_v(F.col("subj"), s.pred, "requires", F.lit(s.requires))
                )
            )
        if s.value_in is not None:
            allowed = list(s.value_in)
            if not allowed:
                raise ValueError(f"value_in for {s.pred!r} must be non-empty")
            parts.append(
                scoped.filter(~F.col("obj").isin(allowed)).select(
                    *_v(F.col("subj"), s.pred, "value_in", F.col("obj"))
                )
            )
        if s.obj_pattern is not None:
            # regexp_like is a SUBSTRING search; the documented contract is
            # full-match, so anchor the pattern (idempotent for patterns
            # the author already anchored)
            anchored = f"^(?:{s.obj_pattern})$"
            parts.append(
                scoped.filter(
                    ~F.regexp_like(F.col("obj"), F.lit(anchored))
                ).select(
                    *_v(F.col("subj"), s.pred, "obj_pattern", F.col("obj"))
                )
            )
        if s.class_of is not None:
            typed = (
                triples.filter(
                    (F.col("pred") == _RDF_TYPE) & (F.col("obj") == s.class_of)
                )
                .select(F.col("subj").alias("obj"))
                .distinct()
            )
            objs = scoped.select("subj", "obj")
            parts.append(
                objs.join(typed, "obj", "left_anti").select(
                    *_v(F.col("subj"), s.pred, "class_of", F.col("obj"))
                )
            )
    if not parts:
        raise ValueError("validate_shapes: no constraints in any shape")
    out = parts[0]
    for p in parts[1:]:
        out = out.unionByName(p)
    return out


def pipeline_shapes(ont: str = "http://example.com/ontology/") -> list[Shape]:
    """Default shape graph for this pipeline's extraction ontology — the
    invariants its statements are SUPPOSED to satisfy unconditionally, so
    a non-empty violation table from the job gate means an extraction
    regression (the tool-required pairing, which real transcripts
    legitimately violate, is deliberately NOT here — add it per-deployment
    when tool-use transcripts are the contract)."""
    return [
        Shape(ont + "mentions", range_kind="iri",
              domain_prefix="http://example.com/turn/"),
        Shape(ont + "role", range_kind="lit", max_count=1,
              value_in=("user", "assistant", "tool")),
        Shape(ont + "inConversation", range_kind="iri", max_count=1),
        Shape(ont + "text", range_kind="lit", max_count=1),
        Shape(ont + "tool", range_kind="lit", max_count=1),
    ]
