"""KG-to-text verbalization: turn (subj, pred, obj) facts back into
natural-language training text.

The inverse direction of the extraction pipeline — KG-to-text is a
standard way to surface structured knowledge to an LLM (pretraining
corpora from KGs, e.g. KELM, Agarwal et al., NAACL'21): each predicate
gets a sentence TEMPLATE with ``{s}``/``{p}``/``{o}`` slots filled from
IRI labels, and a subject's sentences are assembled into one document.
The reference engine only goes text→KG (row-to-triple mapping); this is
part of the beyond-reference training-data layer.

Everything is native string expressions (template fill compiles to one
``concat``; label extraction is ``split``/``replace``) — no Python in
the plan.  Document assembly order-proofs the collected sentences with
``array_sort`` after ``collect_list`` (the same idiom as
``textops/prepare.py``): collect order is partitioning-dependent,
sorted output is not.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: the pct-encodings the extraction layer's closed mention alphabet can
#: produce (space, é, ü — see the oracle encoding note in
#: ``__spark_entry__._transcript_oracle_sqls``); decoding is their exact
#: inverse, so label(entity IRI) round-trips the surface form.
_DECODES = [("%20", " "), ("%C3%A9", "é"), ("%C3%BC", "ü")]


def iri_label(col: Column) -> Column:
    """Human label of an IRI: the last path segment, pct-decoded for the
    encodings the extractor emits.  Plain literals (no '/') pass through
    unchanged, so the same expression covers IRI and literal objects."""
    out = F.element_at(F.split(col, "/"), -1)
    for enc, ch in _DECODES:
        out = F.replace(out, F.lit(enc), F.lit(ch))
    return out


def _fill(template: str, s: Column, p: Column, o: Column) -> Column:
    """Compile '{s} likes {o}.' into one concat over label columns."""
    parts: list[Column] = []
    for tok in re.split(r"(\{[spo]\})", template):
        if tok == "{s}":
            parts.append(s)
        elif tok == "{p}":
            parts.append(p)
        elif tok == "{o}":
            parts.append(o)
        elif tok:
            parts.append(F.lit(tok))
    if not parts:
        raise ValueError("empty verbalization template")
    return F.concat(*parts)


def verbalize_triples(
    triples: DataFrame,
    templates: dict[str, str],
    default: str | None = "{s} {p} {o}.",
) -> DataFrame:
    """One sentence per triple: ``(subj, pred, obj)`` →
    ``(subj, sentence)``.

    ``templates`` maps a predicate IRI to its sentence template;
    ``{s}``/``{p}``/``{o}`` are filled with :func:`iri_label` of the
    respective term.  Predicates without a template use ``default``;
    pass ``default=None`` to DROP untemplated predicates instead (the
    curation stance: only verbalize what you trust to read well).

    When the statement table carries the engine's ``okind`` column, only
    ``iri`` objects are label-extracted — literal objects pass through
    VERBATIM (a literal like ``"24/7 support"`` must not be truncated at
    its last slash).  Without ``okind`` the '/'-heuristic of
    :func:`iri_label` applies to the object too.
    """
    s, p = iri_label(F.col("subj")), iri_label(F.col("pred"))
    if "okind" in triples.columns:
        o = F.when(
            F.col("okind") == "iri", iri_label(F.col("obj"))
        ).otherwise(F.col("obj"))
    else:
        o = iri_label(F.col("obj"))
    expr = (
        _fill(default, s, p, o)
        if default is not None
        else F.lit(None).cast("string")
    )
    for pred, tpl in sorted(templates.items()):
        expr = F.when(F.col("pred") == F.lit(pred), _fill(tpl, s, p, o)).otherwise(
            expr
        )
    out = triples.select("subj", expr.alias("sentence"))
    if default is None:
        out = out.filter(F.col("sentence").isNotNull())
    return out


def verbalize_subject_docs(
    triples: DataFrame,
    templates: dict[str, str],
    default: str | None = "{s} {p} {o}.",
    sep: str = " ",
) -> DataFrame:
    """One training document per subject: the subject's sentences sorted
    lexicographically and joined — ``(subj, text, n_facts)``.

    One groupBy (word-count-shaped shuffle; sentences of one subject are
    bounded by its fact count, the per-entity analogue of the
    per-conversation bound).
    """
    sentences = verbalize_triples(triples, templates, default)
    return sentences.groupBy("subj").agg(
        F.array_join(F.array_sort(F.collect_list("sentence")), sep).alias("text"),
        F.count(F.lit(1)).cast("long").alias("n_facts"),
    )
