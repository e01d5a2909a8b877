"""N-Triples / N-Quads READER (and the matching statement formatter).

The reference (ghsnd/mopper) only ever *writes* N-Quads
(``src/operator/serializer.rs``, ``src/sink/writer_sink.rs``); the first
thing a downstream consumer of those files needs is to load them back
into a queryable table.  This module closes the loop Spark-first: a
``.nt``/``.nq`` file is one statement per line, so ``spark.read.text``
gives perfect line-parallel scans (splittable at any newline — the ideal
100 TB input format), and each line is decomposed with native ``regexp``
expressions — zero Python in the hot path.

Term grammar (W3C N-Quads, https://www.w3.org/TR/n-quads/):
``<iri>``, ``_:blank``, ``"literal"`` with optional ``@lang`` or
``^^<datatype>``; optional graph label (IRI or blank) before the final
``.``.  Output schema matches the engine's internal statement layout
``(subj, pred, obj, okind, graph)`` where ``okind`` is ``iri`` / ``blank``
/ ``lit`` / ``lit@<tag>`` / ``lit^^<dtype>`` — the same kind vocabulary
``serializer.py::format_term`` consumes, so ``parse`` and ``format`` are
mutual inverses and round-trip tests can assert set equality.

Escaping: literal bodies use the ECHAR escapes ``\\\\ \\" \\n \\r \\t``.
``unescape_literal`` is exact AND native: split on the two-character
sequence ``\\\\`` first (so later single-char replaces can never touch a
character protected by a preceding backslash — the classic ordering bug),
replace the remaining single-char escapes per segment, re-join with a
single backslash.  ``\\uXXXX`` escapes are NOT decoded (no native
hex-to-codepoint in Spark); in strict mode a surviving backslash after
unescaping raises executor-side via ``raise_error`` — a loud refusal, not
silent corruption.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

_IRI = r"<[^<>\s]*>"
_BNODE = r"_:[^\s]+"
_LIT = r'"(?:[^"\\]|\\.)*"(?:@[A-Za-z][A-Za-z0-9-]*|\^\^<[^<>\s]*>)?'
_SUBJ = f"(?:{_IRI}|{_BNODE})"
_OBJ = f"(?:{_IRI}|{_BNODE}|{_LIT})"
_LINE = rf"^\s*({_SUBJ})\s+({_IRI})\s+({_OBJ})(?:\s+({_SUBJ}))?\s*\.\s*$"


def escape_literal(v: Column) -> Column:
    """ECHAR-escape a literal body (order matters: backslash first)."""
    v = F.replace(v, F.lit("\\"), F.lit("\\\\"))
    v = F.replace(v, F.lit('"'), F.lit('\\"'))
    v = F.replace(v, F.lit("\n"), F.lit("\\n"))
    v = F.replace(v, F.lit("\r"), F.lit("\\r"))
    return F.replace(v, F.lit("\t"), F.lit("\\t"))


def unescape_literal(v: Column) -> Column:
    """Exact inverse of ``escape_literal``, fully native: segments between
    ``\\\\`` pairs get their single-char escapes replaced, then re-join
    with one backslash."""
    segs = F.split(v, r"\\\\", -1)
    segs = F.transform(
        segs,
        lambda s: F.replace(
            F.replace(
                F.replace(
                    F.replace(s, F.lit('\\"'), F.lit('"')),
                    F.lit("\\n"),
                    F.lit("\n"),
                ),
                F.lit("\\r"),
                F.lit("\r"),
            ),
            F.lit("\\t"),
            F.lit("\t"),
        ),
    )
    return F.array_join(segs, "\\")


def _term_kind_value(term: Column) -> tuple[Column, Column]:
    """Decompose one object term into (okind, value)."""
    is_iri = term.startswith("<")
    is_blank = term.startswith("_:")
    # split the optional annotation off the closing quote
    body = F.regexp_extract(term, r'^"((?:[^"\\]|\\.)*)"', 1)
    lang = F.regexp_extract(term, r'"@([A-Za-z][A-Za-z0-9-]*)$', 1)
    dtype = F.regexp_extract(term, r'"\^\^<([^<>\s]*)>$', 1)
    okind = (
        F.when(is_iri, F.lit("iri"))
        .when(is_blank, F.lit("blank"))
        .when(lang != "", F.concat(F.lit("lit@"), lang))
        .when(dtype != "", F.concat(F.lit("lit^^"), dtype))
        .otherwise(F.lit("lit"))
    )
    value = (
        F.when(is_iri, term.substr(F.lit(2), F.length(term) - 2))
        .when(is_blank, term.substr(F.lit(3), F.length(term)))
        .otherwise(unescape_literal(body))
    )
    return okind, value


def parse_statements(
    lines: DataFrame, col: str = "value", strict: bool = True
) -> DataFrame:
    """Parse N-Triples/N-Quads lines → ``(subj, pred, obj, okind, graph)``.

    Comment (``# …``) and blank lines are dropped (the reference's own
    golden-compare contract ignores them, ``src/tests.rs:52-66``).  In
    ``strict`` mode a non-matching statement line or an undecodable
    ``\\uXXXX`` escape raises executor-side; with ``strict=False`` such
    lines are silently skipped (use for salvage scans over dirty crawls).

    Strictness is implemented INSIDE every output expression (``CASE WHEN
    malformed THEN raise_error(...)``), not as a filter: a filter would be
    pushed below the projection by Catalyst and the bad row would vanish
    before any check ran.
    """
    c = F.col(col)
    data = lines.filter(~F.regexp_like(F.ltrim(c), F.lit(r"^(#|$)")))
    m = F.regexp_like(c, F.lit(_LINE))
    if not strict:
        data = data.filter(m)

    def guard(expr: Column) -> Column:
        if not strict:
            return expr
        return F.when(
            ~m, F.raise_error(F.concat(F.lit("malformed N-Quads line: "), c))
        ).otherwise(expr)

    s_raw = F.regexp_extract(c, _LINE, 1)
    p_raw = F.regexp_extract(c, _LINE, 2)
    o_raw = F.regexp_extract(c, _LINE, 3)
    g_raw = F.regexp_extract(c, _LINE, 4)
    okind, value = _term_kind_value(o_raw)
    if strict:
        # consume every VALID escape pair in the raw body; a surviving
        # backslash is an escape we do not decode (e.g. \\uXXXX).  The check
        # must run on the raw body — the unescaped value legitimately
        # contains backslashes produced from \\\\ pairs.
        raw_body = F.regexp_extract(o_raw, r'^"((?:[^"\\]|\\.)*)"', 1)
        leftover = F.regexp_replace(raw_body, r'\\[\\"nrt]', "")
        value = F.when(
            okind.startswith("lit") & leftover.contains("\\"),
            F.raise_error(F.concat(F.lit("undecoded escape in literal: "), c)),
        ).otherwise(value)
    return data.select(
        # blank-node subjects/graphs KEEP their `_:` prefix — the 5-column
        # schema has no subject-kind column, so the prefix is what makes the
        # round trip lossless (format_statements passes `_:…` through)
        guard(
            F.when(s_raw.startswith("<"), s_raw.substr(F.lit(2), F.length(s_raw) - 2))
            .otherwise(s_raw)
        ).alias("subj"),
        guard(p_raw.substr(F.lit(2), F.length(p_raw) - 2)).alias("pred"),
        guard(value).alias("obj"),
        guard(okind).alias("okind"),
        guard(
            F.when(g_raw.startswith("<"), g_raw.substr(F.lit(2), F.length(g_raw) - 2))
            .when(g_raw.startswith("_:"), g_raw)
            .otherwise(F.lit(None).cast("string"))
        ).alias("graph"),
    )


def format_statements(statements: DataFrame) -> DataFrame:
    """Inverse of ``parse_statements``: ``(subj, pred, obj, okind, graph)``
    → one N-Quads line per row (column ``statement``); a NULL/empty graph
    emits an N-Triples line.  Literal bodies are ECHAR-escaped (unlike the
    RML serializer path, which matches the reference's no-escape behavior
    — this formatter is for the curated graph table, where object values
    are arbitrary text)."""
    subj = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(F.concat(F.lit("<"), F.col("subj"), F.lit(">")))
    lit_body = F.concat(F.lit('"'), escape_literal(F.col("obj")), F.lit('"'))
    obj = (
        F.when(F.col("okind") == "iri", F.concat(F.lit("<"), F.col("obj"), F.lit(">")))
        .when(F.col("okind") == "blank", F.concat(F.lit("_:"), F.col("obj")))
        .when(
            F.col("okind").startswith("lit@"),
            F.concat(lit_body, F.lit("@"), F.substring(F.col("okind"), 5, 2**30)),
        )
        .when(
            F.col("okind").startswith("lit^^"),
            F.concat(
                lit_body, F.lit("^^<"), F.substring(F.col("okind"), 6, 2**30), F.lit(">")
            ),
        )
        .otherwise(lit_body)
    )
    graph_part = (
        F.when(
            F.col("graph").isNull() | (F.col("graph") == ""), F.lit("")
        )
        .when(F.col("graph").startswith("_:"), F.concat(F.lit(" "), F.col("graph")))
        .otherwise(F.concat(F.lit(" <"), F.col("graph"), F.lit(">")))
    )
    return statements.select(
        F.concat(
            subj,
            F.lit(" <"),
            F.col("pred"),
            F.lit("> "),
            obj,
            graph_part,
            F.lit(" ."),
        ).alias("statement")
    )


def read_nquads(spark: SparkSession, path: str, strict: bool = True) -> DataFrame:
    """Load ``.nt``/``.nq`` files into the engine's statement schema."""
    return parse_statements(spark.read.text(path), strict=strict)


# --------------------------------------------------------- Turtle writer --

# conservative PN_LOCAL subset for prefix compaction: word chars and
# interior dots/hyphens (never leading/trailing dot) — anything outside
# stays a full <iri>, which is always valid Turtle
_PN_LOCAL = r"[A-Za-z0-9_](?:[A-Za-z0-9_.\-]*[A-Za-z0-9_\-])?"
_RDF_TYPE = "http://www.w3.org/1999/02/22-rdf-syntax-ns#type"


def _turtle_iri(col: Column, prefixes: dict[str, str]) -> Column:
    """IRI → prefixed name where a declared namespace matches and the
    local part is PN_LOCAL-safe; full ``<iri>`` otherwise.  Longest
    namespace wins (deterministic for nested namespaces)."""
    out = F.concat(F.lit("<"), col, F.lit(">"))
    for pfx, ns in sorted(prefixes.items(), key=lambda kv: len(kv[1])):
        local = F.substring(col, len(ns) + 1, 2**30)
        out = F.when(
            col.startswith(ns) & F.regexp_like(local, F.lit(f"^{_PN_LOCAL}$")),
            F.concat(F.lit(pfx + ":"), local),
        ).otherwise(out)
    return out


def format_turtle(
    statements: DataFrame, prefixes: dict[str, str] | None = None
) -> DataFrame:
    """Serialize ``(subj, pred, obj, okind)`` triples as Turtle — one row
    per SUBJECT block, ``(subj, block)``, fully native and deterministic
    (predicates and objects sorted within each block, so the document is
    a pure function of the triple set under any partitioning).

    Beyond-reference surface (the reference emits only N-Quads,
    ``serializer.rs:25-166``): Turtle is the hand-off format for graph
    consumers.  A ``graph`` column with any non-NULL value is REFUSED —
    Turtle has no named graphs; use ``format_statements`` (N-Quads).

    ``prefixes`` (e.g. ``{"ont": "http://…/ontology/"}``) compacts IRIs
    whose local part is PN_LOCAL-safe; the matching ``@prefix`` header
    lines are the caller's one-liner
    (``"\\n".join(f"@prefix {p}: <{ns}> ." for …)``) since a distributed
    writer has no "first row".  ``rdf:type`` predicates render as ``a``.

    Plan shape: two map-side-combining aggregations (subj+pred, then
    subj) — the same word-count posture as every grouping here; blocks
    then stream to per-partition ``.ttl`` part files or collect for
    driver-side assembly at test scale."""
    prefixes = prefixes or {}
    if "graph" in statements.columns:
        # refuse loudly inside the plan (filter-pushdown-proof, same
        # pattern as the strict N-Quads parser)
        statements = statements.withColumn(
            "_g_ok",
            F.when(
                F.col("graph").isNotNull() & (F.col("graph") != ""),
                F.raise_error(
                    F.concat(
                        F.lit("format_turtle: named graph not expressible "
                              "in Turtle (use format_statements): "),
                        F.col("graph"),
                    )
                ),
            ).otherwise(F.lit(True)),
        ).filter(F.col("_g_ok")).drop("_g_ok", "graph")
    subj_term = F.when(
        F.col("subj").startswith("_:"), F.col("subj")
    ).otherwise(_turtle_iri(F.col("subj"), prefixes))
    pred_term = F.when(F.col("pred") == _RDF_TYPE, F.lit("a")).otherwise(
        _turtle_iri(F.col("pred"), prefixes)
    )
    lit_body = F.concat(F.lit('"'), escape_literal(F.col("obj")), F.lit('"'))
    obj_term = (
        F.when(F.col("okind") == "iri", _turtle_iri(F.col("obj"), prefixes))
        .when(F.col("okind") == "blank", F.concat(F.lit("_:"), F.col("obj")))
        .when(
            F.col("okind").startswith("lit@"),
            F.concat(lit_body, F.lit("@"), F.substring(F.col("okind"), 5, 2**30)),
        )
        .when(
            F.col("okind").startswith("lit^^"),
            F.concat(
                lit_body,
                F.lit("^^"),
                _turtle_iri(F.substring(F.col("okind"), 6, 2**30), prefixes),
            ),
        )
        .otherwise(lit_body)
    )
    by_pred = (
        statements.select(
            F.col("subj"),
            subj_term.alias("st"),
            pred_term.alias("pt"),
            obj_term.alias("ot"),
        )
        .groupBy("subj", "st", "pt")
        .agg(
            F.array_join(
                F.array_sort(F.collect_set("ot")), " , "
            ).alias("objs")
        )
    )
    return (
        by_pred.groupBy("subj", "st")
        .agg(
            F.array_join(
                F.array_sort(
                    F.collect_list(F.concat(F.col("pt"), F.lit(" "), F.col("objs")))
                ),
                " ;\n    ",
            ).alias("body")
        )
        .select(
            "subj",
            F.concat(F.col("st"), F.lit(" "), F.col("body"), F.lit(" .")).alias(
                "block"
            ),
        )
    )


def turtle_document(
    statements: DataFrame, prefixes: dict[str, str] | None = None
) -> str:
    """Driver-side document assembly (TEST/CLI scale — at corpus scale
    write ``format_turtle``'s blocks as part files): header + blocks
    sorted by subject."""
    prefixes = prefixes or {}
    header = "".join(
        f"@prefix {p}: <{ns}> .\n" for p, ns in sorted(prefixes.items())
    )
    blocks = [
        r.block
        for r in format_turtle(statements, prefixes)
        .orderBy("subj")
        .select("block")
        .collect()
    ]
    return header + "\n".join(blocks) + ("\n" if blocks else "")
