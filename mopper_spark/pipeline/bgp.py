"""SPARQL-lite basic-graph-pattern (BGP) queries over a triples DataFrame.

The reference (ghsnd/mopper) only *produces* RDF; a user who has built a
knowledge graph immediately needs to *query* it.  This module closes that
loop Spark-first: a BGP — a conjunction of (subject, predicate, object)
triple patterns with shared variables — is compiled to a tree of DataFrame
equi-joins over the triples table, exactly the relational encoding used by
the published SPARQL-on-Spark systems (SPARQLGX, VLDB'16 demo; S2RDF,
VLDB'16: vertical partitioning by predicate + Catalyst joins).

Compilation, per pattern:

- every CONSTANT term becomes a ``filter`` on the triples scan — Catalyst
  pushes these into the parquet/Iceberg scan (``PushedFilters``), and when
  the graph table is partitioned or bucketed by ``pred`` (our
  ``materialize.write_graph_table`` layout keys), a constant predicate
  prunes partitions before any I/O;
- every VARIABLE term (``?name``) becomes a column rename; a variable
  repeated WITHIN one pattern becomes an equality filter;
- patterns are then joined greedily: start from the most selective pattern
  (most constants), and always join a pattern sharing ≥1 variable with the
  result so far — no accidental cartesian products (a disconnected BGP is
  rejected unless ``allow_cartesian=True``).

Scale shape: each selective pattern yields a small relation that AQE
broadcasts into the join with the big scan, so a typical star query is
one pass over the triples table plus broadcast probes — no O(|G|²) step.
The triples table is scanned once PER PATTERN; on a real cluster the scan
is the cheap columnar part (3 narrow string columns) and the predicate
constant cuts it to one vertical partition, which is precisely the S2RDF
argument for this layout.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_POS_COLS = ("subj", "pred", "obj", "graph")


def _is_var(term: str) -> bool:
    return isinstance(term, str) and term.startswith("?")


def _pattern_df(triples: DataFrame, pattern: tuple) -> DataFrame:
    """One triple/quad pattern → filtered/renamed relation.

    3-tuples match (subj, pred, obj); 4-tuples additionally constrain or
    bind the named ``graph`` (the quad position our serializer/TargetOp
    emits) — the triples DataFrame must then carry a ``graph`` column.

    A predicate written as a TUPLE is a SPARQL property path, evaluated
    by ``path_edges`` (inverse ``^``, sequence ``/``, alternation ``|``,
    one-or-more ``+``, bounded repetition ``{m,n}`` — see that
    function's grammar).  ``*``
    (zero-or-more) is refused loudly: its zero-length component binds
    EVERY graph node to itself, which on a 100 TB graph is a deliberate
    act — call ``materialize_star`` explicitly if you mean it.
    """
    if len(pattern) not in (3, 4):
        raise ValueError(f"pattern {pattern!r} must have 3 or 4 terms")
    if isinstance(pattern[1], tuple):
        if len(pattern) == 4:
            raise ValueError("property-path patterns cannot constrain graph")
        marker = path_repr(pattern[1])
        norm = pattern[1]
        if (
            len(norm) == 2
            and isinstance(norm[1], str)
            and norm[1] == "+"
            and norm[0] not in _PATH_OPS
        ):
            norm = ("+", norm[0])
        if norm[0] == "+" and (
            not _is_var(pattern[0]) or not _is_var(pattern[2])
        ):
            # constant-anchored closure: frontier BFS from the constant
            # endpoint (its reachable cone) instead of the full-graph
            # closure — <x> p+ ?y touches one subtree, not every pair
            from .graph import closure_from

            base = path_edges(triples, norm[1]).select(
                F.col("subj").alias("src"), F.col("obj").alias("dst")
            )
            spark = triples.sparkSession
            if not _is_var(pattern[0]):
                seeds = spark.createDataFrame([(pattern[0],)], "origin string")
                pairs = closure_from(base, seeds)
                closed = pairs.select(
                    F.col("origin").alias("subj"),
                    F.lit(marker).alias("pred"),
                    F.col("node").alias("obj"),
                )
            else:
                seeds = spark.createDataFrame([(pattern[2],)], "origin string")
                pairs = closure_from(base, seeds, reverse=True)
                closed = pairs.select(
                    F.col("node").alias("subj"),
                    F.lit(marker).alias("pred"),
                    F.col("origin").alias("obj"),
                )
            return _pattern_df(closed, (pattern[0], marker, pattern[2]))
        closed = path_edges(triples, pattern[1]).select(
            "subj", F.lit(marker).alias("pred"), "obj"
        )
        return _pattern_df(closed, (pattern[0], marker, pattern[2]))
    df = triples
    seen: dict[str, str] = {}  # var name -> first source column
    cols = []
    for col, term in zip(_POS_COLS, pattern):
        if _is_var(term):
            var = term[1:]
            if not var:
                raise ValueError(f"empty variable name in pattern {pattern!r}")
            if var in seen:  # repeated var within the pattern: equality
                df = df.filter(F.col(col) == F.col(seen[var]))
            else:
                seen[var] = col
                cols.append(F.col(col).alias(var))
        else:
            df = df.filter(F.col(col) == F.lit(term))
    if not cols:
        # all-constant pattern: existence probe; keep a marker column so the
        # join degenerates to a (broadcast) semi-join driven by the caller
        raise ValueError(
            f"pattern {pattern!r} has no variables; BGP patterns must bind "
            "at least one variable (use a filter on an existing one instead)"
        )
    return df.select(*cols)


_PATH_OPS = ("^", "/", "|", "+", "*")


def path_edges(triples: DataFrame, path) -> DataFrame:
    """Evaluate a SPARQL property-path expression to a binary relation
    ``(subj, obj)`` over the triples DataFrame.

    Grammar (nested tuples; an operator IRI cannot collide with the
    single-character operator tokens):

    - ``"iri"`` — one hop of that predicate;
    - ``("^", p)`` — inverse path (``^p``): swap the endpoint columns;
    - ``("/", p1, p2, …)`` — sequence (``p1/p2``): relational composition,
      an equi-join per step on the shared midpoint;
    - ``("|", p1, p2, …)`` — alternation (``p1|p2``): bag union
      (SPARQL's non-closure path operators have bag semantics — a pair
      reachable via both branches appears twice, matching UNION ALL);
    - ``("+", p)`` or the legacy sugar ``(p, "+")`` — one-or-more:
      semi-naive transitive closure over the sub-path's edge relation
      (set semantics, per the SPARQL 1.1 arbitrary-length-path algebra);
    - ``("{m,n}", p)`` (or ``("{n}", p)`` for exactly n) — bounded
      repetition, m >= 1: the union of the m..n-step compositions of
      ``p``, DISTINCT pairs (reachability-at-bounded-depth, matching the
      ``+`` closure's set semantics); ``m = 0`` is refused for the same
      zero-length-component reason as ``*``;
    - ``("!", m1, m2, …)`` — negated property set (``!(p|^q)``): members
      are IRIs or ``("^", iri)``; forward members become one NOT-IN scan
      filter, inverse members the same over swapped endpoints, unioned
      per the spec's NPS(F) UNION ^NPS(I) translation;
    - ``("*", p)`` — REFUSED: the zero-length component binds every graph
      node to itself; call :func:`materialize_star` if you mean it.

    Scale shape: every leaf is a pushed ``pred =`` scan filter (one
    vertical partition on a pred-keyed graph table); ``/`` is a chain of
    equi-joins Catalyst/AQE plans like any other join (broadcast when one
    hop's relation is small); ``+`` pays the closure's delta iteration
    over the sub-path's edges only — never over the whole graph.
    """
    if isinstance(path, str):
        if _is_var(path):
            raise ValueError(
                f"variable {path!r} inside a property path is not SPARQL"
            )
        return triples.filter(F.col("pred") == F.lit(path)).select("subj", "obj")
    if not isinstance(path, tuple) or not path:
        raise ValueError(f"malformed property path {path!r}")
    if (
        len(path) == 2
        and isinstance(path[1], str)
        and path[1] in ("+", "*")
        and path[0] not in _PATH_OPS
    ):
        path = (path[1], path[0])  # postfix sugar: (p, "+") == ("+", p)
    op, args = path[0], path[1:]
    if op == "^":
        if len(args) != 1:
            raise ValueError(f"inverse path takes one argument: {path!r}")
        return path_edges(triples, args[0]).select(
            F.col("obj").alias("subj"), F.col("subj").alias("obj")
        )
    if op == "/":
        if len(args) < 2:
            raise ValueError(f"sequence path needs >=2 steps: {path!r}")
        out = path_edges(triples, args[0])
        for step in args[1:]:
            nxt = path_edges(triples, step).select(
                F.col("subj").alias("_mid"), F.col("obj").alias("_obj")
            )
            out = (
                out.join(nxt, out["obj"] == nxt["_mid"])
                .select("subj", F.col("_obj").alias("obj"))
            )
        return out
    if op == "|":
        if not args:
            raise ValueError(f"empty alternation: {path!r}")
        out = path_edges(triples, args[0])
        for branch in args[1:]:
            out = out.union(path_edges(triples, branch))
        return out
    if op == "+":
        from .graph import transitive_closure

        if len(args) != 1:
            raise ValueError(f"'+' takes one argument: {path!r}")
        edges = path_edges(triples, args[0]).select(
            F.col("subj"), F.col("obj").alias("dst_obj")
        )
        return transitive_closure(edges, src="subj", dst="dst_obj").select(
            F.col("src").alias("subj"), F.col("dst").alias("obj")
        )
    if op == "!":
        # negated property set (SPARQL 1.1 PathNegatedPropertySet):
        # members must be plain IRIs or ("^", iri).  Per the spec's
        # translation, forward members F and inverse members I split:
        # !(F|^I) = NPS(F) UNION ^NPS(I) — each component only present
        # when it has members.  NPS(F) is a single NOT-IN scan filter
        # (pushed to the source like any pred filter); no join at all.
        if not args:
            raise ValueError(f"empty negated property set: {path!r}")
        fwd, inv = [], []
        for a in args:
            if isinstance(a, str) and not _is_var(a):
                fwd.append(a)
            elif (
                isinstance(a, tuple)
                and len(a) == 2
                and a[0] == "^"
                and isinstance(a[1], str)
                and not _is_var(a[1])
            ):
                inv.append(a[1])
            else:
                raise ValueError(
                    f"negated-property-set members must be IRIs or "
                    f"^IRI, got {a!r} in {path!r}"
                )
        parts = []
        if fwd:
            parts.append(
                triples.filter(~F.col("pred").isin(fwd)).select("subj", "obj")
            )
        if inv:
            parts.append(
                triples.filter(~F.col("pred").isin(inv)).select(
                    F.col("obj").alias("subj"), F.col("subj").alias("obj")
                )
            )
        out = parts[0]
        for p in parts[1:]:
            out = out.union(p)
        return out
    if isinstance(op, str) and op.startswith("{"):
        m = re.fullmatch(r"\{(\d+)(?:,(\d+))?\}", op)
        if not m or len(args) != 1:
            raise ValueError(f"malformed bounded repetition: {path!r}")
        lo, hi = int(m.group(1)), int(m.group(2) or m.group(1))
        if lo < 1:
            raise NotImplementedError(
                "bounded repetition with a zero-length component (m=0) "
                "binds every graph node to itself — use materialize_star"
            )
        if hi < lo:
            raise ValueError(f"bounded repetition needs m <= n: {path!r}")
        edges = path_edges(triples, args[0])
        hop = edges.select(
            F.col("subj").alias("_mid"), F.col("obj").alias("_obj")
        )
        # R^lo by composition, then union each further power up to hi.
        # Set semantics (distinct pairs), matching the '+' closure: the
        # draft-SPARQL {m,n} form counts reachability, not walks, so a
        # pair reachable at two lengths in range appears once.  Each
        # power is one equi-join on the shared midpoint; hi-lo is small
        # by construction (a user writing {2,4} wants <=3 joins), and
        # the per-power distinct keeps the relation from inflating
        # multiplicatively on dense graphs.
        cur = edges
        for _ in range(lo - 1):
            cur = (
                cur.join(hop, cur["obj"] == hop["_mid"])
                .select("subj", F.col("_obj").alias("obj"))
                .distinct()
            )
        out = cur
        for _ in range(hi - lo):
            cur = (
                cur.join(hop, cur["obj"] == hop["_mid"])
                .select("subj", F.col("_obj").alias("obj"))
                .distinct()
            )
            out = out.union(cur)
        return out.distinct()
    if op == "*":
        raise NotImplementedError(
            "property-path '*' (zero-or-more) binds every graph node to "
            "itself — call materialize_star(triples, path) explicitly if "
            "you mean it"
        )
    raise NotImplementedError(f"property-path operator {op!r} unsupported")


def path_repr(path) -> str:
    """Canonical display form of a path expression (used as the synthetic
    ``pred`` constant of a path pattern's relation)."""
    if isinstance(path, str):
        return path
    if (
        len(path) == 2
        and isinstance(path[1], str)
        and path[1] in ("+", "*")
        and path[0] not in _PATH_OPS
    ):
        path = (path[1], path[0])
    op, args = path[0], path[1:]
    if op == "^":
        return f"^{path_repr(args[0])}"
    if op == "!":
        return "!(" + "|".join(path_repr(a) for a in args) + ")"
    if op in ("/", "|"):
        return "(" + op.join(path_repr(a) for a in args) + ")"
    return f"({path_repr(args[0])}){op}"


def parse_path(text: str):
    """Parse SPARQL 1.1 property-path SYNTAX into the tuple algebra of
    :func:`path_edges`.

    Grammar (precedence low→high, per the SPARQL spec):
    ``path := seq ('|' seq)*``; ``seq := unary ('/' unary)*``;
    ``unary := '^' unary | primary ('+'|'*'|'{m,n}'|'{n}')?``;
    ``primary := '!' nps | '(' path ')' | '<' IRI '>' | bare-token``;
    ``nps := member | '(' member ('|' member)* ')'``;
    ``member := '^'? IRI``.

    IRIs containing operator characters (every http IRI has ``/``) MUST be
    ``<>``-wrapped; a bare token runs to the next operator character.  A
    single bare/wrapped IRI parses to the plain string, so simple
    predicates stay simple.
    """
    pos = 0
    n = len(text)

    def peek():
        nonlocal pos
        while pos < n and text[pos].isspace():
            pos += 1
        return text[pos] if pos < n else ""

    def parse_alt():
        nonlocal pos
        branches = [parse_seq()]
        while peek() == "|":
            pos += 1
            branches.append(parse_seq())
        return branches[0] if len(branches) == 1 else ("|", *branches)

    def parse_seq():
        nonlocal pos
        steps = [parse_unary()]
        while peek() == "/":
            pos += 1
            steps.append(parse_unary())
        return steps[0] if len(steps) == 1 else ("/", *steps)

    def parse_unary():
        nonlocal pos
        c = peek()
        if c == "^":
            pos += 1
            return ("^", parse_unary())
        node = parse_primary()
        c = peek()
        if c in ("+", "*"):
            pos += 1
            return (c, node)
        if c == "{":
            end = text.find("}", pos)
            if end < 0:
                raise ValueError(f"unterminated '{{' in path {text!r}")
            tok = text[pos : end + 1]
            if not re.fullmatch(r"\{\d+(,\d+)?\}", tok):
                raise ValueError(f"malformed repetition {tok!r} in {text!r}")
            pos = end + 1
            return (tok, node)
        return node

    def parse_member():
        nonlocal pos
        if peek() == "^":
            pos += 1
            return ("^", parse_iri())
        return parse_iri()

    def parse_iri():
        nonlocal pos
        c = peek()
        if c == "<":
            end = text.find(">", pos)
            if end < 0:
                raise ValueError(f"unterminated '<' in path {text!r}")
            iri = text[pos + 1 : end]
            pos = end + 1
            return iri
        start = pos
        while pos < n and text[pos] not in "!^/|+*(){}<> \t":
            pos += 1
        if pos == start:
            raise ValueError(f"empty path term at offset {pos} in {text!r}")
        return text[start:pos]

    def parse_primary():
        nonlocal pos
        c = peek()
        if c == "!":
            pos += 1
            members = []
            if peek() == "(":
                pos += 1
                members.append(parse_member())
                while peek() == "|":
                    pos += 1
                    members.append(parse_member())
                if peek() != ")":
                    raise ValueError(f"unbalanced '(' in NPS in {text!r}")
                pos += 1
            else:
                members.append(parse_member())
            return ("!", *members)
        if c == "(":
            pos += 1
            inner = parse_alt()
            if peek() != ")":
                raise ValueError(f"unbalanced '(' in path {text!r}")
            pos += 1
            return inner
        return parse_iri()

    out = parse_alt()
    if peek():
        raise ValueError(f"trailing {text[pos:]!r} in path {text!r}")
    return out


def materialize_star(
    triples: DataFrame, path, nodes: DataFrame | None = None
) -> DataFrame:
    """Deliberate ``p*`` (zero-or-more) materialization: the ``p+``
    closure UNIONed with the identity relation over ``nodes``.

    Per the SPARQL 1.1 ZeroOrMorePath algebra the zero-length component
    matches every RDF term in the graph, so ``nodes`` defaults to the
    distinct subjects ∪ objects of the WHOLE triples table — a full-graph
    distinct.  That cost is why ``bgp_match`` refuses ``*`` implicitly:
    pass the nodes you actually mean (e.g. the domain of the anchoring
    pattern) to keep it proportional to the query, not the graph.
    """
    if nodes is None:
        nodes = (
            triples.select(F.col("subj").alias("n"))
            .union(triples.select(F.col("obj").alias("n")))
            .distinct()
        )
    else:
        (node_col,) = nodes.columns
        nodes = nodes.select(F.col(node_col).alias("n")).distinct()
    identity = nodes.select(F.col("n").alias("subj"), F.col("n").alias("obj"))
    return path_edges(triples, ("+", path)).union(identity).distinct()


def _pattern_order_key(pattern: tuple, stats: dict[str, int] | None) -> tuple:
    """Greedy start-pattern ranking (ascending = joined first).

    Without stats: most constants first (the round-2 heuristic).  With
    stats: estimated cardinality — the predicate's triple count when the
    predicate is a constant found in stats (property-path predicates and
    unknown/variable predicates fall back to the largest known count),
    discounted 10× per additional constant term (subject/object/graph
    constants are point lookups on that relation).  Deterministic
    tie-break on the pattern's repr either way.
    """
    n_const = sum(
        not _is_var(t) for t in pattern if isinstance(t, str)
    )
    if stats is None:
        return (0, -n_const, str(pattern))
    default = max(stats.values(), default=1)
    pred = pattern[1]
    est = stats.get(pred, default) if isinstance(pred, str) else default
    extra_consts = max(
        n_const - (1 if isinstance(pred, str) and not _is_var(pred) else 0), 0
    )
    return (est / (10 ** extra_consts), 0, str(pattern))


def bgp_match(
    triples: DataFrame,
    patterns: list[tuple],
    select: list[str] | None = None,
    distinct: bool = False,
    allow_cartesian: bool = False,
    optional: list[tuple] | None = None,
    filters: list[str] | None = None,
    stats: dict[str, int] | None = None,
) -> DataFrame:
    """Match a conjunctive BGP; returns one column per selected variable.

    ``patterns``: ``[("?t", "http://…/mentions", "?e"), …]`` — terms
    starting with ``?`` are variables, anything else is a constant; a
    4th term matches the named graph.  A predicate term may be a
    ``(iri, "+")`` tuple — a one-or-more property path (see
    ``_pattern_df``).
    ``filters``: SPARQL FILTER expressions as SQL boolean strings over
    bound variable names (e.g. ``"e1 < e2"``, ``"role RLIKE 'assist'"``)
    — applied declaratively after the joins, where Catalyst pushes each
    one down to the deepest plan node whose columns it references (a
    single-variable filter reaches the pattern's scan).
    ``stats``: predicate IRI → triple count (one ``curate.
    predicate_profile`` pass, cached per graph version).  When given, the
    greedy join order starts from the pattern with the smallest ESTIMATED
    cardinality instead of the most-constants heuristic — the
    characteristic-set trick of the SPARQL-on-relational literature, and
    what makes a star query anchored on a rare predicate start from the
    thin relation so AQE broadcasts it into every later join.
    ``optional``: SPARQL OPTIONAL patterns, LEFT-joined (in order) after
    the required block — their new variables come back NULL where the
    pattern has no match.  Each must share ≥1 variable with what is
    already bound (an unanchored OPTIONAL would be a cartesian).
    ``select``: variable names (without ``?``) to project; default = all,
    sorted for a deterministic column order.
    """
    if not patterns:
        raise ValueError("empty BGP")
    rels = [(_pattern_df(triples, p), p) for p in patterns]
    remaining = sorted(rels, key=lambda r: _pattern_order_key(r[1], stats))
    result, _ = remaining.pop(0)
    bound = set(result.columns)
    while remaining:
        idx = next(
            (i for i, (df, _) in enumerate(remaining) if bound & set(df.columns)),
            None,
        )
        if idx is None:
            if not allow_cartesian:
                raise ValueError(
                    "disconnected BGP (would need a cartesian product); "
                    "pass allow_cartesian=True to force it"
                )
            idx = 0
        df, _ = remaining.pop(idx)
        shared = sorted(bound & set(df.columns))
        result = result.join(df, on=shared) if shared else result.crossJoin(df)
        bound |= set(df.columns)
    for pat in optional or []:
        df = _pattern_df(triples, pat)
        shared = sorted(bound & set(df.columns))
        if not shared:
            raise ValueError(
                f"OPTIONAL pattern {pat!r} shares no variable with the "
                "required block (would be a cartesian product)"
            )
        result = result.join(df, on=shared, how="left")
        bound |= set(df.columns)
    for f in filters or []:
        result = result.filter(F.expr(f))
    out = result.select(*(select if select is not None else sorted(bound)))
    return out.distinct() if distinct else out


def bgp_aggregate(
    solution: DataFrame,
    group_by: list[str],
    aggregates: dict[str, str],
    having: str | None = None,
) -> DataFrame:
    """SPARQL aggregation over a BGP solution sequence:
    ``SELECT ?g (COUNT(?x) AS ?n) WHERE {…} GROUP BY ?g HAVING(…)``.

    ``aggregates`` maps output variable → SQL aggregate expression over
    the solution's variables (``{"n": "count(distinct e)"}``); ``having``
    is a boolean SQL string over group keys and aggregate aliases.
    Declarative all the way down: Catalyst plans a partial (map-side)
    aggregate before the exchange, so the shuffle carries one row per
    (partition, group) — the same plan a hand-written groupBy gets, which
    is why this is a thin, honest wrapper and not a reimplementation.
    An empty ``group_by`` is the single-group SPARQL form (one row).
    """
    if not aggregates:
        raise ValueError("bgp_aggregate: no aggregate expressions")
    exprs = [F.expr(sql).alias(var) for var, sql in sorted(aggregates.items())]
    grouped = (
        solution.groupBy(*group_by) if group_by else solution.groupBy()
    )
    out = grouped.agg(*exprs)
    if having:
        out = out.filter(F.expr(having))
    return out


def bgp_union(*branches: DataFrame) -> DataFrame:
    """SPARQL UNION: concatenate BGP results by column NAME (missing
    variables in a branch come back NULL, per SPARQL's unbound
    semantics).  Purely a metadata operation — no shuffle."""
    if not branches:
        raise ValueError("empty UNION")
    out = branches[0]
    for b in branches[1:]:
        out = out.unionByName(b, allowMissingColumns=True)
    return out


def bgp_minus(solution: DataFrame, other: DataFrame) -> DataFrame:
    """SPARQL ``MINUS``: drop solutions compatible with some row of
    ``other`` on their shared variables — a ``left_anti`` join, the
    plan Catalyst already knows how to broadcast when ``other`` is small
    (NOT-EXISTS is the classic anti-join, no row-at-a-time subquery).

    Exact SPARQL semantics when shared variables are bound (non-NULL) on
    both sides — the required-block case.  SPARQL's unbound-is-compatible
    rule for OPTIONAL-produced NULLs is NOT modeled (a NULL shared var
    here never matches, so such rows are KEPT); per the SPARQL 1.1 spec
    MINUS with *no* shared variables removes nothing, and that case is
    honored exactly (returns ``solution`` unchanged)."""
    shared = sorted(set(solution.columns) & set(other.columns))
    if not shared:
        return solution
    return solution.join(other.select(*shared), on=shared, how="left_anti")


def bgp_exists(solution: DataFrame, other: DataFrame) -> DataFrame:
    """SPARQL ``FILTER EXISTS``: keep solutions compatible with some row
    of ``other`` on their shared variables — a ``left_semi`` join
    (broadcastable, deduplicating by construction: no fan-out however
    many witnesses exist).  Same bound-variables subset as ``bgp_minus``;
    with no shared variables EXISTS is a constant — refused loudly
    rather than silently keeping or dropping everything."""
    shared = sorted(set(solution.columns) & set(other.columns))
    if not shared:
        raise ValueError(
            "FILTER EXISTS pattern shares no variable with the solution"
        )
    return solution.join(other.select(*shared), on=shared, how="left_semi")


def bgp_values(solution: DataFrame, rows: list[dict]) -> DataFrame:
    """SPARQL ``VALUES``: constrain the solution to an inline binding
    table — a broadcast inner join on the VALUES variables (the table is
    inline in the query text, so it is small by construction).

    ``rows``: ``[{"role": "user"}, {"role": "assistant"}]`` — every dict
    must bind the same variables, all of which must exist in the
    solution.  ``UNDEF`` (partial rows) is refused: a wildcard cell turns
    the join into a union of per-subset joins, which you should write
    explicitly."""
    if not rows:
        raise ValueError("empty VALUES block")
    cols = sorted(rows[0])
    if any(sorted(r) != cols for r in rows) or any(
        v is None for r in rows for v in r.values()
    ):
        raise ValueError(
            "VALUES rows must all bind the same variables with no UNDEF"
        )
    missing = [c for c in cols if c not in solution.columns]
    if missing:
        raise ValueError(f"VALUES variables {missing} not bound in solution")
    inline = solution.sparkSession.createDataFrame(
        [tuple(r[c] for c in cols) for r in rows], cols
    )
    return solution.join(F.broadcast(inline.distinct()), on=cols)


def bgp_bind(solution: DataFrame, var: str, sql_expr: str) -> DataFrame:
    """SPARQL ``BIND(expr AS ?var)``: one derived column, evaluated
    natively (``F.expr`` — whole-stage codegen, no Python)."""
    if var in solution.columns:
        raise ValueError(f"BIND target ?{var} is already bound")
    return solution.withColumn(var, F.expr(sql_expr))


def bgp_slice(
    solution: DataFrame,
    order_by: list,
    limit: int | None = None,
    offset: int = 0,
) -> DataFrame:
    """SPARQL solution modifiers ``ORDER BY … LIMIT … OFFSET …``.

    ``order_by``: variable names, or ``(name, "desc")`` tuples.  With a
    LIMIT, Catalyst plans ``TakeOrderedAndProject`` — a per-partition
    top-(offset+limit) heap merged on the driver, NO global sort-exchange
    of the full solution (the reason this wrapper insists on an ORDER BY:
    an unordered LIMIT over a distributed solution is nondeterministic).
    Without a LIMIT it is an honest global sort.  For a deterministic
    result SET under ties, order by a total key (include a tiebreaker
    variable)."""
    if not order_by:
        raise ValueError("bgp_slice requires ORDER BY (unordered LIMIT is "
                         "nondeterministic on a distributed solution)")
    keys = []
    for k in order_by:
        if isinstance(k, tuple):
            name, direction = k
            keys.append(F.col(name).desc() if direction == "desc" else F.col(name).asc())
        else:
            keys.append(F.col(k).asc())
    out = solution.orderBy(*keys)
    if offset:
        out = out.offset(offset)
    return out.limit(limit) if limit is not None else out


def bgp_construct(
    solution: DataFrame, templates: list[tuple]
) -> DataFrame:
    """SPARQL ``CONSTRUCT``: instantiate triple templates over every
    solution, returning a graph-shaped ``(subj, pred, obj)`` DataFrame.

    Each template is a 3-tuple whose terms are either ``?var`` references
    into the solution or constants.  Per the SPARQL 1.1 spec, a template
    whose instantiation has an unbound term produces NO triple for that
    solution (NULL rows are dropped per-template, not per-solution), and
    the result is a GRAPH — a distinct set.

    Plan shape: one narrow projection per template over the SAME solution
    (the solution plan is shared, no recompute of the joins under
    whole-stage reuse... and templates are usually few), unioned, then
    one distinct — the only exchange this adds."""
    if not templates:
        raise ValueError("CONSTRUCT with no templates")
    parts = []
    for t in templates:
        if len(t) != 3:
            raise ValueError(f"CONSTRUCT template {t!r} must have 3 terms")
        cols = []
        for name, term in zip(("subj", "pred", "obj"), t):
            if _is_var(term):
                var = term[1:]
                if var not in solution.columns:
                    raise ValueError(
                        f"CONSTRUCT template variable ?{var} not bound"
                    )
                cols.append(F.col(var).cast("string").alias(name))
            else:
                cols.append(F.lit(term).alias(name))
        part = solution.select(*cols)
        parts.append(part.filter(
            F.col("subj").isNotNull()
            & F.col("pred").isNotNull()
            & F.col("obj").isNotNull()
        ))
    out = parts[0]
    for p in parts[1:]:
        out = out.union(p)
    return out.distinct()


def bgp_ask(solution: DataFrame) -> DataFrame:
    """SPARQL ``ASK``: does the pattern have at least one solution?
    Returns a ONE-row DataFrame ``(found boolean)`` — a DataFrame rather
    than a driver-side bool so ASK composes into jobs/sinks like every
    other operator.

    Scale shape: ``limit(1)`` above the solution plan — Spark's
    CollectLimit launches one partition first and short-circuits the
    scan on the first witness, so an ASK over a 100 TB graph that
    matches early reads almost nothing; only a NO answer pays for the
    full pattern evaluation (unavoidable: proving absence is a full
    scan in any engine)."""
    return (
        solution.select(F.lit(1).alias("_w"))
        .limit(1)
        .agg((F.count(F.lit(1)) > 0).alias("found"))
    )


def describe_resource(triples: DataFrame, iri: str) -> DataFrame:
    """SPARQL DESCRIBE-lite: every triple where the resource is subject or
    object.  Two pushed-filter scans + a union — both filters reach the
    parquet scan, so on a subject- or predicate-organized graph table
    this touches only the matching row groups."""
    return triples.filter(
        (F.col("subj") == F.lit(iri)) | (F.col("obj") == F.lit(iri))
    )


def sparql_update(
    triples: DataFrame,
    where: list[tuple],
    *,
    delete: list[tuple] | None = None,
    insert: list[tuple] | None = None,
    filters: list[str] | None = None,
    stats: dict[str, int] | None = None,
) -> DataFrame:
    """SPARQL 1.1 Update ``DELETE/INSERT WHERE`` (spec §3.1.3) as a pure
    graph→graph transform: bindings are matched against the ORIGINAL
    graph (never against intermediate states — the spec's evaluation
    order), the instantiated DELETE templates are removed, then the
    instantiated INSERT templates are added.  Template instantiation and
    its unbound-term drop rule are exactly ``bgp_construct``'s.

    The input must be a 3-column ``(subj, pred, obj)`` graph; for quad
    stores apply per named graph (the spec's WITH/USING scoping) — a
    wider frame is refused rather than silently joined on a subset of
    its columns.

    Output honors set semantics: deleted triples are removed wherever
    they occur, and inserted triples that survive in the post-delete
    graph are not duplicated.

    Scale shape: the graph flows through at most two keyed anti-joins on
    (subj, pred, obj) — one exchange each, the same cost class as any
    keyed op; the delete/insert sides are solution-sized (small).  Over
    the subject-bucketed materialized table the first anti-join
    co-locates on the bucket like every star query.
    """
    if set(triples.columns) != {"subj", "pred", "obj"}:
        raise ValueError(
            "sparql_update needs exactly (subj, pred, obj); got "
            f"{triples.columns} — scope quads to one graph first"
        )
    if not delete and not insert:
        raise ValueError("sparql_update with neither DELETE nor INSERT templates")
    solution = bgp_match(triples, where, filters=filters, stats=stats)
    out = triples
    if delete:
        dels = bgp_construct(solution, list(delete))
        out = out.join(dels, ["subj", "pred", "obj"], "left_anti")
    if insert:
        ins = bgp_construct(solution, list(insert))
        ins_new = ins.join(out, ["subj", "pred", "obj"], "left_anti")
        out = out.unionByName(ins_new)
    return out
