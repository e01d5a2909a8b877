"""spark-submit entrypoint: BGP queries over a materialized graph table.

    spark-submit --py-files dist/mopper_spark.zip jobs/kg_query.py \
        --graph /path/graph \
        -p '?t|http://example.com/ontology/mentions|?e' \
        -p '?t|http://example.com/ontology/inConversation|?c' \
        --select c,e --distinct --limit 100

Patterns are '|'-separated term triples (or quadruples with a named-graph
term); '?name' terms are variables, everything else is a constant.  Output
is JSON lines on stdout (small results) or parquet via --output.
"""

import argparse
import json
import sys


def _split_terms(arg: str) -> list:
    """Split a pattern on '|' at paren/angle depth 0 only, so SPARQL path
    alternation inside the predicate term — '?s|(<p>|<q>)+|?o' — survives
    the term separator."""
    parts, buf, depth = [], [], 0
    for ch in arg:
        if ch in "(<":
            depth += 1
        elif ch in ")>":
            depth -= 1
        if ch == "|" and depth == 0:
            parts.append("".join(buf))
            buf = []
        else:
            buf.append(ch)
    parts.append("".join(buf))
    return parts


def parse_pattern(arg: str) -> tuple:
    """'?s|p|?o' or '?s|p|?o|g' → pattern tuple (validated).

    The predicate term accepts SPARQL 1.1 property-path syntax
    (``bgp.parse_path``): ``^p`` inverse, ``<p>/<q>`` sequence,
    ``(<p>|<q>)`` alternation, postfix ``+`` / ``{m,n}``, negated
    property sets ``!(<p>|^<q>)``; IRIs containing operator characters
    must be ``<>``-wrapped.  The legacy bare sugar ``p+``
    (one-or-more of a bare IRI, even one with slashes) is kept: a literal
    trailing '+' is not valid in an N-Quads IRI, so it is unambiguous.
    """
    from mopper_spark.pipeline.bgp import parse_path

    parts: list = _split_terms(arg)
    if len(parts) not in (3, 4):
        raise SystemExit(
            f"--pattern {arg!r}: expected 3 or 4 '|'-separated terms, "
            f"got {len(parts)}"
        )
    if not any(isinstance(p, str) and p.startswith("?") for p in parts):
        raise SystemExit(f"--pattern {arg!r}: must bind at least one ?variable")
    pred = parts[1]
    if not pred.startswith("?"):
        if pred.endswith("+") and not any(c in pred[:-1] for c in "^|()<> "):
            parts[1] = (pred[:-1], "+")  # legacy bare-IRI sugar, incl. '/'
        elif any(c in pred for c in "^|()<>!{") or (
            pred.endswith(("*", "+")) and "<" in pred
        ):
            try:
                parts[1] = parse_path(pred)
            except ValueError as exc:
                raise SystemExit(f"--pattern {arg!r}: {exc}") from exc
    return tuple(parts)


def build_query(spark, args):
    from mopper_spark.pipeline.bgp import (
        bgp_aggregate,
        bgp_bind,
        bgp_construct,
        bgp_match,
        bgp_minus,
        bgp_slice,
        bgp_values,
    )

    graph = spark.read.parquet(args.graph)
    aggs = dict(
        a.split("=", 1) for a in (getattr(args, "agg", None) or [])
    )
    group_by = (
        args.group_by.split(",")
        if getattr(args, "group_by", None)
        else []
    )
    out = bgp_match(
        graph,
        [parse_pattern(p) for p in args.pattern],
        # aggregation reads raw solution variables; SELECT applies to the
        # non-aggregated form only
        select=(args.select.split(",") if args.select and not aggs else None),
        distinct=args.distinct and not aggs,
        optional=[parse_pattern(p) for p in args.optional or []],
        filters=args.filter or None,
    )
    if getattr(args, "values", None):
        out = bgp_values(out, [json.loads(v) for v in args.values])
    if getattr(args, "minus", None):
        out = bgp_minus(
            out,
            bgp_match(graph, [parse_pattern(p) for p in args.minus]),
        )
    for b in getattr(args, "bind", None) or []:
        var, expr = b.split("=", 1)
        out = bgp_bind(out, var, expr)
    if aggs:
        out = bgp_aggregate(
            out, group_by, aggs, having=getattr(args, "having", None)
        )
    if getattr(args, "construct", None):
        out = bgp_construct(
            out, [tuple(_split_terms(t)) for t in args.construct]
        )
    if getattr(args, "order_by", None):
        keys = [
            (k[1:], "desc") if k.startswith("-") else k
            for k in args.order_by.split(",")
        ]
        out = bgp_slice(out, keys, limit=args.limit, offset=args.offset or 0)
    elif args.limit:
        out = out.limit(args.limit)
    return out


def main() -> None:
    p = argparse.ArgumentParser()
    p.add_argument("--graph", required=True, help="graph table path (parquet)")
    p.add_argument("-p", "--pattern", action="append", required=True)
    p.add_argument("--optional", action="append")
    p.add_argument(
        "--filter",
        action="append",
        help="SPARQL FILTER as a SQL boolean over bound variables, "
        "e.g. \"e1 < e2\" (repeatable)",
    )
    p.add_argument("--select")
    p.add_argument(
        "--agg",
        action="append",
        help="SPARQL aggregate as var=SQL-expr over bound variables, e.g. "
        "'n=count(distinct e)' (repeatable; triggers GROUP BY mode)",
    )
    p.add_argument("--group-by", dest="group_by",
                   help="comma-separated grouping variables")
    p.add_argument("--having", help="SQL boolean over group keys/agg aliases")
    p.add_argument(
        "--values",
        action="append",
        help='SPARQL VALUES row as a JSON object, e.g. \'{"role": "user"}\''
        " (repeatable; all rows must bind the same variables)",
    )
    p.add_argument(
        "--minus",
        action="append",
        help="SPARQL MINUS pattern (same '|' syntax as -p; repeatable — "
        "all MINUS patterns form ONE BGP whose solutions are anti-joined)",
    )
    p.add_argument(
        "--bind",
        action="append",
        help="SPARQL BIND as var=SQL-expr over bound variables (repeatable)",
    )
    p.add_argument(
        "--construct",
        action="append",
        help="CONSTRUCT template '?s|p|?o' (repeatable; replaces SELECT "
        "output with the instantiated distinct graph)",
    )
    p.add_argument(
        "--order-by",
        dest="order_by",
        help="comma-separated variables; prefix '-' for descending "
        "(with --limit plans TakeOrderedAndProject, no global sort)",
    )
    p.add_argument("--offset", type=int)
    p.add_argument("--distinct", action="store_true")
    p.add_argument("--limit", type=int)
    p.add_argument("--output", help="write parquet here instead of stdout JSONL")
    args = p.parse_args()

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.appName("mopper-spark-query").getOrCreate()
    out = build_query(spark, args)
    if args.output:
        out.write.mode("overwrite").parquet(args.output)
    else:
        # stdout is for human-scale results; use --output for big ones
        for row in out.toLocalIterator():
            print(json.dumps(row.asDict()), file=sys.stdout)


if __name__ == "__main__":
    main()
