"""Generic table profiling: per-column data-quality statistics.

The "what is actually in this table" pass every ingestion pipeline runs
before trusting 100 TB of parquet: null counts, exact distinct counts,
and portable min/max/length statistics per column, emitted LONG-format
``(column, metric, value_str)`` so one schema serves any input table.

One aggregate job for the whole profile: Spark plans the multi-column
COUNT(DISTINCT …) set via a single Expand (one replicated pass + one
final aggregate), not one scan per column — the same lattice machinery
as ROLLUP, and the reason this beats a loop of per-column queries at
scale.

Exactness discipline: every emitted value is an integer count, an
integer epoch, or a raw string — no doubles are ever RENDERED (a
rendered double would hash-diverge between engines' float formatters;
double columns therefore get null/distinct counts but not min/max).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F
from pyspark.sql import types as T

_INTEGRAL = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)


def table_profile(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Profile ``columns`` (default: all) of ``df``.

    Per column, always: ``n_null``, ``n_distinct`` (exact, nulls
    excluded).  Added when the type renders portably: ``min``/``max``
    (integral → decimal string; string → raw; boolean → true/false;
    TIMESTAMP_NTZ → epoch microseconds).  For strings additionally
    ``len_min``/``len_max``/``len_sum`` (int64 character counts).
    Complex/float/LTZ-timestamp columns get counts only — documented
    refusal, not silence: rendering floats or TZ-dependent instants is
    engine-ambiguous, and this profile is strict-oracle material.

    Output: ``(column, metric, value_str)`` — one row per statistic.
    """
    fields = {f.name: f.dataType for f in df.schema.fields}
    if columns is None:
        columns = [f.name for f in df.schema.fields]
    unknown = [c for c in columns if c not in fields]
    if unknown:
        raise ValueError(f"table_profile: unknown columns {unknown}")

    aggs: list = []
    emits: list = []  # (column, metric, agg_alias)

    def add(col: str, metric: str, expr) -> None:
        alias = f"__{col}__{metric}"
        aggs.append(expr.alias(alias))
        emits.append((col, metric, alias))

    for c in columns:
        dt = fields[c]
        add(
            c,
            "n_null",
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("long")
            .cast("string"),
        )
        add(c, "n_distinct", F.countDistinct(F.col(c)).cast("string"))
        if isinstance(dt, _INTEGRAL) or isinstance(dt, (T.StringType, T.BooleanType)):
            add(c, "min", F.min(F.col(c)).cast("string"))
            add(c, "max", F.max(F.col(c)).cast("string"))
        elif isinstance(dt, T.TimestampNTZType):
            ep = (
                f"timestampdiff(MICROSECOND,"
                f" TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"
            )
            add(c, "min", F.min(F.expr(ep)).cast("long").cast("string"))
            add(c, "max", F.max(F.expr(ep)).cast("long").cast("string"))
        if isinstance(dt, T.StringType):
            add(c, "len_min", F.min(F.length(F.col(c))).cast("long").cast("string"))
            add(c, "len_max", F.max(F.length(F.col(c))).cast("long").cast("string"))
            add(c, "len_sum", F.sum(F.length(F.col(c))).cast("long").cast("string"))

    one = df.agg(*aggs)
    rows = F.array(
        *[
            F.struct(
                F.lit(col).alias("column"),
                F.lit(metric).alias("metric"),
                F.col(alias).alias("value_str"),
            )
            for col, metric, alias in emits
        ]
    )
    return one.select(F.explode(rows).alias("r")).select(
        "r.column", "r.metric", "r.value_str"
    )
