"""Process-mining primitives over event logs: the directly-follows
graph and transition-conformance checking — the two artifacts every
process-mining tool (ProM, PM4Py, Celonis-class systems) builds first
from a ``(case, activity, timestamp)`` log, here over the events table
with ``user_id`` as the case and ``event_type`` as the activity.

Same exactness discipline as the rest of the statistics layer: counts
and epoch-µs duration sums are BIGINTs, ordering ties are pinned by an
explicit tiebreak column, and the allowed-transition model rides in the
plan as a literal relation (broadcast, no state).

Scale shape: both operators are one per-case lag window + combine-able
aggregations — per-case state only, the per-entity skew posture of the
transcript layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {c})"
)

START = "_START_"
END = "_END_"


def _with_next(
    df: DataFrame, case_col: str, act_col: str, ts_col: str, tiebreak_col: str
) -> DataFrame:
    w = Window.partitionBy(case_col).orderBy(ts_col, tiebreak_col)
    ep = _EPOCH_US.format(c=ts_col)
    return (
        df.select(
            F.col(case_col).alias("case"),
            F.col(act_col).alias("act"),
            F.col(ts_col),
            F.col(tiebreak_col).alias("_tb"),
            F.expr(ep).alias("at_us"),
        )
        .withColumn(
            "prev_act", F.lag("act").over(
                Window.partitionBy("case").orderBy(ts_col, "_tb")
            )
        )
        .withColumn(
            "prev_us", F.lag("at_us").over(
                Window.partitionBy("case").orderBy(ts_col, "_tb")
            )
        )
        .drop(ts_col)
    )


def directly_follows(
    df: DataFrame,
    case_col: str,
    act_col: str,
    ts_col: str,
    tiebreak_col: str,
) -> DataFrame:
    """The directly-follows graph (DFG): for every ordered activity pair
    that occurs consecutively within a case, ``(prev_act, next_act, n,
    total_gap_us, max_gap_us)`` — edge frequency plus exact integer
    duration mass, the process map every mining tool draws first.
    Case boundaries are materialized as ``_START_ → first activity``
    and ``last activity → _END_`` edges (gap 0), so case counts
    reconcile: Σn over _START_ edges = number of cases.

    ``tiebreak_col`` pins same-timestamp ordering (the
    ``gap_histogram`` determinism contract).  One lag window + one
    (prev, next)-pair aggregate — activity²-bounded output.
    """
    seq = _with_next(df, case_col, act_col, ts_col, tiebreak_col)
    inner = seq.filter(F.col("prev_act").isNotNull()).select(
        F.col("prev_act"),
        F.col("act").alias("next_act"),
        (F.col("at_us") - F.col("prev_us")).alias("gap_us"),
    )
    firsts = (
        seq.filter(F.col("prev_act").isNull())
        .select(F.lit(START).alias("prev_act"), F.col("act").alias("next_act"),
                F.lit(0).cast("long").alias("gap_us"))
    )
    lasts = (
        seq.withColumn(
            "rn_end",
            F.row_number().over(
                Window.partitionBy("case").orderBy(
                    F.col("at_us").desc(), F.col("_tb").desc()
                )
            ),
        )
        .filter(F.col("rn_end") == 1)
        .select(F.col("act").alias("prev_act"), F.lit(END).alias("next_act"),
                F.lit(0).cast("long").alias("gap_us"))
    )
    return (
        inner.unionByName(firsts)
        .unionByName(lasts)
        .groupBy("prev_act", "next_act")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n"),
            F.sum("gap_us").cast("long").alias("total_gap_us"),
            F.max("gap_us").cast("long").alias("max_gap_us"),
        )
    )


def conformance_violations(
    df: DataFrame,
    case_col: str,
    act_col: str,
    ts_col: str,
    tiebreak_col: str,
    allowed: list[tuple[str, str]],
) -> DataFrame:
    """Transition-conformance check against an explicit allowed-
    transition model (the DFA edge list, including ``_START_``/``_END_``
    pseudo-activities): every consecutive activity pair of every case is
    tested for membership, and cases are summarized as ``(case,
    n_steps, n_violations, first_violation)`` — ``first_violation`` is
    the earliest offending ``'prev>next'`` edge label ('' for conformant
    cases), the triage handle.  This is footprint-matrix conformance
    (token replay's cheap, distributable cousin): exact for transition-
    level models, deliberately blind to long-range constraints (those
    need alignments — out of scope BY NAME).

    The model is a literal broadcast relation; one lag window + one
    left-anti-style membership join + one per-case aggregate.
    """
    if not allowed:
        raise ValueError("conformance_violations: empty allowed-transition model")
    spark = df.sparkSession
    model = spark.createDataFrame(
        list(dict.fromkeys(allowed)), "p string, q string"
    )
    seq = _with_next(df, case_col, act_col, ts_col, tiebreak_col)
    edges = seq.select(
        "case",
        F.coalesce(F.col("prev_act"), F.lit(START)).alias("p_act"),
        F.col("act").alias("q_act"),
        F.col("at_us"),
    )
    lasts = (
        seq.withColumn(
            "rn_end",
            F.row_number().over(
                Window.partitionBy("case").orderBy(
                    F.col("at_us").desc(), F.col("_tb").desc()
                )
            ),
        )
        .filter(F.col("rn_end") == 1)
        .select("case", F.col("act").alias("p_act"),
                F.lit(END).alias("q_act"), F.col("at_us"))
    )
    all_edges = edges.unionByName(lasts)
    marked = all_edges.join(
        F.broadcast(model.withColumn("_ok", F.lit(1))),
        (F.col("p_act") == F.col("p")) & (F.col("q_act") == F.col("q")),
        "left",
    ).select(
        "case",
        "at_us",
        F.col("_ok").isNull().alias("bad"),
        F.concat_ws(">", F.col("p_act"), F.col("q_act")).alias("edge"),
    )
    return marked.groupBy("case").agg(
        F.count(F.lit(1)).cast("long").alias("n_steps"),
        F.sum(F.col("bad").cast("long")).cast("long").alias("n_violations"),
        F.coalesce(
            F.min(F.when(F.col("bad"), F.struct("at_us", "edge"))).getField(
                "edge"
            ),
            F.lit(""),
        ).alias("first_violation"),
    )
