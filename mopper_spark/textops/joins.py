"""Temporal and range joins the DataFrame API lacks as primitives.

The reference engine (ghsnd/mopper) has only inner equi-joins
(``src/operator/join.rs``); these operators extend the engine the way a
training-data / event-log pipeline needs, each expressed as a composition
of built-in operators so Catalyst keeps whole-stage codegen and AQE:

- ``asof_join``: for every left row, the single right row with the
  greatest ``on`` value ≤ the left row's (backward, inclusive) within the
  same ``by`` key — pandas ``merge_asof`` / DuckDB ``ASOF JOIN`` semantics.
  Implemented as union → one hash partition by key → in-partition sort →
  ``last(…, ignorenulls)`` running window.  ONE shuffle, no range scan, no
  per-key driver loop: at 100 TB this is a single repartition of the
  combined stream, the same cost as any keyed aggregation.  (A naive
  theta-join ``l.ts >= r.ts`` is a per-key cross product — quadratic in
  events-per-key — and is what this operator exists to avoid.)
- ``range_join_buckets``: join facts with a value column against
  ``[lo, hi)`` interval rows by exploding each interval into fixed-width
  buckets and equi-joining on the bucket id with a residual predicate.
  Buckets turn an inequality join (nested-loop / cartesian under Catalyst)
  into a shuffle-or-broadcast HASH join; cost scales with
  interval-width/bucket-width, not |facts| × |ranges|.
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    by: str,
    on: str,
    right_cols: list[str] | None = None,
    suffix: str = "_right",
    tolerance=None,
) -> DataFrame:
    """Backward-inclusive as-of join: each left row picks the right row
    with the greatest ``on`` ≤ its own ``on``, per ``by`` key.

    Ties on ``on`` across sides match (inclusive — the right row sorts
    before the left row at equal timestamps).  Ties WITHIN the right side
    at the same ``(by, on)`` resolve to the row that sorts last in the
    window order; keep ``(by, on)`` unique on the right for deterministic
    output (asserted cheaply by callers' oracles, not here).

    ``tolerance``: optional Column/literal; matches older than
    ``left.on - tolerance`` are nulled out (row is kept), mirroring
    pandas ``merge_asof(tolerance=...)``.

    Output: every left column, plus each ``right_cols`` entry renamed
    ``<col><suffix>`` (``on`` → ``<on><suffix>`` is included implicitly).
    """
    if right_cols is None:
        right_cols = [c for c in right.columns if c not in (by, on)]
    carry = [on] + [c for c in right_cols if c != on]

    r = right.select(
        F.col(by),
        F.col(on).alias("__on"),
        F.lit(0).alias("__side"),
        F.struct(*[F.col(c) for c in carry]).alias("__r"),
        F.lit(None).cast(
            left.select(F.struct(*left.columns).alias("s")).schema["s"].dataType
        ).alias("__l"),
    )
    l = left.select(
        F.col(by),
        F.col(on).alias("__on"),
        F.lit(1).alias("__side"),
        F.lit(None).cast(r.schema["__r"].dataType).alias("__r"),
        F.struct(*left.columns).alias("__l"),
    )
    w = (
        Window.partitionBy(by)
        .orderBy("__on", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    matched = (
        r.unionByName(l)
        .withColumn("__match", F.last("__r", ignorenulls=True).over(w))
        .filter(F.col("__side") == 1)
    )
    if tolerance is not None:
        matched = matched.withColumn(
            "__match",
            F.when(
                F.col("__match").isNotNull()
                & (F.col("__on") - F.col("__match")[on] <= tolerance),
                F.col("__match"),
            ),
        )
    out = [F.col("__l")[c].alias(c) for c in left.columns]
    out += [F.col("__match")[c].alias(f"{c}{suffix}") for c in carry]
    return matched.select(*out)


def range_join_buckets(
    facts: DataFrame,
    ranges: DataFrame,
    value_col: str,
    lo_col: str,
    hi_col: str,
    bucket_width: float,
    broadcast_ranges: bool = True,
) -> DataFrame:
    """Inner join ``facts`` to every interval row with
    ``lo <= value < hi`` (half-open), via fixed-width bucketing.

    Each interval explodes into ``ceil(width / bucket_width)`` bucket ids;
    facts compute one bucket id; the join is a plain equi-join on
    ``(bucket)`` with the interval predicate as a residual filter.  Pick
    ``bucket_width`` near the typical interval width so each interval
    lands in O(1) buckets.  Small interval tables broadcast (default) —
    zero shuffle on the fact side; a huge interval table instead
    shuffle-joins on the bucket id, which AQE handles like any keyed join.
    """
    w = float(bucket_width)
    exploded = ranges.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(lo_col) / w).cast("long"),
                F.floor(F.col(hi_col) / w).cast("long"),
            )
        ),
    )
    if broadcast_ranges:
        exploded = F.broadcast(exploded)
    keyed = facts.withColumn("__bucket", F.floor(F.col(value_col) / w).cast("long"))
    return (
        keyed.join(exploded, "__bucket")
        .filter(
            (F.col(value_col) >= F.col(lo_col)) & (F.col(value_col) < F.col(hi_col))
        )
        .drop("__bucket")
    )


def salted_join(
    fact: DataFrame,
    dim: DataFrame,
    key: str,
    *,
    salts: int = 16,
    salt_on: list[str] | None = None,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with EXPLICIT key salting for skewed join keys.

    A hash join on a low-cardinality or heavy-hitter key ("the celebrity
    problem") sends every row of the hot key to one reducer; at 100 TB that
    single task runs for hours while 999 executors idle.  Salting rewrites
    ``fact ⋈_key dim`` as ``fact ⋈_(key, salt) (dim × salts)``: the dim side
    is replicated ``salts``× (one row per salt value), each fact row picks a
    deterministic salt from ``xxhash64(salt_on)``, and the hot key's rows
    spread across ``salts`` reducers.  Results are identical to the plain
    join — the salt is an internal column, dropped on output.

    Complements AQE's skew-join splitting (which only fires for sort-merge
    joins and only re-splits oversized partitions after a shuffle has
    already materialized); salting pre-spreads the load and also works for
    shuffled hash joins and aggregations-after-join.

    ``salt_on``: fact columns fed to the salt hash (default: the join key's
    row is spread by ALL fact columns — pass a unique id column when one
    exists; any deterministic per-row choice is correct, uniformity is the
    only quality dimension).
    """
    if salts < 1:
        raise ValueError("salts must be >= 1")
    cols = salt_on if salt_on else [c for c in fact.columns]
    salted_dim = dim.withColumn(
        "__salt", F.explode(F.sequence(F.lit(0).cast("long"), F.lit(salts - 1).cast("long")))
    )
    salted_fact = fact.withColumn(
        "__salt", F.pmod(F.xxhash64(*[F.col(c) for c in cols]), F.lit(salts)).cast("long")
    )
    return salted_fact.join(salted_dim, [key, "__salt"], how).drop("__salt")


def scd2_intervals(
    events: DataFrame,
    key_cols: list[str],
    ts_col: str,
    attr_cols: list[str],
) -> DataFrame:
    """Collapse a change-event stream into SCD type-2 validity intervals:
    one row per (key, attribute-state run) with ``valid_from`` /
    ``valid_to`` (NULL = current) — the dimension-table layout every
    warehouse backfill and as-of join consumes.

    Consecutive events with IDENTICAL attributes merge into one interval;
    a change opens a new one.  Run detection is the classic
    gaps-and-islands: flag rows whose attributes differ from their
    predecessor (lag), running-sum the flags into a run id, aggregate
    min/max per run.  NULL-safe comparison via eqNullSafe so NULL→value
    and value→NULL transitions open intervals.

    Plan: one window pass partitioned by the key (per-key state only, the
    per-conversation posture) + one map-side-combining aggregation; ties
    on ``ts`` are ordered by the attribute tuple for determinism — equal
    timestamps with different states are real upstream ambiguity and at
    least resolve reproducibly.
    """
    if not key_cols or not attr_cols:
        raise ValueError("scd2_intervals needs key_cols and attr_cols")
    order = [F.col(ts_col)] + [F.col(c) for c in attr_cols]
    w = Window.partitionBy(*key_cols).orderBy(*order)
    changed = F.when(
        reduce(
            lambda a, c: a & c,
            [
                F.col(c).eqNullSafe(F.lag(F.col(c)).over(w))
                for c in attr_cols
            ],
        )
        & F.lag(F.col(ts_col)).over(w).isNotNull(),
        F.lit(0),
    ).otherwise(F.lit(1))
    runs = events.select(
        *key_cols,
        F.col(ts_col).alias("_ts"),
        *[F.col(c) for c in attr_cols],
        F.sum(changed)
        .over(w.rowsBetween(Window.unboundedPreceding, 0))
        .cast("long")
        .alias("_run"),
    )
    iv = runs.groupBy(*key_cols, "_run", *attr_cols).agg(
        F.min("_ts").alias("valid_from"), F.max("_ts").alias("_last_ts")
    )
    w2 = Window.partitionBy(*key_cols).orderBy("_run")
    return iv.select(
        *key_cols,
        *attr_cols,
        "valid_from",
        F.lead("valid_from").over(w2).alias("valid_to"),
    )


def rate_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    *,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Per-type event-rate anomaly: z-score of each time bucket's event
    COUNT against that type's own bucket-count distribution — the
    ops-monitoring primitive ("this hour is 3σ above normal for
    `purchase`").

    Counts are integers, so the population mean/variance inputs are the
    EXACT integer sums ``S1 = Σn`` and ``S2 = Σn²`` over the K present
    buckets; the z-score ``(n·K - S1) / sqrt(K·(K·S2 - S1²))`` is one
    double expression over exact integers (the numerator and the
    discriminant are integer-exact, so even the zero-variance guard is
    an integer comparison).  Statistics are over PRESENT buckets —
    all-empty buckets are unobserved rows by construction; callers
    needing gap-aware baselines densify first.

    Scale shape: one (type, bucket) count aggregate (map-side combine),
    one per-type statistics row broadcast back.  Output: ``(event_type,
    bucket_us, n, z)`` with z = 0.0 where the type's variance is zero.
    """
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.expr(ep) - F.pmod(F.expr(ep), F.lit(bucket_us)))
            .cast("long")
            .alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
    stats = counts.groupBy("event_type").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    j = counts.join(F.broadcast(stats), "event_type")
    disc = F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")
    return j.select(
        "event_type",
        "bucket_us",
        "n",
        F.when(disc > 0,
               (F.col("n") * F.col("k") - F.col("s1"))
               / F.sqrt(disc.cast("double")))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def seasonal_rate_anomaly(
    events: DataFrame,
    type_col: str = "event_type",
    ts_col: str = "ts",
    *,
    bucket_us: int = 3_600_000_000,
) -> DataFrame:
    """Seasonality-adjusted event-rate anomaly: like ``rate_anomaly``
    but each hour bucket is z-scored against its own
    ``(type, day-of-week, hour-of-day)`` CELL's count distribution —
    so Monday-9am load is compared to other Monday-9am's, not to
    Sunday-3am's, which is what makes weekly-periodic traffic
    alertable ("normal Monday peak" stops paging).

    Same exactness discipline as ``rate_anomaly``: per-cell statistics
    are the exact integer ``K, S1, S2`` over present buckets, the
    z-score one double expression, zero variance guarded by an integer
    comparison.  Calendar keys are pure integer arithmetic on the epoch
    bucket (UTC; epoch day 0 = Thursday → dow 4) — engine-portable, no
    timezone/locale function divergence.

    Output: ``(event_type, bucket_us, dow, hod, n, z)``.
    """
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    DAY = 86_400_000_000
    HOUR = 3_600_000_000
    counts = (
        events.select(
            F.col(type_col).alias("event_type"),
            (F.expr(ep) - F.pmod(F.expr(ep), F.lit(bucket_us)))
            .cast("long")
            .alias("bucket_us"),
        )
        .groupBy("event_type", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
        .withColumn(
            "dow",
            F.pmod(F.expr(f"bucket_us div {DAY}") + 4, F.lit(7)).cast("long"),
        )
        .withColumn(
            "hod",
            F.pmod(F.expr(f"bucket_us div {HOUR}"), F.lit(24)).cast("long"),
        )
    )
    stats = counts.groupBy("event_type", "dow", "hod").agg(
        F.count(F.lit(1)).cast("long").alias("k"),
        F.sum("n").cast("long").alias("s1"),
        F.sum(F.col("n") * F.col("n")).cast("long").alias("s2"),
    )
    j = counts.join(F.broadcast(stats), ["event_type", "dow", "hod"])
    disc = F.col("k") * F.col("s2") - F.col("s1") * F.col("s1")
    return j.select(
        "event_type",
        "bucket_us",
        "dow",
        "hod",
        "n",
        F.when(disc > 0,
               (F.col("n") * F.col("k") - F.col("s1"))
               / F.sqrt(disc.cast("double")))
        .otherwise(F.lit(0.0))
        .alias("z"),
    )


def cohort_retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    *,
    bucket_us: int = 86_400_000_000,
) -> DataFrame:
    """Cohort retention triangle: users grouped by their FIRST-activity
    bucket (the cohort), then for each (cohort, activity-bucket ≥
    cohort) the count of cohort users active in that bucket and its
    share of the cohort — the standard product-analytics table
    (``retention[c][d]`` = share of day-c signups active on day d).

    Exact integers throughout (distinct-user counts, cohort sizes);
    ``share`` is one double division.  Scale shape: one min-aggregate
    per user (map-side combining), one distinct (user, bucket)
    projection joined back on the user (broadcast at fixture scale,
    hash at corpus scale), one (cohort, bucket) count — the cohort
    matrix is buckets² rows, a statistics table.
    """
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    acts = (
        events.select(
            F.col(user_col).alias("user_id"),
            (F.expr(ep) - F.pmod(F.expr(ep), F.lit(bucket_us)))
            .cast("long")
            .alias("bucket_us"),
        )
        .distinct()
    )
    cohorts = acts.groupBy("user_id").agg(
        F.min("bucket_us").alias("cohort_us")
    )
    sizes = cohorts.groupBy("cohort_us").agg(
        F.count(F.lit(1)).cast("long").alias("cohort_size")
    )
    cells = (
        acts.join(cohorts, "user_id")
        .groupBy("cohort_us", "bucket_us")
        .agg(F.count(F.lit(1)).cast("long").alias("n_active"))
    )
    return cells.join(F.broadcast(sizes), "cohort_us").select(
        "cohort_us",
        "bucket_us",
        "n_active",
        "cohort_size",
        (F.col("n_active") / F.col("cohort_size").cast("double")).alias("share"),
    )


def funnel_steps(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered funnel analysis: how many users perform ``steps[0]``, then
    ``steps[1]`` strictly later, then ``steps[2]`` strictly later still —
    the standard product-analytics conversion funnel, computed by the
    earliest-chain rule: each step matches at its EARLIEST timestamp
    strictly after the previous step\'s match.  Greedy-earliest is
    optimal (taking the earliest completion of a prefix can only enlarge
    the set of completable suffixes), so a user reaches step k iff ANY
    strictly-increasing chain of the k event types exists.

    Output: one row per step — ``(step_idx, step, n_users, share)`` with
    ``share`` = n_users / step-0 users (the conversion column; 1.0 on the
    first row of a non-empty funnel).

    Scale shape: k-1 equi-joins keyed on the user, each against a
    single-type scan whose type constant is PUSHED into the source scan;
    the reached-users relation only shrinks down the funnel, so AQE
    broadcasts the later probes.  No windows and no per-user event lists
    — a hot user with millions of events costs min-aggregates, never a
    sort.  Each stage is localCheckpoint\'d so the union of per-stage
    counts computes every stage once.  Timestamps compare as epoch
    microseconds (TZ- and fetch-path-proof).
    """
    if len(steps) < 2:
        raise ValueError("funnel_steps: need at least 2 steps")
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ \'1970-01-01 00:00:00\',"
        f" {ts_col})"
    )
    typed = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.expr(ep).cast("long").alias("ts_us"),
    )
    stage = (
        typed.filter(F.col("etype") == steps[0])
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t_prev"))
        .localCheckpoint(eager=False)
    )
    stages = [stage]
    for step in steps[1:]:
        stage = (
            typed.filter(F.col("etype") == step)
            .join(stage, "user_id")
            .filter(F.col("ts_us") > F.col("t_prev"))
            .groupBy("user_id")
            .agg(F.min("ts_us").alias("t_prev"))
            .localCheckpoint(eager=False)
        )
        stages.append(stage)
    per_step = [
        st.agg(F.count(F.lit(1)).cast("long").alias("n_users")).select(
            F.lit(i).cast("int").alias("step_idx"),
            F.lit(s).alias("step"),
            "n_users",
        )
        for i, (s, st) in enumerate(zip(steps, stages))
    ]
    counts = per_step[0]
    for nxt in per_step[1:]:
        counts = counts.unionByName(nxt)
    base = stages[0].agg(
        F.greatest(F.count(F.lit(1)), F.lit(1)).cast("long").alias("__base")
    )
    return counts.crossJoin(F.broadcast(base)).select(
        "step_idx",
        "step",
        "n_users",
        (F.col("n_users") / F.col("__base").cast("double")).alias("share"),
    )


def survival_km(
    events: DataFrame,
    start_type: str,
    end_type: str,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    scale: int = 10**15,
) -> DataFrame:
    """Kaplan-Meier survival curve (Kaplan & Meier 1958) for the
    time-to-event from a user's first ``start_type`` to their first
    strictly-later ``end_type``; users who never convert are RIGHT-
    CENSORED at the corpus's max timestamp.  Durations bucket to whole
    days.  ``S(t) = Π_{t_i ≤ t} (1 - d_i / n_i)`` with d_i = events and
    n_i = at-risk count at t_i.

    Exactness discipline: the running product is INTEGER fixed point —
    ``S_fp ← (S_fp * (n_i - d_i)) div n_i`` from ``scale`` — so the curve
    is bit-reproducible in any engine (a float cumprod would hash-diverge
    across ulp-different libm builds); ``survival`` is one double
    division at the end.  ``n - d ≤ n ≤ corpus users``, so the product
    step stays within int64 for scale ≤ 1e15 and n ≤ ~9e3 … guarded: the
    step is reassociated as (S_fp div n_i)·(n_i−d_i) + ((S_fp mod n_i)·
    (n_i−d_i)) div n_i — exact long division of (S_fp·(n_i−d_i)) by n_i
    without forming the 128-bit product, valid for ANY n_i.

    Scale shape: duration extraction is two min-aggregates keyed on the
    user (no windows, hot users cost a min); the curve itself lives on
    DAY-granularity buckets — bounded by the corpus time span, NOT its
    row count — so the sequential fold runs on one collected array of
    ≤ a few thousand (day, d, c) structs.  At-risk counts are integer
    prefix sums computed inside the same fold.

    Output: one row per distinct duration day —
    ``(t_days, n_risk, n_events, n_censored, s_fp, survival)``.
    """
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    typed = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.expr(ep).cast("long").alias("ts_us"),
    )
    starts = (
        typed.filter(F.col("etype") == start_type)
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t0"))
    )
    ends = typed.filter(F.col("etype") == end_type).select("user_id", "ts_us")
    first_end = (
        ends.join(starts, "user_id")
        .filter(F.col("ts_us") > F.col("t0"))
        .groupBy("user_id")
        .agg(F.min("ts_us").alias("t1"))
    )
    horizon = typed.agg(F.max("ts_us").alias("t_max"))
    DAY = 86_400_000_000
    durs = (
        starts.join(first_end, "user_id", "left")
        .crossJoin(F.broadcast(horizon))
        .select(
            F.when(
                F.col("t1").isNotNull(),
                F.expr(f"(t1 - t0) div {DAY}"),
            )
            .otherwise(F.expr(f"(t_max - t0) div {DAY}"))
            .cast("long")
            .alias("t_days"),
            F.col("t1").isNotNull().alias("observed"),
        )
    )
    per_day = durs.groupBy("t_days").agg(
        F.sum(F.when(F.col("observed"), 1).otherwise(0)).cast("long").alias("d"),
        F.sum(F.when(F.col("observed"), 0).otherwise(1)).cast("long").alias("c"),
    )
    # sequential integer fold over the (bounded) day axis: one collected
    # array, sorted, folded with exact long division — no float cumprod
    folded = per_day.agg(
        F.array_sort(
            F.collect_list(F.struct("t_days", "d", "c"))
        ).alias("steps")
    ).select(
        F.expr(
            f"""
            aggregate(
              steps,
              struct(
                CAST({scale} AS BIGINT) AS s,
                CAST(aggregate(steps, 0L, (a, x) -> a + x.d + x.c) AS BIGINT) AS n,
                CAST(array() AS ARRAY<STRUCT<t_days: BIGINT, n_risk: BIGINT,
                     n_events: BIGINT, n_censored: BIGINT, s_fp: BIGINT>>) AS rows
              ),
              (acc, x) -> struct(
                CAST(
                  (acc.s div acc.n) * (acc.n - x.d)
                  + ((acc.s % acc.n) * (acc.n - x.d)) div acc.n
                AS BIGINT) AS s,
                CAST(acc.n - x.d - x.c AS BIGINT) AS n,
                array_append(acc.rows, struct(
                  x.t_days AS t_days,
                  acc.n AS n_risk,
                  x.d AS n_events,
                  x.c AS n_censored,
                  CAST(
                    (acc.s div acc.n) * (acc.n - x.d)
                    + ((acc.s % acc.n) * (acc.n - x.d)) div acc.n
                  AS BIGINT) AS s_fp
                )) AS rows
              )
            ).rows
            """
        ).alias("rows")
    )
    return folded.select(F.explode("rows").alias("r")).select(
        "r.t_days",
        "r.n_risk",
        "r.n_events",
        "r.n_censored",
        "r.s_fp",
        (F.col("r.s_fp").cast("double") / F.lit(float(scale))).alias("survival"),
    )


def session_paths(
    events: DataFrame,
    n: int = 3,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Sequential pattern mining lite: corpus-wide counts of every
    length-``n`` consecutive event-type sequence within a (user, day)
    session — "view→click→purchase happened 412 times" — the input to
    next-action models and funnel discovery.

    Ordering is made deterministic by the (ts, event_id) tie-break
    (event ids are unique), with the collect→array_sort→slide idiom of
    textops/prepare.py: per-session arrays are bounded by a user's
    events in ONE day, never by the corpus, so the sort is local and
    spillable and there is no corpus-wide window.  The n-gram alphabet
    bounds the output at |types|^n rows regardless of input size.

    Output: ``(t1 … tn, n_paths)``.
    """
    if n < 2:
        raise ValueError("session_paths: need n >= 2")
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    DAY = 86_400_000_000
    sess = events.select(
        F.col(user_col).alias("user_id"),
        F.expr(f"({ep}) div {DAY}").cast("long").alias("day"),
        F.expr(ep).cast("long").alias("ts_us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("etype"),
    )
    seqs = (
        sess.groupBy("user_id", "day")
        .agg(
            F.array_sort(
                F.collect_list(F.struct("ts_us", "eid", "etype"))
            ).alias("evs")
        )
        .select(F.expr("transform(evs, e -> e.etype)").alias("seq"))
    )
    gram_fields = ", ".join(f"seq[i + {j}] AS t{j + 1}" for j in range(n))
    grams = seqs.select(
        F.explode(
            F.expr(
                f"CASE WHEN size(seq) >= {n} THEN "
                f"transform(sequence(0, size(seq) - {n}),"
                f" i -> struct({gram_fields})) "
                f"ELSE array() END"
            )
        ).alias("g")
    ).select("g.*")
    return grams.groupBy(*[f"t{j + 1}" for j in range(n)]).agg(
        F.count(F.lit(1)).cast("long").alias("n_paths")
    )


def subsequence_support(
    events: DataFrame,
    types: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
) -> DataFrame:
    """Gap-allowed sequential-pattern support (the PrefixSpan statistic,
    Pei et al. ICDE'01, depth ≤ 3): for every ordered type pattern
    ``(t1, t2)`` and ``(t1, t2, t3)`` over the explicit ``types``
    alphabet, the number of (user, day) sessions containing it as a
    SUBSEQUENCE — any gaps allowed, the difference from
    ``session_paths`` which counts only consecutive runs.

    Exact without enumerating subsequences: a session supports
    ``(a, b)`` iff ``min_pos(a) < max_pos(b)`` — which also makes
    ``(a, a)`` mean "a at least twice" with no special case — and
    supports ``(a, b, c)`` iff some occurrence of ``b`` lies strictly
    between ``min_pos(a)`` and ``max_pos(c)`` (min/max alone are NOT
    sufficient for the middle element; the per-type position list is).

    Scale shape: events collapse to one row per (session, type) carrying
    ``(min, max, sorted positions)`` — a combine-able aggregate — then
    ALL pattern checks run inside per-session array lambdas
    (|types|² + |types|³ candidate probes against session-local
    position lists; no joins, no explosion proportional to pattern
    count × events).  The explicit ``types`` list is the cap that keeps
    the cubic alphabet term a deliberate act, same contract as
    ``olap.pivot_metrics``.

    Output: ``(t1, t2, t3, support)`` with ``t3 = ''`` for length-2
    patterns (fetch-path-safe sentinel; event types are never empty).
    """
    if not types:
        raise ValueError("subsequence_support: need a non-empty alphabet")
    if len(set(types)) != len(types):
        raise ValueError("subsequence_support: duplicate types")
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    DAY = 86_400_000_000
    pos = (
        events.filter(F.col(type_col).isin(types))
        .select(
            F.col(user_col).alias("user_id"),
            F.expr(f"({ep}) div {DAY}").cast("long").alias("day"),
            F.expr(ep).cast("long").alias("ts_us"),
            F.col(id_col).cast("long").alias("eid"),
            F.col(type_col).alias("t"),
        )
        .withColumn(
            "p",
            F.row_number().over(
                Window.partitionBy("user_id", "day").orderBy("ts_us", "eid")
            ).cast("long"),
        )
    )
    st = pos.groupBy("user_id", "day", "t").agg(
        F.min("p").alias("mn"),
        F.max("p").alias("mx"),
        F.array_sort(F.collect_list("p")).alias("ps"),
    )
    per_sess = st.groupBy("user_id", "day").agg(
        F.collect_list(F.struct("t", "mn", "mx", "ps")).alias("tps")
    )
    pats = per_sess.select(
        F.explode(
            F.expr(
                """
                concat(
                  flatten(transform(tps, a ->
                    transform(filter(tps, b -> a.mn < b.mx),
                              b -> struct(a.t AS t1, b.t AS t2, '' AS t3)))),
                  flatten(transform(tps, a ->
                    flatten(transform(filter(tps, c -> a.mn + 1 < c.mx), c ->
                      transform(
                        filter(tps, b ->
                          exists(b.ps, p -> p > a.mn AND p < c.mx)),
                        b -> struct(a.t AS t1, b.t AS t2, c.t AS t3)))))))
                """
            )
        ).alias("g")
    ).select("g.*")
    return pats.groupBy("t1", "t2", "t3").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )


def pit_join(
    facts: DataFrame,
    dim: DataFrame,
    keys: list[str],
    ts_col: str = "ts",
    valid_from: str = "valid_from",
    valid_to: str = "valid_to",
) -> DataFrame:
    """Point-in-time (PIT) join against an SCD2 dimension: each fact row
    picks up the dimension version valid AT its timestamp —
    ``valid_from <= ts < valid_to``, open current version = NULL
    ``valid_to`` — the feature-store / warehouse staple
    ("the user's tier when the order happened", never today's tier:
    leakage-free by construction, same contract as
    ``rolling_window_features``).

    SCD2 intervals are disjoint per key, so each fact matches at most
    one version; facts before the key's first version (or with no key
    match) survive with NULL dimension columns (LEFT join — dropping
    facts silently is how training sets rot).

    Scale shape: an equi-join on ``keys`` with the interval test as a
    residual predicate — Catalyst plans the ordinary hash join on the
    keys; the dimension is usually the broadcast side.  No interval
    bucketing needed: the key already co-locates, unlike the keyless
    ``range_join_buckets``.

    Output: all fact columns plus the dim's non-key columns.
    """
    dcols = [c for c in dim.columns if c not in keys]
    d = dim.select(
        *[F.col(k).alias(f"_dk_{k}") for k in keys],
        *[F.col(c) for c in dcols],
    )
    cond = [facts[k].eqNullSafe(F.col(f"_dk_{k}")) for k in keys]
    cond.append(facts[ts_col] >= F.col(valid_from))
    cond.append(
        F.col(valid_to).isNull() | (facts[ts_col] < F.col(valid_to))
    )
    # dims are usually broadcast-sized; callers wrap `dim` in
    # F.broadcast() when that is known — the hint survives the select
    pred = cond[0]
    for c in cond[1:]:
        pred = pred & c
    return facts.join(d, pred, "left").drop(*[f"_dk_{k}" for k in keys])


def linear_attribution(
    events: DataFrame,
    conversion_type: str,
    touch_types: list[str],
    window_seconds: int,
    *,
    scale: int = 100,
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    id_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Multi-touch LINEAR attribution: each conversion's integer value
    (``floor(value·scale)``) is split equally across every touch event of
    the same user in the ``window_seconds`` before it (strictly earlier,
    half-open ``[conv_ts − W, conv_ts)``), and per-touch credits are
    summed — the marketing-analytics staple between first-touch and
    last-touch (``as_of_join`` covers last-touch).

    Exact division: each of the k touches gets ``value_fp div k``, and
    the ``value_fp mod k`` remainder units go one each to the EARLIEST
    touches (ordered by (ts, event_id)) — deterministic, and the credits
    sum back to value_fp exactly (no lost cents, no floats).

    Scale shape: the candidate join is an equi-join on ``user_col`` with
    the time window as a residual predicate — the user key bounds pair
    growth, so cost is Σ_user (conversions × in-window touches), linear
    for bounded windows; a mega-user is ordinary join skew (AQE / the
    explicit ``salted_join`` handle it).  Ranks and k come from
    per-conversion windows (conversion-sized partitions, spillable).

    Output: ``(touch_id, n_conversions, credit_fp)`` per credited touch.
    """
    if window_seconds <= 0:
        raise ValueError("linear_attribution: window_seconds must be > 0")
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    base = events.select(
        F.col(user_col).alias("u"),
        F.expr(ep).cast("long").alias("ts_us"),
        F.col(id_col).cast("long").alias("eid"),
        F.col(type_col).alias("et"),
        F.floor(F.col(value_col).cast("double") * F.lit(float(scale)))
        .cast("long")
        .alias("vfp"),
    )
    conv = base.filter(F.col("et") == conversion_type).select(
        "u", F.col("ts_us").alias("cts"), F.col("eid").alias("cid"), "vfp"
    )
    touch = base.filter(F.col("et").isin(touch_types)).select(
        "u", F.col("ts_us").alias("tts"), F.col("eid").alias("tid")
    )
    W = int(window_seconds) * 1_000_000
    cand = conv.join(touch, "u").filter(
        (F.col("tts") < F.col("cts")) & (F.col("tts") >= F.col("cts") - W)
    )
    w_c = Window.partitionBy("cid")
    w_r = Window.partitionBy("cid").orderBy("tts", "tid")
    credited = (
        cand.withColumn("k", F.count(F.lit(1)).over(w_c).cast("long"))
        .withColumn("r", F.row_number().over(w_r).cast("long"))
        .select(
            "tid",
            "cid",
            (
                F.expr("vfp div k")
                + F.when(F.col("r") <= F.col("vfp") % F.col("k"), 1).otherwise(0)
            ).cast("long").alias("credit_fp"),
        )
    )
    return credited.groupBy("tid").agg(
        F.count(F.lit(1)).cast("long").alias("n_conversions"),
        F.sum("credit_fp").cast("long").alias("credit_fp"),
    ).withColumnRenamed("tid", "touch_id")


def frequent_itemsets(
    events: DataFrame,
    items: list[str],
    user_col: str = "user_id",
    item_col: str = "event_type",
    ts_col: str = "ts",
    *,
    min_support: int = 1,
) -> DataFrame:
    """Frequent UNORDERED itemsets of size 2 and 3 (the FP-growth /
    Apriori statistic) over (user, day) baskets: how many sessions
    contain {a, b} (or {a, b, c}) regardless of order or multiplicity —
    the set-shaped sibling of ``subsequence_support`` (ordered) and
    ``olap.association_rules`` (pairs + confidence/lift).

    Itemsets are emitted in canonical ascending order (``i1 < i2 < i3``
    lexicographically), so each set appears exactly once per basket by
    construction — support is a plain count, no dedup pass.  Baskets
    collapse to sorted distinct-item arrays first (combine-able
    ``collect_set``); combination generation is per-basket index lambdas
    bounded by the explicit ``items`` alphabet (the deliberate-cap
    contract of ``pivot_metrics``), so output ≤ C(|items|, 2) +
    C(|items|, 3) rows regardless of input size.

    Output: ``(i1, i2, i3, support)`` with ``i3 = ''`` for pairs.
    """
    if not items:
        raise ValueError("frequent_itemsets: need a non-empty alphabet")
    if len(set(items)) != len(items):
        raise ValueError("frequent_itemsets: duplicate items")
    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    DAY = 86_400_000_000
    baskets = (
        events.filter(F.col(item_col).isin(items))
        .select(
            F.col(user_col).alias("user_id"),
            F.expr(f"({ep}) div {DAY}").cast("long").alias("day"),
            F.col(item_col).alias("it"),
        )
        .groupBy("user_id", "day")
        .agg(F.array_sort(F.collect_set("it")).alias("xs"))
    )
    sets = baskets.select(
        F.explode(
            F.expr(
                """
                concat(
                  flatten(transform(sequence(0, size(xs) - 1), i ->
                    CASE WHEN i + 1 <= size(xs) - 1 THEN
                      transform(sequence(i + 1, size(xs) - 1),
                                j -> struct(xs[i] AS i1, xs[j] AS i2,
                                            '' AS i3))
                    ELSE array() END)),
                  flatten(flatten(transform(sequence(0, size(xs) - 1), i ->
                    CASE WHEN i + 1 <= size(xs) - 1 THEN
                      transform(sequence(i + 1, size(xs) - 1), j ->
                        CASE WHEN j + 1 <= size(xs) - 1 THEN
                          transform(sequence(j + 1, size(xs) - 1),
                                    k -> struct(xs[i] AS i1, xs[j] AS i2,
                                                xs[k] AS i3))
                        ELSE array() END)
                    ELSE array() END))))
                """
            )
        ).alias("g")
    ).select("g.*")
    out = sets.groupBy("i1", "i2", "i3").agg(
        F.count(F.lit(1)).cast("long").alias("support")
    )
    if min_support > 1:
        out = out.filter(F.col("support") >= min_support)
    return out


def rfm_scores(
    events: DataFrame,
    purchase_type: str = "purchase",
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """RFM customer scoring: per purchasing user the Recency (days since
    last purchase, vs the corpus max timestamp), Frequency (purchase
    count), Monetary (integer cents sum) — each scored 1–5 by EXACT
    nearest-rank quintile boundaries of its corpus distribution
    (``score = 1 + #{boundaries < value}``; for recency inverted so 5 =
    most recent).  Value-based boundary comparison makes ties
    deterministic (equal metric ⇒ equal score), unlike ntile whose tie
    assignment is order-dependent — the property that lets a SQL engine
    be a strict oracle.

    Scale shape: metrics are user-keyed aggregates; the 12 boundary
    values come from ``analysis.group_quantiles`` over the LONG-format
    (metric, value) table — the quantile window partitions by metric
    (3 groups), acceptable to corpus scale per that function's
    documented contract, then broadcasts 3 rows back.

    Output: ``(user_id, recency_days, frequency, monetary_fp, r_score,
    f_score, m_score, rfm)`` with ``rfm`` the "543"-style tag.
    """
    from mopper_spark.textops.analysis import group_quantiles

    ep = (
        f"timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00',"
        f" {ts_col})"
    )
    DAY = 86_400_000_000
    typed = events.select(
        F.col(user_col).alias("user_id"),
        F.col(type_col).alias("etype"),
        F.expr(ep).cast("long").alias("ts_us"),
        F.col(value_col).cast("double").alias("v"),
    )
    horizon = typed.agg(F.max("ts_us").alias("t_max"))
    per_user = (
        typed.filter(F.col("etype") == purchase_type)
        .groupBy("user_id")
        .agg(
            F.max("ts_us").alias("last_us"),
            F.count(F.lit(1)).cast("long").alias("frequency"),
            F.sum(F.floor(F.col("v") * 100.0).cast("long"))
            .cast("long")
            .alias("monetary_fp"),
        )
        .crossJoin(F.broadcast(horizon))
        .select(
            "user_id",
            F.expr(f"(t_max - last_us) div {DAY}").cast("long").alias(
                "recency_days"
            ),
            "frequency",
            "monetary_fp",
        )
        .localCheckpoint(eager=False)
    )
    m = per_user.selectExpr(
        "user_id",
        "stack(3, 'recency', recency_days, 'frequency', frequency,"
        " 'monetary', monetary_fp) AS (metric, v)",
    )
    bounds = group_quantiles(m, ["metric"], "v", qs=(0.2, 0.4, 0.6, 0.8))
    scored = m.join(F.broadcast(bounds), "metric").select(
        "user_id",
        "metric",
        (
            F.lit(1)
            + (F.col("v") > F.col("p20")).cast("int")
            + (F.col("v") > F.col("p40")).cast("int")
            + (F.col("v") > F.col("p60")).cast("int")
            + (F.col("v") > F.col("p80")).cast("int")
        ).alias("score"),
    )
    wide = scored.groupBy("user_id").agg(
        (
            F.lit(6)
            - F.max(F.when(F.col("metric") == "recency", F.col("score")))
        ).cast("int").alias("r_score"),
        F.max(F.when(F.col("metric") == "frequency", F.col("score")))
        .cast("int")
        .alias("f_score"),
        F.max(F.when(F.col("metric") == "monetary", F.col("score")))
        .cast("int")
        .alias("m_score"),
    )
    return per_user.join(wide, "user_id").select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary_fp",
        "r_score",
        "f_score",
        "m_score",
        F.concat(
            F.col("r_score").cast("string"),
            F.col("f_score").cast("string"),
            F.col("m_score").cast("string"),
        ).alias("rfm"),
    )
