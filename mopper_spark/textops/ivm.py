"""Incremental view maintenance (IVM): keep a grouped aggregate table
current under a changelog of inserts/retracts WITHOUT rescanning the base.

The maintained view is ``GROUP BY keys → (cnt, total, mx)`` over an int64
measure.  ``cnt`` and ``total`` are self-maintainable (Gupta & Mumick's
classic result — SIGMOD Record 1995 survey): the changelog's own grouped
delta merges into the old aggregate with one keyed join.  ``max`` is
self-maintainable under inserts only; a retraction that hits the current
maximum makes the key DIRTY, and dirty keys alone are recomputed from the
base detail under exact multiset semantics.

Scale shape (the whole point at 100 TB): the changelog is minuscule next
to the view, so the delta aggregate is tiny and AQE broadcasts it into
the merge join; dirty keys are a subset of retract keys — the recompute
touches the detail through a key semi-join (partition-prunable when the
detail is keyed-partitioned), never a full rescan.  All aggregates are
associative int64, so every result is partitioning-proof and map-side
combinable.

Retraction contract: every ``op = -1`` row must match a live detail row
(standard changelog discipline — violating it makes "incremental" itself
ill-defined).  Keys whose count reaches zero leave the view.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def agg_snapshot(
    detail: DataFrame, keys: list[str], value_col: str
) -> DataFrame:
    """The maintained view's definition: one grouped pass over detail.
    Used to bootstrap the view and as the semantic spec ``ivm_update``
    must reproduce without the full pass."""
    return detail.groupBy(*keys).agg(
        F.count(F.lit(1)).cast("long").alias("cnt"),
        F.sum(value_col).cast("long").alias("total"),
        F.max(value_col).cast("long").alias("mx"),
    )


def ivm_update(
    base_agg: DataFrame,
    changelog: DataFrame,
    detail: DataFrame,
    keys: list[str],
    value_col: str = "value_fp",
    op_col: str = "op",
) -> DataFrame:
    """Merge a changelog into the aggregate view.

    ``base_agg``: the current view ``(keys…, cnt, total, mx)``.
    ``changelog``: ``(keys…, value_col, op_col)`` with op ∈ {+1, −1}.
    ``detail``: the OLD base detail (pre-changelog) — touched only
    through a dirty-key semi-join.

    Returns the post-changelog view, exactly equal to
    ``agg_snapshot(detail ⊎ changelog, …)``.
    """
    op = F.col(op_col).cast("long")
    val = F.col(value_col).cast("long")
    delta = changelog.groupBy(*keys).agg(
        F.sum(op).alias("d_cnt"),
        F.sum(op * val).alias("d_sum"),
        F.max(F.when(op > 0, val)).alias("ins_max"),
        F.max(F.when(op < 0, val)).alias("del_max"),
    )
    merged = base_agg.join(delta, keys, "full_outer").select(
        *keys,
        (F.coalesce("cnt", F.lit(0)) + F.coalesce("d_cnt", F.lit(0))).alias(
            "new_cnt"
        ),
        (F.coalesce("total", F.lit(0)) + F.coalesce("d_sum", F.lit(0))).alias(
            "new_total"
        ),
        "mx",
        "ins_max",
        "del_max",
    )
    # max is clean when no retract reached the old maximum, or an insert
    # re-covers it (>=: an inserted copy of the deleted max keeps it live).
    clean = (
        F.col("del_max").isNull()
        | (F.col("del_max") < F.col("mx"))
        | (F.col("ins_max") >= F.col("del_max"))
    )
    merged = merged.withColumn(
        "mx_clean",
        F.when(clean, F.greatest("mx", "ins_max")).otherwise(F.lit(None)),
    )
    live = merged.filter(F.col("new_cnt") > 0)

    dirty_keys = live.filter(F.col("mx_clean").isNull()).select(*keys)
    # exact multiset recompute on dirty keys only: per (keys, value) the
    # remaining multiplicity is detail count + changelog op-sum.
    d_counts = (
        detail.join(dirty_keys, keys, "left_semi")
        .groupBy(*keys, F.col(value_col).cast("long").alias("v"))
        .agg(F.count(F.lit(1)).alias("m"))
    )
    c_counts = (
        changelog.join(dirty_keys, keys, "left_semi")
        .groupBy(*keys, val.alias("v"))
        .agg(F.sum(op).alias("dm"))
    )
    remaining = d_counts.join(c_counts, [*keys, "v"], "full_outer").filter(
        F.coalesce("m", F.lit(0)) + F.coalesce("dm", F.lit(0)) > 0
    )
    recomputed = remaining.groupBy(*keys).agg(F.max("v").alias("mx_recomputed"))

    return live.join(recomputed, keys, "left").select(
        *keys,
        F.col("new_cnt").alias("cnt"),
        F.col("new_total").alias("total"),
        F.coalesce("mx_clean", "mx_recomputed").alias("mx"),
    )
