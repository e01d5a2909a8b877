"""Temporal scoping for the extracted KG: entity activity intervals.

A triple emitted from a transcript is implicitly time-scoped — the
entity was being discussed AT the turn's timestamp.  Temporal-KG
consumers (e.g. Wikidata-style qualifiers, or a retrieval index that
answers "who was discussed between t1 and t2") need those point events
collapsed into VALIDITY INTERVALS: maximal spans during which an entity
kept being mentioned in a conversation, split when it goes quiet for
longer than ``max_gap``.  This is the KG-flavored sibling of event
sessionization (the classic gaps-and-islands collapse), applied to the
mention stream rather than user events; the reference engine
(ghsnd/mopper) emits point-in-time triples only — interval semantics
are part of the beyond-reference query layer.

Scale shape: one window partitioned by (conversation, entity) ordered
by time — per-partition volume is bounded by a single conversation's
mentions of a single entity, the same per-conversation bound every
window in this package rides on (long-conversation skew is bounded by
the conversation length itself, and the (conv, entity) key splits a
hot conversation across its entities); then one combine-able
aggregation per island.  Timestamps are compared and emitted as epoch
MICROSECONDS (int64) — TZ- and fetch-path-proof, the same convention
as the as-of join oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_US = "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', {})"


def entity_activity_intervals(
    mentions_ts: DataFrame,
    *,
    max_gap_s: int = 3600,
    conv_col: str = "conv_id",
    entity_col: str = "surface",
    ts_col: str = "ts",
) -> DataFrame:
    """Collapse per-turn entity mentions into activity intervals.

    ``mentions_ts`` needs one row per (conversation, entity, timestamp)
    observation — duplicates at the same instant are fine (they collapse
    into the same island and count individually in ``n_mentions``).

    Returns ``(conv_id, entity, valid_from_us, valid_to_us, n_mentions)``
    with inclusive epoch-microsecond bounds; a new interval starts when
    the entity is unseen in that conversation for MORE than
    ``max_gap_s`` seconds (a gap of exactly ``max_gap_s`` still chains —
    the standard sessionization boundary, pinned in tests).
    """
    if max_gap_s < 0:
        raise ValueError("max_gap_s must be >= 0")
    gap_us = int(max_gap_s) * 1_000_000
    base = mentions_ts.select(
        F.col(conv_col).alias("conv_id"),
        F.col(entity_col).alias("entity"),
        F.expr(_EPOCH_US.format(ts_col)).alias("at_us"),
    )
    w = Window.partitionBy("conv_id", "entity").orderBy("at_us")
    islands = (
        base.withColumn("prev_us", F.lag("at_us").over(w))
        .withColumn(
            "new_island",
            F.when(
                F.col("prev_us").isNull()
                | (F.col("at_us") - F.col("prev_us") > gap_us),
                1,
            ).otherwise(0),
        )
        .withColumn(
            "island",
            F.sum("new_island").over(
                w.rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
    )
    return islands.groupBy("conv_id", "entity", "island").agg(
        F.min("at_us").alias("valid_from_us"),
        F.max("at_us").alias("valid_to_us"),
        F.count(F.lit(1)).cast("long").alias("n_mentions"),
    ).drop("island")
