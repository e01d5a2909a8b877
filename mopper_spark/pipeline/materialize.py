"""Stage 5: materialize the graph table, partitioned, skew-defused.

Target layout: an Iceberg table ``(subj, pred, obj, okind, graph)``
partitioned by ``graph_key`` (the graph's last path segment — low
cardinality, e.g. per-role graphs).  The sandbox has no Iceberg runtime
jar, so the writer is an interface: ``IcebergWriter`` engages when the
catalog is configured, ``ParquetWriter`` is the fallback with the same
partition layout (FIXTURES/SURVEY §7 note).

Skew: triples of one huge conversation share ``conv_id`` but have distinct
subjects, so repartitioning by ``xxhash64(subj)`` spreads the hot
conversation uniformly across writers — no salting column needs to be
persisted.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def with_graph_key(triples: DataFrame) -> DataFrame:
    return triples.withColumn(
        "graph_key", F.regexp_extract(F.col("graph"), r"([^/]+)$", 1)
    )


def prepare_for_write(triples: DataFrame, num_buckets: int = 32) -> DataFrame:
    """Spread rows uniformly by subject hash before the partitioned write."""
    return with_graph_key(triples).repartition(
        num_buckets, F.xxhash64("subj")
    )


def write_graph_table(
    spark: SparkSession,
    triples: DataFrame,
    path_or_table: str,
    num_buckets: int = 32,
    use_iceberg: bool | None = None,
) -> None:
    df = prepare_for_write(triples, num_buckets)
    if use_iceberg is None:
        use_iceberg = "." in path_or_table and not path_or_table.startswith("/")
    if use_iceberg:
        try:
            (
                df.writeTo(path_or_table)
                .partitionedBy(F.col("graph_key"))
                .createOrReplace()
            )
            return
        except Exception:  # no Iceberg runtime in this sandbox
            raise RuntimeError(
                "Iceberg catalog unavailable; pass a filesystem path for the "
                "parquet fallback"
            )
    df.write.mode("overwrite").partitionBy("graph_key").parquet(path_or_table)


def write_graph_table_bucketed(
    triples: DataFrame,
    table: str,
    num_buckets: int = 64,
    path: str | None = None,
) -> None:
    """Materialize the graph table BUCKETED (and sorted) by ``subj``.

    Bucketing is the co-location strategy for the workloads that dominate
    a served KG: star BGP queries (k patterns sharing one subject
    variable = k self-joins on ``subj``), per-subject conflict resolution,
    and incremental merges — on a bucketed table all of these plan as
    zero-Exchange sort-merge joins because every scan already satisfies
    the hash-clustered distribution on ``subj``.  At 100 TB that deletes
    the dominant cost: re-shuffling the whole triple set once per query.
    ``tests/test_materialize.py`` pins the zero-Exchange star-query plan
    (including through ``bgp.py``'s variable renames — Spark's
    alias-aware output partitioning carries bucketing through Projects).

    Sorting within buckets additionally removes the per-query Sort for
    merge joins and gives subject-range row-group skipping in parquet.

    ``path`` makes it an external table (omit for the session warehouse).
    On Iceberg the equivalent layout is ``PARTITIONED BY
    (bucket(N, subj))`` — same pruning/co-location semantics via storage
    partition join.
    """
    w = (
        with_graph_key(triples)
        .write.bucketBy(num_buckets, "subj")
        .sortBy("subj")
        .format("parquet")
        .mode("overwrite")
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(table)


def diff_graph_tables(old: DataFrame, new: DataFrame) -> DataFrame:
    """Change-data-capture between two graph snapshots: one row per
    statement that was added or removed, ``(op, subj, pred, obj, okind,
    graph)`` with ``op`` ∈ {'add', 'del'}.

    Set semantics (the serializer's dedup contract), computed as two
    left-anti joins on all five statement columns — each is one shuffle
    keyed on the full statement, or ZERO shuffles when both snapshots are
    subject-bucketed tables (``write_graph_table_bucketed``), since the
    anti-join's equi-keys include ``subj``.  This is the table a KG
    publisher ships downstream instead of full snapshots, and the
    regression diff a pipeline change is judged by.
    """
    cols = ["subj", "pred", "obj", "okind", "graph"]
    o = old.select(cols).distinct()
    n = new.select(cols).distinct()
    added = n.join(o, cols, "left_anti").select(F.lit("add").alias("op"), *cols)
    removed = o.join(n, cols, "left_anti").select(F.lit("del").alias("op"), *cols)
    return added.unionByName(removed)


def apply_changelog(
    base: DataFrame, changelog: DataFrame, *, asof: int | None = None
) -> DataFrame:
    """Graph time travel — the inverse of ``diff_graph_tables``: rebuild
    the statement set as of changelog version ``asof`` from a base
    snapshot plus an append-only changelog ``(version, op, subj, pred,
    obj, okind, graph)`` with ``op`` ∈ {'add', 'del'} (each version
    being a ``diff_graph_tables`` output stamped with its number).
    ``asof=None`` replays the whole log.  This is what a KG consumer
    runs instead of storing every snapshot: one base + diffs reproduces
    ANY historical state (parquet-fallback counterpart of Iceberg's
    snapshot time travel, which stays a named refusal — no runtime jar
    in this sandbox, see tests/test_materialize.py).

    Last-op-wins per statement: a statement added at v1 and deleted at
    v2 is absent as of v2, present as of v1.  At most one op per
    (statement, version) is assumed — a same-version add+del is
    malformed input (a diff never emits one) and resolves
    deterministically to 'del' (struct max; 'del' > 'add').

    Scale shape: NOT iterative — one combine-able max-struct aggregation
    over the log keyed by the full statement (uniform key, skew-proof),
    then one anti-join and one union against the base.  Both log
    aggregation and base anti-join are subject-prefixed keys, so on
    subject-bucketed tables (``write_graph_table_bucketed``) the base
    side shuffles zero bytes; cost is O(|log| + |touched|), never
    O(|graph| × versions).
    """
    cols = ["subj", "pred", "obj", "okind", "graph"]
    log = changelog
    if asof is not None:
        log = log.filter(F.col("version") <= F.lit(asof))
    last = log.groupBy(*cols).agg(
        F.max(F.struct(F.col("version"), F.col("op"))).alias("m")
    )
    survivors = last.filter(F.col("m.op") == "add").select(*cols)
    untouched = base.select(*cols).distinct().join(last, cols, "left_anti")
    # disjoint by construction (survivors ⊆ touched), so a bare union
    # preserves set semantics without another distinct
    return untouched.unionByName(survivors)
