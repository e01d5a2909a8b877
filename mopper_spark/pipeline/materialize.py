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
