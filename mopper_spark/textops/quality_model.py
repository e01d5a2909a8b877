"""Model-based quality scoring: a hashed linear (fastText-style) text
classifier evaluated as a pure DataFrame computation.

Heuristic quality signals (``analysis.py``) are stage one of a filtering
pipeline; stage two in the published recipes (CCNet, Wenzek et al.
LREC'20; Dolma, Soldaini et al. 2024) is a linear model over hashed
n-gram features — fastText's architecture (Joulin et al., EACL'17): score
= mean of the embedding/weight of each token n-gram, hashed into a fixed
bucket space.  At 100 TB the interesting part is INFERENCE shape, not
training: this module evaluates such a model with zero Python and zero
model-file distribution —

- features: token unigrams + bigrams, md5-hashed into ``n_buckets``
  (the fastText hashing trick — collisions are part of the model);
- weights: a pure md5 function of (seed, bucket) in fixed-point int64
  (``quality_scores``), OR a trained ``(bucket, weight_fp)`` table
  (``quality_scores_trained`` — one-row broadcast map keeps the docs
  side shuffle-free, or an explode+broadcast-join escape hatch);
- score: SUM of weights (int64, associative-safe) and the feature count,
  so every engine computes the identical integers — strictly
  SQL-oracle-able, like ``pipeline/embedding.py``.

Returns exact integers; consumers threshold on ``score_fp / n_features``
(the mean weight, fastText's pooling) at whatever operating point their
calibration picks.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _tokens(text: Column) -> Column:
    return F.filter(
        F.split(F.lower(F.trim(text)), r"\s+"), lambda t: t != ""
    )


def _hashed_weight(feature: Column, seed: str, n_buckets: int, scale: int) -> Column:
    """bucket = md5_48(seed‖feature) mod n_buckets; weight = md5_48
    (seed‖'w'‖bucket) mod (2·scale+1) − scale."""
    bucket = F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), feature)), 1, 12), 16, 10)
        .cast("long"),
        F.lit(n_buckets),
    )
    return (
        F.pmod(
            F.conv(
                F.substring(
                    F.md5(F.concat(F.lit(seed + "w"), bucket.cast("string"))), 1, 12
                ),
                16,
                10,
            ).cast("long"),
            F.lit(2 * scale + 1),
        )
        - F.lit(scale)
    ).cast("long")


def _bucket(feature: Column, seed: str, n_buckets: int) -> Column:
    """fastText hashing trick: bucket = md5_48(seed‖feature) mod n_buckets."""
    return F.pmod(
        F.conv(F.substring(F.md5(F.concat(F.lit(seed), feature)), 1, 12), 16, 10)
        .cast("long"),
        F.lit(n_buckets),
    )


def _features(text_col: str) -> Column:
    toks = _tokens(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    return F.concat(toks, bigrams)


def quality_scores_trained(
    docs: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seed: str = "qm-v1",
    n_buckets: int = 1 << 20,
    strategy: str = "map",
) -> DataFrame:
    """``quality_scores`` with TRAINED weights (VERDICT r3 #5): the weight
    of each hashed feature bucket comes from a ``(bucket:long,
    weight_fp:long)`` DataFrame instead of the hash expression.  Buckets
    absent from the table weigh 0 (a pruned/sparse model).

    Two inference shapes, identical integers:

    - ``strategy="map"`` (default): the weight table is collected and
      shipped as a ONE-ROW map column broadcast onto every doc, and the
      score folds inside the feature array exactly like the hash path —
      the docs side never shuffles (plan-pinned: the only Exchange is the
      one-row BroadcastExchange).  This is the fastText deployment shape:
      the model IS driver/broadcast-sized (2^20 int64 buckets = 16 MB).
    - ``strategy="join"``: explode features, broadcast-hash-join the
      weight table, re-aggregate per doc.  One shuffle (doc_id), but no
      driver collect — the escape hatch for bucket spaces too big to ship
      as one map cell.
    """
    if strategy not in ("map", "join"):
        raise ValueError(f"unknown strategy {strategy!r} (map|join)")
    feats = _features(text_col)
    if strategy == "map":
        rows = weights.select("bucket", "weight_fp").collect()
        wdict = {int(r.bucket): int(r.weight_fp) for r in rows}
        if len(wdict) != len(rows):
            raise ValueError("weights table has duplicate bucket keys")
        wmap = docs.sparkSession.createDataFrame(
            [(wdict,)], "__qm_wmap map<bigint,bigint>"
        )
        return docs.crossJoin(F.broadcast(wmap)).select(
            F.col(id_col).alias("doc_id"),
            F.size(feats).cast("long").alias("n_features"),
            F.aggregate(
                feats,
                F.lit(0).cast("long"),
                lambda acc, ftr: acc
                + F.coalesce(
                    F.element_at(
                        F.col("__qm_wmap"), _bucket(ftr, seed, n_buckets)
                    ),
                    F.lit(0),
                ),
            ).alias("score_fp"),
        )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode_outer(feats).alias("ftr"),  # outer: empty docs keep a row
    ).withColumn(
        "bucket",
        F.when(
            F.col("ftr").isNotNull(), _bucket(F.col("ftr"), seed, n_buckets)
        ),
    )
    joined = exploded.join(F.broadcast(weights), on="bucket", how="left")
    return joined.groupBy("doc_id").agg(
        F.count("ftr").cast("long").alias("n_features"),
        F.coalesce(
            F.sum(
                F.when(
                    F.col("ftr").isNotNull(),
                    F.coalesce(F.col("weight_fp"), F.lit(0)),
                )
            ),
            F.lit(0),
        )
        .cast("long")
        .alias("score_fp"),
    )


def quality_scores(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    *,
    seed: str = "qm-v1",
    n_buckets: int = 1 << 20,
    scale: int = 1000,
) -> DataFrame:
    """Per-document ``(doc_id, n_features, score_fp)``: summed fixed-point
    weights over hashed unigram+bigram features (empty docs: 0/0).

    Plan: one narrow projection building the feature array (tokens +
    zip-with-shifted bigrams), then the weight sum folds INSIDE the array
    via ``aggregate`` — no explode, no shuffle at all until the caller
    aggregates; a 100 TB scoring pass is embarrassingly parallel.
    """
    feats = _features(text_col)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(feats).cast("long").alias("n_features"),
        F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, ftr: acc + _hashed_weight(ftr, seed, n_buckets, scale),
        ).alias("score_fp"),
    )
