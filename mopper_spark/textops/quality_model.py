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
  (stand-in for trained weights; swap ``weight_expr`` for a broadcast
  lookup table when you have real ones — the plan shape is identical,
  one narrow pass + an explode bounded by tokens-per-doc);
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
    toks = _tokens(F.col(text_col))
    bigrams = F.zip_with(
        F.slice(toks, 1, F.greatest(F.size(toks) - 1, F.lit(0))),
        F.slice(toks, 2, F.greatest(F.size(toks) - 1, F.lit(0))),
        lambda a, b: F.concat(a, F.lit(" "), b),
    )
    feats = F.concat(toks, bigrams)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(feats).cast("long").alias("n_features"),
        F.aggregate(
            feats,
            F.lit(0).cast("long"),
            lambda acc, ftr: acc + _hashed_weight(ftr, seed, n_buckets, scale),
        ).alias("score_fp"),
    )
