"""Data Selection via Importance Resampling (DSIR, Xie et al. NeurIPS 2023)
over hashed unigram features — select raw-pool documents that look like a
target domain, the standard pretraining-mixture curation step.

Estimator (the paper's bag-of-hashed-ngrams form, unigram variant):

    log w(d) = sum_t [ ln p_target(b(t)) - ln p_raw(b(t)) ]

with Laplace-smoothed bucket distributions ``p(b) = (c_b + 1) / (N + B)``
over ``B`` hash buckets, and Gumbel-top-k resampling (sampling without
replacement proportional to ``exp(log w)``; Vieira 2014).

Engine-portable determinism (the repo-wide discipline): doubles never
flow through a multi-row sum.  Each of the ≤ B buckets gets ONE
fixed-point log-ratio ``floor((ln(c_t+1) - ln(c_r+1)) * 1e6)`` (BIGINT);
per-document sums are exact integer arithmetic; the Gumbel key is
``floor(-ln(-ln(u)) * 1e6)`` from an exact 48-bit md5 rational ``u``, so
the resample key is a BIGINT and the whole output is integer-typed —
bit-identical in Spark and any ANSI oracle.

Scale shape: two word-count-shaped shuffles for the bucket counts (the
bucket domain is B, so the second is trivially small), the B-row
log-ratio table broadcasts back into one narrow per-document pass, and
the top-k is a TakeOrdered (per-partition top-k + k-row driver merge),
never a global sort.  Nothing is quadratic; the hot path is one explode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FP = 1_000_000.0
_TWO48 = 281474976710656.0  # 2^48


def _hash_bucket(col, n_buckets: int):
    """12-bit md5 prefix mod B — portable to any engine with md5."""
    return F.pmod(
        F.conv(F.substring(F.md5(col), 1, 3), 16, 10).cast("long"),
        F.lit(n_buckets),
    )


def importance_resample(
    docs: DataFrame,
    target_source: str,
    k: int = 100,
    n_buckets: int = 1024,
    seed: str = "dsir-v1",
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """Gumbel-top-``k`` DSIR resample of the raw pool (``source_col !=
    target_source``) toward the target domain (``== target_source``).

    Returns ``(doc_id, n_tokens, w_fp, key_fp)`` — the selected ``k``
    raw-pool documents, their fixed-point log importance weight and
    resample key, ordered by ``(key_fp DESC, doc_id)``.  Documents with
    no tokens are excluded (their weight is undefined).
    """
    if k < 1:
        raise ValueError("importance_resample: k must be >= 1")
    if n_buckets < 2 or n_buckets > 4096:
        raise ValueError("importance_resample: n_buckets must be in [2, 4096]")

    toks = F.filter(
        F.split(F.lower(F.trim(F.col(text_col))), r"\s+"), lambda x: x != ""
    )
    exploded = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        toks.alias("toks"),
    ).select(
        "doc_id", "source", F.explode("toks").alias("tok")
    ).withColumn("bucket", _hash_bucket(F.col("tok"), n_buckets))

    is_target = F.col("source") == target_source
    counts = exploded.groupBy("bucket").agg(
        F.sum(F.when(is_target, 1).otherwise(0)).cast("long").alias("c_t"),
        F.sum(F.when(is_target, 0).otherwise(1)).cast("long").alias("c_r"),
    )
    totals = counts.groupBy().agg(
        F.sum("c_t").cast("long").alias("n_t"),
        F.sum("c_r").cast("long").alias("n_r"),
    )
    # one fp log-ratio per bucket; one fp constant for the normalizers
    lw = counts.select(
        "bucket",
        F.floor(
            (F.log(F.col("c_t") + 1) - F.log(F.col("c_r") + 1)) * F.lit(FP)
        ).cast("long").alias("lw_fp"),
    )
    const_fp = totals.select(
        F.floor(
            (
                F.log((F.col("n_r") + n_buckets).cast("double"))
                - F.log((F.col("n_t") + n_buckets).cast("double"))
            )
            * F.lit(FP)
        ).cast("long").alias("const_fp")
    )

    per_doc = (
        exploded.filter(~is_target)
        .join(F.broadcast(lw), "bucket")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_tokens"),
            F.sum("lw_fp").cast("long").alias("s_fp"),
        )
    )
    # Gumbel key from an exact 48-bit rational u in (0, 1]
    h48 = F.conv(
        F.substring(F.md5(F.concat(F.lit(seed), F.col("doc_id").cast("string"))), 1, 12),
        16,
        10,
    ).cast("long")
    u = (h48 + 1).cast("double") / F.lit(_TWO48)
    g_fp = F.floor(-F.log(-F.log(u)) * F.lit(FP)).cast("long")

    return (
        per_doc.crossJoin(F.broadcast(const_fp))
        .select(
            "doc_id",
            "n_tokens",
            (F.col("s_fp") + F.col("n_tokens") * F.col("const_fp")).alias("w_fp"),
        )
        .withColumn("key_fp", F.col("w_fp") + g_fp)
        .orderBy(F.desc("key_fp"), F.asc("doc_id"))
        .limit(k)
    )
