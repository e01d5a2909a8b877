"""ML feature preparation over corpus tables: leak-free categorical
target encoding and the hashing trick — the feature-engineering steps a
quality-classifier training pipeline runs between curation and the
trainer (fastText-style quality models, contamination classifiers,
source-attribution probes).

Same exactness discipline as the statistics layer (`rankstats.py`):
every reported feature value is an exact BIGINT (fixed-point via integer
`div`), every hash is md5-derived (engine-portable — DuckDB, Spark, and
any replayer agree), and division that cannot be made integer-exact is
left to the consumer.

The reference engine (ghsnd/mopper, `src/operator/`) has no ML-feature
layer; these belong to the beyond-reference training-data surface, like
`quality_model.py` whose hashed-bucket weights `feature_hashing` feeds.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def target_encoding_loo(
    df: DataFrame,
    key_col: str,
    label_col: str,
    id_col: str,
    *,
    smoothing: int = 20,
    scale: int = 1_000_000,
) -> DataFrame:
    """Leave-one-out target encoding of a categorical ``key_col``
    against a BINARY ``label_col`` (0/1): each row's encoding is the
    label rate of its category computed WITHOUT the row itself —
    the standard leakage guard (Micci-Barreca 2001, the KDD target-
    encoding recipe) — shrunk toward the global rate by ``smoothing``
    pseudo-observations.

    Returns one row per input row: ``(id, key, label, loo_pos, loo_n,
    enc_fp)`` where ``loo_pos``/``loo_n`` are the leave-one-out positive
    and total counts and

        enc_fp = (scale * (loo_pos * g_n + smoothing * g_pos))
                     div ((loo_n + smoothing) * g_n)

    — the m-estimate encoding at fixed point ``scale``, computed with
    BIGINT integer `div` only (exact, engine-reproducible).  Overflow
    bound: ``scale * loo_pos * g_n`` must stay under 2^63 — at
    scale=1e6 that is safe through ~3e6 rows per category against a
    ~3e6-row corpus; shrink ``scale`` (the encoding is a probability,
     1e6 is already excess resolution) before it binds.

    Plan: one combine-able groupBy per category (category-count-shaped
    shuffle), one single-row global aggregate crossed in (broadcast),
    one equi-join back to the rows with NO forced broadcast — AQE
    chooses broadcast when the category table measures small and falls
    back to a shuffle join when the key is high-cardinality, so neither
    a billion-row category (map-side-combined count) nor a
    billion-category key (shuffle join) caps out memory.

    Categories with a single row have ``loo_n = 0``: the encoding
    degenerates to the smoothed global rate, which is exactly what the
    m-estimate prescribes at zero evidence.
    """
    if smoothing < 1:
        raise ValueError("target_encoding_loo: smoothing must be >= 1")
    key, label = F.col(key_col), F.col(label_col).cast("long")
    rows = df.select(
        F.col(id_col).alias("id"), key.alias("key"), label.alias("label")
    )
    per_key = rows.groupBy("key").agg(
        F.sum("label").alias("k_pos"), F.count(F.lit(1)).alias("k_n")
    )
    glob = rows.agg(
        F.sum("label").alias("g_pos"), F.count(F.lit(1)).alias("g_n")
    )
    # no broadcast hint on per_key: its cardinality is the CATEGORY count,
    # which on a high-cardinality key would make driver/executor memory the
    # hard cap — AQE picks broadcast vs shuffle from the measured size at
    # runtime, which is the scale-safe default (ADVICE r4).  glob is one
    # row, always broadcast.
    joined = (
        rows.join(per_key, "key")
        .crossJoin(F.broadcast(glob))
        .select(
            "id",
            "key",
            "label",
            (F.col("k_pos") - F.col("label")).cast("long").alias("loo_pos"),
            (F.col("k_n") - F.lit(1)).cast("long").alias("loo_n"),
            F.col("g_pos").cast("long").alias("g_pos"),
            F.col("g_n").cast("long").alias("g_n"),
        )
    )
    enc = F.expr(
        f"({int(scale)} * (loo_pos * g_n + {int(smoothing)} * g_pos))"
        f" div ((loo_n + {int(smoothing)}) * g_n)"
    )
    return joined.select(
        "id", "key", "label", "loo_pos", "loo_n", enc.cast("long").alias("enc_fp")
    )


def _hash_bucket(token: Column, n_buckets: int, seed: str) -> Column:
    """md5-derived bucket in [0, n_buckets): first 8 hex chars as int.
    Engine-portable (DuckDB: ``from_hex``/``hash`` free); power-of-two
    ``n_buckets`` keeps the modulo a mask but any modulus is exact."""
    h = F.md5(F.concat(F.lit(seed + ":"), token))
    return (F.conv(F.substring(h, 1, 8), 16, 10).cast("long") % n_buckets).cast(
        "long"
    )


def feature_hashing(
    df: DataFrame,
    id_col: str,
    text_col: str,
    *,
    n_buckets: int = 1024,
    seed: str = "fh-v1",
) -> DataFrame:
    """The hashing trick (Weinberger et al. 2009): bag-of-words folded
    into a fixed ``n_buckets``-dimensional sparse count vector with an
    md5-derived bucket per token — the fixed-width featurizer that needs
    NO vocabulary pass, which is the whole point at corpus scale (a
    vocabulary join is a second shuffle plus a broadcast that grows with
    the corpus; the hash is free and stateless).

    Returns sparse rows ``(id, bucket, n)`` — one per (document, bucket)
    with ``n`` = how many of the document's whitespace tokens landed in
    the bucket (signed variants hash a second bit; countless here, counts
    are what the quality model consumes).  Collisions are BY DESIGN
    (the estimator absorbs them); determinism is the contract, so the
    md5 bucket is pinned to ``seed``.

    Plan: explode + one (id, bucket) groupBy — word-count-shaped, the
    cheapest shuffle class in the codebase; no vocabulary state anywhere.
    """
    from mopper_spark.textops.analysis import tokens

    if n_buckets < 2:
        raise ValueError("feature_hashing: n_buckets must be >= 2")
    toks = df.select(
        F.col(id_col).alias("id"), F.explode(tokens(F.col(text_col))).alias("tok")
    )
    return (
        toks.select("id", _hash_bucket(F.col("tok"), n_buckets, seed).alias("bucket"))
        .groupBy("id", "bucket")
        .agg(F.count(F.lit(1)).cast("long").alias("n"))
    )
