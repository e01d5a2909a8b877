"""Deterministic KG-embedding scoring/evaluation (TransE-style).

After ``curate.negative_samples`` produces corrupted triples, the next
pipeline stage is scoring positives against negatives — the evaluation
half of the TransE training loop (Bordes et al., NeurIPS'13: a triple
(s, p, o) is plausible when e_s + r_p ≈ e_o).  Real training updates
embeddings with SGD; the DISTRIBUTED part — the part that must survive
100 TB — is the scoring pass: embed every endpoint, compute distances,
aggregate margin violations per predicate.  That pass is implemented here
with three deliberate choices:

- **Hash-initialized embeddings**: coordinate ``i`` of label ``L`` is a
  pure md5 function of ``(seed, L, i)`` mapped to ``[-scale, scale]`` —
  no trained parameter table to join (embedding lookup becomes
  computation, the classic "hashing trick"), bit-identical on any engine
  with md5 (the DuckDB oracle recomputes every coordinate hex-for-hex).
  This is the standard random-init baseline a trained model must beat —
  exactly what an eval harness needs first.
- **Integer L1 geometry**: distances are sums of int64 absolute
  differences — associative-safe, so scores are bit-identical under any
  partitioning/reduction order (same argument as ``graph.pagerank_fixed``;
  float L2 would drift in the last ulps across runs).
- **All-native expressions**: embeddings are ``transform(sequence(...))``
  arrays, distances ``aggregate(zip_with(...))`` — zero Python, one
  narrow pass over the (positives ⋈ negatives) rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def hash_embedding(
    label: Column, *, dim: int = 16, seed: str = "emb-v1", scale: int = 1000
) -> Column:
    """``array<long>`` embedding: coord i = md5_48(seed‖label‖':'‖i) mod
    (2·scale+1) − scale ∈ [−scale, scale]."""
    return F.transform(
        F.sequence(F.lit(0), F.lit(dim - 1)),
        lambda i: (
            F.pmod(
                F.conv(
                    F.substring(
                        F.md5(
                            F.concat(
                                F.lit(seed), label, F.lit(":"), i.cast("string")
                            )
                        ),
                        1,
                        12,
                    ),
                    16,
                    10,
                ).cast("long"),
                F.lit(2 * scale + 1),
            )
            - F.lit(scale)
        ).cast("long"),
    )


def _l1(a: Column, b: Column) -> Column:
    """Σ |a_i − b_i| over two equal-length long arrays — exact int64."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: F.abs(x - y)),
        F.lit(0).cast("long"),
        lambda acc, v: acc + v,
    )


def transe_distance(
    subj: Column,
    pred: Column,
    obj: Column,
    *,
    dim: int = 16,
    seed: str = "emb-v1",
    scale: int = 1000,
) -> Column:
    """‖e_s + r_p − e_o‖₁ with hash embeddings (entity and relation spaces
    use distinct seed namespaces)."""
    es = hash_embedding(subj, dim=dim, seed=seed + "/e", scale=scale)
    rp = hash_embedding(pred, dim=dim, seed=seed + "/r", scale=scale)
    eo = hash_embedding(obj, dim=dim, seed=seed + "/e", scale=scale)
    translated = F.zip_with(es, rp, lambda x, y: x + y)
    return _l1(translated, eo)


def transe_margin_eval(
    triples: DataFrame,
    *,
    n_per: int = 2,
    margin: int = 100,
    dim: int = 16,
    seed: str = "emb-v1",
    scale: int = 1000,
    neg_seed: str = "neg-v1",
) -> DataFrame:
    """Margin-ranking evaluation per predicate.

    For every (positive, negative) pair from ``curate.negative_samples``:
    hinge = max(0, margin + d_pos − d_neg) (a GOOD model gives positives
    smaller distance).  Returns per-predicate ``(pred, n_pairs,
    n_violations, total_hinge)`` — all exact int64, so the whole harness
    is strictly SQL-oracle-able and regression-diffable between runs.

    Plan shape: ``negative_samples`` (distinct + index + explode + two
    joins) feeds ONE narrow projection computing both distances, then one
    map-side-combining aggregation on ``pred`` — no extra shuffle beyond
    the sampler's.
    """
    return _margin_eval(
        triples,
        transe_distance,
        similarity=False,
        n_per=n_per,
        margin=margin,
        dim=dim,
        seed=seed,
        scale=scale,
        neg_seed=neg_seed,
    )


def _margin_eval(
    triples: DataFrame,
    score_fn,
    *,
    similarity: bool,
    n_per: int,
    margin: int,
    dim: int,
    seed: str,
    scale: int,
    neg_seed: str,
) -> DataFrame:
    """Shared margin-ranking harness: sample negatives, score both sides
    with ``score_fn(subj, pred, obj, **kw)``, hinge with the sign the
    scorer's direction demands (distance: pos − neg; similarity:
    neg − pos), aggregate per predicate — ONE copy of the sampler
    wiring, the hinge clamp, and the ``(pred, n_pairs, n_violations,
    total_hinge)`` output contract for every scorer."""
    from mopper_spark.pipeline.curate import negative_samples

    pairs = negative_samples(triples, n_per=n_per, seed=neg_seed)
    kw = dict(dim=dim, seed=seed, scale=scale)
    scored = pairs.select(
        "pred",
        score_fn(F.col("subj"), F.col("pred"), F.col("obj"), **kw).alias(
            "s_pos"
        ),
        score_fn(F.col("subj"), F.col("pred"), F.col("neg_obj"), **kw).alias(
            "s_neg"
        ),
    ).withColumn(
        "hinge",
        F.greatest(
            F.lit(0).cast("long"),
            F.lit(margin)
            + (
                F.col("s_neg") - F.col("s_pos")
                if similarity
                else F.col("s_pos") - F.col("s_neg")
            ),
        ),
    )
    return scored.groupBy("pred").agg(
        F.count("*").cast("long").alias("n_pairs"),
        F.sum((F.col("hinge") > 0).cast("long")).cast("long").alias("n_violations"),
        F.sum("hinge").cast("long").alias("total_hinge"),
    )


def distmult_score(
    subj: Column,
    pred: Column,
    obj: Column,
    *,
    dim: int = 16,
    seed: str = "emb-v1",
    scale: int = 1000,
) -> Column:
    """DistMult bilinear-diagonal score Σᵢ e_s[i]·r_p[i]·e_o[i] (Yang et
    al., ICLR'15) with the same hash-initialized integer embeddings as
    ``transe_distance`` — exact int64 (|coord| ≤ scale, so the sum is
    bounded by dim·scale³ ≈ 1.6e10 at the defaults).  DistMult scores
    SYMMETRIC in (s, o) by construction — the known expressiveness limit
    vs TransE's translation — which is exactly why an eval harness wants
    both scorers over the same negatives."""
    es = hash_embedding(subj, dim=dim, seed=seed + "/e", scale=scale)
    rp = hash_embedding(pred, dim=dim, seed=seed + "/r", scale=scale)
    eo = hash_embedding(obj, dim=dim, seed=seed + "/e", scale=scale)
    prod = F.zip_with(
        F.zip_with(es, rp, lambda x, y: x * y), eo, lambda xy, z: xy * z
    )
    return F.aggregate(prod, F.lit(0).cast("long"), lambda acc, v: acc + v)


def distmult_margin_eval(
    triples: DataFrame,
    *,
    n_per: int = 2,
    margin: int = 1_000_000,
    dim: int = 16,
    seed: str = "emb-v1",
    scale: int = 1000,
    neg_seed: str = "neg-v1",
) -> DataFrame:
    """Margin-ranking evaluation per predicate with the DistMult scorer:
    positives should score HIGHER, so hinge = max(0, margin + s_neg −
    s_pos) — the sign-flipped twin of ``transe_margin_eval`` (TransE is a
    distance, DistMult a similarity).  Same negative sampler, same exact
    int64 outputs ``(pred, n_pairs, n_violations, total_hinge)``, same
    one-narrow-pass + one-aggregation plan shape."""
    return _margin_eval(
        triples,
        distmult_score,
        similarity=True,
        n_per=n_per,
        margin=margin,
        dim=dim,
        seed=seed,
        scale=scale,
        neg_seed=neg_seed,
    )
