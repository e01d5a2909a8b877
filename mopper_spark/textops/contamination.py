"""Benchmark-contamination detection: n-gram overlap against a held-out set.

The standard training-data hygiene check (GPT-3 appendix C; Dodge et al.
2021, "Documenting Large Webtext Corpora"): a training document is
*contaminated* if it shares any sufficiently-long word n-gram with an
evaluation/benchmark document.  GPT-3 used 13-grams; the right n depends on
document length and vocabulary — it is a parameter here.

Scale shape — the key move is that this is a SEMI-join, never a doc×doc
pair join: the benchmark side is collapsed to its DISTINCT n-gram set
first (one map-side-combining aggregate over the small side), and each
candidate document's distinct n-grams probe that set.  With |benchmark|
≪ |corpus| (the always-true case: benchmarks are thousands of docs,
corpora are billions), the distinct benchmark n-gram table is small enough
to broadcast, so the whole check is ONE narrow pass over the corpus + a
broadcast hash probe per n-gram — no shuffle of the 100 TB side at all.
If the benchmark set ever outgrows the broadcast threshold, Catalyst falls
back to a shuffled left-semi/left-outer join on the n-gram, which is still
linear in corpus n-grams; there is no quadratic regime.

Unlike the dedup family there is no bucket cap to reason about: an n-gram
shared by millions of corpus docs multiplies nothing (each corpus n-gram
row matches at most ONE broadcast-set entry), so the result is exact by
construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mopper_spark.textops.dedup import _lower_tokens, word_ngram_array


def benchmark_ngram_set(
    benchmark: DataFrame, text_col: str = "text", n: int = 13
) -> DataFrame:
    """Distinct word n-grams of the benchmark corpus: one column ``g``."""
    toks = _lower_tokens(text_col)
    return (
        benchmark.select(toks.alias("toks"))
        .select(F.explode(F.array_distinct(word_ngram_array("toks", n))).alias("g"))
        .distinct()
    )


def ngram_contamination(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 13,
    min_overlap: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
    broadcast_benchmark: bool = True,
) -> DataFrame:
    """Per-document contamination report vs a benchmark corpus.

    Returns ``(doc_id, n_grams, n_overlap, contaminated)`` where
    ``n_grams`` is the document's distinct n-gram count, ``n_overlap`` the
    count of those also present anywhere in the benchmark, and
    ``contaminated`` is ``n_overlap >= min_overlap``.

    ``broadcast_benchmark``: hint the (distinct-n-gram) benchmark side for
    broadcast — correct whenever the benchmark fits an executor (the normal
    case); set False to let AQE decide for a huge benchmark.
    """
    bset = benchmark_ngram_set(benchmark, text_col=text_col, n=n)
    if broadcast_benchmark:
        bset = F.broadcast(bset)
    toks = _lower_tokens(text_col)
    grams = (
        docs.select(F.col(id_col).alias("doc_id"), toks.alias("toks"))
        .select(
            "doc_id",
            F.explode_outer(F.array_distinct(word_ngram_array("toks", n))).alias("g"),
        )
    )
    # left join against the marker set; count matches per doc in one
    # map-side-combining aggregate (the explode and the aggregate stay in
    # the same stage when bset is broadcast — zero shuffles of the corpus
    # beyond the final per-doc combine)
    marked = grams.join(
        bset.withColumn("_hit", F.lit(1)), on="g", how="left"
    )
    return (
        marked.groupBy("doc_id")
        .agg(
            F.count("g").cast("long").alias("n_grams"),
            F.coalesce(F.sum("_hit"), F.lit(0)).cast("long").alias("n_overlap"),
        )
        .withColumn("contaminated", F.col("n_overlap") >= min_overlap)
    )
