"""Bloom-filter runtime pre-filtering for distributed semi-joins.

The classic big-data runtime filter (Bloom 1970; "sideways information
passing" in every warehouse engine): when the probe side is huge and the
build side is merely large-ish, broadcasting the build side's KEY SET is
too big, but a Bloom filter over it is tiny (~10 bits/key at 1% FP) and
removes almost every non-matching probe row BEFORE the shuffle that the
exact semi-join needs.  Output stays EXACT: the Bloom pass only discards
rows that provably cannot match (no false negatives); survivors are
confirmed by a real semi-join, so false positives cost shuffle bytes,
never wrong rows.

Spark's own `spark.sql.optimizer.runtime.bloomFilter.enabled` injects
this pattern automatically for some shapes; this module makes it an
explicit, testable operator usable on any DataFrame pair — including
shapes the injected filter misses (pre-aggregated builds, reusable
filters, streaming foreachBatch).

Everything is native Catalyst expressions (xxhash64 + bit ops) — no
Python in the hot path; the filter itself is a one-row broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F


def bloom_build(keys: DataFrame, key: str, m_bits: int, k: int = 5) -> DataFrame:
    """Build a Bloom filter over ``keys[key]`` as ONE row holding a
    ``map<long, long>`` from 64-bit word index to word value (a map, not
    a dense array: the groupBy emits only TOUCHED words, and probes
    treat an absent word as zero — a dense array would force a
    collect-and-rebuild on the driver).

    Hashes: ``pmod(xxhash64(key, i), m_bits)`` for i in 0..k-1 — k
    independent seeds of the same JVM-side hash the engine's own
    shuffles use.  The build is one narrow projection (k positions per
    key) and one groupBy on the word index — ≤ m_bits/64 groups, bounded
    by the FILTER size, not the key count — then one collect_list into
    the single-row map.

    Sizing: ~1.44 · n · log2(1/fp) bits; 10 bits/key ≈ 1% FP.
    """
    if m_bits < 64:
        raise ValueError("bloom_build: m_bits must be >= 64")
    if k < 1:
        raise ValueError("bloom_build: k must be >= 1")
    pos = F.explode(
        F.array(
            *[
                F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
                for i in range(k)
            ]
        )
    ).alias("pos")
    words = (
        keys.select(pos)
        .select(
            F.expr("pos div 64").cast("long").alias("word"),
            F.expr("shiftleft(1L, CAST(pos % 64 AS INT))").alias("bit"),
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("mask"))
    )
    return words.agg(
        F.map_from_entries(F.collect_list(F.struct("word", "mask"))).alias("bf"),
        F.lit(m_bits).cast("long").alias("m_bits"),
        F.lit(k).cast("int").alias("k"),
    )


def bloom_prefilter(
    df: DataFrame, bf: DataFrame, key: str, m_bits: int, k: int
) -> DataFrame:
    """Keep only rows whose key MIGHT be in the filter (all k bits set).
    An absent map word reads as 0 via coalesce, so a key hashing into an
    untouched word is correctly rejected.  Pure column expressions over
    a one-row broadcast — never a UDF, and the filter sits directly on
    the scan side of whatever Exchange follows."""
    out = df.crossJoin(F.broadcast(bf))
    cond = None
    for i in range(k):
        p = f"__bp{i}"
        out = out.withColumn(
            p, F.pmod(F.xxhash64(F.col(key), F.lit(i)), F.lit(m_bits))
        )
        hit = (
            F.coalesce(
                F.element_at(F.col("bf"), F.expr(f"{p} div 64")), F.lit(0)
            ).bitwiseAND(F.expr(f"shiftleft(1L, CAST({p} % 64 AS INT))"))
            != 0
        )
        cond = hit if cond is None else cond & hit
    return out.filter(cond).drop(
        "bf", "m_bits", "k", *[f"__bp{i}" for i in range(k)]
    )


def bloom_semi_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    m_bits: int = 1 << 20,
    k: int = 5,
) -> DataFrame:
    """EXACT semi-join of ``big`` against ``small`` on ``key`` with a
    Bloom runtime pre-filter: ``big`` rows whose key cannot be in
    ``small`` are dropped by a broadcast bitmap BEFORE the exact
    ``left_semi`` join, so the join's shuffle moves only (matches +
    FP·non-matches) rows instead of all of ``big``.

    Output == ``big.join(small.select(key).distinct(), key, "left_semi")``
    exactly, for ANY m_bits/k (no false negatives by construction) —
    which is what lets a plain SQL SEMI JOIN serve as a strict oracle.

    At 100 TB: ``small`` at 10^8 keys needs gigabytes as a broadcast
    set but ~15 MB as a 1%-FP Bloom map — broadcastable where the set
    is not; ``big``'s reduction applies BEFORE its Exchange, which is
    where the win lives.  The confirming semi-join is left to AQE
    (shuffle or broadcast by its own statistics — post-filter sizes,
    which the Bloom pass just shrank).
    """
    bf = bloom_build(small, key, m_bits=m_bits, k=k)
    filtered = bloom_prefilter(big, bf, key, m_bits=m_bits, k=k)
    return filtered.join(small.select(key).distinct(), key, "left_semi")
