"""Distributed BPE tokenizer: training and encoding, all-native.

Byte-pair encoding (Sennrich et al., ACL 2016 — the subword scheme behind
GPT-2/RoBERTa vocabularies) over the corpus, Spark-first:

- ``word_counts``: the one corpus-wide shuffle — whitespace words with
  frequencies.  Everything after runs on the DISTINCT-WORD table, which is
  vocabulary-sized (Heaps' law: ~n^0.5 of the corpus), not corpus-sized —
  the same reason every real BPE trainer aggregates first.
- ``bpe_train``: iterative highest-frequency-pair merging.  The whole
  trick is the SYMBOL ENCODING: a word's current segmentation is kept as a
  sentinel-wrapped string (``\\x1eh\\x1e \\x1ee\\x1e …``), so

  * pair counting is native ``split`` + ``zip_with`` + ``explode`` +
    one map-side-combined ``groupBy`` per round, and
  * applying a merge is ONE native ``replace`` — Java/DuckDB ``replace``
    scans left-to-right over non-overlapping matches, which is exactly
    BPE's within-word merge order (``[a,a,a]`` + merge ``(a,a)`` →
    ``[aa, a]``), and the sentinels make a symbol match exact (``a``
    never matches inside ``ab``).

  No UDF anywhere; one 1-row ``collect`` per merge (the argmax pair IS
  the algorithm's sequential dependency — same pattern as the k-means
  convergence probe).  Ties break deterministically: highest count, then
  lexicographically smallest pair, so the merge list is reproducible
  under any partitioning.
- ``bpe_encode``: apply a trained merge list to text as CHAINED native
  replaces over the same sentinel encoding — embarrassingly parallel,
  merges ride in the plan as literals (broadcast-free; a 50k-merge GPT-2
  vocabulary would instead ship as one broadcast join against a
  words→tokenization dictionary built by ``bpe_train``'s final state —
  encode distinct words once, join back).

Scale shape at 100 TB: the word count is the only corpus shuffle;
training rounds touch the capped distinct-word table (``max_words``
keeps it bounded — standard practice, SentencePiece's
``input_sentence_size`` analog, with the cap's effect documented at the
call site); encoding is a narrow per-row pass.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# sentinel wrapping each symbol; U+001E (record separator) cannot appear
# in whitespace-split words that came out of readable text, and we refuse
# loudly below if it somehow does
SEP = "\x1e"


def word_counts(
    docs: DataFrame, text_col: str = "text", max_words: int | None = None
) -> DataFrame:
    """Whitespace word frequencies — the one corpus-wide shuffle.

    ``max_words`` keeps the distinct-word table bounded for training
    (top-N by count, ties broken by word for determinism); the dropped
    tail's pairs are invisible to training — the standard trainer cap,
    NOT an approximation of the kept words' counts."""
    words = (
        docs.select(F.explode(F.split(F.col(text_col), r"\s+")).alias("word"))
        .filter((F.col("word") != "") & ~F.col("word").contains(SEP))
        .groupBy("word")
        .agg(F.count("*").alias("n"))
    )
    if max_words is not None:
        # deterministic top-N: orderBy + limit plans TakeOrderedAndProject
        words = words.orderBy(F.desc("n"), F.asc("word")).limit(max_words)
    return words


def _symbolized(words: DataFrame) -> DataFrame:
    """Initial segmentation: every character its own sentinel-wrapped
    symbol, space-joined — '\\x1eh\\x1e \\x1ee\\x1e …'."""
    return words.withColumn(
        "sym",
        F.array_join(
            F.transform(
                F.split(F.col("word"), ""),
                lambda c: F.concat(F.lit(SEP), c, F.lit(SEP)),
            ),
            " ",
        ),
    )


def _pair_counts(sym_words: DataFrame) -> DataFrame:
    """Adjacent-pair frequencies over the current segmentation, weighted
    by word count: split → zip_with(shifted) → explode → one groupBy with
    a map-side partial."""
    syms = F.split(F.col("sym"), " ")
    pairs = F.when(
        F.size(syms) >= 2,
        F.zip_with(
            F.slice(syms, 1, F.size(syms) - 1),
            F.slice(syms, 2, F.size(syms) - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        sym_words.select(F.explode(pairs).alias("pair"), "n")
        .groupBy("pair")
        .agg(F.sum("n").alias("freq"))
    )


def bpe_train(
    words: DataFrame, n_merges: int
) -> tuple[list[tuple[str, str, int]], DataFrame]:
    """Learn ``n_merges`` BPE merges from a ``(word, n)`` frequency table.

    Returns ``(merges, final_words)``: merges as
    ``[(left_symbol, right_symbol, pair_frequency), …]`` in merge order
    (symbols WITHOUT sentinels), and the final segmented word table
    ``(word, n, sym)`` — the dictionary a scale encoder broadcast-joins.

    Each round: one pair-count aggregation over the distinct-word table,
    one 1-row collect (the argmax — deterministic: max freq, then
    lexicographically smallest pair), one native ``replace``.  A
    ``localCheckpoint`` per round cuts the replace-chain lineage the same
    way the iterative graph operators do.  Stops early when no pair is
    left (all words fully merged)."""
    if n_merges < 1:
        raise ValueError(f"n_merges must be >= 1, got {n_merges}")
    cur = _symbolized(words).select("word", "n", "sym").localCheckpoint(eager=True)
    merges: list[tuple[str, str, int]] = []
    for _ in range(n_merges):
        top = (
            _pair_counts(cur)
            .select(F.min(F.struct(-F.col("freq"), F.col("pair"))).alias("m"))
            .collect()[0]["m"]
        )
        if top is None:
            break
        pair, freq = top["pair"], -top["col1"]
        left, right = [p.strip(SEP) for p in pair.split(" ")]
        merged = f"{SEP}{left}{right}{SEP}"
        merges.append((left, right, int(freq)))
        cur = cur.withColumn(
            "sym", F.replace(F.col("sym"), F.lit(pair), F.lit(merged))
        ).localCheckpoint(eager=True)
    return merges, cur


def bpe_segment_words(words: DataFrame, merges: list[tuple]) -> DataFrame:
    """Apply a trained merge list to a ``(word, …)`` table: chained native
    replaces over the sentinel encoding, then strip sentinels — adds
    ``tokens array<string>`` and ``n_tokens``.  The merges ride in the
    plan as literals; at GPT-2 vocabulary size use ``bpe_train``'s final
    word table as a broadcast dictionary instead of a 50k-deep expression
    tree."""
    out = _symbolized(words)
    for m in merges:
        left, right = m[0], m[1]
        out = out.withColumn(
            "sym",
            F.replace(
                F.col("sym"),
                F.lit(f"{SEP}{left}{SEP} {SEP}{right}{SEP}"),
                F.lit(f"{SEP}{left}{right}{SEP}"),
            ),
        )
    return out.select(
        *words.columns,
        F.transform(
            F.split(F.col("sym"), " "), lambda s: F.translate(s, SEP, "")
        ).alias("tokens"),
        F.size(F.split(F.col("sym"), " ")).alias("n_tokens"),
    )


def bpe_encode(
    docs: DataFrame,
    merges: list[tuple],
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Tokenize documents under a trained merge list: per-word BPE with
    the word's tokens then concatenated in order — ``(id, tokens,
    n_tokens)``.

    Plan: explode words with position, segment each via the chained
    replaces (narrow), re-assemble with one groupBy over the doc id using
    order-proofed ``array_sort(collect_list(struct(pos, …)))`` — the same
    idiom the chat renderer uses, so the result is partitioning-proof."""
    pos_words = docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(F.split(F.col(text_col), r"\s+")).alias("pos", "word"),
    ).filter((F.col("word") != "") & ~F.col("word").contains(SEP))
    seg = bpe_segment_words(pos_words, merges)
    return (
        seg.groupBy("_id")
        .agg(
            F.array_sort(
                F.collect_list(F.struct(F.col("pos"), F.col("tokens")))
            ).alias("ordered"),
        )
        .select(
            F.col("_id").alias(id_col),
            F.flatten(F.col("ordered.tokens")).alias("tokens"),
            F.size(F.flatten(F.col("ordered.tokens"))).alias("n_tokens"),
        )
    )


def unigram_viterbi(
    words: DataFrame,
    vocab: list[tuple[str, int]],
    *,
    max_word_len: int = 16,
) -> DataFrame:
    """Unigram-LM segmentation scoring (Kudo, ACL 2018 — the
    SentencePiece unigram model's Viterbi decode): for each distinct
    word, the MINIMUM total cost of covering it with vocabulary pieces,
    where ``vocab`` is ``[(piece, cost_fp)]`` with integer fixed-point
    costs (−log p scaled; any positive ints work).  Returns ``(word,
    n_chars, cost_fp, n_tokens)`` — the best segmentation's exact cost
    and, among equal-cost paths, the FEWEST-pieces count (deterministic
    composite minimum, no float anywhere).

    The lattice DP runs LEVEL-SYNCHRONOUSLY over character positions:
    every transition consumes ≥ 1 char, so position p is SETTLED once
    rounds 0..p−1 have relaxed — each of ``max_word_len`` rounds is one
    substring-match join (vocab rides broadcast as a literal relation)
    plus one associative ``min(struct(cost, n_tokens))`` merge; no
    per-word recursion, no UDF.  This is Dijkstra degenerated to a DAG
    leveled by position — the same frontier shape as
    ``graph.bfs_distances``, with cost instead of hop count.

    Contracts: every single character of every word must be coverable
    (callers include a full character fallback in ``vocab`` — the
    standard unigram-LM byte/char fallback); words that end UNREACHABLE
    anyway (an uncovered character) are simply absent from the output.
    Words longer than ``max_word_len`` are EXCLUDED up front (named
    cap: the DP is rounds = max length; segment long words after a
    pre-split, or raise the cap).  Pieces must be non-empty with
    positive costs.

    Scale: run on the DISTINCT-word table (vocabulary-sized, Heaps'
    law), never raw tokens — same discipline as ``bpe_train``; join
    results back to the corpus by word.
    """
    if not vocab:
        raise ValueError("unigram_viterbi: empty vocab")
    for p, c in vocab:
        if not p or c <= 0:
            raise ValueError(
                "unigram_viterbi: pieces must be non-empty with positive costs"
            )
    spark = words.sparkSession
    (word_col,) = words.columns
    w = (
        words.select(F.col(word_col).alias("word"))
        .filter(
            (F.length("word") >= 1) & (F.length("word") <= max_word_len)
        )
        .distinct()
        .localCheckpoint(eager=False)
    )
    v = spark.createDataFrame(
        [(p, len(p), int(c)) for p, c in vocab],
        "piece string, plen int, pcost long",
    )
    # acc: best (cost, ntok) per (word, pos); pos = chars consumed.
    acc = w.select(
        "word",
        F.lit(0).cast("long").alias("pos"),
        F.lit(0).cast("long").alias("cost"),
        F.lit(0).cast("long").alias("ntok"),
    ).localCheckpoint(eager=False)
    for p in range(max_word_len):
        frontier = acc.filter(F.col("pos") == p)
        if frontier.isEmpty():
            break
        relaxed = frontier.join(
            F.broadcast(v),
            F.expr("substring(word, pos + 1, plen) = piece"),
        ).select(
            "word",
            (F.col("pos") + F.col("plen")).cast("long").alias("pos"),
            (F.col("cost") + F.col("pcost")).cast("long").alias("cost"),
            (F.col("ntok") + 1).cast("long").alias("ntok"),
        )
        acc = (
            acc.unionByName(relaxed)
            .groupBy("word", "pos")
            .agg(F.min(F.struct("cost", "ntok")).alias("b"))
            .select("word", "pos", F.col("b.cost").alias("cost"), F.col("b.ntok").alias("ntok"))
            .localCheckpoint(eager=True)
        )
    return acc.filter(F.col("pos") == F.length("word")).select(
        "word",
        F.length("word").cast("long").alias("n_chars"),
        F.col("cost").alias("cost_fp"),
        F.col("ntok").alias("n_tokens"),
    )
