"""Conversational-dynamics statistics over transcript tables: turn
taking, wall-clock attribution, and inactivity episodes — the
conversation-shape dashboard an agent platform reads next to the content
metrics (``prepare.tool_transitions``, ``prepare.response_latency``).

Inputs are the standard transcript shape ``(conv_id, turn_idx, role,
text, tool, ts)`` under the stable (conv_id, turn_idx) order — the same
contract as every transcript operator in this package.  All statistics
are exact integers (counts, epoch-µs sums, fixed-point shares via
integer `div`), so every query built on them is engine-reproducible
bit-for-bit.

Scale shape: each operator is one per-conversation window pass plus one
combine-able aggregation — per-conversation state only; the skewed
10k-turn conversation costs one partition-local sort, the documented
posture of the transcript layer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_EPOCH_US = (
    "timestampdiff(MICROSECOND, TIMESTAMP_NTZ '1970-01-01 00:00:00', ts)"
)


def turn_taking(
    transcripts: DataFrame,
    *,
    scale: int = 10**6,
) -> DataFrame:
    """Turn-taking profile per conversation: ``(conv_id, n_turns,
    n_switches, n_same_role_runs, max_same_role_run,
    user_token_share_fp)``.

    - ``n_switches``: adjacent turn pairs whose role differs — the
      alternation count; a healthy dialog alternates, a monologue or a
      tool storm does not.
    - ``n_same_role_runs`` / ``max_same_role_run``: maximal runs of
      consecutive same-role turns (every switch starts a new run, so
      ``n_same_role_runs = n_switches + 1`` for any non-empty
      conversation), with the longest run length — the "assistant
      talked 14 times in a row" signal.
    - ``user_token_share_fp``: whitespace tokens in ``user`` turns as a
      fixed-point fraction of the conversation's tokens (integer div;
      conversations with zero tokens report 0).

    One lag window + one aggregate.
    """
    from mopper_spark.textops.analysis import token_count

    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    marked = transcripts.select(
        "conv_id",
        "turn_idx",
        "role",
        token_count(F.col("text")).cast("long").alias("nt"),
    ).withColumn(
        "switch",
        (F.lag("role").over(w).isNotNull() & (F.lag("role").over(w) != F.col("role")))
        .cast("long"),
    )
    # run id = number of switches so far: cumulative sum of the switch flag
    runs = marked.withColumn(
        "run_id",
        F.sum("switch").over(
            Window.partitionBy("conv_id")
            .orderBy("turn_idx")
            .rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )
    run_lens = runs.groupBy("conv_id", "run_id").agg(
        F.count(F.lit(1)).alias("run_len")
    )
    per_run = run_lens.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_same_role_runs"),
        F.max("run_len").cast("long").alias("max_same_role_run"),
    )
    per_conv = marked.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("switch").cast("long").alias("n_switches"),
        F.sum(F.when(F.col("role") == "user", F.col("nt")).otherwise(0))
        .cast("long")
        .alias("_user_toks"),
        F.sum("nt").cast("long").alias("_toks"),
    )
    return per_conv.join(per_run, "conv_id").select(
        "conv_id",
        "n_turns",
        "n_switches",
        "n_same_role_runs",
        "max_same_role_run",
        F.when(F.col("_toks") > 0, F.expr(f"(_user_toks * {int(scale)}) div _toks"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("user_token_share_fp"),
    )


def time_allocation(transcripts: DataFrame) -> DataFrame:
    """Wall-clock attribution per conversation: each inter-turn gap is
    attributed to the LATER turn's role (the gap before an assistant
    turn is generation+tool time; before a user turn it is user think
    time) — ``(conv_id, role, n_turns, attributed_us)`` with exact
    epoch-µs integer sums.  The per-conversation totals reconcile to
    last_ts − first_ts by construction (every gap lands on exactly one
    role; the first turn gets 0), which makes this the decomposition a
    latency dashboard can stack.

    One lag window + one (conv, role) aggregate.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = transcripts.select(
        "conv_id", "turn_idx", "role", F.expr(_EPOCH_US).alias("at_us")
    ).withColumn(
        "gap_us",
        F.coalesce(F.col("at_us") - F.lag("at_us").over(w), F.lit(0)),
    )
    return gaps.groupBy("conv_id", "role").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum("gap_us").cast("long").alias("attributed_us"),
    )


def inactivity_episodes(
    transcripts: DataFrame,
    *,
    gap_seconds: int = 1800,
) -> DataFrame:
    """Split each conversation into EPISODES at inactivity gaps longer
    than ``gap_seconds`` (the web-analytics sessionization rule applied
    WITHIN a conversation — long-running agent sessions pause and
    resume, and per-episode statistics are what capacity planning
    needs).  Returns ``(conv_id, n_episodes, max_episode_turns,
    max_episode_span_us, singleton_episodes)`` — episode count, the
    largest episode by turn count, the longest episode wall-clock span,
    and how many episodes are single-turn.

    Boundary rule: a turn starts a new episode iff its gap from the
    previous turn EXCEEDS ``gap_seconds`` (strict >; ties stay in the
    episode) — pinned so the oracle and any replayer agree on the
    fencepost.

    One lag window (boundary flags), one cumulative sum (episode ids),
    two combine-able aggregates.
    """
    if gap_seconds < 1:
        raise ValueError("inactivity_episodes: gap_seconds must be >= 1")
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    cum = (
        Window.partitionBy("conv_id")
        .orderBy("turn_idx")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    gap_us = int(gap_seconds) * 1_000_000
    marked = (
        transcripts.select(
            "conv_id", "turn_idx", F.expr(_EPOCH_US).alias("at_us")
        )
        .withColumn(
            "new_ep",
            F.coalesce(
                (F.col("at_us") - F.lag("at_us").over(w) > gap_us).cast("long"),
                F.lit(1),
            ),
        )
        .withColumn("ep_id", F.sum("new_ep").over(cum))
    )
    eps = marked.groupBy("conv_id", "ep_id").agg(
        F.count(F.lit(1)).cast("long").alias("ep_turns"),
        (F.max("at_us") - F.min("at_us")).cast("long").alias("ep_span_us"),
    )
    return eps.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_episodes"),
        F.max("ep_turns").alias("max_episode_turns"),
        F.max("ep_span_us").alias("max_episode_span_us"),
        F.sum((F.col("ep_turns") == 1).cast("long"))
        .cast("long")
        .alias("singleton_episodes"),
    )


def conversation_catalog(
    transcripts: DataFrame,
    *,
    sep: str = "\x1e",
) -> DataFrame:
    """The conversation CATALOG table — one summary row per conversation
    that every other transcript operator can key against: ``(conv_id,
    n_turns, n_user, n_assistant, n_tool_turns, first_ts, last_ts,
    n_chars, digest)`` where ``digest`` is the md5 of the
    (turn_idx-ordered, separator-joined) turn texts — the per-turn-text-
    equality fingerprint (identical digest ⟺ identical ordered turn
    texts), the same fingerprint family ``prepare.prefix_duplicates``
    banks on, here at whole-conversation grain for catalog diffs and
    incremental-load change detection.

    One per-conversation aggregate with the order-proofed concat idiom
    (array_sort after collect_list) — no window at all.
    """
    return transcripts.groupBy("conv_id").agg(
        F.count(F.lit(1)).cast("long").alias("n_turns"),
        F.sum((F.col("role") == "user").cast("long"))
        .cast("long")
        .alias("n_user"),
        F.sum((F.col("role") == "assistant").cast("long"))
        .cast("long")
        .alias("n_assistant"),
        F.sum(F.col("tool").isNotNull().cast("long"))
        .cast("long")
        .alias("n_tool_turns"),
        F.min("ts").alias("first_ts"),
        F.max("ts").alias("last_ts"),
        F.sum(F.length("text")).cast("long").alias("n_chars"),
        F.md5(
            F.concat_ws(
                sep,
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("turn_idx", "text"))
                    ),
                    # concat_ws silently SKIPS null elements, so a NULL-text
                    # turn would digest identically to that turn being absent
                    # — coalesce to a sentinel no real text can contain (NUL
                    # is outside the transcript text contract) so distinct
                    # conversations never collide (ADVICE r4).
                    lambda s: F.coalesce(s["text"], F.lit("\x00NULL")),
                ),
            )
        ).alias("digest"),
    )


def tool_latency(transcripts: DataFrame) -> DataFrame:
    """Per-TOOL latency attribution: for every turn that carries a tool
    call, the wall-clock gap from the previous turn of its conversation
    is attributed to that tool — ``(tool, n_calls, total_us, min_us,
    max_us)`` with exact epoch-µs integers — the "which tool is slow"
    breakdown an agent platform reads next to ``time_allocation``'s
    per-role view.  First-turn tool calls (no predecessor) contribute a
    0 gap and still count as calls, so call counts reconcile with the
    catalog's ``n_tool_turns``.

    One lag window + one tool-cardinality aggregate.
    """
    w = Window.partitionBy("conv_id").orderBy("turn_idx")
    gaps = (
        transcripts.select(
            "conv_id", "turn_idx", "tool", F.expr(_EPOCH_US).alias("at_us")
        )
        .withColumn(
            "gap_us",
            F.coalesce(F.col("at_us") - F.lag("at_us").over(w), F.lit(0)),
        )
        .filter(F.col("tool").isNotNull())
    )
    return gaps.groupBy("tool").agg(
        F.count(F.lit(1)).cast("long").alias("n_calls"),
        F.sum("gap_us").cast("long").alias("total_us"),
        F.min("gap_us").cast("long").alias("min_us"),
        F.max("gap_us").cast("long").alias("max_us"),
    )
