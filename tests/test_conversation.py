"""Tests for conversational-dynamics statistics (textops/conversation.py)."""

import datetime as dt

import pytest

from mopper_spark.textops.conversation import (
    inactivity_episodes,
    time_allocation,
    turn_taking,
)

BASE = dt.datetime(2024, 1, 1)


def _tr(spark, rows):
    return spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, text string, ts timestamp"
    )


class TestTurnTaking:
    def test_alternation_and_runs(self, spark):
        rows = [
            ("c", 0, "user", "one two", BASE),
            ("c", 1, "assistant", "three", BASE),
            ("c", 2, "assistant", "four five six", BASE),
            ("c", 3, "user", "seven", BASE),
        ]
        (r,) = turn_taking(_tr(spark, rows)).collect()
        assert (r.n_turns, r.n_switches) == (4, 2)
        assert (r.n_same_role_runs, r.max_same_role_run) == (3, 2)
        # user tokens 3 of 7
        assert r.user_token_share_fp == (3 * 10**6) // 7

    def test_zero_token_conversation(self, spark):
        rows = [("c", 0, "user", "", BASE)]
        (r,) = turn_taking(_tr(spark, rows)).collect()
        assert (r.n_turns, r.user_token_share_fp) == (1, 0)

    def test_partitioning_invariance(self, spark):
        rows = [("c", i, "user" if (i * 7) % 3 else "assistant", f"t{i}", BASE)
                for i in range(40)]
        a = sorted(map(tuple, turn_taking(_tr(spark, rows)).collect()))
        b = sorted(
            map(tuple, turn_taking(_tr(spark, rows).repartition(9)).collect())
        )
        assert a == b


class TestTimeAllocation:
    def test_gaps_attributed_to_later_role(self, spark):
        rows = [
            ("c", 0, "user", "x", BASE),
            ("c", 1, "assistant", "x", BASE + dt.timedelta(seconds=5)),
            ("c", 2, "user", "x", BASE + dt.timedelta(seconds=8)),
        ]
        got = {r.role: (r.n_turns, r.attributed_us)
               for r in time_allocation(_tr(spark, rows)).collect()}
        assert got["assistant"] == (1, 5_000_000)
        assert got["user"] == (2, 3_000_000)  # first turn contributes 0

    def test_totals_reconcile_to_span(self, spark):
        rows = [("c", i, ["user", "assistant", "tool"][i % 3], "x",
                 BASE + dt.timedelta(seconds=i * i)) for i in range(10)]
        out = time_allocation(_tr(spark, rows)).collect()
        assert sum(r.attributed_us for r in out) == 81 * 1_000_000


class TestInactivityEpisodes:
    def test_strict_gap_boundary(self, spark):
        rows = [
            ("c", 0, "user", "x", BASE),
            ("c", 1, "user", "x", BASE + dt.timedelta(seconds=1800)),  # tie: same ep
            ("c", 2, "user", "x", BASE + dt.timedelta(seconds=3601)),  # > gap: new
        ]
        (r,) = inactivity_episodes(_tr(spark, rows)).collect()
        assert (r.n_episodes, r.max_episode_turns, r.singleton_episodes) == (2, 2, 1)
        assert r.max_episode_span_us == 1800 * 1_000_000

    def test_single_episode_and_validation(self, spark):
        rows = [("c", i, "user", "x", BASE + dt.timedelta(seconds=i))
                for i in range(5)]
        (r,) = inactivity_episodes(_tr(spark, rows)).collect()
        assert (r.n_episodes, r.max_episode_turns) == (1, 5)
        with pytest.raises(ValueError):
            inactivity_episodes(_tr(spark, rows), gap_seconds=0)


class TestConversationCatalog:
    def test_digest_and_counts(self, spark):
        from mopper_spark.textops.conversation import conversation_catalog
        import hashlib

        rows = [
            ("c", 1, "assistant", "world", None, BASE),
            ("c", 0, "user", "hello", "search", BASE),
        ]
        tr = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        (r,) = conversation_catalog(tr).collect()
        assert (r.n_turns, r.n_user, r.n_assistant, r.n_tool_turns) == (2, 1, 1, 1)
        assert r.n_chars == len("hello") + len("world")
        assert r.digest == hashlib.md5("hello\x1eworld".encode()).hexdigest()

    def test_digest_order_independent_of_partitioning(self, spark):
        from mopper_spark.textops.conversation import conversation_catalog

        rows = [("c", i, "user", f"t{i}", None, BASE) for i in range(40)]
        tr = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        a = conversation_catalog(tr).collect()[0].digest
        b = conversation_catalog(tr.repartition(11)).collect()[0].digest
        assert a == b


class TestToolLatency:
    def test_attribution_per_tool(self, spark):
        from mopper_spark.textops.conversation import tool_latency

        rows = [
            ("c", 0, "user", "x", None, BASE),
            ("c", 1, "assistant", "x", "search", BASE + dt.timedelta(seconds=4)),
            ("c", 2, "assistant", "x", "read", BASE + dt.timedelta(seconds=9)),
            ("d", 0, "assistant", "x", "search", BASE),  # first turn: gap 0
        ]
        tr = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string,"
            " tool string, ts timestamp",
        )
        got = {r.tool: (r.n_calls, r.total_us, r.min_us, r.max_us)
               for r in tool_latency(tr).collect()}
        assert got["search"] == (2, 4_000_000, 0, 4_000_000)
        assert got["read"] == (1, 5_000_000, 5_000_000, 5_000_000)
