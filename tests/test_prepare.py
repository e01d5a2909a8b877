"""Tests for training-example preparation (textops/prepare.py)."""

import pytest
from pyspark.sql import functions as F

from mopper_spark.textops.prepare import (
    budget_sample,
    dedup_paragraphs,
    render_conversations,
    scrub_pii,
)


class TestRenderConversations:
    def test_stable_order_and_format(self, spark):
        rows = [
            ("c1", 2, "assistant", "hi there"),
            ("c1", 1, "user", "hello"),
            ("c2", 1, "user", "solo"),
        ]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {r.conv_id: (r.n_turns, r.text)
               for r in render_conversations(tr).collect()}
        assert got["c1"] == (2, "<|user|>hello\n<|assistant|>hi there")
        assert got["c2"] == (1, "<|user|>solo")

    def test_partitioning_invariance(self, spark):
        rows = [("c", i, "user", f"t{i}") for i in range(50)]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        a = render_conversations(tr).collect()[0].text
        b = render_conversations(tr.repartition(13)).collect()[0].text
        assert a == b == "\n".join(f"<|user|>t{i}" for i in range(50))


class TestScrubPii:
    def test_all_classes(self, spark):
        df = spark.createDataFrame(
            [("mail a.b+c@ex-a.co.uk ip 10.0.0.1 tel +1 (555) 010-9999 end",)],
            "text string",
        )
        (row,) = df.select(scrub_pii(F.col("text")).alias("t")).collect()
        assert row.t == "mail |||EMAIL||| ip |||IP||| tel |||PHONE||| end"

    def test_clean_text_untouched(self, spark):
        df = spark.createDataFrame([("nothing sensitive here 42",)], "text string")
        (row,) = df.select(scrub_pii(F.col("text")).alias("t")).collect()
        assert row.t == "nothing sensitive here 42"


class TestDedupParagraphs:
    def test_first_occurrence_kept_order_preserved(self, spark):
        docs = spark.createDataFrame(
            [(1, "alpha\nboiler\nbeta"), (2, "boiler\ngamma"), (3, "boiler")],
            "doc_id long, text string",
        )
        got = {r.doc_id: (r.text, r.n_kept, r.n_dropped)
               for r in dedup_paragraphs(docs).collect()}
        assert got[1] == ("alpha\nboiler\nbeta", 3, 0)
        assert got[2] == ("gamma", 1, 1)
        assert got[3] == ("", 0, 1)

    def test_within_doc_repeat_dropped(self, spark):
        docs = spark.createDataFrame([(1, "x\ny\nx")], "doc_id long, text string")
        (row,) = dedup_paragraphs(docs).collect()
        assert (row.text, row.n_kept, row.n_dropped) == ("x\ny", 2, 1)


class TestBudgetSample:
    @pytest.fixture(scope="class")
    def docs(self, spark):
        rows = [(i, "tok " * (i % 7 + 1), f"s{i % 2}") for i in range(40)]
        return spark.createDataFrame(rows, "doc_id long, text string, source string")

    def test_budget_respected_boundary_doc_included(self, docs):
        out = budget_sample(docs, {"s0": 20, "s1": 10 ** 9}).collect()
        by_src = {}
        for r in out:
            by_src.setdefault(r.source, []).append(r)
        # every admitted doc STARTED under budget; totals may overshoot by
        # at most the boundary doc
        assert all(r.cum_tokens < 20 for r in by_src["s0"])
        assert len(by_src["s1"]) == 20  # unlimited budget admits the group

    def test_unlisted_sources_excluded(self, docs):
        out = budget_sample(docs, {"s0": 5})
        assert out.filter(F.col("source") != "s0").count() == 0

    def test_deterministic_under_repartition_and_seed(self, docs):
        a = sorted(r.doc_id for r in budget_sample(docs, {"s0": 30}).collect())
        b = sorted(
            r.doc_id
            for r in budget_sample(docs.repartition(7), {"s0": 30}).collect()
        )
        assert a == b
        c = sorted(
            r.doc_id for r in budget_sample(docs, {"s0": 30}, seed="other").collect()
        )
        assert a != c  # a different seed draws a different mixture


class TestSegmentConversations:
    def test_boundaries_at_topic_shift(self, spark):
        from mopper_spark.textops.prepare import segment_conversations

        rows = [
            ("c", 1, "u", "alpha beta gamma"),
            ("c", 2, "a", "beta gamma delta"),      # high overlap: same seg
            ("c", 3, "u", "totally different words"),  # shift: new seg
            ("c", 4, "a", "different words again"),    # overlap: same seg
        ]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {r.turn_idx: r.seg_id for r in segment_conversations(tr).collect()}
        assert got == {1: 0, 2: 0, 3: 1, 4: 1}

    def test_first_turn_opens_segment_zero_per_conv(self, spark):
        from mopper_spark.textops.prepare import segment_conversations

        rows = [("c1", 1, "u", "x"), ("c2", 1, "u", "y"), ("c2", 2, "u", "z")]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = {(r.conv_id, r.turn_idx): r.seg_id
               for r in segment_conversations(tr).collect()}
        assert got[("c1", 1)] == 0 and got[("c2", 1)] == 0
        assert got[("c2", 2)] == 1  # zero overlap between x-less tokens

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.prepare import segment_conversations

        rows = [("c", i, "u", f"tok{i} tok{i+1} shared") for i in range(30)]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        a = sorted(map(tuple, segment_conversations(tr).collect()))
        b = sorted(map(tuple, segment_conversations(tr.repartition(7)).collect()))
        assert a == b


def test_budget_sample_empty_budgets_raises(spark):
    docs = spark.createDataFrame(
        [(1, "a", "s0")], "doc_id long, text string, source string"
    )
    with pytest.raises(ValueError, match="empty budgets"):
        budget_sample(docs, {})


class TestSftPairs:
    def test_nearest_preceding_user_skips_tools(self, spark):
        from mopper_spark.textops.prepare import sft_pairs

        rows = [
            ("c1", 0, "user", "q1", None),
            ("c1", 1, "tool", "t", "search"),
            ("c1", 2, "assistant", "a1", None),
            ("c1", 3, "user", "q2", None),
            ("c1", 4, "assistant", "a2", None),
            ("c1", 5, "assistant", "a3", None),  # still paired with q2
            ("c2", 0, "assistant", "orphan", None),  # no preceding user
            ("c2", 1, "user", "q3", None),
            ("c2", 2, "assistant", "a4", None),
        ]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string"
        )
        got = sorted(
            (r.conv_id, r.turn_idx, r.prompt, r.response)
            for r in sft_pairs(tr).collect()
        )
        assert got == [
            ("c1", 2, "q1", "a1"),
            ("c1", 4, "q2", "a2"),
            ("c1", 5, "q2", "a3"),
            ("c2", 2, "q3", "a4"),
        ]

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.prepare import sft_pairs

        tr = spark.read.parquet("fixtures/transcripts_2000.parquet")
        a = sorted(map(tuple, sft_pairs(tr).collect()))
        b = sorted(map(tuple, sft_pairs(tr.repartition(17)).collect()))
        assert a == b and len(a) > 100


def test_response_latency_adjacent_pairs_only(spark):
    """Only assistant turns IMMEDIATELY after a user turn count; an
    intervening tool turn excludes the pair."""
    from datetime import datetime, timezone

    from mopper_spark.textops.prepare import response_latency

    def ts(s):
        return datetime.fromtimestamp(s, tz=timezone.utc)

    rows = [
        ("c", 0, "user", ts(0)),
        ("c", 1, "assistant", ts(4)),     # counted: 4s
        ("c", 2, "user", ts(10)),
        ("c", 3, "tool", ts(12)),
        ("c", 4, "assistant", ts(20)),    # NOT counted (tool intervenes)
        ("c", 5, "user", ts(30)),
        ("c", 6, "assistant", ts(31)),    # counted: 1s
        ("d", 0, "assistant", ts(0)),     # no preceding user at all
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, ts timestamp"
    )
    got = {tuple(r) for r in response_latency(df).collect()}
    assert got == {("c", 2, 5_000_000, 1_000_000, 4_000_000)}


def test_tool_transitions_markov_counts(spark):
    """Transitions follow per-conversation tool order (non-tool turns
    skipped), first call comes from _START_, and p = n_trans/n_from."""
    from mopper_spark.textops.prepare import tool_transitions

    rows = [
        # conv c: search -> python -> python
        ("c", 0, "user", None),
        ("c", 1, "tool", "search"),
        ("c", 2, "assistant", None),
        ("c", 3, "tool", "python"),
        ("c", 4, "tool", "python"),
        # conv d: search -> browser
        ("d", 0, "tool", "search"),
        ("d", 1, "tool", "browser"),
    ]
    df = spark.createDataFrame(
        rows, "conv_id string, turn_idx int, role string, tool string"
    )
    got = {
        (r.prev_tool, r.next_tool): (r.n_trans, r.n_from, r.p)
        for r in tool_transitions(df).collect()
    }
    assert got == {
        ("_START_", "search"): (2, 2, 1.0),
        ("search", "python"): (1, 2, 0.5),
        ("search", "browser"): (1, 2, 0.5),
        ("python", "python"): (1, 1, 1.0),
    }


def test_tool_transitions_partitioning_invariant(spark):
    from mopper_spark.textops.prepare import tool_transitions

    tr = spark.read.parquet("fixtures/transcripts_2000.parquet")
    a = sorted(map(tuple, tool_transitions(tr).collect()))
    b = sorted(map(tuple, tool_transitions(tr.repartition(13)).collect()))
    assert a == b and len(a) >= 4


class TestKAnonymityAudit:
    def test_classes_flags_and_null_qi(self, spark):
        from mopper_spark.textops.prepare import k_anonymity_audit

        rows = (
            # class ("a", None): 5 rows, 2 convs → k-anon AND l-diverse
            [("a", None, "c1")] * 3 + [("a", None, "c2")] * 2
            # class ("a", "t"): 2 rows, 1 conv → neither
            + [("a", "t", "c3")] * 2
            # class ("b", "t"): 6 rows, 1 conv → k-anon, NOT l-diverse
            + [("b", "t", "c4")] * 6
        )
        df = spark.createDataFrame(rows, "role string, tool string, conv string")
        got = {
            (r.role, r.tool): (r.n_rows, r.n_sensitive, r.k_anonymous, r.l_diverse)
            for r in k_anonymity_audit(df, ["role", "tool"], "conv", k=5).collect()
        }
        assert got == {
            ("a", None): (5, 2, 1, 1),
            ("a", "t"): (2, 1, 0, 0),
            ("b", "t"): (6, 1, 1, 0),
        }

    def test_validation(self, spark):
        import pytest

        from mopper_spark.textops.prepare import k_anonymity_audit

        df = spark.createDataFrame([("a", "c")], "role string, conv string")
        with pytest.raises(ValueError):
            k_anonymity_audit(df, [], "conv")
        with pytest.raises(ValueError):
            k_anonymity_audit(df, ["role"], "conv", k=0)


class TestRenderLossSpans:
    def _tr(self, spark):
        rows = [
            ("c1", 0, "user", "hi"),
            ("c1", 1, "assistant", "hello there"),
            ("c1", 2, "user", "bye"),
            ("c1", 3, "assistant", "ok"),
            ("c2", 0, "assistant", "solo"),
        ]
        return spark.createDataFrame(rows, "conv_id string, turn_idx int, role string, text string")

    def test_spans_index_into_rendered_text(self, spark):
        from mopper_spark.textops.prepare import render_conversations, render_loss_spans

        tr = self._tr(spark)
        docs = {r.conv_id: r.text for r in render_conversations(tr).collect()}
        spans = render_loss_spans(tr).collect()
        assert len(spans) == 3
        texts = {(r.conv_id, r.turn_idx): r.text for r in tr.collect()}
        for s in spans:
            assert docs[s.conv_id][s.start_off:s.end_off] == texts[(s.conv_id, s.turn_idx)]
        # header excluded: the char before start_off closes the role tag
        for s in spans:
            assert docs[s.conv_id][s.start_off - 2:s.start_off] == "|>"

    def test_custom_role_and_partition_invariance(self, spark):
        from mopper_spark.textops.prepare import render_loss_spans

        tr = self._tr(spark)
        got = sorted(map(tuple, render_loss_spans(tr, loss_role="user").collect()))
        got7 = sorted(map(tuple, render_loss_spans(tr.repartition(7), loss_role="user").collect()))
        assert got == got7
        assert [g[:2] for g in got] == [("c1", 0), ("c1", 2)]


class TestToolEntropy:
    def test_matches_python_replica(self, spark):
        import math
        from mopper_spark.textops.prepare import tool_entropy

        rows = [
            ("c1", 0, "u", "x", "search"), ("c1", 1, "u", "x", "code"),
            ("c1", 2, "u", "x", "search"), ("c1", 3, "u", "x", "code"),
            ("c2", 0, "u", "x", "search"), ("c2", 1, "u", "x", "code"),
            ("c2", 2, "u", "x", "browse"),
        ]
        df = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string, tool string"
        )
        got = {
            r.prev_tool: (r.n_from, r.branching, r.h_num_fp)
            for r in tool_entropy(df).collect()
        }
        lnf = lambda n: math.floor(math.log(n) * 1e6)
        # search -> code(2+1=...): transitions: c1: S->c, c->s, s->c; plus start
        import collections
        trans = collections.Counter()
        for conv in ("c1", "c2"):
            seq = [t for c, _, _, _, t in rows if c == conv]
            prev = "_START_"
            for t in seq:
                trans[(prev, t)] += 1
                prev = t
        want = {}
        for p in {p for p, _ in trans}:
            ns = [n for (pp, _), n in trans.items() if pp == p]
            nf = sum(ns)
            want[p] = (nf, len(ns), nf * lnf(nf) - sum(n * lnf(n) for n in ns))
        assert got == want
        # deterministic tool (only one successor) has zero entropy
        zero = [p for p, (nf, br, h) in got.items() if br == 1]
        for p in zero:
            assert got[p][2] == 0


class TestDropCommonParagraphs:
    def test_drops_above_threshold_everywhere(self, spark):
        from mopper_spark.textops.prepare import drop_common_paragraphs

        foot = "(c) footer"
        docs = [
            (0, f"alpha\n{foot}"),
            (1, f"beta\n{foot}"),
            (2, f"gamma\n{foot}"),
            (3, "delta\nunique line"),
        ]
        df = spark.createDataFrame(docs, "doc_id long, text string")
        got = {
            r.doc_id: (r.text, r.n_kept, r.n_dropped)
            for r in drop_common_paragraphs(df, 4, max_df_frac=0.5).collect()
        }
        # footer df=3 > floor(0.5*4)=2 -> dropped everywhere, incl. first
        assert got[0] == ("alpha", 1, 1)
        assert got[1] == ("beta", 1, 1)
        assert got[2] == ("gamma", 1, 1)
        assert got[3] == ("delta\nunique line", 2, 0)
        import pytest as _pt
        with _pt.raises(ValueError, match="max_df_frac"):
            drop_common_paragraphs(df, 4, max_df_frac=0.0)


class TestDpoPairs:
    def test_chosen_longer_rejected_shorter(self, spark):
        from mopper_spark.textops.prepare import dpo_pairs

        rows = [
            ("c1", 1, "user", "how do trees work"),
            ("c1", 2, "assistant", "short answer"),
            ("c2", 1, "user", "how do trees work"),
            ("c2", 2, "assistant", "a much longer and better answer here"),
            ("c3", 1, "user", "solo prompt"),
            ("c3", 2, "assistant", "only candidate"),
        ]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        got = dpo_pairs(tr).collect()
        assert len(got) == 1  # solo prompt has < 2 candidates
        (r,) = got
        assert r.prompt == "how do trees work"
        assert r.chosen == "a much longer and better answer here"
        assert r.rejected == "short answer"
        assert (r.chosen_len, r.rejected_len, r.n_candidates) == (7, 2, 2)

    def test_tie_breaks_lexicographic_and_dupes_collapse(self, spark):
        from mopper_spark.textops.prepare import dpo_pairs

        rows = [
            ("a", 1, "user", "p"),
            ("a", 2, "assistant", "bb cc"),
            ("b", 1, "user", "p"),
            ("b", 2, "assistant", "aa cc"),
            ("c", 1, "user", "p"),
            ("c", 2, "assistant", "aa cc"),  # exact dup of b's reply
        ]
        tr = spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )
        (r,) = dpo_pairs(tr).collect()
        # equal token length: lexicographically larger wins chosen
        assert (r.chosen, r.rejected, r.n_candidates) == ("bb cc", "aa cc", 2)

    def test_min_candidates_validation(self, spark):
        from mopper_spark.textops.prepare import dpo_pairs

        with pytest.raises(ValueError):
            dpo_pairs(spark.range(1), min_candidates=1)


class TestPrefixDuplicates:
    def _tr(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )

    def test_strict_prefix_flagged(self, spark):
        from mopper_spark.textops.prepare import prefix_duplicates

        rows = [
            ("long", 1, "user", "hi"),
            ("long", 2, "assistant", "hello"),
            ("long", 3, "user", "more"),
            ("short", 1, "user", "hi"),
            ("short", 2, "assistant", "hello"),
            ("other", 1, "user", "different"),
        ]
        got = prefix_duplicates(self._tr(spark, rows)).collect()
        assert len(got) == 1
        (r,) = got
        assert (r.conv_id, r.n_turns, r.host_conv, r.host_turns) == (
            "short", 2, "long", 3
        )

    def test_exact_dup_keeps_least_conv_id(self, spark):
        from mopper_spark.textops.prepare import prefix_duplicates

        rows = [
            ("b", 1, "user", "same"),
            ("a", 1, "user", "same"),
        ]
        got = prefix_duplicates(self._tr(spark, rows)).collect()
        assert [(r.conv_id, r.host_conv) for r in got] == [("b", "a")]

    def test_longest_container_preferred(self, spark):
        from mopper_spark.textops.prepare import prefix_duplicates

        rows = [
            ("p", 1, "user", "x"),
            ("mid", 1, "user", "x"),
            ("mid", 2, "user", "y"),
            ("big", 1, "user", "x"),
            ("big", 2, "user", "y"),
            ("big", 3, "user", "z"),
        ]
        got = {r.conv_id: (r.host_conv, r.host_turns)
               for r in prefix_duplicates(self._tr(spark, rows)).collect()}
        assert got["p"] == ("big", 3)
        assert got["mid"] == ("big", 3)

    def test_cap_excludes_long_conversations(self, spark):
        from mopper_spark.textops.prepare import prefix_duplicates

        rows = [("dup", i, "user", f"t{i}") for i in range(1, 5)] + [
            ("host", i, "user", f"t{i}") for i in range(1, 6)
        ]
        # cap below the dup's length: nothing can be flagged
        assert prefix_duplicates(
            self._tr(spark, rows), max_prefix_turns=3
        ).count() == 0
        # cap at the dup's length: flagged against the longer host
        (r,) = prefix_duplicates(
            self._tr(spark, rows), max_prefix_turns=4
        ).collect()
        assert (r.conv_id, r.host_conv) == ("dup", "host")

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.prepare import prefix_duplicates

        rows = [("h", i, "user", f"w{i % 3}") for i in range(1, 20)] + [
            ("d", i, "user", f"w{i % 3}") for i in range(1, 9)
        ]
        a = sorted(map(tuple, prefix_duplicates(self._tr(spark, rows)).collect()))
        b = sorted(
            map(
                tuple,
                prefix_duplicates(self._tr(spark, rows).repartition(17)).collect(),
            )
        )
        assert a == b and len(a) == 1


class TestTruncateContext:
    def _tr(self, spark, rows):
        return spark.createDataFrame(
            rows, "conv_id string, turn_idx int, role string, text string"
        )

    def test_suffix_fits_budget(self, spark):
        from mopper_spark.textops.prepare import truncate_context

        rows = [
            ("c", 1, "user", "one two three"),      # 3 tokens
            ("c", 2, "assistant", "four five"),     # 2 tokens
            ("c", 3, "user", "six"),                # 1 token
        ]
        (r,) = truncate_context(self._tr(spark, rows), budget_tokens=3).collect()
        assert (r.n_turns, r.kept_turns, r.kept_tokens, r.first_kept_idx) == (
            3, 2, 3, 2
        )

    def test_keep_last_overrides_budget(self, spark):
        from mopper_spark.textops.prepare import truncate_context

        rows = [("c", 1, "user", "a b c d e")]
        (r,) = truncate_context(self._tr(spark, rows), budget_tokens=2).collect()
        assert (r.kept_turns, r.kept_tokens, r.first_kept_idx) == (1, 5, 1)
        (r2,) = truncate_context(
            self._tr(spark, rows), budget_tokens=2, keep_last=False
        ).collect()
        assert (r2.kept_turns, r2.kept_tokens, r2.first_kept_idx) == (0, 0, None)

    def test_whole_conversation_fits(self, spark):
        from mopper_spark.textops.prepare import truncate_context

        rows = [("c", i, "user", "tok") for i in range(1, 4)]
        (r,) = truncate_context(self._tr(spark, rows), budget_tokens=99).collect()
        assert (r.kept_turns, r.first_kept_idx) == (3, 1)


class TestToolLoops:
    def _tr(self, spark, tools, conv="c"):
        rows = [(conv, i, "assistant", f"t{i}", t)
                for i, t in enumerate(tools)]
        return spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string",
        )

    def test_period_one_loop(self, spark):
        from mopper_spark.textops.prepare import tool_loops

        tr = self._tr(spark, ["search", "search", "search", "search", "read"])
        got = {r.cycle_len: (r.n_cycles, r.run_start_idx)
               for r in tool_loops(tr).collect()}
        # 4 consecutive 'search': 3 lag-1 matches -> (3+1)/1 = 4 cycles at idx 0
        assert got[1] == (4, 0)

    def test_period_two_loop(self, spark):
        from mopper_spark.textops.prepare import tool_loops

        tr = self._tr(spark, ["a", "b", "a", "b", "a", "b", "x"])
        got = {r.cycle_len: (r.n_cycles, r.run_start_idx)
               for r in tool_loops(tr).collect()}
        # ababab: 4 lag-2 matches -> (4+2)/2 = 3 cycles starting at idx 0
        assert got[2] == (3, 0)
        assert 1 not in got  # no consecutive equal tools

    def test_below_min_cycles_silent(self, spark):
        from mopper_spark.textops.prepare import tool_loops

        tr = self._tr(spark, ["a", "b", "a", "b", "x"])  # only 2 cycles
        assert tool_loops(tr).count() == 0

    def test_null_tools_skipped_and_validation(self, spark):
        from mopper_spark.textops.prepare import tool_loops

        rows = [("c", 0, "u", "x", "a"), ("c", 1, "u", "x", None),
                ("c", 2, "u", "x", "a"), ("c", 3, "u", "x", "a")]
        tr = spark.createDataFrame(
            rows,
            "conv_id string, turn_idx int, role string, text string, tool string",
        )
        got = {r.cycle_len: r.n_cycles for r in tool_loops(tr).collect()}
        assert got[1] == 3  # nulls collapse out: a a a
        with pytest.raises(ValueError):
            tool_loops(tr, min_cycles=1)

    def test_partitioning_invariance(self, spark):
        from mopper_spark.textops.prepare import tool_loops

        tr = self._tr(spark, ["a", "b", "c"] * 5 + ["z"])
        a = sorted(map(tuple, tool_loops(tr).collect()))
        b = sorted(map(tuple, tool_loops(tr.repartition(7)).collect()))
        assert a == b
        assert any(row[1] == 3 and row[2] == 5 for row in a)  # abcabc... 5 cycles
