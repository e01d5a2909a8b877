"""Incremental entity linking (pipeline/incremental.py): end-state parity
with the batch pipeline, arrival-order insensitivity, cross-batch
component merging, and the versioned-state resume path via a real
Structured Streaming run."""

import os

import pytest
from pyspark.sql import functions as F

from mopper_spark.pipeline.canonicalize import canonical_map
from mopper_spark.pipeline.incremental import (
    empty_dictionary,
    incremental_link_stream,
    link_increment,
    process_increment,
    read_dictionary,
    with_canonical_iri,
)
from mopper_spark.pipeline.linking import link_mentions, normalize_surface

FIXTURE = os.path.join(os.path.dirname(__file__), "..", "fixtures",
                       "transcripts_2000.parquet")


def _mentions(spark):
    from mopper_spark.pipeline.extract import extract_mentions

    tr = spark.read.parquet(FIXTURE)
    return extract_mentions(tr)


def _batch_dict(spark, mentions):
    edges = link_mentions(mentions)
    forms = mentions.select(
        normalize_surface(F.col("surface")).alias("norm")
    ).distinct()
    return sorted(
        map(tuple, canonical_map(forms, edges).select("norm", "canonical_norm").collect())
    )


def _run_increments(spark, slices):
    d = empty_dictionary(spark)
    for s in slices:
        d = link_increment(d, s).localCheckpoint(eager=True)
    return sorted(map(tuple, d.collect()))


class TestIncrementParity:
    @pytest.fixture(scope="class")
    def mentions(self, spark):
        return _mentions(spark).localCheckpoint(eager=True)

    @pytest.fixture(scope="class")
    def batch(self, spark, mentions):
        return _batch_dict(spark, mentions)

    def test_three_slices_match_batch(self, spark, mentions, batch):
        slices = [
            mentions.filter(F.abs(F.xxhash64("conv_id")) % 3 == i)
            for i in range(3)
        ]
        assert _run_increments(spark, slices) == batch

    def test_arrival_order_insensitive(self, spark, mentions, batch):
        slices = [
            mentions.filter(F.abs(F.xxhash64("conv_id")) % 3 == i)
            for i in (2, 0, 1)
        ]
        assert _run_increments(spark, slices) == batch

    def test_single_increment_matches_batch(self, spark, mentions, batch):
        assert _run_increments(spark, [mentions]) == batch

    def test_duplicate_increment_is_noop(self, spark, mentions, batch):
        got = _run_increments(spark, [mentions, mentions.limit(50)])
        assert got == batch


class TestMergeSemantics:
    def test_bridge_merges_two_existing_components(self, spark):
        # batch 1: two separate components; batch 2: a form linking both
        m1 = spark.createDataFrame(
            [("Alan Turing",), ("A. Turing",), ("Grace Hopper",),
             ("G. Hopper",)],
            "surface string",
        )
        d1 = link_increment(empty_dictionary(spark), m1)
        canons = {r.canonical_norm for r in d1.collect()}
        assert canons == {"a turing", "g hopper"}
        # "alan m turing" token-subsets "alan turing" — but must NOT bridge
        # hopper; then a literal bridge merges nothing new
        m2 = spark.createDataFrame([("Alan M. Turing",)], "surface string")
        d2 = link_increment(d1, m2)
        got = {r.norm: r.canonical_norm for r in d2.collect()}
        assert got["alan m turing"] == "a turing"
        assert got["g hopper"] == "g hopper"

    def test_new_min_rewrites_existing_component(self, spark):
        d1 = link_increment(
            empty_dictionary(spark),
            spark.createDataFrame([("Venus Williams",)], "surface string"),
        )
        d2 = link_increment(
            d1, spark.createDataFrame([("V. Williams",)], "surface string")
        )
        got = {r.norm: r.canonical_norm for r in d2.collect()}
        # lexicographic min of the merged component
        assert got == {"venus williams": "v williams", "v williams": "v williams"}

    def test_iri_column_matches_batch_encoding(self, spark):
        d = link_increment(
            empty_dictionary(spark),
            spark.createDataFrame([("José Díaz",)], "surface string"),
        )
        (row,) = with_canonical_iri(d).collect()
        assert row.canonical_iri == "http://example.com/entity/jose%20diaz"


class TestStreamingWrapper:
    def test_file_stream_converges_and_resumes(self, spark, tmp_path):
        src = str(tmp_path / "src")
        state = str(tmp_path / "state")
        ckpt = str(tmp_path / "ckpt")
        m = _mentions(spark).select("surface").localCheckpoint(eager=True)
        batch_expected = _batch_dict(spark, _mentions(spark))
        # three files -> three micro-batches (maxFilesPerTrigger=1)
        for i in range(3):
            m.filter(F.abs(F.xxhash64("surface")) % 3 == i).write.mode(
                "overwrite"
            ).parquet(os.path.join(src, f"part{i}"))
        stream = (
            spark.readStream.schema("surface string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/part*")
        )
        q = incremental_link_stream(stream, state, ckpt)
        q.awaitTermination(300)
        got = sorted(
            map(tuple, read_dictionary(spark, state).collect())
        )
        assert got == batch_expected
        # resume with no new data: dictionary unchanged
        q2 = incremental_link_stream(
            spark.readStream.schema("surface string")
            .option("maxFilesPerTrigger", "1")
            .parquet(src + "/part*"),
            state,
            ckpt,
        )
        q2.awaitTermination(300)
        assert sorted(map(tuple, read_dictionary(spark, state).collect())) == batch_expected


class TestReplayWindow:
    def test_replay_after_pointer_advance_is_noop(self, spark, tmp_path):
        """ADVICE r3 (medium): kill AFTER _LATEST advanced to v{batch_id}
        but BEFORE the streaming checkpoint commit.  The replayed batch
        must not crash-loop on 'Cannot overwrite a path that is also
        being read from' — it short-circuits, leaving state intact."""
        state = str(tmp_path / "state")
        os.makedirs(state)
        b0 = spark.createDataFrame([("Ada Lovelace",), ("ada lovelace",)],
                                   "surface string")
        process_increment(b0, 0, state)
        before = sorted(map(tuple, read_dictionary(spark, state).collect()))
        assert before  # batch 0 committed and pointer advanced
        # simulate the crash window: same batch_id replayed with the
        # pointer already at v000000
        process_increment(b0, 0, state)
        after = sorted(map(tuple, read_dictionary(spark, state).collect()))
        assert after == before

    def test_replay_before_pointer_advance_recomputes(self, spark, tmp_path):
        """Kill BETWEEN the parquet write and the pointer rename: the
        pointer still names the prior version, so the replay recomputes
        v{batch_id} (overwriting the orphan) and lands the same state."""
        state = str(tmp_path / "state")
        os.makedirs(state)
        b0 = spark.createDataFrame([("Grace Hopper",)], "surface string")
        process_increment(b0, 0, state)
        b1 = spark.createDataFrame([("grace hopper",), ("G. Hopper",)],
                                   "surface string")
        process_increment(b1, 1, state)
        expected = sorted(map(tuple, read_dictionary(spark, state).collect()))
        # rewind the pointer to v000000 (as if the v000001 write finished
        # but the rename never happened), then replay batch 1
        with open(os.path.join(state, "_LATEST"), "w") as fh:
            fh.write("v000000")
        process_increment(b1, 1, state)
        got = sorted(map(tuple, read_dictionary(spark, state).collect()))
        assert got == expected
