"""KG-to-text verbalization (pipeline/verbalize.py)."""

import pytest

from mopper_spark.pipeline.verbalize import (
    iri_label,
    verbalize_subject_docs,
    verbalize_triples,
)

import pyspark.sql.functions as F


@pytest.fixture()
def kg(spark):
    rows = [
        ("http://ex/conv/c1", "http://ex/ont/about", "http://ex/entity/Venus%20Williams"),
        ("http://ex/conv/c1", "http://ex/ont/mentions", "roger federer"),
        ("http://ex/conv/c1", "http://ex/ont/mentions", "ada lovelace"),
        ("http://ex/conv/c2", "http://ex/ont/other", "x"),
    ]
    return spark.createDataFrame(rows, "subj string, pred string, obj string")


TPL = {
    "http://ex/ont/about": "Conversation {s} is mainly about {o}.",
    "http://ex/ont/mentions": "It mentions {o}.",
}


def test_iri_label_decodes(spark):
    df = spark.createDataFrame(
        [("http://ex/entity/Ren%C3%A9%20M%C3%BCller",), ("plain literal",)],
        "v string",
    )
    got = [r.l for r in df.select(iri_label(F.col("v")).alias("l")).collect()]
    assert got == ["René Müller", "plain literal"]


def test_sentences_and_default(spark, kg):
    got = {
        (r.subj, r.sentence) for r in verbalize_triples(kg, TPL).collect()
    }
    assert ("http://ex/conv/c1",
            "Conversation c1 is mainly about Venus Williams.") in got
    assert ("http://ex/conv/c1", "It mentions roger federer.") in got
    # untemplated pred falls back to the default pattern
    assert ("http://ex/conv/c2", "c2 other x.") in got


def test_default_none_drops_untemplated(spark, kg):
    got = verbalize_triples(kg, TPL, default=None)
    assert got.filter(F.col("subj").endswith("c2")).count() == 0
    assert got.count() == 3


def test_subject_docs_sorted_and_partition_invariant(spark, kg):
    a = {
        tuple(r)
        for r in verbalize_subject_docs(
            kg.repartition(1), TPL, default=None
        ).collect()
    }
    b = {
        tuple(r)
        for r in verbalize_subject_docs(
            kg.repartition(8), TPL, default=None
        ).collect()
    }
    want_text = (
        "Conversation c1 is mainly about Venus Williams. "
        "It mentions ada lovelace. It mentions roger federer."
    )
    assert a == b == {("http://ex/conv/c1", want_text, 3)}


def test_empty_template_refused(spark, kg):
    with pytest.raises(ValueError, match="empty verbalization"):
        verbalize_triples(kg, {"http://ex/ont/about": ""}).collect()


def test_literal_object_with_slash_not_truncated(spark):
    """okind-aware labels: a literal like '24/7 support' passes through
    verbatim; only iri objects are label-extracted (review fix)."""
    rows = [
        ("http://ex/t1", "http://ex/ont/note", "24/7 support", "lit"),
        ("http://ex/t1", "http://ex/ont/note", "http://ex/entity/Bob", "iri"),
    ]
    df = spark.createDataFrame(
        rows, "subj string, pred string, obj string, okind string"
    )
    got = {
        r.sentence
        for r in verbalize_triples(
            df, {"http://ex/ont/note": "Note: {o}"}
        ).collect()
    }
    assert got == {"Note: 24/7 support", "Note: Bob"}
