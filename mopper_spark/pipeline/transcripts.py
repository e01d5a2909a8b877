"""Deterministic synthetic transcript corpus (BASELINE.json ``input_hint``).

Schema: ``(conv_id string, turn_idx int, role string, text string,
tool string, ts timestamp)``.

Generation is **pure column arithmetic over ``spark.range``** — no Python
per row, no shuffle, no driver-side data — so the same generator scales
from the 1k-turn smoke tier to the 1M-turn bench tier (FIXTURES.md §1) and
beyond, deterministically for a given (n_turns, n_convs, seed).

Skew fixture: conversation ``conv_00000`` receives ``skew_frac`` of all
turns (one very long conversation), which is exactly the hot-key shape the
salted partitioning in the extract/materialize stages must defuse.

Texts embed entity mentions with controlled surface-form variation
("Venus Williams" / "V. Williams" / "venus williams", FIXTURES.md §4) and a
sprinkle of URI-reserved characters, unicode, braces and backslashes to
exercise percent-encoding, template escapes and the IRI INVALID path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

# Entity vocabulary with gold clusters: surface forms that must canonicalize
# together share a cluster id (used by linking tests).
ENTITY_FORMS: list[tuple[str, int]] = [
    ("Venus Williams", 0),
    ("V. Williams", 0),
    ("venus williams", 0),
    ("Venus  Williams", 0),
    ("Demi Moore", 1),
    ("D. Moore", 1),
    ("Roger Federer", 2),
    ("roger federer", 2),
    ("René Müller", 3),
    ("Rene Müller", 3),
    ("Ada Lovelace", 4),
    ("A. Lovelace", 4),
    ("Grace Hopper", 5),
    ("grace hopper", 5),
    ("Alan Turing", 6),
    ("Alan M. Turing", 6),
]

_FILLER = [
    "let me check the data for",
    "the pipeline failed while processing",
    "can you summarize what",
    "I ran the job and",
    "according to the logs,",
    "the result mentions",
    "we should ask",
    "deployment notes reference",
]

# odd fragments that stress encoding/validation (reserved chars, braces,
# backslash, unicode)
_NOISE = [
    "",
    " see docs?q=1#frag",
    " path/to/file",
    " 100% done",
    " [ticket-42]",
    " {curly} \\slash",
    " naïve café ☕",
    " a+b=c; d,e",
]

_TOOLS = ["search", "python", "browser", "calculator"]
_ROLES = ["user", "assistant", "tool"]


def synth_transcripts(
    spark: SparkSession,
    n_turns: int = 1000,
    n_convs: int = 50,
    seed: int = 42,
    skew_frac: float = 0.12,
) -> DataFrame:
    skew_cut = int(n_turns * skew_frac)
    n_other = max(n_convs - 1, 1)

    df = spark.range(n_turns).withColumn(
        "h", F.xxhash64(F.col("id"), F.lit(seed))
    )
    is_skew = F.col("id") < F.lit(skew_cut)
    j = F.col("id") - F.lit(skew_cut)

    conv_num = F.when(is_skew, F.lit(0)).otherwise(
        (j % F.lit(n_other)) + F.lit(1)
    )
    turn_idx = F.when(is_skew, F.col("id")).otherwise(
        F.floor(j / F.lit(n_other))
    )

    role = F.element_at(
        F.array(*[F.lit(r) for r in _ROLES]), (F.pmod(F.col("h"), 3) + 1).cast("int")
    )
    tool = F.when(
        role == "tool",
        F.element_at(
            F.array(*[F.lit(t) for t in _TOOLS]),
            (F.pmod(F.xxhash64(F.col("h"), F.lit(1)), len(_TOOLS)) + 1).cast("int"),
        ),
    ).otherwise(F.lit(None).cast("string"))

    entity = F.element_at(
        F.array(*[F.lit(e) for e, _ in ENTITY_FORMS]),
        (F.pmod(F.xxhash64(F.col("h"), F.lit(2)), len(ENTITY_FORMS)) + 1).cast("int"),
    )
    filler = F.element_at(
        F.array(*[F.lit(s) for s in _FILLER]),
        (F.pmod(F.xxhash64(F.col("h"), F.lit(3)), len(_FILLER)) + 1).cast("int"),
    )
    noise = F.element_at(
        F.array(*[F.lit(s) for s in _NOISE]),
        (F.pmod(F.xxhash64(F.col("h"), F.lit(4)), len(_NOISE)) + 1).cast("int"),
    )
    text = F.concat(filler, F.lit(" "), entity, noise)

    ts = F.timestamp_seconds(
        F.lit(1704067200)  # 2024-01-01T00:00:00Z
        + conv_num * F.lit(86400)
        + turn_idx * F.lit(7)
    )

    return df.select(
        F.format_string("conv_%05d", conv_num).alias("conv_id"),
        turn_idx.cast("int").alias("turn_idx"),
        role.alias("role"),
        text.alias("text"),
        tool.alias("tool"),
        ts.alias("ts"),
    )
