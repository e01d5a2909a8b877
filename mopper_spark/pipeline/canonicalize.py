"""Stage 4: canonicalization — co-reference components → canonical entities.

Maps every normalized surface form to its component's canonical form (the
lexicographically smallest member — deterministic under distribution) and
builds the canonical entity IRI with the same URI-encoding function the
extraction stage uses.

The form dictionary is tiny relative to the corpus (distinct normalized
mentions), so the final mention→canonical rewrite joins the mention stream
against a **broadcast** dictionary — no corpus-wide shuffle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from mopper_spark.compiler import pct_encode_native
from mopper_spark.pipeline.cc import connected_components

EX = "http://example.com/"


def canonical_map(forms: DataFrame, edges: DataFrame) -> DataFrame:
    """(norm) forms + accepted (norm_a, norm_b) edges → canonical dictionary.

    Returns (norm, canonical_norm, canonical_iri); singleton forms map to
    themselves.
    """
    ids = forms.select(
        "norm", F.xxhash64("norm").alias("node")
    )
    edge_ids = (
        edges.join(ids.withColumnRenamed("norm", "norm_a"), "norm_a")
        .withColumnRenamed("node", "u")
        .join(ids.withColumnRenamed("norm", "norm_b"), "norm_b")
        .withColumnRenamed("node", "v")
        .select("u", "v")
    )
    comp = connected_components(edge_ids)

    # node id → component id → canonical member (lexicographic min of the
    # member norms, NOT the min hash id: stable and human-auditable)
    membership = ids.join(comp, ids.node == comp.node, "left").select(
        "norm", F.coalesce("component", ids.node).alias("component")
    )
    canon = membership.groupBy("component").agg(
        F.min("norm").alias("canonical_norm")
    )
    out = membership.join(canon, "component").select(
        "norm",
        "canonical_norm",
        F.concat(
            F.lit(EX + "entity/"), pct_encode_native(F.col("canonical_norm"))
        ).alias("canonical_iri"),
    )
    return out
