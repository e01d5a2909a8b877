"""Stage 3: connected components over the co-reference graph.

DataFrame-only alternating **large-star / small-star** (Kiveris et al.,
"Connected Components in MapReduce and Beyond", SoCC'14) — the standard
shuffle-friendly CC algorithm:

- *large-star*: every node points its strictly-larger neighbours at the
  minimum of its neighbourhood (incl. itself);
- *small-star*: every node points its smaller-or-equal neighbours at that
  minimum.

Each round is two shuffles (groupBy node); convergence in O(log n) rounds
even on path graphs, and hot components are handled by the groupBy's
map-side partial aggregation.  Lineage is cut with ``localCheckpoint``
every round (iterative plans otherwise grow unboundedly and re-execute).

Node ids are int64; callers map strings → ids with ``xxhash64`` (stable,
deterministic) and keep a dictionary to map back.
"""

from __future__ import annotations

import logging

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

log = logging.getLogger(__name__)


def _star(edges: DataFrame, large: bool) -> DataFrame:
    """One large- or small-star round over canonical (u, v) edges."""
    # symmetrize: neighbourhood of u must include both directions
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    grouped = sym.groupBy("u").agg(F.collect_set("v").alias("nbrs"))
    m = F.least(F.col("u"), F.array_min("nbrs")).alias("m")
    if large:
        # connect strictly-larger neighbours to the neighbourhood minimum
        targets = F.filter(F.col("nbrs"), lambda x: x > F.col("u"))
    else:
        # connect smaller-or-equal neighbours AND u itself to the minimum
        # (omitting u would disconnect it from its re-homed neighbours)
        targets = F.array_union(
            F.filter(F.col("nbrs"), lambda x: x <= F.col("u")),
            F.array(F.col("u")),
        )
    out = grouped.select(m, F.explode(targets).alias("n")).filter(
        F.col("n") != F.col("m")
    )
    return out.select(
        F.greatest("n", "m").alias("u"), F.least("n", "m").alias("v")
    ).distinct()


def connected_components(
    edges: DataFrame, max_iter: int = 25
) -> DataFrame:
    """Edge list (u:int64, v:int64) → (node:int64, component:int64).

    ``component`` is the minimum node id in the component.
    """
    cur = (
        edges.select(
            F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
        )
        .filter(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint()
    )
    for i in range(max_iter):
        after_large = _star(cur, large=True)
        after_small = _star(after_large, large=False).localCheckpoint()
        # converged when the edge set is a stable star forest: every u maps
        # to exactly one v and no changes from the previous round
        changed = after_small.exceptAll(cur).limit(1).count()
        cur = after_small
        if changed == 0:
            log.info("connected_components converged after %d rounds", i + 1)
            break
    else:
        log.warning("connected_components hit max_iter=%d", max_iter)

    membership = cur.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = cur.select(F.col("v").alias("node")).distinct().withColumn(
        "component", F.col("node")
    )
    return membership.union(
        roots.join(membership.select("node"), "node", "left_anti")
    ).distinct()
