"""Entity-linking blocking-scalability stress.

The synthetic transcript corpus has only 16 distinct surface forms, so the
pipeline's linking stage never stresses the blocking self-join.  This
harness builds N distinct forms arranged in near-duplicate families
(base name × {case, initials, extra token, doubled space} variants +
unique fillers), runs the full blocking → candidate → scoring path, and
reports wall-clock + candidate/edge counts.  The quadratic-blowup guard
(`max_block_size`) is what keeps candidate counts linear-ish in N.

Usage: python scripts/stress_linking.py [n_forms] [cores]
"""

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F

from mopper_spark.pipeline.linking import candidate_pairs, link_mentions
from mopper_spark.session import get_spark

n_forms = int(sys.argv[1]) if len(sys.argv) > 1 else 100_000
cores = int(sys.argv[2]) if len(sys.argv) > 2 else 16

s = get_spark("stress-linking", f"local[{cores}]", shuffle_partitions=cores)

first = F.element_at(F.split(F.col("base"), " "), 1)
rest = F.element_at(F.split(F.col("base"), " "), 2)
base = (
    s.range(n_forms // 5)
    .select(
        F.concat(
            F.lit("person"),
            F.col("id").cast("string"),
            F.lit(" family"),
            (F.col("id") % 997).cast("string"),
        ).alias("base")
    )
)
variants = base.select(
    F.explode(
        F.array(
            F.col("base"),
            F.upper("base"),                                    # case variant
            F.concat(F.substring(first, 1, 1), F.lit(" "), rest),  # initial
            F.concat(F.col("base"), F.lit(" jr")),              # extra token
            F.concat(first, F.lit("  "), rest),                 # double space
        )
    ).alias("surface")
)

t0 = time.time()
forms = variants.select(
    F.col("surface").alias("norm")
).distinct()
n_distinct = forms.count()
cands = candidate_pairs(forms.selectExpr("lower(norm) as norm"))
n_cands = cands.count()
t_cand = time.time() - t0

t0 = time.time()
edges = link_mentions(variants)
n_edges = edges.count()
t_total = time.time() - t0

print(
    f"forms={n_distinct} candidates={n_cands} ({t_cand:.1f}s) "
    f"edges={n_edges} (full link {t_total:.1f}s, {n_distinct/t_total:,.0f} forms/s)"
)
s.stop()
