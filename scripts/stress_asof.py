"""Scale stress for asof_join: 10M synthetic trades x 1M quotes across
100k keys with one hot key holding 5% of all rows.

Evidence for the 100 TB posture: wall-clock stays join+sort-bound (ONE
hash partition of the union), the hot key lands in one partition but its
work is a single in-partition sort (spillable), and the result cardinality
equals the left side exactly — no per-key cross product anywhere.

Run: PYTHONPATH=/root/repo python scripts/stress_asof.py [n_left] [n_right]
"""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from mopper_spark.session import get_spark
from mopper_spark.textops.joins import asof_join

n_left = int(sys.argv[1]) if len(sys.argv) > 1 else 10_000_000
n_right = int(sys.argv[2]) if len(sys.argv) > 2 else 1_000_000
spark = get_spark("stress-asof", "local[16]", shuffle_partitions=32)

# 5% of rows share key 0 (the hot key); the rest spread over 100k keys
def keyed(n, seed):
    return (
        spark.range(n)
        .select(
            F.when(F.pmod(F.xxhash64("id", F.lit(seed)), 20) == 0, F.lit(0))
            .otherwise(F.pmod(F.xxhash64("id", F.lit(seed + 1)), 100_000))
            .alias("k"),
            F.pmod(F.xxhash64("id", F.lit(seed + 2)), 10_000_000_000).alias("ts"),
            F.col("id").alias("rid"),
        )
    )

left, right = keyed(n_left, 1), keyed(n_right, 7)
t0 = time.time()
res = asof_join(left, right, by="k", on="ts", right_cols=["rid"])
n_out = res.count()
n_matched = res.filter(F.col("rid_right").isNotNull()).count()
dt = time.time() - t0
assert n_out == n_left, (n_out, n_left)
print(
    f"asof_join: {n_left:,} x {n_right:,} rows, 100k keys (hot key ~5%): "
    f"{dt:.1f}s ({n_left/dt:,.0f} left rows/s), matched {n_matched:,}"
)
