"""Companion to scale_probe.py: demonstrate that SemDeDup's superlinear
10x factor is the FIXED-K configuration, not the operator.

``semantic_dedup`` cost is sum(cluster_size^2) ~= n^2/K; the gate query
pins K=8 for its SQL oracle, so 10x rows => ~100x pair work (measured
36.5x wall in the round-4 probe).  The documented scale discipline
("size K so corpus/K stays under the cap") means K grows with n: this
probe runs K=8 at sf0.1 and K=80 at the 10x synthesis — constant
expected cluster size — and prints both walls.  Expected: the scaled-K
factor collapses to ~linear.

Usage: python scripts/semantic_scaledk_probe.py [out.json]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from scale_probe import SRC, synthesize_10x  # noqa: E402


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/semantic_scaledk.json"
    from mopper_spark.session import get_spark
    from mopper_spark.textops.ivf import seed_centroids, semantic_dedup

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scaledk-probe", f"local[{cpus}]", shuffle_partitions=cpus)
    tmp = tempfile.mkdtemp(prefix="sf1k_")
    synthesize_10x(spark, tmp)

    def run(sf_dir: str, k: int) -> float:
        emb = spark.read.parquet(f"{sf_dir}/embeddings.parquet")
        best = float("inf")
        for _ in range(2):
            t0 = time.time()
            semantic_dedup(emb, seed_centroids(emb, k=k), threshold=0.4).count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    t01 = run(SRC, 8)
    t1_fixed = run(tmp, 8)
    t1_scaled = run(tmp, 80)
    report = {
        "sf0.1_k8_s": t01,
        "sf1_k8_s": t1_fixed,
        "sf1_k80_s": t1_scaled,
        "fixed_k_factor": round(t1_fixed / t01, 2),
        "scaled_k_factor": round(t1_scaled / t01, 2),
    }
    with open(out_path, "w") as fh:
        json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
