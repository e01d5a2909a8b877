"""Two-cluster-size scaling proxy: one parallelism level, steady-state.

Measures the extraction job repeatedly until JIT-compiled steady state
(throughput plateau), printing the best rep.  Run under ``taskset`` so
local[8] genuinely has 8 CPUs for JVM *and* Python workers — unpinned, the
8-thread JVM borrows the idle 24 cores for its Python workers and inflates
the baseline.

Findings baked in (see git history / BENCH.md):
- first 1-2 runs are 10-25× slower than steady state (whole-stage-codegen
  classes go through the interpreter until C2 kicks in);
- python workers pay ~1-2 s import on first task → warm the pool first;
- input must come from storage, not an inline generator, and be large
  enough that the measured run is ≥ 5 s at the highest parallelism.

Usage: [taskset -c 0-N] python scripts/scaling_run.py <cores> <n_turns> <parquet> [max_reps]
"""
import os
import sys

sys.path.insert(0, "/root/repo")
from bench import extraction_throughput, warm_python_workers
from mopper_spark.session import get_spark

m, n, path = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
max_reps = int(sys.argv[4]) if len(sys.argv) > 4 else 6

# Heap must scale WITH the simulated cluster size (1 GB/core): on a real
# cluster 4N executors bring 4N× heap, but a fixed local heap turns the
# high-parallelism run into a GC benchmark — measured 1.4M turns/s at 8 GB
# vs 2.3M at 32 GB on the same local[32] job.  A pre-exported
# SPARK_DRIVER_MEMORY wins, and -Xms below always matches it (Xms > Xmx
# would refuse to start the JVM).
heap = os.environ.get("SPARK_DRIVER_MEMORY") or f"{m}g"
os.environ["SPARK_DRIVER_MEMORY"] = heap

# one split per corpus file: packing small files into 128 MB splits would
# leave local[32] with ~5 tasks (split starvation — see
# bench.materialize_transcripts docstring)
s = get_spark(
    f"scaling-{m}",
    f"local[{m}]",
    shuffle_partitions=m,
    extra_conf={
        "spark.sql.files.maxPartitionBytes": str(4 * 1024 * 1024),
        "spark.sql.files.openCostInBytes": "0",
        # commit + fault the whole heap during (untimed) startup: lazy
        # heap commit turns steady-state GC into a host-page-fault storm
        # on virtualized memory — measured 60-80% SYSTEM cpu and rep
        # throughput collapsing 1.4M -> 0.3M turns/s without this
        "spark.driver.extraJavaOptions": f"-Xms{heap} -XX:+AlwaysPreTouch",
    },
)
print(
    f"# cores={m} heap={s.conf.get('spark.driver.memory')} "
    f"splits={s.read.parquet(path).rdd.getNumPartitions()}",
    file=sys.stderr,
)
warm_python_workers(s, m)
# Fixed rep count + MEDIAN of the last half: a best-of-reps max statistic
# is noisy (observed ±10% run-to-run swings in the resulting efficiency
# ratio); the median of post-warmup reps is stable and symmetric across
# the two cluster sizes.  C2 compilation lands by rep ~3, so the first
# half of the series is warm-up and excluded.
reps = []
for i in range(max_reps):
    tp = extraction_throughput(s, n, path)
    reps.append(tp)
    print(f"# cores={m} rep={i} tp={tp:,.0f}", file=sys.stderr)
steady = sorted(reps[len(reps) // 2 :])
median = steady[len(steady) // 2]
print(f"# cores={m} median_of_last={median:,.0f} best={max(reps):,.0f}", file=sys.stderr)
print(f"{median:.1f}")
s.stop()
