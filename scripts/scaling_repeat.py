"""Repeat the measured job N times in one session (variance check)."""
import sys, time
sys.path.insert(0, "/root/repo")
from bench import extraction_throughput, warm_python_workers
from mopper_spark.session import get_spark
m, n, path, reps = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3], int(sys.argv[4])
s = get_spark(f"rep-{m}", f"local[{m}]", shuffle_partitions=m)
warm_python_workers(s, m)
for i in range(reps):
    tp = extraction_throughput(s, n, path)
    print(f"cores={m} rep={i} tp={tp:,.0f}", flush=True)
s.stop()
