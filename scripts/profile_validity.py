"""Find the cheapest native invalid-char check for the IRI fast path."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bench import warm_python_workers
from mopper_spark.functions.iri import INVALID_URI_CHAR_CLASS_JAVA
from mopper_spark.pipeline.transcripts import synth_transcripts
from mopper_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
s = get_spark("profval", "local[32]", shuffle_partitions=32)
warm_python_workers(s, 32)
tr = synth_transcripts(s, N, max(N // 200, 10)).select("conv_id", "turn_idx").cache()
tr.count()

value = F.concat(
    F.lit("http://example.com/turn/"),
    F.col("conv_id"),
    F.lit("/"),
    F.col("turn_idx").cast("string"),
)

ALLOWED = (
    "ABCDEFGHIJKLMNOPQRSTUVWXYZabcdefghijklmnopqrstuvwxyz0123456789"
    "-._~:/?#[]@!$&'()*+,;=%"
)


def force(label, col):
    t0 = time.time()
    tr.agg(F.sum(F.length(col))).collect()
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)


force("baseline-concat", value)
force("when-rlike", F.when(value.rlike(INVALID_URI_CHAR_CLASS_JAVA), F.lit("INVALID")).otherwise(value))
force("rlike-bool-only", F.when(value.rlike(INVALID_URI_CHAR_CLASS_JAVA), F.lit("x")).otherwise(F.lit("y")))
force("when-translate", F.when(F.length(F.translate(value, ALLOWED, "")) > 0, F.lit("INVALID")).otherwise(value))
force("when-regexp_count", F.when(F.regexp_count(value, F.lit(INVALID_URI_CHAR_CLASS_JAVA)) > 0, F.lit("INVALID")).otherwise(value))
s.stop()
