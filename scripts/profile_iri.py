"""Decompose the IRI fast-path cost: UDF vs concat vs rlike."""
import sys
import time

sys.path.insert(0, "/root/repo")
from pyspark.sql import functions as F

from bench import warm_python_workers
from mopper_spark.compiler import _pct_encode_udf
from mopper_spark.functions.iri import INVALID_URI_CHAR_CLASS_JAVA
from mopper_spark.pipeline.transcripts import synth_transcripts
from mopper_spark.session import get_spark

N = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
s = get_spark("profiri", "local[32]", shuffle_partitions=32)
warm_python_workers(s, 32)
tr = synth_transcripts(s, N, max(N // 200, 10)).select("conv_id", "turn_idx").cache()
tr.count()


def force(label, col):
    t0 = time.time()
    tr.agg(F.sum(F.length(col))).collect()
    print(f"{label}: {time.time()-t0:.1f}s", flush=True)


cid = F.coalesce(F.col("conv_id").cast("string"), F.lit(""))
tid = F.coalesce(F.col("turn_idx").cast("string"), F.lit(""))
e1, e2 = _pct_encode_udf(cid), _pct_encode_udf(tid)
concat = F.concat(F.lit("http://example.com/turn/"), e1, F.lit("/"), e2)
native_concat = F.concat(F.lit("http://example.com/turn/"), cid, F.lit("/"), tid)

force("native-concat-only", native_concat)
force("one-udf", e1)
force("two-udf-concat", concat)
force("concat+rlike-when", F.when(concat.rlike(INVALID_URI_CHAR_CLASS_JAVA), F.lit("INVALID")).otherwise(concat))
force("native+rlike-when", F.when(native_concat.rlike(INVALID_URI_CHAR_CLASS_JAVA), F.lit("INVALID")).otherwise(native_concat))
s.stop()
