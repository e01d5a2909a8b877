import sys
sys.path.insert(0, "/root/repo")
from bench import materialize_transcripts
from mopper_spark.session import get_spark
s = get_spark("gen", "local[32]", shuffle_partitions=32)
materialize_transcripts(s, int(sys.argv[1]), sys.argv[2])
s.stop()
