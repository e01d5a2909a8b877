"""sf1 scale probe (VERDICT r3 #8): run the most expensive sf-driven
headline queries at sf0.1 and at a deterministic 10x synthesis of it, and
report the observed wall-clock scale factor per query.

Usage:
    python scripts/scale_probe.py [out.json] [query1,query2,...]

The 10x corpus is synthesized from sf0.1 (TESTDATA.md forbids touching
/root/testdata, and no sf1 directory exists), replica by replica, each
deterministic and CONTENT-DISTINCT from the original so dedup-family
candidate generation scales like a real corpus instead of degenerating
into 10-deep exact-duplicate buckets:

- documents: replica r suffixes every token with ``_r`` (vocab grows
  10x, within-replica duplicate structure identical to the original,
  cross-replica shingle overlap zero) and offsets doc_id by r*10^7;
- embeddings: replica r rotates the vector left by r positions (norms
  and pairwise-distance distribution preserved, cross-replica
  near-neighbours broken) and offsets vec_id by r*10^7;
- events: replica r offsets event_id/user_id by r*10^9 and shifts ts by
  r days (per-user session structure identical, 10x users).

Queries over the committed transcript fixtures are NOT sf-driven and are
out of scope here (their input does not scale with the sf dir).
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

SRC = "/root/testdata/sf0.1"
# cheapest-first so a budget kill on a pathological query loses nothing
# already measured; the report file is rewritten after EVERY query.
DEFAULT_QUERIES = [
    "events_sessionize",
    "docs_repetition",
    "dedup_simhash",
    "similarity_topk_ivf",
    "dedup_embedding_deep",
    "dedup_minhash",
    "dedup_ngram_jaccard",
    "cc_components",
    "dedup_semantic",
    "dedup_embedding",
]


def synthesize_10x(spark, out_dir: str) -> None:
    from pyspark.sql import functions as F

    docs = spark.read.parquet(f"{SRC}/documents.parquet")
    emb = spark.read.parquet(f"{SRC}/embeddings.parquet")
    ev = spark.read.parquet(f"{SRC}/events.parquet")

    reps = spark.range(10).select(F.col("id").cast("int").alias("r"))

    d10 = (
        docs.crossJoin(reps)
        .select(
            (F.col("doc_id") + F.col("r").cast("long") * 10_000_000).alias("doc_id"),
            F.when(F.col("r") == 0, F.col("text"))
            .otherwise(
                F.array_join(
                    F.transform(
                        F.split(F.col("text"), " "),
                        lambda t: F.concat(t, F.lit("_"), F.col("r").cast("string")),
                    ),
                    " ",
                )
            )
            .alias("text"),
            "lang",
            "source",
            "n_chars",
        )
    )
    d10.write.mode("overwrite").parquet(f"{out_dir}/documents.parquet")

    dim = len(emb.select("embedding").first()[0])
    e10 = (
        emb.crossJoin(reps)
        .select(
            (F.col("vec_id") + F.col("r").cast("long") * 10_000_000).alias("vec_id"),
            F.when(F.col("r") == 0, F.col("embedding"))
            .otherwise(
                F.concat(
                    F.expr(f"slice(embedding, r + 1, {dim} - r)"),
                    F.expr("slice(embedding, 1, r)"),
                )
            )
            .alias("embedding"),
            "label",
        )
    )
    e10.write.mode("overwrite").parquet(f"{out_dir}/embeddings.parquet")

    ev10 = (
        ev.crossJoin(reps)
        .select(
            (F.col("event_id") + F.col("r").cast("long") * 1_000_000_000).alias(
                "event_id"
            ),
            (F.col("ts") + F.make_interval(days=F.col("r"))).alias("ts"),
            (F.col("user_id") + F.col("r").cast("long") * 1_000_000_000).alias(
                "user_id"
            ),
            "event_type",
            "value",
            "props",
        )
    )
    ev10.write.mode("overwrite").parquet(f"{out_dir}/events.parquet")

    # the remaining tables are not touched by the probed queries; symlink
    # them so queries() that read them still resolve
    for t in (
        "region nation customer supplier part orders lineitem".split()
    ):
        src = f"{SRC}/{t}.parquet"
        dst = f"{out_dir}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(src, dst)


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "/tmp/scale_probe.json"
    names = (
        sys.argv[2].split(",") if len(sys.argv) > 2 else DEFAULT_QUERIES
    )
    import __spark_entry__ as entry_mod
    from mopper_spark.session import get_spark

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark = get_spark("scale-probe", f"local[{cpus}]", shuffle_partitions=cpus)
    qs = entry_mod.queries()

    tmp = tempfile.mkdtemp(prefix="sf1_")
    print(f"# synthesizing 10x corpus in {tmp}", file=sys.stderr)
    synthesize_10x(spark, tmp)

    def run(name: str, sf_dir: str, draws: int = 2) -> float:
        best = float("inf")
        for _ in range(draws):
            t0 = time.time()
            qs[name](spark, sf_dir).count()
            best = min(best, time.time() - t0)
        return round(best, 3)

    report = {}
    for name in names:
        t01 = run(name, SRC)
        # one sf1 draw when the sf0.1 side is already multi-second: the
        # 10x factor estimate doesn't need min-of-2 precision there, and
        # a second pathological draw doubles the damage
        t1 = run(name, tmp, draws=1 if t01 > 5 else 2)
        report[name] = {
            "sf0.1_s": t01,
            "sf1_s": t1,
            "scale_factor": round(t1 / t01, 2) if t01 > 0 else None,
        }
        print(f"# {name}: {t01}s -> {t1}s ({report[name]['scale_factor']}x)",
              file=sys.stderr)
        with open(out_path, "w") as fh:  # incremental: survive a kill
            json.dump(report, fh, indent=1)
    print(json.dumps(report))


if __name__ == "__main__":
    main()
