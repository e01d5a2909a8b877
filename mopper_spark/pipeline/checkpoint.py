"""Checkpoint manifests: per-stage lineage, counters, idempotent resume.

Every pipeline stage runs through ``CheckpointManager.stage``: if a manifest
for (stage, fingerprint) exists and its output is complete, the stage is
**skipped** and its materialized output is read back; otherwise the stage
computes, writes its output parquet atomically (write → fsync manifest via
tmp+rename), and records lineage:

- the input fingerprint (caller-supplied config/content hash),
- row count and per-partition-column counts,
- output file count,
- wall-clock duration.

Atomicity model: Spark's parquet writer is itself atomic-ish per directory
(_SUCCESS marker); the manifest is only written after a successful write,
and a re-run after a mid-run kill finds either (a) no manifest → recompute
and overwrite (idempotent), or (b) a complete manifest → skip.  Either way
the emitted triple set is identical — verified by the resume test.
"""

from __future__ import annotations

import json
import os
import time
from urllib.parse import unquote, urlparse
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


@dataclass
class StageResult:
    name: str
    df: DataFrame
    skipped: bool
    manifest: dict


@dataclass
class CheckpointManager:
    spark: SparkSession
    root: str
    metrics: list[dict] = field(default_factory=list)

    def _paths(self, name: str) -> tuple[str, str]:
        return (
            os.path.join(self.root, name, "data"),
            os.path.join(self.root, name, "manifest.json"),
        )

    def _read_manifest(self, path: str) -> dict | None:
        try:
            with open(path) as f:
                return json.load(f)
        except (OSError, json.JSONDecodeError):
            return None

    def stage(
        self,
        name: str,
        fingerprint: str,
        compute: Callable[[], DataFrame],
        partition_by: list[str] | None = None,
    ) -> StageResult:
        data_path, manifest_path = self._paths(name)
        man = self._read_manifest(manifest_path)
        if (
            man
            and man.get("fingerprint") == fingerprint
            and man.get("status") == "complete"
            and os.path.exists(os.path.join(data_path, "_SUCCESS"))
        ):
            df = self.spark.read.parquet(data_path)
            result = StageResult(name, df, skipped=True, manifest=man)
            self.metrics.append({"stage": name, "skipped": True, **man["counters"]})
            return result

        t0 = time.time()
        df = compute()
        writer = df.write.mode("overwrite")
        if partition_by:
            writer = writer.partitionBy(*partition_by)
        writer.parquet(data_path)

        out = self.spark.read.parquet(data_path)
        counters: dict = {"rows": out.count()}
        if partition_by:
            counters["partitions"] = {
                "|".join(str(r[c]) for c in partition_by): r["count"]
                for r in out.groupBy(*partition_by).count().collect()
            }
        # per-partition lineage: one row-count per written parquet file
        # (the resume unit) — recorded for audit/debugging of partial or
        # corrupt partitions (resume itself gates on fingerprint+_SUCCESS)
        abs_data = os.path.abspath(data_path)
        counters["files_detail"] = {
            # input_file_name is a file:// URI (percent-encoded) — decode
            # before computing the stage-relative key, keeping partition
            # subdirs in it
            os.path.relpath(unquote(urlparse(r["f"]).path), abs_data): r["count"]
            for r in out.groupBy(F.input_file_name().alias("f"))
            .count()
            .collect()
        }
        # count files on disk, not via the groupBy: a zero-row part file
        # produces no group but is still a real output file
        counters["files"] = sum(
            1
            for _, _, files in os.walk(data_path)
            for fn in files
            if fn.endswith(".parquet")
        )
        counters["seconds"] = round(time.time() - t0, 3)

        man = {
            "stage": name,
            "fingerprint": fingerprint,
            "status": "complete",
            "counters": counters,
            "written_at": time.strftime("%Y-%m-%dT%H:%M:%SZ", time.gmtime()),
        }
        tmp = manifest_path + ".tmp"
        os.makedirs(os.path.dirname(manifest_path), exist_ok=True)
        with open(tmp, "w") as f:
            json.dump(man, f, indent=2)
        os.replace(tmp, manifest_path)  # atomic publish

        self.metrics.append({"stage": name, "skipped": False, **counters})
        return StageResult(name, out, skipped=False, manifest=man)
