"""Atomic snapshot store for crawl state (frontier / seen / host_state).

Plays the role Iceberg snapshots play in the production design (SURVEY.md
§3: per-tick atomic multi-table commit, snapshot tag = tick id; the
reference's analog is the persistable store + recovery stream,
store.go:30-34, crawler.go:93-113). This sandbox has no Iceberg runtime
jar, so the same contract is implemented over plain parquet directories
with rename-commit atomicity:

    <root>/snapshots/step=<N>/<table>/   parquet data, written to a tmp
                                         dir and renamed into place
    <root>/snapshots/step=<N>/manifest.json   driver scalars (seq base,
                                         virtual clock, step) — written last
    <root>/LATEST                        pointer file, atomic tmp+rename

A snapshot is visible iff its manifest exists and LATEST points at it,
giving all-or-nothing multi-table commits and exact resume: rerunning
from snapshot N replays the deterministic driver loop from identical
state. On a real deployment each ``write`` below becomes an Iceberg
``writeTo(...).overwritePartitions()`` in one transaction; the engine
code is format-agnostic through this class.
"""

from __future__ import annotations

import json
import os
import shutil
from typing import Optional

from pyspark.sql import DataFrame, SparkSession


class SnapshotStore:
    def __init__(self, root: str):
        self.root = root
        os.makedirs(os.path.join(root, "snapshots"), exist_ok=True)

    def _snap_dir(self, step: int) -> str:
        return os.path.join(self.root, "snapshots", f"step={step}")

    def commit(self, step: int, scalars: dict, frames: dict[str, DataFrame]) -> None:
        from pyspark.sql import functions as F

        final = self._snap_dir(step)
        tmp = final + ".tmp"
        if os.path.exists(tmp):
            shutil.rmtree(tmp)
        if os.path.exists(final):
            shutil.rmtree(final)
        os.makedirs(tmp)
        lineage: dict[str, list] = {}
        for name, df in frames.items():
            df.write.mode("overwrite").parquet(os.path.join(tmp, name))
            # per-partition lineage: which partition contributed how many
            # rows to this snapshot (the Iceberg-manifest analog)
            lineage[name] = [
                {"partition_id": r["pid"], "n_rows": r["n"]}
                for r in df.select(F.spark_partition_id().alias("pid"))
                .groupBy("pid")
                .agg(F.count("*").alias("n"))
                .collect()
            ]
        manifest = dict(scalars)
        manifest["step"] = step
        manifest["tables"] = sorted(frames)
        manifest["lineage"] = lineage
        with open(os.path.join(tmp, "manifest.json"), "w") as f:
            json.dump(manifest, f)
        os.rename(tmp, final)
        # LATEST pointer: atomic via tmp + rename
        ptr = os.path.join(self.root, "LATEST")
        with open(ptr + ".tmp", "w") as f:
            f.write(str(step))
        os.rename(ptr + ".tmp", ptr)

    def latest(self) -> Optional[dict]:
        ptr = os.path.join(self.root, "LATEST")
        if not os.path.exists(ptr):
            return None
        with open(ptr) as f:
            step = int(f.read().strip())
        with open(os.path.join(self._snap_dir(step), "manifest.json")) as f:
            return json.load(f)

    def load(self, spark: SparkSession, step: int) -> dict[str, DataFrame]:
        d = self._snap_dir(step)
        with open(os.path.join(d, "manifest.json")) as f:
            manifest = json.load(f)
        return {name: spark.read.parquet(os.path.join(d, name)) for name in manifest["tables"]}
