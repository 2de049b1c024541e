"""Per-partition lineage + metrics store (the checkpoint's audit trail).

The reference persists a single scalar — the last increment value — to a
temp file or an auto-created MySQL table `t_db_to_es` (README-EN.org:48-49,
65-66; README.org:62).  At cluster scale a scalar is not enough: the
north_rule requires *per-partition lineage and metrics* so a failed build
is resumable and auditable.  We keep:

- the authoritative checkpoint (``last_snapshot_id``) inside the index
  manifest (atomic publish — state and index can never diverge), and
- an append-only lineage table here: one row per (build, phase,
  partition) with rows/bytes/wall_ms/status.

Resume contract: segment build stages write standard Spark ``_SUCCESS``
markers; ``plans.build`` skips any stage whose output already exists with
a marker, so a killed build re-run from the same checkpoint is a no-op
for completed stages (doc_id assignment is deterministic, so partial
results are identical).
"""

from __future__ import annotations

import os
import time
import uuid

from pyspark.sql import DataFrame, SparkSession

LINEAGE_SCHEMA = (
    "build_id string, ts long, phase string, partition int, rows long, "
    "bytes long, wall_ms long, status string, snapshot_id long, segment string"
)


class LineageStore:
    def __init__(self, index_root: str):
        self.path = os.path.join(index_root, "lineage")

    def append(self, spark: SparkSession, rows: list[dict]) -> None:
        if not rows:
            return
        now = int(time.time())
        recs = [
            (
                r.get("build_id", ""), now, r.get("phase", ""),
                int(r.get("partition", -1)), int(r.get("rows", 0)),
                int(r.get("bytes", 0)), int(r.get("wall_ms", 0)),
                r.get("status", "done"),
                int(r["snapshot_id"]) if r.get("snapshot_id") is not None else -1,
                r.get("segment", ""),
            )
            for r in rows
        ]
        spark.createDataFrame(recs, LINEAGE_SCHEMA).coalesce(1).write.mode(
            "append"
        ).parquet(self.path)

    def read(self, spark: SparkSession) -> DataFrame:
        return spark.read.parquet(self.path)


def new_build_id() -> str:
    return uuid.uuid4().hex[:12]


def stage_done(path: str) -> bool:
    """A parquet stage is complete iff its dir has Spark's _SUCCESS marker.
    Location-transparent: resume detection works on object-store roots
    through the same FS interface the manifest uses."""
    from .fs import get_fs

    return get_fs(path).exists(os.path.join(path, "_SUCCESS"))
