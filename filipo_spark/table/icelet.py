"""Icelet — a minimal Iceberg-shaped snapshot table over parquet.

No Iceberg/Delta jars exist in this sandbox (verified in SURVEY.md §7.3),
so the engine ships its own copy-on-write table format exposing exactly
the metadata surface the north_star demands:

    <root>/data/b=<bucket>/snap-<id>/part-*.parquet     data files
    <root>/metadata/snapshot-<id>.json                  file list per bucket
    <root>/metadata/manifest.jsonl                      commit lineage
    <root>/metadata/CURRENT                             atomic pointer

* **Bucketed layout**: rows land in ``b = pmod(xxhash64(conv_id), N)`` —
  co-locates each conversation, makes MERGE a per-bucket copy-on-write
  rewrite, and gives the replay loop its partition-pruning axis.
* **Snapshots**: immutable JSON file lists; a commit writes new files for
  touched buckets only and inherits the parent's files for the rest —
  the same O(touched) metadata shape as an Iceberg manifest rewrite.
* **Commit manifest**: one JSONL row per epoch —
  ``(epoch, offset_lo, offset_hi, snapshot_id, buckets, n_rows,
  evolution_events, committed_at)`` — per-partition lineage from source
  offset range to snapshot id.
* **Exactly-once**: the manifest is the fence.  A batch whose
  ``(offset_lo, offset_hi]`` already appears is skipped (idempotent
  replay); a crash between data write and pointer swap leaves orphan
  files that no snapshot references — invisible to readers, collected
  by ``vacuum()``.  This is the reference's delete-then-insert
  function-store idempotence (OutputManager.java:65-70,296-303) turned
  into an atomic-pointer commit protocol.

Scale notes: metadata operations are O(buckets) driver-side JSON — at
1000 executors the data plane is untouched; reads pass an explicit file
list to ``spark.read.parquet`` so partition pruning is exact (no
directory listing of the whole table).
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass, field
from typing import Any

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filipo_spark.operators.dedup import lww_dedup
from filipo_spark.operators.merge import (
    PHYS_COLUMNS,
    bucket_of,
    merge_upserts,
    to_physical,
)
from filipo_spark.schema import (
    KEY_COLUMNS,
    N_BUCKETS_DEFAULT,
    TARGET_SCHEMA,
)

_PHYS_SCHEMA_DDL = (
    "conv_id string, turn_idx int, role string, text string, tool string, "
    "ts timestamp, _lsn bigint, _deleted boolean"
)


@dataclass
class CommitResult:
    epoch: int
    snapshot_id: str | None
    skipped: bool
    buckets: list[int] = field(default_factory=list)
    n_rows: int = 0


class IceletTable:
    def __init__(self, root: str, n_buckets: int = N_BUCKETS_DEFAULT):
        self.root = root
        self.n_buckets = n_buckets

    # --- paths ---------------------------------------------------------
    @property
    def _meta(self) -> str:
        return os.path.join(self.root, "metadata")

    @property
    def _data(self) -> str:
        return os.path.join(self.root, "data")

    def _snap_path(self, sid: str) -> str:
        return os.path.join(self._meta, f"snapshot-{sid}.json")

    # --- lifecycle -----------------------------------------------------
    @classmethod
    def create(cls, root: str, n_buckets: int = N_BUCKETS_DEFAULT) -> "IceletTable":
        t = cls(root, n_buckets)
        os.makedirs(t._meta, exist_ok=True)
        os.makedirs(t._data, exist_ok=True)
        sid = "empty"
        with open(t._snap_path(sid), "w") as f:
            json.dump(
                {"snapshot_id": sid, "parent": None, "epoch": -1,
                 "n_buckets": n_buckets, "files": {}},
                f,
            )
        t._swap_current(sid)
        return t

    @classmethod
    def load(cls, root: str) -> "IceletTable":
        t = cls(root)
        snap = t.current_snapshot()
        t.n_buckets = snap["n_buckets"]
        return t

    # --- metadata ------------------------------------------------------
    def _swap_current(self, sid: str) -> None:
        tmp = os.path.join(self._meta, f".CURRENT.{uuid.uuid4().hex}.tmp")
        with open(tmp, "w") as f:
            f.write(sid)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, os.path.join(self._meta, "CURRENT"))

    def current_snapshot_id(self) -> str:
        with open(os.path.join(self._meta, "CURRENT")) as f:
            return f.read().strip()

    def current_snapshot(self) -> dict[str, Any]:
        with open(self._snap_path(self.current_snapshot_id())) as f:
            return json.load(f)

    def manifest(self) -> list[dict[str, Any]]:
        p = os.path.join(self._meta, "manifest.jsonl")
        if not os.path.exists(p):
            return []
        out = []
        with open(p) as f:
            for line in f:
                if line.strip():
                    out.append(json.loads(line))
        return out

    def committed_ranges(self) -> set[tuple[int, int]]:
        """Offset ranges already applied — the exactly-once fence."""
        return {(m["offset_lo"], m["offset_hi"]) for m in self.manifest()}

    def _append_manifest(self, row: dict[str, Any]) -> None:
        p = os.path.join(self._meta, "manifest.jsonl")
        with open(p, "a") as f:
            f.write(json.dumps(row, sort_keys=True) + "\n")
            f.flush()
            os.fsync(f.fileno())

    # --- read ----------------------------------------------------------
    def _files_of(self, snap: dict[str, Any], buckets: list[int] | None = None) -> list[str]:
        files: list[str] = []
        for b, fl in snap["files"].items():
            if buckets is None or int(b) in buckets:
                files.extend(os.path.join(self.root, rel) for rel in fl)
        return files

    def read(self, spark: SparkSession, buckets: list[int] | None = None) -> DataFrame:
        """Physical rows of the current snapshot (optionally bucket-pruned).

        Explicit file list → no directory listing, exact pruning.
        """
        files = self._files_of(self.current_snapshot(), buckets)
        if not files:
            return spark.createDataFrame([], _PHYS_SCHEMA_DDL)
        return spark.read.schema(_PHYS_SCHEMA_DDL).parquet(*files)

    def read_logical(self, spark: SparkSession) -> DataFrame:
        from filipo_spark.operators.merge import logical

        return logical(self.read(spark))

    # --- write ---------------------------------------------------------
    def bootstrap(self, target: DataFrame, epoch: int = 0) -> CommitResult:
        """Seed the table from a logical target DataFrame (lsn=-1 rows)."""
        phys = to_physical(target)
        winners = None
        return self._commit(phys, winners, epoch, offset_lo=-1, offset_hi=-1,
                            touched=list(range(self.n_buckets)), evolution_events=[])

    def apply_epoch(
        self,
        spark: SparkSession,
        changes: DataFrame,
        epoch: int,
        offset_lo: int,
        offset_hi: int,
        evolution_events: list[str] | None = None,
    ) -> CommitResult:
        """LWW dedup → per-bucket copy-on-write MERGE → atomic commit.

        Idempotent: an (offset_lo, offset_hi] range already in the manifest
        is skipped without touching data.
        """
        if (offset_lo, offset_hi) in self.committed_ranges():
            return CommitResult(epoch=epoch, snapshot_id=None, skipped=True)
        winners = lww_dedup(changes)
        winners = winners.withColumn("_b", bucket_of(F.col("conv_id"), self.n_buckets))
        winners.cache()
        try:
            touched = sorted(
                r["_b"] for r in winners.select("_b").distinct().collect()
            )
            if not touched:  # empty batch: manifest-only commit
                sid = self.current_snapshot_id()
                self._append_manifest(
                    {"epoch": epoch, "offset_lo": offset_lo, "offset_hi": offset_hi,
                     "snapshot_id": sid, "buckets": [], "n_rows": 0,
                     "evolution_events": evolution_events or []}
                )
                return CommitResult(epoch=epoch, snapshot_id=sid, skipped=False)
            old = self.read(spark, buckets=touched)
            new_phys = merge_upserts(old, winners.drop("_b"))
            return self._commit(
                new_phys, winners, epoch, offset_lo, offset_hi, touched,
                evolution_events or [], n_rows=winners.count(),
            )
        finally:
            winners.unpersist()

    def _commit(
        self,
        new_phys: DataFrame,
        winners: DataFrame | None,
        epoch: int,
        offset_lo: int,
        offset_hi: int,
        touched: list[int],
        evolution_events: list[str],
        n_rows: int = 0,
    ) -> CommitResult:
        sid = f"{epoch:08d}-{uuid.uuid4().hex[:8]}"
        staging = os.path.join(self._data, f".staging-{sid}")
        # one Spark job: bucket → sort within → one file per bucket dir.
        # Deterministic row order inside each file (stable output contract);
        # at 100 TB drop the coalesce-to-1 per bucket and allow N files/bucket.
        (
            new_phys.withColumn("_bucket", bucket_of(F.col("conv_id"), self.n_buckets))
            .repartition(self.n_buckets, "_bucket")
            .sortWithinPartitions(*KEY_COLUMNS)
            .write.mode("overwrite")
            .partitionBy("_bucket")
            .parquet(staging)
        )
        parent = self.current_snapshot()
        files: dict[str, list[str]] = dict(parent["files"])
        for b in touched:
            src = os.path.join(staging, f"_bucket={b}")
            rel_dir = os.path.join("data", f"b={b}", f"snap-{sid}")
            dst = os.path.join(self.root, rel_dir)
            bucket_files: list[str] = []
            if os.path.isdir(src):
                os.makedirs(os.path.dirname(dst), exist_ok=True)
                shutil.move(src, dst)
                bucket_files = sorted(
                    os.path.join(rel_dir, fn)
                    for fn in os.listdir(dst)
                    if fn.endswith(".parquet")
                )
            files[str(b)] = bucket_files
        shutil.rmtree(staging, ignore_errors=True)
        snap = {
            "snapshot_id": sid,
            "parent": parent["snapshot_id"],
            "epoch": epoch,
            "n_buckets": self.n_buckets,
            "files": files,
        }
        # crash ordering: snapshot json → manifest line → CURRENT pointer.
        # A crash before the pointer swap leaves the old snapshot live and
        # the new files orphaned (vacuum()-collectable) — never a torn read.
        with open(self._snap_path(sid), "w") as f:
            json.dump(snap, f, sort_keys=True)
            f.flush()
            os.fsync(f.fileno())
        self._append_manifest(
            {"epoch": epoch, "offset_lo": offset_lo, "offset_hi": offset_hi,
             "snapshot_id": sid, "buckets": touched, "n_rows": n_rows,
             "evolution_events": evolution_events}
        )
        self._swap_current(sid)
        return CommitResult(epoch=epoch, snapshot_id=sid, skipped=False, buckets=touched)

    # --- maintenance ---------------------------------------------------
    def vacuum(self) -> list[str]:
        """Delete data files not referenced by the current snapshot chain."""
        live: set[str] = set()
        sid = self.current_snapshot_id()
        seen = set()
        while sid and sid not in seen:
            seen.add(sid)
            with open(self._snap_path(sid)) as f:
                snap = json.load(f)
            for fl in snap["files"].values():
                live.update(fl)
            sid = snap.get("parent")
        removed = []
        for dirpath, _dirs, fns in os.walk(self._data):
            for fn in fns:
                p = os.path.join(dirpath, fn)
                rel = os.path.relpath(p, self.root)
                if fn.endswith(".parquet") and rel not in live:
                    os.remove(p)
                    removed.append(rel)
        return removed
