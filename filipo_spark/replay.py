"""Epoch-fenced, exactly-once replay of a change log into an Icelet table.

The batch-mode twin of the Structured Streaming tail (streaming/tail.py);
both funnel through ``IceletTable.apply_epoch`` (→ ``apply_batch``
semantics) so a checkpointed stream and a bounded replay produce
identical state — the BASELINE invariant.

Exactly-once protocol:
  1. plan epochs as half-open LSN ranges ``(lo, hi]`` of ``batch_size``;
  2. before applying an epoch, consult the table manifest — a committed
     range is skipped (duplicate replay, kill/resume);
  3. apply = LWW dedup → per-bucket copy-on-write MERGE → atomic
     snapshot+manifest+pointer commit (table/icelet.py).

Because MERGE is an associative LWW fold over ``(ts, lsn)``, replay from
*any* checkpoint — including overlapping re-delivery — converges to the
same final state; the manifest fence exists to avoid wasted work and to
record lineage, not to protect correctness.

Reference analog: FiLiPo's probing loop keeps ``candidateOffsetMap`` so
an aborted run can resume sampling where it stopped
(AlignmentProcessor.java:46,1028,1135); the manifest is that bookkeeping
made durable and atomic.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from filipo_spark.table.icelet import CommitResult, IceletTable


@dataclass
class ReplayReport:
    epochs_applied: int = 0
    epochs_skipped: int = 0
    events_seen: int = 0
    commits: list[CommitResult] = field(default_factory=list)


def plan_epochs(lsn_min: int, lsn_max: int, batch_size: int) -> list[tuple[int, int]]:
    """Half-open (lo, hi] ranges covering [lsn_min, lsn_max]."""
    ranges = []
    lo = lsn_min - 1
    while lo < lsn_max:
        hi = min(lo + batch_size, lsn_max)
        ranges.append((lo, hi))
        lo = hi
    return ranges


def run_replay(
    spark: SparkSession,
    table: IceletTable,
    source: DataFrame,
    batch_size: int = 100_000,
    max_epochs: int | None = None,
    fail_after_data_write_on_epoch: int | None = None,
    compact_every: int = 0,
    compact_min_files: int = 8,
) -> ReplayReport:
    """Replay ``source`` (CHANGE_SCHEMA) into ``table`` in LSN-ordered epochs.

    ``compact_every=k`` folds over-fragmented buckets every k applied
    epochs (MoR maintenance — bounds read amplification during long
    replays).  ``fail_after_data_write_on_epoch`` is a test hook
    simulating a crash after data files land but before the commit
    pointer swaps (the dangerous window of any two-phase commit).
    """
    bounds = source.agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    report = ReplayReport(events_seen=bounds["n"] or 0)
    if bounds["n"] == 0:
        return report
    ranges = plan_epochs(bounds["lo"], bounds["hi"], batch_size)
    committed = table.committed_ranges()
    for epoch, (lo, hi) in enumerate(ranges):
        if max_epochs is not None and epoch >= max_epochs:
            break
        if (lo, hi) in committed:
            report.epochs_skipped += 1
            continue
        batch = source.where((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        if fail_after_data_write_on_epoch == epoch:
            _crash_mid_commit(spark, table, batch, epoch, lo, hi)
        res = table.apply_epoch(spark, batch, epoch, lo, hi)
        report.commits.append(res)
        report.epochs_applied += 1
        if compact_every and report.epochs_applied % compact_every == 0:
            table.compact(spark, min_files=compact_min_files, epoch=epoch)
    return report


def _crash_mid_commit(spark, table, batch, epoch, lo, hi) -> None:
    """Write data files exactly as a real commit would, then raise —
    leaving orphans that no snapshot references."""
    from filipo_spark.operators.dedup import lww_dedup
    from filipo_spark.operators.merge import bucket_of, merge_upserts
    import os

    winners = lww_dedup(batch).withColumn("_b", bucket_of(F.col("conv_id"), table.n_buckets))
    touched = sorted(r["_b"] for r in winners.select("_b").distinct().collect())
    old = table.read(spark, buckets=touched)
    new_phys = merge_upserts(old, winners.drop("_b"))
    orphan_dir = os.path.join(table.root, "data", "b=0", "snap-orphan-crash")
    new_phys.write.mode("overwrite").parquet(orphan_dir)
    raise RuntimeError(f"simulated crash mid-commit of epoch {epoch} ({lo},{hi}]")
