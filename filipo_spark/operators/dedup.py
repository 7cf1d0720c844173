"""Last-writer-wins dedup of a change micro-batch.

Semantics (BASELINE.json north_star): per key ``(conv_id, turn_idx)``
keep the event with max ``(ts, lsn)``; ``lsn`` is unique so the winner is
deterministic regardless of arrival order, batch boundaries, or replays —
the property that makes the whole MERGE pipeline idempotent and
order-insensitive.  The reference achieves re-run idempotence by
delete-then-insert on its function store (OutputManager.java:65-70,
296-303); LWW-by-(ts,lsn) is the streaming generalization.

Implementation notes (scale):

* Primary path is ``groupBy(key).agg(max_by(payload, (ts, lsn)))`` —
  a hash aggregate with *map-side partial aggregation*, so a hot key
  (one conversation receiving a large share of the stream) is reduced
  to one row per input partition **before** the shuffle.  This is
  structurally skew-proof: the shuffle carries at most
  ``n_partitions × n_hot_keys`` rows, not the raw event count.
  A window (`row_number` over the key) would instead sort the full hot
  partition on one reducer — strictly worse at 10^10 events.
* ``lww_dedup_salted`` is the explicit two-phase variant mandated by the
  north_star ("salted hash-partitioned key grouping"): phase 1 reduces
  per (key, salt) shard, phase 2 reduces shards globally.  Output is
  provably identical (max is associative/commutative); tests assert
  salt-count invariance.  Use it when the upstream operator forces a
  pre-existing partitioning that defeats partial aggregation.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from filipo_spark.schema import CHANGE_COLUMNS, KEY_COLUMNS

_ORDER = ("ts", "lsn")  # LWW ordering: event time, then log sequence number


def _payload_struct(df: DataFrame) -> Column:
    others = [c for c in df.columns if c not in KEY_COLUMNS]
    return F.struct(*[F.col(c) for c in others])


def lww_dedup(changes: DataFrame, key: list[str] | None = None) -> DataFrame:
    """One winning event per key: max_by(payload, (ts, lsn)).

    Returns the full change row (lsn, op, key, payload) of the winner,
    one row per distinct key in the batch.
    """
    key = key or KEY_COLUMNS
    # leading 64-bit key hash in the grouping: max_by's struct buffer
    # plans a SortAggregate, and long-common-prefix string keys defeat
    # the sorter's 8-byte prefix comparison; a hash column resolves the
    # comparisons without dereferencing row pages.  Same groups (the
    # hash is a function of the key), byte-identical winners.
    out = changes.withColumn("_gkh", F.xxhash64(*key)).groupBy("_gkh", *key).agg(
        F.max_by(_payload_struct(changes), F.struct(*_ORDER)).alias("_w")
    )
    others = [c for c in changes.columns if c not in key]
    cols = [F.col(c) for c in key] + [F.col(f"_w.{c}").alias(c) for c in others]
    return out.select(*cols).select(*[c for c in changes.columns])


def lww_dedup_salted(
    changes: DataFrame, n_salts: int = 8, key: list[str] | None = None
) -> DataFrame:
    """Two-phase salted LWW: per-(key, salt) arg-max, then global arg-max.

    Salt is derived from ``lsn`` (uniform over events, so a hot key's
    events spread across ``n_salts`` shards), phase 1 shuffles on
    (key, salt) — skew bounded by 1/n_salts — phase 2 on key over the
    already-tiny shard winners.
    """
    key = key or KEY_COLUMNS
    salted = changes.withColumn("_salt", F.pmod(F.xxhash64("lsn"), F.lit(n_salts)))
    phase1 = salted.groupBy(*key, "_salt").agg(
        F.max_by(_payload_struct(changes), F.struct(*_ORDER)).alias("_w")
    )
    others = [c for c in changes.columns if c not in key]
    shard = phase1.select(
        *key, *[F.col(f"_w.{c}").alias(c) for c in others]
    )
    return lww_dedup(shard, key=key).select(*[c for c in changes.columns])


def assert_change_columns(df: DataFrame) -> None:
    missing = [c for c in CHANGE_COLUMNS if c not in df.columns]
    if missing:
        raise ValueError(f"change batch missing columns: {missing}")
