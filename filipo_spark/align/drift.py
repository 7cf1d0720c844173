"""Per-batch mapping-health observation and drift-triggered re-alignment.

The reference re-probes the remote source on EVERY run — it re-extracts
and caches the sample set, then probes linkage points from scratch
(``AlignmentProcessor.java:72-95``).  A change stream at 10^10
events/day cannot afford a full probe per micro-batch, so the engine's
analog is a cheap health check on a bounded sample of each batch:

* ``unmapped_ratio`` — mean per-record fraction of payload fields
  (wildcard-collapsed) the current mapping does not claim.  Renames and
  nesting changes land here: after a shape flip the old mapping claims
  ~none of the keys and the ratio jumps toward 1.
* ``cast_fail_ratio`` — mean per-record fraction of mapped, typed
  target columns whose source value is present but stops casting to the
  target type.  Pure type drift (int → free text) lands here even when
  the field names are stable.

Either ratio above ``drift_threshold`` triggers ``align()`` on that
batch's own probe sample against the table's *current resolved state*,
a hot mapping swap, and a ``realign:`` evolution event in the commit
manifest recording the offset range, the observed ratios, and the new
mapping's content hash — per-partition lineage of schema evolution, the
north-star's "alignment drives ALTER-free MERGE" loop closed.

Cost shape: ONE small aggregation job over ``<= sample_rows`` records
per epoch (the limit is pushed into the scan), independent of batch
size; re-alignment itself runs only when triggered and is bounded by
``n_probe`` exactly like any other ``align()`` call.
"""

from __future__ import annotations

import hashlib
from typing import Any

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filipo_spark.align.mapper import WILDCARD_RE, Mapping, _payload_get, normalize_payload
from filipo_spark.schema import TARGET_SCHEMA

DRIFT_THRESHOLD = 0.5  # either health ratio above this triggers re-alignment


def mapping_hash(mapping: Mapping) -> str:
    """Content hash of the function-store artifact (manifest lineage id)."""
    return hashlib.sha256(mapping.to_json().encode()).hexdigest()[:12]


def mapping_health(
    batch: DataFrame, mapping: Mapping, sample_rows: int = 1024
) -> dict[str, Any]:
    """Observe how well ``mapping`` still fits a drifted batch.

    Returns ``{"unmapped_ratio", "cast_fail_ratio", "n_sampled"}`` from a
    single bounded aggregation over ``<= sample_rows`` non-delete records.
    An empty batch reports zeros (nothing to judge — keep the mapping).
    """
    import json as _json

    from pyspark.sql.types import StructType

    json_schema = (
        StructType.fromJson(_json.loads(mapping.payload_json_schema))
        if mapping.payload_json_schema
        else None
    )
    sample = normalize_payload(
        batch.where(F.col("op") != "D").limit(sample_rows), json_schema=json_schema
    )

    # mapped source fields: combined points contribute each part,
    # wildcard paths are already in collapsed [*] form
    mapped: set[str] = set()
    for src in mapping.as_dict().values():
        mapped.update(src.split("+"))
    keys = F.array_distinct(
        F.transform(
            F.map_keys("payload"),
            lambda k: F.regexp_replace(k, WILDCARD_RE, "[*]"),
        )
    )
    mapped_arr = F.array(*[F.lit(s) for s in sorted(mapped)])
    n_keys = F.size(keys)
    n_claimed = F.size(F.array_intersect(keys, mapped_arr))
    # a record whose payload parses to zero fields (e.g. a raw-JSON wire
    # shape the stored schema no longer matches) is fully unmapped
    unmapped_row = F.lit(1.0) - n_claimed / F.greatest(n_keys, F.lit(1))

    # cast health over single-source mapped columns with a non-string
    # target type (string targets can't fail a cast)
    fails = []
    m = mapping.as_dict()
    for f_ in TARGET_SCHEMA.fields:
        src = m.get(f_.name)
        if src is None or "+" in src or f_.dataType.simpleString() == "string":
            continue
        v = _payload_get(src)
        fails.append(
            (v.isNotNull() & v.try_cast(f_.dataType).isNull()).cast("double")
        )
    cast_fail_row = (
        sum(fails[1:], fails[0]) / F.lit(float(len(fails))) if fails else F.lit(0.0)
    )

    row = sample.agg(
        F.avg(unmapped_row).alias("unmapped"),
        F.avg(cast_fail_row).alias("cast_fail"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    return {
        "unmapped_ratio": round(float(row["unmapped"] or 0.0), 4),
        "cast_fail_ratio": round(float(row["cast_fail"] or 0.0), 4),
        "n_sampled": int(row["n"]),
    }


def should_realign(health: dict[str, Any], threshold: float = DRIFT_THRESHOLD) -> bool:
    return health["n_sampled"] > 0 and (
        health["unmapped_ratio"] > threshold or health["cast_fail_ratio"] > threshold
    )


def realign_event(
    scope: str, lo: int, hi: int, health: dict[str, Any] | None, mapping: Mapping
) -> str:
    """Manifest line for a (re-)alignment: offset range + trigger + hash."""
    reason = (
        "init"
        if health is None
        else f"unmapped={health['unmapped_ratio']},cast_fail={health['cast_fail_ratio']}"
    )
    return f"realign:{scope},offsets=({lo},{hi}],reason={reason},mapping={mapping_hash(mapping)}"
