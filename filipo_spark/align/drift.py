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
* ``support_drop_ratio`` — worst relative presence shortfall across the
  mapping's CORE source fields (expected support ≥ ``CORE_SUPPORT``;
  the mapping records each field's align-time availability as
  ``support`` — FiLiPo's dataAvailability, OutputManager.java:81-82).
  A drift that breaks only ONE mapped field — e.g. a combined
  ``text_head+text_tail`` pair merged into a single new field — moves
  ``unmapped_ratio`` by just 1/n_fields (below any sane threshold) and
  fails no casts, but its parts' presence collapses from ~1.0 to 0 and
  this ratio hits 1.0.  Sparse fields (support < ``CORE_SUPPORT``,
  e.g. a tool id only present on tool turns) are excluded: their
  absence from a window is normal variation, not drift.
* ``key_miss_ratio`` (opt-in, needs ``target_keys``) — fraction of
  sampled UPDATE/DELETE records whose mapped key no longer matches any
  key the table has ever seen.  Value-level corruption of a
  string-typed KEY column (e.g. ``conv_id`` arriving prefixed) changes
  neither names nor casts; only a membership probe sees it.  Inserts
  are excluded (new keys are what inserts do).  Cost: one
  column-pruned key scan of the table per check — bounded sample
  broadcast in, but still O(table files) I/O, so enable it on a cadence
  (every k-th epoch), not unconditionally at 100 TB.

Remaining documented blind spot: value corruption of a NON-key string
column under stable field names and presence (e.g. ``text`` now base64)
is indistinguishable from legitimate content without target echoes —
no batch-side statistic moves; it surfaces downstream or via sampled
end-to-end audits.

Any ratio above ``drift_threshold`` triggers ``align()`` on that
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

DRIFT_THRESHOLD = 0.5  # any health ratio above this triggers re-alignment
CORE_SUPPORT = 0.8  # fields at least this available at align time are "core"


def mapping_hash(mapping: Mapping) -> str:
    """Content hash of the function-store artifact (manifest lineage id)."""
    return hashlib.sha256(mapping.to_json().encode()).hexdigest()[:12]


def mapping_health(
    batch: DataFrame,
    mapping: Mapping,
    sample_rows: int = 1024,
    target_keys: DataFrame | None = None,
) -> dict[str, Any]:
    """Observe how well ``mapping`` still fits a drifted batch.

    Returns ``{"unmapped_ratio", "cast_fail_ratio", "support_drop_ratio",
    "n_sampled"}`` from a single bounded aggregation over
    ``<= sample_rows`` non-delete records, plus ``key_miss_ratio`` when
    ``target_keys`` (a (conv_id, turn_idx) DataFrame, e.g.
    ``table.read_raw(spark).select(*KEY_COLUMNS)``) is provided.
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

    # expected availability per source field, from the function store:
    # key fields echo on every record (pairing required them); column
    # mappings carry their align-time support, combined parts inherit
    # their point's support.  Presence shortfall is judged on CORE
    # fields only (see module docstring).
    expected: dict[str, float] = {s: 1.0 for s in mapping.key_fields.values()}
    for r in mapping.columns:
        for part in r["src_field"].split("+"):
            expected[part] = max(expected.get(part, 0.0), float(r.get("support", 1.0)))
    core = sorted(s for s, e in expected.items() if e >= CORE_SUPPORT)

    row = sample.agg(
        F.avg(unmapped_row).alias("unmapped"),
        F.avg(cast_fail_row).alias("cast_fail"),
        F.count(F.lit(1)).alias("n"),
        *[
            F.avg(F.array_contains(keys, F.lit(s)).cast("double")).alias(f"_p{i}")
            for i, s in enumerate(core)
        ],
    ).collect()[0]
    support_drop = max(
        (
            max(0.0, (expected[s] - float(row[f"_p{i}"] or 0.0)) / expected[s])
            for i, s in enumerate(core)
        ),
        default=0.0,
    )
    health = {
        "unmapped_ratio": round(float(row["unmapped"] or 0.0), 4),
        "cast_fail_ratio": round(float(row["cast_fail"] or 0.0), 4),
        "support_drop_ratio": round(support_drop, 4),
        "n_sampled": int(row["n"]),
    }

    if target_keys is not None and int(row["n"]) > 0:
        # key-membership probe (opt-in; see module docstring for cost):
        # mapped keys of sampled UPDATE/DELETE records must already exist
        # in the table — a corrupted string key is 100% misses, a normal
        # insert is excluded.  Null-mapping keys count as misses.
        upd = (
            sample.where(F.col("op") != "I")
            .select(
                _payload_get(m["conv_id"]).cast("string").alias("conv_id"),
                _payload_get(m["turn_idx"]).try_cast("int").alias("turn_idx"),
            )
            .distinct()
        )
        n_upd = upd.count()
        if n_upd:
            n_hit = (
                target_keys.select("conv_id", "turn_idx")
                .join(F.broadcast(upd.dropna()), on=["conv_id", "turn_idx"])
                .distinct()
                .count()
            )
            health["key_miss_ratio"] = round(1.0 - n_hit / n_upd, 4)
        else:
            health["key_miss_ratio"] = 0.0
    return health


_RATIO_KEYS = (
    "unmapped_ratio", "cast_fail_ratio", "support_drop_ratio", "key_miss_ratio"
)


def should_realign(health: dict[str, Any], threshold: float = DRIFT_THRESHOLD) -> bool:
    return health["n_sampled"] > 0 and any(
        health.get(k, 0.0) > threshold for k in _RATIO_KEYS
    )


def realign_event(
    scope: str, lo: int, hi: int, health: dict[str, Any] | None, mapping: Mapping
) -> str:
    """Manifest line for a (re-)alignment: offset range + trigger + hash."""
    if health is None:
        reason = "init"
    else:
        reason = (
            f"unmapped={health['unmapped_ratio']},"
            f"cast_fail={health['cast_fail_ratio']},"
            f"support_drop={health.get('support_drop_ratio', 0.0)}"
        )
        if "key_miss_ratio" in health:
            reason += f",key_miss={health['key_miss_ratio']}"
    return f"realign:{scope},offsets=({lo},{hi}],reason={reason},mapping={mapping_hash(mapping)}"
