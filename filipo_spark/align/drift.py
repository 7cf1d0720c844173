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
  are excluded (new keys are what inserts do); the probed sample is
  built delete-INCLUSIVE (deletes carry keys and key corruption can
  arrive on deletes alone).  Cost: with a ``KeyBloom`` sketch as
  ``target_keys`` (tables created with ``bloom_bits``, table/sketch.py)
  it is ONE bounded job over the sample plus a driver-side bit test —
  zero table data-file I/O, safe every epoch; with a key DataFrame it
  falls back to one column-pruned key scan of the table per check —
  O(table files) I/O, so enable the fallback on a cadence only.
* ``echo_mismatch_ratio`` (opt-in, needs ``echo_table``) — worst
  per-column disagreement between sampled UPDATE payloads and the
  table's CURRENT values for the same keys.  Value corruption of a
  NON-key string column under stable names, types and presence (e.g.
  ``text`` arriving base64-encoded) moves no other ratio — only a
  batch-vs-table value comparison sees it.  This is the reference's
  record-similarity gate (AlignmentProcessor.java:179-184) applied
  batch-vs-table: probe records that pair with a KB row are expected to
  mostly AGREE with it.  Legitimate churn on a column (every sampled
  update rewriting ``text``) can also trip it; the consequence is a
  re-alignment that re-learns the same mapping — wasted bounded work,
  never a wrong answer — so run it on a cadence.  Cost: a bucket-pruned
  read of only the sampled keys' buckets (≤ sample_rows buckets) with
  the bounded sample broadcast in.

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
    target_keys=None,
    echo_table=None,
) -> dict[str, Any]:
    """Observe how well ``mapping`` still fits a drifted batch.

    Returns ``{"unmapped_ratio", "cast_fail_ratio", "support_drop_ratio",
    "n_sampled"}`` from a single bounded aggregation over
    ``<= sample_rows`` non-delete records, plus ``key_miss_ratio`` when
    ``target_keys`` is provided (either a ``table/sketch.KeyBloom`` —
    the zero-table-I/O path — or a (conv_id, turn_idx) DataFrame, e.g.
    ``table.read_raw(spark).select(*KEY_COLUMNS)``), plus
    ``echo_mismatch_ratio`` when ``echo_table`` (an ``IceletTable``) is
    provided.  An empty batch reports zeros (nothing to judge — keep
    the mapping).
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
    # an empty main sample observes nothing — zero presence there is "no
    # evidence", not a drop (an all-delete purge batch must not read as
    # support collapse now that n_keys_sampled can unlock should_realign)
    support_drop = max(
        (
            max(0.0, (expected[s] - float(row[f"_p{i}"] or 0.0)) / expected[s])
            for i, s in enumerate(core)
        ),
        default=0.0,
    ) if int(row["n"]) else 0.0
    health = {
        "unmapped_ratio": round(float(row["unmapped"] or 0.0), 4),
        "cast_fail_ratio": round(float(row["cast_fail"] or 0.0), 4),
        "support_drop_ratio": round(support_drop, 4),
        "n_sampled": int(row["n"]),
    }

    if target_keys is not None:
        # NOT gated on the main sample's n: that sample excludes deletes,
        # and a purge batch (all deletes) with corrupted keys must still
        # be probe-visible — n_keys_sampled lets should_realign fire on
        # key evidence alone
        health["key_miss_ratio"], health["n_keys_sampled"] = _key_miss_ratio(
            batch, m, json_schema, target_keys, sample_rows
        )
    if echo_table is not None and int(row["n"]) > 0:
        health["echo_mismatch_ratio"] = _echo_mismatch_ratio(
            batch, mapping, json_schema, echo_table, sample_rows
        )
    return health


def _key_miss_ratio(
    batch: DataFrame, m: dict[str, str], json_schema, target_keys,
    sample_rows: int,
) -> tuple[float, int]:
    """Key-membership probe (opt-in; see module docstring for cost):
    mapped keys of sampled UPDATE/DELETE records must already exist in
    the table — a corrupted string key is ~100% misses, a normal insert
    is excluded.  The sample here is rebuilt delete-INCLUSIVE (the main
    health sample drops deletes because their payloads are key-only,
    but deletes DO carry keys and corruption can arrive on them alone).
    Null-mapping keys count as misses.

    ``target_keys`` as a ``KeyBloom``: one bounded job collects the
    distinct sampled keys WITH their Spark-computed bit positions; the
    membership test is a driver-side bit lookup — no table data file is
    read.  Bloom false positives can only UNDER-count misses (never a
    spurious alarm).  ``target_keys`` as a DataFrame: the same bounded
    collect supplies n_keys for free (one aggregation instead of the
    former separate count job), then one broadcast join counts hits
    against the column-pruned key scan.

    Returns ``(ratio, n_keys_sampled)``.
    """
    keyed = normalize_payload(
        batch.where(F.col("op") != "I").limit(sample_rows), json_schema=json_schema
    ).select(
        _payload_get(m["conv_id"]).cast("string").alias("conv_id"),
        _payload_get(m["turn_idx"]).try_cast("int").alias("turn_idx"),
    ).distinct()
    if isinstance(target_keys, DataFrame):
        rows = keyed.collect()
        if not rows:
            return 0.0, 0
        nonnull = [
            (r["conv_id"], r["turn_idx"]) for r in rows
            if r["conv_id"] is not None and r["turn_idx"] is not None
        ]
        n_hit = 0
        if nonnull:
            probe = batch.sparkSession.createDataFrame(
                nonnull, "conv_id string, turn_idx int"
            )
            n_hit = (
                target_keys.select("conv_id", "turn_idx")
                .join(F.broadcast(probe), on=["conv_id", "turn_idx"])
                .distinct()
                .count()
            )
        return round(1.0 - n_hit / len(rows), 4), len(rows)
    # KeyBloom sketch: positions are computed IN SPARK (same arithmetic
    # as the build side, table/sketch.py) and tested on the driver
    both = F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    rows = keyed.select(
        F.when(both, target_keys.positions(F.col("conv_id"), F.col("turn_idx")))
        .alias("pos")
    ).collect()
    if not rows:
        return 0.0, 0
    n_hit = sum(target_keys.contains_positions(r["pos"]) for r in rows)
    return round(1.0 - n_hit / len(rows), 4), len(rows)


def _echo_mismatch_ratio(
    batch: DataFrame, mapping: Mapping, json_schema, echo_table,
    sample_rows: int, min_comparable: int = 5,
) -> float:
    """Sampled echo audit (opt-in; see module docstring): map a bounded
    sample of UPDATE records through the current mapping and compare
    each mapped NON-key column against the table's current value for
    the same key — the worst per-column disagreement is the ratio.

    Per-column (not pooled) because corruption is a per-field event: a
    base64-mangled ``text`` among four healthy columns pools to ~0.25
    and would hide under any sane threshold.  Columns with fewer than
    ``min_comparable`` both-sides-non-null cells are skipped (a mostly
    null ``tool`` must not produce a noise ratio).  Keys the table does
    not hold drop out via the inner join (that failure mode belongs to
    ``key_miss_ratio``).  Timestamps compare at second precision (wire
    formats rarely carry more).

    Cost: two bounded jobs — a distinct-bucket collect over the ≤
    ``sample_rows`` sample, then ONE aggregation joining the broadcast
    sample to a read of only those buckets' files.
    """
    from filipo_spark.align.mapper import apply_mapping
    from filipo_spark.operators.merge import bucket_of, logical
    from filipo_spark.schema import KEY_COLUMNS

    spark = batch.sparkSession
    typed = apply_mapping(
        batch.where(F.col("op") == "U").limit(sample_rows), mapping
    ).where(
        F.col("conv_id").isNotNull() & F.col("turn_idx").isNotNull()
    ).dropDuplicates(KEY_COLUMNS)
    mapped_cols = [
        (f_.name, f_.dataType)
        for f_ in TARGET_SCHEMA.fields
        if f_.name in mapping.as_dict() and f_.name not in KEY_COLUMNS
    ]
    if not mapped_cols:
        return 0.0
    typed = typed.select(
        *KEY_COLUMNS, *[F.col(c).alias(f"_w_{c}") for c, _ in mapped_cols]
    )
    buckets = sorted(
        r["_b"]
        for r in typed.select(
            bucket_of(F.col("conv_id"), echo_table.n_buckets).alias("_b")
        ).distinct().collect()
    )
    if not buckets:
        return 0.0
    current = logical(echo_table.read(spark, buckets=buckets))
    joined = current.join(F.broadcast(typed), on=KEY_COLUMNS)
    aggs = []
    for c, dtype in mapped_cols:
        tv, wv = F.col(c), F.col(f"_w_{c}")
        if dtype.simpleString() == "timestamp":
            tv, wv = F.date_trunc("second", tv), F.date_trunc("second", wv)
        comparable = tv.isNotNull() & wv.isNotNull()
        aggs.append(F.sum(comparable.cast("long")).alias(f"_c_{c}"))
        aggs.append(F.sum((comparable & (tv != wv)).cast("long")).alias(f"_m_{c}"))
    row = joined.agg(*aggs).collect()[0]
    worst = 0.0
    for c, _ in mapped_cols:
        n_cmp = int(row[f"_c_{c}"] or 0)
        if n_cmp >= min_comparable:
            worst = max(worst, int(row[f"_m_{c}"] or 0) / n_cmp)
    return round(worst, 4)


_RATIO_KEYS = (
    "unmapped_ratio", "cast_fail_ratio", "support_drop_ratio", "key_miss_ratio",
    "echo_mismatch_ratio",
)


def should_realign(health: dict[str, Any], threshold: float = DRIFT_THRESHOLD) -> bool:
    # n_keys_sampled counts the delete-inclusive key-probe sample: an
    # all-delete purge batch has n_sampled == 0 yet must still be able
    # to fire on key-membership evidence
    observed = health["n_sampled"] > 0 or health.get("n_keys_sampled", 0) > 0
    return observed and any(health.get(k, 0.0) > threshold for k in _RATIO_KEYS)


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
        if "echo_mismatch_ratio" in health:
            reason += f",echo_mismatch={health['echo_mismatch_ratio']}"
    return f"realign:{scope},offsets=({lo},{hi}],reason={reason},mapping={mapping_hash(mapping)}"
