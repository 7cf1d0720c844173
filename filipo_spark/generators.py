"""Deterministic synthetic data generators (FIXTURES.md §1-3).

All randomness is *value-derived*: ``xxhash64(id, seed)`` on a
``spark.range`` spine — never ``rand()``, whose per-partition seeding
makes output depend on parallelism.  The same (n, seed) therefore yields
byte-identical rows at local[1] and local[32], which the replay-equality
tests (and the scaling bench) rely on.

No Python loops, no UDFs — pure column expressions, fully
whole-stage-codegen'd; generation throughput scales linearly with cores.

Reference analog: FiLiPo samples probe values with
``ORDER BY UUID() LIMIT n`` (KnowledgeBaseManagement.java:60-72); the
engine's sampling is the deterministic hash-order variant
(operators/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

ROLES = ["user", "assistant", "system", "tool"]
TOOLS = ["search", "python", "browser", "calculator", "none"]
_WORDS = (
    "the quick brown fox jumps over lazy dog spark stream merge upsert "
    "conversation transcript turn reply tool call result state change log"
).split()


def _h(seed: int, *cols) -> F.Column:
    """Deterministic non-negative 63-bit hash of (seed, cols)."""
    return F.abs(F.xxhash64(F.lit(seed), *cols))


def _pseudo_text(id_col: F.Column, seed: int, min_words: int = 3, max_words: int = 40) -> F.Column:
    """Deterministic pseudo-text: a repeated word sample with an id nonce.

    Uses array_repeat + slice over a word literal array — no Python loop.
    """
    words = F.array(*[F.lit(w) for w in _WORDS])
    n = (_h(seed + 1, id_col) % (max_words - min_words + 1) + min_words).cast("int")
    start = (_h(seed + 2, id_col) % len(_WORDS) + 1).cast("int")
    # rotate the word array deterministically, then take n words (wrapping)
    rotated = F.concat(F.slice(words, start, len(_WORDS)), F.slice(words, 1, start))
    body = F.array_join(F.slice(F.flatten(F.array_repeat(rotated, 3)), 1, n), " ")
    return F.concat(body, F.lit(" #"), F.conv(_h(seed + 3, id_col).cast("string"), 10, 16))


def gen_transcripts(
    spark: SparkSession, n_conv: int = 200, max_turns: int = 50, seed: int = 42
) -> DataFrame:
    """Target-table fixture: ~n_conv * max_turns/2 rows, key (conv_id, turn_idx)."""
    convs = spark.range(n_conv).select(
        F.format_string("conv-%08d", F.col("id")).alias("conv_id"),
        (_h(seed, F.col("id")) % (max_turns - 4) + 5).cast("int").alias("n_turns"),
        F.col("id").alias("cid"),
    )
    t = convs.select(
        "conv_id",
        "cid",
        F.explode(F.sequence(F.lit(0), F.col("n_turns") - 1)).alias("turn_idx"),
    )
    rid = F.col("cid") * max_turns + F.col("turn_idx")
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (_h(seed + 10, rid) % 4 + 1).cast("int")
    )
    return t.select(
        "conv_id",
        F.col("turn_idx").cast("int").alias("turn_idx"),
        role.alias("role"),
        _pseudo_text(rid, seed).alias("text"),
        F.when(
            role == "tool",
            F.element_at(
                F.array(*[F.lit(x) for x in TOOLS]), (_h(seed + 11, rid) % 5 + 1).cast("int")
            ),
        ).alias("tool"),
        (
            F.to_timestamp(F.lit("2024-01-01 00:00:00"))
            + F.make_interval(secs=(F.col("cid") * 3600 + F.col("turn_idx") * 60).cast("double"))
        ).alias("ts"),
    )


def gen_changelog(
    spark: SparkSession,
    n_conv: int = 200,
    n_events: int = 10_000,
    seed: int = 42,
    max_turns: int = 50,
    hot_frac: float = 0.01,
    hot_share: float = 0.2,
    dup_rate: float = 0.02,
    ooo_rate: float = 0.05,
    del_rate: float = 0.03,
    update_rate: float = 0.30,
) -> DataFrame:
    """Binlog-shaped change stream (FIXTURES.md §2), lsn strictly increasing.

    Skew: ``hot_share`` of events land on ``hot_frac`` of conversations
    (hot-conversation skew the salted/agg dedup must absorb).  ``dup_rate``
    exact duplicates (same key+payload, later lsn), ``ooo_rate``
    out-of-order timestamps, ``del_rate`` deletes, rest I/U.

    Expected final state per key: payload of max (ts, lsn); absent if that
    event is a delete — the LWW invariant the whole engine is built on.
    """
    n_hot = max(1, int(n_conv * hot_frac))
    e = spark.range(n_events).withColumnRenamed("id", "lsn")
    u = (_h(seed + 20, F.col("lsn")) % 1_000_000) / 1_000_000.0  # uniform [0,1)
    conv_num = (
        F.when(u < hot_share, _h(seed + 21, F.col("lsn")) % n_hot)
        .otherwise(_h(seed + 22, F.col("lsn")) % n_conv)
        .cast("long")
    )
    e = e.withColumn("conv_num", conv_num)
    e = e.withColumn("turn_idx", (_h(seed + 23, F.col("lsn")) % max_turns).cast("int"))

    v = (_h(seed + 24, F.col("lsn")) % 1_000_000) / 1_000_000.0
    op = (
        F.when(v < del_rate, F.lit("D"))
        .when(v < del_rate + update_rate, F.lit("U"))
        .otherwise(F.lit("I"))
    )
    e = e.withColumn("op", op)

    rid = F.col("conv_num") * max_turns + F.col("turn_idx") + F.col("lsn") * 7919
    role = F.element_at(
        F.array(*[F.lit(r) for r in ROLES]), (_h(seed + 25, rid) % 4 + 1).cast("int")
    )
    w = (_h(seed + 26, F.col("lsn")) % 1_000_000) / 1_000_000.0
    # event time: base + lsn seconds, pushed backwards for the ooo fraction
    ts = F.to_timestamp(F.lit("2024-02-01 00:00:00")) + F.make_interval(
        secs=F.when(w < ooo_rate, F.col("lsn") - (_h(seed + 27, F.col("lsn")) % 5000))
        .otherwise(F.col("lsn"))
        .cast("double")
    )
    base = e.select(
        "lsn",
        "op",
        F.format_string("conv-%08d", F.col("conv_num")).alias("conv_id"),
        "turn_idx",
        F.when(op != "D", role).alias("role"),
        F.when(op != "D", _pseudo_text(rid, seed + 28)).alias("text"),
        F.when(
            (op != "D") & (role == "tool"),
            F.element_at(
                F.array(*[F.lit(x) for x in TOOLS]), (_h(seed + 29, rid) % 5 + 1).cast("int")
            ),
        ).alias("tool"),
        ts.alias("ts"),
    )
    # exact duplicates: re-emit a dup_rate sample with a later unique lsn,
    # same payload & ts (idempotence food for the dedup stage)
    dups = base.where((_h(seed + 30, F.col("lsn")) % 1_000_000) / 1e6 < dup_rate).withColumn(
        "lsn", F.col("lsn") + n_events
    )
    return base.unionByName(dups)


def gen_echo_changelog(target: DataFrame, start_lsn: int = 10_000_000) -> DataFrame:
    """Change events that echo current target rows (op=U, payload = row
    values) — the probe-sample shape the alignment mapper trains on.

    Mirrors FiLiPo's probing contract: the API is called *with KB values*
    so responses describe the same entities (AlignmentProcessor.java:
    967-1044); here a sampled slice of the stream echoes rows the target
    already holds (e.g. freshly-applied inserts re-observed as updates).

    LSNs are key-derived hashes (no global row_number window — that
    single-tasked the whole target through one sort at scale); a 2^40
    range makes fixture-level collisions negligible.
    """
    return target.select(
        (
            F.pmod(F.xxhash64("conv_id", "turn_idx"), F.lit(1 << 40)) + start_lsn
        ).cast("long").alias("lsn"),
        F.lit("U").alias("op"),
        "conv_id",
        "turn_idx",
        "role",
        "text",
        "tool",
        "ts",
    )


# --- drift profiles (FIXTURES.md §3) ----------------------------------------

DRIFT_RENAME = {
    "conv_id": "conversation_id",
    "turn_idx": "turnIndex",
    "role": "role",
    "text": "content",
    "tool": "tool_name",
    "ts": "event_time",
}


def gen_drifted(changes: DataFrame, profile: str = "rename") -> DataFrame:
    """Re-shape a changelog into (lsn, op, payload map) under a drift profile.

    ``rename``: 1:1 renamed keys.  ``typedrift``: renames + stringly-typed
    ints/timestamps (ISO-8601).  ``nested``: dotted/indexed path keys the
    mapper must wildcard-collapse (ResponseConverter.java:26-27 analog).
    Ground truth mapping for golden tests is DRIFT_RENAME-style dicts in
    tests/test_mapper.py.
    """
    c = changes
    iso_ts = F.date_format("ts", "yyyy-MM-dd'T'HH:mm:ss")
    if profile == "rename":
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
        ]
    elif profile == "typedrift":
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turn_index", F.col("turn_idx").cast("string")),
            ("author_role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
        ]
    elif profile == "nested":
        entries = [
            ("message.conv", F.col("conv_id")),
            ("message.idx", F.col("turn_idx").cast("string")),
            ("message.meta.role", F.col("role")),
            ("message.text", F.col("text")),
            ("tools[0].name", F.col("tool")),
            ("message.meta.time", iso_ts),
        ]
    elif profile == "deepdecoy":
        # nested + a deeper perfect copy of role: equal votes/confidence,
        # decided only by the path-depth discount (C12) — the shallower
        # true path must win
        entries = [
            ("message.conv", F.col("conv_id")),
            ("message.idx", F.col("turn_idx").cast("string")),
            ("message.meta.role", F.col("role")),
            ("message.meta.debug.role", F.col("role")),
            ("message.text", F.col("text")),
            ("tools[0].name", F.col("tool")),
            ("message.meta.time", iso_ts),
        ]
    elif profile == "wildshare":
        # nested + a partial flat copy of tool (20% of rows): the
        # tools[*].name family no longer owns all votes for `tool`, so
        # its wildcard prefix-share confidence (A10/A11) drops strictly
        # below 1.  (Share kept below the depth discount's break-even —
        # a flat copy on a majority of rows legitimately outranks a
        # depth-2 wildcard under C12, as in the reference.)
        entries = [
            ("message.conv", F.col("conv_id")),
            ("message.idx", F.col("turn_idx").cast("string")),
            ("message.meta.role", F.col("role")),
            ("message.text", F.col("text")),
            ("tools[0].name", F.col("tool")),
            ("message.meta.time", iso_ts),
            (
                "tool_alias",
                F.when(F.pmod(F.xxhash64("lsn"), F.lit(5)) < 1, F.col("tool")),
            ),
        ]
    elif profile == "json":
        # raw nested JSON strings — the wire shape a real drifted WAL
        # arrives in (ResponseConverter.java:16-54 ingestion analog);
        # flattens to the same dotted paths as the 'nested' profile.
        # to_json omits null fields (tool on non-tool turns), mirroring
        # the map profiles' map_filter(v IS NOT NULL).
        payload = F.to_json(
            F.struct(
                F.struct(
                    F.col("conv_id").alias("conv"),
                    F.col("turn_idx").alias("idx"),
                    F.struct(F.col("role").alias("role"), iso_ts.alias("time")).alias(
                        "meta"
                    ),
                    F.col("text").alias("text"),
                ).alias("message"),
                F.array(F.struct(F.col("tool").alias("name"))).alias("tools"),
            )
        )
        return c.select("lsn", "op", payload.alias("payload"))
    elif profile == "split":
        # text delivered split in two (FiLiPo's first+last-name combined
        # linkage case, AlignmentProcessor.java:674-717)
        half = F.floor(F.length("text") / 2).cast("int")
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("text_head", F.col("text").substr(F.lit(1), half)),
            ("text_tail", F.col("text").substr(half + 1, F.length("text"))),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
        ]
    elif profile == "mergedtext":
        # the combined-point breaker: same wire as 'split' EXCEPT text now
        # arrives whole in one NEW field — ONLY the text_head+text_tail
        # combined linkage point breaks (every other field keeps its name
        # and type), so neither unmapped_ratio (1 new key of 6 ≈ 0.17)
        # nor cast_fail_ratio moves; the support-presence drift term
        # (align/drift.py support_drop_ratio) is what must catch it
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("body", F.col("text")),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
        ]
    elif profile == "b64text":
        # the echo-audit fixture: SAME wire as 'rename' except the text
        # VALUE arrives base64-encoded under the unchanged field name —
        # names stable (unmapped_ratio ~0), target type string (cast_fail
        # 0), presence full (support_drop 0), keys intact (key_miss 0).
        # Only a sampled batch-vs-table value comparison can see it
        # (align/drift.py echo_mismatch_ratio; the reference's
        # record-similarity gate, AlignmentProcessor.java:179-184,
        # applied batch-vs-table)
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.base64(F.col("text").cast("binary"))),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
        ]
    elif profile == "punct":
        # tool ids arrive dash-mangled ("s--e--a--r--c--h"): every fuzzy
        # metric scores < 0.5 against "search", but the reference's
        # isbn-issn RegExer rule (strip '-') proves identity — the
        # fixture that exercises the compiled ruleset (RegExer.java:6-15)
        dashed = F.when(
            F.col("tool").isNotNull(), F.concat_ws("--", F.split(F.col("tool"), ""))
        )
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", dashed),
            ("event_time", iso_ts),
        ]
    elif profile == "wrapped":
        # tool ids arrive wrapped in a stable envelope
        # ("id::tool::search::v2::x"): every fuzzy metric scores < 0.5
        # (the envelope is longer than the id) and no strip rule of the
        # RegExer ruleset recovers it — only a LEARNED structural
        # equality (token containment) can: the default X2 classifier's
        # fixture (GbClassifier.java:12-26)
        wrapped_tool = F.when(
            F.col("tool").isNotNull(),
            F.concat(F.lit("id::tool::"), F.col("tool"), F.lit("::v2::x")),
        )
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", wrapped_tool),
            ("event_time", iso_ts),
        ]
    elif profile == "errorpage":
        # rename + degenerate response fields (the reference's modal
        # "error page" analog, AlignmentProcessor.java:251-310): `status`
        # is constant and `shard` is 90%-modal — both must be pruned from
        # the probe sample before voting (J4 wiring, error_threshold
        # config.json:22)
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
            ("status", F.lit("ok")),
            (
                "shard",
                F.when(F.pmod(F.xxhash64("lsn"), F.lit(10)) < 9, F.lit("s-1")).otherwise(
                    F.lit("s-2")
                ),
            ),
        ]
    elif profile == "decoy":
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("role", F.col("role")),
            ("content", F.col("text")),
            ("tool_name", F.col("tool")),
            ("event_time", iso_ts),
            # decoy: copies role values on some rows — must NOT out-vote `role`
            (
                "author_role",
                F.when(F.pmod(F.xxhash64("lsn"), F.lit(5)) < 2, F.col("role")).otherwise(
                    F.lit("moderator")
                ),
            ),
            ("comment", F.substring(F.col("text"), 1, 5)),
        ]
    elif profile == "mixed":
        # every drift family at once, on disjoint column subsets:
        # rename (keys), nested paths (role/ts), split (text), wildcard
        # (tool), plus both decoy kinds.  The decoy copy share stays
        # under the C12 depth-discount break-even (a flat copy on a
        # majority of rows would legitimately outrank a depth-3 path).
        half = F.floor(F.length("text") / 2).cast("int")
        entries = [
            ("conversation_id", F.col("conv_id")),
            ("turnIndex", F.col("turn_idx").cast("string")),
            ("message.meta.role", F.col("role")),
            ("text_head", F.col("text").substr(F.lit(1), half)),
            ("text_tail", F.col("text").substr(half + 1, F.length("text"))),
            ("tools[0].name", F.col("tool")),
            ("message.meta.time", iso_ts),
            (
                "author_role",
                F.when(F.pmod(F.xxhash64("lsn"), F.lit(5)) < 1, F.col("role")).otherwise(
                    F.lit("moderator")
                ),
            ),
            ("comment", F.substring(F.col("text"), 1, 5)),
        ]
    else:
        raise ValueError(f"unknown drift profile: {profile}")
    pairs = [x for name, col in entries for x in (F.lit(name), col)]
    payload = F.map_filter(F.map_from_arrays(
        F.array(*pairs[0::2]), F.array(*pairs[1::2])
    ), lambda k, v: v.isNotNull())
    return c.select("lsn", "op", payload.alias("payload"))
