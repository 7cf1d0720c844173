"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship CDC replay on sf0.001.
``queries()`` — one entry per implemented operator (SURVEY.md §2 ids in
each docstring); callables take (spark, sf_dir) → DataFrame.
``oracle_sql()`` — DuckDB-equivalent ANSI SQL per query (tables
region/nation/customer/supplier/part/orders/lineitem/events/documents/
embeddings pre-registered as views).
"""

from __future__ import annotations

import shutil
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _utc(spark: SparkSession) -> SparkSession:
    spark.conf.set("spark.sql.session.timeZone", "UTC")
    return spark


def _materialized(spark: SparkSession, df: DataFrame) -> DataFrame:
    """Materialize and cut lineage — for queries that stand up a
    throwaway Icelet table: the returned DataFrame must not depend on
    temp files the query deletes on the way out (correctness/bench runs
    used to leak one table dir per invocation).  ``localCheckpoint``
    stores the computed partitions in executor block storage; the old
    ``createDataFrame(df.collect(), ...)`` shipped every row through the
    Python driver twice (collect + re-serialize), which at bench scale
    was seconds of single-threaded driver work per query.  Trade-off
    (accepted for this single-process harness): checkpoint blocks are
    not recomputable, so on a cluster with executor loss/preemption a
    reliable ``checkpoint()`` to shared storage would be the right
    variant."""
    return df.localCheckpoint(eager=True)


def _spread(df: DataFrame, *cols: str) -> DataFrame:
    """Hash-exchange right after the read: each driver testdata table is
    ONE parquet file with ONE row group — an unsplittable input whose
    scan (and everything Spark fuses into the scan stage, e.g. the
    map-side half of an aggregation) runs as a single task no matter the
    core count.  Repartitioning immediately after such a read is the
    standard remedy; keying the exchange by a column the downstream
    grouping/join/window also uses lets that operator reuse this exact
    partitioning, so the plan still carries ONE exchange total.
    Partition count follows the session's shuffle setting — never a
    hard-coded local constant."""
    n = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    return df.repartition(n, *cols)


def _rebalance(df: DataFrame) -> DataFrame:
    """`_spread` on the LWW key — the CDC changes-stream variant."""
    return _spread(df, "conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# CDC core (SURVEY §2.3 J-merge, §2.4 dedup agg, §2.5 LWW window, §2.9)
# ---------------------------------------------------------------------------

_LWW_ORACLE = """
WITH ch AS ({changes}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch)
"""


def q_cdc_lww_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: replay events-derived changelog from empty via LWW MERGE.

    SURVEY §2.5 (LWW dedup window), §2.3 (MERGE), reference anchor
    OutputManager.java:65-303 (idempotent delete-then-insert upsert).
    """
    from filipo_spark.operators.merge import canonical, changes_to_physical, logical, lww_resolve
    from filipo_spark.sources import changes_from_events

    _utc(spark)
    ch = _rebalance(changes_from_events(spark, sf_dir))
    # replay-from-empty: apply_batch(empty, ch) unions an empty state in
    # first, which erases the rebalance exchange's partitioning and
    # forces a second full exchange before the fold — folding the
    # changes directly is the same relation (the empty leg contributes
    # no rows) with ONE exchange
    return canonical(logical(lww_resolve(changes_to_physical(ch))))


def q_cdc_batched_replay(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same final state applied in 3 adversarial hash-split batches —
    batch-boundary invariance of the LWW MERGE fold (north_star)."""
    from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical
    from filipo_spark.schema import TARGET_SCHEMA
    from filipo_spark.sources import changes_from_events

    _utc(spark)
    ch = _rebalance(changes_from_events(spark, sf_dir))
    state = to_physical(spark.createDataFrame([], TARGET_SCHEMA))
    for k in range(3):
        state = apply_batch(state, ch.where(F.pmod(F.xxhash64("lsn"), F.lit(3)) == k))
    return canonical(logical(state))


def q_lww_dedup_winners(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-key winning event (op included) — dedup stage in isolation.
    SURVEY §2.5 row_number analog; engine uses max_by (dedup.py)."""
    from filipo_spark.operators.dedup import lww_dedup
    from filipo_spark.sources import changes_from_events

    _utc(spark)
    w = lww_dedup(_rebalance(changes_from_events(spark, sf_dir)))
    return w.select("conv_id", "turn_idx", "lsn", "op").orderBy("conv_id", "turn_idx")


# ---------------------------------------------------------------------------
# Profiling (SURVEY A1-A3, C4; TripleAnalyzer.java:32-45)
# ---------------------------------------------------------------------------

def q_schema_profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 functionality + type sniffing on `orders`."""
    from filipo_spark.operators.profile import schema_profile
    from filipo_spark.sources import read_table

    _utc(spark)
    return schema_profile(
        _spread(read_table(spark, sf_dir, "orders"), "o_orderkey")
    ).orderBy("column_name")


def q_type_triples_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A2 schema aggregation: instance values aggregated to type-level
    triples (subject_type, predicate, object_type, n) —
    TripleAnalyzer.java:32-45 feeding SchemaExtractor.java:96-133."""
    from filipo_spark.operators.profile import type_triples
    from filipo_spark.sources import read_table

    _utc(spark)
    return type_triples(read_table(spark, sf_dir, "orders"), "orders").orderBy(
        "predicate", "object_type"
    )


def q_sql_brand_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2 catalog dispatch: tables registered as views, query issued
    through the SQL surface (spark.sql) — Catalyst plans it identically
    to the DataFrame API (QueryProcessor.java:16-36 analog)."""
    from filipo_spark.sources import register_tables

    _utc(spark)
    register_tables(spark, sf_dir, ["lineitem", "part"])
    return spark.sql(
        """
        SELECT p_brand,
               ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
               COUNT(*) AS n_items
        FROM lineitem JOIN part ON l_partkey = p_partkey
        GROUP BY p_brand
        ORDER BY revenue DESC, p_brand
        LIMIT 10
        """
    )


def q_identifier_detection(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A1 identifier detection: functionality >= 0.996 (config.json:25)."""
    from filipo_spark.operators.profile import identifiers, schema_profile
    from filipo_spark.sources import read_table

    _utc(spark)
    return identifiers(schema_profile(read_table(spark, sf_dir, "orders"))).orderBy(
        "column_name"
    )


# ---------------------------------------------------------------------------
# Aggregations / windows / joins on TPC-H-ish tables (SURVEY A5-A7, J, O5)
# ---------------------------------------------------------------------------

def q_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation (A-family: grouped sums/avgs + sort)."""
    from filipo_spark.sources import read_table

    _utc(spark)
    li = read_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 2).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 2).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 2
            ).alias("sum_disc_price"),
            F.round(F.avg("l_quantity"), 4).alias("avg_qty"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


def q_argmax_vote(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A6+A7: vote count per (user, event_type) then arg-max per user with
    deterministic tie rule (desc count, asc type) —
    AlignmentProcessor.java:528-588."""
    from filipo_spark.sources import read_table
    from pyspark.sql import Window

    _utc(spark)
    e = _spread(read_table(spark, sf_dir, "events"), "user_id")
    votes = e.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("votes"))
    w = Window.partitionBy("user_id").orderBy(F.desc("votes"), F.asc("event_type"))
    return (
        votes.withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .select("user_id", "event_type", "votes")
        .orderBy("user_id")
    )


def q_wildcard_collapse(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A8+C8: wildcard re-aggregation — digits→[*] then re-sum counts
    (AlignmentProcessor.java:591-636, regex at :599)."""
    from filipo_spark.sources import read_table

    _utc(spark)
    d = read_table(spark, sf_dir, "documents")
    return (
        d.withColumn("path", F.regexp_replace("source", r"\d+", "[*]"))
        .groupBy("path", "lang")
        .agg(F.count(F.lit(1)).alias("votes"))
        .orderBy("path", "lang")
    )


def q_revenue_by_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J: customer ⋈ orders ⋈ broadcast(nation) — broadcast hash join on
    the small dim (J3 analog: TripleAnalyzer.java:91-137 types lookup)."""
    from filipo_spark.sources import read_table

    _utc(spark)
    c = read_table(spark, sf_dir, "customer")
    o = _spread(read_table(spark, sf_dir, "orders"), "o_custkey")
    n = read_table(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.round(F.sum("o_totalprice"), 2).alias("revenue"),
            F.count(F.lit(1)).alias("n_orders"),
        )
        .orderBy("n_name")
    )


def q_sample_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O1/§2.5: deterministic per-group sampling — k rows per group in
    md5 hash order (engine version of `ORDER BY UUID() LIMIT n`,
    KnowledgeBaseManagement.java:60-72, made replayable)."""
    from filipo_spark.operators.sampling import sample_per_group
    from filipo_spark.sources import read_table

    _utc(spark)
    s = read_table(spark, sf_dir, "supplier")
    return sample_per_group(s, group="s_nationkey", order_key="s_name", k=2).select(
        "s_nationkey", "s_name"
    ).orderBy("s_nationkey", "s_name")


def q_topk_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """O5: global top-k by a confidence-like score (desc sort + limit),
    SupportConfidenceProcessor.java:43-45."""
    from filipo_spark.sources import read_table

    _utc(spark)
    e = read_table(spark, sf_dir, "events")
    return (
        e.groupBy("event_type")
        .agg(F.round(F.avg("value"), 4).alias("confidence"), F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("confidence"), "event_type")
        .limit(3)
    )


# ---------------------------------------------------------------------------
# Training-data pipeline ops on documents/embeddings (build-brief additions)
# ---------------------------------------------------------------------------

def q_dedup_exact_docs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact dedup: hash-groupBy on normalized-text fingerprint."""
    from filipo_spark.operators.dedup_text import exact_dedup
    from filipo_spark.sources import read_table

    _utc(spark)
    return exact_dedup(read_table(spark, sf_dir, "documents")).orderBy("fp")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-dup pairs via word-3-shingle Jaccard (inverted-index join);
    the stop-shingle blowup guard is on by default (max_doc_freq='auto',
    mirrored in the oracle)."""
    from filipo_spark.operators.dedup_text import ngram_jaccard_pairs
    from filipo_spark.sources import read_table

    _utc(spark)
    return ngram_jaccard_pairs(
        read_table(spark, sf_dir, "documents"), threshold=0.35
    ).orderBy("doc_a", "doc_b")


def q_minhash_signatures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash signatures (k=4, md5-based → engine-portable)."""
    from filipo_spark.operators.dedup_text import minhash_signatures
    from filipo_spark.sources import read_table

    _utc(spark)
    return minhash_signatures(
        read_table(spark, sf_dir, "documents"), k_hashes=4
    ).orderBy("doc")


def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash LSH banding → candidate pairs → candidates-only
    exact-Jaccard verify (md5 band signatures are engine-portable, so
    the whole pipeline is DuckDB-oracled)."""
    from filipo_spark.operators.dedup_text import minhash_lsh_pairs
    from filipo_spark.sources import read_table

    _utc(spark)
    return minhash_lsh_pairs(
        read_table(spark, sf_dir, "documents"),
        k_hashes=8, bands=4, verify_threshold=0.35,
    ).orderBy("doc_a", "doc_b")


def q_simhash_near_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dups: ALL pairs with Hamming ≤ 8 (pigeonhole chunk
    count derived from max_hamming → recall-complete, semantically exact
    output).  The md5 hash backend makes it DuckDB-oracled."""
    from filipo_spark.operators.dedup_text import simhash_near_pairs
    from filipo_spark.sources import read_table

    _utc(spark)
    return simhash_near_pairs(
        read_table(spark, sf_dir, "documents"), max_hamming=8, hash_fn="md5"
    ).orderBy("doc_a", "doc_b")


def q_text_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token counting (ws + BPE-ish), quality score, language ID,
    md5 fingerprint — per document."""
    from filipo_spark.functions.text import (
        fingerprint_md5,
        lang_id,
        quality_score,
        token_count_bpe,
        token_count_ws,
    )
    from filipo_spark.sources import read_table

    _utc(spark)
    d = read_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count_ws(F.col("text")).alias("n_ws"),
        token_count_bpe(F.col("text")).alias("n_bpe"),
        quality_score(F.col("text")).alias("quality"),
        lang_id(F.col("text")).alias("lang_guess"),
        fingerprint_md5(F.col("text")).alias("fp"),
    ).orderBy("doc_id")


def q_winnowing_fp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling-hash document fingerprints (winnowing: min md5 k-gram
    hash per sliding window) — (doc_id, fp) rows over the FULL documents
    table (per-doc linear window scan; partition = doc)."""
    from filipo_spark.operators.dedup_text import winnowing_fingerprints
    from filipo_spark.sources import read_table

    _utc(spark)
    d = read_table(spark, sf_dir, "documents")
    return winnowing_fingerprints(d).select(
        F.col("doc").alias("doc_id"), "fp"
    ).orderBy("doc_id", "fp")


def q_cosine_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brute-force cosine top-3 for the first 5 vectors (ANN baseline)."""
    from filipo_spark.operators.similarity_join import cosine_topk
    from filipo_spark.sources import read_table

    _utc(spark)
    emb = read_table(spark, sf_dir, "embeddings")
    return cosine_topk(emb, emb.where("vec_id < 5"), k=3).orderBy("query_id", "rank")


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-bucketed approximate top-k (scale path; recall asserted in
    tests).  Deterministic centroid seed + rounded assignment scores
    make the whole plan DuckDB-oracled."""
    from filipo_spark.operators.similarity_join import ann_ivf_topk
    from filipo_spark.sources import read_table

    _utc(spark)
    emb = read_table(spark, sf_dir, "embeddings")
    return ann_ivf_topk(
        emb, emb.where("vec_id < 5"), k=3, n_centroids=8, n_probes=4
    ).orderBy("query_id", "rank")


def q_embedding_near_dups(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs, IVF-bucketed (dedup family's
    vector member; exact cosine only on bucket-sharing candidates)."""
    from filipo_spark.operators.similarity_join import embedding_near_dups
    from filipo_spark.sources import read_table

    _utc(spark)
    return embedding_near_dups(
        read_table(spark, sf_dir, "embeddings"),
        threshold=0.42, n_centroids=8, n_probes=2,
    ).orderBy("id_a", "id_b")


def q_media_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal plumbing: binary payloads → mapInPandas feature
    extraction (decode kernel stubbed; Arrow path real) — rows-only."""
    from filipo_spark.functions.multimodal import extract_features, gen_media

    _utc(spark)
    return (
        extract_features(gen_media(spark, n=200, seed=42), dim=8)
        .select("media_id", "kind", "n_bytes")
        .orderBy("media_id")
    )


def q_media_geometry(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal HARD-signal member (VERDICT r3 #8): real 24-bit BMP
    payloads (numpy-encoded, no external library) decoded back through
    the same Arrow mapInPandas transport as extract_features — geometry
    from the little-endian header, channel means from the
    stride-padded BGR pixel array.  Fill/geometry are doc_id arithmetic,
    so DuckDB states the expected decode output without touching the
    binary; a kernel that mishandles padding or channel order fails the
    value hash."""
    from filipo_spark.functions.multimodal import encode_bmp_images, image_geometry
    from filipo_spark.sources import read_table

    _utc(spark)
    docs = read_table(spark, sf_dir, "documents")
    return image_geometry(encode_bmp_images(docs)).orderBy("doc_id")


def q_json_flatten(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C9 raw-JSON ingestion (ResponseConverter.java:16-54): nested JSON
    strings → dotted [i]-indexed paths, one codegen from_json+schema-walk
    projection.  The JSON is built from events columns so the oracle can
    state the ground-truth flattening directly."""
    from filipo_spark.functions.json_flatten import json_flatten_long
    from filipo_spark.sources import read_table

    _utc(spark)
    e = read_table(spark, sf_dir, "events").where("event_id < 1000")
    j = e.select(
        "event_id",
        F.to_json(
            F.struct(
                F.struct(
                    F.col("user_id").alias("uid"), F.col("event_type").alias("type")
                ).alias("actor"),
                F.array(
                    F.struct(F.floor("value").cast("long").alias("v")),
                    F.struct((F.floor("value") + 1).cast("long").alias("v")),
                ).alias("vals"),
                F.col("props").alias("props"),
            )
        ).alias("payload"),
    )
    return json_flatten_long(j, "payload", ["event_id"]).orderBy("event_id", "key")


def q_degenerate_columns(spark: SparkSession, sf_dir: str) -> DataFrame:
    """J4 (CDC guise): columns whose modal value covers ≥ 30% of rows —
    degenerate 'error page' detection (AlignmentProcessor.java:251-310)."""
    from filipo_spark.align.scp import degenerate_columns
    from filipo_spark.sources import read_table

    _utc(spark)
    return degenerate_columns(
        read_table(spark, sf_dir, "orders"), threshold=0.3
    ).orderBy("column_name")


def q_support_confidence(spark: SparkSession, sf_dir: str) -> DataFrame:
    """A15 SCP: support/confidence of (event_type, value-bucket) pairs
    split by HIGH-VALUE purchasers (value > 200) vs the rest
    (SupportConfidenceProcessor.java:18-48).  Every user purchases in
    this dataset, so the plain buyer split was degenerate (empty
    nonmatching set ⇒ gate ratio 1 ⇒ zero output rows); the high-value
    cohort produces a discriminative, non-trivial SCP result."""
    from filipo_spark.align.scp import scp
    from filipo_spark.sources import read_table

    _utc(spark)
    e = read_table(spark, sf_dir, "events")
    obs = e.select(
        F.col("user_id").alias("record_id"),
        F.col("event_type").alias("field"),
        F.floor(F.col("value") / 100).cast("int").cast("string").alias("value"),
    )
    buyers = e.where("event_type = 'purchase' AND value > 200").select(
        F.col("user_id").alias("record_id")
    ).distinct()
    matching = obs.join(buyers, on="record_id")
    nonmatching = obs.join(buyers, on="record_id", how="left_anti")
    return scp(matching, nonmatching).orderBy(
        F.desc("confidence"), "field", "value"
    )


def q_icelet_sql_snapshot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """S2×S8 through the SQL surface: replay the events changelog into an
    Icelet table in TWO epochs, then time-travel to the snapshot after
    epoch 1 via register_icelet(snapshot_id=...) and SELECT through
    spark.sql — hard-signal verification that snapshots are immutable
    mid-lineage states (the Iceberg VERSION AS OF analog;
    QueryProcessor.java:16-36 catalog dispatch)."""
    import tempfile

    from filipo_spark.replay import run_replay
    from filipo_spark.sources import changes_from_events, register_icelet
    from filipo_spark.table.icelet import IceletTable

    _utc(spark)
    ch = changes_from_events(spark, sf_dir)
    b = ch.agg(F.min("lsn").alias("lo"), F.max("lsn").alias("hi")).collect()[0]
    batch = (int(b["hi"]) - int(b["lo"]) + 2) // 2  # ceil(span/2) → 2 epochs
    table = IceletTable.create(tempfile.mkdtemp(prefix="icelet-sql-"), n_buckets=8)
    try:
        run_replay(spark, table, ch, batch_size=batch)
        snap1 = next(
            m["snapshot_id"] for m in table.manifest() if m.get("kind") == "append"
        )
        register_icelet(spark, table.root, "transcripts_snap1", snapshot_id=snap1)
        return _materialized(spark, spark.sql(
            """
            SELECT conv_id, turn_idx, role, text, tool, ts
            FROM transcripts_snap1
            ORDER BY conv_id, turn_idx
            """
        ))
    finally:
        spark.catalog.dropTempView("transcripts_snap1")
        shutil.rmtree(table.root, ignore_errors=True)


def q_drift_auto_realign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Self-healing CDC (St-family × FiLiPo core): a drifted change
    stream whose wire shape FLIPS mid-replay (rename → nested paths) is
    replayed into an Icelet table; per-epoch health ratios detect the
    flip, trigger in-loop re-alignment against the table's resolved
    state, and the realignment is fenced in the commit manifest
    (align/drift.py; reference analog AlignmentProcessor.java:72-95).
    The stream carries a real mutation (upper-cased text on every 5th
    turn, epoch-2 LSNs win LWW), so the final state is the LWW oracle
    plus that mutation — fully ANSI-expressible.

    Target ts is second-truncated before bootstrap because the drifted
    wire renders ISO-8601 seconds (echo probes must tie on ts so the
    higher LSN wins)."""
    import tempfile

    from filipo_spark.generators import gen_drifted, gen_echo_changelog
    from filipo_spark.operators.merge import canonical, changes_to_physical, logical, lww_resolve
    from filipo_spark.replay import run_drifted_replay
    from filipo_spark.sources import changes_from_events
    from filipo_spark.table.icelet import IceletTable

    _utc(spark)
    ch = _rebalance(changes_from_events(spark, sf_dir))
    # the fixture target is consumed many times (bootstrap write, two
    # echo-changelog legs, per-epoch slices): persisted so the sf-scale
    # LWW fold upstream computes once, not once per consumer.  Scoped to
    # this invocation — released in the finally.  Folding the changes
    # directly (no empty-state union) keeps the rebalance exchange as
    # the fold's only shuffle — same relation, one exchange.
    target = logical(lww_resolve(changes_to_physical(ch))).withColumn(
        "ts", F.date_trunc("second", F.col("ts"))
    ).persist()
    table = IceletTable.create(
        tempfile.mkdtemp(prefix="icelet-drift-"), n_buckets=8
    )
    try:
        table.bootstrap(target)
        base, span = 1 << 41, 1 << 40
        mut = F.pmod(F.col("turn_idx"), F.lit(5)) == 0
        mutated = target.withColumn(
            "text", F.when(mut, F.upper("text")).otherwise(F.col("text"))
        )
        drifted = gen_drifted(gen_echo_changelog(target, start_lsn=base), "rename").unionByName(
            gen_drifted(gen_echo_changelog(mutated, start_lsn=base + span), "nested")
        )
        report = run_drifted_replay(
            spark, table, drifted,
            epochs=[(base - 1, base + span - 1), (base + span - 1, base + 2 * span - 1)],
        )
        assert [r["epoch"] for r in report.realigns] == [0, 1], report.realigns
        return _materialized(spark, canonical(table.read_logical(spark)))
    finally:
        target.unpersist()
        shutil.rmtree(table.root, ignore_errors=True)


def q_schema_evolution_mapping(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The FiLiPo core: recover a drifted payload→column mapping from an
    echo probe sample (golden drift profile 'typedrift') — rows-only
    (iterative decision rules, non-SQL)."""
    from filipo_spark.align import align
    from filipo_spark.generators import gen_drifted, gen_echo_changelog, gen_transcripts

    _utc(spark)
    target = gen_transcripts(spark, n_conv=30, max_turns=15, seed=42)
    mapping = align(gen_drifted(gen_echo_changelog(target), "typedrift"), target)
    rows = [
        (k, v, "Identifier", 1.0) for k, v in sorted(mapping.key_fields.items())
    ] + [
        (r["tgt_column"], r["src_field"], r["metric"], float(r["confidence"]))
        for r in mapping.columns
    ]
    return spark.createDataFrame(
        rows, "tgt_column string, src_field string, metric string, confidence double"
    ).orderBy("tgt_column")


def q_cdc_change_feed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental change feed (table/changes.py): replay the events
    changelog into an Icelet table in FOUR epochs, then read the NET
    changes between the snapshot after epoch 1 and the snapshot after
    epoch 3 — exactly the LWW winners of that lsn window, deletes
    included as op='D'.  Under merge-on-read the delta files added
    between two append snapshots ARE that window's change log, so the
    feed costs O(changes), never O(table) — the Delta/Iceberg CDF shape
    FiLiPo's rescan-everything function store can't answer
    (OutputManager.java:65-70)."""
    import tempfile

    from filipo_spark.replay import run_replay
    from filipo_spark.sources import changes_from_events
    from filipo_spark.table.changes import changes_between
    from filipo_spark.table.icelet import IceletTable

    _utc(spark)
    ch = changes_from_events(spark, sf_dir)
    b = ch.agg(
        F.min("lsn").alias("lo"), F.max("lsn").alias("hi"), F.count("*").alias("n")
    ).collect()[0]
    lo, hi, n = int(b["lo"]), int(b["hi"]), int(b["n"])
    table = IceletTable.create(tempfile.mkdtemp(prefix="icelet-feed-"), n_buckets=8)
    try:
        run_replay(spark, table, ch, batch_size=(hi - lo) // 4 + 1, bounds=(lo, hi, n))
        appends = [m for m in table.manifest() if m["kind"] == "append"]
        # small LSN spans plan < 4 epochs; the oracle's
        # least(lo0+3*bs, hi) upper bound coincides with the LAST append
        # whenever fewer than 3 appends exist, so clamp the index
        feed = changes_between(
            spark, table,
            appends[0]["snapshot_id"],
            appends[min(2, len(appends) - 1)]["snapshot_id"],
        )
        return _materialized(spark, feed.orderBy("conv_id", "turn_idx"))
    finally:
        shutil.rmtree(table.root, ignore_errors=True)


# ---------------------------------------------------------------------------
# contract
# ---------------------------------------------------------------------------

def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return q_cdc_lww_replay(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "cdc_lww_replay": q_cdc_lww_replay,
        "cdc_batched_replay": q_cdc_batched_replay,
        "lww_dedup_winners": q_lww_dedup_winners,
        "schema_profile_orders": q_schema_profile_orders,
        "type_triples_orders": q_type_triples_orders,
        "sql_brand_revenue": q_sql_brand_revenue,
        "identifier_detection": q_identifier_detection,
        "pricing_summary": q_pricing_summary,
        "argmax_vote": q_argmax_vote,
        "wildcard_collapse": q_wildcard_collapse,
        "revenue_by_nation": q_revenue_by_nation,
        "sample_per_group": q_sample_per_group,
        "topk_confidence": q_topk_confidence,
        "dedup_exact_docs": q_dedup_exact_docs,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "minhash_signatures": q_minhash_signatures,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_near_pairs": q_simhash_near_pairs,
        "text_metrics": q_text_metrics,
        "winnowing_fp": q_winnowing_fp,
        "cosine_topk": q_cosine_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dups": q_embedding_near_dups,
        "media_features": q_media_features,
        "media_geometry": q_media_geometry,
        "json_flatten": q_json_flatten,
        "degenerate_columns": q_degenerate_columns,
        "support_confidence": q_support_confidence,
        "schema_evolution_mapping": q_schema_evolution_mapping,
        "drift_auto_realign": q_drift_auto_realign,
        "icelet_sql_snapshot": q_icelet_sql_snapshot,
        "cdc_change_feed": q_cdc_change_feed,
    }


_CHANGES_SQL = """
SELECT event_id AS lsn,
       CASE WHEN event_type = 'error' THEN 'D'
            WHEN event_type = 'signup' THEN 'I'
            ELSE 'U' END AS op,
       'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
       CAST(event_id % 40 AS INTEGER) AS turn_idx,
       CASE CAST(event_id % 4 AS INTEGER)
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
            WHEN 2 THEN 'system' ELSE 'tool' END AS role,
       event_type || ':' || props AS text,
       CASE WHEN event_id % 4 = 3 THEN event_type END AS tool,
       ts
FROM events
"""

_LWW_FINAL = f"""
WITH ch AS ({_CHANGES_SQL}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch)
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx
"""

# word-3-shingles per document (shared by the dedup oracles); DuckDB list
# slicing toks[i:i+2] is inclusive → 3 tokens
_SHINGLE_SQL = r"""
WITH sh AS (
  SELECT doc_id AS doc, unnest(list_distinct([
    array_to_string(toks[i:i+2], ' ')
    FOR i IN range(1, CASE WHEN len(toks) >= 3 THEN len(toks) - 1 ELSE 2 END)
  ])) AS s
  FROM (SELECT doc_id,
               regexp_split_to_array(regexp_replace(lower(trim(text)), '\s+', ' ', 'g'), '\s+') toks
        FROM documents)
)
"""

# stop-shingle guard mirrored from ngram_jaccard_pairs(max_doc_freq="auto"):
# shingles in more than max(100, 1% of docs) documents are dropped before
# the self-join AND from the per-doc sizes
_SHINGLE_CAP_SQL = r"""
, cap AS (SELECT greatest(100, CAST(floor(0.01 * count(*)) AS BIGINT)) AS v FROM documents),
shf AS (
  SELECT sh.* FROM sh
  WHERE s IN (SELECT s FROM sh GROUP BY s HAVING count(*) <= (SELECT v FROM cap))
)
"""


def _simhash_sql(max_hamming: int) -> str:
    """DuckDB replica of simhash(hash_fn='md5') + simhash_near_pairs:
    60 bits from 15 hex chars of md5(token), per-bit sign votes, then
    ALL pairs with bit_count(xor) <= max_hamming (the chunked candidate
    generation is recall-complete, so a direct pair filter is the same
    relation)."""
    digits = ",\n         ".join(
        f"strpos('0123456789abcdef', substr(h, {j + 1}, 1)) - 1 AS d{j}"
        for j in range(15)
    )
    votes = ",\n         ".join(
        f"SUM(CASE WHEN (d{i // 4} >> {i % 4}) & 1 = 1 THEN 1 ELSE -1 END) AS b{i}"
        for i in range(60)
    )
    sig = " + ".join(
        f"(CAST(CASE WHEN b{i} > 0 THEN 1 ELSE 0 END AS BIGINT) << {i})" for i in range(60)
    )
    return rf"""
WITH toks AS (
  SELECT doc_id AS doc, unnest(list_distinct(regexp_split_to_array(
    trim(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')), '\s+'))) AS t
  FROM documents),
h AS (SELECT doc, md5(t) AS h FROM toks),
d AS (SELECT doc,
         {digits}
      FROM h),
v AS (SELECT doc,
         {votes}
      FROM d GROUP BY doc),
s AS (SELECT doc, {sig} AS sig FROM v)
SELECT a.doc AS doc_a, b.doc AS doc_b,
       bit_count(xor(a.sig, b.sig)) AS hamming
FROM s a JOIN s b ON a.doc < b.doc
WHERE bit_count(xor(a.sig, b.sig)) <= {max_hamming}
ORDER BY doc_a, doc_b
"""


_LSH_SQL = _SHINGLE_SQL + r"""
, sig AS (
  SELECT doc, min(md5('0|' || s)) mh0, min(md5('1|' || s)) mh1,
         min(md5('2|' || s)) mh2, min(md5('3|' || s)) mh3,
         min(md5('4|' || s)) mh4, min(md5('5|' || s)) mh5,
         min(md5('6|' || s)) mh6, min(md5('7|' || s)) mh7
  FROM sh GROUP BY doc),
banded AS (
  SELECT doc, 0 AS band, md5(mh0 || '|' || mh1) AS bsig FROM sig
  UNION ALL SELECT doc, 1, md5(mh2 || '|' || mh3) FROM sig
  UNION ALL SELECT doc, 2, md5(mh4 || '|' || mh5) FROM sig
  UNION ALL SELECT doc, 3, md5(mh6 || '|' || mh7) FROM sig),
cand AS (
  SELECT DISTINCT x.doc AS doc_a, y.doc AS doc_b
  FROM banded x JOIN banded y
    ON x.band = y.band AND x.bsig = y.bsig AND x.doc < y.doc),
sizes AS (SELECT doc, count(*) n FROM sh GROUP BY doc),
inter AS (
  SELECT c.doc_a, c.doc_b, count(*) i
  FROM cand c
  JOIN sh a ON a.doc = c.doc_a
  JOIN sh b ON b.doc = c.doc_b AND b.s = a.s
  GROUP BY 1, 2)
SELECT i.doc_a, i.doc_b,
       round(CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i), 4) AS jaccard
FROM inter i JOIN sizes sa ON sa.doc = i.doc_a JOIN sizes sb ON sb.doc = i.doc_b
WHERE CAST(i.i AS DOUBLE) / (sa.n + sb.n - i.i) >= 0.35
ORDER BY doc_a, doc_b
"""

_ANN_IVF_SQL = """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS centroid_id,
         embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
c_assign AS (
  SELECT vec_id AS neighbor_id, embedding AS cv, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DOUBLE), 6) DESC,
             c.centroid_id) rn
    FROM embeddings e CROSS JOIN cents c)
  WHERE rn <= 1),
q_assign AS (
  SELECT vec_id AS query_id, embedding AS qv, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DOUBLE), 6) DESC,
             c.centroid_id) rn
    FROM embeddings e CROSS JOIN cents c WHERE e.vec_id < 5)
  WHERE rn <= 4),
scored AS (
  SELECT DISTINCT query_id, neighbor_id,
         round(CAST(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]) AS DOUBLE), 4) score
  FROM q_assign JOIN c_assign USING (centroid_id)
  WHERE query_id <> neighbor_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 3
ORDER BY query_id, rank
"""

_PROFILE_ORDERS = """
WITH longf AS (
  SELECT 'o_orderkey' AS column_name, CAST(o_orderkey AS VARCHAR) AS value FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
),
prof AS (
  -- NULL values stay NULL inside AVG (skipped), matching Spark's
  -- avg(value RLIKE ...) which propagates NULL — ratios are over
  -- non-null values in both engines
  SELECT column_name,
         COUNT(*) AS n,
         COUNT(value) AS n_nonnull,
         COUNT(DISTINCT value) AS n_distinct,
         AVG(CASE WHEN value IS NULL THEN NULL WHEN regexp_matches(value, '^-?\\d+$') THEN 1.0 ELSE 0.0 END) AS int_ratio,
         AVG(CASE WHEN value IS NULL THEN NULL WHEN regexp_matches(value, '^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$') THEN 1.0 ELSE 0.0 END) AS double_ratio,
         AVG(CASE WHEN value IS NULL THEN NULL WHEN regexp_matches(value, '^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?$') THEN 1.0 ELSE 0.0 END) AS ts_ratio,
         AVG(CASE WHEN value IS NULL THEN NULL WHEN regexp_matches(value, '^https?://') THEN 1.0 ELSE 0.0 END) AS url_ratio
  FROM longf GROUP BY column_name
)
SELECT column_name, n, n_nonnull, n_distinct,
       ROUND(CASE WHEN n_nonnull > 0 THEN CAST(n_distinct AS DOUBLE) / n_nonnull ELSE 0.0 END, 6) AS functionality,
       ROUND(1.0 - CAST(n_nonnull AS DOUBLE) / n, 6) AS null_ratio,
       ROUND(int_ratio, 6) AS int_ratio, ROUND(double_ratio, 6) AS double_ratio,
       ROUND(ts_ratio, 6) AS ts_ratio, ROUND(url_ratio, 6) AS url_ratio,
       CASE WHEN n_nonnull = 0 THEN 'null'
            WHEN int_ratio >= 0.99 THEN 'int'
            WHEN double_ratio >= 0.99 THEN 'double'
            WHEN ts_ratio >= 0.99 THEN 'timestamp'
            WHEN url_ratio >= 0.99 THEN 'url'
            ELSE 'text' END AS type_guess
FROM prof ORDER BY column_name
"""


def oracle_sql() -> dict[str, str]:
    return {
        "cdc_lww_replay": _LWW_FINAL,
        "cdc_batched_replay": _LWW_FINAL,
        "lww_dedup_winners": f"""
WITH ch AS ({_CHANGES_SQL}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch)
SELECT conv_id, turn_idx, lsn, op FROM ranked WHERE rn = 1
ORDER BY conv_id, turn_idx""",
        "schema_profile_orders": _PROFILE_ORDERS,
        "type_triples_orders": """
WITH longf AS (
  SELECT 'o_orderkey' AS column_name, CAST(o_orderkey AS VARCHAR) AS value FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
)
SELECT 'orders' AS subject_type, column_name AS predicate,
       CASE WHEN value IS NULL THEN 'null'
            WHEN regexp_matches(value, '^-?\\d+$') THEN 'int'
            WHEN regexp_matches(value, '^-?\\d+(\\.\\d+)?([eE][+-]?\\d+)?$') THEN 'double'
            WHEN regexp_matches(value, '^\\d{4}-\\d{2}-\\d{2}([ T]\\d{2}:\\d{2}:\\d{2}(\\.\\d+)?)?$') THEN 'timestamp'
            WHEN regexp_matches(value, '^https?://') THEN 'url'
            ELSE 'text' END AS object_type,
       COUNT(*) AS n
FROM longf GROUP BY 1, 2, 3 ORDER BY predicate, object_type""",
        "sql_brand_revenue": """
SELECT p_brand,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS revenue,
       COUNT(*) AS n_items
FROM lineitem JOIN part ON l_partkey = p_partkey
GROUP BY p_brand
ORDER BY revenue DESC, p_brand
LIMIT 10""",
        "identifier_detection": f"""
WITH prof AS ({_PROFILE_ORDERS.replace('ORDER BY column_name', '')})
SELECT column_name, functionality FROM prof
WHERE functionality >= 0.996 AND null_ratio < 0.5
ORDER BY column_name""",
        "pricing_summary": """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 4) AS avg_qty,
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus""",
        "argmax_vote": """
WITH votes AS (
  SELECT user_id, event_type, COUNT(*) AS votes
  FROM events GROUP BY user_id, event_type),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY user_id ORDER BY votes DESC, event_type ASC) AS rn
  FROM votes)
SELECT user_id, event_type, votes FROM ranked WHERE rn = 1 ORDER BY user_id""",
        "wildcard_collapse": """
SELECT regexp_replace(source, '\\d+', '[*]', 'g') AS path, lang, COUNT(*) AS votes
FROM documents GROUP BY 1, 2 ORDER BY path, lang""",
        "revenue_by_nation": """
SELECT n_name, ROUND(SUM(o_totalprice), 2) AS revenue, COUNT(*) AS n_orders
FROM orders JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name ORDER BY n_name""",
        "sample_per_group": """
WITH ranked AS (
  SELECT s_nationkey, s_name, row_number() OVER (
    PARTITION BY s_nationkey ORDER BY md5(s_name), s_name) AS rn
  FROM supplier)
SELECT s_nationkey, s_name FROM ranked WHERE rn <= 2
ORDER BY s_nationkey, s_name""",
        "topk_confidence": """
SELECT event_type, ROUND(AVG(value), 4) AS confidence, COUNT(*) AS n
FROM events GROUP BY event_type
ORDER BY confidence DESC, event_type LIMIT 3""",
        "dedup_exact_docs": r"""
SELECT md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) AS fp,
       min(doc_id) AS keep_id, count(*) AS n_dups
FROM documents GROUP BY 1 ORDER BY fp""",
        "ngram_jaccard_pairs": _SHINGLE_SQL + _SHINGLE_CAP_SQL + r"""
, sizes AS (SELECT doc, count(*) n FROM shf GROUP BY doc),
inter AS (
  SELECT a.doc da, b.doc db, count(*) i
  FROM shf a JOIN shf b ON a.s = b.s AND a.doc < b.doc
  GROUP BY 1, 2)
SELECT da AS doc_a, db AS doc_b,
       round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 4) AS jaccard
FROM inter JOIN sizes sa ON sa.doc = da JOIN sizes sb ON sb.doc = db
WHERE CAST(i AS DOUBLE) / (sa.n + sb.n - i) >= 0.35
ORDER BY doc_a, doc_b""",
        "minhash_lsh_pairs": _LSH_SQL,
        "simhash_near_pairs": _simhash_sql(max_hamming=8),
        "ann_ivf_topk": _ANN_IVF_SQL,
        "embedding_near_dups": """
WITH cents AS (
  SELECT row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id) AS centroid_id,
         embedding
  FROM embeddings
  ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id LIMIT 8),
assigned AS (
  SELECT vec_id, embedding, centroid_id FROM (
    SELECT e.vec_id, e.embedding, c.centroid_id,
           row_number() OVER (PARTITION BY e.vec_id ORDER BY
             round(CAST(list_cosine_similarity(e.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DOUBLE), 6) DESC,
             c.centroid_id) rn
    FROM embeddings e CROSS JOIN cents c)
  WHERE rn <= 2),
pairs AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b,
         round(CAST(list_cosine_similarity(a.embedding::DOUBLE[], b.embedding::DOUBLE[]) AS DOUBLE), 4) AS cos
  FROM assigned a JOIN assigned b
    ON a.centroid_id = b.centroid_id AND a.vec_id < b.vec_id)
SELECT id_a, id_b, cos FROM pairs WHERE cos >= 0.42
ORDER BY id_a, id_b""",
        # media_geometry: the BMP fill/geometry are doc_id arithmetic —
        # the oracle derives the expected decode output (incl. file size
        # with 4-byte row stride) while Spark parses the actual binary
        "media_geometry": """
WITH g AS (
  SELECT doc_id,
         CAST(doc_id * 7 % 57 + 8 AS INTEGER) AS width,
         CAST(doc_id * 13 % 41 + 8 AS INTEGER) AS height,
         CAST(doc_id * 3 % 256 AS INTEGER) AS mean_r,
         CAST(doc_id * 5 % 256 AS INTEGER) AS mean_g,
         CAST(doc_id * 11 % 256 AS INTEGER) AS mean_b
  FROM documents)
SELECT doc_id, width, height, mean_r, mean_g, mean_b,
       CAST(54 + height * (((3 * width + 3) // 4) * 4) AS INTEGER) AS n_bytes
FROM g ORDER BY doc_id""",
        "json_flatten": """
WITH base AS (SELECT * FROM events WHERE event_id < 1000),
longf AS (
  SELECT event_id, 'actor.uid' AS key, CAST(user_id AS VARCHAR) AS value FROM base
  UNION ALL SELECT event_id, 'actor.type', event_type FROM base
  UNION ALL SELECT event_id, 'vals[0].v', CAST(CAST(floor(value) AS BIGINT) AS VARCHAR) FROM base
  UNION ALL SELECT event_id, 'vals[1].v', CAST(CAST(floor(value) + 1 AS BIGINT) AS VARCHAR) FROM base
  UNION ALL SELECT event_id, 'props', props FROM base)
SELECT event_id, key, value FROM longf WHERE value IS NOT NULL
ORDER BY event_id, key""",
        "minhash_signatures": _SHINGLE_SQL + r"""
SELECT doc, min(md5('0|' || s)) AS mh0, min(md5('1|' || s)) AS mh1,
       min(md5('2|' || s)) AS mh2, min(md5('3|' || s)) AS mh3
FROM sh GROUP BY doc ORDER BY doc""",
        "text_metrics": r"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '\s+') toks,
         regexp_split_to_array(lower(trim(text)), '\s+') ltoks,
         length(text) n
  FROM documents),
f AS (
  SELECT doc_id,
    CASE WHEN length(trim(text)) = 0 THEN 0 ELSE len(toks) END n_ws,
    len(regexp_extract_all(text, '[A-Za-z]+|[0-9]+|[^A-Za-z0-9\s]')) n_bpe,
    least(CAST(n AS DOUBLE)/500, 1.0) len_score,
    CASE WHEN len(toks) > 0 THEN
      CAST(len(list_filter(ltoks, x -> list_contains(['the','and','of','to','a','in','is','it','that','for'], x))) AS DOUBLE) / len(toks)
      ELSE 0.0 END sw,
    CASE WHEN n > 0 THEN CAST(length(regexp_replace(text, '[^.,;:!?''"()\[\]-]', '', 'g')) AS DOUBLE)/n ELSE 0.0 END pr,
    len(list_intersect(list_distinct(ltoks), ['the','and','of','to','a','in','is','it','that','for'])) v_en,
    len(list_intersect(list_distinct(ltoks), ['el','la','de','que','y','en','un','por','con','los'])) v_es,
    len(list_intersect(list_distinct(ltoks), ['der','die','und','das','ist','von','mit','den','ein','zu'])) v_de,
    md5(regexp_replace(lower(trim(text)), '\s+', ' ', 'g')) fp
  FROM t)
SELECT doc_id, n_ws, n_bpe,
  floor(greatest(0.0, len_score*0.4 + least(sw*5,1.0)*0.5 - least(pr*2,1.0)*0.2 + 0.3) * 10000) / 10000 AS quality,
  CASE WHEN greatest(v_en, v_es, v_de) = 0 THEN 'und'
       WHEN v_en >= v_es AND v_en >= v_de THEN 'en'
       WHEN v_es >= v_de THEN 'es' ELSE 'de' END AS lang_guess,
  fp
FROM f ORDER BY doc_id""",
        "winnowing_fp": r"""
WITH norm AS (
  SELECT doc_id, regexp_replace(lower(trim(text)), '\s+', ' ', 'g') AS t
  FROM documents),
g AS (
  SELECT doc_id,
         [md5(substr(t, i, 5)) FOR i IN range(1, greatest(length(t) - 4, 1) + 1)] AS grams
  FROM norm),
w AS (
  SELECT doc_id, list_distinct([
    list_aggregate(grams[j:j+3], 'min')
    FOR j IN range(1, greatest(len(grams) - 3, 1) + 1)
  ]) AS fps
  FROM g)
SELECT doc_id, unnest(fps) AS fp FROM w ORDER BY doc_id, fp""",
        "cosine_topk": """
WITH scored AS (
  SELECT q.vec_id query_id, c.vec_id neighbor_id,
         round(CAST(list_cosine_similarity(q.embedding::DOUBLE[], c.embedding::DOUBLE[]) AS DOUBLE), 4) score
  FROM embeddings q JOIN embeddings c ON q.vec_id < 5 AND q.vec_id <> c.vec_id),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY query_id ORDER BY score DESC, neighbor_id) rank
  FROM scored)
SELECT query_id, neighbor_id, score, rank FROM ranked WHERE rank <= 3
ORDER BY query_id, rank""",
        "degenerate_columns": """
WITH longf AS (
  SELECT 'o_orderkey' AS column_name, CAST(o_orderkey AS VARCHAR) AS value FROM orders
  UNION ALL SELECT 'o_custkey', CAST(o_custkey AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderstatus', o_orderstatus FROM orders
  UNION ALL SELECT 'o_totalprice', CAST(o_totalprice AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderdate', CAST(o_orderdate AS VARCHAR) FROM orders
  UNION ALL SELECT 'o_orderpriority', o_orderpriority FROM orders
),
freq AS (
  SELECT column_name, value, count(*) n FROM longf
  WHERE value IS NOT NULL GROUP BY 1, 2),
tot AS (SELECT column_name, count(*) n_col FROM longf WHERE value IS NOT NULL GROUP BY 1),
modal AS (
  SELECT *, row_number() OVER (
    PARTITION BY column_name ORDER BY n DESC, value ASC) rn
  FROM freq)
SELECT m.column_name, m.value AS modal_value,
       round(CAST(m.n AS DOUBLE) / t.n_col, 6) AS modal_ratio
FROM modal m JOIN tot t ON m.column_name = t.column_name
WHERE rn = 1 AND CAST(m.n AS DOUBLE) / t.n_col >= 0.3
ORDER BY m.column_name""",
        "support_confidence": """
WITH obs AS (
  SELECT user_id AS record_id, event_type AS field,
         CAST(CAST(floor(value/100) AS INT) AS VARCHAR) AS value
  FROM events),
buyers AS (SELECT DISTINCT user_id AS record_id FROM events
           WHERE event_type = 'purchase' AND value > 200),
m AS (SELECT o.* FROM obs o JOIN buyers b USING (record_id)),
nm AS (SELECT o.* FROM obs o ANTI JOIN buyers b USING (record_id)),
stats AS (
  SELECT (SELECT count(DISTINCT record_id) FROM obs) n_total,
         (SELECT count(DISTINCT record_id) FROM m) n_valid),
per_pair AS (
  SELECT field, value, count(*) n_all,
         sum(CASE WHEN src = 'm' THEN 1 ELSE 0 END) n_match
  FROM (SELECT *, 'm' src FROM m UNION ALL SELECT *, 'n' src FROM nm)
  GROUP BY 1, 2)
SELECT field, value,
       round(CAST(n_all AS DOUBLE) / s.n_total, 6) AS support,
       round((CAST(n_match AS DOUBLE) / s.n_total) / (CAST(n_all AS DOUBLE) / s.n_total), 6) AS confidence
FROM per_pair, stats s
WHERE (CAST(n_match AS DOUBLE) / n_all) > CAST(s.n_valid AS DOUBLE) / s.n_total
ORDER BY confidence DESC, field, value""",
        "icelet_sql_snapshot": f"""
WITH ch AS ({_CHANGES_SQL}),
b AS (SELECT min(lsn) - 1 + CAST(ceil((max(lsn) - min(lsn) + 1) / 2.0) AS BIGINT) AS hi1
      FROM ch),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch WHERE lsn <= (SELECT hi1 FROM b))
SELECT conv_id, turn_idx, role, text, tool, ts
FROM ranked WHERE rn = 1 AND op <> 'D'
ORDER BY conv_id, turn_idx""",
        # change feed = LWW winners of the lsn window covered by replay
        # epochs 2-3 (plan_epochs parity: lo0 = min-1, bs = floor(span/4)+1,
        # window (lo0+bs, least(lo0+3*bs, max)]); deletes kept as op='D'
        "cdc_change_feed": f"""
WITH ch AS ({_CHANGES_SQL}),
p AS (SELECT min(lsn) - 1 AS lo0,
             CAST(floor((max(lsn) - min(lsn)) / 4.0) AS BIGINT) + 1 AS bs,
             max(lsn) AS hi
      FROM ch),
win AS (
  SELECT ch.* FROM ch, p
  WHERE ch.lsn > p.lo0 + p.bs AND ch.lsn <= least(p.lo0 + 3 * p.bs, p.hi)),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM win)
SELECT conv_id, turn_idx,
       CASE WHEN op = 'D' THEN 'D' ELSE 'U' END AS op,
       lsn, role, text, tool, ts
FROM ranked WHERE rn = 1
ORDER BY conv_id, turn_idx""",
        "drift_auto_realign": f"""
WITH ch AS ({_CHANGES_SQL}),
ranked AS (
  SELECT *, row_number() OVER (
    PARTITION BY conv_id, turn_idx ORDER BY ts DESC, lsn DESC) AS rn
  FROM ch),
final AS (
  SELECT conv_id, turn_idx, role, text, tool, date_trunc('second', ts) AS ts
  FROM ranked WHERE rn = 1 AND op <> 'D')
SELECT conv_id, turn_idx, role,
       CASE WHEN turn_idx % 5 = 0 THEN upper(text) ELSE text END AS text,
       tool, ts
FROM final ORDER BY conv_id, turn_idx""",
        # The alignment DECISION RULES are iterative and not ANSI-SQL-
        # expressible, but the fixture is fully deterministic (seeded
        # generator + md5-ordered sampling), so the resulting function
        # store IS a statable literal: the oracle asserts the exact
        # (tgt, src, metric, confidence) rows the typedrift profile must
        # recover — a golden rendered as SQL, upgrading the row from
        # rows-only to a hard rows+schema+hash check (VERDICT r4 #8).
        "schema_evolution_mapping": """
SELECT tgt_column, src_field, metric, CAST(confidence AS DOUBLE) AS confidence
FROM (VALUES
  ('conv_id',  'conversation_id', 'Identifier', 1.0),
  ('role',     'author_role',     'TokenEqual', 1.0),
  ('text',     'content',         'TokenEqual', 1.0),
  ('tool',     'tool_name',       'TokenEqual', 1.0),
  ('ts',       'event_time',      'TokenEqual', 1.0),
  ('turn_idx', 'turn_index',      'Identifier', 1.0)
) AS t(tgt_column, src_field, metric, confidence)
ORDER BY tgt_column""",
        # media_features: intentionally no oracle (mapInPandas Arrow
        # transport is not ANSI-SQL-expressible) — driver records a
        # rows-only check; pytest covers it vs golden asserts
        # (tests/test_multimodal.py).
    }
