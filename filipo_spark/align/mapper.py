"""Schema-evolution mapper — FiLiPo's KB↔API alignment core, re-expressed
as DataFrame joins + vectorized similarity over a bounded probe sample.

Correspondence to the reference pipeline (AlignmentProcessor.java):

| engine step | reference anchor |
|---|---|
| candidate key discovery by value overlap | probing phase :967-1044 — sample KB values, keep input relations the API "responds" to; response-rate gate ≥ candidate_responses (:140,1039) |
| record pairing on discovered key | API call by input value = record correspondence (:1116-1170) |
| all-pairs field match per record pair | calculatePotentialLinkagePoints :800-911 (gate string_similarity ≥ 0.5 at :832) |
| identifier/numeric fast path | isNumeric/isUrl routing :820-826; RegExer :836-873 |
| record-similarity gate | :179-184 (matched > min(|api|,|kb|) × 0.1) |
| vote count per (src,tgt,metric) | summedMetrics :528-551 |
| arg-max metric, fuzzy-over-Equals tie | :554-588 (tie :566-571) |
| vote threshold | :620-630 (votes ≥ matches × candidate_responses) |
| wildcard collapse [i]→[*] | :591-636 (regex :599) |
| support / confidence gates | JointFeatureProcessor.java:59-126; SupportConfidenceProcessor.java:18-48 |
| mapping artifact (function store) | OutputManager.java:220-316 |

The "local KB" is the target transcripts table; the "Web API" is the
drifted change stream (payload map<string,string>).  Output drives
ALTER-free column mapping in ``apply_mapping``; per-partition evolution
events are logged by the replay loop into the commit manifest.

Scale: every step is a join/aggregation on a *bounded deterministic
sample* (n_probe records ≈ FiLiPo's similarityRequests=100) — alignment
cost is independent of stream volume.  The target side is never melted
or distinct'd in full either: key discovery and pairing run over
column-pruned key scans with the bounded probe set broadcast in, and
only the ≤ n_probe paired rows are fetched + melted for field matching
(see ``align`` docstring).  Only ``apply_mapping`` touches full
batches, and it is pure column projection/casting.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filipo_spark.functions.similarity import (
    DEFAULT_RULESET,
    EQUALS_METRICS,
    best_metric,
    compile_ruleset,
)
from filipo_spark.operators.profile import DOUBLE_RE, URL_RE
from filipo_spark.schema import (
    CANDIDATE_RESPONSES,
    DISTRIBUTION_VARIANCE,
    ERROR_THRESHOLD,
    KEY_COLUMNS,
    MIN_CONFIDENCE,
    MIN_SUPPORT,
    RECORD_SIMILARITY,
    STRING_SIMILARITY,
    TARGET_SCHEMA,
)

WILDCARD_RE = r"\[\d+\]"

# Memoized probe-metric Column expressions over the canonical
# (src_value, tgt_value) column pair: the metric catalog compiles to a
# large expression tree whose py4j construction costs ~0.2 s per
# align() call.  The tree is immutable and session-independent (the
# analyzer resolves a fresh copy per plan), so one build per JVM
# gateway serves every call; rebuilt if the gateway ever changes.
_EXPR_CACHE: dict = {}


def _probe_exprs() -> dict:
    from pyspark import SparkContext

    # identity check (not id()): a freed gateway's id can be reused by
    # its successor, which would serve Columns bound to a dead JVM
    key = SparkContext._gateway
    if _EXPR_CACHE.get("gw") is not key:
        sv, tv = F.col("src_value"), F.col("tgt_value")
        _EXPR_CACHE.update(
            gw=key,
            bm=best_metric(sv, tv),
            rule=F.struct(
                compile_ruleset(DEFAULT_RULESET)(sv, tv).alias("score"),
                F.lit("RegExer").alias("metric"),
            ),
            eq=F.struct(
                (sv == tv).cast("double").alias("score"),
                F.lit("Equal").alias("metric"),
            ),
            num=F.struct(
                F.coalesce(
                    (sv.try_cast("double") == tv.try_cast("double")).cast("double"),
                    F.lit(0.0),
                ).alias("score"),
                F.lit("NumericEqual").alias("metric"),
            ),
            both_num=sv.rlike(DOUBLE_RE) & tv.rlike(DOUBLE_RE),
            src_fast=sv.rlike(DOUBLE_RE) | sv.rlike(URL_RE),
        )
    return _EXPR_CACHE


@dataclass
class Mapping:
    """The engine's function store: src payload field → target column.

    ``payload_json_schema``: the inferred JSON schema (json-serialized
    StructType) when the mapping was learned from a raw-JSON payload —
    lets ``apply_mapping`` re-parse a *streaming* source, where schema
    inference (a collect) is impossible.
    """

    key_fields: dict[str, str]  # tgt key column -> src field
    columns: list[dict]  # rows: tgt_column, src_field, metric, votes, support, confidence
    evolution_events: list[str] = field(default_factory=list)
    payload_json_schema: str | None = None

    def as_dict(self) -> dict[str, str]:
        d = dict(self.key_fields)
        d.update({r["tgt_column"]: r["src_field"] for r in self.columns})
        return d

    def to_json(self) -> str:
        import json

        return json.dumps(
            {
                "key_fields": self.key_fields,
                "columns": self.columns,
                "evolution_events": self.evolution_events,
                "payload_json_schema": self.payload_json_schema,
            },
            sort_keys=True,
            indent=2,
        )

    @classmethod
    def from_json(cls, s: str) -> "Mapping":
        import json

        d = json.loads(s)
        return cls(
            key_fields=d["key_fields"],
            columns=d["columns"],
            evolution_events=d.get("evolution_events", []),
            payload_json_schema=d.get("payload_json_schema"),
        )


def normalize_payload(
    drifted: DataFrame, payload_col: str = "payload", json_schema=None
) -> DataFrame:
    """Payload-format dispatch (S2/C9): a raw JSON-string payload is
    flattened to ``map<string,string>`` dotted paths with ``[i]`` array
    indices (ResponseConverter.java:16-54) — one codegen projection; a
    map payload passes through unchanged.  ``json_schema`` (StructType)
    skips sample inference — required on streaming DataFrames."""
    if dict(drifted.dtypes).get(payload_col, "").startswith("map"):
        return drifted
    from filipo_spark.functions.json_flatten import json_payload_to_map

    return json_payload_to_map(drifted, payload_col, schema=json_schema)


def flatten_payload(drifted: DataFrame) -> DataFrame:
    """(lsn, op, payload) → long rows (lsn, src_field, src_value) with
    array indices wildcard-collapsed ([i]→[*], C8/A8 analog of
    ResponseConverter.java:26-27 flattened paths)."""
    return (
        drifted.select("lsn", F.explode(F.map_entries("payload")).alias("kv"))
        .select(
            "lsn",
            F.regexp_replace(F.col("kv.key"), WILDCARD_RE, "[*]").alias("src_field"),
            F.col("kv.value").alias("src_value"),
        )
        .where(F.col("src_value").isNotNull())
    )


def melt_target(target: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Target rows → long (conv_id, turn_idx, tgt_column, tgt_value:str).
    Timestamps are rendered ISO-8601 so drifted string forms can match."""
    cols = columns or [f.name for f in TARGET_SCHEMA.fields]
    structs = []
    for c in cols:
        v = F.col(c)
        if dict(target.dtypes).get(c) == "timestamp":
            v = F.date_format(v, "yyyy-MM-dd'T'HH:mm:ss")
        structs.append(
            F.struct(F.lit(c).alias("tgt_column"), v.cast("string").alias("tgt_value"))
        )
    return target.select(*KEY_COLUMNS, F.explode(F.array(*structs)).alias("kv")).select(
        *KEY_COLUMNS, "kv.tgt_column", "kv.tgt_value"
    )


def _distinct_overlap(src_flat: DataFrame, tgt_long: DataFrame) -> DataFrame:
    """Per (src_field, tgt_column): |distinct src values seen in tgt| /
    |distinct src values| — the probing response rate (F5 analog).

    Scale shape: the bounded probe-value set is broadcast INTO the
    target scan and the distinct runs on the (bounded) hit set — never a
    full-table distinct/shuffle.  The target side should already be
    column-pruned by the caller (key columns only)."""
    s = src_flat.select("src_field", F.col("src_value").alias("v")).distinct()
    totals = s.groupBy("src_field").agg(F.count(F.lit(1)).alias("n_src"))
    # NOTE scale shape of the hit-set distinct: a HOT probe value (e.g. a
    # turn_idx like "3" appearing in ~every conversation) matches O(n)
    # target rows in the broadcast join, but partial (map-side)
    # aggregation collapses each partition's duplicates to ≤ |probe
    # values| rows before the exchange — the shuffled distinct input is
    # bounded by partitions × probe-set size, never by target rows.
    hits = (
        tgt_long.select("tgt_column", F.col("tgt_value").alias("v"))
        .join(F.broadcast(s), on="v")
        .select("src_field", "tgt_column", "v")
        .distinct()
        .groupBy("src_field", "tgt_column")
        .agg(F.count(F.lit(1)).alias("n_hit"))
    )
    return hits.join(totals, on="src_field").select(
        "src_field",
        "tgt_column",
        (F.col("n_hit") / F.col("n_src")).alias("overlap"),
        "n_hit",
    )


def discover_key_fields(
    src_flat: DataFrame,
    tgt_long: DataFrame,
    min_overlap: float = CANDIDATE_RESPONSES,
) -> dict[str, str]:
    """Pre-condition discovery: which src field feeds each target key
    column — arg-max distinct-value overlap, gated like FiLiPo's
    candidate response rate (config.json:21, AlignmentProcessor.java:1039)."""
    ov = _distinct_overlap(src_flat, tgt_long.where(F.col("tgt_column").isin(KEY_COLUMNS)))
    w = Window.partitionBy("tgt_column").orderBy(F.desc("overlap"), F.asc("src_field"))
    rows = (
        ov.where(F.col("overlap") >= min_overlap)
        .withColumn("rn", F.row_number().over(w))
        .where("rn = 1")
        .collect()
    )
    return {r["tgt_column"]: r["src_field"] for r in rows}


def align(
    drifted: DataFrame,
    target: DataFrame,
    n_probe: int = 100,
    string_similarity: float = STRING_SIMILARITY,
    record_similarity: float = RECORD_SIMILARITY,
    candidate_responses: float = CANDIDATE_RESPONSES,
    error_threshold: float = ERROR_THRESHOLD,
    distribution_variance: float = DISTRIBUTION_VARIANCE,
    min_support: float = MIN_SUPPORT,
    min_confidence: float = MIN_CONFIDENCE,
    ruleset: list[dict] | None = None,
    classifier=None,
    evaluate_dir: str | None = None,
    evaluate_k: int = 5,
    debug: dict | None = None,
) -> Mapping:
    """Recover the drifted-payload → target-column mapping.

    Thresholds keep FiLiPo's names and defaults (config.json:13-30).

    Scale shape: the target table is NEVER melted or distinct'd in full.
    It is touched exactly two ways, each bounded or pruned:
      1. key discovery — a column-pruned scan of the key columns with the
         bounded probe-value set broadcast into it;
      2. record pairing — one target scan joined to the broadcast probe
         sample (FiLiPo's one API call per probe value); the paired
         row's values ride the uniqueness aggregation, so the ≤ n_probe
         probe rows come out of this same scan and only they are melted
         for the J1 field-match stage (a separate probe-row fetch was a
         third full scan+resolve of the target per align).
    Alignment cost is therefore independent of stream volume AND of
    target row width × count (the round-1 version melted + distinct'd
    the whole table per call).

    ``debug``: optional dict that receives named internal DataFrames
    (plan-shape tests assert boundedness on them).
    """
    payload_schema = None
    if not dict(drifted.dtypes)["payload"].startswith("map"):
        # infer ONCE here; the schema travels with the Mapping so
        # apply_mapping can re-parse a streaming source (no collect there)
        from filipo_spark.functions.json_flatten import infer_json_schema

        payload_schema = infer_json_schema(drifted, "payload")
        drifted = normalize_payload(drifted, json_schema=payload_schema)
    # AQE off for the duration of this call (restored in the finally):
    # every align stage is bounded by the ≤ n_probe·5 probe sample by
    # construction, so AQE's per-exchange re-planning rounds are pure
    # driver overhead here (~1s/call measured) with nothing to coalesce
    # or skew-split at ANY scale — this is a property of the bounded
    # sample, not of the local sandbox.  The two target-touching scans
    # have no post-shuffle stage AQE would improve (scan → broadcast
    # join → bounded agg).
    _sess = drifted.sparkSession
    _aqe_prev = _sess.conf.get("spark.sql.adaptive.enabled", "true")
    # list-response removal (AlignmentProcessor.java:312-340): a record
    # whose payload IS one top-level array spanning >1 index ("the API
    # answered with a list of entities") mixes several rows' values in
    # one record and would pollute pairing/votes — flagged and dropped
    # before flattening.  The flag rides the (cached) bounded sample, so
    # the O(stream) sample scan still runs ONCE; single-entity arrays
    # (tools[0].*) and object payloads pass untouched.
    _keys = F.map_keys("payload")
    _is_list = (
        F.forall(_keys, lambda k: k.rlike(r"^[^.\[\]]*\[\d+\]"))
        & (F.size(F.array_distinct(F.transform(
            _keys, lambda k: F.regexp_extract(k, r"^([^.\[\]]*)\[", 1)))) == 1)
        & (F.size(F.array_distinct(F.transform(
            _keys, lambda k: F.regexp_extract(k, r"^[^.\[\]]*\[(\d+)\]", 1)))) >= 2)
    )
    sample = (
        drifted.where(F.col("op") != "D")
        .orderBy(F.md5(F.col("lsn").cast("string")))
        .limit(n_probe * 5)
        .withColumn("_is_list", _is_list)
        .cache()
    )
    src_flat_base = flatten_payload(sample.where(~F.col("_is_list"))).cache()
    src_flat = src_flat_base
    tgt_long = None
    paired = None
    _sess.conf.set("spark.sql.adaptive.enabled", "false")  # restored in finally
    try:
        # J4 error/degenerate-response pruning (AlignmentProcessor.java:
        # 251-310, error_threshold config.json:22): the reference removes
        # the modal "error page" response before aligning; the payload
        # guise is a field whose modal value covers MORE than
        # error_threshold of its non-null probe observations (a constant
        # "status":"ok" field carries no alignment signal).  Degenerate
        # fields are kept OUT of key discovery and combined candidacy but
        # still VOTE: the reference prunes modal error *responses*, so a
        # field-level analog that silently dropped fields was strictly
        # more aggressive — a legitimate two-value field (alternating
        # user/assistant roles, ~50% modal share plus sampling noise)
        # must not lose its mapping (ADVICE r3).  A degenerate field that
        # wins a target column through the normal gates (vote threshold +
        # confidence floor) carried real signal and is kept; only the
        # ones that map nothing become prune events.  One bounded agg
        # over the cached probe sample — the same statistic
        # scp.degenerate_columns computes on wide tables.
        # ONE bounded collect serves the degeneracy statistic, the field
        # inventory, the list-response count AND the key-discovery
        # overlap table (formerly four separate jobs — the align() fixed
        # cost is pure job count, each launch paying scheduler + codegen
        # overhead on a ≤ n_probe·5-row sample): the three small
        # aggregates are unioned under a tag column and split on the
        # driver.  Overlap stats are per-field independent, so computing
        # them for every field and excluding degenerate ones driver-side
        # yields exactly the relation discover_key_fields built from the
        # pre-filtered flat sample.
        def _pad(leg, **cols):
            shape = {"src_field": "string", "modal": "string", "ratio": "double",
                     "deg": "boolean", "tgt_column": "string", "overlap": "double"}
            return leg.select(
                F.lit(cols.pop("_t")).alias("_t"),
                *[cols.get(c, F.lit(None)).cast(t).alias(c) for c, t in shape.items()],
            )

        key_long = melt_target(target, KEY_COLUMNS)
        fused = _pad(
            src_flat.groupBy("src_field", "src_value")
            .agg(F.count(F.lit(1)).alias("n"))
            .groupBy("src_field")
            .agg(F.max(F.struct("n", "src_value")).alias("m"), F.sum("n").alias("n_tot")),
            _t="f",
            src_field=F.col("src_field"),
            modal=F.col("m.src_value"),
            ratio=F.round(F.col("m.n") / F.col("n_tot"), 4),
            deg=F.col("m.n") > F.col("n_tot") * error_threshold,
        ).unionByName(_pad(
            _distinct_overlap(src_flat, key_long),
            _t="o",
            src_field=F.col("src_field"),
            tgt_column=F.col("tgt_column"),
            overlap=F.col("overlap"),
        )).unionByName(_pad(
            sample.where("_is_list").agg(F.count(F.lit(1)).alias("n")),
            _t="l",
            overlap=F.col("n"),
        )).collect()
        fstats = [r for r in fused if r["_t"] == "f"]
        n_list = int(next(r["overlap"] for r in fused if r["_t"] == "l"))
        deg_rows = [r for r in fstats if r["deg"]]
        deg_fields = {r["src_field"] for r in deg_rows}
        all_src = sorted(r["src_field"] for r in fstats)
        # (1) key discovery: per key column, arg-max overlap among
        # non-degenerate fields passing the response-rate gate — the
        # same gate + deterministic tie rule as discover_key_fields
        # (desc overlap, asc src_field)
        key_fields: dict[str, str] = {}
        for tgt in KEY_COLUMNS:
            cands = [
                r for r in fused
                if r["_t"] == "o" and r["tgt_column"] == tgt
                and r["src_field"] not in deg_fields
                and r["overlap"] >= CANDIDATE_RESPONSES
            ]
            if cands:
                win = min(cands, key=lambda r: (-r["overlap"], r["src_field"]))
                key_fields[tgt] = win["src_field"]
        if debug is not None:
            debug["key_long"] = key_long
        if len(key_fields) < len(KEY_COLUMNS):
            missing = [k for k in KEY_COLUMNS if k not in key_fields]
            raise ValueError(
                f"alignment failed: no src field matches target key column(s) {missing}"
            )

        # --- (2) record pairing (probing): src record ↔ target row via key ---
        src_wide = (
            src_flat.groupBy("lsn")
            .pivot("src_field", all_src)
            .agg(F.first("src_value"))
        )
        conv_f, turn_f = key_fields["conv_id"], key_fields["turn_idx"]
        non_key_cols = [
            f.name for f in TARGET_SCHEMA.fields if f.name not in KEY_COLUMNS
        ]
        tgt_str = target.select(
            F.col("conv_id"),
            F.col("turn_idx"),
            F.col("conv_id").cast("string").alias("_ck"),
            F.col("turn_idx").cast("string").alias("_tk"),
            F.struct(*[F.col(c) for c in non_key_cols]).alias("_trow"),
        )
        matches = F.broadcast(src_wide).join(
            tgt_str,
            (F.col(f"`{conv_f}`") == F.col("_ck"))
            & (F.col(f"`{turn_f}`") == F.col("_tk")),
        )
        # identifier-uniqueness probe (F8/O3, AlignmentProcessor.java:
        # 1048-1055 LIMIT 2): only probe values that identify exactly ONE
        # target row pair — an ambiguous key would pair one probe record
        # with many rows and pollute the votes.  The paired target ROW
        # rides the same aggregation (`_trow` — exactly one row survives
        # the _n_tgt==1 gate, so max() is just "the row"), which saves
        # the probe-fetch its own full scan+resolve of the target.
        paired = (
            matches.groupBy("lsn")
            .agg(
                F.count(F.lit(1)).alias("_n_tgt"),
                F.max("conv_id").alias("conv_id"),
                F.max("turn_idx").alias("turn_idx"),
                F.max("_trow").alias("_trow"),
            )
            .where(F.col("_n_tgt") == 1)
            .select("lsn", *KEY_COLUMNS, "_trow")
            .orderBy(F.md5(F.col("lsn").cast("string")))
            .limit(n_probe)
        ).cache()  # ≤ n_probe rows, reused by 3+ joins — without the
        # cache each reuse re-runs the pairing scan of the target

        # --- (3) probe rows + bounded melt (no second target scan) ---
        tgt_probe_rows = paired.select(
            *KEY_COLUMNS, *[F.col(f"_trow.{c}").alias(c) for c in non_key_cols]
        )
        tgt_long = melt_target(tgt_probe_rows).cache()
        if debug is not None:
            debug["tgt_probe_rows"] = tgt_probe_rows
            debug["tgt_long"] = tgt_long

        # --- all-pairs field match per record pair (J1) ---
        non_key_tgt = tgt_long.where(~F.col("tgt_column").isin(KEY_COLUMNS))
        pairs = (
            paired.join(src_flat, on="lsn")
            .where(~F.col("src_field").isin(list(key_fields.values())))
            .join(non_key_tgt, on=KEY_COLUMNS)
            .select("lsn", "src_field", "tgt_column", "src_value", "tgt_value")
        )
        # Stable-shape stage barrier for the metric catalog: the catalog
        # compiles to a LARGE generated class whose source embeds the
        # input stage's column ordinals, so fused directly onto the
        # (payload-shape-dependent) join stage it re-compiles — several
        # seconds of driver-side Janino per NEW wire shape, which a
        # drifted replay pays on every realign (measured via thread
        # dumps: the collect thread sat in UnitCompiler).  One exchange
        # here pins the metric stage's input schema to these five
        # columns, so the class compiles once per session and every
        # later shape reuses it from the codegen cache.  The exchange
        # moves ≤ n_probe × fields × columns bounded rows — noise.  The
        # partition count is a small constant because the stage's input
        # is bounded by the probe sample at ANY scale, and each task
        # pays a Python-worker round trip for the Arrow-batched edit
        # metrics — 32 near-empty Arrow exchanges cost more than 4 full
        # ones (guide §4: fewer, fuller batches across the boundary).
        pairs = pairs.repartition(4)
        # identifier/numeric/url routing (C4/C3/X3, :820-873):
        # * both sides numeric → parsed-double equality ("12.50" == "12.5")
        # * src numeric-or-url  → exact equality or a RegExer rule only
        #   (never fuzzy: "123" vs "124" must not earn a 0.66 vote)
        # * otherwise           → fuzzy arg-max, with the compiled RegExer
        #   ruleset as one more exact candidate (config-driven, compiled
        #   to a single Column expression — RegExer.java:6-15)
        sv, tv = F.col("src_value"), F.col("tgt_value")
        cached = _probe_exprs()
        rule_struct = (
            cached["rule"]
            if ruleset is None
            else F.struct(
                compile_ruleset(ruleset)(sv, tv).alias("score"),
                F.lit("RegExer").alias("metric"),
            )
        )
        eq_struct = cached["eq"]
        num_struct = cached["num"]
        both_num = cached["both_num"]
        src_fast = cached["src_fast"]
        bm = cached["bm"]
        exact_cands = [eq_struct, rule_struct]
        fuzzy_cands = [bm, rule_struct]
        if classifier is not None:
            # X2 seam (GbClassifier.java:12-26): learned equality joins
            # the exact-candidate set, Arrow-batched over the probe pairs
            from filipo_spark.functions.classifier import classifier_metric

            clf_struct = F.struct(
                classifier_metric(classifier)(sv, tv).alias("score"),
                F.lit("Classifier").alias("metric"),
            )
            exact_cands.append(clf_struct)
            fuzzy_cands.append(clf_struct)
        scored = pairs.select(
            "lsn",
            "src_field",
            "tgt_column",
            F.when(both_num, num_struct)
            .when(src_fast, F.greatest(*exact_cands))
            .otherwise(F.greatest(*fuzzy_cands))
            .alias("bm"),
        ).select("lsn", "src_field", "tgt_column", "bm.score", "bm.metric")
        hits = scored.where(F.col("score") >= string_similarity).cache()

        # --- record-similarity gate (F6, :179-184) ---
        n_src_fields = len(all_src) - len(key_fields)
        n_tgt_cols = len(TARGET_SCHEMA.fields) - len(KEY_COLUMNS)
        rec_gate = max(1.0, min(n_src_fields, n_tgt_cols) * record_similarity)
        matching = (
            hits.select("lsn", "src_field", "tgt_column")
            .distinct()
            .groupBy("lsn")
            .agg(F.count(F.lit(1)).alias("n_matched"))
            .where(F.col("n_matched") > rec_gate)
            .select("lsn")
        )
        # the matching-record count is folded INTO the plan (broadcast
        # 1-row agg) instead of being its own eager action: each align()
        # job on the bounded sample costs far more in scheduling/codegen
        # than in data, so the fixed cost IS the job count.  The count
        # materializes driver-side from the final collect below; only the
        # no-survivor edge (and evaluation mode, which needs the matching
        # set up front) still pays a dedicated count job.
        n_matching: int | None = None
        if evaluate_dir:
            n_matching = matching.count()
            if n_matching == 0:
                raise ValueError(
                    "alignment failed: no record pair passed the similarity gate"
                )
            _dump_evaluation_pairs(
                src_flat, tgt_long, paired, matching, evaluate_dir, evaluate_k
            )

        # --- votes (A6) over matching records only ---
        votes = (
            hits.join(matching, on="lsn")
            .groupBy("src_field", "tgt_column", "metric")
            .agg(F.count(F.lit(1)).alias("votes"))
        )
        # arg-max metric per (src,tgt), fuzzy beats Equals on ties (A7)
        w_metric = Window.partitionBy("src_field", "tgt_column").orderBy(
            F.desc("votes"),
            F.asc(F.col("metric").isin(list(EQUALS_METRICS)).cast("int")),
            F.asc("metric"),
        )
        best = (
            votes.withColumn("rn", F.row_number().over(w_metric))
            .where("rn = 1")
            .drop("rn")
        )
        # vote threshold (F10/A-gates): votes ≥ matches × candidate_responses
        if n_matching is None:
            best = best.crossJoin(
                F.broadcast(matching.agg(F.count(F.lit(1)).alias("_n_matched")))
            )
        else:
            best = best.withColumn("_n_matched", F.lit(n_matching))
        best = best.where(
            F.col("votes") >= F.col("_n_matched") * candidate_responses
        )
        # path-depth discount (C12, AlignmentProcessor.java:651-661): when
        # ranking candidate src paths, votes are divided by
        # 1 + |depth(src) - depth(tgt)| — a value echoed at a mismatched
        # nesting depth is a weaker signal than the same value at the
        # expected depth.  Target columns are flat (depth 1); src depth =
        # dots + 1.  Discounted votes RANK candidates (A9); the raw count
        # still feeds the vote threshold and confidence.
        src_depth = F.size(F.split(F.col("src_field"), r"\."))
        discount = F.lit(1) + F.abs(F.lit(1) - src_depth)
        best = best.withColumn("weighted_votes", F.col("votes") / discount)
        # wildcard prefix-share (A10/A11, :786-798): for a [*]-collapsed
        # src path, confidence-of-the-wildcard = Σ votes of the collapsed
        # family / Σ votes of ALL src paths voting for that target —
        # reported per linkage point as wildcard_confidence.
        vt = votes.groupBy("src_field", "tgt_column").agg(F.sum("votes").alias("_v"))
        tgt_tot = vt.groupBy("tgt_column").agg(F.sum("_v").alias("_v_all"))
        wc = vt.join(tgt_tot, on="tgt_column").select(
            "src_field",
            "tgt_column",
            F.round(F.col("_v") / F.col("_v_all"), 4).alias("wildcard_confidence"),
        )

        # --- support (dataAvailability) & confidence (A12-A15) ---
        # NOTE: in the reference, min_support/min_confidence gate the SCP
        # *value statistics* (JointFeatureProcessor), not linkage points —
        # linkage points are gated by the vote threshold above.  Support
        # is reported as the function store's dataAvailability
        # (OutputManager.java:81-82); only the confidence floor applies.
        present = (
            src_flat
            .join(matching, on="lsn")
            .select("lsn", "src_field")
            .distinct()
            .groupBy("src_field")
            .agg(F.count(F.lit(1)).alias("n_present"))
        )
        scoredmap = (
            best.join(present, on="src_field")
            .join(wc, on=["src_field", "tgt_column"])
            .withColumn("support", F.col("n_present") / F.col("_n_matched"))
            .withColumn("confidence", F.col("votes") / F.col("n_present"))
            .where(F.col("confidence") >= min_confidence)
        )
        singles = []
        collected = scoredmap.select(
            "tgt_column", "src_field", "metric", "votes", "weighted_votes",
            "wildcard_confidence", "_n_matched",
            F.round("support", 4).alias("support"),
            F.round("confidence", 4).alias("confidence"),
        ).collect()
        if collected:
            n_matching = int(collected[0]["_n_matched"])
        elif n_matching is None:
            # nothing survived the gates — the count job runs only on
            # this edge, to tell "no matching records" (raise) apart from
            # "matching records but no single-field winners" (the
            # combined pass may still map)
            n_matching = matching.count()
        if n_matching == 0:
            raise ValueError("alignment failed: no record pair passed the similarity gate")
        for r in collected:
            row = dict(r.asDict(), n_parts=1, exact=r["metric"] in EQUALS_METRICS)
            row.pop("_n_matched")
            if "[*]" not in row["src_field"]:
                row.pop("wildcard_confidence")  # A11 stat is wildcard-only
            singles.append(row)

        # --- combined linkage points (J5, :674-717): when ≥2 src fields
        # vote for the SAME target column (FiLiPo's temporaryLinkagePoints
        # shape), their CONCATENATION may be the true mapping (first+last-
        # name case; here: text_head+text_tail).  Also probe fully-unmapped
        # targets against fully-unmapped src pairs. ---
        cand_by_tgt: dict[str, set] = {}
        for r in singles:
            cand_by_tgt.setdefault(r["tgt_column"], set()).add(r["src_field"])
        multi_tgt = [t for t, s in cand_by_tgt.items() if len(s) >= 2]
        single_tgt = set(cand_by_tgt)
        unmapped_tgt = [
            f.name
            for f in TARGET_SCHEMA.fields
            if f.name not in single_tgt and f.name not in key_fields
        ]
        mapped_src = {r["src_field"] for r in singles} | set(key_fields.values())
        unmapped_src = [s for s in all_src if s not in mapped_src and s not in deg_fields]
        comb_tgt = multi_tgt + unmapped_tgt
        # degenerate fields vote in singles but stay out of combined
        # candidacy (a near-constant fragment concatenates into spurious
        # matches), so they are subtracted from the multi-vote union just
        # as unmapped_src already excludes them (ADVICE r4)
        comb_src = sorted(
            (set().union(*(cand_by_tgt[t] for t in multi_tgt)) if multi_tgt else set())
            - deg_fields
        ) + unmapped_src
        combined = (
            _combined_pass(
                src_flat, tgt_long, paired, matching, comb_tgt, comb_src,
                n_matching, string_similarity, candidate_responses,
                distribution_variance,
            )
            if comb_tgt and len(comb_src) >= 2
            else []
        )
        for r in combined:
            r["n_parts"] = 2
            r["exact"] = True

        # --- final selection per target column: confidence, then exactness
        # (an exact mapping beats a fuzzy one — the identifier-fast-path
        # preference lifted to field selection), then fewer parts (a single
        # field beats a concatenation at equal strength), then
        # depth-discounted votes (C12 — a shallower path beats a deeper
        # decoy at equal vote count) ---
        cols = []
        for tgt in sorted({r["tgt_column"] for r in singles + combined}):
            pool = [r for r in singles + combined if r["tgt_column"] == tgt]
            best_row = max(
                pool,
                key=lambda r: (
                    r["confidence"], r["exact"], -r["n_parts"],
                    r.get("weighted_votes", r["votes"]),
                    [-ord(ch) for ch in r["src_field"]],
                ),
            )
            cols.append(
                {k: v for k, v in best_row.items() if k not in ("n_parts", "exact", "weighted_votes")}
            )

        # prune events: only degenerate fields that ended up mapping
        # NOTHING (a winner's dominance was real signal, e.g. a two-role
        # corpus) — recorded for lineage exactly like the reference's
        # removed error responses
        final_parts = set(key_fields.values())
        for r in cols:
            final_parts.update(r["src_field"].split("+"))
        prune_events = ([f"prune:list_responses(n={n_list})"] if n_list else []) + [
            f"prune:{r['src_field']}(modal={r['modal']},ratio={r['ratio']})"
            for r in sorted(deg_rows, key=lambda r: r["src_field"])
            if r["src_field"] not in final_parts
        ]
        events = prune_events + [
            f"map:{key_fields['conv_id']}->conv_id(key)",
            f"map:{key_fields['turn_idx']}->turn_idx(key)",
        ] + [
            f"map:{r['src_field']}->{r['tgt_column']}({r['metric']},conf={r['confidence']})"
            for r in cols
        ]
        return Mapping(
            key_fields=key_fields,
            columns=cols,
            evolution_events=events,
            payload_json_schema=payload_schema.json() if payload_schema else None,
        )
    finally:
        _sess.conf.set("spark.sql.adaptive.enabled", _aqe_prev)
        sample.unpersist()
        src_flat_base.unpersist()
        if tgt_long is not None:
            tgt_long.unpersist()
        if paired is not None:
            paired.unpersist()


def _dump_evaluation_pairs(
    src_flat: DataFrame,
    tgt_long: DataFrame,
    paired: DataFrame,
    matching: DataFrame,
    out_dir: str,
    k: int,
) -> None:
    """Evaluation mode (S6, AlignmentProcessor.java:207-237): write up to
    ``k`` matched (probe record, target row) pairs as ONE header'd CSV —
    ``lsn, conv_id, turn_idx, side (api|kb), field, value`` — the
    mapper's recall-debugging artifact (the reference dumps per-record
    api_*/kb_* CSV file pairs; one partitioned file is the Spark shape)."""
    sel = matching.orderBy("lsn").limit(k).join(paired, on="lsn")
    api = sel.join(src_flat, on="lsn").select(
        "lsn", *KEY_COLUMNS, F.lit("api").alias("side"),
        F.col("src_field").alias("field"), F.col("src_value").alias("value"),
    )
    kb = sel.join(tgt_long, on=KEY_COLUMNS).select(
        "lsn", *KEY_COLUMNS, F.lit("kb").alias("side"),
        F.col("tgt_column").alias("field"), F.col("tgt_value").alias("value"),
    )
    (
        api.unionByName(kb)
        .orderBy("lsn", "side", "field")
        .coalesce(1)
        .write.mode("overwrite")
        .option("header", True)
        .csv(out_dir)
    )


def _combined_pass(
    src_flat: DataFrame,
    tgt_long: DataFrame,
    paired: DataFrame,
    matching: DataFrame,
    unmapped_tgt: list[str],
    unmapped_src: list[str],
    n_matching: int,
    string_similarity: float,
    candidate_responses: float,
    distribution_variance: float = DISTRIBUTION_VARIANCE,
) -> list[dict]:
    """Score concat(f1, f2) (and with a space) of unmapped src-field
    pairs against unmapped target columns over the matching probe set —
    the engine's combined linkage point (AlignmentProcessor.java:674-717).

    Co-occurrence gate (:697-709): the two parts of a combined point
    must occur (nearly) equally often in the matching records —
    ``min(present) ≥ (1 − distribution_variance) × max(present)`` (the
    reference's ``remoteVotes / maxVotes ≥ 1 − dv``).  First+last-name
    style splits always travel together; a pair whose concatenation
    matches by coincidence on a sporadic fragment does not."""
    base = (
        paired.join(matching, on="lsn")
        .join(
            src_flat.where(F.col("src_field").isin(unmapped_src)), on="lsn"
        )
    )
    present = (
        base.select("lsn", "src_field")
        .distinct()
        .groupBy("src_field")
        .agg(F.count(F.lit(1)).alias("n_present"))
    )
    a = base.select("lsn", *KEY_COLUMNS, F.col("src_field").alias("f1"), F.col("src_value").alias("v1"))
    b = base.select("lsn", F.col("src_field").alias("f2"), F.col("src_value").alias("v2"))
    pairs = a.join(b, on="lsn").where(F.col("f1") != F.col("f2"))
    t = tgt_long.where(F.col("tgt_column").isin(unmapped_tgt))
    joined = pairs.join(t, on=KEY_COLUMNS)
    cat = F.concat(F.col("v1"), F.col("v2"))
    cat_sp = F.concat_ws(" ", F.col("v1"), F.col("v2"))
    score = F.greatest(
        (cat == F.col("tgt_value")).cast("double"),
        (cat_sp == F.col("tgt_value")).cast("double") * 0.999,  # prefer plain concat
    )
    hits = joined.select(
        "lsn", "f1", "f2", "tgt_column", score.alias("score")
    ).where(F.col("score") >= string_similarity)
    votes = (
        hits.groupBy("f1", "f2", "tgt_column")
        .agg(F.count(F.lit(1)).alias("votes"), F.max("score").alias("mx"))
        .where(F.col("votes") >= n_matching * candidate_responses)
        .join(
            present.select(F.col("src_field").alias("f1"), F.col("n_present").alias("_n1")),
            on="f1",
        )
        .join(
            present.select(F.col("src_field").alias("f2"), F.col("n_present").alias("_n2")),
            on="f2",
        )
        .where(
            F.least("_n1", "_n2")
            >= F.lit(1.0 - distribution_variance) * F.greatest("_n1", "_n2")
        )
    )
    w = Window.partitionBy("tgt_column").orderBy(
        F.desc("votes"), F.desc("mx"), F.asc("f1"), F.asc("f2")
    )
    rows = votes.withColumn("rn", F.row_number().over(w)).where("rn = 1").collect()
    out = []
    for r in rows:
        sep = "" if r["mx"] >= 1.0 else " "
        out.append(
            {
                "tgt_column": r["tgt_column"],
                "src_field": f"{r['f1']}+{r['f2']}",
                "metric": "CombinedEqual",
                "votes": r["votes"],
                "support": round(r["votes"] / n_matching, 4),
                "confidence": round(r["votes"] / n_matching, 4),
                "combine_sep": sep,
            }
        )
    return out


def _payload_get(field_name: str):
    """payload[field] accessor; wildcard fields match any index ([*]→[i]).

    Multi-value policy (declared): a ``[*]`` linkage point denotes the
    whole array family (OutputManager.java:220-316 stores ``[*]`` paths);
    when a record carries SEVERAL matching indexed entries, the
    **lowest-indexed non-null entry wins** — entries are sorted by their
    full numeric index vector (multi-digit-safe: [2] < [10]), then by
    key.  Deterministic and independent of map entry order; nulls are
    skipped so a sparse array still yields its first real value."""
    if "[*]" in field_name:
        pat = "^" + re.escape(field_name).replace(re.escape("[*]"), r"\[\d+\]") + "$"
        entries = F.map_entries(
            F.map_filter("payload", lambda k, v: k.rlike(pat) & v.isNotNull())
        )
        ranked = F.transform(
            entries,
            lambda e: F.struct(
                F.transform(
                    F.regexp_extract_all(e["key"], F.lit(r"\[(\d+)\]"), F.lit(1)),
                    lambda s: s.cast("int"),
                ).alias("idx"),
                e["key"].alias("k"),
                e["value"].alias("v"),
            ),
        )
        return F.try_element_at(F.array_sort(ranked), F.lit(1))["v"]
    return F.try_element_at("payload", F.lit(field_name))


def apply_mapping(drifted: DataFrame, mapping: Mapping) -> DataFrame:
    """Drifted (lsn, op, payload) → CHANGE_SCHEMA rows, ALTER-free:
    renames + casts driven by the mapping; combined linkage points
    concatenate their parts; unmapped target columns null.  Pure column
    projection — runs on full batches at stream volume (a JSON-string
    payload adds exactly one codegen'd from_json+flatten projection,
    using the schema captured at align() time so streaming sources need
    no inference collect)."""
    json_schema = None
    if mapping.payload_json_schema:
        import json as _json

        from pyspark.sql.types import StructType

        json_schema = StructType.fromJson(_json.loads(mapping.payload_json_schema))
    drifted = normalize_payload(drifted, json_schema=json_schema)
    m = mapping.as_dict()
    seps = {
        r["tgt_column"]: r.get("combine_sep", "")
        for r in mapping.columns
        if "+" in r["src_field"]
    }
    cols = [F.col("lsn"), F.col("op")]
    for f_ in TARGET_SCHEMA.fields:
        if f_.name in m:
            src = m[f_.name]
            if "+" in src:
                parts = [_payload_get(p) for p in src.split("+")]
                expr = F.concat_ws(seps.get(f_.name, ""), *parts)
                # concat_ws skips nulls; an all-null pair must stay null
                expr = F.when(
                    parts[0].isNull() & parts[1].isNull(), F.lit(None)
                ).otherwise(expr)
            else:
                expr = _payload_get(src)
            cols.append(expr.cast(f_.dataType).alias(f_.name))
        else:
            cols.append(F.lit(None).cast(f_.dataType).alias(f_.name))
    return drifted.select(*cols)
