"""Schema-evolution mapper golden tests (FIXTURES.md §3).

The mapper must recover each drift profile's ground-truth mapping with
precision = recall = 1.0 and, end-to-end, a replay of the drifted stream
through apply_mapping must equal the replay of the undrifted stream.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filipo_spark.align import align, apply_mapping
from filipo_spark.generators import (
    gen_changelog,
    gen_drifted,
    gen_echo_changelog,
    gen_transcripts,
)
from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical

from tests.conftest import df_rows

GROUND_TRUTH = {
    "rename": {
        "conv_id": "conversation_id",
        "turn_idx": "turnIndex",
        "role": "role",
        "text": "content",
        "tool": "tool_name",
        "ts": "event_time",
    },
    "typedrift": {
        "conv_id": "conversation_id",
        "turn_idx": "turn_index",
        "role": "author_role",
        "text": "content",
        "tool": "tool_name",
        "ts": "event_time",
    },
    "nested": {
        "conv_id": "message.conv",
        "turn_idx": "message.idx",
        "role": "message.meta.role",
        "text": "message.text",
        "tool": "tools[*].name",
        "ts": "message.meta.time",
    },
}
# raw-JSON wire profile flattens to the same dotted paths as 'nested'
GROUND_TRUTH["json"] = GROUND_TRUTH["nested"]


@pytest.fixture(scope="module")
def base(spark):
    target = gen_transcripts(spark, n_conv=40, max_turns=20, seed=77)
    # probe sample: stream slice echoing rows the target already holds
    # (FiLiPo's probing contract — responses describe the same entities)
    echo = gen_echo_changelog(target)
    changes = gen_changelog(spark, n_conv=40, n_events=3000, seed=77, max_turns=20)
    return target, echo, changes


@pytest.mark.parametrize("profile", ["rename", "typedrift", "nested", "json"])
def test_mapper_recovers_ground_truth(spark, base, profile):
    target, echo, _changes = base
    drifted = gen_drifted(echo, profile)
    mapping = align(drifted, target)
    assert mapping.as_dict() == GROUND_TRUTH[profile]
    assert all(r["confidence"] > 0 for r in mapping.columns)
    assert len(mapping.evolution_events) == 6


def test_mapper_rejects_decoys(spark, base):
    """decoy profile: author_role (partial copy of role) and comment
    (text prefix) must NOT appear in the mapping (precision gate)."""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "decoy"), target)
    mapped_src = set(mapping.as_dict().values())
    assert "author_role" not in mapped_src
    assert "comment" not in mapped_src
    assert mapping.as_dict() == GROUND_TRUTH["rename"]


@pytest.mark.parametrize("profile", ["rename", "typedrift", "nested", "json"])
def test_e2e_drifted_replay_equals_undrifted(spark, base, profile):
    """BASELINE invariant under drift: the mapping is learned from an
    echo probe sample, then applied to the FULL drifted stream (whose
    update values differ from the target) — final state must equal the
    undrifted replay."""
    target, echo, changes = base
    mapping = align(gen_drifted(echo, profile), target)
    drifted = gen_drifted(changes, profile)
    recovered = apply_mapping(drifted, mapping)

    phys0 = to_physical(target)
    want = canonical(logical(apply_batch(phys0, changes)))
    got = canonical(logical(apply_batch(phys0, recovered)))
    # ISO format truncates sub-second precision; generator uses whole
    # seconds so states must match exactly
    assert df_rows(got) == df_rows(want)


def test_mixed_profile_union_of_drifts(spark, base):
    """FIXTURES §3 `mixed`: every drift family at once on disjoint
    columns — renames, nested paths, split text, wildcard tool, both
    decoys.  Precision = recall = 1.0 on the union ground truth."""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "mixed"), target, n_probe=150)
    assert mapping.as_dict() == {
        "conv_id": "conversation_id",
        "turn_idx": "turnIndex",
        "role": "message.meta.role",
        "text": "text_head+text_tail",
        "tool": "tools[*].name",
        "ts": "message.meta.time",
    }
    mapped_src = set(mapping.as_dict().values())
    assert "author_role" not in mapped_src and "comment" not in mapped_src


def test_degenerate_fields_pruned_before_voting(spark, base):
    """J4 wiring (AlignmentProcessor.java:251-310, error_threshold
    config.json:22): modal-dominated payload fields are kept out of key
    discovery and, when they win no target column through the normal
    gates, recorded as prune events — a constant "status":"ok" and a
    90%-modal "shard" field map nothing, and the rename ground truth is
    unchanged."""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "errorpage"), target)
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    mapped_src = set(mapping.as_dict().values())
    assert "status" not in mapped_src and "shard" not in mapped_src
    prunes = [e for e in mapping.evolution_events if e.startswith("prune:")]
    assert len(prunes) == 2, prunes
    assert prunes[0].startswith("prune:shard(modal=s-1,ratio=0.9"), prunes
    assert prunes[1] == "prune:status(modal=ok,ratio=1.0)", prunes
    # the threshold is respected: raised above the shard dominance, only
    # the constant field is pruned (the 2-valued shard survives the gate
    # and still must not map — the vote threshold catches it downstream)
    loose = align(gen_drifted(echo, "errorpage"), target, error_threshold=0.95)
    assert [e for e in loose.evolution_events if e.startswith("prune:")] == [
        "prune:status(modal=ok,ratio=1.0)"
    ]
    assert loose.as_dict() == GROUND_TRUTH["rename"]


def test_exactly_half_modal_field_survives_prune(spark):
    """ADVICE r3: the degenerate gate is STRICTLY greater-than — a
    legitimate two-value field whose modal value covers exactly 50% of
    the probe (user/assistant alternating roles) must keep its mapping;
    the reference prunes modal error *responses*, so the field-level
    analog must not be more aggressive than it needs to be."""
    target = gen_transcripts(spark, n_conv=40, max_turns=20, seed=77).withColumn(
        "role",
        F.when(F.pmod("turn_idx", F.lit(2)) == 0, F.lit("user")).otherwise(
            F.lit("assistant")
        ),
    )
    mapping = align(gen_drifted(gen_echo_changelog(target), "rename"), target)
    assert mapping.as_dict()["role"] == "role"
    assert not any(
        e.startswith("prune:role") for e in mapping.evolution_events
    ), mapping.evolution_events


def test_depth_discount_rejects_deeper_decoy(spark, base):
    """C12 (AlignmentProcessor.java:651-661): a perfect copy of role at a
    DEEPER path ties on votes, confidence and exactness — only the
    1/(1+|Δdepth|) discount separates it; the shallower true path must
    win.  (Without the discount the tie-break picks the lexicographically
    smaller decoy path.)"""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "deepdecoy"), target)
    assert mapping.as_dict() == GROUND_TRUTH["nested"]
    assert mapping.as_dict()["role"] == "message.meta.role"


def test_wildcard_prefix_share_confidence(spark, base):
    """A10/A11 (:786-798): a wildcard linkage point reports the
    prefix-share statistic Σ(family votes)/Σ(all votes for the target);
    a competing flat copy of tool pushes it strictly below 1."""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "wildshare"), target)
    assert mapping.as_dict() == GROUND_TRUTH["nested"]
    tool_row = [r for r in mapping.columns if r["tgt_column"] == "tool"][0]
    assert 0.0 < tool_row["wildcard_confidence"] < 1.0
    role_row = [r for r in mapping.columns if r["tgt_column"] == "role"][0]
    assert "wildcard_confidence" not in role_row  # wildcard-only stat
    # the clean nested profile keeps the full share
    clean = align(gen_drifted(echo, "nested"), target)
    clean_tool = [r for r in clean.columns if r["tgt_column"] == "tool"][0]
    assert clean_tool["wildcard_confidence"] == 1.0


def test_regexer_rule_decides_mapping(spark, base):
    """C3/X3: the compiled RegExer ruleset (reference config ruleset,
    RegExer.java:6-15) recovers a mapping every fuzzy metric misses —
    dash-mangled tool ids score < 0.5 on all metrics but are identical
    after the isbn-issn strip rule."""
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "punct"), target)
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    tool_row = [r for r in mapping.columns if r["tgt_column"] == "tool"][0]
    assert tool_row["metric"] == "RegExer"
    # without the ruleset the tool column must stay unmapped (proves the
    # rule, not a fuzzy metric, decided it)
    bare = align(gen_drifted(echo, "punct"), target, ruleset=[])
    assert "tool" not in bare.as_dict()


def test_classifier_seam_decides_mapping(spark, base):
    """X2 (GbClassifier.java:12-26 seam): a registered predict_batch
    classifier joins the exact candidates; with the ruleset disabled it
    alone recovers the dash-mangled tool mapping (metric 'Classifier')."""
    import pandas as pd

    from filipo_spark.functions.classifier import register_classifier

    def strip_dashes(a: pd.Series, b: pd.Series) -> pd.Series:
        return a.str.replace("-", "", regex=False) == b.str.replace(
            "-", "", regex=False
        )

    register_classifier("dash-eq", strip_dashes)
    target, echo, _changes = base
    mapping = align(gen_drifted(echo, "punct"), target, ruleset=[], classifier="dash-eq")
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    tool_row = [r for r in mapping.columns if r["tgt_column"] == "tool"][0]
    assert tool_row["metric"] == "Classifier"


def test_list_responses_removed_from_probe(spark, base):
    """List-answer removal (AlignmentProcessor.java:312-340): a probe
    record whose payload is ONE top-level array spanning several indices
    ("the API answered with a list of entities") mixes two rows' values
    and is dropped before flattening — recorded as a prune event; the
    mapping is unaffected.  Single-entity arrays (tools[0].*) pass: the
    nested-profile golden above covers that."""
    import pyspark.sql.functions as F
    from pyspark.sql import Window

    target, echo, _changes = base
    normal = gen_drifted(echo, "rename")

    def rekey(col, i):
        return F.map_from_entries(
            F.transform(
                F.map_entries(col),
                lambda e: F.struct(
                    F.concat(F.lit(f"results[{i}]."), e["key"]), e["value"]
                ),
            )
        )

    w = Window.orderBy("lsn")
    rn = normal.withColumn("rn", F.row_number().over(w))
    pairs = rn.alias("a").join(
        rn.withColumn("rn", F.col("rn") - 1).alias("b"), on="rn"
    )
    listy = pairs.select(
        (F.col("a.lsn") + F.lit(10**9)).alias("lsn"),
        F.lit("U").alias("op"),
        F.map_concat(
            rekey(F.col("a.payload"), 0), rekey(F.col("b.payload"), 1)
        ).alias("payload"),
    ).limit(60)
    mapping = align(normal.unionByName(listy), target)
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    list_events = [
        e for e in mapping.evolution_events if e.startswith("prune:list_responses")
    ]
    assert len(list_events) == 1, mapping.evolution_events


def test_default_classifier_decides_mapping(spark, base):
    """X2 default model (GbClassifier.java:12-26 analog): the SHIPPED
    pure-numpy logistic recovers an envelope-wrapped tool id
    ("id::tool::search::v2::x") that every fuzzy metric scores < 0.5 and
    the full RegExer ruleset misses (no strip rule removes the envelope)
    — classifier="default" needs no user registration."""
    target, echo, _changes = base
    # with the default ruleset ON but no classifier: tool stays unmapped
    bare = align(gen_drifted(echo, "wrapped"), target)
    assert "tool" not in bare.as_dict()
    mapping = align(gen_drifted(echo, "wrapped"), target, classifier="default")
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    tool_row = [r for r in mapping.columns if r["tgt_column"] == "tool"][0]
    assert tool_row["metric"] == "Classifier"


def test_evaluation_mode_dump(spark, base, tmp_path):
    """S6 (AlignmentProcessor.java:207-237 evaluation mode): up to k
    matched (probe record, target row) pairs land as a header'd CSV."""
    import csv
    import glob

    target, echo, _changes = base
    out = str(tmp_path / "eval")
    align(gen_drifted(echo, "rename"), target, evaluate_dir=out, evaluate_k=3)
    files = glob.glob(out + "/*.csv")
    assert files
    with open(files[0]) as f:
        rows = list(csv.DictReader(f))
    assert set(rows[0]) == {"lsn", "conv_id", "turn_idx", "side", "field", "value"}
    assert {r["side"] for r in rows} == {"api", "kb"}
    assert len({r["lsn"] for r in rows}) <= 3
    # each dumped record pair carries both sides
    by_lsn = {}
    for r in rows:
        by_lsn.setdefault(r["lsn"], set()).add(r["side"])
    assert all(sides == {"api", "kb"} for sides in by_lsn.values())


def test_uniqueness_probe_drops_ambiguous_keys(spark, base):
    """F8/O3 (AlignmentProcessor.java:1048-1055 LIMIT-2 probe): probe
    records whose key value matches MORE than one target row are dropped
    before pairing.  Fixture: a target polluted with stale duplicate-key
    rows (same (conv_id, turn_idx), different text).  Without the probe,
    each ambiguous record pairs with both variants and double-counts
    votes (confidence for echoed fields inflates past 1.0)."""
    import pyspark.sql.functions as F

    target, echo, _changes = base
    stale = target.where("turn_idx % 4 = 0").withColumn(
        "text", F.concat(F.lit("STALE "), F.col("text"))
    )
    dup_target = target.unionByName(stale)
    mapping = align(gen_drifted(echo, "rename"), dup_target)
    assert mapping.as_dict() == GROUND_TRUTH["rename"]
    assert all(r["confidence"] <= 1.0 for r in mapping.columns), mapping.columns
    assert all(r["support"] <= 1.0 for r in mapping.columns)


def test_align_target_access_is_bounded(spark, base, tmp_path):
    """Scale guard: align() never melts/distincts the full target —
    (1) key discovery scans ONLY the key columns (parquet ReadSchema
    pruned through the melt), (2) probe rows are fetched via a broadcast
    join on the paired keys, (3) the melted target slice is ≤ n_probe
    rows × column count."""
    target, echo, _changes = base
    p = str(tmp_path / "tgt")
    target.write.parquet(p)
    tgt = spark.read.parquet(p)
    dbg: dict = {}
    mapping = align(gen_drifted(echo, "rename"), tgt, n_probe=100, debug=dbg)
    assert mapping.as_dict() == GROUND_TRUTH["rename"]

    def plan(df):
        return df._jdf.queryExecution().executedPlan().toString()

    key_scan = [ln for ln in plan(dbg["key_long"]).splitlines() if "ReadSchema" in ln]
    assert key_scan and "text" not in key_scan[0] and "role" not in key_scan[0], key_scan
    assert "BroadcastHashJoin" in plan(dbg["tgt_probe_rows"])
    n_cols = len(tgt.columns)
    assert dbg["tgt_long"].count() <= 100 * n_cols
    assert dbg["tgt_probe_rows"].count() <= 100


def test_wildcard_multi_value_apply_lowest_index_wins(spark):
    """Declared [*] apply policy (OutputManager.java:220-316): when a
    record carries several entries of the wildcard family, the
    lowest-indexed NON-NULL entry wins — numeric index order ([2] before
    [10]), not map entry order, and nulls are skipped."""
    from filipo_spark.align.mapper import Mapping, apply_mapping

    rows = [
        # [10] listed before [2] in the map — numeric order must win
        (1, "U", {"cid": "c-1", "idx": "0", "msgs[10].text": "high", "msgs[2].text": "low"}),
        (2, "U", {"cid": "c-1", "idx": "1", "msgs[3].text": "only"}),
        (3, "U", {"cid": "c-1", "idx": "2", "msgs[0].text": None, "msgs[1].text": "first-real"}),
        (4, "U", {"cid": "c-1", "idx": "3"}),  # no family entry → null
    ]
    df = spark.createDataFrame(
        rows, "lsn long, op string, payload map<string,string>"
    )
    mapping = Mapping(
        key_fields={"conv_id": "cid", "turn_idx": "idx"},
        columns=[{"tgt_column": "text", "src_field": "msgs[*].text",
                  "metric": "Equal", "votes": 1, "support": 1.0, "confidence": 1.0}],
    )
    got = {
        r["lsn"]: r["text"]
        for r in apply_mapping(df, mapping).select("lsn", "text").collect()
    }
    assert got == {1: "low", 2: "only", 3: "first-real", 4: None}


def test_combined_cooccurrence_gate(spark):
    """Co-occurrence gate (AlignmentProcessor.java:697-709): a combined
    point is accepted only when its two parts occur (near-)equally often
    — min(present) ≥ (1−distribution_variance)·max(present).  Fixture:
    f1 on all 20 matching records, f2 on 6; their concat equals the
    target on those 6 (votes 6 ≥ 20×0.2 pass the vote gate), but the
    0.3 presence ratio fails the default dv=0 gate and passes dv=0.75."""
    from filipo_spark.align.mapper import _combined_pass

    n = 20
    paired = spark.createDataFrame(
        [(i, f"c{i}", 0) for i in range(n)], "lsn long, conv_id string, turn_idx int"
    )
    matching = paired.select("lsn")
    src_rows = [(i, "f1", f"A{i}") for i in range(n)] + [
        (i, "f2", f"B{i}") for i in range(6)
    ]
    src_flat = spark.createDataFrame(
        src_rows, "lsn long, src_field string, src_value string"
    )
    tgt_long = spark.createDataFrame(
        [(f"c{i}", 0, "name", f"A{i}B{i}") for i in range(n)],
        "conv_id string, turn_idx int, tgt_column string, tgt_value string",
    )
    args = (src_flat, tgt_long, paired, matching, ["name"], ["f1", "f2"], n, 0.5, 0.2)
    assert _combined_pass(*args, distribution_variance=0.0) == []
    loose = _combined_pass(*args, distribution_variance=0.75)
    assert len(loose) == 1 and loose[0]["src_field"] == "f1+f2"
    assert loose[0]["votes"] == 6


def test_apply_mapping_schema(spark, base):
    target, echo, changes = base
    out = apply_mapping(
        gen_drifted(changes, "rename"), align(gen_drifted(echo, "rename"), target)
    )
    from filipo_spark.schema import CHANGE_COLUMNS

    assert out.columns == CHANGE_COLUMNS
    assert dict(out.dtypes)["turn_idx"] == "int"
    assert dict(out.dtypes)["ts"] == "timestamp"
