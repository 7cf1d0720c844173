"""SCP statistics (A12-A15, F9), degenerate-column detection (J4 guise),
and combined linkage points (J5, the split drift profile)."""

from __future__ import annotations

from filipo_spark.align.scp import (
    confidence,
    degenerate_columns,
    implicit_support,
    scp,
    selectivity_filter,
    simple_support,
)

from tests.conftest import df_rows

# hand-computable fixture: 4 records, obs = (record_id, field, value)
MATCH_OBS = [
    (1, "color", "red"), (1, "size", "xl"),
    (2, "color", "red"), (2, "size", "m"),
    (3, "color", "blue"),
]
NONMATCH_OBS = [
    (4, "color", "blue"), (4, "noise", "zzz"),
]


def _obs(spark, rows):
    return spark.createDataFrame(rows, "record_id int, field string, value string")


def test_simple_support(spark):
    got = df_rows(simple_support(_obs(spark, MATCH_OBS), n_records=3, min_support=0.4))
    # color in 3/3 records, size in 2/3
    assert got == [("color", 3, 1.0), ("size", 2, round(2 / 3, 6))]


def test_implicit_support_and_confidence(spark):
    obs = _obs(spark, MATCH_OBS)
    imp = {(r[0], r[1]): r[2] for r in df_rows(implicit_support(obs))}
    assert imp[("color", "red")] == 2 and imp[("color", "blue")] == 1
    conf = {(r[0], r[1]): r[3] for r in df_rows(confidence(obs, n_records=3))}
    assert conf[("color", "red")] == round(2 / 3, 6)
    assert conf[("size", "m")] == 0.5


def test_selectivity_filter(spark):
    got = df_rows(
        selectivity_filter(_obs(spark, MATCH_OBS), _obs(spark, NONMATCH_OBS)).select(
            "field", "value"
        )
    )
    # (color, blue) occurs in a non-matching record → removed
    assert ("color", "blue") not in set(got)
    assert ("color", "red") in set(got)


def test_scp(spark):
    got = df_rows(scp(_obs(spark, MATCH_OBS), _obs(spark, NONMATCH_OBS)))
    # P(valid) = 3/4; (color,red): sup=2/4, conf=(2/4)/(2/4)=1.0 > 0.75 ✓
    by_pair = {(r[0], r[1]): (r[2], r[3]) for r in got}
    assert by_pair[("color", "red")] == (0.5, 1.0)
    # (color,blue): conf=0.5 < 0.75 → dropped
    assert ("color", "blue") not in by_pair


def test_degenerate_columns(spark):
    df = spark.createDataFrame(
        [("ok", i, "A" if i < 8 else "B") for i in range(10)],
        "status string, i int, grade string",
    )
    got = {r[0]: (r[1], r[2]) for r in df_rows(degenerate_columns(df, threshold=0.5))}
    assert got["status"] == ("ok", 1.0)  # constant column
    assert got["grade"] == ("A", 0.8)  # modal 80%
    assert "i" not in got  # all-distinct column carries signal


def test_combined_linkage_split_profile(spark):
    from filipo_spark.align import align, apply_mapping
    from filipo_spark.generators import (
        gen_changelog,
        gen_drifted,
        gen_echo_changelog,
        gen_transcripts,
    )
    from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical

    target = gen_transcripts(spark, n_conv=30, max_turns=15, seed=88)
    # n_probe=150: the sparse tool column (~25% of rows) needs enough
    # probe records to clear the candidate_responses vote threshold —
    # the same sizing call FiLiPo makes with similarity_requests
    mapping = align(gen_drifted(gen_echo_changelog(target), "split"), target, n_probe=150)
    assert mapping.as_dict()["text"] == "text_head+text_tail"
    assert [r for r in mapping.columns if r["tgt_column"] == "text"][0][
        "metric"
    ] == "CombinedEqual"
    # e2e: full drifted split stream replays to the undrifted state
    changes = gen_changelog(spark, n_conv=30, n_events=2000, seed=88, max_turns=15)
    recovered = apply_mapping(gen_drifted(changes, "split"), mapping)
    phys = to_physical(target)
    want = df_rows(canonical(logical(apply_batch(phys, changes))))
    got = df_rows(canonical(logical(apply_batch(phys, recovered))))
    assert got == want
