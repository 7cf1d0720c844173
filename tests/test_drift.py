"""Drift detection + auto-realign: the self-healing loop (VERDICT r2 #1).

The mapper stops being a manual offline tool here: a replay/stream whose
wire shape flips mid-run must (a) detect the drift from per-batch health
ratios, (b) re-align against the table's current resolved state, and
(c) converge to the same final state as the undrifted stream, with the
re-alignment recorded (offset range + mapping hash) in the manifest.
Reference analog: re-probing on every run, AlignmentProcessor.java:72-95.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from filipo_spark.align import align
from filipo_spark.align.drift import mapping_health, should_realign
from filipo_spark.generators import gen_drifted, gen_echo_changelog, gen_transcripts
from filipo_spark.replay import run_drifted_replay
from filipo_spark.table.icelet import IceletTable

from tests.conftest import df_rows

BASE, SPAN = 1 << 41, 1 << 40


@pytest.fixture(scope="module")
def base(spark):
    target = gen_transcripts(spark, n_conv=40, max_turns=20, seed=77)
    mapping = align(gen_drifted(gen_echo_changelog(target), "rename"), target)
    return target, mapping


def _mutated(target):
    """Deterministic update the drifted stream carries: upper-case text
    on every 5th turn (SQL-portable — the oracle states it directly)."""
    mut = F.pmod(F.col("turn_idx"), F.lit(5)) == 0
    return target.withColumn("text", F.when(mut, F.upper("text")).otherwise(F.col("text")))


def test_mapping_health_ratios(spark, base):
    """unmapped_ratio ≈ 0 on the learned shape, ≈ 1 after a rename/nest
    flip; cast_fail_ratio isolates pure type drift (names stable, a typed
    value stops casting)."""
    target, mapping = base
    echo = gen_echo_changelog(target)

    ok = mapping_health(gen_drifted(echo, "rename"), mapping)
    assert ok["n_sampled"] > 0
    assert ok["unmapped_ratio"] == 0.0 and ok["cast_fail_ratio"] == 0.0
    assert not should_realign(ok)

    flipped = mapping_health(gen_drifted(echo, "nested"), mapping)
    assert flipped["unmapped_ratio"] > 0.9
    assert should_realign(flipped)

    # type drift: same field names, event_time no longer a timestamp —
    # exactly one of the two typed columns (ts, turn_idx) fails per record
    typedrift = gen_drifted(echo, "rename").withColumn(
        "payload",
        F.transform_values(
            "payload",
            lambda k, v: F.when(k == F.lit("event_time"), F.lit("not-a-time")).otherwise(v),
        ),
    )
    td = mapping_health(typedrift, mapping)
    assert td["unmapped_ratio"] == 0.0
    assert td["cast_fail_ratio"] == 0.5
    assert should_realign(td, threshold=0.4) and not should_realign(td, threshold=0.5)

    # empty batch: nothing to judge, never triggers
    empty = mapping_health(gen_drifted(echo, "rename").where("lsn < 0"), mapping)
    assert empty["n_sampled"] == 0 and not should_realign(empty)


def test_drifted_replay_auto_realigns_and_matches_undrifted(spark, base, tmp_path):
    """Mid-replay shape flip (rename → nested), with an EMPTY epoch in
    between: epoch 0 aligns from scratch (init), epoch 1 keeps the
    mapping (empty batch), epoch 2 detects ~100% unmapped fields,
    re-aligns against the table's current state, and the final table
    equals the mutated target exactly — with both alignments fenced in
    the commit manifest."""
    target, _ = base
    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=8)
    table.bootstrap(target)

    e1 = gen_drifted(gen_echo_changelog(target, start_lsn=BASE), "rename")
    e2 = gen_drifted(
        gen_echo_changelog(_mutated(target), start_lsn=BASE + 2 * SPAN), "nested"
    )
    epochs = [
        (BASE - 1, BASE + SPAN - 1),
        (BASE + SPAN - 1, BASE + 2 * SPAN - 1),  # gap: no events
        (BASE + 2 * SPAN - 1, BASE + 3 * SPAN - 1),
    ]
    report = run_drifted_replay(
        spark, table, e1.unionByName(e2), epochs=epochs, mapping=None
    )
    assert report.epochs_applied == 3
    assert [r["epoch"] for r in report.realigns] == [0, 2]
    assert "reason=init" in report.realigns[0]["event"]
    assert report.realigns[2 - 1]["health"]["unmapped_ratio"] > 0.9

    got = table.read_logical(spark)
    assert df_rows(got) == df_rows(_mutated(target))

    # manifest lineage: the realign events live on their exact epochs
    evo_by_epoch = {
        m["epoch"]: m["evolution_events"]
        for m in table.manifest()
        if m.get("kind") == "append"
    }
    assert any(e.startswith("realign:epoch=0") for e in evo_by_epoch[0])
    assert evo_by_epoch[1] == []
    assert any(
        e.startswith("realign:epoch=2") and "unmapped=" in e and "mapping=" in e
        for e in evo_by_epoch[2]
    )
    # resumability: a second run over the same ranges is fully fenced
    again = run_drifted_replay(
        spark, table, e1.unionByName(e2), epochs=epochs, mapping=report.mapping
    )
    assert again.epochs_skipped == 3 and again.epochs_applied == 0
    assert df_rows(table.read_logical(spark)) == df_rows(_mutated(target))


def test_stream_tail_auto_realigns(spark, base, tmp_path):
    """Streaming twin: the tail starts with a learned mapping, the wire
    shape flips between two availableNow drains of the same checkpoint,
    and the foreachBatch health check hot-swaps the mapping in-stream."""
    from filipo_spark.streaming.tail import tail_changelog

    target, mapping = base
    src = str(tmp_path / "wal")
    gen_drifted(gen_echo_changelog(target, start_lsn=BASE), "rename").write.parquet(src)

    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=4)
    table.bootstrap(target)
    ckpt = str(tmp_path / "ckpt")
    s1 = tail_changelog(
        spark, src, table, ckpt, mapping=mapping, auto_realign=True
    )
    assert s1["realigns"] == 0
    assert df_rows(table.read_logical(spark)) == df_rows(target)

    gen_drifted(
        gen_echo_changelog(_mutated(target), start_lsn=BASE + SPAN), "nested"
    ).write.mode("append").parquet(src)
    s2 = tail_changelog(
        spark, src, table, ckpt, mapping=s1["mapping"], auto_realign=True
    )
    assert s2["realigns"] == 1
    assert df_rows(table.read_logical(spark)) == df_rows(_mutated(target))
    evo = [e for m in table.manifest() for e in m["evolution_events"]]
    assert any(e.startswith("realign:batch=") for e in evo)
