"""Icelet table + exactly-once replay tests (FIXTURES.md §5 scenarios)."""

from __future__ import annotations

import pytest

from filipo_spark.generators import gen_changelog, gen_transcripts
from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical
from filipo_spark.replay import run_replay
from filipo_spark.table.icelet import IceletTable

from tests.conftest import df_rows


@pytest.fixture()
def log(spark):
    return gen_changelog(spark, n_conv=20, n_events=2500, seed=13)


def expected_state(spark, log):
    empty = to_physical(spark.createDataFrame([], gen_transcripts(spark, 1).schema))
    return df_rows(canonical(logical(apply_batch(empty, log))))


def test_replay_one_shot_vs_batched(spark, tmp_path, log):
    want = expected_state(spark, log)
    t1 = IceletTable.create(str(tmp_path / "t1"), n_buckets=8)
    r1 = run_replay(spark, t1, log, batch_size=10**9)
    assert r1.epochs_applied == 1
    assert df_rows(canonical(t1.read_logical(spark))) == want

    t2 = IceletTable.create(str(tmp_path / "t2"), n_buckets=8)
    r2 = run_replay(spark, t2, log, batch_size=500)
    assert r2.epochs_applied >= 5
    assert df_rows(canonical(t2.read_logical(spark))) == want


def test_replay_duplicate_run_skips_all(spark, tmp_path, log):
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=8)
    run_replay(spark, t, log, batch_size=800)
    before = df_rows(canonical(t.read_logical(spark)))
    snap_before = t.current_snapshot_id()
    r = run_replay(spark, t, log, batch_size=800)  # full duplicate replay
    assert r.epochs_applied == 0 and r.epochs_skipped > 0
    assert t.current_snapshot_id() == snap_before
    assert df_rows(canonical(t.read_logical(spark))) == before


def test_replay_kill_resume(spark, tmp_path, log):
    want = expected_state(spark, log)
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=8)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_replay(spark, t, log, batch_size=600, fail_after_data_write_on_epoch=2)
    # crash left epochs 0-1 committed, epoch 2 data orphaned, pointer intact
    assert len(t.manifest()) == 2
    mid = t.read_logical(spark)
    assert mid.count() > 0  # table still readable (old snapshot live)
    # resume: re-run the same replay — committed epochs skip, rest apply
    r = run_replay(spark, t, log, batch_size=600)
    assert r.epochs_skipped == 2
    assert df_rows(canonical(t.read_logical(spark))) == want
    # orphan crash files are invisible and vacuum removes them
    removed = t.vacuum()
    assert any("orphan-crash" in p for p in removed)
    assert df_rows(canonical(t.read_logical(spark))) == want


def test_crash_between_pointer_swap_and_manifest(spark, tmp_path, log, monkeypatch):
    """A crash after CURRENT swaps but before the manifest fence line is
    appended must NOT lose the epoch: the offset range stays unfenced, a
    restart re-applies it, and the idempotent LWW fold converges.  (The
    reverse write order — fence before pointer — would record the range
    as committed while readers stay on the parent snapshot, silently
    dropping the epoch and letting vacuum() delete its files.)"""
    want = expected_state(spark, log)
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=8)
    run_replay(spark, t, log, batch_size=600, max_epochs=2)
    orig = IceletTable._append_manifest

    def boom(self, row):
        raise RuntimeError("simulated crash before manifest append")

    monkeypatch.setattr(IceletTable, "_append_manifest", boom)
    with pytest.raises(RuntimeError, match="simulated crash"):
        run_replay(spark, t, log, batch_size=600)
    monkeypatch.setattr(IceletTable, "_append_manifest", orig)
    # pointer moved ahead of the fence: epoch-2 data visible, range unfenced
    assert len(t.manifest()) == 2
    assert t.current_snapshot()["epoch"] == 2
    # restart: epochs 0-1 skip, epoch 2 RE-APPLIES (idempotent), rest apply
    r = run_replay(spark, t, log, batch_size=600)
    assert r.epochs_skipped == 2
    assert r.epochs_applied >= 1
    assert df_rows(canonical(t.read_logical(spark))) == want
    # the re-applied snapshot chains off the crashed one → vacuum keeps both
    t.vacuum()
    assert df_rows(canonical(t.read_logical(spark))) == want


def test_bootstrap_then_incremental(spark, tmp_path):
    target = gen_transcripts(spark, n_conv=12, max_turns=15, seed=21)
    log = gen_changelog(spark, n_conv=12, n_events=900, seed=22, max_turns=15)
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=4)
    t.bootstrap(target)
    assert df_rows(canonical(t.read_logical(spark))) == df_rows(canonical(target))
    run_replay(spark, t, log, batch_size=300)
    want = df_rows(canonical(logical(apply_batch(to_physical(target), log))))
    assert df_rows(canonical(t.read_logical(spark))) == want


def test_mor_vs_cow_equality_and_compaction(spark, tmp_path, log):
    """Merge-on-read and copy-on-write converge to identical logical state;
    compaction preserves it while folding delta files."""
    want = expected_state(spark, log)
    mor = IceletTable.create(str(tmp_path / "mor"), n_buckets=4, mode="mor")
    cow = IceletTable.create(str(tmp_path / "cow"), n_buckets=4, mode="cow")
    run_replay(spark, mor, log, batch_size=500)
    run_replay(spark, cow, log, batch_size=500)
    assert df_rows(canonical(mor.read_logical(spark))) == want
    assert df_rows(canonical(cow.read_logical(spark))) == want
    # mor accumulated delta files; compaction folds them to 1/bucket
    files_before = sum(len(v) for v in mor.current_snapshot()["files"].values())
    assert files_before > 4
    res = mor.compact(spark, min_files=2)
    assert res is not None and res.n_rows > 0
    files_after = sum(len(v) for v in mor.current_snapshot()["files"].values())
    assert files_after == 4
    assert df_rows(canonical(mor.read_logical(spark))) == want
    # replay after compaction still fenced
    r = run_replay(spark, mor, log, batch_size=500)
    assert r.epochs_applied == 0


def test_snapshot_time_travel(spark, tmp_path, log):
    """Snapshots are immutable file lists: reading an older snapshot id
    reproduces the state as of that commit, byte-identical, even after
    later epochs land (vacuum keeps lineage-referenced files)."""
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=8)
    run_replay(spark, t, log, batch_size=800, max_epochs=2)
    sid_mid = t.current_snapshot_id()
    state_mid = df_rows(canonical(logical(t.read(spark))))
    run_replay(spark, t, log, batch_size=800)  # rest of the log
    assert t.current_snapshot_id() != sid_mid
    assert sid_mid in t.snapshot_ids()
    t.vacuum()
    assert df_rows(canonical(logical(t.read(spark, snapshot_id=sid_mid)))) == state_mid
    assert df_rows(canonical(t.read_logical(spark))) == expected_state(spark, log)


def test_manifest_lineage(spark, tmp_path, log):
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=8)
    run_replay(spark, t, log, batch_size=1000)
    m = t.manifest()
    assert all(m[i]["offset_hi"] == m[i + 1]["offset_lo"] for i in range(len(m) - 1))
    assert all(mm["snapshot_id"] for mm in m)
    assert all(mm["n_rows"] > 0 for mm in m)
    # bucket pruning recorded: every commit rewrote only its touched buckets
    assert all(0 < len(mm["buckets"]) <= 8 for mm in m)


def test_bucket_pruning_small_batch(spark, tmp_path):
    """A single-conversation batch rewrites exactly one bucket."""
    from filipo_spark.schema import CHANGE_SCHEMA
    import datetime as dt

    t = IceletTable.create(str(tmp_path / "t"), n_buckets=16)
    big = gen_changelog(spark, n_conv=50, n_events=2000, seed=31)
    run_replay(spark, t, big, batch_size=10**9)
    one = spark.createDataFrame(
        [(10**7, "U", "conv-00000003", 1, "user", "edited", None,
          dt.datetime(2030, 1, 1))],
        CHANGE_SCHEMA,
    )
    res = t.apply_epoch(spark, one, epoch=99, offset_lo=10**7 - 1, offset_hi=10**7)
    assert len(res.buckets) == 1
    row = (
        t.read_logical(spark)
        .where("conv_id='conv-00000003' and turn_idx=1")
        .collect()
    )
    assert row and row[0]["text"] == "edited"


def test_delta_free_read_skips_resolve(spark, tmp_path, log):
    """A snapshot provably holding one version per key (bootstrap, first
    append into empty, full compaction) is read WITHOUT the LWW resolve
    fold — no Exchange in the read plan — while any MoR append onto
    existing data restores the fold; logical state identical throughout."""
    target = gen_transcripts(spark, n_conv=12, max_turns=8, seed=7)
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=4)
    t.bootstrap(target)
    assert t.current_snapshot()["delta_free"] is True
    plan = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "Aggregate" not in plan, plan
    assert df_rows(canonical(t.read_logical(spark))) == df_rows(canonical(target))

    # an append introduces deltas: flag drops, fold returns, state right
    run_replay(spark, t, log, batch_size=10**9)
    assert t.current_snapshot()["delta_free"] is False
    plan2 = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" in plan2, plan2
    want = df_rows(canonical(logical(apply_batch(to_physical(target), log))))
    assert df_rows(canonical(t.read_logical(spark))) == want

    # full compaction rewrites every non-empty bucket: flag restored
    res = t.compact(spark, min_files=2)
    assert res is not None
    assert t.current_snapshot()["delta_free"] is True
    plan3 = t.read(spark)._jdf.queryExecution().executedPlan().toString()
    assert "Aggregate" not in plan3, plan3
    assert df_rows(canonical(t.read_logical(spark))) == want


def test_first_append_into_empty_is_delta_free(spark, tmp_path, log):
    t = IceletTable.create(str(tmp_path / "t"), n_buckets=4)
    run_replay(spark, t, log, batch_size=10**9)  # one epoch from empty
    assert t.current_snapshot()["delta_free"] is True
    assert df_rows(canonical(t.read_logical(spark))) == expected_state(spark, log)
