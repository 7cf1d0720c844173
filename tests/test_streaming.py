"""Structured Streaming tail tests: stream-vs-batch equality, checkpoint
resume, duplicate-delivery fencing, drifted in-stream mapping."""

from __future__ import annotations

import shutil

from filipo_spark.generators import (
    gen_changelog,
    gen_drifted,
    gen_echo_changelog,
    gen_transcripts,
)
from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical
from filipo_spark.streaming.tail import tail_changelog
from filipo_spark.table.icelet import IceletTable

from tests.conftest import df_rows


def _want(spark, log):
    empty = to_physical(spark.createDataFrame([], gen_transcripts(spark, 1).schema))
    return df_rows(canonical(logical(apply_batch(empty, log))))


def test_stream_equals_batch_and_resume(spark, tmp_path):
    log = gen_changelog(spark, n_conv=15, n_events=1500, seed=33)
    src = str(tmp_path / "wal")
    # two file groups arriving over time
    log.where("lsn % 2 = 0").write.parquet(src)
    want_half = _want(spark, log.where("lsn % 2 = 0"))

    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=4)
    ckpt = str(tmp_path / "ckpt")
    s1 = tail_changelog(spark, src, table, ckpt, available_now=True)
    assert s1["batches"] >= 1
    assert df_rows(canonical(table.read_logical(spark))) == want_half

    # late files arrive; resume from the SAME checkpoint → only new data applies
    log.where("lsn % 2 = 1").write.mode("append").parquet(src)
    tail_changelog(spark, src, table, ckpt, available_now=True)
    assert df_rows(canonical(table.read_logical(spark))) == _want(spark, log)

    # fresh checkpoint over the same files: stream re-delivers everything,
    # manifest fence + idempotent MERGE keep state identical
    before = df_rows(canonical(table.read_logical(spark)))
    shutil.rmtree(ckpt)
    tail_changelog(spark, src, table, str(tmp_path / "ckpt2"), available_now=True)
    assert df_rows(canonical(table.read_logical(spark))) == before


def test_stream_with_drift_mapping(spark, tmp_path):
    target = gen_transcripts(spark, n_conv=10, max_turns=10, seed=44)
    log = gen_changelog(spark, n_conv=10, n_events=800, seed=44, max_turns=10)
    from filipo_spark.align import align

    mapping = align(gen_drifted(gen_echo_changelog(target), "rename"), target)
    src = str(tmp_path / "wal")
    gen_drifted(log, "rename").write.parquet(src)

    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=4)
    table.bootstrap(target)
    tail_changelog(spark, src, table, str(tmp_path / "ckpt"), mapping=mapping)

    want = df_rows(canonical(logical(apply_batch(to_physical(target), log))))
    assert df_rows(canonical(table.read_logical(spark))) == want
    # evolution events recorded in commit lineage
    evo = [e for m in table.manifest() for e in m["evolution_events"]]
    assert any("->conv_id(key)" in e for e in evo)


def test_stream_compaction_cadence(spark, tmp_path):
    """Long-running tails stay read-bounded: compact_every folds delta
    files while the stream applies batches; state is unaffected."""
    log = gen_changelog(spark, n_conv=10, n_events=1200, seed=46)
    src = str(tmp_path / "wal")
    for k in range(3):
        log.where(f"lsn % 3 = {k}").write.mode("append").parquet(src)
    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=4)
    stats = tail_changelog(
        spark, src, table, str(tmp_path / "ckpt"),
        max_files_per_trigger=1, compact_every=1, compact_min_files=2,
    )
    assert stats["batches"] >= 2
    assert df_rows(canonical(table.read_logical(spark))) == _want(spark, log)
    files = sum(len(v) for v in table.current_snapshot()["files"].values())
    assert files <= 4  # folded back to ~one file per bucket


def test_stream_with_raw_json_drift(spark, tmp_path):
    """Flagship C9×St path: a raw-JSON wire WAL (payload = nested JSON
    string) is aligned once in batch (schema inferred + stored in the
    Mapping), then streamed through the same apply path — no schema
    inference on the stream, final state equals the undrifted replay."""
    from filipo_spark.align import align
    from filipo_spark.align.mapper import Mapping

    target = gen_transcripts(spark, n_conv=10, max_turns=10, seed=45)
    log = gen_changelog(spark, n_conv=10, n_events=800, seed=45, max_turns=10)
    mapping = align(gen_drifted(gen_echo_changelog(target), "json"), target)
    assert mapping.payload_json_schema  # schema captured at align() time
    # round-trip through the function-store artifact (what a stream job loads)
    mapping = Mapping.from_json(mapping.to_json())

    src = str(tmp_path / "wal")
    gen_drifted(log, "json").write.parquet(src)
    table = IceletTable.create(str(tmp_path / "tbl"), n_buckets=4)
    table.bootstrap(target)
    tail_changelog(spark, src, table, str(tmp_path / "ckpt"), mapping=mapping)

    want = df_rows(canonical(logical(apply_batch(to_physical(target), log))))
    assert df_rows(canonical(table.read_logical(spark))) == want
