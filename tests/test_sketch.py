"""KeyBloom sketch unit behavior (table/sketch.py): no false negatives,
bounded false positives, save/load/union round-trips, null handling."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from filipo_spark.table.sketch import KeyBloom


def _pos_rows(bloom, df):
    return [
        r["p"]
        for r in df.select(
            bloom.positions(F.col("conv_id"), F.col("turn_idx")).alias("p")
        ).collect()
    ]


def test_bloom_membership_fp_and_roundtrip(spark, tmp_path):
    keys = spark.createDataFrame(
        [(f"c-{i}", i % 7) for i in range(500)], "conv_id string, turn_idx int"
    )
    unseen = spark.createDataFrame(
        [(f"x-{i}", i % 7) for i in range(500)], "conv_id string, turn_idx int"
    )
    b = KeyBloom(1 << 16, 5).add_df(keys)

    # no false negatives, ever
    assert all(b.contains_positions(p) for p in _pos_rows(b, keys))
    # bounded false positives at this load (~3.8% bits set)
    fp = sum(b.contains_positions(p) for p in _pos_rows(b, unseen)) / 500
    assert fp < 0.05
    assert 0.0 < b.saturation < 0.1
    # a null key component is never a member
    assert not b.contains_positions(None)

    # save/load keeps the exact bit pattern; union is the bitwise OR
    path = str(tmp_path / "bloom.bin")
    b.save(path)
    b2 = KeyBloom.load(path, k=5)
    assert (b2.words == b.words).all() and b2.bits == b.bits
    b3 = KeyBloom(1 << 16, 5).add_df(unseen).union(b2)
    assert all(b3.contains_positions(p) for p in _pos_rows(b3, keys))
    assert all(b3.contains_positions(p) for p in _pos_rows(b3, unseen))

    with pytest.raises(ValueError, match="unionable"):
        KeyBloom(1 << 15, 5).union(b)
    with pytest.raises(ValueError, match="multiple of 64"):
        KeyBloom(100, 5)


def test_metrics_surface_bloom_saturation(spark, tmp_path):
    """Operability: replay_metrics reports the sketch's fill fraction on
    bloom tables (the resize-before-~0.5 signal) and omits the key
    entirely on tables without a sketch."""
    from filipo_spark.generators import gen_transcripts
    from filipo_spark.metrics import replay_metrics
    from filipo_spark.table.icelet import IceletTable

    target = gen_transcripts(spark, n_conv=10, max_turns=6, seed=3)
    t = IceletTable.create(str(tmp_path / "b"), n_buckets=4, bloom_bits=1 << 16)
    t.bootstrap(target)
    m = replay_metrics(t)
    assert 0.0 < m["bloom_saturation"] < 0.5

    plain = IceletTable.create(str(tmp_path / "p"), n_buckets=4)
    plain.bootstrap(target)
    assert "bloom_saturation" not in replay_metrics(plain)
