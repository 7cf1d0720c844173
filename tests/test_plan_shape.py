"""Physical-plan regression guards: the hot path must stay one exchange.

If a refactor reintroduces a second payload shuffle (e.g. groupBy by key
followed by repartition-by-bucket), throughput at scale halves silently —
these tests fail instead."""

from __future__ import annotations

from filipo_spark.generators import gen_changelog
from filipo_spark.operators.merge import changes_to_physical, lww_resolve


def _plan(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def test_bucket_aligned_resolve_single_exchange(spark):
    log = gen_changelog(spark, n_conv=50, n_events=2000, seed=1)
    out = lww_resolve(changes_to_physical(log), n_buckets=16, salt_factor=2)
    plan = _plan(out)
    assert plan.count("Exchange") == 1, plan
    # the one exchange must be on (bucket, salt), not on the raw key
    assert "_bucket" in plan and "_salt" in plan


def test_centroid_seed_is_distributed_take_ordered(spark):
    """IVF centroid seeding must be a distributed TakeOrdered
    (orderBy+limit), not a global no-partition window that pulls the
    whole corpus through one task."""
    from filipo_spark.operators.similarity_join import deterministic_centroids

    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    plan = _plan(deterministic_centroids(emb, 8))
    assert "TakeOrderedAndProject" in plan, plan


def test_parquet_scan_prunes_columns(spark, tmp_path):
    """Column pruning reaches the parquet reader (ReadSchema shows only
    requested columns)."""
    log = gen_changelog(spark, n_conv=20, n_events=500, seed=2)
    p = str(tmp_path / "wal")
    log.write.parquet(p)
    df = spark.read.parquet(p).select("conv_id").distinct()
    plan = _plan(df)
    rs = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
    assert rs and "text" not in rs[0], rs
