"""Property-style tests (SURVEY §5.2.5): random batch boundaries and
event-order permutations must not change the final state (idempotence +
commutativity of the LWW-MERGE fold). Seeded via hypothesis."""

from __future__ import annotations

from hypothesis import given, settings, strategies as st

from filipo_spark.generators import gen_changelog, gen_transcripts
from filipo_spark.operators.merge import apply_batch, canonical, logical, to_physical

from tests.conftest import df_rows

_CACHE: dict = {}


def _fixture(spark):
    if "log" not in _CACHE:
        _CACHE["log"] = gen_changelog(spark, n_conv=8, n_events=400, seed=99).cache()
        empty = to_physical(spark.createDataFrame([], gen_transcripts(spark, 1).schema))
        _CACHE["want"] = df_rows(canonical(logical(apply_batch(empty, _CACHE["log"]))))
        _CACHE["empty"] = empty
    return _CACHE["log"], _CACHE["empty"], _CACHE["want"]


@settings(max_examples=5, deadline=None)
@given(
    cuts=st.lists(st.integers(min_value=1, max_value=399), min_size=1, max_size=4),
    perm_seed=st.integers(min_value=0, max_value=2**31),
)
def test_any_boundaries_any_order(spark, cuts, perm_seed):
    from pyspark.sql import functions as F

    log, empty, want = _fixture(spark)
    bounds = sorted(set(cuts)) + [10**9]
    state = empty
    lo = -1
    # permute delivery order within each batch via a seeded hash shuffle —
    # the fold must not care
    shuffled = log.orderBy(F.xxhash64("lsn", F.lit(perm_seed)))
    for hi in bounds:
        batch = shuffled.where((F.col("lsn") > lo) & (F.col("lsn") <= hi))
        state = apply_batch(state, batch)
        state = spark.createDataFrame(state.collect(), state.schema)
        lo = hi
    assert df_rows(canonical(logical(state))) == want
