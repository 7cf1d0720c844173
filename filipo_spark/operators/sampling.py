"""Deterministic sampling operators.

The reference samples probe values with ``ORDER BY UUID() LIMIT n``
(KnowledgeBaseManagement.java:60-72) — random but unreproducible.  The
engine replaces UUID() with a value-derived md5 hash: the same rows win
on every run, every parallelism level, and in the DuckDB oracle (md5 is
engine-independent), which is what replayable probing requires.

Scale: ``row_number`` over (group, hash) is one shuffle on the group
key; for per-group k ≪ group size this is the standard top-k window
pattern and AQE handles group-count skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def sample_per_group(
    df: DataFrame, group: str | list[str], order_key: str, k: int
) -> DataFrame:
    """k deterministic pseudo-random rows per group (md5 hash order)."""
    groups = [group] if isinstance(group, str) else list(group)
    w = Window.partitionBy(*groups).orderBy(
        F.md5(F.col(order_key).cast("string")), F.col(order_key)
    )
    return (
        df.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") <= k).drop("_rn")
    )


def deterministic_sample(df: DataFrame, order_key: str, n: int) -> DataFrame:
    """Global deterministic pseudo-random sample of n rows (O1 analog)."""
    return df.orderBy(F.md5(F.col(order_key).cast("string")), F.col(order_key)).limit(n)
