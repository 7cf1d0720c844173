"""Raw-JSON payload ingestion: nested JSON strings → flat dotted paths.

Reference parity: FiLiPo ingests arbitrary nested API JSON and flattens
it to dotted paths with ``[i]`` array indices before alignment
(``ResponseConverter.java:16-54``, flatten at ``:26-27``; e.g.
``{"a":{"b":[{"c":1}]}}`` → ``a.b[0].c = "1"``).  The engine's mapper
then wildcard-collapses ``[i]`` → ``[*]`` (C8/A8).

Engine design — pure Catalyst, no per-row Python:
* the JSON *schema* is inferred once from a bounded driver-side sample
  (``spark.read.json`` over ≤ ``sample_n`` collected strings — a
  metadata operation, the only non-DataFrame step);
* ``from_json`` parses the column with that schema;
* a **recursive Column builder** walks the static schema and emits one
  ``array<struct<key,value>>`` expression: struct fields prepend their
  static name, arrays prepend a dynamic ``[i]`` via the index-aware
  ``transform`` lambda, leaves cast to string.  The whole flatten is a
  single whole-stage-codegen'd projection — it runs at full stream
  volume (``apply_mapping`` on a drifted JSON source pays exactly this
  one projection).

Depth is bounded by the inferred schema, mirroring the reference's
recursion over the parsed tree.

Known divergence from dynamic (per-record) flattening: a *type-
heterogeneous array* (e.g. ``[[], false]``) has no Spark array type, so
inference falls back to ``array<string>`` and non-scalar elements
surface as their raw JSON text instead of recursing.  Homogeneous
arrays — the shape real APIs emit — flatten exactly.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, DataType, MapType, StructType


def _prefixed(prefix: Column, entries: Column) -> Column:
    """Prepend a path segment to each (key, value) entry.  Join rule:
    empty child key → the segment itself; child key starting with '['
    (array index) → no dot; otherwise dot-joined."""
    return F.transform(
        entries,
        lambda e: F.struct(
            F.when(e["key"] == "", prefix)
            .when(e["key"].startswith("["), F.concat(prefix, e["key"]))
            .otherwise(F.concat(prefix, F.lit("."), e["key"]))
            .alias("key"),
            e["value"].alias("value"),
        ),
    )


def flatten_entries(col: Column, dtype: DataType) -> Column:
    """``array<struct<key:string,value:string>>`` of the flattened tree
    under ``col`` (keys relative to ``col``; leaves keyed '')."""
    if isinstance(dtype, StructType):
        parts = [
            _prefixed(F.lit(f.name), flatten_entries(col[f.name], f.dataType))
            for f in dtype.fields
        ]
        if not parts:
            return F.array().cast("array<struct<key:string,value:string>>")
        return F.concat(*parts) if len(parts) > 1 else parts[0]
    if isinstance(dtype, ArrayType):
        return F.flatten(
            F.transform(
                col,
                lambda x, i: _prefixed(
                    F.concat(F.lit("["), i.cast("string"), F.lit("]")),
                    flatten_entries(x, dtype.elementType),
                ),
            )
        )
    if isinstance(dtype, MapType):
        return F.flatten(
            F.transform(
                F.map_entries(col),
                lambda kv: _prefixed(
                    kv["key"].cast("string"), flatten_entries(kv["value"], dtype.valueType)
                ),
            )
        )
    return F.array(
        F.struct(F.lit("").alias("key"), col.cast("string").alias("value"))
    )


def infer_json_schema(df: DataFrame, col: str, sample_n: int = 200) -> StructType:
    """Merged schema of a bounded sample of JSON strings.  Driver-side
    metadata step (the one place the RDD API appears — schema inference
    over ≤ sample_n strings, never data-path work)."""
    strs = [
        r[0]
        for r in df.select(col).where(F.col(col).isNotNull()).limit(sample_n).collect()
    ]
    if not strs:
        raise ValueError(f"cannot infer JSON schema: no non-null values in {col!r}")
    spark = df.sparkSession
    return spark.read.json(spark.sparkContext.parallelize(strs)).schema


def json_payload_to_map(
    df: DataFrame,
    payload_col: str = "payload",
    schema: StructType | None = None,
    sample_n: int = 200,
) -> DataFrame:
    """Replace a JSON-string payload column with ``map<string,string>``
    of flattened dotted paths (null leaves dropped) — the shape the
    alignment mapper consumes.  All other columns pass through."""
    schema = schema or infer_json_schema(df, payload_col, sample_n)
    parsed = F.from_json(F.col(payload_col), schema)
    entries = F.filter(
        flatten_entries(parsed, schema), lambda e: e["value"].isNotNull()
    )
    others = [c for c in df.columns if c != payload_col]
    return df.select(*others, F.map_from_entries(entries).alias(payload_col))


def json_flatten_long(
    df: DataFrame,
    payload_col: str,
    id_cols: list[str],
    schema: StructType | None = None,
    sample_n: int = 200,
) -> DataFrame:
    """Exploded long form (``*id_cols, key, value``) of the flattened
    JSON column — the oracle-checkable view of the flatten."""
    schema = schema or infer_json_schema(df, payload_col, sample_n)
    parsed = F.from_json(F.col(payload_col), schema)
    entries = F.filter(
        flatten_entries(parsed, schema), lambda e: e["value"].isNotNull()
    )
    return df.select(*id_cols, F.explode(entries).alias("e")).select(
        *id_cols, F.col("e.key").alias("key"), F.col("e.value").alias("value")
    )
