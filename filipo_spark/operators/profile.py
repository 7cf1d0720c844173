"""Schema profiling: functionality / identifier detection / type sniffing.

Reference parity:
* functionality ratio = distinct(values)/count(values) per column —
  TripleAnalyzer.java:32-45 (ratio at :41), threshold applied in
  SchemaExtractor.java:99-111 (default 0.996, config.json:25);
* type sniffing isNumeric/isUrl — Utils/Utils.java:7-27, used to route
  comparisons at AlignmentProcessor.java:820-826.  Reimplemented as
  regex-based *column* predicates (identical semantics in Spark and
  DuckDB, unlike engine-specific cast coercion rules) — the reference's
  per-row ``Double.parseDouble`` lifted to a vectorized expression.

Shape: the table is melted to long format ``(column_name, value)`` with
values stringified (the reference is string-typed throughout, SURVEY
§1.2) and profiled with ONE hash aggregation — a single shuffle
regardless of column count.  At 10^10 rows swap ``countDistinct`` for
``approx_count_distinct`` (``exact=False``); identifier detection only
needs the ratio's neighborhood of 1.0, where HLL error is negligible.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from filipo_spark.schema import FUNCTIONALITY_THRESHOLD

INT_RE = r"^-?\d+$"
DOUBLE_RE = r"^-?\d+(\.\d+)?([eE][+-]?\d+)?$"
TS_RE = r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}:\d{2}(\.\d+)?)?$"
URL_RE = r"^https?://"


def melt(df: DataFrame, columns: list[str] | None = None) -> DataFrame:
    """Long format (column_name, value-as-string); one scan, no shuffle."""
    cols = columns or df.columns
    structs = F.array(
        *[
            F.struct(F.lit(c).alias("column_name"), F.col(c).cast("string").alias("value"))
            for c in cols
        ]
    )
    return df.select(F.explode(structs).alias("kv")).select("kv.column_name", "kv.value")


def schema_profile(
    df: DataFrame, columns: list[str] | None = None, exact: bool = True
) -> DataFrame:
    """Per-column profile: n, n_nonnull, n_distinct, functionality,
    null_ratio, int/double/ts/url ratios, type_guess."""
    long = melt(df, columns)
    v = F.col("value")
    nn = F.count(v)  # non-null count
    nd = (F.countDistinct(v) if exact else F.approx_count_distinct(v)).cast("long")
    prof = long.groupBy("column_name").agg(
        F.count(F.lit(1)).alias("n"),
        nn.alias("n_nonnull"),
        nd.alias("n_distinct"),
        F.avg(v.rlike(INT_RE).cast("double")).alias("int_ratio"),
        F.avg(v.rlike(DOUBLE_RE).cast("double")).alias("double_ratio"),
        F.avg(v.rlike(TS_RE).cast("double")).alias("ts_ratio"),
        F.avg(v.rlike(URL_RE).cast("double")).alias("url_ratio"),
    )
    functionality = F.when(
        F.col("n_nonnull") > 0, F.col("n_distinct") / F.col("n_nonnull")
    ).otherwise(F.lit(0.0))
    type_guess = (
        F.when(F.col("n_nonnull") == 0, F.lit("null"))
        .when(F.col("int_ratio") >= 0.99, F.lit("int"))
        .when(F.col("double_ratio") >= 0.99, F.lit("double"))
        .when(F.col("ts_ratio") >= 0.99, F.lit("timestamp"))
        .when(F.col("url_ratio") >= 0.99, F.lit("url"))
        .otherwise(F.lit("text"))
    )
    return prof.select(
        "column_name",
        "n",
        "n_nonnull",
        "n_distinct",
        F.round(functionality, 6).alias("functionality"),
        F.round(1.0 - F.col("n_nonnull") / F.col("n"), 6).alias("null_ratio"),
        F.round("int_ratio", 6).alias("int_ratio"),
        F.round("double_ratio", 6).alias("double_ratio"),
        F.round("ts_ratio", 6).alias("ts_ratio"),
        F.round("url_ratio", 6).alias("url_ratio"),
        type_guess.alias("type_guess"),
    )


def type_triples(df: DataFrame, subject_type: str, columns: list[str] | None = None) -> DataFrame:
    """Type-level triple aggregation (A2): ``(subject_type, predicate,
    object_type) → count`` — the reference's schema extractor aggregates
    instance triples to type triples the same way
    (TripleAnalyzer.java:32-45 feeding SchemaExtractor.java:96-133).
    Here subject type is the table's entity, predicates are columns, and
    object types are sniffed per VALUE (not per column), so mixed-type
    predicates split across rows.  One melt + one hash aggregation."""
    long = melt(df, columns)
    v = F.col("value")
    object_type = (
        F.when(v.isNull(), F.lit("null"))
        .when(v.rlike(INT_RE), F.lit("int"))
        .when(v.rlike(DOUBLE_RE), F.lit("double"))
        .when(v.rlike(TS_RE), F.lit("timestamp"))
        .when(v.rlike(URL_RE), F.lit("url"))
        .otherwise(F.lit("text"))
    )
    return (
        long.select(
            F.lit(subject_type).alias("subject_type"),
            F.col("column_name").alias("predicate"),
            object_type.alias("object_type"),
        )
        .groupBy("subject_type", "predicate", "object_type")
        .agg(F.count(F.lit(1)).alias("n"))
    )


def identifiers(
    profile: DataFrame, threshold: float = FUNCTIONALITY_THRESHOLD
) -> DataFrame:
    """Identifier-like columns: functionality >= threshold (reference
    default 0.996) and not mostly-null — SchemaExtractor.java:99-111."""
    return profile.where(
        (F.col("functionality") >= threshold) & (F.col("null_ratio") < 0.5)
    ).select("column_name", "functionality")
