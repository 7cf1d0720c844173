"""Support/confidence statistics (SCP) and response filtering.

Reference parity:
* A12 simple support — #records containing a field / #valid matches,
  gate ≥ min_support: ``JointFeatureProcessor.java:59-99`` (ratio :89)
* A13 implicit support — count of each (field, value) pair across
  records: ``JointFeatureProcessor.java:29-57``
* A14 confidence P(value|field) = implicit / simple, gate ≥
  min_confidence: ``JointFeatureProcessor.java:107-126`` (:116,121)
* F9 value-selectivity filter — drop (field, value) pairs that also
  occur in non-matching records: ``JointFeatureProcessor.java:101-105``
* A15 SCP variant — sup = P(field,value), conf = P(match ∧ fv)/sup,
  keep conf > P(valid), sort desc by confidence:
  ``Metrics/SupportConfidenceProcessor.java:18-48`` (math :28-40)
* J4 degenerate/error-response detection — the reference Levenshtein-
  clusters sampled responses to find the modal "error page"
  (``AlignmentProcessor.java:251-310``, threshold ``config.json:22``);
  the CDC guise is modal-value dominance per column (a column whose one
  value covers ≥ threshold of rows carries no alignment signal).

Inputs are long-format record observations ``(record_id, field, value)``
— the same IR the mapper's probe join produces — so these operators
compose with ``align()`` or stand alone.  All single hash aggregations /
anti-joins; at 10^10 records swap countDistinct for approx.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from filipo_spark.schema import ERROR_THRESHOLD, MIN_CONFIDENCE, MIN_SUPPORT


def simple_support(obs: DataFrame, n_records: int, min_support: float = MIN_SUPPORT) -> DataFrame:
    """A12: per field, fraction of records containing it (gated)."""
    return (
        obs.select("record_id", "field")
        .distinct()
        .groupBy("field")
        .agg(F.count(F.lit(1)).alias("n_records_with"))
        .withColumn("support", F.round(F.col("n_records_with") / F.lit(float(n_records)), 6))
        .where(F.col("support") >= min_support)
    )


def implicit_support(obs: DataFrame) -> DataFrame:
    """A13: occurrence count of each (field, value) pair."""
    return obs.groupBy("field", "value").agg(F.count(F.lit(1)).alias("n_fv"))


def confidence(
    obs: DataFrame, n_records: int, min_confidence: float = MIN_CONFIDENCE
) -> DataFrame:
    """A14: P(value | field) = implicit / field-total (gated)."""
    imp = implicit_support(obs)
    tot = obs.groupBy("field").agg(F.count(F.lit(1)).alias("n_f"))
    return (
        imp.join(tot, on="field")
        .withColumn("confidence", F.round(F.col("n_fv") / F.col("n_f"), 6))
        .where(F.col("confidence") >= min_confidence)
        .select("field", "value", "n_fv", "confidence")
    )


def selectivity_filter(matching_obs: DataFrame, nonmatching_obs: DataFrame) -> DataFrame:
    """F9: drop (field, value) pairs also present in non-matching records
    (they don't discriminate) — a left_anti join."""
    bad = nonmatching_obs.select("field", "value").distinct()
    return matching_obs.join(bad, on=["field", "value"], how="left_anti")


def scp(
    matching_obs: DataFrame,
    nonmatching_obs: DataFrame,
    min_support: float = 0.0,
    min_confidence: float = 0.0,
) -> DataFrame:
    """A15: over all records, sup = P(field,value), conf = P(match ∧ fv)
    / sup; keep pairs with conf > P(valid) and above minima, sorted desc
    by confidence (SupportConfidenceProcessor.java:28-45)."""
    m = matching_obs.select("record_id", "field", "value").withColumn("is_match", F.lit(1))
    nm = nonmatching_obs.select("record_id", "field", "value").withColumn(
        "is_match", F.lit(0)
    )
    allobs = m.unionByName(nm)
    n_total = allobs.select("record_id").distinct().count()
    n_valid = m.select("record_id").distinct().count()
    p_valid = n_valid / n_total if n_total else 0.0
    per_pair = allobs.groupBy("field", "value").agg(
        F.count(F.lit(1)).alias("n_all"),
        F.sum("is_match").alias("n_match"),
    )
    out = (
        per_pair.withColumn("support", F.col("n_all") / F.lit(float(n_total)))
        .withColumn("conf", (F.col("n_match") / F.lit(float(n_total))) / F.col("support"))
        .where(
            (F.col("conf") > F.lit(p_valid))
            & (F.col("support") >= min_support)
            & (F.col("conf") >= min_confidence)
        )
        .select(
            "field",
            "value",
            F.round("support", 6).alias("support"),
            F.round("conf", 6).alias("confidence"),
        )
        .orderBy(F.desc("confidence"), "field", "value")
    )
    return out


def degenerate_columns(
    df: DataFrame, columns: list[str] | None = None, threshold: float = ERROR_THRESHOLD
) -> DataFrame:
    """J4 (CDC guise): columns whose modal value covers ≥ threshold of
    non-null rows — the alignment-signal-free 'error page' analog.
    One melt + two aggregations; no pairwise Levenshtein needed when the
    schema is columnar."""
    from filipo_spark.operators.profile import melt

    long_ = melt(df, columns).where(F.col("value").isNotNull())
    freq = long_.groupBy("column_name", "value").agg(F.count(F.lit(1)).alias("n"))
    tot = long_.groupBy("column_name").agg(F.count(F.lit(1)).alias("n_col"))
    w = Window.partitionBy("column_name").orderBy(F.desc("n"), F.asc("value"))
    modal = freq.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
    return (
        modal.join(tot, on="column_name")
        .withColumn("modal_ratio", F.round(F.col("n") / F.col("n_col"), 6))
        .where(F.col("modal_ratio") >= threshold)
        .select("column_name", F.col("value").alias("modal_value"), "modal_ratio")
    )
