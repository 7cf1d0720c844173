"""Source adapters over the driver-provided testdata tables.

``changes_from_events`` maps the generic ``events`` stream table
(event_id, ts, user_id, event_type, value, props) onto the engine's
CHANGE_SCHEMA deterministically, with arithmetic chosen to be
*expressible identically in ANSI SQL* — the DuckDB oracle in
``__spark_entry__.oracle_sql`` replays the exact same mapping, so the
whole CDC pipeline is end-to-end oracle-checkable on driver data.

Mapping: lsn=event_id · key=(user, event_id % TURNS) · op: error→D,
signup→I, else U · payload derived from event columns.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

TURNS_MOD = 40

# driver-provided parquet tables at every scale factor
TABLES = [
    "region", "nation", "customer", "supplier", "part",
    "orders", "lineitem", "events", "documents", "embeddings",
]

# the same mapping as ANSI SQL over the `events` view (DuckDB oracle side)
CHANGES_FROM_EVENTS_SQL = """
SELECT event_id AS lsn,
       CASE WHEN event_type = 'error' THEN 'D'
            WHEN event_type = 'signup' THEN 'I'
            ELSE 'U' END AS op,
       'conv-' || lpad(CAST(user_id AS VARCHAR), 8, '0') AS conv_id,
       CAST(event_id % 40 AS INTEGER) AS turn_idx,
       CASE CAST(event_id % 4 AS INTEGER)
            WHEN 0 THEN 'user' WHEN 1 THEN 'assistant'
            WHEN 2 THEN 'system' ELSE 'tool' END AS role,
       event_type || ':' || props AS text,
       CASE WHEN event_id % 4 = 3 THEN event_type END AS tool,
       ts
FROM events
"""


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def changes_from_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    e = read_table(spark, sf_dir, "events")
    role = F.element_at(
        F.array(F.lit("user"), F.lit("assistant"), F.lit("system"), F.lit("tool")),
        (F.col("event_id") % 4 + 1).cast("int"),
    )
    op = (
        F.when(F.col("event_type") == "error", F.lit("D"))
        .when(F.col("event_type") == "signup", F.lit("I"))
        .otherwise(F.lit("U"))
    )
    return e.select(
        F.col("event_id").alias("lsn"),
        op.alias("op"),
        F.concat(F.lit("conv-"), F.lpad(F.col("user_id").cast("string"), 8, "0")).alias(
            "conv_id"
        ),
        (F.col("event_id") % TURNS_MOD).cast("int").alias("turn_idx"),
        role.alias("role"),
        F.concat(F.col("event_type"), F.lit(":"), F.col("props")).alias("text"),
        F.when(F.col("event_id") % 4 == 3, F.col("event_type")).alias("tool"),
        F.col("ts"),
    )
