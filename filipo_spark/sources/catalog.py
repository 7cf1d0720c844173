"""Catalog registration (S2): expose the engine's tables to the SQL
surface.

The reference dispatches queries to a remote SPARQL endpoint, a local
TDB2 store, or an in-memory model parsed from RDF files
(``QueryManagement/QueryProcessor.java:16-36``).  The Spark analog is
the session catalog: every parquet table (and any Icelet table's
resolved view) registers as a temp view, after which the full engine
surface is reachable from ``spark.sql`` — Catalyst plans SQL and
DataFrame calls identically.
"""

from __future__ import annotations

from pyspark.sql import SparkSession

from filipo_spark.sources.events_cdc import TABLES, read_table


def register_tables(
    spark: SparkSession, sf_dir: str, tables: list[str] | None = None
) -> list[str]:
    """Register each parquet table under ``sf_dir`` as a temp view;
    returns the registered names."""
    names = tables or list(TABLES)
    for t in names:
        read_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return names


def register_icelet(
    spark: SparkSession, root: str, view: str, snapshot_id: str | None = None
) -> None:
    """Register an Icelet table's resolved logical state as a view;
    ``snapshot_id`` time-travels to any snapshot on the current lineage
    (immutable file lists — the Iceberg ``VERSION AS OF`` analog)."""
    from filipo_spark.table.icelet import IceletTable

    IceletTable.load(root).read_logical(spark, snapshot_id=snapshot_id).createOrReplaceTempView(view)
