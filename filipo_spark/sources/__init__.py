from filipo_spark.sources.events_cdc import changes_from_events, read_table  # noqa: F401
