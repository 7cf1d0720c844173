from filipo_spark.sources.catalog import register_icelet, register_tables  # noqa: F401
from filipo_spark.sources.events_cdc import TABLES, changes_from_events, read_table  # noqa: F401
