from filipo_spark.align.mapper import (  # noqa: F401
    Mapping,
    align,
    apply_mapping,
    flatten_payload,
    melt_target,
)
