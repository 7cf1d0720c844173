from filipo_spark.operators.dedup import lww_dedup, lww_dedup_salted  # noqa: F401
from filipo_spark.operators.merge import (  # noqa: F401
    apply_batch,
    canonical,
    compact,
    logical,
    merge_upserts,
    to_physical,
    touched_buckets,
)
