from filipo_spark.operators.dedup import lww_dedup, lww_dedup_salted  # noqa: F401
from filipo_spark.operators.merge import (  # noqa: F401
    apply_batch,
    canonical,
    changes_to_physical,
    compact,
    logical,
    lww_resolve,
    merge_upserts,
    to_physical,
    touched_buckets,
)
