from nebuia_vector_db_spark.plans.inspect import (  # noqa: F401
    explain_str,
    has_broadcast_join,
    has_pushed_filters,
    plan_asserts,
    scan_read_schema,
    shuffle_count,
    wholestage_codegen_count,
)
