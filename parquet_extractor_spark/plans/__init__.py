from parquet_extractor_spark.plans.explain import (  # noqa: F401
    formatted_plan,
    has_broadcast_hash_join,
    has_sort_merge_join,
    pushed_filters,
    read_schema_columns,
)
