from parquet_extractor_spark.functions.text import (  # noqa: F401
    sanitize_filename,
    tokenize,
    token_count,
)
