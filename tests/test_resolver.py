import pytest
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from parquet_extractor_spark.resolver import (
    ContentColumnNotFound,
    resolve_content_column,
    resolve_roles,
    resolve_title_column,
)


def test_candidate_name_wins(spark):
    df = spark.createDataFrame([(1, "short", "x")], ["id", "text", "other"])
    assert resolve_content_column(df) == "text"


def test_heuristic_long_string_fallback(spark):
    long_val = "words " * 50
    df = spark.createDataFrame(
        [(1, "tiny", long_val)], ["id", "note", "article_data"]
    )
    # no candidate name matches; 'note' is short, 'article_data' is long
    assert resolve_content_column(df) == "article_data"


def test_no_content_column_raises(spark):
    df = spark.createDataFrame([(1, "tiny")], ["id", "note"])
    with pytest.raises(ContentColumnNotFound):
        resolve_content_column(df)


def test_title_resolution_and_absence(spark):
    df = spark.createDataFrame([(1, "t", "b")], ["id", "name", "text"])
    assert resolve_title_column(df) == "name"
    df2 = spark.createDataFrame([(1, "b")], ["id", "text"])
    assert resolve_title_column(df2) is None


def test_binary_excluded_from_metadata(spark):
    schema = StructType(
        [
            StructField("id", LongType()),
            StructField("text", StringType()),
            StructField("blob", BinaryType()),
        ]
    )
    df = spark.createDataFrame([(1, "body", bytearray(b"\x00"))], schema)
    roles = resolve_roles(df)
    assert roles.content == "text"
    assert "blob" not in roles.metadata
    assert "id" in roles.metadata
