"""Schema-on-read column resolution (SURVEY.md §2.2 P1/P2).

The reference resolves the "content" and "title" roles heuristically
over an unknown schema (main.py:34-61): try candidate names, else take
the first string column whose sampled value is long. Here the same
contract is implemented against ``df.schema`` (driver-side StructType
inspection, zero data movement) plus at most one ``limit(1)`` probe of
the string columns — never a full scan.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import BinaryType, StringType

from parquet_extractor_spark.constants import (
    CONTENT_CANDIDATES,
    CONTENT_MIN_LEN,
    TITLE_CANDIDATES,
)


@dataclass(frozen=True)
class ResolvedRoles:
    """Logical roles inferred from a physical schema."""

    content: str
    title: str | None
    metadata: tuple[str, ...]  # every column except content, non-binary


class ContentColumnNotFound(ValueError):
    """No content column could be resolved (mirrors main.py:51-52)."""


def string_columns(df: DataFrame) -> list[str]:
    return [f.name for f in df.schema.fields if isinstance(f.dataType, StringType)]


def non_binary_columns(df: DataFrame) -> list[str]:
    """Binary values are excluded from metadata (main.py:96) — here at
    schema level, so the exclusion costs nothing at runtime."""
    return [f.name for f in df.schema.fields if not isinstance(f.dataType, BinaryType)]


def resolve_content_column(df: DataFrame) -> str:
    """Candidate names first (main.py:35), else the first string column
    whose probed value is longer than CONTENT_MIN_LEN (main.py:44-49)."""
    for cand in CONTENT_CANDIDATES:
        if cand in df.columns:
            return cand
    str_cols = string_columns(df)
    if str_cols:
        # One probe row for all string columns at once — a single
        # limit(1) job, not one per column.
        probe = df.select([F.length(F.col(c)).alias(c) for c in str_cols]).limit(1)
        row = probe.first()
        if row is not None:
            for c in str_cols:
                length = row[c]
                if length is not None and length > CONTENT_MIN_LEN:
                    return c
    raise ContentColumnNotFound(
        f"no content column among {df.columns}; "
        f"candidates={CONTENT_CANDIDATES}, min probe length={CONTENT_MIN_LEN}"
    )


def resolve_title_column(df: DataFrame) -> str | None:
    """First of TITLE_CANDIDATES present in the schema (main.py:57-61)."""
    for cand in TITLE_CANDIDATES:
        if cand in df.columns:
            return cand
    return None


def resolve_roles(df: DataFrame) -> ResolvedRoles:
    content = resolve_content_column(df)
    title = resolve_title_column(df)
    metadata = tuple(c for c in non_binary_columns(df) if c != content)
    return ResolvedRoles(content=content, title=title, metadata=metadata)
