"""CISI.ALL-format source (SURVEY §2.1 S3, §2.8 F5/F6; main.py:107-192).

The classic IR-dataset text format: documents delimited by ``.I <id>``
lines, with ``.T`` (title) / ``.A`` (author) / ``.W`` (body) / ``.X``
(refs) section markers.

Pipeline: wholetext read → regex document split (pure expression,
Java regex with DOTALL + lookahead) → per-document section parse via
an Arrow-vectorized pandas_udf returning map<string,string> (the one
genuinely stateful parse, SURVEY §7 "hard parts") → projection with
defaults (main.py:163-165).

Scale note: wholetext is fine for CISI-sized corpora (one blob per
file; parallelism across files). For huge single files you'd switch to
``spark.read.text`` + a two-pass group-by-document-id reassembly.
"""

from __future__ import annotations

import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import MapType, StringType

from parquet_extractor_spark.functions.text import zero_pad

# (?s): DOTALL so bodies span lines; lazy body up to the next .I or EOF.
DOC_PATTERN = r"(?s)(\.I\s+\d+.*?)(?=\.I\s+\d+|$)"
ID_PATTERN = r"(?s)^\.I\s+(\d+)"

_SECTION_RE = re.compile(r"^\.([A-Z])\s*$|^\.([A-Z])\s+(.*)$")


def _parse_sections_batch(blocks: pd.Series) -> pd.Series:
    """Line-level section state machine (main.py:142-160), vectorized
    over an Arrow batch of document blocks."""
    out = []
    for block in blocks:
        sections: dict[str, str] = {}
        current: str | None = None
        buf: list[str] = []
        for line in (block or "").split("\n"):
            m = _SECTION_RE.match(line)
            if m:
                if current is not None:
                    sections[current] = "\n".join(buf).strip()
                current = m.group(1) or m.group(2)
                buf = [m.group(3)] if m.group(3) else []
            elif current is not None:
                buf.append(line)
        if current is not None:
            sections[current] = "\n".join(buf).strip()
        out.append(sections)
    return pd.Series(out)


parse_sections = pandas_udf(
    _parse_sections_batch, returnType=MapType(StringType(), StringType())
)


def read_cisi(spark: SparkSession, path: str) -> DataFrame:
    """CISI.ALL → DataFrame(doc_id, title, author, content, refs).

    Permissive decode (main.py:121-122's errors='replace' analog is
    Spark's default UTF-8 replacement behavior).
    """
    raw = spark.read.text(path, wholetext=True)
    docs = raw.select(
        F.explode(
            F.regexp_extract_all(F.col("value"), F.lit(DOC_PATTERN), 1)
        ).alias("block")
    )
    parsed = docs.select(
        F.regexp_extract(F.col("block"), ID_PATTERN, 1).alias("raw_id"),
        parse_sections(F.col("block")).alias("sections"),
    )
    # Defaults mirror main.py:163-165: title falls back to
    # "Document <id>", author/refs to empty, content to empty.
    doc_id = zero_pad(F.col("raw_id"), 4)
    return parsed.select(
        doc_id.alias("doc_id"),
        F.coalesce(
            F.nullif(F.element_at("sections", "T"), F.lit("")),
            F.concat(F.lit("Document "), F.col("raw_id")),
        ).alias("title"),
        F.coalesce(F.element_at("sections", "A"), F.lit("")).alias("author"),
        F.coalesce(F.element_at("sections", "W"), F.lit("")).alias("content"),
        F.coalesce(F.element_at("sections", "X"), F.lit("")).alias("refs"),
    )


def cisi_to_markdown(df: DataFrame) -> DataFrame:
    """CISI record → (filename, body) markdown rows (main.py:167-186)."""
    body = F.concat_ws(
        "\n",
        F.lit("---"),
        F.concat(F.lit("doc_id: "), F.col("doc_id")),
        F.concat(F.lit("title: "), F.col("title")),
        F.concat(F.lit("author: "), F.col("author")),
        F.lit("---"),
        F.lit(""),
        F.concat(F.lit("# "), F.col("title")),
        F.lit(""),
        F.col("content"),
    )
    from parquet_extractor_spark.functions.text import sanitize_filename

    filename = F.concat(
        F.col("doc_id"), F.lit("_"), sanitize_filename(F.col("title")), F.lit(".md")
    )
    return df.select(filename.alias("filename"), body.alias("body"))
