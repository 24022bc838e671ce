"""PDF sink (SURVEY §2.1 S9, api.py:256-342 / 761-821).

The sanitization/truncation/chunking stages are pure Column
expressions (they're what the reference spends its lines on); only the
final render is Python, run per-partition on executors.

The render itself is the pure-Python PDF 1.4 writer in
``sinks/pdfwriter.py`` — real, viewer-openable PDFs with no external
dependency (the reference uses fpdf, absent in this container).
"""

from __future__ import annotations

import os

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from parquet_extractor_spark.constants import (
    PDF_CHUNK_SIZE,
    PDF_CONTENT_CAP,
    PDF_TITLE_CAP,
)
from parquet_extractor_spark.functions.text import (
    control_char_scrub,
    non_ascii_scrub,
    truncate,
)
from parquet_extractor_spark.sinks.pdfwriter import render_pdf


def pdf_ready_columns(title: Column, content: Column) -> tuple[Column, Column]:
    """The reference's pre-render cleanup: HTML unescape (api.py:312,
    pandas_udf — the one Python step), then ASCII scrub (api.py:277),
    control-char scrub (api.py:802), 80-char title cap (api.py:271),
    50k content cap (api.py:327) as pure expressions."""
    from parquet_extractor_spark.functions.html import unescape_html

    clean_title = truncate(non_ascii_scrub(title), PDF_TITLE_CAP)
    clean_content = truncate(
        control_char_scrub(non_ascii_scrub(unescape_html(content), " ")),
        PDF_CONTENT_CAP,
    )
    return clean_title, clean_content


def _chunks(text: str, size: int = PDF_CHUNK_SIZE) -> list[str]:
    """1000-char chunking before multi_cell render (api.py:793)."""
    return [text[i : i + size] for i in range(0, len(text), size)] or [""]


def render_pdf_bytes(title: str, doc_id: str, content: str) -> bytes:
    """Render one document to real PDF bytes: bold title, Document ID
    line, then the 1000-char chunks in the reference's render order
    (api.py:774-796) — via the dependency-free PDF 1.4 writer."""
    return render_pdf(title, doc_id, _chunks(content))


def write_pdfs(
    df: DataFrame,
    out_dir: str,
    filename_col: str = "filename",
    title_col: str = "title",
    id_col: str = "doc_id",
    content_col: str = "content",
) -> dict:
    """foreachPartition PDF writer with the same skip/error contract
    as the markdown sink."""
    os.makedirs(out_dir, exist_ok=True)
    spark = df.sparkSession
    clean_title, clean_content = pdf_ready_columns(
        F.col(title_col), F.col(content_col)
    )
    work = df.select(
        F.col(filename_col).alias("filename"),
        clean_title.alias("title"),
        F.col(id_col).cast("string").alias("doc_id"),
        clean_content.alias("content"),
    )
    sc = spark.sparkContext
    written_acc = sc.accumulator(0)
    failed_acc = sc.accumulator(0)

    def _write_partition(rows):
        for row in rows:
            try:
                data = render_pdf_bytes(
                    row["title"] or "", row["doc_id"] or "", row["content"] or ""
                )
                with open(os.path.join(out_dir, row["filename"]), "wb") as fh:
                    fh.write(data)
                written_acc.add(1)
            except Exception:
                failed_acc.add(1)

    work.foreachPartition(_write_partition)
    return {"written": written_acc.value, "failed": failed_acc.value}
