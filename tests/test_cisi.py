from parquet_extractor_spark.sources.cisi import cisi_to_markdown, read_cisi

CISI_SAMPLE = """.I 1
.T
First Document Title
.A
Smith, J.
.W
This is the body of the first document.
It has two lines.
.X
1 5 2
.I 2
.T

.W
Second doc body only.
.I 3
.T
Third: has/special*chars
.W
Third body.
"""


def _write(tmp_path, text):
    p = tmp_path / "cisi.all"
    p.write_text(text)
    return str(p)


def test_cisi_parse_golden(spark, tmp_path):
    df = read_cisi(spark, _write(tmp_path, CISI_SAMPLE))
    rows = {r.doc_id: r for r in df.collect()}
    assert set(rows) == {"0001", "0002", "0003"}
    assert rows["0001"].title == "First Document Title"
    assert rows["0001"].author == "Smith, J."
    assert (
        rows["0001"].content
        == "This is the body of the first document.\nIt has two lines."
    )
    assert rows["0001"].refs == "1 5 2"
    # empty title falls back (main.py:163)
    assert rows["0002"].title == "Document 2"
    assert rows["0002"].author == ""
    assert rows["0002"].content == "Second doc body only."


def test_cisi_markdown_filenames_sanitized(spark, tmp_path):
    df = read_cisi(spark, _write(tmp_path, CISI_SAMPLE))
    md = {r.filename: r.body for r in cisi_to_markdown(df).collect()}
    assert "0003_Third__has_special_chars.md" in md
    body = md["0001_First_Document_Title.md"]
    assert body.startswith("---\ndoc_id: 0001\n")
    assert "# First Document Title" in body
