"""WARC source: pure-parser unit tests plus Spark batch/stream
round-trips over generated fixtures."""

from __future__ import annotations

import gzip
import os

import pytest

from parquet_extractor_spark.sources.warc import (
    build_http_response,
    build_warc,
    build_warc_record,
    decode_charset,
    html_to_text,
    iter_gzip_members,
    parse_warc,
    read_warc_docs,
    split_http_response,
)

HTML = (
    b"<html><head><title>T</title><style>p{color:red}</style>"
    b"<script>var x=1;</script></head>"
    b"<body><!-- hidden --><h1>Header</h1><p>Hello &amp; "
    b"<b>world</b>.</p><p>Line two</p></body></html>"
)
HTML_TEXT = "T\nHeader\nHello & world .\nLine two"


def _record(
    seq: int,
    body: bytes = HTML,
    chunked: bool = False,
    content_encoding: str | None = None,
    content_type: str = "text/html; charset=utf-8",
    warc_type: str = "response",
) -> bytes:
    if warc_type == "response":
        block = build_http_response(
            body,
            content_type=content_type,
            chunked=chunked,
            content_encoding=content_encoding,
        )
        ct = "application/http;msgtype=response"
    else:
        block, ct = body, content_type
    return build_warc_record(
        warc_type,
        f"0000-{seq:04d}",
        "2026-01-01T00:00:00Z",
        block,
        target_uri=f"http://example.com/{seq}",
        content_type=ct,
    )


def test_parse_warc_all_three_compression_layouts():
    recs = [_record(0), _record(1, warc_type="request", body=b"GET /")]
    plain = build_warc(recs, per_record_gzip=False)
    member_gz = build_warc(recs, per_record_gzip=True)
    whole_gz = gzip.compress(plain, mtime=0)
    for data in (plain, member_gz, whole_gz):
        parsed = parse_warc(data)
        assert [h["warc-type"] for _, h, _ in parsed] == [
            "response",
            "request",
        ]
        assert parsed[0][1]["warc-target-uri"] == "http://example.com/0"


def test_gzip_member_iteration_rejects_corruption():
    members = build_warc([_record(0), _record(1)])
    assert len(list(iter_gzip_members(members))) == 2
    with pytest.raises(ValueError):
        # cutting the gzip trailer truncates the final member
        list(iter_gzip_members(members[:-10]))
    with pytest.raises(ValueError):
        list(iter_gzip_members(b"\x1f\x8bjunk" + members))


def test_http_dechunk_and_content_encodings():
    body = b"x" * 1000 + b" tail"
    for kwargs in (
        {"chunked": True},
        {"content_encoding": "gzip"},
        {"content_encoding": "deflate"},
        {"chunked": True, "content_encoding": "gzip"},
    ):
        wire = build_http_response(body, **kwargs)
        status, headers, decoded = split_http_response(wire)
        assert status == 200
        assert decoded == body, kwargs


def test_charset_parameter_and_fallbacks():
    latin = "café".encode("iso-8859-1")
    assert (
        decode_charset(latin, "text/html; charset=ISO-8859-1") == "café"
    )
    # bogus charset name falls back to utf-8 with replacement
    assert "caf" in decode_charset(latin, "text/html; charset=nope")
    assert decode_charset("café".encode(), "") == "café"


def test_html_to_text_strips_and_unescapes():
    assert html_to_text(HTML.decode()) == HTML_TEXT


def test_truncated_and_malformed_records_raise():
    rec = _record(0)
    with pytest.raises(ValueError):
        parse_warc(rec[: len(rec) - 30])  # truncated block
    with pytest.raises(ValueError):
        parse_warc(b"WARC/1.0\r\nContent-Length: oops\r\n\r\n")
    with pytest.raises(ValueError):
        parse_warc(b"not a warc at all")


def _write_fixture(d: str) -> None:
    a = build_warc(
        [
            _record(0),
            _record(1, warc_type="request", body=b"GET / HTTP/1.1"),
            _record(2, body="resumé".encode("iso-8859-1"),
                    content_type="text/plain; charset=iso-8859-1"),
            _record(3, chunked=True, content_encoding="gzip"),
            _record(4, body=b"\x89PNG not text",
                    content_type="image/png"),
        ]
    )
    b = build_warc(
        [_record(5, warc_type="conversion", content_type="text/plain",
                 body=b"already plain text")],
        per_record_gzip=False,
    )
    with open(os.path.join(d, "a.warc.gz"), "wb") as f:
        f.write(a)
    with open(os.path.join(d, "b.warc"), "wb") as f:
        f.write(b)
    with open(os.path.join(d, "c.warc.gz"), "wb") as f:
        f.write(b"\x1f\x8btruncated garbage")


def test_read_warc_docs_batch(spark, tmp_path):
    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write_fixture(d)
    rows = {
        (r.path.rsplit("/", 1)[-1], r.record_seq): r
        for r in read_warc_docs(spark, d).collect()
    }
    assert len(rows) == 7  # 5 records + 1 plain record + 1 error row
    html_row = rows[("a.warc.gz", 0)]
    assert html_row.warc_type == "response"
    assert html_row.http_status == 200
    assert html_row.text == HTML_TEXT
    assert html_row.target_uri == "http://example.com/0"
    # request record: typed but no document payload
    req = rows[("a.warc.gz", 1)]
    assert req.warc_type == "request" and req.text is None
    # charset honored on plain-text payload
    assert rows[("a.warc.gz", 2)].text == "resumé"
    # chunked+gzip HTTP wire decodes to the same document text
    assert rows[("a.warc.gz", 3)].text == HTML_TEXT
    # binary payload: typed, no text, no error
    png = rows[("a.warc.gz", 4)]
    assert png.text is None and png.error is None
    assert png.content_type.startswith("image/png")
    # conversion record in a plain .warc
    assert rows[("b.warc", 0)].text == "already plain text"
    # corrupt container yields exactly one PERMISSIVE error row
    err = rows[("c.warc.gz", None)]
    assert err.error and "ValueError" in err.error


def test_warc_stream_equals_batch(spark, tmp_path):
    from parquet_extractor_spark.streaming.warc import (
        run_warc_ingest_stream,
    )

    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write_fixture(d)
    batch = read_warc_docs(spark, d)
    streamed = run_warc_ingest_stream(
        spark,
        d,
        str(tmp_path / "ckpt"),
        str(tmp_path / "out"),
    ).drop("epoch")
    key = lambda r: (r["path"], r["record_seq"] is None, r["record_seq"])  # noqa: E731
    a = sorted(map(lambda r: r.asDict(), batch.collect()), key=key)
    b = sorted(map(lambda r: r.asDict(), streamed.collect()), key=key)
    assert a == b


def test_cli_warcingest(spark, tmp_path, capsys):
    import json

    from parquet_extractor_spark.cli import main as cli_main

    d = str(tmp_path / "landing")
    os.makedirs(d)
    _write_fixture(d)
    out = str(tmp_path / "out")
    rc = cli_main(["warcingest", d, "-o", out])
    assert rc == 0
    summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
    assert summary["records"] == 6 and summary["errors"] == 1
    assert summary["documents"] == 4  # html, latin-1, chunked, plain
    assert spark.read.parquet(out).count() == 7


def test_domain_stats_and_latest_capture(spark, tmp_path):
    from parquet_extractor_spark.operators.crawl import (
        domain_stats,
        latest_capture_per_uri,
        registrable_domain,
    )

    def resp(seq, uri, date, body=b"<p>hi</p>", status=200):
        block = build_http_response(body, status=status)
        return build_warc_record(
            "response", f"11-{seq:04d}", date, block,
            target_uri=uri,
            content_type="application/http;msgtype=response",
        )

    d = str(tmp_path / "landing")
    os.makedirs(d)
    recs = [
        resp(0, "http://news.example.com/a", "2026-01-01T00:00:00Z"),
        resp(1, "http://news.example.com/a", "2026-01-03T00:00:00Z",
             body=b"<p>newer</p>"),
        resp(2, "http://blog.example.com/b", "2026-01-02T00:00:00Z"),
        resp(3, "http://other.org/x", "2026-01-02T00:00:00Z",
             status=404),
    ]
    with open(os.path.join(d, "seg.warc.gz"), "wb") as f:
        f.write(build_warc(recs))
    frame = read_warc_docs(spark, d)

    stats = {r.domain: r for r in domain_stats(frame).collect()}
    assert set(stats) == {"example.com", "other.org"}
    ex = stats["example.com"]
    assert ex.pages == 3 and ex.uris == 2
    assert ex.ok_rate_micro == 1_000_000
    assert ex.docs_with_text == 3
    assert stats["other.org"].ok_rate_micro == 0

    latest = {r.target_uri: r for r in
              latest_capture_per_uri(frame).collect()}
    assert len(latest) == 3
    assert latest["http://news.example.com/a"].text == "newer"

    # registrable-domain edges: single-label host passes through,
    # unparseable URI yields NULL domain
    from pyspark.sql import functions as F

    edges = spark.createDataFrame(
        [("http://localhost/x",), ("not a uri",)], "target_uri string"
    ).select(registrable_domain().alias("d"))
    vals = [r.d for r in edges.collect()]
    assert vals[0] == "localhost" and vals[1] is None


def test_canonical_url_rules(spark):
    """Hand-derived expectations for every canonicalization rule —
    independent of the DuckDB oracle (which shares only the FIXTURE,
    not these expected strings)."""
    from parquet_extractor_spark.operators.crawl import canonical_url
    from pyspark.sql import functions as F

    cases = [
        # (raw, expected canonical)
        ("http://Example.COM/page?utm_source=x&id=1#frag",
         "http://example.com/page?id=1"),
        ("http://example.com:80/page?id=1", "http://example.com/page?id=1"),
        ("  http://example.com/page?id=1  ", "http://example.com/page?id=1"),
        ("https://News.Example.com:443/a/b?b=2&a=1",
         "https://news.example.com/a/b?a=1&b=2"),
        ("HTTP://EXAMPLE.com", "http://example.com/"),
        ("http://example.com?utm_source=a", "http://example.com/"),
        ("https://example.org/path/?gclid=123", "https://example.org/path/"),
        ("ftp://Host.com:80/X", "ftp://host.com:80/X"),  # non-http port kept
        ("https://example.com:8443/s?x=1#top",
         "https://example.com:8443/s?x=1"),  # non-default port kept
        ("http://example.com/p?a&b=2&utm_medium",
         "http://example.com/p?a&b=2"),  # bare params; bare utm_* dropped
        ("http://example.com/CaseSensitive/Path?Q=Mixed",
         "http://example.com/CaseSensitive/Path?Q=Mixed"),  # path/query case kept
        ("not a url", "not a url"),
        ("mailto:x@y.z#sig", "mailto:x@y.z"),
    ]
    df = spark.createDataFrame([(r,) for r, _ in cases], "uri string")
    got = [r.c for r in
           df.select(canonical_url(F.col("uri")).alias("c")).collect()]
    for (raw, want), actual in zip(cases, got):
        assert actual == want, f"{raw!r}: {actual!r} != {want!r}"


def test_latest_capture_canonicalized_collapses_variants(spark, tmp_path):
    """canonicalize=True folds spelling variants of one page into a
    single kept capture (the newest), while the raw mode keeps them
    apart."""
    from parquet_extractor_spark.operators.crawl import (
        latest_capture_per_uri,
    )

    def resp(seq, uri, date, body):
        return build_warc_record(
            "response", f"22-{seq:04d}", date,
            build_http_response(body),
            target_uri=uri,
            content_type="application/http;msgtype=response",
        )

    d = str(tmp_path / "canon")
    os.makedirs(d)
    recs = [
        resp(0, "http://Example.com/p?utm_source=x&id=1",
             "2026-01-01T00:00:00Z", b"<p>old</p>"),
        resp(1, "http://example.com:80/p?id=1#frag",
             "2026-01-02T00:00:00Z", b"<p>new</p>"),
        resp(2, "http://example.com/other", "2026-01-01T00:00:00Z",
             b"<p>other</p>"),
    ]
    with open(os.path.join(d, "seg.warc"), "wb") as f:
        f.write(build_warc(recs, per_record_gzip=False))
    frame = read_warc_docs(spark, d)

    assert latest_capture_per_uri(frame).count() == 3  # raw: no collapse
    kept = latest_capture_per_uri(frame, canonicalize=True).collect()
    assert len(kept) == 2
    texts = {r.target_uri: r.text for r in kept}
    assert texts["http://example.com:80/p?id=1#frag"] == "new"


def test_politeness_audit_hand_checked(spark):
    """Hand-derived politeness facts for the planted fetch log."""
    from parquet_extractor_spark.operators.crawl import (
        crawl_politeness_audit,
    )

    rows = {r.host: r for r in crawl_politeness_audit(spark, "").collect()}
    assert set(rows) == {"a.com", "b.com", "c.com", "d.com", "e.com"}
    a = rows["a.com"]
    assert (a.n_fetches, a.min_gap_ms, a.polite, a.robots_violations) == (
        3, 200, False, 1)
    c = rows["c.com"]
    assert c.min_gap_ms is None and c.polite  # single fetch
    d = rows["d.com"]
    assert d.polite and d.robots_violations == 3
    assert rows["e.com"].polite  # exactly at the 1000 ms threshold


def test_parse_robots_rfc9309_grouping(spark):
    """Consecutive User-agent lines share one group (RFC 9309 §2.1);
    agent-specific groups are excluded; comments/blanks/junk lines and
    empty Disallow values are dropped; keys are case-insensitive."""
    from parquet_extractor_spark.operators.crawl import (
        ROBOTS_FIXTURE_ROWS,
        parse_robots,
    )

    robots = spark.createDataFrame(
        ROBOTS_FIXTURE_ROWS, "host string, body string"
    )
    rules = {(r.host, r.rule_type, r.value)
             for r in parse_robots(robots).collect()}
    assert rules == {
        ("a.com", "crawl-delay", "2"),
        ("a.com", "disallow", "/private"),
        ("b.com", "allow", "/public"),
        ("b.com", "disallow", "/"),
        # c.com: '*' rides the fastbot group; DISALLOW key lowercased
        ("c.com", "disallow", "/tmp"),
        ("c.com", "crawl-delay", "0.5"),
        # d.com: empty Disallow dropped; e.com: no '*' group at all
    }


def test_robots_compliance_audit_hand_checked(spark):
    """Parsed crawl-delays override the 1000 ms default; allow-all
    robots (d.com) yields zero violations even for /admin fetches;
    a host without a '*' group gets the default delay."""
    from parquet_extractor_spark.operators.crawl import (
        robots_compliance_audit,
    )

    rows = {r.host: r for r in robots_compliance_audit(spark, "").collect()}
    a = rows["a.com"]
    assert (a.required_delay_ms, a.delay_ok, a.robots_violations) == (
        2000, False, 1)
    b = rows["b.com"]  # Disallow: / hits all three fetches
    assert (b.required_delay_ms, b.robots_violations) == (1000, 3)
    c = rows["c.com"]  # fractional Crawl-delay: 0.5 -> 500 ms
    assert c.required_delay_ms == 500 and c.delay_ok
    assert rows["d.com"].robots_violations == 0  # allow-all robots
    assert rows["e.com"].required_delay_ms == 1000  # no '*' group


def test_capture_dedup_stream_matches_batch_and_time_travels(
    spark, tmp_path
):
    """Two crawl cycles through run_capture_dedup_stream: the final
    snapshot equals the batch canonicalized latest-capture over ALL
    segments; the first snapshot is time-travelable and shows only
    cycle 1's survivors."""
    from parquet_extractor_spark.operators.crawl import (
        latest_capture_per_uri,
    )
    from parquet_extractor_spark.sinks.versioned import read_snapshot
    from parquet_extractor_spark.streaming.warc import (
        run_capture_dedup_stream,
    )

    def resp(seq, uri, date, body):
        return build_warc_record(
            "response", f"33-{seq:04d}", date,
            build_http_response(body),
            target_uri=uri,
            content_type="application/http;msgtype=response",
        )

    landing = str(tmp_path / "landing")
    table = str(tmp_path / "captures")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(landing)

    # cycle 1: two spellings of page P + one other page
    seg1 = [
        resp(0, "http://Example.com/p?utm_source=x&id=1",
             "2026-01-01T00:00:00Z", b"<p>old</p>"),
        resp(1, "http://example.com:80/p?id=1",
             "2026-01-02T00:00:00Z", b"<p>mid</p>"),
        resp(2, "http://example.com/other",
             "2026-01-01T00:00:00Z", b"<p>other</p>"),
    ]
    with open(os.path.join(landing, "seg1.warc.gz"), "wb") as f:
        f.write(build_warc(seg1))
    v1 = run_capture_dedup_stream(spark, landing, ckpt, table)
    assert len(v1) == 1
    first = {r.text for r in read_snapshot(spark, table).collect()}
    assert first == {"mid", "other"}  # variants of P collapsed

    # cycle 2: a NEWER capture of P + a new page
    seg2 = [
        resp(3, "http://example.com/p?id=1#frag",
             "2026-02-01T00:00:00Z", b"<p>new</p>"),
        resp(4, "http://example.com/fresh",
             "2026-02-01T00:00:00Z", b"<p>fresh</p>"),
    ]
    with open(os.path.join(landing, "seg2.warc.gz"), "wb") as f:
        f.write(build_warc(seg2))
    run_capture_dedup_stream(spark, landing, ckpt, table)

    latest = read_snapshot(spark, table)
    assert {r.text for r in latest.collect()} == {"new", "other", "fresh"}

    # equality with the one-shot batch plan over all segments
    batch = latest_capture_per_uri(
        read_warc_docs(spark, landing), canonicalize=True
    )
    key = lambda d: (d["record_id"],)  # noqa: E731
    a = sorted((r.asDict() for r in latest.collect()), key=key)
    b = sorted((r.asDict() for r in batch.collect()), key=key)
    assert a == b

    # time travel: cycle 1's frontier is still readable
    assert {r.text for r in read_snapshot(spark, table, version=0)
            .collect()} == {"mid", "other"}
