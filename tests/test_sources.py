"""WET (Common-Crawl extracted-text WARC) source reader: the file-backed
path (multi-char lineSep record split at scan time) and the parse
semantics — byte-exact Content-Length trim, record filtering.
(The generate→parse inversion is also value-checked by the driver
`wet_ingest` oracle.)
"""

from pyspark.sql import functions as F

from webdedup.sources import parse_wet_records, read_wet, to_wet_records


def _write_wet(tmp_path, name, docs):
    """Serialize docs as a real WET file: warcinfo preamble + one
    conversion record per (url, text)."""
    parts = ["WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nSoftware: test\r\n\r\n"]
    for url, text in docs:
        body = text.encode("utf-8")
        parts.append(
            "WARC/1.0\r\n"
            "WARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n" + text + "\r\n\r\n"
        )
    p = tmp_path / name
    p.write_bytes("".join(parts).encode("utf-8"))
    return str(tmp_path)


def test_read_wet_roundtrips_files(spark, tmp_path):
    docs = [
        ("http://a.example/1", "plain ascii page text"),
        # multi-byte UTF-8: Content-Length (bytes) != len (chars) — the
        # octet-exact encode/substring/decode trim is what's under test
        ("http://b.example/2", "héllo wörld 北京 page"),
        # body containing the header separator itself: the byte trim must
        # keep it and stop exactly at Content-Length
        ("http://c.example/3", "para one\r\n\r\npara two"),
    ]
    path = _write_wet(tmp_path, "f1.wet", docs)
    got = {r.url: r for r in read_wet(spark, path).collect()}
    assert set(got) == {u for u, _ in docs}
    for url, text in docs:
        assert got[url].text == text, url
        assert got[url].warc_date == "2024-01-01T00:00:00Z"


def test_read_wet_skips_non_conversion_records(spark, tmp_path):
    path = _write_wet(tmp_path, "f2.wet", [("http://x.example/1", "kept page")])
    # warcinfo preamble is present in every file; only conversion survives
    assert read_wet(spark, path).count() == 1


def test_parse_wet_plan_is_pure_codegen(spark):
    recs = to_wet_records(
        spark.createDataFrame([(1, "a b c")], "doc_id long, text string")
    ).select(
        # strip the leading delimiter like the lineSep split does
        F.expr("substring(record, 11)").alias("value")
    )
    df = parse_wet_records(recs)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan and "BatchEvalPython" not in plan
    (row,) = df.collect()
    assert row.text == "a b c" and row.url.endswith("/doc/1")


def test_wet_delimiter_collision_quarantined(spark, tmp_path):
    """A body containing the literal record delimiter 'WARC/1.0\\r\\n' is
    split mid-body by the lineSep scan; the truncated leading fragment
    must be REJECTED (body octets < Content-Length), never silently
    returned short (ADVICE r4), and the rejects face must surface it."""
    from webdedup.sources import parse_wet_rejects, read_wet_rejects

    evil = "extracted text quoting a header:\r\nWARC/1.0\r\nand more text"
    docs = [
        ("http://ok.example/1", "intact page"),
        ("http://evil.example/2", evil),
        ("http://ok.example/3", "another intact page"),
    ]
    path = _write_wet(tmp_path, "evil.wet", docs)
    kept = {r.url: r.text for r in read_wet(spark, path).collect()}
    # intact records still parse byte-exactly; the collision record is gone
    assert kept == {
        "http://ok.example/1": "intact page",
        "http://ok.example/3": "another intact page",
    }
    rejects = read_wet_rejects(spark, path).collect()
    assert len(rejects) == 1
    (r,) = rejects
    assert r.url == "http://evil.example/2"
    assert r.body_octets < r.content_length


def test_read_wet_gzip_roundtrip(spark, tmp_path):
    """.wet.gz reads through Hadoop's transparent extension codec: the
    lineSep record split applies to the DECOMPRESSED stream, and a
    directory mixing .wet and .wet.gz shards parses identically.
    (Non-splittable-codec caveat documented in read_wet: one .gz file =
    one task; shard count = parallelism.)"""
    import gzip

    docs_plain = [("http://p.example/1", "plain shard page")]
    docs_gz = [
        ("http://g.example/1", "gzipped shard héllo 北京"),
        ("http://g.example/2", "second gz page\r\n\r\nwith separator"),
    ]
    path = _write_wet(tmp_path, "s0.wet", docs_plain)
    # gzip shard: same WET byte layout, compressed
    parts = ["WARC/1.0\r\nWARC-Type: warcinfo\r\n\r\nSoftware: test\r\n\r\n"]
    for url, text in docs_gz:
        body = text.encode("utf-8")
        parts.append(
            "WARC/1.0\r\nWARC-Type: conversion\r\n"
            f"WARC-Target-URI: {url}\r\n"
            "WARC-Date: 2024-01-01T00:00:00Z\r\n"
            f"Content-Length: {len(body)}\r\n\r\n" + text + "\r\n\r\n"
        )
    (tmp_path / "s1.wet.gz").write_bytes(
        gzip.compress("".join(parts).encode("utf-8"))
    )
    got = {r.url: r.text for r in read_wet(spark, path).collect()}
    assert got == dict(docs_plain + docs_gz)
