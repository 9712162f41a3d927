"""Source-format readers: Common-Crawl WET (extracted-text WARC) ingestion.

The pipeline's canonical input is a pages table, but real crawl corpora
arrive as WET files — WARC containers holding one ``conversion`` record of
extracted text per page. This module turns WET content into the pages
shape with PURE JVM expressions: the file reader splits records at scan
time via the text datasource's multi-char ``lineSep`` (no Python, no
whole-file buffering — a 100-TB crawl streams through partitioned record
splits), and parsing is regexp/substring codegen.

Byte-exactness: ``Content-Length`` is an OCTET count, so the body trim
goes through encode → binary substring → decode rather than a character
``left()`` — a UTF-8 page whose length-in-chars differs from its
length-in-bytes still round-trips exactly (and the DuckDB oracle does the
identical blob-slice).

Reference scope note: the reference engine has no file-format surface;
this is a training-data-pipeline source mandated by the build brief.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, functions as F

# A record delimiter, not a line delimiter: every WARC record begins with
# this version line, so splitting on it yields one row per record with the
# header block + body as the row text.
WET_RECORD_DELIM = "WARC/1.0\r\n"


def _wet_parsed(records: DataFrame, content_col: str) -> DataFrame:
    """Shared header/body/length extraction: (url, warc_date, _body,
    _clen, _got) for every ``conversion`` record. ``_got`` is the body's
    actual OCTET count, ``_clen`` the declared Content-Length."""
    rec = F.col(content_col)
    hdr = F.substring_index(rec, "\r\n\r\n", 1)
    return (
        records.where(
            F.regexp_extract(hdr, r"WARC-Type: ([^\r\n]+)", 1) == "conversion"
        )
        .select(
            F.regexp_extract(hdr, r"WARC-Target-URI: ([^\r\n]+)", 1).alias("url"),
            F.regexp_extract(hdr, r"WARC-Date: ([^\r\n]+)", 1).alias("warc_date"),
            F.expr(
                f"substring({content_col}, locate('\\r\\n\\r\\n', {content_col}) + 4)"
            ).alias("_body"),
            F.regexp_extract(hdr, r"Content-Length: (\d+)", 1)
            .cast("long")
            .alias("_clen"),
        )
        .withColumn("_got", F.octet_length(F.encode("_body", "UTF-8")))
    )


def parse_wet_records(records: DataFrame, content_col: str = "value") -> DataFrame:
    """(record-text rows) → (url, warc_date, text): keep ``conversion``
    records, pull WARC-Target-URI / WARC-Date from the header block, and
    slice the body to exactly ``Content-Length`` BYTES.

    Input rows are WET records with the leading ``WARC/1.0\\r\\n`` already
    stripped (what the ``lineSep`` split of :func:`read_wet` produces);
    the warcinfo preamble and empty leading split fall out of the
    WARC-Type filter. Everything is whole-stage-codegen string ops —
    zero Python, zero shuffles.

    Truncation guard (ADVICE r4): the record split is a plain delimiter
    scan, so a body that itself contains the ``WARC/1.0\\r\\n`` byte
    sequence is split mid-body — the leading fragment keeps the headers
    but holds FEWER than Content-Length body octets (and the trailing
    fragment has no conversion header, so it falls out of the type
    filter). Records whose body octet count is short of the declared
    Content-Length are therefore DROPPED here rather than silently
    truncated; :func:`parse_wet_rejects` surfaces them for quarantine.
    """
    out = _wet_parsed(records, content_col).where(
        F.col("_clen").isNotNull() & (F.col("_got") >= F.col("_clen"))
    )
    # octet-exact trim: Content-Length counts bytes, substring counts
    # chars — encode to binary, slice, decode
    return out.select(
        "url",
        "warc_date",
        F.expr("decode(substring(encode(_body, 'UTF-8'), 1, int(_clen)), 'UTF-8')")
        .alias("text"),
    )


def parse_wet_rejects(records: DataFrame, content_col: str = "value") -> DataFrame:
    """Quarantine face of :func:`parse_wet_records`: the ``conversion``
    records it drops — body shorter than the declared Content-Length
    (delimiter collision inside the extracted text) or Content-Length
    missing. Returns (url, warc_date, content_length, body_octets) so an
    ingest job can count/route rejects without re-reading the corpus."""
    return (
        _wet_parsed(records, content_col)
        .where(F.col("_clen").isNull() | (F.col("_got") < F.col("_clen")))
        .select(
            "url",
            "warc_date",
            F.col("_clen").alias("content_length"),
            F.col("_got").cast("long").alias("body_octets"),
        )
    )


def read_wet(spark: SparkSession, path: str) -> DataFrame:
    """Read WET files under ``path`` into (url, warc_date, text).

    ``spark.read.option("lineSep", "WARC/1.0\\r\\n")`` makes the text
    datasource emit ONE ROW PER WARC RECORD at scan time — records split
    inside the distributed reader, so a directory of .wet files streams
    through normal file partitioning with no whole-file materialization
    and no Python in the path.

    Gzipped WET (``.wet.gz``, the form Common Crawl actually publishes)
    reads through the same call — Hadoop's codec layer decompresses by
    file EXTENSION transparently, and the lineSep record split applies to
    the decompressed stream. Caveat: gzip is a NON-SPLITTABLE codec, so
    one ``.gz`` file = one input partition = one task; parallelism is the
    file count. That is the production shape anyway — a crawl ships as
    tens of thousands of ~1 GiB segment files, so a directory of shards
    saturates any cluster; a single giant .gz would serialize and should
    be re-sharded first.

    Records whose body fails the Content-Length octet check are dropped
    (see :func:`parse_wet_records`); use :func:`read_wet_rejects` to
    count/inspect them.
    """
    raw = spark.read.option("lineSep", WET_RECORD_DELIM).text(path)
    return parse_wet_records(raw)


def read_wet_rejects(spark: SparkSession, path: str) -> DataFrame:
    """Quarantine companion of :func:`read_wet`: conversion records under
    ``path`` that fail the Content-Length octet check."""
    raw = spark.read.option("lineSep", WET_RECORD_DELIM).text(path)
    return parse_wet_rejects(raw)


def to_wet_records(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """(doc_id, text) → one WET ``conversion`` record string per doc
    (deterministic synthetic writer: the inverse of
    :func:`parse_wet_records`, used by tests and the driver oracle to
    prove parse ∘ generate = identity). Pure JVM concat."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat(
            F.lit(
                WET_RECORD_DELIM
                + "WARC-Type: conversion\r\nWARC-Target-URI: https://example.org/doc/"
            ),
            F.col(id_col).cast("string"),
            F.lit("\r\nWARC-Date: 2024-01-01T00:00:00Z\r\nContent-Length: "),
            F.octet_length(text_col).cast("string"),
            F.lit("\r\n\r\n"),
            F.col(text_col),
            F.lit("\r\n\r\n"),
        ).alias("record"),
    )
