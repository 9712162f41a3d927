"""Structured Streaming ingestion == replaying the same batches by hand."""

import os

import pytest
from pyspark.sql import functions as F

from webdedup.config import DedupConfig
from webdedup.fixtures import pages_dataframe
from webdedup.pipeline import dedup
from webdedup.streaming import StreamingDedup

CFG = DedupConfig(
    number_of_hash_functions=128, rows_per_band=4, shingle_size=3,
    jaccard_threshold=0.8, use_substring_pass=False,
)


def test_stream_matches_batch(spark, tmp_path):
    pages, _ = pages_dataframe(spark, n=200, seed=11)
    pages = pages.select("url", "text", "lang")
    p1 = pages.where(F.crc32("url") % 2 == 0)
    p2 = pages.where(F.crc32("url") % 2 == 1)

    # two "arriving" file drops
    in_dir = str(tmp_path / "incoming")
    p1.coalesce(1).write.mode("append").parquet(in_dir)
    p2.coalesce(1).write.mode("append").parquet(in_dir)

    sd = StreamingDedup(spark, str(tmp_path / "work"), CFG)
    stream = spark.readStream.schema(pages.schema).option(
        "maxFilesPerTrigger", "1"  # force >= 2 micro-batches
    ).parquet(in_dir)
    q = sd.start(stream, str(tmp_path / "ckpt"))
    q.awaitTermination(300)
    assert sd.batches_processed >= 2

    urls = sd.engine.work.read(spark, "docs").select("doc_id", "url")
    got = sd.clusters().join(urls, "doc_id")
    batch = dedup(pages, CFG)

    def groups(rows):
        by = {}
        for u, c in rows:
            by.setdefault(c, set()).add(u)
        return {frozenset(v) for v in by.values() if len(v) > 1}

    gs = groups([(r["url"], r["cluster_id"]) for r in got.collect()])
    gb = groups([(r["url"], r["cluster_id"]) for r in batch.clusters.select("url", "cluster_id").collect()])
    assert gs == gb


def test_stream_restart_is_idempotent(spark, tmp_path):
    """Restarting the stream over the same checkpoint must not reprocess
    batches (Spark epoch dedup) nor corrupt the store."""
    pages, _ = pages_dataframe(spark, n=80, seed=5)
    pages = pages.select("url", "text", "lang")
    in_dir = str(tmp_path / "incoming")
    pages.coalesce(1).write.mode("append").parquet(in_dir)

    work = str(tmp_path / "work")
    ckpt = str(tmp_path / "ckpt")
    sd = StreamingDedup(spark, work, CFG)
    stream = spark.readStream.schema(pages.schema).parquet(in_dir)
    sd.start(stream, ckpt).awaitTermination(300)
    before = sorted(
        (r["doc_id"], r["cluster_id"]) for r in sd.clusters().collect()
    )

    sd2 = StreamingDedup(spark, work, CFG)
    stream2 = spark.readStream.schema(pages.schema).parquet(in_dir)
    sd2.start(stream2, ckpt).awaitTermination(300)
    assert sd2.batches_processed == 0  # nothing new → no reprocessing
    after = sorted(
        (r["doc_id"], r["cluster_id"]) for r in sd2.clusters().collect()
    )
    assert before == after
