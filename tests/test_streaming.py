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


def test_replayed_epoch_ingests_once(spark, tmp_path):
    """foreachBatch is at-least-once: a crash between source.append and the
    stream's epoch commit re-delivers the micro-batch. The epoch-keyed
    append must recognise the replay and produce ZERO new source snapshots
    (and no new doc rows)."""
    pages, _ = pages_dataframe(spark, n=60, seed=3)
    pages = pages.select("url", "text", "lang")

    work = str(tmp_path / "work")
    sd = StreamingDedup(spark, work, CFG)
    sd._checkpoint_dir = str(tmp_path / "ckpt")  # as start() would set

    sd._process_batch(pages, epoch_id=0)
    snaps_before = len(sd.source.snapshots("pages"))
    docs_before = sd.engine.work.read(spark, "docs").count()
    clusters_before = sorted(
        (r["doc_id"], r["cluster_id"]) for r in sd.clusters().collect()
    )

    # simulate the replay: same epoch id, same rows, delivered again
    sd._process_batch(pages, epoch_id=0)
    assert len(sd.source.snapshots("pages")) == snaps_before
    assert sd.engine.work.read(spark, "docs").count() == docs_before
    clusters_after = sorted(
        (r["doc_id"], r["cluster_id"]) for r in sd.clusters().collect()
    )
    assert clusters_before == clusters_after

    # a genuinely new epoch still ingests
    more, _ = pages_dataframe(spark, n=20, seed=99)
    sd._process_batch(more.select("url", "text", "lang"), epoch_id=1)
    assert len(sd.source.snapshots("pages")) == snaps_before + 1


def test_keyed_append_is_idempotent(spark, tmp_path):
    from webdedup.catalog import Catalog

    cat = Catalog(str(tmp_path / "wh"))
    df = spark.range(0, 10).withColumnRenamed("id", "x")
    s1 = cat.append("t", df, key="epoch-0")
    s2 = cat.append("t", df, key="epoch-0")  # replay → same snapshot back
    assert s1 == s2
    assert cat.read(spark, "t").count() == 10
    s3 = cat.append("t", df, key="epoch-1")
    assert s3 == s1 + 1
    assert cat.read(spark, "t").count() == 20


def test_epoch_key_is_path_spelling_invariant(spark, tmp_path):
    """Restarting a query with an equivalent-but-differently-spelled
    checkpoint path (trailing slash, relative, symlink) must produce the
    SAME idempotency keys — otherwise replayed epochs re-ingest and
    exactly-once degrades to at-least-once."""
    import os

    from webdedup.streaming import StreamingDedup

    ckpt = str(tmp_path / "ckpt")
    os.makedirs(ckpt, exist_ok=True)
    link = str(tmp_path / "ckpt_link")
    os.symlink(ckpt, link)

    sd = StreamingDedup(spark, str(tmp_path / "work"))
    keys = set()
    for spelling in (ckpt, ckpt + "/", link, os.path.relpath(ckpt)):
        sd._checkpoint_dir = spelling
        keys.add(sd._epoch_key(3))
    assert len(keys) == 1, keys


def test_legacy_epoch_key_recognised_across_upgrade(spark, tmp_path):
    """A manifest written BEFORE the realpath key normalization stores
    epochs under the raw checkpoint spelling; a stream restarted across
    that upgrade replays its last epoch under the new spelling and must
    NOT double-ingest it (ADVICE r4): the replay probe must also check the
    legacy raw-spelling key."""
    pages, _ = pages_dataframe(spark, n=40, seed=7)
    pages = pages.select("url", "text", "lang")

    sd = StreamingDedup(spark, str(tmp_path / "work"), CFG)
    # a spelling whose realpath differs from the raw string (trailing /)
    raw_spelling = str(tmp_path / "ckpt") + "/"
    os.makedirs(raw_spelling, exist_ok=True)
    sd._checkpoint_dir = raw_spelling
    assert sd._legacy_epoch_key(0) != sd._epoch_key(0)

    # simulate the PRE-upgrade engine: epoch 0 manifested under the raw key
    sd.source.append("pages", pages, key=sd._legacy_epoch_key(0))
    snaps_before = len(sd.source.snapshots("pages"))

    # post-upgrade replay of the same epoch: must be recognised, 0 new snaps
    sd._process_batch(pages, epoch_id=0)
    assert len(sd.source.snapshots("pages")) == snaps_before

    # and a genuinely new epoch still ingests under the new key
    more, _ = pages_dataframe(spark, n=10, seed=42)
    sd._process_batch(more.select("url", "text", "lang"), epoch_id=1)
    assert len(sd.source.snapshots("pages")) == snaps_before + 1
