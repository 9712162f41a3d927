"""Catalog snapshots + checkpoint-resume incremental dedup tests."""

import json
import os
import shutil

import pytest
from pyspark.sql import functions as F

from webdedup.catalog import Catalog
from webdedup.config import DedupConfig
from webdedup.fixtures import pages_dataframe
from webdedup.incremental import IncrementalDedup
from webdedup.pipeline import dedup

CFG = DedupConfig(
    number_of_hash_functions=128, rows_per_band=4, shingle_size=3,
    jaccard_threshold=0.8, use_substring_pass=False,  # keep incremental runs fast
)


@pytest.fixture()
def tmp_root(tmp_path):
    return str(tmp_path)


def test_catalog_snapshots_and_incremental_read(spark, tmp_root):
    cat = Catalog(os.path.join(tmp_root, "wh"))
    df1 = spark.range(0, 10).withColumnRenamed("id", "x")
    df2 = spark.range(10, 25).withColumnRenamed("id", "x")
    s1 = cat.append("t", df1)
    s2 = cat.append("t", df2)
    assert (s1, s2) == (1, 2)
    assert cat.read(spark, "t").count() == 25
    assert cat.read(spark, "t", snapshot=1).count() == 10
    inc = cat.read_incremental(spark, "t", after=1)
    assert inc.count() == 15
    assert cat.read_incremental(spark, "t", after=2) is None


def _split_pages(spark, n=300):
    pages, _ = pages_dataframe(spark, n=n, seed=42)
    pages = pages.select("url", "warc_ts", "text", "lang")  # html binary not needed
    p1 = pages.where(F.crc32("url") % 2 == 0)
    p2 = pages.where(F.crc32("url") % 2 == 1)
    return pages, p1, p2


def test_incremental_matches_batch(spark, tmp_root):
    pages, p1, p2 = _split_pages(spark)
    cat = Catalog(os.path.join(tmp_root, "src"))
    cat.append("pages", p1)

    inc = IncrementalDedup(spark, cat, os.path.join(tmp_root, "work"), CFG)
    m1 = inc.process("pages")
    assert m1 is not None and m1["source_snapshot"] == 1

    cat.append("pages", p2)
    m2 = inc.process("pages")
    assert m2["source_snapshot"] == 2

    # same clustering as one-shot batch over the full corpus
    inc_cl = inc.clusters()
    batch = dedup(pages, CFG)
    ids = pages.select("url", F.xxhash64("url").alias("doc_id"))
    batch_cl = batch.clusters.join(ids, "doc_id")

    def groups(rows):
        by = {}
        for did, cid in rows:
            by.setdefault(cid, set()).add(did)
        return {frozenset(v) for v in by.values() if len(v) > 1}

    gi = groups([(r["doc_id"], r["cluster_id"]) for r in inc_cl.collect()])
    gb = groups([(r["doc_id"], r["cluster_id"]) for r in batch_cl.select("doc_id", "cluster_id").collect()])
    assert gi == gb


def test_process_is_idempotent(spark, tmp_root):
    _, p1, _ = _split_pages(spark)
    cat = Catalog(os.path.join(tmp_root, "src"))
    cat.append("pages", p1)
    inc = IncrementalDedup(spark, cat, os.path.join(tmp_root, "work"), CFG)
    assert inc.process("pages") is not None
    assert inc.process("pages") is None  # up to date → no-op
    c1 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.clusters().collect()
    )
    assert inc.process("pages") is None
    c2 = sorted(
        (r["doc_id"], r["cluster_id"]) for r in inc.clusters().collect()
    )
    assert c1 == c2


def test_crash_resume_rolls_back_partial_writes(spark, tmp_root):
    pages, p1, p2 = _split_pages(spark)
    cat = Catalog(os.path.join(tmp_root, "src"))
    cat.append("pages", p1)
    work = os.path.join(tmp_root, "work")
    inc = IncrementalDedup(spark, cat, work, CFG)
    inc.process("pages")

    # simulate a crash during snapshot 2: partial work-store appends landed
    # but state.json was never advanced
    cat.append("pages", p2)
    partial = p2.limit(20).withColumn("doc_id", F.xxhash64("url")).withColumn(
        "fingerprint", F.md5(F.col("text").cast("binary"))
    ).select("doc_id", "fingerprint").withColumn("src_snapshot", F.lit(2))
    inc.work.append("docs", partial)  # debris

    m2 = inc.process("pages")  # must roll back debris, then process cleanly
    assert m2["source_snapshot"] == 2

    # every page labeled exactly once (debris would double-count docs)
    assert inc.clusters().count() == pages.count()
    assert inc.clusters().select("doc_id").distinct().count() == pages.count()


def test_metrics_files_written(spark, tmp_root):
    _, p1, _ = _split_pages(spark)
    cat = Catalog(os.path.join(tmp_root, "src"))
    cat.append("pages", p1)
    work = os.path.join(tmp_root, "work")
    inc = IncrementalDedup(spark, cat, work, CFG)
    m = inc.process("pages")
    path = os.path.join(work, "metrics-snap000001.json")
    assert os.path.exists(path)
    saved = json.load(open(path))
    assert saved["featurize"]["pages_shingled"] > 0
    assert saved["featurize"]["signatures_emitted"] > 0
    assert "candidate_pairs" in saved["candidates"]
    assert isinstance(saved["partition_lineage"], list)
