#!/usr/bin/env python
"""Capture .explain('formatted') for every r6-touched query/operator.

Usage: python capture_plans_r06.py <suffix>
  suffix = 'before' (run with PYTHONPATH pointing at the round-start
  worktree) or 'after' (current tree). Plans land in
  /root/repo/plans/r06/<name>_<suffix>.txt regardless of which tree ran.
"""

import os
import sys

PLAN_DIR = "/root/repo/plans/r06"
SF_DIR = "/root/testdata/sf0.1"
SUFFIX = sys.argv[1]


def cap(df, name):
    os.makedirs(PLAN_DIR, exist_ok=True)
    s = df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )
    with open(os.path.join(PLAN_DIR, f"{name}_{SUFFIX}.txt"), "w") as f:
        f.write(s)
    print("captured", name, SUFFIX, flush=True)


import __spark_entry__ as E  # noqa: E402
from pyspark.sql import functions as F  # noqa: E402
from webdedup.session import get_spark  # noqa: E402
from webdedup.pipeline import dedup  # noqa: E402
from webdedup import textstats as TS  # noqa: E402
from webdedup.api import MinHashNeighbors  # noqa: E402
from webdedup.joins import release_persisted  # noqa: E402

spark = get_spark(f"plans-{SUFFIX}", cores=8, shuffle_partitions=32)
spark.sparkContext.setLogLevel("ERROR")
docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")

res = dedup(spark.read.parquet(f"{SF_DIR}/documents.parquet"), E.CFG, id_col="doc_id")
cap(res.clusters, "q_dedup_e2e_clusters")
cap(res.pairs, "q_dedup_e2e_edges")
release_persisted()

cap(E.q_lsh_candidate_pairs(spark, SF_DIR), "q_lsh_candidates")
release_persisted()
cap(E.q_ngram_jaccard_pairs(spark, SF_DIR), "q_ngram_jaccard")
release_persisted()
cap(E.q_cosine_ann_ivf(spark, SF_DIR), "q_cosine_ann_ivf")
cap(E.q_simhash_fingerprints(spark, SF_DIR), "q_simhash")
cap(E.q_token_topk(spark, SF_DIR), "q_token_topk")
release_persisted()

cap(
    TS.span_dedup(docs.select("doc_id", "text"), span=5, min_docs=2),
    "span_dedup",
)
release_persisted()

feats = docs.select(
    F.col("doc_id").alias("id"),
    F.array_distinct(F.transform(F.split("text", " "), F.crc32)).alias("features"),
)
nn = MinHashNeighbors(
    n_neighbors=3, number_of_hash_functions=32, max_bin_size=50,
    fast=False, metric="jaccard",
).fit(feats)
cap(nn.kneighbors(), "kneighbors_fastfalse")
release_persisted()
spark.stop()
