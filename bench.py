#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

--scaling: run the end-to-end dedup job in two subprocesses at local[8] and
local[32] on the same input and report both throughputs + scaling efficiency
(the sandbox stand-in for the north rule's N vs 4N executor validation).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def run_bench(sf_dir: str, cpus: int) -> dict:
    from pyspark.sql import functions as F

    import __spark_entry__ as E
    from webdedup.session import get_spark

    spark = get_spark(
        app_name=f"webdedup-bench-{cpus}",
        cores=cpus,
        shuffle_partitions=max(cpus, 16),
    )
    spark.sparkContext.setLogLevel("ERROR")

    n_docs = spark.read.parquet(f"{sf_dir}/documents.parquet").count()

    timings: dict[str, float] = {}

    def timed(name: str, fn):
        t0 = time.perf_counter()
        out = fn()
        timings[name] = round(time.perf_counter() - t0, 3)
        return out

    # headline: full dedup pipeline (read → featurize → LSH → verify → CC)
    def _dedup():
        from webdedup.pipeline import dedup

        res = dedup(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), E.CFG, id_col="doc_id"
        )
        return res.clusters.count()

    timed("q_dedup_e2e", _dedup)

    # supporting operators
    timed(
        "q_lsh_candidates",
        lambda: E.q_lsh_candidate_pairs(spark, sf_dir).count(),
    )
    timed(
        "q_ngram_jaccard",
        lambda: E.q_ngram_jaccard_pairs(spark, sf_dir).count(),
    )
    timed("q_cosine_topk", lambda: E.q_cosine_topk(spark, sf_dir).count())
    timed("q_simhash", lambda: E.q_simhash_fingerprints(spark, sf_dir).count())
    timed("q_token_topk", lambda: E.q_token_topk(spark, sf_dir).count())

    total = round(sum(timings.values()), 3)
    dedup_sec = timings["q_dedup_e2e"]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(sf_dir),
        "cpus": cpus,
        "n_docs": n_docs,
        "dedup_pages_per_sec": round(n_docs / dedup_sec, 1) if dedup_sec else None,
    }
    spark.stop()
    return result


def run_scaling(sf_dir: str, n_low: int = 8, n_high: int = 32) -> dict:
    """Same dedup job at two parallelism levels → scaling efficiency."""
    outs = {}
    for cpus in (n_low, n_high):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=sf_dir, SPARK_GRAFT_CPUS=str(cpus))
        p = subprocess.run(
            [sys.executable, __file__, "--single"],
            env=env,
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in p.stdout.strip().splitlines() if l.startswith("{")][-1]
        outs[cpus] = json.loads(line)
    thr_low = outs[n_low]["dedup_pages_per_sec"]
    thr_high = outs[n_high]["dedup_pages_per_sec"]
    eff = thr_high / (thr_low * (n_high / n_low))
    return {
        "metric": "dedup_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "sf": _sf_from_dir(sf_dir),
        "n_low": n_low,
        "n_high": n_high,
        "pages_per_sec_low": thr_low,
        "pages_per_sec_high": thr_high,
        "dedup_sec_low": outs[n_low]["queries"]["q_dedup_e2e"],
        "dedup_sec_high": outs[n_high]["queries"]["q_dedup_e2e"],
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        print(json.dumps(run_scaling(SF_DIR)))
    else:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
