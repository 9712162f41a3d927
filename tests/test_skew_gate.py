"""Skew stress gate (VERDICT r3 ask #6): a power-law band-bucket population
just under max_bin_size — the tombstone must NOT fire — must flow through
lsh.candidate_pairs with BOUNDED max-task input: AQE's skew-join rule splits
the hot (band, band_hash) partition across tasks. This protects the one
shuffle salting does not cover (salting spreads the bucket-size COUNTING;
the candidate self-join still co-locates each bucket).

Runs in a subprocess so the session can enable the event log + tight skew
thresholds; the assertion reads per-task shuffle-read bytes from the event
log, i.e. what actually executed, not what the plan claimed.

Regression guard for lsh.candidate_pairs' no-explicit-repartition design: a
user-origin repartition() before the join is ineligible for the skew rule,
so the whole hot bucket would land on ONE task (measured: 1 task vs ~20).
"""

import json
import os
import subprocess
import sys

HOT = 6000          # hot bucket population — just under the cap below
CAP = 6001          # max_bin_size: tombstone must NOT fire at HOT members
N_COLD = 300        # cold buckets
COLD_SZ = 20

_SCRIPT = f"""
import glob, json, os, shutil, sys
sys.path.insert(0, {json.dumps(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))})
from pyspark.sql import SparkSession, functions as F
from webdedup import lsh
from webdedup.config import DedupConfig

EVDIR = sys.argv[1]
shutil.rmtree(EVDIR, ignore_errors=True); os.makedirs(EVDIR)
spark = (
    SparkSession.builder.master("local[8]").appName("skew-gate")
    .config("spark.sql.shuffle.partitions", "16")
    .config("spark.sql.adaptive.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.enabled", "true")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionFactor", "2")
    .config("spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16k")
    .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "8k")
    .config("spark.sql.autoBroadcastJoinThreshold", "-1")
    .config("spark.eventLog.enabled", "true")
    .config("spark.eventLog.dir", EVDIR)
    .config("spark.eventLog.compress", "false")
    .config("spark.eventLog.rolling.enabled", "false")
    .config("spark.ui.enabled", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
cfg = DedupConfig(max_bin_size={CAP})
hot = spark.range({HOT}).select(
    F.col("id").alias("doc_id"), F.array(F.lit(1111).cast("long")).alias("bands"))
cold = spark.range({N_COLD * COLD_SZ}).select(
    (100_000 + F.col("id")).alias("doc_id"),
    F.array((2000 + F.col("id") % {N_COLD}).cast("long")).alias("bands"))
feat = hot.union(cold)
n = lsh.candidate_pairs(feat, cfg).count()
app_id = spark.sparkContext.applicationId
spark.stop()

stages = {{}}
for path in glob.glob(os.path.join(EVDIR, "*" + app_id + "*")):
    files = [path]
    if os.path.isdir(path):
        files = [os.path.join(path, f) for f in os.listdir(path)
                 if f.startswith("events")]
    for f in files:
        for line in open(f):
            ev = json.loads(line)
            if ev.get("Event") == "SparkListenerTaskEnd":
                tm = ev.get("Task Metrics") or {{}}
                srm = tm.get("Shuffle Read Metrics") or {{}}
                b = (srm.get("Local Bytes Read") or 0) + (srm.get("Remote Bytes Read") or 0)
                stages.setdefault(ev["Stage ID"], []).append(b)
out = {{
    "pairs": n,
    "stages": {{str(k): {{"tasks": len(v), "max": max(v), "total": sum(v)}}
               for k, v in stages.items()}},
}}
print("RESULT::" + json.dumps(out))
"""


def test_near_cap_hot_bucket_join_has_bounded_task_input(tmp_path):
    evdir = str(tmp_path / "evlog")
    proc = subprocess.run(
        [sys.executable, "-c", _SCRIPT, evdir],
        capture_output=True, text=True, timeout=600,
    )
    assert proc.returncode == 0, proc.stderr[-4000:]
    line = [l for l in proc.stdout.splitlines() if l.startswith("RESULT::")][0]
    res = json.loads(line[len("RESULT::"):])

    # tombstone did NOT fire: every in-bucket pair is present
    want = HOT * (HOT - 1) // 2 + N_COLD * COLD_SZ * (COLD_SZ - 1) // 2
    assert res["pairs"] == want

    # the candidate join stage: shuffle-reads the bucket rows (two sides of
    # ~HOT rows ≈ 100-200 KB total) — far below the pair-dedup stage (tens
    # of MB) and above the tiny build stages
    join_stages = [
        s for s in res["stages"].values()
        if 50_000 < s["total"] < 10_000_000 and s["tasks"] > 1
    ]
    assert join_stages, f"no join-shaped stage found: {res['stages']}"
    j = max(join_stages, key=lambda s: s["total"])
    # AQE split the hot partition: more tasks than the static width, and no
    # single task read more than ~a skew-threshold's worth of bucket rows
    assert j["tasks"] > 16, f"hot bucket not split: {j}"
    # bound = 8x the 16k skew threshold: AQE splits at map-output-chunk
    # granularity, so pieces can overshoot the advisory size somewhat; the
    # failure mode guarded against (one task reading the entire bucket, as
    # the old explicit-repartition plan did) reads the full ~300+ KB
    assert j["max"] <= 128_000, (
        f"max task shuffle-read {j['max']}B — a single task swallowed the "
        f"hot bucket: {j}"
    )
    # the bucket bytes really were concentrated: without a split, one task
    # would have read > half the stage input
    assert j["max"] < j["total"] / 2
