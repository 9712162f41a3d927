#!/usr/bin/env python
"""Benchmark harness.

Default: run the headline queries at $SPARK_GRAFT_SF_DIR (default
/root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] (default 32) and print ONE
JSON line: {"metric", "value", "unit", "queries", "sf", ...}.

--scaling: run the end-to-end dedup job at local[2] and local[8] (N and 4N
cores) on the same input, interleaved repetitions, median throughputs +
scaling efficiency (the sandbox stand-in for the north rule's N vs 4N
executor validation). 2->8 rather than 8->32 because this host advertises
32 vCPUs but delivers ~16 cores of real throughput (process-scaling probe:
1..16 procs flat, 32 procs ~2x slower each) — both legs must fit inside the
real capacity or the measurement reflects hypervisor oversubscription, not
the engine.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
# default 16, not 32: the host delivers ~16 real cores (see run_scaling doc)
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "16"))


def _sf_from_dir(d: str) -> float:
    import re

    m = re.search(r"sf([0-9.]+)", d)
    return float(m.group(1)) if m else -1.0


def run_bench(sf_dir: str, cpus: int, reps: int = 3, spark=None) -> dict:
    """Headline queries, ``reps`` interleaved repetitions, per-query MEDIANS.

    This host's wall-clock variance between identical runs is documented at
    up to ±50% (BASELINE.md); a single-shot suite measures the hypervisor,
    not the engine (VERDICT r2: the recorded r2 artifact regressed while
    every at-scale measurement improved). Caches and tracked persists are
    dropped between reps so each rep does the full work.

    ``spark``: share a caller-owned session (the caller stops it). The
    default artifact run passes ONE session through every section —
    per-section stop/start cycling tears down the PySpark accumulator
    server socket while straggler task-completion events still deliver,
    which spams benign-but-ugly `DAGScheduler: Failed to update
    accumulator 0 (PythonAccumulatorV2) ... Broken pipe` stacks into the
    artifact tail (VERDICT r4 ask #3 — single-session runs log zero).
    """
    import __spark_entry__ as E
    from webdedup.joins import release_persisted
    from webdedup.pipeline import dedup
    from webdedup.session import get_spark

    own_session = spark is None
    if own_session:
        spark = get_spark(
            app_name=f"webdedup-bench-{cpus}",
            cores=cpus,
            shuffle_partitions=max(cpus, 16),
        )
    else:
        spark.conf.set("spark.sql.shuffle.partitions", str(max(cpus, 16)))
    spark.sparkContext.setLogLevel("ERROR")

    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    n_docs = docs.count()
    # JIT/codegen warmup: first pipeline run in a fresh JVM is ~1.7x slower
    dedup(docs.limit(2000), E.CFG, id_col="doc_id").clusters.count()
    spark.catalog.clearCache()
    release_persisted()

    def _dedup():
        res = dedup(
            spark.read.parquet(f"{sf_dir}/documents.parquet"), E.CFG, id_col="doc_id"
        )
        return res.clusters.count()

    suite = [
        # headline: full dedup pipeline (read → featurize → LSH → verify → CC)
        ("q_dedup_e2e", _dedup),
        ("q_lsh_candidates", lambda: E.q_lsh_candidate_pairs(spark, sf_dir).count()),
        ("q_ngram_jaccard", lambda: E.q_ngram_jaccard_pairs(spark, sf_dir).count()),
        # ANN headline = the IVF scale path (recall@5 >= 0.95 vs brute, gated
        # in tests/test_ann.py); the brute crossJoin stays oracle-only
        ("q_cosine_ann_ivf", lambda: E.q_cosine_ann_ivf(spark, sf_dir).count()),
        ("q_simhash", lambda: E.q_simhash_fingerprints(spark, sf_dir).count()),
        ("q_token_topk", lambda: E.q_token_topk(spark, sf_dir).count()),
    ]

    all_reps: list[dict[str, float]] = []
    for _ in range(max(1, reps)):
        timings: dict[str, float] = {}
        for name, fn in suite:
            t0 = time.perf_counter()
            fn()
            timings[name] = round(time.perf_counter() - t0, 3)
        all_reps.append(timings)
        spark.catalog.clearCache()
        release_persisted()

    def med(vals):
        v = sorted(vals)
        return v[len(v) // 2]

    medians = {
        name: med([r[name] for r in all_reps]) for name, _ in suite
    }
    total = round(sum(medians.values()), 3)
    dedup_sec = medians["q_dedup_e2e"]
    result = {
        "metric": "headline_queries_total",
        "value": total,
        "unit": "sec",
        "queries": medians,
        "reps": len(all_reps),
        "rep_timings": all_reps,
        "sf": _sf_from_dir(sf_dir),
        "cpus": cpus,
        "n_docs": n_docs,
        "dedup_pages_per_sec": round(n_docs / dedup_sec, 1) if dedup_sec else None,
    }
    if own_session:
        spark.stop()
    return result


BENCH_CORPUS = os.environ.get("WEBDEDUP_BENCH_CORPUS", "/tmp/webdedup_bench/pages_200k.parquet")
BENCH_ROWS = int(os.environ.get("WEBDEDUP_BENCH_ROWS", "200000"))
BENCH_CORPUS_1M = os.environ.get(
    "WEBDEDUP_BENCH_CORPUS_1M", "/tmp/webdedup_bench/pages_1m.parquet"
)
BENCH_ROWS_1M = int(os.environ.get("WEBDEDUP_BENCH_ROWS_1M", "1000000"))


def ensure_corpus(path: str = BENCH_CORPUS, n: int = BENCH_ROWS) -> str:
    """Deterministic synthetic bench corpus (FIXTURES.md planted-dup structure).

    Above 250k rows generation is CHUNKED (250k docs per chunk, per-chunk
    seed, per-chunk url namespace) so the pandas staging frame stays
    bounded; the planted dup structure is then chunk-local, which is the
    realistic shape anyway — at 1M+ pages duplicate mass is what matters,
    not cross-chunk truth pairs (the correctness gates run at test scale).
    """
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return path
    from webdedup.fixtures import generate_pages_fast
    from webdedup.session import get_spark

    chunk = 250_000
    spark = get_spark("webdedup-gen", cores=8)
    if n <= chunk:
        pdf, _ = generate_pages_fast(n, seed=42)
        spark.createDataFrame(pdf).repartition(32).write.mode("overwrite").parquet(path)
    else:
        # stage under a temp name, rename when complete: a crash mid-chunk
        # must not leave a partial corpus that passes the _SUCCESS check
        import shutil

        tmp = path + ".building"
        shutil.rmtree(tmp, ignore_errors=True)
        mode = "overwrite"
        for ci, off in enumerate(range(0, n, chunk)):
            pdf, _ = generate_pages_fast(min(chunk, n - off), seed=42 + ci)
            # disjoint url space per chunk (urls embed the row index)
            pdf["url"] = pdf["url"].str.replace("/page", f"/c{ci}p", regex=False)
            spark.createDataFrame(pdf).repartition(16).write.mode(mode).parquet(tmp)
            mode = "append"
        shutil.rmtree(path, ignore_errors=True)
        os.rename(tmp, path)
    spark.stop()
    return path


def run_dedup_pages(path: str, cpus: int) -> dict:
    """End-to-end dedup of the bench corpus at a given parallelism level."""
    import __spark_entry__ as E
    from webdedup.pipeline import dedup
    from webdedup.session import get_spark

    # 4 waves per stage: tail tasks of a skewed stage overlap instead of
    # serializing the last wave (16 partitions at 8 cores = 2 waves was
    # measurably worse load balance)
    spark = get_spark(f"webdedup-scale-{cpus}", cores=cpus, shuffle_partitions=max(4 * cpus, 16))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)
    n = pages.count()
    # JIT/codegen warmup pass on a slice, then the measured steady-state run
    # (both parallelism legs get the identical treatment)
    dedup(pages.limit(20000), E.CFG).clusters.count()
    spark.catalog.clearCache()
    t0 = time.perf_counter()
    res = dedup(pages, E.CFG)
    n_clusters = res.clusters.select("cluster_id").distinct().count()
    sec = round(time.perf_counter() - t0, 3)
    spark.stop()
    return {
        "cpus": cpus,
        "n_docs": n,
        "sec": sec,
        "pages_per_sec": round(n / sec, 1),
        "n_clusters": n_clusters,
    }


def run_corpus_bench(
    cpus: int = CPUS,
    reps: int = 3,
    path: str | None = None,
    with_kneighbors: bool = True,
    label: str = "200k",
    spark=None,
) -> dict:
    """Work-dominated corpus rows for the per-round artifact (VERDICT r3
    asks #7/#8): sf0.1's 5,000 docs are fixed-overhead-dominated, so
    regressions in the actual compute path only show at this scale.

    * ``dedup``: the end-to-end pipeline (read → featurize → LSH → verify →
      substring → CC), median of ``reps``.
    * ``kneighbors``: the API query face — fit + self-query kneighbors with
      fast=False (exact round-1 → 2-hop neighbor-of-neighbor expansion →
      round-2 re-rank; the 2-hop join is the plan at risk), median of
      ``reps``. Feature prep (distinct crc32 token ids) is JVM-side and
      included in the timing like the reference's own fit timings.

    Protocol (VERDICT r4 ask #2): ONE UNTIMED FULL-SCALE WARMUP PASS of
    every op before the timed reps — the r4 artifact's rep spread
    (87/70/43 s) showed JIT + page-cache warmup being timed, overstating
    the median ~1.5× vs steady state. The slice warmup alone is not
    enough: codegen for the full plans and the OS page cache of the
    parquet only warm at full scale.
    """
    import __spark_entry__ as E
    from pyspark.sql import functions as F

    from webdedup.api import MinHashNeighbors
    from webdedup import components
    from webdedup.joins import release_persisted
    from webdedup.pipeline import dedup
    from webdedup.session import get_spark

    path = path or ensure_corpus()
    own_session = spark is None
    if own_session:
        spark = get_spark(
            f"webdedup-{label}-{cpus}", cores=cpus,
            shuffle_partitions=max(2 * cpus, 16),
        )
    else:
        # shared-session artifact run (see run_bench docstring): only the
        # runtime-settable knob differs between sections
        spark.conf.set("spark.sql.shuffle.partitions", str(max(2 * cpus, 16)))
    spark.sparkContext.setLogLevel("ERROR")
    pages = spark.read.parquet(path)
    n = pages.count()

    feats = pages.select(
        F.xxhash64("url").alias("id"),
        F.array_distinct(F.transform(F.split("text", " "), F.crc32)).alias(
            "features"
        ),
    )

    def _dedup():
        dedup(spark.read.parquet(path), E.CFG).clusters.count()

    def _span():
        # boilerplate-span removal over the full corpus; the agg touches
        # n_removed AND clean_text so Catalyst cannot prune the rebuild
        from webdedup.textstats import span_dedup

        d = spark.read.parquet(path).select(
            F.xxhash64("url").alias("doc_id"), "text"
        )
        span_dedup(d).agg(
            F.sum("n_removed"), F.sum(F.length("clean_text"))
        ).collect()

    def _near_decon():
        # paraphrase decontamination at corpus scale: ~500-doc derived
        # benchmark (every 401st page, first token dropped) — the
        # eval-suite-sized broadcast side; cost should be ~one featurize
        # pass + a broadcast join, NEVER a corpus self-join
        from webdedup.scrub import near_decontaminate

        d = spark.read.parquet(path).select(
            F.xxhash64("url").alias("doc_id"), "text"
        )
        bench = d.where(F.pmod(F.col("doc_id"), F.lit(401)) == 0).select(
            (F.col("doc_id") + 1).alias("doc_id"),
            F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
        )
        near_decontaminate(d, bench, E.CFG).count()

    def _kneighbors():
        # max_bin_size=50 = the REFERENCE's own default: common-token argmin
        # buckets on web text are huge, and the reference semantics tombstone
        # them at query time; a generous cap (2000) inflates the collision
        # join ~40x and OOMs an 8 g driver at this scale
        nn = MinHashNeighbors(
            n_neighbors=3, number_of_hash_functions=32, max_bin_size=50,
            fast=False, metric="jaccard",
        ).fit(feats)
        nn.kneighbors().count()

    ops = [("dedup", _dedup), ("span_dedup", _span), ("near_decon", _near_decon)]
    if with_kneighbors:
        ops.insert(1, ("kneighbors", _kneighbors))

    # UNTIMED full-scale warmup pass (JIT/codegen for the real plans, OS
    # page cache of the parquet, shuffle-service paths) — r4's rep spread
    # proved the old slice-only warmup left the first timed rep ~2× slow
    for _, fn in ops:
        fn()
        spark.catalog.clearCache()
        release_persisted()

    timings: dict[str, list] = {name: [] for name, _ in ops}
    cc_rounds = None
    for _ in range(max(1, reps)):
        for name, fn in ops:
            t0 = time.perf_counter()
            fn()
            timings[name].append(round(time.perf_counter() - t0, 3))
            if name == "dedup":
                cc_rounds = components.LAST_STATS.get("rounds")
            spark.catalog.clearCache()
            release_persisted()

    def med(vals):
        v = sorted(vals)
        return v[len(v) // 2]

    ded = med(timings["dedup"])
    spn, ndc = med(timings["span_dedup"]), med(timings["near_decon"])
    if own_session:
        spark.stop()
    out = {
        "n_docs": n,
        "cpus": cpus,
        "reps": reps,
        "warmup": "one untimed full-scale pass per op",
        "dedup_sec": ded,
        "dedup_pages_per_sec": round(n / ded, 1),
        "span_dedup_sec": spn,
        "span_dedup_pages_per_sec": round(n / spn, 1),
        "near_decon_sec": ndc,
        "near_decon_pages_per_sec": round(n / ndc, 1),
        "cc_rounds": cc_rounds,
        "cc_sym_edges": components.LAST_STATS.get("n_sym_edges"),
        "rep_timings": timings,
    }
    if with_kneighbors:
        knn = med(timings["kneighbors"])
        out.update(
            kneighbors_sec=knn,
            kneighbors_docs_per_sec=round(n / knn, 1),
            kneighbors_vs_dedup=round(knn / ded, 2),
        )
    return out


def run_scaling(n_low: int = 2, n_high: int = 8, reps: int = 3) -> dict:
    """Same dedup job, same input, at two parallelism levels (the sandbox
    stand-in for N vs 4N executors) → throughput scaling efficiency.

    Protocol (every variant below was measured; BASELINE.md round 3):

    - **cpus = Spark task slots, unpinned** — the standalone/YARN executor
      semantics: `spark.executor.cores` bounds concurrent TASKS, while JVM
      GC/netty/AQE threads and Python UDF workers run beside them on the
      node. Measured overflow is the same ~1.25× of slots on BOTH legs
      (during Arrow stages: cpus Python workers + a light JVM feeder), so
      the ratio is apples-to-apples. The strict-cgroup alternative
      (taskset-pinned legs) was measured too and is reported as a
      sensitivity row — on THIS host it mainly measures the single memory
      controller: pinned legs inherit the machine's DRAM ceiling (a pure
      numpy streaming probe scales at only 0.56 efficiency from 2→8
      concurrent processes on this VM), which a multi-NODE cluster — the
      thing the north rule actually compares — does not share, since each
      node brings its own memory system.
    - **heap fixed at 8 g for both legs**: measured U-shape — 4 g and 16 g
      are both SLOWER than 8 g for the identical job (16 g: 107 s vs 78 s
      at 8 cores; 48 g: 2.3× slower) — so each leg gets the empirically
      optimal heap rather than a formula that handicaps one side.
    - interleaved legs (L,H,L,H,...), per-leg medians: wall-clock variance
      between identical runs on this host reaches ±50%.
    """
    path = ensure_corpus()
    runs: dict = {n_low: [], n_high: []}
    # interleave legs (L,H,L,H,...) and take medians: this host's wall-clock
    # variance between identical runs is large, so single-shot legs lie
    for _ in range(reps):
        for cpus in (n_low, n_high):
            env = dict(os.environ, SPARK_GRAFT_CPUS=str(cpus),
                       WEBDEDUP_DRIVER_MEM=os.environ.get("WEBDEDUP_DRIVER_MEM", "8g"))
            p = subprocess.run(
                [sys.executable, __file__, "--dedup-pages", path],
                env=env, capture_output=True, text=True, timeout=3600,
            )
            lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
            if not lines:
                raise RuntimeError(f"scaling run cpus={cpus} failed:\n{p.stdout}\n{p.stderr[-2000:]}")
            runs[cpus].append(json.loads(lines[-1]))

    def med(vals):
        v = sorted(vals)
        return v[len(v) // 2]

    sec_low = med([r["sec"] for r in runs[n_low]])
    sec_high = med([r["sec"] for r in runs[n_high]])
    n_docs = runs[n_low][0]["n_docs"]
    thr_low = round(n_docs / sec_low, 1)
    thr_high = round(n_docs / sec_high, 1)
    eff = thr_high / (thr_low * (n_high / n_low))
    # co-measured host envelope: the ratio only means something relative to
    # what the box's shared memory system supports IN THE SAME TIME WINDOW
    # (neighbor load moves it by 2-3x across hours on this VM)
    envelope = run_host_envelope(n_low, n_high, reps=max(1, reps - 1))
    return {
        "host_envelope": envelope,
        "engine_vs_envelope": (
            round(eff / envelope["value"], 2) if envelope["value"] else None
        ),
        "metric": "dedup_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_docs": n_docs,
        "n_low": n_low,
        "n_high": n_high,
        "reps": reps,
        "protocol": "cpus = executor task slots (unpinned, standalone/YARN "
                    "semantics), heap 8g both legs (measured optimum), "
                    "interleaved legs, per-leg medians; pinned + per-core-"
                    "heap sensitivity variants in BASELINE.md round 3",
        "pages_per_sec_low": thr_low,
        "pages_per_sec_high": thr_high,
        "sec_low": sec_low,
        "sec_high": sec_high,
        "sec_low_all": [r["sec"] for r in runs[n_low]],
        "sec_high_all": [r["sec"] for r in runs[n_high]],
    }


def run_featurize_scaling(n_low: int = 2, n_high: int = 8, reps: int = 3) -> dict:
    """Featurize-stage-only scaling at the same two parallelism levels.

    The featurize UDF (tokenize → shingle → MinHash → SimHash → winnowed
    fingerprints, per-doc cache-resident numpy kernels) is the pipeline's
    dominant core-time consumer and is CPU-bound, not DRAM-streaming-bound
    — so its scaling isolates the ENGINE's parallelism from the host's
    shared-memory-controller ceiling that caps the end-to-end ratio (see
    run_host_envelope). Runs in-process with one session per leg.
    """
    import subprocess as sp

    path = ensure_corpus()
    script = (
        "import json, sys, time\n"
        "sys.path.insert(0, '/root/repo')\n"
        "import __spark_entry__ as E\n"
        "from webdedup.session import get_spark\n"
        "from webdedup.signatures import featurize\n"
        "cpus = int(sys.argv[1])\n"
        "spark = get_spark(f'feat-{cpus}', cores=cpus,\n"
        "                  shuffle_partitions=max(4 * cpus, 16))\n"
        "spark.sparkContext.setLogLevel('ERROR')\n"
        f"docs = spark.read.parquet('{path}').selectExpr(\n"
        "    'xxhash64(url) as doc_id', 'text')\n"
        "featurize(docs.limit(20000), E.CFG, with_substring_fps=True)"
        ".selectExpr('sum(n_shingles)').collect()\n"
        "t0 = time.perf_counter()\n"
        "featurize(docs, E.CFG, with_substring_fps=True)"
        ".selectExpr('sum(n_shingles)').collect()\n"
        "print(json.dumps({'sec': round(time.perf_counter() - t0, 2)}))\n"
    )

    def leg(cpus: int) -> list:
        env = dict(os.environ, WEBDEDUP_DRIVER_MEM="8g")
        p = sp.run([sys.executable, "-c", script, str(cpus)],
                   env=env, capture_output=True, text=True, timeout=1800)
        lines = [l for l in p.stdout.strip().splitlines() if l.startswith("{")]
        return json.loads(lines[-1])["sec"]

    runs: dict = {n_low: [], n_high: []}
    for _ in range(reps):
        for cpus in (n_low, n_high):
            runs[cpus].append(leg(cpus))

    def med(vals):
        v = sorted(vals)
        return v[len(v) // 2]

    s_low, s_high = med(runs[n_low]), med(runs[n_high])
    eff = (1.0 / s_high) / ((1.0 / s_low) * (n_high / n_low))
    return {
        "metric": "featurize_stage_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_low": n_low,
        "n_high": n_high,
        "reps": reps,
        "sec_low": s_low,
        "sec_high": s_high,
        "sec_low_all": runs[n_low],
        "sec_high_all": runs[n_high],
    }


def run_host_envelope(n_low: int = 2, n_high: int = 8, reps: int = 3) -> dict:
    """Pure-numpy DRAM-streaming scaling probe at the same two concurrency
    levels as run_scaling — the HOST's own ceiling for any bandwidth-
    touching workload, engine-independent.

    Each worker streams a 480 MB array (multiply + reduce, no Python-loop
    overhead, no Spark). On hardware whose memory bandwidth scales with
    cluster size (any multi-node cluster — each node brings its own memory
    controllers) this probe would be ~1.0; on this single-box sandbox the
    shared controller caps it, and the dedup job cannot scale past the
    envelope it sets.
    """
    probe_src = (
        "import numpy as np, time\n"
        "a = np.random.default_rng(1).random(60_000_000)\n"
        "t0 = time.perf_counter()\n"
        "for _ in range(6):\n"
        "    s = float((a * 1.0001).sum())\n"
        "print(time.perf_counter() - t0)\n"
    )

    def leg(n: int) -> float:
        per_rep = []
        for _ in range(reps):
            procs = [
                subprocess.Popen([sys.executable, "-c", probe_src],
                                 stdout=subprocess.PIPE, text=True)
                for _ in range(n)
            ]
            times = [float(p.communicate()[0]) for p in procs]
            per_rep.append(sum(times) / len(times))
        per_rep.sort()
        return per_rep[len(per_rep) // 2]

    t_low, t_high = leg(n_low), leg(n_high)
    # per-process work is constant → aggregate throughput ∝ n / t
    eff = (n_high / t_high) / ((n_low / t_low) * (n_high / n_low))
    return {
        "metric": "host_dram_streaming_scaling_efficiency",
        "value": round(eff, 3),
        "unit": "ratio",
        "n_low": n_low,
        "n_high": n_high,
        "reps": reps,
        "sec_per_proc_low": round(t_low, 2),
        "sec_per_proc_high": round(t_high, 2),
    }


if __name__ == "__main__":
    if "--scaling" in sys.argv:
        # legs overridable for extra measurement windows, e.g. 3->12 (the
        # largest 4x pair whose ~1.25x slot-overflow still fits the host's
        # 16 real cores): WEBDEDUP_SCALING_LOW=3 WEBDEDUP_SCALING_HIGH=12
        print(json.dumps(run_scaling(
            n_low=int(os.environ.get("WEBDEDUP_SCALING_LOW", "2")),
            n_high=int(os.environ.get("WEBDEDUP_SCALING_HIGH", "8")),
            reps=int(os.environ.get("WEBDEDUP_SCALING_REPS", "3")),
        )))
    elif "--host-envelope" in sys.argv:
        print(json.dumps(run_host_envelope()))
    elif "--featurize-scaling" in sys.argv:
        print(json.dumps(run_featurize_scaling()))
    elif "--corpus-bench" in sys.argv:
        print(json.dumps(run_corpus_bench(CPUS)))
    elif "--corpus-1m" in sys.argv:
        print(json.dumps(run_corpus_bench(
            CPUS,
            reps=int(os.environ.get("WEBDEDUP_BENCH_1M_REPS", "2")),
            path=ensure_corpus(BENCH_CORPUS_1M, BENCH_ROWS_1M),
            with_kneighbors=False, label="1m",
        )))
    elif "--dedup-pages" in sys.argv:
        path = sys.argv[sys.argv.index("--dedup-pages") + 1]
        print(json.dumps(run_dedup_pages(path, CPUS)))
    elif "--headline" in sys.argv:
        print(json.dumps(run_bench(SF_DIR, CPUS)))
    else:
        # Artifact run: EACH SECTION IS ITS OWN SUBPROCESS (one Spark
        # session per JVM). Two failure modes forced this shape, both
        # measured (BASELINE.md r5):
        # * per-section stop/start cycling INSIDE one process races
        #   straggler task completions against the Python accumulator
        #   server teardown — thousands of benign PythonAccumulatorV2 /
        #   Broken pipe stacks in the artifact tail (VERDICT r4 ask #3);
        # * ONE session across all sections accumulates localCheckpoint
        #   blocks from every CC loop (clearCache does not free them) and
        #   the 1M section then OOMs an 8g heap that runs it fine fresh.
        # Child stdout can also carry JVM GC warnings — the parent keeps
        # only the last JSON line, so the artifact line stays clean.
        def _section(argv_extra: list, timeout: int = 3600,
                     env_extra: dict | None = None) -> dict:
            env = dict(os.environ, **(env_extra or {}))
            p = subprocess.run(
                [sys.executable, __file__, *argv_extra],
                env=env, capture_output=True, text=True, timeout=timeout,
            )
            lines = [l for l in p.stdout.splitlines() if l.startswith("{")]
            if p.returncode != 0 or not lines:
                # root cause first (the tail is usually mid-stack), then tail
                err = p.stderr or ""
                roots = [l for l in err.splitlines()
                         if "ERROR" in l or "Error" in l or "Exception" in l]
                raise RuntimeError(
                    f"section {argv_extra} rc={p.returncode}: "
                    + " | ".join(roots[:3])[:600] + " ... " + err[-400:]
                )
            return json.loads(lines[-1])

        want_200k = os.environ.get("WEBDEDUP_BENCH_200K", "1") != "0"
        want_1m = os.environ.get("WEBDEDUP_BENCH_1M", "1") != "0"
        # generate any missing corpus up front (own short-lived session)
        if want_200k:
            ensure_corpus()
        if want_1m:
            ensure_corpus(BENCH_CORPUS_1M, BENCH_ROWS_1M)
        out = _section(["--headline"])
        # work-dominated scale rows (200k pages) in the same artifact;
        # WEBDEDUP_BENCH_200K=0 skips for a quick sf-only loop. Fail-soft:
        # the headline JSON line must survive a section failure.
        if want_200k:
            try:
                out["corpus_200k"] = _section(["--corpus-bench"])
            except Exception as e:  # noqa: BLE001
                out["corpus_200k"] = {"error": str(e)[:500]}
        # 1M-page scale row (VERDICT r4 ask #1): dedup + span_dedup +
        # near_decon at 5× the 200k corpus — the superlinearity probe
        # (per-op walls vs linear from 200k, CC round count). Warmed
        # medians like the 200k section. WEBDEDUP_BENCH_1M=0 skips.
        if want_1m:
            try:
                # 12g heap for the 1M child: 8g is borderline at this scale
                # (the dedup count OOM'd once in-artifact while passing
                # standalone) — the 8g-optimum measurement was at 200k
                out["corpus_1m"] = _section(
                    ["--corpus-1m"],
                    env_extra={"WEBDEDUP_DRIVER_MEM": os.environ.get(
                        "WEBDEDUP_DRIVER_MEM", "12g")},
                )
                c2, c1 = out.get("corpus_200k", {}), out["corpus_1m"]
                if "dedup_sec" in c2 and "dedup_sec" in c1:
                    scale = c1["n_docs"] / c2["n_docs"]
                    c1["vs_linear_from_200k"] = {
                        op: round(c1[f"{op}_sec"] / (c2[f"{op}_sec"] * scale), 3)
                        for op in ("dedup", "span_dedup", "near_decon")
                    }
            except Exception as e:  # noqa: BLE001
                out["corpus_1m"] = {"error": str(e)[:500]}
        print(json.dumps(out))
