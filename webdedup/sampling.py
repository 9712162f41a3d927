"""Deterministic corpus sampling — the rebalancing pass of a training-data
pipeline (per-language / per-source quotas over a 100-TB crawl).

Web-scale corpora are heavily skewed toward a few languages and sources;
training runs want a *reproducible* downsample at per-stratum rates (e.g.
keep 50% of English, 12.5% of French, 10% of everything else). Coin-flip
sampling (``df.sample``) is neither reproducible across runs nor stable
under repartitioning; this module keys the decision on a hash of the
document id, so the same document gets the same verdict in every run, on
every cluster layout, and in incremental reprocessing.

100-TB shape: the sample decision is ``xxhash64(doc_id) % 1e6 < rate`` —
one built-in JVM hash plus a comparison, fully inside whole-stage codegen,
ZERO shuffles and zero Python. The per-stratum rate lookup is a map
literal (a few entries), not a join. Filter pushes down to the scan.

The driver oracle recomputes Spark's ``xxhash64`` of the 8-byte
little-endian long (seed 42) in DuckDB HUGEINT arithmetic — see
``__spark_entry__._xxh64_sql_stages`` — so the sample decision is
value-checked bit-exactly, the same technique as the wang32/splitmix64
oracles.

Reference scope note: the reference engine (minHashNearestNeighbors) has
no sampling surface; this is part of the training-data-pipeline extension
mandated by the build brief.
"""

from __future__ import annotations

from itertools import chain

from pyspark.sql import Column, DataFrame, functions as F

PPM = 1_000_000


def sample_bucket(id_col: str | Column = "doc_id") -> Column:
    """Deterministic bucket in [0, 1e6): ``pmod(xxhash64(id), 1e6)``.

    ``xxhash64`` is Spark's built-in XXH64 (seed 42) over the column's
    8-byte representation — stable across Spark versions, partitionings,
    and runs.
    """
    col = F.col(id_col) if isinstance(id_col, str) else id_col
    return F.pmod(F.xxhash64(col), F.lit(PPM)).alias("sample_bucket")


def deterministic_sample(
    docs: DataFrame, rate_ppm: int, id_col: str = "doc_id"
) -> DataFrame:
    """Keep a deterministic ``rate_ppm``/1e6 fraction of ``docs``.

    Same id ⇒ same verdict, independent of partitioning and run count;
    sample sets at two rates are NESTED (rate 250k ⊂ rate 500k), which
    makes ablation subsets consistent.
    """
    if not 0 <= rate_ppm <= PPM:
        raise ValueError(f"rate_ppm must be in [0, {PPM}], got {rate_ppm}")
    return docs.where(sample_bucket(id_col) < rate_ppm)


def stratified_sample(
    docs: DataFrame,
    rates_ppm: dict[str, int],
    strata_col: str = "lang",
    default_ppm: int = 0,
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-stratum deterministic sampling: keep rows whose hash bucket
    falls under their stratum's rate (ppm); strata absent from
    ``rates_ppm`` use ``default_ppm``.

    The rate lookup is a literal MAP expression — constant-folded by
    Catalyst, never a join — so the whole operator is a single codegen'd
    filter over the scan.
    """
    for k, v in rates_ppm.items():
        if not 0 <= v <= PPM:
            raise ValueError(f"rate for stratum {k!r} must be in [0, {PPM}], got {v}")
    if not 0 <= default_ppm <= PPM:
        raise ValueError(f"default_ppm must be in [0, {PPM}], got {default_ppm}")
    if rates_ppm:
        rate_map = F.create_map(
            *chain.from_iterable((F.lit(k), F.lit(v)) for k, v in rates_ppm.items())
        )
        rate = F.coalesce(
            F.element_at(rate_map, F.col(strata_col)), F.lit(default_ppm)
        )
    else:
        rate = F.lit(default_ppm)
    return docs.where(sample_bucket(id_col) < rate)


def pack_sequences(
    docs: DataFrame,
    budget_tokens: int = 2048,
    n_shards: int = 1024,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_tokens_col: str | None = None,
) -> DataFrame:
    """GPT-style sequence-packing index: (doc_id, shard, n_tokens,
    start_offset, pack_id, straddles).

    Training batch assembly concatenates documents and slices the token
    stream into fixed ``budget_tokens`` windows; a document starts at its
    shard-local ``start_offset`` and belongs to ``pack_id =
    start_offset // budget`` (it ``straddles`` when it crosses the next
    window boundary — the concat-and-chunk semantics real LM training
    uses, not per-doc bin packing). The assignment is fully deterministic:
    shard = ``pmod(xxhash64(doc_id), n_shards)``, order within a shard is
    by doc_id.

    100-TB shape: ONE shuffle (by shard) and a per-shard window running
    sum. ``n_shards`` bounds the sort: at 10^12 docs, 2^20 shards keep
    each window partition at ~10^6 rows. No global ordering is ever
    imposed — shards are independent streams, which is also what keeps
    the layout stable under corpus growth (new docs perturb only their
    own shard).
    """
    if budget_tokens <= 0:
        raise ValueError(f"budget_tokens must be positive, got {budget_tokens}")
    if n_shards <= 0:
        raise ValueError(f"n_shards must be positive, got {n_shards}")
    from pyspark.sql import Window

    # token face = textstats.token_counts' n_ws_tokens (maximal \S+ runs):
    # packing offsets must be sized with the SAME count as the budget
    # surface they fill — a bare split-on-space counts empty strings from
    # leading/trailing/consecutive whitespace and drifts on irregular
    # corpora (ADVICE r4). ``n_tokens_col`` overrides with a precomputed
    # count column (e.g. textstats.token_counts_bpe REAL BPE counts joined
    # onto the docs) so packing fills a real tokenizer budget.
    from webdedup.textstats import WS_TOKEN_RE

    if n_tokens_col is not None:
        n_tok = F.col(n_tokens_col).cast("long")
    else:
        n_tok = F.size(
            F.regexp_extract_all(F.col(text_col), F.lit(WS_TOKEN_RE), F.lit(0))
        ).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.pmod(F.xxhash64(id_col), F.lit(n_shards)).alias("shard"),
        n_tok.alias("n_tokens"),
    )
    w = (
        Window.partitionBy("shard")
        .orderBy("doc_id")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    start = F.coalesce(F.sum("n_tokens").over(w), F.lit(0))
    return base.select(
        "doc_id",
        "shard",
        "n_tokens",
        start.alias("start_offset"),
        F.floor(start / budget_tokens).cast("long").alias("pack_id"),
        (
            F.floor(start / budget_tokens)
            != F.floor((start + F.col("n_tokens") - 1) / budget_tokens)
        ).alias("straddles"),
    )
