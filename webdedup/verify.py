"""Exact-verify stage: Jaccard over shingle sets for candidate pairs.

The Spark counterpart of the reference's exact refinement round
(NearestNeighbors::kneighbors fast=False, nearestNeighbors.cpp:122-190) with
Jaccard in place of Euclidean/cosine (the dedup metric; cosine/euclidean
variants live in webdedup.api).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType

from webdedup.joins import semi_join_ids, track_persist


@pandas_udf(DoubleType())
def jaccard_udf(a: pd.Series, b: pd.Series) -> pd.Series:
    """Exact Jaccard over packed-uint32 shingle blobs (sorted unique).

    Per-pair ``np.intersect1d`` on purpose — measured against a fully
    vectorized whole-batch kernel (concat both sides keyed pair_id<<32|value,
    one stable sort, adjacent-duplicate bincount) and a per-pair
    ``searchsorted`` variant under 1-32 concurrent worker processes
    (BASELINE.md round 3): the loop wins at every concurrency level and the
    gap WIDENS with workers (1740k vs 206k pairs/s at 32 workers). The batch
    kernel streams ~MBs of temporaries per batch through DRAM while the
    per-pair arrays stay L1/L2-resident — same bandwidth argument as
    kernels.py substring_fingerprints_batch.
    """
    import numpy as np

    out = np.empty(len(a), dtype=np.float64)
    for i in range(len(a)):
        x = np.frombuffer(a.iloc[i] or b"", dtype="<u4")
        y = np.frombuffer(b.iloc[i] or b"", dtype="<u4")
        if x.size == 0 and y.size == 0:
            out[i] = 1.0
            continue
        inter = np.intersect1d(x, y, assume_unique=True).size
        union = x.size + y.size - inter
        out[i] = inter / union if union else 1.0
    return pd.Series(out)


def attach_shingles(
    pairs: DataFrame, feat: DataFrame, max_broadcast_ids: int = 2_000_000,
    known_max: int | None = None,
) -> DataFrame:
    """Join (a, b) pairs to both sides' shingle arrays."""
    # narrow feat to ids that appear in a pair first (size-gated broadcast
    # semi-join, webdedup.joins): the two wide shingle-blob joins then
    # shuffle only candidate rows, not the whole corpus; above the limit the
    # semi-join degrades to a shuffle instead of OOMing on a forced hint
    pairs = track_persist(pairs)
    pair_ids = (
        pairs.select(F.col("a").alias("doc_id"))
        .union(pairs.select(F.col("b").alias("doc_id")))
        .distinct()
    )
    sh = semi_join_ids(
        feat.select(F.col("doc_id"), F.col("shingles"), F.col("n_shingles")),
        pair_ids,
        "doc_id",
        max_broadcast_ids,
        known_max=known_max,
    )
    return (
        pairs.join(
            sh.select(
                F.col("doc_id").alias("a"),
                F.col("shingles").alias("sh_a"),
                F.col("n_shingles").alias("n_a"),
            ),
            "a",
        ).join(
            sh.select(
                F.col("doc_id").alias("b"),
                F.col("shingles").alias("sh_b"),
                F.col("n_shingles").alias("n_b"),
            ),
            "b",
        )
    )


def exact_jaccard_gate(pairs_with_shingles: DataFrame, threshold: float) -> DataFrame:
    """The exact-verify tail shared by the dedup pipeline and bipartite
    decontamination: require non-empty shingle sets on both sides, apply
    the cheap JVM size-ratio prefilter (J(A,B) <= min(|A|,|B|)/max(|A|,|B|),
    so pairs whose sizes already rule out the threshold never reach the
    Python kernel — the analogue of the reference's precomputed dot
    products, sparseMatrix.h:60-123), then the exact Jaccard kernel and
    the threshold cut. Input needs columns sh_a/sh_b/n_a/n_b; output
    keeps all input columns plus ``jaccard``.
    """
    size_bound = F.least("n_a", "n_b") / F.greatest("n_a", "n_b")
    return (
        pairs_with_shingles.where((F.col("n_a") > 0) & (F.col("n_b") > 0))
        .where(size_bound >= F.lit(threshold))
        .withColumn("jaccard", jaccard_udf("sh_a", "sh_b"))
        .where(F.col("jaccard") >= F.lit(threshold))
    )


def verified_pairs(
    pairs: DataFrame, feat: DataFrame, threshold: float,
    max_broadcast_ids: int = 2_000_000,
    known_max: int | None = None,
) -> DataFrame:
    """(a, b, jaccard) for candidate pairs passing the exact-Jaccard gate."""
    w = attach_shingles(pairs, feat, max_broadcast_ids, known_max=known_max)
    return exact_jaccard_gate(w, threshold).select("a", "b", "jaccard")


# printable-ASCII projection shared verbatim with the DuckDB oracle:
# DuckDB's levenshtein() counts BYTES while Spark's counts CODEPOINTS, so
# the value-checked face compares ASCII projections (byte == codepoint
# there); the engine API below still accepts full Unicode.
ASCII_PROJECT_RE = r"[^\x09\x0A\x0D\x20-\x7E]"


def levenshtein_verify(
    docs: DataFrame,
    pairs: DataFrame,
    prefix_len: int = 256,
    text_col: str = "text",
    id_col: str = "doc_id",
    ascii_only: bool = False,
) -> DataFrame:
    """Edit-distance verification for candidate pairs: (a, b, edit_dist,
    edit_ppm) where ``edit_ppm`` is the distance normalized by the longer
    compared prefix (0 = identical, 1e6 = nothing shared).

    Near-dup candidates from shingle/banding stages are *set*-similar;
    edit distance adds an ORDER-sensitive second opinion that separates
    true revisions (small dist) from bag-of-words coincidences. Cost is
    O(prefix_len^2) per pair — ``prefix_len`` caps it, and the operator
    runs on the (tiny) candidate set, never the corpus.

    100-TB shape: two narrow hash joins to fetch the prefixes (built-in
    ``left()`` keeps only ``prefix_len`` chars per side before the join
    output), then a codegen'd JVM ``levenshtein`` — no Python, no extra
    shuffle beyond the candidate join itself.

    ``ascii_only=True`` projects to printable ASCII first — the mode the
    driver oracle checks (see ``ASCII_PROJECT_RE``).
    """
    t = F.col(text_col)
    if ascii_only:
        t = F.regexp_replace(t, ASCII_PROJECT_RE, "")
    prefixes = docs.select(
        F.col(id_col).alias("_pid"), F.left(t, F.lit(prefix_len)).alias("_ptxt")
    )
    dist = F.levenshtein(F.col("_ta"), F.col("_tb"))
    longer = F.greatest(F.length("_ta"), F.length("_tb"), F.lit(1))
    return (
        pairs.select("a", "b")
        .join(prefixes.withColumnsRenamed({"_pid": "a", "_ptxt": "_ta"}), "a")
        .join(prefixes.withColumnsRenamed({"_pid": "b", "_ptxt": "_tb"}), "b")
        .select(
            "a",
            "b",
            dist.cast("long").alias("edit_dist"),
            F.floor(F.lit(1_000_000.0) * dist / longer)
            .cast("long")
            .alias("edit_ppm"),
        )
    )
