"""LSH banding, salted bucket counting, hot-bucket kill, candidate pairs.

Spark re-expression of the reference's inverse index build + collision query
(InverseIndex::fit, inverseIndex.cpp:430-499; InverseIndex::kneighbors
collision counting, inverseIndex.cpp:530-561). The bucket table is never
materialized as a map — it IS the shuffle: posexplode(bands) → groupBy/join
on (band, band_hash).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, functions as F

from webdedup.config import DedupConfig


def explode_bands(feat: DataFrame) -> DataFrame:
    """(doc_id, bands) → (doc_id, band, band_hash) — the LSH bucket rows."""
    return feat.select(
        "doc_id", F.posexplode("bands").alias("band", "band_hash")
    )


def bucket_sizes_salted(bucket_rows: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Per-(band, band_hash) member count via explicit two-phase salted agg.

    North-rule requirement: hot buckets (boilerplate shingles shared by ~30%
    of the web) concentrate a single (band, hash) key onto one reducer; the
    salt spreads the partial counts over cfg.salt_buckets reducers before the
    tiny final combine. (Spark's map-side partial aggregation usually covers
    this; the explicit salt also defends against the many-distinct-keys-per-
    mapper case where partial agg degrades.)
    """
    s = cfg.salt_buckets
    return (
        bucket_rows.withColumn("_salt", F.pmod(F.col("doc_id"), F.lit(s)))
        .groupBy("band", "band_hash", "_salt")
        .agg(F.count("*").alias("_c"))
        .groupBy("band", "band_hash")
        .agg(F.sum("_c").alias("bucket_size"))
    )


def surviving_buckets(bucket_rows: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Bucket rows with hot buckets killed.

    Reference parity: a bucket reaching max_bin_size is dropped ENTIRELY
    (tombstone semantics, inverseIndexStorageUnorderedMap.cpp:70-81) — filter
    on the full count, never a limit/truncate. The hot list is tiny by
    construction ⇒ broadcast anti-join (no second shuffle of the exploded
    band table). Size-1 buckets need no explicit prune: they produce no
    self-join matches (the reference's prune(), :162-187, falls out free).
    """
    hot = (
        bucket_sizes_salted(bucket_rows, cfg)
        .where(F.col("bucket_size") >= F.lit(cfg.max_bin_size))
        .select("band", "band_hash")
    )
    return bucket_rows.join(F.broadcast(hot), ["band", "band_hash"], "left_anti")


def candidate_pairs(feat: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (a, b) candidate doc-id pairs from MinHash LSH bands.

    The equi-self-join on (band, band_hash) is the reference's collision
    lookup (inverseIndex.cpp:530-561) done set-at-a-time; a < b ordering
    halves the join output and dropDuplicates collapses multi-band
    collisions before the (expensive) verify stage.
    """
    rows = explode_bands(feat)
    ok = surviving_buckets(rows, cfg).select("band", "band_hash", "doc_id")
    ok = ok.repartition(cfg.target_partitions, "band", "band_hash")
    left = ok.alias("l")
    right = ok.alias("r")
    pairs = (
        left.join(
            right,
            (F.col("l.band") == F.col("r.band"))
            & (F.col("l.band_hash") == F.col("r.band_hash"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
    return pairs


def simhash_candidate_pairs(feat: DataFrame, cfg: DedupConfig) -> DataFrame:
    """Distinct (a, b) pairs with SimHash hamming distance <= threshold.

    Standard block-permutation scheme: split the 64-bit fingerprint into
    t+1 = 4 blocks of 16 bits; any pair within hamming distance t shares at
    least one exact block (pigeonhole). Join per block, then exact
    bit_count(xor) filter JVM-side (no Python in the hot path).
    """
    t = cfg.simhash_hamming_threshold
    nblocks = t + 1
    width = 64 // nblocks
    mask = (1 << width) - 1
    blocks = F.array(
        *[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), i * width).bitwiseAND(F.lit(mask)).alias("val"),
            )
            for i in range(nblocks)
        ]
    )
    rows = feat.select("doc_id", "simhash").withColumn(
        "_b", F.explode(blocks)
    ).select("doc_id", "simhash", F.col("_b.blk").alias("blk"), F.col("_b.val").alias("val"))
    # same hot-bucket tombstone as the MinHash bands: an overfull 16-bit
    # block value (degenerate fingerprint region) would quadratically blow
    # up the self-join
    hot = (
        rows.groupBy("blk", "val")
        .agg(F.count("*").alias("c"))
        .where(F.col("c") >= F.lit(cfg.max_bin_size))
        .select("blk", "val")
    )
    rows = rows.join(F.broadcast(hot), ["blk", "val"], "left_anti")
    l, r = rows.alias("l"), rows.alias("r")
    return (
        l.join(
            r,
            (F.col("l.blk") == F.col("r.blk"))
            & (F.col("l.val") == F.col("r.val"))
            & (F.col("l.doc_id") < F.col("r.doc_id")),
        )
        .where(
            F.bit_count(F.col("l.simhash").bitwiseXOR(F.col("r.simhash"))) <= F.lit(t)
        )
        .select(F.col("l.doc_id").alias("a"), F.col("r.doc_id").alias("b"))
        .dropDuplicates(["a", "b"])
    )
