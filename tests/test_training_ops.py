"""Unit behavior of the round-4 training-pipeline additions: deterministic
sampling, per-source spam stats, Levenshtein candidate verification.
(Value parity vs DuckDB is covered by test_oracle_parity's auto-params.)
"""

import pytest
from pyspark.sql import functions as F

from webdedup.sampling import PPM, deterministic_sample, stratified_sample
from webdedup.textstats import source_stats
from webdedup.verify import levenshtein_verify


def _ids(spark, n=20_000):
    return spark.range(n).withColumnRenamed("id", "doc_id")


def test_deterministic_sample_is_reproducible_and_nested(spark):
    docs = _ids(spark)
    a = {r.doc_id for r in deterministic_sample(docs, 250_000).collect()}
    b = {r.doc_id for r in deterministic_sample(docs, 250_000).collect()}
    assert a == b  # same verdicts on every run
    wider = {r.doc_id for r in deterministic_sample(docs, 500_000).collect()}
    assert a <= wider  # rate-250k sample nests inside rate-500k
    # rate accuracy: binomial(20k, .25) stays within 5 sigma of the mean
    assert abs(len(a) - 5_000) < 350
    assert abs(len(wider) - 10_000) < 400


def test_deterministic_sample_partitioning_invariant(spark):
    docs = _ids(spark, 5_000)
    one = {r.doc_id for r in deterministic_sample(docs.coalesce(1), 300_000).collect()}
    many = {
        r.doc_id for r in deterministic_sample(docs.repartition(17), 300_000).collect()
    }
    assert one == many


def test_stratified_sample_rates_per_stratum(spark):
    docs = _ids(spark).withColumn(
        "lang",
        F.when(F.col("doc_id") % 3 == 0, "en")
        .when(F.col("doc_id") % 3 == 1, "de")
        .otherwise("zz"),
    )
    kept = stratified_sample(
        docs, {"en": 600_000, "de": 150_000}, default_ppm=50_000
    )
    counts = {r["lang"]: r["n"] for r in kept.groupBy("lang").agg(F.count("*").alias("n")).collect()}
    # ~6667 docs per stratum; expected keeps 4000 / 1000 / 333
    assert abs(counts["en"] - 4000) < 300
    assert abs(counts["de"] - 1000) < 200
    assert abs(counts.get("zz", 0) - 333) < 120


def test_stratified_sample_plan_has_no_exchange(spark):
    docs = _ids(spark, 100).withColumn("lang", F.lit("en"))
    df = stratified_sample(docs, {"en": 500_000})
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # a single codegen'd filter, zero shuffles


def test_sampling_rate_validation(spark):
    docs = _ids(spark, 10)
    with pytest.raises(ValueError):
        deterministic_sample(docs, PPM + 1)
    with pytest.raises(ValueError):
        stratified_sample(docs, {"en": -5})
    with pytest.raises(ValueError):
        stratified_sample(docs, {}, default_ppm=2 * PPM)


def test_source_stats_flags_spam_source(spark):
    docs = spark.createDataFrame(
        [
            (0, "mirror farm page", "spam.example"),
            (1, "mirror farm page", "spam.example"),
            (2, "mirror farm page", "spam.example"),
            (3, "one more copy and a unique one", "spam.example"),
            (4, "fresh article about spark plans", "good.example"),
            (5, "another distinct piece of writing", "good.example"),
        ],
        "doc_id long, text string, source string",
    )
    rows = {r.source: r for r in source_stats(docs).collect()}
    spam, good = rows["spam.example"], rows["good.example"]
    assert spam.n_docs == 4 and spam.n_unique == 2
    assert spam.dup_rate_ppm == 500_000 and spam.is_spam_source
    assert good.n_docs == 2 and good.n_unique == 2
    assert good.dup_rate_ppm == 0 and not good.is_spam_source


def test_levenshtein_verify_separates_revision_from_bagofwords(spark):
    docs = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "the quick brown fox jumped over the lazy dog"),  # revision
            (3, "dog lazy the over jumps fox brown quick the"),  # same bag, reordered
        ],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2), (1, 3)], "a long, b long")
    out = {(r.a, r.b): r for r in levenshtein_verify(docs, pairs).collect()}
    assert out[(1, 2)].edit_dist == 2  # jumps -> jumped
    assert out[(1, 3)].edit_dist > 15  # order-sensitive: reordering is far
    assert out[(1, 2)].edit_ppm < out[(1, 3)].edit_ppm


def test_levenshtein_verify_ascii_projection_and_prefix(spark):
    # non-ASCII stripped before compare in ascii_only mode; prefix caps cost
    docs = spark.createDataFrame(
        [(1, "héllo wörld"), (2, "hllo wrld")],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame([(1, 2)], "a long, b long")
    (row,) = levenshtein_verify(docs, pairs, ascii_only=True).collect()
    assert row.edit_dist == 0 and row.edit_ppm == 0
    (full,) = levenshtein_verify(docs, pairs, ascii_only=False).collect()
    assert full.edit_dist == 2
    long_docs = spark.createDataFrame(
        [(1, "a" * 10_000), (2, "a" * 9_000 + "b" * 1_000)],
        "doc_id long, text string",
    )
    (capped,) = levenshtein_verify(long_docs, pairs, prefix_len=100).collect()
    assert capped.edit_dist == 0  # difference lies beyond the prefix


def test_pack_sequences_offsets_and_straddle(spark):
    from webdedup.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * 10)) for i in range(50)],
        "doc_id long, text string",
    )
    out = pack_sequences(docs, budget_tokens=16, n_shards=1).collect()
    rows = sorted(out, key=lambda r: r.doc_id)
    # single shard: offsets are exact multiples of 10 in doc_id order
    assert [r.start_offset for r in rows] == [10 * i for i in range(50)]
    assert all(r.n_tokens == 10 for r in rows)
    # budget 16, docs of 10: doc at offset 0 -> pack 0 covers [0,16) and
    # the doc spans [0,10) -> no straddle; offset 10 spans [10,20) -> straddles
    assert rows[0].pack_id == 0 and not rows[0].straddles
    assert rows[1].pack_id == 0 and rows[1].straddles
    # every token position is covered exactly once: total tokens == last
    # doc's start + its length
    assert rows[-1].start_offset + rows[-1].n_tokens == 500


def test_pack_sequences_shards_are_independent_streams(spark):
    from webdedup.sampling import pack_sequences

    docs = spark.createDataFrame(
        [(i, "a b c") for i in range(1_000)], "doc_id long, text string"
    )
    out = pack_sequences(docs, budget_tokens=64, n_shards=16)
    per_shard = {r["shard"]: r for r in out.groupBy("shard").agg(
        F.min("start_offset").alias("mn"),
        (F.max("start_offset") + F.max("n_tokens")).alias("total"),
        F.count("*").alias("n"),
    ).collect()}
    assert len(per_shard) == 16
    for r in per_shard.values():
        assert r["mn"] == 0  # every shard's stream starts at offset 0
        assert r["total"] == 3 * r["n"]  # contiguous: no gaps in the stream
    # growth stability: adding docs leaves other shards' layout untouched
    more = docs.union(
        spark.createDataFrame([(5_000, "x y")], "doc_id long, text string")
    )
    base = {(r.doc_id): (r.shard, r.start_offset)
            for r in pack_sequences(docs, 64, 16).collect()}
    grown = {(r.doc_id): (r.shard, r.start_offset)
             for r in pack_sequences(more, 64, 16).collect()}
    new_shard = grown[5_000][0]
    for did, (sh, off) in base.items():
        if sh != new_shard:
            assert grown[did] == (sh, off)


def test_pack_sequences_validation(spark):
    from webdedup.sampling import pack_sequences

    docs = _ids(spark, 5).withColumn("text", F.lit("a"))
    with pytest.raises(ValueError):
        pack_sequences(docs, budget_tokens=0)
    with pytest.raises(ValueError):
        pack_sequences(docs, n_shards=0)


def test_source_stats_null_text_not_a_duplicate_group(spark):
    # xxhash64(NULL) would return the seed, collapsing all NULL-text docs
    # into one pseudo-fingerprint; n_unique must ignore NULLs like SQL's
    # count(DISTINCT text)
    docs = spark.createDataFrame(
        [(0, "real text", "s"), (1, None, "s"), (2, None, "s")],
        "doc_id long, text string, source string",
    )
    (row,) = source_stats(docs).collect()
    assert row.n_docs == 3 and row.n_unique == 1


def test_pack_sequences_token_face_matches_token_counts(spark):
    """Packing must size offsets with the SAME tokenization as the budget
    surface (textstats.token_counts n_ws_tokens): on whitespace-irregular
    text, split-on-space counts phantom empty tokens (ADVICE r4)."""
    from webdedup.sampling import pack_sequences
    from webdedup.textstats import token_counts

    docs = spark.createDataFrame(
        [
            (1, "  leading and   internal  runs "),
            (2, "tabs\tand\nnewlines\tcount right"),
            (3, "plain four token text"[:21]),
            (4, "   "),
        ],
        "doc_id long, text string",
    )
    packed = {r.doc_id: r.n_tokens for r in pack_sequences(docs, 16, 1).collect()}
    counted = {r.doc_id: r.n_ws_tokens for r in token_counts(docs).collect()}
    assert packed == counted
    assert packed[1] == 4 and packed[2] == 5 and packed[4] == 0
