"""Real byte-level BPE token counts: kernel vs an INDEPENDENT reference
implementation, the committed trained-merges fixture, and the
pack_sequences real-budget integration (VERDICT r4 ask #5).

The reference implementation below deliberately uses a different
algorithm spelling (one-occurrence-at-a-time merging with a re-scan,
the textbook loop) than the kernel (merge-all-occurrences per round).
The two agree on any rank-monotone merge table — one where a pair
involving a merged symbol always ranks after the merge that produced
the symbol — which every trained BPE table satisfies by construction
(a pair containing symbol AB cannot be counted before AB exists).
"""

import random

import pytest

from webdedup.fixtures import generate_pages_fast, train_bpe_merges
from webdedup.kernels import bpe_count_pretokens, bpe_count_word, bpe_ranks
from webdedup.textstats import (
    BPE_PRETOKEN_RE,
    load_bpe_merges,
    token_counts_bpe,
)

PLANTED = [("e", "r"), ("t", "h"), ("er", "s"), ("th", "e")]


def _bpe_reference_count(word: str, merges: list) -> int:
    """Independent textbook BPE: repeatedly find the lowest-rank adjacent
    pair and merge its FIRST occurrence only, until none remains."""
    ranks = {(l.encode(), r.encode()): i for i, (l, r) in enumerate(merges)}
    syms = [bytes([b]) for b in word.encode("utf-8")]
    while True:
        best_i, best_r = None, None
        for i in range(len(syms) - 1):
            r = ranks.get((syms[i], syms[i + 1]))
            if r is not None and (best_r is None or r < best_r):
                best_i, best_r = i, r
        if best_i is None:
            return len(syms)
        syms[best_i : best_i + 2] = [syms[best_i] + syms[best_i + 1]]


def test_bpe_count_word_planted_values():
    ranks = bpe_ranks(PLANTED)
    # thers: er(0) -> th(1) -> ers(2) => [TH, ERS]
    assert bpe_count_word(b"thers", ranks) == 2
    # the: th(1) -> the(3) => [THE]
    assert bpe_count_word(b"the", ranks) == 1
    # no rankable pair: every byte stays a token
    assert bpe_count_word(b"xyz", ranks) == 3
    assert bpe_count_word(b"", ranks) == 0


def test_kernel_matches_independent_reference_on_fixture_merges():
    merges = load_bpe_merges()
    assert len(merges) == 512
    ranks = bpe_ranks(merges)
    rng = random.Random(7)
    pdf, _ = generate_pages_fast(50, seed=9)
    words = sorted({w for t in pdf.text for w in t.split()})
    sample = rng.sample(words, min(300, len(words)))
    # plus adversarial shapes: repeats, prefixes, multi-byte UTF-8
    sample += ["aaaa", "thethethe", "ersers", "héllo", "北京北京", "x"]
    for w in sample:
        assert bpe_count_word(w.encode("utf-8"), ranks) == _bpe_reference_count(
            w, merges
        ), w


def test_kernel_matches_reference_on_random_merge_tables():
    rng = random.Random(13)
    alphabet = "abcdefgh"
    for trial in range(20):
        corpus = [
            " ".join(
                "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 8)))
                for _ in range(30)
            )
            for _ in range(5)
        ]
        merges = train_bpe_merges(corpus, n_merges=rng.randint(1, 40))
        ranks = bpe_ranks(merges)
        for _ in range(30):
            w = "".join(rng.choice(alphabet) for _ in range(rng.randint(0, 12)))
            assert bpe_count_word(w.encode(), ranks) == _bpe_reference_count(
                w, merges
            ), (trial, w, merges)


def test_trainer_is_deterministic_and_compresses():
    corpus = ["the quick brown fox the quick", "the the quick"] * 3
    m1 = train_bpe_merges(corpus, 16)
    m2 = train_bpe_merges(list(corpus), 16)
    # the tiny corpus exhausts its pair supply before 16 merges — the
    # trainer stops early rather than emitting degenerate merges
    assert m1 == m2 and 0 < len(m1) <= 16
    ranks = bpe_ranks(m1)
    # trained merges compress the training words below their byte length
    assert bpe_count_word(b"the", ranks) < 3
    assert bpe_count_word(b"quick", ranks) < 5


def test_bpe_count_pretokens_rows():
    import numpy as np

    ranks = bpe_ranks(PLANTED)
    out = bpe_count_pretokens([["the", " thers"], None, []], ranks)
    # " thers": space byte + [TH, ERS] = 3
    assert list(out) == [1 + 3, 0, 0]
    assert out.dtype == np.int64


def test_token_counts_bpe_spark_matches_reference(spark):
    """The full Spark path (JVM pretokenizer → Arrow kernel) against the
    independent reference applied to the same JVM pretokens."""
    from pyspark.sql import functions as F

    merges = load_bpe_merges()
    pdf, _ = generate_pages_fast(30, seed=21)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf.text)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_bpe_real for r in token_counts_bpe(docs, merges).collect()}
    pretoks = {
        r.doc_id: r.toks
        for r in docs.select(
            "doc_id",
            F.regexp_extract_all("text", F.lit(BPE_PRETOKEN_RE), F.lit(0)).alias(
                "toks"
            ),
        ).collect()
    }
    for did, toks in pretoks.items():
        want = sum(_bpe_reference_count(t, merges) for t in toks)
        assert got[did] == want, did


def test_bpe_upper_bounded_by_pretokens_lower_bounded_by_compression(spark):
    """n_bpe_real <= n_bytes always (merges only shrink) and
    n_bpe_real >= n_bpe_tokens (a pretoken is >= 1 token)."""
    from webdedup.textstats import token_counts

    pdf, _ = generate_pages_fast(40, seed=33)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf.text)], "doc_id long, text string"
    )
    tc = token_counts(docs)
    joined = (
        token_counts_bpe(docs)
        .join(tc, "doc_id")
        .selectExpr(
            "sum(cast(n_bpe_real > n_bytes as int)) as over_bytes",
            "sum(cast(n_bpe_real < n_bpe_tokens as int)) as under_pretoks",
            "sum(cast(n_bpe_real < n_bytes as int)) as compressed",
        )
        .collect()[0]
    )
    assert joined.over_bytes == 0 and joined.under_pretoks == 0
    assert joined.compressed > 0  # the merges fixture actually compresses


def test_pack_sequences_on_real_bpe_budgets(spark):
    """pack_sequences with n_tokens_col = real BPE counts: offsets are
    running sums of the BPE counts, not the whitespace face."""
    from webdedup.sampling import pack_sequences

    pdf, _ = generate_pages_fast(25, seed=5)
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(pdf.text)], "doc_id long, text string"
    )
    counts = token_counts_bpe(docs)
    packed = pack_sequences(
        docs.join(counts, "doc_id"),
        budget_tokens=4096,
        n_shards=1,
        n_tokens_col="n_bpe_real",
    ).collect()
    by_id = {r.doc_id: r for r in packed}
    want = {r.doc_id: r.n_bpe_real for r in counts.collect()}
    assert {d: r.n_tokens for d, r in by_id.items()} == want
    rows = sorted(packed, key=lambda r: r.doc_id)
    run = 0
    for r in rows:
        assert r.start_offset == run
        assert r.pack_id == run // 4096
        run += r.n_tokens


def test_fixture_oracle_preconditions():
    """The driver's generated replace-chain SQL oracle is sound only under
    these table properties — assert them so a retrained fixture that
    violates one fails HERE, not as a silent oracle mismatch."""
    import string

    merges = load_bpe_merges()
    produced: dict = {}
    for i, (l, r) in enumerate(merges):
        # letter-only merges: never cross a pretoken boundary
        assert set(l + r) <= set(string.ascii_lowercase), (i, l, r)
        # rank monotonicity: multi-char components come from earlier merges
        for c in (l, r):
            if len(c) > 1:
                assert c in produced and produced[c] < i, (i, l, r, c)
        # unique symbol strings: the symbol -> marker map is a bijection
        assert (l + r) not in produced, (i, l, r)
        produced[l + r] = i


def test_kernel_at_real_vocab_scale_50k():
    """VERDICT r5 #3: the merge loop exercised at a real tokenizer's vocab
    size (~50k ranks, GPT-2 scale) — correctness vs the independent
    textbook loop, and the memo cache keeps per-word cost bounded."""
    from bench_extra import synth_merges

    merges = synth_merges(50_000)
    assert len(merges) == 50_000
    ranks = bpe_ranks(merges)
    rng = random.Random(99)
    alphabet = "abcdefghijklmnopqrstuvwxyz"
    words = [
        "".join(rng.choice(alphabet) for _ in range(rng.randint(1, 14)))
        for _ in range(150)
    ] + ["aaaaaaaaaaaa", "abababababab", "zzz"]
    for w in words:
        assert bpe_count_word(w.encode(), ranks) == _bpe_reference_count(
            w, merges
        ), w
