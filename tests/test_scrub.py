"""Unit tests for the data-hygiene operators (decontaminate / pii_redact).

Oracle parity at sf0.01 runs in test_oracle_parity.py; here we pin the
edge-case semantics and the physical plans (broadcast membership join,
shuffle-free redaction).
"""

import pytest

from webdedup import scrub


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_decontaminate_flags_shared_grams(spark):
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f"),          # shares "b c d" with the benchmark
            (2, "x y z w v u"),          # clean
            (3, "b c d b c d b c d"),    # the shared gram occurs 3x sliding? see below
        ],
    )
    bench = _docs(spark, [(100, "q b c d r")])
    out = {
        r["doc_id"]: r.asDict()
        for r in scrub.decontaminate(corpus, bench, n=3).collect()
    }
    assert out[1]["n_hits"] == 1 and out[1]["is_contaminated"]
    assert out[2]["n_hits"] == 0 and not out[2]["is_contaminated"]
    # doc 3 tokens: b c d b c d b c d -> sliding 3-grams at positions 1,4,7
    # equal "b c d"; positions 2,5 are "c d b", 3,6 are "d b c" (no match).
    # Occurrences count each time: 3 hits.
    assert out[3]["n_hits"] == 3
    assert out[1]["n_grams"] == 4 and out[3]["n_grams"] == 7


def test_decontaminate_short_docs_have_zero_grams(spark):
    corpus = _docs(spark, [(1, "a b"), (2, "")])
    bench = _docs(spark, [(9, "a b c")])
    rows = {r["doc_id"]: r for r in scrub.decontaminate(corpus, bench, n=3).collect()}
    assert rows[1]["n_grams"] == 0 and rows[1]["n_hits"] == 0
    assert rows[2]["n_grams"] == 0 and not rows[2]["is_contaminated"]


def test_decontaminate_membership_join_is_broadcast(spark):
    corpus = _docs(spark, [(1, "a b c d")])
    bench = _docs(spark, [(2, "a b c")])
    plan = scrub.decontaminate(corpus, bench, n=3)._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan or "BroadcastNestedLoopJoin" in plan


def test_pii_redact_counts_and_redacts(spark):
    docs = _docs(
        spark,
        [
            (1, "mail bob@example.com or alice@test.org now"),
            (2, "host 10.1.2.3 and 192.168.0.1 dial 212-555-0042"),
            (3, "clean text with no pii at all"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in scrub.pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 2 and out[1]["n_ips"] == 0
    assert out[1]["clean_text"] == "mail <EMAIL> or <EMAIL> now"
    assert out[2]["n_ips"] == 2 and out[2]["n_phones"] == 1
    assert out[2]["clean_text"] == "host <IP> and <IP> dial <PHONE>"
    assert out[3] == {
        "doc_id": 3,
        "n_emails": 0,
        "n_ips": 0,
        "n_phones": 0,
        "clean_text": "clean text with no pii at all",
    }


def test_pii_phone_pattern_skips_numeric_ranges(spark):
    """Bare NNN-NNNN tokens (numeric ranges, ISBN/id fragments) are NOT
    phones (ADVICE r4) — only the full area-code form redacts."""
    docs = _docs(
        spark,
        [
            (1, "pages 100-2000 of ISBN part 555-1234 unchanged"),
            (2, "reach me at 212-555-0042 today"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in scrub.pii_redact(docs).collect()}
    assert out[1]["n_phones"] == 0
    assert out[1]["clean_text"] == "pages 100-2000 of ISBN part 555-1234 unchanged"
    assert out[2]["n_phones"] == 1
    assert out[2]["clean_text"] == "reach me at <PHONE> today"


def test_pii_redact_ordering_on_overlapping_matches(spark):
    # "user@1.2.3.4" is NOT an email (the domain has no alphabetic TLD),
    # so the IP pass redacts the numeric part; "bob@mail.example.com from
    # 10.0.0.1" exercises both passes on one row, email first.
    docs = _docs(
        spark,
        [
            (1, "ping user@1.2.3.4 end"),
            (2, "bob@mail.example.com from 10.0.0.1"),
        ],
    )
    out = {r["doc_id"]: r.asDict() for r in scrub.pii_redact(docs).collect()}
    assert out[1]["n_emails"] == 0 and out[1]["n_ips"] == 1
    assert out[1]["clean_text"] == "ping user@<IP> end"
    assert out[2]["n_emails"] == 1 and out[2]["n_ips"] == 1
    assert out[2]["clean_text"] == "<EMAIL> from <IP>"


def test_pii_redact_plan_has_no_exchange(spark):
    docs = _docs(spark, [(1, "a"), (2, "b")])
    plan = scrub.pii_redact(docs)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_near_decontaminate_catches_paraphrase_not_verbatim_only(spark):
    from webdedup.config import DedupConfig
    from webdedup.scrub import near_decontaminate

    base = ("alpha bravo charlie delta echo foxtrot golf hotel india juliett "
            "kilo lima mike november oscar papa quebec romeo sierra tango "
            "uniform victor whiskey xray yankee zulu one two three four")
    docs = spark.createDataFrame(
        [
            (1, base),
            (2, "totally different text about catalyst plans and shuffles "
                "with enough tokens to form plenty of distinct grams here"),
        ],
        "doc_id long, text string",
    )
    # benchmark doc = base with the first two tokens dropped: a paraphrase,
    # not a verbatim superset — exact n-gram decontamination at n=8 would
    # still hit this, but the POINT is the Jaccard gate fires on edits
    bench = spark.createDataFrame(
        [(100, base.split(" ", 2)[2]), (101, "unrelated eval question text "
          "padded with additional words so gram sets exist")],
        "doc_id long, text string",
    )
    out = {(r.doc_id, r.bench_id): r.jaccard_ppm
           for r in near_decontaminate(docs, bench, DedupConfig(), 0.8).collect()}
    assert (1, 100) in out and out[(1, 100)] >= 800_000
    assert all(a != 2 for a, _ in out)  # clean doc never flagged
    assert all(b != 101 for _, b in out)  # unrelated bench doc matches nothing


def test_near_decontaminate_below_threshold_pair_excluded(spark):
    from webdedup.config import DedupConfig
    from webdedup.scrub import near_decontaminate

    words = ["w%d" % i for i in range(40)]
    docs = spark.createDataFrame(
        [(1, " ".join(words))], "doc_id long, text string"
    )
    # keep only the first half: Jaccard ~ 18/38 << 0.8
    bench = spark.createDataFrame(
        [(9, " ".join(words[:20]))], "doc_id long, text string"
    )
    assert near_decontaminate(docs, bench, DedupConfig(), 0.8).count() == 0


def test_decontaminate_registry_per_suite_columns(spark):
    corpus = _docs(
        spark,
        [
            (1, "a b c d e f g h"),        # hits suite_a (5-gram a..e etc.)
            (2, "c d e x y z q r"),        # hits suite_b's 3-gram "c d e"? no - bench_b is u v w
            (3, "u v w u v w u v w"),      # 3-gram "u v w" x3 -> suite_b min_hits 2
            (4, "totally clean text here"),
        ],
    )
    bench_a = _docs(spark, [(90, "a b c d e f")])      # 5-grams: "a b c d e","b c d e f"
    bench_b = _docs(spark, [(91, "u v w")])            # 3-gram: "u v w"
    out = {
        r["doc_id"]: r.asDict()
        for r in scrub.decontaminate_registry(
            corpus,
            [
                {"name": "suite_a", "benchmark": bench_a, "n": 5},
                {"name": "suite_b", "benchmark": bench_b, "n": 3, "min_hits": 2},
            ],
        ).collect()
    }
    assert out[1]["suite_a_hits"] == 2 and out[1]["suite_a_contaminated"]
    assert out[1]["suite_b_hits"] == 0 and not out[1]["suite_b_contaminated"]
    # doc 3: "u v w" occurs at positions 1, 4, 7 -> 3 occurrence hits
    assert out[3]["suite_b_hits"] == 3 and out[3]["suite_b_contaminated"]
    assert out[3]["suite_a_hits"] == 0
    # min_hits=2: a single suite_b hit is NOT contaminated
    corpus2 = _docs(spark, [(5, "u v w only once here")])
    (r5,) = scrub.decontaminate_registry(
        corpus2, [{"name": "suite_b", "benchmark": bench_b, "n": 3, "min_hits": 2}]
    ).collect()
    assert r5["suite_b_hits"] == 1 and not r5["suite_b_contaminated"]
    assert out[4]["suite_a_hits"] == 0 and out[4]["suite_b_hits"] == 0


def test_decontaminate_registry_one_pass_plan(spark):
    """The whole registry must be ONE broadcast union joined once — adding
    a suite adds broadcast bytes, not corpus passes (VERDICT r4 ask #8)."""
    corpus = _docs(spark, [(1, "a b c d e f g h"), (2, "x y z w v u t s")])
    suites = [
        {"name": "s1", "benchmark": _docs(spark, [(90, "a b c d e")]), "n": 5},
        {"name": "s2", "benchmark": _docs(spark, [(91, "x y z")]), "n": 3},
        {"name": "s3", "benchmark": _docs(spark, [(92, "q r s")]), "n": 3},
    ]
    plan = (
        scrub.decontaminate_registry(corpus, suites)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # exactly one broadcast (the tagged suite union), used by one hash join
    assert plan.count("BroadcastExchange") == 1, plan
    assert "BroadcastHashJoin" in plan
    # the corpus gram table is persisted and reused, never recomputed per suite
    assert "InMemoryTableScan" in plan


def test_decontaminate_registry_validation(spark):
    corpus = _docs(spark, [(1, "a b c")])
    with pytest.raises(ValueError):
        scrub.decontaminate_registry(corpus, [])
    with pytest.raises(ValueError):
        scrub.decontaminate_registry(
            corpus,
            [
                {"name": "x", "benchmark": corpus, "n": 3},
                {"name": "x", "benchmark": corpus, "n": 5},
            ],
        )
