"""token_counts: whitespace tokens, BPE-ish pretokens, chars, bytes.

The BPE pretokenizer regex is the lookahead-free GPT-2 flavor shared
verbatim by the DuckDB oracle (driver query `token_counts`); these tests
pin the row-local values on adversarial inputs and the zero-shuffle plan.
"""

from webdedup import textstats as TS


def _docs(spark, rows):
    return spark.createDataFrame(rows, "doc_id long, text string")


def _counts(spark, rows):
    return {r["doc_id"]: r.asDict() for r in TS.token_counts(_docs(spark, rows)).collect()}


def test_token_counts_basic(spark):
    out = _counts(spark, [(1, "The quick brown fox doesn't jump over 42 lazy dogs!")])
    r = out[1]
    # pretokens: The | quick | brown | fox | doesn | 't | jump | over
    # | 42 | lazy | dogs | !
    assert r["n_ws_tokens"] == 10
    assert r["n_bpe_tokens"] == 12
    assert r["n_chars"] == r["n_bytes"] == 51


def test_token_counts_contractions_each_match_once(spark):
    out = _counts(spark, [(1, "it's we're I'll they'd you've I'm can't")])
    # 7 words + 7 contraction-suffix tokens
    assert out[1]["n_bpe_tokens"] == 14
    assert out[1]["n_ws_tokens"] == 7


def test_token_counts_unicode_chars_vs_bytes(spark):
    out = _counts(spark, [(1, "naïve café 北京")])
    r = out[1]
    assert r["n_ws_tokens"] == 3
    # naïve | _café | _北京
    assert r["n_bpe_tokens"] == 3
    assert r["n_chars"] == 13
    # ï,é are 2 bytes each (+1 over chars); 北,京 are 3 bytes each (+2)
    assert r["n_bytes"] == 13 + 1 + 1 + 2 + 2


def test_token_counts_whitespace_edge_cases(spark):
    out = _counts(spark, [(1, ""), (2, "   "), (3, "  a  b  ")])
    assert out[1] == {"doc_id": 1, "n_ws_tokens": 0, "n_bpe_tokens": 0,
                      "n_chars": 0, "n_bytes": 0}
    assert out[2]["n_ws_tokens"] == 0 and out[2]["n_bpe_tokens"] == 1
    # "  " | a | _ | b wait: '  a' -> ws-run '  ', ' a'? The regex is
    # leftmost-first: at pos 0 the \s+ alternative eats '  ' wholly, then
    # ' ?\p{L}+' takes 'a', then '\s+' eats '  ', then 'b', then '  '.
    assert out[3]["n_ws_tokens"] == 2
    assert out[3]["n_bpe_tokens"] == 5


def test_token_counts_vertical_tab_matches_duckdb_oracle(spark):
    """Java's \\s includes \\x0B, RE2's does not — the regexes spell the
    whitespace class explicitly so both engines agree on docs containing
    a vertical tab (review finding, round 4)."""
    import duckdb

    text = "a\x0bb c\x0b\x0b d\tе́2!"
    got = _counts(spark, [(1, text)])[1]
    con = duckdb.connect()
    con.execute("CREATE TABLE documents(doc_id BIGINT, text VARCHAR)")
    con.execute("INSERT INTO documents VALUES (1, ?)", [text])
    import __spark_entry__ as E

    want = con.execute(E.oracle_sql()["token_counts"]).df().iloc[0]
    assert got["n_ws_tokens"] == want["n_ws_tokens"]
    assert got["n_bpe_tokens"] == want["n_bpe_tokens"]
    assert got["n_chars"] == want["n_chars"]
    assert got["n_bytes"] == want["n_bytes"]
    # \x0B is whitespace (Java semantics): "a","b","c","d","е́2!" runs
    assert got["n_ws_tokens"] == 5


def test_token_counts_plan_has_no_exchange(spark):
    df = TS.token_counts(_docs(spark, [(1, "a b")]))
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
