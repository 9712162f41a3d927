"""CLI operator modes (--op): each mode reads parquet, writes parquet,
prints one JSON line. Runs in-process against the shared session fixture
(webdedup.session.get_spark reuses the active session)."""

import json

import pytest

from webdedup.cli import main


@pytest.fixture()
def docs_parquet(spark, tmp_path):
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [
            (0, "the quick brown fox jumps over the lazy dog again and again"),
            (1, "reach me at alice@example.com or 212-555-1234 thanks"),
            (2, "the quick brown fox jumps over the lazy dog again and again"),
        ],
        "doc_id long, text string",
    ).write.mode("overwrite").parquet(path)
    return path


def _run(capsys, argv):
    assert main(argv) == 0
    return json.loads(capsys.readouterr().out.strip().splitlines()[-1])


def test_cli_token_counts(spark, tmp_path, capsys, docs_parquet):
    out_path = str(tmp_path / "out")
    out = _run(capsys, ["--op", "token-counts", "--input", docs_parquet, "--output", out_path])
    assert out["mode"] == "token-counts" and out["rows"] == 3
    got = {r.doc_id: r.n_ws_tokens for r in spark.read.parquet(out_path).collect()}
    assert got[0] == 12


def test_cli_pii(spark, tmp_path, capsys, docs_parquet):
    out_path = str(tmp_path / "out")
    out = _run(capsys, ["--op", "pii", "--input", docs_parquet, "--output", out_path])
    assert out["rows"] == 3
    rows = {r.doc_id: r for r in spark.read.parquet(out_path).collect()}
    assert rows[1].n_emails == 1 and rows[1].n_phones == 1
    assert "<EMAIL>" in rows[1].clean_text


def test_cli_decontaminate_requires_benchmark(docs_parquet, tmp_path):
    with pytest.raises(SystemExit):
        main(["--op", "decontaminate", "--input", docs_parquet,
              "--output", str(tmp_path / "out")])


def test_cli_decontaminate(spark, tmp_path, capsys, docs_parquet):
    out_path = str(tmp_path / "out")
    out = _run(capsys, [
        "--op", "decontaminate", "--input", docs_parquet,
        "--benchmark", docs_parquet, "--ngram", "5", "--output", out_path,
    ])
    # benchmark == corpus: every doc with >= 5 tokens is contaminated
    assert out["rows"] == 3
    assert all(r.is_contaminated for r in spark.read.parquet(out_path).collect())


def test_cli_clean_honors_id_col(spark, tmp_path, capsys):
    # --op clean must apply the --id-col rename before clean_corpus
    # (which hardcodes doc_id downstream) — review finding, round 4
    path = str(tmp_path / "renamed.parquet")
    spark.createDataFrame(
        [
            (10, "the quick brown fox jumps over the lazy dog once more ok"),
            (11, "a completely different document about spark catalyst plans"),
        ],
        "page_id long, body string",
    ).write.mode("overwrite").parquet(path)
    out_path = str(tmp_path / "out")
    out = _run(capsys, [
        "--op", "clean", "--input", path, "--output", out_path,
        "--id-col", "page_id", "--text-col", "body",
    ])
    assert out["mode"] == "clean"
    assert "doc_id" in spark.read.parquet(out_path).columns


def test_cli_op_with_catalog_rejected(tmp_path, docs_parquet):
    # --op pii + --catalog would silently run incremental dedup instead
    # of the requested operator — must be an argparse error
    with pytest.raises(SystemExit):
        main(["--op", "pii", "--catalog", str(tmp_path / "cat"),
              "--work", str(tmp_path / "work"), "--input", docs_parquet,
              "--output", str(tmp_path / "out")])


def test_cli_id_and_text_col_mapping(spark, tmp_path, capsys):
    path = str(tmp_path / "renamed.parquet")
    spark.createDataFrame(
        [(10, "hello world three tokens")], "page_id long, body string"
    ).write.mode("overwrite").parquet(path)
    out_path = str(tmp_path / "out")
    out = _run(capsys, [
        "--op", "token-counts", "--input", path, "--output", out_path,
        "--id-col", "page_id", "--text-col", "body",
    ])
    assert out["rows"] == 1
    row = spark.read.parquet(out_path).collect()[0]
    assert row.doc_id == 10 and row.n_ws_tokens == 4


def test_cli_sample_stratified(spark, tmp_path, capsys):
    path = str(tmp_path / "docs.parquet")
    spark.createDataFrame(
        [(i, "text %d" % i, "en" if i % 2 else "de") for i in range(2000)],
        "doc_id long, text string, lang string",
    ).write.mode("overwrite").parquet(path)
    out_path = str(tmp_path / "out")
    out = _run(capsys, [
        "--op", "sample", "--input", path, "--output", out_path,
        "--rates", "en=500000", "--rate-ppm", "100000",
    ])
    kept = spark.read.parquet(out_path)
    n_en = kept.where("lang = 'en'").count()
    n_de = kept.where("lang = 'de'").count()
    assert out["rows"] == n_en + n_de
    assert abs(n_en - 500) < 120 and abs(n_de - 100) < 80


def test_cli_source_stats_and_near_decontaminate(spark, tmp_path, capsys, docs_parquet):
    with_source = str(tmp_path / "src.parquet")
    spark.read.parquet(docs_parquet).selectExpr(
        "doc_id", "text", "'site.example' AS source"
    ).write.mode("overwrite").parquet(with_source)
    out = _run(capsys, ["--op", "source-stats", "--input", with_source,
                        "--output", str(tmp_path / "s_out")])
    assert out["rows"] == 1  # one source group
    out2 = _run(capsys, [
        "--op", "near-decontaminate", "--input", docs_parquet,
        "--benchmark", docs_parquet, "--output", str(tmp_path / "n_out"),
    ])
    # corpus vs itself: every doc near-matches its own benchmark copy
    assert out2["rows"] >= 3


def test_cli_near_decontaminate_honors_id_col(spark, tmp_path, capsys):
    # the benchmark side needs the --id-col rename too (unlike
    # decontaminate, which only reads the benchmark's text)
    path = str(tmp_path / "renamed.parquet")
    spark.createDataFrame(
        [(1, "the quick brown fox jumps over the lazy dog again today")],
        "page_id long, body string",
    ).write.mode("overwrite").parquet(path)
    out = _run(capsys, [
        "--op", "near-decontaminate", "--input", path, "--benchmark", path,
        "--id-col", "page_id", "--text-col", "body",
        "--output", str(tmp_path / "out"),
    ])
    assert out["rows"] == 1  # the doc matches its own benchmark copy


def test_cli_sample_malformed_rates_is_argparse_error(docs_parquet, tmp_path):
    for bad in ("en", "en=50%"):
        with pytest.raises(SystemExit):
            main(["--op", "sample", "--input", docs_parquet,
                  "--output", str(tmp_path / "out"), "--rates", bad])


def test_cli_dedup_from_wet_input(spark, tmp_path, capsys):
    # end-to-end: WET files in, clusters out — the exact-dup pair must
    # collapse just like a parquet input would
    from tests.test_sources import _write_wet

    text = "the quick brown fox jumps over the lazy dog again and again"
    path = _write_wet(tmp_path, "f.wet", [
        ("http://a.example/1", text),
        ("http://a.example/2", text),
        ("http://a.example/3", "a totally different page about catalyst"),
    ])
    out_path = str(tmp_path / "out")
    out = _run(capsys, ["--input", path, "--input-format", "wet",
                        "--output", out_path])
    assert out["counters"]["pages"] == 3
    assert out["counters"]["unique_texts"] == 2
    clusters = spark.read.parquet(out_path)
    n_clusters = clusters.select("cluster_id").distinct().count()
    assert n_clusters == 2


def test_cli_token_counts_bpe(spark, tmp_path, capsys, docs_parquet):
    out_path = str(tmp_path / "out")
    out = _run(capsys, ["--op", "token-counts-bpe", "--input", docs_parquet,
                        "--output", out_path])
    assert out["mode"] == "token-counts-bpe" and out["rows"] == 3
    rows = {r.doc_id: r.n_bpe_real for r in spark.read.parquet(out_path).collect()}
    # real merges compress below the byte count, never below the pretoken count
    from webdedup.textstats import token_counts

    tc = {r.doc_id: r for r in token_counts(
        spark.read.parquet(docs_parquet)).collect()}
    for d, n in rows.items():
        assert tc[d].n_bpe_tokens <= n <= tc[d].n_bytes
