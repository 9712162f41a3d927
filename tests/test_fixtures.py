"""Fixture generator tests (pure pandas/numpy — no Spark session)."""

import numpy as np

from webdedup.fixtures import (
    BOILERPLATE, extract_text, generate_pages, generate_pages_fast, make_html,
)


def test_generate_pages_deterministic():
    a = generate_pages(80, seed=42)
    b = generate_pages(80, seed=42)
    assert [r["url"] for r in a.rows] == [r["url"] for r in b.rows]
    assert [r["text"] for r in a.rows] == [r["text"] for r in b.rows]
    assert a.truth == b.truth


def test_generate_pages_html_invariant():
    ps = generate_pages(30, seed=7)
    for r in ps.rows:
        assert extract_text(r["html"]) == r["text"]
        assert make_html(r["text"]) == r["html"]


def test_generate_pages_fast_deterministic_and_planted():
    p1, t1 = generate_pages_fast(2000, seed=42)
    p2, t2 = generate_pages_fast(2000, seed=42)
    assert (p1["url"] == p2["url"]).all()
    assert (p1["text"] == p2["text"]).all()
    kinds = set(t1["kind"])
    assert kinds == {"near", "exact", "substring"}
    # exact dups really are byte-identical
    by_url = dict(zip(p1["url"], p1["text"]))
    ex = t1[t1.kind == "exact"].iloc[0]
    assert by_url[ex.url_a] == by_url[ex.url_b]
    # substring dups really contain the source text
    sub = t1[t1.kind == "substring"].iloc[0]
    assert by_url[sub.url_a] in by_url[sub.url_b]
    # boilerplate present on a meaningful fraction (hot-shingle stressor)
    frac = p1["text"].str.startswith(BOILERPLATE).mean()
    assert 0.15 < frac < 0.45


def test_generate_pages_fast_url_uniqueness():
    p, _ = generate_pages_fast(3000, seed=1)
    assert p["url"].is_unique
