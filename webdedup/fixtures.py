"""Deterministic synthetic Common-Crawl-style pages (FIXTURES.md §1).

Generates the canonical input table from BASELINE.json:input_hint —
``(url string, warc_ts timestamp, html binary, text string, lang string)`` —
with planted duplicate structure and a ground-truth pair table. Seed fixed,
no external data. ``extract_text(html) == text`` holds byte-identically per
row (the input_hint invariant).
"""

from __future__ import annotations

import datetime as _dt
from dataclasses import dataclass, field

import numpy as np

_WORDS = None


def _vocab(rng: np.random.RandomState, size: int = 4000) -> list:
    consonants = "bcdfghjklmnpqrstvwz"
    vowels = "aeiou"
    words = set()
    while len(words) < size:
        n = rng.randint(2, 5)
        w = "".join(
            consonants[rng.randint(len(consonants))] + vowels[rng.randint(len(vowels))]
            for _ in range(n)
        )
        words.add(w)
    return sorted(words)


BOILERPLATE = (
    "copyright notice all rights reserved terms of service privacy policy "
    "cookie settings subscribe to our newsletter follow us on social media"
)


@dataclass
class PageSet:
    rows: list = field(default_factory=list)       # dicts: url warc_ts html text lang
    truth: list = field(default_factory=list)      # (url_a, url_b, kind)


def make_html(text: str) -> bytes:
    return ("<html><body>" + text + "</body></html>").encode("utf-8")


def extract_text(html: bytes) -> str:
    """Byte-identical inverse of make_html (the input_hint invariant)."""
    s = html.decode("utf-8")
    return s[len("<html><body>") : -len("</body></html>")]


def generate_pages(n: int = 500, seed: int = 42) -> PageSet:
    """Synthetic pages with planted duplicate structure (FIXTURES.md §1).

    ~20% near-duplicates (token edit rates 0.01/0.05/0.15), ~5% exact
    duplicates, ~5% exact-substring embeds, heavy-tailed cluster sizes,
    boilerplate shingles on ~30% of pages (hot-bucket stressor).
    """
    rng = np.random.RandomState(seed)
    vocab = _vocab(rng)
    langs = np.array(["en", "de", "fr", "es"])
    lang_p = [0.7, 0.1, 0.1, 0.1]
    base_t = _dt.datetime(2026, 1, 1, tzinfo=_dt.timezone.utc)

    ps = PageSet()
    n_base = max(1, int(n * 0.70))
    base_texts = []
    for i in range(n_base):
        n_words = rng.randint(50, 2000)
        toks = [vocab[rng.randint(len(vocab))] for _ in range(n_words)]
        text = " ".join(toks)
        if rng.rand() < 0.30:  # hot boilerplate shingles
            text = BOILERPLATE + " " + text + " " + BOILERPLATE
        base_texts.append(text)

    def add_row(i: int, text: str, lang: str) -> str:
        url = f"https://site{i % 97}.example/{lang}/page{i}"
        ts = base_t + _dt.timedelta(seconds=17 * i)
        ps.rows.append(
            dict(url=url, warc_ts=ts, html=make_html(text), text=text, lang=lang)
        )
        return url

    urls = []
    for i, text in enumerate(base_texts):
        urls.append(add_row(i, text, str(langs[rng.choice(4, p=lang_p)])))

    i = n_base
    # near-duplicates: heavy-tailed cluster sizes 2..20
    n_near = int(n * 0.20)
    made = 0
    while made < n_near:
        src = rng.randint(n_base)
        cluster = min(1 + int(rng.pareto(1.5)), 19, n_near - made)
        cluster = max(cluster, 1)
        p_edit = float(rng.choice([0.01, 0.05, 0.15]))
        toks0 = base_texts[src].split()
        for _ in range(cluster):
            toks = list(toks0)
            k = max(1, int(len(toks) * p_edit))
            for _ in range(k):
                op = rng.randint(3)
                pos = rng.randint(len(toks))
                w = vocab[rng.randint(len(vocab))]
                if op == 0:
                    toks[pos] = w
                elif op == 1:
                    toks.insert(pos, w)
                elif len(toks) > 10:
                    del toks[pos]
            u = add_row(i, " ".join(toks), ps.rows[src]["lang"])
            ps.truth.append((urls[src], u, f"near_p{p_edit}"))
            i += 1
            made += 1

    # exact duplicates
    for _ in range(int(n * 0.05)):
        src = rng.randint(n_base)
        u = add_row(i, base_texts[src], ps.rows[src]["lang"])
        ps.truth.append((urls[src], u, "exact"))
        i += 1

    # exact-substring embeds: short base page inside a longer new page
    for _ in range(int(n * 0.05)):
        src = rng.randint(n_base)
        pad_n = rng.randint(100, 400)
        pad1 = " ".join(vocab[rng.randint(len(vocab))] for _ in range(pad_n))
        pad2 = " ".join(vocab[rng.randint(len(vocab))] for _ in range(pad_n))
        u = add_row(i, pad1 + " " + base_texts[src] + " " + pad2, ps.rows[src]["lang"])
        ps.truth.append((urls[src], u, "substring"))
        i += 1

    return ps


def generate_pages_fast(n: int, seed: int = 42, avg_words: int = 400):
    """Vectorized bench-scale corpus (numpy batch generation, ~10^6 rows/min).

    Same planted structure as generate_pages (70% base / 20% near-dup /
    5% exact / 5% substring, boilerplate on 30%) but token edits are done
    with array ops instead of per-token Python. Returns pandas DataFrame
    (url, warc_ts, text, lang) — html omitted at bench scale.
    """
    import pandas as pd

    rng = np.random.RandomState(seed)
    vocab = np.array(_vocab(rng))
    V = len(vocab)
    langs = np.array(["en", "de", "fr", "es"])

    n_base = int(n * 0.70)
    lens = rng.randint(50, 2 * avg_words, size=n_base)
    total = int(lens.sum())
    flat = rng.randint(0, V, size=total)
    offs = np.concatenate([[0], np.cumsum(lens)])
    boiler = rng.rand(n_base) < 0.30
    texts: list = []
    for i in range(n_base):
        toks = vocab[flat[offs[i] : offs[i + 1]]]
        t = " ".join(toks)
        if boiler[i]:
            t = BOILERPLATE + " " + t + " " + BOILERPLATE
        texts.append(t)

    truth: list = []
    n_near, n_exact, n_sub = int(n * 0.20), int(n * 0.05), int(n * 0.05)
    srcs = rng.randint(0, n_base, size=n_near)
    p_edits = rng.choice([0.01, 0.05, 0.15], size=n_near)
    for s, p in zip(srcs, p_edits):
        toks = np.array(texts[s].split())
        k = max(1, int(toks.size * p))
        pos = rng.randint(0, toks.size, size=k)
        toks[pos] = vocab[rng.randint(0, V, size=k)]
        truth.append((s, len(texts), "near"))
        texts.append(" ".join(toks))
    for s in rng.randint(0, n_base, size=n_exact):
        truth.append((int(s), len(texts), "exact"))
        texts.append(texts[s])
    for s in rng.randint(0, n_base, size=n_sub):
        pad = " ".join(vocab[rng.randint(0, V, size=200)])
        truth.append((int(s), len(texts), "substring"))
        texts.append(pad + " " + texts[s] + " " + pad)

    m = len(texts)
    lang = langs[rng.choice(4, size=m, p=[0.7, 0.1, 0.1, 0.1])]
    base_t = pd.Timestamp("2026-01-01", tz="UTC")
    pdf = pd.DataFrame(
        {
            "url": [f"https://site{i % 97}.example/{lang[i]}/page{i}" for i in range(m)],
            "warc_ts": base_t + pd.to_timedelta(np.arange(m) * 17, unit="s"),
            "text": texts,
            "lang": lang,
        }
    )
    tdf = pd.DataFrame(
        [(pdf.url[a], pdf.url[b], k) for a, b, k in truth],
        columns=["url_a", "url_b", "kind"],
    )
    return pdf, tdf


def pages_dataframe(spark, n: int = 500, seed: int = 42):
    """PageSet → (pages DataFrame, truth DataFrame)."""
    import pandas as pd

    ps = generate_pages(n, seed)
    pdf = pd.DataFrame(ps.rows)
    tdf = pd.DataFrame(ps.truth, columns=["url_a", "url_b", "kind"])
    pages = spark.createDataFrame(pdf[["url", "warc_ts", "html", "text", "lang"]])
    truth = spark.createDataFrame(tdf) if len(tdf) else None
    return pages, truth


def train_bpe_merges(texts: list, n_merges: int = 256) -> list:
    """Classic BPE training (Sennrich et al. 2016, public algorithm):
    count word frequencies, repeatedly merge the most frequent symbol
    pair. Deterministic (ties broken by pair bytes). Used to produce the
    committed merges fixture (webdedup/data/bpe_merges_synth.txt) from
    the deterministic synthetic corpus; production users load a real
    GPT-2 merges.txt through the same textstats.load_bpe_merges face.

    Training is a DRIVER-SIDE bounded-sample operation by design (the
    IVF-centroid pattern): a merges table is a few hundred rows trained
    once on a sample, then applied distributively.
    """
    from collections import Counter

    words = Counter()
    for t in texts:
        words.update(t.split())
    # ASCII-only training input (ADVICE r5): symbols are decoded back to
    # str for the one-pair-per-line merges format, and a lone UTF-8
    # continuation byte winning a merge would raise UnicodeDecodeError
    # (and a space inside a symbol would corrupt the format). The trained
    # fixture's corpus is ASCII by construction; enforce the contract.
    non_ascii = [w for w in words if not w.isascii()]
    if non_ascii:
        raise ValueError(
            f"train_bpe_merges needs ASCII training text; got {non_ascii[:3]!r}"
        )
    # symbol sequences with frequencies
    vocab = {tuple(w.encode("utf-8")[i : i + 1] for i in range(len(w.encode("utf-8")))): c
             for w, c in words.items()}
    merges: list = []
    for _ in range(n_merges):
        pairs: Counter = Counter()
        for syms, c in vocab.items():
            for p in zip(syms, syms[1:]):
                pairs[p] += c
        if not pairs:
            break
        best = max(pairs.items(), key=lambda kv: (kv[1], kv[0]))[0]
        merges.append((best[0].decode("utf-8"), best[1].decode("utf-8")))
        merged = best[0] + best[1]
        new_vocab = {}
        for syms, c in vocab.items():
            out, i, n = [], 0, len(syms)
            while i < n:
                if i < n - 1 and syms[i] == best[0] and syms[i + 1] == best[1]:
                    out.append(merged)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            new_vocab[tuple(out)] = new_vocab.get(tuple(out), 0) + c
        vocab = new_vocab
    return merges
