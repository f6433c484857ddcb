"""Deterministic synthetic web-page corpus (FIXTURES.md F1).

Generates the ``pages`` table from BASELINE.json's input_hint —
(url, warc_ts, html, text, lang) — where ``text`` is the ground-truth
extraction computed by the *same emission rule the reference uses*
(DFS over the DOM, each non-whitespace text node emitted as
``node_text + " "``, script/style subtrees skipped —
src/crawler/ContentParser.cpp:153-167). The generator builds the HTML
string and the expected text in one pass, so the extract stage can be
pinned byte-identical per URL.

Generator constraints (SURVEY.md §7.5): well-formed
``<html><head>…</head><body>…</body></html>``; elements from
{title, meta[name=description], h1, p, div, a[href], script, style};
ASCII + Persian text; absolute / path-absolute / proto-relative /
relative links; some pages without title or meta description; duplicate
URLs pre-normalization (#fragment, trailing slash, case) and true
re-crawl duplicates with later warc_ts for last-write-wins dedup.

Everything is seeded — same (n_docs, seed) in any process gives the
same table.
"""

from __future__ import annotations

import html as _html
import random
from dataclasses import dataclass
from datetime import datetime, timedelta

import pyarrow as pa

# Compact deterministic vocabulary; zipf-ish sampling skews toward the head.
_VOCAB = (
    "the search engine index query data web page crawl content rank score "
    "term document batch stream shard merge parse text link domain title "
    "machine learning neural network python programming language tutorial "
    "guide fast slow table column vector hash cache store filter sort heap "
    "posting delta byte block distributed cluster worker actor node memory "
    "object arrow parquet pipeline stage shuffle partition key value count "
    "frequency weight boost phrase exact match result snippet meta robot "
    "frontier retry backoff queue session thread pool redis mongo kafka "
    "quality keyword description length average corpus statistics inverse "
    "apple banana cherry recipe launch email mail setup server client api "
    "open source code test unit fixture assert build deploy release version"
).split()

_FA_WORDS = "جستجو موتور صفحه وب داده متن زبان فارسی نمایه پرس و جو سند".split()

_EPOCH = datetime(2024, 1, 1)

# Site categories (SiteProfile.category — "news, blog, etc.",
# include/search_engine/storage/SiteProfile.h:51; the seeded test data
# uses tutorial/documentation/blog, tests/webserver/seed_test_data.sh).
# Derived from the doc index WITHOUT consuming the rng stream so adding
# the column does not perturb the seeded corpus.
_CATEGORIES = ("tutorial", "documentation", "blog", "news", "reference")


def _category_for(i: int) -> str:
    return _CATEGORIES[(i * 2654435761) % len(_CATEGORIES)]


@dataclass
class SynthConfig:
    n_docs: int = 200
    seed: int = 42
    n_domains: int = 12
    fa_frac: float = 0.08          # Persian-language pages (Unicode path)
    recrawl_frac: float = 0.06     # same URL re-crawled later (LWW dedup)
    no_title_frac: float = 0.05
    no_meta_frac: float = 0.10
    # page weight: paragraphs per page and words per paragraph ranges.
    # Defaults give ~3 KB pages (unit tests); benchmarks use heavier
    # ranges (~8-12 KB) to match real Common-Crawl-style page sizes
    # (reference README.md:511-515: ~7 KB static, ~580 KB SPA).
    paras: tuple = (2, 7)
    para_words: tuple = (10, 60)
    # fraction of pages carrying a Zipf-length "topic burst" (one word
    # repeated with a Pareto tail). The default corpus has near-uniform
    # per-doc tf, so per-block tf_max is flat and block-max pruning
    # cannot bite; real web corpora are tf-skewed. 0.0 = byte-identical
    # to the pre-knob corpus (no rng draws are consumed when off).
    tf_zipf_frac: float = 0.0


def _words(rng: random.Random, vocab: list[str], n: int) -> list[str]:
    out = []
    for _ in range(n):
        idx = int(len(vocab) * rng.random() ** 2)  # head-skewed
        out.append(vocab[min(idx, len(vocab) - 1)])
    return out


class _PageBuilder:
    """Accumulates HTML and the ground-truth text side by side."""

    def __init__(self) -> None:
        self.html: list[str] = []
        self.text: list[str] = []

    def raw(self, markup: str) -> None:
        self.html.append(markup)

    def textnode(self, s: str, hidden: bool = False) -> None:
        """One DOM text node: html-escaped in markup; ground truth gets
        ``s + " "`` unless inside script/style or whitespace-only."""
        self.html.append(_html.escape(s, quote=False))
        if not hidden and s.strip():
            self.text.append(s)

    def build_text(self) -> str:
        return "".join(p + " " for p in self.text)


def _gen_page(rng: random.Random, url: str, domain: str, lang: str, cfg: SynthConfig) -> tuple[str, str, str]:
    """Returns (html, ground_truth_text, title_or_empty)."""
    vocab = _VOCAB if lang == "en" else _VOCAB + _FA_WORDS * 3
    b = _PageBuilder()
    b.raw("<html><head>")
    title = ""
    if rng.random() >= cfg.no_title_frac:
        title = " ".join(w.capitalize() for w in _words(rng, vocab, rng.randint(2, 6)))
        b.raw("<title>")
        b.textnode(title)
        b.raw("</title>")
    if rng.random() >= cfg.no_meta_frac:
        meta = " ".join(_words(rng, vocab, rng.randint(6, 14)))
        b.raw(f'<meta name="description" content="{_html.escape(meta)}">')
    b.raw('<style>')
    b.textnode("body { color: red; font-size: 12px; }", hidden=True)
    b.raw("</style></head><body>")
    if rng.random() < 0.7:
        b.raw("<h1>")
        b.textnode(" ".join(_words(rng, vocab, rng.randint(2, 5))))
        b.raw("</h1>")
    n_paras = rng.randint(*cfg.paras)
    for _ in range(n_paras):
        b.raw("\n<p>")
        b.textnode(" ".join(_words(rng, vocab, rng.randint(*cfg.para_words))))
        b.raw("</p>")
        if rng.random() < 0.35:
            b.raw("<script>")
            b.textnode("var x = 1; console.log('decoy');", hidden=True)
            b.raw("</script>")
    # links: absolute / path-absolute / proto-relative / relative
    n_links = rng.randint(0, 5)
    for _ in range(n_links):
        kind = rng.randrange(4)
        target = f"page{rng.randrange(2000)}"
        if kind == 0:
            href = f"https://{domain}/{target}"
        elif kind == 1:
            href = f"/{target}"
        elif kind == 2:
            href = f"//{domain}/{target}"
        else:
            href = f"{target}.html"
        b.raw(f'<div><a href="{href}">')
        b.textnode(" ".join(_words(rng, vocab, 2)))
        b.raw("</a></div>")
    if cfg.tf_zipf_frac > 0 and rng.random() < cfg.tf_zipf_frac:
        # tf skew: a head-region topic word repeated with a Pareto-tail
        # burst — a few docs get tf in the hundreds while most stay at
        # 1-3, so per-block tf_max (the block-max WAND bound) varies
        topic = vocab[int(len(vocab) * rng.random() ** 2 * 0.25)]
        burst = 2 + min(400, int(1.0 / max(1e-9, rng.random()) ** 0.7))
        b.raw("\n<p>")
        b.textnode(" ".join([topic] * burst))
        b.raw("</p>")
    b.raw("</body></html>")
    return "".join(b.html), b.build_text(), title


def _rows_for_doc(i: int, cfg: SynthConfig, domains: list[str]) -> list[tuple]:
    """Deterministic rows for doc index ``i`` — seeded per doc so corpus
    generation parallelizes over Ray blocks (same output for any
    partitioning)."""
    rng = random.Random((cfg.seed << 24) ^ (i * 0x9E3779B1 & 0xFFFFFF))
    domain = domains[rng.randrange(len(domains))]
    lang = "fa" if rng.random() < cfg.fa_frac else "en"
    base = f"https://{domain}/page/{i}"
    variant = rng.random()
    if variant < 0.05:
        url = base + "/"
    elif variant < 0.10:
        url = base + "#section"
    elif variant < 0.13:
        url = base.replace("https://", "HTTPS://")
    else:
        url = base
    html, text, _ = _gen_page(rng, base, domain, lang, cfg)
    cat = _category_for(i)
    rows = [(url, _EPOCH + timedelta(minutes=i), html.encode("utf-8"), text, lang, cat)]
    if rng.random() < cfg.recrawl_frac:
        html2, text2, _ = _gen_page(rng, base, domain, lang, cfg)
        rows.append(
            (base, _EPOCH + timedelta(minutes=i, hours=6), html2.encode("utf-8"), text2, lang, cat)
        )
    return rows


def _domains(cfg: SynthConfig) -> list[str]:
    return [f"site{i}.example.com" for i in range(max(1, cfg.n_domains - 2))] + [
        "github.com",
        "stackoverflow.com",
    ]


def synth_pages_batch(indices, cfg: SynthConfig) -> pa.Table:
    """Pages for a batch of doc indices (map_batches kernel)."""
    domains = _domains(cfg)
    urls, ts, htmls, texts, langs, cats = [], [], [], [], [], []
    for i in indices:
        for u, t, h, x, l, c in _rows_for_doc(int(i), cfg, domains):
            urls.append(u)
            ts.append(t)
            htmls.append(h)
            texts.append(x)
            langs.append(l)
            cats.append(c)
    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "category": pa.array(cats, pa.string()),
        }
    )


def synth_pages_ds(cfg: SynthConfig | None = None, blocks: int = 64, **kw):
    """Distributed deterministic corpus: ray.data.range over doc indices,
    page generation inside map_batches — scales to any corpus size with
    no driver-side materialization."""
    import ray.data

    cfg = cfg or SynthConfig(**kw)
    return ray.data.range(cfg.n_docs, override_num_blocks=blocks).map_batches(
        lambda b: synth_pages_batch(b["id"], cfg), batch_format="numpy"
    )


def synth_pages_table(cfg: SynthConfig | None = None, **kw) -> pa.Table:
    """Build the deterministic pages table as a pyarrow Table."""
    cfg = cfg or SynthConfig(**kw)
    rng = random.Random(cfg.seed)
    domains = [f"site{i}.example.com" for i in range(max(1, cfg.n_domains - 2))]
    domains += ["github.com", "stackoverflow.com"]  # authority-boost path
    urls: list[str] = []
    ts: list[datetime] = []
    htmls: list[bytes] = []
    texts: list[str] = []
    langs: list[str] = []
    cats: list[str] = []

    for i in range(cfg.n_docs):
        domain = domains[rng.randrange(len(domains))]
        lang = "fa" if rng.random() < cfg.fa_frac else "en"
        base = f"https://{domain}/page/{i}"
        # pre-normalization URL variants that collapse to the same doc
        variant = rng.random()
        if variant < 0.05:
            url = base + "/"
        elif variant < 0.10:
            url = base + "#section"
        elif variant < 0.13:
            url = base.replace("https://", "HTTPS://")
        else:
            url = base
        html, text, _ = _gen_page(rng, base, domain, lang, cfg)
        urls.append(url)
        ts.append(_EPOCH + timedelta(minutes=i))
        htmls.append(html.encode("utf-8"))
        texts.append(text)
        langs.append(lang)
        cats.append(_category_for(i))
        if rng.random() < cfg.recrawl_frac:
            # re-crawl of the same URL with newer content; LWW keeps this row
            html2, text2, _ = _gen_page(rng, base, domain, lang, cfg)
            urls.append(base)
            ts.append(_EPOCH + timedelta(minutes=i, hours=6))
            htmls.append(html2.encode("utf-8"))
            texts.append(text2)
            langs.append(lang)
            cats.append(_category_for(i))

    return pa.table(
        {
            "url": pa.array(urls, pa.string()),
            "warc_ts": pa.array(ts, pa.timestamp("us")),
            "html": pa.array(htmls, pa.binary()),
            "text": pa.array(texts, pa.string()),
            "lang": pa.array(langs, pa.string()),
            "category": pa.array(cats, pa.string()),
        }
    )
