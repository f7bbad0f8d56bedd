"""Deterministic synthetic Common-Crawl-style `pages` corpus.

Produces the exact `input_hint` shape: (url string, warc_ts timestamp,
html binary, text string, lang string). The html is generated from the text by
an escaping/markup transform that `functions.extract.extract_text_str` inverts
EXACTLY — so the extraction invariant ("byte-identical extracted text per
url") is testable by construction, per SURVEY.md §7 milestone 0.

Corpus properties (FIXTURES.md §1):
- seeded (default 42), pure-Python stdlib `random` — stable across runs
- Zipfian term frequencies → a few heavily-skewed terms (exercise salted
  shuffle; the reference's analogue of skew is the random directory-child
  priority, /root/reference/components/crawler/crawldirectory.go:157-163)
- ~0.5% duplicate urls at different warc_ts (exercise last-seen dedup,
  /root/reference/components/sniffer/providerfilters/lastseenfilter.go:55-90)
- ~1% empty/whitespace-only html, ~0.5% oversize html (size-cap path,
  /root/reference/components/extractor/util.go:15-29)
- ≥2 lang codes, entity/whitespace/markup edge cases in the html
"""

from __future__ import annotations

import datetime as dt
import html as html_mod
import math
import random

# Seeded vocabulary: ~200 word stems; Zipf exponent ~1.1 over ranks.
_STEMS = [
    "data", "spark", "index", "search", "query", "term", "token", "page",
    "crawl", "hash", "merge", "block", "score", "rank", "shard", "batch",
    "stream", "filter", "join", "group", "sort", "scan", "table", "column",
    "row", "key", "value", "store", "cache", "queue", "worker", "node",
    "text", "html", "link", "parent", "child", "file", "dir", "size",
    "time", "stamp", "event", "update", "insert", "delete", "fetch", "parse",
    "extract", "encode", "decode", "delta", "byte", "bit", "max", "min",
    "count", "sum", "mean", "stat", "doc", "corpus", "segment", "posting",
    "list", "array", "map", "struct", "field", "schema", "type", "lang",
    "word", "char", "line", "body", "title", "head", "meta", "tag",
]


def _vocab(n: int) -> list[str]:
    out = []
    i = 0
    while len(out) < n:
        stem = _STEMS[i % len(_STEMS)]
        suffix = "" if i < len(_STEMS) else str(i // len(_STEMS))
        out.append(stem + suffix)
        i += 1
    return out


# Rare words carrying entity / markup edge cases (must round-trip the
# escape→unescape path in the extractor).
_EDGE_WORDS = ["a&b", "x<y", "p>q", 'say"hi"', "it's", "café", "naïve"]


def _zipf_sampler(rng: random.Random, vocab: list[str], s: float = 1.1):
    weights = [1.0 / (r + 1) ** s for r in range(len(vocab))]
    total = sum(weights)
    cum = []
    acc = 0.0
    for w in weights:
        acc += w / total
        cum.append(acc)

    def sample() -> str:
        u = rng.random()
        lo, hi = 0, len(cum) - 1
        while lo < hi:
            mid = (lo + hi) // 2
            if cum[mid] < u:
                lo = mid + 1
            else:
                hi = mid
        return vocab[lo]

    return sample


def _make_text(rng: random.Random, sample) -> str:
    n_paras = rng.randint(1, 4)
    paras = []
    # paragraph 0 doubles as the <title>
    for _ in range(n_paras + 1):
        n_words = rng.randint(3, 40)
        words = [sample() for _ in range(n_words)]
        if rng.random() < 0.05:
            words[rng.randrange(len(words))] = rng.choice(_EDGE_WORDS)
        paras.append(" ".join(words))
    return "\n".join(paras)


def _links_for_index(j: int, seed: int, n_pages: int,
                     url_fmt: str = "https://example.org/{seed}/{idx:010d}.html"
                     ) -> list[str]:
    """Deterministic outlinks of page j (0..4 intra-corpus + an occasional
    external link with an entity-escaped query) — keyed by (j, seed) alone so
    tests recompute the expected url list independently of html generation."""
    rng = random.Random((seed << 8) ^ (j * 0x85EBCA6B) ^ 0x5BD1E995)
    out: list[str] = []
    seen: set[str] = set()
    for _ in range(rng.randrange(0, 5)):
        tgt = rng.randrange(n_pages)
        u = url_fmt.format(seed=seed, idx=tgt)
        if tgt != j and u not in seen:
            seen.add(u)
            out.append(u)
    if rng.random() < 0.2:
        out.append(f"https://ext.example.com/q?a={j}&b=2")
    return out


def _meta_for_index(j: int, seed: int, vocab: list[str]) -> dict[str, str]:
    """Deterministic <meta> fields of page j (description/keywords/author,
    each present with its own probability) — independently recomputable."""
    rng = random.Random((seed << 24) ^ (j * 0xC2B2AE35) ^ 0x27D4EB2F)
    meta: dict[str, str] = {}
    if rng.random() < 0.8:
        words = [vocab[rng.randrange(len(vocab))]
                 for _ in range(rng.randint(4, 10))]
        if rng.random() < 0.1:
            words.append(rng.choice(_EDGE_WORDS))
        meta["description"] = " ".join(words)
    if rng.random() < 0.6:
        meta["keywords"] = ", ".join(vocab[rng.randrange(len(vocab))]
                                     for _ in range(rng.randint(2, 5)))
    if rng.random() < 0.5:
        meta["author"] = f"author {rng.randrange(1000)}"
    return meta


def _markup_paragraph(rng: random.Random, para: str) -> str:
    """Wrap a paragraph in block markup; optionally wrap a word-range in an
    inline tag — tag boundaries sit ON word boundaries so inline-tag removal
    preserves single-space separators exactly."""
    words = para.split(" ")
    if len(words) > 3 and rng.random() < 0.5:
        i = rng.randrange(len(words) - 1)
        j = rng.randrange(i + 1, len(words))
        inner = html_mod.escape(" ".join(words[i:j + 1]))
        tag = rng.choice(["b", "i", "em", "strong", "span", "a href='#'"])
        close = tag.split(" ")[0]
        mid = f"<{tag}>{inner}</{close}>"
        parts = []
        if i > 0:
            parts.append(html_mod.escape(" ".join(words[:i])))
        parts.append(mid)
        if j + 1 < len(words):
            parts.append(html_mod.escape(" ".join(words[j + 1:])))
        body = " ".join(parts)
    else:
        body = html_mod.escape(para)
    block = rng.choice(["p", "div", "li", "h2", "td"])
    pad_l = rng.choice(["", " ", "\n  ", "\t"])
    pad_r = rng.choice(["", " ", "  \n", " \t "])
    return f"<{block}>{pad_l}{body}{pad_r}</{block}>"


def _make_html(rng: random.Random, text: str,
               links: list[str] | None = None,
               meta: dict[str, str] | None = None) -> bytes:
    paras = text.split("\n")
    title, body_paras = paras[0], paras[1:]
    noise_script = "<script>var x = 1 < 2 && 3 > 2;</script>" if rng.random() < 0.5 else ""
    noise_style = "<style>p { color: red; }</style>" if rng.random() < 0.3 else ""
    comment = "<!-- generated fixture -->" if rng.random() < 0.3 else ""
    nbsp = "&nbsp;" if rng.random() < 0.2 else ""
    meta_tags = ""
    for name, content in (meta or {}).items():
        c = html_mod.escape(content)
        # attribute order varies — extraction must not depend on it
        if rng.random() < 0.5:
            meta_tags += f'\n<meta name="{name}" content="{c}">'
        else:
            meta_tags += f'\n<meta content="{c}" name="{name}">'
    # empty-anchor outlinks: harvested into `urls` without contributing any
    # body text, so the text byte-identity invariant is untouched
    anchors = "".join(f'<a href="{html_mod.escape(u)}"></a>'
                      for u in (links or []))
    blocks = "\n".join(_markup_paragraph(rng, p) for p in body_paras)
    doc = (
        f"<!DOCTYPE html>\n<html>\n<head>{comment}{meta_tags}\n"
        f"<title>{html_mod.escape(title)}</title>{noise_script}{noise_style}\n"
        f"</head>\n<body>{nbsp}\n{blocks}\n{anchors}\n</body>\n</html>"
    )
    return doc.encode("utf-8")


def generate_pages(
    n: int = 1000,
    seed: int = 42,
    dup_frac: float = 0.005,
    empty_frac: float = 0.01,
    oversize_frac: float = 0.005,
    oversize_bytes: int = 1 << 20,
    n_langs: int = 3,
) -> list[dict]:
    """Return a list of row dicts (url, warc_ts, html, text, lang)."""
    rng = random.Random(seed)
    vocab = _vocab(max(64, int(20 * math.sqrt(n))))
    sample = _zipf_sampler(rng, vocab)
    langs = ["en", "de", "fr", "es", "zh"][:n_langs]
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    url_fmt = "https://example.org/{seed}/{idx:08d}.html"
    rows: list[dict] = []
    for i in range(n):
        url = url_fmt.format(seed=seed, idx=i)
        ts = base_ts + dt.timedelta(seconds=rng.randrange(90 * 86400))
        lang = langs[i % len(langs)]
        links = _links_for_index(i, seed, n, url_fmt=url_fmt)
        meta = _meta_for_index(i, seed, vocab)
        r = rng.random()
        if r < empty_frac:
            text = ""
            html = rng.choice([b"", b"   \n\t  ", b"<html><body>  </body></html>"])
        elif r < empty_frac + oversize_frac:
            text = _make_text(rng, sample)
            filler = b"<!-- " + b"x" * oversize_bytes + b" -->"
            html = _make_html(rng, text, links, meta)[:-7] + filler + b"</html>"
        else:
            text = _make_text(rng, sample)
            html = _make_html(rng, text, links, meta)
        rows.append({"url": url, "warc_ts": ts, "html": html, "text": text, "lang": lang})
    # duplicate sightings of the same url at a different warc_ts
    n_dup = max(1, int(n * dup_frac))
    for k in range(n_dup):
        src = rows[rng.randrange(len(rows))]
        rows.append({
            **src,
            "warc_ts": src["warc_ts"] + dt.timedelta(hours=rng.randrange(1, 2000)),
        })
    rng.shuffle(rows)
    return rows


def _page_for_index(j: int, seed: int, vocab: list[str], langs: list[str],
                    n_pages: int = 1 << 30) -> dict:
    """Deterministic page content for logical doc index j (content rng is
    keyed by j alone, so duplicate sightings regenerate identical html)."""
    rng = random.Random((seed << 32) ^ (j * 0x9E3779B9) ^ 0xA5A5A5A5)
    sample = _zipf_sampler(rng, vocab)
    base_ts = dt.datetime(2024, 1, 1, tzinfo=dt.timezone.utc)
    url = f"https://example.org/{seed}/{j:010d}.html"
    ts = base_ts + dt.timedelta(seconds=rng.randrange(90 * 86400))
    lang = langs[j % len(langs)]
    r = rng.random()
    if r < 0.01:
        return {"url": url, "warc_ts": ts, "lang": lang, "text": "",
                "html": rng.choice([b"", b"  \n ", b"<html><body> </body></html>"])}
    text = _make_text(rng, sample)
    links = _links_for_index(j, seed, n_pages)
    meta = _meta_for_index(j, seed, vocab)
    return {"url": url, "warc_ts": ts, "lang": lang, "text": text,
            "html": _make_html(rng, text, links, meta)}


def pages_df_distributed(spark, n: int, seed: int = 42, n_langs: int = 3,
                         dup_frac: float = 0.005, partitions: int | None = None):
    """Scalable distributed corpus synthesis: spark.range(n) → mapInPandas,
    each logical row generated from a per-index seeded RNG (order- and
    partitioning-independent → deterministic at any parallelism). Duplicate
    sightings reference an earlier index and regenerate ITS content, so the
    latest-wins dedup path sees true url duplicates. This is how the bench
    synthesizes input at scale — generation itself is a distributed job."""
    import pandas as pd
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    langs = ["en", "de", "fr", "es", "zh"][:n_langs]
    vocab = _vocab(max(64, int(20 * math.sqrt(n))))

    def gen(batches):
        for pdf in batches:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rng_row = random.Random((seed << 16) ^ i)
                j = i
                if rng_row.random() < dup_frac and i > 8:
                    j = i - rng_row.randrange(1, 8)
                page = _page_for_index(j, seed, vocab, langs, n_pages=n)
                if j != i:  # duplicate sighting at a different time
                    page = {**page,
                            "warc_ts": page["warc_ts"] +
                            dt.timedelta(hours=rng_row.randrange(1, 2000))}
                rows.append(page)
            yield pd.DataFrame(rows)[["url", "warc_ts", "html", "text", "lang"]]

    rng_parts = partitions or spark.sparkContext.defaultParallelism
    return spark.range(n).repartition(rng_parts).mapInPandas(gen, schema)


def pages_df(spark, n: int = 1000, seed: int = 42, **kw):
    """Materialize the corpus as a Spark DataFrame with the input_hint schema."""
    from pyspark.sql.types import (
        BinaryType, StringType, StructField, StructType, TimestampType,
    )

    schema = StructType([
        StructField("url", StringType()),
        StructField("warc_ts", TimestampType()),
        StructField("html", BinaryType()),
        StructField("text", StringType()),
        StructField("lang", StringType()),
    ])
    rows = generate_pages(n=n, seed=seed, **kw)
    return spark.createDataFrame(rows, schema=schema)
