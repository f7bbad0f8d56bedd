"""HTML → text extraction as an Arrow-batched pandas UDF.

The reference delegates extraction to an Apache-Tika HTTP sidecar
(/root/reference/components/extractor/tika/extractor.go:33-61) with a 4 GB
size cap (tika/config.go:20). Here extraction is a deterministic pure-Python
parser run as a *scalar pandas UDF* over Arrow batches — the north-rule
invariant is that the extracted text is byte-identical per url, which the
fixture generator guarantees by construction (fixtures.py) and the golden
tests verify.

Pipeline (fixed order — determinism depends on it):
  1. UTF-8 decode (replace errors)
  2. strip comments, <script>/<style> subtrees
  3. block-level tags → newline; remaining tags → ''
  4. HTML entity unescape
  5. NBSP/CR/TAB normalization, space-run collapse, per-line strip,
     empty-line drop, '\n' join
"""

from __future__ import annotations

import html as html_mod
import re

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import ArrayType, StringType, StructField, StructType

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_TITLE_RE = re.compile(r"(?is)<title\b[^>]*>(.*?)</title\s*>")
_BLOCK_RE = re.compile(
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|"
    r"section|article|header|footer|blockquote|pre)\b[^>]*/?>"
)
_TAG_RE = re.compile(r"<[^>]*>")
_SPACES_RE = re.compile(r" +")


def _strip_inert(html: str) -> str:
    """Remove comments and script/style subtrees — the shared first step of
    text AND title extraction (a <title> inside a comment must not win)."""
    return _SCRIPT_RE.sub(" ", _COMMENT_RE.sub(" ", html))


def _text_from_stripped(s: str) -> str:
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = html_mod.unescape(s)
    s = s.replace("\xa0", " ").replace("\r", "\n").replace("\t", " ")
    lines = (_SPACES_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


def extract_text_str(html: str) -> str:
    """Reference extraction semantics on one decoded document."""
    return _text_from_stripped(_strip_inert(html))


def extract_series(html: pd.Series) -> pd.Series:
    """Arrow-batch extraction: bytes Series → str Series."""
    def one(b) -> str:
        if b is None:
            return ""
        return extract_text_str(bytes(b).decode("utf-8", errors="replace"))

    return html.map(one)


@pandas_udf(StringType())
def extract_text_udf(html: pd.Series) -> pd.Series:
    return extract_series(html)


def _title_from_stripped(s: str) -> str:
    m = _TITLE_RE.search(s)
    if not m:
        return ""
    t = _TAG_RE.sub("", m.group(1))
    t = html_mod.unescape(t)
    t = t.replace("\xa0", " ").replace("\r", " ").replace("\t", " ")
    return _SPACES_RE.sub(" ", t.replace("\n", " ")).strip()


_HREF_RE = re.compile(
    r"""(?is)<a\b[^>]*?\bhref\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
_META_TAG_RE = re.compile(r"(?is)<meta\b[^>]*>")
_ATTR_RE = re.compile(
    r"""(?is)\b([a-z][a-z0-9-]*)\s*=\s*("([^"]*)"|'([^']*)'|([^\s>]+))""")
# minimal content sniff: real structural markup → html, else plain text
# (the reference's Tika sidecar detects the true Content-Type; stray '<'
# comparisons in prose must not flip a text file to html)
_HTML_MARKER_RE = re.compile(
    r"(?is)<(!doctype|html|head|body|title|meta|div|p|a|span|br|table|ul|ol"
    r"|li|h[1-6]|script|style)\b")

META_FIELDS = ("description", "keywords", "author")


def _norm_inline(t: str) -> str:
    """Title-style normalization for attribute/metadata values."""
    t = html_mod.unescape(t)
    t = t.replace("\xa0", " ").replace("\r", " ").replace("\t", " ")
    return _SPACES_RE.sub(" ", t.replace("\n", " ")).strip()


def _urls_from_stripped(s: str) -> list[str]:
    """Outlink harvest (the reference's `urls []string` per file —
    /root/reference/components/index/types/file.go:21; Tika 'extracts body
    text … links', docs/architecture.md:38-40): href values of anchor tags,
    entity-unescaped, first-occurrence order, deduped; empty hrefs and pure
    fragments are dropped."""
    out: list[str] = []
    seen: set[str] = set()
    for m in _HREF_RE.finditer(s):
        u = html_mod.unescape(
            m.group(2) or m.group(3) or m.group(4) or "").strip()
        if not u or u.startswith("#") or u in seen:
            continue
        seen.add(u)
        out.append(u)
    return out


def _meta_from_stripped(s: str) -> dict[str, str]:
    """<meta name=... content=...> harvest for the reference's
    metadata.description/keywords/author default_fields
    (/root/reference/docs/indices/files.json:10-37). Attribute order within
    the tag is free; the first non-empty occurrence of each field wins."""
    found: dict[str, str] = {}
    for tag in _META_TAG_RE.finditer(s):
        attrs = {}
        for am in _ATTR_RE.finditer(tag.group(0)):
            attrs[am.group(1).lower()] = (am.group(3) or am.group(4)
                                          or am.group(5) or "")
        name = attrs.get("name", "").lower()
        if name in META_FIELDS and name not in found:
            val = _norm_inline(attrs.get("content", ""))
            if val:
                found[name] = val
    return found


def _content_type_sniff(decoded: str) -> str:
    return ("text/html; charset=utf-8" if _HTML_MARKER_RE.search(decoded)
            else "text/plain; charset=utf-8")


def extract_urls_str(html: str) -> list[str]:
    """Outlinks of one decoded document (comments/scripts stripped first —
    a href inside a comment is not a link)."""
    return _urls_from_stripped(_strip_inert(html))


def extract_meta_str(html: str) -> dict[str, str]:
    """description/keywords/author of one decoded document."""
    return _meta_from_stripped(_strip_inert(html))


def extract_title_str(html: str) -> str:
    """<title> content through the same normalization pipeline (the
    reference's Tika sidecar emits title into the metadata map,
    /root/reference/components/index/types/file.go:11). Comments and
    script/style subtrees are stripped FIRST, like text extraction — a
    <title> inside a comment is not the document title."""
    return _title_from_stripped(_strip_inert(html))


_DOC_SCHEMA = StructType([
    StructField("text", StringType()),
    StructField("title", StringType()),
    StructField("description", StringType()),
    StructField("keywords", StringType()),
    StructField("author", StringType()),
    StructField("content_type", StringType()),
    StructField("urls", ArrayType(StringType())),
])


@pandas_udf(_DOC_SCHEMA)
def extract_doc_udf(html: pd.Series) -> pd.DataFrame:
    """One Arrow pass over the html bytes → (text, title, description,
    keywords, author, content_type, urls) — the extractor chain of the
    reference (Tika emits content + a metadata map + links in a single
    sidecar call, /root/reference/docs/architecture.md:38-40; separate UDFs
    would scan every page once per field)."""
    cols: dict[str, list] = {f.name: [] for f in _DOC_SCHEMA.fields}
    for b in html:
        if b is None:
            for k in cols:
                cols[k].append([] if k == "urls" else "")
            continue
        decoded = bytes(b).decode("utf-8", errors="replace")
        stripped = _strip_inert(decoded)
        meta = _meta_from_stripped(stripped)
        cols["text"].append(_text_from_stripped(stripped))
        cols["title"].append(_title_from_stripped(stripped))
        cols["description"].append(meta.get("description", ""))
        cols["keywords"].append(meta.get("keywords", ""))
        cols["author"].append(meta.get("author", ""))
        cols["content_type"].append(_content_type_sniff(decoded))
        cols["urls"].append(_urls_from_stripped(stripped))
    return pd.DataFrame(cols)


def with_extracted_text(df, html_col: str = "html", out_col: str = "text",
                        max_bytes: int | None = None,
                        status_col: str | None = None,
                        metadata_col: str | None = None,
                        urls_col: str | None = None):
    """Attach extracted text; optionally classify oversize/empty rows,
    attach a metadata map (title, description, keywords, author,
    Content-Type — the reference's dynamic metadata island,
    /root/reference/docs/indices/files.json:10-37,117-118) and an outlink
    array (`urls`, types/file.go:21).

    Mirrors the reference's ValidateMaxSize → invalid path
    (/root/reference/components/extractor/util.go:15-29, crawler/index.go:63-68):
    oversize docs are NOT extracted (text null) and get status
    'invalid_too_large'; empty html → status 'partial'; else 'ok'.
    The length gate is a JVM-side filter so Catalyst can prune before the UDF.
    """
    html = F.col(html_col)
    ok = (F.length(html) <= F.lit(max_bytes)) if max_bytes is not None \
        else F.lit(True)
    if metadata_col is None and urls_col is None:
        if max_bytes is None:
            out = df.withColumn(out_col, extract_text_udf(html))
        else:
            out = df.withColumn(
                out_col,
                F.when(ok, extract_text_udf(html)).otherwise(F.lit(None)))
        return _with_status(out, html, ok, status_col)
    out = df.withColumn(
        "_ex", F.when(ok, extract_doc_udf(html)).otherwise(F.lit(None)))
    out = out.withColumn(out_col, F.col("_ex.text"))
    if metadata_col is not None:
        # full metadata map with empty fields dropped (map_filter keeps the
        # construction one JVM expression — no per-field when-chains)
        full = F.create_map(
            F.lit("title"), F.col("_ex.title"),
            F.lit("description"), F.col("_ex.description"),
            F.lit("keywords"), F.col("_ex.keywords"),
            F.lit("author"), F.col("_ex.author"),
            F.lit("Content-Type"), F.col("_ex.content_type"),
        )
        out = out.withColumn(
            metadata_col,
            F.when(F.col("_ex").isNotNull(),
                   F.map_filter(full, lambda _, v: v.isNotNull() & (v != "")))
            .otherwise(F.lit(None).cast("map<string,string>")))
    if urls_col is not None:
        out = out.withColumn(urls_col, F.col("_ex.urls"))
    return _with_status(out.drop("_ex"), html, ok, status_col)


def _with_status(out, html, ok, status_col):
    if status_col:
        out = out.withColumn(
            status_col,
            F.when(~ok, F.lit("invalid_too_large"))
            .when(F.coalesce(F.length(html), F.lit(0)) == 0, F.lit("partial"))
            .otherwise(F.lit("ok")),
        )
    return out
