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
from pyspark.sql.types import StringType, StructField, StructType

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
])


@pandas_udf(_DOC_SCHEMA)
def extract_doc_udf(html: pd.Series) -> pd.DataFrame:
    """One Arrow pass over the html bytes → (text, title) — the extractor
    chain of the reference (Tika emits content + a metadata map in a single
    sidecar call; two separate UDFs would scan every page twice)."""
    texts, titles = [], []
    for b in html:
        if b is None:
            texts.append("")
            titles.append("")
            continue
        stripped = _strip_inert(bytes(b).decode("utf-8", errors="replace"))
        texts.append(_text_from_stripped(stripped))
        titles.append(_title_from_stripped(stripped))
    return pd.DataFrame({"text": texts, "title": titles})


def with_extracted_text(df, html_col: str = "html", out_col: str = "text",
                        max_bytes: int | None = None,
                        status_col: str | None = None,
                        metadata_col: str | None = None):
    """Attach extracted text; optionally classify oversize/empty rows and
    attach a metadata map (title, Content-Type — the reference's dynamic
    metadata island, /root/reference/docs/indices/files.json:117-118).

    Mirrors the reference's ValidateMaxSize → invalid path
    (/root/reference/components/extractor/util.go:15-29, crawler/index.go:63-68):
    oversize docs are NOT extracted (text null) and get status
    'invalid_too_large'; empty html → status 'partial'; else 'ok'.
    The length gate is a JVM-side filter so Catalyst can prune before the UDF.
    """
    html = F.col(html_col)
    ok = (F.length(html) <= F.lit(max_bytes)) if max_bytes is not None \
        else F.lit(True)
    if metadata_col is None:
        if max_bytes is None:
            out = df.withColumn(out_col, extract_text_udf(html))
        else:
            out = df.withColumn(
                out_col,
                F.when(ok, extract_text_udf(html)).otherwise(F.lit(None)))
    else:
        out = df.withColumn(
            "_ex", F.when(ok, extract_doc_udf(html)).otherwise(F.lit(None)))
        out = out.withColumn(out_col, F.col("_ex.text")).withColumn(
            metadata_col,
            F.when(
                F.col("_ex.title").isNotNull() & (F.col("_ex.title") != ""),
                F.create_map(
                    F.lit("title"), F.col("_ex.title"),
                    F.lit("Content-Type"),
                    F.lit("text/html; charset=utf-8")),
            ).when(
                F.col("_ex").isNotNull(),
                F.create_map(F.lit("Content-Type"),
                             F.lit("text/html; charset=utf-8")),
            ).otherwise(F.lit(None).cast("map<string,string>")),
        ).drop("_ex")
    if status_col:
        out = out.withColumn(
            status_col,
            F.when(~ok, F.lit("invalid_too_large"))
            .when(F.coalesce(F.length(html), F.lit(0)) == 0, F.lit("partial"))
            .otherwise(F.lit("ok")),
        )
    return out
