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
from pyspark.sql.types import StringType

_COMMENT_RE = re.compile(r"(?s)<!--.*?-->")
_SCRIPT_RE = re.compile(r"(?is)<(script|style)\b[^>]*>.*?</\1\s*>")
_BLOCK_RE = re.compile(
    r"(?i)</?(?:p|div|br|h[1-6]|li|ul|ol|tr|td|th|table|title|head|body|html|"
    r"section|article|header|footer|blockquote|pre)\b[^>]*/?>"
)
_TAG_RE = re.compile(r"<[^>]*>")
_SPACES_RE = re.compile(r" +")


def extract_text_str(html: str) -> str:
    """Reference extraction semantics on one decoded document."""
    s = _COMMENT_RE.sub(" ", html)
    s = _SCRIPT_RE.sub(" ", s)
    s = _BLOCK_RE.sub("\n", s)
    s = _TAG_RE.sub("", s)
    s = html_mod.unescape(s)
    s = s.replace("\xa0", " ").replace("\r", "\n").replace("\t", " ")
    lines = (_SPACES_RE.sub(" ", ln).strip() for ln in s.split("\n"))
    return "\n".join(ln for ln in lines if ln)


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


def with_extracted_text(df, html_col: str = "html", out_col: str = "text",
                        max_bytes: int | None = None, status_col: str | None = None):
    """Attach extracted text; optionally classify oversize/empty rows.

    Mirrors the reference's ValidateMaxSize → invalid path
    (/root/reference/components/extractor/util.go:15-29, crawler/index.go:63-68):
    oversize docs are NOT extracted (text null) and get status
    'invalid_too_large'; empty html → status 'partial'; else 'ok'.
    The length gate is a JVM-side filter so Catalyst can prune before the UDF.
    """
    html = F.col(html_col)
    if max_bytes is None:
        extracted = extract_text_udf(html)
        return df.withColumn(out_col, extracted)
    ok = F.length(html) <= F.lit(max_bytes)
    out = df.withColumn(
        out_col, F.when(ok, extract_text_udf(html)).otherwise(F.lit(None))
    )
    if status_col:
        out = out.withColumn(
            status_col,
            F.when(~ok, F.lit("invalid_too_large"))
            .when(F.coalesce(F.length(html), F.lit(0)) == 0, F.lit("partial"))
            .otherwise(F.lit("ok")),
        )
    return out
