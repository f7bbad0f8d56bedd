"""Query-string parser — the reference's search surface.

The reference exposes OpenSearch `query_string` queries
(/root/reference/docs/api.md:4-8): free terms, `field:value` filters,
range filters like `last-seen:>now-1M`, and `-term` negation. We parse to a
structured Query the scorer + Catalyst filters consume.

Supported grammar (superset of what the reference's own doc examples use):
  term            free text term (analyzed with the canonical tokenizer)
  "a b"           phrase: terms must appear ADJACENT in analyzed order
                  (positional index required); quoted phrases are required
                  clauses regardless of mode, and their terms also score
  -term           NOT term (left-anti on the term's doc set)
  -"a b"          NOT phrase (docs containing the exact phrase are excluded)
  field:value     equality filter (lang, status, url)
  -field:value    negated filter (must_not: matching docs excluded; docs
                  with a NULL field are kept)
  references.name:value              inbound-edge filter (any reference
                                     whose name matches — docs/api.md:4)
  last-seen:>X / last_seen:>now-1M   range filter; now-<n><d|h|M|y> relative
  size:>N, size:<N                   numeric range filter

A query with ONLY filters (no terms/phrases) is match-all-then-filter:
every doc passing the filters, constant score, ranked by doc_id.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field

from ipfs_search_spark.functions.tokenize import tokenize_str

_CJK_ANY_RE = re.compile(r"[一-鿿]")


def _analyze(tok: str) -> list[str]:
    """Query-side analyzer: CJK-containing tokens take the CJK branch (same
    analyzer the lang-aware index build used for zh docs)."""
    return tokenize_str(tok, "zh" if _CJK_ANY_RE.search(tok) else "en")

_FILTER_FIELDS = {"lang", "status", "url", "last-seen", "last_seen",
                  "first-seen", "first_seen", "size", "references.name"}
_REL_RE = re.compile(r"^now-(\d+)([dhMy])$")
_TOKEN_RE = re.compile(r'-?"[^"]*"|\S+')


@dataclass
class Filter:
    field: str
    op: str  # '=', '>', '<', '>=', '<='
    value: str
    # -field:value — excludes matching docs (docs where the field is NULL
    # count as non-matching, like a must_not clause)
    neg: bool = False


@dataclass
class Query:
    terms: list = field(default_factory=list)
    not_terms: list = field(default_factory=list)
    filters: list = field(default_factory=list)
    mode: str = "or"
    # phrases: each a list of analyzed terms that must appear adjacent, in
    # order (required clauses); not_phrases: docs with the phrase excluded
    phrases: list = field(default_factory=list)
    not_phrases: list = field(default_factory=list)
    # True when the query string had no scoring clause at all (filters only):
    # match-all semantics rather than empty results
    match_all: bool = False


def _norm_field(f: str) -> str:
    return f.replace("-", "_")


def parse_query(q: str, mode: str = "or") -> Query:
    out = Query(mode=mode)
    for raw in _TOKEN_RE.findall(q):
        neg = raw.startswith("-") and len(raw) > 1
        tok = raw[1:] if neg else raw
        if tok.startswith('"') and tok.endswith('"'):
            terms = _analyze(tok[1:-1])
            if not terms:
                continue
            if len(terms) == 1:  # one-word phrase degenerates to a term
                (out.not_terms if neg else out.terms).extend(terms)
            elif neg:
                out.not_phrases.append(terms)
            else:
                out.phrases.append(terms)
                out.terms.extend(terms)  # phrase terms also score
            continue
        if ":" in tok:
            fld, _, val = tok.partition(":")
            if fld.lower() in _FILTER_FIELDS:
                op = "="
                for cand in (">=", "<=", ">", "<"):
                    if val.startswith(cand):
                        op, val = cand, val[len(cand):]
                        break
                if fld.lower() == "references.name" and op != "=":
                    # parse-time so the error fires even on indexes whose
                    # documents table lacks a references column
                    raise QueryParseError(
                        "references.name supports only equality, got op "
                        f"{op!r}")
                out.filters.append(Filter(_norm_field(fld.lower()), op, val,
                                          neg=neg))
                continue
        terms = _analyze(tok)
        (out.not_terms if neg else out.terms).extend(terms)
    out.terms = sorted(set(out.terms))
    out.not_terms = sorted(set(out.not_terms) - set(out.terms))
    out.match_all = (not out.terms and not out.phrases
                     and bool(out.filters or out.not_terms
                              or out.not_phrases))
    return out


_TS_RE = re.compile(r"^\d{4}-\d{2}-\d{2}([ T]\d{2}:\d{2}(:\d{2})?)?$")
_INT_RE = re.compile(r"^-?\d+$")


class QueryParseError(ValueError):
    """Malformed filter value in a user query string."""


def filter_to_sql(flt: Filter) -> str:
    """Render one filter as a Spark SQL predicate over the documents table.
    Values are validated/escaped — user query strings must never inject SQL
    expressions (size:>abc would otherwise reach Catalyst as a column ref)."""
    fld = flt.field
    if fld in ("last_seen", "first_seen"):
        m = _REL_RE.match(flt.value)
        if m:
            n, unit = int(m.group(1)), m.group(2)
            iv = {"d": "DAYS", "h": "HOURS", "M": "DAYS", "y": "DAYS"}[unit]
            mult = {"d": 1, "h": 1, "M": 30, "y": 365}[unit]
            rhs = f"current_timestamp() - INTERVAL {n * mult} {iv}"
        elif _TS_RE.match(flt.value):
            rhs = f"timestamp'{flt.value}'"
        else:
            raise QueryParseError(
                f"invalid {fld} filter value {flt.value!r}: expected "
                "now-<n><d|h|M|y> or YYYY-MM-DD[ HH:MM[:SS]]")
    elif fld == "size":
        if not _INT_RE.match(flt.value):
            raise QueryParseError(
                f"invalid size filter value {flt.value!r}: expected integer")
        rhs = flt.value
    elif fld == "references.name":
        # inbound-edge filter (the reference API's `references.name:epub`,
        # /root/reference/docs/api.md:4): any element of the references
        # array-of-struct matches by name — equality only (a range over a
        # name makes no sense; reject rather than silently strip the op)
        if flt.op != "=":
            raise QueryParseError(
                f"references.name supports only equality, got op {flt.op!r}")
        v = flt.value.replace("'", "''")
        pred = f"exists(references, r -> r.name = '{v}')"
        return _maybe_negate(pred, flt.neg)
    else:
        rhs = "'" + flt.value.replace("'", "''") + "'"
    return _maybe_negate(f"{fld} {flt.op} {rhs}", flt.neg)


def _maybe_negate(pred: str, neg: bool) -> str:
    """-field:value = must_not: docs where the positive predicate is TRUE
    are excluded; NULL fields count as non-matching (kept), hence the
    coalesce — a bare NOT would drop NULL rows under SQL 3-valued logic."""
    if not neg:
        return pred
    return f"(NOT coalesce(({pred}), false))"
