"""Pure-Python BM25 oracle — the rank-identity ground truth.

Exact Lucene-default BM25 (the scoring the reference gets from OpenSearch,
which it delegates to — /root/reference/docs/indices/files.json declares the
analyzed fields; scoring params are OpenSearch defaults k1=1.2, b=0.75):

    idf(t)     = ln(1 + (N - df + 0.5) / (df + 0.5))
    tf_norm    = tf / (tf + k1 * (1 - b + b * dl / avgdl))
    score(d,q) = sum over unique query terms t present in d of idf(t)*tf_norm

All math in float64; the per-doc sum runs in ascending unique-term order so
the Spark engine (which sums in the same order) is bit-comparable, and ties
break by ascending doc key. SURVEY.md §7 "hard parts" (2).
"""

from __future__ import annotations

import math
from collections import Counter

from ipfs_search_spark import BM25_B, BM25_K1
from ipfs_search_spark.functions.tokenize import tokenize_str


class BM25Oracle:
    def __init__(self, docs: dict, k1: float = BM25_K1, b: float = BM25_B,
                 langs: dict | None = None):
        """docs: {doc_key: text}; langs: optional {doc_key: lang}."""
        self.k1, self.b = k1, b
        self.tf: dict = {}
        self.dl: dict = {}
        self.df: Counter = Counter()
        langs = langs or {}
        self.tokens: dict = {}
        for key, text in docs.items():
            toks = tokenize_str(text, langs.get(key, "en"))
            if not toks:
                continue
            c = Counter(toks)
            self.tf[key] = c
            self.dl[key] = len(toks)
            self.tokens[key] = toks
            for t in c:
                self.df[t] += 1
        self.n_docs = len(self.tf)
        self.avgdl = (sum(self.dl.values()) / self.n_docs) if self.n_docs else 0.0

    def idf(self, term: str) -> float:
        d = self.df.get(term, 0)
        return math.log(1.0 + (self.n_docs - d + 0.5) / (d + 0.5))

    def score(self, key, terms: list[str]) -> float:
        c = self.tf.get(key)
        if not c:
            return 0.0
        s = 0.0
        dl = self.dl[key]
        denom_k = self.k1 * (1.0 - self.b + self.b * dl / self.avgdl)
        for t in sorted(set(terms)):
            tf = c.get(t, 0)
            if tf:
                s += self.idf(t) * (tf / (tf + denom_k))
        return s

    def phrase_match(self, key, phrase: list[str], slop: int = 0) -> bool:
        """True iff one occurrence per phrase leaf can be chosen (distinct
        token positions — a repeated phrase term must use two occurrences)
        with max_i(pos_i - i) - min_i(pos_i - i) <= slop: Lucene
        sloppy-phrase acceptance; slop=0 degenerates to exact in-order
        adjacency. Deliberately brute-force (full product over position
        choices) so it shares no code shape with the engine's vectorized
        window scan."""
        toks = self.tokens.get(key)
        if not toks or len(phrase) == 0:
            return False
        from itertools import product
        pos = [[p for p, t in enumerate(toks) if t == term]
               for term in phrase]
        if any(not ps for ps in pos):
            return False
        # Anchor on term 0's occurrence: in any valid selection every
        # adjusted position lies within `slop` of term 0's adjusted
        # position, so the product only needs each term's positions inside
        # that window — bounding the enumeration at (2·slop+1)^(m-1) per
        # anchor instead of the full |positions|^m blow-up on long docs
        # with common terms (r5 review). Still a plain product over
        # explicit choices, sharing no code shape with the engine's
        # minimal-range window scan.
        for p0 in pos[0]:
            windowed = [[p0]]
            for i, ps in enumerate(pos[1:], 1):
                w = [p for p in ps if abs((p - i) - p0) <= slop]
                if not w:
                    break
                windowed.append(w)
            if len(windowed) != len(pos):
                continue
            for sel in product(*windowed):
                if len(set(sel)) != len(sel):
                    continue
                adj = [p - i for i, p in enumerate(sel)]
                if max(adj) - min(adj) <= slop:
                    return True
        return False

    def search(self, query_terms: list[str], k: int = 10,
               mode: str = "or", phrases: list | None = None,
               slops: list | None = None) -> list[tuple]:
        """Top-k (doc_key, score), OR semantics by default; 'and' requires
        every term present (query-side posting intersection, SURVEY.md §2 J6).
        phrases: required clauses — docs must contain every phrase adjacent,
        in order (or within its slop window when `slops` aligns with
        phrases); phrase terms must be included in query_terms by the caller
        (parse_query does this) so they also score."""
        uniq = sorted(set(query_terms))
        phrases = phrases or []
        slops = slops or [0] * len(phrases)
        hits = []
        for key, c in self.tf.items():
            present = [t for t in uniq if t in c]
            if not present:
                continue
            if mode == "and" and len(present) != len(uniq):
                continue
            if any(not self.phrase_match(key, ph, sl)
                   for ph, sl in zip(phrases, slops)):
                continue
            hits.append((key, self.score(key, uniq)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]


class BM25FOracle:
    """Multi-field ground truth: one BM25Oracle per field (Lucene scores
    each field with its own df/N/avgdl), combined per base term by
    'max' (OpenSearch query_string best_fields/dis_max default) or 'sum'
    (BM25F-lite), each field weighted by its boost. Per-doc totals sum over
    base terms in ascending order; within a term, fields are visited in
    ascending "field:term" order (the engine's fielded-term sort) so float
    op order matches bit-for-bit."""

    def __init__(self, field_docs: dict, k1: float = BM25_K1,
                 b: float = BM25_B):
        """field_docs: {field_name: {doc_key: text}}"""
        self.oracles = {f: BM25Oracle(d, k1, b)
                        for f, d in field_docs.items()}

    def score(self, key, terms: list[str], boosts: dict,
              combine: str = "max", tie_breaker: float = 0.0) -> float:
        total = 0.0
        for t in sorted(set(terms)):
            contribs = []
            for fld in sorted(boosts, key=lambda f: f"{f}:{t}"):
                o = self.oracles[fld]
                if key in o.tf and t in o.tf[key]:
                    contribs.append(boosts[fld] * o.idf(t) *
                                    (o.tf[key][t] /
                                     (o.tf[key][t] + o.k1 *
                                      (1.0 - o.b + o.b * o.dl[key] /
                                       o.avgdl))))
            if not contribs:
                continue
            if combine == "max":
                mx = max(contribs)
                if tie_breaker:
                    # dis_max tie_breaker blend: max + tb*(sum - max); the
                    # sum runs in the same ascending field:term order as
                    # the engine's add.reduceat (float-deterministic)
                    s = 0.0
                    for c in contribs:
                        s += c
                    total += mx + tie_breaker * (s - mx)
                else:
                    total += mx
            else:
                s = 0.0
                for c in contribs:
                    s += c
                total += s
        return total

    def phrase_match(self, key, phrase: list[str]) -> bool:
        """True iff ANY field's token sequence contains the phrase adjacent
        (multi-field phrase semantics)."""
        return any(o.phrase_match(key, phrase)
                   for o in self.oracles.values())

    def search(self, terms: list[str], boosts: dict, k: int = 10,
               combine: str = "max", mode: str = "or",
               phrases: list | None = None,
               tie_breaker: float = 0.0) -> list[tuple]:
        keys = set()
        for o in self.oracles.values():
            keys |= set(o.tf)
        uniq = sorted(set(terms))
        phrases = phrases or []
        hits = []
        for key in keys:
            present = [t for t in uniq
                       if any(key in o.tf and t in o.tf[key]
                              for o in self.oracles.values())]
            if not present:
                continue
            if mode == "and" and len(present) != len(uniq):
                continue
            if any(not self.phrase_match(key, ph) for ph in phrases):
                continue
            hits.append((key, self.score(key, uniq, boosts, combine,
                                         tie_breaker)))
        hits.sort(key=lambda x: (-x[1], x[0]))
        return hits[:k]
