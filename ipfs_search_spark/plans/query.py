"""Top-k BM25 query engine over the sharded posting index.

Plan shape (SURVEY.md §3.3 Spark restatement):

  query strings ──parse──> (query_id, term) + idf (exact df from term_stats,
                            idf computed with python math.log so it is
                            bit-identical to the oracle)
  postings scan:  bucket IN (...) AND term IN (...)   ← partition + row-group
                                                        pruning, no full scan
  broadcast-join tiny query-term side onto postings
  groupBy(query_id, shard).applyInPandas(score_shard)  ← numpy decode + BM25,
       block-max pruning, per-shard top-k (docs are disjoint across shards so
       per-shard top-k merge is EXACT — same as Lucene's 20-shard search)
  window rank over (query_id) → global top-k  (candidates ≤ Q·S·k rows)
  broadcast-join doc_map for url display fields

Float determinism: per-doc sums accumulate in ascending-term order via a
stable argsort + np.add.reduceat — the identical operation order to
oracle.py, so scores are bit-comparable (SURVEY.md §7 hard part 2).

Block-max pruning (sound, never changes results — test-asserted):
  θ = k-th best single-term score of the highest-idf term within the shard
  (a valid lower bound on the shard's k-th best total). A block B of term t
  is skipped iff idf_t·ub(B) + Σ_{t'≠t} idf_{t'}·ub(t') < θ, where
  ub = tfnorm(max_tf, min_dl, avgdl) is the avgdl-at-query-time block bound:
  every doc in B then has total score < θ and cannot reach the top-k.

Phrase queries (positional index, the reference's `term_vector:
with_positions_offsets` — /root/reference/docs/indices/files.json:93):
quoted phrases are REQUIRED clauses; the scorer decodes each phrase term's
per-posting positions and verifies adjacency with a vectorized
(doc,pos)-key chain (_match_phrase) before the per-shard top-k cut —
doc-sharding keeps the check shard-local and exact. Pruning is disabled
within POSITIVE-phrase queries (a skipped block would lose position data).

Negation (`-term`, `-"a b"`) resolves IN-SHARD for scoring queries:
doc-sharding co-locates a doc's negative-term postings with its positive
ones, so 'negs'/'negps' rows ride the same pandas group, excluded docs
leave before the per-shard cut, and block-max pruning stays ON with θ
computed over surviving docs only — no external anti-join, no keep_all.
Match-all (filter/negation-only) queries keep the external anti-join path
(their candidates come from the documents scan, not the scorer).

Filter-only query strings are match-all-then-filter: every doc passing the
filters at constant score 1.0, ranked by doc_id — per-query
TakeOrderedAndProject when the query has no negative clauses.

Boolean trees (parser.bool_tree — nested AND/OR/NOT with ^boost): every
leaf term is fetched as a posting row (NOT-only leaves at idf 0 so they
gate without scoring); the scorer builds a per-doc presence bitmask over
the (doc, group) segments it already reduces, evaluates the tree with
vectorized numpy boolean ops (phrase leaves resolve through the positional
matcher), and filters before the per-shard top-k cut — doc-sharding makes
both the scores and the mask complete within a shard, so the cut stays
exact. Per-term ^boost multiplies idf (Lucene semantics). Pruning and
AND-required counts are per-query (a batch can mix flat OR, flat AND,
and boolean-tree queries).
"""

from __future__ import annotations

import math
import re

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType, IntegerType, LongType, StructField, StructType,
)

from ipfs_search_spark.catalog import TableIO
from ipfs_search_spark.plans.parser import (
    Expansion, Filter, Query, filter_to_sql, parse_query,
)

CANDIDATE_SCHEMA = StructType([
    StructField("query_id", IntegerType()),
    StructField("doc_id", LongType()),
    StructField("score", DoubleType()),
    # per-doc presence bitmask of the query's term/phrase tree leaves —
    # populated ONLY for boolean trees carrying filter leaves (the final
    # tree evaluation then happens JVM-side, where the doc metadata the
    # filter leaves need is joinable); 0 everywhere else
    StructField("bits", LongType()),
])


def idf(n_docs: int, df: int) -> float:
    """Lucene BM25 idf — must stay in python math.log (oracle parity)."""
    return math.log(1.0 + (n_docs - df + 0.5) / (df + 0.5))


def levenshtein(a: str, b: str) -> int:
    """Classic unit-cost edit distance (insert/delete/substitute) — the
    same definition as Spark's F.levenshtein and DuckDB's levenshtein(), so
    the cached driver-side fuzzy expansion, the distributed vocabulary
    scan, and the SQL oracle pick identical expansion sets."""
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def damerau_levenshtein(a: str, b: str) -> int:
    """True Damerau-Levenshtein (Lowrance-Wagner: insert / delete /
    substitute / transpose, where a transposition may span intervening
    edits — 'ca'→'abc' = 2). This is the definition DuckDB's
    damerau_levenshtein() implements, so in transpositions mode the cached
    driver-side expansion, the distributed scan's exact re-check, and the
    SQL oracle pick identical expansion sets (the same three-way identity
    the classic fuzzy path keys on levenshtein). Lucene's
    FuzzyQuery(transpositions=true) automaton is the adjacent-transposition
    family; on gap-transposition corner cases true DL admits strictly more
    terms — pinned deliberately to the DuckDB definition (COVERAGE.md
    deviations). Bounds used by the scan prefilter: DL ≤ lev ≤ 2·DL."""
    da: dict = {}
    la, lb = len(a), len(b)
    inf = la + lb
    d = [[inf] * (lb + 2) for _ in range(la + 2)]
    for i in range(la + 1):
        d[i + 1][1] = i
    for j in range(lb + 1):
        d[1][j + 1] = j
    for i in range(1, la + 1):
        db = 0
        for j in range(1, lb + 1):
            k = da.get(b[j - 1], 0)
            ll = db
            if a[i - 1] == b[j - 1]:
                cost = 0
                db = j
            else:
                cost = 1
            d[i + 1][j + 1] = min(
                d[i][j] + cost,                            # sub / match
                d[i + 1][j] + 1,                           # insert
                d[i][j + 1] + 1,                           # delete
                d[k][ll] + (i - k - 1) + 1 + (j - ll - 1))  # transpose
        da[a[i - 1]] = i
    return d[la + 1][lb + 1]


def _wildcard_regex(pattern: str) -> str:
    """Anchored regex for a [a-z0-9*?] wildcard pattern (parser-validated:
    alnum-only literals, so no escaping is needed)."""
    return "^" + pattern.replace("*", ".*").replace("?", ".") + "$"


_WILD_LIT_RE = re.compile(r"^[a-z0-9]*")


def _regex_literal_head(pat: str) -> str:
    """Leading literal run of a regexp usable as a StartsWith pruning
    prefix over the term-sorted vocabulary. Conservative: '' when the
    pattern has a top-level alternation (either branch may not carry the
    run), and the run's last char is dropped when a quantifier could make
    it optional (`ab*c` matches 'ac' — only 'a' is a safe prefix)."""
    if "|" in pat:
        return ""
    head = _WILD_LIT_RE.match(pat).group(0)
    if head and len(pat) > len(head) and pat[len(head)] in "*?{":
        head = head[:-1]
    return head


def _match_phrase(pos_data: dict, phrase: list, slop: int = 0):
    """Docs (int64 array) matching the phrase at the given slop.

    slop=0 (`"a b"`): exact adjacency, in order. slop=N (`"a b"~N`):
    Lucene query_string sloppy-phrase — the doc matches iff one occurrence
    per phrase leaf can be chosen (distinct token positions when a term
    repeats in the phrase) with
        max_i(pos_i - i) - min_i(pos_i - i) <= slop,
    the acceptance condition of Lucene's SloppyPhraseMatcher (slop as move
    edit distance). Reordering IS admitted once slop covers the
    displacement: `"b a"~2` matches "a b". For in-order selections the
    condition is algebraically identical to the span rule
    (last - first <= len-1+slop), so every in-order match of the old
    windowed form is preserved.

    pos_data: term → (el_doc_ids int64, el_positions int64) — one element
    per term OCCURRENCE. Both paths are vectorized over ALL docs at once:
    docs are densified and (doc, pos) packed into one int64 key
    (positions < 2^32 since dl < 2^31).

    slop=0 path: a GREEDY chain of sorted lower-bound probes — from each
    start position of term 0, repeatedly take the smallest occurrence of
    term i after the current position; greedy minimizes the chain's end,
    so a start matches iff its greedy span fits — exact, no backtracking.

    slop>0 path: minimal-range window over the union of ADJUSTED keys
    (pos - leaf_offset, shifted positive). All leaves' adjusted keys are
    merged and sorted; for each right edge r, left[r] is the smallest
    index with key[r]-key[left] <= slop (binary search; windows never
    cross docs because adjusted >= slop+1), and per-leaf prefix counts
    decide whether every leaf occurs in [left[r], r]. A window containing
    every leaf yields a selection with adjusted range <= slop and vice
    versa. Phrases with REPEATED terms additionally verify that distinct
    token positions can be assigned (tiny per-doc bipartite matching —
    distinct terms can never collide since a position holds one token)."""
    import numpy as np

    empty = np.empty(0, dtype=np.int64)
    arrs = []
    for t in phrase:
        if t not in pos_data:
            return empty
        arrs.append(pos_data[t])
    all_docs = np.unique(np.concatenate([a[0] for a in arrs]))
    # clamp: positions < 2^31 (dl bound), so any slop >= 2^30 admits every
    # in-doc selection a larger slop would — while keeping the packed
    # adjusted key (pos - i + slop + m) inside the low 32 bits. Lucene
    # accepts arbitrary int slop; semantics are identical under the clamp.
    s = np.int64(min(int(slop), 1 << 30))
    if s > 0:
        return _match_phrase_sloppy(np, all_docs, arrs, phrase, int(s))
    keys = []
    for el_ids, el_pos in arrs:
        dense = np.searchsorted(all_docs, el_ids).astype(np.int64)
        key = (dense << np.int64(32)) + el_pos
        key.sort()
        keys.append(key)
    cur = keys[0]
    start = cur
    for i in range(1, len(keys)):
        nxt = keys[i]
        # smallest occurrence of term i strictly after cur, same doc,
        # within the remaining window budget
        idx = np.searchsorted(nxt, cur + np.int64(1))
        idx_c = np.minimum(idx, max(nxt.size - 1, 0))
        ok = idx < nxt.size
        if nxt.size:
            cand = nxt[idx_c]
            ok &= (cand >> np.int64(32)) == (cur >> np.int64(32))
            ok &= cand - start <= np.int64(i) + s
            cur = cand
        cur, start = cur[ok], start[ok]
        if cur.size == 0:
            return empty
    return np.unique(all_docs[start >> np.int64(32)])


def _match_phrase_sloppy(np, all_docs, arrs, phrase: list, slop: int):
    """slop>0 body of _match_phrase (see its docstring for semantics)."""
    m = len(phrase)
    off = np.int64(slop + m)  # adjusted >= slop+1: windows stay in-doc
    keys_l, labels_l = [], []
    for i, (el_ids, el_pos) in enumerate(arrs):
        dense = np.searchsorted(all_docs, el_ids).astype(np.int64)
        keys_l.append((dense << np.int64(32)) + el_pos - np.int64(i) + off)
        labels_l.append(np.full(el_pos.size, i, dtype=np.int64))
    keys = np.concatenate(keys_l)
    labels = np.concatenate(labels_l)
    order = np.argsort(keys, kind="stable")
    keys, labels = keys[order], labels[order]
    left = np.searchsorted(keys, keys - np.int64(slop), side="left")
    pres = np.ones(keys.size, dtype=bool)
    for i in range(m):
        c = np.cumsum(labels == i)
        pres &= (c - np.where(left > 0, c[left - 1], 0)) > 0
    hit = np.unique(keys[pres] >> np.int64(32))
    if hit.size == 0:
        return np.empty(0, dtype=np.int64)
    if len(set(phrase)) == m:
        return np.unique(all_docs[hit])
    # repeated phrase terms: the presence test can satisfy two leaves of
    # the same term with ONE occurrence; verify a distinct assignment
    # exists per candidate doc (Hall via augmenting paths, sizes ~m).
    ok_docs = [d for d in hit.tolist()
               if _sloppy_repeats_doc_ok(
                   np, [arr[1][arr[0] == all_docs[d]] for arr in arrs],
                   slop)]
    if not ok_docs:
        return np.empty(0, dtype=np.int64)
    return np.unique(all_docs[np.asarray(ok_docs, dtype=np.int64)])


def _sloppy_repeats_doc_ok(np, pos_by_leaf: list, slop: int) -> bool:
    """One doc, repeated-term phrase: does a distinct-position selection
    with adjusted range <= slop exist? Scans maximal windows of the merged
    adjusted positions; each window that contains every leaf is checked
    with a tiny bipartite matching (leaf → raw token position)."""
    entries = sorted((int(p) - i, i, int(p))
                     for i, arr in enumerate(pos_by_leaf)
                     for p in arr.tolist())
    m = len(pos_by_leaf)
    adj = [e[0] for e in entries]
    lo = 0
    for hi in range(len(entries)):
        while adj[hi] - adj[lo] > slop:
            lo += 1
        window = entries[lo:hi + 1]
        cand: dict = {}
        for _, leaf, raw in window:
            cand.setdefault(leaf, set()).add(raw)
        if len(cand) < m:
            continue
        match: dict = {}

        def try_leaf(i: int, seen: set) -> bool:
            for r in cand[i]:
                if r in seen:
                    continue
                seen.add(r)
                if r not in match or try_leaf(match[r], seen):
                    match[r] = i
                    return True
            return False

        if all(try_leaf(i, set()) for i in range(m)):
            return True
    return False


def _filters_pred(p: Query, doc_cols) -> str | None:
    """Render a query's filters against this documents schema. Returns a
    SQL predicate, or None when the filters cannot match any doc — e.g.
    references.name on an index whose documents table has no references
    column (no doc matches the positive filter; its negation matches
    everything and is dropped)."""
    preds = []
    for f in p.filters:
        if f.field == "references.name" and "references" not in doc_cols:
            if f.neg:
                continue
            return None
        preds.append(filter_to_sql(f))
    return " AND ".join(preds) if preds else "true"


def _tree_leaves(node) -> set:
    """All string leaf keys of an encoded boolean tree."""
    if isinstance(node, str):
        return {node}
    out: set = set()
    for c in node[1:]:
        out |= _tree_leaves(c)
    return out


def _neg_term_leaves(node, bool_filters: dict, neg: bool = False) -> bool:
    """True when any term/phrase/expansion leaf sits in NEGATIVE context
    (odd NOT depth). Such trees are non-monotone in term presence, so the
    filter-only branch (which assumes all term leaves false) cannot be
    reconciled with a per-shard-cut candidate set — those queries keep the
    legacy keep_all + JVM-side tree evaluation."""
    if isinstance(node, str):
        return neg and node not in bool_filters
    if node[0] == "not":
        return _neg_term_leaves(node[1], bool_filters, not neg)
    return any(_neg_term_leaves(c, bool_filters, neg) for c in node[1:])


def _default_tree_const(node, bool_filters: dict) -> bool:
    """The tree's value at the DEFAULT valuation — every term/phrase/
    expansion leaf false, every filter leaf's positive form false (so a
    negated leaf reads true). This is what the tree evaluates to for a doc
    that contains no query term and matches no positive filter clause.
    The in-shard fast path requires False: then every possible match
    either holds a query term (a scorer candidate) or matches a positive
    filter clause (shipped to its shard by the allowed/bits scan) — no
    doc outside the cogroup can satisfy the query, so no unbounded
    documents-scan branch is needed (`a OR NOT lang:en` has default True:
    every non-english doc matches — that shape keeps the legacy path)."""
    if isinstance(node, str):
        flt = bool_filters.get(node)
        return bool(flt.neg) if flt is not None else False
    if node[0] == "not":
        return not _default_tree_const(node[1], bool_filters)
    vals = [_default_tree_const(c, bool_filters) for c in node[1:]]
    return all(vals) if node[0] == "and" else any(vals)


def _eval_bits_tree(node, fbitmap: dict, fconst: dict, bits):
    """Vectorized terms-false tree evaluation over filter-leaf bitmasks:
    term/phrase/expansion leaves read false, filter leaves read their
    (possibly inverted) bit — the in-shard form of branch B's predicate."""
    import numpy as np
    if isinstance(node, str):
        if node in fbitmap:
            bit, inv = fbitmap[node]
            v = ((bits >> np.int64(int(bit))) & 1).astype(bool)
            return ~v if inv else v
        if node in fconst:
            return np.full(bits.size, bool(fconst[node]), dtype=bool)
        return np.zeros(bits.size, dtype=bool)
    if node[0] == "not":
        return ~_eval_bits_tree(node[1], fbitmap, fconst, bits)
    acc = _eval_bits_tree(node[1], fbitmap, fconst, bits)
    for c in node[2:]:
        nxt = _eval_bits_tree(c, fbitmap, fconst, bits)
        acc = (acc & nxt) if node[0] == "and" else (acc | nxt)
    return acc


def _tree_sql(node, bool_filters: dict, bitmap: dict, doc_cols,
              terms_false: bool = False) -> str:
    """Compile an encoded boolean tree with filter leaves to a Spark SQL
    predicate over (candidate ⋈ documents) rows: term/phrase leaves become
    bit tests on the scorer-emitted `bits` column, filter leaves become
    their (validated, escaped) metadata predicates. terms_false=True
    renders the filter-only-satisfiable form (every term leaf false) —
    the predicate for docs with no query term at all."""
    if isinstance(node, str):
        flt = bool_filters.get(node)
        if flt is not None:
            base = ("references" if flt.field == "references.name"
                    else flt.field)
            if base not in doc_cols:
                return "true" if flt.neg else "false"
            # coalesce: a NULL metadata value means the leaf does not
            # match (and under NOT, that the doc is kept) — Lucene
            # must/must_not semantics, not SQL 3-valued logic
            return f"coalesce(({filter_to_sql(flt)}), false)"
        if terms_false:
            return "false"
        b = bitmap.get(node)
        if b is None:  # term absent from the whole index
            return "false"
        return f"((bits & {1 << b}) != 0)"
    op = node[0]
    if op == "not":
        return ("(NOT " +
                _tree_sql(node[1], bool_filters, bitmap, doc_cols,
                          terms_false) + ")")
    glue = " AND " if op == "and" else " OR "
    return ("(" + glue.join(_tree_sql(c, bool_filters, bitmap, doc_cols,
                                      terms_false)
                            for c in node[1:]) + ")")


def _make_scorer(k: int, mode: str, prune: bool, keep_all: bool,
                 combine: str = "sum", phrase_mode: str | None = None,
                 cogroup: bool = False, tie_breaker: float = 0.0):
    """Scorer for one (query, shard) group.

    cogroup=True returns a TWO-argument function for
    groupBy().cogroup().applyInPandas: the right side carries the
    (query_id, shard, doc_id) rows ALLOWED by the query's conjunct
    filters (`term lang:de`), pre-routed to the doc's shard
    (pmod(xxhash64(doc_id), n_shards) — the index's own doc-shard
    function). A query flagged `flt` restricts to that set IN-SHARD —
    before θ, the AND/phrase gates and the per-shard top-k cut — so
    filtered queries keep the cut and block-max pruning ON instead of
    shipping their full candidate doc set to the rank window (r3 verdict).
    Exact, not approximate: the allowed set is the filter's true doc set,
    so this is the semi-join moved inside the scorer.

    Rows are (possibly fielded) posting lists: each carries idf, boost,
    avgdl (per-field), and a `group` id — the base query term the row
    belongs to. Per doc: contributions are reduced WITHIN a group
    (max → OpenSearch best_fields/dis_max; sum → BM25F-lite) and then
    summed across groups in ascending group order (float-deterministic,
    matching the oracle). Single-field indexes have one row per group, so
    both combines degenerate to the original exact BM25 sum.

    phrase_mode (reads the per-query `phrase_json` column — a JSON list of
    phrase GROUPS; each group is a list of VARIANTS; each variant a list of
    posting terms. A doc satisfies a group iff it matches ANY variant
    (fielded search expands one quoted phrase into one variant per field);
    single-field indexes have exactly one variant per group):
      'all' — positive path: docs must satisfy EVERY group (quoted phrases
              are required clauses); applied before the per-shard top-k cut,
              so the cut stays sound. Disables block pruning for the group
              (skipped blocks would lose position data and bias θ).
      'any' — negative path: emit docs satisfying ANY group (the caller
              anti-joins them away); scores are not meaningful."""
    def _score(pdf: pd.DataFrame, allowed=None, fmap=None) -> pd.DataFrame:
        import json as _json

        import numpy as np
        from ipfs_search_spark.functions.codec import (
            block_ub, decode_block, decode_block_positions, tfnorm,
        )

        qid = int(pdf["query_id"].iloc[0])
        # keep_all is PER-QUERY (the qterms keep_all column): only queries
        # WITH filters skip the per-shard top-k cut (their filter applies
        # after scoring, so a pre-filter cut could drop surviving docs).
        # One filtered query in a batch must not disable the cut for the
        # others — that ships every unfiltered query's full candidate doc
        # set through the rank window (r2 verdict). The factory arg stays
        # as a global override for the match-all negation probes.
        keep_all_q = keep_all or bool(
            "keep_all" in pdf.columns and pdf["keep_all"].iloc[0])
        pdf = pdf.sort_values("term", kind="stable")
        # In-scorer negation (doc-sharding co-locates a doc's negative-term
        # postings with its positive ones): 'negs' rows exclude their docs,
        # 'negps' rows exclude phrase matches — resolved HERE so the
        # per-shard top-k cut stays sound and block-max pruning stays ON
        # for negation queries (θ is computed over non-excluded docs only).
        if "kind" in pdf.columns:
            negs_pdf = pdf[pdf["kind"] == "negs"]
            negps_pdf = pdf[pdf["kind"] == "negps"]
            pdf = pdf[pdf["kind"] == "pos"]
        else:
            negs_pdf = negps_pdf = pdf.iloc[0:0]
        if len(pdf) == 0:
            return pd.DataFrame({"query_id": [], "doc_id": [],
                                 "score": [], "bits": []}
                                ).astype({"query_id": "int32",
                                          "doc_id": "int64",
                                          "score": "float64",
                                          "bits": "int64"})
        n_rows = len(pdf)
        phrases: list = []
        if phrase_mode is not None and "phrase_json" in pdf.columns:
            pj = pdf["phrase_json"].iloc[0]
            if pj:
                phrases = _json.loads(pj)
        # boolean-tree spec (parser.bool_tree lowered to group keys): the
        # query's docs must satisfy the tree over per-group presence bits
        bool_spec = None
        if "bool_json" in pdf.columns:
            bj = pdf["bool_json"].iloc[0]
            if bj:
                bool_spec = _json.loads(bj)
        # each phrase group is [slop, [variant, ...]] (variant = term list)
        phrase_terms = {t for grp in phrases for var in grp[1] for t in var}
        if bool_spec:
            phrase_terms |= {t for grp in bool_spec["phrases"].values()
                             for var in grp[1] for t in var}
        pos_acc: dict = {t: [] for t in phrase_terms}

        # excluded docs of this shard: NOT-term postings + NOT-phrase matches
        excl = None
        if len(negs_pdf) or len(negps_pdf):
            excl_parts = []
            for blocks in negs_pdf["blocks"]:
                for blk in blocks:
                    excl_parts.append(decode_block(blk)[0])
            negp_groups: list = []
            if len(negps_pdf):
                nj = negps_pdf["phrase_json"].iloc[0]
                if nj:
                    negp_groups = _json.loads(nj)
            if negp_groups:
                np_terms = {t for g in negp_groups
                            for var in g[1] for t in var}
                acc: dict = {t: [] for t in np_terms}
                for term_n, blocks in zip(negps_pdf["term"],
                                          negps_pdf["blocks"]):
                    if term_n not in np_terms:
                        continue
                    for blk in blocks:
                        ids_b, tfs_b, _ = decode_block(blk)
                        acc[term_n].append(
                            (ids_b, tfs_b,
                             decode_block_positions(blk, tfs_b)))
                pos_data_n = {}
                for t, lst in acc.items():
                    if lst:
                        ids_c = np.concatenate([x[0] for x in lst])
                        tfs_c = np.concatenate([x[1] for x in lst])
                        pos_c = np.concatenate([x[2] for x in lst])
                        pos_data_n[t] = (np.repeat(ids_c, tfs_c), pos_c)
                for slop_n, vars_n in negp_groups:
                    mlist = [_match_phrase(pos_data_n, var, slop_n)
                             for var in vars_n]
                    if mlist:
                        excl_parts.append(
                            np.unique(np.concatenate(mlist)))
            if excl_parts:
                excl = np.unique(np.concatenate(excl_parts))
        avgdls = pdf["avgdl"].to_numpy(dtype=np.float64)
        idfs = pdf["idf"].to_numpy(dtype=np.float64) * \
            pdf["boost"].to_numpy(dtype=np.float64)
        groups_sorted = sorted(set(pdf["group"]))
        group_of = {g: i for i, g in enumerate(groups_sorted)}
        row_group = pdf["group"].map(group_of).to_numpy(dtype=np.int64)
        n_groups = len(groups_sorted)
        term_max_ub = np.array(
            [i * max((float(block_ub(b["max_tf"], b["min_dl"], a))
                      for b in blks), default=0.0)
             for i, a, blks in zip(idfs, avgdls, pdf["blocks"])],
            dtype=np.float64)
        # a group's max possible contribution (for pruning bounds). With a
        # dis_max tie_breaker the blended score max + tb*(sum - max) can
        # exceed the max bound but never the sum bound, so bounds fall
        # back to sum-combine (sound, merely looser)
        group_ub = np.zeros(n_groups)
        if combine == "max" and tie_breaker == 0.0:
            np.maximum.at(group_ub, row_group, term_max_ub)
        else:
            np.add.at(group_ub, row_group, term_max_ub)

        # Position-lazy two-pass for flat positive-phrase queries: decode
        # the PHRASE terms first (positions included), compute the
        # phrase-satisfying doc set P, then skip any free term's block
        # whose docid range contains no member of P — such docs can never
        # reach the result, and every block holding a P-doc is decoded in
        # full, so surviving scores are exact. At scale a rare phrase makes
        # P tiny and the common free terms' posting lists go untouched.
        phrase_P_u = None
        matched_pre = None
        decoded_rows: dict[int, list] = {}
        if phrases and phrase_mode == "all":
            for row_i in range(n_rows):
                t_name = pdf["term"].iloc[row_i]
                if t_name not in phrase_terms:
                    continue
                dec = []
                for blk in pdf["blocks"].iloc[row_i]:
                    ids_b, tfs_b, dls_b = decode_block(blk)
                    dec.append((ids_b, tfs_b, dls_b))
                    pos_acc[t_name].append(
                        (ids_b, tfs_b, decode_block_positions(blk, tfs_b)))
                decoded_rows[row_i] = dec
            pos_data0: dict = {}
            for t, lst in pos_acc.items():
                if lst:
                    ids_c = np.concatenate([x[0] for x in lst])
                    tfs_c = np.concatenate([x[1] for x in lst])
                    pos_c = np.concatenate([x[2] for x in lst])
                    pos_data0[t] = (np.repeat(ids_c, tfs_c), pos_c)
            matched_pre = [
                (np.unique(np.concatenate(
                    [_match_phrase(pos_data0, var, grp[0])
                     for var in grp[1]]))
                 if grp[1] else np.empty(0, np.int64))
                for grp in phrases
            ]
            P = matched_pre[0]
            for m in matched_pre[1:]:
                P = np.intersect1d(P, m, assume_unique=True)
            phrase_P_u = np.sort(P.view(np.uint64))

        # per-query AND-required group count (0 = OR semantics); pruning is
        # per-query too — sound only for flat-OR, non-phrase, non-boolean
        expected = int(pdf["n_groups"].iloc[0])
        theta = 0.0
        solo = None
        best_i = None
        if prune and n_rows > 1 and not keep_all_q and expected == 0 \
                and not phrases and bool_spec is None:
            best_i = int(np.argmax(term_max_ub))
            ids_l, sc_l = [], []
            for blk in pdf["blocks"].iloc[best_i]:
                ids_b, tfs_b, dls_b = decode_block(blk)
                ids_l.append(ids_b)
                sc_l.append(idfs[best_i] *
                            tfnorm(tfs_b, dls_b, avgdls[best_i]))
            solo = (np.concatenate(ids_l) if ids_l else np.empty(0, np.int64),
                    np.concatenate(sc_l) if sc_l else np.empty(0))
            if excl is not None and solo[0].size:
                kp = ~np.isin(solo[0], excl)
                solo = (solo[0][kp], solo[1][kp])
            if allowed is not None and solo[0].size:
                # θ must be a lower bound over FILTER-SURVIVING docs only —
                # an unfiltered θ would over-prune blocks holding allowed
                # docs that belong in the top-k
                kp = np.isin(solo[0], allowed)
                solo = (solo[0][kp], solo[1][kp])
            if solo[1].size >= k:
                theta = float(np.partition(solo[1], -k)[-k])

        ids_parts, sc_parts, grp_parts = [], [], []
        for row_i in range(n_rows):
            blocks = pdf["blocks"].iloc[row_i]
            t_idf = idfs[row_i]
            g = row_group[row_i]
            if row_i == best_i and solo is not None:
                ids_parts.append(solo[0]); sc_parts.append(solo[1])
                grp_parts.append(np.full(solo[0].size, g, dtype=np.int64))
                continue
            if row_i in decoded_rows:
                # phrase term — decoded (with positions) in pass 1
                for ids_b, tfs_b, dls_b in decoded_rows[row_i]:
                    ids_parts.append(ids_b)
                    sc_parts.append(t_idf *
                                    tfnorm(tfs_b, dls_b, avgdls[row_i]))
                    grp_parts.append(np.full(ids_b.size, g, dtype=np.int64))
                continue
            # other groups can add at most their group bound; this row's own
            # group can add at most the group bound (covers max-combine where
            # siblings don't stack)
            others_ub = float(group_ub.sum() - group_ub[g])
            # own-group headroom beyond this block: sibling field-rows only
            own_extra = float(group_ub[g] - term_max_ub[row_i]) \
                if (combine == "sum" or tie_breaker > 0.0) else 0.0
            blocks = list(blocks)
            for bi, blk in enumerate(blocks):
                if phrase_P_u is not None:
                    # block docids ascend in unsigned order across blocks;
                    # skip if no phrase-matching doc falls in this block's
                    # [first_doc, next_first) range
                    lo = np.uint64(int(blk["first_doc_id"]) & ((1 << 64) - 1))
                    j0 = int(np.searchsorted(phrase_P_u, lo))
                    if bi + 1 < len(blocks):
                        hi = np.uint64(
                            int(blocks[bi + 1]["first_doc_id"])
                            & ((1 << 64) - 1))
                        j1 = int(np.searchsorted(phrase_P_u, hi))
                    else:
                        j1 = phrase_P_u.size
                    if j0 == j1:
                        continue
                ub = t_idf * float(block_ub(blk["max_tf"], blk["min_dl"],
                                            avgdls[row_i]))
                bound = (max(ub, float(group_ub[g]))
                         if combine == "max" and tie_breaker == 0.0
                         else ub + own_extra)
                if theta > 0.0 and bound + others_ub < theta:
                    continue
                ids_b, tfs_b, dls_b = decode_block(blk)
                ids_parts.append(ids_b)
                sc_parts.append(t_idf * tfnorm(tfs_b, dls_b, avgdls[row_i]))
                grp_parts.append(np.full(ids_b.size, g, dtype=np.int64))
                t_name = pdf["term"].iloc[row_i]
                if t_name in phrase_terms:
                    pos_acc[t_name].append(
                        (ids_b, tfs_b, decode_block_positions(blk, tfs_b)))
        if not ids_parts:
            return pd.DataFrame({"query_id": [], "doc_id": [],
                                 "score": [], "bits": []}
                                ).astype({"query_id": "int32",
                                          "doc_id": "int64",
                                          "score": "float64",
                                          "bits": "int64"})
        ids = np.concatenate(ids_parts)
        scores = np.concatenate(sc_parts)
        grps = np.concatenate(grp_parts)
        # stable lexsort: primary doc (unsigned), secondary group — within a
        # (doc, group) run the original ascending fielded-term order survives
        order = np.lexsort((grps, ids.view(np.uint64)))
        ids, scores, grps = ids[order], scores[order], grps[order]
        # (doc, group) segments
        new_doc = np.concatenate(([True], ids[1:] != ids[:-1]))
        new_seg = new_doc | np.concatenate(([True], grps[1:] != grps[:-1]))
        seg_idx = np.flatnonzero(new_seg)
        if combine == "max":
            seg_scores = np.maximum.reduceat(scores, seg_idx)
            if tie_breaker > 0.0:
                # OpenSearch dis_max tie_breaker: max + tb*(sum - max);
                # the sum accumulates in the same ascending fielded-term
                # order as the oracle (float-deterministic)
                seg_sums = np.add.reduceat(scores, seg_idx)
                seg_scores = seg_scores + tie_breaker * (seg_sums
                                                         - seg_scores)
        else:
            seg_scores = np.add.reduceat(scores, seg_idx)
        seg_ids = ids[seg_idx]
        # doc segments over the (doc, group) reduction
        doc_start = np.flatnonzero(
            np.concatenate(([True], seg_ids[1:] != seg_ids[:-1])))
        doc_ids = seg_ids[doc_start]
        doc_scores = np.add.reduceat(seg_scores, doc_start)
        if (excl is not None or allowed is not None) and doc_ids.size:
            # negation (and the filter-allowed restriction) resolve
            # in-shard: excluded docs leave before the AND/phrase filters
            # and the per-shard top-k cut (boolean trees never carry
            # in-scorer negation — the mask handles NOT there)
            keep_x = np.ones(doc_ids.size, dtype=bool)
            if excl is not None:
                keep_x &= ~np.isin(doc_ids, excl)
            if allowed is not None:
                keep_x &= np.isin(doc_ids, allowed)
            doc_ids, doc_scores = doc_ids[keep_x], doc_scores[keep_x]
            if not keep_x.all() and expected != 0:
                # the (doc,group) segments feed the AND counts — filter them
                # consistently with the surviving docs
                seg_keep = np.ones(seg_ids.size, dtype=bool)
                if excl is not None:
                    seg_keep &= ~np.isin(seg_ids, excl)
                if allowed is not None:
                    seg_keep &= np.isin(seg_ids, allowed)
                seg_ids = seg_ids[seg_keep]
                doc_start = (np.flatnonzero(np.concatenate(
                    ([True], seg_ids[1:] != seg_ids[:-1])))
                    if seg_ids.size else np.empty(0, np.int64))
        if expected != 0:
            # AND: required count comes from the QUERY (n_groups column),
            # not from the rows present in this shard — a shard lacking one
            # query term entirely must yield zero AND matches. A NEGATIVE
            # n_groups is minimum_should_match: at least |n| distinct
            # groups must match (OR with a floor — OpenSearch query_string
            # minimum_should_match); scoring stays the sum of matches
            doc_group_counts = np.add.reduceat(
                np.ones(seg_ids.size, dtype=np.int64), doc_start)
            keep = (doc_group_counts == expected if expected > 0
                    else doc_group_counts >= -expected)
            doc_ids, doc_scores = doc_ids[keep], doc_scores[keep]
        pos_data: dict = {}
        if phrase_terms:
            for t, lst in pos_acc.items():
                if lst:
                    ids_c = np.concatenate([x[0] for x in lst])
                    tfs_c = np.concatenate([x[1] for x in lst])
                    pos_c = np.concatenate([x[2] for x in lst])
                    pos_data[t] = (np.repeat(ids_c, tfs_c), pos_c)
        if phrases:
            # a group matches a doc iff ANY of its variants matches
            # (precomputed in the two-pass path)
            matched = matched_pre if matched_pre is not None else [
                (np.unique(np.concatenate(
                    [_match_phrase(pos_data, var, grp[0])
                     for var in grp[1]]))
                 if grp[1] else np.empty(0, np.int64))
                for grp in phrases
            ]
            if phrase_mode == "any":
                docs_any = (np.unique(np.concatenate(matched)) if matched
                            else np.empty(0, np.int64))
                return pd.DataFrame({
                    "query_id": np.full(docs_any.size, qid, dtype=np.int32),
                    "doc_id": docs_any.astype(np.int64),
                    "score": np.zeros(docs_any.size, dtype=np.float64),
                    "bits": np.zeros(docs_any.size, dtype=np.int64),
                })
            mask = np.ones(doc_ids.size, dtype=bool)
            for m in matched:
                mask &= np.isin(doc_ids, m)
            doc_ids, doc_scores = doc_ids[mask], doc_scores[mask]
        if bool_spec is not None and (doc_ids.size or fmap is not None):
            # presence matrix over the (doc, group) segments, then evaluate
            # the boolean tree vectorized; phrase keys resolve through the
            # positional matcher (any field variant satisfies the phrase).
            # Scores stay the sum of matched positive clauses — negated
            # leaves carry idf 0, so they gate matching without scoring.
            # NOTE the gate above: the block must still run with ZERO
            # surviving candidates whenever filter-leaf docs were shipped
            # (fmap) — a conjunct filter that empties a shard's term
            # candidates must not suppress branch B's filter-only matches.
            M = np.zeros((doc_ids.size, n_groups), dtype=bool)
            if doc_ids.size:
                seg_groups = grps[seg_idx]
                seg_ids_b = ids[seg_idx]  # pre-filter segments: a seg_id
                # the allowed-restriction dropped must not alias another
                # doc's row
                du = doc_ids.view(np.uint64)
                su = seg_ids_b.view(np.uint64)
                rows_idx = np.searchsorted(du, su)
                rows_c = np.minimum(rows_idx, max(doc_ids.size - 1, 0))
                valid = du[rows_c] == su
                M[rows_c[valid], seg_groups[valid]] = True
            ph_pres = {}
            for key, (slop_b, vars_) in bool_spec["phrases"].items():
                mlist = [_match_phrase(pos_data, var, slop_b)
                         for var in vars_]
                md = (np.unique(np.concatenate(mlist)) if mlist
                      else np.empty(0, np.int64))
                ph_pres[key] = np.isin(doc_ids, md)
            # filter-leaf truth values (in-shard tree evaluation): the
            # cogroup shipped each candidate's POSITIVE-form leaf bitmask;
            # docs absent from the map satisfied no positive leaf
            fbitmap = bool_spec.get("fbitmap") or {}
            fconst = bool_spec.get("fconst") or {}
            fvec = np.zeros(doc_ids.size, dtype=np.int64)
            if fbitmap and fmap is not None and doc_ids.size \
                    and fmap[0].size:
                pos_f = np.searchsorted(fmap[0], doc_ids)
                pos_c = np.minimum(pos_f, fmap[0].size - 1)
                hit = fmap[0][pos_c] == doc_ids
                fvec[hit] = fmap[1][pos_c[hit]]

            def _ev(node):
                if isinstance(node, str):
                    if node in ph_pres:
                        return ph_pres[node]
                    if node in fbitmap:
                        bit, inv = fbitmap[node]
                        v = ((fvec >> np.int64(bit)) & 1).astype(bool)
                        return ~v if inv else v
                    if node in fconst:
                        return np.full(doc_ids.size, fconst[node],
                                       dtype=bool)
                    gi = group_of.get(node)
                    if gi is None:  # term absent from the whole index
                        return np.zeros(doc_ids.size, dtype=bool)
                    return M[:, gi]
                op = node[0]
                if op == "not":
                    return ~_ev(node[1])
                acc = _ev(node[1])
                for c in node[2:]:
                    acc = (acc & _ev(c)) if op == "and" else (acc | _ev(c))
                return acc

            bitmap = bool_spec.get("bitmap")
            if bitmap:
                # tree has FILTER leaves: the scorer cannot decide the tree
                # (no doc metadata here) — emit the term/phrase presence
                # bits instead and let the plan evaluate the full tree
                # JVM-side after joining the metadata in. No cut here
                # (keep_all rides the qterms column for these queries).
                bits_vec = np.zeros(doc_ids.size, dtype=np.int64)
                for key, b in bitmap.items():
                    if key in ph_pres:
                        pres = ph_pres[key]
                    else:
                        gi = group_of.get(key)
                        if gi is None:  # absent from the whole index
                            continue
                        pres = M[:, gi]
                    bits_vec |= pres.astype(np.int64) << np.int64(b)
                return pd.DataFrame({
                    "query_id": np.full(doc_ids.size, qid, dtype=np.int32),
                    "doc_id": doc_ids.astype(np.int64),
                    "score": doc_scores.astype(np.float64),
                    "bits": bits_vec,
                })
            pre_mask_docs = doc_ids
            bmask = _ev(bool_spec["tree"])
            doc_ids, doc_scores = doc_ids[bmask], doc_scores[bmask]
            if fbitmap or fconst:
                # constant-score floor for filter-leaf trees: a doc whose
                # positive term leaves contributed nothing (matched via a
                # filter leaf / NOT-only probes) scores the OpenSearch
                # constant 1.0 — identical to the JVM-side floor the
                # legacy bits path applies after its metadata join
                doc_scores = np.where(doc_scores > 0.0, doc_scores, 1.0)
                # branch B IN-SHARD: shipped filter-leaf docs with no
                # query-term posting here that satisfy the terms-false
                # tree match at the constant 1.0. (Candidates — even
                # tree-false ones — are excluded: a term-doc must never
                # re-enter at the constant after the real evaluation.)
                if fmap is not None:
                    bd, bb = fmap
                    bsel = ~np.isin(bd, pre_mask_docs)
                    if allowed is not None:
                        bsel &= np.isin(bd, allowed)
                    bd2, bb2 = bd[bsel], bb[bsel]
                    if bd2.size:
                        okb = _eval_bits_tree(bool_spec["tree"], fbitmap,
                                              fconst, bb2)
                        bd2 = bd2[okb]
                        doc_ids = np.concatenate([doc_ids, bd2])
                        doc_scores = np.concatenate(
                            [doc_scores, np.ones(bd2.size)])
        if not keep_all_q and doc_ids.size > k:
            # exact top-k by (score DESC, doc_id ASC) — the same tie-break
            # as the global rank window and the oracle; a plain argpartition
            # on score breaks exact-score ties arbitrarily and can drop the
            # lower-doc_id doc the final ranking would have kept
            sel = np.lexsort((doc_ids, -doc_scores))[:k]
            doc_ids, doc_scores = doc_ids[sel], doc_scores[sel]
        return pd.DataFrame({
            "query_id": np.full(doc_ids.size, qid, dtype=np.int32),
            "doc_id": doc_ids.astype(np.int64),
            "score": doc_scores.astype(np.float64),
            "bits": np.zeros(doc_ids.size, dtype=np.int64),
        })

    if not cogroup:
        # single-argument form (a 2-arg function would receive the group
        # KEY as its first argument from applyInPandas)
        def score_shard(pdf: pd.DataFrame) -> pd.DataFrame:
            return _score(pdf)
        return score_shard

    def score_cogroup(left: pd.DataFrame, right: pd.DataFrame):
        import json as _json

        import numpy as np

        empty = pd.DataFrame({"query_id": [], "doc_id": [],
                              "score": [], "bits": []}
                             ).astype({"query_id": "int32",
                                       "doc_id": "int64",
                                       "score": "float64",
                                       "bits": "int64"})
        # carrier row (fast filter-leaf trees): delivers the tree spec +
        # conjunct flag so shards with NO term postings still emit their
        # filter-only matches
        docs_r = right
        spec_json, carrier_allow = "", 0
        if "spec" in right.columns and len(right):
            cmask = right["spec"].astype(str) != ""
            if cmask.any():
                crow = right[cmask].iloc[0]
                spec_json = str(crow["spec"])
                carrier_allow = int(crow["allow"])
            docs_r = right[~cmask]
        if len(left) == 0:
            if not spec_json or not len(docs_r):
                # allowed-only group of a conjunct-filtered query: no
                # query-term posting here — nothing can score
                return empty
            # B-only: filter-only matches where the query has no postings
            spec = _json.loads(spec_json)
            dids = docs_r["doc_id"].to_numpy(dtype=np.int64)
            fb = docs_r["fbits"].to_numpy(dtype=np.int64)
            if carrier_allow:
                ok_a = docs_r["allow"].to_numpy(dtype=np.int64) == 1
                dids, fb = dids[ok_a], fb[ok_a]
            okb = _eval_bits_tree(spec["tree"], spec.get("fbitmap") or {},
                                  spec.get("fconst") or {}, fb)
            dids = np.sort(dids[okb])
            if dids.size > k:
                # all tie at the constant 1.0: the global rank keeps the
                # k lowest doc_ids (signed asc — same as the rank window)
                dids = dids[:k]
            return pd.DataFrame({
                "query_id": np.full(
                    dids.size, int(right["query_id"].iloc[0]),
                    dtype=np.int32),
                "doc_id": dids.astype(np.int64),
                "score": np.ones(dids.size, dtype=np.float64),
                "bits": np.zeros(dids.size, dtype=np.int64),
            })
        allowed = None
        if "flt" in left.columns and bool(left["flt"].iloc[0]):
            mask = (docs_r["allow"] == 1) if "allow" in docs_r.columns \
                else slice(None)
            allowed = np.unique(
                docs_r.loc[mask, "doc_id"].to_numpy(dtype=np.int64))
        fmap = None
        if "fbits" in docs_r.columns and len(docs_r):
            rr = docs_r[docs_r["fbits"] != 0]
            if len(rr):
                fd = rr["doc_id"].to_numpy(dtype=np.int64)
                fb = rr["fbits"].to_numpy(dtype=np.int64)
                o = np.argsort(fd)
                fmap = (fd[o], fb[o])
        return _score(left, allowed, fmap)
    return score_cogroup


class Searcher:
    """Reusable query handle: caches the (tiny, static) index_stats and the
    postings/term_stats/documents DataFrames so repeated queries skip the
    per-call setup jobs. `search()` below is the one-shot convenience form."""

    # vocabularies up to this size are cached driver-side: one job at init,
    # then per-query idf/bucket lookups are dictionary hits instead of a
    # filtered scan+collect job per search call
    TERM_CACHE_MAX = 500_000
    # prefix queries (`te*`) expand to at most this many vocabulary terms —
    # Lucene's max_expansions bound; the lexicographically FIRST matches win
    # (deterministic, and exactly the order the term-sorted range scan
    # yields them)
    MAX_PREFIX_EXPANSIONS = 50

    def __init__(self, spark: SparkSession, io: TableIO,
                 cache_terms: bool | None = None,
                 include_segments: bool | None = None,
                 fuzzy_transpositions: bool = False,
                 fuzzy_prefix_length: int = 0):
        """fuzzy_transpositions: OpenSearch query_string's
        `fuzzy_transpositions` request option — fuzzy clauses expand by
        Damerau-Levenshtein (an adjacent swap costs 1) instead of classic
        edit distance. Off by default: classic distance is the definition
        shared bit-for-bit by F.levenshtein and DuckDB levenshtein();
        transpositions mode keeps its own three-way identity through
        damerau_levenshtein (python / Arrow-batched re-check / DuckDB).

        fuzzy_prefix_length: OpenSearch `fuzzy_prefix_length` (Lucene
        FuzzyQuery prefixLength) — fuzzy candidates must carry the base
        term's first N characters verbatim, which turns the
        full-vocabulary fuzzy scan into a StartsWith-pruned range scan
        over the term-sorted vocabulary (the at-scale configuration; 0 =
        Lucene default, whole-vocabulary automaton analogue).

        include_segments: also search `posting_segments` (incremental
        micro-batch appends, streaming/ingest_stream.py). Segments hold only
        NEW docs (anti-joined at ingest), so the union's doc sets are
        disjoint and exact global stats are recomputed over the union —
        scores match a from-scratch rebuild bit-for-bit. Default: on when
        the segments table exists."""
        self.spark, self.io = spark, io
        self.fuzzy_transpositions = bool(fuzzy_transpositions)
        self.fuzzy_prefix_length = int(fuzzy_prefix_length)
        if self.fuzzy_prefix_length < 0:
            raise ValueError("fuzzy_prefix_length must be >= 0")
        self.documents = io.read("documents")
        has_base = io.exists("postings")
        if include_segments is None:
            include_segments = io.exists("posting_segments")
        if include_segments and io.exists("posting_segments"):
            seg_df = self.io.read("posting_segments")
            seg = seg_df.drop("segment_id")
            base = io.read("postings") if has_base else None
            self.postings = (base.unionByName(seg) if base is not None
                             else seg)
            base_row = None
            if has_base and io.exists("index_stats"):
                base_row = io.read("index_stats").collect()[0].asDict()
                self._stats_row = base_row
            incremental = (io.exists("segment_term_stats")
                           and io.exists("segment_doc_stats")
                           and (not has_base
                                or (io.exists("term_stats")
                                    and base_row is not None
                                    and base_row.get("total_dl")
                                    is not None)))
            if incremental:
                # Coverage gate: the incremental path is only sound when
                # EVERY postings segment has its per-segment stats rows. A
                # legacy segment (appended before segment stats existed) or
                # a crash between the stats appends and the posting_segments
                # append (streaming/ingest_stream.py orders stats FIRST, so
                # the torn shape is a stats-only orphan, which is harmless:
                # its docs are in `documents`, matching what the legacy
                # re-aggregation would count) breaks the subset the other
                # way — summed df/n_docs would silently miss that segment.
                # The three segment_id scans are column-pruned and tiny.
                def _seg_ids(table):
                    return {r[0] for r in io.read(table)
                            .select("segment_id").distinct().collect()}
                post_ids = _seg_ids("posting_segments")
                incremental = (post_ids <= _seg_ids("segment_term_stats")
                               and post_ids <= _seg_ids("segment_doc_stats"))
            if incremental:
                # exact global stats by SUMMING the small per-segment stats
                # tables (written at append time) with the base tables —
                # init touches no postings data files (plan-asserted).
                # Integer df/cf/total_dl sums make the merged stats
                # bit-identical to a from-scratch re-aggregation.
                seg_ts = io.read("segment_term_stats").drop("segment_id")
                ts = (io.read("term_stats").unionByName(seg_ts) if has_base
                      else seg_ts)
                self.term_stats = ts.groupBy("term").agg(
                    F.first("bucket").alias("bucket"),
                    F.sum("df").alias("df"),
                    F.sum("cf").alias("cf"))
                srow = io.read("segment_doc_stats").agg(
                    F.sum("n_docs").alias("n"),
                    F.sum("total_dl").alias("dl")).collect()[0]
                self.n_docs = (int(base_row["n_docs"]) if base_row else 0) \
                    + int(srow["n"] or 0)
                total = (int(base_row["total_dl"]) if base_row else 0) \
                    + int(srow["dl"] or 0)
                self.avgdl = (float(total) / self.n_docs
                              if self.n_docs else 0.0)
            else:
                # legacy segment layout (no per-segment stats tables):
                # re-aggregate the postings union — a full postings scan,
                # kept only for indexes written before segment stats existed
                from ipfs_search_spark.operators.index_build import (
                    compute_doc_stats,
                )
                self.term_stats = self.postings.groupBy("term").agg(
                    F.first("bucket").alias("bucket"),
                    F.sum("df_part").alias("df"),
                    F.sum("cf_part").alias("cf"))
                self.n_docs, self.avgdl = compute_doc_stats(self.documents)
        else:
            stats = io.read("index_stats").collect()[0].asDict()
            self.n_docs = int(stats["n_docs"])
            self.avgdl = float(stats["avgdl"])
            self.term_stats = io.read("term_stats")
            self.postings = io.read("postings")
            self._stats_row = stats
        # positional flag (phrase-query capability) from index_stats —
        # reuse the row already collected above when available
        srow = getattr(self, "_stats_row", None)
        if srow is None and io.exists("index_stats"):
            srow = io.read("index_stats").collect()[0].asDict()
        self.positional = bool((srow or {}).get("positional", False))
        # the index's doc→shard function parameter: lets the query side
        # route per-doc rows (the filter-allowed set) to the shard that
        # holds the doc's postings. None on legacy stats-less layouts —
        # filtered queries then fall back to the external semi-join.
        ns = (srow or {}).get("n_shards")
        self.n_shards = int(ns) if ns else None
        self._term_cache: dict | None = None
        if cache_terms is None:
            cache_terms = self.term_stats.count() <= self.TERM_CACHE_MAX
        if cache_terms:
            self._term_cache = {
                r["term"]: (int(r["df"]), int(r["bucket"]))
                for r in self.term_stats.collect()
            }

    def lookup_terms(self, terms: list) -> dict:
        """term → (df, bucket) for the given terms (cache or filtered scan).
        At web scale the vocabulary exceeds the cache bound and this becomes
        the bucket-pruned parquet lookup; locally it's a dict hit."""
        if self._term_cache is not None:
            return {t: self._term_cache[t] for t in terms
                    if t in self._term_cache}
        return {r["term"]: (int(r["df"]), int(r["bucket"]))
                for r in self._lookup_scan(terms).collect()}

    # --- uncached vocabulary scans ------------------------------------
    # Exposed un-collected so tests can assert the parquet pushdown
    # (tests/test_plans.py): term_stats is written term-sorted, so these
    # predicates prune row groups via min/max stats — the at-scale path
    # when the vocabulary exceeds TERM_CACHE_MAX.

    def _lookup_scan(self, terms: list):
        """Exact-term lookup: In(term, ...) pushes to the parquet scan."""
        return self.term_stats.filter(F.col("term").isin(terms))

    def _prefix_scan(self, prefix: str, cap: int):
        """Prefix range: StringStartsWith pushes → a contiguous row-group
        range over the term-sorted table."""
        return (self.term_stats
                .filter(F.col("term").startswith(prefix))
                .orderBy("term").limit(cap))

    def _wildcard_scan(self, head: str, pattern: str, cap: int):
        """General wildcard: the literal head before the first metachar
        pushes as StringStartsWith (a leading metachar scans the whole
        vocabulary, like Lucene allow_leading_wildcard); the regex
        evaluates post-scan."""
        return (self.term_stats
                .filter(F.col("term").startswith(head) &
                        F.col("term").rlike(pattern))
                .orderBy("term").limit(cap))

    def _fuzzy_scan(self, pre: str, base: str, dist: int, cap: int):
        """Fuzzy candidates: the field prefix (fielded indexes) pushes as
        StringStartsWith; the length band + levenshtein evaluate
        post-scan (edit distance admits a changed FIRST character, so a
        bare-term prefix cannot prune by default — Lucene walks its term
        automaton instead, the columnar analogue being exactly this pruned
        scan). With fuzzy_prefix_length = N > 0 (Lucene FuzzyQuery
        prefixLength), candidates must carry the base's first N chars
        verbatim — and THAT prefix pushes as StringStartsWith, turning the
        full-vocabulary fuzzy scan into a term-sorted range scan (the
        standard Lucene mitigation, and the at-scale configuration).
        Distance stays on the full strings: with the prefix pinned it
        equals Lucene's suffix distance (common-prefix stripping preserves
        edit distance)."""
        lo, hi = len(base) - dist, len(base) + dist
        bare_col = (F.col("term").substr(F.lit(len(pre) + 1),
                                         F.length("term"))
                    if pre else F.col("term"))
        df = self.term_stats
        plen = min(self.fuzzy_prefix_length, len(base))
        if pre or plen:
            df = df.filter(F.col("term").startswith(pre + base[:plen]))
        df = df.filter(F.length(bare_col).between(lo, hi))
        if not self.fuzzy_transpositions:
            return (df.withColumn("_d",
                                  F.levenshtein(bare_col, F.lit(base)))
                    .filter(F.col("_d") <= dist)
                    .orderBy("_d", "term").limit(cap))
        # transpositions mode: DL ≤ lev ≤ 2·DL, so lev ≤ 2·dist is a sound
        # JVM-side (codegen) prefilter over the length band; the exact
        # Damerau distance evaluates in an Arrow-batched pandas UDF over
        # only the prefilter survivors — a vocabulary scan, never a
        # document-path hot loop

        @F.pandas_udf(IntegerType())
        def _dl(terms: pd.Series) -> pd.Series:
            return terms.map(
                lambda t: damerau_levenshtein(t, base)).astype("int32")

        return (df.filter(F.levenshtein(bare_col, F.lit(base)) <= 2 * dist)
                .withColumn("_d", _dl(bare_col))
                .filter(F.col("_d") <= dist)
                .orderBy("_d", "term").limit(cap))

    def expand_prefix(self, prefix: str,
                      max_expansions: int | None = None) -> dict:
        """term → (df, bucket) for the lexicographically-first
        `max_expansions` vocabulary terms starting with `prefix` — the
        expansion set of a `prefix*` query clause. term_stats is written
        term-sorted (index_build.py), so the uncached path is a
        StartsWith-pushdown range scan that touches only the row groups
        covering the prefix range; locally it's a dict scan."""
        cap = max_expansions or self.MAX_PREFIX_EXPANSIONS
        if self._term_cache is not None:
            terms = sorted(t for t in self._term_cache
                           if t.startswith(prefix))[:cap]
            return {t: self._term_cache[t] for t in terms}
        rows = self._prefix_scan(prefix, cap).collect()
        return {r["term"]: (int(r["df"]), int(r["bucket"])) for r in rows}

    def expand(self, exp: Expansion, field: str | None = None,
               max_expansions: int | None = None) -> dict:
        """term → (df, bucket) for the vocabulary terms matched by an
        expansion clause (prefix / general wildcard / fuzzy), capped at
        `max_expansions` (Lucene's max_expansions rewrite bound).

        Rank order within the cap (deterministic, oracle-mirrorable):
          prefix/wildcard — lexicographically-first matches;
          fuzzy — nearest by (levenshtein distance, term), Lucene's
          FuzzyQuery best-terms rewrite with distance as the similarity.

        `field` prefixes the posting-term namespace of a fielded index
        ('title:' + term); patterns and distances apply to the BARE term.
        term_stats is term-sorted on disk, so the uncached paths prune:
        prefix/wildcard by a StartsWith range scan over the pattern's
        literal head (a leading metachar scans the whole vocabulary, like
        Lucene allow_leading_wildcard), fuzzy by a length band before the
        quadratic edit-distance compare."""
        cap = max_expansions or self.MAX_PREFIX_EXPANSIONS
        pre = f"{field}:" if field else ""
        if exp.kind == "prefix":
            return self.expand_prefix(pre + exp.value, cap)
        if exp.kind == "wildcard":
            lit = _WILD_LIT_RE.match(exp.value).group(0)
            rx = re.compile("^" + re.escape(pre)
                            + _wildcard_regex(exp.value)[1:])
            if self._term_cache is not None:
                terms = sorted(t for t in self._term_cache
                               if t.startswith(pre + lit) and rx.match(t)
                               )[:cap]
                return {t: self._term_cache[t] for t in terms}
            rows = self._wildcard_scan(pre + lit, rx.pattern, cap).collect()
            return {r["term"]: (int(r["df"]), int(r["bucket"]))
                    for r in rows}
        if exp.kind == "regex":
            # anchored full-term match (Lucene regexp semantics); the
            # leading literal run prunes the term-sorted scan like a
            # wildcard head, conservatively disabled when the pattern
            # could match terms not carrying it (top-level alternation,
            # or a quantifier that can erase the run's last char)
            lit = _regex_literal_head(exp.value)
            rx = re.compile("^" + re.escape(pre)
                            + f"(?:{exp.value})$")
            if self._term_cache is not None:
                terms = sorted(t for t in self._term_cache
                               if t.startswith(pre + lit) and rx.match(t)
                               )[:cap]
                return {t: self._term_cache[t] for t in terms}
            rows = self._wildcard_scan(pre + lit, rx.pattern, cap).collect()
            return {r["term"]: (int(r["df"]), int(r["bucket"]))
                    for r in rows}
        # fuzzy: candidates within the length band, ranked (distance, term)
        base, dist = exp.value, exp.dist
        lo, hi = len(base) - dist, len(base) + dist
        dist_fn = (damerau_levenshtein if self.fuzzy_transpositions
                   else levenshtein)
        plen = min(self.fuzzy_prefix_length, len(base))
        if self._term_cache is not None:
            cand = []
            for t in self._term_cache:
                bare = t[len(pre):] if pre else t
                if pre and not t.startswith(pre):
                    continue
                if plen and not bare.startswith(base[:plen]):
                    continue
                if not lo <= len(bare) <= hi:
                    continue
                d = dist_fn(bare, base)
                if d <= dist:
                    cand.append((d, t))
            cand.sort()
            return {t: self._term_cache[t] for _, t in cand[:cap]}
        rows = self._fuzzy_scan(pre, base, dist, cap).collect()
        return {r["term"]: (int(r["df"]), int(r["bucket"])) for r in rows}

    def field_stats(self) -> dict:
        """Per-field (n_docs, avgdl) for fielded indexes (field_stats table
        written by build_fielded_index); {} for single-field indexes."""
        if not self.io.exists("field_stats"):
            return {}
        return {r["field"]: (int(r["n_docs"]), float(r["avgdl"]))
                for r in self.io.read("field_stats").collect()}

    def search(self, queries: list, k: int = 10, mode: str = "or",
               prune: bool = True, fields: dict | None = None,
               combine: str = "sum", offset: int = 0,
               minimum_should_match: int = 0,
               tie_breaker: float = 0.0) -> DataFrame:
        """tie_breaker: OpenSearch dis_max tie_breaker for combine='max' —
        a group's fielded contributions blend as max + tb*(sum - max)
        instead of the pure best-field max (0.0 = dis_max, 1.0 ≡ sum).
        Block-max bounds fall back to the sum bound (sound, looser).

        minimum_should_match: OR-mode floor (OpenSearch query_string's
        option of the same name) — a doc matches only when at least N of
        the query's positive groups match (a term, or a whole expansion
        clause, counts as one group; phrase terms count like terms, the
        phrase adjacency itself stays required). 0/1 = plain OR; AND mode
        supersedes it. Block-max pruning disables for floored queries
        (a theta seeded from single-group docs that cannot match would
        over-prune), the same soundness rule as AND/phrase queries."""
        return _search_impl(self.spark, self, queries, k, mode, prune,
                            fields=fields, combine=combine, offset=offset,
                            min_should_match=minimum_should_match,
                            tie_breaker=tie_breaker)


def more_like_this_query(text: str, n_hashes: int = 8, bands: int = 4,
                         shingle_n: int = 3) -> str:
    """Query string for a fingerprint more-like-this probe through the
    ORDINARY search surface: the text's minhash band keys (computed
    driver-side, no Spark job — dedup.query_band_keys) as OR terms.
    Against an index carrying dedup.fingerprint_field as its text (or as a
    field of a fielded index), this ranks near-duplicates by BM25 over
    shared band keys — the reference's `fingerprint` default_field
    reached by the same query_string as everything else
    (/root/reference/docs/indices/files.json:36,39-63)."""
    from ipfs_search_spark.operators.dedup import query_band_keys
    return " ".join(query_band_keys(text, n_hashes, bands, shingle_n))


def search(spark: SparkSession, io: TableIO, queries: list,
           k: int = 10, mode: str = "or", prune: bool = True,
           fields: dict | None = None, combine: str = "sum",
           offset: int = 0, fuzzy_transpositions: bool = False,
           minimum_should_match: int = 0,
           tie_breaker: float = 0.0) -> DataFrame:
    """queries: list of (query_id:int, query_string) → DataFrame
    (query_id, rank, doc_id, url, score), rank offset+1..offset+k (result
    paging — the reference API's page parameter), ties by doc_id asc.

    fields: {field_name: boost} for a fielded index (build_fielded_index) —
    the reference's default_field multi-match surface
    (/root/reference/docs/indices/files.json:10-37). combine='max' is
    OpenSearch query_string's best_fields/dis_max; 'sum' is BM25F-lite.

    fuzzy_transpositions: expand fuzzy clauses by Damerau-Levenshtein
    (OpenSearch's request option of the same name) — see Searcher.
    minimum_should_match: OR-mode match floor — see Searcher.search."""
    sx = Searcher(spark, io, fuzzy_transpositions=fuzzy_transpositions)
    return sx.search(queries, k=k, mode=mode, prune=prune,
                     fields=fields, combine=combine, offset=offset,
                     minimum_should_match=minimum_should_match,
                     tie_breaker=tie_breaker)


def _search_impl(spark: SparkSession, sx: "Searcher", queries: list,
                 k: int, mode: str, prune: bool,
                 fields: dict | None = None, combine: str = "sum",
                 offset: int = 0, min_should_match: int = 0,
                 tie_breaker: float = 0.0) -> DataFrame:
    n_docs, avgdl = sx.n_docs, sx.avgdl
    # paging: every per-shard/per-query cut keeps offset+k candidates so the
    # window can slice ranks (offset, offset+k]; rank stays the GLOBAL rank
    k_page = k + max(int(offset), 0)
    min_should_match = int(min_should_match)
    if min_should_match < 0:
        raise ValueError("minimum_should_match must be >= 0")
    tie_breaker = float(tie_breaker)
    if not 0.0 <= tie_breaker <= 1.0:
        raise ValueError("tie_breaker must be in [0, 1]")
    if tie_breaker > 0.0 and combine != "max":
        raise ValueError(
            "tie_breaker only applies to combine='max' (dis_max); "
            "combine='sum' already stacks every field contribution")

    parsed: dict[int, Query] = {int(q): parse_query(s, mode=mode)
                                for q, s in queries}
    if min_should_match > 1:
        for qid, p in parsed.items():
            if p.bool_tree is not None or p.match_all:
                raise ValueError(
                    "minimum_should_match applies to flat OR queries; "
                    f"query {qid} has explicit boolean structure / is "
                    "match-all — encode the floor in the tree instead")
    has_any_phrase = any(p.phrases or p.not_phrases or p.bool_phrases
                         for p in parsed.values())
    if has_any_phrase and not sx.positional:
        raise ValueError(
            "phrase query requires a positional index "
            "(build_index(..., positions=True))")
    matchall_qids = sorted(q for q, p in parsed.items() if p.match_all)
    base_terms = sorted({t for p in parsed.values()
                         for t in (p.terms + p.not_terms + p.bool_neg_terms +
                                   [t for ph in p.not_phrases for t in ph])})
    all_exps = {e for p in parsed.values()
                for e in (list(p.expansions) + list(p.not_expansions)
                          + list(p.bool_expansions.values()))}
    # boolean trees needing a documents-scan branch: trees with filter
    # leaves (constant-score clauses — candidate generation below, final
    # tree evaluation JVM-side after the metadata join; their candidates
    # exist even when no term leaf is live), plus default-TRUE pure-term
    # trees (`a OR NOT b`: a doc containing NEITHER term satisfies the
    # tree — Lucene prohibited-clause-over-all-docs semantics — and enters
    # through branch B at the constant score, bounded to the k_page lowest
    # doc_ids)
    ft_qids = sorted(qid for qid, p in parsed.items()
                     if p.bool_tree is not None
                     and (p.bool_filters
                          or _default_tree_const(p.bool_tree,
                                                 p.bool_filters)))
    if not base_terms and not matchall_qids and not all_exps \
            and not ft_qids:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, url string, score double")

    if fields:
        fstats = sx.field_stats()
        lookup = sorted({f"{fld}:{t}" for t in base_terms for fld in fields})
        tstats = sx.lookup_terms(lookup)

        def variants(t):
            return [(fld, f"{fld}:{t}") for fld in sorted(fields)
                    if f"{fld}:{t}" in tstats]
    else:
        tstats = sx.lookup_terms(base_terms)

        def variants(t):
            return [(None, t)] if t in tstats else []

    # expansion clauses (prefix / wildcard / fuzzy) expand ONCE per batch
    # against the index vocabulary: clause key → sorted posting-term keys,
    # each carried as a scoring row of the SAME group so the variants
    # combine under `combine` and the clause counts once for AND. On
    # fielded indexes the clause expands per field and the UNION is capped
    # at MAX_PREFIX_EXPANSIONS, ranked by the bare term (fuzzy: by
    # (distance, bare term)) — Lucene's max_expansions bounds the whole
    # rewrite, not each field (r3 ADVICE).
    exp_terms: dict[str, list] = {}
    for e in sorted(all_exps, key=lambda x: x.key):
        if fields:
            cand: dict = {}
            for fld in sorted(fields):
                cand.update(sx.expand(e, field=fld))
            if e.kind == "fuzzy":
                dist_fn = (damerau_levenshtein if sx.fuzzy_transpositions
                           else levenshtein)

                def _rk(t):
                    bare = t.split(":", 1)[1]
                    return (dist_fn(bare, e.value), bare, t)
            else:
                def _rk(t):
                    return (t.split(":", 1)[1], t)
            top = sorted(cand, key=_rk)[:sx.MAX_PREFIX_EXPANSIONS]
            exp = {t: cand[t] for t in top}
        else:
            exp = sx.expand(e)
        tstats.update(exp)
        exp_terms[e.key] = sorted(exp)

    # qterms: one row per (query, fielded term). group = the base query term;
    # n_groups = the query's matching base-term count (AND semantics);
    # kind = pos (scoring) / neg (NOT term) / negp (NOT-phrase term);
    # phrase_json = the query's phrase spec for the matching pass.
    import json as _json

    def phrase_groups(phrs, slops=None):
        """Each phrase → [slop, variants]: one posting-term variant per
        field on fielded indexes (a doc satisfies the phrase if ANY field
        contains the adjacency — OpenSearch multi-field phrase semantics),
        one bare variant on single-field indexes. A variant only exists
        where every phrase term is in that (field's) vocabulary. slop
        rides the group so the scorer's positional probe widens its
        window (`"a b"~N`)."""
        groups = []
        for gi, ph in enumerate(phrs):
            if fields:
                vars_ = [[f"{fld}:{t}" for t in ph]
                         for fld in sorted(fields)
                         if all(f"{fld}:{t}" in tstats for t in ph)]
            else:
                vars_ = [list(ph)] if all(t in tstats for t in ph) else []
            groups.append([int(slops[gi]) if slops else 0, vars_])
        return groups

    # Conjunct-filter specs for SCORING queries: the allowed doc set of
    # each query's filters, routed to the doc's shard and cogrouped into
    # the scorer, so the restriction (and therefore the per-shard top-k
    # cut and block-max pruning) happens IN-SHARD — a filtered query no
    # longer ships its full candidate set to the rank window (r3 verdict).
    # pred == 'true' (filters that drop on this schema) means unfiltered;
    # pred is None (filters that cannot match) means nothing allowed.
    docs = sx.documents
    flt_specs: dict[int, str | None] = {}
    for qid, p in parsed.items():
        if p.match_all or not p.filters:
            continue
        pr = _filters_pred(p, docs.columns)
        if pr != "true":
            flt_specs[qid] = pr
    cg = (bool(flt_specs) or bool(ft_qids)) and sx.n_shards is not None
    # filter-LEAF bit specs (trees like `lang:de OR merge`): each leaf's
    # POSITIVE-form predicate — negated leaves invert in the scorer, so
    # the shipped doc set stays the selective positive match, never its
    # complement — evaluated in the same single documents scan as the
    # conjunct allowed sets and cogrouped to the doc's shard as a bitmask.
    # The scorer then evaluates the FULL tree in-shard and keeps its
    # per-shard top-k cut ON (keep_all previously shipped the query's
    # whole candidate set to the rank window — r3 verdict).
    leaf_preds: dict[int, list] = {}  # qid -> [(bit, pos_pred_sql)]
    # one spec-carrier right-side row per (fast-ft query, shard): delivers
    # the tree spec + conjunct flag to shards where the query has NO term
    # postings (empty left side), so their filter-only matches still emit
    carriers: list = []  # (qid, bool_json, flt_flag)

    qterm_rows = []
    bitmaps: dict[int, dict] = {}
    for qid, p in parsed.items():
        # ft_fast: this filter-leaf tree evaluates fully IN-SHARD (leaf
        # bitmask via the cogroup) and keeps its per-shard cut. Trees with
        # a term leaf in NOT context stay on the legacy keep_all + JVM
        # bits path (see _neg_term_leaves); likewise everything on legacy
        # stats-less layouts (no doc→shard route) and conjunct filters
        # there (external semi-join).
        ft_fast = (cg and p.bool_filters and p.bool_tree is not None
                   and not _neg_term_leaves(p.bool_tree, p.bool_filters)
                   and not _default_tree_const(p.bool_tree, p.bool_filters))
        # default-true PURE-TERM tree (`a OR NOT b`, no filter leaves):
        # keep_all + presence bits + JVM tree eval (branch A) + a bounded
        # documents-scan branch B for the term-absent matches
        dt_pure = (p.bool_tree is not None and not p.bool_filters
                   and _default_tree_const(p.bool_tree, p.bool_filters))
        ka = 1 if ((p.filters and not cg)
                   or (p.bool_filters and not ft_fast)
                   or dt_pure) else 0
        fl = 1 if (cg and qid in flt_specs) else 0
        pos = [t for t in p.terms if variants(t)]
        neg = [t for t in p.not_terms if variants(t)]
        live_exps = [e for e in p.expansions if exp_terms.get(e.key)]
        # AND semantics: a term absent from the whole index matches nothing
        # (likewise an expansion clause with zero vocabulary matches), so
        # the conjunction is empty — don't silently drop the clause
        # (boolean trees handle absent terms as always-false leaves instead)
        if p.bool_tree is None and p.mode == "and" and not p.match_all \
                and (len(pos) < len(p.terms)
                     or len(live_exps) < len(p.expansions)):
            continue
        # quoted phrases are required clauses: a group with no live variant
        # (a term absent from every field's vocabulary) cannot match, so the
        # whole query returns nothing
        pos_groups = phrase_groups(p.phrases, p.phrase_slops)
        if p.phrases and any(not g[1] for g in pos_groups):
            continue
        phrase_json = _json.dumps(pos_groups) if p.phrases else ""
        live_np = [g for g in phrase_groups(p.not_phrases,
                                            p.not_phrase_slops) if g[1]]
        negp_json = _json.dumps(live_np) if live_np else ""
        bool_json = ""
        if p.bool_tree is not None:
            bphrases = {key: phrase_groups(
                [terms], [p.bool_phrase_slops.get(key, 0)])[0]
                for key, terms in p.bool_phrases.items()}
            spec = {"tree": p.bool_tree, "phrases": bphrases}
            if p.bool_filters and ft_fast:
                # in-shard tree evaluation: filter leaves resolve through
                # the cogrouped per-doc bitmask (fbitmap: leaf -> [bit,
                # invert]); leaves on fields this index lacks are baked
                # constants. The scorer evaluates the WHOLE tree and keeps
                # its per-shard cut — no JVM-side bits pass for branch A.
                if len(p.bool_filters) > 63:
                    raise ValueError(
                        "boolean trees support at most 63 filter leaves, "
                        f"got {len(p.bool_filters)}")
                fb: dict = {}
                fc: dict = {}
                lps: list = []
                for i, key in enumerate(sorted(p.bool_filters)):
                    flt = p.bool_filters[key]
                    base_col = ("references"
                                if flt.field == "references.name"
                                else flt.field)
                    if base_col not in docs.columns:
                        fc[key] = bool(flt.neg)
                        continue
                    fb[key] = [i, bool(flt.neg)]
                    pflt = Filter(flt.field, flt.op, flt.value, neg=False)
                    lps.append((i, filter_to_sql(pflt)))
                spec["fbitmap"], spec["fconst"] = fb, fc
                if lps:
                    leaf_preds[qid] = lps
            elif p.bool_filters or dt_pure:
                leaves = sorted(_tree_leaves(p.bool_tree)
                                - set(p.bool_filters))
                if len(leaves) > 63:
                    raise ValueError(
                        "boolean trees with filter leaves support at most "
                        f"63 term/phrase leaves, got {len(leaves)}")
                spec["bitmap"] = {key: i for i, key in enumerate(leaves)}
                bitmaps[qid] = spec["bitmap"]
            bool_json = _json.dumps(spec)
            if p.bool_filters and ft_fast:
                carriers.append((qid, bool_json, fl))
        # per-query AND-required count; 0 = OR / boolean-tree semantics
        # (an expansion clause counts as ONE group however many terms it
        # expanded to); NEGATIVE = minimum_should_match floor (at least
        # |n| distinct groups — AND mode supersedes it, all are required)
        n_grp = (len(pos) + len(live_exps)
                 if (p.mode == "and" and p.bool_tree is None
                     and not p.match_all) else 0)
        if (min_should_match > 1 and n_grp == 0 and p.bool_tree is None
                and not p.match_all):
            n_grp = -int(min_should_match)

        def _exp_rows(e, gkey, scored):
            """Scoring rows of one expansion clause: every vocabulary match
            as a variant of group `gkey`. scored=False (a tree leaf seen
            only under NOT) fetches at idf 0 — presence probe, no score."""
            boost_e = float(p.boosts.get(gkey, 1.0))
            for ft in exp_terms[gkey] if gkey in exp_terms else []:
                if fields:
                    fld = ft.split(":", 1)[0]
                    nf, af = fstats[fld]
                    t_idf = idf(nf, tstats[ft][0]) if scored else 0.0
                    b = float(fields[fld]) * boost_e
                else:
                    t_idf = idf(n_docs, tstats[ft][0]) if scored else 0.0
                    b, af = boost_e, avgdl
                qterm_rows.append((qid, ft, t_idf, "pos", b, gkey, af,
                                   n_grp, phrase_json, bool_json, ka, fl))

        if not p.match_all:
            for e in live_exps:
                _exp_rows(e, e.key, True)
            if p.bool_tree is not None:
                # expansion leaves inside the tree: the leaf key is the
                # scorer group key, so presence M[:,g] is true iff ANY
                # expansion term matched — OR-of-variants leaf semantics
                for key in sorted(p.bool_expansions):
                    _exp_rows(p.bool_expansions[key], key,
                              key in p.bool_exp_scored)
            for t in pos:
                for fld, ft in variants(t):
                    if fld is None:
                        t_idf, boost, av = (idf(n_docs, tstats[ft][0]), 1.0,
                                            avgdl)
                    else:
                        nf, af = fstats[fld]
                        t_idf, boost, av = (idf(nf, tstats[ft][0]),
                                            float(fields[fld]), af)
                    boost *= float(p.boosts.get(t, 1.0))  # ^boost on idf
                    qterm_rows.append((qid, ft, t_idf, "pos", boost, t, av,
                                       n_grp, phrase_json, bool_json, ka, fl))
            if p.bool_tree is not None:
                # NOT-context-only leaves: fetched for presence bits, idf 0
                # so they never contribute score
                for t in p.bool_neg_terms:
                    for fld, ft in variants(t):
                        av = avgdl if fld is None else fstats[fld][1]
                        qterm_rows.append((qid, ft, 0.0, "pos", 1.0, t, av,
                                           n_grp, phrase_json, bool_json,
                                           ka, fl))
        # match-all queries resolve negation externally (their candidates
        # come from the documents scan, not the scorer); scoring queries
        # resolve it IN-SHARD ('negs'/'negps' rows ride the same pandas
        # group — doc-sharding co-locates a doc's negative postings), which
        # keeps per-shard top-k cuts and block pruning on
        kn, knp = ("neg", "negp") if p.match_all else ("negs", "negps")
        for t in neg:
            for fld, ft in variants(t):
                qterm_rows.append((qid, ft, 0.0, kn, 1.0, t,
                                   avgdl if fld is None else fstats[fld][1],
                                   0, "", "", ka, fl))
        # negated expansions (`-te*`, `-term~1`): docs matching ANY
        # expansion term are excluded — each term rides as its own negative
        # row (in-shard for scoring queries, external probe for match-all)
        for ft in sorted({t for e in p.not_expansions
                          for t in exp_terms.get(e.key, [])}):
            av = fstats[ft.split(":", 1)[0]][1] if fields else avgdl
            qterm_rows.append((qid, ft, 0.0, kn, 1.0, ft, av,
                               0, "", "", ka, fl))
        for ft in sorted({t for g in live_np for var in g[1] for t in var}):
            # variants already carry posting-term keys (fielded or bare)
            qterm_rows.append((qid, ft, 0.0, knp, 1.0, ft, avgdl,
                               0, negp_json, "", ka, fl))
    if not qterm_rows and not matchall_qids and not ft_qids:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, url string, score double")

    has_filters = any(p.filters for p in parsed.values())
    # external anti-join only for match-all queries (scoring queries handle
    # negation in-scorer and keep their top-k cuts)
    has_ext_neg = any(p.match_all and (p.not_terms or p.not_phrases
                                       or p.not_expansions)
                      for p in parsed.values())

    candidates = None
    probe = None
    if qterm_rows or carriers:
        buckets = sorted({tstats[r[1]][1] for r in qterm_rows})
        live_terms = sorted({r[1] for r in qterm_rows})

        qterms = spark.createDataFrame(
            qterm_rows,
            "query_id int, term string, idf double, kind string, "
            "boost double, group string, avgdl double, n_groups int, "
            "phrase_json string, bool_json string, keep_all int, flt int")
        postings = (sx.postings
                    .filter(F.col("bucket").isin(buckets) &
                            F.col("term").isin(live_terms)))
        probe = postings.join(F.broadcast(qterms), "term")

        pos_probe = probe.filter(
            F.col("kind").isin(["pos", "negs", "negps"]))
        # keep_all=False: the qterms keep_all column carries the PER-QUERY
        # flag, so only filter-leaf-tree queries skip their per-shard cut
        if cg:
            # ONE pruned documents scan serves every filtered query in the
            # batch (r3 verdict: Q filtered queries used to plan Q scans):
            # the OR of all live predicates (conjunct filters AND tree
            # filter leaves) pushes down; each matching doc emits one row
            # per query it is relevant to — allow=1 when it passes the
            # query's conjunct filters, fbits = the bitmask of satisfied
            # positive-form filter leaves — routed to the doc's postings
            # shard for the cogroup.
            live = {q: pr for q, pr in flt_specs.items() if pr is not None}
            scan_preds = [f"({pr})" for pr in live.values()] + \
                [f"({pr})" for lps in leaf_preds.values() for _, pr in lps]
            if scan_preds:
                structs = []
                for q in sorted(set(live) | set(leaf_preds)):
                    allow_e = (F.when(F.expr(live[q]), F.lit(1))
                               .otherwise(F.lit(0))
                               if q in live else F.lit(0))
                    fb_e = F.lit(0).cast("long")
                    for bit, pr in leaf_preds.get(q, []):
                        fb_e = fb_e + (
                            F.when(F.expr(pr),
                                   F.lit(1 << bit).cast("long"))
                            .otherwise(F.lit(0).cast("long")))
                    structs.append(F.struct(
                        F.lit(q).cast("int").alias("query_id"),
                        allow_e.cast("int").alias("allow"),
                        fb_e.alias("fbits")))
                base_scan = (docs.filter(F.col("status") == "ok")
                             if "status" in docs.columns else docs)
                rel = F.filter(
                    F.array(*structs),
                    lambda s: (s["allow"] == 1) | (s["fbits"] != 0))
                allowed_df = (
                    base_scan.filter(F.expr(" OR ".join(scan_preds)))
                    .select("doc_id", F.explode(rel).alias("s"))
                    .withColumn("shard",
                                F.pmod(F.xxhash64("doc_id"),
                                       F.lit(sx.n_shards)).cast("int"))
                    .select(F.col("s.query_id").alias("query_id"), "shard",
                            F.col("doc_id").cast("long").alias("doc_id"),
                            F.col("s.allow").alias("allow"),
                            F.col("s.fbits").alias("fbits"),
                            F.lit("").alias("spec")))
            else:  # filtered queries exist but none has a live predicate
                allowed_df = spark.createDataFrame(
                    [], "query_id int, shard int, doc_id long, "
                        "allow int, fbits long, spec string")
            if carriers:
                # doc_id 0, NOT null: a null would make Arrow hand pandas
                # a float64 doc_id column for the whole group, silently
                # rounding real 64-bit ids; carrier rows are excluded from
                # the doc rows by their non-empty spec regardless
                crows = [(q, s, 0, int(a), 0, spec)
                         for q, spec, a in carriers
                         for s in range(int(sx.n_shards))]
                allowed_df = allowed_df.unionByName(spark.createDataFrame(
                    crows, "query_id int, shard int, doc_id long, "
                           "allow int, fbits long, spec string"))
            candidates = pos_probe.groupBy("query_id", "shard").cogroup(
                allowed_df.groupBy("query_id", "shard")
            ).applyInPandas(
                _make_scorer(k_page, mode, prune, False, combine,
                             phrase_mode="all", cogroup=True,
                             tie_breaker=tie_breaker),
                CANDIDATE_SCHEMA)
        else:
            candidates = pos_probe.groupBy("query_id", "shard").applyInPandas(
                _make_scorer(k_page, mode, prune, False, combine,
                             phrase_mode="all", tie_breaker=tie_breaker),
                CANDIDATE_SCHEMA)

    # match-all negation probes (the excluded doc sets) are built up front
    # so the per-query loop below can anti-join BEFORE its top-k cut
    neg_union = None
    if has_ext_neg and probe is not None:
        neg_probe = probe.filter(F.col("kind") == "neg") \
            .withColumn("kind", F.lit("pos"))
        neg_docs = neg_probe.groupBy("query_id", "shard").applyInPandas(
            _make_scorer(k, "or", False, True, combine), CANDIDATE_SCHEMA
        ).select("query_id", "doc_id")
        negp_probe = probe.filter(F.col("kind") == "negp") \
            .withColumn("kind", F.lit("pos"))
        negp_docs = negp_probe.groupBy("query_id", "shard").applyInPandas(
            _make_scorer(k, "or", False, True, combine, phrase_mode="any"),
            CANDIDATE_SCHEMA
        ).select("query_id", "doc_id")
        neg_union = neg_docs.unionByName(negp_docs)

    # Boolean trees with filter leaves. FAST (monotone, default-false)
    # trees were decided entirely IN-SHARD: candidates already hold their
    # tree-true, constant-floored, per-shard-cut rows — branch A — AND
    # their filter-only matches — branch B, emitted from the cogrouped
    # leaf-bit rows (every possible match either has a query term or
    # matches a positive filter clause, so the cogroup saw it). Nothing
    # to do here for them. LEGACY trees (term leaves under NOT, default-
    # true trees like `a OR NOT lang:de`, stats-less layouts) emitted
    # term/phrase presence bits instead: (A) evaluate the FULL tree here,
    # where the metadata the filter leaves need is joinable, keeping the
    # term score floored at the constant 1.0; (B) filter-only matches —
    # a pruned documents scan with every term leaf false, constant score
    # 1.0, anti-joined against A's (keep_all, uncut) universe, cut to the
    # k_page lowest doc_ids (sound: B rows all tie at 1.0 and the global
    # rank breaks ties by doc_id ASC).
    legacy_ft = sorted(set(ft_qids) & set(bitmaps)) if ft_qids else []
    if legacy_ft:
        meta_cols = sorted({
            ("references" if f.field == "references.name" else f.field)
            for qid in legacy_ft
            for f in parsed[qid].bool_filters.values()
        } & set(docs.columns))
        parts = ([candidates.filter(~F.col("query_id").isin(legacy_ft))]
                 if candidates is not None else [])
        base = (docs.filter(F.col("status") == "ok")
                if "status" in docs.columns else docs)
        for qid in legacy_ft:
            p = parsed[qid]
            bm = bitmaps.get(qid, {})
            if candidates is not None and qid in bitmaps:
                tree_pred = _tree_sql(p.bool_tree, p.bool_filters, bm,
                                      docs.columns)
                a = candidates.filter(F.col("query_id") == qid)
                if p.bool_filters:
                    # filter leaves need doc metadata; pure-term
                    # default-true trees evaluate on bits alone — no
                    # documents scan for branch A. INNER join (candidate
                    # doc_ids always exist in docs — same build) with NO
                    # broadcast hint: this legacy path carries keep_all
                    # (uncut) candidates, which a common term makes
                    # corpus-sized — forcing a broadcast here would
                    # collect that unbounded set to the driver (r5
                    # review). AQE picks broadcast on its own whenever the
                    # candidate side is actually small.
                    a = a.join(docs.select("doc_id", *meta_cols),
                               "doc_id", "inner")
                a = (a.filter(F.expr(tree_pred))
                     .select("query_id", "doc_id",
                             F.when(F.col("score") > 0.0, F.col("score"))
                             .otherwise(F.lit(1.0)).alias("score"),
                             F.lit(0).cast("long").alias("bits")))
                parts.append(a)
            conj = _filters_pred(p, docs.columns)
            if conj is None:
                continue  # conjunct filters cannot match on this index
            b_pred = _tree_sql(p.bool_tree, p.bool_filters, bm,
                               docs.columns, terms_false=True)
            if conj != "true":
                b_pred = f"({b_pred}) AND ({conj})"
            b = (base.filter(F.expr(b_pred))
                 .select(F.lit(qid).cast("int").alias("query_id"),
                         F.col("doc_id").cast("long").alias("doc_id"),
                         F.lit(1.0).alias("score"),
                         F.lit(0).cast("long").alias("bits")))
            if candidates is not None:
                b = b.join(candidates.filter(F.col("query_id") == qid)
                           .select("doc_id"), "doc_id", "left_anti")
            parts.append(b.orderBy("doc_id").limit(k_page))
        candidates = None
        for pt in parts:
            candidates = pt if candidates is None \
                else candidates.unionByName(pt)

    # match-all-then-filter queries (filter/negation-only query strings):
    # every doc passing the filters, constant score 1.0, ranked by doc_id —
    # the scan is pruned by the filter predicate. The per-query
    # orderBy.limit (a TakeOrderedAndProject) applies to EVERY match-all
    # query: negation queries anti-join their excluded doc set first, so
    # "lang:de -spam" never ships its full filtered doc set into one rank
    # window partition (that union was O(N) rows through one reducer).
    for qid in matchall_qids:
        p = parsed[qid]
        # match-all ranges over the INDEXED set (status ok), like a search
        # engine's match_all over its own index
        d = (docs.filter(F.col("status") == "ok")
             if "status" in docs.columns else docs)
        pred = _filters_pred(p, docs.columns)
        if pred is None:
            continue  # filters cannot match any doc on this index
        if pred != "true":
            d = d.filter(F.expr(pred))
        sel = d.select(F.lit(qid).cast("int").alias("query_id"),
                       F.col("doc_id").cast("long").alias("doc_id"),
                       F.lit(1.0).alias("score"),
                       F.lit(0).cast("long").alias("bits"))
        if (p.not_terms or p.not_phrases or p.not_expansions) \
                and neg_union is not None:
            sel = sel.join(neg_union.filter(F.col("query_id") == qid),
                           ["query_id", "doc_id"], "left_anti")
        sel = sel.orderBy("doc_id").limit(k_page)
        candidates = sel if candidates is None else candidates.unionByName(sel)

    if has_filters and not cg:
        # legacy fallback (stats-less layouts only): external semi-join
        # against per-query allowed branches. The primary path enforces
        # conjunct filters in-shard via the cogroup above.
        # The semi-join restricts only the queries that HAVE
        # filters; unfiltered queries bypass it entirely (no all-docs
        # allowed branch scanning the documents table per unfiltered query)
        flt_qids = [qid for qid, p in parsed.items() if p.filters]
        flt_df = None
        for qid in flt_qids:
            pred = _filters_pred(parsed[qid], docs.columns)
            if pred is None:  # impossible filters → no doc allowed
                allowed = docs.filter(F.lit(False)).select(
                    F.lit(qid).alias("query_id"), "doc_id")
            else:
                allowed = docs.filter(F.expr(pred)).select(
                    F.lit(qid).alias("query_id"), "doc_id")
            flt_df = allowed if flt_df is None else flt_df.unionByName(allowed)
        if flt_df is not None:
            cand_f = (candidates.filter(F.col("query_id").isin(flt_qids))
                      .join(flt_df, ["query_id", "doc_id"], "left_semi"))
            candidates = (candidates
                          .filter(~F.col("query_id").isin(flt_qids))
                          .unionByName(cand_f))

    if candidates is None:
        return spark.createDataFrame(
            [], "query_id int, rank int, doc_id long, url string, score double")
    w = Window.partitionBy("query_id").orderBy(F.desc("score"), F.asc("doc_id"))
    topk = (candidates.withColumn("rank", F.row_number().over(w))
            .filter((F.col("rank") <= k_page) & (F.col("rank") > offset)))
    # Display-field lookup: broadcast the tiny top-k side so the big documents
    # table never shuffles (at 100 TB the doc_map is bucketed by doc_id and
    # this becomes a storage-partitioned join; the projection below prunes the
    # scan to two columns either way). INNER join, deliberately: every top-k
    # doc_id was emitted by postings/branch-B scans over THIS documents table,
    # so inner == right-outer here — and BroadcastHashJoin cannot build the
    # right side of a right-outer join (the hint would be silently dropped and
    # the full documents table would shuffle against k rows).
    return (docs.select("doc_id", "url")
            .join(F.broadcast(topk), "doc_id", "inner")
            .select("query_id", "rank", "doc_id", "url", "score")
            .orderBy("query_id", "rank"))
