"""THE reference query set — one fixed list exercising every query_string
feature the engine claims (SURVEY.md §5: "the reference query set is a fixed
list checked into the repo"), evaluated end-to-end against a pure-Python
oracle that mirrors the full search semantics (scoring, phrases, negation,
filters, match-all, paging). Rank identity = same doc ids, same ranks,
|Δscore| ≤ 1e-9.
"""

import pytest

from ipfs_search_spark.oracle import BM25Oracle
from ipfs_search_spark.plans.parser import parse_query
from ipfs_search_spark.plans.query import Searcher

# the fixed reference query set (frequency mix, AND/OR, phrases, negation,
# filters, match-all, combinations)
QUERY_SET = [
    # plain OR terms: frequent / rare / multi / absent
    (0, "data", "or"),
    (1, "data spark", "or"),
    (2, "index search query", "or"),
    (3, "posting delta byte merge block", "or"),
    (4, "zzzznotaterm", "or"),
    (5, "data zzzznotaterm", "or"),
    (6, "title head meta tag", "or"),
    # AND mode
    (7, "data spark", "and"),
    (8, "index merge", "and"),
    (9, "data zzzznotaterm", "and"),
    # phrases
    (10, '"data spark"', "or"),
    (11, '"data data"', "or"),
    (12, 'merge "data spark"', "or"),
    (13, '"token page crawl"', "or"),
    (14, '"data zzzznotaterm"', "or"),
    (15, 'value "table key" sort', "or"),
    # negation
    (16, "data -spark", "or"),
    (17, "data -spark -index", "or"),
    (18, 'data -"data spark"', "or"),
    (19, '"table key" -"data spark"', "or"),
    # filters on scored queries
    (20, "data lang:en", "or"),
    (21, "data spark lang:de", "or"),
    (22, "data size:>2000", "or"),
    (23, "data last-seen:>2024-02-01", "or"),
    # match-all (filter-only / negation-only)
    (24, "lang:en", "or"),
    (25, "lang:fr size:>1500", "or"),
    (26, "-data", "or"),
    (27, "lang:en -data", "or"),
    # combinations
    (28, '"data spark" lang:en', "or"),
    (29, "data spark index merge block score rank shard", "or"),
    # negated filters (must_not)
    (30, "data -lang:de", "or"),
    (31, "-lang:en -lang:de", "or"),
]


@pytest.fixture(scope="module")
def qs_index(spark, pages, tmp_path_factory):
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.index_build import build_index
    io = TableIO(spark, str(tmp_path_factory.mktemp("isx-queryset")))
    build_index(spark, pages, io, n_shards=4, n_buckets=16,
                max_bytes=1 << 15, positions=True)
    return io


@pytest.fixture(scope="module")
def oracle_env(qs_index):
    io = qs_index
    rows = io.read("documents").select(
        "doc_id", "text", "lang", "status", "size", "last_seen").collect()
    oracle = BM25Oracle({r["doc_id"]: r["text"] for r in rows
                         if r["status"] == "ok"})
    meta = {r["doc_id"]: r for r in rows}
    return oracle, meta


def _passes_filters(meta_row, filters) -> bool:
    import datetime as dt
    for f in filters:
        if f.field in ("lang", "status", "url"):
            matches = str(meta_row[f.field]) == f.value
            if matches == f.neg:  # neg: matching docs excluded
                return False
        elif f.field == "size":
            v = meta_row["size"] or 0
            t = int(f.value)
            ok = {"=": v == t, ">": v > t, "<": v < t,
                  ">=": v >= t, "<=": v <= t}[f.op]
            if ok == f.neg:
                return False
        elif f.field == "last_seen":
            ts = meta_row["last_seen"]
            t = dt.datetime.fromisoformat(f.value)
            if ts.tzinfo is not None:
                t = t.replace(tzinfo=ts.tzinfo)
            ok = {">": ts > t, "<": ts < t, ">=": ts >= t,
                  "<=": ts <= t, "=": ts == t}[f.op]
            if ok == f.neg:
                return False
        else:
            raise AssertionError(f"unhandled filter field {f.field}")
    return True


def oracle_eval(oracle: BM25Oracle, meta: dict, qs: str, k: int,
                mode: str = "or", offset: int = 0):
    """Full-semantics oracle: mirrors plans/query._search_impl exactly."""
    p = parse_query(qs, mode=mode)
    hits = []
    if p.match_all:
        for key, row in meta.items():
            if row["status"] != "ok":
                continue
            if not _passes_filters(row, p.filters):
                continue
            if any(key in oracle.tf and t in oracle.tf[key]
                   for t in p.not_terms):
                continue
            if any(oracle.phrase_match(key, ph) for ph in p.not_phrases):
                continue
            hits.append((key, 1.0))
        hits.sort(key=lambda x: x[0])
        return hits[offset:offset + k]
    uniq = sorted(set(p.terms))
    for key, c in oracle.tf.items():
        present = [t for t in uniq if t in c]
        if not present:
            continue
        if mode == "and" and len(present) != len(uniq):
            continue
        if any(not oracle.phrase_match(key, ph) for ph in p.phrases):
            continue
        if any(t in c for t in p.not_terms):
            continue
        if any(oracle.phrase_match(key, ph) for ph in p.not_phrases):
            continue
        if not _passes_filters(meta[key], p.filters):
            continue
        hits.append((key, oracle.score(key, uniq)))
    hits.sort(key=lambda x: (-x[1], x[0]))
    return hits[offset:offset + k]


def test_reference_query_set_rank_identity(spark, qs_index, oracle_env):
    """Every query in the set, both k=10 and a paged slice, batched through
    the engine in TWO calls (per mode) — rank-identical to the oracle."""
    oracle, meta = oracle_env
    sx = Searcher(spark, qs_index)
    failures = []
    for mode in ("or", "and"):
        batch = [(qid, s) for qid, s, m in QUERY_SET if m == mode]
        if not batch:
            continue
        got = {}
        for r in sx.search(batch, k=10, mode=mode).collect():
            got.setdefault(r["query_id"], []).append(
                (r["rank"], r["doc_id"], r["score"]))
        for v in got.values():
            v.sort()
        for qid, s in batch:
            exp = oracle_eval(oracle, meta, s, k=10, mode=mode)
            g = got.get(qid, [])
            if len(g) != len(exp):
                failures.append((qid, s, "len", len(g), len(exp)))
                continue
            for (rank, doc, score), (edoc, escore) in zip(g, exp):
                if doc != edoc or abs(score - escore) > 1e-9:
                    failures.append((qid, s, rank, (doc, score),
                                     (edoc, escore)))
                    break
    assert not failures, failures


def test_reference_query_set_paging_identity(spark, qs_index, oracle_env):
    oracle, meta = oracle_env
    sx = Searcher(spark, qs_index)
    paged = [(0, "data", "or"), (10, '"data spark"', "or"),
             (24, "lang:en", "or")]
    for qid, s, mode in paged:
        got = sorted(
            (r["rank"], r["doc_id"], r["score"])
            for r in sx.search([(qid, s)], k=5, mode=mode,
                               offset=4).collect())
        exp = oracle_eval(oracle, meta, s, k=5, mode=mode, offset=4)
        assert [d for _, d, _ in got] == [d for d, _ in exp], (qid, s)
        for (_, _, sc), (_, esc) in zip(got, exp):
            assert abs(sc - esc) <= 1e-9


def test_query_set_covers_every_feature():
    """The checked-in set must keep covering the full grammar."""
    feats = {"and_mode": False, "phrase": False, "neg": False,
             "neg_phrase": False, "filter": False, "neg_filter": False,
             "match_all": False, "absent_term": False}
    for _, s, m in QUERY_SET:
        p = parse_query(s, mode=m)
        feats["and_mode"] |= m == "and"
        feats["phrase"] |= bool(p.phrases)
        feats["neg"] |= bool(p.not_terms)
        feats["neg_phrase"] |= bool(p.not_phrases)
        feats["filter"] |= bool(p.filters)
        feats["neg_filter"] |= any(f.neg for f in p.filters)
        feats["match_all"] |= p.match_all
        feats["absent_term"] |= "zzzznotaterm" in s
    assert all(feats.values()), feats
