"""End-to-end BM25 rank identity: engine top-k == pure-Python oracle top-k,
exact doc ids and scores (|Δ| ≤ 1e-9, ranks identical; ties broken by doc_id
both sides). This is the north-rule correctness gate."""

import pytest

from ipfs_search_spark.oracle import BM25Oracle
from ipfs_search_spark.plans.query import search

# fixed reference query set (mix of frequent/rare/multi-term/absent terms)
QUERY_SET = [
    (0, "data"),
    (1, "data spark"),
    (2, "index search query"),
    (3, "posting delta byte"),
    (4, "zzzznotaterm"),
    (5, "data zzzznotaterm"),
    (6, "spark index merge block score"),
    (7, "title"),
]


@pytest.fixture(scope="module")
def oracle(built_index):
    io, stats = built_index
    docs = io.read("documents").filter("status = 'ok'").select(
        "doc_id", "text").collect()
    return BM25Oracle({r["doc_id"]: r["text"] for r in docs})


def _run_engine(spark, io, queries, k, **kw):
    out = search(spark, io, queries, k=k, **kw).collect()
    res = {}
    for r in out:
        res.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for v in res.values():
        v.sort()
    return res


@pytest.mark.parametrize("k", [10, 25])
def test_rank_identity_or(spark, built_index, oracle, k):
    io, _ = built_index
    engine = _run_engine(spark, io, QUERY_SET, k)
    for qid, qs in QUERY_SET:
        expected = oracle.search(qs.split(), k=k)
        got = engine.get(qid, [])
        assert len(got) == len(expected), (qid, qs)
        for (rank, doc_id, score), (exp_doc, exp_score) in zip(got, expected):
            assert doc_id == exp_doc, (qid, rank)
            assert abs(score - exp_score) <= 1e-9, (qid, rank)


def test_rank_identity_and_mode(spark, built_index, oracle):
    io, _ = built_index
    queries = [(0, "data spark"), (1, "index search query")]
    engine = _run_engine(spark, io, queries, k=10, mode="and")
    for qid, qs in queries:
        expected = oracle.search(qs.split(), k=10, mode="and")
        got = engine.get(qid, [])
        assert [d for _, d, _ in got] == [d for d, _ in expected], qid


def test_prune_never_changes_results(spark, built_index):
    io, _ = built_index
    queries = [(0, "data spark index"), (1, "merge block data"),
               (2, "score rank data spark")]
    pruned = _run_engine(spark, io, queries, k=10, prune=True)
    exact = _run_engine(spark, io, queries, k=10, prune=False)
    assert pruned == exact


def test_not_terms(spark, built_index, oracle):
    io, _ = built_index
    engine = _run_engine(spark, io, [(0, "data -spark")], k=10)
    # oracle equivalent: score 'data', drop docs containing 'spark'
    hits = [(key, s) for key, s in oracle.search(["data"], k=10**9)
            if "spark" not in oracle.tf[key]][:10]
    got = engine.get(0, [])
    assert [d for _, d, _ in got] == [d for d, _ in hits]


def test_field_filter(spark, built_index, oracle):
    io, _ = built_index
    docs = io.read("documents").filter("status = 'ok' AND lang = 'en'")
    en_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}
    engine = _run_engine(spark, io, [(0, "data lang:en")], k=10)
    hits = [(key, s) for key, s in oracle.search(["data"], k=10**9)
            if key in en_ids][:10]
    got = engine.get(0, [])
    assert [d for _, d, _ in got] == [d for d, _ in hits]
    assert all(abs(s - es) <= 1e-9 for (_, _, s), (_, es) in zip(got, hits))
