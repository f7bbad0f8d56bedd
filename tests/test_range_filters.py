"""Lucene bracket-range (`field:[A TO B]`, `{..}` exclusive, `*` open) and
`_exists_:field` filters — OpenSearch query_string range syntax, the same
read surface the reference exposes (/root/reference/docs/api.md:4: filters
by field, e.g. `last-seen:>now-1M`; bracket ranges are the query_string
form of the same range filter family).

NULL semantics are the load-bearing part: a NULL field never matches a
range (SQL comparison), `_exists_` is exactly the IS NOT NULL probe, and a
NEGATED filter is a must_not (NULL-field docs are KEPT — the coalesce in
_maybe_negate). The fixture plants NULL lang/size rows so each branch is
hit by construction.
"""

import pytest

from ipfs_search_spark.plans.parser import (
    QueryParseError, filter_to_sql, parse_query,
)
from ipfs_search_spark.plans.query import Searcher

N = 24


@pytest.fixture(scope="module")
def env(spark, tmp_path_factory):
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.index_build import build_index_from_docs

    # lang NULL on multiples of 2, size NULL on multiples of 3, else i*100
    docs = spark.createDataFrame(
        [(str(i), i, "data spark",
          None if i % 2 == 0 else "en",
          None if i % 3 == 0 else i * 100,
          "ok")
         for i in range(N)],
        "url string, doc_id long, text string, lang string, size long, "
        "status string")
    io = TableIO(spark, str(tmp_path_factory.mktemp("range-filters")))
    build_index_from_docs(spark, docs, io, n_shards=2, n_buckets=8)
    return Searcher(spark, io)


def _ids(sx, qs):
    return {r["doc_id"] for r in sx.search([(0, qs)], k=N + 5).collect()}


def test_exists_filter(env):
    assert _ids(env, "data _exists_:lang") == {
        i for i in range(N) if i % 2}
    assert _ids(env, "data _exists_:size") == {
        i for i in range(N) if i % 3}


def test_not_exists_keeps_null_docs(env):
    assert _ids(env, "data -_exists_:lang") == {
        i for i in range(N) if i % 2 == 0}


def test_inclusive_range(env):
    assert _ids(env, "data size:[400 TO 1100]") == {
        i for i in range(N) if i % 3 and 400 <= i * 100 <= 1100}


def test_exclusive_and_mixed_brackets(env):
    assert _ids(env, "data size:{400 TO 1100}") == {
        i for i in range(N) if i % 3 and 400 < i * 100 < 1100}
    assert _ids(env, "data size:{400 TO 1100]") == {
        i for i in range(N) if i % 3 and 400 < i * 100 <= 1100}
    assert _ids(env, "data size:[400 TO 1100}") == {
        i for i in range(N) if i % 3 and 400 <= i * 100 < 1100}


def test_open_ends_and_star_star(env):
    assert _ids(env, "data size:[1500 TO *]") == {
        i for i in range(N) if i % 3 and i * 100 >= 1500}
    assert _ids(env, "data size:[* TO 700}") == {
        i for i in range(N) if i % 3 and i * 100 < 700}
    # [* TO *] = field exists (Lucene)
    assert _ids(env, "data size:[* TO *]") == {i for i in range(N) if i % 3}


def test_negated_range_is_must_not(env):
    # must_not: docs whose size is NULL do NOT match the positive range,
    # so they are KEPT by the negation
    assert _ids(env, "data -size:[400 TO 1100]") == {
        i for i in range(N)
        if i % 3 == 0 or not (400 <= i * 100 <= 1100)}


def test_string_range_lexicographic(env):
    # lang is 'en' or NULL: lexicographic [de TO en] keeps the 'en' docs
    assert _ids(env, "data lang:[de TO en]") == {
        i for i in range(N) if i % 2}
    assert _ids(env, "data lang:[f TO z]") == set()


def test_bracket_equals_two_comparisons(env):
    a = sorted((r["doc_id"], r["score"], r["rank"]) for r in env.search(
        [(0, "data size:[400 TO 1100]")], k=N).collect())
    b = sorted((r["doc_id"], r["score"], r["rank"]) for r in env.search(
        [(0, "data size:>=400 size:<=1100")], k=N).collect())
    assert a == b


def test_range_as_tree_leaf(env):
    # filter leaf inside the boolean tree: constant-score disjunct
    got = _ids(env, "(size:[400 TO 700] OR spark)")
    assert got == set(range(N))  # every doc has 'spark'
    got = _ids(env, "(size:[400 TO 700] AND data) OR lang:de")
    assert got == {i for i in range(N) if i % 3 and 400 <= i * 100 <= 700}


def test_match_all_with_range_only(env):
    rows = env.search([(0, "size:[400 TO 1100]")], k=N).collect()
    assert {r["doc_id"] for r in rows} == {
        i for i in range(N) if i % 3 and 400 <= i * 100 <= 1100}
    assert all(r["score"] == 1.0 for r in rows)


def test_parse_errors():
    for bad in ("size:[1 2] x", "size:[1 TO 2 TO 3] x", "size:[ TO 2] x",
                "_exists_:bogus x", "references.name:[a TO b] x"):
        with pytest.raises(QueryParseError):
            parse_query(bad)
    # value validation is deferred to SQL rendering, same as size:>abc
    q = parse_query("size:[abc TO 2] x")
    with pytest.raises(QueryParseError):
        filter_to_sql(q.filters[0])
    with pytest.raises(QueryParseError):
        filter_to_sql(parse_query("last-seen:[2026-01-01 TO nope] x")
                      .filters[0])


def test_filter_sql_rendering():
    f = parse_query("size:[100 TO 2000] x").filters[0]
    assert filter_to_sql(f) == "(size >= 100 AND size <= 2000)"
    f = parse_query("size:{100 TO 2000] x").filters[0]
    assert filter_to_sql(f) == "(size > 100 AND size <= 2000)"
    f = parse_query("-size:[* TO *] x").filters[0]
    assert filter_to_sql(f) == "(NOT coalesce(((size IS NOT NULL)), false))"
    f = parse_query("_exists_:references.name x").filters[0]
    assert filter_to_sql(f) == "exists(references, r -> r.name IS NOT NULL)"
    f = parse_query("last-seen:[now-1M TO 2026-01-01] x").filters[0]
    assert filter_to_sql(f) == (
        "(last_seen >= current_timestamp() - INTERVAL 30 DAYS"
        " AND last_seen <= timestamp'2026-01-01')")
