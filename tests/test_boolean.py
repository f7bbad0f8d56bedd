"""Boolean query grammar (AND/OR/NOT, parentheses, ^boost) — parser shapes
and engine semantics vs first-principles doc sets.

The reference's search surface is OpenSearch query_string
(/root/reference/docs/api.md:4), whose grammar includes explicit boolean
operators, grouping and per-term boost; the flat term/-term subset was
covered in round 1, this covers the nested remainder."""

import pyspark.sql.functions as F
import pytest

from ipfs_search_spark.plans.parser import QueryParseError, parse_query
from ipfs_search_spark.plans.query import search


def test_parser_tree_shapes():
    p = parse_query("(a OR b) AND c")
    assert p.bool_tree == ["and", ["or", "a", "b"], "c"]
    assert p.terms == ["a", "b", "c"]
    p = parse_query("a AND b OR c")  # AND binds tighter
    assert p.bool_tree == ["or", ["and", "a", "b"], "c"]
    p = parse_query('x AND (y OR "data spark")')
    assert p.bool_tree == ["and", "x", ["or", "y", "ph:data spark"]]
    assert p.bool_phrases == {"ph:data spark": ["data", "spark"]}
    assert set(p.terms) == {"x", "y", "data", "spark"}


def test_parser_flattens_simple_operators():
    assert parse_query("a AND b").bool_tree is None
    assert parse_query("a AND b").mode == "and"
    assert parse_query("a OR b").mode == "or"
    p = parse_query("a AND -b AND c")
    assert p.bool_tree is None and p.not_terms == ["b"]
    assert parse_query("NOT a").not_terms == ["a"]


def test_parser_boost_and_implicit_not():
    p = parse_query("merge^2.5 window")
    assert p.bool_tree is None and p.boosts == {"merge": 2.5}
    # implicit '-x' inside an OR group is a prohibited clause, not a disjunct
    p = parse_query("(a -b)")
    assert p.bool_tree is None
    assert p.terms == ["a"] and p.not_terms == ["b"] and p.mode == "and"
    # explicit OR NOT stays disjunctive
    p = parse_query("a OR NOT b")
    assert p.bool_tree == ["or", "a", ["not", "b"]]
    assert p.bool_neg_terms == ["b"]


def test_parser_errors():
    for bad in ["(a OR b", "a)", "a AND", "OR a", "x AND NOT"]:
        with pytest.raises(QueryParseError):
            parse_query(bad)
    # formerly errors, now filter LEAVES in the tree (constant-score
    # clauses — tests/test_filter_tree.py covers the semantics)
    assert parse_query("lang:de OR x").bool_filters
    assert parse_query("(x lang:de)").bool_filters


@pytest.fixture(scope="module")
def docsets(spark, built_index):
    """term -> doc_id set over the indexed corpus (first-principles)."""
    io, _ = built_index
    from ipfs_search_spark.functions.tokenize import tokens_array
    docs = io.read("documents").filter("status = 'ok'")
    rows = (docs.select("doc_id",
                        F.explode(tokens_array(F.col("text"))).alias("t"))
            .filter(F.col("t").isin(["data", "merge", "batch", "hash",
                                     "stream", "index"]))
            .distinct().collect())
    sets: dict = {}
    for r in rows:
        sets.setdefault(r["t"], set()).add(r["doc_id"])
    return sets


def _result_docs(spark, io, q, k=10_000):
    return {r["doc_id"] for r in
            search(spark, io, [(0, q)], k=k).collect()}


def test_boolean_doc_sets(spark, built_index, docsets):
    io, _ = built_index
    d = docsets
    got = _result_docs(spark, io, "(data OR merge) AND batch")
    assert got == (d["data"] | d["merge"]) & d["batch"]
    got = _result_docs(spark, io, "data AND (merge OR NOT batch)")
    assert got == d["data"] & (d["merge"] | (d["data"] - d["batch"]))
    got = _result_docs(spark, io, "(data AND hash) OR (merge AND stream)")
    assert got == (d["data"] & d["hash"]) | (d["merge"] & d["stream"])
    # implicit prohibited clause applies to the whole group
    got = _result_docs(spark, io, "(data OR merge) -batch")
    assert got == (d["data"] | d["merge"]) - d["batch"]


def test_or_not_lucene_semantics(spark, built_index, docsets):
    """`a OR NOT b` evaluates over ALL docs (Lucene prohibited-clause
    semantics): a doc containing NEITHER term satisfies NOT b and matches
    at the constant score 1.0 (r4 verdict missing #2 — previously the
    documented deviation evaluated only candidate docs)."""
    io, _ = built_index
    d = docsets
    allok = {r["doc_id"] for r in io.read("documents")
             .filter("status = 'ok'").select("doc_id").collect()}
    rows = search(spark, io, [(0, "merge OR NOT batch")], k=10**6).collect()
    got = {r["doc_id"]: r["score"] for r in rows}
    assert set(got) == d["merge"] | (allok - d["batch"])
    # term-absent matches enter at the constant 1.0 tier
    not_only = (allok - d["batch"]) - d["merge"]
    assert not_only and all(got[x] == 1.0 for x in not_only)
    # docs matching `merge` keep their real BM25 score (batch is a
    # NOT-context-only leaf: presence probe at idf 0, no contribution)
    sc = {r["doc_id"]: r["score"] for r in
          search(spark, io, [(0, "merge")], k=10**6).collect()}
    assert all(abs(got[x] - sc[x]) < 1e-9 for x in d["merge"])
    # nested default-true tree over all docs too (explicit ORs keep every
    # NOT disjunctive; a FIRST-position NOT stays a prohibited clause of
    # the group — the documented Lucene implicit-grouping rule)
    rows2 = _result_docs(spark, io, "(merge OR NOT batch) OR NOT stream",
                         k=10**6)
    assert rows2 == d["merge"] | (allok - d["batch"]) | (allok - d["stream"])


def test_boolean_matches_flat_and(spark, built_index):
    """A nested tree expressing a plain conjunction scores identically to
    the flat AND path (same contributions, same ranks)."""
    io, _ = built_index
    tree = search(spark, io, [(0, "data AND (merge AND batch)")],
                  k=50).collect()
    flat = search(spark, io, [(0, "data merge batch")], k=50,
                  mode="and").collect()
    assert [(r["doc_id"], round(r["score"], 9)) for r in tree] == \
           [(r["doc_id"], round(r["score"], 9)) for r in flat]


def test_boost_raises_scores(spark, built_index):
    io, _ = built_index
    plain = {r["doc_id"]: r["score"] for r in
             search(spark, io, [(0, "data merge")], k=2000).collect()}
    boosted = {r["doc_id"]: r["score"] for r in
               search(spark, io, [(0, "data^2 merge")], k=2000).collect()}
    assert set(plain) == set(boosted)
    from ipfs_search_spark.functions.tokenize import tokens_array
    docs = io.read("documents").filter("status = 'ok'")
    with_data = {r["doc_id"] for r in docs.select("doc_id").filter(
        F.array_contains(tokens_array(F.col("text")), "data")).collect()}
    assert all(boosted[d] > plain[d] for d in plain if d in with_data)
    assert all(abs(boosted[d] - plain[d]) < 1e-12
               for d in plain if d not in with_data)


def test_phrase_inside_boolean(spark, pages, tmp_path):
    from ipfs_search_spark.catalog import TableIO
    from ipfs_search_spark.operators.index_build import build_index
    io = TableIO(spark, str(tmp_path / "bool-pos"))
    build_index(spark, pages, io, n_shards=2, n_buckets=8,
                max_bytes=1 << 15, positions=True)
    phrase_docs = _result_docs(spark, io, '"data spark"')
    merge_docs = _result_docs(spark, io, "merge")
    got = _result_docs(spark, io, '"data spark" OR merge')
    assert got == phrase_docs | merge_docs
    got = _result_docs(spark, io, 'merge AND NOT "data spark"')
    assert got == merge_docs - phrase_docs


def test_parser_required_operator():
    """Lucene `+` (simple query style): rewritten to must-AND plus a
    should-group anchored on a must term (parser._apply_required_ops)."""
    p = parse_query("+data merge")
    assert p.bool_tree == ["and", "data", ["or", "data", "merge"]]
    p = parse_query("+data +spark merge")
    assert p.bool_tree == ["and", "data", "spark", ["or", "data", "merge"]]
    # must + must_not + filter flatten exactly (no tree needed)
    p = parse_query("+data -spark lang:de")
    assert p.bool_tree is None
    assert p.terms == ["data"] and p.not_terms == ["spark"]
    assert [f.field for f in p.filters] == ["lang"]
    # '+' inside explicit boolean syntax is redundant and stripped
    p = parse_query("a AND +b")
    assert p.bool_tree is None and p.terms == ["a", "b"]
    assert p.mode == "and"
    # must-filters strip to ordinary conjuncts
    p = parse_query("+lang:de merge")
    assert p.bool_tree is None and p.terms == ["merge"]
    assert [f.field for f in p.filters] == ["lang"]


def test_required_operator_doc_sets(spark, built_index, docsets):
    """`+a b`: docs MUST contain a; b stays optional but scores — Lucene
    must+should summation."""
    io, _ = built_index
    d = docsets
    got = _result_docs(spark, io, "+data merge")
    assert got == d["data"]
    # scoring: s(data) + s(merge if present) — on the matching docs this
    # is exactly the plain OR query's score
    sc = {r["doc_id"]: r["score"] for r in
          search(spark, io, [(0, "+data merge")], k=10**6).collect()}
    both = {r["doc_id"]: r["score"] for r in
            search(spark, io, [(0, "data merge")], k=10**6).collect()}
    assert sc and all(abs(sc[x] - both[x]) < 1e-9 for x in sc)
    got = _result_docs(spark, io, "+data +merge batch")
    assert got == d["data"] & d["merge"]
    got = _result_docs(spark, io, "+data -batch")
    assert got == d["data"] - d["batch"]


def test_minimum_should_match(spark, built_index, docsets):
    """OR-mode floor (OpenSearch query_string minimum_should_match): a doc
    matches when >= N of the positive groups match; scoring stays the sum
    of its present groups."""
    io, _ = built_index
    d = docsets
    q = "data merge batch"

    def _docs(**kw):
        return {r["doc_id"]: r["score"] for r in
                search(spark, io, [(0, q)], k=10**6, **kw).collect()}

    plain = _docs()
    m2 = _docs(minimum_should_match=2)
    want2 = ((d["data"] & d["merge"]) | (d["data"] & d["batch"])
             | (d["merge"] & d["batch"]))
    assert set(m2) == want2
    # scores identical to the plain OR query on the surviving docs
    assert all(abs(m2[x] - plain[x]) < 1e-9 for x in m2)
    # msm == group count ≡ AND (same docs AND same scores)
    m3 = _docs(minimum_should_match=3)
    a3 = _docs(mode="and")
    assert m3 == a3
    assert set(m3) == d["data"] & d["merge"] & d["batch"]
    # msm <= 1 ≡ plain OR; msm > group count matches nothing
    assert _docs(minimum_should_match=1) == plain
    assert _docs(minimum_should_match=4) == {}


def test_minimum_should_match_expansion_counts_once(spark, built_index,
                                                    docsets):
    """An expansion clause is ONE group toward the floor, however many
    vocabulary terms it expanded to (Lucene rewrite semantics)."""
    io, _ = built_index
    d = docsets
    got = {r["doc_id"] for r in
           search(spark, io, [(0, "da* merge")], k=10**6,
                  minimum_should_match=2).collect()}
    from ipfs_search_spark.plans.parser import Expansion
    from ipfs_search_spark.plans.query import Searcher
    exp = Searcher(spark, io).expand(Expansion("prefix", "da", 0))
    exp_docs = {r["doc_id"] for r in
                search(spark, io, [(0, " ".join(exp))], k=10**6).collect()}
    assert got == exp_docs & d["merge"]


def test_minimum_should_match_errors(spark, built_index):
    io, _ = built_index
    with pytest.raises(ValueError):
        search(spark, io, [(0, "(a OR b) AND c")], k=5,
               minimum_should_match=2)
    with pytest.raises(ValueError):
        search(spark, io, [(0, "lang:de")], k=5, minimum_should_match=2)
    with pytest.raises(ValueError):
        search(spark, io, [(0, "a b")], k=5, minimum_should_match=-1)


def test_required_operator_survives_field_group():
    """Regression (r5 review #1): the parens a field group expands into
    must not read as user boolean syntax — '+data lang:(de OR en)' keeps
    data required."""
    p = parse_query("+data lang:(de OR en)")
    assert p.bool_tree[0] == "and" and "data" in p.bool_tree
    p = parse_query("+data lang:(de en) merge")
    assert p.bool_tree[0] == "and" and "data" in p.bool_tree
    assert ["or", "data", "merge"] in p.bool_tree  # merge stays optional


def test_required_operator_and_mode_is_noop():
    """Regression (r5 review #2): under mode='and' every clause is
    already required — '+' must strip, never RELAX unprefixed terms."""
    p = parse_query("+data merge", mode="and")
    assert p.bool_tree is None and p.mode == "and"
    assert p.terms == ["data", "merge"]


def test_required_operator_keeps_phrases_required():
    """'+' on other clauses must not demote a bare quoted phrase to
    optional — quoted phrases are required clauses regardless of mode
    (the documented flat-grammar rule)."""
    p = parse_query('+data "x y" merge')
    assert p.bool_tree[0] == "and"
    assert "ph:x y" in p.bool_tree          # phrase is a required conjunct
    assert ["or", "data", "merge"] in p.bool_tree  # merge stays optional
    # explicit must-phrase anchors the rewrite like any must term
    p = parse_query('+"x y" merge')
    assert p.bool_tree == ["and", "ph:x y", ["or", "ph:x y", "merge"]]
