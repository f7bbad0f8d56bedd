"""Physical-plan quality gates: these assert the plan SHAPE, not just results
— a regression that silently de-optimizes (lost pushdown, lost broadcast,
Python in the hot path) fails here even while results stay correct."""

import pyspark.sql.functions as F


def _plan(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted")


def test_postings_scan_is_pruned(spark, built_index):
    """The query-side postings scan must push bucket+term filters down to the
    parquet source (partition-dir pruning on bucket, row-group stats on term)
    — never a full index scan."""
    io, _ = built_index
    postings = io.read("postings").filter(
        (F.col("bucket") == 3) & F.col("term").isin(["data", "spark"]))
    plan = _plan(postings)
    assert "PushedFilters:" in plan
    assert "term" in plan.split("PushedFilters:")[1][:300]
    # bucket is a hive-partition column of the local layout → partition filter
    assert "PartitionFilters:" in plan


def test_query_probe_broadcasts_small_side(spark, built_index):
    """Query terms (tiny) must broadcast onto postings — a shuffled join here
    would reshuffle the index per query."""
    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    df = search(spark, io, [(0, "data spark")], k=5)
    plan = _plan(df)
    assert "BroadcastHashJoin" in plan or "BroadcastExchange" in plan


def test_display_join_broadcasts_topk(spark, built_index):
    """The final url-lookup join must broadcast the k-row top-k side and
    never shuffle the documents table. The former right-outer form silently
    dropped its broadcast hint (BHJ cannot build the right side of a right
    outer join) and sort-merge-shuffled ALL docs against k rows — at 100 TB
    that is a full-table shuffle per query batch."""
    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    df = search(spark, io, [(0, "data spark")], k=5)
    plan = _plan(df)
    assert "SortMergeJoin" not in plan
    assert "ShuffledHashJoin" not in plan
    # the doc_id display join is present AND broadcast (formatted mode puts
    # the keys on their own line under the BroadcastHashJoin node)
    assert "BroadcastHashJoin" in plan
    assert any(k.lstrip().startswith("[doc_id") for k in
               [seg.split("\n")[0] for seg in plan.split("keys [1]: ")[1:]])


def test_documents_scan_prunes_columns(spark, built_index):
    """Column pruning: a 2-column projection must not read the full schema."""
    io, _ = built_index
    df = io.read("documents").select("doc_id", "url")
    plan = _plan(df)
    read_schema = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "text" not in read_schema  # the big column stays unread


def test_tokenize_path_is_wholestage_codegen(spark, built_index):
    """The tokenize→tf pipeline must stay inside WholeStageCodegen with no
    Python evaluation nodes (BatchEvalPython/ArrowEvalPython)."""
    from ipfs_search_spark.functions.tokenize import doc_tokens
    io, _ = built_index
    toks = doc_tokens(io.read("documents").filter("status = 'ok'"))
    plan = _plan(toks)
    # pure JVM pipeline: no Python evaluation nodes anywhere, map-side
    # partial aggregation before the exchange (AQE hides WholeStageCodegen
    # spans in the pre-execution formatted plan, so assert structure instead)
    assert "BatchEvalPython" not in plan
    assert "ArrowEvalPython" not in plan
    assert "partial_count" in plan
    assert plan.index("HashAggregate") < plan.index("Exchange") or \
        "partial_count" in plan.split("Exchange")[0]


def test_brute_topk_is_take_ordered(spark):
    """orderBy().limit(k) must compile to TakeOrderedAndProject (distributed
    per-partition heaps), not a global Sort."""
    from ipfs_search_spark.operators.similarity import brute_force_topk
    df = spark.createDataFrame(
        [(i, [float(i), 1.0]) for i in range(100)],
        "vec_id long, embedding array<float>")
    top = brute_force_topk(df, [1.0, 0.5], k=5)
    assert "TakeOrderedAndProject" in _plan(top)


def test_per_shard_cut_is_per_query(spark):
    """keep_all is per-query: an unfiltered query's (query, shard) scorer
    group emits at most k rows even when ANOTHER query in the batch carries
    filters — only the filtered query ships its full candidate doc set
    (its filter applies post-scoring)."""
    import numpy as np
    import pandas as pd

    from ipfs_search_spark.functions.codec import encode_blocks
    from ipfs_search_spark.plans.query import _make_scorer

    ids = np.arange(100, dtype=np.int64)
    blocks = encode_blocks(ids, np.full(100, 2, np.int64),
                           np.full(100, 50, np.int64), block_size=128)
    base = {"query_id": [0], "term": ["t"], "idf": [1.0], "kind": ["pos"],
            "boost": [1.0], "group": ["t"], "avgdl": [50.0], "n_groups": [0],
            "phrase_json": [""], "bool_json": [""], "blocks": [blocks],
            "shard": [0]}
    scorer = _make_scorer(10, "or", True, False, "sum", phrase_mode="all")
    out_unfiltered = scorer(pd.DataFrame({**base, "keep_all": [0]}))
    assert len(out_unfiltered) == 10  # cut applied for this query
    out_filtered = scorer(pd.DataFrame({**base, "keep_all": [1]}))
    assert len(out_filtered) == 100  # filtered query keeps all candidates


def test_mixed_batch_same_results_as_solo(spark, built_index):
    """A filtered query riding in the batch must not change an unfiltered
    query's results (the per-query keep_all path is exact)."""
    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    alone = [tuple(r) for r in
             search(spark, io, [(0, "data spark")], k=5).collect()]
    mixed = [tuple(r) for r in
             search(spark, io, [(0, "data spark"), (1, "data lang:en")],
                    k=5).collect() if r["query_id"] == 0]
    assert mixed == alone


def test_matchall_negation_is_bounded(spark, built_index):
    """A match-all query with a prohibited term ('lang:en -data') must cut
    to k rows via a per-query TakeOrderedAndProject AFTER its anti-join —
    never rank every surviving doc in one window partition."""
    import pyspark.sql.functions as FF

    from ipfs_search_spark.functions.tokenize import tokens_array
    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    df = search(spark, io, [(0, "lang:en -data")], k=5)
    assert "TakeOrderedAndProject" in _plan(df)
    got = [r["doc_id"] for r in df.collect()]
    docs = io.read("documents")
    expected = [r["doc_id"] for r in docs
                .filter((FF.col("status") == "ok") & (FF.col("lang") == "en"))
                .filter(~FF.array_contains(tokens_array(FF.col("text")),
                                           "data"))
                .orderBy("doc_id").limit(5).collect()]
    assert got == expected


def test_filtered_query_cut_stays_on_in_shard():
    """A `term lang:de` query's (query, shard) scorer group emits at most
    k rows: the filter-allowed doc set rides the cogroup into the scorer,
    the restriction happens in-shard, and the per-shard top-k cut stays ON
    (r3 verdict: filtered queries used to ship their full candidate set)."""
    import numpy as np
    import pandas as pd

    from ipfs_search_spark.functions.codec import encode_blocks
    from ipfs_search_spark.plans.query import _make_scorer

    ids = np.arange(100, dtype=np.int64)
    blocks = encode_blocks(ids, np.full(100, 2, np.int64),
                           np.full(100, 50, np.int64), block_size=128)
    left = pd.DataFrame({
        "query_id": [0], "term": ["t"], "idf": [1.0], "kind": ["pos"],
        "boost": [1.0], "group": ["t"], "avgdl": [50.0], "n_groups": [0],
        "phrase_json": [""], "bool_json": [""], "blocks": [blocks],
        "shard": [0], "keep_all": [0], "flt": [1]})
    allowed = pd.DataFrame({"query_id": [0] * 40, "shard": [0] * 40,
                            "doc_id": np.arange(30, 70, dtype=np.int64)})
    scorer = _make_scorer(10, "or", True, False, "sum",
                          phrase_mode="all", cogroup=True)
    out = scorer(left, allowed)
    assert len(out) == 10  # cut ON despite the filter
    assert set(out["doc_id"]) <= set(range(30, 70))  # in-shard restriction
    # empty allowed side → the filter matches nothing in this shard
    empty = allowed.iloc[0:0]
    assert len(scorer(left, empty)) == 0
    # unfiltered query in the same cogroup: right side ignored
    left0 = left.assign(flt=[0])
    out0 = scorer(left0, empty)
    assert len(out0) == 10 and not set(out0["doc_id"]) <= set(range(30, 70))


def test_filtered_batch_plans_one_documents_scan(spark, built_index):
    """A batch of 10 filtered queries plans ONE documents scan for the
    allowed sets (plus the display-field join's scan) — not one scan per
    filtered query (r3 verdict #3)."""
    import re

    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    terms = ["data", "spark", "merge", "block", "scan",
             "data", "spark", "merge", "block", "scan"]
    langs = ["en", "de", "fr"] * 4
    batch = [(i, f"{t} lang:{lc}")
             for i, (t, lc) in enumerate(zip(terms, langs))]
    df = search(spark, io, batch, k=5)
    plan = _plan(df)
    n_doc_scans = len(re.findall(r"Location.*documents", plan))
    assert n_doc_scans == 2, f"expected 2 documents scans, got {n_doc_scans}"
    assert "FlatMapCoGroupsInPandas" in plan
    # results still exact: spot-check one query against the solo run
    got = [tuple(r) for r in df.collect() if r["query_id"] == 3]
    solo = [tuple(r) for r in
            search(spark, io, [(3, "block lang:en")], k=5).collect()]
    assert got == solo and got


def test_fast_filter_tree_is_in_shard(spark, built_index):
    """A monotone filter-leaf tree (`lang:de OR merge`) evaluates fully
    in-shard: 2 documents scans only (leaf-bits + display join — no
    per-branch metadata join, no filter-only documents branch), cut ON."""
    import re

    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    df = search(spark, io, [(0, "lang:de OR merge")], k=5)
    plan = _plan(df)
    n_doc_scans = len(re.findall(r"Location.*documents", plan))
    assert n_doc_scans == 2, f"expected 2 documents scans, got {n_doc_scans}"
    assert "FlatMapCoGroupsInPandas" in plan
    # the legacy path's filter-only branch was a TakeOrderedAndProject over
    # a third documents scan; the fast path must not plan one
    got = [tuple(r) for r in df.collect()]
    assert got  # and correctness is pinned by test_filter_tree + oracle


def test_extract_is_arrow_batched(spark, pages):
    """Extraction must run as ArrowEvalPython (pandas UDF), never
    BatchEvalPython (row-at-a-time pickling)."""
    from ipfs_search_spark.functions.extract import with_extracted_text
    out = with_extracted_text(pages.drop("text"), max_bytes=1 << 15,
                              status_col="status")
    plan = _plan(out)
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan


def test_uncached_vocab_scans_push_down(spark, built_index):
    """The at-scale vocabulary path (cache_terms=False — web-scale vocab
    exceeds TERM_CACHE_MAX): every expansion/lookup scan over the
    term-sorted term_stats table must push its pruning predicate into the
    parquet source (r4 verdict next #6). Row-group min/max stats on the
    sorted term column then skip everything outside the probed range."""
    from ipfs_search_spark.plans.query import Searcher
    io, _ = built_index
    sx = Searcher(spark, io, cache_terms=False)
    assert sx._term_cache is None

    def pushed(df) -> str:
        plan = _plan(df)
        assert "PushedFilters:" in plan
        return plan.split("PushedFilters:")[1][:300]

    # exact lookup: In(term, ...)
    p = pushed(sx._lookup_scan(["data", "merge"]))
    assert "In(term" in p
    # prefix: StringStartsWith range
    p = pushed(sx._prefix_scan("da", 50))
    assert "StartsWith(term,da" in p
    # wildcard: the literal head pushes; the regex evaluates post-scan
    p = pushed(sx._wildcard_scan("da", "^da[a-z0-9]*a$", 50))
    assert "StartsWith(term,da" in p
    # fuzzy on a fielded namespace: the field prefix pushes
    p = pushed(sx._fuzzy_scan("title:", "data", 1, 50))
    assert "StartsWith(term,title:" in p
    # bare fuzzy cannot prefix-prune (distance admits a changed first
    # char) but must still prune columns to the 3 stats columns
    plan = _plan(sx._fuzzy_scan("", "data", 1, 50))
    rs = plan.split("ReadSchema:")[1].splitlines()[0]
    assert "term" in rs and "df" in rs and "blocks" not in rs

    # regex: the conservative literal head pushes like a wildcard head
    p = pushed(sx._wildcard_scan("mer", "^(?:mer.+)$", 50))
    assert "StartsWith(term,mer" in p

    # and the uncached surface answers identically to the cached one
    cached = Searcher(spark, io)  # small vocab → cached
    assert cached._term_cache is not None
    qs = [(0, "da* merge"), (1, "data~1"), (2, "d?ta"), (3, "/dat[a-z]/")]
    a = [tuple(r) for r in sx.search(qs, k=10).collect()]
    b = [tuple(r) for r in cached.search(qs, k=10).collect()]
    assert a == b and a


def test_transpositions_scan_stays_arrow_and_prefiltered(spark,
                                                         built_index):
    """The Damerau fuzzy scan (fuzzy_transpositions=True, uncached) must
    keep the JVM-side levenshtein prefilter in the scan stage (the exact
    DL re-check sees only band survivors) and evaluate the re-check as an
    Arrow-batched python UDF, never row-at-a-time pickling."""
    from ipfs_search_spark.plans.query import Searcher
    io, _ = built_index
    sx = Searcher(spark, io, cache_terms=False, fuzzy_transpositions=True)
    plan = _plan(sx._fuzzy_scan("", "data", 1, 50))
    assert "ArrowEvalPython" in plan
    assert "BatchEvalPython" not in plan
    assert "levenshtein" in plan  # JVM prefilter present below the UDF


def test_or_not_tree_plans_two_documents_scans(spark, built_index):
    """Default-true pure-term trees (`a OR NOT b`) must plan exactly TWO
    documents scans — the bounded branch-B base scan and the final url
    lookup. Branch A evaluates on scorer bits alone (no metadata join;
    a third scan here is a full table read per query at 100 TB)."""
    import re
    from ipfs_search_spark.plans.query import search
    io, _ = built_index
    df = search(spark, io, [(0, "merge OR NOT batch")], k=10)
    plan = _plan(df)
    n = len(re.findall(r"Location.*documents", plan))
    assert n == 2, f"expected 2 documents scans, got {n}"
    assert "TakeOrderedAndProject" in plan  # branch B is bounded
    assert "CartesianProduct" not in plan
