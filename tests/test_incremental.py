"""Incremental segment querying: base index + streamed micro-batch segments
must answer queries identically to a from-scratch rebuild over the union."""

import tempfile

import pyspark.sql.functions as F
import pytest

from ipfs_search_spark.catalog import TableIO
from ipfs_search_spark.fixtures import pages_df
from ipfs_search_spark.operators.index_build import build_index
from ipfs_search_spark.plans.query import Searcher
from ipfs_search_spark.streaming.ingest_stream import (
    incremental_index_microbatch,
)

QUERIES = [(0, "data spark"), (1, "index merge"), (2, "page crawl token")]


def _results(sx, queries=QUERIES, k=10):
    res = {}
    for r in sx.search(queries, k=k).collect():
        res.setdefault(r["query_id"], []).append(
            (r["rank"], r["doc_id"], round(r["score"], 9)))
    for v in res.values():
        v.sort()
    return res


def test_segment_union_matches_rebuild(spark):
    all_pages = pages_df(spark, n=400, seed=21).cache()
    # split: first 250 are the base build, rest arrive as two micro-batches
    base = all_pages.limit(250).cache()
    rest = all_pages.subtract(base).cache()
    b1 = rest.limit(70).cache()
    b2 = rest.subtract(b1)

    io_inc = TableIO(spark, tempfile.mkdtemp(prefix="isx-inc-q-"))
    build_index(spark, base, io_inc, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io_inc, n_shards=4, n_buckets=16)
    handle(b1, batch_id=1)
    handle(b2, batch_id=2)

    io_full = TableIO(spark, tempfile.mkdtemp(prefix="isx-full-q-"))
    build_index(spark, all_pages, io_full, n_shards=4, n_buckets=16)

    inc = _results(Searcher(spark, io_inc))  # segments auto-detected
    full = _results(Searcher(spark, io_full))
    assert inc == full


def test_segmented_searcher_init_reads_no_postings(spark):
    """Searcher init on a segmented index must derive global stats from the
    small base/segment stats tables — never by re-aggregating the postings
    union (a full postings scan per session at web scale). Plan-asserted:
    the term_stats plan reads term_stats + segment_term_stats only, and the
    derived stats equal a from-scratch aggregation."""
    pages = pages_df(spark, n=300, seed=44).cache()
    base = pages.limit(200).cache()
    rest = pages.subtract(base)

    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-seg-init-"))
    build_index(spark, base, io, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io, n_shards=4, n_buckets=16)
    handle(rest, batch_id=1)

    sx = Searcher(spark, io)
    plan = sx.term_stats._sc._jvm.PythonSQLUtils.explainString(
        sx.term_stats._jdf.queryExecution(), "formatted")
    # "/postings" never matches ".../posting_segments" (the char after
    # "posting" there is "_"), so this asserts no postings-table scan
    assert "/postings" not in plan
    assert "segment_term_stats" in plan
    # stats parity vs the legacy full-aggregation path
    legacy = {r["term"]: (r["df"], r["cf"])
              for r in sx.postings.groupBy("term")
              .agg(F.sum("df_part").alias("df"), F.sum("cf_part").alias("cf"))
              .collect()}
    got = {r["term"]: (r["df"], r["cf"]) for r in sx.term_stats.collect()}
    assert got == legacy
    from ipfs_search_spark.operators.index_build import compute_doc_stats
    n_exact, avgdl_exact = compute_doc_stats(io.read("documents"))
    assert (sx.n_docs, sx.avgdl) == (n_exact, avgdl_exact)


def test_legacy_segment_without_stats_falls_back(spark):
    """A postings segment with NO per-segment stats rows (written by code
    predating segment stats, or a batch torn after the posting_segments
    append) must NOT take the incremental-stats path — summed df/n_docs
    would silently miss it. The coverage gate falls back to the legacy full
    re-aggregation, and answers still match a from-scratch rebuild."""
    all_pages = pages_df(spark, n=300, seed=77).cache()
    base = all_pages.limit(200).cache()
    rest = all_pages.subtract(base).cache()

    io_inc = TableIO(spark, tempfile.mkdtemp(prefix="isx-legacyseg-"))
    build_index(spark, base, io_inc, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io_inc, n_shards=4, n_buckets=16)
    handle(rest, batch_id=1)
    # simulate the legacy layout: drop the per-segment stats tables so the
    # postings segment has no coverage
    import shutil
    shutil.rmtree(io_inc._path("segment_term_stats"))

    io_full = TableIO(spark, tempfile.mkdtemp(prefix="isx-legacyfull-"))
    build_index(spark, all_pages, io_full, n_shards=4, n_buckets=16)
    assert _results(Searcher(spark, io_inc)) == \
        _results(Searcher(spark, io_full))

    # partial coverage (stats tables exist but miss a segment) must ALSO
    # fall back: re-add segment stats for a NEW batch only, leaving batch 1
    # uncovered — the gate compares distinct segment_id sets
    more = (all_pages.limit(40)
            .withColumn("url", F.concat(F.col("url"), F.lit("?v2")))
            .cache())
    handle(more, batch_id=2)
    io_full2 = TableIO(spark, tempfile.mkdtemp(prefix="isx-legacyfull2-"))
    build_index(spark, all_pages.unionByName(more), io_full2,
                n_shards=4, n_buckets=16)
    assert _results(Searcher(spark, io_inc)) == \
        _results(Searcher(spark, io_full2))


def test_compact_segments_matches_rebuild(spark):
    """N micro-batch appends → compact_segments → Searcher reads BASE
    tables only (segments gone, plan-asserted no postings/segment scan in
    the stats plan), every score bit-identical to both the pre-compaction
    segmented index and a from-scratch rebuild, and the from-scratch
    layout invariant (ONE posting row per (term, shard)) restored."""
    from ipfs_search_spark.operators.index_build import compact_segments
    all_pages = pages_df(spark, n=400, seed=91).cache()
    base = all_pages.limit(250).cache()
    rest = all_pages.subtract(base).cache()
    b1 = rest.limit(70).cache()
    b2 = rest.subtract(b1)

    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-compact-"))
    build_index(spark, base, io, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io, n_shards=4, n_buckets=16)
    handle(b1, batch_id=1)
    handle(b2, batch_id=2)
    before = _results(Searcher(spark, io))

    out = compact_segments(io)
    assert out["segments_folded"] == 2
    for t in ("posting_segments", "segment_term_stats",
              "segment_doc_stats", "_compaction_manifest",
              "_compacting_postings", "_compacting_term_stats"):
        assert not io.exists(t), t

    sx = Searcher(spark, io)  # include_segments auto-detects: none left
    after = _results(sx)
    assert after == before
    io_full = TableIO(spark, tempfile.mkdtemp(prefix="isx-compactfull-"))
    build_index(spark, all_pages, io_full, n_shards=4, n_buckets=16)
    assert after == _results(Searcher(spark, io_full))

    # one docid-sorted posting row per (term, shard) — rebuild layout
    assert (io.read("postings").groupBy("term", "shard").count()
            .filter("count > 1").count()) == 0
    # stats came from index_stats + term_stats alone: no postings or
    # segment-table scan anywhere in the term_stats plan
    plan = sx.term_stats._sc._jvm.PythonSQLUtils.explainString(
        sx.term_stats._jdf.queryExecution(), "formatted")
    assert "/postings" not in plan and "segment" not in plan
    # idempotent no-op on an already-compacted index
    assert compact_segments(io)["segments_folded"] == 0


def test_compact_segments_resumes_after_crash(spark, monkeypatch):
    """A crash between the manifest commit point and the install leaves
    the live index untouched; re-invoking compact_segments resumes the
    install from the manifest and completes it."""
    import ipfs_search_spark.operators.index_build as ib
    all_pages = pages_df(spark, n=250, seed=92).cache()
    base = all_pages.limit(180).cache()
    rest = all_pages.subtract(base).cache()

    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-compactcrash-"))
    build_index(spark, base, io, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io, n_shards=4, n_buckets=16)
    handle(rest, batch_id=1)
    before = _results(Searcher(spark, io))

    real_install = ib._install_compaction
    monkeypatch.setattr(ib, "_install_compaction",
                        lambda _io: (_ for _ in ()).throw(
                            RuntimeError("crash at commit point")))
    with pytest.raises(RuntimeError, match="commit point"):
        ib.compact_segments(io)
    # manifest committed, live tables untouched (still segmented + correct)
    assert io.exists(ib.COMPACTION_MANIFEST)
    assert io.exists("posting_segments")
    assert _results(Searcher(spark, io)) == before

    monkeypatch.setattr(ib, "_install_compaction", real_install)
    out = ib.compact_segments(io)  # resumes from the manifest
    assert out["segments_folded"] == 1
    assert not io.exists(ib.COMPACTION_MANIFEST)
    assert _results(Searcher(spark, io)) == before


def test_compact_segments_positional(spark):
    """Compaction preserves positions: phrase queries over the compacted
    index match the segmented union bit-for-bit."""
    from ipfs_search_spark.operators.index_build import compact_segments
    all_pages = pages_df(spark, n=300, seed=93).cache()
    base = all_pages.limit(200).cache()
    rest = all_pages.subtract(base).cache()

    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-compactpos-"))
    build_index(spark, base, io, n_shards=4, n_buckets=16, positions=True)
    handle = incremental_index_microbatch(io, n_shards=4, n_buckets=16,
                                          positions=True)
    handle(rest, batch_id=1)
    phrase_qs = [(0, '"data spark"'), (1, 'value "table key"~2')]
    before = _results(Searcher(spark, io), queries=phrase_qs)
    compact_segments(io)
    sx = Searcher(spark, io)
    assert sx.positional
    assert _results(sx, queries=phrase_qs) == before
    assert any(before.values())


def test_compact_segments_refuses_uncovered_segment(spark):
    """A postings segment lacking its per-segment stats rows must make
    compaction raise (merged stats would silently undercount) — same gate
    as the incremental Searcher, but hard instead of a fallback."""
    from ipfs_search_spark.operators.index_build import compact_segments
    all_pages = pages_df(spark, n=200, seed=94).cache()
    base = all_pages.limit(150).cache()
    rest = all_pages.subtract(base).cache()

    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-compactlegacy-"))
    build_index(spark, base, io, n_shards=4, n_buckets=16)
    handle = incremental_index_microbatch(io, n_shards=4, n_buckets=16)
    handle(rest, batch_id=1)
    import shutil
    shutil.rmtree(io._path("segment_doc_stats"))
    with pytest.raises(ValueError, match="per-segment stats"):
        compact_segments(io)


def test_resighted_urls_not_reindexed(spark):
    pages = pages_df(spark, n=120, seed=5).cache()
    io = TableIO(spark, tempfile.mkdtemp(prefix="isx-reseen-"))
    build_index(spark, pages, io, n_shards=2, n_buckets=8)
    n_docs_before = io.read("documents").count()
    handle = incremental_index_microbatch(io, n_shards=2, n_buckets=8)
    handle(pages.limit(50), batch_id=7)  # all urls already known
    assert io.read("documents").count() == n_docs_before
    assert not io.exists("posting_segments")  # nothing new → no segment


def test_positional_segments_phrase_over_union(spark):
    """Phrase queries spanning base + streamed positional segments match a
    from-scratch positional rebuild."""
    all_pages = pages_df(spark, n=300, seed=33).cache()
    base = all_pages.limit(200).cache()
    rest = all_pages.subtract(base).cache()

    io_inc = TableIO(spark, tempfile.mkdtemp(prefix="isx-incpos-"))
    build_index(spark, base, io_inc, n_shards=4, n_buckets=16,
                positions=True)
    handle = incremental_index_microbatch(io_inc, n_shards=4, n_buckets=16,
                                          positions=True)
    handle(rest, batch_id=1)

    io_full = TableIO(spark, tempfile.mkdtemp(prefix="isx-fullpos-"))
    build_index(spark, all_pages, io_full, n_shards=4, n_buckets=16,
                positions=True)

    phrase_qs = [(0, '"data spark"'), (1, 'value "table key"')]
    inc = _results(Searcher(spark, io_inc), queries=phrase_qs)
    full = _results(Searcher(spark, io_full), queries=phrase_qs)
    assert inc == full
    assert any(inc.values())  # phrase actually matched something
