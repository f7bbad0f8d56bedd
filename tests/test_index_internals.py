"""Index internals: segment compaction parity, multimodal plumbing, parser."""

import numpy as np
import pytest

from ipfs_search_spark.plans.parser import parse_query


def test_parse_query_grammar():
    q = parse_query('data spark -noise lang:en last-seen:>now-1M "big index"')
    assert q.terms == ["big", "data", "index", "spark"]
    assert q.not_terms == ["noise"]
    flds = {(f.field, f.op) for f in q.filters}
    assert ("lang", "=") in flds and ("last_seen", ">") in flds


def test_parse_query_dedups_terms():
    q = parse_query("data data DATA")
    assert q.terms == ["data"]


def test_merged_segments_answer_identically(spark, built_index):
    """merge_term_shards (the k-way posting merge / compaction path) must
    preserve every posting: decode the merged single-list layout and compare
    with the sharded layout term by term."""
    from ipfs_search_spark.functions.codec import decode_block
    from ipfs_search_spark.operators.index_build import merge_term_shards

    io, stats = built_index
    postings = io.read("postings")
    merged = merge_term_shards(postings)

    def decode_rows(rows):
        out = {}
        for r in rows:
            ids = []
            tfs = []
            for blk in r["blocks"]:
                i, t, _ = decode_block(blk.asDict())
                ids.append(i)
                tfs.append(t)
            key = r["term"]
            prev = out.setdefault(key, ([], []))
            prev[0].extend(np.concatenate(ids).tolist())
            prev[1].extend(np.concatenate(tfs).tolist())
        return out

    terms = ["data", "spark", "index"]
    sharded = decode_rows(postings.filter(
        postings.term.isin(terms)).collect())
    single = decode_rows(merged.filter(merged.term.isin(terms)).collect())
    for t in terms:
        assert sorted(zip(*sharded[t])) == sorted(zip(*single[t]))
        # merged layout is globally docid-sorted (unsigned order)
        u = np.array(single[t][0], dtype=np.int64).view(np.uint64)
        assert (u[:-1] <= u[1:]).all()


def test_multimodal_plumbing(spark):
    from ipfs_search_spark.operators.multimodal import (
        decode_image_meta, frame_sample_plan,
    )
    df = spark.createDataFrame(
        [("u1", bytearray(b"\xff\xd8" + b"x" * 100)),
         ("u2", bytearray(b"\x89PNG" + b"y" * 50)),
         ("u3", bytearray(b""))],
        "url string, blob binary")
    meta = {r["url"]: r for r in decode_image_meta(df, fake=True).collect()}
    assert meta["u1"]["format"] == "jpeg" and meta["u1"]["n_bytes"] == 102
    assert meta["u2"]["format"] == "png"
    assert meta["u3"]["format"] == "unknown" and meta["u3"]["n_bytes"] == 0

    with pytest.raises(Exception) as ei:
        decode_image_meta(df, fake=False).collect()
    assert "NotImplementedError" in str(ei.value) or \
        isinstance(ei.value, NotImplementedError)

    frames = frame_sample_plan(df, every_n=1).collect()
    assert {r["url"] for r in frames} == {"u1", "u2", "u3"}


def test_index_stats_match_oracle(built_index):
    """Engine avgdl/N must equal the oracle's (identity path, no sketches)."""
    from ipfs_search_spark.oracle import BM25Oracle
    io, stats = built_index
    docs = io.read("documents").filter("status = 'ok'").select(
        "doc_id", "text").collect()
    o = BM25Oracle({r["doc_id"]: r["text"] for r in docs})
    assert stats["n_docs"] == o.n_docs
    assert abs(stats["avgdl"] - o.avgdl) < 1e-12
