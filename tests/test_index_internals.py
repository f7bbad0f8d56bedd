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

    # real header decode: truncated headers yield NULL dims, not errors
    real = {r["url"]: r for r in decode_image_meta(df).collect()}
    assert real["u1"]["format"] == "jpeg" and real["u1"]["width"] is None
    assert real["u2"]["format"] == "png" and real["u2"]["width"] is None
    assert real["u3"]["format"] == "unknown"

    # pixels=True: a corrupt entropy stream is a per-row NULL, never a
    # job failure (real jpeg/gif decode lives in test_imagecodec.py)
    pix = {r["url"]: r for r in
           decode_image_meta(df, pixels=True).collect()}
    assert pix["u1"]["format"] == "jpeg" and pix["u1"]["width"] is None
    assert pix["u3"]["format"] == "unknown"

    frames = frame_sample_plan(df, every_n=1).collect()
    assert {r["url"] for r in frames} == {"u1", "u2", "u3"}


def test_header_decode_real_formats():
    """Pure-python header parse against real minimal files of all four
    formats — dimensions must come out of the actual header bytes."""
    import zlib

    from ipfs_search_spark.operators.multimodal import header_decode

    # PNG 640x480 with a correct IHDR (CRC included for realism)
    ihdr_data = ((640).to_bytes(4, "big") + (480).to_bytes(4, "big") +
                 b"\x08\x02\x00\x00\x00")
    ihdr = ((13).to_bytes(4, "big") + b"IHDR" + ihdr_data +
            zlib.crc32(b"IHDR" + ihdr_data).to_bytes(4, "big"))
    assert header_decode(b"\x89PNG\r\n\x1a\n" + ihdr) == ("png", 640, 480)

    # JPEG 31x17, SOF0 after APP0 and a COM segment (segment walking)
    app0 = (b"\xff\xe0" + (16).to_bytes(2, "big") +
            b"JFIF\x00\x01\x02\x00\x00\x01\x00\x01\x00\x00")
    com = b"\xff\xfe" + (7).to_bytes(2, "big") + b"hello"
    sof0 = (b"\xff\xc0" + (17).to_bytes(2, "big") + b"\x08" +
            (17).to_bytes(2, "big") + (31).to_bytes(2, "big") +
            b"\x03\x01\x22\x00\x02\x11\x01\x03\x11\x01")
    assert header_decode(b"\xff\xd8" + app0 + com + sof0) == ("jpeg", 31, 17)
    # progressive (SOF2) works too
    sof2 = sof0.replace(b"\xff\xc0", b"\xff\xc2")
    assert header_decode(b"\xff\xd8" + app0 + sof2) == ("jpeg", 31, 17)
    # DHT (C4) must be skipped, not read as a frame header
    dht = b"\xff\xc4" + (5).to_bytes(2, "big") + b"abc"
    assert header_decode(b"\xff\xd8" + dht + sof0) == ("jpeg", 31, 17)

    # GIF and BMP
    gif = b"GIF89a" + (320).to_bytes(2, "little") + (200).to_bytes(2, "little")
    assert header_decode(gif + b"\x00" * 4) == ("gif", 320, 200)
    bmp = (b"BM" + b"\x00" * 16 +
           (100).to_bytes(4, "little", signed=True) +
           (-50).to_bytes(4, "little", signed=True))  # top-down: |h|
    assert header_decode(bmp) == ("bmp", 100, 50)

    # truncated / garbage
    assert header_decode(b"\x89PNG\r\n\x1a\nIH") == ("png", None, None)
    assert header_decode(b"\xff\xd8\xff\xd9") == ("jpeg", None, None)
    assert header_decode(b"notanimage") == ("unknown", None, None)
    assert header_decode(b"") == ("unknown", None, None)


def test_index_stats_match_oracle(built_index):
    """Engine avgdl/N must equal the oracle's (identity path, no sketches)."""
    from ipfs_search_spark.oracle import BM25Oracle
    io, stats = built_index
    docs = io.read("documents").filter("status = 'ok'").select(
        "doc_id", "text").collect()
    o = BM25Oracle({r["doc_id"]: r["text"] for r in docs})
    assert stats["n_docs"] == o.n_docs
    assert abs(stats["avgdl"] - o.avgdl) < 1e-12
