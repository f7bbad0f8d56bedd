"""C11 CID decode (functions/cids.py) against public spec vectors.

The base alphabets/bit order are pinned by RFC 4648 and base58btc test
vectors; the CID layers are checked by encode->decode roundtrips whose
digests come from hashlib, and the Spark surface mirrors the reference's
CidFilter gate (cidfilter.go:40-46)."""

import hashlib

from ipfs_search_spark.functions.cids import (
    base32_decode, base32_encode, base58btc_decode, base58btc_encode,
    cid_decode_str, cid_encode_v0, cid_encode_v1, cid_from_bytes,
    cid_supported_filter, provider_key_to_cid, varint_encode,
    with_cid_decoded,
)

RFC4648 = [(b"", ""), (b"f", "my"), (b"fo", "mzxq"), (b"foo", "mzxw6"),
           (b"foob", "mzxw6yq"), (b"fooba", "mzxw6ytb"),
           (b"foobar", "mzxw6ytboi")]


def test_base32_rfc4648_vectors():
    for raw, enc in RFC4648:
        assert base32_encode(raw) == enc
        assert base32_decode(enc) == raw
    assert base32_decode("m1") is None        # invalid char
    assert base32_decode("mz") is None        # non-canonical trailing bits
    # impossible unpadded lengths (1/3/6 mod 8): Go's decoder errors, so
    # the reference's CidFilter drops these — we must too
    assert base32_decode("m") is None
    assert base32_decode("mzx") is None


def test_base58btc_vectors():
    assert base58btc_encode(b"") == ""
    assert base58btc_encode(b"\x00\x01") == "12"
    assert base58btc_encode(b"a") == "2g"
    assert base58btc_decode("2g") == b"a"
    assert base58btc_decode("0") is None      # 0 not in the alphabet
    assert base58btc_decode("12") == b"\x00\x01"


def test_varint():
    assert varint_encode(0) == b"\x00"
    assert varint_encode(0x70) == b"\x70"
    assert varint_encode(300) == b"\xac\x02"  # protobuf spec example


def test_cid_v0_roundtrip():
    digest = hashlib.sha256(b"hello").digest()
    s = cid_encode_v0(digest)
    assert s.startswith("Qm") and len(s) == 46
    cid = cid_decode_str(s)
    assert cid == {"version": 0, "codec": 0x70, "mh_algo": 0x12,
                   "digest": digest}


def test_cid_v1_known_prefixes_and_roundtrip():
    digest = hashlib.sha256(b"x").digest()
    raw_cid = cid_encode_v1(0x55, digest)
    pb_cid = cid_encode_v1(0x70, digest)
    # well-known multibase prefixes for base32(v1, raw|dag-pb, sha2-256)
    assert raw_cid.startswith("bafkrei")
    assert pb_cid.startswith("bafybei")
    assert cid_decode_str(raw_cid)["codec"] == 0x55
    got = cid_decode_str(pb_cid)
    assert got["version"] == 1 and got["digest"] == digest


def test_multibase_z_and_f():
    digest = hashlib.sha256(b"q").digest()
    body = cid_encode_v1(0x55, digest)
    raw = base32_decode(body[1:])
    assert cid_decode_str("z" + base58btc_encode(raw))["digest"] == digest
    assert cid_decode_str("f" + raw.hex())["digest"] == digest
    assert cid_decode_str("Z" + base58btc_encode(raw)) is None  # unknown mb
    # a trailing char adds 5 zero bits: non-canonical length, go-cid
    # rejects it (CorruptInputError) — parity requires None here
    assert cid_decode_str(cid_encode_v1(0x55, digest) + "a") is None


def test_provider_key_roundtrip():
    digest = hashlib.sha256(b"prov").digest()
    body = base32_decode(cid_encode_v1(0x70, digest)[1:])
    key = "/providers/" + base32_encode(body).upper() + "/peerid"
    cid = provider_key_to_cid(key)
    assert cid is not None and cid["digest"] == digest
    assert provider_key_to_cid("/short") is None
    assert provider_key_to_cid("/providers/NOT-B32!") is None


def test_malformed_binary_cids():
    assert cid_from_bytes(b"") is None
    assert cid_from_bytes(b"\x12\x20" + b"\x00" * 31) is None  # short v0
    assert cid_from_bytes(b"\x02\x55") is None                 # bad version
    assert cid_from_bytes(b"\x01\x55\x12\xff") is None         # truncated
    digest = hashlib.sha256(b"t").digest()
    body = (varint_encode(1) + varint_encode(0x55) + varint_encode(0x12)
            + varint_encode(32) + digest)
    assert cid_from_bytes(body)["digest"] == digest
    assert cid_from_bytes(body + b"\x00") is None              # trailing


def test_spark_cid_surfaces(spark):
    digest = {i: hashlib.sha256(str(i).encode()).digest()
              for i in range(6)}
    rows = []
    for i in range(6):
        if i % 3 == 0:
            rows.append((str(i), cid_encode_v0(digest[i])))
        elif i % 3 == 1:
            rows.append((str(i), cid_encode_v1(0x55, digest[i])))
        else:
            rows.append((str(i), cid_encode_v1(0x71, digest[i])))
    rows.append(("bad", "not-a-cid"))
    df = spark.createDataFrame(rows, "url string, cid_str string")
    out = {r["url"]: r["cid"]
           for r in with_cid_decoded(df, "cid_str").collect()}
    assert out["0"]["codec"] == "dag-pb" and out["0"]["version"] == 0
    assert out["1"]["codec"] == "raw" and out["1"]["supported"]
    assert out["2"]["codec"] == "dag-cbor" and not out["2"]["supported"]
    assert out["0"]["digest_hex"] == digest[0].hex()
    assert out["bad"]["version"] is None and not out["bad"]["supported"]
    kept = {r["url"] for r in cid_supported_filter(df, "cid_str").collect()}
    assert kept == {"0", "1", "3", "4"}  # raw/dag-pb only, bad dropped
