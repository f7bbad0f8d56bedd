"""C11 — CID decode/validate, pure python (no multiformats library).

The reference's sniffer turns DHT provider-record keys into CIDs and
gates them on codec before queueing (keyToCID:
/root/reference/components/sniffer/eventsource/keytocid.go:14-30 —
RFC4648 raw base32 of the BINARY cid, then CidFromBytes; CidFilter:
/root/reference/components/sniffer/providerfilters/cidfilter.go:28-47 —
cid.Decode(string), keep only Raw/DagProtobuf). This module implements
the same three decode surfaces from the public multiformats specs:

  cid_from_bytes   — binary CID: CIDv0 = bare sha2-256 multihash
                     (0x12 0x20 + 32 bytes); CIDv1 = varint version,
                     varint codec, multihash(varint algo, varint len,
                     digest).
  cid_decode_str   — cid.Decode: CIDv0 base58btc ("Qm…"), CIDv1
                     multibase ('b' base32-lower, 'z' base58btc,
                     'f' base16).
  provider_key_to_cid — keyToCID: "/providers/<RAW-BASE32-UPPER>" key.

Spark surface: `with_cid_decoded` (Arrow-batched pandas_udf returning a
typed struct) and `cid_supported_filter` (the CidFilter codec gate).
Encoders for both bases exist so tests and oracles can plant CIDs with
independently-verifiable digests (the q_cid_decode oracle recomputes
the digest with DuckDB's own sha256).
"""

from __future__ import annotations

import hashlib

# module-level: pandas_udf resolves its type hints in the defining
# module's globals (PySpark 4)
import pandas as pd

_B58_ALPHABET = "123456789ABCDEFGHJKLMNPQRSTUVWXYZ" \
    "abcdefghijkmnopqrstuvwxyz"
_B58_INDEX = {c: i for i, c in enumerate(_B58_ALPHABET)}
_B32_ALPHABET = "abcdefghijklmnopqrstuvwxyz234567"
_B32_INDEX = {c: i for i, c in enumerate(_B32_ALPHABET)}

CODEC_NAMES = {0x55: "raw", 0x70: "dag-pb", 0x71: "dag-cbor",
               0x72: "libp2p-key", 0x51: "cbor", 0x90: "eth-block"}
MH_NAMES = {0x00: "identity", 0x12: "sha2-256", 0x13: "sha2-512",
            0x16: "sha3-256", 0x1b: "keccak-256", 0x1e: "blake3"}
# the CidFilter gate: (potential) files and directories only
SUPPORTED_CODECS = {0x55, 0x70}


def base58btc_decode(s: str) -> bytes | None:
    num = 0
    for c in s:
        v = _B58_INDEX.get(c)
        if v is None:
            return None
        num = num * 58 + v
    raw = num.to_bytes((num.bit_length() + 7) // 8, "big") if num else b""
    pad = len(s) - len(s.lstrip("1"))
    return b"\x00" * pad + raw


def base58btc_encode(b: bytes) -> str:
    num = int.from_bytes(b, "big")
    out = []
    while num:
        num, r = divmod(num, 58)
        out.append(_B58_ALPHABET[r])
    pad = len(b) - len(b.lstrip(b"\x00"))
    return "1" * pad + "".join(reversed(out))


def base32_decode(s: str, alphabet_index: dict | None = None) -> \
        bytes | None:
    """RFC4648 base32, no padding. Default lowercase (multibase 'b');
    pass an uppercase index for the provider-key RawStdEncoding.
    Canonical-strict like Go's encoding/base32 (the reference's decoder,
    keytocid.go:21): lengths of 1/3/6 mod 8 chars (>=5 leftover bits) and
    non-zero trailing bits are rejected, not silently absorbed."""
    idx = alphabet_index or _B32_INDEX
    acc = nbits = 0
    out = bytearray()
    for c in s:
        v = idx.get(c)
        if v is None:
            return None
        acc = (acc << 5) | v
        nbits += 5
        if nbits >= 8:
            nbits -= 8
            out.append((acc >> nbits) & 0xFF)
    if nbits >= 5:
        return None  # impossible unpadded length (1/3/6 mod 8 chars)
    if acc & ((1 << nbits) - 1):
        return None  # non-zero trailing bits: not a canonical encoding
    return bytes(out)


def base32_encode(b: bytes) -> str:
    acc = nbits = 0
    out = []
    for byte in b:
        acc = (acc << 8) | byte
        nbits += 8
        while nbits >= 5:
            nbits -= 5
            out.append(_B32_ALPHABET[(acc >> nbits) & 31])
    if nbits:
        out.append(_B32_ALPHABET[(acc << (5 - nbits)) & 31])
    return "".join(out)


def _read_varint(b: bytes, i: int) -> tuple[int, int] | None:
    shift = v = 0
    while i < len(b) and shift <= 63:
        byte = b[i]
        v |= (byte & 0x7F) << shift
        i += 1
        if not byte & 0x80:
            return v, i
        shift += 7
    return None


def varint_encode(v: int) -> bytes:
    out = bytearray()
    while True:
        byte = v & 0x7F
        v >>= 7
        if v:
            out.append(byte | 0x80)
        else:
            out.append(byte)
            return bytes(out)


def cid_from_bytes(b: bytes) -> dict | None:
    """Binary CID -> {version, codec, mh_algo, digest} (CidFromBytes,
    keytocid.go:25). CIDv0 is a bare sha2-256 multihash."""
    if len(b) == 34 and b[0] == 0x12 and b[1] == 0x20:
        return {"version": 0, "codec": 0x70, "mh_algo": 0x12,
                "digest": b[2:]}
    r = _read_varint(b, 0)
    if r is None or r[0] != 1:
        return None
    codec_r = _read_varint(b, r[1])
    if codec_r is None:
        return None
    codec, i = codec_r
    algo_r = _read_varint(b, i)
    if algo_r is None:
        return None
    algo, i = algo_r
    ln_r = _read_varint(b, i)
    if ln_r is None:
        return None
    ln, i = ln_r
    digest = b[i:i + ln]
    if len(digest) != ln or i + ln != len(b):
        return None
    return {"version": 1, "codec": codec, "mh_algo": algo,
            "digest": digest}


def cid_decode_str(s: str) -> dict | None:
    """cid.Decode (cidfilter.go:33): CIDv0 'Qm…' base58btc, or CIDv1
    multibase — 'b' base32-lower, 'z' base58btc, 'f' base16-lower."""
    if not s:
        return None
    if len(s) == 46 and s.startswith("Qm"):
        raw = base58btc_decode(s)
        return cid_from_bytes(raw) if raw is not None else None
    mb, rest = s[0], s[1:]
    if mb == "b":
        raw = base32_decode(rest)
    elif mb == "z":
        raw = base58btc_decode(rest)
    elif mb == "f":
        try:
            raw = bytes.fromhex(rest)
        except ValueError:
            raw = None
    else:
        return None
    if raw is None:
        return None
    cid = cid_from_bytes(raw)
    # multibase applies to v1+ only (a v0 payload under multibase is not
    # a CID string go-cid would produce)
    return cid if cid is not None and cid["version"] == 1 else None


_B32_UPPER_INDEX = {c.upper(): i for c, i in _B32_INDEX.items()}


def provider_key_to_cid(key: str) -> dict | None:
    """keyToCID (keytocid.go:14-30): '/providers/<B32-RAW-UPPER>[/…]' —
    second namespace is RFC4648 raw (unpadded) UPPERCASE base32 of the
    binary CID."""
    nss = [p for p in key.split("/") if p]
    if len(nss) < 2:
        return None
    raw = base32_decode(nss[1], _B32_UPPER_INDEX)
    return cid_from_bytes(raw) if raw is not None else None


def cid_encode_v0(digest: bytes) -> str:
    return base58btc_encode(b"\x12\x20" + digest)


def cid_encode_v1(codec: int, digest: bytes, algo: int = 0x12) -> str:
    body = (varint_encode(1) + varint_encode(codec) + varint_encode(algo)
            + varint_encode(len(digest)) + digest)
    return "b" + base32_encode(body)


def sha256_cid_v0(payload: bytes) -> str:
    return cid_encode_v0(hashlib.sha256(payload).digest())


# ------------------------------------------------------ Spark surface ---

CID_STRUCT_FIELDS = ("version", "codec", "mh_algo", "digest_hex",
                     "supported")


def with_cid_decoded(df, cid_col: str, out_col: str = "cid"):
    """Arrow-batched decode of a CID string column to a typed struct
    (version int, codec string, mh_algo string, digest_hex string,
    supported boolean — the CidFilter verdict). NULL struct fields for
    undecodable strings, mirroring the reference's errDecodingCID path
    as a per-row signal."""
    from pyspark.sql.functions import col, pandas_udf
    from pyspark.sql.types import (
        BooleanType, IntegerType, StringType, StructField, StructType,
    )

    schema = StructType([
        StructField("version", IntegerType()),
        StructField("codec", StringType()),
        StructField("mh_algo", StringType()),
        StructField("digest_hex", StringType()),
        StructField("supported", BooleanType()),
    ])

    @pandas_udf(schema)
    def dec(s: pd.Series) -> pd.DataFrame:
        rows = {k: [] for k in CID_STRUCT_FIELDS}
        for v in s:
            cid = cid_decode_str(str(v)) if v is not None else None
            if cid is None:
                for k in CID_STRUCT_FIELDS:
                    rows[k].append(False if k == "supported" else None)
                continue
            rows["version"].append(cid["version"])
            rows["codec"].append(
                CODEC_NAMES.get(cid["codec"], hex(cid["codec"])))
            rows["mh_algo"].append(
                MH_NAMES.get(cid["mh_algo"], hex(cid["mh_algo"])))
            rows["digest_hex"].append(cid["digest"].hex())
            rows["supported"].append(cid["codec"] in SUPPORTED_CODECS)
        return pd.DataFrame({
            "version": pd.array(rows["version"], dtype="Int32"),
            "codec": rows["codec"], "mh_algo": rows["mh_algo"],
            "digest_hex": rows["digest_hex"],
            "supported": rows["supported"]})

    return df.withColumn(out_col, dec(col(cid_col)))


def cid_supported_filter(df, cid_col: str):
    """The CidFilter gate (cidfilter.go:40-46): keep rows whose CID
    decodes AND whose codec is raw/dag-pb."""
    tmp = with_cid_decoded(df, cid_col, "_cid_gate")
    out = tmp.filter(tmp["_cid_gate"]["supported"])
    return out.drop("_cid_gate")
