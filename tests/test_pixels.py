"""Real pixel decode (PNG via stdlib zlib + unfiltering, uncompressed BMP)
and the pixel-feature / rule-based NSFW surfaces built on it.

The PNG test bed ENCODES images in-test (forward-filtering each scanline
with a chosen filter type, then zlib-compressing) so the decoder is checked
against ground-truth pixel arrays across all five PNG filter types without
any image library."""

import struct
import zlib

import numpy as np
import pytest

from ipfs_search_spark.operators.multimodal import (
    _bmp_pixels, _png_pixels, classify_nsfw, extract_image_features,
    image_features, pixel_decode,
)


def _chunk(typ: bytes, data: bytes) -> bytes:
    return (struct.pack(">I", len(data)) + typ + data +
            struct.pack(">I", zlib.crc32(typ + data) & 0xFFFFFFFF))


def _paeth(a, b, c):
    p = a + b - c
    pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
    if pa <= pb and pa <= pc:
        return a
    return b if pb <= pc else c


def encode_png(pix: np.ndarray, filters: list[int]) -> bytes:
    """Minimal PNG encoder for tests: 8-bit, non-interlaced; per-row filter
    types given explicitly (the forward transform of PNG spec §9)."""
    h, w, ch = pix.shape
    ct = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    stride = w * ch
    flat = pix.reshape(h, stride).astype(np.int64)
    out_rows = []
    prev = np.zeros(stride, dtype=np.int64)
    for y in range(h):
        f = filters[y % len(filters)]
        cur = flat[y]
        if f == 0:
            enc = cur
        elif f == 1:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = cur - left
        elif f == 2:
            enc = cur - prev
        elif f == 3:
            left = np.concatenate([np.zeros(ch, np.int64), cur[:-ch]])
            enc = cur - (left + prev) // 2
        else:  # paeth
            enc = np.empty(stride, dtype=np.int64)
            for x in range(stride):
                a = cur[x - ch] if x >= ch else 0
                b = prev[x]
                c = prev[x - ch] if x >= ch else 0
                enc[x] = cur[x] - _paeth(a, b, c)
        out_rows.append(bytes([f]) + (enc % 256).astype(np.uint8).tobytes())
        prev = cur
    ihdr = struct.pack(">IIBBBBB", w, h, 8, ct, 0, 0, 0)
    idat = zlib.compress(b"".join(out_rows))
    return (b"\x89PNG\r\n\x1a\n" + _chunk(b"IHDR", ihdr) +
            _chunk(b"IDAT", idat) + _chunk(b"IEND", b""))


def encode_bmp(pix: np.ndarray) -> bytes:
    """Minimal 24-bit bottom-up BMP encoder for tests."""
    h, w, _ = pix.shape
    row = ((w * 3 + 3) // 4) * 4
    body = bytearray()
    for y in range(h - 1, -1, -1):
        line = pix[y, :, ::-1].astype(np.uint8).tobytes()  # RGB → BGR
        body += line + b"\x00" * (row - len(line))
    off = 54
    header = (b"BM" + struct.pack("<IHHI", off + len(body), 0, 0, off) +
              struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body),
                          2835, 2835, 0, 0))
    return bytes(header) + bytes(body)


@pytest.mark.parametrize("filters", [[0], [1], [2], [3], [4],
                                     [0, 1, 2, 3, 4]])
@pytest.mark.parametrize("ch", [1, 3, 4])
def test_png_roundtrip_all_filters(filters, ch):
    rng = np.random.default_rng(sum(filters) * 10 + ch)
    pix = rng.integers(0, 256, size=(13, 9, ch), dtype=np.uint8)
    blob = encode_png(pix, filters)
    got = _png_pixels(blob)
    assert got is not None and got.shape == pix.shape
    assert (got == pix).all()


def test_bmp_roundtrip_with_padding():
    rng = np.random.default_rng(3)
    pix = rng.integers(0, 256, size=(5, 7, 3), dtype=np.uint8)  # 21B→24B rows
    got = _bmp_pixels(encode_bmp(pix))
    assert got is not None and (got == pix).all()


def test_pixel_decode_dispatch():
    pix = np.zeros((2, 2, 3), dtype=np.uint8)
    assert (pixel_decode(encode_png(pix, [0])) == pix).all()
    assert (pixel_decode(encode_bmp(pix)) == pix).all()
    # corrupt jpeg: per-row None signal (real decode lives in
    # test_imagecodec.py)
    assert pixel_decode(b"\xff\xd8\xff\xe0" + b"\x00" * 32) is None
    assert pixel_decode(b"not an image") is None


def test_image_features_known_values():
    pix = np.zeros((4, 4, 3), dtype=np.uint8)
    pix[:2] = [200, 80, 40]   # skin-rule true: r>95,g>40,b>20,r>g,r>b,...
    pix[2:] = [10, 10, 10]    # not skin
    f = image_features(pix)
    assert f["skin_ratio"] == pytest.approx(0.5)
    assert f["mean_r"] == pytest.approx((200 + 10) / 2)
    assert f["mean_luma"] == pytest.approx(
        (0.299 * 200 + 0.587 * 80 + 0.114 * 40 +
         0.299 * 10 + 0.587 * 10 + 0.114 * 10) / 2)


def test_spark_feature_and_nsfw_surfaces(spark):
    """extract_image_features / classify_nsfw end-to-end: real decode for
    png+bmp rows, NULL features for a CORRUPT jpeg row (decoder
    unavailable is a per-row signal, not a job failure)."""
    rng = np.random.default_rng(9)
    skin = np.empty((6, 6, 3), dtype=np.uint8)
    skin[:] = [210, 120, 60]
    noise = rng.integers(0, 256, size=(4, 4, 3), dtype=np.uint8)
    rows = [("png", bytearray(encode_png(skin, [0, 4]))),
            ("bmp", bytearray(encode_bmp(noise))),
            ("jpeg", bytearray(b"\xff\xd8\xff\xdb" + b"\x00" * 16))]
    df = spark.createDataFrame([(u, bytes(b)) for u, b in rows],
                               "url string, blob binary")
    feats = {r["url"]: r for r in extract_image_features(df).collect()}
    assert feats["png"]["width"] == 6 and feats["png"]["height"] == 6
    assert feats["png"]["skin_ratio"] == pytest.approx(1.0)
    ref = image_features(noise)
    assert feats["bmp"]["mean_r"] == pytest.approx(ref["mean_r"], abs=1e-6)
    assert feats["jpeg"]["format"] == "jpeg"
    assert feats["jpeg"]["skin_ratio"] is None
    scores = {r["url"]: r for r in classify_nsfw(df).collect()}
    assert scores["png"]["porn"] == pytest.approx(0.9)  # skin_ratio 1.0
    assert scores["jpeg"]["porn"] is None
    s = scores["bmp"]
    assert abs(sum(s[k] for k in
                   ("drawing", "hentai", "neutral", "porn", "sexy"))
               - 1.0) < 1e-4
