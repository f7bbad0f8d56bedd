"""Pure-python JPEG/GIF codecs (operators/imagecodec.py).

Ground truth comes from three independent directions so the encoder and
decoder cannot hide complementary bugs: (1) exact algebraic cases
(DC-only JPEG blocks where quantization is lossless), (2) a naive
double-loop cosine-sum IDCT implemented HERE, cross-checking the
decoder's batched einsum IDCT, and (3) a hand-verified GIF byte literal
decoded against its known pixel."""

import numpy as np
import pytest

from ipfs_search_spark.operators.imagecodec import (
    ZIGZAG, _dct_matrix, avi_encode_mjpeg, avi_mjpeg_frames, gif_encode,
    gif_pixels, jpeg_encode_baseline, jpeg_pixels,
)
from ipfs_search_spark.operators.multimodal import (
    classify_nsfw, extract_image_features, header_decode, pixel_decode,
    sample_video_frames,
)


def _flat_blocks_image(vals, block=8):
    """Image of flat 8x8 blocks with the given per-block values (one row
    of blocks)."""
    h, w = block, block * len(vals)
    img = np.empty((h, w, 3), dtype=np.uint8)
    for i, v in enumerate(vals):
        img[:, i * block:(i + 1) * block] = v
    return img


def test_jpeg_dc_only_exact():
    """Flat blocks + quant 16: F[0,0] = 8*(c-128), quantized to
    round((c-128)/2) — lossless whenever c-128 is even, so the decode must
    be bit-exact."""
    vals = [128, 130, 126, 64, 250, 2]
    img = _flat_blocks_image([(v, v, v) for v in vals])
    blob = jpeg_encode_baseline(img)
    assert header_decode(blob)[0] == "jpeg"
    got = jpeg_pixels(blob)
    assert got is not None and got.shape == img.shape
    assert (got == img).all()


def test_jpeg_grayscale_exact_and_channel_shape():
    vals = [128, 140, 120, 250]
    img = _flat_blocks_image([(v, v, v) for v in vals])[:, :, :1]
    blob = jpeg_encode_baseline(img)
    got = jpeg_pixels(blob)
    assert got is not None and got.shape == (8, 32, 1)
    assert (got == img).all()


def test_jpeg_idct_vs_naive_cosine_sum():
    """Decode of a random block at quant=1 must equal a from-scratch
    double-loop IDCT of the independently quantized coefficients."""
    rng = np.random.default_rng(7)
    img = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    q1 = np.ones(64, dtype=np.int64)
    blob = jpeg_encode_baseline(img, quant=q1)
    got = jpeg_pixels(blob)
    # independent forward path: same orthonormal DCT, integer rounding
    t = _dct_matrix()
    f = np.round(t @ (img[:, :, 0].astype(np.float64) - 128.0) @ t.T)

    def c(u):
        return 1 / np.sqrt(2) if u == 0 else 1.0

    expect = np.empty((8, 8))
    for x in range(8):
        for y in range(8):
            s = 0.0
            for u in range(8):
                for v in range(8):
                    s += (c(u) * c(v) / 4.0 * f[u, v]
                          * np.cos((2 * x + 1) * u * np.pi / 16)
                          * np.cos((2 * y + 1) * v * np.pi / 16))
            expect[x, y] = s + 128.0
    expect = np.clip(np.round(expect), 0, 255).astype(np.uint8)
    assert got is not None and (got[:, :, 0] == expect).all()


def test_jpeg_random_rgb_roundtrip_tolerance():
    """quant=1 keeps only coefficient rounding: every pixel must come back
    within the rounding-error bound (~4), across multiple MCUs and
    non-multiple-of-8 dimensions."""
    rng = np.random.default_rng(11)
    img = rng.integers(0, 256, size=(19, 13, 3), dtype=np.uint8)
    blob = jpeg_encode_baseline(img, quant=np.ones(64, dtype=np.int64))
    got = jpeg_pixels(blob)
    assert got is not None and got.shape == img.shape
    assert np.abs(got.astype(np.int64) - img.astype(np.int64)).max() <= 5


def test_jpeg_420_subsampling_and_restart():
    """4:2:0 chroma + restart markers: constant-color 16x16 tiles make
    chroma subsampling lossless; DRI path must reset DC predictors at
    every RSTn."""
    colors = [(200, 60, 40), (40, 200, 60), (60, 40, 200), (220, 220, 30)]
    img = np.empty((16, 64, 3), dtype=np.uint8)
    for i, col in enumerate(colors):
        img[:, i * 16:(i + 1) * 16] = col
    blob = jpeg_encode_baseline(img, quant=np.ones(64, dtype=np.int64),
                                subsample=True, restart=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob  # RSTn present
    got = jpeg_pixels(blob)
    assert got is not None and got.shape == img.shape
    assert np.abs(got.astype(np.int64) - img.astype(np.int64)).max() <= 5


def test_jpeg_dqt_is_zigzag_on_the_wire():
    """T.81 B.2.4.1: the DQT segment carries the table in ZIGZAG order.
    Self-roundtrips cannot catch an order bug (encoder+decoder would
    agree with each other while disagreeing with the spec), so this
    pins the wire bytes directly against the ZIGZAG permutation."""
    quant = np.arange(1, 65, dtype=np.int64)  # strongly non-uniform
    img = np.full((8, 8, 1), 130, dtype=np.uint8)
    blob = jpeg_encode_baseline(img, quant=quant)
    i = blob.index(b"\xff\xdb")
    payload = blob[i + 5:i + 5 + 64]  # after marker, length, PqTq
    assert list(payload) == [int(q) for q in quant[ZIGZAG]]


def test_jpeg_nonuniform_quant_vs_naive_idct():
    """Decode with a non-uniform table must match a from-scratch
    dequantize (NATURAL-order table) + cosine-sum IDCT — catches any
    zigzag/natural confusion in the dequantize multiply."""
    rng = np.random.default_rng(5)
    img = rng.integers(0, 256, size=(8, 8, 1), dtype=np.uint8)
    quant = np.arange(1, 65, dtype=np.int64)
    got = jpeg_pixels(jpeg_encode_baseline(img, quant=quant))
    t = _dct_matrix()
    f = np.round(t @ (img[:, :, 0].astype(np.float64) - 128.0) @ t.T
                 / quant.reshape(8, 8)) * quant.reshape(8, 8)
    expect = np.clip(np.round(t.T @ f @ t + 128.0), 0, 255)
    assert got is not None and (got[:, :, 0] == expect).all()


def test_jpeg_malformed_structures_return_none():
    """Structural corruption is a per-row None, never a raise: truncated
    16-bit DQT (np.frombuffer size error), zero sampling factors, and
    non-integer-ratio factor mixes."""
    assert jpeg_pixels(
        b"\xff\xd8\xff\xdb\x00\x06\x10\x01\x02\x03\xff\xd9") is None
    good = jpeg_encode_baseline(
        np.full((8, 8, 3), 128, dtype=np.uint8))
    sof = good.index(b"\xff\xc0")
    hv_off = sof + 11  # first component's HiVi byte
    broken = bytearray(good)
    broken[hv_off] = 0x00  # h=v=0
    assert jpeg_pixels(bytes(broken)) is None
    broken = bytearray(good)
    broken[hv_off] = 0x32  # 3x2 vs 1x1 others: non-integer ratio mix
    assert jpeg_pixels(bytes(broken)) is None


def test_jpeg_subsample_tiny_dims_keep_neutral_chroma():
    """A 1-row image under 4:2:0 must edge-replicate into the chroma
    mean, not zero-fill (zero-filled Cb/Cr = strong color cast)."""
    img = np.full((1, 16, 3), 128, dtype=np.uint8)
    got = jpeg_pixels(jpeg_encode_baseline(
        img, quant=np.ones(64, dtype=np.int64), subsample=True))
    assert got is not None and got.shape == (1, 16, 3)
    assert np.abs(got.astype(np.int64) - 128).max() <= 2


def test_jpeg_corrupt_returns_none():
    assert jpeg_pixels(b"\xff\xd8\xff\xe0" + b"\x00" * 32) is None
    good = jpeg_encode_baseline(_flat_blocks_image([(128, 128, 128)]))
    assert jpeg_pixels(good[: len(good) // 2]) is None  # truncated scan
    assert jpeg_pixels(b"not a jpeg") is None


# hand-verified minimal GIF: 1x1, 2-color table (white, black), LZW data
# 0x44 0x01 = [clear, index 0, end] at 3-bit codes -> one white pixel
_ONE_WHITE_GIF = bytes([
    0x47, 0x49, 0x46, 0x38, 0x39, 0x61,          # GIF89a
    0x01, 0x00, 0x01, 0x00, 0x80, 0x00, 0x00,     # 1x1, GCT of 2
    0xFF, 0xFF, 0xFF, 0x00, 0x00, 0x00,           # white, black
    0x2C, 0x00, 0x00, 0x00, 0x00,                 # image, left=top=0
    0x01, 0x00, 0x01, 0x00, 0x00,                 # 1x1, no LCT
    0x02, 0x02, 0x44, 0x01, 0x00,                 # min code 2, data
    0x3B,                                          # trailer
])


def test_gif_known_byte_literal():
    got = gif_pixels(_ONE_WHITE_GIF)
    assert got is not None and got.shape == (1, 1, 3)
    assert (got[0, 0] == [255, 255, 255]).all()


@pytest.mark.parametrize("ncolors", [4, 256])
def test_gif_roundtrip(ncolors):
    rng = np.random.default_rng(ncolors)
    palette = rng.integers(0, 256, size=(ncolors, 3), dtype=np.uint8)
    idx = rng.integers(0, ncolors, size=(23, 17), dtype=np.int64)
    blob = gif_encode(idx, palette)
    assert header_decode(blob) == ("gif", 17, 23)
    got = gif_pixels(blob)
    assert got is not None and got.shape == (23, 17, 3)
    assert (got == palette[idx]).all()


def test_gif_interlaced_roundtrip():
    rng = np.random.default_rng(42)
    palette = rng.integers(0, 256, size=(16, 3), dtype=np.uint8)
    idx = rng.integers(0, 16, size=(13, 5), dtype=np.int64)
    blob = gif_encode(idx, palette, interlace=True)
    got = gif_pixels(blob)
    assert got is not None and (got == palette[idx]).all()


def test_gif_long_stream_code_growth():
    """Enough distinct patterns to force LZW code-width growth past 9 bits
    on both sides of the roundtrip."""
    rng = np.random.default_rng(3)
    palette = rng.integers(0, 256, size=(256, 3), dtype=np.uint8)
    idx = rng.integers(0, 256, size=(40, 40), dtype=np.int64)
    got = gif_pixels(gif_encode(idx, palette))
    assert got is not None and (got == palette[idx]).all()


def test_gif_corrupt_returns_none():
    assert gif_pixels(b"GIF89a" + b"\x00" * 8) is None
    blob = gif_encode(np.zeros((2, 2), dtype=np.int64),
                      np.zeros((2, 3), dtype=np.uint8))
    assert gif_pixels(blob[:-6]) is None  # truncated data stream


def test_pixel_decode_dispatches_jpeg_and_gif():
    img = _flat_blocks_image([(130, 130, 130), (64, 64, 64)])
    assert (pixel_decode(jpeg_encode_baseline(img)) == img).all()
    palette = np.array([[255, 0, 0], [0, 255, 0]], dtype=np.uint8)
    idx = np.array([[0, 1], [1, 0]], dtype=np.int64)
    assert (pixel_decode(gif_encode(idx, palette)) == palette[idx]).all()


try:
    from hypothesis import given, settings
    from hypothesis import strategies as st

    @settings(max_examples=25, deadline=None)
    @given(st.integers(1, 24), st.integers(1, 24), st.integers(0, 2**32))
    def test_gif_roundtrip_property(h, w, seed):
        """Any index matrix over any power-of-two palette roundtrips
        bit-exactly through LZW encode/decode."""
        rng = np.random.default_rng(seed)
        n = int(rng.choice([2, 4, 16, 64, 256]))
        palette = rng.integers(0, 256, size=(n, 3), dtype=np.uint8)
        idx = rng.integers(0, n, size=(h, w), dtype=np.int64)
        got = gif_pixels(gif_encode(idx, palette))
        assert got is not None and (got == palette[idx]).all()

    @settings(max_examples=15, deadline=None)
    @given(st.integers(1, 20), st.integers(1, 20), st.integers(0, 2**32))
    def test_jpeg_roundtrip_property(h, w, seed):
        """Any uint8 image at quant=1 decodes within the coefficient-
        rounding bound for any (non-multiple-of-8) dimensions."""
        rng = np.random.default_rng(seed)
        ch = int(rng.choice([1, 3]))
        img = rng.integers(0, 256, size=(h, w, ch), dtype=np.uint8)
        blob = jpeg_encode_baseline(img,
                                    quant=np.ones(64, dtype=np.int64))
        got = jpeg_pixels(blob)
        assert got is not None and got.shape == img.shape
        assert np.abs(got.astype(np.int64)
                      - img.astype(np.int64)).max() <= 5
except ImportError:  # pragma: no cover - hypothesis is baked in here
    # visible skips, not silently-absent tests (a codec regression must
    # not pass CI invisibly on an environment without hypothesis)
    @pytest.mark.skip(reason="hypothesis not installed")
    def test_gif_roundtrip_property():
        pass

    @pytest.mark.skip(reason="hypothesis not installed")
    def test_jpeg_roundtrip_property():
        pass


def _flat_jpeg(v):
    return jpeg_encode_baseline(np.full((8, 8, 1), v, dtype=np.uint8))


def test_avi_mjpeg_container_roundtrip():
    frames_in = [_flat_jpeg(v) for v in (100, 102, 104, 200, 130)]
    blob = avi_encode_mjpeg(frames_in, 8, 8, fps=10)
    frames = avi_mjpeg_frames(blob)
    assert frames == frames_in  # byte-identical payloads back out
    assert avi_mjpeg_frames(b"RIFF\x04\x00\x00\x00AVI ") is None  # empty
    assert avi_mjpeg_frames(blob[: len(blob) // 2]) is None  # torn chunk
    assert avi_mjpeg_frames(b"not a riff at all...") is None


def test_avi_writer_external_shape():
    """Spec conformance an external reader would trip on: strh is the
    56-byte AVISTREAMHEADER (rcFrame at offset 48), and the
    AVIF_HASINDEX flag in avih is backed by a real idx1 chunk with one
    16-byte keyframe entry per frame whose offsets (relative to the
    'movi' fourcc) and sizes resolve to the actual chunk payloads."""
    import struct

    frames_in = [_flat_jpeg(v) for v in (100, 102, 104)]
    blob = avi_encode_mjpeg(frames_in, 8, 8, fps=10)

    si = blob.index(b"strh")
    strh_size = int.from_bytes(blob[si + 4:si + 8], "little")
    assert strh_size == 56
    rc = struct.unpack_from("<4H", blob, si + 8 + 48)
    assert rc == (0, 0, 8, 8)  # rcFrame = (0, 0, w, h)

    ii = blob.index(b"idx1")
    n = int.from_bytes(blob[ii + 4:ii + 8], "little") // 16
    assert n == len(frames_in)
    movi_fourcc = blob.index(b"movi")
    for k in range(n):
        cid, flags, off, size = struct.unpack_from("<4sIII",
                                                   blob, ii + 8 + 16 * k)
        assert cid == b"00dc" and flags == 0x10  # AVIIF_KEYFRAME
        hdr = movi_fourcc + off
        assert blob[hdr:hdr + 4] == b"00dc"
        assert blob[hdr + 8:hdr + 8 + size] == frames_in[k]


def test_avi_deep_nesting_no_recursion_error():
    """Untrusted-blob hardening: ~2000 nested LIST chunks must come back
    as a graceful None (or parsed frames), never a RecursionError that
    would kill the whole Spark task (mapInPandas contract: per-row
    NULLs / zero rows for bad blobs)."""
    import struct

    depth = 2000
    inner = b"LIST" + struct.pack("<I", 4) + b"xxxx"
    for _ in range(depth):
        body = b"list" + inner
        inner = b"LIST" + struct.pack("<I", len(body)) + body
    blob = b"RIFF" + struct.pack("<I", 4 + len(inner)) + b"AVI " + inner
    assert avi_mjpeg_frames(blob) is None  # no dc/db chunks anywhere

    # and a frame AFTER the deep nest is still found
    jpeg = _flat_jpeg(100)
    movi = b"LIST" + struct.pack(
        "<I", 4 + 8 + len(jpeg) + (len(jpeg) & 1)) + b"movi" + \
        b"00dc" + struct.pack("<I", len(jpeg)) + jpeg + \
        (b"\x00" if len(jpeg) & 1 else b"")
    body2 = inner + movi
    blob2 = b"RIFF" + struct.pack("<I", 4 + len(body2)) + b"AVI " + body2
    assert avi_mjpeg_frames(blob2) == [jpeg]


def test_avi_mjpeg_frame_sampling_spark(spark):
    """sample_video_frames decodes only every_n-th frame and returns
    exact luma for the losslessly-coded flat frames."""
    vals = [100, 102, 104, 200, 130]
    good = avi_encode_mjpeg([_flat_jpeg(v) for v in vals], 8, 8)
    # one torn frame in the middle: NULL metrics for that sample only
    broken_frames = [_flat_jpeg(100), _flat_jpeg(1)[:20], _flat_jpeg(104)]
    broken = avi_encode_mjpeg(broken_frames, 8, 8)
    df = spark.createDataFrame(
        [("good", good), ("broken", broken), ("notavi", b"\x00junk")],
        "url string, blob binary")
    out = sample_video_frames(df, every_n=2).collect()
    got = {(r["url"], r["frame_idx"]): r for r in out}
    assert set(got) == {("good", 0), ("good", 2), ("good", 4),
                        ("broken", 0), ("broken", 2)}
    for idx, v in ((0, 100), (2, 104), (4, 130)):
        r = got[("good", idx)]
        assert r["width"] == 8 and r["mean_luma"] == pytest.approx(v)
    assert got[("broken", 2)]["mean_luma"] == pytest.approx(104)
    # frame 1 was torn but NOT sampled — every_n=2 skips it entirely;
    # now sample everything and see the per-row NULL signal
    all_rows = {(r["url"], r["frame_idx"]): r
                for r in sample_video_frames(df, every_n=1).collect()}
    assert all_rows[("broken", 1)]["mean_luma"] is None
    assert all_rows[("broken", 1)]["width"] is None


def test_spark_features_from_jpeg_and_gif(spark):
    """The feature + NSFW surfaces now carry real pixel evidence for
    jpeg/gif rows too; corrupt streams still yield NULL features."""
    skin = np.empty((16, 16, 3), dtype=np.uint8)
    skin[:] = [210, 120, 60]
    jblob = jpeg_encode_baseline(skin, quant=np.ones(64, dtype=np.int64))
    palette = np.array([[210, 120, 60], [10, 10, 10]], dtype=np.uint8)
    gblob = gif_encode(np.zeros((6, 6), dtype=np.int64), palette)
    rows = [("jpeg", jblob), ("gif", gblob),
            ("bad_jpeg", b"\xff\xd8\xff\xdb" + b"\x00" * 16)]
    df = spark.createDataFrame(rows, "url string, blob binary")
    feats = {r["url"]: r for r in extract_image_features(df).collect()}
    assert feats["jpeg"]["width"] == 16 and feats["jpeg"]["height"] == 16
    # quant=1 decode is within ±5 of the planted skin color
    assert feats["jpeg"]["skin_ratio"] == pytest.approx(1.0)
    assert feats["jpeg"]["mean_r"] == pytest.approx(210, abs=5)
    assert feats["gif"]["skin_ratio"] == pytest.approx(1.0)
    assert feats["bad_jpeg"]["format"] == "jpeg"
    assert feats["bad_jpeg"]["skin_ratio"] is None
    scores = {r["url"]: r for r in classify_nsfw(df).collect()}
    assert scores["jpeg"]["porn"] == pytest.approx(0.9)
    assert scores["gif"]["porn"] == pytest.approx(0.9)
    assert scores["bad_jpeg"]["porn"] is None


def test_jpeg_truncated_sos_returns_none():
    """r5 review: an SOS segment whose header payload is empty (seg_len=2)
    must yield None, not an IndexError that kills the Spark task — the
    untrusted-blob contract of every mapInPandas surface feeding here."""
    img = _flat_blocks_image([(100, 100, 100)])
    blob = jpeg_encode_baseline(img)
    i = blob.find(b"\xff\xda")
    assert i > 0
    seg_len = int.from_bytes(blob[i + 2:i + 4], "big")
    crafted = blob[:i + 2] + b"\x00\x02" + blob[i + 2 + seg_len:]
    assert jpeg_pixels(crafted) is None
    # SOS header shorter than its declared component list
    crafted2 = (blob[:i + 2] + b"\x00\x03\x03"
                + blob[i + 2 + seg_len:])
    assert jpeg_pixels(crafted2) is None


def test_jpeg_giant_declared_dims_rejected_before_alloc():
    """r5 review: a ~40-byte blob declaring 65535x65535 must be rejected
    BEFORE the coefficient store is sized off the attacker-controlled
    header (was a ~34 GB np.zeros)."""
    import struct as _st
    sof = b"\x08" + _st.pack(">HH", 65535, 65535) + b"\x01" + \
        b"\x01\x11\x00"
    sos = b"\x01\x01\x00\x00\x3f\x00"
    blob = (b"\xff\xd8"
            + b"\xff\xc0" + _st.pack(">H", 2 + len(sof)) + sof
            + b"\xff\xda" + _st.pack(">H", 2 + len(sos)) + sos
            + b"\x00" * 16 + b"\xff\xd9")
    assert jpeg_pixels(blob) is None


def test_gif_background_fill_uses_global_color_table():
    """r5 review: the background color index refers to the GLOBAL color
    table even when the frame carries a local one (GIF89a 18.c)."""
    import struct as _st
    from ipfs_search_spark.operators.imagecodec import _lzw_encode
    gct = bytes((255, 0, 0, 0, 255, 0))       # red, green — bg=1: green
    lct = bytes((0, 0, 255, 255, 255, 255))   # blue, white
    data = _lzw_encode([0, 0, 0, 0], 2)       # 2x2 frame of local[0]=blue
    blob = bytearray(b"GIF89a")
    blob += _st.pack("<HH", 4, 4) + bytes((0x80, 1, 0)) + gct
    blob += b"\x2c" + _st.pack("<HHHH", 0, 0, 2, 2) + bytes((0x80,))
    blob += lct + bytes((2,))
    blob += bytes((len(data),)) + data + b"\x00\x3b"
    got = gif_pixels(bytes(blob))
    assert got is not None and got.shape == (4, 4, 3)
    assert (got[0, 0] == (0, 0, 255)).all()       # frame pixel: blue
    assert (got[3, 3] == (0, 255, 0)).all()       # background: GLOBAL[1]
    assert not (got == (255, 255, 255)).all(axis=2).any()  # never white
