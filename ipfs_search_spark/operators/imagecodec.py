"""Pure-python/numpy image codecs: baseline JPEG and GIF, decode + encode.

Closes the last real gap in the multimodal surface (S9): the reference's
NSFW/media pipeline decodes jpeg/gif/png/bmp pixels before feature
extraction (/root/reference/components/extractor/nsfw/extractor.go:81-118);
this container lacks PIL/libvips, so the entropy coders are implemented
here from the public specs directly:

  jpeg — ITU-T T.81 baseline sequential DCT: marker parse (DQT/DHT/SOF0/
         SOF1/DRI/SOS), canonical Huffman decode of the entropy-coded
         segment (byte unstuffing + restart markers), dequantize,
         de-zigzag, 8x8 inverse DCT as one batched numpy einsum over all
         blocks, chroma upsample, YCbCr->RGB.
  gif  — GIF87a/GIF89a: logical screen + color tables, sub-block
         reassembly, LZW decompression (variable code width, early
         code-size bump per the spec pairing), interlace reordering,
         first-frame composition over the background color.

Encoders exist for the same subsets (baseline JPEG at 4:4:4/4:2:0/
grayscale with canonical single-length Huffman tables; GIF with a real
growing-dictionary LZW compressor) so tests can plant ground-truth images
without any image library, and so the media sink side has a thumbnail
writer hook.

Everything here is per-blob scalar code invoked from Arrow-batched
mapInPandas iterators (operators/multimodal.py) — the distribution story
(one task holds a handful of blobs, constant memory per task) is the
caller's; these functions never see Spark.
"""

from __future__ import annotations

import struct

import numpy as np

# ---------------------------------------------------------------- JPEG ---

# zigzag[i] = natural (row*8+col) position of the i-th coefficient in
# zigzag scan order (T.81 Figure 5)
ZIGZAG = np.array([
    0, 1, 8, 16, 9, 2, 3, 10,
    17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34,
    27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36,
    29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46,
    53, 60, 61, 54, 47, 55, 62, 63], dtype=np.int64)

_SOF_BASELINE = {0xC0, 0xC1}  # baseline + extended sequential (same decode)


def _dct_matrix() -> np.ndarray:
    """Orthonormal 8x8 DCT-II basis: T[u, x] = c(u)/2 * cos((2x+1)u*pi/16).
    Forward: F = T @ f @ T.T;  inverse: f = T.T @ F @ T."""
    x = np.arange(8)
    u = np.arange(8)[:, None]
    t = 0.5 * np.cos((2 * x + 1) * u * np.pi / 16)
    t[0] *= 1 / np.sqrt(2)
    return t


_DCT_T = _dct_matrix()


class _HuffTable:
    """Canonical Huffman table from a DHT (bits[16] + symbol list):
    decode MSB-first via a (length, code) -> symbol dict."""

    def __init__(self, bits: list[int], vals: bytes):
        self.lookup: dict[tuple[int, int], int] = {}
        code, k = 0, 0
        for ln in range(1, 17):
            for _ in range(bits[ln - 1]):
                self.lookup[(ln, code)] = vals[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over a JPEG entropy-coded segment (already
    unstuffed)."""

    def __init__(self, data: bytes):
        self.data = data
        self.pos = 0
        self.bit = 0

    def read_bit(self) -> int:
        if self.pos >= len(self.data):
            raise EOFError
        b = (self.data[self.pos] >> (7 - self.bit)) & 1
        self.bit += 1
        if self.bit == 8:
            self.bit = 0
            self.pos += 1
        return b

    def read_bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.read_bit()
        return v

    def read_huff(self, table: _HuffTable) -> int:
        code, ln = 0, 0
        while ln < 16:
            code = (code << 1) | self.read_bit()
            ln += 1
            sym = table.lookup.get((ln, code))
            if sym is not None:
                return sym
        raise ValueError("invalid Huffman code")


def _extend(v: int, s: int) -> int:
    """T.81 F.2.2.1 EXTEND: map an s-bit magnitude code to its signed
    value."""
    if s == 0:
        return 0
    return v if v >= (1 << (s - 1)) else v - (1 << s) + 1


def _jpeg_segments(blob: bytes):
    """Walk marker segments; yield (marker, payload) and finally
    ('scan', entropy_segments, sos_payload) where entropy_segments is the
    byte-unstuffed entropy data split at restart markers."""
    i, n = 2, len(blob)
    while i + 3 < n:
        if blob[i] != 0xFF:
            return
        marker = blob[i + 1]
        if marker == 0xFF:
            i += 1
            continue
        if marker in (0xD8, 0x01) or 0xD0 <= marker <= 0xD7:
            i += 2
            continue
        if marker == 0xD9:
            return
        seg_len = int.from_bytes(blob[i + 2:i + 4], "big")
        if seg_len < 2 or i + 2 + seg_len > n:
            return
        payload = blob[i + 4:i + 2 + seg_len]
        if marker == 0xDA:
            # entropy-coded data follows: unstuff FF00, split at RSTn,
            # stop at any other marker (EOI)
            j = i + 2 + seg_len
            segs: list[bytes] = []
            cur = bytearray()
            while j < n:
                b = blob[j]
                if b != 0xFF:
                    cur.append(b)
                    j += 1
                    continue
                nxt = blob[j + 1] if j + 1 < n else 0xD9
                if nxt == 0x00:
                    cur.append(0xFF)
                    j += 2
                elif 0xD0 <= nxt <= 0xD7:
                    segs.append(bytes(cur))
                    cur = bytearray()
                    j += 2
                else:
                    break
            segs.append(bytes(cur))
            yield ("scan", segs, payload)
            return
        yield (marker, payload, b"")
        i += 2 + seg_len


def jpeg_pixels(blob: bytes):
    """REAL baseline JPEG decode (T.81 sequential DCT, Huffman entropy
    coding) in pure python + numpy. Supports the baseline wire format:
    8-bit samples, SOF0/SOF1 frames, one interleaved scan, any sampling
    factors (4:4:4, 4:2:2, 4:2:0, grayscale), restart intervals, 8/16-bit
    quantization tables. Returns (H, W, 3) uint8 RGB for color frames,
    (H, W, 1) for grayscale; None when the stream is not such a JPEG or
    is corrupt (per-row decoder-unavailable signal, never a raise)."""
    if blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, np.ndarray] = {}
    huff_dc: dict[int, _HuffTable] = {}
    huff_ac: dict[int, _HuffTable] = {}
    frame = None
    restart = 0
    scan = None
    try:
        for marker, payload, extra in _jpeg_segments(bytes(blob)):
            if marker == 0xDB:  # DQT: one or more tables per segment
                p = 0
                while p < len(payload):
                    pq, tq = payload[p] >> 4, payload[p] & 15
                    p += 1
                    nbytes = 64 if pq == 0 else 128
                    chunk = payload[p:p + nbytes]
                    if len(chunk) != nbytes:
                        return None  # truncated table
                    tab = np.frombuffer(
                        chunk, dtype=np.uint8 if pq == 0 else ">u2"
                    ).astype(np.int64)
                    p += nbytes
                    # T.81 B.2.4.1: DQT elements arrive in ZIGZAG order —
                    # store natural-order for the dequantize multiply
                    nat = np.empty(64, dtype=np.int64)
                    nat[ZIGZAG] = tab
                    qt[tq] = nat
            elif marker == 0xC4:  # DHT: one or more tables per segment
                p = 0
                while p + 17 <= len(payload):
                    tc, th = payload[p] >> 4, payload[p] & 15
                    bits = list(payload[p + 1:p + 17])
                    nv = sum(bits)
                    vals = payload[p + 17:p + 17 + nv]
                    if len(vals) != nv:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = \
                        _HuffTable(bits, vals)
                    p += 17 + nv
            elif marker in _SOF_BASELINE:
                prec = payload[0]
                h = int.from_bytes(payload[1:3], "big")
                w = int.from_bytes(payload[3:5], "big")
                nf = payload[5]
                if prec != 8 or not h or not w or nf not in (1, 3):
                    return None
                comps = []
                for c in range(nf):
                    cid = payload[6 + 3 * c]
                    hv = payload[7 + 3 * c]
                    comps.append({"id": cid, "h": hv >> 4, "v": hv & 15,
                                  "tq": payload[8 + 3 * c]})
                # T.81 allows factors 1-4; the assembly below additionally
                # needs integer upsampling ratios (covers every standard
                # layout: 4:4:4, 4:2:2, 4:2:0, 4:1:1, grayscale) — other
                # mixes return the documented None, never a raise
                if any(not 1 <= c["h"] <= 4 or not 1 <= c["v"] <= 4
                       for c in comps):
                    return None
                hm = max(c["h"] for c in comps)
                vm = max(c["v"] for c in comps)
                if any(hm % c["h"] or vm % c["v"] for c in comps):
                    return None
                frame = (h, w, comps)
            elif marker == 0xDD:  # DRI
                restart = int.from_bytes(payload[0:2], "big")
            elif marker == "scan":
                scan = (payload, extra)  # (entropy segments, SOS header)
    except (IndexError, ValueError, struct.error):
        return None
    if frame is None or scan is None:
        return None
    h, w, comps = frame
    segs, sos = scan
    ns = sos[0] if sos else -1
    if ns != len(comps) or len(sos) < 1 + 2 * ns:
        # only the standard single interleaved scan, and the SOS header
        # must actually hold its declared component entries (a truncated
        # header on an untrusted blob is a None, never an IndexError)
        return None
    # map scan component order / table ids onto frame components
    by_id = {c["id"]: c for c in comps}
    order = []
    for c in range(ns):
        cs, tda = sos[1 + 2 * c], sos[2 + 2 * c]
        comp = by_id.get(cs)
        if comp is None:
            return None
        comp["td"], comp["ta"] = tda >> 4, tda & 15
        order.append(comp)
    hmax = max(c["h"] for c in comps)
    vmax = max(c["v"] for c in comps)
    if not hmax or not vmax:
        return None
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))
    n_mcu = mcux * mcuy
    # Allocation guard (untrusted-blob DoS, same policy as the AVI
    # walker): every coded block consumes >= 2 bits of entropy data, so
    # a header declaring more blocks than the scan payload could hold is
    # malformed — reject BEFORE sizing the coefficient store off
    # attacker-controlled dimensions (a ~30-byte blob can declare
    # 65535x65535). The absolute cap (1M blocks ~ 42MP 4:2:0, 512 MB of
    # int64 coefficients) bounds even entropy-padded crafted blobs.
    total_blocks = n_mcu * sum(c["h"] * c["v"] for c in comps)
    ent_bytes = sum(len(s) for s in segs)
    if total_blocks > min(4 * ent_bytes + 64, 1_000_000):
        return None
    # per-component coefficient store: (blocks_y, blocks_x, 64) natural
    # order; IDCT is deferred and batched over every block at once
    coef = {c["id"]: np.zeros((mcuy * c["v"], mcux * c["h"], 64),
                              dtype=np.int64) for c in comps}
    try:
        for c in order:
            if (c["td"] not in huff_dc or c["ta"] not in huff_ac
                    or c["tq"] not in qt):
                return None
        mcu = 0
        for si, seg in enumerate(segs):
            rd = _BitReader(seg)
            pred = {c["id"]: 0 for c in comps}
            end = min(n_mcu, mcu + restart) if restart else n_mcu
            while mcu < end:
                my, mx = divmod(mcu, mcux)
                for c in order:
                    dct, act = huff_dc[c["td"]], huff_ac[c["ta"]]
                    for by in range(c["v"]):
                        for bx in range(c["h"]):
                            blk = np.zeros(64, dtype=np.int64)
                            s = rd.read_huff(dct)
                            diff = _extend(rd.read_bits(s), s)
                            pred[c["id"]] += diff
                            blk[0] = pred[c["id"]]
                            k = 1
                            while k < 64:
                                rs = rd.read_huff(act)
                                r, sz = rs >> 4, rs & 15
                                if sz == 0:
                                    if r == 15:
                                        k += 16
                                        continue
                                    break  # EOB
                                k += r
                                if k > 63:
                                    return None
                                blk[ZIGZAG[k]] = _extend(
                                    rd.read_bits(sz), sz)
                                k += 1
                            coef[c["id"]][my * c["v"] + by,
                                          mx * c["h"] + bx] = blk
                mcu += 1
            if mcu >= n_mcu:
                break
    except (EOFError, ValueError, IndexError):
        return None
    if mcu < n_mcu:
        return None
    planes = []
    for c in comps:
        q = qt[c["tq"]]
        arr = coef[c["id"]]
        by, bx = arr.shape[0], arr.shape[1]
        deq = (arr * q).reshape(by, bx, 8, 8).astype(np.float64)
        # batched inverse DCT: f = T.T @ F @ T over every block at once
        pix = np.einsum("ux,mnuv,vy->mnxy", _DCT_T, deq, _DCT_T)
        pix = pix.transpose(0, 2, 1, 3).reshape(by * 8, bx * 8) + 128.0
        # chroma/luma upsample to the frame sampling grid
        pix = np.repeat(np.repeat(pix, vmax // c["v"], axis=0),
                        hmax // c["h"], axis=1)
        planes.append(pix[:h, :w])
    if len(planes) == 1:
        y = np.clip(np.round(planes[0]), 0, 255).astype(np.uint8)
        return y[:, :, None]
    y, cb, cr = planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    out = np.stack([r, g, b], axis=2)
    return np.clip(np.round(out), 0, 255).astype(np.uint8)


class _BitWriter:
    """MSB-first bit writer with JPEG byte stuffing (FF -> FF 00)."""

    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def write(self, value: int, nbits: int) -> None:
        for i in range(nbits - 1, -1, -1):
            self.acc = (self.acc << 1) | ((value >> i) & 1)
            self.nbits += 1
            if self.nbits == 8:
                self.out.append(self.acc)
                if self.acc == 0xFF:
                    self.out.append(0x00)
                self.acc = 0
                self.nbits = 0

    def flush(self) -> None:
        if self.nbits:
            self.acc <<= (8 - self.nbits)
            self.acc |= (1 << (8 - self.nbits)) - 1  # pad with 1s (spec)
            self.out.append(self.acc)
            if self.acc == 0xFF:
                self.out.append(0x00)
            self.acc = 0
            self.nbits = 0


def _canonical_table(symbols: list[int]) -> tuple[list[int], bytes, dict]:
    """Single-length canonical Huffman table over the given symbols: all
    codes get length L = ceil(log2(n+1)) so the all-ones code stays
    unused (T.81 requires a prefix-free table; this one trivially is).
    Returns (bits[16], vals, symbol -> (code, length))."""
    syms = sorted(set(symbols))
    n = len(syms)
    # n < 2^bit_length(n) always holds, so codes 0..n-1 at this length
    # never include the all-ones code
    ln = max(1, (n).bit_length())
    bits = [0] * 16
    bits[ln - 1] = n
    enc = {s: (i, ln) for i, s in enumerate(syms)}
    return bits, bytes(syms), enc


def _size_cat(v: int) -> int:
    return int(abs(v)).bit_length()


def jpeg_encode_baseline(pix: np.ndarray, quant: np.ndarray | None = None,
                         subsample: bool = False,
                         restart: int = 0) -> bytes:
    """Minimal REAL baseline JPEG encoder (test fixture + thumbnail-sink
    hook): forward DCT (same orthonormal basis as the decoder), uniform
    quantization with the given 64-entry natural-order table (default all
    16s), canonical single-length Huffman tables declared via DHT, one
    interleaved scan. Grayscale (H,W,1) or RGB (H,W,3); subsample=True
    emits 4:2:0 chroma (2x2 mean), restart>0 writes DRI + RSTn markers
    every `restart` MCUs."""
    if quant is None:
        quant = np.full(64, 16, dtype=np.int64)
    quant = np.asarray(quant, dtype=np.int64).reshape(64)
    h, w, nch = pix.shape
    if nch == 3:
        p = pix.astype(np.float64)
        r, g, b = p[:, :, 0], p[:, :, 1], p[:, :, 2]
        planes = [0.299 * r + 0.587 * g + 0.114 * b,
                  128.0 - 0.168736 * r - 0.331264 * g + 0.5 * b,
                  128.0 + 0.5 * r - 0.418688 * g - 0.081312 * b]
        samp = [(2, 2), (1, 1), (1, 1)] if subsample else \
            [(1, 1), (1, 1), (1, 1)]
    else:
        planes = [pix[:, :, 0].astype(np.float64)]
        samp = [(1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcux = -(-w // (8 * hmax))
    mcuy = -(-h // (8 * vmax))

    def comp_blocks(plane: np.ndarray, hi: int, vi: int) -> np.ndarray:
        """(blocks_y, blocks_x, 8, 8) of quantized coefficients."""
        if (hi, vi) != (hmax, vmax):
            fy, fx = vmax // vi, hmax // hi
            # edge-replicate UP to a factor multiple before the 2x2 mean
            # (truncating a sub-factor dimension to zero rows would
            # zero-fill chroma — a color cast — instead of staying
            # faithful to the edge pixels)
            hh = -(-plane.shape[0] // fy) * fy
            ww = -(-plane.shape[1] // fx) * fx
            if (hh, ww) != plane.shape:
                py = hh - plane.shape[0]
                px = ww - plane.shape[1]
                plane = np.pad(plane, ((0, py), (0, px)), mode="edge")
            pl = plane.reshape(hh // fy, fy, ww // fx, fx)
            plane = pl.mean(axis=(1, 3))
        th, tw = mcuy * vi * 8, mcux * hi * 8
        pad = np.empty((th, tw), dtype=np.float64)
        ph, pw = min(plane.shape[0], th), min(plane.shape[1], tw)
        pad[:ph, :pw] = plane[:ph, :pw]
        pad[ph:] = pad[ph - 1:ph] if ph else 0.0  # edge replicate
        pad[:, pw:] = pad[:, pw - 1:pw] if pw else 0.0
        blocks = pad.reshape(th // 8, 8, tw // 8, 8).transpose(0, 2, 1, 3)
        f = np.einsum("ux,mnxy,vy->mnuv", _DCT_T, blocks - 128.0, _DCT_T)
        qf = np.round(f / quant.reshape(8, 8)).astype(np.int64)
        return qf

    qcomps = [comp_blocks(planes[i], *samp[i]) for i in range(len(planes))]
    # gather the symbols actually emitted to size the canonical tables —
    # MUST mirror the emission pass exactly (MCU-interleaved component
    # order, DC predictors reset at restart boundaries)
    dc_syms: set[int] = set()
    ac_syms: set[int] = {0x00}
    ncomp_ = len(planes)
    n_mcu_ = mcux * mcuy
    pred_ = [0] * ncomp_
    for m in range(n_mcu_):
        my, mx = divmod(m, mcux)
        for ci, qc in enumerate(qcomps):
            hi, vi = samp[ci]
            for by in range(vi):
                for bx in range(hi):
                    blk64 = qc[my * vi + by, mx * hi + bx]
                    dc = int(blk64.flat[0])
                    dc_syms.add(_size_cat(dc - pred_[ci]))
                    pred_[ci] = dc
                    zz = blk64.reshape(64)[ZIGZAG]
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            ac_syms.add(0xF0)
                            run -= 16
                        ac_syms.add((run << 4) | _size_cat(v))
                        run = 0
        if restart and (m + 1) % restart == 0 and m + 1 < n_mcu_:
            pred_ = [0] * ncomp_
    dc_bits, dc_vals, dc_enc = _canonical_table(sorted(dc_syms))
    ac_bits, ac_vals, ac_enc = _canonical_table(sorted(ac_syms))

    out = bytearray(b"\xff\xd8")

    def seg(marker: int, payload: bytes) -> None:
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(payload) + 2))
        out.extend(payload)

    # T.81 B.2.4.1: DQT payload is the table in ZIGZAG scan order
    seg(0xDB, bytes([0x00]) + bytes(int(q) for q in quant[ZIGZAG]))
    ncomp = len(planes)
    sof = struct.pack(">BHHB", 8, h, w, ncomp)
    for ci in range(ncomp):
        sof += bytes([ci + 1, (samp[ci][0] << 4) | samp[ci][1], 0])
    seg(0xC0, sof)
    seg(0xC4, bytes([0x00]) + bytes(dc_bits) + dc_vals)
    seg(0xC4, bytes([0x10]) + bytes(ac_bits) + ac_vals)
    if restart:
        seg(0xDD, struct.pack(">H", restart))
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    seg(0xDA, sos)

    bw = _BitWriter()

    def encode_value(v: int, enc: dict, wtr: _BitWriter,
                     run: int = 0) -> None:
        s = _size_cat(v)
        code, ln = enc[(run << 4) | s]
        wtr.write(code, ln)
        if s:
            wtr.write(v if v >= 0 else v + (1 << s) - 1, s)

    pred = [0] * ncomp
    n_mcu = mcux * mcuy
    rst = 0
    for m in range(n_mcu):
        my, mx = divmod(m, mcux)
        for ci, qc in enumerate(qcomps):
            hi, vi = samp[ci]
            for by in range(vi):
                for bx in range(hi):
                    blk = qc[my * vi + by, mx * hi + bx]
                    dc = int(blk.flat[0])
                    encode_value(dc - pred[ci], dc_enc, bw)
                    pred[ci] = dc
                    zz = blk.reshape(64)[ZIGZAG]
                    run = 0
                    for k in range(1, 64):
                        v = int(zz[k])
                        if v == 0:
                            run += 1
                            continue
                        while run > 15:
                            code, ln = ac_enc[0xF0]
                            bw.write(code, ln)
                            run -= 16
                        encode_value(v, ac_enc, bw, run)
                        run = 0
                    if run:
                        code, ln = ac_enc[0x00]
                        bw.write(code, ln)
        if restart and (m + 1) % restart == 0 and m + 1 < n_mcu:
            bw.flush()
            bw.out.extend(bytes([0xFF, 0xD0 + (rst % 8)]))
            rst += 1
            pred = [0] * ncomp
    bw.flush()
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


# ----------------------------------------------------------------- GIF ---


def _lzw_decode(data: bytes, min_code: int, n_pixels: int):
    """GIF LZW decompress (spec pairing: decoder bumps the code width when
    its next free slot reaches 2^width; the encoder bumps one entry later).
    Returns a list of palette indices or None on a corrupt stream."""
    clear = 1 << min_code
    end = clear + 1
    table: list[bytes] = [bytes([i]) for i in range(clear)] + [b"", b""]
    width = min_code + 1
    next_code = end + 1
    out = bytearray()
    acc = 0
    nbits = 0
    prev: bytes | None = None
    for byte in data:
        acc |= byte << nbits
        nbits += 8
        while nbits >= width:
            code = acc & ((1 << width) - 1)
            acc >>= width
            nbits -= width
            if code == clear:
                table = [bytes([i]) for i in range(clear)] + [b"", b""]
                width = min_code + 1
                next_code = end + 1
                prev = None
                continue
            if code == end:
                return list(out[:n_pixels]) if len(out) >= n_pixels \
                    else None
            if code < len(table) and code != end:
                entry = table[code]
            elif code == next_code and prev is not None:
                entry = prev + prev[:1]
            else:
                return None
            out.extend(entry)
            if prev is not None and next_code < 4096:
                table.append(prev + entry[:1])
                next_code += 1
                if next_code == (1 << width) and width < 12:
                    width += 1
            prev = entry
            if len(out) >= n_pixels:
                return list(out[:n_pixels])
    return list(out[:n_pixels]) if len(out) >= n_pixels else None


def gif_pixels(blob: bytes):
    """REAL GIF decode (GIF87a/89a): first frame, global/local color
    table, LZW decompression, interlace reordering; the frame rectangle is
    composed over a canvas of the background color when it does not cover
    the logical screen. Returns (H, W, 3) uint8 RGB or None."""
    if blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 13:
        return None
    w = int.from_bytes(blob[6:8], "little")
    h = int.from_bytes(blob[8:10], "little")
    packed = blob[10]
    bg = blob[11]
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = np.frombuffer(blob[i:i + 3 * n], dtype=np.uint8)
        if gct.size != 3 * n:
            return None
        gct = gct.reshape(n, 3)
        i += 3 * n
    if not w or not h:
        return None
    try:
        while i < len(blob):
            b = blob[i]
            if b == 0x3B:  # trailer
                return None
            if b == 0x21:  # extension: label + sub-blocks, skip
                i += 2
                while i < len(blob) and blob[i]:
                    i += 1 + blob[i]
                i += 1
                continue
            if b != 0x2C:
                return None
            left = int.from_bytes(blob[i + 1:i + 3], "little")
            top = int.from_bytes(blob[i + 3:i + 5], "little")
            fw = int.from_bytes(blob[i + 5:i + 7], "little")
            fh = int.from_bytes(blob[i + 7:i + 9], "little")
            fpk = blob[i + 9]
            i += 10
            ct = gct
            if fpk & 0x80:
                n = 2 << (fpk & 7)
                ct = np.frombuffer(blob[i:i + 3 * n], dtype=np.uint8)
                if ct.size != 3 * n:
                    return None
                ct = ct.reshape(n, 3)
                i += 3 * n
            if ct is None or not fw or not fh:
                return None
            min_code = blob[i]
            i += 1
            data = bytearray()
            while i < len(blob) and blob[i]:
                ln = blob[i]
                data.extend(blob[i + 1:i + 1 + ln])
                i += 1 + ln
            idx = _lzw_decode(bytes(data), min_code, fw * fh)
            if idx is None:
                return None
            arr = np.array(idx, dtype=np.int64).reshape(fh, fw)
            if fpk & 0x40:  # interlaced: reorder the 4 passes (GIF89a
                # appendix E: rows 0::8, 4::8, 2::4, 1::2)
                out_rows = np.empty((fh, fw), dtype=np.int64)
                src = 0
                for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
                    n_rows = len(range(start, fh, step))
                    out_rows[start::step] = arr[src:src + n_rows]
                    src += n_rows
                arr = out_rows
            if (arr >= ct.shape[0]).any():
                return None
            frame = ct[arr]
            if (left, top, fw, fh) == (0, 0, w, h):
                return frame.astype(np.uint8)
            canvas = np.empty((h, w, 3), dtype=np.uint8)
            # the background color index refers to the GLOBAL color
            # table (GIF89a 18.c) — never the frame's local table
            canvas[:] = (gct[bg] if gct is not None
                         and bg < gct.shape[0] else 0)
            y1, x1 = min(top + fh, h), min(left + fw, w)
            canvas[top:y1, left:x1] = frame[:y1 - top, :x1 - left]
            return canvas
    except (IndexError, ValueError):
        return None
    return None


# ------------------------------------------------------- MJPEG AVI ---
# Motion-JPEG in a RIFF AVI container is concatenated baseline JPEGs —
# the one video format whose frames this module can decode for real.


def avi_mjpeg_frames(blob: bytes):
    """Parse a RIFF AVI container and return the list of video-stream
    chunk payloads ('##dc'/'##db' ids inside the 'movi' LIST) — for an
    MJPEG file each payload is one standalone baseline JPEG. Returns
    None when the blob is not a RIFF AVI or the movi list is missing/
    torn. Container-level only: no codec assumption until a frame is
    handed to jpeg_pixels."""
    if len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    frames: list[bytes] = []

    # Iterative walk with an explicit stack — crawl blobs are untrusted,
    # and a recursive walk dies with RecursionError on a ~24 KB blob of
    # ~2000 nested LIST chunks (12 bytes buys a level), turning a bad
    # input into a task failure instead of the contractual None.
    stack: list[tuple[int, int, bool]] = [(12, len(blob), False)]
    while stack:
        i, end, in_movi = stack.pop()
        while i + 8 <= end:
            cid = blob[i:i + 4]
            size = int.from_bytes(blob[i + 4:i + 8], "little")
            body0, body1 = i + 8, i + 8 + size
            if body1 > end:
                return None  # torn chunk
            if cid == b"LIST":
                ltype = blob[body0:body0 + 4]
                # resume this level after the nested list, then descend
                stack.append((body1 + (size & 1), end, in_movi))
                i, end = body0 + 4, body1
                in_movi = in_movi or ltype == b"movi"
                continue
            if in_movi and len(cid) == 4 and cid[2:4] in (b"dc", b"db"):
                frames.append(blob[body0:body1])
            i = body1 + (size & 1)  # RIFF chunks are word-aligned
    return frames if frames else None


def avi_encode_mjpeg(jpeg_blobs: list[bytes], width: int, height: int,
                     fps: int = 30) -> bytes:
    """Minimal REAL MJPEG AVI writer (test fixture + thumbnail-reel sink
    hook): RIFF('AVI ' LIST('hdrl' avih LIST('strl' strh strf))
    LIST('movi' 00dc…))."""
    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) & 1 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    us_per_frame = max(1, 1_000_000 // fps)
    avih = struct.pack("<14I", us_per_frame, 0, 0, 0x10,  # AVIF_HASINDEX
                       len(jpeg_blobs), 0, 1, 0, width, height,
                       0, 0, 0, 0)
    # AVISTREAMHEADER: after fccType/fccHandler exactly 11 dword/word
    # fields precede rcFrame (dwFlags, wPriority, wLanguage,
    # dwInitialFrames, dwScale, dwRate, dwStart, dwLength,
    # dwSuggestedBufferSize, dwQuality, dwSampleSize) — 56 bytes total.
    strh = (b"vids" + b"MJPG" + struct.pack("<IHHIIIIIIII", 0, 0, 0, 0,
                                            1, fps, 0, len(jpeg_blobs),
                                            0, 0xFFFFFFFF, 0)
            + struct.pack("<4H", 0, 0, width, height))
    strf = struct.pack("<IiiHH4sIiiII", 40, width, height, 1, 24,
                       b"MJPG", width * height * 3, 0, 0, 0, 0)
    hdrl = lst(b"hdrl", chunk(b"avih", avih) +
               lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)))
    # movi chunks + the idx1 the AVIF_HASINDEX flag promises: one
    # 16-byte entry per frame, offsets relative to the 'movi' fourcc
    # (first chunk header at +4), AVIIF_KEYFRAME on every MJPEG frame.
    movi_chunks, offsets, off = [], [], 4
    for j in jpeg_blobs:
        offsets.append(off)
        ck = chunk(b"00dc", j)
        movi_chunks.append(ck)
        off += len(ck)
    movi = lst(b"movi", b"".join(movi_chunks))
    idx1 = chunk(b"idx1", b"".join(
        b"00dc" + struct.pack("<III", 0x10, o, len(j))
        for o, j in zip(offsets, jpeg_blobs)))
    body = b"AVI " + hdrl + movi + idx1
    return b"RIFF" + struct.pack("<I", len(body)) + body


def _lzw_encode(indices: list[int], min_code: int) -> bytes:
    """GIF LZW compress with a real growing dictionary (encoder bumps the
    code width when the next free slot EXCEEDS 2^width — one entry after
    the decoder, per the spec pairing) and a table reset near 4096."""
    clear = 1 << min_code
    end = clear + 1

    out = bytearray()
    acc = 0
    nbits = 0

    def emit(code: int, width: int) -> None:
        nonlocal acc, nbits
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8

    table: dict[tuple[int, ...], int] = {(i,): i for i in range(clear)}
    width = min_code + 1
    next_code = end + 1
    emit(clear, width)
    w: tuple[int, ...] = ()
    for k in indices:
        wk = w + (k,)
        if wk in table:
            w = wk
            continue
        emit(table[w], width)
        if next_code < 4094:
            table[wk] = next_code
            next_code += 1
            if next_code > (1 << width) and width < 12:
                width += 1
        else:
            emit(clear, width)
            table = {(i,): i for i in range(clear)}
            width = min_code + 1
            next_code = end + 1
        w = (k,)
    if w:
        emit(table[w], width)
    emit(end, width)
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def gif_encode(indices: np.ndarray, palette: np.ndarray,
               interlace: bool = False, bg: int = 0) -> bytes:
    """Minimal REAL GIF89a encoder for tests and thumbnail sinks: one
    full-screen frame from an (H, W) palette-index array and an (N, 3)
    color table (N a power of two, 2..256)."""
    h, w = indices.shape
    n = palette.shape[0]
    size_field = max(0, (n - 1).bit_length() - 1)
    if (2 << size_field) != n:
        raise ValueError("palette size must be a power of two >= 2")
    min_code = max(2, (n - 1).bit_length())
    out = bytearray(b"GIF89a")
    out.extend(struct.pack("<HH", w, h))
    out.append(0x80 | size_field)  # GCT present
    out.append(bg)
    out.append(0)
    out.extend(palette.astype(np.uint8).tobytes())
    out.append(0x2C)
    out.extend(struct.pack("<HHHH", 0, 0, w, h))
    out.append(0x40 if interlace else 0x00)
    arr = indices
    if interlace:
        rows = [arr[s::t] for s, t in ((0, 8), (4, 8), (2, 4), (1, 2))]
        arr = np.concatenate(rows, axis=0)
    out.append(min_code)
    data = _lzw_encode([int(v) for v in arr.reshape(-1)], min_code)
    for p in range(0, len(data), 255):
        chunk = data[p:p + 255]
        out.append(len(chunk))
        out.extend(chunk)
    out.append(0)
    out.append(0x3B)
    return bytes(out)
