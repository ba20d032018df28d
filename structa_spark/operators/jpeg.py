"""Baseline-sequential JPEG codec, stdlib+numpy only.

Closes the last feasible ``DecodeUnavailable`` seam in
``operators.multimodal``: baseline JPEG (SOF0) entropy coding is
Huffman + zigzag run-length — pure table arithmetic like GIF's LZW —
so it needs no external codec library. Out of scope and still a
principled decline: progressive (SOF2) and arithmetic-coded JPEG,
and MP4 (inter-frame video genuinely needs ffmpeg-class codecs).

Decode path (ITU-T T.81 / ISO 10918-1 baseline process):
segment walk -> DQT/DHT/SOF0/DRI/SOS -> Huffman-decoded MCUs with
per-component DC prediction and restart-marker resets -> dequantize
-> inverse zigzag -> 8x8 IDCT (orthonormal DCT-II matrix, numpy) ->
per-component planes -> nearest-neighbor chroma upsample -> YCbCr to
RGB (JFIF full-range) -> (h, w, 1|3) uint8.

The encoder twin (:func:`encode_jpeg`) writes 4:4:4 or 4:2:0
baseline streams with CUSTOM canonical Huffman tables built from the
symbols each image actually uses (a valid choice any conformant
decoder must honor — tables arrive in DHT either way), which keeps
this module free of the Annex K constant blocks while still
exercising the decoder's general DHT path. With an all-ones
quantization table a flat 8x8 block round-trips EXACTLY (DC-only
coefficients, no AC loss), which is what lets the driver oracle
predict decoded statistics arithmetically.

The per-pixel Python/numpy cost matches the PNG/GIF decoders'
documented posture: fine for the thumbnail-scale payloads a feature
pipeline decodes per row inside Arrow batches; a production cluster
swaps a C codec in at exactly this seam.
"""

from __future__ import annotations

import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]

# natural (row-major) position of the k-th zigzag coefficient; the
# inverse permutation maps a zigzag-ordered 64-vector to natural order
_ZIGZAG_INV = sorted(range(64), key=_ZIGZAG.__getitem__)

# Declared-dims bomb guard, like PNG/GIF's _MAX_PIXEL_BYTES — sized
# for THIS decoder's working set, not the output array: float32
# component planes + one float32 conversion transient + the uint8
# output peak at ~23 bytes per pixel, so 16M pixels (4096x4096 — a
# 16MP camera frame) keeps peak memory ~380 MB. Larger frames (48MP
# phone sensors) decline with JpegError and degrade to null at the
# multimodal seam; the per-block Python Huffman loop makes them a
# CPU hazard before a memory one anyway.
_MAX_PIXELS = 16 * 1024 * 1024


class JpegError(ValueError):
    """Malformed/unsupported JPEG; multimodal's seam maps it (and
    every other decoder error) to DecodeUnavailable."""


def _dct_matrix():
    import numpy as np
    x = np.arange(8)
    m = np.cos((2 * x[None, :] + 1) * x[:, None] * np.pi / 16)
    m[0] *= 1 / np.sqrt(2)
    return m * 0.5          # orthonormal: M @ M.T == I


# ---------------------------------------------------------------------------
# Huffman
# ---------------------------------------------------------------------------

class _HuffDecoder:
    """Canonical JPEG Huffman table: (length, code) -> symbol."""

    def __init__(self, counts, symbols):
        self.map = {}
        code = 0
        i = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.map[(length, code)] = symbols[i]
                code += 1
                i += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with 0xFF00
    unstuffing; stops at any real marker (leaves it unconsumed)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None

    def _fill(self):
        d, p = self.data, self.pos
        if p >= len(d):
            raise JpegError("truncated entropy stream")
        b = d[p]
        if b == 0xFF:
            if p + 1 >= len(d):
                raise JpegError("truncated entropy stream")
            nxt = d[p + 1]
            if nxt == 0x00:
                self.pos = p + 2
            elif 0xD0 <= nxt <= 0xD7:      # RSTn handled by caller
                self.marker = nxt
                raise _Restart()
            else:
                self.marker = nxt
                raise JpegError("marker inside entropy stream")
        else:
            self.pos = p + 1
        self.acc = (self.acc << 8) | b
        self.nbits += 8

    def bits(self, n: int) -> int:
        while self.nbits < n:
            self._fill()
        self.nbits -= n
        v = (self.acc >> self.nbits) & ((1 << n) - 1)
        self.acc &= (1 << self.nbits) - 1
        return v

    def huff(self, table: _HuffDecoder) -> int:
        length = 0
        code = 0
        for _ in range(16):
            code = (code << 1) | self.bits(1)
            length += 1
            sym = table.map.get((length, code))
            if sym is not None:
                return sym
        raise JpegError("invalid Huffman code")

    def align_and_consume_rst(self):
        """Byte-align at a restart marker and consume it."""
        self.acc = 0
        self.nbits = 0
        d, p = self.data, self.pos
        # skip any fill bits already buffered; find the marker
        while p + 1 < len(d) and not (
                d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7):
            p += 1
        if p + 1 >= len(d):
            raise JpegError("missing restart marker")
        self.pos = p + 2
        self.marker = None


class _Restart(Exception):
    pass


def _extend(v: int, t: int) -> int:
    """DC/AC magnitude-category sign extension (T.81 F.2.2.1)."""
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


# ---------------------------------------------------------------------------
# decoder
# ---------------------------------------------------------------------------

def decode_jpeg_pixels(payload):
    """REAL baseline-JPEG pixel decode -> (h, w, 1|3) uint8 array.
    Supports SOF0/1 (baseline sequential), 8-bit precision, 1 or 3
    components, sampling factors up to 4 whose ratios divide evenly
    (4:4:4 / 4:2:2 / 4:2:0 / 4:1:1 — the shipped layouts), multiple
    DQT/DHT segments, restart intervals.
    Progressive/arithmetic/12-bit, fractional-ratio sampling and any
    malformed stream raise :class:`JpegError` — never a bare
    IndexError/struct.error from the byte walk."""
    try:
        return _decode_jpeg(payload)
    except JpegError:
        raise
    except (IndexError, struct.error, ValueError, OverflowError) as e:
        # ValueError: e.g. numpy frombuffer on an odd-length 16-bit
        # DQT body; OverflowError: absurd magnitude categories from
        # corrupt Huffman tables. The contract is JpegError or pixels.
        raise JpegError(f"malformed JPEG: {type(e).__name__}: {e}") \
            from e


def _decode_jpeg(payload):
    import numpy as np

    p = bytes(payload) if payload is not None else b""
    if p[:2] != b"\xff\xd8":
        raise JpegError("not a JPEG stream")
    qt = {}           # tq -> np.array(64)
    huff_dc = {}
    huff_ac = {}
    frame = None      # (h, w, comps) comps: [(cid, hi, vi, tq)]
    restart = 0
    i = 2
    while i + 4 <= len(p):
        if p[i] != 0xFF:
            raise JpegError("bad marker alignment")
        # spec-legal 0xFF fill bytes may pad before any marker
        # (ITU-T T.81 B.1.1.2) — real camera files carry them
        while i + 1 < len(p) and p[i + 1] == 0xFF:
            i += 1
        if i + 2 > len(p):
            # payload ends inside a fill-byte run: keep the contract
            # "JpegError or pixels" even for direct _decode_jpeg
            # callers, not a bare IndexError from the read below
            raise JpegError("truncated marker")
        m = p[i + 1]
        if m == 0xD8:
            i += 2
            continue
        if m == 0xD9:
            break
        if m == 0x01 or 0xD0 <= m <= 0xD7:
            # length-less standalone markers between header segments
            # (TEM, stray RSTn): advance without a bogus length read
            i += 2
            continue
        if i + 4 > len(p):
            break
        ln = struct.unpack(">H", p[i + 2:i + 4])[0]
        seg = p[i + 4:i + 2 + ln]
        if m == 0xDB:                          # DQT
            j = 0
            while j < len(seg):
                pq, tq = seg[j] >> 4, seg[j] & 15
                j += 1
                if pq == 0:
                    vals = np.frombuffer(seg[j:j + 64], np.uint8)
                    j += 64
                else:
                    vals = np.frombuffer(seg[j:j + 128],
                                         ">u2").astype(np.int64)
                    j += 128
                if len(vals) < 64:
                    raise JpegError("short DQT")
                qt[tq] = vals.astype(np.int64)
        elif m == 0xC4:                        # DHT
            j = 0
            while j + 17 <= len(seg):
                tc, th = seg[j] >> 4, seg[j] & 15
                counts = list(seg[j + 1:j + 17])
                n = sum(counts)
                symbols = list(seg[j + 17:j + 17 + n])
                if len(symbols) < n:
                    raise JpegError("short DHT")
                (huff_dc if tc == 0 else huff_ac)[th] = \
                    _HuffDecoder(counts, symbols)
                j += 17 + n
        elif m == 0xC0 or m == 0xC1:           # SOF0/1 baseline
            prec = seg[0]
            h, w = struct.unpack(">HH", seg[1:5])
            nc = seg[5]
            if prec != 8:
                raise JpegError(f"unsupported precision {prec}")
            if nc not in (1, 3):
                raise JpegError(f"unsupported component count {nc}")
            if w == 0 or h == 0 or w * h > _MAX_PIXELS:
                raise JpegError(f"implausible JPEG dims {w}x{h}")
            comps = []
            for c in range(nc):
                cid = seg[6 + 3 * c]
                hv = seg[7 + 3 * c]
                comps.append((cid, hv >> 4, hv & 15,
                              seg[8 + 3 * c]))
            frame = (h, w, comps)
        elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA,
                   0xCB, 0xCD, 0xCE, 0xCF):
            raise JpegError("non-baseline JPEG (progressive/"
                            "arithmetic) needs an external codec")
        elif m == 0xDD:                        # DRI
            restart = struct.unpack(">H", seg[0:2])[0]
        elif m == 0xDA:                        # SOS -> entropy data
            if frame is None:
                raise JpegError("SOS before SOF")
            ns = seg[0]
            sel = {}
            for c in range(ns):
                sel[seg[1 + 2 * c]] = (seg[2 + 2 * c] >> 4,
                                       seg[2 + 2 * c] & 15)
            return _decode_scan(p, i + 2 + ln, frame, sel, qt,
                                huff_dc, huff_ac, restart)
        i += 2 + ln
    raise JpegError("no SOS scan found")


def _decode_scan(p, pos, frame, sel, qt, huff_dc, huff_ac, restart):
    import numpy as np

    h, w, comps = frame
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax < 1 or vmax < 1 or hmax > 4 or vmax > 4:
        raise JpegError("unsupported sampling factors")
    for _cid, hi, vi, _tq in comps:
        if hi < 1 or vi < 1 or hmax % hi or vmax % vi:
            # T.81 permits e.g. 3-vs-4 ratios; the repeat-based
            # upsampler below cannot express fractional ratios, so
            # decline instead of mis-sizing the plane
            raise JpegError(
                f"fractional sampling ratio {hi}x{vi}/{hmax}x{vmax}")
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))
    M = _dct_matrix()
    planes = {}
    for cid, hi, vi, tq in comps:
        # float32 planes: IDCT runs per-block in float64, but stored
        # samples are pre-clip pixel values (|x| <= ~1024) where
        # float32's 24-bit mantissa is exact to far below the final
        # uint8 rounding — and the plane memory halves, which is what
        # the _MAX_PIXELS working-set budget is computed from
        planes[cid] = np.zeros((mcy * vi * 8, mcx * hi * 8),
                               np.float32)
        if tq not in qt:
            raise JpegError(f"missing quant table {tq}")
        if cid not in sel:
            raise JpegError(f"component {cid} absent from scan")
        td, ta = sel[cid]
        if td not in huff_dc or ta not in huff_ac:
            raise JpegError("missing Huffman table")
    br = _BitReader(p, pos)
    pred = {cid: 0 for cid, *_ in comps}
    # DQT ships zigzag-ordered, exactly like the decoded coefficient
    # stream: dequantize in zigzag order, THEN permute to natural
    deq = {cid: qt[tq] for cid, _h, _v, tq in comps}
    zz_inv = np.array(_ZIGZAG_INV)
    mcu_count = 0
    for my in range(mcy):
        for mx in range(mcx):
            if restart and mcu_count and mcu_count % restart == 0:
                br.align_and_consume_rst()
                pred = {cid: 0 for cid in pred}
            try:
                for cid, hi, vi, tq in comps:
                    td, ta = sel[cid]
                    for by in range(vi):
                        for bx in range(hi):
                            blk = _decode_block(
                                br, huff_dc[td], huff_ac[ta],
                                pred, cid)
                            coef = (blk * deq[cid])[zz_inv] \
                                .reshape(8, 8)
                            spat = M.T @ coef @ M
                            y0 = (my * vi + by) * 8
                            x0 = (mx * hi + bx) * 8
                            planes[cid][y0:y0 + 8,
                                        x0:x0 + 8] = spat
            except _Restart:
                raise JpegError("unexpected restart marker")
            mcu_count += 1
    out = []
    for cid, hi, vi, tq in comps:
        pl = planes[cid]
        if hi != hmax or vi != vmax:
            pl = np.repeat(np.repeat(pl, vmax // vi, axis=0),
                           hmax // hi, axis=1)
        out.append(pl[:h, :w])
    if len(out) == 1:
        # grayscale converts via float64: the flat-block exactness
        # contract (DC-only, unit quant -> bit-exact round trip)
        # rides this path
        g = np.clip(out[0].astype(np.float64) + 128.0, 0, 255)
        return (g + 0.5).astype(np.uint8)[:, :, None]
    # color path: channel-at-a-time float32 into a preallocated uint8
    # image — no 3-channel float64 stack, which is what keeps the
    # working set inside the _MAX_PIXELS budget. float32's ~1e-3
    # absolute error on <=1024-magnitude samples is far below the
    # +-1-per-channel chroma tolerance this path already carries.
    y, cb, cr = out                  # level-shifted: y-128, cb, cr
    f32 = np.float32
    yf = y + f32(128.0)
    img = np.empty(yf.shape + (3,), np.uint8)
    img[..., 0] = (np.clip(yf + f32(1.402) * cr, 0, 255)
                   + f32(0.5)).astype(np.uint8)
    img[..., 1] = (np.clip(yf - f32(0.344136) * cb
                           - f32(0.714136) * cr, 0, 255)
                   + f32(0.5)).astype(np.uint8)
    img[..., 2] = (np.clip(yf + f32(1.772) * cb, 0, 255)
                   + f32(0.5)).astype(np.uint8)
    return img


def _decode_block(br, hdc, hac, pred, cid):
    import numpy as np
    blk = np.zeros(64, np.int64)
    t = br.huff(hdc)
    if t > 16:
        # baseline DC categories stop at 11; a corrupt DHT can name
        # any byte as the symbol, and bits(255) would build a
        # ~2^255 int before overflowing int64
        raise JpegError(f"invalid DC magnitude category {t}")
    diff = _extend(br.bits(t), t) if t else 0
    pred[cid] += diff
    blk[0] = pred[cid]
    k = 1
    while k < 64:
        rs = br.huff(hac)
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r == 15:                 # ZRL: sixteen zeros
                k += 16
                continue
            break                       # EOB
        k += r
        if k > 63:
            raise JpegError("AC index overflow")
        blk[k] = _extend(br.bits(s), s)
        k += 1
    return blk


# ---------------------------------------------------------------------------
# encoder (test / synthetic-data twin)
# ---------------------------------------------------------------------------

def _build_huff(symbols):
    """Single-length canonical Huffman table over the used symbol
    set (valid per T.81: table arrives via DHT; the all-ones code is
    reserved, hence the +1)."""
    syms = sorted(set(symbols))
    length = max(1, (len(syms) + 1 - 1).bit_length())
    while (1 << length) < len(syms) + 1:
        length += 1
    counts = [0] * 16
    counts[length - 1] = len(syms)
    enc = {s: (length, i) for i, s in enumerate(syms)}
    return counts, syms, enc


class _BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.nbits = 0

    def put(self, val, n):
        self.acc = (self.acc << n) | (val & ((1 << n) - 1))
        self.nbits += n
        while self.nbits >= 8:
            self.nbits -= 8
            b = (self.acc >> self.nbits) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)
            self.acc &= (1 << self.nbits) - 1

    def flush(self):
        if self.nbits:
            self.put((1 << (8 - self.nbits)) - 1, 8 - self.nbits)


def _category(v: int):
    a = abs(v)
    t = a.bit_length()
    return t, (v if v >= 0 else v + (1 << t) - 1)


def encode_jpeg(pixels, quant: int = 1, subsample: bool = False,
                restart_interval: int = 0) -> bytes:
    """Baseline JPEG encoder: ``(h, w)``/``(h, w, 1)`` gray or
    ``(h, w, 3)`` RGB uint8 -> SOF0 stream with a uniform ``quant``
    quantization table, 4:4:4 (or 4:2:0 with ``subsample``) sampling
    and per-image canonical Huffman tables. ``quant=1`` keeps every
    flat 8x8 block exact through the round trip.
    ``restart_interval`` > 0 emits a DRI segment and RST0-7 markers
    every that-many MCUs (byte-aligned, DC predictors reset) — the
    error-resilience layout real camera JPEGs ship with, so the
    decoder's restart path gets exercised by genuine streams."""
    import numpy as np

    arr = np.asarray(pixels, dtype=np.uint8)
    if arr.ndim == 2:
        arr = arr[:, :, None]
    h, w, nc = arr.shape
    if nc not in (1, 3):
        raise ValueError(f"1 or 3 channels required: {nc}")
    M = _dct_matrix()
    q = np.full(64, int(quant), np.int64)
    _zz = np.array(_ZIGZAG)          # natural -> zigzag gather

    if nc == 3:
        f = arr.astype(np.float64)
        y = (0.299 * f[..., 0] + 0.587 * f[..., 1]
             + 0.114 * f[..., 2])
        cb = 128.0 + (f[..., 2] - y) / 1.772
        cr = 128.0 + (f[..., 0] - y) / 1.402
        chans = [y, cb, cr]
    else:
        chans = [arr[..., 0].astype(np.float64)]

    sub = subsample and nc == 3
    hs = [(2, 2), (1, 1), (1, 1)] if sub else [(1, 1)] * nc
    hmax = max(a for a, _ in hs[:nc])
    vmax = max(b for _, b in hs[:nc])
    mcx = -(-w // (8 * hmax))
    mcy = -(-h // (8 * vmax))

    planes = []
    for ci, ch in enumerate(chans):
        hi, vi = hs[ci]
        if (hi, vi) != (hmax, vmax):
            # box-filter subsample to the component resolution
            fy, fx = vmax // vi, hmax // hi
            ph = -(-h // fy) * fy
            pw = -(-w // fx) * fx
            pad = np.pad(ch, ((0, ph - h), (0, pw - w)), "edge")
            ch = pad.reshape(ph // fy, fy, pw // fx, fx).mean((1, 3))
        th = mcy * vi * 8
        tw = mcx * hi * 8
        ch = np.pad(ch, ((0, th - ch.shape[0]),
                         (0, tw - ch.shape[1])), "edge")
        planes.append(ch)

    # entropy-code twice: pass 1 collects symbols, pass 2 writes
    def scan(writer, enc_dc=None, enc_ac=None, dc_syms=None,
             ac_syms=None):
        pred = [0] * nc
        mcu = 0
        rst = 0
        for my in range(mcy):
            for mx in range(mcx):
                if (restart_interval and mcu
                        and mcu % restart_interval == 0):
                    pred = [0] * nc
                    if writer is not None:
                        writer.flush()
                        # markers bypass byte stuffing
                        writer.out.extend((0xFF, 0xD0 + rst))
                        rst = (rst + 1) % 8
                mcu += 1
                for ci in range(nc):
                    hi, vi = hs[ci]
                    for by in range(vi):
                        for bx in range(hi):
                            y0 = (my * vi + by) * 8
                            x0 = (mx * hi + bx) * 8
                            blk = planes[ci][y0:y0 + 8,
                                             x0:x0 + 8] - 128.0
                            coef = M @ blk @ M.T
                            zz = np.round(
                                coef.reshape(64)[_zz]
                                / q).astype(np.int64)
                            cls = 0 if ci == 0 else 1
                            _code_block(zz, pred, ci, cls, writer,
                                        enc_dc, enc_ac, dc_syms,
                                        ac_syms)

    dc_syms = [[], []]
    ac_syms = [[], []]
    scan(None, dc_syms=dc_syms, ac_syms=ac_syms)
    n_classes = 1 if nc == 1 else 2
    dc_tables = [_build_huff(dc_syms[c]) for c in range(n_classes)]
    ac_tables = [_build_huff(ac_syms[c]) for c in range(n_classes)]

    bw = _BitWriter()
    scan(bw, enc_dc=[t[2] for t in dc_tables],
         enc_ac=[t[2] for t in ac_tables])
    bw.flush()

    out = bytearray(b"\xff\xd8")

    def seg(marker, body):
        out.extend(bytes([0xFF, marker]))
        out.extend(struct.pack(">H", len(body) + 2))
        out.extend(body)

    seg(0xDB, bytes([0]) + bytes(int(x) for x in q))
    if restart_interval:
        seg(0xDD, struct.pack(">H", restart_interval))
    sof = bytearray([8]) + struct.pack(">HH", h, w) + bytes([nc])
    for ci in range(nc):
        hi, vi = hs[ci]
        sof += bytes([ci + 1, (hi << 4) | vi, 0])
    seg(0xC0, bytes(sof))
    for tc, tables in ((0, dc_tables), (1, ac_tables)):
        for th, (counts, syms, _e) in enumerate(tables):
            seg(0xC4, bytes([(tc << 4) | th]) + bytes(counts)
                + bytes(syms))
    sos = bytearray([nc])
    for ci in range(nc):
        cls = 0 if ci == 0 else 1
        sos += bytes([ci + 1, (cls << 4) | cls])
    sos += bytes([0, 63, 0])
    seg(0xDA, bytes(sos))
    out.extend(bw.out)
    out.extend(b"\xff\xd9")
    return bytes(out)


def _code_block(zz, pred, ci, cls, writer, enc_dc, enc_ac,
                dc_syms, ac_syms):
    t, bits_v = _category(int(zz[0]) - pred[ci])
    pred[ci] = int(zz[0])
    if writer is None:
        dc_syms[cls].append(t)
    else:
        ln, code = enc_dc[cls][t]
        writer.put(code, ln)
        if t:
            writer.put(bits_v, t)
    run = 0
    last = 0
    for k in range(1, 64):
        if zz[k]:
            last = k
    for k in range(1, last + 1):
        v = int(zz[k])
        if v == 0:
            run += 1
            continue
        while run > 15:
            if writer is None:
                ac_syms[cls].append(0xF0)
            else:
                ln, code = enc_ac[cls][0xF0]
                writer.put(code, ln)
            run -= 16
        s, bits_v = _category(v)
        rs = (run << 4) | s
        if writer is None:
            ac_syms[cls].append(rs)
        else:
            ln, code = enc_ac[cls][rs]
            writer.put(code, ln)
            writer.put(bits_v, s)
        run = 0
    if last < 63:
        if writer is None:
            ac_syms[cls].append(0x00)
        else:
            ln, code = enc_ac[cls][0x00]
            writer.put(code, ln)
