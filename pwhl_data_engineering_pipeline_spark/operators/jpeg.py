"""Baseline JPEG (ITU-T T.81) decoder — pure Python + numpy, no codec libs.

The last of the engine's media formats to get a REAL decode path (BMP, PCM
WAV, GIF/LZW, PNG/zlib live in ``multimodal``): baseline sequential DCT,
8-bit precision, grayscale or YCbCr with any sampling factors up to 2×2
(4:4:4 / 4:2:2 / 4:2:0), restart markers supported. Progressive (SOF2),
arithmetic coding, and 12-bit precision return None — the header decoder
still covers their metadata.

Decode pipeline per block: huffman-decode (DC diff + AC run/size) →
dequantize → de-zigzag → IDCT (matrix form, one numpy matmul pair per
block) → level shift → clamp; planes assemble MCU-by-MCU and subsampled
chroma upsamples by pixel replication (nearest), then the standard
JFIF YCbCr→RGB transform.

Correctness strategy (tests/test_jpeg_decode.py): a test-side ENCODER built
from the spec's Annex K tables round-trips smooth images within
quantization tolerance; independently, hand-constructed minimal streams
(solid gray: DC-only) pin exact pixel values, and single-AC-coefficient
blocks are checked against a from-the-formula DCT basis computed in the
test — so encoder and decoder cannot share a cancelling basis bug.
"""

from __future__ import annotations

import struct

_ZIGZAG = [
    0, 1, 8, 16, 9, 2, 3, 10, 17, 24, 32, 25, 18, 11, 4, 5,
    12, 19, 26, 33, 40, 48, 41, 34, 27, 20, 13, 6, 7, 14, 21, 28,
    35, 42, 49, 56, 57, 50, 43, 36, 29, 22, 15, 23, 30, 37, 44, 51,
    58, 59, 52, 45, 38, 31, 39, 46, 53, 60, 61, 54, 47, 55, 62, 63,
]


class _Huff:
    """Canonical Huffman table: {(length, code) -> symbol}."""

    __slots__ = ("lut",)

    def __init__(self, counts, symbols):
        self.lut = {}
        code = 0
        k = 0
        for length in range(1, 17):
            for _ in range(counts[length - 1]):
                self.lut[(length, code)] = symbols[k]
                code += 1
                k += 1
            code <<= 1


class _BitReader:
    """MSB-first bit reader over entropy-coded data with FF00 unstuffing.
    Stops at any real marker (FFxx, xx != 0) and reports it.

    Over-read tracking (round-3 advice): padding bits fabricated past the
    end of real data (stream exhausted, or past a terminating marker) are
    counted WHEN CONSUMED. The spec allows up to 7 fill bits to byte-align
    the final entropy-coded byte; consuming more than that means the scan
    ran out of real data before the last MCU completed — a truncated
    stream that would otherwise silently decode to zero-bit garbage.
    Callers check :attr:`overrun` and return None (the corrupt-stream
    contract of decode_jpeg_pixels)."""

    def __init__(self, data: bytes, pos: int):
        self.data = data
        self.pos = pos
        self.acc = 0
        self.nbits = 0
        self.marker = None
        self.fab_bits = 0  # fabricated padding bits currently in acc (low end)
        self.fab_consumed = 0

    @property
    def overrun(self) -> bool:
        """True once more than the 7 legal byte-align fill bits of
        fabricated padding have actually been consumed."""
        return self.fab_consumed > 7

    def _fill(self):
        d = self.data
        while self.nbits <= 24:
            if self.pos >= len(d):
                self.acc = (self.acc << 8) | 0
                self.nbits += 8
                self.fab_bits += 8
                continue
            b = d[self.pos]
            if b == 0xFF:
                nxt = d[self.pos + 1] if self.pos + 1 < len(d) else 0xD9
                if nxt == 0x00:
                    self.pos += 2
                else:
                    self.marker = nxt
                    # pad with zeros past the marker (spec: remaining bits
                    # of the last byte are padding)
                    self.acc = (self.acc << 8) | 0
                    self.nbits += 8
                    self.fab_bits += 8
                    continue
            else:
                self.pos += 1
            self.acc = ((self.acc << 8) | b) & ((1 << 40) - 1)
            self.nbits += 8

    def bit(self) -> int:
        if self.nbits == 0:
            self._fill()
        self.nbits -= 1
        if self.nbits < self.fab_bits:
            # fabricated bits sit at the low end of acc (fabrication never
            # precedes real data), so the bit just consumed was padding
            self.fab_consumed += 1
            self.fab_bits = self.nbits
        return (self.acc >> self.nbits) & 1

    def bits(self, n: int) -> int:
        v = 0
        for _ in range(n):
            v = (v << 1) | self.bit()
        return v

    def align_to_marker(self):
        """Skip to just past the next marker (RSTn) and reset state."""
        d = self.data
        # drop buffered bits; scan bytes for FF Dx
        p = self.pos
        while p + 1 < len(d):
            if d[p] == 0xFF and 0xD0 <= d[p + 1] <= 0xD7:
                self.pos = p + 2
                self.acc = 0
                self.nbits = 0
                self.marker = None
                # byte-align fill before each RSTn is legal — reset the
                # padding accounting for the next interval
                self.fab_bits = 0
                self.fab_consumed = 0
                return True
            p += 1
        return False


def _decode_huff(br: _BitReader, table: _Huff) -> int | None:
    code = 0
    for length in range(1, 17):
        code = (code << 1) | br.bit()
        sym = table.lut.get((length, code))
        if sym is not None:
            return sym
    return None


def _extend(v: int, t: int) -> int:
    if t == 0:
        return 0
    return v if v >= (1 << (t - 1)) else v - (1 << t) + 1


def decode_jpeg_pixels(blob: bytes):
    """Decode a baseline JPEG to an (h, w, 3) uint8 RGB array (grayscale
    replicates), or None for anything this decoder doesn't cover
    (progressive, arithmetic, 12-bit, >2×2 sampling, corrupt streams)."""
    import numpy as np

    if not blob or len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) comps = [(cid, hs, vs, tq)]
    restart_interval = 0
    i = 2
    n = len(blob)
    try:
        while i + 4 <= n:
            if blob[i] != 0xFF:
                return None
            # spec-legal 0xFF fill bytes may pad before any marker
            while i + 1 < n and blob[i + 1] == 0xFF:
                i += 1
            if i + 4 > n:
                return None
            m = blob[i + 1]
            if m == 0xD9:  # EOI before SOS
                return None
            if 0xD0 <= m <= 0xD8 or m == 0x01:  # standalone markers: no length
                i += 2
                continue
            (seglen,) = struct.unpack_from(">H", blob, i + 2)
            seg = blob[i + 4 : i + 2 + seglen]
            if m == 0xDB:  # DQT
                p = 0
                while p < len(seg):
                    pq, tq = seg[p] >> 4, seg[p] & 15
                    p += 1
                    if pq == 0:
                        tbl = np.frombuffer(seg[p : p + 64], dtype=np.uint8).astype(np.int32)
                        p += 64
                    else:
                        tbl = np.frombuffer(seg[p : p + 128], dtype=">u2").astype(np.int32)
                        p += 128
                    if len(tbl) != 64:
                        return None
                    qt[tq] = tbl
            elif m == 0xC4:  # DHT
                p = 0
                while p + 17 <= len(seg):
                    tc, th = seg[p] >> 4, seg[p] & 15
                    counts = list(seg[p + 1 : p + 17])
                    total = sum(counts)
                    syms = list(seg[p + 17 : p + 17 + total])
                    if len(syms) != total:
                        return None
                    (huff_dc if tc == 0 else huff_ac)[th] = _Huff(counts, syms)
                    p += 17 + total
            elif m == 0xC0 or m == 0xC1:  # SOF0/1 baseline(+ext sequential)
                prec = seg[0]
                h, w = struct.unpack_from(">HH", seg, 1)
                nc = seg[5]
                if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                    return None
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
                frame = (h, w, comps)
            elif m in (0xC2, 0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # progressive / arithmetic / hierarchical
            elif m == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif m == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = seg[0]
                sel = {}
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    tt = seg[2 + 2 * c]
                    sel[cs] = (tt >> 4, tt & 15)
                return _decode_scan(
                    np, blob, i + 2 + seglen, frame, sel, qt, huff_dc, huff_ac,
                    restart_interval,
                )
            i += 2 + seglen
    except (struct.error, IndexError, KeyError, ValueError, ZeroDivisionError):
        # the contract is None-on-corrupt, never a raised exception inside
        # a Spark task: ValueError covers e.g. a truncated 16-bit DQT
        # (frombuffer size mismatch), ZeroDivisionError a 0 sampling factor
        return None
    return None


def _decode_scan(np, blob, pos, frame, sel, qt, huff_dc, huff_ac, restart_interval):
    h, w, comps = frame
    if any(c[1] == 0 or c[2] == 0 for c in comps):
        return None  # 0 sampling factor: corrupt SOF
    hmax = max(c[1] for c in comps)
    vmax = max(c[2] for c in comps)
    if hmax not in (1, 2) or vmax not in (1, 2):
        return None
    mcu_w, mcu_h = 8 * hmax, 8 * vmax
    mcus_x = (w + mcu_w - 1) // mcu_w
    mcus_y = (h + mcu_h - 1) // mcu_h
    C = _idct_matrix_np(np)
    planes = []
    for cid, hs, vs, tq in comps:
        if cid not in sel or tq not in qt:
            return None
        planes.append(np.zeros((mcus_y * vs * 8, mcus_x * hs * 8), dtype=np.float64))
    br = _BitReader(blob, pos)
    pred = [0] * len(comps)
    mcu_count = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart_interval and mcu_count and mcu_count % restart_interval == 0:
                if not br.align_to_marker():
                    return None
                pred = [0] * len(comps)
            for ci, (cid, hs, vs, tq) in enumerate(comps):
                td, ta = sel[cid]
                dc_t = huff_dc.get(td)
                ac_t = huff_ac.get(ta)
                if dc_t is None or ac_t is None:
                    return None
                q = qt[tq]
                for by in range(vs):
                    for bx in range(hs):
                        coeffs = np.zeros(64, dtype=np.float64)
                        t = _decode_huff(br, dc_t)
                        if t is None or t > 11:
                            return None
                        diff = _extend(br.bits(t), t)
                        pred[ci] += diff
                        coeffs[0] = pred[ci] * q[0]
                        k = 1
                        while k < 64:
                            rs = _decode_huff(br, ac_t)
                            if rs is None:
                                return None
                            if rs == 0x00:  # EOB
                                break
                            if rs == 0xF0:  # ZRL
                                k += 16
                                continue
                            run, size = rs >> 4, rs & 15
                            k += run
                            if k > 63 or size == 0:
                                return None
                            coeffs[k] = _extend(br.bits(size), size) * q[k]
                            k += 1
                        block = np.zeros((8, 8), dtype=np.float64)
                        block.flat[_ZIGZAG_INV] = coeffs
                        spatial = C.T @ block @ C
                        y0 = (my * vs + by) * 8
                        x0 = (mx * hs + bx) * 8
                        planes[ci][y0 : y0 + 8, x0 : x0 + 8] = spatial
            mcu_count += 1
            if br.overrun:
                # entropy data ran out before this MCU finished: the bits
                # that "decoded" it were fabricated zero padding, not real
                # data — honor the corrupt-stream → None contract
                return None
    out_planes = []
    for ci, (cid, hs, vs, tq) in enumerate(comps):
        p = planes[ci] + 128.0
        # upsample to full MCU grid by replication, then crop
        ry, rx = vmax // vs, hmax // hs
        if ry > 1 or rx > 1:
            p = np.repeat(np.repeat(p, ry, axis=0), rx, axis=1)
        out_planes.append(p[:h, :w])
    if len(out_planes) == 1:
        g = np.clip(out_planes[0] + 0.5, 0, 255).astype(np.uint8)
        return np.stack([g, g, g], axis=2)
    y, cb, cr = out_planes
    r = y + 1.402 * (cr - 128.0)
    g = y - 0.344136 * (cb - 128.0) - 0.714136 * (cr - 128.0)
    b = y + 1.772 * (cb - 128.0)
    rgb = np.stack([r, g, b], axis=2)
    return np.clip(rgb + 0.5, 0, 255).astype(np.uint8)


def _idct_matrix_np(np):
    import math

    C = np.zeros((8, 8))
    for k in range(8):
        a = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for n_ in range(8):
            C[k, n_] = a * math.cos((2 * n_ + 1) * k * math.pi / 16)
    return C


# inverse zigzag: _ZIGZAG_INV[z] = natural index of zigzag position z
_ZIGZAG_INV = _ZIGZAG
