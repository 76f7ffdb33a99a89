"""JPEG (ITU-T T.81) decoder — pure Python + numpy, no codec libs.

The last of the engine's media formats to get a REAL decode path (BMP, PCM
WAV, GIF/LZW, PNG/zlib live in ``multimodal``): baseline sequential DCT
(SOF0/1) AND progressive DCT (SOF2, round 4) — spectral selection,
successive approximation (DC + AC first/refinement scans, EOB runs),
interleaved DC and non-interleaved AC scan orders, restart markers — for
8-bit precision, grayscale or YCbCr with sampling factors up to 2×2
(4:4:4 / 4:2:2 / 4:2:0). Arithmetic coding, hierarchical, and 12-bit
precision return None — the header decoder still covers their metadata.

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


def decode_jpeg_pixels(blob: bytes, max_pixels: int = 64_000_000):
    """Decode a baseline OR progressive JPEG to an (h, w, 3) uint8 RGB
    array (grayscale replicates), or None for anything this decoder doesn't
    cover (arithmetic coding, hierarchical, 12-bit, >2×2 sampling, corrupt
    streams). ``max_pixels`` bounds the decode allocation: corpus bytes are
    untrusted, and a forged 65535×65535 SOF header would otherwise ask for
    ~34 GB of plane buffers inside an executor task before a single
    entropy bit is read."""
    import numpy as np

    if not blob or len(blob) < 4 or blob[:2] != b"\xff\xd8":
        return None
    qt: dict[int, "np.ndarray"] = {}
    huff_dc: dict[int, _Huff] = {}
    huff_ac: dict[int, _Huff] = {}
    frame = None  # (h, w, comps) comps = [(cid, hs, vs, tq)]
    progressive = False
    prog = None  # _ProgState once the first progressive SOS is seen
    restart_interval = 0
    i = 2
    n = len(blob)
    try:
        while i + 2 <= n:  # EOI may be the final two bytes (progressive)
            if blob[i] != 0xFF:
                return None
            # spec-legal 0xFF fill bytes may pad before any marker
            while i + 1 < n and blob[i + 1] == 0xFF:
                i += 1
            if i + 2 > n:
                return None
            m = blob[i + 1]
            if m == 0xD9:  # EOI
                if prog is not None and prog.scans_done:
                    return prog.finalize(np, qt)
                return None  # EOI before any complete scan
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
            elif m in (0xC0, 0xC1, 0xC2):  # SOF0/1 baseline, SOF2 progressive
                prec = seg[0]
                h, w = struct.unpack_from(">HH", seg, 1)
                nc = seg[5]
                if prec != 8 or nc not in (1, 3) or h == 0 or w == 0:
                    return None
                if h * w > max_pixels:
                    return None  # untrusted header: refuse oversized allocs
                comps = []
                for c in range(nc):
                    cid = seg[6 + 3 * c]
                    hv = seg[7 + 3 * c]
                    comps.append((cid, hv >> 4, hv & 15, seg[8 + 3 * c]))
                frame = (h, w, comps)
                progressive = m == 0xC2
            elif m in (0xC3, 0xC5, 0xC6, 0xC7, 0xC9, 0xCA, 0xCB, 0xCD, 0xCE, 0xCF):
                return None  # arithmetic / hierarchical / lossless
            elif m == 0xDD:  # DRI
                (restart_interval,) = struct.unpack_from(">H", seg, 0)
            elif m == 0xDA:  # SOS — entropy data follows
                if frame is None:
                    return None
                ns = seg[0]
                sel = {}
                order = []  # scan order matters for interleaved progressive DC
                for c in range(ns):
                    cs = seg[1 + 2 * c]
                    tt = seg[2 + 2 * c]
                    sel[cs] = (tt >> 4, tt & 15)
                    order.append(cs)
                if not progressive:
                    return _decode_scan(
                        np, blob, i + 2 + seglen, frame, sel, qt, huff_dc,
                        huff_ac, restart_interval,
                    )
                ss, se = seg[1 + 2 * ns], seg[2 + 2 * ns]
                aa = seg[3 + 2 * ns]
                ah, al = aa >> 4, aa & 15
                if prog is None:
                    prog = _ProgState(np, frame)
                nxt = prog.decode_scan(
                    np, blob, i + 2 + seglen, order, sel, ss, se, ah, al,
                    huff_dc, huff_ac, restart_interval,
                )
                if nxt is None:
                    return None
                i = nxt  # position of the marker following the scan data
                continue
            i += 2 + seglen
    except (struct.error, IndexError, KeyError, ValueError, ZeroDivisionError, MemoryError):
        # the contract is None-on-corrupt, never a raised exception inside
        # a Spark task: ValueError covers e.g. a truncated 16-bit DQT
        # (frombuffer size mismatch), ZeroDivisionError a 0 sampling
        # factor, MemoryError a dimensions-vs-cap race on tight executors
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
    return _planes_to_rgb(np, planes, comps, hmax, vmax, h, w)


def _planes_to_rgb(np, planes, comps, hmax, vmax, h, w):
    """Level-shift, replication-upsample, crop, and color-transform decoded
    component planes (shared by the baseline and progressive paths)."""
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


def _next_marker(blob, p):
    """Position of the first real marker (not a stuffed FF00, not RSTn) at
    or after ``p`` — how the multi-scan loop resumes after entropy data."""
    n = len(blob)
    while p + 1 < n:
        if blob[p] == 0xFF and blob[p + 1] != 0x00 and not (0xD0 <= blob[p + 1] <= 0xD7):
            return p
        p += 1
    return None


def _prog_ac_first(br, ac_t, blk, ss, se, al, eobrun):
    """Progressive AC scan, first pass (Ah=0): spectral band [ss, se] at
    point-transform level ``al`` with EOB-run coding (T.81 §G.1.2.2).
    ``blk`` is the block's 64 zigzag-ordered coefficients; returns the new
    EOB run, or None on a corrupt symbol."""
    if eobrun > 0:
        return eobrun - 1
    k = ss
    while k <= se:
        rs = _decode_huff(br, ac_t)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 15
        if s == 0:
            if r < 15:  # EOBn: run of (1<<r)+bits(r) all-done blocks
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                return eobrun
            k += 16  # ZRL
        else:
            k += r
            if k > se:
                return None
            blk[k] = _extend(br.bits(s), s) * (1 << al)
            k += 1
    return 0


def _prog_ac_refine(br, ac_t, blk, ss, se, al, eobrun):
    """Progressive AC refinement (Ah=Al+1): one correction bit per already-
    nonzero coefficient traversed; new coefficients arrive as ±1<<al
    (T.81 §G.1.2.3). Returns the new EOB run, or None on corruption."""
    p1 = 1 << al
    k = ss
    if eobrun > 0:
        # EOB-run block: correction bits only, for every nonzero coefficient
        while k <= se:
            c = int(blk[k])
            if c != 0 and br.bit() and (c & p1) == 0:
                blk[k] = c + (p1 if c >= 0 else -p1)
            k += 1
        return eobrun - 1
    while k <= se:
        rs = _decode_huff(br, ac_t)
        if rs is None:
            return None
        r, s = rs >> 4, rs & 15
        newval = 0
        if s == 0:
            if r < 15:
                eobrun = (1 << r) - 1
                if r:
                    eobrun += br.bits(r)
                r = 64  # sweep the rest of this block with correction bits
            # r == 15 (ZRL): skip 16 zero-history positions below
        else:
            if s != 1:
                return None  # refinement can only introduce ±1<<al
            newval = p1 if br.bit() else -p1
        while k <= se:
            c = int(blk[k])
            if c != 0:
                if br.bit() and (c & p1) == 0:
                    blk[k] = c + (p1 if c >= 0 else -p1)
            else:
                if r == 0:
                    break
                r -= 1
            k += 1
        if newval and k <= se:
            blk[k] = newval
        k += 1
    return eobrun


class _ProgState:
    """Coefficient accumulator for a progressive (SOF2) frame: every scan
    deposits DC/AC bits into per-component zigzag-ordered int32 block
    arrays; finalize() dequantizes + IDCTs the lot in one vectorized pass."""

    def __init__(self, np, frame):
        h, w, comps = frame
        self.frame = frame
        if any(c[1] == 0 or c[2] == 0 for c in comps):
            raise ValueError("zero sampling factor")
        self.hmax = max(c[1] for c in comps)
        self.vmax = max(c[2] for c in comps)
        if self.hmax not in (1, 2) or self.vmax not in (1, 2):
            raise ValueError("unsupported sampling")
        self.mcus_x = (w + 8 * self.hmax - 1) // (8 * self.hmax)
        self.mcus_y = (h + 8 * self.vmax - 1) // (8 * self.vmax)
        self.coef = []
        self.nb = []  # per-comp non-interleaved block dims (rows, cols)
        self.by_cid = {}
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            self.coef.append(
                np.zeros((self.mcus_y * vs, self.mcus_x * hs, 64), np.int32)
            )
            cw = (w * hs + self.hmax - 1) // self.hmax
            ch = (h * vs + self.vmax - 1) // self.vmax
            self.nb.append(((ch + 7) // 8, (cw + 7) // 8))
            self.by_cid[cid] = ci
        self.scans_done = 0

    def decode_scan(
        self, np, blob, pos, order, sel, ss, se, ah, al,
        huff_dc, huff_ac, restart_interval,
    ):
        """Decode one SOS's entropy data into the coefficient state.
        Returns the position of the next marker, or None on corruption."""
        h, w, comps = self.frame
        br = _BitReader(blob, pos)
        if ss == 0:  # DC scan (interleaved allowed)
            if se != 0:
                return None
            cis, tables = [], []
            for cid in order:
                if cid not in self.by_cid:
                    return None
                cis.append(self.by_cid[cid])
                t = huff_dc.get(sel[cid][0])
                if ah == 0 and t is None:
                    return None
                tables.append(t)
            pred = [0] * len(comps)
            if len(order) > 1:  # MCU-interleaved over all scan components
                cnt = 0
                for my in range(self.mcus_y):
                    for mx in range(self.mcus_x):
                        if restart_interval and cnt and cnt % restart_interval == 0:
                            if not br.align_to_marker():
                                return None
                            pred = [0] * len(comps)
                        for oi, ci in enumerate(cis):
                            _, hs, vs, _ = comps[ci]
                            for by in range(vs):
                                for bx in range(hs):
                                    blk = self.coef[ci][my * vs + by, mx * hs + bx]
                                    if not self._dc_unit(br, tables[oi], blk, pred, ci, ah, al):
                                        return None
                        cnt += 1
                        if br.overrun:
                            return None
            else:  # single component: raster over its own block dims
                ci = cis[0]
                nbh, nbw = self.nb[ci]
                cnt = 0
                for by in range(nbh):
                    for bx in range(nbw):
                        if restart_interval and cnt and cnt % restart_interval == 0:
                            if not br.align_to_marker():
                                return None
                            pred = [0] * len(comps)
                        blk = self.coef[ci][by, bx]
                        if not self._dc_unit(br, tables[0], blk, pred, ci, ah, al):
                            return None
                        cnt += 1
                        if br.overrun:
                            return None
        else:  # AC scan: spec requires exactly one component
            if len(order) != 1 or not (1 <= ss <= se <= 63):
                return None
            cid = order[0]
            if cid not in self.by_cid:
                return None
            ci = self.by_cid[cid]
            act = huff_ac.get(sel[cid][1])
            if act is None:
                return None
            nbh, nbw = self.nb[ci]
            eobrun = 0
            cnt = 0
            for by in range(nbh):
                for bx in range(nbw):
                    if restart_interval and cnt and cnt % restart_interval == 0:
                        if not br.align_to_marker():
                            return None
                        eobrun = 0
                    blk = self.coef[ci][by, bx]
                    if ah == 0:
                        eobrun = _prog_ac_first(br, act, blk, ss, se, al, eobrun)
                    else:
                        eobrun = _prog_ac_refine(br, act, blk, ss, se, al, eobrun)
                    if eobrun is None:
                        return None
                    cnt += 1
                    if br.overrun:
                        return None
        self.scans_done += 1
        return _next_marker(blob, br.pos)

    @staticmethod
    def _dc_unit(br, table, blk, pred, ci, ah, al) -> bool:
        if ah == 0:  # first pass: huffman diff, shifted up by the point transform
            t = _decode_huff(br, table)
            if t is None or t > 11:
                return False
            pred[ci] += _extend(br.bits(t), t)
            blk[0] = pred[ci] * (1 << al)
        else:  # refinement: one raw bit per block
            if br.bit():
                blk[0] |= 1 << al
        return True

    def finalize(self, np, qt):
        """Dequantize + de-zigzag + IDCT every component (vectorized einsum
        over all blocks at once) and hand off to the shared RGB assembly."""
        h, w, comps = self.frame
        C = _idct_matrix_np(np)
        zz = np.array(_ZIGZAG)
        planes = []
        for ci, (cid, hs, vs, tq) in enumerate(comps):
            q = qt.get(tq)
            if q is None:
                return None
            bh, bwid, _ = self.coef[ci].shape
            deq = self.coef[ci].astype(np.float64) * q.astype(np.float64)[None, None, :]
            nat = np.zeros_like(deq)
            nat[..., zz] = deq
            blocks = nat.reshape(bh, bwid, 8, 8)
            spatial = np.einsum("ki,yxkl,lj->yxij", C, blocks, C)
            planes.append(spatial.transpose(0, 2, 1, 3).reshape(bh * 8, bwid * 8))
        return _planes_to_rgb(np, planes, comps, self.hmax, self.vmax, h, w)


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
