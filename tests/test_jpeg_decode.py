"""Baseline JPEG decoder (operators.jpeg): round-trip against a test-side
encoder (generic DHT/DQT serialization, canonical huffman, FF-stuffing,
restart markers), plus hand-constructed DC-only and single-AC streams so
encoder and decoder cannot share a cancelling basis bug."""

from __future__ import annotations

import math
import struct

import numpy as np
import pytest

from pwhl_data_engineering_pipeline_spark.operators import jpeg as J


# ---- test-side encoder ----------------------------------------------------

# simple spec-valid huffman layout: 12 DC categories at code length 4,
# all 162 AC (run,size) symbols (plus EOB/ZRL) at code length 8
DC_COUNTS = [0, 0, 0, 12, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0, 0]
DC_SYMS = list(range(12))
AC_SYMS = [0x00, 0xF0] + [
    (run << 4) | size for run in range(16) for size in range(1, 11)
]
AC_COUNTS = [0] * 16
AC_COUNTS[7] = len(AC_SYMS)


def canonical_codes(counts, syms):
    codes = {}
    code = 0
    k = 0
    for length in range(1, 17):
        for _ in range(counts[length - 1]):
            codes[syms[k]] = (length, code)
            code += 1
            k += 1
        code <<= 1
    return codes


DC_CODES = canonical_codes(DC_COUNTS, DC_SYMS)
AC_CODES = canonical_codes(AC_COUNTS, AC_SYMS)


def dct_basis():
    C = np.zeros((8, 8))
    for k in range(8):
        a = math.sqrt(1 / 8) if k == 0 else math.sqrt(2 / 8)
        for n in range(8):
            C[k, n] = a * math.cos((2 * n + 1) * k * math.pi / 16)
    return C


class BitWriter:
    def __init__(self):
        self.out = bytearray()
        self.acc = 0
        self.n = 0

    def put(self, code, length):
        self.acc = (self.acc << length) | code
        self.n += length
        while self.n >= 8:
            self.n -= 8
            b = (self.acc >> self.n) & 0xFF
            self.out.append(b)
            if b == 0xFF:
                self.out.append(0x00)

    def pad(self):
        if self.n:
            self.put((1 << (8 - self.n)) - 1, 8 - self.n)


def category(v):
    return 0 if v == 0 else abs(v).bit_length()


def value_bits(v, t):
    return v if v >= 0 else v + (1 << t) - 1


def encode_block(bw: BitWriter, coeffs_zz, pred):
    dc = int(coeffs_zz[0])
    diff = dc - pred
    t = category(diff)
    ln, code = DC_CODES[t]
    bw.put(code, ln)
    if t:
        bw.put(value_bits(diff, t), t)
    k = 1
    while k < 64:
        run = 0
        while k < 64 and coeffs_zz[k] == 0:
            run += 1
            k += 1
        if k == 64:
            ln, code = AC_CODES[0x00]
            bw.put(code, ln)
            return dc
        while run >= 16:
            ln, code = AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        v = int(coeffs_zz[k])
        t = category(v)
        ln, code = AC_CODES[(run << 4) | t]
        bw.put(code, ln)
        bw.put(value_bits(v, t), t)
        k += 1
    return dc


def seg(marker, payload):
    return bytes([0xFF, marker]) + struct.pack(">H", len(payload) + 2) + payload


def dht_payload(tc, th, counts, syms):
    return bytes([(tc << 4) | th] + counts + syms)


def prep_blocks(img, q=1, subsample=False):
    """Shared coefficient pipeline for the baseline AND progressive test
    encoders (identical quantized blocks by construction, so the
    equivalence tests compare decoders, not encoder drift):
    → (qblocks, samp, h, w, mcus_x, mcus_y, qtab) where qblocks[ci] is an
    (block_rows, block_cols, 64) int64 array of zigzag-ordered quantized
    DCT coefficients on the MCU-padded grid."""
    C = dct_basis()
    qtab = np.full(64, q, dtype=np.int32)
    gray = img.ndim == 2
    h, w = img.shape[:2]
    if gray:
        planes = [img.astype(np.float64) - 128.0]
        samp = [(1, 1)]
    else:
        f = img.astype(np.float64)
        y = 0.299 * f[..., 0] + 0.587 * f[..., 1] + 0.114 * f[..., 2]
        cb = -0.168736 * f[..., 0] - 0.331264 * f[..., 1] + 0.5 * f[..., 2] + 128
        cr = 0.5 * f[..., 0] - 0.418688 * f[..., 1] - 0.081312 * f[..., 2] + 128
        if subsample:
            # 2x2 average chroma
            def sub(p):
                ph = p[: (h // 2) * 2, : (w // 2) * 2] if h % 2 == 0 and w % 2 == 0 else None
                assert ph is not None, "use even dims for 4:2:0 tests"
                return ph.reshape(h // 2, 2, w // 2, 2).mean(axis=(1, 3))

            planes = [y - 128.0, sub(cb) - 128.0, sub(cr) - 128.0]
            samp = [(2, 2), (1, 1), (1, 1)]
        else:
            planes = [y - 128.0, cb - 128.0, cr - 128.0]
            samp = [(1, 1), (1, 1), (1, 1)]
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    mcus_x = (w + 8 * hmax - 1) // (8 * hmax)
    mcus_y = (h + 8 * vmax - 1) // (8 * vmax)
    zz = np.array(J._ZIGZAG)
    qblocks = []
    for p, (hs, vs) in zip(planes, samp):
        th_, tw_ = mcus_y * vs * 8, mcus_x * hs * 8
        pp = np.zeros((th_, tw_))
        pp[: p.shape[0], : p.shape[1]] = p
        # replicate edges so padding doesn't ring
        pp[p.shape[0] :, : p.shape[1]] = p[-1:, :]
        pp[:, p.shape[1] :] = pp[:, p.shape[1] - 1 : p.shape[1]]
        arr = np.zeros((mcus_y * vs, mcus_x * hs, 64), np.int64)
        for by in range(mcus_y * vs):
            for bx in range(mcus_x * hs):
                blk = pp[by * 8 : by * 8 + 8, bx * 8 : bx * 8 + 8]
                F = C @ blk @ C.T
                arr[by, bx] = np.round(F / qtab.reshape(8, 8)).astype(np.int64).flatten()[zz]
        qblocks.append(arr)
    return qblocks, samp, h, w, mcus_x, mcus_y, qtab


def encode_jpeg(img, q=1, subsample=False, restart=0):
    """img: (h, w) gray or (h, w, 3) RGB uint8 → baseline JFIF bytes."""
    qblocks, samp, h, w, mcus_x, mcus_y, qtab = prep_blocks(img, q, subsample)
    zz = np.array(J._ZIGZAG)
    bw = BitWriter()
    preds = [0] * len(qblocks)
    chunks = []
    mcu_count = 0
    rst_id = 0
    for my in range(mcus_y):
        for mx in range(mcus_x):
            if restart and mcu_count and mcu_count % restart == 0:
                bw.pad()
                chunks.append(bytes(bw.out))
                chunks.append(bytes([0xFF, 0xD0 + rst_id]))
                rst_id = (rst_id + 1) % 8
                bw = BitWriter()
                preds = [0] * len(qblocks)
            for ci, (qb, (hs, vs)) in enumerate(zip(qblocks, samp)):
                for by in range(vs):
                    for bx in range(hs):
                        preds[ci] = encode_block(
                            bw, qb[my * vs + by, mx * hs + bx], preds[ci]
                        )
            mcu_count += 1
    bw.pad()
    chunks.append(bytes(bw.out))
    data = b"".join(chunks)

    ncomp = len(qblocks)
    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    sos = bytes([ncomp])
    for ci in range(ncomp):
        sos += bytes([ci + 1, 0x00])
    sos += bytes([0, 63, 0])
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(qtab.flatten()[zz].astype(np.uint8)))
    out += seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
    out += seg(0xC4, dht_payload(1, 0, AC_COUNTS, AC_SYMS))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    out += seg(0xC0, sof)
    out += seg(0xDA, sos)
    out += data + b"\xff\xd9"
    return out


# ---- progressive encoder (spectral selection + successive approximation) --


def encode_ac_first_block(bw, coeffs_zz, ss, se, al):
    """AC first scan (Ah=0) for one block's band [ss, se] at point-transform
    level al. EOB per block (EOBRUN length 1 → the plain 0x00 symbol)."""
    k = ss
    while k <= se:
        run = 0
        while k <= se and (abs(int(coeffs_zz[k])) >> al) == 0:
            run += 1
            k += 1
        if k > se:
            ln, code = AC_CODES[0x00]
            bw.put(code, ln)
            return
        while run >= 16:
            ln, code = AC_CODES[0xF0]
            bw.put(code, ln)
            run -= 16
        v = int(coeffs_zz[k])
        t = -(abs(v) >> al) if v < 0 else (abs(v) >> al)
        cat = category(t)
        ln, code = AC_CODES[(run << 4) | cat]
        bw.put(code, ln)
        bw.put(value_bits(t, cat), cat)
        k += 1
    # band ended exactly on a coefficient: no EOB needed


def encode_ac_refine_block(bw, coeffs_zz, ss, se, al):
    """AC refinement scan (Ah=al+1, Al=al) for one block: correction bits
    for history-nonzero coefficients, (run,1)+sign for newly-nonzero ones,
    EOB (run-1) + trailing correction bits for the remainder (T.81 §G.1.2.3
    mirrored from the decoder's traversal order)."""
    idxs = list(range(ss, se + 1))
    sh = {k: abs(int(coeffs_zz[k])) >> al for k in idxs}
    hist = {k: abs(int(coeffs_zz[k])) >> (al + 1) for k in idxs}
    new_pos = [k for k in idxs if hist[k] == 0 and sh[k] != 0]
    for k in new_pos:
        assert sh[k] == 1, "refinement can only introduce magnitude 1"
    last_new = new_pos[-1] if new_pos else ss - 1
    run = 0
    pending = []  # correction bits buffered since the last emitted symbol
    for k in idxs:
        if k > last_new:
            break
        if hist[k] != 0:
            pending.append(sh[k] & 1)
            continue
        if sh[k] == 0:
            if run == 15:
                ln, code = AC_CODES[0xF0]
                bw.put(code, ln)
                for b in pending:
                    bw.put(b, 1)
                pending = []
                run = 0
            else:
                run += 1
            continue
        # newly nonzero: (run, 1) then sign bit, then buffered corrections
        ln, code = AC_CODES[(run << 4) | 1]
        bw.put(code, ln)
        bw.put(1 if int(coeffs_zz[k]) > 0 else 0, 1)
        for b in pending:
            bw.put(b, 1)
        pending = []
        run = 0
    if last_new < se:
        # EOB (run 1), then correction bits for every remaining
        # history-nonzero coefficient through the end of the band
        ln, code = AC_CODES[0x00]
        bw.put(code, ln)
        assert not pending  # nothing sits between the last symbol and EOB
        for k in range(last_new + 1, se + 1):
            if hist[k] != 0:
                bw.put(sh[k] & 1, 1)


def encode_jpeg_progressive(
    img, q=1, subsample=False, dc_al=0, ac_al=0, bands=((1, 63),), restart=0
):
    """img → progressive (SOF2) JFIF bytes. Scan script: interleaved DC
    first scan at Al=dc_al, DC refinement scans down to 0, then per
    component and spectral band an AC first scan at Al=ac_al and AC
    refinement scans down to 0. ``restart`` (if set) applies to the AC
    scans, interval in blocks."""
    qblocks, samp, h, w, mcus_x, mcus_y, qtab = prep_blocks(img, q, subsample)
    ncomp = len(qblocks)
    hmax = max(s[0] for s in samp)
    vmax = max(s[1] for s in samp)
    zz = np.array(J._ZIGZAG)
    scans = []  # (sos_payload, entropy_bytes)

    def interleaved_sos(ss, se, ah, al):
        p = bytes([ncomp])
        for ci in range(ncomp):
            p += bytes([ci + 1, 0x00])
        return p + bytes([ss, se, (ah << 4) | al])

    def dc_scan(ah, al):
        """Interleaved DC scan; when a DRI is present the decoder expects
        restarts in EVERY scan, so the DC scans chunk by MCU count too."""
        chunks = []
        bw = BitWriter()
        preds = [0] * ncomp
        cnt = 0
        rst_id = 0
        for my in range(mcus_y):
            for mx in range(mcus_x):
                if restart and cnt and cnt % restart == 0:
                    bw.pad()
                    chunks.append(bytes(bw.out))
                    chunks.append(bytes([0xFF, 0xD0 + rst_id]))
                    rst_id = (rst_id + 1) % 8
                    bw = BitWriter()
                    preds = [0] * ncomp
                for ci, (hs, vs) in enumerate(samp):
                    for by in range(vs):
                        for bx in range(hs):
                            dc = int(qblocks[ci][my * vs + by, mx * hs + bx, 0])
                            if ah == 0:
                                v = dc >> al
                                diff = v - preds[ci]
                                preds[ci] = v
                                t = category(diff)
                                ln, code = DC_CODES[t]
                                bw.put(code, ln)
                                if t:
                                    bw.put(value_bits(diff, t), t)
                            else:
                                bw.put((dc >> al) & 1, 1)
                cnt += 1
        bw.pad()
        chunks.append(bytes(bw.out))
        scans.append((interleaved_sos(0, 0, ah, al), b"".join(chunks)))

    dc_scan(0, dc_al)  # DC first scan
    for al in range(dc_al - 1, -1, -1):
        dc_scan(al + 1, al)  # DC refinement scans

    def comp_blocks(ci):
        """Non-interleaved raster order over the component's own dims."""
        hs, vs = samp[ci]
        cw = (w * hs + hmax - 1) // hmax
        ch = (h * vs + vmax - 1) // vmax
        for by in range((ch + 7) // 8):
            for bx in range((cw + 7) // 8):
                yield qblocks[ci][by, bx]

    def ac_scan(ci, ss, se, ah, al, block_encoder):
        chunks = []
        bw = BitWriter()
        cnt = 0
        rst_id = 0
        for blk in comp_blocks(ci):
            if restart and cnt and cnt % restart == 0:
                bw.pad()
                chunks.append(bytes(bw.out))
                chunks.append(bytes([0xFF, 0xD0 + rst_id]))
                rst_id = (rst_id + 1) % 8
                bw = BitWriter()
            block_encoder(bw, blk, ss, se, al)
            cnt += 1
        bw.pad()
        chunks.append(bytes(bw.out))
        sos = bytes([1, ci + 1, 0x00, ss, se, (ah << 4) | al])
        scans.append((sos, b"".join(chunks)))

    for ci in range(ncomp):
        for ss, se in bands:
            ac_scan(ci, ss, se, 0, ac_al, encode_ac_first_block)
    for al in range(ac_al - 1, -1, -1):
        for ci in range(ncomp):
            for ss, se in bands:
                ac_scan(ci, ss, se, al + 1, al, encode_ac_refine_block)

    sof = bytes([8]) + struct.pack(">HH", h, w) + bytes([ncomp])
    for ci, (hs, vs) in enumerate(samp):
        sof += bytes([ci + 1, (hs << 4) | vs, 0])
    out = b"\xff\xd8"
    out += seg(0xDB, bytes([0]) + bytes(qtab.flatten()[zz].astype(np.uint8)))
    out += seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
    out += seg(0xC4, dht_payload(1, 0, AC_COUNTS, AC_SYMS))
    if restart:
        out += seg(0xDD, struct.pack(">H", restart))
    out += seg(0xC2, sof)
    for sos, data in scans:
        out += seg(0xDA, sos) + data
    out += b"\xff\xd9"
    return out


# ---- tests ----------------------------------------------------------------


def test_solid_gray_exact():
    for g in (0, 52, 128, 130, 255):
        img = np.full((8, 8), g, dtype=np.uint8)
        got = J.decode_jpeg_pixels(encode_jpeg(img, q=1))
        assert got is not None and got.shape == (8, 8, 3)
        assert int(got.max()) - int(got.min()) == 0
        assert abs(int(got[0, 0, 0]) - g) <= 1


def test_hand_built_dc_only_stream():
    """Fully hand-constructed minimal grayscale JPEG (no encoder): one 8x8
    block, q=1, DC=16 (gray 130). Pins marker parsing, canonical huffman,
    category/extend, and the DC basis — independent of the encoder."""
    zz = np.array(J._ZIGZAG)
    q = np.ones(64, dtype=np.uint8)
    bw = BitWriter()
    ln, code = DC_CODES[5]  # DC diff 16 → category 5
    bw.put(code, ln)
    bw.put(16, 5)  # positive value: bits == value
    ln, code = AC_CODES[0x00]  # EOB
    bw.put(code, ln)
    bw.pad()
    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(q))
        + seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
        + seg(0xC4, dht_payload(1, 0, AC_COUNTS, AC_SYMS))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )
    got = J.decode_jpeg_pixels(blob)
    assert got is not None
    # DC-only block: constant plane at round(16/8 + 128) = 130
    assert (got == 130).all()


def test_single_ac_coefficient_matches_formula():
    """A lone AC coefficient must reconstruct the DCT basis function —
    computed here from the textbook formula, not the decoder's matrix."""
    bw = BitWriter()
    ln, code = DC_CODES[0]
    bw.put(code, ln)  # DC diff 0
    # zigzag index 1 = (u,v)=(0,1): run 0, value 40 (category 6)
    ln, code = AC_CODES[(0 << 4) | 6]
    bw.put(code, ln)
    bw.put(40, 6)
    ln, code = AC_CODES[0x00]
    bw.put(code, ln)
    bw.pad()
    q = np.ones(64, dtype=np.uint8)
    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(q))
        + seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
        + seg(0xC4, dht_payload(1, 0, AC_COUNTS, AC_SYMS))
        + seg(0xC0, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 63, 0]))
        + bytes(bw.out)
        + b"\xff\xd9"
    )
    got = J.decode_jpeg_pixels(blob)
    assert got is not None
    expect = np.empty((8, 8))
    for yy in range(8):
        for xx in range(8):
            expect[yy, xx] = (
                40.0
                * math.sqrt(2 / 8)
                * math.sqrt(1 / 8)
                * math.cos((2 * xx + 1) * 1 * math.pi / 16)
            ) + 128.0
    expect = np.clip(expect + 0.5, 0, 255).astype(np.uint8)
    assert (np.abs(got[..., 0].astype(int) - expect.astype(int)) <= 1).all()


def _gradient(h, w, color=False):
    yy, xx = np.mgrid[0:h, 0:w]
    g = (40 + (160.0 * (yy + xx) / (h + w))).astype(np.uint8)
    if not color:
        return g
    r = g
    gg = (255 - g).astype(np.uint8)
    b = np.full_like(g, 90)
    return np.stack([r, gg, b], axis=2)


def test_roundtrip_gray_multiblock():
    img = _gradient(24, 40)
    got = J.decode_jpeg_pixels(encode_jpeg(img, q=1))
    assert got is not None and got.shape == (24, 40, 3)
    assert np.abs(got[..., 0].astype(int) - img.astype(int)).max() <= 2


def test_roundtrip_color_444():
    img = _gradient(16, 24, color=True)
    got = J.decode_jpeg_pixels(encode_jpeg(img, q=1))
    assert got is not None and got.shape == (16, 24, 3)
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 3


def test_roundtrip_color_420_subsampled():
    img = _gradient(32, 32, color=True)
    got = J.decode_jpeg_pixels(encode_jpeg(img, q=1, subsample=True))
    assert got is not None and got.shape == (32, 32, 3)
    # replication-upsample vs averaged subsample on a smooth gradient
    assert np.abs(got.astype(int) - img.astype(int)).max() <= 8
    assert np.abs(got.astype(int) - img.astype(int)).mean() <= 2.5


def test_roundtrip_with_restart_markers():
    img = _gradient(16, 48)
    blob = encode_jpeg(img, q=1, restart=2)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    got = J.decode_jpeg_pixels(blob)
    assert got is not None
    assert np.abs(got[..., 0].astype(int) - img.astype(int)).max() <= 2


def test_lossy_quant_still_close():
    img = _gradient(24, 24)
    got = J.decode_jpeg_pixels(encode_jpeg(img, q=8))
    assert got is not None
    assert np.abs(got[..., 0].astype(int) - img.astype(int)).mean() <= 4


def test_rejects_truncated_garbage():
    img = _gradient(8, 8)
    blob = encode_jpeg(img)
    assert J.decode_jpeg_pixels(blob[:20]) is None
    assert J.decode_jpeg_pixels(b"") is None
    assert J.decode_jpeg_pixels(b"\xff\xd8\xff\xd9") is None


# ---- progressive (SOF2) ---------------------------------------------------


def test_progressive_spectral_selection_equals_baseline():
    """Spectral-selection-only script (DC scan, then AC 1-5 and 6-63 per
    component): identical quantized coefficients by construction, so the
    decode must be byte-identical to the baseline decode."""
    img = _gradient(24, 40)
    base = J.decode_jpeg_pixels(encode_jpeg(img, q=1))
    prog = J.decode_jpeg_pixels(
        encode_jpeg_progressive(img, q=1, bands=((1, 5), (6, 63)))
    )
    assert base is not None and prog is not None
    assert (base == prog).all()


def test_progressive_color_444_and_420_equal_baseline():
    img = _gradient(32, 32, color=True)
    for sub in (False, True):
        base = J.decode_jpeg_pixels(encode_jpeg(img, q=2, subsample=sub))
        prog = J.decode_jpeg_pixels(
            encode_jpeg_progressive(img, q=2, subsample=sub, bands=((1, 9), (10, 63)))
        )
        assert base is not None and prog is not None
        assert (base == prog).all(), f"subsample={sub}"


def test_progressive_successive_approximation_equals_baseline():
    """DC Al=1 + refinement, AC first at Al=1 + refinement to 0: the
    successive-approximation reconstruction must land on exactly the same
    coefficients as the baseline stream."""
    img = _gradient(24, 24)
    base = J.decode_jpeg_pixels(encode_jpeg(img, q=2))
    prog = J.decode_jpeg_pixels(
        encode_jpeg_progressive(img, q=2, dc_al=1, ac_al=1)
    )
    assert base is not None and prog is not None
    assert (base == prog).all()


def test_progressive_deep_successive_approximation_color():
    """dc_al=2 / ac_al=2 with band splits — multiple refinement scans per
    coefficient — still reconstructs exactly."""
    img = _gradient(16, 24, color=True)
    base = J.decode_jpeg_pixels(encode_jpeg(img, q=2))
    prog = J.decode_jpeg_pixels(
        encode_jpeg_progressive(img, q=2, dc_al=2, ac_al=2, bands=((1, 20), (21, 63)))
    )
    assert base is not None and prog is not None
    assert (base == prog).all()


def test_progressive_restart_markers_in_ac_scans():
    img = _gradient(16, 48)
    blob = encode_jpeg_progressive(img, q=1, ac_al=1, restart=3)
    assert b"\xff\xd0" in blob or b"\xff\xd1" in blob
    base = J.decode_jpeg_pixels(encode_jpeg(img, q=1))
    prog = J.decode_jpeg_pixels(blob)
    assert prog is not None
    assert (base == prog).all()


def test_progressive_hand_built_dc_successive_approximation():
    """Hand-constructed two-scan progressive stream (no encoder): 8x8 gray,
    DC=17, q=1 → DC first scan at Al=1 carries 17>>1=8, the refinement
    scan carries bit 1 → coefficient 17 → flat plane at
    round(17/8 + 128) = 130. Pins SOF2 parsing, the multi-scan loop, DC
    point-transform reconstruction, and EOI finalize independently."""
    zz = np.array(J._ZIGZAG)
    q = np.ones(64, dtype=np.uint8)
    bw1 = BitWriter()
    ln, code = DC_CODES[4]  # 17>>1 = 8 → category 4
    bw1.put(code, ln)
    bw1.put(8, 4)
    bw1.pad()
    bw2 = BitWriter()
    bw2.put(1, 1)  # refinement bit: 17 & 1
    bw2.pad()
    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(q))
        + seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
        + seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 8) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x01]))  # DC first, Ah=0 Al=1
        + bytes(bw1.out)
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x10]))  # DC refine, Ah=1 Al=0
        + bytes(bw2.out)
        + b"\xff\xd9"
    )
    got = J.decode_jpeg_pixels(blob)
    assert got is not None
    assert (got == 130).all()


def test_progressive_hand_built_eob_run_spans_blocks():
    """Hand-built 8x16 gray (two blocks): the AC scan places one
    coefficient in block 1 then ends with EOB1 (r=1, one extra bit 0 →
    eobrun covers block 2 entirely). Block 1 must show the DCT basis
    pattern, block 2 must stay flat — pinning the EOB-run accounting
    against the spec, independent of the encoder."""
    # custom AC table that includes the EOB1 symbol 0x10
    ac_syms = [0x00, 0x10, 0xF0] + [
        (run << 4) | size for run in range(16) for size in range(1, 11)
    ]
    ac_counts = [0] * 16
    ac_counts[7] = len(ac_syms)
    ac_codes = canonical_codes(ac_counts, ac_syms)
    q = np.ones(64, dtype=np.uint8)
    # DC scan: two blocks, both diff 0
    bw1 = BitWriter()
    ln, code = DC_CODES[0]
    bw1.put(code, ln)
    bw1.put(code, ln)
    bw1.pad()
    # AC scan 1..63, Al=0: block 1: k=1 coefficient 40 (cat 6), then EOB1
    bw2 = BitWriter()
    ln, code = ac_codes[(0 << 4) | 6]
    bw2.put(code, ln)
    bw2.put(40, 6)
    ln, code = ac_codes[0x10]  # EOBn with r=1
    bw2.put(code, ln)
    bw2.put(0, 1)  # extra bit → eobrun = (1<<1) - 1 + 0 = 1 (skips block 2)
    bw2.pad()
    blob = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0]) + bytes(q))
        + seg(0xC4, dht_payload(0, 0, DC_COUNTS, DC_SYMS))
        + seg(0xC4, dht_payload(1, 0, ac_counts, ac_syms))
        + seg(0xC2, bytes([8]) + struct.pack(">HH", 8, 16) + bytes([1, 1, 0x11, 0]))
        + seg(0xDA, bytes([1, 1, 0x00, 0, 0, 0x00]))
        + bytes(bw1.out)
        + seg(0xDA, bytes([1, 1, 0x00, 1, 63, 0x00]))
        + bytes(bw2.out)
        + b"\xff\xd9"
    )
    got = J.decode_jpeg_pixels(blob)
    assert got is not None and got.shape == (8, 16, 3)
    # right block: flat 128 (DC 0, no AC)
    assert (got[:, 8:, 0] == 128).all()
    # left block: cosine-in-x basis from the textbook formula
    expect = np.empty((8, 8))
    for yy in range(8):
        for xx in range(8):
            expect[yy, xx] = (
                40.0 * math.sqrt(2 / 8) * math.sqrt(1 / 8)
                * math.cos((2 * xx + 1) * 1 * math.pi / 16)
            ) + 128.0
    expect = np.clip(expect + 0.5, 0, 255).astype(np.uint8)
    assert (np.abs(got[:, :8, 0].astype(int) - expect.astype(int)) <= 1).all()


def test_progressive_truncated_returns_none():
    """Cut inside a scan's entropy data, or losing the EOI entirely, must
    return None — same corrupt-stream contract as baseline."""
    img = _gradient(32, 32)
    blob = encode_jpeg_progressive(img, q=2, ac_al=1)
    assert J.decode_jpeg_pixels(blob) is not None
    # find the FIRST AC scan's data region (3rd SOS: DC, then AC first)
    sos_positions = []
    p = 0
    while True:
        p = blob.find(b"\xff\xda", p)
        if p < 0:
            break
        sos_positions.append(p)
        p += 2
    assert len(sos_positions) >= 3
    cut = sos_positions[1] + 30  # mid-entropy-data of the second scan
    assert J.decode_jpeg_pixels(blob[:cut]) is None
    assert J.decode_jpeg_pixels(blob[:cut] + b"\xff\xd9") is None
    # dropping the EOI leaves scans complete but the stream unterminated
    assert J.decode_jpeg_pixels(blob[:-2]) is None


def test_progressive_rejects_bad_scan_headers():
    img = _gradient(8, 8)
    blob = encode_jpeg_progressive(img, q=1)
    # corrupt the AC scan header: multi-component AC scan (spec-invalid)
    i = blob.find(b"\xff\xda", blob.find(b"\xff\xda") + 2)
    bad = bytearray(blob)
    assert bad[i + 4] == 1  # ns of the AC scan
    bad[i + 4] = 3
    assert J.decode_jpeg_pixels(bytes(bad)) is None


def test_stdlib_features_jpeg_tagged_as_image():
    from pwhl_data_engineering_pipeline_spark.operators import multimodal as mm

    img = np.full((8, 16), 130, dtype=np.uint8)
    feats = mm.stdlib_media_features(encode_jpeg(img, q=1), dim=16)
    assert feats[0] == 1.0 and feats[1] == 16.0 and feats[2] == 8.0
    assert abs(feats[3] - 130 / 255) < 0.01


def test_fill_bytes_and_malformed_segments():
    img = _gradient(8, 16)
    blob = encode_jpeg(img, q=1)
    # spec-legal 0xFF fill padding before a marker must not derail the walk
    padded = blob[:2] + b"\xff" + blob[2:]
    got = J.decode_jpeg_pixels(padded)
    assert got is not None and got.shape == (8, 16, 3)
    # zero sampling factor in SOF: None, not ZeroDivisionError
    i = blob.index(b"\xff\xc0")
    bad_sof = bytearray(blob)
    bad_sof[i + 11] = 0x10  # hv byte: h=1, v=0
    assert J.decode_jpeg_pixels(bytes(bad_sof)) is None
    # truncated 16-bit DQT: None, not ValueError from frombuffer
    q16 = (
        b"\xff\xd8"
        + seg(0xDB, bytes([0x10]) + b"\x00\x01" * 30 + b"\x00")  # pq=1, odd len
        + blob[2:]
    )
    assert J.decode_jpeg_pixels(q16) is None


def test_truncated_entropy_segment_returns_none():
    """ADVICE round 3: a stream cut mid-entropy-data must return None, not
    decode trailing MCUs from fabricated zero padding. A large image is
    truncated at various points inside the scan; every cut must be refused
    (≤7 byte-align fill bits stay legal, so the intact blob still decodes)."""
    img = _gradient(48, 48)
    blob = encode_jpeg(img, q=4)
    assert J.decode_jpeg_pixels(blob) is not None  # intact: fill bits OK
    sos = blob.index(b"\xff\xda")
    scan_start = sos + 2 + int.from_bytes(blob[sos + 2 : sos + 4], "big")
    scan_len = len(blob) - 2 - scan_start  # strip trailing EOI
    for frac in (0.3, 0.6, 0.9):
        cut = scan_start + max(2, int(scan_len * frac))
        truncated = blob[:cut]
        assert J.decode_jpeg_pixels(truncated) is None, f"frac={frac}"
        # and with a spurious EOI glued on (common corruption shape)
        assert J.decode_jpeg_pixels(truncated + b"\xff\xd9") is None, f"frac={frac}+eoi"


def test_forged_giant_dimensions_refused():
    """A forged 65535x65535 SOF header must return None BEFORE allocating
    plane buffers (untrusted corpus bytes inside an executor task)."""
    img = _gradient(8, 8)
    blob = encode_jpeg(img, q=1)
    i = blob.index(b"\xff\xc0")
    forged = bytearray(blob)
    forged[i + 5 : i + 9] = struct.pack(">HH", 65535, 65535)
    assert J.decode_jpeg_pixels(bytes(forged)) is None
    # and the cap is a parameter: a small legitimate image under a tiny cap
    assert J.decode_jpeg_pixels(blob, max_pixels=16) is None
    assert J.decode_jpeg_pixels(blob) is not None


def test_stdlib_features_progressive_jpeg_decodes_as_image():
    """The multimodal feature extractor must treat a progressive JPEG as a
    REAL image (tag 1, true dims, pixel means) now that SOF2 decodes —
    before round 4 it fell to the hash-fallback path (tag 0)."""
    from pwhl_data_engineering_pipeline_spark.operators import multimodal as mm

    img = np.full((8, 16), 130, dtype=np.uint8)
    blob = encode_jpeg_progressive(img, q=1, dc_al=1, ac_al=1)
    feats = mm.stdlib_media_features(blob, dim=16)
    assert feats[0] == 1.0 and feats[1] == 16.0 and feats[2] == 8.0
    assert abs(feats[3] - 130 / 255) < 0.01


def test_stock_codec_progressive_jpeg_cross_check(spark):
    """VERDICT r5 #2: validate the progressive decoder against a STOCK
    encoder, not just this suite's own SOF2 encoder (a shared T.81
    misreading would cancel there). The JDK's ImageIO JPEG codec — reached
    through the Spark JVM, no external libs — encodes a test card twice
    (baseline SOF0 and progressive SOF2, identical quant tables). Checks:

    1. the stock progressive stream really is SOF2 and we decode it;
    2. our progressive decode is BIT-IDENTICAL to our baseline decode of
       the stock baseline stream — the two streams carry the same
       quantized coefficients, so any progressive-path bug (spectral
       selection, successive approximation, EOB runs) shows up as a
       pixel difference;
    3. luma closeness to ImageIO's own decode of the same bytes (the
       normative IDCT path; chroma gets a looser bound because T.81
       leaves the chroma UPSAMPLING filter to the decoder — the JDK uses
       a triangle filter, this decoder replicates, and the divergence is
       confined to chroma edges).
    """
    import numpy as np

    from pwhl_data_engineering_pipeline_spark.operators.jpeg import decode_jpeg_pixels

    jvm = spark._jvm
    w, h = 48, 32
    img = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            img[y, x] = (
                (x * 255) // (w - 1),
                (y * 255) // (h - 1),
                ((x + y) * 255) // (w + h - 2),
            )
    img[8:16, 8:24, 0] = 200
    img[8:16, 8:24, 1] = 30

    bi = jvm.java.awt.image.BufferedImage(
        w, h, jvm.java.awt.image.BufferedImage.TYPE_INT_RGB
    )
    for y in range(h):
        for x in range(w):
            r, g, b = (int(v) for v in img[y, x])
            bi.setRGB(x, y, (r << 16) | (g << 8) | b)

    def imageio_encode(progressive: bool) -> bytes:
        writer = jvm.javax.imageio.ImageIO.getImageWritersByFormatName("jpeg").next()
        param = writer.getDefaultWriteParam()
        if progressive:
            param.setProgressiveMode(jvm.javax.imageio.ImageWriteParam.MODE_DEFAULT)
        baos = jvm.java.io.ByteArrayOutputStream()
        out = jvm.javax.imageio.stream.MemoryCacheImageOutputStream(baos)
        writer.setOutput(out)
        writer.write(None, jvm.javax.imageio.IIOImage(bi, None, None), param)
        out.flush()
        writer.dispose()
        return bytes(baos.toByteArray())

    prog, base = imageio_encode(True), imageio_encode(False)
    assert b"\xff\xc2" in prog and b"\xff\xc2" not in base  # SOF2 vs SOF0
    assert b"\xff\xc0" in base

    ours_prog = decode_jpeg_pixels(prog)
    ours_base = decode_jpeg_pixels(base)
    assert ours_prog is not None and ours_prog.shape == (h, w, 3)
    # same coefficients, different entropy layout -> identical pixels
    assert np.array_equal(ours_prog, ours_base)

    im = jvm.javax.imageio.ImageIO.read(jvm.java.io.ByteArrayInputStream(prog))
    truth = np.zeros((h, w, 3), dtype=np.uint8)
    for y in range(h):
        for x in range(w):
            v = im.getRGB(x, y)
            truth[y, x] = ((v >> 16) & 255, (v >> 8) & 255, v & 255)

    wts = np.array([0.299, 0.587, 0.114])
    luma_diff = np.abs(ours_prog.astype(float) @ wts - truth.astype(float) @ wts)
    assert luma_diff.max() <= 3.0, luma_diff.max()
    full_diff = np.abs(ours_prog.astype(int) - truth.astype(int))
    assert full_diff.mean() <= 5.0, full_diff.mean()
    # and both decoders land near the source image (end-to-end sanity)
    assert np.abs(ours_prog.astype(int) - img.astype(int)).mean() <= 6.0
