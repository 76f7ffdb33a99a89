"""Real container-header decoding: pure-stdlib parsers validated against
hand-built (struct-packed) PNG/GIF/JPEG/WAV fixtures, the Arrow-batched
decode_meta operator, and the JVM-synth ↔ Python-parse round trip used by
the ns_multimodal_features driver query."""

from __future__ import annotations

import struct
import zlib

from pyspark.sql import functions as F

from pwhl_data_engineering_pipeline_spark.operators import multimodal as mm


def _png(width: int, height: int, payload: bytes = b"") -> bytes:
    ihdr = struct.pack(">II5B", width, height, 8, 6, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + struct.pack(">I", 13)
        + b"IHDR"
        + ihdr
        + struct.pack(">I", zlib.crc32(b"IHDR" + ihdr))
        + payload
    )


def _gif(width: int, height: int) -> bytes:
    return b"GIF89a" + struct.pack("<HH", width, height) + b"\x00\x00\x00"


def _jpeg(width: int, height: int, progressive: bool = False) -> bytes:
    app0 = b"\xff\xe0" + struct.pack(">H", 16) + b"JFIF\x00\x01\x02\x00" + struct.pack(">HH", 72, 72) + b"\x00\x00"
    sof = (b"\xff\xc2" if progressive else b"\xff\xc0") + struct.pack(">H", 17) + b"\x08" + struct.pack(
        ">HH", height, width
    ) + b"\x03" + b"\x01\x22\x00\x02\x11\x01\x03\x11\x01"
    return b"\xff\xd8" + app0 + sof + b"\xff\xd9"


def _wav(sample_rate: int, byte_rate: int, data: bytes) -> bytes:
    fmt = struct.pack("<HHIIHH", 1, 1, sample_rate, byte_rate, 2, 16)
    return (
        b"RIFF"
        + struct.pack("<I", 36 + len(data))
        + b"WAVE"
        + b"fmt "
        + struct.pack("<I", 16)
        + fmt
        + b"data"
        + struct.pack("<I", len(data))
        + data
    )


def test_parse_png_gif_jpeg():
    assert mm.parse_media_header(_png(640, 480)) == {
        "media_type": "image", "format": "png", "width": 640, "height": 480,
        "duration_ms": None, "size_bytes": 33,
    }
    g = mm.parse_media_header(_gif(320, 200))
    assert (g["format"], g["width"], g["height"]) == ("gif", 320, 200)
    j = mm.parse_media_header(_jpeg(1920, 1080))
    assert (j["format"], j["width"], j["height"]) == ("jpeg", 1920, 1080)
    # progressive JPEG uses SOF2 — still a frame header
    j2 = mm.parse_media_header(_jpeg(33, 17, progressive=True))
    assert (j2["width"], j2["height"]) == (33, 17)


def test_parse_wav_duration():
    w = mm.parse_media_header(_wav(8000, 16000, b"\x00" * 32000))
    assert (w["format"], w["media_type"], w["duration_ms"]) == ("wav", "audio", 2000)
    # odd-sized data chunk: word-aligned walker must still find fmt first
    w2 = mm.parse_media_header(_wav(44100, 88200, b"\x01" * 44101))
    assert w2["duration_ms"] == 44101 * 1000 // 88200


def test_parse_garbage_and_truncated():
    for blob in (b"", b"hello", b"\x89PNG\r\n\x1a\n", b"RIFF1234WAVE", _png(1, 1)[:20]):
        got = mm.parse_media_header(blob)
        assert got["format"] == "bin"
        assert got["size_bytes"] == len(blob)


def test_decode_meta_operator(spark):
    rows = [
        (1, _png(12, 34, b"xyz")),
        (2, _wav(8000, 16000, b"\x00" * 1600)),
        (3, _gif(5, 6)),
        (4, _jpeg(100, 50)),
        (5, b"not media"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    got = {r["media_id"]: r["meta"].asDict() for r in mm.decode_meta(df).collect()}
    assert (got[1]["format"], got[1]["width"], got[1]["height"], got[1]["size_bytes"]) == ("png", 12, 34, 36)
    assert (got[2]["format"], got[2]["duration_ms"]) == ("wav", 100)
    assert (got[3]["format"], got[3]["width"]) == ("gif", 5)
    assert (got[4]["format"], got[4]["width"], got[4]["height"]) == ("jpeg", 100, 50)
    assert (got[5]["format"], got[5]["size_bytes"]) == ("bin", 9)
    assert (got[6]["format"], got[6]["size_bytes"]) == ("bin", 0)


def test_jvm_synth_parse_round_trip(spark):
    """The driver query's shape: JVM byte-packing expressions build a real
    container; the Python parser must read back exactly the packed values."""
    df = spark.createDataFrame([(7, 321, 123, "abcd")], "media_id long, w long, h long, txt string")
    png = F.concat(
        F.lit(b"\x89PNG\r\n\x1a\n"),
        mm.be32(F.lit(13)), F.lit(b"IHDR"),
        mm.be32("w"), mm.be32("h"), F.lit(b"\x08\x06\x00\x00\x00"),
        mm.be32(F.lit(0)),
        F.encode("txt", "utf-8"),
    )
    out = mm.decode_meta(df.select("media_id", png.alias("content"))).collect()[0]["meta"]
    assert (out["format"], out["width"], out["height"], out["size_bytes"]) == ("png", 321, 123, 37)

    wav = F.concat(
        F.lit(b"RIFF"), mm.le32(F.lit(36 + 3200)), F.lit(b"WAVE"),
        F.lit(b"fmt "), mm.le32(F.lit(16)),
        mm.le16(F.lit(1)), mm.le16(F.lit(1)),
        mm.le32(F.lit(8000)), mm.le32(F.lit(16000)),
        mm.le16(F.lit(2)), mm.le16(F.lit(16)),
        F.lit(b"data"), mm.le32(F.lit(3200)), F.lit(b"\x00" * 3200),
    )
    out = mm.decode_meta(df.select("media_id", wav.alias("content"))).collect()[0]["meta"]
    assert (out["format"], out["duration_ms"], out["size_bytes"]) == ("wav", 200, 3244)


def _bmp24(pixels_rgb) -> bytes:
    """Build an uncompressed 24-bit BMP from a row-major [[(r,g,b)...]...]
    grid (top row first) — rows stored bottom-up, BGR, 4-byte padded."""
    h = len(pixels_rgb)
    w = len(pixels_rgb[0])
    row_pad = (-(w * 3)) % 4
    body = b""
    for row in reversed(pixels_rgb):
        for r, g, b in row:
            body += bytes([b, g, r])
        body += b"\x00" * row_pad
    data_off = 14 + 40
    header = (
        b"BM"
        + struct.pack("<IHHI", data_off + len(body), 0, 0, data_off)
        + struct.pack("<IiiHHIIiiII", 40, w, h, 1, 24, 0, len(body), 2835, 2835, 0, 0)
    )
    return header + body


def test_decode_bmp_pixels_real():
    grid = [
        [(255, 0, 0), (0, 255, 0), (0, 0, 255)],
        [(10, 20, 30), (40, 50, 60), (70, 80, 90)],
    ]
    img = mm.decode_bmp_pixels(_bmp24(grid))
    assert img.shape == (2, 3, 3)
    assert tuple(img[0, 0]) == (255, 0, 0)      # top-left red, RGB order
    assert tuple(img[0, 2]) == (0, 0, 255)
    assert tuple(img[1, 1]) == (40, 50, 60)
    # header parser agrees
    meta = mm.parse_media_header(_bmp24(grid))
    assert (meta["format"], meta["width"], meta["height"]) == ("bmp", 3, 2)


def test_decode_wav_samples_real():
    import numpy as np

    sig = np.array([0, 16384, 0, -16384] * 100, dtype="<i2")  # square-ish wave
    blob = _wav(8000, 16000, sig.tobytes())
    samples, rate = mm.decode_wav_samples(blob)
    assert rate == 8000 and samples.shape == (400, 1)
    assert samples[1, 0] == 16384


def test_stdlib_media_features_tags_and_stats():
    import numpy as np

    # all-red 2x2 BMP: tag 1, mean R == 1.0, mean G/B == 0
    red = mm.stdlib_media_features(_bmp24([[(255, 0, 0)] * 2] * 2), dim=16)
    assert red[0] == 1.0 and red[1] == 2.0 and red[2] == 2.0
    assert red[3] == 1.0 and red[4] == 0.0 and red[5] == 0.0
    # half-amplitude square wave: tag 2, RMS == peak == 0.5
    sig = np.array([16384, -16384] * 200, dtype="<i2")
    wav = mm.stdlib_media_features(_wav(8000, 16000, sig.tobytes()), dim=16)
    assert wav[0] == 2.0 and wav[3] == 8000.0
    assert abs(wav[4] - 0.5) < 1e-9 and abs(wav[5] - 0.5) < 1e-9
    # unknown bytes: tag 0, deterministic fake
    other = mm.stdlib_media_features(b"not-a-container", dim=16)
    assert other[0] == 0.0 and len(other) == 16


def test_extract_features_with_stdlib_decoder(spark):
    rows = [
        (1, _bmp24([[(255, 0, 0)]]),),
        (2, _wav(8000, 16000, struct.pack("<4h", 0, 100, 0, -100))),
        (3, b"opaque-bytes"),
    ]
    df = spark.createDataFrame(rows, "media_id long, content binary")
    out = {
        r["media_id"]: r["features"]
        for r in mm.extract_features(
            df, dim=16, real_decoder=lambda b: mm.stdlib_media_features(b, 16)
        ).collect()
    }
    assert out[1][0] == 1.0 and out[2][0] == 2.0 and out[3][0] == 0.0


# -- GIF / LZW (compressed-codec path) --------------------------------------


def _lzw_encode_gif(indices, mcs):
    """Reference GIF-LZW encoder for round-trip tests: classic greedy
    longest-match compression, variable code width mirroring the decoder's
    table-length rule exactly (grow after the table reaches 2^cs)."""
    clear, end = 1 << mcs, (1 << mcs) + 1
    dict_ = {bytes([i]): i for i in range(clear)}
    next_code = end + 1
    codes = []
    w = b""
    for k in indices:
        wk = w + bytes([k])
        if wk in dict_:
            w = wk
        else:
            codes.append(dict_[w])
            if next_code < 4096:
                dict_[wk] = next_code
                next_code += 1
            w = bytes([k])
    if w:
        codes.append(dict_[w])
    # emit with decoder-synchronized widths
    emitted = []
    cs = mcs + 1
    table_len = clear + 2
    emitted.append((clear, cs))
    for i, c in enumerate(codes):
        emitted.append((c, cs))
        if i >= 1 and table_len < 4096:
            table_len += 1
            if table_len == (1 << cs) and cs < 12:
                cs += 1
    emitted.append((end, cs))
    acc = nbits = 0
    out = bytearray()
    for code, width in emitted:
        acc |= code << nbits
        nbits += width
        while nbits >= 8:
            out.append(acc & 0xFF)
            acc >>= 8
            nbits -= 8
    if nbits:
        out.append(acc & 0xFF)
    return bytes(out)


def _gif_full(w, h, palette, indices, interlace=False, extension=False):
    """Minimal GIF89a writer around the reference LZW encoder."""
    n = max(2, (len(palette) - 1).bit_length())  # GCT size exponent
    mcs = max(2, n)
    gct = bytearray()
    for i in range(1 << n):
        r, g, b = palette[i] if i < len(palette) else (0, 0, 0)
        gct += bytes([r, g, b])
    out = bytearray()
    out += b"GIF89a"
    out += struct.pack("<HHBBB", w, h, 0x80 | (n - 1), 0, 0)
    out += gct
    if extension:  # graphic control extension: must be skipped by the parser
        out += b"\x21\xf9\x04\x00\x00\x00\x00\x00"
    flags = 0x40 if interlace else 0
    out += b"\x2c" + struct.pack("<HHHHB", 0, 0, w, h, flags)
    out += bytes([mcs])
    data = _lzw_encode_gif(bytes(indices), mcs)
    for i in range(0, len(data), 255):
        chunk = data[i : i + 255]
        out += bytes([len(chunk)]) + chunk
    out += b"\x00\x3b"
    return bytes(out)


def _interlace_rows(h):
    order = []
    for start, step in ((0, 8), (4, 8), (2, 4), (1, 2)):
        order.extend(range(start, h, step))
    return order


def test_gif_lzw_roundtrip():
    """Random palette images survive encode→decode bit-exactly — including
    dictionary growth and code-width bumps (image big enough to force
    them)."""
    import numpy as np

    rng = np.random.RandomState(7)
    for w, h, ncol in [(1, 1, 2), (13, 7, 4), (40, 30, 16), (64, 48, 128)]:
        palette = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(ncol)]
        idx = rng.randint(0, ncol, size=h * w).astype("uint8")
        img = mm.decode_gif_frame(_gif_full(w, h, palette, idx))
        assert img is not None and img.shape == (h, w, 3)
        expect = np.array(palette, dtype="uint8")[idx.reshape(h, w)]
        assert (img == expect).all()


def test_gif_interlaced_and_extension_blocks():
    import numpy as np

    rng = np.random.RandomState(11)
    w, h, ncol = 10, 9, 8
    palette = [tuple(int(x) for x in rng.randint(0, 256, 3)) for _ in range(ncol)]
    idx = rng.randint(0, ncol, size=(h, w)).astype("uint8")
    stored = idx[_interlace_rows(h)].reshape(-1)  # rows in 4-pass storage order
    blob = _gif_full(w, h, palette, stored, interlace=True, extension=True)
    img = mm.decode_gif_frame(blob)
    assert img is not None
    expect = np.array(palette, dtype="uint8")[idx]
    assert (img == expect).all()


def test_gif_rejects_garbage_and_truncation():
    import numpy as np

    rng = np.random.RandomState(3)
    palette = [(i, i, i) for i in range(4)]
    idx = rng.randint(0, 4, size=12).astype("uint8")
    blob = _gif_full(4, 3, palette, idx)
    assert mm.decode_gif_frame(b"") is None
    assert mm.decode_gif_frame(b"GIF89a") is None
    assert mm.decode_gif_frame(blob[: len(blob) // 2]) is None
    assert mm.decode_gif_frame(b"\x89PNG" + blob) is None


def test_stdlib_features_gif_tagged_as_image():
    # solid green 3x2 GIF: tag 1, mean G == 1.0, width/height correct
    palette = [(0, 255, 0), (0, 0, 0)]
    feats = mm.stdlib_media_features(_gif_full(3, 2, palette, [0] * 6), dim=16)
    assert feats[0] == 1.0 and feats[1] == 3.0 and feats[2] == 2.0
    assert feats[3] == 0.0 and feats[4] == 1.0 and feats[5] == 0.0


# -- PNG (zlib/IDAT path) ---------------------------------------------------


def _png_filter_row(cur, prev, f, ch):
    """Apply PNG filter f to a raw row (test-side encoder)."""
    stride = len(cur)
    out = bytearray(stride)
    for x in range(stride):
        a = cur[x - ch] if x >= ch else 0
        b = prev[x]
        c = prev[x - ch] if x >= ch else 0
        if f == 0:
            pred = 0
        elif f == 1:
            pred = a
        elif f == 2:
            pred = b
        elif f == 3:
            pred = (a + b) >> 1
        else:
            p = a + b - c
            pa, pb, pc = abs(p - a), abs(p - b), abs(p - c)
            pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else c)
        out[x] = (cur[x] - pred) & 0xFF
    return out


def _png_full(arr, filters):
    """Minimal PNG writer: 8-bit, color type by channel count, one IDAT."""
    import zlib

    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    raw = bytearray()
    prev = bytearray(w * ch)
    for y in range(h):
        cur = bytearray(arr[y].tobytes())
        f = filters[y % len(filters)]
        raw += bytes([f]) + _png_filter_row(cur, prev, f, ch)
        prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_roundtrip_all_filters_and_color_types():
    import numpy as np

    rng = np.random.RandomState(5)
    for ch in (1, 2, 3, 4):
        for filters in ([0], [1], [2], [3], [4], [0, 1, 2, 3, 4]):
            arr = rng.randint(0, 256, size=(9, 7, ch)).astype("uint8")
            img = mm.decode_png_pixels(_png_full(arr, filters))
            assert img is not None, (ch, filters)
            assert (img == arr).all(), (ch, filters)


def test_png_rejects_garbage():
    import numpy as np

    arr = np.zeros((2, 2, 3), dtype="uint8")
    blob = _png_full(arr, [0])
    assert mm.decode_png_pixels(b"") is None
    assert mm.decode_png_pixels(blob[:30]) is None
    # corrupt the zlib stream (byte 45 sits inside IDAT data; the inflate
    # adler check must fail and decode must return None, not raise)
    bad = bytearray(blob)
    bad[45] ^= 0xFF
    assert mm.decode_png_pixels(bytes(bad)) is None


def test_stdlib_features_png_tagged_as_image():
    import numpy as np

    # solid blue 4x3 RGB PNG with Paeth filtering
    arr = np.zeros((3, 4, 3), dtype="uint8")
    arr[..., 2] = 255
    feats = mm.stdlib_media_features(_png_full(arr, [4]), dim=16)
    assert feats[0] == 1.0 and feats[1] == 4.0 and feats[2] == 3.0
    assert feats[3] == 0.0 and feats[4] == 0.0 and feats[5] == 1.0
    # greyscale+alpha maps grey across RGB
    ga = np.zeros((2, 2, 2), dtype="uint8")
    ga[..., 0] = 128
    ga[..., 1] = 255
    f2 = mm.stdlib_media_features(_png_full(ga, [2]), dim=16)
    assert f2[0] == 1.0 and abs(f2[3] - 128 / 255) < 1e-9 and f2[3] == f2[4] == f2[5]


def _png_adam7(arr, filters):
    """Adam7-interlaced PNG writer: each pass is its own filtered
    sub-image."""
    import zlib

    h, w, ch = arr.shape
    ctype = {1: 0, 2: 4, 3: 2, 4: 6}[ch]
    passes = ((0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
              (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2))
    raw = bytearray()
    for x0, y0, dx, dy in passes:
        sub = arr[y0::dy, x0::dx]
        if sub.size == 0:
            continue
        prev = bytearray(sub.shape[1] * ch)
        for y in range(sub.shape[0]):
            cur = bytearray(sub[y].tobytes())
            f = filters[y % len(filters)]
            raw += bytes([f]) + _png_filter_row(cur, prev, f, ch)
            prev = cur

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data))
            + typ
            + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, ctype, 0, 0, 1)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(bytes(raw)))
        + chunk(b"IEND", b"")
    )


def test_png_adam7_interlaced_roundtrip():
    import numpy as np

    rng = np.random.RandomState(9)
    for w, h, ch in [(1, 1, 3), (7, 5, 3), (16, 16, 4), (9, 3, 1)]:
        arr = rng.randint(0, 256, size=(h, w, ch)).astype("uint8")
        img = mm.decode_png_pixels(_png_adam7(arr, [0, 1, 2, 3, 4]))
        assert img is not None, (w, h, ch)
        assert (img == arr).all(), (w, h, ch)


# -- video containers (AVI / MP4 headers) -----------------------------------


def _avi(width, height, total_frames, usec_pf):
    avih = struct.pack(
        "<10I", usec_pf, 0, 0, 0, total_frames, 0, 1, 0, width, height
    ) + b"\x00" * 16  # avih is 56 bytes; trailing reserved
    hdrl = b"avih" + struct.pack("<I", len(avih)) + avih
    lst = b"LIST" + struct.pack("<I", 4 + len(hdrl)) + b"hdrl" + hdrl
    return b"RIFF" + struct.pack("<I", 4 + len(lst)) + b"AVI " + lst


def _box(btype, payload):
    return struct.pack(">I", 8 + len(payload)) + btype + payload


def _mp4(width, height, timescale, duration, v1=False):
    if v1:
        mvhd = _box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 16
                    + struct.pack(">IQ", timescale, duration) + b"\x00" * 80)
        tkhd = _box(b"tkhd", b"\x01\x00\x00\x00" + b"\x00" * 84
                    + struct.pack(">II", width << 16, height << 16))
    else:
        mvhd = _box(b"mvhd", b"\x00\x00\x00\x00" + b"\x00" * 8
                    + struct.pack(">II", timescale, duration) + b"\x00" * 80)
        tkhd = _box(b"tkhd", b"\x00\x00\x00\x00" + b"\x00" * 72
                    + struct.pack(">II", width << 16, height << 16))
    trak = _box(b"trak", tkhd)
    moov = _box(b"moov", mvhd + trak)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    return ftyp + moov


def test_parse_avi_header():
    m = mm.parse_media_header(_avi(640, 480, 250, 40000))  # 25fps, 10s
    assert (m["format"], m["media_type"]) == ("avi", "video")
    assert (m["width"], m["height"], m["duration_ms"]) == (640, 480, 10000)


def test_parse_mp4_header_v0_and_v1():
    m = mm.parse_media_header(_mp4(1920, 1080, 600, 6000))  # 10s @ ts 600
    assert (m["format"], m["media_type"]) == ("mp4", "video")
    assert (m["width"], m["height"], m["duration_ms"]) == (1920, 1080, 10000)
    m1 = mm.parse_media_header(_mp4(320, 240, 90000, 90000 * 3, v1=True))
    assert (m1["width"], m1["height"], m1["duration_ms"]) == (320, 240, 3000)


def test_parse_video_garbage():
    assert mm.parse_media_header(b"RIFF\x00\x00\x00\x00AVI ")["format"] == "bin"
    assert mm.parse_media_header(b"\x00\x00\x00\x08ftypisom"[:6])["format"] == "bin"
    # WAV must still win over AVI on RIFF disambiguation
    assert mm.parse_media_header(_wav(8000, 16000, b"\x00" * 64))["format"] == "wav"


def test_decode_meta_video(spark):
    df = spark.createDataFrame(
        [(1, _avi(320, 200, 100, 33333)), (2, _mp4(640, 360, 1000, 2500))],
        "media_id long, content binary",
    )
    got = {r["media_id"]: r["meta"].asDict() for r in mm.decode_meta(df).collect()}
    assert (got[1]["media_type"], got[1]["width"], got[1]["duration_ms"]) == ("video", 320, 3333)
    assert (got[2]["format"], got[2]["height"], got[2]["duration_ms"]) == ("mp4", 360, 2500)


def test_mp4_truncated_v1_mvhd_skipped():
    """A v1 mvhd too short for its 64-bit duration must yield no duration —
    not a value read half out of the next box, and not the v0 misparse."""
    short_mvhd = _box(b"mvhd", b"\x01\x00\x00\x00" + b"\x00" * 24)  # 28 body bytes
    free = _box(b"free", b"\xff" * 16)
    ftyp = _box(b"ftyp", b"isom\x00\x00\x02\x00isomiso2")
    blob = ftyp + _box(b"moov", short_mvhd + free)
    m = mm.parse_media_header(blob)
    # no tkhd/duration parsed -> whole parse returns no video match
    assert m["duration_ms"] is None


def test_forged_giant_dimensions_and_zip_bomb_refused():
    """Untrusted corpus bytes must not drive multi-GB allocations: a forged
    giant PNG IHDR or GIF descriptor returns None before any buffer is
    sized from it, and a zip-bomb IDAT (tiny compressed, huge inflated) is
    decompressed only up to what the declared dimensions justify — a valid
    image with trailing inflated junk still decodes correctly."""
    import zlib

    import numpy as np

    from pwhl_data_engineering_pipeline_spark.operators import multimodal as mm

    # giant PNG IHDR (60000 x 60000 > 64M pixels), no real data needed
    ihdr = struct.pack(">IIBBBBB", 60000, 60000, 8, 0, 0, 0, 0)

    def chunk(typ, data):
        return (
            struct.pack(">I", len(data)) + typ + data
            + struct.pack(">I", zlib.crc32(typ + data))
        )

    giant_png = (
        b"\x89PNG\r\n\x1a\n" + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(b"\x00" * 100))
        + chunk(b"IEND", b"")
    )
    assert mm.decode_png_pixels(giant_png) is None

    # giant GIF image descriptor (60000 x 60000)
    gct = bytes([0, 0, 0, 255, 255, 255])  # 2-entry palette
    giant_gif = (
        b"GIF89a" + struct.pack("<HHBBB", 60000, 60000, 0x80, 0, 0) + gct
        + b"\x2c" + struct.pack("<HHHHB", 0, 0, 60000, 60000, 0)
        + bytes([2, 1, 0x44, 0]) + b"\x3b"
    )
    assert mm.decode_gif_frame(giant_gif) is None

    # zip-bomb-shaped IDAT: a valid 4x3 gray image followed by 10 MB of
    # inflated zeros in the SAME deflate stream — the cap stops at the
    # bytes the dimensions justify and the image still decodes exactly
    arr = (np.arange(12, dtype=np.uint8) * 9).reshape(3, 4, 1)
    raw = bytearray()
    for y in range(3):
        raw += b"\x00" + arr[y].tobytes()
    bomb = zlib.compress(bytes(raw) + b"\x00" * 10_000_000)
    bomb_png = (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", struct.pack(">IIBBBBB", 4, 3, 8, 0, 0, 0, 0))
        + chunk(b"IDAT", bomb)
        + chunk(b"IEND", b"")
    )
    got = mm.decode_png_pixels(bomb_png)
    assert got is not None and got.shape == (3, 4, 1)
    assert (got == arr).all()
