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
