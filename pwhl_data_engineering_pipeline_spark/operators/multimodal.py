"""Multimodal column plumbing (north-star surface).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schemas, batch-shaped Arrow UDFs over
``mapInPandas``, partitioning by media size — is real and tested. Container
HEADER decoding is REAL (pure-stdlib ``struct`` parsers for PNG IHDR, GIF
screen descriptor, JPEG SOF, RIFF/WAVE fmt+data → width/height/duration);
only pixel/sample decoding (needs codec libs absent from this container)
remains a clearly-marked deterministic fake.

Scale notes: media rows are orders of magnitude wider than text rows, so
(1) metadata lives in its own narrow struct column → metadata-only queries
never touch bytes (Parquet column pruning), and (2) ``mapInPandas`` batches
are capped by ``spark.sql.execution.arrow.maxRecordsPerBatch`` — set it low
(e.g. 64) for media tables so an Arrow batch of blobs fits executor memory.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

MEDIA_META = T.StructType(
    [
        T.StructField("media_type", T.StringType()),   # image|audio|video
        T.StructField("format", T.StringType()),        # png|jpeg|wav|mp4|...
        T.StructField("width", T.IntegerType()),
        T.StructField("height", T.IntegerType()),
        T.StructField("duration_ms", T.LongType()),
        T.StructField("size_bytes", T.LongType()),
    ]
)

MEDIA_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("content", T.BinaryType()),
        T.StructField("meta", MEDIA_META),
    ]
)

IMAGE_FEATURES_SCHEMA = T.StructType(
    [
        T.StructField("media_id", T.LongType()),
        T.StructField("features", T.ArrayType(T.FloatType())),
    ]
)


def attach_meta(df: DataFrame, content_col: str = "content", media_type: str = "image", fmt: str = "bin") -> DataFrame:
    """Derive the typed metadata struct from a binary column (size is real;
    codec-derived fields are left NULL until a real decoder fills them)."""
    return df.withColumn(
        "meta",
        F.struct(
            F.lit(media_type).alias("media_type"),
            F.lit(fmt).alias("format"),
            F.lit(None).cast("int").alias("width"),
            F.lit(None).cast("int").alias("height"),
            F.lit(None).cast("bigint").alias("duration_ms"),
            F.length(F.col(content_col)).cast("bigint").alias("size_bytes"),
        ),
    )


# -- JVM-side byte packing (for synthesizing container headers in-plan) ----

def be32(c) -> "F.Column":
    """Pack an integer column into 4 big-endian bytes, JVM-side:
    hex → left-pad to 8 nibbles → unhex. Stays in whole-stage codegen."""
    x = F.col(c) if isinstance(c, str) else c
    return F.unhex(F.lpad(F.hex(x.cast("bigint") % F.lit(4294967296)), 8, "0"))


def _byte(x, i: int) -> "F.Column":
    return F.unhex(F.lpad(F.hex(F.shiftright(x, 8 * i) % 256), 2, "0"))


def le32(c) -> "F.Column":
    """Pack an integer column into 4 little-endian bytes, JVM-side."""
    x = (F.col(c) if isinstance(c, str) else c).cast("bigint")
    return F.concat(_byte(x, 0), _byte(x, 1), _byte(x, 2), _byte(x, 3))


def le16(c) -> "F.Column":
    """Pack an integer column into 2 little-endian bytes, JVM-side."""
    x = (F.col(c) if isinstance(c, str) else c).cast("bigint")
    return F.concat(_byte(x, 0), _byte(x, 1))


# -- real header decoders (pure stdlib — no codec libraries needed) --------
#
# These parse actual container headers with `struct`: PNG IHDR, GIF logical
# screen descriptor, JPEG SOF frame, and RIFF/WAVE fmt+data chunks. They
# fill MEDIA_META's codec-derived fields (width/height/duration_ms) with
# REAL values; only pixel/sample decoding (which needs codec libs absent
# from this container) remains out of scope.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def parse_png(blob: bytes) -> dict | None:
    """PNG IHDR: width/height are the two big-endian u32s that open the
    first chunk after the 8-byte signature (chunk length + b'IHDR' first)."""
    import struct

    if not blob or not blob.startswith(_PNG_SIG) or len(blob) < 24:
        return None
    clen, ctype = struct.unpack_from(">I4s", blob, 8)
    if ctype != b"IHDR" or clen < 8:
        return None
    width, height = struct.unpack_from(">II", blob, 16)
    return {"format": "png", "media_type": "image", "width": width, "height": height}


def parse_gif(blob: bytes) -> dict | None:
    """GIF87a/89a logical screen descriptor: two little-endian u16s at 6."""
    import struct

    if not blob or blob[:6] not in (b"GIF87a", b"GIF89a") or len(blob) < 10:
        return None
    width, height = struct.unpack_from("<HH", blob, 6)
    return {"format": "gif", "media_type": "image", "width": width, "height": height}


def parse_jpeg(blob: bytes) -> dict | None:
    """JPEG: walk the marker segments to the first SOFn frame header
    (C0–CF excluding DHT C4, DNL C8, DAC CC); height/width are big-endian
    u16s at offsets 3/5 inside the frame segment."""
    import struct

    if not blob or blob[:2] != b"\xff\xd8":
        return None
    i, n = 2, len(blob)
    while i + 4 <= n:
        if blob[i] != 0xFF:
            return None
        marker = blob[i + 1]
        if marker == 0xFF:  # fill byte
            i += 1
            continue
        if 0xD0 <= marker <= 0xD9:  # RST/SOI/EOI: no length field
            i += 2
            continue
        seglen = struct.unpack_from(">H", blob, i + 2)[0]
        if 0xC0 <= marker <= 0xCF and marker not in (0xC4, 0xC8, 0xCC):
            if i + 2 + seglen > n or seglen < 7:
                return None
            height, width = struct.unpack_from(">HH", blob, i + 5)
            return {
                "format": "jpeg", "media_type": "image",
                "width": width, "height": height,
            }
        i += 2 + seglen
    return None


def parse_wav(blob: bytes) -> dict | None:
    """RIFF/WAVE: walk chunks for fmt (sample rate, channels, block align)
    and data (payload size); duration_ms = data_bytes / byte_rate."""
    import struct

    if not blob or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i, n = 12, len(blob)
    byte_rate = None
    data_size = None
    while i + 8 <= n:
        cid, clen = struct.unpack_from("<4sI", blob, i)
        if cid == b"fmt " and clen >= 16 and i + 8 + 16 <= n:
            _fmt, _ch, _rate, brate, _align, _bits = struct.unpack_from(
                "<HHIIHH", blob, i + 8
            )
            byte_rate = brate
        elif cid == b"data":
            data_size = clen
        i += 8 + clen + (clen & 1)  # chunks are word-aligned
    if byte_rate is None or data_size is None or byte_rate == 0:
        return None
    return {
        "format": "wav", "media_type": "audio",
        "duration_ms": int(data_size * 1000 // byte_rate),
    }


def parse_bmp(blob: bytes) -> dict | None:
    """BMP (BITMAPINFOHEADER): width/height from the info header. Height may
    be negative (top-down rows) — report its magnitude."""
    import struct

    if not blob or len(blob) < 54 or blob[:2] != b"BM":
        return None
    width, height = struct.unpack_from("<ii", blob, 18)
    return {
        "format": "bmp", "media_type": "image",
        "width": int(abs(width)), "height": int(abs(height)),
    }


def parse_avi(blob: bytes) -> dict | None:
    """AVI (RIFF) main header: walk chunks to 'avih' — width/height are
    u32s at field offsets 32/36, duration = dwTotalFrames ×
    dwMicroSecPerFrame."""
    import struct

    if not blob or len(blob) < 24 or blob[:4] != b"RIFF" or blob[8:12] != b"AVI ":
        return None
    i, n = 12, len(blob)
    while i + 8 <= n:
        cid, sz = struct.unpack_from("<4sI", blob, i)
        if cid == b"LIST":
            i += 12  # descend into the list (subtype occupies the first 4)
            continue
        if cid == b"avih" and i + 8 + 40 <= n:
            fields = struct.unpack_from("<10I", blob, i + 8)
            usec_pf, total_frames = fields[0], fields[4]
            width, height = fields[8], fields[9]
            dur = (total_frames * usec_pf) // 1000 if usec_pf else None
            return {
                "format": "avi", "media_type": "video",
                "width": width, "height": height, "duration_ms": dur,
            }
        i += 8 + sz + (sz & 1)
    return None


def parse_mp4(blob: bytes) -> dict | None:
    """MP4/ISO-BMFF: box walk — duration from moov/mvhd (v0 or v1),
    width/height from the first trak/tkhd with a nonzero size (16.16
    fixed-point)."""
    import struct

    if not blob or len(blob) < 12 or blob[4:8] != b"ftyp":
        return None

    def walk(lo: int, hi: int, out: dict):
        i = lo
        while i + 8 <= hi:
            (size,) = struct.unpack_from(">I", blob, i)
            btype = blob[i + 4 : i + 8]
            hdr = 8
            if size == 1:
                if i + 16 > hi:
                    return
                (size,) = struct.unpack_from(">Q", blob, i + 8)
                hdr = 16
            elif size == 0:
                size = hi - i
            if size < hdr or i + size > hi:
                return
            body = i + hdr
            if btype in (b"moov", b"trak"):
                walk(body, i + size, out)
            elif btype == b"mvhd" and "duration_ms" not in out and size >= hdr + 20:
                ver = blob[body]
                # v1 layout needs 32 body bytes before the u64 duration ends
                # (4 ver/flags + 16 times + 4 timescale + 8 duration); a
                # 28-byte guard would read the duration's low half from the
                # NEXT box.
                ts = dur = None
                if ver == 1:
                    if size >= hdr + 32:
                        ts, dur = struct.unpack_from(">IQ", blob, body + 20)
                    # truncated v1: skip — the v0 layout would misread the
                    # 64-bit timestamps as timescale/duration
                elif ver == 0:
                    ts, dur = struct.unpack_from(">II", blob, body + 12)
                if ts:
                    out["duration_ms"] = (dur * 1000) // ts
            elif btype == b"tkhd" and "width" not in out and size >= hdr + 84:
                ver = blob[body]
                off = body + (96 if ver == 1 else 84) - 8
                if off + 8 <= i + size:
                    w_fx, h_fx = struct.unpack_from(">II", blob, off)
                    if w_fx and h_fx:
                        out["width"] = w_fx >> 16
                        out["height"] = h_fx >> 16
            i += size

    out: dict = {}
    walk(0, len(blob), out)
    if not out:
        return None
    return {
        "format": "mp4", "media_type": "video",
        "width": out.get("width"), "height": out.get("height"),
        "duration_ms": out.get("duration_ms"),
    }


_PARSERS = (parse_png, parse_gif, parse_jpeg, parse_wav, parse_avi, parse_mp4, parse_bmp)


def parse_media_header(blob: bytes) -> dict:
    """Sniff + parse a media blob's container header. Returns the MEDIA_META
    fields it could derive (always size_bytes; width/height/duration_ms when
    a known container matched; format='bin' otherwise)."""
    meta = {
        "media_type": "binary", "format": "bin",
        "width": None, "height": None, "duration_ms": None,
        "size_bytes": len(blob or b""),
    }
    for p in _PARSERS:
        got = p(blob)
        if got:
            meta.update(got)
            return meta
    return meta


def decode_meta(
    df: DataFrame, content_col: str = "content", id_col: str = "media_id"
) -> DataFrame:
    """Fill MEDIA_META from REAL container headers via Arrow-batched
    mapInPandas: (id, meta). Header parsing touches only the leading bytes
    of each blob; the scan stays narrow (id + content) and the output is
    the narrow metadata frame to join back (or write as a sidecar) —
    metadata-only consumers never rescan the bytes."""
    import pandas as pd  # noqa: PLC0415

    out_schema = T.StructType(
        [T.StructField(id_col, T.LongType()), T.StructField("meta", MEDIA_META)]
    )

    def run(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    id_col: pdf[id_col],
                    "meta": [parse_media_header(b) for b in pdf[content_col]],
                }
            )

    return df.select(F.col(id_col), F.col(content_col)).mapInPandas(run, out_schema)


def _fake_decode_features(blob: bytes, dim: int) -> list[float]:
    """Deterministic fake feature extractor (STUB — container has no codec
    libs). Hashes the bytes into a stable pseudo-feature vector so the Spark
    plumbing (batching, schema, joins downstream) is fully exercisable.
    Replace with a real decode (PIL/librosa/ffmpeg) in production."""
    import hashlib

    h = hashlib.sha256(blob or b"").digest()
    return [((h[i % 32] / 255.0) * 2 - 1) for i in range(dim)]


def decode_bmp_pixels(blob: bytes):
    """REAL pixel decode for uncompressed 24-bit BMP (BI_RGB) — pure
    stdlib+numpy, no codec libs. Returns an (height, width, 3) uint8 RGB
    array, or None if the blob isn't such a BMP. Rows are stored bottom-up
    (positive height) and padded to 4-byte boundaries; negative height means
    top-down."""
    import struct

    import numpy as np

    if not blob or len(blob) < 54 or blob[:2] != b"BM":
        return None
    (data_off,) = struct.unpack_from("<I", blob, 10)
    width, height = struct.unpack_from("<ii", blob, 18)
    bpp, compression = struct.unpack_from("<HI", blob, 28)
    if bpp != 24 or compression != 0 or width <= 0 or height == 0:
        return None
    h, top_down = abs(height), height < 0
    row_bytes = (width * 3 + 3) & ~3
    need = data_off + row_bytes * h
    if len(blob) < need:
        return None
    rows = np.frombuffer(blob, dtype=np.uint8, count=row_bytes * h, offset=data_off)
    img = rows.reshape(h, row_bytes)[:, : width * 3].reshape(h, width, 3)
    if not top_down:
        img = img[::-1]
    return img[..., ::-1]  # BGR on disk → RGB


def _lzw_decode(data: bytes, min_code_size: int, expected: int):
    """GIF-variant LZW decode (pure Python): variable code width starting at
    min_code_size+1, LSB-first bit packing, clear/end control codes, 12-bit
    dictionary cap. Returns a bytearray of palette indices, or None on a
    corrupt stream. Tops out at ``expected`` indices (frames are w*h)."""
    clear = 1 << min_code_size
    end = clear + 1
    code_size = min_code_size + 1
    base = [bytes([i]) for i in range(clear)] + [b"", b""]
    table = list(base)
    out = bytearray()
    prev = None
    bitpos = 0
    total_bits = len(data) * 8
    while bitpos + code_size <= total_bits and len(out) < expected:
        byte_i = bitpos >> 3
        chunk = int.from_bytes(data[byte_i : byte_i + 3], "little")
        code = (chunk >> (bitpos & 7)) & ((1 << code_size) - 1)
        bitpos += code_size
        if code == clear:
            table = list(base)
            code_size = min_code_size + 1
            prev = None
            continue
        if code == end:
            break
        if code < len(table):
            entry = table[code]  # clear/end were handled above
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]  # the KwKwK case
        else:
            return None  # corrupt stream
        out.extend(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << code_size) and code_size < 12:
                code_size += 1
        prev = entry
    return out


_GIF_PASSES = ((0, 8), (4, 8), (2, 4), (1, 2))


def decode_gif_frame(blob: bytes):
    """REAL pixel decode for GIF — including the LZW decompression, pure
    stdlib+numpy (the first compressed-codec path; BMP/WAV cover the
    uncompressed ones). Returns the FIRST image frame as an (height, width,
    3) uint8 RGB array (palette applied, interlacing deinterlaced), or None
    if the blob isn't a decodable GIF. Transparency/animation composition is
    out of scope (frame features don't need it)."""
    import struct

    import numpy as np

    if not blob or len(blob) < 13 or blob[:6] not in (b"GIF87a", b"GIF89a"):
        return None
    _sw, _sh, packed, _bg, _ar = struct.unpack_from("<HHBBB", blob, 6)
    i = 13
    gct = None
    if packed & 0x80:
        n = 2 << (packed & 7)
        gct = blob[i : i + 3 * n]
        i += 3 * n
    while i < len(blob):
        b0 = blob[i]
        if b0 == 0x21:  # extension block: label then length-prefixed sub-blocks
            i += 2
            while i < len(blob) and blob[i] != 0:
                i += 1 + blob[i]
            i += 1
        elif b0 == 0x2C:  # image descriptor
            if i + 10 > len(blob):
                return None
            _left, _top, w, h, ip = struct.unpack_from("<HHHHB", blob, i + 1)
            i += 10
            pal = gct
            if ip & 0x80:
                n = 2 << (ip & 7)
                pal = blob[i : i + 3 * n]
                i += 3 * n
            if pal is None or w == 0 or h == 0 or i >= len(blob):
                return None
            if w * h > 64_000_000:
                # untrusted corpus bytes: a forged descriptor must not let
                # the LZW loop build a multi-GB index buffer (same cap as
                # jpeg.decode_jpeg_pixels)
                return None
            mcs = blob[i]
            i += 1
            if not 2 <= mcs <= 11:
                return None
            data = bytearray()
            while i < len(blob) and blob[i] != 0:
                ln = blob[i]
                data += blob[i + 1 : i + 1 + ln]
                i += 1 + ln
            idx = _lzw_decode(bytes(data), mcs, w * h)
            if idx is None or len(idx) < w * h:
                return None
            arr = np.frombuffer(bytes(idx[: w * h]), dtype=np.uint8).reshape(h, w)
            if ip & 0x40:  # interlaced: 4-pass row order
                out = np.empty_like(arr)
                r = 0
                for start, step in _GIF_PASSES:
                    for rr in range(start, h, step):
                        out[rr] = arr[r]
                        r += 1
                arr = out
            palette = np.frombuffer(pal, dtype=np.uint8)
            palette = palette[: (len(palette) // 3) * 3].reshape(-1, 3)
            if int(arr.max()) >= len(palette):
                return None
            return palette[arr]
        elif b0 == 0x3B:  # trailer
            return None
        else:
            return None
    return None


def _png_unfilter(raw: bytes, pos: int, w: int, h: int, ch: int):
    """Unfilter ``h`` scanlines of ``w`` pixels starting at ``pos`` in the
    inflated stream. Returns ((h, w*ch) uint8 array, next pos), or None on a
    short/corrupt stream. The Up unfilter (the common case for photographic
    encoders) is numpy-vectorized; Sub/Average/Paeth carry an intra-row
    left-neighbor dependency and run as byte loops — fine for the
    Arrow-batch feature path where images are thumbnails, exact for any
    size."""
    import numpy as np

    stride = w * ch
    if len(raw) - pos < h * (stride + 1):
        return None
    rows = np.empty((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.uint8)
    for y in range(h):
        f = raw[pos]
        cur = raw[pos + 1 : pos + 1 + stride]
        pos += stride + 1
        if f == 0:
            line = np.frombuffer(cur, dtype=np.uint8).copy()
        elif f == 2:  # Up: fully vectorized
            line = (np.frombuffer(cur, dtype=np.uint8) + prev).astype(np.uint8)
        else:
            b = bytearray(cur)
            if f == 1:  # Sub
                for x in range(ch, stride):
                    b[x] = (b[x] + b[x - ch]) & 0xFF
            elif f == 3:  # Average
                for x in range(stride):
                    a = b[x - ch] if x >= ch else 0
                    # int() matters: prev[x] is np.uint8 and under NumPy 2
                    # (NEP 50) a Python int + uint8 scalar stays uint8, so
                    # the 9-bit sum would wrap before the shift.
                    b[x] = (b[x] + ((a + int(prev[x])) >> 1)) & 0xFF
            elif f == 4:  # Paeth
                for x in range(stride):
                    a = b[x - ch] if x >= ch else 0
                    up = int(prev[x])
                    c = int(prev[x - ch]) if x >= ch else 0
                    p = a + up - c
                    pa, pb, pc = abs(p - a), abs(p - up), abs(p - c)
                    pred = a if (pa <= pb and pa <= pc) else (up if pb <= pc else c)
                    b[x] = (b[x] + pred) & 0xFF
            else:
                return None
            line = np.frombuffer(bytes(b), dtype=np.uint8)
        rows[y] = line
        prev = rows[y]
    return rows, pos


# Adam7 passes: (x_start, y_start, x_step, y_step)
_ADAM7 = (
    (0, 0, 8, 8), (4, 0, 8, 8), (0, 4, 4, 8), (2, 0, 4, 4),
    (0, 2, 2, 4), (1, 0, 2, 2), (0, 1, 1, 2),
)


def decode_png_pixels(blob: bytes):
    """REAL pixel decode for PNG — IDAT inflate via stdlib ``zlib`` plus the
    five scanline unfilters (None/Sub/Up/Average/Paeth). Supports 8-bit
    greyscale / RGB / grey+alpha / RGBA, both non-interlaced and Adam7
    interlaced (each pass is its own filtered sub-image). Returns an
    (height, width, channels) uint8 array, or None."""
    import struct
    import zlib

    import numpy as np

    sig = b"\x89PNG\r\n\x1a\n"
    if not blob or not blob.startswith(sig):
        return None
    i = 8
    ihdr = None
    idat = bytearray()
    while i + 8 <= len(blob):
        ln, typ = struct.unpack_from(">I4s", blob, i)
        data = blob[i + 8 : i + 8 + ln]
        if len(data) < ln:
            return None
        if typ == b"IHDR":
            if ln != 13:
                return None
            ihdr = struct.unpack(">IIBBBBB", data)
        elif typ == b"IDAT":
            idat += data
        elif typ == b"IEND":
            break
        i += 12 + ln  # length + type + data + crc
    if ihdr is None or not idat:
        return None
    w, h, depth, ctype, comp, filt, inter = ihdr
    ch = {0: 1, 2: 3, 4: 2, 6: 4}.get(ctype)
    if depth != 8 or comp != 0 or filt != 0 or inter not in (0, 1) or ch is None:
        return None
    if w == 0 or h == 0:
        return None
    if w * h > 64_000_000:
        return None  # untrusted IHDR: refuse oversized allocations
    # exact inflated size this image needs (per-pass filter byte + rows);
    # decompress is CAPPED there so a zip-bomb IDAT cannot balloon memory
    # past what the declared (already capped) dimensions justify
    if inter == 0:
        needed = h * (w * ch + 1)
    else:
        needed = 0
        for x0, y0, dx, dy in _ADAM7:
            pw = (w - x0 + dx - 1) // dx
            ph = (h - y0 + dy - 1) // dy
            if pw > 0 and ph > 0:
                needed += ph * (pw * ch + 1)
    try:
        raw = zlib.decompressobj().decompress(bytes(idat), needed)
    except zlib.error:
        return None
    if inter == 0:
        got = _png_unfilter(raw, 0, w, h, ch)
        if got is None:
            return None
        rows, _ = got
        return rows.reshape(h, w, ch)
    # Adam7: seven filtered sub-images scattered onto the grid
    out = np.zeros((h, w, ch), dtype=np.uint8)
    pos = 0
    for x0, y0, dx, dy in _ADAM7:
        pw = (w - x0 + dx - 1) // dx
        ph = (h - y0 + dy - 1) // dy
        if pw <= 0 or ph <= 0:
            continue
        got = _png_unfilter(raw, pos, pw, ph, ch)
        if got is None:
            return None
        rows, pos = got
        sub = rows.reshape(ph, pw, ch)
        out[y0::dy, x0::dx] = sub
    return out


def _to_rgb(img):
    """(h, w, ch) uint8 → (h, w, 3): replicate grey, drop alpha."""
    ch = img.shape[2]
    if ch == 3:
        return img
    if ch == 4:
        return img[..., :3]
    grey = img[..., :1]  # 1 or 2 (grey+alpha) channels: grey is channel 0
    import numpy as np

    return np.repeat(grey, 3, axis=2)


def decode_wav_samples(blob: bytes):
    """REAL sample decode for 16-bit PCM WAV — pure stdlib+numpy. Returns
    (samples as (n, channels) int16 array, sample_rate), or None."""
    import struct

    import numpy as np

    if not blob or len(blob) < 12 or blob[:4] != b"RIFF" or blob[8:12] != b"WAVE":
        return None
    i, n = 12, len(blob)
    fmt = None
    data = None
    while i + 8 <= n:
        cid, clen = struct.unpack_from("<4sI", blob, i)
        if cid == b"fmt " and clen >= 16 and i + 8 + 16 <= n:
            fmt = struct.unpack_from("<HHIIHH", blob, i + 8)
        elif cid == b"data":
            data = blob[i + 8 : i + 8 + clen]
        i += 8 + clen + (clen & 1)
    if fmt is None or data is None:
        return None
    audio_fmt, channels, rate, _brate, _align, bits = fmt
    if audio_fmt != 1 or bits != 16 or channels < 1:
        return None
    samples = np.frombuffer(data, dtype="<i2")
    usable = (len(samples) // channels) * channels
    return samples[:usable].reshape(-1, channels), rate


def stdlib_media_features(blob: bytes, dim: int = 16) -> list[float]:
    """REAL feature extraction — every image/audio container this engine
    names now decodes for real, pure stdlib+numpy:

    - 24-bit BMP, GIF (incl. LZW), PNG (incl. zlib inflate + unfilters),
      baseline JPEG (incl. huffman + IDCT + YCbCr) → [1, width, height,
      mean R, mean G, mean B, std R/G/B, overall brightness] (means scaled
      to [0,1])
    - 16-bit PCM WAV → [2, n_samples, channels, sample_rate, RMS, peak,
      zero-crossing rate] (amplitudes scaled to [-1,1])
    - unrecognized bytes → a deterministic hash vector tagged [0, ...]
      (arithmetic-coded JPEG and exotic variants land here; baseline AND
      progressive JPEG both decode for real since round 4).

    Padded/truncated to ``dim``. The leading tag makes the source of each
    vector auditable downstream."""
    import numpy as np

    from .jpeg import decode_jpeg_pixels

    img = decode_bmp_pixels(blob)
    if img is None:
        img = decode_gif_frame(blob)
    if img is None:
        png = decode_png_pixels(blob)
        img = _to_rgb(png) if png is not None else None
    if img is None:
        img = decode_jpeg_pixels(blob)
    if img is not None:
        px = img.astype(np.float64) / 255.0
        feats = [
            1.0, float(img.shape[1]), float(img.shape[0]),
            *(float(px[..., c].mean()) for c in range(3)),
            *(float(px[..., c].std()) for c in range(3)),
            float(px.mean()),
        ]
    else:
        wav = decode_wav_samples(blob)
        if wav is not None:
            samples, rate = wav
            x = samples.astype(np.float64) / 32768.0
            mono = x.mean(axis=1)
            zc = float(np.mean(np.abs(np.diff(np.signbit(mono))))) if len(mono) > 1 else 0.0
            feats = [
                2.0, float(len(mono)), float(samples.shape[1]), float(rate),
                float(np.sqrt((mono**2).mean())) if len(mono) else 0.0,
                float(np.abs(mono).max()) if len(mono) else 0.0,
                zc,
            ]
        else:
            feats = [0.0, *_fake_decode_features(blob, dim - 1)]
    feats = feats[:dim]
    return feats + [0.0] * (dim - len(feats))


def extract_features(
    df: DataFrame,
    dim: int = 16,
    content_col: str = "content",
    id_col: str = "media_id",
    real_decoder=None,
) -> DataFrame:
    """Feature extraction over binary media via Arrow-batched mapInPandas.

    ``real_decoder(blob: bytes) -> list[float]`` plugs a real codec in; the
    default deterministic fake keeps tests hermetic. Raises
    NotImplementedError if ``real_decoder == "require"`` to mark the
    production boundary explicitly.
    """
    if real_decoder == "require":
        raise NotImplementedError(
            "real media decoding requires codec libraries not present in "
            "this container; pass real_decoder=callable"
        )
    decoder = real_decoder or (lambda blob: _fake_decode_features(blob, dim))

    import pandas as pd  # noqa: PLC0415

    def run(batches: Iterable["pd.DataFrame"]):
        for pdf in batches:
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col],
                    "features": [decoder(b) for b in pdf[content_col]],
                }
            )

    narrow = df.select(F.col(id_col), F.col(content_col))
    return narrow.mapInPandas(run, IMAGE_FEATURES_SCHEMA)


def frame_sample_plan(df: DataFrame, every_ms: int = 1000) -> DataFrame:
    """Video frame-sampling *plan*: computes the frame timestamps to decode
    from metadata only (no bytes touched — column pruning keeps this scan
    narrow). The decode itself is the stubbed boundary above."""
    return df.select(
        "media_id",
        F.explode(
            F.sequence(
                F.lit(0),
                F.coalesce(F.col("meta.duration_ms"), F.lit(0)),
                F.lit(every_ms),
            )
        ).alias("frame_ts_ms"),
    )
