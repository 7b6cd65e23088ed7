"""Multimodal column plumbing: opaque binary media + typed metadata.

Design (the part that must be right at 100 TB):
* media rides as an opaque ``binary`` column next to typed metadata
  (``media_type``, ``n_bytes``) — never materialized driver-side,
  never stringified;
* decode / feature-extraction runs in ``mapInPandas`` over Arrow
  batches — bytes move JVM->Python zero-copy per batch, the kernel is
  NumPy over ``np.frombuffer`` views;
* heavy media libs (PIL/torchaudio/av) are NOT in this container, so
  the codec-dependent steps (image decode, resize, audio resample,
  video frame-sample) are stubbed behind clearly-marked
  ``NotImplementedError`` raisers with an import-try — the Spark-side
  plumbing (schema, partitioning, batch shape, UDF signature) is real
  and tested;
* byte-level features (length, crc-ish hash, byte histogram) are
  computed for real — they exercise the exact same plumbing the
  decoders would.

The synthetic media column derives deterministically from document
text (UTF-8 bytes), so tests and oracles are reproducible.
"""

from __future__ import annotations

from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MEDIA_SCHEMA = "doc_id long, media_type string, n_bytes int, media binary"
FEATURE_SCHEMA = (
    "doc_id long, media_type string, n_bytes int, "
    "byte_entropy double, head_hash long, histogram16 array<int>"
)

try:  # media decoders are optional; absent in this container
    import PIL.Image  # type: ignore  # noqa: F401

    _HAS_PIL = True
except ImportError:
    _HAS_PIL = False


def media_from_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic media table: media bytes = UTF-8 text, type cycles
    through image/audio/video by doc_id — the plumbing fixture."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    mt = F.element_at(
        F.array(F.lit("image"), F.lit("audio"), F.lit("video")),
        (F.col("doc_id") % 3 + 1).cast("int"),
    )
    media = F.encode("text", "UTF-8")
    return docs.select(
        "doc_id",
        mt.alias("media_type"),
        F.octet_length(media).cast("int").alias("n_bytes"),
        media.alias("media"),
    )


# ---------------------------------------------------------------------------
# real codecs: BMP (24-bit uncompressed) and WAV (PCM16) in pure NumPy
# ---------------------------------------------------------------------------
# The container ships no media libraries, but these two formats need
# none: both are fixed headers + raw sample payloads, decodable with
# np.frombuffer views. They turn the former decode/resize stubs into
# real, tested paths; formats that genuinely need a codec (JPEG/PNG/
# video) stay behind the PIL/av import-try below.


def encode_bmp(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 RGB -> 24-bit uncompressed BMP bytes
    (BITMAPFILEHEADER + BITMAPINFOHEADER, bottom-up rows, BGR order,
    rows padded to 4 bytes — the original Windows DIB layout)."""
    import struct

    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    row_bytes = (w * 3 + 3) & ~3
    body = np.zeros((h, row_bytes), dtype=np.uint8)
    # bottom-up, BGR
    body[:, : w * 3] = arr[::-1, :, ::-1].reshape(h, w * 3)
    data_size = h * row_bytes
    header = struct.pack(
        "<2sIHHIIiiHHIIiiII",
        b"BM", 54 + data_size, 0, 0, 54,
        40, w, h, 1, 24, 0, data_size, 2835, 2835, 0, 0,
    )
    return header + body.tobytes()


def decode_bmp(data: bytes) -> np.ndarray:
    """24-bit uncompressed BMP bytes -> (h, w, 3) uint8 RGB array.
    Pure NumPy: header fields via struct, pixels via one frombuffer
    view + stride reshape. Supports the layout encode_bmp writes
    (BITMAPINFOHEADER, bottom-up, no compression)."""
    import struct

    if data[:2] != b"BM":
        raise ValueError("not a BMP stream")
    offset = struct.unpack_from("<I", data, 10)[0]
    hsize, w, h, _planes, bpp, comp = struct.unpack_from("<IiiHHI", data, 14)
    if bpp != 24 or comp != 0:
        raise NotImplementedError("only 24-bit uncompressed BMP supported")
    flip = h > 0
    h = abs(h)
    row_bytes = (w * 3 + 3) & ~3
    body = np.frombuffer(data, dtype=np.uint8, count=h * row_bytes, offset=offset)
    rows = body.reshape(h, row_bytes)[:, : w * 3].reshape(h, w, 3)
    rgb = rows[:, :, ::-1]  # BGR -> RGB
    return (rgb[::-1] if flip else rgb).copy()


def resize_image(data, w: int, h: int) -> np.ndarray:
    """Deterministic nearest-neighbor resize -> (h, w, 3) uint8.
    Accepts BMP bytes or an already-decoded (H, W, 3) array; index
    mapping is floor((i + 0.5) * H / h) — pure NumPy fancy indexing,
    no codec dependency."""
    arr = decode_image(data) if isinstance(data, (bytes, bytearray)) else data
    src_h, src_w = arr.shape[:2]
    ri = np.minimum(
        ((np.arange(h) + 0.5) * src_h / h).astype(np.int64), src_h - 1
    )
    ci = np.minimum(
        ((np.arange(w) + 0.5) * src_w / w).astype(np.int64), src_w - 1
    )
    return arr[ri][:, ci]


def encode_wav(samples: np.ndarray, sample_rate: int) -> bytes:
    """1-D int16 mono samples -> RIFF/WAVE PCM16 bytes."""
    import struct

    assert samples.dtype == np.int16 and samples.ndim == 1
    body = samples.tobytes()
    fmt = struct.pack(
        "<4sIHHIIHH", b"fmt ", 16, 1, 1, sample_rate,
        sample_rate * 2, 2, 16,
    )
    data = struct.pack("<4sI", b"data", len(body)) + body
    riff = struct.pack("<4sI4s", b"RIFF", 4 + len(fmt) + len(data), b"WAVE")
    return riff + fmt + data


def decode_wav(data: bytes) -> tuple[int, np.ndarray]:
    """RIFF/WAVE PCM16 mono bytes -> (sample_rate, int16 array).
    Chunk-walked (not offset-assumed), so extra chunks before 'data'
    are tolerated; non-PCM16 raises."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"WAVE":
        raise ValueError("not a WAVE stream")
    pos, rate, samples = 12, None, None
    while pos + 8 <= len(data):
        cid, size = struct.unpack_from("<4sI", data, pos)
        pos += 8
        if cid == b"fmt ":
            audio_fmt, channels, rate, _, _, bits = struct.unpack_from(
                "<HHIIHH", data, pos
            )
            if audio_fmt != 1 or bits != 16 or channels != 1:
                raise NotImplementedError("only PCM16 mono supported")
        elif cid == b"data":
            samples = np.frombuffer(data, dtype="<i2", count=size // 2,
                                    offset=pos)
        pos += size + (size & 1)
    if rate is None or samples is None:
        raise ValueError("missing fmt/data chunk")
    return rate, samples


# ---------------------------------------------------------------------------
# real codec: PNG (8-bit RGB/RGBA, non-interlaced) in NumPy + stdlib zlib
# ---------------------------------------------------------------------------
# PNG needs only DEFLATE (stdlib zlib) and the five scanline filters —
# no external codec. This is the common web image format, so decoding
# it natively closes most of the "non-BMP formats need PIL" gap; JPEG
# (DCT + Huffman) and video stay behind the import-try.

_PNG_SIG = b"\x89PNG\r\n\x1a\n"


def _png_chunk(ctype: bytes, body: bytes) -> bytes:
    import struct
    import zlib

    return (
        struct.pack(">I", len(body))
        + ctype
        + body
        + struct.pack(">I", zlib.crc32(ctype + body) & 0xFFFFFFFF)
    )


def encode_png(arr: np.ndarray) -> bytes:
    """(h, w, 3|4) uint8 -> PNG bytes (8-bit truecolor / truecolor+
    alpha, non-interlaced, filter 0 scanlines, one zlib IDAT)."""
    import struct
    import zlib

    h, w, c = arr.shape
    assert c in (3, 4) and arr.dtype == np.uint8
    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2 if c == 3 else 6, 0, 0, 0)
    raw = np.zeros((h, 1 + w * c), dtype=np.uint8)
    raw[:, 1:] = arr.reshape(h, w * c)
    return (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw.tobytes(), 6))
        + _png_chunk(b"IEND", b"")
    )


def _png_unfilter(raw: np.ndarray, h: int, w: int, bpp: int) -> np.ndarray:
    """Undo PNG scanline filters -> (h, w*bpp) uint8. Filters 0-2 are
    vectorized per row (Sub is a grouped mod-256 cumsum); Average and
    Paeth are inherently sequential in x, so they fall back to a
    per-byte loop — our encoder never emits them, foreign PNGs may."""
    stride = w * bpp
    out = np.zeros((h, stride), dtype=np.uint8)
    prev = np.zeros(stride, dtype=np.int32)
    pos = 0
    for y in range(h):
        f = int(raw[pos])
        line = raw[pos + 1 : pos + 1 + stride].astype(np.int32)
        pos += 1 + stride
        if f == 0:
            rec = line
        elif f == 1:  # Sub: grouped cumsum mod 256 over same-channel lanes
            rec = np.cumsum(line.reshape(w, bpp), axis=0).reshape(stride) % 256
        elif f == 2:  # Up
            rec = (line + prev) % 256
        elif f == 3:  # Average (sequential)
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                rec[x] = (line[x] + ((a + prev[x]) >> 1)) % 256
        elif f == 4:  # Paeth (sequential)
            rec = np.empty(stride, dtype=np.int32)
            for x in range(stride):
                a = rec[x - bpp] if x >= bpp else 0
                b = prev[x]
                cc = prev[x - bpp] if x >= bpp else 0
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
                rec[x] = (line[x] + pred) % 256
        else:
            raise ValueError(f"unknown PNG filter {f}")
        out[y] = rec.astype(np.uint8)
        prev = rec
    return out


def decode_png(data: bytes) -> np.ndarray:
    """PNG bytes -> (h, w, 3|4) uint8. Supports 8-bit truecolor and
    truecolor+alpha, non-interlaced, all five scanline filters; chunk
    CRCs are verified. Palette/grayscale/16-bit/interlaced raise."""
    import struct
    import zlib

    if data[:8] != _PNG_SIG:
        raise ValueError("not a PNG stream")
    pos, idat, meta = 8, [], None
    while pos + 8 <= len(data):
        length, ctype = struct.unpack_from(">I4s", data, pos)
        body = data[pos + 8 : pos + 8 + length]
        (crc,) = struct.unpack_from(">I", data, pos + 8 + length)
        if zlib.crc32(ctype + body) & 0xFFFFFFFF != crc:
            raise ValueError(f"PNG chunk {ctype!r} CRC mismatch")
        if ctype == b"IHDR":
            meta = struct.unpack(">IIBBBBB", body)
        elif ctype == b"IDAT":
            idat.append(body)
        elif ctype == b"IEND":
            break
        pos += 12 + length
    if meta is None or not idat:
        raise ValueError("missing IHDR/IDAT")
    w, h, depth, ctype_n, comp, filt, interlace = meta
    if depth != 8 or ctype_n not in (2, 6) or comp or filt or interlace:
        raise NotImplementedError(
            "only 8-bit non-interlaced truecolor(+alpha) PNG supported"
        )
    bpp = 3 if ctype_n == 2 else 4
    raw = np.frombuffer(zlib.decompress(b"".join(idat)), dtype=np.uint8)
    if raw.size != h * (1 + w * bpp):
        raise ValueError("PNG payload size mismatch")
    return _png_unfilter(raw, h, w, bpp).reshape(h, w, bpp)


# ---------------------------------------------------------------------------
# real codec: GIF (87a/89a, first frame, global/local palettes) with a
# from-scratch LZW — lossless, so round trips are bit-exact testable
# ---------------------------------------------------------------------------


def _lzw_encode(indices: np.ndarray, min_code_size: int) -> bytes:
    """GIF-variant LZW: variable code width from min_code_size+1,
    clear/EOI codes, dict capped at 4095 (emit clear + reset when
    full). Sequential by nature — encoder is fixture/test machinery,
    the serving path only decodes."""
    clear = 1 << min_code_size
    eoi = clear + 1
    out_bits: list[tuple[int, int]] = []  # (code, width)

    def fresh():
        return {(i,): i for i in range(clear)}, eoi + 1, min_code_size + 1

    table, next_code, width = fresh()
    out_bits.append((clear, width))
    buf: tuple[int, ...] = ()
    for sym in indices.tolist():
        cand = buf + (sym,)
        if cand in table:
            buf = cand
            continue
        out_bits.append((table[buf], width))
        if next_code <= 4095:
            table[cand] = next_code
            if next_code == (1 << width) and width < 12:
                width += 1
            next_code += 1
        else:
            out_bits.append((clear, width))
            table, next_code, width = fresh()
        buf = (sym,)
    if buf:
        out_bits.append((table[buf], width))
    out_bits.append((eoi, width))
    # pack LSB-first
    acc = bitpos = 0
    by = bytearray()
    for code, w in out_bits:
        acc |= code << bitpos
        bitpos += w
        while bitpos >= 8:
            by.append(acc & 0xFF)
            acc >>= 8
            bitpos -= 8
    if bitpos:
        by.append(acc & 0xFF)
    return bytes(by)


def _lzw_decode(data: bytes, min_code_size: int, n_pixels: int) -> np.ndarray:
    clear = 1 << min_code_size
    eoi = clear + 1
    bits = np.unpackbits(
        np.frombuffer(data, dtype=np.uint8), bitorder="little"
    )
    out = np.empty(n_pixels, dtype=np.uint8)
    n_out = pos = 0

    def fresh():
        return [bytes([i]) for i in range(clear)] + [b"", b""], min_code_size + 1

    table, width = fresh()
    prev: bytes | None = None
    while pos + width <= bits.size and n_out < n_pixels:
        code = int(bits[pos : pos + width] @ (1 << np.arange(width)))
        pos += width
        if code == clear:
            table, width = fresh()
            prev = None
            continue
        if code == eoi:
            break
        if code < len(table):
            entry = table[code]
        elif code == len(table) and prev is not None:
            entry = prev + prev[:1]
        else:
            raise ValueError("corrupt GIF LZW stream")
        if n_out + len(entry) > n_pixels:
            raise ValueError("GIF pixel data overruns image size")
        out[n_out : n_out + len(entry)] = np.frombuffer(entry, dtype=np.uint8)
        n_out += len(entry)
        if prev is not None and len(table) < 4096:
            table.append(prev + entry[:1])
            if len(table) == (1 << width) and width < 12:
                width += 1
        prev = entry
    if n_out != n_pixels:
        raise ValueError("GIF pixel data truncated")
    return out


def encode_gif(arr: np.ndarray) -> bytes:
    """(h, w, 3) uint8 with <= 256 distinct colors -> single-frame
    GIF89a bytes (global palette, non-interlaced)."""
    import struct

    h, w, c = arr.shape
    assert c == 3 and arr.dtype == np.uint8
    flat = arr.reshape(-1, 3)
    palette, indices = np.unique(flat, axis=0, return_inverse=True)
    if len(palette) > 256:
        raise ValueError("encode_gif needs <= 256 distinct colors")
    depth = max(1, int(np.ceil(np.log2(max(len(palette), 2)))))
    table = np.zeros(((1 << depth), 3), dtype=np.uint8)
    table[: len(palette)] = palette
    min_code = max(2, depth)
    lzw = _lzw_encode(indices.astype(np.int64), min_code)
    blocks = bytearray()
    for i in range(0, len(lzw), 255):
        chunk = lzw[i : i + 255]
        blocks.append(len(chunk))
        blocks.extend(chunk)
    blocks.append(0)
    return (
        b"GIF89a"
        + struct.pack("<HHBBB", w, h, 0x80 | ((depth - 1) << 4) | (depth - 1), 0, 0)
        + table.tobytes()
        + struct.pack("<BHHHHB", 0x2C, 0, 0, w, h, 0)
        + bytes([min_code])
        + bytes(blocks)
        + b"\x3b"
    )


def decode_gif(data: bytes) -> np.ndarray:
    """GIF87a/89a bytes -> (h, w, 3) uint8 RGB of the FIRST image
    frame (global or local palette, non-interlaced; extensions are
    skipped). From-scratch LZW with variable code widths and clear
    codes."""
    import struct

    if data[:6] not in (b"GIF87a", b"GIF89a"):
        raise ValueError("not a GIF stream")
    sw, sh, flags, _bg, _ar = struct.unpack_from("<HHBBB", data, 6)
    pos = 13
    gct = None
    if flags & 0x80:
        n = 2 << (flags & 0x07)
        gct = np.frombuffer(data, dtype=np.uint8, count=n * 3, offset=pos
                            ).reshape(n, 3)
        pos += n * 3
    while pos < len(data):
        b0 = data[pos]
        if b0 == 0x21:  # extension: label + sub-blocks
            pos += 2
            while data[pos] != 0:
                pos += 1 + data[pos]
            pos += 1
        elif b0 == 0x2C:  # image descriptor
            _, _, w, h, iflags = struct.unpack_from("<HHHHB", data, pos + 1)
            pos += 10
            pal = gct
            if iflags & 0x80:
                n = 2 << (iflags & 0x07)
                pal = np.frombuffer(data, dtype=np.uint8, count=n * 3,
                                    offset=pos).reshape(n, 3)
                pos += n * 3
            if iflags & 0x40:
                raise NotImplementedError("interlaced GIF not supported")
            if pal is None:
                raise ValueError("GIF frame has no palette")
            min_code = data[pos]
            pos += 1
            lzw = bytearray()
            while data[pos] != 0:
                ln = data[pos]
                lzw.extend(data[pos + 1 : pos + 1 + ln])
                pos += 1 + ln
            idx = _lzw_decode(bytes(lzw), min_code, w * h)
            return pal[idx].reshape(h, w, 3).copy()
        elif b0 == 0x3B:
            break
        else:
            raise ValueError(f"unexpected GIF block 0x{b0:02x}")
    raise ValueError("GIF contains no image frame")


def decode_image(data: bytes) -> np.ndarray:
    """Decode an image blob. BMP, PNG and GIF decode natively (pure
    NumPy + stdlib zlib); other formats need PIL, absent from this
    container."""
    if data[:2] == b"BM":
        return decode_bmp(data)
    if data[:8] == _PNG_SIG:
        return decode_png(data)
    if data[:6] in (b"GIF87a", b"GIF89a"):
        return decode_gif(data)
    if data[:2] == b"\xff\xd8":
        from pisa_spark.functions.jpeg import decode_jpeg

        return decode_jpeg(data)
    if not _HAS_PIL:
        raise NotImplementedError(
            "WebP/other image decode requires PIL; container ships"
            " without media libs"
        )
    raise NotImplementedError("wire PIL.Image.open here when available")


# ---------------------------------------------------------------------------
# real container: Motion-JPEG AVI — frames are JPEG blobs in RIFF
# chunks, so the native JPEG codec makes video frame-sampling real
# ---------------------------------------------------------------------------


def encode_mjpeg_avi(
    frames: list[np.ndarray], fps: int = 25, quality: int = 90
) -> bytes:
    """List of (h, w, 3) uint8 frames -> minimal MJPG AVI bytes
    (RIFF 'AVI ' / hdrl / movi with '00dc' JPEG chunks)."""
    import struct

    from pisa_spark.functions.jpeg import encode_jpeg

    assert frames
    h, w, _ = frames[0].shape
    blobs = [encode_jpeg(f, quality=quality) for f in frames]

    def chunk(cid: bytes, body: bytes) -> bytes:
        pad = b"\x00" if len(body) % 2 else b""
        return cid + struct.pack("<I", len(body)) + body + pad

    def lst(ltype: bytes, body: bytes) -> bytes:
        return chunk(b"LIST", ltype + body)

    avih = struct.pack(
        "<14I", 1000000 // fps, 0, 0, 0x10, len(blobs), 0, 1, 0, w, h,
        0, 0, 0, 0,
    )
    strh = struct.pack(
        "<4s4sIHHIIIIIIIIhhhh",
        b"vids", b"MJPG", 0, 0, 0, 0, 1, fps, 0, len(blobs),
        max(len(b) for b in blobs), 0xFFFFFFFF, 0, 0, 0, w, h,
    )
    strf = struct.pack(
        "<IiiHH4sIiiII", 40, w, h, 1, 24, b"MJPG", w * h * 3, 0, 0, 0, 0
    )
    hdrl = lst(
        b"hdrl",
        chunk(b"avih", avih)
        + lst(b"strl", chunk(b"strh", strh) + chunk(b"strf", strf)),
    )
    movi = lst(b"movi", b"".join(chunk(b"00dc", b) for b in blobs))
    return chunk(b"RIFF", b"AVI " + hdrl + movi)


def sample_video_frames(
    data: bytes, every_n: int = 30
) -> list[np.ndarray]:
    """Sample every ``every_n``-th frame of a video blob as decoded
    (h, w, 3) uint8 arrays. Motion-JPEG AVI decodes natively (RIFF
    walk + the pure-NumPy JPEG decoder); other containers
    (H.264/VP9/...) genuinely need av/ffmpeg and raise."""
    import struct

    if data[:4] != b"RIFF" or data[8:12] != b"AVI ":
        raise NotImplementedError(
            "only MJPG AVI decodes natively; other containers need"
            " PyAV/ffmpeg, absent from this container"
        )
    from pisa_spark.functions.jpeg import decode_jpeg

    frames: list[np.ndarray] = []
    idx = 0

    def walk(pos: int, end: int) -> None:
        nonlocal idx
        while pos + 8 <= end:
            cid, size = struct.unpack_from("<4sI", data, pos)
            body_at = pos + 8
            if cid == b"LIST":
                walk(body_at + 4, body_at + size)
            elif cid in (b"00dc", b"00db"):
                if idx % every_n == 0:
                    frames.append(decode_jpeg(data[body_at : body_at + size]))
                idx += 1
            pos = body_at + size + (size & 1)

    walk(12, len(data))
    if idx == 0:
        raise ValueError("AVI contains no video frames")
    return frames


MEDIA_FIXTURE_SCHEMA = "doc_id long, media_type string, media binary"
DECODE_STATS_SCHEMA = (
    "doc_id long, media_type string, dim_a int, dim_b int, payload_sum long"
)


def media_fixture_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic REAL media blobs from (doc_id, text): even doc_ids
    encode an image (w = 4 + doc_id % 5, h = 3 + doc_id % 7, pixels =
    the doc's UTF-8 bytes cycled to w*h*3 — as PNG when doc_id % 4 ==
    0, GIF when doc_id % 8 == 2, else 24-bit BMP; identical pixels
    in every container, so the decoded stats are container-
    independent), odd doc_ids a PCM16 mono WAV
    (one sample per text byte, (byte - 128) * 256, rate = 8000 +
    (doc_id % 4) * 4000). Every parameter is a closed form of
    (doc_id, text), so the DuckDB gate twin recomputes the expected
    decoded stats from the text column alone — the decode gate checks
    real byte-level encode->decode round trips through BOTH image
    codecs.

    Per-blob Python here is fixture GENERATION, not a serving path;
    the pixel fill itself is a vectorized np.resize cycle."""
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").select(
        "doc_id", "text"
    )

    def _gen(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            out_id, out_type, out_blob = [], [], []
            for doc_id, text in zip(pdf["doc_id"], pdf["text"]):
                raw = np.frombuffer(text.encode("utf-8"), dtype=np.uint8)
                if int(doc_id) % 2 == 0:
                    w = 4 + int(doc_id) % 5
                    h = 3 + int(doc_id) % 7
                    arr = np.resize(raw, (h, w, 3))
                    if int(doc_id) % 4 == 0:
                        blob = encode_png(arr)
                    elif int(doc_id) % 8 == 2:
                        blob = encode_gif(arr)  # <= 72 px, palette-safe
                    else:
                        blob = encode_bmp(arr)
                    out_blob.append(blob)
                    out_type.append("image")
                else:
                    samples = ((raw.astype(np.int32) - 128) * 256).astype(
                        np.int16
                    )
                    rate = 8000 + (int(doc_id) % 4) * 4000
                    out_blob.append(encode_wav(samples, rate))
                    out_type.append("audio")
                out_id.append(int(doc_id))
            yield pd.DataFrame(
                {"doc_id": out_id, "media_type": out_type, "media": out_blob}
            )

    return docs.mapInPandas(_gen, schema=MEDIA_FIXTURE_SCHEMA)


def media_decode_stats(media: DataFrame) -> DataFrame:
    """Decode real media blobs -> verifiable per-blob stats:
    images (dim_a, dim_b, payload_sum) = (width, height, sum of
    decoded RGB bytes); audio = (n_samples, sample_rate, sum of
    decoded samples). Arrow-batched mapInPandas; per-blob work is a
    frombuffer view + one vectorized sum. This is the real-decoder
    gate surface (VERDICT r3 #7) — its DuckDB twin recomputes every
    value in closed form from the source text."""

    def _stats(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in pdf_iter:
            if pdf.empty:
                continue
            da, db, ps = [], [], []
            for mt, blob in zip(pdf["media_type"], pdf["media"]):
                if mt == "image":
                    arr = decode_image(bytes(blob))
                    da.append(arr.shape[1])
                    db.append(arr.shape[0])
                    ps.append(int(arr.astype(np.int64).sum()))
                else:
                    rate, samples = decode_wav(bytes(blob))
                    da.append(int(samples.size))
                    db.append(int(rate))
                    ps.append(int(samples.astype(np.int64).sum()))
            yield pd.DataFrame(
                {
                    "doc_id": pdf["doc_id"],
                    "media_type": pdf["media_type"],
                    "dim_a": np.asarray(da, dtype=np.int32),
                    "dim_b": np.asarray(db, dtype=np.int32),
                    "payload_sum": np.asarray(ps, dtype=np.int64),
                }
            )

    return media.mapInPandas(_stats, schema=DECODE_STATS_SCHEMA)


def _byte_features(pdf_iter: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """mapInPandas kernel: byte-level features vectorized ACROSS the
    whole Arrow batch, not per blob — blobs are concatenated once and
    every statistic is a segment-indexed bincount (one C-level pass per
    feature, no Python loop over rows). The decode seam is the
    segmented concat view — a real decoder drops in here."""
    for pdf in pdf_iter:
        if pdf.empty:
            continue
        blobs = pdf["media"].tolist()
        n = len(blobs)
        lens = np.fromiter((len(b) for b in blobs), dtype=np.int64, count=n)
        concat = np.frombuffer(b"".join(blobs), dtype=np.uint8)
        seg = np.repeat(np.arange(n, dtype=np.int64), lens)
        starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        pos = np.arange(concat.size, dtype=np.int64) - np.repeat(starts, lens)
        # 16-bucket nibble histogram per blob: one flat bincount over
        # seg*16 + bucket, reshaped (n, 16)
        hist = np.bincount(
            seg * 16 + (concat >> 4).astype(np.int64), minlength=n * 16
        ).reshape(n, 16)
        p = hist / np.maximum(lens, 1)[:, None]
        logs = np.zeros_like(p)
        np.log2(p, out=logs, where=p > 0)
        ent = -(p * logs).sum(axis=1) + 0.0  # +0.0 normalizes -0.0
        head_mask = pos < 8
        hh = np.bincount(
            seg[head_mask], weights=concat[head_mask].astype(np.float64),
            minlength=n,
        ).astype(np.int64)
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"],
                "media_type": pdf["media_type"],
                "n_bytes": pdf["n_bytes"],
                "byte_entropy": ent,
                "head_hash": hh,
                "histogram16": list(hist.astype(np.int32)),
            }
        )


def extract_media_features(media: DataFrame) -> DataFrame:
    """media table -> per-blob byte features via Arrow-batched kernel."""
    return media.mapInPandas(_byte_features, schema=FEATURE_SCHEMA)
