"""PNG codec (functions/multimodal.py): round trips, all five
scanline filters against a spec-forward-filtering witness, CRC and
unsupported-form guards, dispatch + resize integration."""

import struct
import zlib

import numpy as np
import pytest

from pisa_spark.functions.multimodal import (
    _PNG_SIG,
    _png_chunk,
    decode_image,
    decode_png,
    encode_png,
    resize_image,
)


def _rand(h, w, c, seed):
    return np.random.default_rng(seed).integers(
        0, 256, size=(h, w, c), dtype=np.uint8
    )


@pytest.mark.parametrize("c", [3, 4])
def test_png_roundtrip(c):
    arr = _rand(11, 7, c, seed=c)
    out = decode_png(encode_png(arr))
    assert out.shape == arr.shape and out.dtype == np.uint8
    assert np.array_equal(out, arr)


def _forward_filter(arr, filters):
    """Spec-forward filtering witness: original rows -> filtered
    scanlines with the given per-row filter types."""
    h, w, c = arr.shape
    stride = w * c
    flat = arr.reshape(h, stride).astype(np.int32)
    out = bytearray()
    for y, f in enumerate(filters):
        row = flat[y]
        prev = flat[y - 1] if y > 0 else np.zeros(stride, dtype=np.int32)
        filt = np.empty(stride, dtype=np.int32)
        for x in range(stride):
            a = row[x - c] if x >= c else 0
            b = prev[x]
            cc = prev[x - c] if x >= c else 0
            if f == 0:
                pred = 0
            elif f == 1:
                pred = a
            elif f == 2:
                pred = b
            elif f == 3:
                pred = (a + b) >> 1
            else:
                p = a + b - cc
                pa, pb, pc = abs(p - a), abs(p - b), abs(p - cc)
                pred = a if (pa <= pb and pa <= pc) else (b if pb <= pc else cc)
            filt[x] = (row[x] - pred) % 256
        out.append(f)
        out.extend(filt.astype(np.uint8).tobytes())
    return bytes(out)


def test_png_all_filters_decode():
    arr = _rand(10, 6, 3, seed=42)
    filters = [0, 1, 2, 3, 4, 4, 3, 2, 1, 0]
    ihdr = struct.pack(">IIBBBBB", 6, 10, 8, 2, 0, 0, 0)
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(_forward_filter(arr, filters)))
        + _png_chunk(b"IEND", b"")
    )
    assert np.array_equal(decode_png(data), arr)


def test_png_crc_and_unsupported_guards():
    arr = _rand(4, 4, 3, seed=1)
    good = bytearray(encode_png(arr))
    good[-20] ^= 0xFF  # corrupt inside the IDAT body
    with pytest.raises(ValueError, match="CRC"):
        decode_png(bytes(good))
    # grayscale (color type 0) refuses cleanly
    ihdr = struct.pack(">IIBBBBB", 2, 2, 8, 0, 0, 0, 0)
    raw = bytes([0, 1, 2, 0, 3, 4])
    data = (
        _PNG_SIG
        + _png_chunk(b"IHDR", ihdr)
        + _png_chunk(b"IDAT", zlib.compress(raw))
        + _png_chunk(b"IEND", b"")
    )
    with pytest.raises(NotImplementedError):
        decode_png(data)
    with pytest.raises(ValueError, match="not a PNG"):
        decode_png(b"nope")


def test_decode_image_dispatch_and_resize():
    arr = _rand(9, 5, 3, seed=7)
    png = encode_png(arr)
    assert np.array_equal(decode_image(png), arr)
    small = resize_image(png, 3, 4)
    assert small.shape == (4, 3, 3)
    # nearest-neighbor: every output pixel exists in the source
    src = {tuple(p) for p in arr.reshape(-1, 3)}
    assert all(tuple(p) in src for p in small.reshape(-1, 3))
