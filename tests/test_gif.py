"""GIF codec (functions/multimodal.py): bit-exact round trips (LZW is
lossless), dict-reset stress, extension skipping, guards."""

import numpy as np
import pytest

from pisa_spark.functions.multimodal import (
    _lzw_decode,
    _lzw_encode,
    decode_gif,
    decode_image,
    encode_gif,
    resize_image,
)


def _img(h, w, n_colors, seed):
    rng = np.random.default_rng(seed)
    pal = rng.integers(0, 256, size=(n_colors, 3), dtype=np.uint8)
    idx = rng.integers(0, n_colors, size=(h, w))
    return pal[idx]


@pytest.mark.parametrize("n_colors", [2, 5, 17, 250])
def test_gif_roundtrip(n_colors):
    arr = _img(13, 9, n_colors, seed=n_colors)
    out = decode_gif(encode_gif(arr))
    assert np.array_equal(out, arr)


def test_gif_large_image_dict_reset():
    # enough pixels that the LZW dict fills past 4095 and resets
    arr = _img(120, 120, 200, seed=3)
    assert np.array_equal(decode_gif(encode_gif(arr)), arr)


def test_lzw_stream_roundtrip_widths():
    rng = np.random.default_rng(7)
    for min_code in (2, 4, 8):
        syms = rng.integers(0, 1 << min_code, size=5000).astype(np.int64)
        enc = _lzw_encode(syms, min_code)
        dec = _lzw_decode(enc, min_code, syms.size)
        assert np.array_equal(dec, syms.astype(np.uint8))


def test_gif_extension_blocks_skipped():
    arr = _img(4, 6, 4, seed=1)
    data = bytearray(encode_gif(arr))
    # splice a graphic-control extension between LSD+GCT and the image
    img_at = data.index(0x2C, 13)
    ext = bytes([0x21, 0xF9, 0x04, 0x00, 0x00, 0x00, 0x00, 0x00])
    spliced = bytes(data[:img_at]) + ext + bytes(data[img_at:])
    assert np.array_equal(decode_gif(spliced), arr)


def test_gif_guards_and_dispatch():
    with pytest.raises(ValueError, match="not a GIF"):
        decode_gif(b"JIF89a")
    with pytest.raises(ValueError):
        rng = np.random.default_rng(0)
        encode_gif(rng.integers(0, 256, size=(40, 40, 3), dtype=np.uint8))
    arr = _img(8, 5, 9, seed=9)
    gif = encode_gif(arr)
    assert np.array_equal(decode_image(gif), arr)
    assert resize_image(gif, 2, 3).shape == (3, 2, 3)


def test_mjpeg_avi_frame_sampling():
    from pisa_spark.functions.multimodal import (
        encode_mjpeg_avi,
        sample_video_frames,
    )

    frames = [
        np.full((16, 16, 3), 30 * i + 20, dtype=np.uint8) for i in range(7)
    ]
    avi = encode_mjpeg_avi(frames, fps=10, quality=95)
    got = sample_video_frames(avi, every_n=3)  # frames 0, 3, 6
    assert len(got) == 3
    for arr, i in zip(got, (0, 3, 6)):
        assert arr.shape == (16, 16, 3)
        assert abs(int(arr.mean()) - (30 * i + 20)) <= 2
    every = sample_video_frames(avi, every_n=1)
    assert len(every) == 7


def test_gif_overrun_raises_cleanly():
    # an LZW stream whose decoded length crosses the pixel budget
    # MID-ENTRY must raise the module's own error, not a numpy
    # broadcast failure
    syms = np.array([0, 1] * 40, dtype=np.int64)
    enc = _lzw_encode(syms, 2)
    hit = 0
    for n in range(1, syms.size):
        try:
            out = _lzw_decode(enc, 2, n)
            assert np.array_equal(out, syms[:n].astype(np.uint8))
        except ValueError as ex:
            assert "overruns" in str(ex)
            hit += 1
    assert hit > 0  # at least one cut lands mid-entry
