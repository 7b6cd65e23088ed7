"""Baseline JPEG codec (functions/jpeg.py): DCT pinned to the
defining formula, Huffman bit-level round trip, zigzag order, lossy
encode->decode error envelopes, marker guards."""

import numpy as np
import pytest

from pisa_spark.functions.jpeg import (
    AC_LUMA,
    DC_LUMA,
    UNZIGZAG,
    ZIGZAG,
    _BitReader,
    _BitWriter,
    _decode_symbol,
    build_codes,
    build_decode_table,
    dct2,
    decode_jpeg,
    encode_jpeg,
    idct2,
    quality_tables,
)


def test_dct_matches_defining_formula_and_inverts():
    rng = np.random.default_rng(0)
    block = rng.uniform(-128, 127, size=(8, 8))
    want = np.zeros((8, 8))
    for u in range(8):
        for v in range(8):
            cu = 1 / np.sqrt(2) if u == 0 else 1.0
            cv = 1 / np.sqrt(2) if v == 0 else 1.0
            s = 0.0
            for x in range(8):
                for y in range(8):
                    s += (
                        block[x, y]
                        * np.cos((2 * x + 1) * u * np.pi / 16)
                        * np.cos((2 * y + 1) * v * np.pi / 16)
                    )
            want[u, v] = cu * cv / 4 * s
    got = dct2(block)
    assert np.allclose(got, want, atol=1e-9)
    assert np.allclose(idct2(got), block, atol=1e-9)


def test_zigzag_is_involution_and_spec_prefix():
    assert np.array_equal(np.arange(64)[ZIGZAG][UNZIGZAG], np.arange(64))
    # spec order starts 0, 1, 8, 16, 9, 2
    assert list(ZIGZAG[:6]) == [0, 1, 8, 16, 9, 2]


def test_huffman_bit_roundtrip():
    codes = build_codes(*AC_LUMA)
    table = build_decode_table(*AC_LUMA)
    # prefix-free: no code is a prefix of another
    as_bits = {
        format(c, f"0{ln}b") for c, ln in codes.values()
    }
    for a in as_bits:
        for b in as_bits:
            assert a == b or not b.startswith(a)
    rng = np.random.default_rng(1)
    syms = rng.choice(list(codes), size=200)
    w = _BitWriter()
    for s in syms:
        w.write(*codes[int(s)])
    data = w.flush() + b"\xff\xd9"
    r = _BitReader(data, 0)
    got = [_decode_symbol(r, table) for _ in range(len(syms))]
    assert got == [int(s) for s in syms]


def test_quality_tables_monotone():
    q50l, _ = quality_tables(50)
    q90l, _ = quality_tables(90)
    q10l, _ = quality_tables(10)
    assert (q90l <= q50l).all() and (q50l <= q10l).all()
    assert q90l.min() >= 1


def _mae(a, b):
    return float(np.abs(a.astype(np.int32) - b.astype(np.int32)).mean())


def test_roundtrip_solid_color():
    arr = np.full((24, 17, 3), 130, dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=90))
    assert out.shape == arr.shape
    assert np.abs(out.astype(int) - 130).max() <= 2


def test_roundtrip_smooth_gradient():
    y, x = np.mgrid[0:40, 0:56]
    arr = np.stack(
        [(x * 4) % 256, (y * 3) % 256, ((x + y) * 2) % 256], axis=-1
    ).astype(np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=95))
    assert out.shape == arr.shape
    assert _mae(out, arr) < 3.0


def test_roundtrip_noise_bounded():
    rng = np.random.default_rng(5)
    arr = rng.integers(0, 256, size=(32, 32, 3), dtype=np.uint8)
    out = decode_jpeg(encode_jpeg(arr, quality=95))
    assert _mae(out, arr) < 12.0
    out50 = decode_jpeg(encode_jpeg(arr, quality=50))
    assert _mae(out50, arr) < 40.0


def test_quality_improves_fidelity():
    y, x = np.mgrid[0:24, 0:24]
    arr = np.stack([x * 10 % 256, y * 10 % 256, (x ^ y) * 16 % 256],
                   axis=-1).astype(np.uint8)
    errs = [
        _mae(decode_jpeg(encode_jpeg(arr, quality=q)), arr)
        for q in (20, 60, 95)
    ]
    assert errs[0] > errs[1] > errs[2]


def test_guards():
    with pytest.raises(ValueError, match="not a JPEG"):
        decode_jpeg(b"\x89PNG1234")
    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr))
    # flip SOF0 to SOF2 (progressive) -> clean refusal
    i = bytes(data).index(b"\xff\xc0")
    data[i + 1] = 0xC2
    with pytest.raises(NotImplementedError, match="non-baseline"):
        decode_jpeg(bytes(data))


def test_decode_image_dispatch():
    from pisa_spark.functions.multimodal import decode_image, resize_image

    y, x = np.mgrid[0:16, 0:16]
    arr = np.stack([x * 15 % 256] * 3, axis=-1).astype(np.uint8)
    jpg = encode_jpeg(arr, quality=95)
    out = decode_image(jpg)
    assert out.shape == arr.shape and _mae(out, arr) < 4.0
    assert resize_image(jpg, 4, 4).shape == (4, 4, 3)


def _headers(h, w, comps_hv, n_comp, dri=0):
    """Minimal marker prelude for hand-crafted streams: quality-75
    tables, Annex K Huffman, SOF0 with the given sampling factors."""
    import struct

    from pisa_spark.functions.jpeg import (
        AC_CHROMA,
        DC_CHROMA,
        ZIGZAG,
        _dht_segment,
    )

    ql, qc = quality_tables(75)
    out = bytearray(b"\xff\xd8")
    for tq, tab in ((0, ql), (1, qc)):
        out += b"\xff\xdb" + struct.pack(">H", 67) + bytes([tq]) + bytes(
            tab[ZIGZAG].astype(np.uint8)
        )
    out += b"\xff\xc0" + struct.pack(">HBHHB", 8 + 3 * n_comp, 8, h, w, n_comp)
    for i in range(n_comp):
        hv = comps_hv[i]
        out += bytes([i + 1, (hv[0] << 4) | hv[1], 0 if i == 0 else 1])
    out += _dht_segment(0, 0, DC_LUMA) + _dht_segment(1, 0, AC_LUMA)
    out += _dht_segment(0, 1, DC_CHROMA) + _dht_segment(1, 1, AC_CHROMA)
    if dri:
        out += b"\xff\xdd" + struct.pack(">HH", 4, dri)
    out += b"\xff\xda" + struct.pack(">HB", 6 + 2 * n_comp, n_comp)
    for i in range(n_comp):
        out += bytes([i + 1, 0x00 if i == 0 else 0x11])
    out += bytes([0, 63, 0])
    return out, ql, qc


def test_decode_grayscale_single_component():
    from pisa_spark.functions.jpeg import _BitWriter, _encode_component

    y, x = np.mgrid[0:16, 0:8]
    plane = ((x * 16 + y * 8) % 256).astype(np.float64)
    out, ql, _ = _headers(16, 8, [(1, 1)], 1)
    w = _BitWriter()
    pred = 0
    dc = build_codes(*DC_LUMA)
    ac = build_codes(*AC_LUMA)
    for by in range(0, 16, 8):
        pred = _encode_component(
            plane[by : by + 8, :], ql, dc, ac, w, pred
        )
    data = bytes(out) + w.flush() + b"\xff\xd9"
    got = decode_jpeg(data)
    assert got.shape == (16, 8, 3)
    assert np.array_equal(got[..., 0], got[..., 1])
    assert np.abs(got[..., 0].astype(int) - plane.astype(int)).mean() < 4.0


def test_decode_420_subsampling():
    from pisa_spark.functions.jpeg import (
        AC_CHROMA,
        DC_CHROMA,
        _BitWriter,
        _encode_component,
    )

    h = w = 16  # one 4:2:0 MCU
    yp = np.fromfunction(lambda r, c: (r * 7 + c * 5) % 256, (16, 16))
    cbp = np.full((8, 8), 100.0)
    crp = np.full((8, 8), 140.0)
    out, ql, qc = _headers(h, w, [(2, 2), (1, 1), (1, 1)], 3)
    wtr = _BitWriter()
    dc_l, ac_l = build_codes(*DC_LUMA), build_codes(*AC_LUMA)
    dc_c, ac_c = build_codes(*DC_CHROMA), build_codes(*AC_CHROMA)
    pred = 0
    for v in range(2):  # 4 luma blocks, raster order within MCU
        for hh in range(2):
            pred = _encode_component(
                yp[v * 8 : v * 8 + 8, hh * 8 : hh * 8 + 8],
                ql, dc_l, ac_l, wtr, pred,
            )
    _encode_component(cbp, qc, dc_c, ac_c, wtr, 0)
    _encode_component(crp, qc, dc_c, ac_c, wtr, 0)
    data = bytes(out) + wtr.flush() + b"\xff\xd9"
    got = decode_jpeg(data)
    assert got.shape == (16, 16, 3)
    # reconstruct expected RGB from the known planes
    from pisa_spark.functions.jpeg import _ycbcr_to_rgb

    want = _ycbcr_to_rgb(
        yp, np.repeat(np.repeat(cbp, 2, 0), 2, 1),
        np.repeat(np.repeat(crp, 2, 0), 2, 1),
    )
    assert np.abs(got.astype(int) - want.astype(int)).mean() < 5.0


def test_decode_restart_markers():
    from pisa_spark.functions.jpeg import _BitWriter, _encode_component

    plane0 = np.full((8, 8), 50.0)
    plane1 = np.full((8, 8), 200.0)
    out, ql, _ = _headers(8, 16, [(1, 1)], 1, dri=1)
    dc, ac = build_codes(*DC_LUMA), build_codes(*AC_LUMA)
    w0 = _BitWriter()
    _encode_component(plane0, ql, dc, ac, w0, 0)
    w1 = _BitWriter()
    _encode_component(plane1, ql, dc, ac, w1, 0)  # predictor RESET
    data = bytes(out) + w0.flush() + b"\xff\xd0" + w1.flush() + b"\xff\xd9"
    got = decode_jpeg(data)
    assert got.shape == (8, 16, 3)
    assert abs(int(got[:, :8, 0].mean()) - 50) <= 2
    assert abs(int(got[:, 8:, 0].mean()) - 200) <= 2


def test_fill_bytes_before_marker_tolerated():
    arr = np.full((8, 8, 3), 90, dtype=np.uint8)
    data = bytes(encode_jpeg(arr, quality=90))
    i = data.index(b"\xff\xc0")
    padded = data[:i] + b"\xff\xff\xff" + data[i:]  # T.81 B.1.1.2 fill
    out = decode_jpeg(padded)
    assert np.abs(out.astype(int) - 90).max() <= 2


def test_multiscan_refuses_cleanly():
    import struct

    arr = np.zeros((8, 8, 3), dtype=np.uint8)
    data = bytearray(encode_jpeg(arr))
    i = bytes(data).index(b"\xff\xda")
    # rewrite SOS to a single-component scan (ns=1)
    new_sos = b"\xff\xda" + struct.pack(">HB", 8, 1) + bytes([1, 0x00, 0, 63, 0])
    data[i : i + 14] = new_sos
    with pytest.raises(NotImplementedError, match="multi-scan"):
        decode_jpeg(bytes(data))
