"""Vectorized delta + varint (LEB128) posting-block codec.

StreamVByte/SIMD-BP128-style goals (branch-light, batch-oriented) done
the NumPy way: encode/decode loop over *byte positions* (<=5 for 32-bit
deltas, <=10 worst case), each iteration a whole-array vector op — never
per-integer Python (forbidden by the input_hint "no per-row Python").

Semantics mirrored from classic inverted-index layouts (doc-id deltas +
per-posting payloads); the reference's analog is its cache-as-compression
of the adjacency matrix (/root/reference/src/models/Dataloader.py:127-153)
— here it is a first-class columnar codec.

Wire format
-----------
``varint_encode``: standard LEB128, little-endian 7-bit groups, high bit
= continuation. ``delta_encode``: strictly-increasing doc_ids ->
[first, diffs...] with diffs >= 1 encoded as diff-1 (saves a byte at
density 1). All functions are pure NumPy, usable inside pandas UDFs.
"""

from __future__ import annotations

import numpy as np

_MAX_VARINT_BYTES = 10  # enough for uint64


def varint_encode(values: np.ndarray) -> bytes:
    """LEB128-encode a uint64 array. Vectorized over the array; the only
    Python loop is over byte positions (<=10 iterations total)."""
    v = np.asarray(values, dtype=np.uint64)
    if v.size == 0:
        return b""
    # bytes needed per value: ceil(bitlen/7), min 1
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    # bit length via shifting loop over 10 positions max
    for shift in range(0, 64, 7):
        nbits = np.where(tmp > 0, (shift // 7) + 1, nbits)
        tmp >>= np.uint64(7)
    nbytes = np.maximum(nbits, 1)
    total = int(nbytes.sum())
    out = np.zeros(total, dtype=np.uint8)
    # output offset of each value's first byte
    starts = np.concatenate(([0], np.cumsum(nbytes)[:-1]))
    for k in range(int(nbytes.max())):
        mask = nbytes > k
        if not mask.any():
            break
        chunk = ((v[mask] >> np.uint64(7 * k)) & np.uint64(0x7F)).astype(np.uint8)
        cont = (nbytes[mask] > k + 1).astype(np.uint8) << 7
        out[starts[mask] + k] = chunk | cont
    return out.tobytes()


def varint_decode(data: bytes) -> np.ndarray:
    """Decode LEB128 bytes -> uint64 array. Vectorized: terminator bytes
    (high bit clear) found in one pass; value assembly loops over byte
    positions only."""
    raw = np.frombuffer(data, dtype=np.uint8)
    if raw.size == 0:
        return np.empty(0, dtype=np.uint64)
    is_end = (raw & 0x80) == 0
    ends = np.flatnonzero(is_end)
    starts = np.concatenate(([0], ends[:-1] + 1))
    lengths = ends - starts + 1
    n = ends.size
    values = np.zeros(n, dtype=np.uint64)
    for k in range(int(lengths.max())):
        mask = lengths > k
        chunk = (raw[starts[mask] + k] & 0x7F).astype(np.uint64)
        values[mask] |= chunk << np.uint64(7 * k)
    return values


def delta_encode_docids(doc_ids: np.ndarray) -> bytes:
    """Strictly-increasing int64 doc_ids -> varint bytes.

    Layout: [doc_ids[0], doc_ids[i]-doc_ids[i-1]-1 ...]. The -1 exploits
    strict monotonicity (diff >= 1) so dense runs encode as zeros.
    """
    d = np.asarray(doc_ids, dtype=np.int64)
    if d.size == 0:
        return b""
    deltas = np.empty(d.size, dtype=np.uint64)
    deltas[0] = np.uint64(d[0])
    if d.size > 1:
        diffs = np.diff(d)
        if (diffs <= 0).any():
            raise ValueError("doc_ids must be strictly increasing")
        deltas[1:] = (diffs - 1).astype(np.uint64)
    return varint_encode(deltas)


def delta_decode_docids(data: bytes) -> np.ndarray:
    """Inverse of :func:`delta_encode_docids` -> int64 doc_ids."""
    deltas = varint_decode(data).astype(np.int64)
    if deltas.size == 0:
        return np.empty(0, dtype=np.int64)
    deltas[1:] += 1
    return np.cumsum(deltas)


def bitpack_encode(values: np.ndarray) -> bytes:
    """SIMD-BP128-style binary packing: the whole block packs at ONE bit
    width b = max bitlength (header byte), values laid LSB-first into a
    contiguous little-endian bit stream. Fully vectorized: bit matrix ->
    np.packbits; no per-integer Python.

    Wire format: [width:1B][count:4B LE][packed bits]. Compared to
    varint this wins on dense uniform blocks (posting deltas inside one
    doc-range bucket) and supports O(1) random access at a fixed width;
    varint wins on skewed magnitude mixes. The index's wire format
    stays varint (blocks concatenate losslessly there — see
    _decode_blocks_vectorized); this codec is the drop-in alternative
    for fixed-width payload experiments.
    """
    v = np.asarray(values, dtype=np.uint64)
    n = v.size
    if n == 0:
        return b""
    width = int(v.max()).bit_length()
    header = bytes([width]) + int(n).to_bytes(4, "little")
    if width == 0:
        return header
    bits = ((v[:, None] >> np.arange(width, dtype=np.uint64)) & np.uint64(1)).astype(
        np.uint8
    )
    return header + np.packbits(bits.ravel(), bitorder="little").tobytes()


def bitpack_decode(data: bytes) -> np.ndarray:
    """Inverse of :func:`bitpack_encode` -> uint64 array."""
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    width = data[0]
    n = int.from_bytes(data[1:5], "little")
    if width == 0:
        return np.zeros(n, dtype=np.uint64)
    raw = np.frombuffer(data, dtype=np.uint8, offset=5)
    bits = np.unpackbits(raw, bitorder="little", count=n * width).reshape(n, width)
    weights = (np.uint64(1) << np.arange(width, dtype=np.uint64))
    return (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)


def ef_encode(values: np.ndarray, upper: int | None = None) -> bytes:
    """Elias-Fano encode a non-decreasing uint64 sequence — the
    quasi-succinct posting representation (Vigna 2013, "Quasi-succinct
    indices"): each value splits into l = floor(log2(u/n)) low bits
    (packed verbatim) and a high part coded in unary as a bit vector,
    giving n*(2 + log2(u/n)) bits — within half a bit per element of the
    information-theoretic optimum — with O(1) random access to the i-th
    value (select(i) on the high bits, no prefix decode).

    Fully vectorized (bit-matrix -> np.packbits; one scatter for the
    high bits); no per-integer Python.

    Wire: [n:4B LE][u:8B LE][l:1B][high-bits packbits][low-bits
    packbits] — high-bit length is (u >> l) + n bits, derivable from the
    header, so no length field is needed.

    Engine placement note: the serving wire format stays delta+varint
    because the WAND/MaxScore kernels decode a term's WHOLE kept block
    set with one concatenated varint pass (block byte-strings
    concatenate losslessly — see query/bm25._decode_blocks_vectorized),
    a property EF's per-sequence headers give up. EF is the
    O(1)-random-access / skip-heavy alternative; tests/test_codec.py
    records the measured size tradeoff on real posting blocks.
    """
    v = np.asarray(values, dtype=np.uint64)
    n = int(v.size)
    if n == 0:
        return b""
    if n > 1 and (np.diff(v.astype(np.int64)) < 0).any():
        raise ValueError("ef_encode requires a non-decreasing sequence")
    u = int(v[-1]) + 1 if upper is None else int(upper)
    if u <= int(v[-1]):
        raise ValueError("upper bound must exceed the last value")
    ratio = u // n
    l = ratio.bit_length() - 1 if ratio >= 1 else 0
    header = (
        int(n).to_bytes(4, "little") + int(u).to_bytes(8, "little") + bytes([l])
    )
    high = (v >> np.uint64(l)).astype(np.int64)
    n_high_bits = (u >> l) + n
    hb = np.zeros(n_high_bits, dtype=np.uint8)
    hb[high + np.arange(n, dtype=np.int64)] = 1
    out = header + np.packbits(hb, bitorder="little").tobytes()
    if l > 0:
        bits = (
            (v[:, None] >> np.arange(l, dtype=np.uint64)) & np.uint64(1)
        ).astype(np.uint8)
        out += np.packbits(bits.ravel(), bitorder="little").tobytes()
    return out


def ef_decode(data: bytes) -> np.ndarray:
    """Inverse of :func:`ef_encode` -> uint64 array."""
    if len(data) == 0:
        return np.empty(0, dtype=np.uint64)
    n = int.from_bytes(data[0:4], "little")
    u = int.from_bytes(data[4:12], "little")
    l = data[12]
    n_high_bits = (u >> l) + n
    n_high_bytes = (n_high_bits + 7) // 8
    raw_h = np.frombuffer(data, dtype=np.uint8, offset=13, count=n_high_bytes)
    hb = np.unpackbits(raw_h, bitorder="little", count=n_high_bits)
    ones = np.flatnonzero(hb)
    high = (ones - np.arange(n, dtype=np.int64)).astype(np.uint64)
    if l == 0:
        return high
    raw_l = np.frombuffer(data, dtype=np.uint8, offset=13 + n_high_bytes)
    bits = np.unpackbits(raw_l, bitorder="little", count=n * l).reshape(n, l)
    weights = np.uint64(1) << np.arange(l, dtype=np.uint64)
    low = (bits.astype(np.uint64) * weights).sum(axis=1, dtype=np.uint64)
    return (high << np.uint64(l)) | low


def ef_select(data: bytes, i: int) -> int:
    """The i-th (0-based) encoded value WITHOUT decoding the sequence —
    Elias-Fano's signature O(1)-ish access (here: one packed-bit scan
    for the (i+1)-th set high bit + one l-bit low read), the primitive
    a skip-heavy traversal uses to jump into a posting list."""
    n = int.from_bytes(data[0:4], "little")
    if not 0 <= i < n:
        raise IndexError(i)
    u = int.from_bytes(data[4:12], "little")
    l = data[12]
    n_high_bits = (u >> l) + n
    n_high_bytes = (n_high_bits + 7) // 8
    raw_h = np.frombuffer(data, dtype=np.uint8, offset=13, count=n_high_bytes)
    hb = np.unpackbits(raw_h, bitorder="little", count=n_high_bits)
    pos = int(np.flatnonzero(hb)[i])
    high = pos - i
    if l == 0:
        return high
    raw_l = np.frombuffer(data, dtype=np.uint8, offset=13 + n_high_bytes)
    bits = np.unpackbits(raw_l, bitorder="little", count=n * l)
    low_bits = bits[i * l : (i + 1) * l]
    low = int((low_bits.astype(np.uint64) << np.arange(l, dtype=np.uint64)).sum())
    return (high << l) | low


def encode_payload(values: np.ndarray, minus_one: bool = False) -> bytes:
    """Varint-encode a parallel payload column (tf or doc_len).

    minus_one: store v-1 (valid when v >= 1 always, e.g. term frequency).
    """
    v = np.asarray(values, dtype=np.int64)
    if minus_one:
        v = v - 1
    if (v < 0).any():
        raise ValueError("payload values must be non-negative after bias")
    return varint_encode(v.astype(np.uint64))


def decode_payload(data: bytes, minus_one: bool = False) -> np.ndarray:
    v = varint_decode(data).astype(np.int64)
    if minus_one:
        v = v + 1
    return v
