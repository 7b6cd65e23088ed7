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
