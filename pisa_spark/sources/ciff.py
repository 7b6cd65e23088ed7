"""CIFF (Common Index File Format) export / import.

CIFF is the index-interchange format of the open-source IR ecosystem
(the public ``osirrc/ciff`` spec): real PISA ingests CIFF via
``ciff2pisa``, Anserini/Lucene exports it, so emitting and consuming
CIFF is what lets a user of the reference engine carry an index across
engines. A CIFF file is a sequence of **length-delimited protobuf
messages**: one ``Header``, then ``num_postings_lists`` ×
``PostingsList`` in term order, then ``num_docs`` × ``DocRecord`` in
docid order. Doc ids inside a posting list are **gap-encoded** (first
absolute, the rest differences from the previous docid).

Public proto schema (osirrc/ciff ``CommonIndexFileFormat.proto``)::

    Header       { int32 version=1; int32 num_postings_lists=2;
                   int32 num_docs=3; int32 total_postings_lists=4;
                   int32 total_docs=5; int64 total_terms_in_collection=6;
                   double average_doclength=7; string description=8; }
    Posting      { int32 docid=1; int32 tf=2; }          // docid = gap
    PostingsList { string term=1; int64 df=2; int64 cf=3;
                   repeated Posting postings=4; }
    DocRecord    { int32 docid=1; string collection_docid=2;
                   int32 doclength=3; }

No protobuf dependency is needed: protobuf varints ARE LEB128, which
``pisa_spark.index.codec`` already implements vectorized, so the wire
format is hand-rolled here with pure NumPy batch ops (no per-row
Python on any hot path). Wire facts used (public protobuf encoding
spec): ``tag = (field_number << 3) | wire_type``; wire types varint=0,
64-bit=1 (double), length-delimited=2 (string / embedded message).
Export always emits every field explicitly (wire-valid; decoders treat
an explicit zero identically to an omitted one); import also accepts
the canonical omitted-default form real exporters produce — the only
place that form can differ on real postings is a first posting with
``docid == 0`` (gaps and tfs are otherwise >= 1), which the parser
handles as a documented edge before the vectorized stride decode.

Scale shape
-----------
CIFF requires one contiguous posting list per term, so per-term
assembly is inherent to the format: ``ciff_postings_parts`` groups by
term with ``applyInPandas`` (a head term's full list is the format's
own memory floor, not this module's choice — the doc-range-bucketed
serving index in ``index/build.py`` remains the skew-safe layout; CIFF
is the interchange surface). The distributed artifact is a
**parts relation** (one row per term / per doc record, payload bytes
already wire-framed); actual ``.ciff`` file emission streams those
rows through ``toLocalIterator`` in key order — the driver only
concatenates bounded pages of bytes, mirroring the lineage driver-page
discipline (``index/lineage.py``). Import parallelism is per file
(the stream is sequentially delimited, like WARC): a sharded export
(``n_files > 1``) imports in parallel; a single foreign file costs one
task.
"""

from __future__ import annotations

import json
import math
import os
import struct
from typing import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pisa_spark.index import codec

CIFF_VERSION = 1

# protobuf tag bytes (field_number << 3 | wire_type), all < 0x80 so
# each is itself a single-byte varint — the fact the vectorized
# stride decode below relies on
_T_PL_TERM = 0x0A  # PostingsList.term,  field 1, wire 2
_T_PL_DF = 0x10  # PostingsList.df,    field 2, wire 0
_T_PL_CF = 0x18  # PostingsList.cf,    field 3, wire 0
_T_PL_POSTING = 0x22  # PostingsList.postings, field 4, wire 2
_T_P_DOCID = 0x08  # Posting.docid (gap), field 1, wire 0
_T_P_TF = 0x10  # Posting.tf,          field 2, wire 0
_T_DR_DOCID = 0x08  # DocRecord.docid,     field 1, wire 0
_T_DR_COLL = 0x12  # DocRecord.collection_docid, field 2, wire 2
_T_DR_LEN = 0x18  # DocRecord.doclength, field 3, wire 0


# --------------------------------------------------------------------
# varint helpers (vectorized; single-value convenience wrappers)
# --------------------------------------------------------------------


def _varint_lengths(values: np.ndarray) -> np.ndarray:
    """Byte length of each value's LEB128 encoding (min 1)."""
    v = np.asarray(values, dtype=np.uint64)
    nbits = np.zeros(v.shape, dtype=np.int64)
    tmp = v.copy()
    for shift in range(0, 64, 7):
        nbits = np.where(tmp > 0, (shift // 7) + 1, nbits)
        tmp >>= np.uint64(7)
    return np.maximum(nbits, 1)


def _varint_one(value: int) -> bytes:
    return codec.varint_encode(np.array([value], dtype=np.uint64))


def _read_varint(buf: memoryview, pos: int) -> tuple[int, int]:
    """Scalar LEB128 read -> (value, new_pos). Used only on message
    framing (one per message) and tiny fixed headers — never per
    posting."""
    result = 0
    shift = 0
    while True:
        b = buf[pos]
        pos += 1
        result |= (b & 0x7F) << shift
        if not b & 0x80:
            return result, pos
        shift += 7


def _scatter(
    chunks: list[tuple[np.ndarray, np.ndarray]]
) -> bytes:
    """Interleave per-row byte chunks into one stream.

    ``chunks`` is a list of (bytes_as_uint8_concat, per_row_lengths)
    columns; row i's output is the concatenation of column j's i-th
    chunk for all j, rows in order. Pure NumPy offset arithmetic."""
    n = len(chunks[0][1])
    per_row = np.zeros(n, dtype=np.int64)
    for _, lens in chunks:
        per_row += lens
    row_starts = np.concatenate(([0], np.cumsum(per_row)[:-1]))
    out = np.empty(int(per_row.sum()), dtype=np.uint8)
    col_off = np.zeros(n, dtype=np.int64)
    for data, lens in chunks:
        # source start of each row's chunk within this column
        src_starts = np.concatenate(([0], np.cumsum(lens)[:-1]))
        dst_starts = row_starts + col_off
        # vector gather: positions of every output byte of this column
        maxlen = int(lens.max()) if n else 0
        for k in range(maxlen):
            mask = lens > k
            out[dst_starts[mask] + k] = data[src_starts[mask] + k]
        col_off += lens
    return out.tobytes()


def _varints_column(values: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """(concatenated LEB128 bytes as uint8 array, per-value lengths)."""
    lens = _varint_lengths(values)
    data = np.frombuffer(codec.varint_encode(values), dtype=np.uint8)
    return data, lens


def _const_column(byte: int, n: int) -> tuple[np.ndarray, np.ndarray]:
    return (
        np.full(n, byte, dtype=np.uint8),
        np.ones(n, dtype=np.int64),
    )


# --------------------------------------------------------------------
# message encoders
# --------------------------------------------------------------------


def encode_postings_list(
    term: str, doc_ids: np.ndarray, tfs: np.ndarray
) -> bytes:
    """One ``PostingsList`` message (NOT length-delimited): term, df,
    cf, then the gap-encoded repeated postings — assembled with
    vectorized varint columns and one interleave pass."""
    doc_ids = np.asarray(doc_ids, dtype=np.int64)
    tfs = np.asarray(tfs, dtype=np.int64)
    n = doc_ids.size
    gaps = np.empty(n, dtype=np.uint64)
    gaps[0] = np.uint64(doc_ids[0])
    gaps[1:] = np.diff(doc_ids).astype(np.uint64)
    g_data, g_lens = _varints_column(gaps)
    t_data, t_lens = _varints_column(tfs.astype(np.uint64))
    # Posting message body = 0x08 gap 0x10 tf; its length prefix is a
    # single byte (<= 22 < 128), so the repeated-field framing is
    # [0x22, body_len] per posting
    body_lens = (2 + g_lens + t_lens).astype(np.uint64)
    blob = _scatter(
        [
            _const_column(_T_PL_POSTING, n),
            _varints_column(body_lens),
            _const_column(_T_P_DOCID, n),
            (g_data, g_lens),
            _const_column(_T_P_TF, n),
            (t_data, t_lens),
        ]
    )
    term_b = term.encode("utf-8")
    head = (
        bytes([_T_PL_TERM])
        + _varint_one(len(term_b))
        + term_b
        + bytes([_T_PL_DF])
        + _varint_one(n)
        + bytes([_T_PL_CF])
        + _varint_one(int(tfs.sum()))
    )
    return head + blob


def encode_doc_records(
    doc_ids: np.ndarray, collection_ids: pd.Series, doc_lens: np.ndarray
) -> bytes:
    """A batch of length-delimited ``DocRecord`` messages, vectorized."""
    doc_ids = np.asarray(doc_ids, dtype=np.uint64)
    doc_lens = np.asarray(doc_lens, dtype=np.uint64)
    n = doc_ids.size
    coll = collection_ids.astype(str).str.encode("utf-8")
    c_lens = coll.str.len().to_numpy(dtype=np.int64)
    c_data = np.frombuffer(b"".join(coll.tolist()), dtype=np.uint8)
    id_data, id_lens = _varints_column(doc_ids)
    cl_data, cl_lens = _varints_column(c_lens.astype(np.uint64))
    dl_data, dl_lens = _varints_column(doc_lens)
    body_lens = (3 + id_lens + cl_lens + c_lens + dl_lens).astype(np.uint64)
    return _scatter(
        [
            _varints_column(body_lens),  # outer delimiter
            _const_column(_T_DR_DOCID, n),
            (id_data, id_lens),
            _const_column(_T_DR_COLL, n),
            (cl_data, cl_lens),
            (c_data, c_lens),
            _const_column(_T_DR_LEN, n),
            (dl_data, dl_lens),
        ]
    )


def encode_header(
    num_postings_lists: int,
    num_docs: int,
    total_terms_in_collection: int,
    average_doclength: float,
    description: str = "pisa_spark ciff export",
) -> bytes:
    """Length-delimited ``Header`` message."""
    desc = description.encode("utf-8")
    body = (
        bytes([0x08]) + _varint_one(CIFF_VERSION)
        + bytes([0x10]) + _varint_one(num_postings_lists)
        + bytes([0x18]) + _varint_one(num_docs)
        + bytes([0x20]) + _varint_one(num_postings_lists)
        + bytes([0x28]) + _varint_one(num_docs)
        + bytes([0x30]) + _varint_one(total_terms_in_collection)
        + bytes([0x39]) + struct.pack("<d", float(average_doclength))
        + bytes([0x42]) + _varint_one(len(desc)) + desc
    )
    return _varint_one(len(body)) + body


# --------------------------------------------------------------------
# message decoders
# --------------------------------------------------------------------


def decode_header(buf: memoryview, pos: int = 0) -> tuple[dict, int]:
    """Parse the leading length-delimited Header -> (dict, new_pos)."""
    mlen, pos = _read_varint(buf, pos)
    end = pos + mlen
    out: dict = {}
    names = {
        1: "version", 2: "num_postings_lists", 3: "num_docs",
        4: "total_postings_lists", 5: "total_docs",
        6: "total_terms_in_collection",
    }
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, pos = _read_varint(buf, pos)
            out[names.get(field, f"f{field}")] = v
        elif wire == 1:
            (d,) = struct.unpack_from("<d", buf, pos)
            pos += 8
            out["average_doclength"] = d
        elif wire == 2:
            ln, pos = _read_varint(buf, pos)
            if field == 8:
                out["description"] = bytes(buf[pos : pos + ln]).decode(
                    "utf-8"
                )
            pos += ln
        else:  # pragma: no cover - no such wire type in CIFF
            raise ValueError(f"ciff header: unsupported wire type {wire}")
    return out, end


def _decode_postings_blob(
    region: memoryview,
) -> tuple[np.ndarray, np.ndarray]:
    """Vectorized decode of the repeated Posting region -> (gaps, tfs).

    Every component of the region — the 0x22 tags, the single-byte
    body lengths, the 0x08/0x10 field tags, the gap and tf varints —
    is itself a LEB128 varint, so one ``codec.varint_decode`` pass
    yields the flat value sequence; postings with both fields present
    then stride exactly 6 values. The only canonical deviation is a
    FIRST posting with docid == 0 whose encoder omitted the default
    (gaps/tfs are >= 1 everywhere else), handled as a scalar prefix
    before the stride."""
    vals = codec.varint_decode(bytes(region))
    if vals.size == 0:
        return (
            np.empty(0, dtype=np.int64),
            np.empty(0, dtype=np.int64),
        )
    first_gap = np.int64(0)
    first_tf = np.int64(0)
    have_first = False
    off = 0
    # scalar check of posting #0 for the omitted-default edge:
    # full form is [0x22, len, 0x08, gap, 0x10, tf]
    if not (
        vals.size >= 6
        and vals[0] == _T_PL_POSTING
        and vals[2] == _T_P_DOCID
        and vals[4] == _T_P_TF
    ):
        if vals[0] != _T_PL_POSTING:
            raise ValueError("ciff: postings region does not start at 0x22")
        have_first = True
        # walk posting #0's fields scalar-wise
        i = 2
        n_fields = 0
        while i < vals.size and n_fields < 2 and vals[i] in (
            _T_P_DOCID,
            _T_P_TF,
        ):
            if vals[i] == _T_P_DOCID:
                first_gap = np.int64(vals[i + 1])
            else:
                first_tf = np.int64(vals[i + 1])
            i += 2
            n_fields += 1
            if i < vals.size and vals[i] == _T_PL_POSTING:
                break
        off = i
    tail = vals[off:]
    if tail.size % 6 != 0:
        raise ValueError("ciff: ragged postings region")
    tail = tail.reshape(-1, 6)
    if tail.size and not (
        (tail[:, 0] == _T_PL_POSTING).all()
        and (tail[:, 2] == _T_P_DOCID).all()
        and (tail[:, 4] == _T_P_TF).all()
    ):
        raise ValueError("ciff: unexpected posting field layout")
    gaps = tail[:, 3].astype(np.int64)
    tfs = tail[:, 5].astype(np.int64)
    if have_first:
        gaps = np.concatenate(([first_gap], gaps))
        tfs = np.concatenate(([first_tf], tfs))
    return gaps, tfs


def decode_postings_list(
    buf: memoryview, pos: int
) -> tuple[str, int, int, np.ndarray, np.ndarray, int]:
    """One length-delimited PostingsList at ``pos`` ->
    (term, df, cf, doc_ids, tfs, new_pos). Scalar work is O(header
    fields); the postings region decodes vectorized."""
    mlen, pos = _read_varint(buf, pos)
    end = pos + mlen
    term, df, cf = "", -1, -1
    gaps = np.empty(0, dtype=np.int64)
    tfs = np.empty(0, dtype=np.int64)
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            term = bytes(buf[pos : pos + ln]).decode("utf-8")
            pos += ln
        elif field == 2 and wire == 0:
            df, pos = _read_varint(buf, pos)
        elif field == 3 and wire == 0:
            cf, pos = _read_varint(buf, pos)
        elif field == 4 and wire == 2:
            # repeated postings serialize contiguously: everything from
            # this tag (pos-1 is after tag... we need region start at
            # the tag byte) to message end is the postings region
            gaps, tfs = _decode_postings_blob(buf[pos - 1 : end])
            pos = end
        else:  # pragma: no cover - unknown field: skip per wire type
            if wire == 0:
                _, pos = _read_varint(buf, pos)
            elif wire == 2:
                ln, pos = _read_varint(buf, pos)
                pos += ln
            else:
                raise ValueError(f"ciff: wire type {wire} unsupported")
    doc_ids = np.cumsum(gaps) if gaps.size else gaps
    return term, df, cf, doc_ids, tfs, end


def decode_doc_record(
    buf: memoryview, pos: int
) -> tuple[int, str, int, int]:
    """One length-delimited DocRecord -> (docid, collection_docid,
    doclength, new_pos)."""
    mlen, pos = _read_varint(buf, pos)
    end = pos + mlen
    docid, coll, dlen = 0, "", 0
    while pos < end:
        tag, pos = _read_varint(buf, pos)
        field, wire = tag >> 3, tag & 7
        if field == 1 and wire == 0:
            docid, pos = _read_varint(buf, pos)
        elif field == 2 and wire == 2:
            ln, pos = _read_varint(buf, pos)
            coll = bytes(buf[pos : pos + ln]).decode("utf-8")
            pos += ln
        elif field == 3 and wire == 0:
            dlen, pos = _read_varint(buf, pos)
        else:  # pragma: no cover
            if wire == 0:
                _, pos = _read_varint(buf, pos)
            else:
                ln, pos = _read_varint(buf, pos)
                pos += ln
    return docid, coll, dlen, end


# --------------------------------------------------------------------
# Spark-side export
# --------------------------------------------------------------------

_PARTS_SCHEMA = "term string, df long, cf long, payload binary"
_DOCPARTS_SCHEMA = "doc_id long, payload binary"


def ciff_postings_parts(tf_df: DataFrame) -> DataFrame:
    """tf relation (doc_id, term, tf) -> one wire-framed PostingsList
    payload row per term: (term, df, cf, payload). Distributed via
    groupBy(term).applyInPandas — CIFF's one-contiguous-list-per-term
    contract makes per-term assembly the format's inherent unit."""

    def assemble(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("doc_id")
        doc_ids = pdf["doc_id"].to_numpy(dtype=np.int64)
        tfs = pdf["tf"].to_numpy(dtype=np.int64)
        term = pdf["term"].iloc[0]
        payload = encode_postings_list(term, doc_ids, tfs)
        return pd.DataFrame(
            {
                "term": [term],
                "df": [len(doc_ids)],
                "cf": [int(tfs.sum())],
                "payload": [payload],
            }
        )

    return tf_df.select("doc_id", "term", "tf").groupBy("term").applyInPandas(
        assemble, schema=_PARTS_SCHEMA
    )


def ciff_doc_parts(docs_df: DataFrame) -> DataFrame:
    """(doc_id, collection_docid, doc_len) -> wire-framed DocRecord
    payload blobs, ONE ROW PER ARROW BATCH (keyed by the batch's first
    doc_id): each batch encodes in a single vectorized pass and is
    never re-split. The range repartition + within-partition sort make
    batch doc-id ranges disjoint and internally ordered, so ordering
    the blob rows by ``doc_id`` reproduces exact global docid order."""

    def assemble(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            if pdf.empty:
                continue
            blob = encode_doc_records(
                pdf["doc_id"].to_numpy(),
                pdf["collection_docid"],
                pdf["doc_len"].to_numpy(),
            )
            yield pd.DataFrame(
                {"doc_id": [int(pdf["doc_id"].iloc[0])], "payload": [blob]}
            )

    return (
        docs_df.select("doc_id", "collection_docid", "doc_len")
        .repartitionByRange(
            max(2, docs_df.sparkSession.sparkContext.defaultParallelism),
            "doc_id",
        )
        .sortWithinPartitions("doc_id")
        .mapInPandas(assemble, schema=_DOCPARTS_SCHEMA)
    )


def export_ciff(
    tf_df: DataFrame,
    docs_df: DataFrame,
    path: str,
    n_files: int = 1,
    description: str = "pisa_spark ciff export",
    page_rows: int = 65536,
) -> dict:
    """Write a CIFF export under ``path``.

    ``n_files == 1``: a single spec-exact ``index.ciff`` (header +
    postings lists in term order + doc records in docid order) any
    CIFF consumer can ingest. ``n_files > 1``: ``postings-%05d.ciff``
    shards (each a valid CIFF file whose header counts cover only the
    shard, num_docs=0) plus a dedicated ``zdocs.ciff`` carrying every
    DocRecord, plus ``manifest.json`` — the form the readers import in
    parallel.

    All heavy work (per-term assembly, varint packing) happened in
    executors inside the parts relations; this writer streams payload
    rows via ``toLocalIterator`` in key order, holding one Arrow page
    at a time — the same bounded-driver discipline as
    ``index/lineage.py``. Returns the manifest dict."""
    os.makedirs(path, exist_ok=True)
    parts = ciff_postings_parts(tf_df)
    stats = (
        docs_df.agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.avg("doc_len").alias("avgdl"),
            F.sum("doc_len").alias("total_terms"),
        ).collect()[0]
    )
    n_lists = parts.count()
    n_docs = int(stats["n_docs"])
    per_file = max(1, math.ceil(n_lists / n_files))
    manifest = {
        "format": "ciff",
        "version": CIFF_VERSION,
        "n_files": n_files,
        "num_postings_lists": int(n_lists),
        "num_docs": n_docs,
        "files": [],
    }

    def header(nl: int, nd: int) -> bytes:
        return encode_header(
            nl, nd, int(stats["total_terms"]), float(stats["avgdl"]),
            description,
        )

    fh = None
    written = 0
    file_idx = 0
    single = n_files == 1
    try:
        for row in parts.orderBy("term").toLocalIterator(
            prefetchPartitions=True
        ):
            if fh is None or (not single and written >= per_file):
                if fh is not None:
                    fh.close()
                name = (
                    "index.ciff" if single
                    else f"postings-{file_idx:05d}.ciff"
                )
                remaining = n_lists - file_idx * per_file
                nl = n_lists if single else min(per_file, remaining)
                fh = open(os.path.join(path, name), "wb")
                fh.write(header(int(nl), n_docs if single else 0))
                manifest["files"].append(name)
                file_idx += 1
                written = 0
            fh.write(_varint_one(len(row["payload"])))
            fh.write(row["payload"])
            written += 1
        if single:
            if fh is None:  # empty corpus: still emit a valid file
                fh = open(os.path.join(path, "index.ciff"), "wb")
                fh.write(header(0, n_docs))
                manifest["files"].append("index.ciff")
        else:
            if fh is not None:
                fh.close()
            # dedicated docs shard ('z' sorts after postings-*, so
            # single-directory readers still see postings first)
            fh = open(os.path.join(path, "zdocs.ciff"), "wb")
            fh.write(header(0, n_docs))
            manifest["files"].append("zdocs.ciff")
        for drow in ciff_doc_parts(docs_df).orderBy(
            "doc_id"
        ).toLocalIterator(prefetchPartitions=True):
            fh.write(drow["payload"])
    finally:
        if fh is not None:
            fh.close()
    with open(os.path.join(path, "manifest.json"), "w") as mf:
        json.dump(manifest, mf, indent=1)
    return manifest


# --------------------------------------------------------------------
# Spark-side import
# --------------------------------------------------------------------


def read_ciff_header(path: str) -> dict:
    """Driver-side: parse only the leading Header of the first file."""
    target = _first_file(path)
    with open(target, "rb") as fh:
        head = fh.read(1 << 16)
    out, _ = decode_header(memoryview(head))
    return out


def _first_file(path: str) -> str:
    if os.path.isfile(path):
        return path
    names = sorted(
        n for n in os.listdir(path) if n.endswith(".ciff")
    )
    if not names:
        raise FileNotFoundError(f"no .ciff files under {path}")
    return os.path.join(path, names[0])


def _iter_file_messages(content: bytes):
    """Yield ('postings'|'doc', parsed) tuples for one file's bytes."""
    mv = memoryview(content)
    hdr, pos = decode_header(mv)
    for _ in range(int(hdr.get("num_postings_lists", 0))):
        term, df, cf, doc_ids, tfs, pos = decode_postings_list(mv, pos)
        yield "postings", (term, df, cf, doc_ids, tfs)
    for _ in range(int(hdr.get("num_docs", 0))):
        docid, coll, dlen, pos = decode_doc_record(mv, pos)
        yield "doc", (docid, coll, dlen)


def read_ciff_postings(spark: SparkSession, path: str) -> DataFrame:
    """CIFF file(s) -> exploded tf relation
    (term, df, cf, doc_id, tf). One task per file (the stream is
    sequentially delimited); sharded exports parallelize. Per-list
    explosion is np.repeat/cumsum — vectorized."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                terms, dfs, cfs, dids, tfs = [], [], [], [], []
                for kind, rec in _iter_file_messages(bytes(content)):
                    if kind != "postings":
                        break  # docs always trail postings
                    term, df, cf, doc_ids, tf_arr, = rec
                    terms.append(
                        np.full(doc_ids.size, term, dtype=object)
                    )
                    dfs.append(
                        np.full(doc_ids.size, df, dtype=np.int64)
                    )
                    cfs.append(
                        np.full(doc_ids.size, cf, dtype=np.int64)
                    )
                    dids.append(doc_ids)
                    tfs.append(tf_arr)
                if not terms:
                    continue
                yield pd.DataFrame(
                    {
                        "term": np.concatenate(terms),
                        "df": np.concatenate(dfs),
                        "cf": np.concatenate(cfs),
                        "doc_id": np.concatenate(dids),
                        "tf": np.concatenate(tfs),
                    }
                )

    files = _ciff_files(spark, path)
    return files.select("content").mapInPandas(
        parse, schema="term string, df long, cf long, doc_id long, tf long"
    )


def read_ciff_docs(spark: SparkSession, path: str) -> DataFrame:
    """CIFF file(s) -> (doc_id, collection_docid, doc_len)."""

    def parse(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            for content in pdf["content"]:
                ids, colls, lens = [], [], []
                for kind, rec in _iter_file_messages(bytes(content)):
                    if kind != "doc":
                        continue
                    docid, coll, dlen = rec
                    ids.append(docid)
                    colls.append(coll)
                    lens.append(dlen)
                if not ids:
                    continue
                yield pd.DataFrame(
                    {
                        "doc_id": np.asarray(ids, dtype=np.int64),
                        "collection_docid": colls,
                        "doc_len": np.asarray(lens, dtype=np.int64),
                    }
                )

    files = _ciff_files(spark, path)
    return files.select("content").mapInPandas(
        parse,
        schema="doc_id long, collection_docid string, doc_len long",
    )


def _ciff_files(spark: SparkSession, path: str) -> DataFrame:
    reader = spark.read.format("binaryFile")
    if os.path.isdir(path):
        reader = reader.option("pathGlobFilter", "*.ciff")
    return reader.load(path)
