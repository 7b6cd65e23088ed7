"""WARC source: read Common-Crawl-style WARC files into the pages table.

WARC (ISO 28500 / WARC 1.0 — the public web-archive format Common
Crawl publishes) stores a stream of records, each a header block
(CRLF-separated ``Name: value`` lines, terminated by a blank line)
followed by ``Content-Length`` payload bytes and a CRLF CRLF record
separator. Response records carry an HTTP message as payload
(``Content-Type: application/http; msgtype=response``): status line +
HTTP headers, blank line, then the raw HTML bytes.

Distribution model: WARC files are the parallel unit (Common Crawl
ships ~1 GB files, tens of thousands per crawl), read via Spark's
``binaryFile`` source so 10^12 documents spread as one task per file
(or per split-range of a file via ``offset_hint``/external segment
manifests at real scale — a 100 TB crawl is ~100k files, well past
1000 executors). Inside a task, parsing walks records with
O(records) Python — the same per-record granularity a JVM WARC
InputFormat pays — and emits Arrow batches; all downstream work
(extraction, tokenization, indexing) is vectorized.

The writer half (``warc_file_bytes``) exists so tests and gates can
synthesize byte-exact WARC fixtures deterministically from the
documents table — no external data, per the sandbox contract. It
emits spec-shaped records (warcinfo header record + response records)
that the parser round-trips byte-identically.

Reference parity note: the reference ingests pre-parsed CSVs
(/root/reference/src/helpers/Reader.py); the WARC front door is
target-engine surface from the north rule's Common-Crawl input shape.
"""

from __future__ import annotations

import hashlib
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CRLF = b"\r\n"
_SEP = b"\r\n\r\n"

PAGES_SCHEMA = "url string, warc_ts timestamp, html binary"


def _warc_date(ts_epoch_s: int) -> str:
    """Epoch seconds -> WARC-Date (ISO 8601 Zulu, second precision)."""
    return (
        pd.Timestamp(ts_epoch_s, unit="s", tz="UTC").strftime("%Y-%m-%dT%H:%M:%SZ")
    )


def warc_record_bytes(url: str, ts_epoch_s: int, html: bytes) -> bytes:
    """One WARC/1.0 response record wrapping ``html`` as an HTTP 200
    response payload. Record-ID is a deterministic function of
    (url, ts) so fixture bytes are reproducible run to run."""
    rid = hashlib.md5(f"{url}@{ts_epoch_s}".encode()).hexdigest()
    http = (
        b"HTTP/1.1 200 OK" + _CRLF
        + b"Content-Type: text/html; charset=UTF-8" + _CRLF
        + b"Content-Length: " + str(len(html)).encode() + _CRLF
        + _CRLF
        + html
    )
    header = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: response" + _CRLF
        + b"WARC-Record-ID: <urn:uuid:" + rid.encode() + b">" + _CRLF
        + b"WARC-Date: " + _warc_date(ts_epoch_s).encode() + _CRLF
        + b"WARC-Target-URI: " + url.encode() + _CRLF
        + b"Content-Type: application/http; msgtype=response" + _CRLF
        + b"Content-Length: " + str(len(http)).encode() + _CRLF
    )
    return header + _CRLF + http + _SEP


def warc_file_bytes(records: list[tuple[str, int, bytes]]) -> bytes:
    """A full WARC file: one warcinfo record then the given
    (url, ts_epoch_s, html) response records, in the given order."""
    info_payload = b"software: pisa-spark-fixture/1.0" + _CRLF
    info = (
        b"WARC/1.0" + _CRLF
        + b"WARC-Type: warcinfo" + _CRLF
        + b"WARC-Date: " + _warc_date(0).encode() + _CRLF
        + b"Content-Type: application/warc-fields" + _CRLF
        + b"Content-Length: " + str(len(info_payload)).encode() + _CRLF
        + _CRLF + info_payload + _SEP
    )
    return info + b"".join(warc_record_bytes(*r) for r in records)


def parse_warc_bytes(data: bytes) -> list[tuple[str, str, bytes]]:
    """Parse one WARC file's bytes -> [(url, warc_date, html_bytes)].

    Walks records by Content-Length (never by scanning payloads for
    magic strings — payloads may contain anything); keeps only
    ``WARC-Type: response`` records; strips the HTTP header block
    (first CRLF CRLF inside the payload) to recover the raw HTML.
    Malformed trailing garbage ends the walk rather than raising — a
    truncated tail file yields its complete records.
    """
    out: list[tuple[str, str, bytes]] = []
    pos = 0
    n = len(data)
    while pos < n:
        if not data.startswith(b"WARC/", pos):
            break
        hdr_end = data.find(_SEP, pos)
        if hdr_end < 0:
            break
        fields: dict[str, str] = {}
        for line in data[pos:hdr_end].split(_CRLF)[1:]:
            k, _, v = line.partition(b":")
            fields[k.strip().lower().decode("latin-1")] = (
                v.strip().decode("latin-1")
            )
        try:
            clen = int(fields.get("content-length", ""))
        except ValueError:
            break
        payload_start = hdr_end + len(_SEP)
        payload_end = payload_start + clen
        if payload_end > n:
            break  # truncated record
        if fields.get("warc-type") == "response":
            payload = data[payload_start:payload_end]
            http_hdr_end = payload.find(_SEP)
            html = payload[http_hdr_end + len(_SEP):] if http_hdr_end >= 0 else b""
            out.append(
                (fields.get("warc-target-uri", ""), fields.get("warc-date", ""), html)
            )
        pos = payload_end + len(_SEP)
    return out


def gunzip_members(data: bytes) -> bytes:
    """Decompress a concatenation of gzip members -> raw bytes.

    Common Crawl's ``.warc.gz`` files are per-RECORD gzip members
    back to back (the spec's record-at-time compression, what makes
    range requests per record possible); stdlib ``gzip`` reads only
    the first member via ``zlib``, so walk members explicitly."""
    import zlib

    out = []
    while data:
        d = zlib.decompressobj(31)  # 31 = gzip wrapper
        try:
            out.append(d.decompress(data))
            out.append(d.flush())
        except zlib.error:
            break  # truncated/garbage tail: keep completed members
        if not d.eof or d.unused_data == data:
            break
        data = d.unused_data
    return b"".join(out)


def read_warc(spark: SparkSession, path: str) -> DataFrame:
    """WARC files under ``path`` -> pages(url, warc_ts, html).

    ``binaryFile`` source (one task per file; Spark lists and
    distributes the files) -> mapInPandas parse. Accepts plain
    ``*.warc`` and Common-Crawl-style ``*.warc.gz`` (per-record gzip
    members, sniffed by magic bytes and member-walked). warc_ts
    parses the ISO 8601 WARC-Date as UTC (the session timezone),
    naive."""
    files = (
        spark.read.format("binaryFile")
        .option("pathGlobFilter", "*.warc*")
        .load(path)
        .filter(
            F.col("path").endswith(".warc")
            | F.col("path").endswith(".warc.gz")
        )
        .select("content")
    )

    def _parse(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            for blob in pdf["content"]:
                raw = bytes(blob)
                if raw[:2] == b"\x1f\x8b":
                    raw = gunzip_members(raw)
                recs = parse_warc_bytes(raw)
                if not recs:
                    continue
                urls, dates, htmls = zip(*recs)
                # tolerant date parse: WARC 1.1 allows fractional
                # seconds, and real crawls carry malformed values —
                # a bad WARC-Date must yield NaT for THAT record, not
                # fail the whole file's task (parse_warc_bytes is
                # already tolerant of malformed records)
                ts = pd.to_datetime(
                    list(dates), errors="coerce", utc=True, format="ISO8601"
                ).tz_localize(None)
                yield pd.DataFrame(
                    {
                        "url": list(urls),
                        "warc_ts": ts,
                        "html": list(htmls),
                    }
                )

    return files.mapInPandas(_parse, schema=PAGES_SCHEMA)


def write_warc_directory(
    pages: DataFrame, out_dir: str, n_files: int = 8,
    gzip_members: bool = False,
) -> DataFrame:
    """Write pages(url, warc_ts, html) as ``n_files`` WARC files under
    ``out_dir`` — the fixture/export sink. One task per output file
    (groupBy a url-hash file id; records sorted by url within a file
    so bytes are deterministic across runs and parallelism levels).
    ``gzip_members=True`` writes Common-Crawl-style ``.warc.gz``:
    one gzip member per record (mtime pinned to 0 so bytes stay
    deterministic). Returns (file_id, n_records, n_bytes) per file."""
    import os

    os.makedirs(out_dir, exist_ok=True)
    keyed = pages.select(
        F.pmod(F.xxhash64("url"), F.lit(n_files)).cast("int").alias("fid"),
        "url",
        F.col("warc_ts").cast("long").alias("ts_s"),
        "html",
    )

    def _write(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("url")
        fid = int(pdf["fid"].iloc[0])
        recs = [
            (u, int(t), bytes(h))
            for u, t, h in zip(pdf["url"], pdf["ts_s"], pdf["html"])
        ]
        if gzip_members:
            import gzip as _gzip
            import io

            def _member(b: bytes) -> bytes:
                buf = io.BytesIO()
                with _gzip.GzipFile(fileobj=buf, mode="wb", mtime=0) as g:
                    g.write(b)
                return buf.getvalue()

            whole = warc_file_bytes(recs)
            per_rec = [warc_record_bytes(*r) for r in recs]
            info = whole[: len(whole) - sum(len(p) for p in per_rec)]
            blob = b"".join(_member(m) for m in [info] + per_rec)
            ext = "warc.gz"
        else:
            blob = warc_file_bytes(recs)
            ext = "warc"
        tmp = os.path.join(out_dir, f".part-{fid:05d}.{ext}.tmp")
        final = os.path.join(out_dir, f"part-{fid:05d}.{ext}")
        with open(tmp, "wb") as f:
            f.write(blob)
        os.replace(tmp, final)  # atomic publish, torn writes invisible
        return pd.DataFrame(
            {"file_id": [fid], "n_records": [len(recs)], "n_bytes": [len(blob)]}
        )

    return keyed.groupBy("fid").applyInPandas(
        _write, schema="file_id int, n_records long, n_bytes long"
    )
