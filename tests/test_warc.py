"""WARC source: byte-level writer/parser round-trips (no Spark) and
the distributed read path (binaryFile -> parse -> extraction parity
with the original corpus)."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.corpus import pages_from_documents, with_extracted_text
from pisa_spark.sources.warc import (
    parse_warc_bytes,
    read_warc,
    warc_file_bytes,
    warc_record_bytes,
    write_warc_directory,
)

RECS = [
    ("https://a.test/p/1", 1514764807, "<html><body><p>alpha</p></body></html>".encode()),
    ("https://b.test/p/2", 1514764814, "<html><body><p>beta é</p></body></html>".encode()),
    # payload containing record-separator-like bytes: length-walks must survive
    ("https://c.test/p/3", 1514764821, b"x\r\n\r\nWARC/1.0\r\n\r\ny"),
]


def test_roundtrip_single_record():
    data = warc_record_bytes(*RECS[0])
    got = parse_warc_bytes(data)
    assert got == [("https://a.test/p/1", "2018-01-01T00:00:07Z", RECS[0][2])]


def test_roundtrip_full_file_skips_warcinfo():
    data = warc_file_bytes(RECS)
    got = parse_warc_bytes(data)
    assert [(u, h) for u, _, h in got] == [(u, h) for u, _, h in RECS]


def test_adversarial_payload_bytes():
    """A payload embedding 'WARC/1.0' + separators must not desync the
    walk (Content-Length-driven, not magic-string-driven)."""
    data = warc_file_bytes(RECS)
    got = parse_warc_bytes(data)
    assert got[2][2] == RECS[2][2]
    assert len(got) == 3


def test_truncated_tail_yields_complete_records():
    data = warc_file_bytes(RECS)
    # cut inside the last record's payload
    got = parse_warc_bytes(data[: len(data) - 10])
    assert len(got) == 2


def test_writer_bytes_deterministic():
    assert warc_file_bytes(RECS) == warc_file_bytes(RECS)


@pytest.fixture(scope="module")
def warc_dir(spark, sf_dir, tmp_path_factory):
    out = str(tmp_path_factory.mktemp("warc"))
    pages = pages_from_documents(spark, sf_dir).select("url", "warc_ts", "html")
    stats = write_warc_directory(pages, out, n_files=4).collect()
    return out, stats


def test_write_warc_directory_covers_all_pages(spark, sf_dir, warc_dir):
    out, stats = warc_dir
    n_pages = pages_from_documents(spark, sf_dir).count()
    assert sum(r["n_records"] for r in stats) == n_pages
    assert len(stats) <= 4


def test_read_warc_roundtrips_pages(spark, sf_dir, warc_dir):
    out, _ = warc_dir
    orig = {
        r["url"]: (r["ts"], bytes(r["html"]))
        for r in pages_from_documents(spark, sf_dir)
        .select("url", F.col("warc_ts").cast("long").alias("ts"), "html")
        .collect()
    }
    got = {
        r["url"]: (r["ts"], bytes(r["html"]))
        for r in read_warc(spark, out)
        .select("url", F.col("warc_ts").cast("long").alias("ts"), "html")
        .collect()
    }
    assert got == orig


def test_warc_extraction_byte_identical(spark, sf_dir, warc_dir):
    """The full front door: WARC files -> parse -> HTML extraction ==
    the original document text, byte-identical per url."""
    out, _ = warc_dir
    pages = read_warc(spark, out).withColumn("lang", F.lit("en"))
    extracted = with_extracted_text(pages).select("url", "extracted")
    orig = pages_from_documents(spark, sf_dir).select("url", "text")
    diff = (
        extracted.join(orig, "url")
        .filter(F.col("extracted") != F.col("text"))
        .count()
    )
    assert diff == 0
    assert extracted.count() == orig.count()


def test_read_warc_tolerates_bad_and_fractional_dates(
    spark, sf_dir, tmp_path_factory
):
    """WARC 1.1 allows fractional seconds in WARC-Date, and real
    crawls carry malformed values; either must yield NaT for THAT
    record only — never fail the file's task."""
    import os

    from pisa_spark.sources.warc import warc_record_bytes

    out = str(tmp_path_factory.mktemp("warc_dates"))
    good = warc_record_bytes("https://g.test/1", 1514764807, b"<p>g</p>")
    frac = warc_record_bytes(
        "https://f.test/1", 1514764807, b"<p>f</p>"
    ).replace(b"2018-01-01T00:00:07Z", b"2018-01-01T00:00:07.25Z")
    bad = warc_record_bytes(
        "https://x.test/1", 1514764807, b"<p>x</p>"
    ).replace(b"2018-01-01T00:00:07Z", b"not-a-date-at-allZ")
    with open(os.path.join(out, "f0.warc"), "wb") as fh:
        fh.write(good + frac + bad)
    rows = {r["url"]: r for r in read_warc(spark, out).collect()}
    assert set(rows) == {
        "https://g.test/1", "https://f.test/1", "https://x.test/1"
    }
    assert rows["https://g.test/1"]["warc_ts"] is not None
    # fractional seconds parse (sub-second precision preserved)
    ts_f = rows["https://f.test/1"]["warc_ts"]
    assert ts_f is not None and ts_f.microsecond == 250000
    # malformed date -> NaT for that record, html still delivered
    assert rows["https://x.test/1"]["warc_ts"] is None
    assert bytes(rows["https://x.test/1"]["html"]) == b"<p>x</p>"


def test_gunzip_members_walks_concatenated_streams():
    import gzip as _g
    import io

    from pisa_spark.sources.warc import gunzip_members

    def member(b):
        buf = io.BytesIO()
        with _g.GzipFile(fileobj=buf, mode="wb", mtime=0) as gz:
            gz.write(b)
        return buf.getvalue()

    parts = [b"alpha", b"beta" * 1000, b"", b"gamma\r\n\r\n"]
    data = b"".join(member(p) for p in parts)
    assert gunzip_members(data) == b"".join(parts)
    # truncated tail: completed members survive
    assert gunzip_members(data[:-7]).startswith(b"alpha" + b"beta")
    assert gunzip_members(b"") == b""


def test_read_warc_gz_roundtrips_pages(spark, sf_dir, tmp_path):
    out = str(tmp_path / "warcgz")
    pages = pages_from_documents(spark, sf_dir).select(
        "url", "warc_ts", "html"
    )
    stats = write_warc_directory(
        pages, out, n_files=3, gzip_members=True
    ).collect()
    import os

    names = sorted(os.listdir(out))
    assert names and all(n.endswith(".warc.gz") for n in names)
    orig = {
        r["url"]: (r["ts"], bytes(r["html"]))
        for r in pages.select(
            "url", F.col("warc_ts").cast("long").alias("ts"), "html"
        ).collect()
    }
    got = {
        r["url"]: (r["ts"], bytes(r["html"]))
        for r in read_warc(spark, out)
        .select("url", F.col("warc_ts").cast("long").alias("ts"), "html")
        .collect()
    }
    assert got == orig
    assert sum(r["n_records"] for r in stats) == len(orig)


def test_read_warc_mixed_plain_and_gz(spark, sf_dir, tmp_path):
    out = str(tmp_path / "mixed")
    pages = pages_from_documents(spark, sf_dir).select(
        "url", "warc_ts", "html"
    )
    a = pages.filter(F.col("url") < "https://example5")
    b = pages.subtract(a)
    write_warc_directory(a, out, n_files=2).collect()
    write_warc_directory(b, out, n_files=2, gzip_members=True).collect()
    assert read_warc(spark, out).count() == pages.count()
