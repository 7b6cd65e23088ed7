"""Multimodal plumbing + Structured Streaming tests."""

import shutil

import pytest
from pyspark.sql import functions as F

from pisa_spark.functions.multimodal import (
    decode_image,
    extract_media_features,
    media_from_documents,
    resize_image,
    sample_video_frames,
)
from pisa_spark.streaming.ingest import (
    incremental_doc_lengths,
    run_available_now,
    stream_events,
    windowed_event_counts,
)


def test_media_table_shape(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    types = {f.name: f.dataType.simpleString() for f in media.schema.fields}
    assert types == {
        "doc_id": "bigint", "media_type": "string",
        "n_bytes": "int", "media": "binary",
    }
    assert media.filter(F.col("n_bytes") != F.octet_length("media")).count() == 0


def test_media_features_real_and_deterministic(spark, sf_dir):
    media = media_from_documents(spark, sf_dir)
    f1 = extract_media_features(media).orderBy("doc_id").collect()
    f2 = extract_media_features(media.repartition(7)).orderBy("doc_id").collect()
    assert f1 == f2
    for r in f1[:50]:
        assert 0.0 <= r["byte_entropy"] <= 4.0  # 16 buckets -> max 4 bits
        assert len(r["histogram16"]) == 16
        assert sum(r["histogram16"]) == r["n_bytes"]


def test_media_decode_stubs_raise(spark):
    """Formats beyond the native codecs (BMP/PNG/GIF/JPEG, MJPG AVI)
    still refuse cleanly — e.g. WebP and non-MJPG containers."""
    with pytest.raises(NotImplementedError):
        decode_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ")
    with pytest.raises(NotImplementedError):
        resize_image(b"RIFF\x00\x00\x00\x00WEBPVP8 ", 32, 32)
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"\x00\x00")
    with pytest.raises(NotImplementedError):
        sample_video_frames(b"RIFF\x04\x00\x00\x00WEBP")


def test_bmp_roundtrip_and_resize():
    import numpy as np

    from pisa_spark.functions.multimodal import (
        decode_bmp,
        encode_bmp,
        resize_image,
    )

    rng = np.random.default_rng(7)
    for h, w in [(1, 1), (3, 5), (7, 4), (16, 16)]:
        arr = rng.integers(0, 256, size=(h, w, 3), dtype=np.uint8)
        blob = encode_bmp(arr)
        back = decode_bmp(blob)
        assert back.shape == (h, w, 3)
        assert (back == arr).all()
    # decode_image sniffs the BM magic
    arr = rng.integers(0, 256, size=(6, 9, 3), dtype=np.uint8)
    assert (decode_image(encode_bmp(arr)) == arr).all()
    # nearest-neighbor resize: exact on integer upscales
    up = resize_image(encode_bmp(arr), 18, 12)
    assert up.shape == (12, 18, 3)
    assert (up[::2, ::2] == arr).all()


def test_wav_roundtrip():
    import numpy as np

    from pisa_spark.functions.multimodal import decode_wav, encode_wav

    samples = (np.arange(-500, 500, 7) * 13).astype(np.int16)
    rate, back = decode_wav(encode_wav(samples, 16000))
    assert rate == 16000
    assert (back == samples).all()
    with pytest.raises(ValueError):
        decode_wav(b"nope")


def test_media_decode_stats_closed_form(spark, sf_dir):
    """Spark-side encode->decode stats equal the closed form the
    DuckDB gate twin uses (pixels/samples are text bytes cycled)."""
    import numpy as np

    from pisa_spark.functions.multimodal import (
        media_decode_stats,
        media_fixture_table,
    )

    stats = {
        r["doc_id"]: r
        for r in media_decode_stats(media_fixture_table(spark, sf_dir))
        .collect()
    }
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet").collect()
    assert len(stats) == len(docs)
    for d in docs[:50]:
        raw = np.frombuffer(d["text"].encode(), dtype=np.uint8)
        r = stats[d["doc_id"]]
        if d["doc_id"] % 2 == 0:
            w, h = 4 + d["doc_id"] % 5, 3 + d["doc_id"] % 7
            assert (r["media_type"], r["dim_a"], r["dim_b"]) == ("image", w, h)
            assert r["payload_sum"] == int(
                np.resize(raw, (h, w, 3)).astype(np.int64).sum()
            )
        else:
            assert r["media_type"] == "audio"
            assert r["dim_a"] == raw.size
            assert r["dim_b"] == 8000 + (d["doc_id"] % 4) * 4000
            assert r["payload_sum"] == int(
                ((raw.astype(np.int64) - 128) * 256).sum()
            )


def test_streaming_windowed_counts_match_batch(spark, tmp_path):
    # stage the events parquet as a streaming source directory
    src = str(tmp_path / "stream_src")
    import os

    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/events.parquet", src + "/part0.parquet")

    stream = stream_events(spark, src)
    assert stream.isStreaming
    counts = windowed_event_counts(stream, window="1 day", watermark="2 days")
    got = run_available_now(counts, "win_counts_test", output_mode="complete")

    batch = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    expect = (
        batch.groupBy(F.window("ts", "1 day").alias("w"), "event_type")
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            F.round(F.sum("value"), 2).alias("total_value"),
        )
        .select(
            F.col("w.start").alias("window_start"), "event_type",
            "n_events", "total_value",
        )
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_streaming_tokenize_matches_batch(spark, tmp_path):
    import os

    src = str(tmp_path / "docs_src")
    os.makedirs(src)
    shutil.copy("/root/testdata/sf0.001/documents.parquet", src + "/d0.parquet")
    stream = (
        spark.readStream.schema(
            "doc_id long, text string, lang string, source string, n_chars long"
        )
        .parquet(src)
    )
    got = run_available_now(
        incremental_doc_lengths(stream), "doclen_stream_test"
    )
    batch = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    from pisa_spark.corpus import tokens_col

    expect = batch.select(
        "doc_id", F.size(tokens_col(F.col("text"))).alias("doc_len")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_streaming_stateful_sessionize_matches_batch(spark, tmp_path):
    """Stateful sessionization across TWO microbatches (state carry-over
    at the file boundary) equals the batch window-algebra operator."""
    import os

    from pisa_spark.operators.sessions import sessionize
    from pisa_spark.streaming.ingest import run_available_now, streaming_sessionize

    events = spark.read.parquet("/root/testdata/sf0.001/events.parquet")
    mid = events.approxQuantile("event_id", [0.5], 0.0)[0]
    src = str(tmp_path / "sess_src")
    os.makedirs(src)
    # time-ordered split: event_id order == ts order in the fixture;
    # stage as real files (file-source stream does not recurse into
    # spark output directories)
    import glob
    import shutil

    for name, cond in (("a", F.col("event_id") <= mid), ("b", F.col("event_id") > mid)):
        tmp_out = str(tmp_path / f"tmp_{name}")
        events.filter(cond).coalesce(1).write.parquet(tmp_out)
        part = glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.copy(part, f"{src}/{name}.parquet")

    stream = (
        spark.readStream.schema(
            "event_id long, ts timestamp_ntz, user_id long, event_type string, "
            "value double, props string"
        )
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    got = run_available_now(
        streaming_sessionize(stream, gap_minutes=30), "sessionize_stream_test"
    )
    expect = sessionize(events, gap_minutes=30).select(
        "user_id", "event_id", F.col("session_seq").cast("long").alias("session_seq")
    )
    assert sorted(map(tuple, got.collect())) == sorted(map(tuple, expect.collect()))


def test_fixture_corpus_is_ascii(spark):
    """Contract the media_features oracle relies on: the engine hashes
    UTF-8 BYTES while the DuckDB twin iterates CHARACTERS — equal only
    while every fixture doc is pure ASCII (octet_length == char
    length). If a multi-byte corpus ever lands, this fails before the
    gate silently diverges."""
    from pyspark.sql import functions as F

    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        docs = spark.read.parquet(f"{sf}/documents.parquet")
        non_ascii = docs.filter(
            F.octet_length("text") != F.length("text")
        ).count()
        assert non_ascii == 0, f"{sf}: {non_ascii} non-ASCII docs"


def test_stream_index_ingest_matches_clean_build(spark, sf_dir, tmp_path):
    """Documents arriving as a stream of drops build, micro-batch by
    micro-batch, an index identical to a clean batch build of the full
    corpus — the streaming spine of the resumable build."""
    import glob
    import shutil

    from pyspark.sql import functions as F

    from pisa_spark.index.lineage import build_index_resumable, load_index
    from pisa_spark.sources import catalog
    from pisa_spark.streaming.ingest import stream_index_ingest
    from tests.test_index_build import decode_index

    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    drops = str(tmp_path / "drops")
    corpus = str(tmp_path / "corpus_stream")
    idx = str(tmp_path / "idx_stream")
    ckpt = str(tmp_path / "ckpt")
    os_dirs = [(0, 200), (200, 400), (400, 500)]
    import os

    os.makedirs(drops, exist_ok=True)
    for i, (lo, hi) in enumerate(os_dirs):
        tmp_out = str(tmp_path / f"tmp_drop{i}")
        full.filter(
            (F.col("doc_id") >= lo) & (F.col("doc_id") < hi)
        ).select("doc_id", "text").coalesce(1).write.parquet(tmp_out)
        part = glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.copy(part, f"{drops}/drop{i}.parquet")

    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    q = stream_index_ingest(stream, corpus, idx, ckpt, docs_per_bucket=64)
    q.awaitTermination()

    clean = str(tmp_path / "idx_clean_stream")
    build_index_resumable(spark, sf_dir, clean, wave_size=8, docs_per_bucket=64)
    pa, stats_a = load_index(spark, idx)
    pb, stats_b = load_index(spark, clean)
    assert decode_index(pa.collect()) == decode_index(pb.collect())
    assert stats_a == stats_b
    # lineage shows multiple generations only for boundary buckets
    lin = catalog.read_table(spark, idx, "lineage")
    assert lin.filter(F.col("status") == "committed").count() >= 8


def test_stream_index_ingest_content_dedup(spark, sf_dir, tmp_path):
    """dedup_content=True drops exact content duplicates at ingest:
    in-batch (min doc_id wins) and across batches (already-ingested
    fingerprints), so the corpus and index only ever see one copy."""
    import glob
    import os
    import shutil

    from pyspark.sql import functions as F

    from pisa_spark.index.lineage import load_index
    from pisa_spark.sources import catalog
    from pisa_spark.streaming.ingest import stream_index_ingest

    full = spark.read.parquet(f"{sf_dir}/documents.parquet")
    base = full.filter(F.col("doc_id") < 60).select("doc_id", "text")
    drops = str(tmp_path / "drops_dd")
    os.makedirs(drops, exist_ok=True)
    # drop 0: docs 0-59 plus an in-batch duplicate of doc 3's text
    dup_in = base.union(
        base.filter(F.col("doc_id") == 3).select(
            (F.col("doc_id") + 1000).alias("doc_id"), "text"
        )
    )
    # drop 1: new docs 60-99 plus a cross-batch duplicate of doc 7
    batch2 = (
        full.filter((F.col("doc_id") >= 60) & (F.col("doc_id") < 100))
        .select("doc_id", "text")
        .union(
            base.filter(F.col("doc_id") == 7).select(
                (F.col("doc_id") + 2000).alias("doc_id"), "text"
            )
        )
    )
    for i, df in enumerate([dup_in, batch2]):
        tmp_out = str(tmp_path / f"tmp_dd{i}")
        df.coalesce(1).write.parquet(tmp_out)
        part = glob.glob(tmp_out + "/part-*.parquet")[0]
        shutil.copy(part, f"{drops}/drop{i}.parquet")

    corpus = str(tmp_path / "corpus_dd")
    idx = str(tmp_path / "idx_dd")
    stream = (
        spark.readStream.schema("doc_id long, text string")
        .option("maxFilesPerTrigger", 1)
        .parquet(drops)
    )
    q = stream_index_ingest(
        stream, corpus, idx, str(tmp_path / "ckpt_dd"),
        docs_per_bucket=64, dedup_content=True,
    )
    q.awaitTermination()

    got = catalog.read_table(spark, corpus, "documents.parquet")
    ids = {r["doc_id"] for r in got.select("doc_id").collect()}
    assert 1003 not in ids and 2007 not in ids  # both duplicates dropped
    assert ids == set(range(100))
    _, stats = load_index(spark, idx)
    assert stats["n_docs"] == 100


def test_media_decode_stats_empty_text_matches_twin(spark, tmp_path):
    """Empty-text docs: the engine encodes ZERO samples (audio) and
    all-zero cycled pixels (image); the DuckDB gate twin must agree —
    regression for string_split('', '') yielding a phantom ''
    element (one zero byte) in the oracle."""
    import duckdb
    import pandas as pd

    import __spark_entry__ as E
    from pisa_spark.functions.multimodal import (
        media_decode_stats,
        media_fixture_table,
    )

    docs = pd.DataFrame(
        {"doc_id": [0, 1, 2, 3], "text": ["", "", "ab", "ab"]}
    )
    sf = str(tmp_path / "sf_empty")
    spark.createDataFrame(docs).coalesce(1).write.parquet(
        f"{sf}/documents.parquet"
    )

    got = (
        media_decode_stats(media_fixture_table(spark, sf))
        .toPandas()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.execute(
        f"CREATE VIEW documents AS SELECT * FROM '{sf}/documents.parquet/*.parquet'"
    )
    want = (
        con.execute(E.oracle_sql()["media_decode_stats"])
        .df()
        .sort_values("doc_id")
        .reset_index(drop=True)
    )
    assert got[sorted(got.columns)].equals(want[sorted(want.columns)]), (
        got.to_dict(), want.to_dict()
    )
    # the empty-text audio doc decodes to zero samples, sum 0
    r1 = got[got.doc_id == 1].iloc[0]
    assert (r1["dim_a"], r1["payload_sum"]) == (0, 0)
