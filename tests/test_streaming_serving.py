"""Streaming query serving: a file-source query stream answered by the
loaded engine must equal the direct batch path, across multiple
micro-batch files."""

import json
import os

import pytest
from pyspark.sql import functions as F

from pisa_spark.engine import SearchEngine
from pisa_spark.streaming.serving import read_results, serve_query_stream


@pytest.fixture(scope="module")
def eng(spark, sf_dir, tmp_path_factory):
    root = str(tmp_path_factory.mktemp("serve_eng") / "idx")
    return SearchEngine.build(spark, sf_dir, root, n_buckets=4, wave_size=8)


QUERIES = [
    (0, "data join"),
    (1, "the"),
    (2, "+window merge scan"),
    (3, "spark query scan"),
]


def test_stream_serving_matches_batch(spark, eng, tmp_path_factory):
    base = tmp_path_factory.mktemp("serving")
    qdir, rdir, cdir = (str(base / d) for d in ("queries", "results", "ckpt"))
    os.makedirs(qdir)
    # two query files -> two micro-batches under availableNow
    for fname, qs in [("a.json", QUERIES[:2]), ("b.json", QUERIES[2:])]:
        with open(os.path.join(qdir, fname), "w") as f:
            for qid, q in qs:
                f.write(json.dumps({"query_id": qid, "query": q}) + "\n")
    stream = (
        spark.readStream.schema("query_id long, query string")
        .json(qdir)
    )
    q = serve_query_stream(eng, stream, rdir, cdir, k=5)
    q.awaitTermination()

    got = read_results(spark, rdir)
    direct = eng.search_batch([q for _, q in QUERIES], k=5)
    # query_id in direct is positional (0..3) and matches our ids
    a = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in got.collect()
    )
    b = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in direct.collect()
    )
    assert a == b and len(a) > 0

    # replaying the same inputs through a FRESH checkpoint appends
    # duplicate batches; read_results' distinct must absorb them
    cdir2 = str(base / "ckpt2")
    q2 = serve_query_stream(
        eng,
        spark.readStream.schema("query_id long, query string").json(qdir),
        rdir,
        cdir2,
        k=5,
    )
    q2.awaitTermination()
    again = sorted(
        (r["query_id"], r["rank"], r["doc_id"], round(r["score"], 9))
        for r in read_results(spark, rdir).collect()
    )
    assert again == a
