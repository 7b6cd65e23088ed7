"""Byte-identity of the vectorized HTML->text extractor per url
(BASELINE.json:15 per-row invariant; SURVEY §5.2 item 2)."""

from pyspark.sql import functions as F

from pisa_spark.corpus import pages_from_documents, with_extracted_text


def test_pages_shape(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir)
    assert [f.name for f in pages.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
    types = {f.name: f.dataType.simpleString() for f in pages.schema.fields}
    assert types["html"] == "binary"
    assert types["warc_ts"] == "timestamp"
    assert pages.select("url").distinct().count() == pages.count()


def test_extraction_byte_identical(spark, sf_dir):
    pages = pages_from_documents(spark, sf_dir).cache()
    extracted = with_extracted_text(pages)
    joined = extracted.join(pages.select("url", "text"), "url")
    bad = joined.filter(
        F.encode(F.col("extracted"), "UTF-8") != F.encode(F.col("text"), "UTF-8")
    ).count()
    assert bad == 0
    assert extracted.filter(F.col("extracted").isNull()).count() == 0


def test_extraction_deterministic_across_runs(spark, sf_dir):
    a = with_extracted_text(pages_from_documents(spark, sf_dir)).orderBy("url").collect()
    b = with_extracted_text(pages_from_documents(spark, sf_dir)).orderBy("url").collect()
    assert a == b


def test_assign_doc_ids_dense_and_run_invariant(spark, sf_dir):
    from pisa_spark.corpus import assign_doc_ids, pages_from_documents

    pages = pages_from_documents(spark, sf_dir)
    a = assign_doc_ids(pages).select("url", "doc_id")
    ids = [r["doc_id"] for r in a.orderBy("doc_id").collect()]
    assert ids == list(range(len(ids)))  # dense 0..N-1
    b = assign_doc_ids(pages.repartition(7)).select("url", "doc_id")
    assert sorted(map(tuple, a.collect())) == sorted(map(tuple, b.collect()))


def test_parse_query():
    from pisa_spark.corpus import parse_query

    assert parse_query("data join") == {"terms": ["data", "join"], "conjunctive": False}
    assert parse_query("+data +join") == {"terms": ["data", "join"], "conjunctive": True}
    assert parse_query("Data, JOIN!") == {"terms": ["data", "join"], "conjunctive": False}
    assert parse_query("") == {"terms": [], "conjunctive": False}
