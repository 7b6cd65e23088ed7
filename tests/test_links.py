"""Link extraction + host graph (functions/links.py): resolution
forms, junk filtering, occurrence weighting, plan shape."""

import pytest
from pyspark.sql import functions as F

from pisa_spark.functions.links import extract_links, host_link_graph

PAGES = [
    (
        "https://a.test/dir/page1",
        '<a href="https://b.test/x">abs</a>'
        '<a href="//c.test/y">proto</a>'
        '<a href="/root/z">rooted</a>'
        '<a href="sib/w">relative</a>'
        '<a href="#frag">skip</a>'
        '<a href="javascript:void(0)">skip</a>'
        '<a href="mailto:x@y.z">skip</a>'
        '<a href="https://b.test/x">abs-again</a>',
    ),
    (
        "http://d.test/p",
        '<a href="q#sec">fragment-stripped</a><a href="">empty</a>',
    ),
    ("https://e.test/none", "<p>no links at all</p>"),
]


@pytest.fixture(scope="module")
def pages(spark):
    return spark.createDataFrame(PAGES, "url string, body string").select(
        "url", F.encode("body", "UTF-8").alias("html")
    )


def test_resolution_forms(pages):
    got = {
        (r["src_url"], r["dst_url"])
        for r in extract_links(pages).collect()
    }
    assert got == {
        ("https://a.test/dir/page1", "https://b.test/x"),
        ("https://a.test/dir/page1", "https://c.test/y"),
        ("https://a.test/dir/page1", "https://a.test/root/z"),
        ("https://a.test/dir/page1", "https://a.test/dir/sib/w"),
        ("http://d.test/p", "http://d.test/q"),
    }


def test_occurrence_weighting_and_host_graph(pages):
    links = extract_links(pages)
    assert links.count() == 6  # duplicate href counted twice
    hosts = {
        (r["src_host"], r["dst_host"]): r["n_links"]
        for r in host_link_graph(links).collect()
    }
    assert hosts == {
        ("a.test", "b.test"): 2,
        ("a.test", "c.test"): 1,
        ("a.test", "a.test"): 2,
        ("d.test", "d.test"): 1,
    }


def test_codegen_no_shuffle_before_aggregate(pages):
    plan = extract_links(pages)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # extraction is scan-speed


def test_feeds_pagerank(spark, pages):
    from pisa_spark.operators.linkgraph import pagerank

    hosts = host_link_graph(extract_links(pages))
    inter = hosts.filter(F.col("src_host") != F.col("dst_host"))
    ids = {"a.test": 0, "b.test": 1, "c.test": 2, "d.test": 3}
    id_df = spark.createDataFrame(
        list(ids.items()), "host string, hid long"
    )
    edges = (
        inter.join(id_df.withColumnRenamed("host", "src_host"), "src_host")
        .withColumnRenamed("hid", "src")
        .join(id_df.withColumnRenamed("host", "dst_host"), "dst_host")
        .withColumnRenamed("hid", "dst")
        .select("src", "dst")
    )
    pr = pagerank(edges, n_iter=3)
    ranks = {r[0]: r[1] for r in pr.collect()}
    assert set(ranks) == {ids["a.test"], ids["b.test"], ids["c.test"]}
    # a.test links out but receives nothing: strictly lowest mass
    assert ranks[ids["a.test"]] < ranks[ids["b.test"]]
    assert ranks[ids["a.test"]] < ranks[ids["c.test"]]
    # one dedup'd edge each from the same source: b and c tie exactly
    assert ranks[ids["b.test"]] == ranks[ids["c.test"]]


def test_anchor_field_feeds_bm25f(spark):
    from pisa_spark.functions.links import anchor_field_tf, extract_anchors
    from pisa_spark.query.bm25f import bm25f_topk

    pages = spark.createDataFrame(
        [
            (
                "https://s.test/p",
                '<a href="https://t.test/a">great engine</a>'
                '<a href="https://u.test/b">engine</a>'
                '<a href="#x">skip</a><a href="https://t.test/a"></a>',
            )
        ],
        "url string, body string",
    ).select("url", F.encode("body", "UTF-8").alias("html"))
    doc_urls = spark.createDataFrame(
        [("https://t.test/a", 1), ("https://u.test/b", 2)],
        "url string, doc_id long",
    )
    arel = anchor_field_tf(extract_anchors(pages), doc_urls)
    rows = {
        (r["doc_id"], r["term"]): (r["tf"], r["field_len"])
        for r in arel.collect()
    }
    # doc 1: "great engine" (2 tokens); the empty-anchor dup dropped
    assert rows == {
        (1, "great"): (1, 2),
        (1, "engine"): (1, 2),
        (2, "engine"): (1, 1),
    }
    assert arel.columns == ["doc_id", "field", "term", "tf", "field_len"]
    # scoring: 'engine' hits both docs; doc 2's anchor field is
    # shorter, so under pure-anchor scoring it saturates higher
    qdf = spark.createDataFrame([(0, "engine")], "query_id int, term string")
    out = bm25f_topk(
        arel, qdf, n_docs=10, avg_field_lens={"anchor": 1.5},
        field_params={"anchor": (2.5, 0.6)}, k=5,
    ).collect()
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [2, 1]
