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
