"""Hyperlink extraction and the host-level link graph.

The web-graph front end of a crawl pipeline: harvest ``href``s from
raw page HTML, resolve them against the page URL (RFC 3986's common
forms: absolute, protocol-relative, root-relative, path-relative),
and aggregate to a host->host edge relation — the input the existing
integer PageRank (operators/linkgraph.py) ranks and
`scored_topk_dataframe(priors=...)` blends into serving.

Everything is whole-stage-codegen column expressions
(`regexp_extract_all` + CASE resolution + one hash aggregate for the
host graph); at 10^12 pages the only shuffle is the (src_host,
dst_host) aggregate, keyed by host pairs — the crawl's natural
spread. Fragment-only, ``javascript:`` and ``mailto:`` links are
dropped; fragments are stripped from resolved targets.

Resolution is the pragmatic subset real link-graph builders use —
``..`` segments are not normalized (a '/a/../b' target stays
verbatim), which only fragments hosts' path spaces, never the host
graph itself.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pisa_spark.functions.urls import url_host

HREF_RE = r'href="([^"]*)"'


def resolve_href(src_url: Column, href: Column) -> Column:
    """One href resolved against its page URL (fragment stripped)."""
    scheme = F.regexp_extract(src_url, r"^(https?:)", 1)
    host_root = F.regexp_extract(src_url, r"^(https?://[^/]*)", 1)
    base_dir = F.regexp_replace(src_url, r"[^/]*$", "")
    resolved = (
        F.when(href.rlike(r"^https?://"), href)
        .when(href.startswith("//"), F.concat(scheme, href))
        .when(href.startswith("/"), F.concat(host_root, href))
        .otherwise(F.concat(base_dir, href))
    )
    return F.regexp_replace(resolved, r"#.*$", "")


def extract_links(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(src_url, dst_url) — one row per resolvable href occurrence.

    Scan-speed codegen: decode -> regexp_extract_all -> explode ->
    CASE resolution. Duplicate hrefs on a page stay duplicated (the
    host graph weights by occurrence; ``.distinct()`` downstream if
    link-set semantics are wanted)."""
    h = F.decode(F.col(html_col), "UTF-8")
    rows = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(F.regexp_extract_all(h, F.lit(HREF_RE), F.lit(1))).alias(
            "href"
        ),
    ).filter(
        (F.col("href") != "")
        & ~F.col("href").startswith("#")
        & ~F.col("href").startswith("javascript:")
        & ~F.col("href").startswith("mailto:")
    )
    return rows.select(
        "src_url",
        resolve_href(F.col("src_url"), F.col("href")).alias("dst_url"),
    )


ANCHOR_TAG_RE = r'<a href="[^"]*"[^>]*>[^<]*</a>'


def extract_anchors(
    pages: DataFrame, url_col: str = "url", html_col: str = "html"
) -> DataFrame:
    """(dst_url, anchor) — inbound anchor text per resolved link
    target, the classic web-ranking signal (how OTHERS describe a
    page; feeds BM25F as an 'anchor' field via ``anchor_field_tf``).
    Same codegen shape as ``extract_links``; empty anchor texts and
    junk hrefs are dropped."""
    h = F.decode(F.col(html_col), "UTF-8")
    tags = pages.select(
        F.col(url_col).alias("src_url"),
        F.explode(
            F.regexp_extract_all(h, F.lit(ANCHOR_TAG_RE), F.lit(0))
        ).alias("tag"),
    ).select(
        "src_url",
        F.regexp_extract("tag", HREF_RE, 1).alias("href"),
        F.regexp_extract("tag", r">([^<]*)<", 1).alias("anchor"),
    ).filter(
        (F.col("href") != "")
        & ~F.col("href").startswith("#")
        & ~F.col("href").startswith("javascript:")
        & ~F.col("href").startswith("mailto:")
        & (F.col("anchor") != "")
    )
    return tags.select(
        resolve_href(F.col("src_url"), F.col("href")).alias("dst_url"),
        "anchor",
    )


def anchor_field_tf(
    anchors: DataFrame, doc_urls: DataFrame
) -> DataFrame:
    """Inbound anchors -> a BM25F field relation
    (doc_id, field='anchor', term, tf, field_len): join targets to
    doc ids, tokenize with the index tokenizer, field_len = the doc's
    total inbound anchor tokens. Union with ``fielded_tf``'s
    title/body rows and score via ``bm25f_topk`` with an 'anchor'
    entry in field_params — zero new scoring code."""
    from pisa_spark.corpus import tokens_col

    toks = (
        anchors.join(
            doc_urls.select(F.col("url").alias("dst_url"), "doc_id"),
            "dst_url",
        )
        .select(
            "doc_id",
            F.explode(tokens_col(F.col("anchor"))).alias("term"),
        )
    )
    lens = toks.groupBy("doc_id").agg(F.count(F.lit(1)).alias("field_len"))
    tf = toks.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    return tf.join(lens, "doc_id").select(
        "doc_id",
        F.lit("anchor").alias("field"),
        "term",
        "tf",
        "field_len",
    )


def host_link_graph(links: DataFrame) -> DataFrame:
    """(src_host, dst_host, n_links) — the host-level web graph, self
    edges (intra-host navigation) included; feed
    ``operators.linkgraph.pagerank`` after filtering or keeping them
    per the ranking's needs."""
    return (
        links.select(
            url_host(F.col("src_url")).alias("src_host"),
            url_host(F.col("dst_url")).alias("dst_host"),
        )
        .groupBy("src_host", "dst_host")
        .agg(F.count(F.lit(1)).alias("n_links"))
    )
