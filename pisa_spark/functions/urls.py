"""URL canonicalization and host-level corpus analytics.

The Common-Crawl-pipeline half the index build leans on: the same
page fetched as ``http://WWW.Example.test/p/x?utm=...#frag`` and
``https://example.test/p/x`` must collapse to one canonical key
before dedup, and per-host aggregates drive crawl-budget / spam
decisions. All pure column expressions (regexp on the JVM, one
groupBy per aggregate — shuffles keyed by canonical url / host, which
spread a 10^12-page corpus evenly since hosts are the natural
partition unit of a crawl).

Canonicalization contract (pinned; oracle twin mirrors it verbatim):
lower-case; strip scheme (http/https), a leading ``www.``, query and
fragment (first of ``?`` or ``#`` onward), and a single trailing
slash. Host = canonical url up to the first ``/``; registered domain
= last two dot-labels of the host (heuristic — a public-suffix list
is a data file, not an algorithm change).

Reference parity note: the reference consumes pre-keyed interaction
CSVs and has no URL stage; this is "beyond the reference"
web-pipeline surface. The dedup tie-break (latest ``warc_ts`` wins,
url as deterministic tie-break) matches the index's
newest-crawl-wins contract in pisa_spark/corpus.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F


def url_canonical(url: Column) -> Column:
    """Canonical form of a URL per the module contract."""
    u = F.lower(url)
    u = F.regexp_replace(u, "^https?://", "")
    u = F.regexp_replace(u, "^www\\.", "")
    u = F.regexp_replace(u, "[?#].*$", "")
    return F.regexp_replace(u, "/$", "")


def url_host(url: Column) -> Column:
    """Host of the canonical URL (up to the first '/')."""
    return F.regexp_extract(url_canonical(url), "^[^/]*", 0)


def registered_domain(host: Column) -> Column:
    """Last two dot-labels ('a.b.c.test' -> 'c.test'); the host itself
    when it has no dot."""
    return F.coalesce(
        F.nullif(F.regexp_extract(host, "([^.]+\\.[^.]+)$", 1), F.lit("")),
        host,
    )


def url_blocklist_filter(
    pages: DataFrame,
    blocked_hosts: DataFrame | None = None,
    blocked_domains: DataFrame | None = None,
    blocked_patterns: list[str] | None = None,
) -> DataFrame:
    """The Dolma/CCNet domain-filter curation stage: drop pages whose
    canonical host is blocklisted, whose REGISTERED DOMAIN is
    blocklisted (blocks every subdomain), or whose canonical URL
    matches any blocked regex — adult/malware/boilerplate domain lists
    and path rules, applied before anything expensive touches the
    page.

    blocked_hosts / blocked_domains: one-column (host / domain)
    relations — broadcast anti-joins (the lists are list-sized, the
    crawl is not); blocked_patterns: regexes over the CANONICAL url,
    compiled into one codegen rlike chain — no shuffle at all for the
    pattern leg. Evaluation order is immaterial (pure intersection of
    keeps); all three legs optional."""
    out = pages
    host = url_host(F.col("url"))
    if blocked_patterns:
        keep = F.lit(True)
        for p in blocked_patterns:
            keep = keep & ~url_canonical(F.col("url")).rlike(p)
        out = out.filter(keep)
    if blocked_hosts is not None:
        out = out.withColumn("__h", host).join(
            F.broadcast(
                blocked_hosts.select(F.col("host").alias("__h"))
            ),
            "__h",
            "left_anti",
        ).drop("__h")
    if blocked_domains is not None:
        out = out.withColumn(
            "__d", registered_domain(url_host(F.col("url")))
        ).join(
            F.broadcast(
                blocked_domains.select(F.col("domain").alias("__d"))
            ),
            "__d",
            "left_anti",
        ).drop("__d")
    return out


def host_stats(pages: DataFrame) -> DataFrame:
    """Per-host crawl aggregates: page count, distinct canonical urls,
    total/mean extracted-text chars, and first/last crawl timestamps.

    One hash shuffle keyed by host — the crawl's natural partitioning,
    so 10^12 pages spread across hosts without a hot key (a single
    pathological host is a data problem the aggregate itself surfaces
    via n_pages)."""
    return (
        pages.select(
            url_host(F.col("url")).alias("host"),
            url_canonical(F.col("url")).alias("canon"),
            F.length("text").alias("chars"),
            "warc_ts",
        )
        .groupBy("host")
        .agg(
            F.count(F.lit(1)).alias("n_pages"),
            F.countDistinct("canon").alias("n_urls"),
            F.sum("chars").alias("total_chars"),
            F.round(F.avg("chars"), 6).alias("mean_chars"),
            F.min("warc_ts").alias("first_crawl"),
            F.max("warc_ts").alias("last_crawl"),
        )
    )


def url_dedup_latest(pages: DataFrame) -> DataFrame:
    """One row per canonical URL: the newest crawl wins (max warc_ts,
    url string as deterministic tie-break). Window partitioned by the
    canonical key — a single shuffle, per-group state is one row, so
    skew is bounded by the most-recrawled single page, not the corpus.

    Output: (canonical_url, url, warc_ts) of the kept row."""
    canon = pages.withColumn("canonical_url", url_canonical(F.col("url")))
    w = Window.partitionBy("canonical_url").orderBy(
        F.col("warc_ts").desc(), F.col("url").asc()
    )
    return (
        canon.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("canonical_url", "url", "warc_ts")
    )
