"""URL blocklist filtering (functions/urls.py url_blocklist_filter):
host / registered-domain / canonical-pattern legs and their composition."""


# ---------------------------------------------------------------------------
# blocklist filtering
# ---------------------------------------------------------------------------

def test_url_blocklist_filter_legs(spark):
    from pisa_spark.functions.urls import url_blocklist_filter

    pages = spark.createDataFrame(
        [
            ("https://ads.bad.test/x",),
            ("https://sub.deep.bad.test/y",),
            ("http://WWW.Good.test/page/",),
            ("https://good.test/spam/offer",),
            ("https://other.test/fine",),
        ],
        "url string",
    )
    hosts = spark.createDataFrame([("ads.bad.test",)], "host string")
    domains = spark.createDataFrame([("bad.test",)], "domain string")
    # host leg: exact canonical host only
    kept = {
        r["url"]
        for r in url_blocklist_filter(pages, blocked_hosts=hosts).collect()
    }
    assert "https://ads.bad.test/x" not in kept
    assert "https://sub.deep.bad.test/y" in kept  # different host
    # domain leg: blocks every subdomain of the registered domain
    kept = {
        r["url"]
        for r in url_blocklist_filter(
            pages, blocked_domains=domains
        ).collect()
    }
    assert kept == {
        "http://WWW.Good.test/page/",
        "https://good.test/spam/offer",
        "https://other.test/fine",
    }
    # pattern leg: regex over the CANONICAL url (lowercased, scheme/
    # www/trailing-slash stripped)
    kept = {
        r["url"]
        for r in url_blocklist_filter(
            pages, blocked_patterns=["/spam/"]
        ).collect()
    }
    assert "https://good.test/spam/offer" not in kept
    assert len(kept) == 4
    # all three legs compose as an intersection of keeps
    kept = {
        r["url"]
        for r in url_blocklist_filter(
            pages,
            blocked_hosts=hosts,
            blocked_domains=domains,
            blocked_patterns=["/spam/"],
        ).collect()
    }
    assert kept == {"http://WWW.Good.test/page/", "https://other.test/fine"}
    # no legs -> identity
    assert url_blocklist_filter(pages).count() == 5
