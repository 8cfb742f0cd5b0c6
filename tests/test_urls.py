"""URL canonicalization operators: parse/canonical/domain column ops."""

from __future__ import annotations

from pyspark.sql import functions as F

from oic_options_chains_spark.operators.urls import (
    canonical_url,
    registered_domain,
    url_parts,
)


def _run(spark, urls):
    df = spark.createDataFrame([(i, u) for i, u in enumerate(urls)], "i long, url string")
    return {
        r.i: (r.c, r.d)
        for r in df.select(
            "i",
            canonical_url(F.col("url")).alias("c"),
            registered_domain(F.col("url")).alias("d"),
        ).collect()
    }


def test_canonicalization_rules(spark):
    got = _run(
        spark,
        [
            "HTTP://WWW.Example.COM:80/a/b?utm_source=x&z=2&a=1#frag",
            "https://sub.Example.com:443/",
            "https://example.com:8443/x",
            "http://example.com",                       # empty path -> /
            "http://example.com/?fbclid=abc&gclid=d",   # all params dropped
            "http://a.b.c.example.co/x",                # >2 labels
        ],
    )
    assert got[0] == ("http://example.com/a/b?a=1&z=2", "example.com")
    assert got[1] == ("https://sub.example.com/", "example.com")
    assert got[2] == ("https://example.com:8443/x", "example.com")
    assert got[3] == ("http://example.com/", "example.com")
    assert got[4] == ("http://example.com/", "example.com")
    assert got[5] == ("http://a.b.c.example.co/x", "example.co")


def test_non_urls_quarantine_as_null(spark):
    got = _run(
        spark,
        [
            "not a url",
            "example.com/no-scheme",
            "http://user:pw@example.com/",  # userinfo unsupported -> NULL
            "http:///missing-host",
            "",
        ],
    )
    for i in range(5):
        assert got[i] == (None, None), f"case {i} must be NULL"


def test_url_parts_fields(spark):
    df = spark.createDataFrame(
        [(1, "HTTPS://Host.Example.org:8443/p/q?x=1&y=2#frag")], "i long, url string"
    )
    p = url_parts(F.col("url"))
    r = df.select(
        *[p[k].alias(k) for k in ("scheme", "host", "port", "path", "query", "fragment")]
    ).collect()[0]
    assert (r.scheme, r.host, r.port) == ("https", "host.example.org", 8443)
    assert (r.path, r.query, r.fragment) == ("/p/q", "x=1&y=2", "frag")
