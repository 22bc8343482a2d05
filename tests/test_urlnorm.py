"""Golden-vector tests for URL canonicalization.

Vectors ported from the reference's urlx/normalize_test.go:9-34, plus the
additional cases listed in FIXTURES.md §5.
"""

import pytest

from crawler_spark.functions.urlnorm import canonicalize, resolve

# (input, expected canonical) — normalize_test.go:10-18
GOLDEN = [
    ("http://example.com", "http://example.com"),
    ("hTTp://eXAMPle.com", "http://example.com"),
    ("http://example.com:80", "http://example.com"),
    ("https://example.com:443", "https://example.com"),
    ("http://中文.com", "http://xn--fiq228c.com"),
    ("http://xn--FIQ228c.com", "http://xn--fiq228c.com"),
    ("http://example.com/\xb4\xba\xbd\xda", "http://example.com/%B4%BA%BD%DA"),
    # FIXTURES.md §5 additions
    ("http://example.com:8080/a", "http://example.com:8080/a"),
    ("http://EXAMPLE.com/Path/To#frag", "http://example.com/Path/To"),
    ("http://example.com/a/b/../c", "http://example.com/a/c"),
    ("http://example.com/a//b/", "http://example.com/a/b/"),
    ("http://example.com/a/./b", "http://example.com/a/b"),
    ("http://example.com/a/b/..", "http://example.com/a"),
    ("http://example.com/?q=1", "http://example.com/?q=1"),
    ("http://localhost:9999/x", "http://localhost:9999/x"),
    ("http://127.0.0.1/x", "http://127.0.0.1/x"),
    ("http://example.com/%7Euser", "http://example.com/%7Euser"),
]

INVALID = [
    "http://example.com/?hello=\xb4\xba\xbd\xda",  # invalid UTF-8 query (normalize_test.go:28-30)
    "ftp://example.com/file",  # scheme
    "mailto:a@b.com",
    "http:///path",  # empty host
    "http://ex ample.com/",  # bad host
    "",
    "javascript:void(0)",
]


@pytest.mark.parametrize("raw,want", GOLDEN)
def test_golden(raw, want):
    r = canonicalize(raw)
    assert r.valid, f"{raw!r} rejected: {r.reason}"
    assert r.url == want


@pytest.mark.parametrize("raw", INVALID)
def test_invalid(raw):
    r = canonicalize(raw)
    assert not r.valid


def test_host_key_includes_port():
    r = canonicalize("http://example.com:8080/a")
    assert r.host == "example.com"
    assert r.host_key == "example.com:8080"
    r2 = canonicalize("http://example.com:80/a")
    assert r2.host_key == "example.com"


def test_resolve_relative():
    r = resolve("http://a.com/dir/page.html", "../up")
    assert r.url == "http://a.com/up"
    r = resolve("http://a.com/dir/", "sub/x?q=2#f")
    assert r.url == "http://a.com/dir/sub/x?q=2"
    r = resolve("http://a.com/dir/", "//b.com/abs")
    assert r.url == "http://b.com/abs"
    r = resolve("http://a.com/dir/", "HTTPS://C.COM:443/y")
    assert r.url == "https://c.com/y"


def test_udf_matches_pure(spark):
    from pyspark.sql import functions as F

    from crawler_spark.functions.urlnorm import canonicalize_udf

    raws = [g[0] for g in GOLDEN] + INVALID
    df = spark.createDataFrame([(r,) for r in raws], ["raw"])
    got = df.select("raw", canonicalize_udf("raw").alias("c")).select("raw", "c.*").collect()
    for row in got:
        pure = canonicalize(row.raw)
        assert row.url == pure.url, row.raw
        assert row.valid == pure.valid
        assert row.host_key == pure.host_key
