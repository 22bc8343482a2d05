"""Sitemap parser (S9) and URL-trie trap guard (L8) tests.

Vectors from sitemap/sitemap_test.go:11+ and
sample/urltrie/urltrie_test.go:18-60.
"""

import pytest

from crawler_spark.operators.urltrie import (
    PyTrie,
    filter_trapped,
    trap_prefixes,
)
from crawler_spark.sources.sitemap import (
    MS,
    entries_to_seeds,
    parse_sitemap,
    parse_sitemaps_df,
)

SITEMAP_XML = """
<urlset xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">
<url>
  <loc>http://www.example.com/</loc>
  <lastmod>2005-01-01</lastmod>
  <changefreq>monthly</changefreq>
  <priority>0.8</priority>
</url>
<url>
  <loc>http://www.example.com/catalog?item=12&amp;desc=vacation_hawaii</loc>
  <changefreq>weekly</changefreq>
</url>
<url>
  <loc>http://www.example.com/catalog?item=74&amp;desc=vacation_newfoundland</loc>
  <lastmod>2004-12-23T18:00:15+00:00</lastmod>
  <priority>0.3</priority>
</url>
</urlset>
"""


def test_parse_sitemap_golden():
    entries, children = parse_sitemap(SITEMAP_XML)
    assert children == []
    assert len(entries) == 3
    e0 = entries[0]
    assert e0.loc == "http://www.example.com/"
    assert e0.priority == 0.8
    assert e0.changefreq_ms == MS["monthly"]
    assert e0.lastmod_ms == 1104537600000  # 2005-01-01 UTC
    e1 = entries[1]
    assert e1.changefreq_ms == MS["weekly"] and e1.lastmod_ms is None and e1.priority == 0.0
    e2 = entries[2]
    assert e2.lastmod_ms == 1103824815000  # 2004-12-23T18:00:15Z


def test_parse_sitemap_index():
    xml = """<sitemapindex><sitemap><loc>http://a.test/s1.xml</loc></sitemap>
    <sitemap><loc>http://a.test/s2.xml</loc></sitemap></sitemapindex>"""
    entries, children = parse_sitemap(xml)
    assert entries == [] and children == ["http://a.test/s1.xml", "http://a.test/s2.xml"]


def test_invalid_changefreq_raises():
    xml = "<urlset><url><loc>http://a.test/</loc><changefreq>sometimes</changefreq></url></urlset>"
    with pytest.raises(ValueError):
        parse_sitemap(xml)


def test_parse_sitemaps_df(spark):
    df = spark.createDataFrame(
        [("http://www.example.com/sitemap.xml", SITEMAP_XML), ("http://bad.test/s.xml", "<not-xml")],
        ["url", "xml"],
    )
    entries = parse_sitemaps_df(df)
    rows = entries.collect()
    assert len(rows) == 3  # bad XML contributes nothing
    seeds = {r["seed"]: r for r in entries_to_seeds(entries).collect()}
    assert seeds["http://www.example.com/"]["score"] == 799  # round(0.8*999)
    assert seeds["http://www.example.com/"]["interval_ms"] == MS["monthly"]


# ---- urltrie ------------------------------------------------------------
def test_pytrie_add_has():
    trie = PyTrie(lambda d: 1 << 30)
    data = [
        "http://localhost/pkg/net/",
        "http://localhost/pkg/net/http/",
        "http://localhost/pkg/",
        "http://localhost/doc/",
        "http://localhost/",
        "http://localhost/src/?page=1&id=1",
        "http://localhost/?hello=world",
    ]
    for u in data:
        assert trie.add(u), u
    for u in data:
        assert trie.has(u), u


def test_pytrie_threshold():
    # urltrie_test.go:44-60 — thresholds limit sibling fan-out
    class T:
        def __init__(self):
            self.t = 1

        def __call__(self, depth):
            return self.t

    th = T()
    trie = PyTrie(th)
    th.t = 1
    assert trie.add("http://localhost/pkg/net/http/httptest")
    assert not trie.add("http://localhost/pkg/net/url")
    th.t = 2
    assert trie.add("http://localhost/pkg/net/url")
    assert not trie.add("http://localhost/pkg/net/hello")


def test_trap_prefixes_and_filter(spark):
    # a calendar-trap host: 50 distinct children under /cal/; a normal host
    rows = [(f"http://trap.test/cal/day{i}", "trap.test") for i in range(50)]
    rows += [("http://ok.test/a", "ok.test"), ("http://ok.test/b", "ok.test")]
    rows += [("http://trap.test/about", "trap.test")]
    df = spark.createDataFrame(rows, ["url", "host_key"])
    traps = trap_prefixes(df, "CASE WHEN depth <= 1 THEN 100 ELSE 20 END", exact=True)
    t = [(r["host"], r["prefix"], r["depth"]) for r in traps.collect()]
    assert ("trap.test", "/cal", 2) in t
    assert all(h != "ok.test" for h, _, _ in t)

    kept = filter_trapped(df, traps)
    urls = {r["url"] for r in kept.collect()}
    assert "http://ok.test/a" in urls
    assert "http://trap.test/about" in urls
    assert not any("/cal/" in u for u in urls)


def test_never_interval_is_overflow_safe():
    """MS['never'] flows into host_policy.interval_ms; selection computes
    last_ms + interval_ms in long arithmetic — the sentinel must leave
    headroom for any realistic clock value (no ANSI overflow / negative
    wrap that would make a 'never' host immediately due)."""
    from crawler_spark.sources.sitemap import MS

    year_3000_ms = 32_503_680_000_000
    assert MS["never"] + year_3000_ms < (1 << 62)
    assert MS["never"] > 10 * 365 * 86_400_000  # still "never" in practice
