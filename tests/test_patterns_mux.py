"""Pattern matcher (L5), mux (L6), and sniff (L3) golden tests.

Vectors ported from the reference truth tables:
  extract/pattern_test.go:18-45, mux/matcher_test.go:9-37.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.patterns import (
    PART_HOST,
    Pattern,
    accept_filter,
    compile_pattern,
)
from crawler_spark.functions.sniff import (
    absolute_urls_col,
    sniff_absolute_urls,
    sniff_window_location,
    window_location_col,
)
from crawler_spark.operators.mux import Matcher, UrlMux

# ---- pattern truth table (extract/pattern_test.go) ----------------------
P = Pattern(
    accept=["**", "/.*/"],
    reject=[r"/.*\.(doc|xls|ppt|pdf)/"],
    host=["*.google.com"],
    exclude_host=["example.com"],
    dir=[r"\/doc/"],
    file=["*.txt", r"/.*\.html/", "*.pdf", ""],
    exclude_file=["*.mp3"],
)

VECTORS = [
    ("http://www.example.com", False),
    ("http://example.com/doc/hello.txt", False),
    ("http://www.google.com/doc/", True),
    ("http://google.com", False),
    ("http://www.google.com/doc/hello.pdf", False),
    ("http://www.google.com/hello.html", False),
    ("http://www.google.com/doc/hello.html", True),
    ("http://www.google.com/doc/hello.mp3", False),
]


@pytest.mark.parametrize("url,want", VECTORS)
def test_pattern_golden(url, want):
    assert compile_pattern(P).match(url) == want, url


def test_pattern_part():
    cp = compile_pattern(P)
    assert cp.match_part("http://www.google.com/x", PART_HOST)
    assert not cp.match_part("http://example.com/x", PART_HOST)


def test_glob_separator_semantics():
    cp = compile_pattern(Pattern(host=["*.google.com"]))
    # '*' must not cross the '.' separator
    assert not cp.match("http://a.b.google.com/")
    cp2 = compile_pattern(Pattern(host=["**.google.com"]))
    assert cp2.match("http://a.b.google.com/")


def test_pattern_udf(spark):
    df = spark.createDataFrame([(u,) for u, _ in VECTORS], ["url"])
    got = df.select("url", accept_filter(F.col("url"), P).alias("ok")).collect()
    want = dict(VECTORS)
    for r in got:
        assert r["ok"] == want[r["url"]], r["url"]


# ---- mux matcher (mux/matcher_test.go:9-37) ----------------------------
def test_mux_matcher_golden():
    m = Matcher()
    m.add("*", 0)
    m.add("*://example.org/*", 1)
    m.add("http://example.org/*", 2)
    m.add("http://example.org/section/*", 3)
    m.add("= http://example.org/", 4)
    m.add("~ http://example.org/section/hello/.*", 5)
    m.add("^~ http://example.org/foo/*", 6)
    m.add("~ http://example.org/foo/.*", 7)

    cases = {
        "hello, world": 0,
        "https://example.org/": 1,
        "http://example.org/bar": 2,
        "http://example.org/section": 2,
        "http://example.org/section/": 3,
        "http://example.org/": 4,
        "http://example.org/section/hello/world": 5,
        "http://example.org/foo/hello/world": 6,
    }
    for s, want in cases.items():
        v, ok = m.get(s)
        assert ok and v == want, (s, v)


def test_urlmux_config(spark):
    mux = UrlMux()
    mux.allow("http://ok.test/*")
    mux.disallow("http://ok.test/private/*")
    mux.set_score("http://ok.test/hot/*", 500)
    mux.set_freq("http://ok.test/feed*", 3)
    mux.set_max_depth("http://ok.test/*", 4)
    mux.set_host_interval("ok.test", 250)

    assert mux.accept("http://ok.test/a")
    assert not mux.accept("http://ok.test/private/x")
    assert not mux.accept("http://other.test/")
    assert mux.score("http://ok.test/hot/x") == 500
    assert mux.score("http://ok.test/a") == 0
    assert mux.freq("http://ok.test/feed.xml") == 3
    assert mux.freq("http://ok.test/a") == 1
    assert mux.interval_ms("ok.test") == 250
    assert not mux.follow("http://ok.test/a", 4)
    assert mux.follow("http://ok.test/a", 3)

    df = spark.createDataFrame(
        [("http://ok.test/hot/x",), ("http://ok.test/private/x",), ("http://ok.test/feed.xml",)],
        ["url"],
    )
    rows = {r["url"]: r for r in mux.config_for_urls(df).collect()}
    assert rows["http://ok.test/hot/x"]["accept"] and rows["http://ok.test/hot/x"]["score"] == 500
    assert not rows["http://ok.test/private/x"]["accept"]
    assert rows["http://ok.test/feed.xml"]["freq"] == 3
    assert rows["http://ok.test/hot/x"]["follow_depth"] == 4


# ---- sniff (extract/sniff.go) ------------------------------------------
def test_sniff_window_location():
    text = "foo; window.location.href = 'http://a.test/x'; location.href=\"/rel\""
    got = [c.url for c in sniff_window_location("http://base.test/dir/", text)]
    assert got == ["http://a.test/x", "http://base.test/rel"]


def test_sniff_absolute_urls():
    text = "see https://b.test/path?q=1 and http://c.test."
    got = [c.url for c in sniff_absolute_urls("http://base.test/", text)]
    assert "https://b.test/path?q=1" in got


def test_sniff_cols_match_python(spark):
    texts = [
        "window.location.href = 'http://a.test/x'",
        "plain text https://b.test/y no more",
        "",
    ]
    df = spark.createDataFrame([(t,) for t in texts], ["t"])
    rows = df.select(
        window_location_col(F.col("t")).alias("wl"),
        absolute_urls_col(F.col("t")).alias("ab"),
    ).collect()
    assert rows[0]["wl"] == ["http://a.test/x"]
    assert rows[1]["ab"] == ["https://b.test/y"]
    assert rows[2]["wl"] == [] and rows[2]["ab"] == []
