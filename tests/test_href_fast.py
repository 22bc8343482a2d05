"""Fast-path href extraction (VERDICT r4 item 6): the JVM regexp
pre-scan must agree with the full Python tokenizer everywhere it claims
eligibility, and hazard pages must route to the tokenizer.  Equality is
asserted over (a) handcrafted hazard/edge vectors and (b) the synthetic
html web fixture the E2E crawl uses."""

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.extract import (
    href_fast_eligible,
    href_urls_auto,
    href_urls_udf,
)
from crawler_spark.sources.fixtures import synth_web, to_html_web

BASE = "http://a.test/dir/page.html"

# (html, must_be_fast | None) — None: either route is fine, only equality
# with the tokenizer is asserted
VECTORS = [
    # clean pages the fast path must take
    ('<html><body><a href="x.html">x</a></body></html>', True),
    ('<a href="/abs">a</a><a href="http://b.test/p">b</a>', True),
    ('<A HREF="UPPER.html">c</A>', True),
    ('<a class="k" href="q?x=1&amp;y=2">ent</a>', True),
    ('<a href="s p a c e">w</a><a href="">empty-dropped</a>', True),
    ("<p>no links at all</p>", True),
    ('<script>var s="<a href=\'no\'>";</script><a href="yes">y</a>', True),
    ("<!-- <a href='no'> --><a href=\"yes\">y</a>", True),
    ('<style>a:after{content:"<a href=x>"}</style><a href="y">y</a>', True),
    ('<a\nhref="nl.html">nl</a>', True),
    ("<a href=\"x\"/><a href='single'>s</a>", False),  # single-quoted
    ("<a href=unquoted>u</a>", False),
    ('<base href="/sub/"><a href="p.html">p</a>', False),
    ('<script><a href="swallowed">s</a>', False),  # unterminated CDATA
    ('<a title="a>b" href="x.html">gt-in-attr</a>', False),
    ('<a href="one" href="two">dup</a>', False),
    ('<a href="open', False),  # unterminated quote
    ('<!-- unterminated <a href="no">', False),
    # data-href is a DIFFERENT attribute — html.parser yields no link;
    # the count-equality hazard routes it to the tokenizer
    ('<a data-href="u">x</a>', False),
    # hreflang contains the substring 'href' but is subtracted from the
    # count, so this common shape stays on the fast path
    ('<a hreflang="en" href="x.html">l</a>', True),
    (None, False),
    ("", None),
]


def _run_both(spark, pages):
    df = spark.createDataFrame(
        [(BASE, h) for h in pages], "base string, html string"
    )
    out = df.select(
        "html",
        href_urls_auto(F.col("base"), F.col("html")).alias("auto"),
        href_urls_udf()(F.col("base"), F.col("html")).alias("full"),
        href_fast_eligible(F.col("html")).alias("fast"),
    )
    return out.collect()


def test_vectors_equal_and_routed(spark):
    rows = _run_both(spark, [h for h, _ in VECTORS])
    by_html = {r["html"]: r for r in rows}
    for html, want_fast in VECTORS:
        r = by_html[html]
        assert list(r["auto"] or []) == list(r["full"] or []), html
        if want_fast is not None:
            assert bool(r["fast"]) == want_fast, html


def test_fixture_corpus_equality(spark):
    fx = to_html_web(synth_web(n_pages=60, n_hosts=5, seed=11, intervals=(0,)))
    pages = [r["html"] for r in fx.rows]
    df = spark.createDataFrame(
        [(r["url"], r["html"]) for r in fx.rows], "base string, html string"
    )
    out = df.select(
        href_urls_auto(F.col("base"), F.col("html")).alias("auto"),
        href_urls_udf()(F.col("base"), F.col("html")).alias("full"),
        href_fast_eligible(F.col("html")).alias("fast"),
    ).collect()
    assert len(out) == len(pages)
    n_fast = sum(1 for r in out if r["fast"])
    for r in out:
        assert list(r["auto"] or []) == list(r["full"] or [])
    # the fixture mixes plain pages with <base>-rebased ones: both routes
    # must actually be exercised by this corpus
    assert 0 < n_fast < len(out)


@pytest.mark.parametrize("positions", [(("img", "src"),)])
def test_non_default_positions_use_tokenizer(spark, positions):
    df = spark.createDataFrame(
        [(BASE, '<img src="i.png"><a href="x">a</a>')], "base string, html string"
    )
    got = df.select(
        href_urls_auto(F.col("base"), F.col("html"), positions=positions).alias("u")
    ).collect()[0]["u"]
    assert got == ["http://a.test/dir/i.png"]
