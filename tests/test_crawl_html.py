"""Crawl-with-real-HTML E2E (VERDICT r3 #4): the web fixture carries raw
HTML bodies and NO pre-extracted links — the engine's fetch must
tokenize each popped body with the real extractor (functions/extract:
streaming parser, <base> rebasing, resolution against the post-redirect
URL), and the serial oracle does the same string algebra. This closes
the last gap between "extractor exists" and "the engine does what the
reference's handler does" (handle.go:63-160).
"""

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import WebRow, crawl_oracle
from crawler_spark.sources.fixtures import synth_web, to_html_web

from tests.test_crawl_e2e import assert_match, run_both


def test_html_crawl_matches_oracle(spark, tmp_path):
    """Full-graph golden test in html mode: order + seen set exact."""
    fx = to_html_web(synth_web(n_pages=40, n_hosts=4, seed=7, intervals=(0,)))
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=100)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)
    # the crawl actually went somewhere: link extraction produced depth>0
    assert any(r["depth"] > 0 for r in got.emitted.collect())


def test_html_crawl_politeness_and_redirects(spark, tmp_path):
    """Mixed intervals + redirects: links must resolve against the FINAL
    (post-redirect) URL on both sides."""
    fx = to_html_web(synth_web(n_pages=60, n_hosts=4, seed=13))
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)


def test_html_base_rebasing_cross_host(spark, tmp_path):
    """Handcrafted <base> page: a relative href on a page whose <base>
    points at another host must be crawled ON that other host — and the
    engine must agree with the oracle exactly."""
    rows = [
        dict(
            url="http://a.test/start",
            host_key="a.test",
            status=200,
            html=(
                '<html><head><base href="http://b.test/dir/"></head><body>'
                '<a href="page.html">rebased</a>'
                '<a href="http://a.test/abs">absolute survives base</a>'
                "</body></html>"
            ),
            redirect_to=None,
        ),
        dict(
            url="http://b.test/dir/page.html",
            host_key="b.test",
            status=200,
            html="<html><body>leaf</body></html>",
            redirect_to=None,
        ),
        dict(
            url="http://a.test/abs",
            host_key="a.test",
            status=200,
            html="<html><body>leaf</body></html>",
            redirect_to=None,
        ),
    ]
    web = spark.createDataFrame(
        rows, "url string, host_key string, status int, html string, redirect_to string"
    )
    policy = CrawlPolicy(max_depth=3, max_retry=1)
    eng = CrawlEngine(spark, web, policy=policy, workdir=str(tmp_path / "w"))
    assert eng.html_mode
    got = eng.run(["http://a.test/start"])
    want = crawl_oracle(
        ["http://a.test/start"],
        {r["url"]: WebRow(url=r["url"], status=r["status"], html=r["html"]) for r in rows},
        {},
        policy=policy,
        ticket_at=policy.ticket_at,
    )
    assert_match(got, want)
    g_seen = {r["url"] for r in got.seen.collect()}
    assert "http://b.test/dir/page.html" in g_seen  # the rebase actually bit
    assert "http://a.test/abs" in g_seen
