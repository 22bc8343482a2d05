"""Per-URL mux config plumbed into the crawl loop (L6 → C1/C3).

The reference registers per-pattern config on the mux and the crawler
consults it as its Controller (mux/mux.go:173-238 registration,
280-322 Sched/Resched/Accept): Accept is a default-deny pattern
filter, Sched/Resched tickets take the pattern score, freq is the
per-URL revisit budget, DoNotFollow/SetMaxDepth stop link extraction
at the page. Engine and serial oracle consume the same UrlMux, so the
whole per-pattern policy surface is order-exact.
"""

from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.operators.mux import UrlMux
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import WebRow, crawl_oracle
from crawler_spark.sources.fixtures import WEB_SCHEMA


def mux_web():
    rows = []

    def page(url, links, status=200):
        rows.append(dict(
            url=url, host_key="m.test", status=status, out_links=links,
            redirect_to=None, image_id=None, bytes=None, w=None, h=None,
            fmt=None, caption=None, phash=None, cache_max_age_ms=None,
            cache_etag=None, cache_need_validate=False,
        ))

    page("http://m.test/a", ["http://m.test/news/1", "http://m.test/b",
                             "http://m.test/tmp/x"])
    page("http://m.test/b", ["http://m.test/c", "http://m.test/news/2"])
    page("http://m.test/c", ["http://m.test/a"])
    page("http://m.test/news/1", ["http://m.test/news/2"])
    page("http://m.test/news/2", ["http://m.test/news/1"])
    page("http://m.test/tmp/x", [])
    return rows, ["http://m.test/a"]


def build_mux(nofollow_b=True):
    mux = UrlMux()
    mux.allow("http://m.test/*")                 # default-deny otherwise
    mux.disallow("^~ http://m.test/tmp/*")       # /tmp never admitted
    mux.set_score("http://m.test/news/*", 120)   # news jumps the queue
    mux.set_freq("http://m.test/news/*", 2)      # news revisited once
    if nofollow_b:
        mux.do_not_follow("= http://m.test/b")   # b's links not extracted
    return mux


def run_pair(spark, tmp_path, policy, mux, mode="exact"):
    rows, seeds = mux_web()
    web = {
        r["url"]: WebRow(url=r["url"], status=r["status"], out_links=tuple(r["out_links"]))
        for r in rows
    }
    eng = CrawlEngine(
        spark,
        spark.createDataFrame([tuple(r.values()) for r in rows], WEB_SCHEMA),
        policy=policy,
        workdir=str(tmp_path / "work"),
        mode=mode,
        mux=mux,
    )
    got = eng.run(seeds)
    want = crawl_oracle(seeds, web, {}, policy=policy, ticket_at=policy.ticket_at, mux=mux)
    return got, want


def assert_match(got, want):
    g = [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["score"],
         r["status"], r["outcome"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["score"],
         e["status"], e["outcome"])
        for e in want.emitted
    ]
    assert g == w, (
        f"diverges at {next((i for i, (a, b) in enumerate(zip(g, w)) if a != b), 'len')}: "
        f"engine={g} oracle={w}"
    )
    g_seen = {
        r["url"]: (r["depth"], r["done"], r["num_visit"]) for r in got.seen.collect()
    }
    w_seen = {u: (s.depth, s.done, s.num_visit) for u, s in want.seen.items()}
    assert g_seen == w_seen


def test_mux_policy_serial_exact(spark, tmp_path):
    """Arbitrary preemptive scores (news > parents) need serial mode —
    exact for any policy; the whole mux surface is order-golden."""
    policy = CrawlPolicy(max_retry=1, min_delay_ms=100, obey_robots=False)
    got, want = run_pair(spark, tmp_path, policy, build_mux(), mode="serial")
    assert_match(got, want)
    seen = {r["url"] for r in got.seen.collect()}
    assert "http://m.test/tmp/x" not in seen     # Accept default-deny
    assert "http://m.test/c" not in seen         # nofollow parent /b
    nv = {r["url"]: r["num_visit"] for r in got.seen.collect()}
    assert nv["http://m.test/news/1"] == 2       # freq pattern
    assert nv["http://m.test/news/2"] == 2
    assert nv["http://m.test/a"] == 1            # default freq 1
    # the resched ticket carried the mux score (Resched, mux.go:293-296)
    news_pops = [
        r["score"] for r in got.emitted
        .where(F.col("url") == "http://m.test/news/1").collect()
    ]
    assert news_pops == [120, 120]


def test_mux_policy_batched_exact_uniform_scores(spark, tmp_path):
    """With constant scores the default batched exact mode holds the
    serial order; freq + accept + nofollow still apply per URL."""
    mux = UrlMux()
    mux.allow("http://m.test/*")
    mux.disallow("^~ http://m.test/tmp/*")
    mux.set_freq("http://m.test/news/*", 3)
    policy = CrawlPolicy(max_retry=1, min_delay_ms=100, obey_robots=False)
    got, want = run_pair(spark, tmp_path, policy, mux, mode="exact")
    assert_match(got, want)
    nv = {r["url"]: r["num_visit"] for r in got.seen.collect()}
    assert nv["http://m.test/news/1"] == 3
    assert nv["http://m.test/b"] == 1
