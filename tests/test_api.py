"""Reference-shaped user API (api.Crawler): Crawl/Enqueue/resume mapped
onto the batch engine — the switch-over surface for a reference user."""

from crawler_spark.api import Crawler
from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def test_crawl_matches_oracle(spark, tmp_path):
    fx = synth_web(n_pages=30, n_hosts=3, seed=31)
    cw = Crawler(
        spark, fx.web_df(spark), policy=CrawlPolicy(max_depth=4, obey_robots=False),
        host_policy=fx.host_policy_df(spark), workdir=str(tmp_path / "w"),
    )
    got = cw.crawl(*fx.seeds)
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(),
        policy=CrawlPolicy(max_depth=4, obey_robots=False), ticket_at="avail",
    )
    g = [(r["emit_ord"], r["url"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"]) for e in want.emitted]
    assert g == w


def test_enqueue_before_crawl(spark, tmp_path):
    fx = synth_web(n_pages=20, n_hosts=2, seed=3, error_rate=0.0)
    extra = [r["url"] for r in fx.rows[4:6]]
    cw = Crawler(
        spark, fx.web_df(spark),
        policy=CrawlPolicy(max_depth=0, obey_robots=False, max_retry=1),
        workdir=str(tmp_path / "w"),
    )
    n = cw.enqueue(*extra, "not a url")
    assert n == len(extra)  # invalid dropped
    got = cw.crawl(fx.seeds[0])
    urls = {r["url"] for r in got.emitted.collect()}
    for u in extra:
        assert u in urls


def test_resume_via_api(spark, tmp_path):
    fx = synth_web(n_pages=25, n_hosts=3, seed=17)
    policy = CrawlPolicy(max_depth=4, obey_robots=False)
    w1 = str(tmp_path / "full")
    full = Crawler(spark, fx.web_df(spark), policy=policy,
                   host_policy=fx.host_policy_df(spark), workdir=w1).crawl(*fx.seeds)
    w2 = str(tmp_path / "cut")
    cw = Crawler(spark, fx.web_df(spark), policy=policy,
                 host_policy=fx.host_policy_df(spark), workdir=w2,
                 snapshot_every=2, max_pops=8)
    cw.crawl(*fx.seeds)  # interrupted run
    cw2 = Crawler(spark, fx.web_df(spark), policy=policy,
                  host_policy=fx.host_policy_df(spark), workdir=w2)
    got = cw2.resume()
    g = {r["url"]: r["depth"] for r in got.seen.collect()}
    f = {r["url"]: r["depth"] for r in full.seen.collect()}
    assert g == f
