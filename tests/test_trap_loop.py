"""L8 integration: the URL-trie trap guard wired into the crawl loop.

Reference behavior: the per-host trie rejects a link during admission
when a path node's child count exceeds threshold(depth)
(sample/urltrie/urltrie.go:65-193, wired as an Accept hook in
example/static-crawler/main.go:42-49). The engine's batch guard is the
MONOTONE refinement — a trapped prefix rejects its whole candidate
batch — so its rejections are a superset of the serial trie's: the
trap host is truncated at least as hard, and healthy hosts are
untouched in both.
"""

from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import WebRow, crawl_oracle
from crawler_spark.sources.fixtures import WEB_SCHEMA

THRESH_SQL = "CASE WHEN depth <= 1 THEN 100 ELSE 6 END"


def thresh_fn(depth: int) -> int:
    return 100 if depth <= 1 else 6


def calendar_trap_web():
    """Healthy chain on a.test; exponential /cal/ date explosion on
    t.test (the classic calendar trap). No cross-host links, so the
    healthy host's schedule is provably independent of the trap."""
    rows = []

    def page(url, host, links):
        rows.append(dict(
            url=url, host_key=host, status=200, out_links=links,
            redirect_to=None, image_id=None, bytes=None, w=None, h=None,
            fmt=None, caption=None, phash=None, cache_max_age_ms=None,
            cache_etag=None, cache_need_validate=False,
        ))

    for j in range(6):
        page(f"http://a.test/p{j}", "a.test",
             [f"http://a.test/p{(j + 1) % 6}", f"http://a.test/p{(j + 2) % 6}"])
    page("http://t.test/start", "t.test",
         ["http://t.test/cal/d0", "http://t.test/cal/d1"])
    for k in range(30):
        page(f"http://t.test/cal/d{k}", "t.test",
             [f"http://t.test/cal/d{2 * k + 2}", f"http://t.test/cal/d{2 * k + 3}"])
    seeds = ["http://a.test/p0", "http://t.test/start"]
    return rows, seeds


def run_pair(spark, tmp_path, policy, trap_threshold):
    rows, seeds = calendar_trap_web()
    web = {r["url"]: WebRow(url=r["url"], status=200, out_links=tuple(r["out_links"]))
           for r in rows}
    eng = CrawlEngine(
        spark,
        spark.createDataFrame([tuple(r.values()) for r in rows], WEB_SCHEMA),
        policy=policy,
        workdir=str(tmp_path / "work"),
    )
    got = eng.run(seeds)
    want = crawl_oracle(seeds, web, {}, policy=policy, trap_threshold=trap_threshold)
    return got, want


def test_calendar_trap_truncated_healthy_completes(spark, tmp_path):
    policy = CrawlPolicy(
        max_depth=40, max_retry=1, obey_robots=False, trap_threshold_expr=THRESH_SQL,
    )
    got, want = run_pair(spark, tmp_path, policy, thresh_fn)

    g_seen = {r["url"] for r in got.seen.collect()}
    w_seen = set(want.seen)

    # healthy host fully crawled, schedule identical to the serial oracle
    g_healthy = sorted(
        (r["url"], r["emit_ms"], r["depth"], r["status"], r["outcome"])
        for r in got.emitted.where(F.col("host_key") == "a.test").collect()
    )
    w_healthy = sorted(
        (e["url"], e["emit_ms"], e["depth"], e["status"], e["outcome"])
        for e in want.emitted if e["host_key"] == "a.test"
    )
    assert g_healthy == w_healthy
    assert {f"http://a.test/p{j}" for j in range(6)} <= g_seen

    # the serial trie admits exactly threshold(2)=6 calendar dates
    w_dates = {u for u in w_seen if "/cal/" in u}
    assert len(w_dates) == 6
    assert want.rejected.get("link-trap", 0) > 0

    # monotone batch guard: engine admits a SUBSET of the serial set —
    # the trap is truncated at least as hard, never leaked past it
    g_dates = {u for u in g_seen if "/cal/" in u}
    assert g_dates <= w_dates
    assert len(g_dates) <= len(w_dates)  # never beyond the serial cap
    # the non-trap t.test entry page is still crawled
    assert "http://t.test/start" in g_seen


def test_trap_guard_stale_cadence_still_truncates(spark, tmp_path):
    """trap_check_every=3: the census refresh is amortized; the trap
    still gets cut (possibly a refresh later) and healthy hosts match."""
    policy = CrawlPolicy(
        max_depth=40, max_retry=1, obey_robots=False, trap_threshold_expr=THRESH_SQL,
        trap_check_every=3,
    )
    got, want = run_pair(spark, tmp_path, policy, thresh_fn)
    g_seen = {r["url"] for r in got.seen.collect()}
    g_dates = {u for u in g_seen if "/cal/" in u}
    assert len(g_dates) < 30
    assert {f"http://a.test/p{j}" for j in range(6)} <= g_seen


def test_no_guard_crawls_the_whole_trap(spark, tmp_path):
    """Control: without the guard the engine walks the full explosion
    (up to max_depth), proving the guard is what truncates it."""
    policy = CrawlPolicy(max_depth=40, max_retry=1, obey_robots=False)
    got, want = run_pair(spark, tmp_path, policy, None)
    g_dates = {u for r in got.seen.collect() if "/cal/" in (u := r["url"])}
    assert len(g_dates) == 62  # d0..d61: 30 live pages + dead-link tails
    # and the engine still matches the (guard-free) oracle exactly
    g = [(r["emit_ord"], r["url"], r["emit_ms"], r["status"]) for r in
         got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"], e["status"]) for e in want.emitted]
    assert g == w
