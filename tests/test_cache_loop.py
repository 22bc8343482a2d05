"""S5 integration: the HTTP fetch cache wired INTO the crawl loop.

The reference's cache sits inside Client.Do (client.go:98-113: fresh →
serve from cache, stale-with-validators → conditional revalidate, else
refetch; post-response Pool.Set/Update/Remove, client.go:155-204 +
cache/cache.go:190-264). Here the engine keeps a fetch_cache state
table, routes every pop at its emit_ms, and merges after the fetch —
and the serial oracle models the identical semantics, so the whole
multi-tick miss→hit→stale→revalidate lifecycle is order-exact.
"""

import pytest

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def run_both(spark, tmp_path, fx, policy, max_pops=None):
    engine = CrawlEngine(
        spark,
        fx.web_df(spark),
        host_policy=fx.host_policy_df(spark),
        policy=policy,
        workdir=str(tmp_path / "work"),
        max_pops=max_pops,
    )
    got = engine.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(),
        policy=policy, ticket_at=policy.ticket_at,
        max_pops=max_pops or 1_000_000,
    )
    return got, want


def assert_match_with_routes(got, want):
    g = [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["status"],
         r["outcome"], r["cache_route"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["status"],
         e["outcome"], e["cache_route"])
        for e in want.emitted
    ]
    assert g == w, (
        f"diverges at {next((i for i, (a, b) in enumerate(zip(g, w)) if a != b), 'len')}: "
        f"engine={g[:6]}... oracle={w[:6]}..."
    )


@pytest.fixture(scope="module")
def fx_cache():
    # cache-heavy revisit fixture: max_visits=3 so every page is popped
    # up to 3 times — first pop misses, later pops hit / revalidate
    # depending on the page's freshness regime
    return synth_web(
        n_pages=25, n_hosts=3, seed=33, max_visits=3, cache_rate=0.85,
        error_rate=0.08, intervals=(0, 30, 60),
    )


def test_cache_loop_matches_oracle(spark, tmp_path, fx_cache):
    """Multi-tick lifecycle, order-exact incl. per-pop cache_route."""
    policy = CrawlPolicy(
        max_depth=5, max_visits=3, min_delay_ms=150, retry_delay_ms=80,
        cache_enabled=True,
    )
    got, want = run_both(spark, tmp_path, fx_cache, policy)
    assert_match_with_routes(got, want)

    # the run exercised every route (else the fixture is too tame)
    routes = {e["cache_route"] for e in want.emitted}
    assert {"miss", "hit", "revalidate"} <= routes, routes

    # final cache state table == oracle's cache pool
    g_cache = {
        r["url"]: (r["fetched_ms"], r["max_age_ms"], r["etag"],
                   r["need_validate"], r["body_bytes"], r["status"])
        for r in got.fetch_cache.collect()
    }
    w_cache = {
        u: (e["fetched_ms"], e["max_age_ms"], e["etag"],
            e["need_validate"], e["body_bytes"], e["status"])
        for u, e in want.cache.items()
    }
    assert g_cache == w_cache
    assert len(g_cache) > 0


def test_cache_disabled_identical_to_r2_semantics(spark, tmp_path, fx_cache):
    """cache_enabled=False on a cache-annotated web: routes are all null
    and the crawl equals the no-cache oracle (regression guard for the
    default path)."""
    policy = CrawlPolicy(max_depth=4, max_visits=2, min_delay_ms=100)
    got, want = run_both(spark, tmp_path, fx_cache, policy)
    g = [
        (r["emit_ord"], r["url"], r["status"], r["outcome"], r["cache_route"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w = [
        (e["emit_ord"], e["url"], e["status"], e["outcome"], None)
        for e in want.emitted
    ]
    assert g == w
    assert got.fetch_cache is None


def test_cache_eviction_budget_keeps_order(spark, tmp_path, fx_cache):
    """Size-bounded eviction changes ROUTES (evicted → miss) but never
    the served content on a static web, so the emitted order/status/
    outcome still equals the no-eviction oracle; the cache table
    respects the byte budget each step (evict_every=1)."""
    policy = CrawlPolicy(
        max_depth=5, max_visits=3, min_delay_ms=150, retry_delay_ms=80,
        cache_enabled=True, cache_max_bytes=400, cache_evict_every=1,
    )
    got, want = run_both(spark, tmp_path, fx_cache, policy)
    g = [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["status"], r["outcome"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["status"], e["outcome"])
        for e in want.emitted
    ]
    assert g == w
    total = sum(r["body_bytes"] or 0 for r in got.fetch_cache.collect())
    assert total <= 400


def test_cache_resume_exact(spark, tmp_path, fx_cache):
    """Snapshot + resume mid-crawl with the cache table durable: the
    resumed run's full emitted log (incl. routes) equals the oracle's."""
    policy = CrawlPolicy(
        max_depth=5, max_visits=3, min_delay_ms=150, retry_delay_ms=80,
        cache_enabled=True,
    )
    eng = CrawlEngine(
        spark, fx_cache.web_df(spark),
        host_policy=fx_cache.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "w2"), snapshot_every=3, max_pops=30,
    )
    eng.run(fx_cache.seeds)
    eng2 = CrawlEngine(
        spark, fx_cache.web_df(spark),
        host_policy=fx_cache.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "w2"), snapshot_every=3,
    )
    got = eng2.resume()
    want = crawl_oracle(
        fx_cache.seeds, fx_cache.oracle_web(), fx_cache.oracle_host_policy(),
        policy=policy, ticket_at=policy.ticket_at,
    )
    assert_match_with_routes(got, want)
