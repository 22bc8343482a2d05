"""LSM state maintenance (state_maintenance="lsm") — the 10^10-URL
path where frontier/seen are an immutable base + per-step frames and
the full-state rewrite amortizes to the compaction cadence.

Exactness contract: every run must be bit-identical to rewrite mode
(and hence to the serial oracle) — order, seen set, resume. Compaction
cadences are set aggressively small here so every test crosses several
compactions, exercising the frame/fold machinery, not just the bases."""

from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def _emit(res):
    return [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["status"], r["outcome"])
        for r in res.emitted.orderBy("emit_ord").collect()
    ]


def _seen(res):
    return {
        r["url"]: (r["depth"], r["done"], r["num_visit"], r["num_retry"])
        for r in res.seen.collect()
    }


def _oracle(fx, policy, max_pops=1_000_000):
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(), policy=policy,
        ticket_at=policy.ticket_at, max_pops=max_pops,
    )
    return (
        [
            (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["status"], e["outcome"])
            for e in want.emitted
        ],
        {u: (s.depth, s.done, s.num_visit, s.num_retry) for u, s in want.seen.items()},
    )


def test_lsm_matches_serial_oracle(spark, tmp_path):
    """Revisits + retries + politeness intervals, compaction every 2
    steps / 30 rows: emitted order and seen set equal the serial oracle."""
    fx = synth_web(n_pages=40, n_hosts=4, seed=42)
    policy = CrawlPolicy(max_depth=6, max_visits=2, min_delay_ms=200, retry_delay_ms=60)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "w"),
        state_maintenance="lsm", compact_rows=30, compact_steps=2,
    )
    got = eng.run(fx.seeds)
    w_emit, w_seen = _oracle(fx, policy)
    assert eng.n_compactions >= 2, "compactions actually exercised"
    assert _emit(got) == w_emit
    assert _seen(got) == w_seen


def test_lsm_equals_rewrite_with_bloom(spark, tmp_path):
    """LSM with the bloom prefilter (whose rebuild cadence is unified
    with compaction) equals rewrite mode row-for-row, including the
    max_pops truncation tail."""
    fx = synth_web(n_pages=120, n_hosts=8, seed=13, links_per_page=(2, 8), zipf_s=1.5)
    policy = CrawlPolicy(
        max_depth=8, retry_delay_ms=75, bloom_prefilter=True, bloom_shards=4,
    )
    runs = {}
    for mode in ("rewrite", "lsm"):
        eng = CrawlEngine(
            spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
            policy=policy, workdir=str(tmp_path / mode), max_pops=90,
            state_maintenance=mode, compact_rows=40, compact_steps=3,
        )
        res = eng.run(fx.seeds)
        runs[mode] = (_emit(res), _seen(res), eng.n_compactions)
    assert runs["lsm"][2] >= 1
    assert runs["lsm"][0] == runs["rewrite"][0]
    assert runs["lsm"][1] == runs["rewrite"][1]


def test_lsm_snapshot_resume_exact(spark, tmp_path):
    """Snapshots compact first (bases ARE the stored state); resuming an
    interrupted LSM run reproduces the uninterrupted serial order."""
    fx = synth_web(n_pages=30, n_hosts=3, seed=11)
    policy = CrawlPolicy(max_depth=5, retry_delay_ms=60)
    wd = str(tmp_path / "w")
    eng1 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2, max_pops=12,
        state_maintenance="lsm", compact_rows=25, compact_steps=3,
    )
    part = eng1.run(fx.seeds)
    assert part.pops >= 12
    assert eng1.store.latest() is not None

    eng2 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2,
        state_maintenance="lsm", compact_rows=25, compact_steps=3,
    )
    full = eng2.resume()
    w_emit, w_seen = _oracle(fx, policy)
    assert _emit(full) == w_emit
    assert _seen(full) == w_seen


def test_lsm_delta_precedence_lookup(spark, tmp_path):
    """A url revisited BETWEEN compactions reads its control fields
    (num_visit, last_ms) from the delta row, not the stale base row:
    force revisits inside one compaction window and check num_visit
    reaches max_visits with done=True."""
    fx = synth_web(n_pages=12, n_hosts=2, seed=21, max_visits=3, error_rate=0.0)
    policy = CrawlPolicy(max_depth=4, max_visits=3, min_delay_ms=50)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "w"),
        state_maintenance="lsm", compact_rows=10_000, compact_steps=1_000,
    )
    got = eng.run(fx.seeds)
    assert eng.n_compactions == 1, "only the final materialization ran"
    w_emit, w_seen = _oracle(fx, policy)
    assert _emit(got) == w_emit
    assert _seen(got) == w_seen
    done_visits = {
        r["url"]: r["num_visit"] for r in got.seen.where(F.col("done")).collect()
    }
    # ok-pages revisit to the cap; dropped/errored urls finish earlier
    assert done_visits and max(done_visits.values()) == 3
    assert all(v <= 3 for v in done_visits.values())


def test_lsm_with_cache_and_trap_guard(spark, tmp_path):
    """LSM composed with the round-3 integrations: S5 cache routing
    (delta-precedence lookup + cache joins in the same fetch plan) and
    the L8 trap census (which scans the base∪delta membership view) —
    order-exact incl. per-pop cache_route vs the serial oracle, across
    compaction boundaries."""
    from crawler_spark.plans.oracle import crawl_oracle

    fx = synth_web(
        n_pages=25, n_hosts=3, seed=33, max_visits=3, cache_rate=0.85,
        error_rate=0.08, intervals=(0, 30, 60),
    )
    policy = CrawlPolicy(
        max_depth=5, max_visits=3, min_delay_ms=150, retry_delay_ms=80,
        cache_enabled=True,
        trap_threshold_expr="CASE WHEN depth <= 1 THEN 1000 ELSE 1000 END",
    )
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "w"),
        state_maintenance="lsm", compact_rows=30, compact_steps=3,
    )
    got = eng.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(),
        policy=policy, ticket_at=policy.ticket_at,
    )
    assert eng.n_compactions >= 2
    g = [
        (r["emit_ord"], r["url"], r["emit_ms"], r["status"], r["outcome"], r["cache_route"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["status"], e["outcome"], e["cache_route"])
        for e in want.emitted
    ]
    assert g == w
    routes = {e["cache_route"] for e in want.emitted}
    assert {"miss", "hit"} <= routes, routes
