"""Whole-crawl golden tests: CrawlEngine vs the serial Python oracle.

The reference's own precedent is godoc_test.go:24-47,53-145 — crawl a
live godoc server and DeepEqual the crawled set + per-URL depth against
`go list std`. Here the "web" is the deterministic synthetic fixture
(sources/fixtures.py) and the oracle is the discrete-event simulation of
the reference scheduler semantics (plans/oracle.py). We assert:

  * exact crawl order: (emit_ord, url, emit_ms, depth, status, outcome)
  * exact final URL-seen set: (url, depth, done, num_visit, num_retry)

across policy scenarios: default visit-once, per-host politeness
intervals, error/retry taxonomy, robots gates, max-depth, same-host, and
the preemptive priority policy (serial selection mode).
"""

import pytest

from crawler_spark.config import PRIORITY_POLICY, CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def run_both(spark, tmp_path, fx, policy, mode="exact", max_pops=None, snapshot_every=0,
             oracle_max_pops=None, **engine_kwargs):
    engine = CrawlEngine(
        spark,
        fx.web_df(spark),
        host_policy=fx.host_policy_df(spark),
        policy=policy,
        workdir=str(tmp_path / "work"),
        mode=mode,
        snapshot_every=snapshot_every,
        max_pops=max_pops,
        **engine_kwargs,
    )
    got = engine.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds,
        fx.oracle_web(),
        fx.oracle_host_policy(),
        policy=policy,
        ticket_at=policy.ticket_at,
        max_pops=oracle_max_pops or max_pops or 1_000_000,
    )
    return got, want


def assert_match(got, want):
    g_emit = [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["status"], r["outcome"])
        for r in got.emitted.orderBy("emit_ord").collect()
    ]
    w_emit = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["status"], e["outcome"])
        for e in want.emitted
    ]
    assert g_emit == w_emit, (
        f"crawl order diverges at "
        f"{next((i for i, (a, b) in enumerate(zip(g_emit, w_emit)) if a != b), 'len')}: "
        f"engine={g_emit[:8]}... oracle={w_emit[:8]}..."
    )
    g_seen = {
        r["url"]: (r["depth"], r["done"], r["num_visit"], r["num_retry"])
        for r in got.seen.collect()
    }
    w_seen = {
        u: (s.depth, s.done, s.num_visit, s.num_retry) for u, s in want.seen.items()
    }
    assert g_seen == w_seen


@pytest.fixture(scope="module")
def fx_small():
    return synth_web(n_pages=40, n_hosts=4, seed=42)


def test_default_policy_no_intervals(spark, tmp_path, fx_small):
    """Visit-once, all intervals 0 (the NopController defaults): crawl set,
    depths, and FIFO-at-equal-time order must match the oracle."""
    fx = synth_web(n_pages=40, n_hosts=4, seed=7, intervals=(0,))
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=100)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)


def test_politeness_intervals(spark, tmp_path, fx_small):
    """Mixed per-host intervals: the closed-form batched emission schedule
    must reproduce the serial two-level heap (ratelimitq) ordering."""
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60)
    got, want = run_both(spark, tmp_path, fx_small, policy)
    assert_match(got, want)


def test_bigger_graph_more_skew(spark, tmp_path):
    fx = synth_web(n_pages=120, n_hosts=8, seed=13, links_per_page=(2, 8), zipf_s=1.5)
    policy = CrawlPolicy(max_depth=8, retry_delay_ms=75)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)


def test_revisits(spark, tmp_path):
    """max_visits=2 exercises resched (num_visit++, next=last+min_delay)."""
    fx = synth_web(n_pages=25, n_hosts=3, seed=21, max_visits=2, error_rate=0.0)
    policy = CrawlPolicy(max_depth=4, max_visits=2, min_delay_ms=200)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)


def test_same_host_only(spark, tmp_path, fx_small):
    policy = CrawlPolicy(max_depth=6, same_host_only=True, retry_delay_ms=50)
    got, want = run_both(spark, tmp_path, fx_small, policy)
    assert_match(got, want)


def test_priority_policy_serial_mode(spark, tmp_path):
    """The reference example's preemptive score=1000-100·depth policy
    (ticket At=0): only serial selection is exact — one pop per step."""
    fx = synth_web(n_pages=20, n_hosts=3, seed=5, error_rate=0.0, redirect_rate=0.0)
    policy = PRIORITY_POLICY
    got, want = run_both(spark, tmp_path, fx, policy, mode="serial", max_pops=20)
    assert_match(got, want)


def test_max_pops_truncation(spark, tmp_path, fx_small):
    """Engine stopped early still matches the (uncapped) oracle prefix.
    The batched engine may overshoot max_pops by up to one step's batch."""
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60)
    got, want = run_both(
        spark, tmp_path, fx_small, policy, max_pops=15, oracle_max_pops=1_000_000
    )
    g = [(r["emit_ord"], r["url"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"]) for e in want.emitted]
    assert len(g) >= 15
    assert g == w[: len(g)]


def test_host_budget_cancellation(spark, tmp_path):
    """C6: pops beyond max_fetches_per_host are cancelled (complete
    without fetch) — engine matches the serial oracle's budget boundary."""
    fx = synth_web(n_pages=40, n_hosts=4, seed=42)
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60, max_fetches_per_host=4)
    got, want = run_both(spark, tmp_path, fx, policy)
    assert_match(got, want)
    cancelled = [r for r in got.emitted.collect() if r["outcome"] == "cancel"]
    assert cancelled, "budget should trigger cancellations in this fixture"
    per_host = {}
    for r in got.emitted.collect():
        if r["outcome"] != "cancel":
            per_host[r["host_key"]] = per_host.get(r["host_key"], 0) + 1
    assert all(n <= 4 for n in per_host.values())


def test_entry_bfs_checksum(spark):
    """The driver-facing ``crawl_bfs`` entry is rows-only in CORRECTNESS
    (iterative engine — no SQL oracle); this test closes that gap by
    checksum-matching its emitted log against the serial oracle run on
    the same events-derived web (the godoc_test.go:132 pattern)."""
    import hashlib
    import os

    from __spark_entry__ import _derived_web, q_crawl_bfs
    from crawler_spark.plans.oracle import WebRow, crawl_oracle

    sf_dir = "/root/testdata/sf0.001"
    if not os.path.exists(os.path.join(sf_dir, "events.parquet")):
        import pytest

        pytest.skip("driver testdata not present")

    res = q_crawl_bfs(spark, sf_dir)
    got = [
        (r["emit_ord"], r["url"], r["depth"], r["status"], r["outcome"])
        for r in res.orderBy("emit_ord").collect()
    ]
    assert len(got) > 0

    web_df, seeds = _derived_web(spark, sf_dir)
    web = {
        r["url"]: WebRow(
            url=r["url"], status=r["status"],
            out_links=tuple(r["out_links"]), redirect_to=r["redirect_to"],
        )
        for r in web_df.collect()
    }
    policy = CrawlPolicy(max_depth=4, max_retry=1, obey_robots=False)
    want_all = crawl_oracle(seeds, web, {}, policy=policy, ticket_at=policy.ticket_at)
    want = [
        (e["emit_ord"], e["url"], e["depth"], e["status"], e["outcome"])
        for e in want_all.emitted
    ]
    if len(got) < 60:  # crawl drained before max_pops → both sides complete
        assert len(want) == len(got)
    want = want[: len(got)]

    def checksum(rows):
        h = hashlib.md5()
        for t in rows:
            h.update(repr(t).encode())
        return h.hexdigest()

    assert checksum(got) == checksum(want), (
        f"entry emitted log diverges from serial oracle at "
        f"{next((i for i, (a, b) in enumerate(zip(got, want)) if a != b), 'len')}"
    )


def test_offset_seq_assignment_exact(spark, tmp_path, fx_small):
    """The partition-offset seq path (no single-task sort) must produce
    the identical crawl to the global-window path — proven by the same
    oracle exact-match, forced into offset mode for every step."""
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60)
    engine = CrawlEngine(
        spark, fx_small.web_df(spark), host_policy=fx_small.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "work"), seq_assign="offset",
    )
    got = engine.run(fx_small.seeds)
    want = crawl_oracle(
        fx_small.seeds, fx_small.oracle_web(), fx_small.oracle_host_policy(),
        policy=policy, ticket_at=policy.ticket_at,
    )
    assert_match(got, want)


def test_priority_policy_batched_exact(spark, tmp_path):
    """VERDICT item 6: the preemptive At=0 priority policy in BATCHED
    mode (exact_zero bounded-preemption) — order-exact vs the serial
    oracle with more than one pop per step."""
    fx = synth_web(n_pages=60, n_hosts=4, seed=23, error_rate=0.05)
    policy = PRIORITY_POLICY
    engine = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "work"),
    )
    assert engine.mode == "exact_zero"
    got = engine.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(),
        policy=policy, ticket_at=policy.ticket_at,
    )
    assert_match(got, want)
    assert got.pops > got.steps, (
        f"batched preemptive mode should multi-pop: {got.pops} pops in {got.steps} steps"
    )


# --------------------------------------------------------------------- #
# hypothesis: randomized graph/policy sweep vs the serial oracle
# --------------------------------------------------------------------- #
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st


@pytest.mark.parametrize("state_maintenance", ["rewrite", "lsm"])
@given(
    seed=st.integers(min_value=0, max_value=10_000),
    n_pages=st.integers(min_value=12, max_value=36),
    n_hosts=st.integers(min_value=2, max_value=6),
    intervals=st.sampled_from([(0,), (0, 30), (25, 60), (0, 25, 50, 100)]),
    max_visits=st.integers(min_value=1, max_value=2),
    max_depth=st.sampled_from([None, 3]),
)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_random_graphs_match_oracle(
    spark, state_maintenance, seed, n_pages, n_hosts, intervals, max_visits,
    max_depth,
):
    """The 8 fixed scenarios pin known policy corners; this sweeps
    RANDOM graphs (skew, errors, redirects, messy/dead links, robots
    paths) × random politeness/visit policies × both state-maintenance
    write paths and demands the batched engine still reproduce the
    serial oracle exactly — crawl order AND final seen set. LSM runs
    use a tiny compaction cadence so compaction boundaries land
    MID-crawl (the seam where delta-precedence bugs would live). Any
    divergence hypothesis finds shrinks to a minimal (seed, shape)
    counterexample."""
    import tempfile

    fx = synth_web(
        n_pages=n_pages, n_hosts=n_hosts, seed=seed,
        intervals=intervals, max_visits=max_visits,
    )
    policy = CrawlPolicy(max_retry=2, max_visits=max_visits, max_depth=max_depth)
    lsm_kwargs = (
        dict(state_maintenance="lsm", compact_rows=25, compact_steps=2)
        if state_maintenance == "lsm"
        else {}
    )
    got, want = run_both(
        spark, __import__("pathlib").Path(tempfile.mkdtemp(prefix="hyp_e2e_")),
        fx, policy, **lsm_kwargs,
    )
    assert_match(got, want)


def test_deferred_emin_loop_exact(spark, tmp_path, fx_small):
    """deferred_emin='on': the e_min scalar is folded into the plan (no
    per-step driver round-trip; termination via the empty-batch branch).
    Crawl order and seen set must still match the oracle exactly."""
    engine = CrawlEngine(
        spark, fx_small.web_df(spark),
        host_policy=fx_small.host_policy_df(spark),
        policy=CrawlPolicy(max_retry=2),
        workdir=str(tmp_path / "work_dem"),
        deferred_emin="on",
    )
    assert engine.deferred_emin
    got = engine.run(fx_small.seeds)
    want = crawl_oracle(
        fx_small.seeds, fx_small.oracle_web(), fx_small.oracle_host_policy(),
        policy=CrawlPolicy(max_retry=2), ticket_at="avail",
    )
    assert_match(got, want)


def test_checkpoint_fallback_engine_still_exact(spark, tmp_path, fx_small):
    """With the private stats-cut JVM seam unavailable (_checkpoint falls
    back to plain localCheckpoint), the engine must stay CORRECT — only
    slower to plan. Guards against Spark upgrades moving the seam."""
    import warnings

    from crawler_spark.plans import crawl as crawl_mod

    crawl_mod._FORCE_CKPT_FALLBACK = True
    crawl_mod._WARNED_CKPT_FALLBACK = False
    try:
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            # tiny fixture: the fallback's WHOLE point is that plain
            # localCheckpoint keeps stats that explode superlinearly in
            # step count, so keep the crawl to a handful of steps
            fx = synth_web(n_pages=10, n_hosts=2, seed=5, error_rate=0.0,
                           intervals=(0,), redirect_rate=0.0)
            policy = CrawlPolicy(max_depth=3, retry_delay_ms=100)
            got, want = run_both(spark, tmp_path, fx, policy)
        assert any("localCheckpoint" in str(w.message) for w in caught)
        assert_match(got, want)
    finally:
        crawl_mod._FORCE_CKPT_FALLBACK = False


def test_pipelined_phase1_equals_sync(spark, tmp_path, fx_small):
    """The pipelined phase-1 precompute (the NEXT step's selection
    aggregate riding the state-checkpoint wall) must be invisible:
    identical emitted log and seen set with the overlap on (default)
    vs off (synchronous .first() every step), in BOTH state modes —
    the LSM leg crosses a compaction so the _p1_settle guard (frames
    released only after the in-flight phase-1 job resolves) is
    exercised, not just reasoned about."""
    policy = CrawlPolicy(max_depth=6, retry_delay_ms=60)
    rows = {}
    for tag, kw in {
        "on": {},
        "off": {"pipeline_phase1": False},
        "lsm_on": {"state_maintenance": "lsm", "compact_steps": 2},
        "lsm_off": {"state_maintenance": "lsm", "compact_steps": 2,
                    "pipeline_phase1": False},
    }.items():
        eng = CrawlEngine(
            spark, fx_small.web_df(spark),
            host_policy=fx_small.host_policy_df(spark),
            policy=policy, workdir=str(tmp_path / f"work_p1_{tag}"), **kw,
        )
        got = eng.run(fx_small.seeds)
        rows[tag] = (
            [tuple(r) for r in got.emitted.orderBy("emit_ord")
             .select("emit_ord", "url", "emit_ms", "depth", "outcome").collect()],
            {r["url"]: (r["depth"], r["done"], r["num_visit"]) for r in got.seen.collect()},
        )
        if tag in ("on", "lsm_on"):
            # the overlap must actually ENGAGE (a broken precompute that
            # always falls back would make this test pass vacuously)
            assert eng._p1_hits > 0, f"{tag}: no step consumed a precomputed row"
            assert eng._p1_failures == 0, f"{tag}: precompute raised"
        else:
            assert eng._p1_hits == 0
    assert rows["on"] == rows["off"]
    assert rows["lsm_on"] == rows["lsm_off"]
    assert rows["on"] == rows["lsm_on"]
