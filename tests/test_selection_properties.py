"""Property-based exactness tests for batched politeness selection
(VERDICT r4 item 7).

The exact-mode finalization proof (operators/selection.py module doc)
assumes a link's score never exceeds its parent's.  These tests
(a) generate random webs × random NON-INCREASING score policies and
assert the batched engine reproduces the serial oracle order exactly,
(b) assert serial mode stays exact even for VIOLATING (score-increasing)
policies, and (c) assert the engine refuses exact mode loudly when a
policy declares the precondition broken."""

import tempfile

import pytest
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web

from tests.test_crawl_e2e import assert_match

# random-web knobs: small graphs keep each Spark run a few seconds while
# still mixing hosts, intervals, errors, redirects, and depth structure
_webs = st.fixed_dictionaries(
    {
        "n_pages": st.integers(min_value=8, max_value=28),
        "n_hosts": st.integers(min_value=1, max_value=4),
        "seed": st.integers(min_value=0, max_value=10_000),
        "intervals": st.sampled_from([(0,), (0, 50), (25, 100), (0, 25, 50)]),
    }
)

# non-increasing score policies: score(depth) = max(0, c0 - c1*depth)
# with c1 >= 0 — the family the exact-mode proof covers (includes the
# reference example's 1000-100*depth and the constant-0 default)
_ok_scores = st.tuples(
    st.integers(min_value=0, max_value=1000), st.integers(min_value=0, max_value=300)
)


def _run_engine_vs_oracle(spark, fx, policy, mode):
    eng = CrawlEngine(
        spark,
        fx.web_df(spark),
        host_policy=fx.host_policy_df(spark),
        policy=policy,
        workdir=tempfile.mkdtemp(prefix="prop_sel_"),
        mode=mode,
    )
    got = eng.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds,
        fx.oracle_web(),
        fx.oracle_host_policy(),
        policy=policy,
        ticket_at=policy.ticket_at,
    )
    assert_match(got, want)


@given(web=_webs, score=_ok_scores)
@settings(
    max_examples=5,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_exact_mode_matches_serial_oracle(spark, web, score):
    """For ANY random graph and any non-increasing score policy, batched
    exact selection must equal the one-pop-at-a-time serial order."""
    c0, c1 = score
    fx = synth_web(**web)
    policy = CrawlPolicy(
        score_expr=f"greatest(0, {c0} - {c1} * depth)",
        score_fn=lambda d, c0=c0, c1=c1: max(0, c0 - c1 * d),
        max_retry=1,
        retry_delay_ms=100,
    )
    _run_engine_vs_oracle(spark, fx, policy, mode="exact")


@given(web=_webs, c1=st.integers(min_value=1, max_value=200))
@settings(
    max_examples=2,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture, HealthCheck.too_slow],
)
def test_serial_mode_exact_for_violating_policies(spark, web, c1):
    """Scores that GROW with depth break the exact-mode precondition;
    serial mode must still reproduce the oracle for them."""
    fx = synth_web(**web)
    policy = CrawlPolicy(
        score_expr=f"least(999, {c1} * depth)",
        score_fn=lambda d, c1=c1: min(999, c1 * d),
        score_nonincreasing_depth=False,
        max_retry=1,
        retry_delay_ms=100,
    )
    _run_engine_vs_oracle(spark, fx, policy, mode="serial")


def test_exact_mode_refuses_violating_policy(spark, tmp_path):
    """The guard: a policy declaring score_nonincreasing_depth=False must
    be rejected loudly in exact mode, not run with a maybe-wrong order."""
    fx = synth_web(n_pages=10, n_hosts=2, seed=1, intervals=(0,))
    policy = CrawlPolicy(
        score_expr="100 * depth",
        score_fn=lambda d: 100 * d,
        score_nonincreasing_depth=False,
    )
    with pytest.raises(ValueError, match="score_nonincreasing_depth"):
        CrawlEngine(
            spark,
            fx.web_df(spark),
            policy=policy,
            workdir=str(tmp_path / "w"),
            mode="exact",
        )
