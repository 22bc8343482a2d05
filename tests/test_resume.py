"""Checkpoint/resume (S3): kill after k pops, resume from the last
snapshot, final crawl order + seen set must equal an uninterrupted run
(and hence the serial oracle). The reference's analog is
PersistableStore.Recover (store.go:30-34, crawler.go:93-113)."""

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def emitted_tuples(res):
    return [
        (r["emit_ord"], r["url"], r["emit_ms"], r["depth"], r["status"], r["outcome"])
        for r in res.emitted.orderBy("emit_ord").collect()
    ]


def seen_map(res):
    return {
        r["url"]: (r["depth"], r["done"], r["num_visit"], r["num_retry"])
        for r in res.seen.collect()
    }


def test_resume_equals_uninterrupted(spark, tmp_path):
    fx = synth_web(n_pages=30, n_hosts=3, seed=11)
    policy = CrawlPolicy(max_depth=5, retry_delay_ms=60)

    # interrupted run: snapshot every 2 steps, stop after ~12 pops
    wd = str(tmp_path / "work")
    eng1 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2, max_pops=12,
    )
    part = eng1.run(fx.seeds)
    assert part.pops >= 12
    assert eng1.store.latest() is not None, "snapshots were committed"

    # resume from the last snapshot in a fresh engine (same workdir)
    eng2 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2,
    )
    full = eng2.resume()

    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(), policy=policy,
        ticket_at=policy.ticket_at,
    )
    got_emit = emitted_tuples(full)
    want_emit = [
        (e["emit_ord"], e["url"], e["emit_ms"], e["depth"], e["status"], e["outcome"])
        for e in want.emitted
    ]
    assert got_emit == want_emit
    assert seen_map(full) == {
        u: (s.depth, s.done, s.num_visit, s.num_retry) for u, s in want.seen.items()
    }


def test_resume_without_snapshot_raises(spark, tmp_path):
    import pytest

    eng = CrawlEngine(
        spark, synth_web(n_pages=5, n_hosts=2, seed=3).web_df(spark),
        workdir=str(tmp_path / "empty"),
    )
    with pytest.raises(RuntimeError):
        eng.resume()


def test_snapshot_carries_lineage_and_metrics(spark, tmp_path):
    """Snapshots record per-partition lineage + the metric history
    (north rule: per-partition lineage and fetch/dedupe metrics)."""
    fx = synth_web(n_pages=15, n_hosts=2, seed=6, error_rate=0.0)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=3, obey_robots=False),
        workdir=str(tmp_path / "w"), snapshot_every=1, max_pops=6,
    )
    eng.run(fx.seeds)
    m = eng.store.latest()
    assert m is not None
    assert set(m["lineage"]) == {"frontier", "seen", "host_state"}
    seen_lineage = m["lineage"]["seen"]
    assert sum(p["n_rows"] for p in seen_lineage) > 0
    assert all("partition_id" in p for p in seen_lineage)
    assert m["metrics"], "metric history persisted"
    assert {"step", "selected"} <= set(m["metrics"][0])

    # resume restores the metric history
    eng2 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=3, obey_robots=False),
        workdir=str(tmp_path / "w"), snapshot_every=1,
    )
    full = eng2.resume()
    assert len(eng2.metrics) >= len(m["metrics"])
    assert full.pops > 0
