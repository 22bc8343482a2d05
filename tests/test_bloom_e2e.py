"""Bloom prefilter wired into the engine must preserve exactness (M5:
the bloom never rejects alone — false positives only cost an extra
probe, never correctness)."""

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import crawl_oracle
from crawler_spark.sources.fixtures import synth_web


def test_bloom_crawl_matches_oracle(spark, tmp_path):
    fx = synth_web(n_pages=40, n_hosts=4, seed=42)
    policy = CrawlPolicy(
        max_depth=5, retry_delay_ms=60,
        bloom_prefilter=True, bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "work"),
    )
    assert eng.bloom is not None
    got = eng.run(fx.seeds)
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(), policy=policy,
        ticket_at=policy.ticket_at,
    )
    g = [(r["emit_ord"], r["url"], r["emit_ms"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"]) for e in want.emitted]
    assert g == w
    g_seen = {r["url"]: (r["depth"], r["done"]) for r in got.seen.collect()}
    w_seen = {u: (s.depth, s.done) for u, s in want.seen.items()}
    assert g_seen == w_seen


def test_bloom_rebuild_cadence_exercised(spark, tmp_path):
    """Force a tight rebuild cadence (every 2 steps) so the LSM path —
    broadcast bloom covering the seen prefix + recent-slice anti-join —
    is exercised with nonempty shards, and still matches the oracle."""
    fx = synth_web(n_pages=60, n_hosts=5, seed=11)
    policy = CrawlPolicy(
        max_depth=6, retry_delay_ms=60,
        bloom_prefilter=True, bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "work"),
        bloom_rebuild_steps=2, bloom_rebuild_rows=10,
    )
    got = eng.run(fx.seeds)
    assert eng._bloom_cover_seq > 0, "rebuild cadence never fired"
    assert any(s.any() for s in eng.bloom.shards), "bloom still empty"
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(), policy=policy,
        ticket_at=policy.ticket_at,
    )
    g = [(r["emit_ord"], r["url"], r["emit_ms"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"]) for e in want.emitted]
    assert g == w
    g_seen = {r["url"]: (r["depth"], r["done"]) for r in got.seen.collect()}
    w_seen = {u: (s.depth, s.done) for u, s in want.seen.items()}
    assert g_seen == w_seen


def test_cuckoo_crawl_matches_oracle(spark, tmp_path):
    """Engine with seen_filter='cuckoo' (deletable filter) through the
    same LSM maintenance path — exactness preserved, rebuild cadence
    exercised with nonempty tables."""
    from crawler_spark.operators.cuckoo import CuckooShards

    fx = synth_web(n_pages=60, n_hosts=5, seed=11)
    policy = CrawlPolicy(
        max_depth=6, retry_delay_ms=60,
        bloom_prefilter=True, seen_filter="cuckoo",
        bloom_shards=4, bloom_bits_per_shard=1 << 16,
    )
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=str(tmp_path / "work"),
        bloom_rebuild_steps=2, bloom_rebuild_rows=10,
    )
    assert isinstance(eng.bloom, CuckooShards)
    got = eng.run(fx.seeds)
    assert eng._bloom_cover_seq > 0, "rebuild cadence never fired"
    assert any(t.any() for t in eng.bloom.tables), "cuckoo still empty"
    want = crawl_oracle(
        fx.seeds, fx.oracle_web(), fx.oracle_host_policy(), policy=policy,
        ticket_at=policy.ticket_at,
    )
    g = [(r["emit_ord"], r["url"], r["emit_ms"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"]) for e in want.emitted]
    assert g == w
    g_seen = {r["url"]: (r["depth"], r["done"]) for r in got.seen.collect()}
    w_seen = {u: (s.depth, s.done) for u, s in want.seen.items()}
    assert g_seen == w_seen
