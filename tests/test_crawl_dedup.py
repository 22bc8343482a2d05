"""In-loop incremental dedupe: the crawl loop folds each step's fetched
payloads into a persisted LSMPhashIndex (north rule: "fetch/dedupe
metrics"; reference analog: the BK-tree controller folding each NEW
fingerprint into the existing tree, bktree.go:21-62 +
sample/fingerprint/main.go).

The contract under test: after ANY crawl (revisits, errors, redirects,
compactions, snapshot/resume), the in-loop index is row-identical to a
ONE-SHOT `phash_index_build` over the distinct payloads of the pages the
crawl fetched ok — batching, step boundaries, and LSM framing must all
be invisible in the end state.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.operators.incremental import member_labels, phash_index_build
from crawler_spark.plans.crawl import CrawlEngine, dedup_member_id
from crawler_spark.sources.fixtures import synth_web

RADIUS = 6


def planted_payloads(spark, fx):
    """(image_id, phash) for every fixture page, phash planted in triples:
    consecutive page indices share a base hash with ≤3 flipped bits, so
    near-dup clusters span pages that are crawled at different steps —
    cross-batch merges are guaranteed, not incidental."""
    import hashlib

    rows = []
    for i, r in enumerate(fx.rows):
        base = (
            int.from_bytes(hashlib.md5(f"ph{i // 3}".encode()).digest()[:8], "big")
            & ((1 << 62) - 1)
        )
        ph = base ^ (0, 1, 6)[i % 3]
        rows.append((r["image_id"], ph))
    return spark.createDataFrame(rows, "image_id string, phash long")


def run_engine(spark, tmp_path, fx, payloads, policy=None, name="w", **kw):
    eng = CrawlEngine(
        spark,
        fx.web_df(spark),
        host_policy=fx.host_policy_df(spark),
        policy=policy or CrawlPolicy(max_depth=5),
        workdir=str(tmp_path / name),
        payloads=payloads,
        dedup_radius=RADIUS,
        **kw,
    )
    res = eng.run(fx.seeds)
    return eng, res


def oneshot_index(spark, fx, payloads, res):
    """One-shot index over the distinct payloads of canonically
    ok-fetched pages (a redirect pop serves the TARGET's payload — it
    folds when the target itself is popped, never under the redirect)."""
    web = fx.web_df(spark).select("url", "image_id", "redirect_to")
    ok_urls = res.seen.where(F.col("num_visit") >= 1).select("url")
    imgs = (
        ok_urls.join(web, "url")
        .where(F.col("redirect_to").isNull() & F.col("image_id").isNotNull())
        .select("image_id")
        .distinct()
        .join(payloads, "image_id")
        .select(dedup_member_id(F.col("image_id")).alias("image_id"), "phash")
    )
    return phash_index_build(imgs, radius=RADIUS), imgs


def index_rows(df):
    return sorted(
        (r["phash"], r["gid"], r["gsz"], r["has_edge"], r["comp"])
        for r in df.collect()
    )


def assert_index_equals_oneshot(spark, fx, payloads, res):
    ref, imgs = oneshot_index(spark, fx, payloads, res)
    assert index_rows(res.dedup_index) == index_rows(ref)
    # and the labels they induce agree (the consumer-visible face)
    got = sorted(map(tuple, member_labels(imgs, res.dedup_index).collect()))
    want = sorted(map(tuple, member_labels(imgs, ref).collect()))
    assert got == want and got, "label sets diverge (or crawl found no images)"
    return imgs


def test_inloop_index_equals_oneshot(spark, tmp_path):
    fx = synth_web(n_pages=40, n_hosts=4, seed=42)
    payloads = planted_payloads(spark, fx)
    eng, res = run_engine(spark, tmp_path, fx, payloads)
    imgs = assert_index_equals_oneshot(spark, fx, payloads, res)
    # dedupe metrics ride the per-step C8 stream: folds are exactly-once,
    # so img_new sums to the number of distinct ok images
    assert sum(m.get("img_new", 0) for m in res.metrics) == imgs.count()
    assert any(m.get("dedup_frame_rows", 0) > 0 for m in res.metrics)


def test_revisits_fold_once(spark, tmp_path):
    """max_visits=2 refetches pages; the refetch must NOT refold its
    payload (gsz would inflate and invent clusters)."""
    fx = synth_web(n_pages=24, n_hosts=3, seed=7, max_visits=2)
    payloads = planted_payloads(spark, fx)
    eng, res = run_engine(
        spark, tmp_path, fx, payloads,
        policy=CrawlPolicy(max_depth=5, max_visits=2, min_delay_ms=200),
    )
    assert res.seen.where(F.col("num_visit") >= 2).count() > 0, (
        "fixture produced no revisits — the test is vacuous"
    )
    assert_index_equals_oneshot(spark, fx, payloads, res)


def test_compaction_mid_crawl(spark, tmp_path):
    fx = synth_web(n_pages=24, n_hosts=3, seed=13)
    payloads = planted_payloads(spark, fx)
    eng, res = run_engine(
        spark, tmp_path, fx, payloads,
        dedup_compact_folds=2, dedup_fold_every=2,
    )
    assert eng.n_dedup_compactions >= 1
    # frame stack is bounded by the cadence
    assert all(m.get("dedup_frames", 0) <= 2 for m in res.metrics)
    assert_index_equals_oneshot(spark, fx, payloads, res)


def test_resume_preserves_index(spark, tmp_path):
    """Interrupt after k pops, resume from the snapshot: the final index
    must equal the uninterrupted run's (pre-snapshot folds come from the
    dedup_index snapshot frame; post-snapshot pops refold exactly once)."""
    fx = synth_web(n_pages=30, n_hosts=3, seed=11)
    payloads = planted_payloads(spark, fx)
    policy = CrawlPolicy(max_depth=5, retry_delay_ms=60)

    _, full = run_engine(spark, tmp_path, fx, payloads, policy=policy, name="full")

    wd = str(tmp_path / "interrupted")
    eng1 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2, max_pops=12,
        payloads=payloads, dedup_radius=RADIUS,
    )
    eng1.run(fx.seeds)
    eng2 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=policy, workdir=wd, snapshot_every=2,
        payloads=payloads, dedup_radius=RADIUS,
    )
    resumed = eng2.resume()
    assert index_rows(resumed.dedup_index) == index_rows(full.dedup_index)
    assert_index_equals_oneshot(spark, fx, payloads, resumed)


def test_resume_refuses_dedup_less_snapshot(spark, tmp_path):
    """A snapshot written WITHOUT dedupe cannot silently resume with it —
    pre-snapshot images would be lost from the index."""
    fx = synth_web(n_pages=20, n_hosts=2, seed=5)
    payloads = planted_payloads(spark, fx)
    wd = str(tmp_path / "plain")
    eng1 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=5), workdir=wd, snapshot_every=2,
        max_pops=8,
    )
    eng1.run(fx.seeds)
    eng2 = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=5), workdir=wd,
        payloads=payloads,
    )
    with pytest.raises(RuntimeError, match="dedup_index"):
        eng2.resume()


def test_errors_and_misses_never_indexed(spark, tmp_path):
    """Pages that never fetched ok contribute nothing: every indexed hash
    belongs to an ok-fetched page's payload (subset check is implied by
    the one-shot equality, but assert it directly for the error slice)."""
    fx = synth_web(n_pages=30, n_hosts=3, seed=21, error_rate=0.3)
    payloads = planted_payloads(spark, fx)
    _, res = run_engine(spark, tmp_path, fx, payloads)
    web = fx.web_df(spark).select("url", "image_id")
    never_ok = (
        web.join(
            res.seen.where(F.col("num_visit") >= 1).select("url"), "url", "left_anti"
        )
        .join(payloads, "image_id")
        .select(dedup_member_id(F.col("image_id")).alias("mid"))
    )
    bad = res.dedup_index.join(
        never_ok, res.dedup_index.gid == never_ok.mid, "inner"
    )
    # a never-ok page's id can only appear as gid if its hash was never
    # folded under that id — i.e. not at all (ids are unique per page)
    assert bad.count() == 0
    assert_index_equals_oneshot(spark, fx, payloads, res)
