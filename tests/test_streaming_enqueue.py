"""Structured-Streaming enqueue (S2) tests: canonicalize → dedupe →
ticket append, exactly-once via checkpoint."""

import os

from crawler_spark.streaming.enqueue import drain_enqueued, enqueue_stream


def _write_seeds(drop_dir, name, urls):
    tmp = os.path.join(drop_dir, f".{name}.tmp")
    with open(tmp, "w") as f:
        f.write("\n".join(urls) + "\n")
    os.rename(tmp, os.path.join(drop_dir, name))


def test_enqueue_stream_end_to_end(spark, tmp_path):
    drop = str(tmp_path / "drop")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")
    os.makedirs(drop)

    seen = spark.createDataFrame([("http://seen.test/a",)], ["url"])
    _write_seeds(drop, "batch1.txt", [
        "http://new.test/x",
        "HTTP://New.TEST:80/x#frag",     # canonical dup of the first
        "http://seen.test/a",            # already seen → dropped
        "ftp://bad.test/z",              # invalid scheme → dropped
        "  ",                            # blank → dropped
        "http://other.test/y",
    ])
    q = enqueue_stream(spark, drop, out, ckpt, lambda: seen, available_now=True)
    q.awaitTermination(120)

    got, _files = drain_enqueued(spark, out)
    rows = {r["url"]: r for r in got.collect()}
    assert set(rows) == {"http://new.test/x", "http://other.test/y"}
    r = rows["http://new.test/x"]
    assert r["host_key"] == "new.test" and r["depth"] == 0 and r["prio"] == 999

    # second drop: restart drains ONLY the new file (checkpoint = exactly once)
    _write_seeds(drop, "batch2.txt", ["http://new2.test/z", "http://new.test/x"])
    q2 = enqueue_stream(spark, drop, out, ckpt, lambda: seen, available_now=True)
    q2.awaitTermination(120)
    got2 = {r["url"] for r in drain_enqueued(spark, out)[0].collect()}
    # new.test/x appears once more (seen set didn't include it — engine-side
    # frontier merge anti-joins again); no duplicate of batch1 contents
    assert got2 == {"http://new.test/x", "http://other.test/y", "http://new2.test/z"}
    assert drain_enqueued(spark, out)[0].count() == 4  # 2 + 2 appended rows


def test_drain_empty(spark, tmp_path):
    assert drain_enqueued(spark, str(tmp_path / "missing"))[0] is None


def test_engine_merges_enqueued(spark, tmp_path):
    """S2 integration: tickets streamed into the enqueue dir are folded
    into the frontier at the next tick, deduped against seen, crawled."""
    import os

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.sources.fixtures import synth_web
    from crawler_spark.streaming.enqueue import enqueue_stream

    fx = synth_web(n_pages=20, n_hosts=3, seed=15, error_rate=0.0, redirect_rate=0.0)
    extra = [r["url"] for r in fx.rows[5:8]]  # mid-crawl enqueued pages
    drop = str(tmp_path / "drop"); out = str(tmp_path / "enq"); ck = str(tmp_path / "ck")
    os.makedirs(drop)
    _write_seeds(drop, "s.txt", extra + ["ftp://bad/x"])
    q = enqueue_stream(spark, drop, out, ck, lambda: None, available_now=True)
    q.awaitTermination(120)

    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=0, obey_robots=False),  # no link expansion
        workdir=str(tmp_path / "work"), enqueue_dir=out,
    )
    got = eng.run(fx.seeds[:1])
    urls = {r["url"] for r in got.emitted.collect()}
    for u in extra:
        assert u in urls, f"enqueued {u} was not crawled"
    # consumed files moved aside: a second run sees nothing new
    from crawler_spark.streaming.enqueue import drain_enqueued
    assert drain_enqueued(spark, out)[0] is None


def _ticket_part_file(spark, tmp_path, out_dir, name, url):
    """Write a single-row ticket parquet PART FILE into out_dir (the
    shape a live enqueue stream's append leaves behind)."""
    import os

    from crawler_spark.plans.crawl import FRONTIER_SCHEMA

    d = str(tmp_path / f"_tk_{name}")
    spark.createDataFrame(
        [(url, "h.test", 0, 0, 0, 999, -1, 0, 0)], FRONTIER_SCHEMA
    ).coalesce(1).write.mode("overwrite").parquet(d)
    part = next(f for f in os.listdir(d) if f.endswith(".parquet"))
    os.rename(os.path.join(d, part), os.path.join(out_dir, f"{name}.parquet"))


def test_late_enqueue_files_not_lost(spark, tmp_path, monkeypatch):
    """The listing→consume race (ADVICE): a part file appended between
    drain's file listing and the consume step must NOT be swept aside
    unread — it drains at a later tick and its URL is still crawled."""
    import os

    import crawler_spark.streaming.enqueue as enq
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import HOST_POLICY_SCHEMA, CrawlEngine

    urls = [f"http://h.test/s{i}" for i in range(4)]
    web = spark.createDataFrame(
        [(u, "h.test", 200, [], None) for u in urls],
        "url string, host_key string, status int, out_links array<string>, redirect_to string",
    )
    hp = spark.createDataFrame([("h.test", 50, 1, [])], HOST_POLICY_SCHEMA)
    out = str(tmp_path / "enq")
    os.makedirs(out)
    _ticket_part_file(spark, tmp_path, out, "first", "http://h.test/e0")

    real = enq.drain_enqueued
    state = {"injected": False}

    def racy(spark_, out_dir):
        df, files = real(spark_, out_dir)
        if df is not None and not state["injected"]:
            state["injected"] = True
            # simulate the live stream appending between listing and consume
            _ticket_part_file(spark_, tmp_path, out_dir, "late", "http://h.test/late")
        return df, files

    monkeypatch.setattr(enq, "drain_enqueued", racy)
    eng = CrawlEngine(
        spark, web, host_policy=hp,
        policy=CrawlPolicy(max_depth=0, obey_robots=False, max_retry=1),
        workdir=str(tmp_path / "work"), enqueue_dir=out,
    )
    got = eng.run(urls)
    emitted = {r["url"] for r in got.emitted.collect()}
    assert "http://h.test/e0" in emitted
    assert "http://h.test/late" in emitted, "late-arriving enqueue file was lost"
    assert not any(f.endswith(".parquet") for f in os.listdir(out))


def test_replay_consumed_after_snapshot(spark, tmp_path):
    """Consumed enqueue files newer than the restored snapshot are moved
    back for re-merge (exactly-once across crash/resume); older ones —
    already durable in the snapshot — are not."""
    import os

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    web = spark.createDataFrame(
        [("http://h.test/s0", "h.test", 200, [], None)],
        "url string, host_key string, status int, out_links array<string>, redirect_to string",
    )
    out = str(tmp_path / "enq")
    os.makedirs(out)
    eng = CrawlEngine(
        spark, web, policy=CrawlPolicy(max_depth=0, obey_robots=False),
        workdir=str(tmp_path / "work"), enqueue_dir=out,
    )
    for step, name in ((1, "old"), (3, "new")):
        d = os.path.join(eng.workdir, "enqueue_consumed", f"step={step}")
        os.makedirs(d)
        _ticket_part_file(spark, tmp_path, d, name, f"http://h.test/{name}")
    n = eng._replay_consumed_after(2)
    assert n == 1
    replayed = [f for f in os.listdir(out) if f.endswith(".parquet")]
    assert len(replayed) == 1 and "new" in replayed[0]
    assert os.path.exists(
        os.path.join(eng.workdir, "enqueue_consumed", "step=1", "old.parquet")
    )


def test_drain_seq_offset_matches_window(spark, tmp_path):
    """_assign_drain_seq's distributed (dense_ordinal) form must assign
    the exact seq values of the small-batch global window — same dense
    range, same ORDER BY url — so the threshold switch can never change
    a crawl."""
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import FRONTIER_SCHEMA, CrawlEngine

    web = spark.createDataFrame(
        [("http://h.test/s0", "h.test", 200, [], None)],
        "url string, host_key string, status int, out_links array<string>, redirect_to string",
    )
    eng = CrawlEngine(
        spark, web, policy=CrawlPolicy(obey_robots=False),
        workdir=str(tmp_path / "work"),
    )
    fresh = spark.createDataFrame(
        [(f"http://h{i % 7}.test/p{i:04d}", f"h{i % 7}.test",
          0, 0, 0, 999, -1, 0, 0) for i in range(937)],
        FRONTIER_SCHEMA,
    )
    via_window = eng._assign_drain_seq(fresh, 1000, [])  # 0 bytes → window
    big = tmp_path / "big.bin"
    big.write_bytes(b"x" * (CrawlEngine._DRAIN_OFFSET_BYTES + 1))
    via_offset = eng._assign_drain_seq(fresh, 1000, [str(big)])
    a = {(r["url"], r["seq"]) for r in via_window.collect()}
    b = {(r["url"], r["seq"]) for r in via_offset.collect()}
    assert a == b
    assert {s for _, s in a} == set(range(1000, 1937))
    # missing files (listing raced the stream) must fail safe → offset
    via_raced = eng._assign_drain_seq(
        fresh, 1000, [str(tmp_path / "vanished.parquet")]
    )
    assert {(r["url"], r["seq"]) for r in via_raced.collect()} == a


def test_engine_merges_enqueued_offset_path(spark, tmp_path, monkeypatch):
    """The S2 merge E2E with the distributed drain-seq path forced on:
    enqueued URLs still crawl exactly once with correct tickets."""
    import os

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.sources.fixtures import synth_web

    monkeypatch.setattr(CrawlEngine, "_DRAIN_OFFSET_BYTES", 0)
    fx = synth_web(n_pages=20, n_hosts=3, seed=15, error_rate=0.0, redirect_rate=0.0)
    extra = [r["url"] for r in fx.rows[5:8]]
    drop = str(tmp_path / "drop"); out = str(tmp_path / "enq"); ck = str(tmp_path / "ck")
    os.makedirs(drop)
    _write_seeds(drop, "s.txt", extra)
    q = enqueue_stream(spark, drop, out, ck, lambda: None, available_now=True)
    q.awaitTermination(120)

    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=fx.host_policy_df(spark),
        policy=CrawlPolicy(max_depth=0, obey_robots=False),
        workdir=str(tmp_path / "work"), enqueue_dir=out,
    )
    got = eng.run(fx.seeds[:1])
    emitted = [r["url"] for r in got.emitted.collect()]
    for u in extra:
        assert emitted.count(u) == 1, f"enqueued {u} crawled {emitted.count(u)}×"
