"""Queue-ordering contract tests, ported from the reference:

- score order at equal time (memqueue_test.go:41-65)
- time order across hosts (memqueue_test.go:67-98 / ratelimitq testTime)
- rate-limit interleave (queue/ratelimitq/queue_test.go:92-133):
  intervals a=50ms b=25ms, items a:+25 a:+50 b:+60 b:+100 →
  pop order /25, /60, /50, /100
- FIFO tie-break at equal (next, score) (diskheap.go:34-44)
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.operators.selection import select_batch
from crawler_spark.plans.crawl import FRONTIER_SCHEMA, HOST_STATE_SCHEMA, _checkpoint


def drain(spark, items, host_intervals=None, default_interval_ms=0, mode="exact"):
    """Pop everything from a static frontier (no link discovery), returning
    urls in emission order — the batch equivalent of serial Pop-until-empty."""
    rows = [
        (u, host, int(next_ms), int(next_ms), int(score), CrawlPolicy.prio_of(score), int(seq), 0, 0)
        for (u, host, next_ms, score, seq) in items
    ]
    frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    hs_rows = [(h, None, int(iv), 0) for h, iv in (host_intervals or {}).items()]
    host_state = spark.createDataFrame(hs_rows, HOST_STATE_SCHEMA)
    out = []
    for _ in range(100):
        sel = select_batch(
            frontier, host_state, default_interval_ms=default_interval_ms, mode=mode
        )
        if sel.selected is None:
            break
        got = _checkpoint(sel.selected)
        sel.release()
        batch = got.collect()
        out.extend(sorted(batch, key=lambda r: (r["emit_ms"], r["prio"], r["seq"])))
        frontier = _checkpoint(frontier.join(got.select("seq"), "seq", "left_anti"))
        upd = got.groupBy("host_key").agg(F.max("emit_ms").alias("new_last"))
        host_state = (
            host_state.join(upd, "host_key", "full")
            .select(
                "host_key",
                F.coalesce("new_last", "last_ms").cast("long").alias("last_ms"),
                "interval_ms",
                F.col("n_resp"),
            )
        )
        host_state = _checkpoint(host_state)
    return out


@pytest.mark.parametrize("mode", ["exact", "fast", "serial"])
def test_priority_order_at_equal_time(spark, mode):
    # memqueue_test.go:41-65 / ratelimitq testPriority: scores 300,100,200
    # pushed at next=+50ms on one host → pop order 300,200,100
    items = [
        ("http://a.example.com/300", "a.example.com", 50, 300, 0),
        ("http://a.example.com/100", "a.example.com", 50, 100, 1),
        ("http://a.example.com/200", "a.example.com", 50, 200, 2),
    ]
    got = [r["url"].rsplit("/", 1)[1] for r in drain(spark, items, mode=mode)]
    assert got == ["300", "200", "100"]


@pytest.mark.parametrize("mode", ["exact", "fast", "serial"])
def test_time_order(spark, mode):
    # ratelimitq testTime: a:+50, b:+75, a:+25, b:+100 → 25,50,75,100
    items = [
        ("http://a.example.com/50", "a.example.com", 50, 0, 0),
        ("http://b.example.com/75", "b.example.com", 75, 0, 1),
        ("http://a.example.com/25", "a.example.com", 25, 0, 2),
        ("http://b.example.com/100", "b.example.com", 100, 0, 3),
    ]
    got = [r["url"].rsplit("/", 1)[1] for r in drain(spark, items, mode=mode)]
    assert got == ["25", "50", "75", "100"]


@pytest.mark.parametrize("mode", ["exact", "fast", "serial"])
def test_rate_limit_interleave(spark, mode):
    # ratelimitq queue_test.go:92-133: intervals a=50 b=25;
    # items a:+25 a:+50 b:+60 b:+100 → /25, /60, /50, /100
    items = [
        ("http://a.example.com/25", "a.example.com", 25, 0, 0),
        ("http://a.example.com/50", "a.example.com", 50, 0, 1),
        ("http://b.example.com/60", "b.example.com", 60, 0, 2),
        ("http://b.example.com/100", "b.example.com", 100, 0, 3),
    ]
    got = drain(
        spark, items,
        host_intervals={"a.example.com": 50, "b.example.com": 25},
        mode=mode,
    )
    assert [r["url"].rsplit("/", 1)[1] for r in got] == ["25", "60", "50", "100"]
    # emission timestamps: a pops /25 at 25 → ready at 75, but /50 due at 50
    # → max(75,50)=75; b pops /60 at 60, /100 at 100
    assert [r["emit_ms"] for r in got] == [25, 60, 75, 100]


@pytest.mark.parametrize("mode", ["exact", "fast", "serial"])
def test_fifo_tie_break(spark, mode):
    # diskheap.go:34-44: equal (next, score) → FIFO by insertion seq
    items = [
        ("http://a.example.com/first", "a.example.com", 10, 7, 0),
        ("http://a.example.com/second", "a.example.com", 10, 7, 1),
        ("http://b.example.com/third", "b.example.com", 10, 7, 2),
    ]
    got = [r["url"].rsplit("/", 1)[1] for r in drain(spark, items, mode=mode)]
    assert got == ["first", "second", "third"]


def test_multi_pop_batch_matches_serial(spark):
    # a host with many due items and an interval: exact mode multi-pops at
    # e_min + k·interval — same emission schedule the serial queue produces
    items = [(f"http://a.example.com/{i}", "a.example.com", 0, 0, i) for i in range(10)]
    got = drain(spark, items, host_intervals={"a.example.com": 10}, mode="exact")
    assert [r["emit_ms"] for r in got] == [i * 10 for i in range(10)]
    assert [int(r["url"].rsplit("/", 1)[1]) for r in got] == list(range(10))


def test_fast_mixed_intervals(spark):
    # fast mode with interval-0 AND throttled hosts in one batch: the
    # interval-0 run takes the window-free branch (every pop at e_min)
    # while the throttled host staggers k·interval — union of the two
    items = [
        ("http://a.example.com/0", "a.example.com", 0, 0, 0),
        ("http://a.example.com/1", "a.example.com", 0, 0, 1),
        ("http://a.example.com/2", "a.example.com", 0, 0, 2),
        ("http://b.example.com/0", "b.example.com", 0, 0, 3),
        ("http://b.example.com/1", "b.example.com", 0, 0, 4),
    ]
    got = drain(spark, items, host_intervals={"b.example.com": 50}, mode="fast")
    emits = {(r["url"], r["emit_ms"]) for r in got}
    assert emits == {
        ("http://a.example.com/0", 0),
        ("http://a.example.com/1", 0),
        ("http://a.example.com/2", 0),
        ("http://b.example.com/0", 0),
        ("http://b.example.com/1", 50),
    }


def test_deferred_selection_equals_eager(spark):
    """deferred=True folds e_min into the plan; selected rows must be
    identical to the eager path."""
    items = [
        ("http://a.example.com/1", "a.example.com", 10, 5, 0),
        ("http://a.example.com/2", "a.example.com", 10, 9, 1),
        ("http://b.example.com/3", "b.example.com", 10, 0, 2),
        ("http://b.example.com/4", "b.example.com", 20, 0, 3),
    ]
    rows = [
        (u, host, int(n), int(n), int(s), CrawlPolicy.prio_of(s), int(q), 0, 0)
        for (u, host, n, s, q) in items
    ]
    frontier = spark.createDataFrame(rows, FRONTIER_SCHEMA)
    hs = spark.createDataFrame([("a.example.com", None, 25, 0)], HOST_STATE_SCHEMA)
    eager = select_batch(frontier, hs, mode="exact")
    got_e = sorted(tuple(r) for r in eager.selected.drop("rn").collect())
    eager.release()
    deferred = select_batch(frontier, hs, mode="exact", deferred=True)
    got_d = sorted(tuple(r) for r in deferred.selected.drop("rn").collect())
    deferred.release()
    assert got_e == got_d and len(got_e) > 0


def test_emit_order_offset_matches_window(spark):
    """The distributed emit_ord assignment (range-partition + prefix
    offsets) must equal the single-window reference form value-for-value
    (VERDICT r3 #1), and its plan must contain NO unpartitioned window
    (every windowspec is keyed on the range partition id)."""
    import random as rnd

    from crawler_spark.operators.ordering import (
        with_emit_order, with_emit_order_window,
    )

    r = rnd.Random(42)
    rows = []
    seq = 0
    for step in range(6):
        for _ in range(250):
            # heavy ties in emit_ms and prio force the tie-break through
            # seq; steps overlap in emit_ms to exercise the step-first key
            rows.append((step, 1000 + r.randrange(9), r.randrange(3), seq))
            seq += 1
    r.shuffle(rows)
    df = spark.createDataFrame(rows, "step int, emit_ms long, prio int, seq long")
    want = {r_["seq"]: r_["emit_ord"] for r_ in with_emit_order_window(df).collect()}
    out = with_emit_order(df)
    got = {r_["seq"]: r_["emit_ord"] for r_ in out.collect()}
    assert got == want
    # ordinal is dense 0..n-1
    assert sorted(got.values()) == list(range(len(rows)))
    # plan hygiene: the only window is partitioned by the range-partition
    # id — no "No Partition Defined" single-task sort anywhere
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "windowspecdefinition(_pid" in plan
    import re

    for m in re.finditer(r"windowspecdefinition\(([^)]*)\)", plan):
        assert m.group(1).lstrip().startswith("_pid"), plan

    # empty log: schema intact, zero rows
    empty = df.where("step < 0")
    assert with_emit_order(empty).count() == 0
