"""Q4 DiskQueue spill — mirrors the reference's own suite
(queue/diskqueue/queue_test.go):

- testTime (:53-84): 4 items pushed out of time order pop back in time
  order (/25, /50, /75, /100) — run with no overflow (limit 100) and at
  limit 0 (everything through disk), like TestNoOverflow/TestZeroSize;
- TestOverflow (:95-119): 2000 items through a 200-slot queue — no
  loss, no duplicate, and (stronger than the reference asserts) the pop
  sequence equals the global (next_ms, seq) total order;
- plus spill-specific coverage the Go tests get for free from boltdb:
  re-spilling previously reloaded keys (per-frame watermark liveness),
  interleaved push/pop, compaction, and due-time gating on a spilled
  head.
"""

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.diskqueue import SpilledWaitQueue, pop_all_ordered


def _items(spark, rows):
    return spark.createDataFrame(
        [(ms, seq, f"http://example.com/{seq}") for ms, seq in rows],
        "next_ms long, seq long, url string",
    )


@pytest.fixture
def q(spark, tmp_path):
    def make(**kw):
        qq = SpilledWaitQueue(spark, workdir=str(tmp_path / "dq"), **kw)
        made.append(qq)
        return qq

    made = []
    yield make
    for qq in made:
        qq.close()


def _pop_urls(qq, now_ms=1 << 62, n=1 << 20):
    return [r["url"] for r in qq.pop(now_ms, n).collect()]


@pytest.mark.parametrize("limit", [100, 0])
def test_time_order(spark, q, limit):
    # queue_test.go:53-92 — pushed 50/75/25/100, popped 25/50/75/100;
    # limit=0 forces every row through the disk path (TestZeroSize)
    qq = q(limit=limit)
    qq.push(_items(spark, [(50, 1), (75, 2), (25, 3), (100, 4)]))
    assert _pop_urls(qq) == [
        "http://example.com/3",
        "http://example.com/1",
        "http://example.com/2",
        "http://example.com/4",
    ]
    assert len(qq) == 0


def test_overflow_no_loss_no_dup(spark, q):
    # queue_test.go:95-119 — 2000 same-time items through a 200-slot
    # queue; FIFO tie-break means pop order is exactly seq order
    qq = q(limit=200, buf_size=64)
    for lo in range(0, 2000, 250):
        qq.push(_items(spark, [(1000, s) for s in range(lo, lo + 250)]))
    assert len(qq) == 2000
    got = []
    while len(qq):
        got.extend(_pop_urls(qq, n=300))
    assert got == [f"http://example.com/{s}" for s in range(2000)]


def test_due_time_gating_spans_spill(spark, q):
    # the head can live on disk: a pop before its due time returns
    # nothing; after, everything (Pop's timer wait, diskqueue.go:316-339)
    qq = q(limit=2)
    qq.push(_items(spark, [(500, 1), (600, 2), (700, 3), (800, 4)]))
    assert _pop_urls(qq, now_ms=400) == []
    assert _pop_urls(qq, now_ms=650) == [
        "http://example.com/1",
        "http://example.com/2",
    ]
    assert _pop_urls(qq, now_ms=900) == [
        "http://example.com/3",
        "http://example.com/4",
    ]


def test_respill_after_reload_keeps_liveness_exact(spark, q):
    # reload keys into hot, then push SMALLER keys so the reloaded ones
    # spill back out below an old cutoff — the per-frame-watermark case
    # a single global watermark would silently drop
    qq = q(limit=4)
    qq.push(_items(spark, [(10 * s, s) for s in range(1, 9)]))  # spills 4..8
    assert _pop_urls(qq, n=3) == [f"http://example.com/{s}" for s in (1, 2, 3)]
    # hot drained to <=1 row; pop triggers reload of 40/50/60 region
    assert _pop_urls(qq, n=2) == [f"http://example.com/{s}" for s in (4, 5)]
    # now push keys SMALLER than everything reloaded: 6/7/8 (keys 60-80)
    # get displaced back to disk in a fresh frame below old cutoffs
    qq.push(_items(spark, [(1, 100), (2, 101), (3, 102), (4, 103), (5, 104)]))
    got = []
    while len(qq):
        got.extend(_pop_urls(qq, n=4))
    assert got == [f"http://example.com/{s}" for s in (100, 101, 102, 103, 104, 6, 7, 8)]


def test_write_behind_buffer_and_compaction(spark, q):
    # many small far-key pushes ride the write-behind buffer (flushed at
    # buf_size) and frame count stays bounded by compaction
    qq = q(limit=8, buf_size=16, compact_frames=4)
    qq.push(_items(spark, [(s, s) for s in range(20)]))  # spill once
    for lo in range(20, 220, 10):  # all past db_min_key -> buffered
        qq.push(_items(spark, [(s, s) for s in range(lo, lo + 10)]))
    assert len(qq._frames) < 4 + 1  # compaction engaged
    assert len(qq) == 220
    got = []
    while len(qq):
        got.extend(_pop_urls(qq, n=64))
    assert got == [f"http://example.com/{s}" for s in range(220)]


def test_pop_all_ordered_matches_total_order(spark, q):
    # the entry's invariant: drain order == ORDER BY next_ms, seq over
    # everything pushed, despite spills/reloads (keys deliberately
    # pushed in scrambled order with heavy ties)
    qq = q(limit=32, buf_size=8)
    rows = [((s * 7919) % 50, s) for s in range(400)]
    for lo in range(0, 400, 40):
        qq.push(_items(spark, rows[lo : lo + 40]))
    drained = pop_all_ordered(qq, batch=64)
    expect = [s for _, s in sorted(rows)]
    got = [r["seq"] for r in drained.orderBy("pop_ord").collect()]
    assert got == expect
    # and the ordinal itself is dense 0..n-1
    assert [r["pop_ord"] for r in drained.orderBy("pop_ord").collect()] == list(
        range(400)
    )


def test_hot_stays_bounded(spark, q):
    # the Q4 property: the cached side never exceeds limit rows no
    # matter the population
    qq = q(limit=16)
    for lo in range(0, 500, 50):
        qq.push(_items(spark, [(s, s) for s in range(lo, lo + 50)]))
        assert qq._n_hot <= 16
    n = 0
    while len(qq):
        n += len(_pop_urls(qq, n=10))
        assert qq._n_hot <= 16 + (16 // 2 + 1)  # reload tops hot up by half
    assert n == 500
