"""Q7 token-bucket limiter vs an independent serial model of
golang.org/x/time/rate (the library behind reference ratelimit/rate.go).

The serial model below follows the Go library's *structure* (advance /
reserveN / SetLimitAt as separate steps over a (tokens, last) state) with
exact Fractions, while the operator uses the credit-ms recurrence — two
independent derivations of the same semantics.
"""

from __future__ import annotations

import random
from fractions import Fraction

import pytest

from crawler_spark.operators.ratelimit import (
    INF_WAIT_MS,
    _reserve_host,
    reserve_with_limits,
    token_bucket_reserve,
)


class GoLimiter:
    """Mirror of x/time/rate Limiter for n=1 reservations, exact
    arithmetic. interval_ms <= 0 encodes rate.Inf."""

    def __init__(self, interval_ms: int, burst: int):
        self.d = Fraction(interval_ms)
        self.burst = burst
        self.tokens = Fraction(0)
        self.last = None  # zero time

    def _advance(self, now: int) -> Fraction:
        if self.last is None:
            return Fraction(self.burst)  # elapsed since zero time: clamp
        if self.d <= 0:
            return Fraction(self.burst)
        return min(Fraction(self.burst), self.tokens + (now - self.last) / self.d)

    def set_limit_at(self, now: int, interval_ms: int) -> None:
        self.tokens = self._advance(now)
        self.last = now
        self.d = Fraction(interval_ms)

    def reserve(self, now: int) -> int:
        if self.d <= 0:
            return 0  # rate.Inf: ok, no state change
        if self.burst < 1:
            return INF_WAIT_MS  # n > burst: not ok, no state change
        tokens = self._advance(now) - 1
        self.tokens = tokens
        self.last = now
        wait = -tokens * self.d
        return int(wait) if wait > 0 else 0


def go_reserve_stream(t, d, burst, update_freq=0, updates=()):
    lim = GoLimiter(d, burst)
    out = []
    n = 0
    ui = 0
    updates = list(updates)
    for now in t:
        if update_freq and n >= update_freq and ui < len(updates):
            lim.set_limit_at(now, updates[ui])
            ui += 1
            n = 0
        n += 1
        out.append(lim.reserve(now))
    return out


def test_full_bucket_then_debt():
    # burst 3, interval 100: three immediate slots, then one per 100ms
    t = [1000, 1000, 1000, 1000, 1000]
    waits = _reserve_host(t, 100, 3)
    assert waits == [0, 0, 0, 100, 200]


def test_refill_clamps_at_burst():
    # long gap refills to burst, not beyond
    t = [0, 10_000, 10_000, 10_000]
    assert _reserve_host(t, 100, 2) == [0, 0, 0, 100]


def test_partial_refill():
    # burst 1: each reservation owes a full interval minus elapsed credit
    # t=0: full->debt0; t=30: +30 credit then -100 -> owe 70;
    # t=60: +30 on a -70 balance then -100 -> owe 140
    t = [0, 30, 60]
    assert _reserve_host(t, 100, 1) == [0, 70, 140]


def test_inf_rate_and_zero_burst():
    assert _reserve_host([0, 1, 2], 0, 1) == [0, 0, 0]
    assert _reserve_host([0, 1], 100, 0) == [INF_WAIT_MS, INF_WAIT_MS]


@pytest.mark.parametrize("seed", [0, 1, 2, 3])
def test_randomized_parity_vs_go_model(seed):
    rng = random.Random(seed)
    t = 0
    arrivals = []
    for _ in range(300):
        t += rng.choice([0, 1, 7, 40, 130, 1000])
        arrivals.append(t)
    d = rng.choice([1, 50, 300])
    burst = rng.choice([1, 2, 5])
    assert _reserve_host(arrivals, d, burst) == go_reserve_stream(arrivals, d, burst)


@pytest.mark.parametrize("seed", [10, 11, 12])
def test_updatable_parity_vs_go_model(seed):
    rng = random.Random(seed)
    t = 0
    arrivals = []
    for _ in range(200):
        t += rng.choice([0, 3, 25, 90, 400])
        arrivals.append(t)
    updates = [rng.choice([0, 20, 150, 600]) for _ in range(8)]
    got = _reserve_host(arrivals, 100, 2, update_freq=17, updates=updates)
    want = go_reserve_stream(arrivals, 100, 2, update_freq=17, updates=updates)
    assert got == want


def test_spark_operator_matches_serial(spark):
    rng = random.Random(42)
    rows = []
    limits = {h: (rng.choice([50, 200, 700]), rng.choice([1, 2, 4])) for h in range(8)}
    seq = 0
    clock = {h: 0 for h in limits}
    for _ in range(600):
        h = rng.randrange(8)
        clock[h] += rng.choice([0, 2, 30, 250])
        d, b = limits[h]
        rows.append((f"h{h}.example.com", clock[h], seq, d, b))
        seq += 1
    df = spark.createDataFrame(
        rows, "host string, arrival_ms long, seq long, interval_ms long, burst int"
    )
    got = {
        (r.host, r.arrival_ms, r.seq): (r.wait_ms, r.reserve_at_ms)
        for r in token_bucket_reserve(df).collect()
    }
    assert len(got) == 600
    # serial per host
    by_host = {}
    for host, arr, s, d, b in rows:
        by_host.setdefault(host, []).append((arr, s, d, b))
    for host, items in by_host.items():
        items.sort()
        waits = _reserve_host([a for a, *_ in items], items[0][2], items[0][3])
        for (a, s, _, _), w in zip(items, waits):
            assert got[(host, a, s)] == (w, a + w), (host, a, s)


def test_reserve_with_limits_defaults(spark):
    reqs = spark.createDataFrame(
        [("a", 0, 0), ("a", 0, 1), ("b", 0, 2), ("b", 0, 3)],
        "host string, arrival_ms long, seq long",
    )
    limits = spark.createDataFrame([("a", 100, 2)], "host string, interval_ms long, burst int")
    out = {(r.host, r.seq): r.wait_ms for r in reserve_with_limits(
        reqs, limits, default_interval_ms=500, default_burst=1
    ).collect()}
    # host a: burst 2 -> both immediate; host b: defaults burst 1 @500ms
    assert out[("a", 0)] == 0 and out[("a", 1)] == 0
    assert sorted([out[("b", 2)], out[("b", 3)]]) == [0, 500]
