"""Per-host token-bucket rate limiter — the reference's alternative
politeness path (Q7) as a batch operator.

Reimplements ``ratelimit.Limiter`` (reference ratelimit/rate.go:21-74):
one ``rate.Limiter`` (golang.org/x/time/rate token bucket) per host with
``limit = rate.Every(interval)`` i.e. one token per ``interval``, capacity
``burst``; ``Reserve(u)`` consumes a token (going into debt) and returns
how long the crawler should wait before crawling the URL. The updatable
variant (``NewUpdatable``, rate.go:40-48,63-67) re-queries the interval
every ``freq`` reservations per host; only the rate changes, not the
burst.

Token-bucket recurrence, made exact. ``rate.Limiter`` keeps fractional
tokens in float64 seconds; with ``limit = 1/interval`` every quantity is a
multiple of ``1/interval``, so scaling by ``interval`` gives an integer
recurrence in *credit-milliseconds* (credit = tokens x interval):

    credit_1 = burst*d - d                       (a new limiter starts
               with a full bucket: the first advance clamps to burst,
               x/time/rate Limiter zero-value `last`)
    credit_i = min(burst*d, credit_{i-1} + (t_i - t_{i-1})) - d
    wait_i   = max(0, -credit_i)                 (Reservation.Delay)
    act_i    = t_i + wait_i                      (timeToAct)

This is bit-exact (no float drift) and is what the DuckDB oracle
re-derives with a recursive CTE (entry ``token_bucket``). Edge cases
mirror Go: ``interval <= 0`` -> ``rate.Inf`` -> wait 0 always;
``burst < 1`` with a finite rate -> a 1-token reservation can never
succeed -> ``Delay() == InfDuration`` (surfaced as ``wait_ms = INF``).

Distribution: requests shuffle once on host (``groupBy(host).
applyInPandas``); the recurrence is inherently sequential *within* a host
(each reservation's debt depends on the previous one) but embarrassingly
parallel *across* hosts, which is the same concurrency structure as the
reference's per-host ``rate.Limiter`` map behind one mutex — at 10^10-URL
scale hosts are many (10^6+) and per-host streams short, so one Arrow
batch per host group saturates the cluster with zero cross-host
coordination.
"""

from __future__ import annotations

from fractions import Fraction
from typing import Iterable, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

INF_WAIT_MS = 1 << 62


def _reserve_host(
    t: Iterable[int],
    d: int,
    burst: int,
    *,
    update_freq: int = 0,
    updates: Optional[list] = None,
) -> list:
    """Serial reserve loop for ONE host's arrival times ``t`` (sorted
    ascending). Returns wait_ms per arrival.

    Fast path (fixed interval): integer credit-ms recurrence above.
    Updatable path (update_freq > 0): exact Fractions, because a rate
    change re-bases the credit unit — ``SetLimit`` advances the bucket
    at the OLD rate up to the reservation time, then swaps the rate
    (x/time/rate SetLimitAt), so tokens carry over, not credit.
    """
    out = []
    if update_freq and updates:
        # tokens as exact rationals; d may change every update_freq calls
        tokens = Fraction(burst)
        last = None
        d_cur = Fraction(d)
        n_calls = 0
        upd = list(updates)
        ui = 0
        for now in t:
            # NewUpdatable counts every Reserve and re-queries when the
            # per-host count reaches freq (rate.go:63-67: checked BEFORE
            # the reservation, counter then incremented).
            if n_calls >= update_freq and ui < len(upd):
                # SetLimitAt: advance at the OLD rate up to `now`, then
                # swap the rate (an Inf old rate refills to burst)
                if d_cur <= 0:
                    tokens = Fraction(burst)
                    last = now
                elif last is not None:
                    tokens = min(Fraction(burst), tokens + (now - last) / d_cur)
                    last = now
                d_cur = Fraction(upd[ui])
                ui += 1
                n_calls = 0
            n_calls += 1
            # rate.Inf / failed reservations leave limiter state untouched
            if d_cur <= 0:
                out.append(0)
                continue
            if burst < 1:
                out.append(INF_WAIT_MS)
                continue
            if last is None:
                tokens = Fraction(burst)
            else:
                tokens = min(Fraction(burst), tokens + (now - last) / d_cur)
            tokens -= 1
            last = now
            wait = -tokens * d_cur
            out.append(int(wait) if wait > 0 else 0)
        return out
    # fixed-interval integer fast path
    if d <= 0:
        return [0] * len(list(t))
    if burst < 1:
        return [INF_WAIT_MS] * len(list(t))
    cap = burst * d
    credit = cap
    prev = None
    for now in t:
        if prev is not None:
            credit = min(cap, credit + (now - prev))
        credit -= d
        prev = now
        out.append(-credit if credit < 0 else 0)
    return out


def token_bucket_reserve(
    requests: DataFrame,
    *,
    host_col: str = "host",
    arrival_col: str = "arrival_ms",
    seq_col: str = "seq",
    interval_col: str = "interval_ms",
    burst_col: str = "burst",
    update_freq: int = 0,
    updates_col: Optional[str] = None,
) -> DataFrame:
    """Q7 — reserve a fetch slot per request against its host's token
    bucket (reference ratelimit/rate.go:50-74).

    ``requests`` carries one row per reservation with the host's limit
    already joined on (the ``QueryFunc`` analog — a broadcast join from a
    per-host limits table upstream): ``(host, arrival_ms, seq,
    interval_ms, burst [, updates_col])``. Rows are processed per host in
    ``(arrival_ms, seq)`` order — the serial lock order of the reference's
    single mutex. Adds ``wait_ms`` (Reservation.Delay) and
    ``reserve_at_ms = arrival_ms + wait_ms`` (timeToAct).

    ``update_freq``/``updates_col`` model ``NewUpdatable``: ``updates_col``
    is an ``array<long>`` of the successive intervals the QueryFunc would
    return (constant per host), consumed one per ``update_freq``
    reservations.
    """
    cols = [host_col, arrival_col, seq_col, interval_col, burst_col]
    if updates_col:
        cols.append(updates_col)
    in_df = requests.select(*cols)
    schema = (
        f"{host_col} {in_df.schema[host_col].dataType.simpleString()}, "
        f"{arrival_col} long, {seq_col} long, wait_ms long, reserve_at_ms long"
    )

    def per_host(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values([arrival_col, seq_col], kind="mergesort")
        t = pdf[arrival_col].astype("int64").tolist()
        d = int(pdf[interval_col].iloc[0])
        b = int(pdf[burst_col].iloc[0])
        upd = None
        if updates_col:
            raw = pdf[updates_col].iloc[0]
            upd = list(raw) if raw is not None else None
        waits = _reserve_host(t, d, b, update_freq=update_freq, updates=upd)
        return pd.DataFrame(
            {
                host_col: pdf[host_col].values,
                arrival_col: t,
                seq_col: pdf[seq_col].astype("int64").values,
                "wait_ms": waits,
                "reserve_at_ms": [a + w for a, w in zip(t, waits)],
            }
        )

    return in_df.groupBy(host_col).applyInPandas(per_host, schema)


def reserve_with_limits(
    requests: DataFrame,
    limits: DataFrame,
    *,
    host_col: str = "host",
    arrival_col: str = "arrival_ms",
    seq_col: str = "seq",
    default_interval_ms: int = 1000,
    default_burst: int = 1,
) -> DataFrame:
    """Convenience wrapper: broadcast-join the per-host limits table (the
    ``QueryFunc`` — called once per host, rate.go:30-36) onto the request
    stream, then reserve. Hosts absent from ``limits`` get the defaults.
    """
    lim = limits.select(
        host_col,
        F.col("interval_ms").cast("long").alias("interval_ms"),
        F.col("burst").cast("int").alias("burst"),
    )
    joined = (
        requests.join(F.broadcast(lim), on=host_col, how="left")
        .withColumn("interval_ms", F.coalesce("interval_ms", F.lit(default_interval_ms)))
        .withColumn("burst", F.coalesce("burst", F.lit(default_burst)))
    )
    return token_bucket_reserve(
        joined,
        host_col=host_col,
        arrival_col=arrival_col,
        seq_col=seq_col,
    )
