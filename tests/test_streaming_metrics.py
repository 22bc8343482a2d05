"""Streaming C8 metrics rollup (watermark + windowed agg, append-once)
and streaming C6 host budget (applyInPandasWithState counter carried
across micro-batches and restarts)."""

import os

from pyspark.sql import functions as F

from crawler_spark.streaming.metrics import (
    EVENT_SCHEMA, fetch_rollup_stream, host_budget_stream, read_event_stream,
)

H = 3600 * 1000  # one hour of emit_ms


def _write_events(spark, events_dir, rows):
    """rows: (url, host, outcome, status, emit_ms, seq)."""
    (
        spark.createDataFrame(rows, EVENT_SCHEMA)
        .coalesce(1)
        .write.mode("append")
        .parquet(events_dir)
    )


def _sink(spark, out_dir):
    if not any(f.endswith(".parquet") for f in os.listdir(out_dir)):
        return []
    return spark.read.parquet(out_dir).collect()


def test_fetch_rollup_stream_append_once_and_late_drop(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    # hour-0 window rows + one hour-2 row that drags the watermark
    # (30 min) past hour-0's end, finalizing it
    _write_events(spark, events_dir, [
        ("u1", "a.test", "ok", 200, 5 * 60 * 1000, 0),
        ("u2", "a.test", "ok", 200, 10 * 60 * 1000, 1),
        ("u3", "b.test", "err", 500, 20 * 60 * 1000, 2),
        ("u4", "a.test", "ok", 200, 2 * H + 10 * 60 * 1000, 3),
    ])
    q = fetch_rollup_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        window="1 hour", watermark="30 minutes", available_now=True,
    )
    q.awaitTermination(120)
    got1 = {
        (r["window_start"].minute + 60 * r["window_start"].hour,
         r["outcome"], r["n"], r["n_err"])
        for r in _sink(spark, out)
    }
    assert got1 == {(0, "ok", 2, 0), (0, "err", 1, 1)}

    # second drop: a LATE hour-0 row (beyond watermark -> dropped, the
    # already-published hour-0 counts must not change) + a second
    # hour-2 row + an hour-3 row that finalizes hour 2
    _write_events(spark, events_dir, [
        ("u5", "a.test", "ok", 200, 30 * 60 * 1000, 4),
        ("u6", "a.test", "ok", 200, 2 * H + 20 * 60 * 1000, 5),
        ("u7", "a.test", "ok", 200, 3 * H + 40 * 60 * 1000, 6),
    ])
    q2 = fetch_rollup_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        window="1 hour", watermark="30 minutes", available_now=True,
    )
    q2.awaitTermination(120)
    rows = _sink(spark, out)
    got2 = {
        (r["window_start"].hour, r["outcome"], r["n"], r["n_err"])
        for r in rows
    }
    # hour 0 published ONCE with the pre-late counts; hour 2 counts both
    # of its rows; hour 3 is still open (watermark 03:10 < its end)
    assert got2 == {(0, "ok", 2, 0), (0, "err", 1, 1), (2, "ok", 2, 0)}
    assert len(rows) == 3  # append-once: no duplicate window rows


def test_host_budget_stream_state_across_batches(spark, tmp_path):
    events_dir = str(tmp_path / "events")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    _write_events(spark, events_dir, [
        ("a0", "a.test", "ok", 200, 0, 0),
        ("a1", "a.test", "ok", 200, 0, 1),
        ("a2", "a.test", "ok", 200, 0, 2),
        ("a3", "a.test", "ok", 200, 0, 3),
        ("b0", "b.test", "ok", 200, 0, 0),
        ("b1", "b.test", "ok", 200, 0, 1),
    ])
    q = host_budget_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        budget=3, available_now=True,
    )
    q.awaitTermination(120)
    got = {(r["host"], r["seq"]): (r["n_before"], r["verdict"])
           for r in _sink(spark, out)}
    assert got == {
        ("a.test", 0): (0, "admit"),
        ("a.test", 1): (1, "admit"),
        ("a.test", 2): (2, "admit"),
        ("a.test", 3): (3, "cancel"),
        ("b.test", 0): (0, "admit"),
        ("b.test", 1): (1, "admit"),
    }

    # restart with new events: per-host counters must resume from state
    # (a.test exhausted; b.test has one admission left)
    _write_events(spark, events_dir, [
        ("a4", "a.test", "ok", 200, 0, 4),
        ("b2", "b.test", "ok", 200, 0, 2),
        ("b3", "b.test", "ok", 200, 0, 3),
    ])
    q2 = host_budget_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        budget=3, available_now=True,
    )
    q2.awaitTermination(120)
    got2 = {(r["host"], r["seq"]): (r["n_before"], r["verdict"])
            for r in _sink(spark, out)}
    assert got2[("a.test", 4)] == (3, "cancel")
    assert got2[("b.test", 2)] == (2, "admit")
    assert got2[("b.test", 3)] == (3, "cancel")
    assert len(got2) == 9

    # the boundary matches the batch C6 rank rule on the same event log
    ev = spark.read.parquet(events_dir)
    batch_admit = (
        ev.withColumn(
            "rk",
            F.row_number().over(
                __import__("pyspark").sql.Window.partitionBy("host").orderBy("seq")
            ),
        )
        .where(F.col("rk") <= 3)
        .select("host", "seq")
        .collect()
    )
    stream_admit = {(h, s) for (h, s), (_, v) in got2.items() if v == "admit"}
    assert {(r["host"], r["seq"]) for r in batch_admit} == stream_admit
