"""Streaming crawl telemetry: the C8 metrics rollup and the C6 host
budget as Structured-Streaming operators over the emitted-event log.

The reference maintains its counters INCREMENTALLY as the crawl runs —
per-URL visit counts bump on every response (schedule.go:256
``u.NumVisit++``) and the store's aggregate Stats (store.go:36-47) feed
``IsFinished`` — rather than recomputing from the full history. The
batch engine's equivalents are the per-step tagged-union count job (C8)
and the host-budget rank cancel (C6, plans/crawl.py:173-203); this
module is the same semantics when the emitted log arrives as a STREAM
(e.g. tailing the per-step parquet log of a long-running crawl):

  * ``fetch_rollup_stream`` — watermarked windowed aggregation: per
    (time window, outcome) counts in APPEND mode, so a row is written
    exactly once per finalized window and late events beyond the
    watermark are dropped (the streaming contract the batch
    ``hourly_rollup`` entry cannot express). Pure built-in aggregation:
    partial-aggregated before the shuffle, state bounded by
    |open windows × outcomes|, not by history.
  * ``host_budget_stream`` — ``applyInPandasWithState``: per-host
    cumulative response counter carried in GroupState across
    micro-batches; each event is admitted while the host's lifetime
    count ≤ budget and cancelled after (C6's ``n_resp + rank > budget``
    boundary, restated incrementally). State is ONE long per host —
    at 10^8 hosts that is executor-sharded keyed state, never a
    driver-side structure; events within a (host, batch) group are
    ordered by ``seq`` so the verdict is deterministic under Spark's
    unordered batch delivery.

Both run with ``Trigger.AvailableNow`` in tests and continuously in
production (same code path, same checkpoint contract as
streaming/enqueue.py).
"""

from __future__ import annotations

from typing import Iterator, Tuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType, LongType, StringType, StructField, StructType,
)

EVENT_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host", StringType()),
    StructField("outcome", StringType()),
    StructField("status", IntegerType()),
    StructField("emit_ms", LongType()),
    StructField("seq", LongType()),
])

BUDGET_OUT_SCHEMA = StructType([
    StructField("host", StringType()),
    StructField("url", StringType()),
    StructField("seq", LongType()),
    StructField("n_before", LongType()),
    StructField("verdict", StringType()),
])

_BUDGET_STATE_SCHEMA = StructType([StructField("n_resp", LongType())])


def read_event_stream(spark: SparkSession, events_dir: str) -> DataFrame:
    """readStream over the emitted-event parquet log directory."""
    return spark.readStream.schema(EVENT_SCHEMA).parquet(events_dir)


def fetch_rollup_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    window: str = "1 hour",
    watermark: str = "30 minutes",
    available_now: bool = False,
):
    """Start the windowed metrics rollup; returns the StreamingQuery.

    Emits (window_start, window_end, outcome, n, n_err) rows once per
    FINALIZED window (append mode): a window closes when the watermark
    — max event time seen minus ``watermark`` — passes its end, after
    which late rows for it are dropped. Counts therefore never
    double-publish, matching the reference's monotone counters
    (store.go:36-47) under replay.
    """
    ts = F.timestamp_millis(F.col("emit_ms")).alias("event_time")
    rolled = (
        events.select(ts, "outcome", "status")
        .withWatermark("event_time", watermark)
        .groupBy(F.window("event_time", window).alias("w"), "outcome")
        .agg(
            F.count("*").alias("n"),
            F.count(F.when(F.col("status") >= 400, 1)).alias("n_err"),
        )
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "outcome",
            "n",
            "n_err",
        )
    )
    writer = (
        rolled.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def _budget_fn(budget: int):
    def fn(
        key: Tuple[str],
        pdfs: Iterator["pandas.DataFrame"],  # noqa: F821
        state,
    ) -> Iterator["pandas.DataFrame"]:
        import numpy as np
        import pandas as pd

        (host,) = key
        (n_resp,) = state.get if state.exists else (0,)  # .get is a property
        frames = list(pdfs)
        if not frames:
            return
        batch = pd.concat(frames, ignore_index=True)
        batch = batch.sort_values("seq", kind="stable", ignore_index=True)
        # admitted-so-far before row i: counts stop growing at the
        # budget boundary because cancelled fetches produce no response
        n_before = np.minimum(
            n_resp + batch.index.to_numpy(dtype="int64"), budget
        )
        verdict = pd.Series(np.where(n_before < budget, "admit", "cancel"))
        # only admitted fetches produce responses, so only they count
        # toward the lifetime budget (C6: cancelled pops re-enter the
        # frontier without bumping n_resp)
        state.update((int(n_resp + (verdict == "admit").sum()),))
        yield pd.DataFrame({
            "host": host,
            "url": batch["url"],
            "seq": batch["seq"],
            "n_before": n_before,
            "verdict": verdict,
        })

    return fn


def host_budget_stream(
    events: DataFrame,
    out_dir: str,
    checkpoint_dir: str,
    *,
    budget: int,
    available_now: bool = False,
):
    """Start the stateful per-host budget gate; returns the query.

    GroupState carries each host's lifetime admitted-response count
    across micro-batches; an event is admitted while that count is
    below ``budget`` and cancelled afterwards — the incremental
    restatement of the batch C6 cancel (plans/crawl.py:173-203), whose
    counter the reference bumps one response at a time
    (schedule.go:256, store.go:133).
    """
    from pyspark.sql.streaming.state import GroupStateTimeout

    gated = (
        events.select("host", "url", "seq")
        .groupBy("host")
        .applyInPandasWithState(
            _budget_fn(budget),
            outputStructType=BUDGET_OUT_SCHEMA,
            stateStructType=_BUDGET_STATE_SCHEMA,
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )
    )
    writer = (
        gated.writeStream.format("parquet")
        .option("path", out_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()
