"""Structured-Streaming runtime enqueue (S2) — ``Enqueue(urls…)`` as a
stream.

The reference accepts mid-crawl URLs through ``Enqueue``
(crawler.go:143-158): normalize → PutNX dedupe → scheduler. The batch
engine's equivalent is appending ticket rows to the frontier between
ticks; this module feeds that append from a *stream* of seed files: a
``readStream`` over a drop directory (one URL per line, the
text-file-source contract), canonicalization through the same Arrow UDF
the engine uses, per-batch exact dedupe against the live seen set, and
an append sink of frontier-ticket rows the driver loop unions in at the
next tick.

Design notes:
  * ``foreachBatch`` keeps the seen anti-join *exact* against the
    current seen snapshot (a pure streaming join would need watermarks
    and give only stream-stream semantics); each micro-batch is also
    deduped internally with first-writer-wins on (file order) like seed
    injection (crawler.go:120-140).
  * checkpointLocation gives exactly-once appends across restarts —
    the streaming analog of the engine's snapshot/resume contract.
  * ``Trigger.AvailableNow`` (used in tests) drains pending files and
    stops — the same code path runs continuously in production.
"""

from __future__ import annotations

import os
from typing import Callable, Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import canonicalize_udf
from crawler_spark.operators.ordering import prio_col


def enqueue_stream(
    spark: SparkSession,
    drop_dir: str,
    out_dir: str,
    checkpoint_dir: str,
    seen_provider: Callable[[], Optional[DataFrame]],
    *,
    score_expr: str = "0",
    available_now: bool = False,
):
    """Start the enqueue stream; returns the StreamingQuery.

    seen_provider() is called per micro-batch and returns the current
    seen set (url column) or None — late binding so the long-running
    stream always dedupes against the engine's latest snapshot.
    """
    os.makedirs(drop_dir, exist_ok=True)
    raw = spark.readStream.format("text").load(drop_dir)

    def process_batch(batch_df: DataFrame, batch_id: int) -> None:
        c = (
            batch_df.select(F.trim("value").alias("raw"))
            .where(F.length("raw") > 0)
            .select("raw", canonicalize_udf("raw").alias("c"))
            .select("raw", "c.*")
            .where("valid")
        )
        w = Window.partitionBy("url").orderBy("raw")
        fresh = c.withColumn("rn", F.row_number().over(w)).where("rn = 1")
        seen = seen_provider()
        if seen is not None:
            fresh = fresh.join(seen.select("url"), "url", "left_anti")
        tickets = fresh.select(
            "url",
            "host_key",
            F.lit(0).cast("long").alias("next_ms"),
            F.lit(0).cast("long").alias("avail_ms"),
            F.expr(score_expr).cast("int").alias("score"),
            prio_col(F.expr(score_expr).cast("int")).alias("prio"),
            F.lit(-1).cast("long").alias("seq"),  # assigned on frontier merge
            F.lit(0).alias("depth"),
            F.lit(0).alias("num_retry"),
        )
        tickets.write.mode("append").parquet(out_dir)

    writer = (
        raw.writeStream.foreachBatch(process_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if available_now:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def drain_enqueued(
    spark: SparkSession, out_dir: str
) -> tuple[Optional[DataFrame], list[str]]:
    """Read the appended ticket rows (engine side: union into the
    frontier with fresh seq numbers, then consume the files).

    Returns (df, files): the DataFrame reads EXACTLY the listed files —
    not the directory — so part files appended by the live stream after
    this listing are untouched by the caller's consume/rename step and
    drain in a later tick (the at-least-once half of exactly-once; the
    seen anti-join provides the at-most-once half)."""
    if not os.path.isdir(out_dir):
        return None, []
    files = sorted(
        os.path.join(out_dir, f)
        for f in os.listdir(out_dir)
        if f.endswith(".parquet")
    )
    if not files:
        return None, []
    return spark.read.parquet(*files), files
