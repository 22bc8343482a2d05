"""The deterministic total order of the frontier.

The reference orders its wait queue by ``(Next asc — rounded to µs —,
Score desc)`` (queue/queue.go:182-193) with an arbitrary heap tie-break;
its disk heap refines that to a *total* order by encoding keys as
``timestamp ms + 3-digit (999-clamp(score,0,999)) + insertion uid``
(queue/ratelimitq/diskheap/diskheap.go:25-44), i.e. FIFO at equal
(time, score). We adopt the disk encoding as the engine's canonical
order — it subsumes the heap order and makes crawl order well-defined:

    ORDER BY next_ms ASC, prio ASC, seq ASC     (prio = 999-clamp(score))

``seq`` is a deterministic insertion number assigned by the driver loop
(never monotonically_increasing_id, which is partition-layout dependent).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

ORDER_COLS = ["next_ms", "prio", "seq"]


def prio_col(score: Column) -> Column:
    """999 - clamp(score, 0, 999): ascending prio = descending score."""
    return F.lit(999) - F.greatest(F.lit(0), F.least(F.lit(999), score.cast("int")))


def frontier_order(prefix: str = "") -> list[Column]:
    return [F.col(prefix + c).asc() for c in ORDER_COLS]


def emit_order() -> list[Column]:
    """Global crawl-order sort key of emitted (popped) items."""
    return [F.col("emit_ms").asc(), F.col("prio").asc(), F.col("seq").asc()]


def host_window() -> Window:
    """Per-host frontier ranking window (the secondary heap of
    ratelimitq, queue/ratelimitq/queue.go:48-93, in its disk order)."""
    return Window.partitionBy("host_key").orderBy(*frontier_order())


def topk_global(frontier: DataFrame, k: int) -> DataFrame:
    """Global earliest-k: the MemQueue pop order (memqueue.go:53-88) as a
    batch operator. Spark plans this as TakeOrderedAndProject — no full
    sort at scale."""
    return frontier.orderBy(*frontier_order()).limit(k)


_EMIT_ORDER_COLS = ["step", "emit_ms", "prio", "seq"]


def dense_ordinal(
    df: DataFrame,
    order_cols: list[str],
    *,
    base: int = 0,
    out_col: str = "ord",
    dtype: str = "long",
    checkpoint=None,
) -> DataFrame:
    """Dense 0-based ordinal ``base, base+1, …`` in ``ORDER BY
    order_cols`` — value-identical to ``row_number() OVER (ORDER BY …)``
    when the key is a strict total order, WITHOUT the global window's
    single-task sort of the whole input.

    Technique (shared by emit_ord, step-seq, and enqueue-drain seq):
    range-partition on the key, sort within partitions, count rows per
    partition (scalar metadata — the only driver data), convert counts
    to exclusive prefix offsets, add them to per-partition row numbers.
    The partitioned frame is checkpointed (``checkpoint`` — defaults to
    plain ``localCheckpoint``; the crawl loop passes its stats-cutting
    variant) so the count pass and the numbering pass see the same
    layout; the returned DataFrame carries that materialization as
    ``._ckpt_aux`` so callers can release it
    (state/ckpt.release_checkpoint) once downstream has materialized.
    """
    if checkpoint is None:
        checkpoint = lambda f: f.localCheckpoint()
    spark = df.sparkSession
    keys = [F.col(c).asc() for c in order_cols]
    n = max(2, spark.sparkContext.defaultParallelism)
    d = checkpoint(
        df.repartitionByRange(n, *keys)
        .sortWithinPartitions(*keys)
        .withColumn("_pid", F.spark_partition_id())
    )
    counts = {
        r["_pid"]: r["n"]
        for r in d.groupBy("_pid").agg(F.count("*").alias("n")).collect()
    }
    offs, acc = [], base
    for pid in sorted(counts):
        offs.append((pid, acc))
        acc += counts[pid]
    if not offs:
        offs = [(0, base)]
    offs_df = spark.createDataFrame(offs, "_pid int, _off long")
    w = Window.partitionBy("_pid").orderBy(*keys)
    out = (
        d.join(F.broadcast(offs_df), "_pid")
        .withColumn(out_col, (F.row_number().over(w) - 1 + F.col("_off")).cast(dtype))
        .drop("_pid", "_off")
    )
    out._ckpt_aux = d  # release handle for the partitioned materialization
    return out


def with_emit_order(emitted: DataFrame) -> DataFrame:
    """Assign the final crawl-order ordinal over the emitted log.

    Sort key: (step, emit_ms, prio, seq). The step comes FIRST because
    pops are finalized step-by-step and a later step can discover an
    item that pops at the SAME virtual time with a better priority
    (preemptive mux/score policies at interval-0 hosts): the serial
    scheduler pops it after the already-finalized items, so the disk
    order (emit_ms, prio, seq) alone would retro-sort it ahead of pops
    that factually preceded it. Within a step the disk order is the pop
    order; across steps e_min (and fast-mode emit ranges) never
    decrease, so the composite key is consistent in every mode.

    DISTRIBUTED assignment (no global window): a frontier row pops at
    most once, so ``seq`` is unique across the emitted log and the key
    is a strict total order — which means a global
    ``row_number() OVER (ORDER BY …)`` (one task sorting the ENTIRE
    crawl history — the reference never needs this serially because its
    disk-heap key encoding IS this order, diskheap.go:25-44) can be
    replaced value-for-value by range-partition + per-partition prefix
    offsets: range-partition on the key, sort within partitions,
    count rows per partition (scalar metadata — the only driver data),
    convert to exclusive prefix offsets, and add them to per-partition
    row numbers. The partitioned frame is checkpointed so the count
    pass and the numbering pass see the same layout; at scale that
    materialization is disk-backed and linear, vs. the window form's
    single-task sort of the whole log. Equality with the window form is
    pinned by tests/test_selection.py::test_emit_order_offset_matches_window
    and by every crawl-order-exact E2E."""
    return dense_ordinal(
        emitted, _EMIT_ORDER_COLS, base=0, out_col="emit_ord", dtype="int"
    )


def with_emit_order_window(emitted: DataFrame) -> DataFrame:
    """The single-window reference form of ``with_emit_order`` — kept
    ONLY as the equality oracle for the distributed assignment (it plans
    a `WindowExec: No Partition Defined` single-task sort, which is the
    scale defect the offset form removes). Not used on engine paths."""
    w = Window.orderBy(*[F.col(c).asc() for c in _EMIT_ORDER_COLS])
    return emitted.withColumn("emit_ord", F.row_number().over(w) - F.lit(1))
