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
    decrease, so the composite key is consistent in every mode."""
    w = Window.orderBy(F.col("step").asc(), *emit_order())
    return emitted.withColumn("emit_ord", F.row_number().over(w) - F.lit(1))
