"""Checkpoint-block release shared by the engine's iterative loops.

``localCheckpoint`` persists the materialized RDD; Spark's
ContextCleaner only reclaims those blocks after a JVM GC notices the
Python/JVM references are gone. Any loop that re-checkpoints its state
every superstep (the crawl scheduler, connected-components label
propagation) must therefore release the previous generation explicitly,
or executor storage accumulates one dead node-scale block set per
round until a GC happens to run.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame


def release_checkpoint(df: Optional[DataFrame]) -> None:
    """Free the persisted blocks behind a checkpointed DataFrame.

    Handles both plain ``localCheckpoint`` results and the stats-cut
    frames produced by ``plans.crawl._checkpoint`` (which hang the real
    checkpointed frame on ``_ckpt_source`` and any intermediate
    materialization on ``_ckpt_aux``). Safe to call on never-
    checkpointed frames (the unpersist seam throws; we swallow it).
    """
    if df is None:
        return
    aux = getattr(df, "_ckpt_aux", None)
    if aux is not None and aux is not df:
        release_checkpoint(aux)
    src = getattr(df, "_ckpt_source", df)
    try:
        src._jdf.queryExecution().analyzed().rdd().unpersist(False)
    except Exception:
        pass  # plan is not a LogicalRDD (never checkpointed) — nothing to free
