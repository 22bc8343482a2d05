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


_WARNED_CKPT_FALLBACK = False


def checkpoint_cut_stats(df: DataFrame, force_fallback: bool = False) -> DataFrame:
    """Materialize + cut lineage AND cut statistics.

    ``Dataset.localCheckpoint`` preserves the optimized plan's size
    statistics on the resulting LogicalRDD. In an iterative loop whose
    state is built from joins over the previous state, Catalyst's
    size-only join estimation then *multiplies* those preserved stats
    step over step — the sizeInBytes BigInt doubles in bit-length every
    step, and by step ~20 planning burns minutes (or the driver heap)
    inside BigInteger.multiply (measured in the crawl loop: step latency
    3.4s → 50s between steps 12 and 20; measured in the in-loop dedup
    index: driver OOM at ~25 chained folds). Rebuilding the frame from
    the checkpointed internal RDD drops the poisoned stats (leaf reverts
    to defaultSizeInBytes, a constant). Broadcast decisions don't
    regress: the loops broadcast their small sides explicitly.

    The stats-cut goes through private JVM seams (`queryExecution().
    toRdd()` + `internalCreateDataFrame`) that a Spark upgrade may move;
    if they throw, fall back to the plain localCheckpoint — callers stay
    CORRECT, only iterative planning cost regresses (pin the Spark
    version or re-find the seam if that happens; the fallback logs
    once). Verified against pyspark 4.1.x.
    """
    spark = df.sparkSession
    ck = df.localCheckpoint(eager=True)
    try:
        if force_fallback:
            raise RuntimeError("forced fallback (tests exercise the seamless path)")
        jrdd = ck._jdf.queryExecution().toRdd()
        jschema = spark._jvm.org.apache.spark.sql.types.DataType.fromJson(ck.schema.json())
        out = DataFrame(spark._jsparkSession.internalCreateDataFrame(jrdd, jschema, False), spark)
    except Exception:
        global _WARNED_CKPT_FALLBACK
        if not _WARNED_CKPT_FALLBACK:
            _WARNED_CKPT_FALLBACK = True
            import warnings

            warnings.warn(
                "crawler_spark: internal checkpoint seam unavailable on this "
                "Spark version; falling back to plain localCheckpoint (correct "
                "but Catalyst stats poisoning makes long loops re-plan slowly)"
            )
        out = ck
    out._ckpt_source = ck  # handle for release_checkpoint
    aux = getattr(df, "_ckpt_aux", None)
    if aux is not None:
        out._ckpt_aux = aux  # intermediate checkpoint freed with this one
    return out


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
