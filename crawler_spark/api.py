"""User-facing façade mirroring the reference crawler's public API.

The reference exposes ``NewCrawler(cfg) → Crawler`` with ``Crawl(seeds…)``,
``Enqueue(urls…)``, ``Wait()``/``Stop()`` (crawler.go:28-64,66-91,143-158,
160-173) configured by ``Option`` (option.go:14-33) and a user
``Controller`` (ctrl.go:17-47). A user of the reference maps onto this
module as:

    reference                      crawler_spark
    -------------------------      -----------------------------------------
    NewCrawler(&Option{...})       Crawler(spark, web_or_client, policy=...)
    ctrl.Sched/Resched/Retry       CrawlPolicy score_expr / ticket_at /
                                     max_visits / min_delay_ms /
                                     retry_delay_ms / max_retry
    ctrl.Accept                    CrawlPolicy max_depth / same_host_only /
                                     obey_robots (+ patterns/mux predicates)
    ctrl.Prepare (cancel)          CrawlPolicy max_fetches_per_host (C6)
    ctrl.Etc.Interval              host_policy.interval_ms / robots
                                     Crawl-delay via robots_to_host_policy
    Crawl(seeds...)                .crawl(*seeds) — blocking batch run
    Enqueue(urls...)               .enqueue(*urls) — mid-crawl or pre-run
    recover from store             .resume()
    Wait()/Stop()                  the batch run returns when IsFinished
                                     (C7) or max_pops/max_steps hit

Unlike the reference's always-on goroutine ring, a batch engine runs to
completion per call; ``enqueue`` therefore works both before a run
(tickets folded in at step 0) and concurrently from another process via
the same drop directory (S2 exactly-once contract, streaming/enqueue.py).
"""

from __future__ import annotations

import os
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine, CrawlResult


class Crawler:
    """Reference-shaped entry point over :class:`CrawlEngine`.

    ``web`` is the fetch source: the deterministic payload/link table in
    tests (S4 test semantics), or a production table driven by the
    injectable fetch client (operators/fetcher.py).
    """

    def __init__(
        self,
        spark: SparkSession,
        web: DataFrame,
        *,
        policy: CrawlPolicy = CrawlPolicy(),
        host_policy: Optional[DataFrame] = None,
        workdir: str = "/tmp/crawler_spark_work",
        snapshot_every: int = 0,
        max_pops: Optional[int] = None,
        **engine_kwargs,
    ):
        self.spark = spark
        self._enqueue_dir = os.path.join(workdir, "enqueue")
        os.makedirs(self._enqueue_dir, exist_ok=True)
        self.engine = CrawlEngine(
            spark,
            web,
            host_policy=host_policy,
            policy=policy,
            workdir=workdir,
            snapshot_every=snapshot_every,
            max_pops=max_pops,
            enqueue_dir=self._enqueue_dir,
            **engine_kwargs,
        )

    # -- Crawl(seeds ...string) — crawler.go:66-91 ----------------------- #
    def crawl(self, *seeds: str) -> CrawlResult:
        """Run the crawl from ``seeds`` until IsFinished (or the
        configured pop/step budget). Blocking, like Crawl+Wait."""
        return self.engine.run(list(seeds))

    # -- Enqueue(urls ...string) — crawler.go:143-158 --------------------- #
    def enqueue(self, *urls: str) -> int:
        """Feed URLs into the frontier: normalized, deduped against seen,
        ticketed at the next tick boundary (S2). Callable before a run or
        concurrently with one (the drop directory is the channel)."""
        from crawler_spark.operators.ordering import prio_col
        from pyspark.sql import functions as F

        from crawler_spark.functions.urlnorm import canonicalize_udf

        if not urls:
            return 0
        raw = self.spark.createDataFrame([(u,) for u in urls], ["raw"])
        c = raw.select(canonicalize_udf("raw").alias("c")).select("c.*").where("valid")
        score = F.expr(self.engine.policy.score_expr).cast("int")
        tickets = c.select(
            "url",
            "host_key",
            F.lit(0).cast("long").alias("next_ms"),
            F.lit(0).cast("long").alias("avail_ms"),
            score.alias("score"),
            prio_col(score).alias("prio"),
            F.lit(-1).cast("long").alias("seq"),
            F.lit(0).alias("depth"),
            F.lit(0).alias("num_retry"),
        )
        n = tickets.count()
        if n:
            tickets.write.mode("append").parquet(self._enqueue_dir)
        return n

    # -- recover() — crawler.go:93-113, S3 -------------------------------- #
    def resume(self) -> CrawlResult:
        """Continue from the latest committed snapshot (exact resume)."""
        return self.engine.resume()
