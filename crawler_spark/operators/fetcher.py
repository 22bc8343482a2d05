"""Production fetch stage (S4): vectorized per-host-batch fetching with
explicit heavy-host salting.

The reference's fetcher is a pool of 32 goroutines calling
``Client.Do`` (client.go:83-153, worker.go:24-45, option.go:25-32). The
Spark-native equivalent groups the selected batch by host (politeness
already bounded per-host counts) and runs one Arrow-batched
``applyInPandas`` call per (host, salt) group, so connection reuse /
per-host session state live inside the group while the cluster
parallelizes across groups.

The network client itself is injectable; the default is a clearly-marked
stub (this sandbox has no network — tests inject a deterministic fake,
the crawl engine's test semantics use the payload-table join instead).
What is REAL here and covered by tests is the Spark-side contract:
grouping, salting, schema, and batch shape.

Skew: a host with a huge admitted batch would serialize on one task;
``salt_heavy_hosts`` splits any host above ``max_batch_per_task`` into
ceil(n/max) salt groups (axes A+B explicit skew handling). Salting is
safe for the *fetch* stage only — ordering is restored downstream by the
deterministic (emit_ms, prio, seq) sort, and politeness was already
enforced at selection time.
"""

from __future__ import annotations

from typing import Callable, Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

FETCH_RESULT_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("seq", LongType()),
        StructField("status", IntegerType()),
        StructField("final_url", StringType()),  # post-redirect (fetch.go:73-81)
        StructField("content_type", StringType()),
        StructField("body", BinaryType()),
    ]
)


def default_client(urls: "pd.Series") -> "pd.DataFrame":
    """Network client slot. STUB: no network in this container."""
    raise NotImplementedError(
        "no network in this environment; inject client_fn(urls: pd.Series) "
        "-> pd.DataFrame[status:int, final_url:str, content_type:str, body:bytes]"
    )


def salt_heavy_hosts(
    selected: DataFrame, *, max_batch_per_task: int = 256, host_col: str = "host_key"
) -> DataFrame:
    """Add a ``salt`` column splitting oversized per-host batches.

    salt = row_number-within-host // max_batch_per_task keeps each
    (host, salt) group under the cap; light hosts get salt 0 and are
    untouched. One narrow window per host — cheap because selection
    already bounded per-host rows."""
    w = Window.partitionBy(host_col).orderBy("seq")
    return selected.withColumn(
        "salt",
        ((F.row_number().over(w) - 1) / F.lit(max_batch_per_task)).cast("int"),
    )


def fetch_batch(
    selected: DataFrame,
    client_fn: Callable = default_client,
    *,
    max_batch_per_task: int = 256,
    host_col: str = "host_key",
) -> DataFrame:
    """selected (url, host_key, seq, …) → FETCH_RESULT_SCHEMA rows.

    One applyInPandas task per (host, salt) group; the client_fn sees the
    whole group at once (connection reuse, pipelining)."""
    salted = salt_heavy_hosts(
        selected, max_batch_per_task=max_batch_per_task, host_col=host_col
    )

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        res = client_fn(pdf["url"])
        out = pd.DataFrame(
            {
                "url": pdf["url"].values,
                "seq": pdf["seq"].values,
                "status": res["status"].values,
                "final_url": res["final_url"].values,
                "content_type": res["content_type"].values,
                "body": res["body"].values,
            }
        )
        return out

    return (
        salted.select("url", "seq", host_col, "salt")
        .groupBy(host_col, "salt")
        .applyInPandas(lambda key, pdf: per_group(pdf), FETCH_RESULT_SCHEMA)
    )
