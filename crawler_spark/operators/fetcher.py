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
    BooleanType,
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


# fetch result + the parsed cache-control merge inputs (RESULT_COLS of
# operators/cache.py) — what the production path hands cache_merge
FETCH_CACHE_RESULT_SCHEMA = StructType(
    list(FETCH_RESULT_SCHEMA.fields)
    + [
        StructField("resp_cacheable", BooleanType()),
        StructField("resp_date_ms", LongType()),
        StructField("resp_max_age_ms", LongType()),
        StructField("resp_age_ms", LongType()),
        StructField("resp_etag", StringType()),
        StructField("resp_last_modified_ms", LongType()),
        StructField("resp_need_validate", BooleanType()),
        StructField("resp_body_bytes", LongType()),
    ]
)


def fetch_batch_with_cache(
    selected: DataFrame,
    client_fn: Callable,
    *,
    now_ms: int,
    max_batch_per_task: int = 256,
    host_col: str = "host_key",
) -> DataFrame:
    """Production cache-header path (client.go:155-204): the injected
    ``client_fn`` additionally returns a ``headers`` column (list of
    dicts, one per url); ``parse_response_cache`` turns each response's
    REAL header map into the exact merge inputs
    (``operators/cache.RESULT_COLS``) that the engine's fixture path
    synthesizes — parsed inside the SAME Arrow batch as the fetch, no
    second Python pass over the rows."""
    from crawler_spark.operators.cache import parse_response_cache

    salted = salt_heavy_hosts(
        selected, max_batch_per_task=max_batch_per_task, host_col=host_col
    )

    def per_group(pdf: "pd.DataFrame") -> "pd.DataFrame":
        res = client_fn(pdf["url"])
        parsed = []
        for status, body, hdrs in zip(res["status"], res["body"], res["headers"]):
            nb = len(body) if body is not None else 0
            ent = parse_response_cache(int(status), dict(hdrs or {}), now_ms)
            if ent is None:
                parsed.append((False, None, None, None, None, None, False, nb))
            else:
                parsed.append(
                    (
                        True,
                        ent["date_ms"],
                        ent["max_age_ms"],
                        ent["age_ms"],
                        ent["etag"],
                        ent["last_modified_ms"],
                        bool(ent["need_validate"]),
                        nb,
                    )
                )
        cc = pd.DataFrame(
            parsed,
            columns=[
                "resp_cacheable", "resp_date_ms", "resp_max_age_ms", "resp_age_ms",
                "resp_etag", "resp_last_modified_ms", "resp_need_validate",
                "resp_body_bytes",
            ],
        )
        base = pd.DataFrame(
            {
                "url": pdf["url"].values,
                "seq": pdf["seq"].values,
                "status": res["status"].values,
                "final_url": res["final_url"].values,
                "content_type": res["content_type"].values,
                "body": res["body"].values,
            }
        )
        return pd.concat([base.reset_index(drop=True), cc], axis=1)

    return (
        salted.select("url", "seq", host_col, "salt")
        .groupBy(host_col, "salt")
        .applyInPandas(lambda key, pdf: per_group(pdf), FETCH_CACHE_RESULT_SCHEMA)
    )
