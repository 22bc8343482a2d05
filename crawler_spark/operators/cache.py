"""HTTP fetch cache (S5) — RFC 2616 freshness as batch columns.

Reimplements the decision logic of cache/cache.go:58-134 (Parse: only
200/203/206/300/301 cacheable; max-age beats s-maxage beats Expires−Date;
no-store ⇒ uncacheable; no-cache/must-revalidate ⇒ maxAge 0 with/without
revalidation; Age header feeds current age) and the revalidation split of
client.go:98-113,155-204 (fresh ⇒ serve from cache; stale with
ETag/Last-Modified ⇒ conditional revalidate; else refetch).

Batch phrasing: a ``fetch_cache`` table keyed by url
(url, fetched_ms, date_ms, max_age_ms, age_ms, etag, last_modified_ms,
need_validate) left-joins the selected fetch batch; each row is routed
``hit`` / ``revalidate`` / ``miss`` by pure column logic. At 10^10 scale
the cache table is hash-partitioned by url (same layout as ``seen``) so
the join co-partitions with the anti-join shuffle.
"""

from __future__ import annotations

import re
from email.utils import parsedate_to_datetime
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CACHEABLE_STATUS = (200, 203, 206, 300, 301)

CACHE_SCHEMA = (
    "url string, fetched_ms long, date_ms long, max_age_ms long, age_ms long, "
    "etag string, last_modified_ms long, need_validate boolean, body_bytes long"
)

# per-row fetch outcome columns consumed by cache_merge (the parsed
# Cache-Control of the *new* response — production fills them via a
# pandas UDF over header maps using parse_response_cache; tests/oracle
# synthesize them directly)
RESULT_COLS = (
    "url, cache_route, status, resp_cacheable, resp_date_ms, resp_max_age_ms, "
    "resp_age_ms, resp_etag, resp_last_modified_ms, resp_need_validate, resp_body_bytes"
)


def _http_date_ms(s: Optional[str]) -> Optional[int]:
    if not s:
        return None
    try:
        return int(parsedate_to_datetime(s).timestamp() * 1000)
    except (TypeError, ValueError):
        return None


def parse_cache_control(s: Optional[str]) -> dict[str, Optional[str]]:
    kv: dict[str, Optional[str]] = {}
    if not s:
        return kv
    for part in s.split(","):
        part = part.strip()
        if not part:
            continue
        m = re.match(r"([^=\s]+)\s*(?:=\s*\"?([^\"]*)\"?)?$", part)
        if m:
            kv[m.group(1).lower()] = m.group(2)
    return kv


def parse_response_cache(
    status: int,
    headers: dict[str, str],
    fetched_ms: int,
) -> Optional[dict]:
    """cache/cache.go:58-134 Parse → a fetch_cache row (None = don't cache)."""
    if status not in CACHEABLE_STATUS:
        return None
    h = {k.lower(): v for k, v in headers.items()}
    date_ms = _http_date_ms(h.get("date")) or fetched_ms
    kv = parse_cache_control(h.get("cache-control"))

    max_age_ms = -1
    sec = -1
    for key in ("max-age", "s-maxage"):
        v = kv.get(key)
        if v is not None:
            try:
                i = int(v)
                if i > sec:
                    sec = i
            except ValueError:
                pass
    if sec >= 0:
        max_age_ms = sec * 1000
    elif h.get("expires"):
        exp = _http_date_ms(h["expires"])
        if exp is not None:
            max_age_ms = exp - date_ms

    need_validate = False
    if "no-store" in kv:
        return None
    if "no-cache" in kv:
        max_age_ms, need_validate = 0, True
    elif "must-revalidate" in kv:
        max_age_ms = 0
    elif max_age_ms < 0:
        return None

    age_ms = 0
    if h.get("age"):
        try:
            age_ms = int(h["age"]) * 1000
        except ValueError:
            pass
    # computeAge: max(fetched - date, age header) (cache.go:30-48 spirit)
    age_ms = max(age_ms, fetched_ms - date_ms, 0)

    return dict(
        url=None,  # caller fills
        fetched_ms=fetched_ms,
        date_ms=date_ms,
        max_age_ms=max_age_ms,
        age_ms=age_ms,
        etag=h.get("etag"),
        last_modified_ms=_http_date_ms(h.get("last-modified")),
        need_validate=need_validate,
    )


def header_cache_cols_udf():
    """(status, headers map) → struct(cache_max_age_ms, cache_etag,
    cache_need_validate): the web-fixture cache-control columns derived
    from REAL header maps by ``parse_response_cache`` (client.go:155-204
    parses live headers the same way). The loop stamps fetched/date at
    emit time, so only the CONTROL fields flow from here — use header
    recipes whose freshness is date-independent (max-age / s-maxage /
    no-cache / no-store / ETag) when driving the in-loop lifecycle."""
    from pyspark.sql.types import BooleanType, LongType, StringType, StructField, StructType

    schema = StructType(
        [
            StructField("cache_max_age_ms", LongType()),
            StructField("cache_etag", StringType()),
            StructField("cache_need_validate", BooleanType()),
        ]
    )

    @F.pandas_udf(schema)
    def _parse(status: pd.Series, headers: pd.Series) -> pd.DataFrame:
        rows = []
        for st, h in zip(status, headers):
            ent = parse_response_cache(
                int(st) if st is not None else 0, dict(h or {}), 0
            )
            if ent is None:
                rows.append((None, None, False))
            else:
                rows.append((ent["max_age_ms"], ent["etag"], bool(ent["need_validate"])))
        return pd.DataFrame(
            rows, columns=["cache_max_age_ms", "cache_etag", "cache_need_validate"]
        )

    return _parse


def cache_route_col(now_ms, prefix: str = "") -> Column:
    """'hit' | 'revalidate' | 'miss' from joined fetch_cache columns.

    ``now_ms`` may be a scalar (one clock for the whole batch) or a
    Column (per-row virtual clock — the crawl loop routes each pop at
    its own emit_ms). ``prefix`` reads the cache columns under aliased
    names (the engine joins them as c_*) so route logic stays single-
    sourced."""
    now = F.lit(now_ms) if isinstance(now_ms, int) else now_ms

    def c(name: str) -> Column:
        return F.col(prefix + name)

    current_age = c("age_ms") + (now - c("fetched_ms"))
    fresh = (
        c("fetched_ms").isNotNull()
        & ~F.coalesce(c("need_validate"), F.lit(False))
        & (current_age < c("max_age_ms"))
    )
    can_validate = c("fetched_ms").isNotNull() & (
        c("etag").isNotNull() | c("last_modified_ms").isNotNull()
    )
    return (
        F.when(fresh, F.lit("hit"))
        .when(can_validate, F.lit("revalidate"))
        .otherwise(F.lit("miss"))
    )


def route_fetch_batch(
    selected: DataFrame, fetch_cache: DataFrame, now_ms: int, url_col: str = "url"
) -> DataFrame:
    """selected ⟕ fetch_cache → + cache_route column. The cache table is
    co-partitioned with `seen` (hash by url) so this join reuses the
    existing shuffle layout; for small hot caches broadcast wins."""
    return selected.join(fetch_cache, url_col, "left").withColumn(
        "cache_route", cache_route_col(now_ms)
    )


def cache_merge(
    fetch_cache: DataFrame, results: DataFrame, now_ms: int
) -> DataFrame:
    """Post-fetch cache maintenance — the batch MERGE expressing
    ``Pool.Set/Update/Remove`` (cache/cache.go:190-264) and the
    revalidation bookkeeping of ``StdClient.revalidate``
    (client.go:155-204):

      * route ``hit`` (or url untouched this tick) → entry unchanged;
      * route ``revalidate`` + 304 → **Update**: keep the body; refresh
        the control fields from the 304 response — unless the new Date
        precedes the cached Date (RFC 2616 §13.12 cache replacement:
        keep the newer entry, cache.go:227-230) or the new control is
        uncacheable (→ **Remove**, client.go:184-186);
      * any 2xx fetch (miss, or revalidate-that-modified) with a
        cacheable response → **Set**: insert/replace the entry
        (cache.go:190-215);
      * revalidate-that-modified with an *uncacheable* response →
        **Remove** (client.go:184-186);
      * error outcomes leave the pool untouched (Do returns before any
        cache write, client.go:114-136).

    ``results`` columns: RESULT_COLS (resp_* = parsed Cache-Control of
    the new response; resp_cacheable=false models Parse returning nil).
    Returns the next fetch_cache table. One full-outer join on url —
    co-partitioned with the cache table's hash-by-url layout at scale.
    Eviction is a separate operator (:func:`evict_cache`).

    The entry layout is taken from ``fetch_cache``'s own schema: any
    column beyond the standard control fields (the crawl engine adds
    status/links/base_url as its body stand-in) is treated as BODY —
    refreshed on Set, kept from the old entry on a 304 Update (RFC 7232:
    a 304 updates stored metadata, the representation is unchanged).
    ``results`` must then carry a matching ``resp_<col>`` per payload
    column. ``now_ms`` may be a Column for per-row clocks (the engine
    passes emit_ms)."""
    payload = [c for c in fetch_cache.columns if c != "url"]
    control = {"date_ms", "max_age_ms", "age_ms", "etag", "last_modified_ms", "need_validate"}
    now = (F.lit(now_ms) if isinstance(now_ms, int) else now_ms).cast("long")
    old = fetch_cache.select("url", F.struct(*payload).alias("_old"))
    need = ["url", "cache_route", "status", "resp_cacheable"] + [
        f"resp_{c}" for c in payload if c != "fetched_ms"
    ]
    if not isinstance(now_ms, int):
        # a Column clock references results columns (e.g. emit_ms) —
        # keep whatever extra columns results carries so it resolves
        need += [c for c in results.columns if c not in need]
    res = results.select(*need)
    j = old.join(res, "url", "full")

    def entry(kept_body: bool) -> Column:
        fields = []
        for c in payload:
            if c == "fetched_ms":
                fields.append(now.alias(c))
            elif kept_body and c not in control:
                fields.append(F.col(f"_old.{c}").alias(c))
            else:
                fields.append(F.col(f"resp_{c}").alias(c))
        return F.struct(*fields)

    new_entry = entry(kept_body=False)
    updated_entry = entry(kept_body=True)  # body kept on 304
    ok2xx = (F.col("status") >= 200) & (F.col("status") < 300)
    untouched = F.col("cache_route").isNull() | (F.col("cache_route") == "hit")
    reval = F.col("cache_route") == "revalidate"
    cacheable = F.coalesce("resp_cacheable", F.lit(False))

    next_entry = (
        F.when(untouched, F.col("_old"))
        .when(
            reval & (F.col("status") == 304),
            F.when(F.col("resp_date_ms") < F.col("_old.date_ms"), F.col("_old"))
            .when(~cacheable, F.lit(None))
            .otherwise(updated_entry),
        )
        .when(ok2xx & cacheable, new_entry)  # Set (miss or modified reval)
        .when(reval & ok2xx & ~cacheable, F.lit(None))  # Remove
        .otherwise(F.col("_old"))  # errors / uncacheable miss: untouched
    )
    return (
        j.withColumn("_next", next_entry)
        .where(F.col("_next").isNotNull())
        .select("url", "_next.*")
    )


def evict_cache(
    fetch_cache: DataFrame, max_bytes: int, *, partitioned: bool = False
) -> DataFrame:
    """Size-bounded eviction (cache.go:202-208 evicts arbitrary entries
    until the new body fits; our deterministic refinement keeps the most
    recently fetched entries within the byte budget, ties by url).

    ``partitioned=True`` applies the budget per hash-partition of url
    (budget/P each) — no global window, the 10^10-scale path; the exact
    global variant is the small-scale/oracle face."""
    from pyspark.sql import Window

    if partitioned:
        npart = fetch_cache.sparkSession.sparkContext.defaultParallelism
        part = F.pmod(F.xxhash64("url"), F.lit(npart))
        w = Window.partitionBy(part).orderBy(
            F.col("fetched_ms").desc(), F.col("url").asc()
        )
        budget = max_bytes // npart
    else:
        w = Window.orderBy(F.col("fetched_ms").desc(), F.col("url").asc())
        budget = max_bytes
    cum = F.sum(F.coalesce("body_bytes", F.lit(0))).over(
        w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return fetch_cache.withColumn("_cum", cum).where(F.col("_cum") <= budget).drop("_cum")
