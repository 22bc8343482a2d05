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

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

CACHEABLE_STATUS = (200, 203, 206, 300, 301)

CACHE_SCHEMA = (
    "url string, fetched_ms long, date_ms long, max_age_ms long, age_ms long, "
    "etag string, last_modified_ms long, need_validate boolean"
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


def cache_route_col(now_ms: int) -> Column:
    """'hit' | 'revalidate' | 'miss' from joined fetch_cache columns."""
    current_age = F.col("age_ms") + (F.lit(now_ms) - F.col("fetched_ms"))
    fresh = (
        F.col("fetched_ms").isNotNull()
        & ~F.coalesce(F.col("need_validate"), F.lit(False))
        & (current_age < F.col("max_age_ms"))
    )
    can_validate = F.col("fetched_ms").isNotNull() & (
        F.col("etag").isNotNull() | F.col("last_modified_ms").isNotNull()
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
