"""HTTP cache (S5) tests — freshness parse + batch routing."""

from crawler_spark.operators.cache import (
    CACHE_SCHEMA,
    parse_cache_control,
    parse_response_cache,
    route_fetch_batch,
)


def test_parse_cache_control():
    kv = parse_cache_control('max-age=60, no-cache, private="x"')
    assert kv["max-age"] == "60" and "no-cache" in kv and kv["private"] == "x"
    assert parse_cache_control(None) == {}


def test_parse_response_basics():
    r = parse_response_cache(200, {"Cache-Control": "max-age=120"}, 1000)
    assert r["max_age_ms"] == 120_000 and not r["need_validate"]
    # s-maxage wins when larger (cache.go:79-89)
    r = parse_response_cache(200, {"Cache-Control": "max-age=60, s-maxage=300"}, 1000)
    assert r["max_age_ms"] == 300_000
    # no-store → uncacheable
    assert parse_response_cache(200, {"Cache-Control": "no-store, max-age=60"}, 0) is None
    # no-cache → cache but always revalidate
    r = parse_response_cache(200, {"Cache-Control": "no-cache", "ETag": '"e1"'}, 0)
    assert r["max_age_ms"] == 0 and r["need_validate"] and r["etag"] == '"e1"'
    # uncacheable statuses
    assert parse_response_cache(404, {"Cache-Control": "max-age=60"}, 0) is None
    assert parse_response_cache(500, {"Cache-Control": "max-age=60"}, 0) is None
    # no directives at all → not cacheable
    assert parse_response_cache(200, {}, 0) is None


def test_expires_fallback():
    headers = {
        "Cache-Control": "public",
        "Date": "Wed, 01 Jan 2020 00:00:00 GMT",
        "Expires": "Wed, 01 Jan 2020 00:10:00 GMT",
    }
    r = parse_response_cache(200, headers, 1_577_836_800_000)
    assert r["max_age_ms"] == 600_000


def test_age_header():
    r = parse_response_cache(200, {"Cache-Control": "max-age=60", "Age": "30"}, 1000)
    assert r["age_ms"] == 30_000


def test_route_fetch_batch(spark):
    now = 1_000_000
    cache_rows = [
        ("http://a.test/fresh", now - 10_000, now - 10_000, 60_000, 0, None, None, False),
        ("http://a.test/stale-etag", now - 120_000, now - 120_000, 60_000, 0, '"e"', None, False),
        ("http://a.test/stale-plain", now - 120_000, now - 120_000, 60_000, 0, None, None, False),
        ("http://a.test/novalidate", now - 1_000, now - 1_000, 60_000, 0, '"e"', None, True),
    ]
    cache = spark.createDataFrame(cache_rows, CACHE_SCHEMA)
    batch = spark.createDataFrame(
        [(u,) for u, *_ in cache_rows] + [("http://a.test/unknown",)], ["url"]
    )
    got = {r["url"]: r["cache_route"] for r in route_fetch_batch(batch, cache, now).collect()}
    assert got["http://a.test/fresh"] == "hit"
    assert got["http://a.test/stale-etag"] == "revalidate"
    assert got["http://a.test/stale-plain"] == "miss"
    assert got["http://a.test/novalidate"] == "revalidate"  # no-cache + etag
    assert got["http://a.test/unknown"] == "miss"
