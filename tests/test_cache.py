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
        ("http://a.test/fresh", now - 10_000, now - 10_000, 60_000, 0, None, None, False, 100),
        ("http://a.test/stale-etag", now - 120_000, now - 120_000, 60_000, 0, '"e"', None, False, 100),
        ("http://a.test/stale-plain", now - 120_000, now - 120_000, 60_000, 0, None, None, False, 100),
        ("http://a.test/novalidate", now - 1_000, now - 1_000, 60_000, 0, '"e"', None, True, 100),
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


def test_cache_merge_lifecycle(spark):
    """S5 store lifecycle round-trip (cache.go:176-264, client.go:155-204):
    miss→Set, hit→unchanged, 304→Update (body kept; stale-Date ignored;
    uncacheable→Remove), modified reval→Set, uncacheable reval→Remove,
    error→untouched."""
    from crawler_spark.operators.cache import RESULT_COLS, cache_merge

    now = 2_000_000
    old = now - 100_000
    cache = spark.createDataFrame(
        [
            ("http://t/hit", old, old, 600_000, 0, None, None, False, 10),
            ("http://t/upd", old, old, 60_000, 0, '"e1"', None, False, 20),
            ("http://t/stale-date", old, old, 60_000, 0, '"e2"', None, False, 30),
            ("http://t/reval-uncache", old, old, 60_000, 0, '"e3"', None, False, 40),
            ("http://t/reval-modified", old, old, 60_000, 0, '"e4"', None, False, 50),
            ("http://t/err", old, old, 60_000, 0, '"e5"', None, False, 60),
            ("http://t/untouched", old, old, 60_000, 0, None, None, False, 70),
        ],
        CACHE_SCHEMA,
    )
    rcols = [c.strip() for c in RESULT_COLS.split(",")]
    results = spark.createDataFrame(
        [
            # url, route, status, cacheable, date, max_age, age, etag, lm, needval, bytes
            ("http://t/hit", "hit", 200, None, None, None, None, None, None, None, None),
            ("http://t/upd", "revalidate", 304, True, now, 120_000, 0, '"e1b"', None, False, None),
            ("http://t/stale-date", "revalidate", 304, True, old - 50_000, 120_000, 0, '"x"', None, False, None),
            ("http://t/reval-uncache", "revalidate", 304, False, now, None, None, None, None, None, None),
            ("http://t/reval-modified", "revalidate", 200, True, now, 90_000, 0, '"e4b"', None, False, 55),
            ("http://t/err", "revalidate", 503, None, None, None, None, None, None, None, None),
            ("http://t/miss-new", "miss", 200, True, now, 30_000, 0, None, None, False, 80),
            ("http://t/miss-uncache", "miss", 200, False, None, None, None, None, None, None, None),
            ("http://t/miss-err", "miss", 500, None, None, None, None, None, None, None, None),
        ],
        "url string, cache_route string, status int, resp_cacheable boolean, "
        "resp_date_ms long, resp_max_age_ms long, resp_age_ms long, resp_etag string, "
        "resp_last_modified_ms long, resp_need_validate boolean, resp_body_bytes long",
    ).select(*rcols)
    nxt = {r["url"]: r for r in cache_merge(cache, results, now).collect()}

    assert nxt["http://t/hit"]["fetched_ms"] == old  # untouched
    assert nxt["http://t/untouched"]["fetched_ms"] == old  # not in batch
    u = nxt["http://t/upd"]  # 304 Update: ctrl refreshed, body kept
    assert u["fetched_ms"] == now and u["etag"] == '"e1b"' and u["body_bytes"] == 20
    sd = nxt["http://t/stale-date"]  # RFC 13.12: older Date → keep cached
    assert sd["fetched_ms"] == old and sd["etag"] == '"e2"'
    assert "http://t/reval-uncache" not in nxt  # Remove
    m = nxt["http://t/reval-modified"]  # modified → Set (new body)
    assert m["fetched_ms"] == now and m["body_bytes"] == 55
    assert nxt["http://t/err"]["fetched_ms"] == old  # error → untouched
    n = nxt["http://t/miss-new"]  # miss → Set
    assert n["fetched_ms"] == now and n["body_bytes"] == 80
    assert "http://t/miss-uncache" not in nxt
    assert "http://t/miss-err" not in nxt
    assert len(nxt) == 7


def test_evict_cache(spark):
    from crawler_spark.operators.cache import evict_cache

    rows = [
        (f"http://t/p{i}", 1000 * i, 1000 * i, 0, 0, None, None, False, 100)
        for i in range(10)
    ]
    cache = spark.createDataFrame(rows, CACHE_SCHEMA)
    kept = {r["url"] for r in evict_cache(cache, 350).collect()}
    # deterministic: newest first within the byte budget
    assert kept == {"http://t/p9", "http://t/p8", "http://t/p7"}
    kept_part = evict_cache(cache, 1000, partitioned=True).count()
    assert 0 < kept_part <= 10
