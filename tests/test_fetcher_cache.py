"""Production cache-header parsing through the fetch seam (VERDICT r3
#6): an injected client returns REAL header maps; parse_response_cache
turns them into the cache_merge inputs (operators/cache.RESULT_COLS)
inside the same Arrow batch as the fetch — and a crawl-loop E2E runs
with cache columns derived from header maps instead of fixture-
synthesized values, matching the serial oracle fed the same parse.
Reference: client.go:155-204 (post-response Set/Update/Remove from live
headers), cache/cache.go:58-134 (Parse).
"""

import pandas as pd
from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.operators.cache import header_cache_cols_udf, parse_response_cache
from crawler_spark.operators.fetcher import fetch_batch_with_cache
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.plans.oracle import WebRow, crawl_oracle

from tests.test_cache_loop import assert_match_with_routes

NOW = 1_700_000_000_000  # fixed wall clock for the batch


def test_fetch_batch_parses_real_headers(spark):
    # headers covering every Parse branch; the client is defined INSIDE
    # the test so cloudpickle ships it by value to the executors
    headers = {
        "/maxage": (200, {"Cache-Control": "max-age=300", "ETag": 'W/"a"'}),
        "/smaxage": (200, {"Cache-Control": "max-age=10, s-maxage=600"}),
        "/nostore": (200, {"Cache-Control": "no-store, max-age=999"}),
        "/nocache": (200, {"Cache-Control": "no-cache", "ETag": '"b"'}),
        "/mustreval": (200, {"Cache-Control": "must-revalidate, max-age=50"}),
        "/expires": (
            200,
            {
                "Date": "Tue, 14 Nov 2023 22:13:20 GMT",  # == NOW
                "Expires": "Tue, 14 Nov 2023 22:15:20 GMT",  # NOW + 120s
                "Age": "7",
            },
        ),
        "/plain": (200, {"Content-Type": "text/html"}),  # no directives → None
        "/notfound": (404, {"Cache-Control": "max-age=300"}),  # status gate
    }

    def client(urls: pd.Series) -> pd.DataFrame:
        rows = []
        for u in urls:
            suffix = "/" + u.rsplit("/", 1)[1]
            status, hdrs = headers[suffix]
            rows.append((status, u, "text/html", b"x" * 10, hdrs))
        return pd.DataFrame(
            rows, columns=["status", "final_url", "content_type", "body", "headers"]
        )

    sel = spark.createDataFrame(
        [(f"http://h.test{s}", "h.test", i) for i, s in enumerate(headers)],
        "url string, host_key string, seq long",
    )
    out = {
        r["url"].rsplit("/", 1)[1]: r
        for r in fetch_batch_with_cache(sel, client, now_ms=NOW).collect()
    }
    assert len(out) == len(headers)

    r = out["maxage"]
    assert r["resp_cacheable"] and r["resp_max_age_ms"] == 300_000
    assert r["resp_etag"] == 'W/"a"' and r["resp_need_validate"] is False
    assert r["resp_body_bytes"] == 10

    assert out["smaxage"]["resp_max_age_ms"] == 600_000  # bigger directive wins
    assert out["nostore"]["resp_cacheable"] is False  # no-store beats max-age
    r = out["nocache"]
    assert r["resp_cacheable"] and r["resp_max_age_ms"] == 0 and r["resp_need_validate"]
    r = out["mustreval"]
    assert r["resp_cacheable"] and r["resp_max_age_ms"] == 0 and not r["resp_need_validate"]
    r = out["expires"]
    assert r["resp_cacheable"] and r["resp_max_age_ms"] == 120_000
    assert r["resp_age_ms"] == 7_000  # Age header (date == fetched)
    assert r["resp_date_ms"] == NOW
    assert out["plain"]["resp_cacheable"] is False  # no directives
    assert out["notfound"]["resp_cacheable"] is False  # 404 never cacheable

    # the serial parser agrees row-for-row (shared function, but pin it)
    ent = parse_response_cache(200, headers["/maxage"][1], NOW)
    assert ent["max_age_ms"] == 300_000 and ent["etag"] == 'W/"a"'


def test_loop_runs_header_parsed_cache_columns(spark, tmp_path):
    """The crawl-loop cache lifecycle driven by cache columns PARSED
    from header maps (header_cache_cols_udf) instead of fixture-
    synthesized values; oracle fed the same parse. Routes must include
    hit + revalidate + miss and the whole order must match."""
    hdr_rows = [
        # (path, headers): long-fresh+etag → hit; no-cache+etag →
        # revalidate every revisit; no directives → miss every time
        ("/fresh", {"Cache-Control": "max-age=1000000", "ETag": '"f"'}),
        ("/reval", {"Cache-Control": "no-cache", "ETag": '"r"'}),
        ("/plain", {}),
    ]
    urls = [f"http://c.test{p}" for p, _ in hdr_rows]
    links = {urls[0]: [urls[1], urls[2]]}
    web_raw = spark.createDataFrame(
        [
            (u, "c.test", 200, links.get(u, []), None, dict(h))
            for (p, h), u in zip(hdr_rows, urls)
        ],
        "url string, host_key string, status int, out_links array<string>, "
        "redirect_to string, headers map<string,string>",
    )
    cc = header_cache_cols_udf()(F.col("status"), F.col("headers")).alias("cc")
    web = web_raw.select(
        "url", "host_key", "status", "out_links", "redirect_to", cc
    ).select("url", "host_key", "status", "out_links", "redirect_to", "cc.*")

    policy = CrawlPolicy(
        max_depth=2, max_visits=3, min_delay_ms=100, cache_enabled=True,
        obey_robots=False,
    )
    eng = CrawlEngine(spark, web, policy=policy, workdir=str(tmp_path / "w"))
    got = eng.run([urls[0]])

    oweb = {}
    for (p, h), u in zip(hdr_rows, urls):
        ent = parse_response_cache(200, h, 0)
        oweb[u] = WebRow(
            url=u, status=200, out_links=tuple(links.get(u, ())),
            cache_max_age_ms=None if ent is None else ent["max_age_ms"],
            cache_etag=None if ent is None else ent["etag"],
            cache_need_validate=False if ent is None else bool(ent["need_validate"]),
        )
    want = crawl_oracle(
        [urls[0]], oweb, {}, policy=policy, ticket_at=policy.ticket_at
    )
    assert_match_with_routes(got, want)
    routes = {r["cache_route"] for r in got.emitted.collect()}
    assert {"miss", "hit", "revalidate"} <= routes
