"""Sitemap XML source (S9) — sitemap entries → seed/frontier rows.

Reimplements the semantics of sitemap/sitemap.go:11-102: per-<url>
``loc``, ``priority``, ``changefreq`` (always/hourly/daily/weekly/
monthly/yearly/never → milliseconds; empty → 0; invalid → error) and
multi-layout ``lastmod`` parsing. Also handles <sitemapindex> nesting
one level (list of child sitemap locs).

Spark surface: ``parse_sitemaps_df`` maps a DataFrame of (url, xml)
pages through an Arrow-batched UDF into exploded entry rows that feed
seed injection (S1) with an initial score derived from priority and a
revisit interval derived from changefreq — the reference's consumers do
the same mapping by hand.
"""

from __future__ import annotations

import xml.etree.ElementTree as ET
from dataclasses import dataclass
from datetime import datetime, timezone
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.types import (
    ArrayType,
    DoubleType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MS = {
    "": 0,
    "always": 1000,  # second = minimum unit (sitemap.go:24-26)
    "hourly": 3_600_000,
    "daily": 86_400_000,
    "weekly": 7 * 86_400_000,
    "monthly": 30 * 86_400_000,
    "yearly": 365 * 86_400_000,
    # "never" must stay a *safe* sentinel: it flows into host_policy
    # interval_ms, and selection computes ready_ms = last_ms + interval_ms
    # in long arithmetic — 2^63-1 would overflow (ANSI ArithmeticException
    # or a negative wrap that makes a 'never' host immediately due).
    # 100 years keeps last_ms + interval_ms < 2^53 for any realistic clock.
    "never": 100 * 365 * 86_400_000,
}

# sitemap.go:52-59 time layouts (Go reference) → Python strptime
_LAYOUTS = [
    "%Y-%m-%d",
    "%Y-%m-%dT%H:%M%z",
    "%Y-%m-%dT%H:%M:%S%z",
    "%Y-%m-%dT%H:%M:%S.%f%z",
    "%Y-%m",
    "%Y",
]


@dataclass
class SitemapEntry:
    loc: str
    priority: float
    changefreq_ms: int
    lastmod_ms: Optional[int]


def _parse_time(s: str) -> Optional[int]:
    if not s:
        return None
    s2 = s.replace("Z", "+0000")
    for layout in _LAYOUTS:
        try:
            dt = datetime.strptime(s2, layout)
            if dt.tzinfo is None:
                dt = dt.replace(tzinfo=timezone.utc)
            return int(dt.timestamp() * 1000)
        except ValueError:
            continue
    return None


def _strip_ns(tag: str) -> str:
    return tag.rsplit("}", 1)[-1]


def parse_sitemap(xml_text: str) -> tuple[list[SitemapEntry], list[str]]:
    """Returns (url entries, child sitemap locs). Invalid changefreq
    raises ValueError (sitemap.go:40: invalid frequence is an error)."""
    root = ET.fromstring(xml_text)
    entries: list[SitemapEntry] = []
    children: list[str] = []
    for el in root:
        tag = _strip_ns(el.tag)
        fields = {_strip_ns(c.tag): (c.text or "").strip() for c in el}
        if tag == "sitemap":
            if fields.get("loc"):
                children.append(fields["loc"])
            continue
        if tag != "url":
            continue
        freq = fields.get("changefreq", "")
        if freq not in MS:
            raise ValueError(f"invalid frequence: {freq}")
        entries.append(
            SitemapEntry(
                loc=fields.get("loc", ""),
                priority=float(fields.get("priority") or 0.0),
                changefreq_ms=MS[freq],
                lastmod_ms=_parse_time(fields.get("lastmod", "")),
            )
        )
    return entries, children


ENTRY_SCHEMA = ArrayType(
    StructType(
        [
            StructField("loc", StringType()),
            StructField("priority", DoubleType()),
            StructField("changefreq_ms", LongType()),
            StructField("lastmod_ms", LongType()),
        ]
    )
)


def parse_sitemaps_df(pages: DataFrame, xml_col: str = "xml", url_col: str = "url") -> DataFrame:
    """(url, xml) rows → exploded sitemap entries (invalid XML → no rows,
    counted upstream). Arrow-batched; one Python pass per batch."""
    from pyspark.sql import functions as F

    @F.pandas_udf(ENTRY_SCHEMA)
    def _parse(xmls: pd.Series) -> pd.Series:
        out = []
        for x in xmls:
            try:
                entries, _ = parse_sitemap(x)
                out.append([(e.loc, e.priority, e.changefreq_ms, e.lastmod_ms) for e in entries])
            except (ET.ParseError, ValueError):
                out.append([])
        return pd.Series(out)

    return (
        pages.select(F.col(url_col).alias("sitemap_url"), F.explode(_parse(F.col(xml_col))).alias("e"))
        .select("sitemap_url", "e.*")
    )


def entries_to_seeds(entries: DataFrame, *, score_scale: int = 999) -> DataFrame:
    """Sitemap entries → seed rows: score = round(priority × scale)
    (priority ∈ [0,1] per the protocol), revisit interval = changefreq."""
    from pyspark.sql import functions as F

    return entries.select(
        F.col("loc").alias("seed"),
        F.round(F.col("priority") * score_scale).cast("int").alias("score"),
        F.col("changefreq_ms").alias("interval_ms"),
        "lastmod_ms",
    )


def children_udf():
    """xml column → array<string> of child sitemap locs (<sitemapindex>
    entries; empty for a plain <urlset> or invalid XML)."""
    from pyspark.sql import functions as F

    @F.pandas_udf(ArrayType(StringType()))
    def _kids(xmls: pd.Series) -> pd.Series:
        out = []
        for x in xmls:
            try:
                _, children = parse_sitemap(x)
                out.append(children)
            except (ET.ParseError, ValueError):
                out.append([])
        return pd.Series(out)

    return _kids


def discover_sitemap_seeds(
    robots: DataFrame,
    sitemap_pages: DataFrame,
    *,
    host_col: str = "host_key",
    text_col: str = "robots_txt",
    url_col: str = "url",
    xml_col: str = "xml",
    agent: str = "*",
    score_scale: int = 999,
) -> DataFrame:
    """S9 wiring (reference _sitemeta/site.go:20-67): per host, the
    robots.txt's ``Sitemap:`` URLs — defaulting to
    ``http://<host>/sitemap.xml`` when robots names none
    (site.go:60-66) — are joined to their XML bodies
    (``sitemap_pages``: the metadata-fetch table, distinct from the
    crawl web), parsed with ONE <sitemapindex> nesting level
    (sitemap.go:11-102), and exploded into per-URL seed rows.

    Returns (seed, host_key, score, interval_ms, lastmod_ms,
    sitemap_url): score = round(priority × scale) feeds the ticket
    priority; interval_ms = changefreq feeds the revisit policy (host
    interval or a per-URL mux freq — caller's choice of knob).

    Scale: the robots/sitemap tables are metadata-scale (one row per
    host / per sitemap file); every step is a hash join or an Arrow
    batch — no driver-side row data.
    """
    from pyspark.sql import functions as F

    from crawler_spark.functions.robots import robots_policy_udf

    r = robots.select(
        F.col(host_col).alias("host_key"),
        robots_policy_udf(agent)(F.col(text_col)).alias("r"),
    )
    sm = r.select(
        "host_key",
        F.explode(
            F.when(
                F.size(F.coalesce(F.col("r.sitemaps"), F.array())) > 0,
                F.col("r.sitemaps"),
            ).otherwise(
                F.array(F.concat(F.lit("http://"), F.col("host_key"), F.lit("/sitemap.xml")))
            )
        ).alias("sitemap_url"),
    )
    pages = sitemap_pages.select(
        F.col(url_col).alias("sitemap_url"), F.col(xml_col).alias("xml")
    )
    direct = sm.join(pages, "sitemap_url")
    kids = direct.select(
        "host_key", F.explode(children_udf()(F.col("xml"))).alias("sitemap_url")
    ).join(pages, "sitemap_url")
    all_pages = direct.unionByName(kids).dropDuplicates(["host_key", "sitemap_url"])
    entries = parse_sitemaps_df(all_pages, xml_col="xml", url_col="sitemap_url")
    hosts = all_pages.select("sitemap_url", "host_key").dropDuplicates(["sitemap_url"])
    return (
        entries.join(hosts, "sitemap_url")
        .select(
            F.col("loc").alias("seed"),
            "host_key",
            F.round(F.col("priority") * score_scale).cast("int").alias("score"),
            F.col("changefreq_ms").alias("interval_ms"),
            "lastmod_ms",
            "sitemap_url",
        )
    )


def write_sitemap_tickets(seeds: DataFrame, enqueue_dir: str) -> int:
    """Feed discovered sitemap seeds into the engine's S2 enqueue path:
    canonicalize, dedupe (min-score-key = best priority wins — the merge
    dedupes arbitrarily, so tickets must arrive one-per-url), shape as
    frontier tickets with the per-URL score PRESERVED (richer than the
    text drop-dir, same drain protocol), append to the drain directory.
    Returns the ticket count. The engine folds them in at its next tick
    boundary exactly like streamed Enqueue rows (crawler.go:143-158)."""
    from pyspark.sql import functions as F

    from crawler_spark.functions.urlnorm import canonicalize_udf
    from crawler_spark.operators.ordering import prio_col

    t = (
        seeds.select("seed", "score", canonicalize_udf("seed").alias("c"))
        .where("c.valid")
        .groupBy(F.col("c.url").alias("url"))
        .agg(
            F.max("score").alias("score"),
            F.first("c.host_key").alias("host_key"),
        )
        .select(
            "url",
            "host_key",
            F.lit(0).cast("long").alias("next_ms"),
            F.lit(0).cast("long").alias("avail_ms"),
            F.col("score").cast("int").alias("score"),
            prio_col(F.col("score").cast("int")).alias("prio"),
            F.lit(-1).cast("long").alias("seq"),  # assigned on frontier merge
            F.lit(0).alias("depth"),
            F.lit(0).alias("num_retry"),
        )
    )
    t = t.persist()
    n = t.count()
    if n:
        t.write.mode("append").parquet(enqueue_dir)
    t.unpersist()
    return n
