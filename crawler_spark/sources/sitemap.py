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
