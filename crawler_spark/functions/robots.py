"""robots.txt parsing + evaluation (S10) — host policy from robots files.

The reference keeps per-host robots data + sitemap URLs + visit interval
in its site-metadata store (_sitemeta/site.go:20-67,92-96; excluded from
its build but part of the documented surface). Here robots.txt is parsed
per the original robots exclusion protocol (public spec; Google's RFC
9309 semantics for Allow/Disallow precedence): user-agent groups,
longest-match rule precedence with Allow winning ties, `*` wildcards and
`$` anchors, Crawl-delay and Sitemap extensions.

Surfaces:
  * :func:`parse_robots` — pure Python → RobotsRules (oracle + driver);
  * :func:`robots_to_host_policy` — (host, robots_txt) rows → host_policy
    rows (interval from Crawl-delay, disallow prefixes for the engine's
    prefix gate) via an Arrow UDF;
  * :func:`allowed` — full longest-match evaluation for a (rules, path).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    LongType,
    StringType,
    StructField,
    StructType,
)


@dataclass
class RobotsRules:
    # (is_allow, path_pattern) in file order for the matched agent group
    rules: list = field(default_factory=list)
    crawl_delay_s: Optional[float] = None
    sitemaps: list = field(default_factory=list)


def parse_robots(text: Optional[str], agent: str = "*") -> RobotsRules:
    """Parse robots.txt for ``agent`` (falls back to the ``*`` group).

    Group selection: the most specific user-agent token that is a
    substring of ``agent`` (case-insensitive), else the ``*`` group.
    """
    out_by_agent: dict[str, RobotsRules] = {}
    sitemaps: list[str] = []
    current: list[str] = []
    last_was_agent = False
    if not text:
        return RobotsRules(sitemaps=[])
    for raw_line in text.splitlines():
        line = raw_line.split("#", 1)[0].strip()
        if not line or ":" not in line:
            continue
        key, _, val = line.partition(":")
        key = key.strip().lower()
        val = val.strip()
        if key == "user-agent":
            if not last_was_agent:
                current = []
            current.append(val.lower())
            out_by_agent.setdefault(val.lower(), RobotsRules())
            last_was_agent = True
            continue
        last_was_agent = False
        if key == "sitemap":
            sitemaps.append(val)
            continue
        for ua in current:
            g = out_by_agent.setdefault(ua, RobotsRules())
            if key == "disallow":
                if val:
                    g.rules.append((False, val))
                # empty Disallow = allow all (no rule)
            elif key == "allow":
                if val:
                    g.rules.append((True, val))
            elif key == "crawl-delay":
                try:
                    g.crawl_delay_s = float(val)
                except ValueError:
                    pass

    agent_l = agent.lower()
    chosen: Optional[RobotsRules] = None
    best_len = -1
    for ua, g in out_by_agent.items():
        if ua != "*" and ua in agent_l and len(ua) > best_len:
            chosen, best_len = g, len(ua)
    if chosen is None:
        chosen = out_by_agent.get("*", RobotsRules())
    return RobotsRules(
        rules=list(chosen.rules),
        crawl_delay_s=chosen.crawl_delay_s,
        sitemaps=sitemaps,
    )


def _pattern_to_regex(pat: str) -> re.Pattern:
    out = []
    for ch in pat:
        if ch == "*":
            out.append(".*")
        elif ch == "$":
            out.append("$")  # only meaningful at end; harmless elsewhere
        else:
            out.append(re.escape(ch))
    return re.compile("^" + "".join(out))


def _match_len(pat: str, path: str) -> int:
    """Specificity = pattern length if it matches the path prefix."""
    if _pattern_to_regex(pat).match(path):
        return len(pat)
    return -1


def allowed(rules: RobotsRules, path: str) -> bool:
    """RFC 9309 longest-match evaluation; Allow wins length ties."""
    best_allow = -1
    best_disallow = -1
    for is_allow, pat in rules.rules:
        ml = _match_len(pat, path)
        if ml < 0:
            continue
        if is_allow:
            best_allow = max(best_allow, ml)
        else:
            best_disallow = max(best_disallow, ml)
    return best_allow >= best_disallow


ROBOTS_POLICY_SCHEMA = StructType(
    [
        StructField("interval_ms", LongType()),
        StructField("robots_disallow", ArrayType(StringType())),
        StructField("robots_allow", ArrayType(StringType())),
        StructField("sitemaps", ArrayType(StringType())),
    ]
)


def robots_policy_udf(agent: str = "*", default_interval_ms: int = 0):
    """robots_txt column → (interval_ms, disallow[], allow[], sitemaps[])."""

    @F.pandas_udf(ROBOTS_POLICY_SCHEMA)
    def _parse(texts: pd.Series) -> pd.DataFrame:
        rows = []
        for t in texts:
            r = parse_robots(t, agent)
            interval = (
                int(r.crawl_delay_s * 1000)
                if r.crawl_delay_s is not None
                else default_interval_ms
            )
            rows.append(
                (
                    interval,
                    [p for ok, p in r.rules if not ok],
                    [p for ok, p in r.rules if ok],
                    list(r.sitemaps),
                )
            )
        return pd.DataFrame(rows, columns=ROBOTS_POLICY_SCHEMA.fieldNames())

    return _parse


def robots_to_host_policy(
    robots: DataFrame,
    *,
    host_col: str = "host_key",
    text_col: str = "robots_txt",
    agent: str = "*",
    default_interval_ms: int = 0,
    max_visits: int = 1,
) -> DataFrame:
    """(host, robots_txt) rows → HOST_POLICY_SCHEMA rows for the engine.

    The engine's accept gate uses prefix semantics (robots_disallow);
    full longest-match evaluation is available via :func:`allowed` for
    policies that need Allow overrides."""
    parsed = robots.select(
        F.col(host_col).alias("host_key"),
        robots_policy_udf(agent, default_interval_ms)(F.col(text_col)).alias("r"),
    )
    return parsed.select(
        "host_key",
        F.col("r.interval_ms").alias("interval_ms"),
        F.lit(max_visits).alias("max_visits"),
        F.col("r.robots_disallow").alias("robots_disallow"),
    )
