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

import functools
import re
from dataclasses import dataclass, field
from typing import Optional

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
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


@functools.lru_cache(maxsize=4096)
def _pattern_to_regex(pat: str) -> re.Pattern:
    """RFC 9309: ``*`` matches any chars; ``$`` is an end-anchor ONLY as
    the final character — a mid-pattern ``$`` is a literal (a rule like
    ``/a$b`` must still match the path ``/a$b/x``). Compiled patterns are
    cached (the same handful of rules evaluates per crawled link)."""
    out = []
    for i, ch in enumerate(pat):
        if ch == "*":
            out.append(".*")
        elif ch == "$" and i == len(pat) - 1:
            out.append("$")
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


def prefix_safe_rules(rules: list) -> list[str]:
    """Disallow rules expressible as literal path prefixes (the legacy
    engine gate's semantics): plain rules pass through; a single trailing
    ``*`` is redundant and stripped; anything else (inner wildcards,
    ``$`` anchors) is NOT prefix-expressible and is excluded — callers
    that need those must evaluate the full rule set via ``allowed()``
    (the engine does when ``robots_rules`` is present)."""
    out = []
    for is_allow, pat in rules:
        if is_allow:
            continue
        if pat.endswith("*") and "*" not in pat[:-1] and "$" not in pat:
            out.append(pat[:-1])
        elif "*" not in pat and "$" not in pat:
            out.append(pat)
    return out


def robots_gate_udf(spark, host_rules: dict):
    """Full RFC 9309 gate as a vectorized-transfer UDF: (host, path) →
    allowed?  ``host_rules`` maps host_key → [(is_allow, pattern), …] in
    file order and ships once via ``sc.broadcast`` (per-host robots at
    10^10-URL scale is still ~1 rule-list per registered host — the same
    broadcast budget as host_policy itself). Hosts without rules are
    allowed. Pattern regexes are process-cached (lru_cache)."""
    bc = spark.sparkContext.broadcast(host_rules)

    @F.pandas_udf("boolean")
    def _gate(host: pd.Series, path: pd.Series) -> pd.Series:
        rules_map = bc.value
        out = []
        for h, p in zip(host, path):
            rl = rules_map.get(h)
            if not rl:
                out.append(True)
            else:
                out.append(allowed(RobotsRules(rules=rl), p))
        return pd.Series(out)

    return _gate


def robots_gate_join(
    links: DataFrame,
    rules: DataFrame,
    *,
    host_col: str = "host_key",
    path_col: str = "path",
    broadcast_rules: bool = False,
) -> DataFrame:
    """Join-based RFC 9309 gate — the beyond-broadcast scale path.

    ``robots_gate_udf`` ships ALL hosts' rules to every executor, which
    is right while the registered-host set is broadcast-sized. At
    10^10-URL scale with tens of millions of robots-bearing hosts the
    rules are a TABLE, not a broadcast: this variant left-joins the links
    to ``rules (host_key, robots_rules array<struct<allow,pat>>)`` on
    host (hash-shuffle by default so it co-partitions with the rules
    table's layout; ``broadcast_rules=True`` opts back into a broadcast
    join for small rule sets) and evaluates longest-match in an
    Arrow-batched UDF over the (rules, path) columns — each row carries
    only ITS host's rules, so executor memory stays flat no matter how
    many hosts exist. Hosts without rules pass.

    Contract: ``rules`` holds ONE row per host (it is a per-host robots
    cache). A duplicate host row would fan out every link for that host
    N times through the left join, so the rules side is deduplicated
    here defensively (arbitrary winner — duplicates would indicate an
    upstream bug, not a semantic choice).

    Returns ``links`` filtered to allowed rows (same columns)."""
    r = (
        rules.select(host_col, F.col("robots_rules").alias("_rr"))
        .dropDuplicates([host_col])
    )
    j = links.join(F.broadcast(r) if broadcast_rules else r, host_col, "left")

    @F.pandas_udf("boolean")
    def _allowed(rr: pd.Series, path: pd.Series) -> pd.Series:
        out = []
        for rules_row, p in zip(rr, path):
            if rules_row is None or len(rules_row) == 0:
                out.append(True)
                continue
            rl = [(bool(x["allow"]), x["pat"]) for x in rules_row]
            out.append(allowed(RobotsRules(rules=rl), p))
        return pd.Series(out)

    return j.where(_allowed(F.col("_rr"), F.col(path_col))).drop("_rr")


ROBOTS_POLICY_SCHEMA = StructType(
    [
        StructField("interval_ms", LongType()),
        StructField("robots_disallow", ArrayType(StringType())),
        StructField("robots_allow", ArrayType(StringType())),
        StructField("sitemaps", ArrayType(StringType())),
        # full rule list in file order for RFC 9309 longest-match eval
        StructField(
            "robots_rules",
            ArrayType(
                StructType(
                    [StructField("allow", BooleanType()), StructField("pat", StringType())]
                )
            ),
        ),
    ]
)


def robots_policy_udf(agent: str = "*", default_interval_ms: int = 0):
    """robots_txt column → (interval_ms, disallow[], allow[], sitemaps[],
    rules[]).  ``robots_disallow`` carries only the PREFIX-SAFE subset
    (see :func:`prefix_safe_rules`) so a consumer wiring it into a
    literal-prefix gate cannot silently mis-evaluate wildcard/anchored
    rules; the untranslated rule list rides in ``robots_rules`` for full
    longest-match evaluation."""

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
                    prefix_safe_rules(r.rules),
                    [p for ok, p in r.rules if ok],
                    list(r.sitemaps),
                    [{"allow": bool(ok), "pat": p} for ok, p in r.rules],
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
    """(host, robots_txt) rows → host_policy rows for the engine.

    Emits HOST_POLICY_SCHEMA plus ``robots_rules`` (the full rule list).
    When that column is present the engine gates links through the full
    RFC 9309 longest-match evaluation (wildcards, ``$`` anchors, Allow
    overrides) via :func:`robots_gate_udf`; ``robots_disallow`` holds
    only the prefix-safe subset so the legacy prefix gate can never
    mis-evaluate a wildcard rule."""
    parsed = robots.select(
        F.col(host_col).alias("host_key"),
        robots_policy_udf(agent, default_interval_ms)(F.col(text_col)).alias("r"),
    )
    return parsed.select(
        "host_key",
        F.col("r.interval_ms").alias("interval_ms"),
        F.lit(max_visits).alias("max_visits"),
        F.col("r.robots_disallow").alias("robots_disallow"),
        F.col("r.robots_rules").alias("robots_rules"),
    )
