"""Nginx-style URL multiplexer (L6) — per-URL config via patterns.

Reimplements the search semantics of the reference's mux
(mux/mux.go:39-118, golden-tested against mux/matcher_test.go:9-37):

  1. exact-match table ("= " prefix) — terminal;
  2. wildcard pattern set, most-precise match (longest literal prefix,
     then most literal characters) — terminal if the pattern was
     registered with the skip prefix "^~ ";
  3. regexes ("~ " prefix) in registration order; first match wins;
  4. otherwise the wildcard result from step 2.

`*` in wildcard patterns crosses any characters (radix PatternTrie
semantics, unlike the part-scoped globs of functions/patterns.py).

The mux drives columnar policy: ``config_for_urls`` evaluates every
registered config key for a whole URL column at once (vectorized pandas
UDF), yielding the per-URL (score, freq, depth, interval, follow)
columns the crawl engine consumes — the reference applies the same
lookups per URL in Sched/Resched/Accept (mux/mux.go:173-238,290-322).
"""

from __future__ import annotations

import re
from typing import Any, Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

EXACT_PREFIX = "= "
REGEX_PREFIX = "~ "
SKIP_PREFIX = "^~ "


class _Wild:
    __slots__ = ("pattern", "re", "lit_prefix", "lit_total", "skip", "value")

    def __init__(self, pattern: str, value: Any, skip: bool):
        self.pattern = pattern
        self.re = re.compile(
            "".join(".*" if ch == "*" else re.escape(ch) for ch in pattern) + r"\Z"
        )
        star = pattern.find("*")
        self.lit_prefix = len(pattern) if star == -1 else star
        self.lit_total = len(pattern.replace("*", ""))
        self.skip = skip
        self.value = value


class Matcher:
    """Pattern → value lookup with the 4-step search above."""

    def __init__(self):
        self._exact: dict[str, Any] = {}
        self._wild: list[_Wild] = []
        self._regex: list[tuple[re.Pattern, Any]] = []

    def add(self, pattern: str, value: Any) -> None:
        if pattern.startswith(EXACT_PREFIX):
            self._exact[pattern[len(EXACT_PREFIX):]] = value
        elif pattern.startswith(REGEX_PREFIX):
            self._regex.append((re.compile(pattern[len(REGEX_PREFIX):]), value))
        elif pattern.startswith(SKIP_PREFIX):
            self._wild.append(_Wild(pattern[len(SKIP_PREFIX):], value, skip=True))
        else:
            self._wild.append(_Wild(pattern, value, skip=False))

    def get(self, s: str) -> tuple[Any, bool]:
        if s in self._exact:
            return self._exact[s], True
        best: Optional[_Wild] = None
        for w in self._wild:
            if w.re.match(s):
                if best is None or (w.lit_prefix, w.lit_total) > (best.lit_prefix, best.lit_total):
                    best = w
        if best is not None and best.skip:
            return best.value, True
        for rx, v in self._regex:
            if rx.search(s):
                return v, True
        if best is not None:
            return best.value, True
        return None, False


class UrlMux:
    """Per-pattern crawl config (the Controller-as-data equivalent)."""

    KEYS = ("filter", "nofollow", "score", "freq", "depth", "interval_ms")

    def __init__(self):
        self._m = {k: Matcher() for k in self.KEYS}

    # registration API (mux/mux.go:173-238)
    def allow(self, pattern: str):
        self._m["filter"].add(pattern, True)

    def disallow(self, pattern: str):
        self._m["filter"].add(pattern, False)

    def do_not_follow(self, pattern: str):
        self._m["nofollow"].add(pattern, True)

    def set_score(self, pattern: str, score: int):
        self._m["score"].add(pattern, int(score))

    def set_freq(self, pattern: str, n: int):
        self._m["freq"].add(pattern, int(n))

    def set_max_depth(self, pattern: str, depth: int):
        self._m["depth"].add(pattern, int(depth))

    def set_host_interval(self, pattern: str, interval_ms: int):
        self._m["interval_ms"].add(pattern, int(interval_ms))

    # point lookups (oracle-side / tests)
    def accept(self, url: str) -> bool:
        v, ok = self._m["filter"].get(url)
        return bool(v) if ok else False  # default: not accepted (mux.go:311-316)

    def score(self, url: str) -> int:
        v, ok = self._m["score"].get(url)
        return int(v) if ok else 0

    def freq(self, url: str) -> int:
        v, ok = self._m["freq"].get(url)
        return int(v) if ok else 1  # visit-once default (mux.go:290-293)

    def follow(self, url: str, depth: int) -> bool:
        _, no = self._m["nofollow"].get(url)
        if no:
            return False
        v, ok = self._m["depth"].get(url)
        return not (ok and depth >= int(v))

    def interval_ms(self, host: str) -> int:
        v, ok = self._m["interval_ms"].get(host)
        return int(v) if ok else 0

    # columnar evaluation
    _SCHEMA = StructType(
        [
            StructField("accept", BooleanType()),
            StructField("score", IntegerType()),
            StructField("freq", IntegerType()),
            StructField("follow_depth", IntegerType()),  # -1 = unlimited
            StructField("nofollow", BooleanType()),
            StructField("interval_ms", LongType()),
        ]
    )

    def config_udf(self):
        mux = self

        @F.pandas_udf(self._SCHEMA)
        def _cfg(urls: pd.Series) -> pd.DataFrame:
            rows = []
            for u in urls:
                if u is None:
                    rows.append((False, 0, 1, -1, True, 0))
                    continue
                d, dok = mux._m["depth"].get(u)
                _, no = mux._m["nofollow"].get(u)
                rows.append(
                    (
                        mux.accept(u),
                        mux.score(u),
                        mux.freq(u),
                        int(d) if dok else -1,
                        bool(no),
                        mux.interval_ms(u),
                    )
                )
            return pd.DataFrame(rows, columns=[f.name for f in mux._SCHEMA.fields])

        return _cfg

    def config_for_urls(self, df, url_col: str = "url"):
        """df + the mux-config struct exploded into columns."""
        return df.withColumn("_cfg", self.config_udf()(F.col(url_col))).select(
            "*", "_cfg.*"
        ).drop("_cfg")
