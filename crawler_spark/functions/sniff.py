"""JS URL sniffing (L3) — regex link discovery in script/text content.

Reimplements extract/sniff.go:15-46: ``window.location.href = '…'``
assignments and bare absolute http(s) URLs, resolved against the page
base and canonicalized. Column-level evaluation uses Spark's
``regexp_extract_all`` (JVM-side) for the raw matches; resolution reuses
the vectorized canonicalizer.
"""

from __future__ import annotations

import re

from pyspark.sql import Column
from pyspark.sql import functions as F

from crawler_spark.functions.urlnorm import CanonResult, resolve

# sniff.go:16-22 (Go [[:space:]] → \s)
WINDOW_LOCATION_RE = r"""(window\.)?location(\.href)\s*=\s*["'](.*?)["']"""
ABSOLUTE_URL_RE = r"""https?://(-\.)?([^\s/?\.#-]+\.?)+(/[^\s]*)?"""

_WL = re.compile(WINDOW_LOCATION_RE)
_ABS = re.compile(ABSOLUTE_URL_RE)


def sniff_window_location(base: str, text: str) -> list[CanonResult]:
    """Pure-Python reference implementation (oracle + tests)."""
    out = []
    for m in _WL.finditer(text or ""):
        c = resolve(base, m.group(3))
        if c.valid:
            out.append(c)
    return out


def sniff_absolute_urls(base: str, text: str) -> list[CanonResult]:
    out = []
    for m in _ABS.finditer(text or ""):
        c = resolve(base, m.group(0))
        if c.valid:
            out.append(c)
    return out


def window_location_col(text: Column) -> Column:
    """Array of raw window.location targets (group 3) — JVM-side."""
    return F.regexp_extract_all(text, F.lit(WINDOW_LOCATION_RE), 3)


def absolute_urls_col(text: Column) -> Column:
    """Array of raw absolute-URL matches — JVM-side."""
    return F.regexp_extract_all(text, F.lit(ABSOLUTE_URL_RE), 0)
