"""Glob/regex URL pattern matcher (L5) — accept/reject rule lists.

Reimplements (from the documented semantics; golden-tested against the
truth table of the reference's extract/pattern_test.go:18-45) the
matcher of extract/pattern.go:31-108,144-202:

  * an item passes a part only if NOT rejected AND accepted;
    rejection wins; an empty accept list accepts everything;
  * rules are globs (``*.html``) or ``/regexp/``-delimited regexes;
  * four parts with part-specific glob separators: URL ('/'),
    host ('.'), dir ('/'), file (none); ``*``/``?`` never cross the
    separator, ``**`` does; dir/file come from path.Split of the
    escaped path.

Driver-side compile once; evaluation is an Arrow-vectorized pandas UDF
(the compiled matcher ships to executors inside the UDF closure — the
broadcast-a-small-policy-object pattern).
"""

from __future__ import annotations

import posixpath
import re
from dataclasses import dataclass, field
from typing import Optional
from urllib.parse import urlsplit

import pandas as pd
from pyspark.sql import Column
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

PART_URL, PART_HOST, PART_DIR, PART_FILE = range(4)


def _glob_to_regex(pat: str, sep: Optional[str]) -> str:
    """gobwas/glob-style: '*'/'?' stop at sep, '**' crosses; '[...]'
    classes and '{a,b}' alternates supported."""
    out, i, n = [], 0, len(pat)
    nosep = ".*" if sep is None else f"[^{re.escape(sep)}]*"
    noseo = "." if sep is None else f"[^{re.escape(sep)}]"
    while i < n:
        c = pat[i]
        if c == "\\" and i + 1 < n:  # glob escape: match next char literally
            out.append(re.escape(pat[i + 1]))
            i += 2
            continue
        if c == "*":
            if i + 1 < n and pat[i + 1] == "*":
                out.append(".*")
                i += 2
            else:
                out.append(nosep)
                i += 1
        elif c == "?":
            out.append(noseo)
            i += 1
        elif c == "[":
            j = pat.find("]", i + 1)
            if j == -1:
                out.append(re.escape(c))
                i += 1
            else:
                cls = pat[i : j + 1].replace("!", "^", 1) if pat[i + 1 : i + 2] == "!" else pat[i : j + 1]
                out.append(cls)
                i = j + 1
        elif c == "{":
            j = pat.find("}", i + 1)
            if j == -1:
                out.append(re.escape(c))
                i += 1
            else:
                alts = pat[i + 1 : j].split(",")
                out.append("(?:" + "|".join(_glob_to_regex(a, sep) for a in alts) + ")")
                i = j + 1
        else:
            out.append(re.escape(c))
            i += 1
    return "".join(out)


class _Rule:
    def __init__(self, raw: str, sep: Optional[str]):
        if raw.startswith("/") and raw.endswith("/") and len(raw) >= 2:
            self._re = re.compile(raw[1:-1])  # /regexp/: unanchored search
            self._search = True
        else:
            self._re = re.compile(_glob_to_regex(raw, sep) + r"\Z")
            self._search = False

    def match(self, s: str) -> bool:
        return bool(self._re.search(s) if self._search else self._re.match(s))


def _match_lists(s: str, reject: list[_Rule], accept: list[_Rule]) -> bool:
    for r in reject:
        if r.match(s):
            return False
    if not accept:
        return True
    return any(r.match(s) for r in accept)


@dataclass
class Pattern:
    """Rule lists, mirroring extract/pattern.go's Pattern struct."""

    accept: list[str] = field(default_factory=list)
    reject: list[str] = field(default_factory=list)
    host: list[str] = field(default_factory=list)
    exclude_host: list[str] = field(default_factory=list)
    dir: list[str] = field(default_factory=list)
    exclude_dir: list[str] = field(default_factory=list)
    file: list[str] = field(default_factory=list)
    exclude_file: list[str] = field(default_factory=list)


class CompiledPattern:
    def __init__(self, p: Pattern):
        c = lambda rules, sep: [_Rule(r, sep) for r in rules]
        self.accept = c(p.accept, "/")
        self.reject = c(p.reject, "/")
        self.host = c(p.host, ".")
        self.exclude_host = c(p.exclude_host, ".")
        self.dir = c(p.dir, "/")
        self.exclude_dir = c(p.exclude_dir, "/")
        self.file = c(p.file, None)
        self.exclude_file = c(p.exclude_file, None)

    @staticmethod
    def _parts(url: str) -> tuple[str, str, str]:
        sp = urlsplit(url)
        d, f = posixpath.split(sp.path)
        if d and not d.endswith("/"):
            d += "/"  # Go path.Split keeps the trailing slash on dir
        return sp.netloc, d, f

    def match(self, url: str) -> bool:
        host, d, f = self._parts(url)
        return (
            _match_lists(url, self.reject, self.accept)
            and _match_lists(host, self.exclude_host, self.host)
            and _match_lists(d, self.exclude_dir, self.dir)
            and _match_lists(f, self.exclude_file, self.file)
        )

    def match_part(self, url: str, part: int) -> bool:
        host, d, f = self._parts(url)
        if part == PART_URL:
            return _match_lists(url, self.reject, self.accept)
        if part == PART_HOST:
            return _match_lists(host, self.exclude_host, self.host)
        if part == PART_DIR:
            return _match_lists(d, self.exclude_dir, self.dir)
        if part == PART_FILE:
            return _match_lists(f, self.exclude_file, self.file)
        return False


def compile_pattern(p: Pattern) -> CompiledPattern:
    return CompiledPattern(p)


def pattern_filter_udf(p: Pattern):
    """Vectorized Accept-hook predicate: url column -> boolean column."""
    cp = compile_pattern(p)

    @F.pandas_udf(BooleanType())
    def _match(urls: pd.Series) -> pd.Series:
        return urls.map(lambda u: cp.match(u) if u is not None else False)

    return _match


def accept_filter(url_col: Column, p: Pattern) -> Column:
    return pattern_filter_udf(p)(url_col)
