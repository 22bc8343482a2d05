"""HTML link extraction (L1/L2) — ExtractHref + configurable Extractor.

Reimplements the semantics of handle.go:117-160 (``ExtractHref``: every
``<a href>`` resolved against the page base; ``<base href>`` updates the
base) and extract/extract.go:17-177 (configurable tag/attr positions,
redirect/refresh injection, JS sniffing, and the origin filters
SameOrigin / SpanHosts / SubDomain; ResolveIP is intentionally dropped —
non-deterministic, not in the default path).

Two faces:
  * pure-Python :func:`extract_links` — shared with the serial oracle;
  * :func:`extractor_udf` — Arrow-vectorized page→links column for the
    DataFrame pipeline, followed by :func:`origin_filter` which is pure
    column logic (JVM-side) over the exploded links.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from html.parser import HTMLParser
from typing import Optional

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import ArrayType, StringType

from crawler_spark.functions.sniff import sniff_absolute_urls, sniff_window_location
from crawler_spark.functions.urlnorm import _CANON_SCHEMA, CanonResult, resolve

SNIFF_WINDOW_LOCATION = 1
SNIFF_ABSOLUTE_URLS = 2

DEFAULT_POS = (("a", "href"),)


class _LinkParser(HTMLParser):
    def __init__(self, base: str, positions, sniff_flags: int):
        super().__init__(convert_charrefs=True)
        self.base = base
        self.pos = {(t.lower(), a.lower()) for t, a in positions}
        self.tags = {t for t, _ in self.pos}
        self.sniff = sniff_flags
        self.out: list[str] = []  # raw (unresolved) refs in document order
        self._in_script = False

    def handle_starttag(self, tag, attrs):
        self._in_script = tag == "script"
        if tag not in self.tags and tag != "base":
            return
        d = dict(attrs)
        for t, a in self.pos:
            if t == tag and d.get(a):
                self.out.append(("ref", d[a]))
        if tag == "base" and d.get("href"):
            # <base href> rebases subsequent links (handle.go:144-146)
            self.out.append(("base", d["href"]))

    def handle_startendtag(self, tag, attrs):
        self.handle_starttag(tag, attrs)
        self._in_script = False

    def handle_endtag(self, tag):
        # without this, text following </script> would still be treated
        # as script content (wrong sniff mode for it)
        if tag == "script":
            self._in_script = False

    def handle_data(self, data):
        if self._in_script:
            if self.sniff & SNIFF_WINDOW_LOCATION:
                self.out.append(("sniff_wl", data))
        elif self.sniff & SNIFF_ABSOLUTE_URLS:
            self.out.append(("sniff_abs", data))


def extract_links(
    html: Optional[str],
    base: str,
    positions=DEFAULT_POS,
    sniff_flags: int = 0,
) -> list[CanonResult]:
    """Parse + resolve + canonicalize every configured link in order."""
    if not html:
        return []
    p = _LinkParser(base, positions, sniff_flags)
    try:
        p.feed(html)
        p.close()
    except Exception:
        pass  # lenient: tokenize as far as possible (html.Tokenizer spirit)
    cur_base = base
    out: list[CanonResult] = []
    for kind, v in p.out:
        if kind == "base":
            c = resolve(cur_base, v)
            if c.valid:
                cur_base = c.url
            continue
        if kind == "sniff_wl":
            out.extend(sniff_window_location(cur_base, v))
            continue
        if kind == "sniff_abs":
            out.extend(sniff_absolute_urls(cur_base, v))
            continue
        # invalid links kept (valid=false) so callers can count rejections
        out.append(resolve(cur_base, v))
    return out


def extractor_udf(positions=DEFAULT_POS, sniff_flags: int = 0):
    """(base_url, html) columns → array<canon struct> (Arrow-batched)."""

    @F.pandas_udf(ArrayType(_CANON_SCHEMA))
    def _extract(base: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [extract_links(h, b, positions, sniff_flags) for b, h in zip(base, html)]
        )

    return _extract


def href_urls_udf(positions=DEFAULT_POS, sniff_flags: int = 0):
    """(base_url, html) columns → array<string> of RESOLVED canonical
    link URLs in document order, unparsable refs dropped (the reference
    handler skips url.Parse failures the same way, handle.go:105-107).

    This is the engine's html-mode fetch seam: when the web carries raw
    bodies instead of pre-extracted ``out_links``, each popped page is
    tokenized by the REAL extractor (incl. <base> rebasing) inside one
    Arrow batch per fetch — the batch phrasing of handle.go:63-115."""
    from pyspark.sql.types import StringType

    @F.pandas_udf(ArrayType(StringType()))
    def _hrefs(base: pd.Series, html: pd.Series) -> pd.Series:
        return pd.Series(
            [
                [c.url for c in extract_links(h, b, positions, sniff_flags) if c.valid]
                for b, h in zip(base, html)
            ]
        )

    return _hrefs


# --------------------------------------------------------------------- #
# JVM fast path for href extraction (VERDICT r4 item 6)
# --------------------------------------------------------------------- #
# html.parser is a per-character Python state machine; for the common
# page shape (double-quoted <a href>, no <base>, no CDATA leftovers) a
# JVM regexp does the same tokenization at native speed and only the
# extracted refs cross the Arrow boundary for resolution.  Pages that
# trip ANY hazard below fall back to the full tokenizer, so the fast
# path can only ever change WHERE a page is parsed, never the result
# (equality-tested against the full parser in tests/test_crawl_html.py).

# strip the two CDATA content models html.parser special-cases
# (script/style) plus comments — a literal '<a href' inside them is NOT
# a link for the tokenizer either (possessive [^>]*+ kills backtracking)
_FAST_STRIP = r"(?is)<(script|style)[^>]*+>.*?</\1\s*+>|<!--.*?-->"

# href must sit at an attribute-name boundary inside an <a> tag: either
# directly after the post-tag whitespace or after a chunk that ENDS in
# whitespace/'/' — so data-href="u" (which html.parser treats as a
# different attribute) can never match.  Value group = 2.
_FAST_HREF = r"(?is)<a[\s/]([^>]*?[\s/])?href\s*=\s*\"([^\"]*)\""

# The hazard test is structural, not an alternation scan (the old
# 7-alternative rlike showed catastrophic backtracking — 3x slower than
# the full tokenizer on 30 KB pages):
#   fast-eligible  ⇔  no CDATA/comment leftovers in the stripped page
#                     AND every 'href=' token is consumed by a
#                     well-formed double-quoted <a href> match.
# The count equality catches, conservatively: <base href>, unquoted /
# single-quoted / unterminated hrefs, '>' inside an attribute value
# (which makes the tag-span regex miss the href), duplicate href attrs,
# data-href lookalikes, and 'href=' in attribute values/text — every
# one leaves an unmatched 'href=' token, so the page routes to the full
# tokenizer.  hreflang= and bare 'href' words don't match the counter,
# so those common benign shapes stay fast.


@F.pandas_udf(ArrayType(_CANON_SCHEMA))
def _resolve_refs_udf(base: pd.Series, refs: pd.Series) -> pd.Series:
    """Resolve already-extracted raw refs (fast-path rows only; null refs
    → null so the slow path's answer wins in the coalesce)."""
    import html as _html

    out = []
    for b, rr in zip(base, refs):
        if rr is None:
            out.append(None)
            continue
        out.append([resolve(b, _html.unescape(r)) for r in rr])
    return pd.Series(out)


def _auto_udf(positions, sniff_flags):
    """ONE Arrow crossing for both routes: per row, resolve the JVM
    pre-extracted refs (fast rows — ``html`` arrives null) or run the
    full tokenizer (hazard rows — ``refs`` arrives null).  Two separate
    UDFs would each be hoisted into their own unconditional
    ArrowEvalPython node, paying the batch transfer twice."""

    @F.pandas_udf(ArrayType(StringType()))
    def _auto(base: pd.Series, html: pd.Series, refs: pd.Series) -> pd.Series:
        import html as _html

        out = []
        for b, h, rr in zip(base, html, refs):
            if h is not None:
                out.append(
                    [c.url for c in extract_links(h, b, positions, sniff_flags) if c.valid]
                )
            elif rr is not None:
                out.append(
                    [
                        c.url
                        for r in rr
                        for c in (resolve(b, _html.unescape(r)),)
                        if c.valid
                    ]
                )
            else:
                out.append(None)
        return pd.Series(out)

    return _auto


def _fast_parts(html: Column):
    """(is_fast, refs) — shared by eligibility probe and extraction.

    The CDATA/comment strip only runs on pages that contain such a
    block (one cheap contains-gate saves the DOTALL regex on clean
    pages); leftovers after stripping (unterminated <script>/<style> or
    comment — they swallow the rest of the document in html.parser)
    force the tokenizer, as does any 'href' token not consumed by a
    well-formed match (see _FAST_HREF comment)."""
    low0 = F.lower(html)
    has_cdata = (
        F.contains(low0, F.lit("<script"))
        | F.contains(low0, F.lit("<style"))
        | F.contains(low0, F.lit("<!--"))
    )
    stripped = F.when(
        has_cdata, F.regexp_replace(html, _FAST_STRIP, "")
    ).otherwise(html)
    low = F.when(has_cdata, F.lower(stripped)).otherwise(low0)
    leftover = (
        F.contains(low, F.lit("<script"))
        | F.contains(low, F.lit("<style"))
        | F.contains(low, F.lit("<!--"))
    )
    all_refs = F.regexp_extract_all(stripped, F.lit(_FAST_HREF), F.lit(2))
    # 'href\s*=' counts exactly the tokens html.parser would bind as an
    # href ATTRIBUTE CANDIDATE somewhere: bare 'href' words (anchors
    # named no-href-anchor, prose), hreflang=, and valueless <a href>
    # don't match; data-href= DOES (its own 'href=' suffix) and routes
    # those pages to the tokenizer, which is the correct conservative
    # side (html.parser treats data-href as a different attribute)
    n_href = F.regexp_count(stripped, F.lit(r"(?i)href\s*="))
    is_fast = html.isNotNull() & ~leftover & (n_href == F.size(all_refs))
    refs = F.filter(
        all_refs, lambda x: x != ""  # <a href=""> is dropped by the tokenizer too
    )
    return is_fast, refs


def href_fast_eligible(html: Column) -> Column:
    """True when the JVM regexp scan is guaranteed to agree with the full
    tokenizer for this page (exposed for tests / plan probes)."""
    return _fast_parts(html)[0]


def href_urls_auto(base: Column, html: Column, positions=DEFAULT_POS, sniff_flags: int = 0) -> Column:
    """Equality-preserving regexp-scan variant of ``href_urls_udf``:
    hazard-free pages are tokenized by the JVM regexp scan (only refs
    cross to Python, for resolution); everything else takes the full
    tokenizer.  Non-default positions or sniffing always use the full
    tokenizer (the fast scan only knows ``<a href>``).

    NOT the engine default: measured A/B (tools/href_fast_bench.py)
    reads 0.46-0.94x vs the plain tokenizer across 4-30 KB page shapes —
    html.parser's C-find-driven scan plus resolution-dominated cost
    leaves no regexp win; kept as the measurement face + for callers
    whose corpora are dominated by huge low-link pages."""
    if positions != DEFAULT_POS or sniff_flags:
        return href_urls_udf(positions, sniff_flags)(base, html)
    is_fast, refs = _fast_parts(html)
    # ONE gated UDF node: fast rows ship only their refs across Arrow
    # (html nulled), hazard rows ship the body (refs nulled) — the page
    # body never crosses for hazard-free pages, and there's a single
    # batch transfer either way
    return _auto_udf(positions, sniff_flags)(
        base,
        F.when(is_fast, F.lit(None).cast("string")).otherwise(html),
        F.when(is_fast, refs).otherwise(F.lit(None)),
    )


@dataclass
class OriginPolicy:
    """extract/extract.go:56-90 origin gates as declarative config."""

    same_origin: bool = False  # scheme must match (http != https)
    span_hosts: bool = False  # allow other hosts at all
    sub_domain: bool = False  # same registered base domain allowed


def registered_base(host: Column) -> Column:
    """Last two labels of the host (extract.go:62-70 SubDomain rule)."""
    return F.substring_index(host, ".", -2)


def origin_filter(
    links: DataFrame,
    policy: OriginPolicy,
    *,
    page_scheme: str = "p_scheme",
    page_host: str = "p_host",
    link_scheme: str = "scheme",
    link_host: str = "host_key",
) -> DataFrame:
    """Pure column predicates over exploded links — no UDF, no shuffle."""
    keep = F.lit(True)
    if policy.same_origin:
        keep = keep & (F.col(link_scheme) == F.col(page_scheme))
    if not policy.span_hosts:
        keep = keep & (F.col(link_host) == F.col(page_host))
    elif policy.sub_domain:
        keep = keep & (
            (F.col(link_host) == F.col(page_host))
            | (registered_base(F.col(link_host)) == registered_base(F.col(page_host)))
        )
    return links.where(keep)
