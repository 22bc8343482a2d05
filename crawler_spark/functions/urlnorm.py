"""URL parsing, resolution, and canonicalization.

Reimplements (from public RFC 3986 semantics, behavior matched against the
reference's test vectors) the normalize pass of fanyang01/crawler:
``urlx/normalize.go:17-78`` and ``urlx/url.go:23-47``, golden vectors from
``urlx/normalize_test.go:9-34``.

Rules (see reference lines cited per step):
  * whole-URL must be valid UTF-8 when rendered (normalize.go:37-39);
    strings that are raw undecoded byte sequences are rejected
  * scheme lowercased, only http/https (normalize.go:41-44)
  * host lowercased; must be a dotted domain, "localhost", or an IP
    literal; otherwise IDNA→punycode then re-validated (normalize.go:20-34,
    45-55); default ports 80/443 stripped (normalize.go:57-60)
  * path lexically cleaned (Go path.Clean), trailing slash preserved,
    "." → "" (normalize.go:66-75); invalid bytes percent-encoded the way
    Go's net/url renders them
  * fragment dropped (normalize.go:77)

Two call surfaces:
  * :func:`canonicalize` — pure Python, one URL; shared with the serial
    oracle so the engine and oracle agree by construction.
  * :func:`canonicalize_udf` / :func:`resolve_links_udf` — Arrow-vectorized
    pandas UDFs for the DataFrame pipeline (no per-row Python crossing the
    JVM boundary; the loop body is plain-Python inside one Arrow batch,
    which is the standard Spark pattern for string logic this shape).
"""

from __future__ import annotations

import posixpath
import re
from typing import NamedTuple, Optional
from urllib.parse import urljoin, urlsplit

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType,
    BooleanType,
    StringType,
    StructField,
    StructType,
)

# reference: urlx/normalize.go:17-19
_DOMAIN_RE = re.compile(r"^([a-zA-Z0-9-]{1,63}\.)+[a-zA-Z0-9][a-zA-Z0-9-]{0,61}[a-zA-Z0-9]$")
_IPV4_RE = re.compile(r"^(\d{1,3})\.(\d{1,3})\.(\d{1,3})\.(\d{1,3})$")
# RFC 3986 pchar plus '/' — characters Go's net/url leaves unescaped in paths.
_PATH_SAFE = set("abcdefghijklmnopqrstuvwxyzABCDEFGHIJKLMNOPQRSTUVWXYZ0123456789-._~!$&'()*+,;=:@/%")
_HEX = "0123456789ABCDEF"


class CanonResult(NamedTuple):
    url: Optional[str]  # canonical URL, None if invalid
    host: Optional[str]  # host without port (rate-limit key uses host:port; see host_key)
    host_key: Optional[str]  # host incl. non-default port — politeness key (queue keys on URL.Host)
    path: Optional[str]  # cleaned path ('' for root)
    valid: bool
    reason: Optional[str]  # rejection reason for metrics


def _is_ip(host: str) -> bool:
    """net.ParseIP semantics: dotted-quad IPv4 or a REAL IPv6 literal —
    a stray colon is not enough (net.ParseIP("0:x") fails in Go)."""
    if _IPV4_RE.match(host):
        return all(0 <= int(p) <= 255 for p in host.split("."))
    cand = host[1:-1] if host.startswith("[") and host.endswith("]") else host
    if ":" in cand:
        import ipaddress

        try:
            ipaddress.IPv6Address(cand)
            return True
        except ValueError:
            return False
    return False


def _validate_host(host: str) -> Optional[str]:
    """normalize.go:20-34 — lowercase; domain / localhost / IP; else IDNA."""
    lower = host.lower()
    if _DOMAIN_RE.match(lower) or lower == "localhost" or _is_ip(lower):
        return lower
    try:
        puny = host.encode("idna").decode("ascii")
    except (UnicodeError, IndexError):
        return None
    if _DOMAIN_RE.match(puny):
        return puny
    return None


def _utf8_renderable(s: str) -> bool:
    """Mirror Go's utf8.ValidString over the raw URL bytes.

    A Python str made of codepoints U+0080..U+00FF is how undecoded raw
    bytes surface; if those bytes are not valid UTF-8, Go would reject the
    URL (normalize.go:37-39). Genuine non-Latin text (codepoints >U+00FF)
    was necessarily valid UTF-8 on the wire.
    """
    if not s.isascii() and all(ord(c) <= 0xFF for c in s if not c.isascii()):
        try:
            s.encode("latin-1").decode("utf-8")
        except UnicodeError:
            return False
    return True


def _clean_path(pth: str) -> str:
    """Go path.Clean with trailing-slash preservation (normalize.go:66-75)."""
    if pth == "":
        return ""
    p = posixpath.normpath(pth)
    if p == ".":
        p = ""
    # posixpath.normpath preserves a leading '//' (POSIX); Go collapses it.
    while p.startswith("//"):
        p = p[1:]
    if pth.endswith("/") and not p.endswith("/"):
        p += "/"
    return p


def _encode_path(pth: str) -> str:
    """Percent-encode the way Go net/url renders paths: keep valid existing
    %XX escapes and RFC-3986 path chars; encode everything else byte-wise
    (U+0080..U+00FF as the raw byte, higher codepoints as UTF-8)."""
    out = []
    i, n = 0, len(pth)
    while i < n:
        c = pth[i]
        if c == "%" and i + 2 < n and pth[i + 1] in "0123456789abcdefABCDEF" and pth[i + 2] in "0123456789abcdefABCDEF":
            out.append("%" + pth[i + 1 : i + 3].upper())
            i += 3
            continue
        if c in _PATH_SAFE and c != "%":
            out.append(c)
        else:
            data = bytes([ord(c)]) if ord(c) <= 0xFF else c.encode("utf-8")
            for b in data:
                out.append("%" + _HEX[b >> 4] + _HEX[b & 0xF])
        i += 1
    return "".join(out)


def canonicalize(raw: Optional[str]) -> CanonResult:
    """Parse + normalize one URL. Pure function, shared with the oracle."""
    if raw is None:
        return CanonResult(None, None, None, None, False, "null")
    s = raw.strip()
    if not s:
        return CanonResult(None, None, None, None, False, "empty")
    try:
        parts = urlsplit(s)
    except ValueError:
        return CanonResult(None, None, None, None, False, "unparseable")

    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return CanonResult(None, None, None, None, False, "scheme")

    netloc = parts.netloc
    host, port = netloc, ""
    if netloc.startswith("["):  # IPv6 [::1]:8080
        close = netloc.find("]")
        host = netloc[: close + 1]
        rest = netloc[close + 1 :]
        if rest.startswith(":"):
            port = rest[1:]
    elif ":" in netloc:
        host, _, port = netloc.rpartition(":")
        if not port.isdigit():
            # Go url.Parse rejects a non-numeric port outright ("invalid
            # port after host") — unless the colons are an IPv6 literal,
            # which net/url requires to be bracketed anyway.
            if _is_ip(netloc) and "@" not in netloc:
                host, port = netloc, ""
            else:
                return CanonResult(None, None, None, None, False, "port")
    if "@" in host:  # userinfo not part of politeness key; Go keeps it — drop creds, reject
        return CanonResult(None, None, None, None, False, "userinfo")
    if host == "":
        return CanonResult(None, None, None, None, False, "empty-host")
    vhost = _validate_host(host)
    if vhost is None:
        return CanonResult(None, None, None, None, False, "host")

    if (scheme == "http" and port == "80") or (scheme == "https" and port == "443"):
        port = ""
    host_key = f"{vhost}:{port}" if port else vhost

    path = _encode_path(_clean_path(parts.path))
    query = parts.query
    frag_stripped_url = scheme + "://" + host_key + path + (("?" + query) if query else "")
    if not _utf8_renderable(frag_stripped_url):
        return CanonResult(None, None, None, None, False, "utf8")
    return CanonResult(frag_stripped_url, vhost, host_key, path or "/", True, None)


def resolve(base: Optional[str], ref: str) -> CanonResult:
    """RFC 3986 reference resolution + canonicalization (urlx/url.go:36-47)."""
    try:
        absu = urljoin(base, ref) if base else ref
    except ValueError:
        return CanonResult(None, None, None, None, False, "unparseable")
    return canonicalize(absu)


_CANON_SCHEMA = StructType(
    [
        StructField("url", StringType()),
        StructField("host", StringType()),
        StructField("host_key", StringType()),
        StructField("path", StringType()),
        StructField("valid", BooleanType()),
        StructField("reason", StringType()),
    ]
)


@F.pandas_udf(_CANON_SCHEMA)
def canonicalize_udf(raw: pd.Series) -> pd.DataFrame:
    """Arrow-vectorized canonicalization: str column -> canon struct."""
    rows = [canonicalize(v) for v in raw]
    return pd.DataFrame(rows, columns=_CANON_SCHEMA.fieldNames())


@F.pandas_udf(ArrayType(_CANON_SCHEMA))
def resolve_links_udf(base: pd.Series, refs: pd.Series) -> pd.Series:
    """Resolve each href in ``refs`` (array<string>) against ``base``.

    Returns array<canon struct>; invalid entries are kept (valid=false) so
    the caller can count rejections (reference drops them silently at
    handle.go:88-96 — we keep a metrics hook, filter on ``valid``).
    """
    out = []
    for b, rs in zip(base, refs):
        if rs is None:
            out.append([])
        else:
            out.append([resolve(b, r) for r in rs])
    return pd.Series(out)
