"""Response content handling (U5-U8): content-type sniffing, charset
detection + UTF-8 transcode, meta scan, body decompression.

Reimplements the decision logic of fetch.go:121-265 and
response.go:144-212 as vectorized stages over binary payload columns:

  * content-type: header value → file-extension mapping → trailing '/'
    ⇒ html → magic-byte sniff of the first KiB (http.DetectContentType's
    most common signatures re-derived from the WHATWG MIME sniffing
    standard — public spec, not copied code);
  * charset: header/meta charset= declaration → BOM → UTF-8 validation
    fallback (charset_normalizer is gated behind an import-try; the
    heuristic fallback is deterministic);
  * <meta http-equiv> scan over the first KiB: content-type override +
    refresh "N; URL=…" parsing (fetch.go:187-265);
  * gzip/deflate/zlib decompression (response.go:144-194).

All stages are Arrow-batched pandas UDFs over the bytes column — payload
bytes cross into Python only inside these explicitly-chosen stages.
"""

from __future__ import annotations

import gzip
import re
import zlib
from typing import Optional

import pandas as pd
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    IntegerType,
    StringType,
    StructField,
    StructType,
)

# magic-byte signatures (WHATWG MIME sniffing; subset http.DetectContentType
# also implements)
_MAGIC = [
    (b"\x89PNG\r\n\x1a\n", "image/png"),
    (b"\xff\xd8\xff", "image/jpeg"),
    (b"GIF87a", "image/gif"),
    (b"GIF89a", "image/gif"),
    (b"RIFF", "image/webp"),  # refined below (WEBP at offset 8)
    (b"%PDF-", "application/pdf"),
    (b"PK\x03\x04", "application/zip"),
    (b"\x1f\x8b", "application/gzip"),
    (b"OggS", "application/ogg"),
    (b"\x00\x00\x00", "video/mp4"),  # refined below (ftyp at offset 4)
]

_EXT_MIME = {
    ".html": "text/html", ".htm": "text/html", ".css": "text/css",
    ".js": "application/javascript", ".json": "application/json",
    ".png": "image/png", ".jpg": "image/jpeg", ".jpeg": "image/jpeg",
    ".gif": "image/gif", ".webp": "image/webp", ".pdf": "application/pdf",
    ".xml": "text/xml", ".txt": "text/plain", ".svg": "image/svg+xml",
}

_HTML_RE = re.compile(
    rb"^\s*(?:<!DOCTYPE\s+HTML|<HTML|<HEAD|<BODY|<SCRIPT|<IFRAME|<H1|<DIV|<FONT|"
    rb"<TABLE|<A\s|<STYLE|<TITLE|<B>|<BR|<P)", re.IGNORECASE,
)
_META_CT_RE = re.compile(
    rb"""<meta[^>]+http-equiv\s*=\s*["']?content-type["']?[^>]*content\s*=\s*["']?([^"'>]+)""",
    re.IGNORECASE,
)
_META_CHARSET_RE = re.compile(rb"""<meta[^>]+charset\s*=\s*["']?([\w-]+)""", re.IGNORECASE)
_META_REFRESH_RE = re.compile(
    rb"""<meta[^>]+http-equiv\s*=\s*["']?refresh["']?[^>]*content\s*=\s*["']?([^"'>]+)""",
    re.IGNORECASE,
)
_REFRESH_VAL_RE = re.compile(r"^\s*(\d+)\s*(?:;\s*URL\s*=\s*['\"]?([^'\"]+)['\"]?)?\s*$", re.IGNORECASE)
_CHARSET_PARAM_RE = re.compile(r"charset\s*=\s*([\w-]+)", re.IGNORECASE)


def sniff_content_type(preview: Optional[bytes]) -> str:
    """Magic-byte sniff of the first bytes (fetch.go:153-185 fallback)."""
    if not preview:
        return "application/octet-stream"
    if preview[:4] == b"RIFF" and preview[8:12] == b"WEBP":
        return "image/webp"
    if preview[4:8] == b"ftyp":
        return "video/mp4"
    for magic, mime in _MAGIC:
        if preview.startswith(magic) and mime not in ("image/webp", "video/mp4"):
            return mime
    if _HTML_RE.match(preview):
        return "text/html"
    try:
        preview.decode("utf-8")
        return "text/plain; charset=utf-8"
    except UnicodeDecodeError:
        return "application/octet-stream"


def detect_content_type(header: Optional[str], url_path: str, preview: Optional[bytes]) -> str:
    """Header → extension → trailing-'/'⇒html → sniff (fetch.go:153-185)."""
    if header:
        return header.split(";")[0].strip().lower()
    dot = url_path.rfind(".")
    if dot != -1:
        ext = url_path[dot:].lower()
        if ext in _EXT_MIME:
            return _EXT_MIME[ext]
    if url_path.endswith("/") or url_path == "":
        return "text/html"
    return sniff_content_type(preview).split(";")[0].strip()


def detect_charset(content_type_header: Optional[str], preview: Optional[bytes]) -> str:
    """Header charset → meta charset → BOM → utf-8 check (fetch.go:121-138)."""
    if content_type_header:
        m = _CHARSET_PARAM_RE.search(content_type_header)
        if m:
            return m.group(1).lower()
    if preview:
        m = _META_CHARSET_RE.search(preview)
        if m:
            return m.group(1).decode("ascii", "replace").lower()
        m = _META_CT_RE.search(preview)
        if m:
            mm = _CHARSET_PARAM_RE.search(m.group(1).decode("latin-1"))
            if mm:
                return mm.group(1).lower()
        if preview.startswith(b"\xef\xbb\xbf"):
            return "utf-8"
        if preview.startswith(b"\xff\xfe"):
            return "utf-16-le"
        if preview.startswith(b"\xfe\xff"):
            return "utf-16-be"
        try:
            preview.decode("utf-8")
            return "utf-8"
        except UnicodeDecodeError:
            pass
    try:  # optional dependency — deterministic heuristic otherwise
        import charset_normalizer  # noqa: F401

        best = charset_normalizer.from_bytes(preview or b"").best()
        if best and best.encoding:
            return best.encoding
    except ImportError:
        pass
    return "latin-1"


def parse_meta_refresh(preview: Optional[bytes]) -> tuple[Optional[int], Optional[str]]:
    """First-KiB <meta refresh> "N; URL=…" (fetch.go:283-305)."""
    if not preview:
        return None, None
    m = _META_REFRESH_RE.search(preview)
    if not m:
        return None, None
    v = _REFRESH_VAL_RE.match(m.group(1).decode("latin-1"))
    if not v:
        return None, None
    return int(v.group(1)), v.group(2)


def decompress_body(data: Optional[bytes], encoding: Optional[str]) -> Optional[bytes]:
    """Content-Encoding gzip/deflate wrap (response.go:144-194)."""
    if data is None or not encoding:
        return data
    enc = encoding.lower().strip()
    try:
        if enc == "gzip":
            return gzip.decompress(data)
        if enc == "deflate":
            try:
                return zlib.decompress(data)
            except zlib.error:
                return zlib.decompress(data, -zlib.MAX_WBITS)  # raw deflate
    except (OSError, zlib.error):
        return None  # corrupt stream → fetch error path (C5 'retry')
    return data


CONTENT_SCHEMA = StructType(
    [
        StructField("content_type", StringType()),
        StructField("charset", StringType()),
        StructField("refresh_seconds", IntegerType()),
        StructField("refresh_url", StringType()),
    ]
)


@F.pandas_udf(CONTENT_SCHEMA)
def content_meta_udf(header: pd.Series, path: pd.Series, preview: pd.Series) -> pd.DataFrame:
    """(content_type_header, url_path, first-KiB preview bytes) → struct."""
    rows = []
    for hd, pth, pv in zip(header, path, preview):
        pv = bytes(pv) if pv is not None else None
        pv1k = pv[:1024] if pv else pv
        ct = detect_content_type(hd, pth or "", pv1k)
        cs = detect_charset(hd, pv1k)
        rs, ru = parse_meta_refresh(pv1k)
        rows.append((ct, cs, rs, ru))
    return pd.DataFrame(rows, columns=CONTENT_SCHEMA.fieldNames())


@F.pandas_udf(BinaryType())
def decompress_udf(data: pd.Series, encoding: pd.Series) -> pd.Series:
    return pd.Series(
        [decompress_body(bytes(d) if d is not None else None, e) for d, e in zip(data, encoding)]
    )
