"""HTML extraction (L1/L2) + content handling (U5-U8) tests."""

import gzip
import zlib

import pytest
from pyspark.sql import functions as F

from crawler_spark.functions.content import (
    content_meta_udf,
    decompress_body,
    decompress_udf,
    detect_charset,
    detect_content_type,
    parse_meta_refresh,
    sniff_content_type,
)
from crawler_spark.functions.extract import (
    SNIFF_WINDOW_LOCATION,
    OriginPolicy,
    extract_links,
    extractor_udf,
    origin_filter,
)

HTML = """
<html><head><title>t</title></head><body>
<a href="/rel">one</a>
<a href="http://Other.test:80/x#frag">two</a>
<base href="http://rebased.test/dir/">
<a href="sub">three</a>
<img src="/img.png">
<script>window.location.href = 'http://js.test/y'</script>
</body></html>
"""


def test_extract_default_a_href():
    links = extract_links(HTML, "http://page.test/p/")
    urls = [c.url for c in links if c.valid]
    assert urls == [
        "http://page.test/rel",
        "http://other.test/x",
        "http://rebased.test/dir/sub",  # <base> rebases later links
    ]


def test_extract_custom_positions():
    links = extract_links(HTML, "http://page.test/p/", positions=(("a", "href"), ("img", "src")))
    urls = [c.url for c in links if c.valid]
    assert "http://rebased.test/img.png" in urls  # img resolved after rebase


def test_extract_sniff():
    links = extract_links(HTML, "http://page.test/p/", sniff_flags=SNIFF_WINDOW_LOCATION)
    urls = [c.url for c in links if c.valid]
    assert "http://js.test/y" in urls


def test_extractor_udf(spark):
    df = spark.createDataFrame([("http://page.test/p/", HTML)], ["base", "html"])
    got = df.select(F.explode(extractor_udf()("base", "html")).alias("c")).select("c.url").collect()
    assert [r["url"] for r in got][:2] == ["http://page.test/rel", "http://other.test/x"]


def test_origin_filter(spark):
    rows = [
        ("http", "a.test", "http", "a.test"),
        ("http", "a.test", "https", "a.test"),
        ("http", "a.test", "http", "b.test"),
        ("http", "www.a.test", "http", "img.a.test"),
    ]
    df = spark.createDataFrame(rows, ["p_scheme", "p_host", "scheme", "host_key"])
    same_host = origin_filter(df, OriginPolicy())
    assert same_host.count() == 2  # same host only (scheme may differ)
    strict = origin_filter(df, OriginPolicy(same_origin=True))
    assert strict.count() == 1
    sub = origin_filter(df, OriginPolicy(span_hosts=True, sub_domain=True))
    hosts = {(r["p_host"], r["host_key"]) for r in sub.collect()}
    assert ("www.a.test", "img.a.test") in hosts
    assert ("a.test", "b.test") not in hosts


# ---- content (U5-U8) ----------------------------------------------------
def test_sniff_content_type():
    assert sniff_content_type(b"\x89PNG\r\n\x1a\nxxxx") == "image/png"
    assert sniff_content_type(b"\xff\xd8\xff\xe0") == "image/jpeg"
    assert sniff_content_type(b"RIFF....WEBPVP8 ") == "image/webp"
    assert sniff_content_type(b"<!DOCTYPE html><html>") == "text/html"
    assert sniff_content_type(b"  <html><body>") == "text/html"
    assert sniff_content_type("plain text".encode()) == "text/plain; charset=utf-8"
    assert sniff_content_type(b"\x00\x01\x02\xff") == "application/octet-stream"


def test_detect_content_type_precedence():
    assert detect_content_type("text/html; charset=utf-8", "/x.png", b"") == "text/html"
    assert detect_content_type(None, "/x.png", b"") == "image/png"
    assert detect_content_type(None, "/dir/", b"") == "text/html"
    assert detect_content_type(None, "/noext", b"\x89PNG\r\n\x1a\n") == "image/png"


def test_detect_charset():
    assert detect_charset("text/html; charset=ISO-8859-2", b"") == "iso-8859-2"
    assert detect_charset(None, b'<meta charset="gbk"><html>') == "gbk"
    assert (
        detect_charset(None, b'<meta http-equiv="Content-Type" content="text/html; charset=big5">')
        == "big5"
    )
    assert detect_charset(None, b"\xef\xbb\xbfhello") == "utf-8"
    assert detect_charset(None, "héllo".encode()) == "utf-8"


def test_meta_refresh():
    assert parse_meta_refresh(
        b'<meta http-equiv="refresh" content="30; URL=http://n.test/">'
    ) == (30, "http://n.test/")
    assert parse_meta_refresh(b'<meta http-equiv="refresh" content="5">') == (5, None)
    assert parse_meta_refresh(b"<html>") == (None, None)


def test_decompress():
    raw = b"hello world" * 10
    assert decompress_body(gzip.compress(raw), "gzip") == raw
    assert decompress_body(zlib.compress(raw), "deflate") == raw
    co = zlib.compressobj(wbits=-zlib.MAX_WBITS)
    rawdef = co.compress(raw) + co.flush()
    assert decompress_body(rawdef, "deflate") == raw  # raw-deflate fallback
    assert decompress_body(raw, None) == raw
    assert decompress_body(b"corrupt", "gzip") is None


def test_content_udfs(spark):
    rows = [
        ("text/html; charset=utf-8", "/a/", b"<html>"),
        (None, "/x.png", b"\x89PNG\r\n\x1a\n"),
        (None, "/page", b'<meta http-equiv="refresh" content="9; URL=/next">'),
    ]
    df = spark.createDataFrame(rows, "hdr string, path string, preview binary")
    got = df.select(content_meta_udf("hdr", "path", "preview").alias("c")).select("c.*").collect()
    assert got[0]["content_type"] == "text/html" and got[0]["charset"] == "utf-8"
    assert got[1]["content_type"] == "image/png"
    assert got[2]["refresh_seconds"] == 9 and got[2]["refresh_url"] == "/next"

    raw = b"payload" * 20
    df2 = spark.createDataFrame([(gzip.compress(raw), "gzip"), (raw, None)], "b binary, e string")
    out = [bytes(r[0]) for r in df2.select(decompress_udf("b", "e")).collect()]
    assert out == [raw, raw]


def test_script_end_clears_sniff_state():
    """Text after </script> is NOT script content: with both sniff flags
    set it must be absolute-URL-sniffed, not window.location-sniffed."""
    from crawler_spark.functions.extract import extract_links

    out = extract_links(
        "<div><script>var x=1;</script>see http://after.test/x</div>",
        "http://b.test/", sniff_flags=3,
    )
    assert any(c.valid and c.url == "http://after.test/x" for c in out)
