"""S6 Downloader path derivation — golden vectors mirroring the
reference's ``download/download.go:44-60`` genPath semantics, plus the
partitioned sink and the literal file materializer."""

import os

import pytest
from pyspark.sql import functions as F

from crawler_spark.operators.download import (
    download_sink,
    gen_download_path,
    materialize_files,
    with_download_path,
)

# (url, expected) — expectations hand-derived from download.go:44-60:
# EscapedPath; trailing-/ → +index.html; no-ext last element → +/index.html;
# query re-encoded sorted (QueryEscape); path.Clean; join(host, ...).
GOLDEN = [
    ("http://example.com/", "example.com/index.html"),
    ("http://example.com", "example.com/index.html"),
    ("http://example.com/a/b.html", "example.com/a/b.html"),
    ("http://example.com/a/b", "example.com/a/b/index.html"),
    ("http://example.com/a/", "example.com/a/index.html"),
    ("http://example.com/a.tar.gz", "example.com/a.tar.gz"),
    # Go path.Ext scans the last element for ANY dot: ".2" is an ext
    ("http://example.com/v1.2", "example.com/v1.2"),
    # dotted dir, extension-less file: still gets index.html
    ("http://example.com/a.b/c", "example.com/a.b/c/index.html"),
    # lexical clean resolves dot segments (path.Clean)
    ("http://example.com/a/../b/./c.txt", "example.com/b/c.txt"),
    ("http://example.com//a//b.html", "example.com/a/b.html"),
    # host keeps its port (Go u.Host)
    ("http://example.com:8080/", "example.com:8080/index.html"),
    # query: keys sorted, per-key value order kept, QueryEscape (space→+)
    (
        "http://example.com/search?q=hello%20world&b=2&a=1",
        "example.com/search/index.html?a=1&b=2&q=hello+world",
    ),
    (
        "http://example.com/s?b=2&a=3&a=1",
        "example.com/s/index.html?a=3&a=1&b=2",
    ),
    # query on an extensioned path: no index.html inserted
    (
        "http://example.com/f.html?x=a/b",
        "example.com/f.html?x=a%2Fb",
    ),
]


@pytest.mark.parametrize("url,want", GOLDEN)
def test_gen_download_path_golden(url, want):
    assert gen_download_path(url) == want


def test_gen_download_path_dir_prefix():
    assert (
        gen_download_path("http://example.com/a/", dir="/data/crawl")
        == "/data/crawl/example.com/a/index.html"
    )
    assert gen_download_path(None) is None


def test_with_download_path_column(spark):
    df = spark.createDataFrame([(u,) for u, _ in GOLDEN], ["url"])
    got = {
        r["url"]: r["file_path"]
        for r in with_download_path(df).select("url", "file_path").collect()
    }
    for url, want in GOLDEN:
        assert got[url] == want, url


def test_download_sink_and_materialize(spark, tmp_path):
    rows = [
        ("http://a.test/x/", b"body-x"),
        ("http://a.test/y.html", b"body-y"),
        ("http://b.test/", b"body-b"),
    ]
    df = spark.createDataFrame(rows, ["url", "bytes"])
    sink_dir = str(tmp_path / "sink")
    download_sink(df, sink_dir, mode="overwrite")
    back = spark.read.parquet(sink_dir)
    assert back.count() == 3
    assert set(back.columns) == {"file_path", "bytes", "host"}
    hosts = {r["host"] for r in back.select("host").distinct().collect()}
    assert hosts == {"a.test", "b.test"}

    files_root = str(tmp_path / "files")
    wrote = materialize_files(with_download_path(df), files_root)
    assert wrote == 3
    with open(os.path.join(files_root, "a.test/x/index.html"), "rb") as f:
        assert f.read() == b"body-x"
    with open(os.path.join(files_root, "b.test/index.html"), "rb") as f:
        assert f.read() == b"body-b"
    # O_EXCL: re-materializing writes nothing new (download.go:33-43)
    assert materialize_files(with_download_path(df), files_root) == 0


# ------------------------------------------------------------------ #
# property: derived paths can never escape the sink root
# ------------------------------------------------------------------ #
import string

from hypothesis import example, given, settings
from hypothesis import strategies as st

_path_chars = string.ascii_letters + string.digits + "/._-~%!$&'()*+,;=:@ ?#"


@given(
    host=st.text(alphabet=string.ascii_lowercase + string.digits + ".-", min_size=1, max_size=20),
    path=st.text(alphabet=_path_chars, max_size=60),
)
@example(host="..", path="x")
@example(host=".", path="")
@example(host="a.test", path="a/../../../x")
@settings(max_examples=300, deadline=None)
def test_gen_download_path_never_escapes_root(host, path):
    """For ANY authority URL, the derived path is relative (no leading
    /), contains no '..' segment and no '//' — so the materializer's
    ``root/<path>`` join cannot traverse outside root (Go's path.Clean
    gives the same guarantee to the reference's Downloader)."""
    url = f"http://{host}/{path}"
    out = gen_download_path(url)
    assert out is not None
    assert not out.startswith("/")
    assert "//" not in out
    assert ".." not in out.split("/")
    # total: never raises, deterministic
    assert gen_download_path(url) == out
