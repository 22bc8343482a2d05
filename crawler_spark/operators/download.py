"""S6 — literal Downloader file-sink path derivation + partitioned sink.

Reimplements (behavior-matched, not ported) the reference's Downloader
path generator, ``download/download.go:18-60`` (``genPath``):

  * start from the URL's escaped path (Go ``u.EscapedPath()``)
  * a path ending in ``/`` gets ``index.html`` appended
  * a path whose last element has no extension (Go ``path.Ext == ""``)
    gets ``/index.html`` appended
  * a non-empty query is re-encoded Go-style (``u.Query().Encode()``:
    keys sorted, values kept in order per key, ``QueryEscape`` on both)
    and appended after ``?``
  * the result is lexically cleaned (Go ``path.Clean``) and joined as
    ``dir/host/<cleaned>`` (``filepath.Join``, download.go:55-59)

Spark-side design: the path is a *derived column* (Arrow-vectorized
pandas UDF — string logic per row, one Python crossing per batch), and
the sink is a parquet table partitioned by host.  Writing one literal
file per URL is a scale anti-pattern at 10^10 URLs (small-files problem);
the parquet sink keys rows by the exact reference-derived ``file_path``
so a later single-host materializer (``materialize_files``, the literal
``os.O_EXCL`` semantics of download.go:33-43) can lay the tree down for
any slice that actually needs a filesystem.
"""

from __future__ import annotations

import os
import posixpath
from typing import Iterator, Optional
from urllib.parse import parse_qsl, quote_plus, urlsplit

import pandas as pd
from pyspark.sql import DataFrame, functions as F
from pyspark.sql.types import StringType


def _go_path_ext(pth: str) -> str:
    """Go ``path.Ext``: suffix from the final dot of the last element."""
    for i in range(len(pth) - 1, -1, -1):
        c = pth[i]
        if c == "/":
            return ""
        if c == ".":
            return pth[i:]
    return ""


def _go_query_encode(raw_query: str) -> str:
    """Go ``url.Values.Encode()``: sorted keys, per-key value order kept,
    ``QueryEscape`` (space → ``+``) on keys and values."""
    pairs = parse_qsl(raw_query, keep_blank_values=True, separator="&")
    by_key: dict[str, list[str]] = {}
    for k, v in pairs:
        by_key.setdefault(k, []).append(v)
    return "&".join(
        f"{quote_plus(key)}={quote_plus(val)}"
        for key in sorted(by_key)
        for val in by_key[key]
    )


def _go_path_clean(pth: str) -> str:
    """Go ``path.Clean`` (lexical): '' → '.', collapse //, resolve ./.. ."""
    if pth == "":
        return "."
    p = posixpath.normpath(pth)
    while p.startswith("//"):  # POSIX keeps a leading //, Go collapses it
        p = p[1:]
    return p


def gen_download_path(url: Optional[str], dir: str = "") -> Optional[str]:
    """Pure-Python single-URL form of download.go:44-60 ``genPath`` —
    shared with the oracle and the golden-vector test so the UDF and the
    expectation agree by construction."""
    if url is None:
        return None
    sp = urlsplit(url)
    pth = sp.path  # urlsplit keeps %-escapes: Go u.EscapedPath()
    if pth.endswith("/"):
        pth += "index.html"
    elif _go_path_ext(pth) == "":
        pth += "/index.html"
    if sp.query:
        pth += "?" + _go_query_encode(sp.query)
    cleaned = _go_path_clean(pth)
    netloc = sp.netloc
    if netloc.strip(".") == "":
        # a host of '.'/'..' would traverse out of the sink root when the
        # final join cleans (the reference's filepath.Join has the same
        # hazard; its crawl path never sees such hosts because urlx
        # validation rejects them — ours encodes instead of trusting)
        netloc = netloc.replace(".", "%2E")
    # filepath.Join(dir, host, FromSlash(cleaned)) — Join drops empty
    # parts and re-cleans, so strip the leading '/' before joining
    parts = [p for p in (dir, netloc, cleaned.lstrip("/")) if p]
    return _go_path_clean("/".join(parts)) if parts else ""


@F.pandas_udf(StringType())
def download_path_udf(urls: pd.Series) -> pd.Series:
    return urls.map(lambda u: gen_download_path(u))


def with_download_path(
    df: DataFrame, *, url_col: str = "url", dir: str = "", out_col: str = "file_path"
) -> DataFrame:
    """Attach the reference-derived sink path as a column (S6)."""
    col = download_path_udf(F.col(url_col))
    if dir:
        # dir is a plan-time constant: prepend JVM-side, keep the UDF pure
        col = F.concat(F.lit(dir.rstrip("/") + "/"), col)
    return df.withColumn(out_col, col)


def download_sink(
    df: DataFrame,
    out_dir: str,
    *,
    url_col: str = "url",
    bytes_col: str = "bytes",
    mode: str = "append",
) -> None:
    """The scale-true S6 sink: parquet partitioned by host, rows keyed by
    the exact genPath-derived ``file_path``.  Mirrors Downloader.Handle's
    contract (every fetched body lands under ``host/path.../index.html``)
    without the 10^10-small-files anti-pattern."""
    out = with_download_path(df, url_col=url_col)
    host = F.parse_url(F.col(url_col), F.lit("HOST")).alias("host")
    (
        out.select(host, "file_path", F.col(bytes_col).alias("bytes"))
        .repartition("host")
        .write.mode(mode)
        .partitionBy("host")
        .parquet(out_dir)
    )


def materialize_files(
    df: DataFrame, root: str, *, path_col: str = "file_path", bytes_col: str = "bytes"
) -> int:
    """Literal filesystem semantics of download.go:33-43 for a (small)
    slice: MkdirAll + O_EXCL-create each derived path under ``root``.
    Runs as mapInPandas so each partition writes its own files; returns
    the number of files written (existing files are skipped — O_EXCL)."""
    schema = "written long"

    def write_batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        n = 0
        for pdf in it:
            for pth, body in zip(pdf[path_col], pdf[bytes_col]):
                if pth is None:
                    continue
                full = os.path.join(root, pth.lstrip("/"))
                os.makedirs(os.path.dirname(full), exist_ok=True)
                try:
                    fd = os.open(full, os.O_WRONLY | os.O_CREAT | os.O_EXCL, 0o644)
                except FileExistsError:
                    continue
                with os.fdopen(fd, "wb") as f:
                    f.write(body if body is not None else b"")
                n += 1
        yield pd.DataFrame({"written": [n]})

    rows = (
        df.select(path_col, bytes_col)
        .mapInPandas(write_batches, schema)
        .agg(F.sum("written").alias("w"))
        .collect()
    )
    return int(rows[0]["w"] or 0)
