"""URL-trie crawl-trap guard (L8).

The reference builds a per-host path/query-segment trie and rejects a
URL when some node on its path already has ≥ threshold(depth) children
(similar-URL explosion ⇒ crawl trap): sample/urltrie/urltrie.go:65-193,
thresholds like ``depth<=2 ? 300 : 30``
(example/static-crawler/main.go:42-49).

Two faces:

  * :class:`PyTrie` — the exact serial semantics (path segments; query
    handling reduced to sorted k=v segments appended to the path), used
    as the tests' oracle and for driver-side policy probes.
  * :func:`trap_prefixes` / :func:`filter_trapped` — the batch/
    distributed guard: per (host, parent-prefix) distinct-child counts
    (one groupBy, partial-aggregated; ``approx_count_distinct`` keeps
    the state sketch-sized at 100 TB), prefixes over threshold become a
    broadcast *trap list* that filters the link stream. Batch semantics
    are deliberately monotone (a trap prefix rejects all its URLs, not
    just late arrivals) — the deterministic refinement of the serial
    first-N-win behavior, which depends on insertion order.
"""

from __future__ import annotations

from typing import Callable, Optional
from urllib.parse import parse_qsl, urlsplit

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _segments(url: str) -> list[str]:
    sp = urlsplit(url)
    segs = [s for s in sp.path.split("/")[1:]]
    q = sorted(parse_qsl(sp.query, keep_blank_values=True))
    segs += [f"{k}={v}" for k, v in q]
    return segs


class PyTrie:
    """Exact serial trie (oracle). add() returns False when rejected."""

    def __init__(self, threshold: Callable[[int], int]):
        self.threshold = threshold
        self.root: dict = {}

    def add(self, url: str, enforce: bool = True) -> bool:
        """``enforce=False`` inserts unconditionally (seed injection —
        seeds are never trap-rejected, they predate the census)."""
        node = self.root
        for depth, seg in enumerate(_segments(url), start=1):
            if seg not in node:
                if enforce and len(node) >= self.threshold(depth):
                    return False
                node[seg] = {}
            node = node[seg]
        return True

    def has(self, url: str) -> bool:
        node = self.root
        for seg in _segments(url):
            if seg not in node:
                return False
            node = node[seg]
        return True


# --------------------------------------------------------------------- #
def with_path_prefixes(links: DataFrame, url_col: str = "url", host_col: str = "host_key") -> DataFrame:
    """links + exploded (prefix, depth, child): one row per trie edge the
    URL contributes. prefix = '/' + first (depth-1) segments joined."""
    segs = F.split(F.regexp_replace(F.parse_url(F.col(url_col), F.lit("PATH")), r"^/", ""), "/")
    df = links.withColumn("_segs", segs).withColumn(
        "_n", F.when(F.col("_segs")[0] == "", 0).otherwise(F.size("_segs"))
    )
    edge = F.explode(
        F.transform(
            F.sequence(F.lit(1), F.col("_n")),
            lambda d: F.struct(
                d.alias("depth"),
                F.concat(F.lit("/"), F.array_join(F.slice("_segs", 1, d - 1), "/")).alias("prefix"),
                F.element_at("_segs", d).alias("child"),
            ),
        )
    )
    return (
        df.where(F.col("_n") > 0)
        .select(F.col(host_col).alias("host"), url_col, edge.alias("e"))
        .select("host", url_col, "e.depth", "e.prefix", "e.child")
    )


def trap_prefixes(
    links: DataFrame,
    threshold_expr: str,
    *,
    url_col: str = "url",
    host_col: str = "host_key",
    exact: bool = False,
) -> DataFrame:
    """Per-(host, prefix) fan-out census → prefixes whose distinct-child
    count meets the threshold. ``threshold_expr`` is a SQL expression
    over ``depth`` (e.g. "CASE WHEN depth <= 2 THEN 300 ELSE 30 END").
    ``exact=False`` uses approx_count_distinct (HLL sketch — the scale
    path); exact counts for tests."""
    edges = with_path_prefixes(links, url_col, host_col)
    cnt = (F.count_distinct if exact else F.approx_count_distinct)("child")
    return (
        edges.groupBy("host", "depth", "prefix")
        .agg(cnt.alias("n_children"))
        .where(F.col("n_children") >= F.expr(threshold_expr))
        .select("host", "depth", "prefix", "n_children")
    )


def filter_trapped(
    links: DataFrame,
    traps: DataFrame,
    *,
    url_col: str = "url",
    host_col: str = "host_key",
) -> DataFrame:
    """Drop links that pass through any trapped (host, prefix) edge.
    The trap list is tiny (it's a census of anomalies) → broadcast
    anti-join; link rows never shuffle."""
    edges = with_path_prefixes(links, url_col, host_col).select(
        "host", F.col(url_col).alias("_u"), "depth", "prefix"
    )
    hit = edges.join(
        F.broadcast(traps.select("host", "depth", "prefix")), ["host", "depth", "prefix"]
    ).select(F.col("_u").alias(url_col)).distinct()
    return links.join(hit, url_col, "left_anti")
