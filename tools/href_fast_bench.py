"""Extraction-stage A/B: full Python tokenizer (href_urls_udf) vs the
JVM regexp fast path (href_urls_auto) on a corpus-scale synthetic page
set — the measurement that matters for the fast path (the crawl_html
ENTRY wall is superstep-latency-bound at sandbox scale: 75 fetched
pages can't show an extraction win; a 100 TB crawl tokenizes millions
of KB-size bodies per tick).

Pages are JVM-synthesized (~8-40 links each, ~2-6 KB, double-quoted
hrefs, a <script> noise block): the hazard-free shape the fast path
targets. A --hazard fraction renders every Nth page with a <base> tag
to exercise the mixed route.

Usage: python tools/href_fast_bench.py [--pages 200000] [--cpus 16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--pages", type=int, default=200_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--hazard-every", type=int, default=0,
                    help="render every Nth page with a <base> tag (0 = none)")
    ap.add_argument("--filler", type=int, default=4,
                    help="filler repetitions per link (page size knob; 4 ≈ "
                    "4.5 KB pages, 40 ≈ 35 KB — realistic web pages)")
    ap.add_argument("--reps", type=int, default=2)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.functions.extract import href_fast_eligible, href_urls_auto, href_urls_udf
    from crawler_spark.session import get_spark

    spark = get_spark(app_name="href-bench", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    ids = spark.range(args.pages)
    base = F.concat(F.lit("http://h"), (F.col("id") % 997).cast("string"),
                    F.lit(".test/d"), (F.col("id") % 31).cast("string"), F.lit("/p.html"))
    n_links = (F.col("id") % 33) + 8
    link = lambda j: F.concat(
        F.lit('<a class="l" href="../x'), ((F.col("id") * 7 + j) % 100_000).cast("string"),
        F.lit('.html">anchor text for link</a> <p>'),
        F.repeat(F.lit("filler words between links "), args.filler), F.lit("</p>"),
    )
    body = F.concat(
        F.lit("<html><head><title>t</title></head><body>"),
        F.when(
            (F.lit(args.hazard_every) > 0) & (F.col("id") % F.lit(max(1, args.hazard_every)) == 0),
            F.lit('<base href="/sub/">'),
        ).otherwise(F.lit("")),
        F.aggregate(
            F.sequence(F.lit(0), n_links),
            F.lit(""),
            lambda acc, j: F.concat(acc, link(j)),
        ),
        F.lit("<script>var u='<a href=\\'not-a-link\\'>';</script></body></html>"),
    )
    pages = ids.select(base.alias("base"), body.alias("html")).persist()
    n = pages.count()
    sz = pages.agg(F.avg(F.length("html"))).first()[0]
    elig = pages.where(href_fast_eligible(F.col("html"))).count()
    print(f"pages={n} avg_bytes={sz:.0f} fast_eligible={elig} ({100*elig/n:.1f}%)")

    def timed(fn):
        fn()  # warm
        best = None
        for _ in range(args.reps):
            t0 = time.time()
            fn()
            best = min(best or 9e9, time.time() - t0)
        return best

    def run_full():
        pages.select(F.size(href_urls_udf()(F.col("base"), F.col("html"))).alias("n")) \
            .agg(F.sum("n")).collect()

    def run_auto():
        pages.select(F.size(href_urls_auto(F.col("base"), F.col("html"))).alias("n")) \
            .agg(F.sum("n")).collect()

    # equality first: identical link multisets
    a = pages.select(href_urls_udf()(F.col("base"), F.col("html")).alias("l"))
    b = pages.select(href_urls_auto(F.col("base"), F.col("html")).alias("l"))
    ah = a.select(F.explode("l").alias("u")).groupBy("u").count()
    bh = b.select(F.explode("l").alias("u")).groupBy("u").count()
    diff = ah.join(bh, ["u", "count"], "full_outer").where(
        F.col("u").isNull() | F.col("count").isNull()
    ).count()
    assert diff == 0, f"fast path diverges on {diff} link groups"

    full_s = timed(run_full)
    auto_s = timed(run_auto)
    import json
    print(json.dumps(dict(
        pages=n, avg_bytes=round(sz), cpus=args.cpus,
        fast_eligible_frac=round(elig / n, 4),
        full_tokenizer_sec=round(full_s, 2),
        fast_path_sec=round(auto_s, 2),
        speedup=round(full_s / auto_s, 2),
        pages_per_sec_full=round(n / full_s),
        pages_per_sec_fast=round(n / auto_s),
    )))


if __name__ == "__main__":
    main()
