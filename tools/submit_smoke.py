"""Minimal spark-submit driver program: run a short crawl through the
packaged engine (shipped to executors via --py-files) and print a result
line. Used as the deployment E2E:

    python tools/package.py
    spark-submit --master 'local-cluster[2,4,4096]' \
        --conf spark.sql.constraintPropagation.enabled=false \
        --py-files dist/crawler_spark.zip tools/submit_smoke.py /tmp/submit_smoke

The driver program itself imports crawler_spark from the zip too, so
this validates that the package is self-contained (no repo-checkout
dependency on either side). A tiny synthetic web keeps the run seconds
long; the point is the launch path, not throughput.
"""

import json
import sys
import tempfile

from pyspark.sql import SparkSession
from pyspark.sql import functions as F


def main() -> None:
    workdir = sys.argv[1] if len(sys.argv) > 1 else tempfile.mkdtemp(prefix="submit_smoke_")
    spark = SparkSession.builder.appName("crawler-spark-submit-smoke").getOrCreate()
    # import AFTER the session exists: under spark-submit the zip from
    # --py-files is already on the driver's sys.path
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    n = 300
    web = spark.range(n).select(
        F.concat(F.lit("http://h"), (F.col("id") % 7).cast("string"),
                 F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("id") % 7).cast("string"), F.lit(".test")).alias("host_key"),
        F.lit(200).alias("status"),
        F.array(
            F.concat(F.lit("http://h"), (((F.col("id") * 2 + 1) % n) % 7).cast("string"),
                     F.lit(".test/p"), ((F.col("id") * 2 + 1) % n).cast("string")),
            F.concat(F.lit("http://h"), (((F.col("id") * 3 + 2) % n) % 7).cast("string"),
                     F.lit(".test/p"), ((F.col("id") * 3 + 2) % n).cast("string")),
        ).alias("out_links"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.col("id").cast("string").alias("image_id"),
    )
    # in-loop dedupe rides the smoke too: planted triple phashes, the
    # live index must be row-exact vs a one-shot rebuild — validated
    # across REAL executor JVMs when run under local-cluster[...]
    g = (F.col("id") / 3).cast("long").cast("string")
    h = F.xxhash64(F.concat(F.lit("ph"), g))
    m = F.col("id") % 3
    payloads = spark.range(n).select(
        F.col("id").cast("string").alias("image_id"),
        F.when(m == 1, h.bitwiseXOR(F.lit(6)))
        .when(m == 2, h.bitwiseXOR(F.lit(1)))
        .otherwise(h)
        .alias("phash"),
    )
    eng = CrawlEngine(
        spark, web, policy=CrawlPolicy(max_retry=1, obey_robots=False),
        workdir=workdir, max_pops=120, metrics_level=0,
        payloads=payloads, dedup_radius=2, dedup_fold_every=2,
    )
    res = eng.run(["http://h0.test/p0", "http://h1.test/p1"])
    from crawler_spark.operators.incremental import phash_index_build
    from crawler_spark.plans.crawl import dedup_member_id

    popped_imgs = (
        res.emitted.select(
            F.regexp_extract("url", r"/p(\d+)$", 1).alias("image_id")
        )
        .join(payloads, "image_id")
        .select(dedup_member_id(F.col("image_id")).alias("image_id"), "phash")
    )
    ref = phash_index_build(popped_imgs, radius=2)
    idx_rows = sorted(map(tuple, res.dedup_index.collect()))
    ref_rows = sorted(map(tuple, ref.collect()))
    # r5: Hamming signature index across REAL executor JVMs — the plane
    # matrix rides inside the Arrow-UDF closure (64 KB at 128 bits);
    # persisted-index queries must equal the inline operator exactly
    from crawler_spark.operators.similarity import (
        ann_hamming_topk, hamming_index_build, hamming_query_index,
    )

    emb = spark.range(200).select(
        F.col("id").cast("string").alias("vec_id"),
        F.transform(
            F.sequence(F.lit(1), F.lit(16)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(1000)) / 500.0) - 1.0,
        ).alias("embedding"),
    )
    q = list(emb.orderBy("vec_id").first()["embedding"])
    hamming_index_build(emb, "vec_id", "embedding", workdir + "/sigidx", bits=128)
    got = [
        (r["id"], round(r["score"], 6))
        for r in hamming_query_index(spark, workdir + "/sigidx", q, 5, frac=0.5).collect()
    ]
    want = [
        (r["id"], round(r["score"], 6))
        for r in ann_hamming_topk(emb, "vec_id", "embedding", q, 5, bits=128, frac=0.5).collect()
    ]

    out = dict(
        pops=res.pops,
        steps=res.steps,
        emitted=res.emitted.count(),
        seen=res.seen.count(),
        dedup_hashes=len(idx_rows),
        dedup_exact=idx_rows == ref_rows,
        hamming_exact=got == want,
        executors=spark.sparkContext.getConf().get("spark.master"),
    )
    print("SUBMIT_SMOKE_RESULT " + json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
