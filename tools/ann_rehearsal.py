"""Hamming-signature ANN at 10^6 vectors — scale rehearsal for the r5
operator family (similarity.ann_hamming_topk + persisted index).

Corpus: deterministic JVM-synthesized 64-dim vectors (xxhash64-derived
components — no driver-side data generation), PLUS planted near-dup
pairs (every id % 101 == 0 gets a sibling whose vector is a small
deterministic perturbation) so part of the ground truth is structural.
Measures: signature-index build wall, per-query wall (index scan +
rerank), recall@10 vs brute-force cosine, and candidate fraction, at
the production default (512 bits, topm 2%).

Usage: python tools/ann_rehearsal.py [--vectors 1000000] [--queries 5]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--vectors", type=int, default=1_000_000)
    ap.add_argument("--dim", type=int, default=64)
    ap.add_argument("--queries", type=int, default=5)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--frac", type=float, default=0.02)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from crawler_spark.operators.similarity import (
        cosine_topk, hamming_candidates, hamming_index_build, hamming_query_index,
    )
    from crawler_spark.session import get_spark

    spark = get_spark(app_name="ann-rehearsal", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")

    n = args.vectors
    # base vectors: component j of row i = scaled xxhash64(i, j)
    base = spark.range(n).select(
        F.col("id").alias("vid"),
        F.transform(
            F.sequence(F.lit(1), F.lit(args.dim)),
            lambda j: (F.pmod(F.xxhash64(F.col("id"), j), F.lit(100_000)) / 50_000.0) - 1.0,
        ).alias("embedding"),
    )
    # planted siblings for every 101st id: same vector with component 1
    # nudged — cosine ≈ 0.999, ids offset by n
    sib = base.where(F.col("vid") % 101 == 0).select(
        (F.col("vid") + n).alias("vid"),
        F.transform(
            F.col("embedding"),
            lambda x, j: F.when(j == 0, x + F.lit(0.05)).otherwise(x),
        ).alias("embedding"),
    )
    emb = base.unionByName(sib).select(
        F.col("vid").cast("string").alias("vec_id"), "embedding"
    ).persist()
    total = emb.count()

    idx_path = "/tmp/ann_rehearsal_sigidx"
    t0 = time.time()
    hamming_index_build(emb, "vec_id", "embedding", idx_path, bits=512)
    build_s = round(time.time() - t0, 2)

    # queries: the planted heads — their sibling MUST rank 1
    qrows = emb.where(
        (F.col("vec_id").cast("long") % 101 == 0) & (F.col("vec_id").cast("long") < n)
    ).orderBy("vec_id").limit(args.queries).collect()

    recalls, fracs, q_walls, sib_hits = [], [], [], 0
    for r in qrows:
        q = list(r["embedding"])
        want_sib = str(int(r["vec_id"]) + n)
        exact = [x["id"] for x in cosine_topk(emb, "vec_id", "embedding", q, 10).collect()]
        t0 = time.time()
        got = [
            x["id"]
            for x in hamming_query_index(
                spark, idx_path, q, 10, frac=args.frac, corpus_size=total
            ).collect()
        ]
        q_walls.append(time.time() - t0)
        nc = hamming_candidates(
            emb, "vec_id", "embedding", q, frac=args.frac, corpus_size=total
        ).count()
        recalls.append(len(set(got) & set(exact)) / 10)
        fracs.append(nc / total)
        # got[0] is the query itself (cos 1.0); the planted sibling must
        # be found in the top results
        if want_sib in got[:3]:
            sib_hits += 1

    print(json.dumps(dict(
        vectors=total, dim=args.dim, bits=512, frac=args.frac,
        index_build_sec=build_s,
        vectors_per_sec_build=round(total / build_s),
        query_sec_mean=round(sum(q_walls) / len(q_walls), 2),
        recall_at_10=round(sum(recalls) / len(recalls), 3),
        candidate_fraction=round(sum(fracs) / len(fracs), 4),
        planted_sibling_found=f"{sib_hits}/{len(qrows)}",
    )))


if __name__ == "__main__":
    main()
