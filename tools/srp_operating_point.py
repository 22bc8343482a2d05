"""Measure the SRP-ANN recall-vs-candidate-fraction curve (VERDICT r4
item 3) on the benchmark embeddings table and print one line per
operating point, averaged over N query vectors drawn from the corpus.

Usage: python tools/srp_operating_point.py [--sf-dir DIR] [--queries N]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    ap.add_argument("--queries", type=int, default=8)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "16")))
    ap.add_argument("--grid", default="8/8/8,12/12/12,12/16/16,16/16/16,16/24/24,16/32/32,20/32/32")
    ap.add_argument("--hamming", action="store_true",
                    help="grid over the Hamming-ranked signature path "
                    "instead (spec = bits/frac, e.g. 256/0.02)")
    ap.add_argument("--hamming-grid",
                    default="256/0.02,512/0.01,512/0.02,512/0.05,1024/0.02")
    args = ap.parse_args()

    from crawler_spark.operators.similarity import (
        ann_hamming_topk, ann_topk_srp, cosine_topk, hamming_candidates,
        srp_candidates,
    )
    from crawler_spark.session import get_spark

    spark = get_spark(app_name="srp-grid", master=f"local[{args.cpus}]",
                      shuffle_partitions=args.cpus)
    spark.sparkContext.setLogLevel("ERROR")
    emb = spark.read.parquet(os.path.join(args.sf_dir, "embeddings.parquet")).cache()
    n_corpus = emb.count()
    qrows = emb.orderBy("vec_id").limit(args.queries).collect()
    queries = [list(r["embedding"]) for r in qrows]
    exact = []
    for q in queries:
        exact.append({r["id"] for r in cosine_topk(emb, "vec_id", "embedding", q, 10).collect()})
    print(f"corpus={n_corpus} queries={len(queries)}")
    if args.hamming:
        print(f"{'bits/frac':>18} {'recall@10':>9} {'cand_frac':>9} {'sec/q':>6}")
        for spec in args.hamming_grid.split(","):
            bits, frac = spec.split("/")
            bits, frac = int(bits), float(frac)
            recs, fracs = [], []
            t0 = time.time()
            for q, ex in zip(queries, exact):
                got = {
                    r["id"]
                    for r in ann_hamming_topk(
                        emb, "vec_id", "embedding", q, 10,
                        bits=bits, frac=frac, corpus_size=n_corpus,
                    ).collect()
                }
                nc = hamming_candidates(
                    emb, "vec_id", "embedding", q,
                    bits=bits, frac=frac, corpus_size=n_corpus,
                ).count()
                recs.append(len(got & ex) / 10)
                fracs.append(nc / n_corpus)
            sec = (time.time() - t0) / len(queries)
            print(f"{spec:>18} {sum(recs)/len(recs):9.3f} {sum(fracs)/len(fracs):9.4f} {sec:6.2f}")
        return
    print(f"{'bits/tables/probe':>18} {'recall@10':>9} {'cand_frac':>9} {'sec/q':>6}")
    for spec in args.grid.split(","):
        bits, ntables, nprobe = (int(x) for x in spec.split("/"))
        recs, fracs = [], []
        t0 = time.time()
        for q, ex in zip(queries, exact):
            got = {
                r["id"]
                for r in ann_topk_srp(
                    emb, "vec_id", "embedding", q, 10,
                    bits=bits, ntables=ntables, nprobe=nprobe,
                ).collect()
            }
            nc = srp_candidates(
                emb, "vec_id", "embedding", q,
                bits=bits, ntables=ntables, nprobe=nprobe,
            ).count()
            recs.append(len(got & ex) / 10)
            fracs.append(nc / n_corpus)
        sec = (time.time() - t0) / len(queries)
        print(
            f"{spec:>18} {sum(recs)/len(recs):9.3f} {sum(fracs)/len(fracs):9.4f} {sec:6.2f}"
        )


if __name__ == "__main__":
    main()
