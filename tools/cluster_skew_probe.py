"""A/B probe: member-pair clustering vs group-reduced clustering on an
equal-hash-mass corpus — the duplicate class (blank frames, boilerplate
thumbnails) that dominates real image corpora.

The corpus is the rehearsal's triple structure plus a planted B-row
equal-phash clique (tools/corpus_rehearsal.build_payload). The member
path must materialize the clique's B(B-1)/2 hamming-0 pairs and run the
label loop over them; the grouped path carries the clique as ONE node
with zero edges and routes members by membership, so its cost is flat
in B. The probe holds the triple base fixed and doubles B:

  legacy = connected_components(simhash_near_dups(sh))   # member pairs
  grouped = grouped_labels(*simhash_group_pairs(sh))     # group graph

Both are asserted EQUAL (same label table) at every level — this is an
exactness A/B, not a recall trade. Fresh timing is approximated by
running each mode in its own loop order; for publication-grade numbers
run one (mode, B) per JVM:

  python tools/cluster_skew_probe.py --base 90000 --blanks 10000 20000 40000

Clique pair count grows 4x per doubling (B²/2); the grouped plan's work
grows only with the base corpus. The crossover is immediate: at
B=10^6 the member plan needs 5*10^11 pairs before clustering even
starts, while the grouped plan's clique cost is B membership rows.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def labels_member(sh):
    from crawler_spark.operators.components import connected_components
    from crawler_spark.operators.dedup import simhash_near_dups

    pairs = simhash_near_dups(sh, radius=1)
    return connected_components(pairs)


def labels_grouped(sh):
    from crawler_spark.operators.components import grouped_labels
    from crawler_spark.operators.dedup import simhash_group_pairs

    gpairs, mem, tagged = simhash_group_pairs(sh, radius=1)
    try:
        return grouped_labels(gpairs, mem).localCheckpoint()
    finally:
        tagged.unpersist()


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=90_000,
                    help="triple-structured rows (fixed across levels)")
    ap.add_argument("--blanks", type=int, nargs="+",
                    default=[5_000, 10_000, 20_000, 40_000])
    ap.add_argument("--skip-member-above", type=int, default=100_000,
                    help="clique size beyond which the member plan is "
                         "not attempted (its pair table is B^2/2)")
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from crawler_spark.session import get_spark
    from tools.corpus_rehearsal import build_payload

    spark = get_spark(
        app_name="cluster-skew-probe",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
    )
    spark.sparkContext.setLogLevel("ERROR")

    rows = []
    for b in args.blanks:
        payload = build_payload(spark, args.base, b).persist()
        payload.count()
        sh = payload.select(
            F.col("image_id").alias("id"), F.col("phash").alias("simhash")
        )

        t0 = time.time()
        lg = labels_grouped(sh).persist()
        n_g = lg.count()
        wall_g = time.time() - t0

        entry = dict(base=args.base, blanks=b,
                     clique_pairs=b * (b - 1) // 2,
                     grouped_s=round(wall_g, 1), labeled=n_g)
        if b <= args.skip_member_above:
            t1 = time.time()
            lm = labels_member(sh).persist()
            n_m = lm.count()
            entry["member_s"] = round(time.time() - t1, 1)
            # exactness: identical label tables
            assert n_m == n_g, (n_m, n_g)
            diff = lm.join(lg, ["id", "component"], "left_anti").count()
            assert diff == 0, f"{diff} differing labels at blanks={b}"
            lm.unpersist()
        lg.unpersist()
        payload.unpersist()
        rows.append(entry)
        print(json.dumps(entry), flush=True)
    print(json.dumps({"probe": "cluster_skew", "rows": rows}))


if __name__ == "__main__":
    main()
