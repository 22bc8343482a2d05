"""Dedup-family scale rehearsal (VERDICT r3 #9): minhash_near_dups +
connected-components clustering at ~10^7 documents — the corpus analog
of the crawl scale rehearsal. Verifies the production plan shapes hold
at a frontier the sandbox E2E tests never reach:

  * signature stage: one shingle explode + k partial-aggregated mins,
    persisted ONCE and carried through a single banded exchange;
  * candidate join: banded equi-join with the broadcast-anti bucket cap
    (never all-pairs);
  * clustering: O(log d) label propagation with per-round checkpoint
    RELEASE (storage must stay at one label generation, VERDICT r3 #2).

Input: a deterministic arithmetic corpus (no external data) — docs come
in triples sharing an md5-derived base text with a 1-char suffix
variation (signature Jaccard ≈ 0.9), so every triple is a planted
near-dup cluster: expected pairs = 3 per triple, expected clusters =
n_docs/3, expected canonical corpus = n_docs/3 triple reps. All text
synthesis is JVM column expressions (md5/concat) — Python never touches
row data.

Also runs (--path-smoke) the big-diameter clustering smoke: a 2^20-node
PATH graph (diameter ~10^6) must converge in ~2·log2(n) rounds via
pointer doubling with FLAT persisted-RDD storage across rounds.

Prints ONE JSON line. Usage:
  python tools/dedup_rehearsal.py --smoke          # 3·10^5 docs, ~1 min
  python tools/dedup_rehearsal.py                  # 10^7 docs (needs
                                                   # SPARK_DRIVER_MEMORY=48g)
  python tools/dedup_rehearsal.py --path-smoke     # 2^20-node path only
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_corpus(spark, n_docs: int):
    """Triples of near-dup docs: base text = 3 md5 hex blocks of the
    triple id (~98 chars, ~96 distinct 3-shingles), suffix = doc's
    position in the triple (1 char → ~3 differing shingles →
    est_jaccard ≈ 0.9 ≥ the 0.6 default threshold)."""
    ids = spark.range(n_docs)
    g = (F.col("id") / 3).cast("long").cast("string")
    base = F.concat_ws(
        " ",
        F.md5(F.concat(F.lit("a"), g)),
        F.md5(F.concat(F.lit("b"), g)),
        F.md5(F.concat(F.lit("c"), g)),
    )
    return ids.select(
        F.col("id").alias("doc_id"),
        F.concat(base, F.lit(" "), (F.col("id") % 3).cast("string")).alias("text"),
    )


def max_stage_shuffle_mb(spark) -> float | None:
    """Peak per-stage shuffle write of the app so far (the number that
    decides whether a stage fits the cluster's shuffle tier)."""
    try:
        sc = spark.sparkContext
        store = sc._jsc.sc().statusStore()
        gw = sc._gateway
        it = store.stageList(
            gw.jvm.java.util.ArrayList(),  # all statuses
            False, False,
            gw.new_array(gw.jvm.double, 0),  # no quantiles
            gw.jvm.java.util.ArrayList(),
        )
        best = 0
        for i in range(it.size()):
            best = max(best, int(it.apply(i).shuffleWriteBytes()))
        return round(best / 1e6, 1)
    except Exception:
        return None  # private seam moved — the metric is best-effort


def run_dedup(spark, n_docs: int) -> dict:
    from crawler_spark.operators.components import canonical_docs, connected_components
    from crawler_spark.operators.dedup import minhash_near_dups

    corpus = build_corpus(spark, n_docs).persist()
    n = corpus.count()

    t0 = time.time()
    pairs = minhash_near_dups(corpus, "doc_id", "text")
    pairs = pairs.persist()
    n_pairs = pairs.count()
    wall_pairs = time.time() - t0

    stats: dict = {}
    t1 = time.time()
    comp = connected_components(pairs, stats=stats)
    n_nodes = comp.count()
    n_clusters = comp.agg(F.countDistinct("component")).first()[0]
    wall_cluster = time.time() - t1

    t2 = time.time()
    kept = corpus.join(
        comp.where(F.col("id") != F.col("component")).select(
            F.col("id").alias("doc_id")
        ),
        "doc_id",
        "left_anti",
    )
    n_canonical = kept.count()
    wall_keep = time.time() - t2

    # planted-structure invariants: every triple collapses to one doc
    expected_triples = n // 3
    assert n_clusters == expected_triples, (n_clusters, expected_triples)
    assert n_canonical == expected_triples + (n % 3), (n_canonical, expected_triples)
    assert n_pairs >= 2 * expected_triples  # >=2 edges per triangle found

    pairs.unpersist()
    corpus.unpersist()
    return dict(
        n_docs=n,
        wall_pairs_s=round(wall_pairs, 1),
        n_pairs=n_pairs,
        wall_cluster_s=round(wall_cluster, 1),
        cluster_rounds=stats.get("rounds"),
        n_clusters=n_clusters,
        wall_keep_s=round(wall_keep, 1),
        n_canonical=n_canonical,
        docs_per_sec=round(n / (wall_pairs + wall_cluster + wall_keep)),
        max_stage_shuffle_write_mb=max_stage_shuffle_mb(spark),
    )


def run_path_smoke(spark, n_nodes: int = 1 << 20) -> dict:
    """Big-diameter clustering: an n-node PATH (worst case for plain
    propagation — diameter n) must converge in ~2·log2(n)+C rounds and
    hold persisted storage FLAT across rounds (checkpoint release)."""
    import math

    from crawler_spark.operators.components import connected_components

    edges = spark.range(n_nodes - 1).select(
        F.col("id").alias("id_a"), (F.col("id") + 1).alias("id_b")
    )
    jsc = spark.sparkContext._jsc.sc()
    before = jsc.getPersistentRDDs().size()
    stats: dict = {}
    t0 = time.time()
    comp = connected_components(edges, stats=stats)
    ok = comp.where(F.col("component") != 0).count() == 0 and comp.count() == n_nodes
    wall = time.time() - t0
    after = jsc.getPersistentRDDs().size()
    bound = 2 * int(math.log2(n_nodes)) + 6
    assert ok, "path graph must collapse to component 0"
    assert stats["rounds"] <= bound, (stats["rounds"], bound)
    assert after - before <= 2, f"storage grew {before}->{after} (checkpoint leak)"
    return dict(
        path_nodes=n_nodes,
        path_rounds=stats["rounds"],
        path_rounds_bound=bound,
        path_wall_s=round(wall, 1),
        persisted_rdds_before=before,
        persisted_rdds_after=after,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=10_000_000)
    ap.add_argument("--smoke", action="store_true", help="3*10^5 docs")
    ap.add_argument("--path-smoke", action="store_true", help="path graph only")
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark(
        app_name="dedup-rehearsal",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(32, args.cpus * 2),
    )
    out: dict = {}
    if args.path_smoke:
        out.update(run_path_smoke(spark))
    else:
        n = 300_000 if args.smoke else args.docs
        out.update(run_dedup(spark, n))
        out.update(run_path_smoke(spark, 1 << (17 if args.smoke else 20)))
    print(json.dumps(out))


if __name__ == "__main__":
    main()
