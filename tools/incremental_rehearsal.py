"""Incremental dedup-index scale rehearsal: fold a crawl batch into a
10^7-hash corpus index and measure the cost against re-clustering the
world — the number that decides whether a CONTINUOUS crawl can keep its
corpus deduplicated at the 10^10 target.

Planted structure (deterministic arithmetic, no external data):

  * BASE: n images in triples sharing an xxhash64-derived phash with
    1-2 flipped bits (every triple one cluster; with uniform 64-bit
    hashes and radius 2 the chance of ANY cross-triple collision at
    10^7 rows is ~1e-3, so separation is exact).
  * DELTA (one crawl batch, default 1% of n): half EXTENDERS — a 4th
    member 1 bit from an existing triple's head (joins that cluster,
    cluster count unchanged); half FRESH equal-phash pairs (new
    clusters via the gsz≥2 rule, no edges).

End-state invariants asserted exactly: index row count (distinct
hashes), emitted member count, cluster count, and — the incremental
contract — the fold must land the SAME member-label multiset counts a
one-shot `phash_index_build` over base ∪ delta produces.

Honest scale note (recorded in the output): the touched-base probe is
level-1 pigeonhole, so its selectivity is |base|·(r+1)/2^(64/(r+1))
per delta hash — the SAME candidate floor the batch join pays per
corpus hash (see the Hamming operating-envelope math in BENCH.md).
Incremental's win is paying that floor for |delta| hashes instead of
|corpus| hashes, plus replacing the corpus-scale clustering loop with
a delta-sized contracted pass. `update_vs_rebuild_speedup` is measured
at two delta sizes to show the cost tracks the delta, not the corpus.

Prints ONE JSON line. Usage:
  python tools/incremental_rehearsal.py --smoke     # 3*10^5 base, ~1 min
  python tools/incremental_rehearsal.py             # 10^7 base (needs
                                                    # SPARK_DRIVER_MEMORY=48g)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

RADIUS = 2  # 3 blocks of 21 bits: planted separation exact at 10^7


def build_base(spark, n: int):
    """Triples (m0=h, m1=h^6, m2=h^1): pairwise ≤2..3 bits, connected
    through m0 at radius 2."""
    g = (F.col("id") / 3).cast("long").cast("string")
    h = F.xxhash64(F.concat(F.lit("ph"), g))
    m = F.col("id") % 3
    return spark.range(n).select(
        F.col("id").alias("image_id"),
        F.when(m == 1, h.bitwiseXOR(F.lit(6)))
        .when(m == 2, h.bitwiseXOR(F.lit(1)))
        .otherwise(h)
        .alias("phash"),
    )


def build_delta(spark, n_base: int, d: int):
    """ids [n_base, n_base+d): first half extends triple j with a 4th
    member at hamming 1 from the head; second half forms fresh
    equal-phash pairs (two members per new hash)."""
    half = d // 2
    j = F.col("id") - n_base  # 0..d-1
    ext_h = F.xxhash64(F.concat(F.lit("ph"), j.cast("string"))).bitwiseXOR(F.lit(2))
    fresh_g = ((j - half) / 2).cast("long").cast("string")
    fresh_h = F.xxhash64(F.concat(F.lit("fresh"), fresh_g))
    return spark.range(n_base, n_base + d).select(
        F.col("id").alias("image_id"),
        F.when(j < half, ext_h).otherwise(fresh_h).alias("phash"),
    )


def run(spark, base, idx0, wall_build: float, n_base: int, d: int) -> dict:
    from crawler_spark.operators.incremental import (
        member_labels,
        phash_index_build,
        phash_index_update,
    )
    from crawler_spark.state.ckpt import release_checkpoint

    delta = build_delta(spark, n_base, d).persist()
    everything = base.unionByName(delta)
    n_triples, half = n_base // 3, d // 2
    n_fresh_groups = (d - half) // 2

    stats: dict = {}
    t1 = time.time()
    idx1 = phash_index_update(idx0, delta, radius=RADIUS, stats=stats)
    wall_update = time.time() - t1

    # LSM face: same fold, but materializing ONLY the changed rows as a
    # frame — the write path that stays O(changed) at 10^10
    from crawler_spark.operators.incremental import LSMPhashIndex

    lsm_stats: dict = {}
    lsm = LSMPhashIndex(idx0, radius=RADIUS)
    t1b = time.time()
    lsm1 = lsm.update(delta, stats=lsm_stats)
    wall_lsm = time.time() - t1b

    # the re-cluster-the-world cost the fold replaces
    t2 = time.time()
    ref = phash_index_build(everything, radius=RADIUS)
    wall_rebuild = time.time() - t2

    # planted end-state invariants (exact)
    n_hashes = idx1.count()
    assert n_hashes == n_base + half + n_fresh_groups, n_hashes
    lab = member_labels(everything, idx1).persist()
    n_members = lab.count()
    n_clusters = lab.agg(F.countDistinct("component")).first()[0]
    # n_base % 3 == 1 leaves one lone m0 (gsz 1, no edge): correctly
    # unemitted and unclustered; % 3 == 2 leaves an m0+m1 edge pair,
    # which is emitted and forms one extra cluster
    rem = n_base % 3
    lone = 1 if rem == 1 else 0
    extra_cluster = 1 if rem == 2 else 0
    assert n_members == n_base + d - lone, n_members
    assert n_clusters == n_triples + n_fresh_groups + extra_cluster, n_clusters
    # fold == one-shot (count-level here; row-level pinned in pytest)
    ref_lab = member_labels(everything, ref)
    assert ref_lab.count() == n_members
    assert ref.count() == n_hashes
    # LSM face resolves to the same index (hash count + emitted members)
    lsm_view = lsm1.resolved()
    assert lsm_view.count() == n_hashes
    assert member_labels(everything, lsm_view).count() == n_members
    lab.unpersist()
    release_checkpoint(ref)
    release_checkpoint(idx1)
    for fr in lsm1.frames:
        release_checkpoint(fr)
    delta.unpersist()

    return {
        f"d{d}": dict(
            wall_build_s=round(wall_build, 1),
            wall_update_s=round(wall_update, 1),
            wall_lsm_fold_s=round(wall_lsm, 1),
            lsm_frame_rows=lsm_stats["frame_rows"],
            wall_rebuild_s=round(wall_rebuild, 1),
            update_vs_rebuild_speedup=round(wall_rebuild / wall_update, 1),
            lsm_vs_rebuild_speedup=round(wall_rebuild / wall_lsm, 1),
            n_touched_base=stats["n_touched_base"],
            touched_fraction=round(stats["n_touched_base"] / n_base, 4),
            n_new_pairs=stats["n_new_pairs"],
            n_relabel=stats["n_relabel"],
            contracted_cc_rounds=stats["cc_rounds"],
            images_per_sec_update=round(d / wall_update),
        )
    }


def build_chain_delta(spark, n_base: int, d: int, fold: int):
    """Fold-disjoint delta: extenders target triple range
    [fold*half, fold*half+half) with hamming-1 hashes; fresh pairs salt
    their hash by fold — no two folds touch the same planted structure,
    so chain invariants stay exactly additive."""
    half = d // 2
    start = n_base + fold * d
    j = F.col("id") - start  # 0..d-1
    tgt = (j + fold * half).cast("string")
    ext_h = F.xxhash64(F.concat(F.lit("ph"), tgt)).bitwiseXOR(F.lit(2))
    fresh_g = ((j - half) / 2).cast("long").cast("string")
    fresh_h = F.xxhash64(F.concat(F.lit("fresh"), F.lit(str(fold)), fresh_g))
    return spark.range(start, start + d).select(
        F.col("id").alias("image_id"),
        F.when(j < half, ext_h).otherwise(fresh_h).alias("phash"),
    )


def run_chain(spark, n_base: int, d: int, folds: int) -> dict:
    """Sustained operation: F successive LSM folds with one mid-chain
    compaction, per-fold walls (must stay flat), superseded checkpoint
    generations released, final end state exact."""
    from crawler_spark.operators.incremental import (
        LSMPhashIndex,
        member_labels,
        phash_index_build,
    )
    from crawler_spark.state.ckpt import release_checkpoint

    base = build_base(spark, n_base).persist()
    t0 = time.time()
    idx = LSMPhashIndex(
        phash_index_build(base, radius=RADIUS), radius=RADIUS
    )
    wall_build = time.time() - t0
    owned = [idx.base]

    walls, frame_rows = [], []
    all_rows = base
    for f in range(folds):
        delta = build_chain_delta(spark, n_base, d, f)
        all_rows = all_rows.unionByName(delta)
        st: dict = {}
        t1 = time.time()
        idx = idx.update(delta, stats=st)
        walls.append(round(time.time() - t1, 1))
        frame_rows.append(st["frame_rows"])
        owned.append(idx.frames[-1])
        if f == folds // 2 - 1:
            t2 = time.time()
            idx = idx.compact()
            wall_compact = round(time.time() - t2, 1)
            for gen in owned:  # superseded base + frames
                release_checkpoint(gen)
            owned = [idx.base]

    half = d // 2
    fresh_groups = (d - half) // 2
    n_hashes = idx.resolved().count()
    assert n_hashes == n_base + folds * (half + fresh_groups), n_hashes
    n_members = member_labels(all_rows, idx.resolved()).count()
    lone = 1 if n_base % 3 == 1 else 0
    assert n_members == n_base + folds * d - lone, n_members
    for gen in owned:
        release_checkpoint(gen)
    base.unpersist()
    return dict(
        chain_n_base=n_base,
        chain_folds=folds,
        chain_d=d,
        chain_wall_build_s=round(wall_build, 1),
        chain_fold_walls_s=walls,
        chain_frame_rows=frame_rows,
        chain_wall_compact_s=wall_compact,
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--base", type=int, default=10_000_000)
    ap.add_argument("--smoke", action="store_true", help="3*10^5 base")
    ap.add_argument("--chain", action="store_true",
                    help="chained-folds mode: F LSM folds + mid-chain compaction")
    ap.add_argument("--folds", type=int, default=8)
    ap.add_argument("--cpus", type=int,
                    default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    args = ap.parse_args()

    from crawler_spark.session import get_spark

    spark = get_spark(
        app_name="incremental-rehearsal",
        master=f"local[{args.cpus}]",
        shuffle_partitions=max(32, args.cpus * 2),
    )
    from crawler_spark.operators.incremental import phash_index_build
    from crawler_spark.state.ckpt import release_checkpoint

    n = 300_000 if args.smoke else args.base
    out: dict = {"n_base": n, "radius": RADIUS}
    if args.chain:
        d = max(40, n // 100)
        out.update(run_chain(spark, n, d, args.folds))
        print(json.dumps(out))
        return
    base = build_base(spark, n).persist()
    t0 = time.time()
    idx0 = phash_index_build(base, radius=RADIUS)
    wall_build = time.time() - t0
    # two delta sizes: update cost must track the delta, not the corpus
    for frac in (0.001, 0.01):
        d = max(40, int(n * frac))
        out.update(run(spark, base, idx0, wall_build, n, d))
    release_checkpoint(idx0)
    base.unpersist()
    print(json.dumps(out))


if __name__ == "__main__":
    main()
