"""Scale rehearsal: one full crawl whose FRONTIER grows past 10^7 rows,
so the scale paths that sandbox-sized E2E tests never trigger actually
engage in-loop (VERDICT r2 item 6):

  * seq_assign="auto" must flip from the window path to the
    range-partition+offset path (threshold 50k new items/step),
  * the LSM bloom maintenance must run >=1 distributed rebuild
    (threshold 20k recent rows) while the loop is live,
  * no liveness violation, loop terminates by max_pops.

Input: a deterministic arithmetic web (no external data, per the round
brief) — N_URLS pages over N_HOSTS hosts, FANOUT out-links per page via
fixed multiplier/offset arithmetic on the page id, all status 200. URLs
are constructed in canonical form (lowercase host, no default port) so
link canonicalization is the identity and the fetch join closes over
the id space.

Prints ONE JSON line with wall, steps/s, URLs/s, peak pending-frontier
size, per-step seq modes, and the bloom-rebuild count.

Usage: python tools/scale_rehearsal.py [--urls 24000000] [--hosts 120000]
       [--smoke]   (smoke = 200k URLs, seconds not minutes)
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def build_payloads(spark, n_urls: int):
    """Planted image payloads (input_hint shape, metadata elided): page i
    carries image i; triples share an xxhash64-derived phash with 1-2
    flipped bits (the incremental_rehearsal structure — at radius 2 and
    10^7 uniform hashes, cross-triple collisions are ~1e-3, so cluster
    separation is exact)."""
    g = (F.col("id") / 3).cast("long").cast("string")
    h = F.xxhash64(F.concat(F.lit("ph"), g))
    m = F.col("id") % 3
    return spark.range(n_urls).select(
        F.col("id").cast("string").alias("image_id"),
        F.when(m == 1, h.bitwiseXOR(F.lit(6)))
        .when(m == 2, h.bitwiseXOR(F.lit(1)))
        .otherwise(h)
        .alias("phash"),
    )


def build_web(spark, n_urls: int, n_hosts: int, fanout: int):
    """Arithmetic web: page id -> host id%H; out-link j of page i is
    page (i*M_j + C_j) % N. Pure column expressions — no joins, no UDFs;
    regenerating the plan is cheap but we persist it anyway so every
    step's fetch join reads cached blocks (the sandbox stand-in for a
    stored Iceberg web table)."""
    mults = [2, 3, 5, 7, 11, 13, 17, 19][:fanout]
    offs = [1, 7, 13, 29, 31, 37, 41, 43][:fanout]

    def url_of(i):
        return F.concat(
            F.lit("http://h"),
            (i % n_hosts).cast("string"),
            F.lit(".scale.test/p/"),
            i.cast("string"),
        )

    ids = spark.range(n_urls).select(F.col("id"))
    web = ids.select(
        url_of(F.col("id")).alias("url"),
        F.concat(
            F.lit("h"), (F.col("id") % n_hosts).cast("string"), F.lit(".scale.test")
        ).alias("host_key"),
        F.lit(200).alias("status"),
        F.array(
            *[url_of((F.col("id") * m + c) % n_urls) for m, c in zip(mults, offs)]
        ).alias("out_links"),
        F.lit(None).cast("string").alias("redirect_to"),
        F.col("id").cast("string").alias("image_id"),
    )
    return web


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--urls", type=int, default=24_000_000)
    ap.add_argument("--hosts", type=int, default=120_000)
    ap.add_argument("--fanout", type=int, default=8)
    ap.add_argument("--seeds", type=int, default=60_000)
    ap.add_argument("--cap", type=int, default=32, help="per_host_batch_cap")
    ap.add_argument("--max-pops", type=int, default=6_000_000)
    ap.add_argument("--cpus", type=int, default=int(os.environ.get("SPARK_GRAFT_CPUS", "32")))
    ap.add_argument("--smoke", action="store_true", help="200k-URL wiring check")
    ap.add_argument(
        "--lsm", action="store_true",
        help="state_maintenance='lsm' (per-step O(delta) state writes; "
        "compaction cadence sized for this input)",
    )
    ap.add_argument("--compact-rows", type=int, default=20_000_000)
    ap.add_argument("--compact-steps", type=int, default=8)
    ap.add_argument(
        "--dedup", action="store_true",
        help="in-loop incremental dedupe: fold each step's fetched "
        "payloads into the LSM phash index (CrawlEngine(payloads=...)); "
        "end state verified row-exact vs a one-shot rebuild",
    )
    ap.add_argument("--dedup-fold-every", type=int, default=2)
    args = ap.parse_args()
    if args.smoke:
        args.urls, args.hosts, args.seeds = 200_000, 2_000, 2_000
        args.max_pops = 120_000

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.session import get_spark

    shuffle_dir = tempfile.mkdtemp(prefix="rehearsal-shuffle-", dir="/dev/shm")
    spark = get_spark(
        app_name="scale-rehearsal",
        master=f"local[{args.cpus}]",
        shuffle_partitions=args.cpus,
        extra_conf={
            "spark.local.dir": shuffle_dir,
            "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")

    web = build_web(spark, args.urls, args.hosts, args.fanout).persist()
    web.count()
    seeds = [
        f"http://h{i % args.hosts}.scale.test/p/{i}" for i in range(args.seeds)
    ]

    policy = CrawlPolicy(
        max_depth=None,
        max_retry=1,
        obey_robots=False,
        per_host_batch_cap=args.cap,
        bloom_prefilter=True,
        seen_filter="bloom",
        bloom_shards=16,
        bloom_bits_per_shard=1 << 25,
    )
    dedup_kwargs = {}
    payloads = None
    if args.dedup:
        payloads = build_payloads(spark, args.urls).persist()
        payloads.count()
        dedup_kwargs = dict(
            payloads=payloads,
            dedup_radius=2,
            dedup_fold_every=args.dedup_fold_every,
            dedup_compact_folds=8,
        )
    eng = CrawlEngine(
        spark,
        web,
        policy=policy,
        workdir=tempfile.mkdtemp(prefix="rehearsal_crawl_"),
        max_pops=args.max_pops,
        metrics_level=0,
        seq_assign="auto",  # must FLIP to offset mid-run — that's the test
        state_maintenance="lsm" if args.lsm else "rewrite",
        compact_rows=args.compact_rows,
        compact_steps=args.compact_steps,
        **dedup_kwargs,
    )
    t0 = time.time()
    res = eng.run(seeds)
    n_emitted = res.emitted.count()
    wall = round(time.time() - t0, 2)

    # pending frontier after step s = seeds + cum(new_items) - cum(selected)
    pend, peak = args.seeds, args.seeds
    frontier_sizes = []
    for m in res.metrics:
        pend += m["new_items"] - m["selected"]
        frontier_sizes.append(pend)
        peak = max(peak, pend)
    seq_modes = [m.get("seq_mode") for m in res.metrics]

    out = {
        "metric": "scale-rehearsal crawl (10^7-row frontier)",
        "n_urls": args.urls,
        "n_hosts": args.hosts,
        "seeds": args.seeds,
        "wall_sec": wall,
        "steps": res.steps,
        "pops": res.pops,
        "emitted_rows": n_emitted,
        "urls_per_sec": round(res.pops / wall, 1),
        "steps_per_sec": round(res.steps / wall, 3),
        "peak_frontier": peak,
        "frontier_by_step": frontier_sizes,
        "selected_by_step": [m["selected"] for m in res.metrics],
        "new_items_by_step": [m["new_items"] for m in res.metrics],
        "seq_modes": seq_modes,
        "offset_engaged": "offset" in seq_modes,
        "bloom_rebuilds": eng.n_bloom_rebuilds,
        "state_maintenance": eng.state_maintenance,
        "compactions": eng.n_compactions,
        "cpus": args.cpus,
    }
    if args.dedup:
        # exactness: the in-loop index must be ROW-IDENTICAL to a
        # one-shot build over the payloads of every popped page (all
        # pops here are first-visit ok with no redirects) — step
        # batching, the fold cadence, and LSM framing must be invisible.
        # The rebuild wall is ALSO the number the fold replaces.
        from crawler_spark.operators.incremental import phash_index_build
        from crawler_spark.plans.crawl import dedup_member_id
        from crawler_spark.state.ckpt import release_checkpoint

        idx = res.dedup_index.persist()
        n_idx = idx.count()
        t1 = time.time()
        popped_imgs = (
            res.emitted.select(
                F.regexp_extract("url", r"/p/(\d+)$", 1).alias("image_id")
            )
            .join(payloads, "image_id")
            .select(dedup_member_id(F.col("image_id")).alias("image_id"), "phash")
        )
        ref = phash_index_build(popped_imgs, radius=2)
        wall_rebuild = round(time.time() - t1, 2)
        n_ref = ref.count()
        checksum = [
            df.agg(
                F.expr(
                    "bit_xor(xxhash64(concat_ws('|', phash, gid, gsz, "
                    "cast(has_edge as string), comp)))"
                )
            ).first()[0]
            for df in (idx, ref)
        ]
        dedup_exact = n_idx == n_ref and checksum[0] == checksum[1]
        release_checkpoint(ref)
        folds = [m for m in res.metrics if m.get("dedup_folded")]
        out.update(
            dedup_exact=bool(dedup_exact),
            dedup_index_hashes=n_idx,
            dedup_folds=eng._dedup_folds,
            dedup_compactions=eng.n_dedup_compactions,
            dedup_folded_by_fold=[m["dedup_folded"] for m in folds],
            dedup_frame_rows_by_fold=[m["dedup_frame_rows"] for m in folds],
            dedup_rebuild_wall_sec=wall_rebuild,
        )
    print(json.dumps(out))
    if not args.smoke:
        ok = (
            out["offset_engaged"]
            and out["bloom_rebuilds"] >= 1
            and peak >= 10_000_000
            and (not args.dedup or out["dedup_exact"])
        )
        print(f"REHEARSAL {'PASS' if ok else 'FAIL'}: offset={out['offset_engaged']} "
              f"rebuilds={out['bloom_rebuilds']} peak_frontier={peak} "
              f"dedup_exact={out.get('dedup_exact', 'n/a')}", file=sys.stderr)
        sys.exit(0 if ok else 1)
    elif args.dedup and not out["dedup_exact"]:
        print("SMOKE FAIL: dedup_exact=False", file=sys.stderr)
        sys.exit(1)


if __name__ == "__main__":
    main()
