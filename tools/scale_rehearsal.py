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
    print(json.dumps(out))
    if not args.smoke:
        ok = (
            out["offset_engaged"]
            and out["bloom_rebuilds"] >= 1
            and peak >= 10_000_000
        )
        print(f"REHEARSAL {'PASS' if ok else 'FAIL'}: offset={out['offset_engaged']} "
              f"rebuilds={out['bloom_rebuilds']} peak_frontier={peak}", file=sys.stderr)
        sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
