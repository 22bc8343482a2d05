"""Scaling-efficiency evidence: same job, same input, two parallelism
levels (the sandbox stand-in for N vs 4N executors — BASELINE.md §
measurement protocol).

Each level runs in a fresh JVM pinned to exactly that many physical
cores (taskset), so "local[8]" really means an 8-core machine — JVM GC
threads and Python UDF workers share the pinned set just as they share
an executor host on a real cluster.

Legs (min of 3 repetitions each):

  A. **canon-udf** — 10M URL resolve+canonicalize through the Arrow
     pandas UDF: the crawl tick's hot Python path.
  B. **tick-kernel** — one superstep's data path over a synthesized 48M-URL
     frontier across 1.2M hosts: politeness selection (per-host agg +
     min_by heads) + first-writer dedupe (min_by) + exact anti-join.
     Sized so compute dominates fixed stage latency at 32 cores.
  C. **shuffle-agg** — 100M-row host-metrics rollup (C8 at scale).
  D. **crawl loop (context)** — the full superstep loop at sandbox scale;
     dominated by per-step scheduling latency, reported for context only
     (see BENCH.md caveats), not a scaling claim.

Usage: python tools/scaling_bench.py [--n 8] [--sf-dir ...]
Prints one JSON line; appends a row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F, Window
from crawler_spark.session import get_spark
from crawler_spark.config import CrawlPolicy
from crawler_spark.operators.ordering import prio_col
from crawler_spark.operators.selection import select_batch
from crawler_spark.plans.crawl import CrawlEngine, HOST_STATE_SCHEMA
from crawler_spark.functions.urlnorm import resolve_links_udf
import __spark_entry__ as entrymod

cpus = int(sys.argv[1]); sf_dir = sys.argv[2]
scale = float(sys.argv[3]) if len(sys.argv) > 3 else 1.0
master = sys.argv[4] if len(sys.argv) > 4 else f"local[{{cpus}}]"
# Shuffle storage on tmpfs: a real 4N-node cluster brings 4N nodes'
# local NVMe for shuffle files; a single shared root disk under 4N
# concurrent writers models a pathological cluster instead (measured:
# the 24M-row anti-join scaled 0.32 on the shared disk vs 0.66 on
# tmpfs purely from writeback contention).
shuffle_dir = f"/dev/shm/spark-scaling-{{cpus}}"
os.makedirs(shuffle_dir, exist_ok=True)
conf = {{
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.sql.execution.arrow.maxRecordsPerBatch": "50000",
    "spark.local.dir": shuffle_dir,
}}
if master.startswith("local-cluster"):
    # true multi-executor JVMs: each executor owns its memory pool and
    # shuffles over real block transfers; executor Python workers need
    # the repo on PYTHONPATH — the local-cluster analog of shipping the
    # package via spark-submit --py-files. Executor memory = the master
    # string's per-executor MB (local-cluster[n,cores,mem_mb]).
    mem_mb = master.rstrip("]").split(",")[-1]
    conf["spark.executor.memory"] = f"{{mem_mb}}m"
    conf["spark.executorEnv.PYTHONPATH"] = {repo!r}
spark = get_spark(app_name=f"scaling-{{cpus}}", master=master,
                  shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

N_FRONTIER = int(48_000_000 * scale)
N_HOSTS = int(1_200_000 * scale)
N_URLS = int(5_000_000 * scale)  # x2 refs per row = 10M canonicalizations
N_AGG = int(100_000_000 * scale)
N_CAND = int(24_000_000 * scale)

def _steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])

# Fresh executor JVMs pay several reps of JIT/C2 + shuffle-stack warmup
# before a leg reaches steady state (measured in local-cluster mode:
# the tick kernel fell 135s -> 14s over 6 reps at 4 executors while a
# single local JVM was steady from rep 1) — time steady state, not
# warmup: every leg gets untimed warmup reps first, more in
# local-cluster mode where each executor JIT-compiles independently.
WARMUP = 3 if master.startswith("local-cluster") else 1

def best(fn, reps=3, warmup=None):
    for _ in range(WARMUP if warmup is None else warmup):
        fn()
    times = []
    for _ in range(reps):
        t0 = time.time(); fn(); times.append(time.time() - t0)
    return min(times)

STEAL0 = _steal()
T0 = time.time()

# warmup: JVM + codegen + python workers
spark.range(1_000_000, numPartitions=cpus).select(F.xxhash64("id")).count()
spark.range(1000).select(resolve_links_udf(F.lit("http://w.test/"), F.array(F.lit("a")))).count()

# ---- leg A: canonicalize UDF ------------------------------------------
links = spark.range(N_URLS, numPartitions=64).select(
    F.concat(F.lit("http://h"), (F.col("id") % 1000).cast("string"), F.lit(".test/")).alias("base"),
    F.array(F.concat(F.lit("P"), F.col("id").cast("string"), F.lit("#f")),
            F.lit("//X.TEST:80/q")).alias("refs"))
canon_sec = best(lambda: links.select(
    F.explode(resolve_links_udf("base", "refs"))).agg(F.count("*")).collect())

# ---- leg B: tick kernel ------------------------------------------------
frontier = spark.range(N_FRONTIER, numPartitions=32).select(
    F.concat(F.lit("http://h"), (F.col("id") % N_HOSTS).cast("string"),
             F.lit(".test/p"), F.col("id").cast("string")).alias("url"),
    F.concat(F.lit("h"), (F.col("id") % N_HOSTS).cast("string"),
             F.lit(".test")).alias("host_key"),
    F.lit(0).cast("long").alias("next_ms"),
    F.lit(0).cast("long").alias("avail_ms"),
    F.lit(0).alias("score"),
    prio_col(F.lit(0)).alias("prio"),
    F.col("id").alias("seq"),
    F.lit(0).alias("depth"),
    F.lit(0).alias("num_retry"),
).persist()
frontier.count()
seen = frontier.select("url").persist(); seen.count()
host_state = spark.createDataFrame([], HOST_STATE_SCHEMA)
cand = spark.range(N_CAND, numPartitions=32).select(
    F.concat(F.lit("http://h"), ((F.col("id") * 13) % N_HOSTS).cast("string"),
             F.lit(".test/p"), ((F.col("id") * 7) % (N_FRONTIER * 2)).cast("string")).alias("url"),
    F.col("id").alias("p_seq"),
)

def tick():
    sel = select_batch(frontier, host_state, mode="exact", per_host_cap=1 << 22)
    sel.selected.count()
    sel.release()
    # first-writer dedupe as min_by aggregation (the engine's plan shape)
    (cand.groupBy("url").agg(F.min("p_seq").alias("p_seq"))
     .join(seen, "url", "left_anti").count())

tick_sec = best(tick)

# ---- leg B': scan ceiling ---------------------------------------------
# A shuffle-free scan+reduce over the SAME cached frontier (string and
# long columns both touched, trivial per-row compute): the in-run
# measurement of this host's shared-memory-bandwidth scaling ceiling,
# the bound the tick kernel's cached-scan legs live under (a real 4N
# cluster multiplies memory systems; one host doesn't). Sized to run
# seconds, not sub-second, so job-scheduling latency doesn't masquerade
# as the ceiling.
scan_sec = best(lambda: frontier.agg(
    F.sum(F.col("seq") + F.col("next_ms")),
    F.sum(F.length("url")),
    F.sum(F.length("host_key")),
    F.count(F.when(F.col("seq") % 97 == 0, 1))).collect())

# ---- leg C: shuffle agg ------------------------------------------------
ev = spark.range(N_AGG, numPartitions=32).select(
    (F.col("id") % N_HOSTS).alias("host"), (F.col("id") % 997).cast("double").alias("v"))
agg_sec = best(lambda: ev.groupBy("host").agg(
    F.count("*").alias("n"), F.sum("v").alias("s"), F.max("v").alias("m"))
    .agg(F.count("*")).collect())

frontier.unpersist(); seen.unpersist()

# ---- leg E: connected-components kernel ---------------------------------
# iterative near-dup clustering (operators/components.py): 2 edges/node
# in blocks of 1024 -> random-graph diameter ~log(block) so the doubling
# loop runs ~4-5 rounds; measures per-round shuffle+join throughput, the
# thing that scales, with round count held constant across levels.
from crawler_spark.operators.components import connected_components
N_CC = int(4_000_000 * scale)
cc_edges = spark.range(int(8_000_000 * scale), numPartitions=32).select(
    (F.col("id") % N_CC).alias("id_a"),
    ((F.col("id") % N_CC) - (F.col("id") % N_CC) % 1024
     + (F.col("id") * 2654435761) % 1024).alias("id_b"))
cc_sec = best(lambda: connected_components(cc_edges).count(), reps=2, warmup=1)

# ---- leg D: crawl loop (context only) ----------------------------------
web, _ = entrymod._derived_web(spark, sf_dir, n_events=5000)
web = web.persist(); web.count()
seeds = [r["url"] for r in web.orderBy("url").limit(10).collect()]
t0 = time.time()
eng = CrawlEngine(spark, web,
                  policy=CrawlPolicy(max_depth=None, max_retry=1, obey_robots=False,
                                     per_host_batch_cap=100_000),
                  workdir=tempfile.mkdtemp(prefix=f"scale{{cpus}}_"),
                  max_pops=3000, metrics_level=0)
res = eng.run(seeds)
res.emitted.count()
crawl_sec = time.time() - t0

steal_ticks = _steal() - STEAL0
steal_frac = steal_ticks / (100.0 * (time.time() - T0) * cpus)
print(json.dumps(dict(
    cpus=cpus,
    master=master,
    scale=scale,
    steal_frac=round(steal_frac, 4),
    canon_sec=round(canon_sec, 2),
    canon_urls_per_sec=round(N_URLS * 2 / canon_sec, 0),
    tick_sec=round(tick_sec, 2),
    scan_sec=round(scan_sec, 2),
    agg_sec=round(agg_sec, 2),
    cc_sec=round(cc_sec, 2),
    crawl_sec=round(crawl_sec, 2), pops=res.pops,
    loop_urls_per_sec=round(res.pops / crawl_sec, 2),
)))
"""


def run_level(cpus: int, sf_dir: str, scale: float = 1.0, master: str = "") -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.format(repo=REPO))
        path = f.name
    master = master or f"local[{cpus}]"
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, path, str(cpus), sf_dir, str(scale), master]
    # local mode: the 48M-row cache lives in the driver JVM; in
    # local-cluster mode it lives in the executor JVMs instead
    drv_mem = "8g" if master.startswith("local-cluster") else "48g"
    env = dict(os.environ, SPARK_DRIVER_MEMORY=drv_mem)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    os.unlink(path)
    shutil.rmtree(f"/dev/shm/spark-scaling-{cpus}", ignore_errors=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument(
        "--scale", type=float, default=1.0,
        help="input-size multiplier (both levels of a pair share it; use "
        "<1 for low-core pairs so a leg stays minutes, not hours)",
    )
    ap.add_argument(
        "--executors", action="store_true",
        help="N vs 4N EXECUTOR JVMs (local-cluster[N,C] vs local-cluster[4N,C]) "
        "instead of thread counts — the closest sandbox analog of the north "
        "rule's 'N and 4N executors'; --n is the executor count",
    )
    ap.add_argument(
        "--exec-cores", type=int, default=8,
        help="cores per executor in --executors mode; small values (e.g. 2) "
        "give the 4N level memory-bandwidth HEADROOM on one host — the "
        "honest reading of the plan's scalability vs the host's ceiling",
    )
    ap.add_argument(
        "--exec-mem-mb", type=int, default=20480,
        help="memory per executor (MB) in --executors mode",
    )
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    if args.executors:
        c = args.exec_cores
        lo_master = f"local-cluster[{args.n},{c},{args.exec_mem_mb}]"
        hi_master = f"local-cluster[{args.n * 4},{c},{args.exec_mem_mb}]"
        lo = run_level(args.n * c, args.sf_dir, args.scale, lo_master)
        hi = run_level(args.n * 4 * c, args.sf_dir, args.scale, hi_master)
    else:
        lo = run_level(args.n, args.sf_dir, args.scale)
        hi = run_level(args.n * 4, args.sf_dir, args.scale)
    eff = lambda a, b: round((a / b) / 4, 3)
    result = dict(
        sf_dir=args.sf_dir, n=args.n, scale=args.scale, low=lo, high=hi,
        scaling_efficiency_canon=eff(lo["canon_sec"], hi["canon_sec"]),
        scaling_efficiency_tick=eff(lo["tick_sec"], hi["tick_sec"]),
        scaling_efficiency_scan_ceiling=eff(lo["scan_sec"], hi["scan_sec"]),
        scaling_efficiency_agg=eff(lo["agg_sec"], hi["agg_sec"]),
        scaling_efficiency_cc=eff(lo["cc_sec"], hi["cc_sec"]),
    )
    # the tick kernel is cached-scan-dominated, so its per-run ceiling is
    # the shuffle-free scan leg on the same data in the same JVMs — the
    # ratio says how close the kernel sits to what THIS host's shared
    # memory system allows at all (a real 4N cluster multiplies memory
    # systems; one host does not)
    ceiling = result["scaling_efficiency_scan_ceiling"]
    if ceiling:
        result["tick_over_scan_ceiling"] = round(
            result["scaling_efficiency_tick"] / ceiling, 3
        )
    print(json.dumps(result))

    pair = (
        f"{lo['master']}→{hi['master']}"
        if args.executors
        else f"local[{args.n}]→local[{args.n * 4}]"
    )
    md = (
        f"| {os.path.basename(args.sf_dir)} scale={args.scale} | {pair} "
        f"| {lo['canon_sec']}s → {hi['canon_sec']}s ({result['scaling_efficiency_canon']}) "
        f"| {lo['tick_sec']}s → {hi['tick_sec']}s ({result['scaling_efficiency_tick']}) "
        f"| {lo['agg_sec']}s → {hi['agg_sec']}s ({result['scaling_efficiency_agg']}) "
        f"| {lo['loop_urls_per_sec']} → {hi['loop_urls_per_sec']} |\n"
        f"  - cc-kernel (8M-edge connected components): {lo['cc_sec']}s → "
        f"{hi['cc_sec']}s (eff {result['scaling_efficiency_cc']})\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
