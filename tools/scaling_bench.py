"""Scaling-efficiency evidence: same job, same input, two parallelism
levels (the sandbox stand-in for N vs 4N executors — BASELINE.md §
measurement protocol).

Runs the crawl superstep loop and a shuffle-heavy operator suite at
local[N] and local[4N] in *separate JVMs* (fresh SparkSession each, so
pools don't interfere), reports throughput at both plus scaling
efficiency = (thr_4N / thr_N) / 4.

Usage: python tools/scaling_bench.py [--n 8] [--sf-dir /root/testdata/sf0.1]
Writes one JSON line to stdout and appends a markdown row to BENCH.md.
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

WORKER = r"""
import json, os, sys, tempfile, time
sys.path.insert(0, {repo!r})
from crawler_spark.session import get_spark
from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
import __spark_entry__ as entrymod

cpus = int(sys.argv[1])
sf_dir = sys.argv[2]
spark = get_spark(app_name=f"scaling-{{cpus}}", master=f"local[{{cpus}}]",
                  shuffle_partitions=cpus)
spark.sparkContext.setLogLevel("ERROR")

# operator suite (shuffle/window/UDF heavy subset)
qs = entrymod.queries()
suite = ["politeness_budget", "dedup_exact", "minhash_near_dups", "simhash",
         "sessionize", "lineitem_rollup", "url_canonicalize"]
# JVM+python-worker warmup so fixed startup cost doesn't pollute scaling
qs["frontier_topk"](spark, sf_dir).count()

t0 = time.time()
for name in suite:
    qs[name](spark, sf_dir).count()
suite_sec = time.time() - t0

web, seeds = entrymod._derived_web(spark, sf_dir, n_events=5000)
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
print(json.dumps(dict(cpus=cpus, suite_sec=round(suite_sec, 2),
                      crawl_sec=round(crawl_sec, 2), pops=res.pops,
                      steps=res.steps,
                      urls_per_sec=round(res.pops / crawl_sec, 2))))
"""


def run_level(cpus: int, sf_dir: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.format(repo=REPO))
        path = f.name
    out = subprocess.run(
        [sys.executable, path, str(cpus), sf_dir],
        capture_output=True, text=True, timeout=3600,
    )
    os.unlink(path)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=8)
    ap.add_argument("--sf-dir", default=os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"))
    args = ap.parse_args()

    lo = run_level(args.n, args.sf_dir)
    hi = run_level(args.n * 4, args.sf_dir)
    eff_crawl = (hi["urls_per_sec"] / lo["urls_per_sec"]) / 4
    eff_suite = (lo["suite_sec"] / hi["suite_sec"]) / 4
    result = dict(
        sf_dir=args.sf_dir, n=args.n,
        low=lo, high=hi,
        scaling_efficiency_crawl=round(eff_crawl, 3),
        scaling_efficiency_suite=round(eff_suite, 3),
    )
    print(json.dumps(result))

    md = (
        f"| {os.path.basename(args.sf_dir)} | local[{args.n}] | local[{args.n * 4}] "
        f"| {lo['urls_per_sec']} | {hi['urls_per_sec']} | {result['scaling_efficiency_crawl']} "
        f"| {lo['suite_sec']}s | {hi['suite_sec']}s | {result['scaling_efficiency_suite']} |\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
