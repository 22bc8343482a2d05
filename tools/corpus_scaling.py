"""Corpus-pipeline scaling evidence: the composed canonical_image_corpus
(quality gate → caption best-copy dedup → phash Hamming clustering →
canonical keep) run at two cluster sizes, same input — the image-pipeline
analog of tools/scaling_bench.py for the north rule's N→4N criterion.

tools/corpus_rehearsal.py's thread-mode legs (local[8]→local[32]) read
0.634/0.511 because a join-dense pipeline saturates the single host's
shared memory system earlier than the crawl kernels do; this tool runs
the SAME pipeline in the executor-JVM headroom shape
(local-cluster[N,2] → local-cluster[4N,2]) where each executor owns its
memory pool — the shape in which the crawl kernels' ratios went ≥0.9.
Protocol mirrors scaling_bench.py: fresh taskset-pinned JVM per level,
tmpfs shuffle dirs, untimed warmup reps (executor JVMs JIT
independently), min-of-N timing, an in-run shuffle-free scan-ceiling leg
over the same cached payload, and a one-shot exactness assert on the
planted triple structure (one canonical = the triple head per group).

Usage: python tools/corpus_scaling.py [--n 1] [--images 2999997]
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
import json, os, sys, time
sys.path.insert(0, {repo!r})
from pyspark.sql import functions as F
from crawler_spark.session import get_spark
from crawler_spark.plans.corpus import canonical_image_corpus
from tools.corpus_rehearsal import build_payload, QUALITY_KWARGS, RADIUS

cpus = int(sys.argv[1]); n_images = int(sys.argv[2]); master = sys.argv[3]
shuffle_dir = f"/dev/shm/spark-corpus-{{cpus}}"
os.makedirs(shuffle_dir, exist_ok=True)
conf = {{
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
    "spark.local.dir": shuffle_dir,
}}
if master.startswith("local-cluster"):
    mem_mb = master.rstrip("]").split(",")[-1]
    conf["spark.executor.memory"] = f"{{mem_mb}}m"
    conf["spark.executorEnv.PYTHONPATH"] = {repo!r}
spark = get_spark(app_name=f"corpus-scaling-{{cpus}}", master=master,
                  shuffle_partitions=32, extra_conf=conf)
spark.sparkContext.setLogLevel("ERROR")

def _steal():
    with open("/proc/stat") as f:
        return int(f.readline().split()[8])

n_images -= n_images % 3
groups = n_images // 3
payload = build_payload(spark, n_images).persist()
assert payload.count() == n_images

# correctness once per level: the planted structure resolves exactly
assert canonical_image_corpus(
    payload, radius=RADIUS, quality_kwargs=QUALITY_KWARGS).count() == groups

WARMUP = 2 if master.startswith("local-cluster") else 1
REPS = 2

def best(fn):
    for _ in range(WARMUP):
        fn()
    times = []
    for _ in range(REPS):
        t0 = time.time(); fn(); times.append(time.time() - t0)
    return min(times)

STEAL0 = _steal(); T0 = time.time()

def run_pipe():
    # pin_survivors: the final keep action reuses the 6-column survivors
    # cache instead of re-scanning the full payload (bytes included) —
    # one payload pass + one argmax shuffle fewer on the bandwidth-bound
    # host (r5); released per rep so timing reps don't stack caches
    kept = canonical_image_corpus(
        payload, radius=RADIUS, quality_kwargs=QUALITY_KWARGS,
        pin_survivors=True)
    kept.count()
    kept.pinned_survivors.unpersist()

pipe_sec = best(run_pipe)

# shuffle-free scan+reduce over the SAME cached payload: this host's
# memory-bandwidth scaling ceiling for cached-scan work in this shape.
# THREE consecutive full passes (different expressions) per timed rep so
# the leg is bandwidth-bound, not job-latency-bound — a sub-second
# single pass reads as a launch-overhead ratio, not a ceiling (r5).
def scan_all():
    payload.agg(
        F.sum(F.col("phash") % 100003 + F.col("w")),
        F.sum(F.length("caption")),
        F.count(F.when(F.col("image_id") % 97 == 0, 1))).collect()
    payload.agg(
        F.sum(F.col("phash") % 99991 + F.col("h")),
        F.sum(F.octet_length("bytes")),
        F.count(F.when(F.col("image_id") % 89 == 0, 1))).collect()
    payload.agg(
        F.sum(F.col("image_id") * 31 % 100003),
        F.sum(F.length("fmt") + F.col("w") + F.col("h")),
        F.max("phash")).collect()

scan_sec = best(scan_all)

steal = (_steal() - STEAL0) / (100.0 * (time.time() - T0) * cpus)
print(json.dumps(dict(
    cpus=cpus, master=master, n_images=n_images,
    steal_frac=round(steal, 4),
    pipe_sec=round(pipe_sec, 2),
    images_per_sec=round(n_images / pipe_sec),
    scan_sec=round(scan_sec, 2),
)))
"""


def run_level(cpus: int, n_images: int, master: str) -> dict:
    with tempfile.NamedTemporaryFile("w", suffix=".py", delete=False) as f:
        f.write(WORKER.format(repo=REPO))
        path = f.name
    cmd = ["taskset", "-c", f"0-{cpus - 1}", sys.executable, path,
           str(cpus), str(n_images), master]
    drv_mem = "8g" if master.startswith("local-cluster") else "48g"
    env = dict(os.environ, SPARK_DRIVER_MEMORY=drv_mem)
    out = subprocess.run(cmd, capture_output=True, text=True, timeout=3600, env=env)
    os.unlink(path)
    shutil.rmtree(f"/dev/shm/spark-corpus-{cpus}", ignore_errors=True)
    lines = [l for l in out.stdout.splitlines() if l.startswith("{")]
    if not lines:
        raise RuntimeError(f"worker failed (cpus={cpus}):\n{out.stderr[-3000:]}")
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=1, help="executor count N (vs 4N)")
    ap.add_argument("--exec-cores", type=int, default=2)
    ap.add_argument("--exec-mem-mb", type=int, default=10240)
    ap.add_argument("--images", type=int, default=2_999_997)
    ap.add_argument("--threads", action="store_true",
                    help="thread-mode pair local[N]→local[4N] instead of "
                    "executor JVMs (--n is the core count)")
    args = ap.parse_args()

    if args.threads:
        lo_master = f"local[{args.n}]"
        hi_master = f"local[{args.n * 4}]"
        lo_cpus, hi_cpus = args.n, args.n * 4
    else:
        c = args.exec_cores
        lo_master = f"local-cluster[{args.n},{c},{args.exec_mem_mb}]"
        hi_master = f"local-cluster[{args.n * 4},{c},{args.exec_mem_mb}]"
        lo_cpus, hi_cpus = args.n * c, args.n * 4 * c
    lo = run_level(lo_cpus, args.images, lo_master)
    hi = run_level(hi_cpus, args.images, hi_master)
    eff = lambda a, b: round((a / b) / 4, 3)
    result = dict(
        n_images=lo["n_images"], low=lo, high=hi,
        scaling_efficiency_pipeline=eff(lo["pipe_sec"], hi["pipe_sec"]),
        scaling_efficiency_scan_ceiling=eff(lo["scan_sec"], hi["scan_sec"]),
    )
    ceiling = result["scaling_efficiency_scan_ceiling"]
    if ceiling:
        result["pipeline_over_scan_ceiling"] = round(
            result["scaling_efficiency_pipeline"] / ceiling, 3)
    print(json.dumps(result))

    md = (
        f"| corpus pipeline {lo['n_images']} imgs | {lo_master}→{hi_master} "
        f"| {lo['pipe_sec']}s → {hi['pipe_sec']}s "
        f"(eff {result['scaling_efficiency_pipeline']}, "
        f"ceiling {ceiling}, ratio {result.get('pipeline_over_scan_ceiling')}) "
        f"| {lo['images_per_sec']} → {hi['images_per_sec']} images/s "
        f"| steal {lo['steal_frac']}/{hi['steal_frac']} |\n"
    )
    with open(os.path.join(REPO, "BENCH.md"), "a") as f:
        f.write(md)


if __name__ == "__main__":
    main()
