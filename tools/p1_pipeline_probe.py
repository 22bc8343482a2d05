"""A/B probe: pipelined phase-1 selection vs synchronous .first().

Measures the bench.py crawl-loop configuration (events-derived web at
$SPARK_GRAFT_SF_DIR, max_pops=3000, metrics_level=0) with the NEXT
step's phase-1 aggregate either riding the state-checkpoint wall
(pipeline_phase1=True, the default) or run synchronously at the top of
each step (False — the pre-change shape). Each leg runs in its own JVM
(`--leg` subprocess) so JIT/caches can't bleed across; min-of-N is the
honest statistic on this steal-prone host.

Usage:  python tools/p1_pipeline_probe.py [--reps 2] [--pops 3000]
        python tools/p1_pipeline_probe.py --leg on   (internal)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def run_leg(pipeline: bool, pops: int) -> dict:
    import __spark_entry__ as entrymod
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.session import get_spark

    spark = get_spark(
        app_name="p1-probe",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")
    web, _ = entrymod._derived_web(spark, SF_DIR, n_events=5000)
    web = web.persist()
    web.count()
    seeds = [r["url"] for r in web.orderBy("url").limit(10).collect()]
    t0 = time.time()
    eng = CrawlEngine(
        spark,
        web,
        policy=CrawlPolicy(max_depth=None, max_retry=1, obey_robots=False,
                           per_host_batch_cap=100_000),
        workdir=tempfile.mkdtemp(prefix="p1_probe_"),
        max_pops=pops,
        metrics_level=0,
        pipeline_phase1=pipeline,
    )
    res = eng.run(seeds)
    res.emitted.count()
    wall = round(time.time() - t0, 3)
    return {"pipeline": pipeline, "wall_s": wall, "pops": res.pops,
            "steps": res.steps, "urls_per_sec": round(res.pops / wall, 1)}


def main() -> None:
    if "--leg" in sys.argv:
        leg = sys.argv[sys.argv.index("--leg") + 1]
        pops = int(os.environ.get("P1_PROBE_POPS", "3000"))
        print(json.dumps(run_leg(leg == "on", pops)))
        return
    reps = int(sys.argv[sys.argv.index("--reps") + 1]) if "--reps" in sys.argv else 2
    pops = sys.argv[sys.argv.index("--pops") + 1] if "--pops" in sys.argv else "3000"
    out: dict[str, list] = {"on": [], "off": []}
    for rep in range(reps):
        for leg in ("on", "off") if rep % 2 == 0 else ("off", "on"):
            env = dict(os.environ, P1_PROBE_POPS=pops)
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--leg", leg],
                capture_output=True, text=True, env=env,
            )
            lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
            if r.returncode != 0 or not lines:
                sys.stderr.write(r.stderr[-4000:])
                raise RuntimeError(
                    f"leg {leg!r} failed (rc={r.returncode}); stderr above"
                )
            rec = json.loads(lines[-1])
            out[leg].append(rec)
            print(f"rep{rep} {leg}: {rec}", flush=True)
    best_on = min(r["wall_s"] for r in out["on"])
    best_off = min(r["wall_s"] for r in out["off"])
    print(json.dumps({
        "best_on_s": best_on, "best_off_s": best_off,
        "speedup": round(best_off / best_on, 3),
        "runs": out,
    }))


if __name__ == "__main__":
    main()
