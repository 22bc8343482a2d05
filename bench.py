"""Benchmark harness — headline queries at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
  {"metric": "...", "value": total_sec, "unit": "sec",
   "queries": {name: sec, ...}, "sf": 0.1, ...extras}

The headline set covers the engine's core paths: the crawl superstep
loop (the north metric — frontier URLs scheduled/sec), politeness
selection, dedupe (exact + minhash-LSH + simhash), similarity search,
text analysis, and the relational kernel. Scaling-efficiency runs (same
job at local[8] vs local[32]) are driven by tools/scaling_bench.py.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

# VERDICT r4 item 2: the r4 driver bench ran 29 queries in ONE JVM and the
# r3-era query set came out 1.43x slower than r3 had measured — suspected
# suite-growth contention (GC/code-cache pressure from the 7 heavy new
# queries), not plan regressions.  To pin it, the main run ALSO re-runs the
# r3-shared set in a fresh subprocess JVM (same conditions r3 measured
# under) and reports both readings side by side.
R3_SHARED = [
    "frontier_topk", "politeness_budget", "seen_antijoin", "emit_order",
    "sessionize", "hourly_rollup", "lineitem_rollup", "top_revenue",
    "url_canonicalize", "dedup_exact", "minhash_near_dups", "simhash",
    "ann_cosine_topk", "text_stats", "quality_filter", "phash_near_dups",
    "extract_links", "dedup_groups", "image_dup_groups", "image_quality",
    "caption_dedup_best", "crawl_loop",
]

# VERDICT r4 item 8: per-entry wall budget — any suite query whose sf0.1
# wall exceeds this is flagged in the output so future faces can't
# silently push the driver's bench/correctness runs past their budget.
WALL_BUDGET_SEC = float(os.environ.get("SPARK_GRAFT_WALL_BUDGET", "20"))

# comma-separated query names: run ONLY those (used for the isolated-JVM
# rerun; also handy for one-off timing).  Subset runs never recurse.
SUBSET = os.environ.get("SPARK_GRAFT_BENCH_SUBSET")


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


BENCH_NAMES = [
        "frontier_topk",
        "politeness_budget",
        "seen_antijoin",
        "emit_order",
        "sessionize",
        "hourly_rollup",
        "lineitem_rollup",
        "top_revenue",
        "url_canonicalize",
        "dedup_exact",
        "minhash_near_dups",
        "simhash",
        "ann_cosine_topk",
        "ann_hamming_topk",
        "text_stats",
        "quality_filter",
        "phash_near_dups",
        "extract_links",
        # r3 additions: near-dup clustering (iterative connected
        # components) standalone and composed with the phash pair join
        "dedup_groups",
        "image_dup_groups",
        # r3 additions: image-corpus gates (metadata-only quality filter,
        # best-copy-per-caption argmax)
        "image_quality",
        "caption_dedup_best",
        # r4 additions: the composed corpus pipeline (gate → caption
        # dedup → phash clusters → canonical keep) and the html-mode
        # whole-crawl (the loop parsing real bodies via the extractor)
        "corpus_canonical",
        # r4 late: the composed TEXT corpus pipeline (quality gate →
        # group-reduced minhash pairs → clusters → canonical keep)
        "corpus_canonical_docs",
        "crawl_html",
        # r4 additions: the Structured-Streaming restatements (run to
        # completion with AvailableNow inside the entry; wall includes
        # stream startup + checkpoint commits)
        "stream_rollup",
        "stream_host_budget",
        # r4 session 2: the O(delta) index fold. Wall here is dominated
        # by fixed superstep overhead (TWO cc loops: build + contracted
        # update) plus radius-6 level-1 saturation at sf scale (512
        # buckets/block, so the touched probe returns most of the tiny
        # base); the operating point that matters is the 10^7-hash
        # rehearsal in BENCH.md (fold wall flat across 10x delta sizes).
        "incremental_dedup",
        # r4 session 3: the crawl loop MAINTAINING the dedup index
        # in-loop (CrawlEngine(payloads=...)) — wall ≈ crawl_bfs plus
        # per-cadence fold pipelines; the at-scale fold economics are
        # the scale_rehearsal --dedup numbers in BENCH.md
        "crawl_live_dedup",
        # the north metric — always last so its latency-sensitive loop
        # runs after the suite's heavy shuffles are done
        "crawl_loop",
]


def _bench_queries():
    """queries() + the production-operating-point overrides.

    The minhash/simhash driver entries (and the composed text-corpus
    face built on minhash) use the md5 hash family so the DuckDB
    oracle can recompute them; the benchmark measures the PRODUCTION
    family (xxhash64 — 8-byte values through the shuffle, JVM-side)
    by invoking the operators directly with their defaults."""
    import __spark_entry__ as entrymod

    def bench_minhash(spark_, sf_dir):
        from pyspark.sql import functions as FF

        from crawler_spark.operators.dedup import minhash_near_dups

        d = spark_.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return minhash_near_dups(d, "doc_id", "text", threshold=0.6).select(
            "id_a", "id_b", FF.round("est_jaccard", 6).alias("est_jaccard")
        )

    def bench_simhash(spark_, sf_dir):
        from pyspark.sql import functions as FF

        from crawler_spark.operators.dedup import simhash

        d = spark_.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return simhash(d, "doc_id", "text").select(FF.col("id").alias("doc_id"), "simhash")

    def bench_corpus_docs(spark_, sf_dir):
        from pyspark.sql import functions as FF

        from crawler_spark.plans.corpus import canonical_text_corpus

        # production DEFAULT operating point (k=32, 8×4 bands ⇒ LSH
        # threshold ≈0.6 — the same point the minhash bench measures).
        # The ENTRY face overrides to k=16/rows=2 only to halve the
        # md5-family signature width its DuckDB oracle must recompute;
        # that ≈0.35-threshold regime is adversarially pair-dense on
        # this high-template fixture (1.36M qualifying pairs from 5k
        # docs) and is not what a user's dedup run looks like.
        d = spark_.read.parquet(os.path.join(sf_dir, "documents.parquet"))
        return canonical_text_corpus(d, "doc_id", "text").select(
            "doc_id", FF.round("quality", 6).alias("quality")
        )

    return dict(entrymod.queries(), minhash_near_dups=bench_minhash,
                simhash=bench_simhash, corpus_canonical_docs=bench_corpus_docs)


def _run_crawl_loop(spark, entrymod):
    """Crawl throughput: the north metric — URLs scheduled (popped)/sec
    over the full superstep loop on the events-derived web.

    Best of 2 runs: this sandbox VM shows ~8% historical CPU steal and
    2x run-to-run swings on the latency-bound loop (measured identical-
    code samples 28-60 URLs/s); min wall time is the honest signal."""
    import tempfile

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    web, seeds = entrymod._derived_web(spark, SF_DIR, n_events=5000)
    web = web.persist()
    web.count()
    seeds = [r["url"] for r in web.orderBy("url").limit(10).collect()]

    crawl_sec, res = None, None
    for _ in range(2):
        t0 = time.time()
        eng = CrawlEngine(
            spark,
            web,
            policy=CrawlPolicy(max_depth=None, max_retry=1, obey_robots=False,
                               per_host_batch_cap=100_000),
            workdir=tempfile.mkdtemp(prefix="bench_crawl_"),
            max_pops=3000,
            metrics_level=0,
        )
        r = eng.run(seeds)
        r.emitted.count()
        sec = round(time.time() - t0, 3)
        if crawl_sec is None or sec < crawl_sec:
            crawl_sec, res = sec, r
    web.unpersist()
    return crawl_sec, res


def _run_suite(spark, names):
    """Time each named query in this JVM; returns (timings, crawl stats)."""
    import __spark_entry__ as entrymod

    qs = _bench_queries()
    timings: dict[str, float] = {}
    crawl = {}
    for name in names:
        if name == "crawl_loop":
            continue  # measured last, below
        t0 = time.time()
        df = qs[name](spark, SF_DIR)
        df.count()
        timings[name] = round(time.time() - t0, 3)
    if "crawl_loop" in names:
        crawl_sec, res = _run_crawl_loop(spark, entrymod)
        timings["crawl_loop"] = crawl_sec
        crawl = {
            "crawl_pops": res.pops,
            "crawl_steps": res.steps,
            "crawl_urls_per_sec": round(res.pops / crawl_sec, 1),
        }
    return timings, crawl


def _isolated_shared_run() -> dict:
    """Re-run the r3-shared set in a FRESH subprocess JVM (the conditions
    r3 measured under) and return its parsed JSON, or an error stub."""
    import subprocess

    env = dict(os.environ, SPARK_GRAFT_BENCH_SUBSET=",".join(R3_SHARED))
    try:
        out = subprocess.run(
            [sys.executable, os.path.abspath(__file__)],
            env=env, capture_output=True, text=True, timeout=1800,
        )
        line = [l for l in out.stdout.splitlines() if l.startswith("{")][-1]
        return json.loads(line)
    except Exception as exc:  # bench must still emit its own line
        return {"error": repr(exc)}


def main() -> None:
    import __spark_entry__ as entrymod
    from crawler_spark.session import get_spark

    # the isolated shared-set rerun happens FIRST, before this process
    # starts its own JVM, so the two runs never contend for cores
    iso = None
    if not SUBSET:
        iso = _isolated_shared_run()

    spark = get_spark(
        app_name="crawler-spark-bench",
        master=f"local[{CPUS}]",
        shuffle_partitions=CPUS,
    )
    spark.sparkContext.setLogLevel("ERROR")

    names = SUBSET.split(",") if SUBSET else BENCH_NAMES
    timings, crawl = _run_suite(spark, names)

    out = {
        "metric": "headline-suite wall seconds (crawl loop + operator suite)",
        "value": round(sum(timings.values()), 3),
        "unit": "sec",
        "queries": timings,
        "sf": _sf_from_dir(SF_DIR),
        "cpus": CPUS,
        **crawl,
    }
    if SUBSET:
        out["subset"] = True
        print(json.dumps(out))
        return

    # approximation-quality artifacts (VERDICT r2 item 10): recall of the
    # approximate similarity operators vs their exact faces, recorded per
    # round so quality drift is visible, not just pass/fail
    out["recall"] = _recall_metrics(spark)

    # VERDICT r4 item 2: both readings of the r3-shared set — isolated
    # fresh-JVM walls vs the same queries inside the full-suite JVM —
    # so suite-growth contention is measurable, not conjectured
    if iso is not None and "queries" in iso:
        shared_in_suite = round(
            sum(timings.get(n, 0.0) for n in R3_SHARED), 3
        )
        out["shared_isolated"] = iso["queries"]
        out["shared_isolated_total"] = iso.get("value")
        out["shared_in_suite_total"] = shared_in_suite
        for k in ("crawl_pops", "crawl_steps", "crawl_urls_per_sec"):
            if k in iso:
                out[f"isolated_{k}"] = iso[k]
    elif iso is not None:
        out["shared_isolated_error"] = iso.get("error")

    # VERDICT r4 item 8: per-entry wall budget report
    out["wall_budget_sec"] = WALL_BUDGET_SEC
    out["over_budget"] = sorted(
        [n for n, s in timings.items() if s > WALL_BUDGET_SEC]
    )

    print(json.dumps(out))


def _recall_metrics(spark) -> dict:
    """SRP near-dup recall (planted corpus, exact-precision by
    construction) + ANN recall@10 of the SRP-bucketed and IVF paths vs
    brute-force cosine on the benchmark embeddings table."""
    import numpy as np

    from crawler_spark.operators.dedup import embedding_near_dups
    from crawler_spark.operators.similarity import (
        ann_topk_srp, cosine_topk, ivf_topk, srp_candidates,
    )

    rng = np.random.default_rng(7)
    base = rng.normal(size=(100, 64))
    base /= np.linalg.norm(base, axis=1, keepdims=True)
    rows = [(f"b{i:03d}", [float(x) for x in base[i]]) for i in range(100)]
    for i in range(30):
        v2 = base[i] + 0.03 * rng.normal(size=64)
        v2 /= np.linalg.norm(v2)
        rows.append((f"d{i:03d}", [float(x) for x in v2]))
    M = np.array([r[1] for r in rows])
    M /= np.linalg.norm(M, axis=1, keepdims=True)
    S = M @ M.T
    ids = [r[0] for r in rows]
    truth = {
        (ids[i], ids[j])
        for i in range(len(ids))
        for j in range(i + 1, len(ids))
        if S[i, j] >= 0.95
    }
    emb = spark.createDataFrame(rows, "id string, embedding array<double>")
    found = {
        tuple(sorted((r["id_a"], r["id_b"])))
        for r in embedding_near_dups(emb, "id", "embedding", threshold=0.95).collect()
    }
    srp_neardup = round(len(found & truth) / max(1, len(truth)), 4)

    bench_emb = spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))
    n_corpus = bench_emb.count()
    q = list(bench_emb.orderBy("vec_id").first()["embedding"])
    exact = [r["id"] for r in cosine_topk(bench_emb, "vec_id", "embedding", q, 10).collect()]
    # DEFAULT path (auto-derived ntables/nprobe = bits, i.e. 8/8): the
    # headline number — a bare ann_topk_srp call must clear 0.8
    # recall@10 at ≤~25% candidate fraction on this uniform
    # (LSH-adversarial) corpus
    srp_def = [
        r["id"] for r in ann_topk_srp(bench_emb, "vec_id", "embedding", q, 10).collect()
    ]
    n_cand = srp_candidates(bench_emb, "vec_id", "embedding", q).count()
    # explicit cheap single-table point kept for comparison (the old
    # default — a recall lottery on uniform data)
    srp1 = [
        r["id"]
        for r in ann_topk_srp(
            bench_emb, "vec_id", "embedding", q, 10, nprobe=1, ntables=1
        ).collect()
    ]
    ivf = [r["id"] for r in ivf_topk(bench_emb, "vec_id", "embedding", q, 10).collect()]

    # r5: the Hamming-ranked signature prefilter (the production ANN
    # default on low-similarity corpora — VERDICT r4 item 3).  Recorded
    # as a fraction-vs-recall CURVE averaged over several queries (one
    # query is a recall lottery), plus the default operating point.
    from crawler_spark.operators.similarity import ann_hamming_topk, hamming_candidates

    qrows = bench_emb.orderBy("vec_id").limit(6).collect()
    queries = [list(r["embedding"]) for r in qrows]
    exact_sets = [
        {r["id"] for r in cosine_topk(bench_emb, "vec_id", "embedding", qv, 10).collect()}
        for qv in queries
    ]
    curve = {}
    for frac in (0.01, 0.02, 0.05):
        recs, fracs = [], []
        for qv, ex in zip(queries, exact_sets):
            got = {
                r["id"]
                for r in ann_hamming_topk(
                    bench_emb, "vec_id", "embedding", qv, 10,
                    frac=frac, corpus_size=n_corpus,
                ).collect()
            }
            nc = hamming_candidates(
                bench_emb, "vec_id", "embedding", qv,
                frac=frac, corpus_size=n_corpus,
            ).count()
            recs.append(len(got & ex) / 10)
            fracs.append(nc / max(1, n_corpus))
        curve[str(frac)] = {
            "recall@10": round(sum(recs) / len(recs), 3),
            "candidate_fraction": round(sum(fracs) / len(fracs), 4),
        }

    return {
        "srp_neardup_recall@0.95": srp_neardup,
        "ann_srp_recall@10": round(len(set(srp_def) & set(exact)) / 10, 2),
        "ann_srp_candidate_fraction": round(n_cand / max(1, n_corpus), 4),
        "ann_srp_1table_recall@10": round(len(set(srp1) & set(exact)) / 10, 2),
        "ann_ivf_recall@10": round(len(set(ivf) & set(exact)) / 10, 2),
        "ann_hamming_recall@10": curve["0.02"]["recall@10"],
        "ann_hamming_candidate_fraction": curve["0.02"]["candidate_fraction"],
        "ann_hamming_curve": curve,
    }


if __name__ == "__main__":
    main()
