"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

Each query is the testdata-phrased face of an engine operator from
SURVEY.md §2 (crawl kernel) or the training-pipeline operator set
(dedup / similarity / text analysis); the crawl semantics themselves are
golden-tested against the serial oracle in tests/test_crawl_e2e.py.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F


def _t(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


# ===================================================================== #
# crawl kernel operators phrased over the events/TPC-H tables
# (events.user_id plays "host", ts plays next_ts, value plays score)
# ===================================================================== #

def q_frontier_topk(spark, sf_dir):
    """Q2/Q3 — the frontier total order (next asc, score desc, seq asc),
    earliest-k pop batch. Plans as TakeOrderedAndProject (no full sort)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.orderBy(F.col("ts").asc(), F.col("value").desc(), F.col("event_id").asc())
        .select("event_id", F.date_format("ts", "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("ts_s"), "value")
        .limit(100)
    )


def q_politeness_budget(spark, sf_dir):
    """Q5 step 4 — per-host rank window: row_number per host in frontier
    order, admit ≤ budget (2) per tick."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return (
        ev.withColumn("rn", F.row_number().over(w))
        .where(F.col("rn") <= 2)
        .select(F.col("user_id").alias("host"), "event_id", "rn")
    )


def q_token_bucket(spark, sf_dir):
    """Q7 — per-host token-bucket reservation (reference
    ratelimit/rate.go:50-74, x/time/rate semantics): events are the
    request stream (user_id = host), each host's limit derived
    deterministically from its id; outputs Reservation.Delay +
    timeToAct per request. Oracle: the identical integer credit-ms
    recurrence as a DuckDB recursive CTE."""
    from crawler_spark.operators.ratelimit import token_bucket_reserve

    ev = _t(spark, sf_dir, "events")
    reqs = ev.select(
        F.col("user_id").alias("host"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("arrival_ms"),
        F.col("event_id").alias("seq"),
        (F.lit(200) + (F.col("user_id") % 7) * 150).cast("long").alias("interval_ms"),
        (F.lit(1) + (F.col("user_id") % 4)).cast("int").alias("burst"),
    )
    return token_bucket_reserve(reqs).select(
        "host", F.col("seq").alias("event_id"), "wait_ms", "reserve_at_ms"
    )


def q_max_hosts_admission(spark, sf_dir):
    """C10 — MaxHosts backpressure (reference ratelimitq/queue.go:
    184-191): only the first K hosts by earliest queued item are
    schedulable; later hosts defer. events = the frontier (user_id =
    host, event_id = seq); admit rows of the first 10 hosts."""
    from crawler_spark.operators.selection import admit_hosts

    ev = _t(spark, sf_dir, "events").select(
        F.col("user_id").alias("host_key"), F.col("event_id").alias("seq")
    )
    return admit_hosts(ev, 10).select(
        F.col("host_key").alias("host"), F.col("seq").alias("event_id")
    )


def q_seen_antijoin(spark, sf_dir):
    """L7/M1 — the URL-seen dedupe: anti-join the 'discovered' stream
    against the 'seen' set, count survivors per class."""
    ev = _t(spark, sf_dir, "events")
    cust = _t(spark, sf_dir, "customer")
    seen = cust.where(F.col("c_custkey") < 75).select(F.col("c_custkey").alias("user_id"))
    return (
        ev.join(seen, "user_id", "left_anti")
        .groupBy("event_type")
        .agg(F.count("*").alias("n_unseen"))
    )


def q_first_writer_wins(spark, sf_dir):
    """L7 PutNX — first writer (min seq) claims the key within a batch."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy("user_id", "event_type").agg(
        F.min("event_id").alias("first_event_id"), F.count("*").alias("n_events")
    )


def q_retry_taxonomy(spark, sf_dir):
    """C5 — status classification (2xx ok; 5xx & 4xx-except-404 retry;
    else drop) mapped onto event classes."""
    ev = _t(spark, sf_dir, "events")
    outcome = (
        F.when(F.col("event_type").isin("click", "view", "purchase"), F.lit("ok"))
        .when((F.col("event_type") == "error") & (F.col("value") < 100.0), F.lit("retry"))
        .otherwise(F.lit("drop"))
    )
    return (
        ev.select(outcome.alias("outcome"))
        .groupBy("outcome")
        .agg(F.count("*").alias("n"))
    )


def q_host_metrics(spark, sf_dir):
    """C8 — per-host crawl metrics: counts + first/last + mean score."""
    ev = _t(spark, sf_dir, "events")
    return ev.groupBy(F.col("user_id").alias("host")).agg(
        F.count("*").alias("n_fetch"),
        F.date_format(F.min("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("first_ts"),
        F.date_format(F.max("ts"), "yyyy-MM-dd HH:mm:ss.SSSSSS").alias("last_ts"),
        F.round(F.sum("value") / F.count("*"), 6).alias("mean_value"),
    )


def q_recovery_scan(spark, sf_dir):
    """S3 — recovery source: stream all non-Done rows from the store
    (orders with open status) grouped for verification."""
    od = _t(spark, sf_dir, "orders")
    return (
        od.where(F.col("o_orderstatus") != "F")
        .groupBy("o_orderstatus")
        .agg(F.count("*").alias("n_open"), F.round(F.sum("o_totalprice"), 4).alias("open_value"))
    )


def q_emit_order(spark, sf_dir):
    """Q2 — global crawl-order ordinal assignment over an emitted batch."""
    ev = _t(spark, sf_dir, "events")
    batch = ev.orderBy(F.col("ts").asc(), F.col("event_id").asc()).limit(500)
    w = Window.orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return batch.withColumn("emit_ord", F.row_number().over(w) - 1).select(
        "emit_ord", "event_id", F.col("user_id").alias("host")
    )


def q_sessionize(spark, sf_dir):
    """Per-host gap sessionization (30-min idle gap) — the host_state
    last-fetch bookkeeping pattern as an analytics op."""
    ev = _t(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    prev = F.lag(F.col("ts")).over(w)
    # ts is TIMESTAMP_NTZ from parquet; cast for epoch arithmetic (UTC session)
    us = lambda c: F.unix_micros(c.cast("timestamp"))
    new_sess = F.when(
        prev.isNull() | ((us(F.col("ts")) - us(prev)) > 1800 * 1_000_000), 1
    ).otherwise(0)
    return (
        ev.withColumn("ns", new_sess)
        .groupBy("user_id")
        .agg(F.sum("ns").alias("n_sessions"), F.count("*").alias("n_events"))
    )


def q_hourly_rollup(spark, sf_dir):
    """Time-bucketed rollup (the metrics-table tick aggregation)."""
    ev = _t(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.date_format(F.date_trunc("hour", "ts"), "yyyy-MM-dd HH:mm:ss").alias("hour"),
            "event_type",
        )
        .agg(F.count("*").alias("n"), F.round(F.sum("value"), 4).alias("sum_value"))
    )


# ===================================================================== #
# classic relational coverage (joins / aggregation / top-k)
# ===================================================================== #

def q_lineitem_rollup(spark, sf_dir):
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit("1998-09-02"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("sum_disc_price"),
            F.round(F.sum("l_quantity") / F.count("*"), 6).alias("avg_qty"),
            F.count("*").alias("count_order"),
        )
    )


def q_top_revenue(spark, sf_dir):
    cust = _t(spark, sf_dir, "customer")
    od = _t(spark, sf_dir, "orders")
    li = _t(spark, sf_dir, "lineitem")
    return (
        li.join(od, li.l_orderkey == od.o_orderkey)
        .join(F.broadcast(cust.where(F.col("c_mktsegment") == "BUILDING")), od.o_custkey == F.col("c_custkey"))
        .groupBy("l_orderkey")
        .agg(F.round(F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4).alias("revenue"))
        .orderBy(F.col("revenue").desc(), F.col("l_orderkey").asc())
        .limit(10)
    )


def q_region_rollup(spark, sf_dir):
    sup = _t(spark, sf_dir, "supplier")
    nat = _t(spark, sf_dir, "nation")
    reg = _t(spark, sf_dir, "region")
    return (
        sup.join(F.broadcast(nat), sup.s_nationkey == nat.n_nationkey)
        .join(F.broadcast(reg), nat.n_regionkey == reg.r_regionkey)
        .groupBy(F.col("r_name").alias("region"))
        .agg(F.count("*").alias("n_suppliers"), F.round(F.sum("s_acctbal"), 4).alias("total_bal"))
    )


# ===================================================================== #
# URL canonicalization (U2) — UDF vs analytically-derived expectation
# ===================================================================== #

def q_url_canonicalize(spark, sf_dir):
    """Runs the real canonicalize UDF on messy synthetic URLs; the oracle
    states the expected output analytically (independent derivation)."""
    from crawler_spark.functions.urlnorm import canonicalize_udf

    cust = _t(spark, sf_dir, "customer")
    messy = F.concat(
        F.lit("HTTP://Cust"), F.col("c_custkey").cast("string"),
        F.lit(".Example.COM:80/a/./b/../c"), F.lit("#frag"),
    )
    return (
        cust.select("c_custkey", canonicalize_udf(messy).alias("c"))
        .select("c_custkey", F.col("c.url").alias("url_norm"), F.col("c.host_key").alias("host"))
    )


def q_download_path(spark, sf_dir):
    """S6 Downloader sink-path derivation (reference download/download.go:
    44-60): synthetic URLs cover all four genPath branches (trailing slash,
    extensioned file, extension-less element, query re-encode); the oracle
    derives the expected host/path.../index.html analytically."""
    from crawler_spark.operators.download import with_download_path

    cust = _t(spark, sf_dir, "customer")
    k = F.col("c_custkey").cast("string")
    m = F.col("c_custkey") % 4
    url = F.concat(
        F.lit("http://h"), k, F.lit(".test"),
        F.when(m == 0, F.lit("/a/"))
        .when(m == 1, F.concat(F.lit("/p"), k, F.lit(".html")))
        .when(m == 2, F.concat(F.lit("/dir/f"), k))
        .otherwise(F.concat(F.lit("/s?b=2&a="), k)),
    )
    return (
        with_download_path(cust.select("c_custkey", url.alias("url")))
        .select("c_custkey", "file_path")
    )


# ===================================================================== #
# corpus pipeline: dedup / text analysis / similarity
# ===================================================================== #

def q_dedup_exact(spark, sf_dir):
    from crawler_spark.operators.dedup import exact_dedup

    return exact_dedup(_t(spark, sf_dir, "documents"), "doc_id", "text")


def q_doc_fingerprint(spark, sf_dir):
    from crawler_spark.functions.text import fingerprint_md5

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", fingerprint_md5(F.col("text")).alias("fp"))


def q_dedup_groups(spark, sf_dir):
    """Connected components over a near-dup pair graph — the transitive
    closure that turns pair-finders (minhash/simhash/phash) into "keep
    one copy per cluster". Min-label propagation + pointer doubling,
    O(log diameter) rounds (operators/components.py). The pair graph is
    derived arithmetically from events so the DuckDB oracle can rebuild
    the identical graph and close it with a recursive CTE: nodes
    event_id % 4000 in blocks of 40, one edge per event with
    event_id % 7 = 0 — sparse enough that blocks fragment into
    non-trivial multi-node components."""
    from crawler_spark.operators.components import connected_components

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") % 7 == 0)
    u = (F.col("event_id") % 4000).cast("long")
    v = (u - (u % 40) + (F.col("event_id") * 7919) % 40).cast("long")
    pairs = ev.select(u.alias("id_a"), v.alias("id_b")).where(u != v)
    return connected_components(pairs)


def q_text_stats(spark, sf_dir):
    from crawler_spark.functions.text import alpha_ratio, punct_ratio, token_count

    d = _t(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        token_count(F.col("text")).alias("n_tokens"),
        F.length("text").alias("n_chars_calc"),
        F.round(punct_ratio(F.col("text")), 6).alias("punct_ratio"),
        F.round(alpha_ratio(F.col("text")), 6).alias("alpha_ratio"),
    )


def q_lang_id(spark, sf_dir):
    from crawler_spark.functions.text import lang_guess

    d = _t(spark, sf_dir, "documents")
    return d.select("doc_id", lang_guess(F.col("text")).alias("lang_guess"))


def q_token_stats_by_lang(spark, sf_dir):
    from crawler_spark.functions.text import token_count

    d = _t(spark, sf_dir, "documents")
    return d.groupBy("lang").agg(
        F.count("*").alias("n_docs"),
        F.sum(token_count(F.col("text"))).alias("total_tokens"),
        F.round(F.sum(F.length("text")) / F.count("*"), 6).alias("mean_chars"),
    )


def q_quality_filter(spark, sf_dir):
    from crawler_spark.functions.text import quality_score

    d = _t(spark, sf_dir, "documents")
    return (
        d.select("doc_id", F.round(quality_score(F.col("text")), 6).alias("quality"))
        .where(F.col("quality") >= 0.5)
    )


def q_ngram_jaccard(spark, sf_dir):
    from crawler_spark.operators.dedup import ngram_jaccard_pairs

    d = _t(spark, sf_dir, "documents")
    # max_shingle_freq mirrors the oracle SQL's df_ <= 1000 cap: ultra-
    # common shingles dominate join fan-out and carry no discrimination
    p = ngram_jaccard_pairs(d, "doc_id", "text", shingle_n=3, threshold=0.8,
                            max_shingle_freq=1000)
    return p.select("id_a", "id_b", F.round("jaccard", 6).alias("jaccard"))


def q_minhash_near_dups(spark, sf_dir):
    """MinHash+LSH near-dup with the md5 hash family (SQL-expressible so
    the DuckDB oracle recomputes signatures/bands/est-Jaccard exactly;
    production uses the xxhash64 family — same algorithm)."""
    from crawler_spark.operators.dedup import minhash_near_dups

    d = _t(spark, sf_dir, "documents")
    return minhash_near_dups(d, "doc_id", "text", threshold=0.6,
                             feature_hash="md5").select(
        "id_a", "id_b", F.round("est_jaccard", 6).alias("est_jaccard")
    )


def q_simhash(spark, sf_dir):
    """SimHash fingerprints with the md5-derived 64-bit feature hash
    (bit-for-bit recomputable by the DuckDB oracle; production uses
    xxhash64 — same voting semantics, fingerprint.go:12-115)."""
    from crawler_spark.operators.dedup import simhash

    d = _t(spark, sf_dir, "documents")
    return simhash(d, "doc_id", "text", feature_hash="md5").select(
        F.col("id").alias("doc_id"), "simhash")


def q_ann_cosine_topk(spark, sf_dir):
    from crawler_spark.operators.similarity import cosine_topk

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").select("embedding").first()
    res = cosine_topk(emb, "vec_id", "embedding", list(qrow["embedding"]), 10)
    return res.select(F.col("id").alias("vec_id"), F.round("score", 4).alias("score"))


def q_ann_srp_topk(spark, sf_dir):
    """SRP-LSH bucketed ANN with md5-parity hyperplanes (sign-equivalent
    blocking the DuckDB oracle recomputes; production uses xxhash64)."""
    from crawler_spark.operators.similarity import ann_topk_srp

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").select("embedding").first()
    # ntables/nprobe pinned to 1/1: the oracle recomputes exactly ONE
    # md5-parity table in SQL (the operator's production default is the
    # auto-derived 8/8 OR-construction — similarity.ann_topk_srp)
    res = ann_topk_srp(emb, "vec_id", "embedding", list(qrow["embedding"]), 10,
                       bits=6, bucket_hash="md5", nprobe=1, ntables=1)
    return res.select(F.col("id").alias("vec_id"), F.round("score", 4).alias("score"))


def q_ann_hamming_topk(spark, sf_dir):
    """Hamming-ranked signature ANN (similarity.ann_hamming_topk — the
    wide-signature prefilter + exact rerank that replaces bucket-OR SRP
    as the production default on low-similarity corpora). At this
    operating point (1024 bits, top-10% rerank) the candidate set
    provably-by-measurement contains the true top-10 on this table, so
    the oracle is the exact brute-force cosine SQL; the sub-exact
    operating points are graded by the bench recall curve instead."""
    from crawler_spark.operators.similarity import ann_hamming_topk

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").select("embedding").first()
    res = ann_hamming_topk(
        emb, "vec_id", "embedding", list(qrow["embedding"]), 10,
        bits=1024, frac=0.1,
    )
    return res.select(F.col("id").alias("vec_id"), F.round("score", 4).alias("score"))


def q_ann_ivf_topk(spark, sf_dir):
    """IVF approximate top-k (deterministic mini-k-means index; probes
    nprobe nearest cells — the partition-pruning scale path)."""
    from crawler_spark.operators.similarity import ivf_topk

    emb = _t(spark, sf_dir, "embeddings")
    qrow = emb.orderBy("vec_id").select("embedding").first()
    res = ivf_topk(emb, "vec_id", "embedding", list(qrow["embedding"]), 10,
                   n_centroids=8, nprobe=4)
    return res.select(F.col("id").alias("vec_id"), F.round("score", 4).alias("score"))


def q_ann_ivf_append(spark, sf_dir):
    """IVF incremental append (similarity.ivf_append_index) — the ANN
    analog of the O(delta) index folds: train+build on the base slice
    (vec_id % 5 != 0), fold the delta slice in against the FROZEN
    centroids (no retrain, no base scan), then run the partition-pruned
    query over the merged index. The oracle re-trains the deterministic
    mini-k-means on the base slice in SQL, assigns ALL vectors to the
    frozen centroids, and probes the same cells — append must be
    invisible in the result."""
    import shutil
    import tempfile

    from crawler_spark.operators.similarity import (
        ivf_append_index,
        ivf_build_index,
        ivf_query_index,
    )

    emb = _t(spark, sf_dir, "embeddings")
    base = emb.where(F.col("vec_id") % 5 != 0)
    delta = emb.where(F.col("vec_id") % 5 == 0)
    qrow = emb.orderBy("vec_id").select("embedding").first()
    path = tempfile.mkdtemp(prefix="ivf_append_")
    try:
        ivf_build_index(base, "vec_id", "embedding", path, n_centroids=8)
        ivf_append_index(delta, "vec_id", "embedding", path)
        res = ivf_query_index(spark, path, list(qrow["embedding"]), 10, nprobe=4)
        out = res.select(
            F.col("id").alias("vec_id"), F.round("score", 4).alias("score")
        ).localCheckpoint()
    finally:
        shutil.rmtree(path, ignore_errors=True)
    return out


def q_embedding_dup_pairs(spark, sf_dir):
    """Exact brute-force cosine≥τ pairs (the oracle-checkable face of the
    SRP-bucketed near-dup operator)."""
    from crawler_spark.operators.similarity import dot, unit_norm

    emb = _t(spark, sf_dir, "embeddings")
    e = emb.select(F.col("vec_id").alias("id"), unit_norm(F.col("embedding")).alias("v"))
    a = e.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = e.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    return (
        a.crossJoin(b)
        .where(F.col("id_a") < F.col("id_b"))
        .select("id_a", "id_b", dot(F.col("v_a"), F.col("v_b")).alias("cosine"))
        .where(F.col("cosine") >= 0.35)
        .select("id_a", "id_b", F.round("cosine", 4).alias("cosine"))
    )


def q_mm_payload_stats(spark, sf_dir):
    """Multimodal plumbing: opaque binary payload column + typed metadata
    (here the payload is the utf-8 encoding of text — the schema shape of
    the image/caption table of BASELINE.json.input_hint)."""
    d = _t(spark, sf_dir, "documents")
    payload = F.encode(F.col("text"), "utf-8")
    return d.select(
        "doc_id",
        F.octet_length(payload).alias("n_bytes"),
        (F.octet_length(payload) - F.length("text")).alias("n_multibyte_extra"),
    )


def q_payload_fmt_rollup(spark, sf_dir):
    """Multimodal metadata rollup (payload_size_stats): per-format
    count/bytes/geometry over a payload table synthesized from documents
    — metadata-only, the byte column never reaches Python."""
    from crawler_spark.operators.multimodal import payload_size_stats

    d = _t(spark, sf_dir, "documents")
    payload = d.select(
        F.col("doc_id").alias("image_id"),
        F.encode("text", "utf-8").alias("bytes"),
        (F.length("text") % 640 + 16).cast("int").alias("w"),
        (F.length("text") % 480 + 16).cast("int").alias("h"),
        F.element_at(
            F.array(F.lit("png"), F.lit("jpeg"), F.lit("webp")),
            (F.col("doc_id") % 3 + 1).cast("int"),
        ).alias("fmt"),
        F.col("text").alias("caption"),
        F.lit(0).cast("long").alias("phash"),
    )
    return payload_size_stats(payload)


_PAYLOAD_FMT_SQL = """
WITH p AS (
  SELECT doc_id,
    octet_length(encode(text)) AS nb,
    CAST(length(text) % 640 + 16 AS INT) AS w,
    ['png','jpeg','webp'][(doc_id % 3 + 1)::INT] AS fmt
  FROM documents
)
SELECT fmt, COUNT(*) AS n, CAST(SUM(nb) AS BIGINT) AS total_bytes,
  ROUND(SUM(nb) / COUNT(*), 2) AS mean_bytes,
  MIN(w) AS min_w, MAX(w) AS max_w
FROM p GROUP BY fmt
"""


def q_urltrie_census(spark, sf_dir):
    """L8 — crawl-trap guard census: per-(host, prefix) distinct-child
    fan-out over events-derived URLs, thresholded by depth."""
    from crawler_spark.operators.urltrie import trap_prefixes

    ev = _t(spark, sf_dir, "events")
    urls = ev.select(
        F.concat(
            F.lit("http://u"), F.col("user_id").cast("string"), F.lit(".events.test/"),
            F.col("event_type"), F.lit("/"), F.col("event_id").cast("string"),
        ).alias("url"),
        F.concat(F.lit("u"), F.col("user_id").cast("string"), F.lit(".events.test")).alias("host_key"),
    )
    return trap_prefixes(
        urls, "CASE WHEN depth = 1 THEN 6 ELSE 5 END", exact=True
    ).select("host", "depth", "prefix", "n_children")


def q_mux_config(spark, sf_dir):
    """L6 — nginx-style per-URL config lookup (mux/mux.go:39-118,173-238):
    exact > most-precise wildcard (terminal when registered ``^~``) >
    first regex > wildcard fallback, evaluated columnar for every config
    key at once (operators/mux.config_for_urls). The fixed pattern set
    below exercises all four search steps; the oracle compiles the same
    precedence into per-key CASE expressions (valid because the skip
    wildcard is more precise than every overlapping non-skip one)."""
    from crawler_spark.operators.mux import UrlMux

    mux = UrlMux()
    mux.allow("http://mux.test/*")
    mux.disallow("~ \\.php$")
    mux.disallow("= http://mux.test/about")
    mux.set_score("= http://mux.test/home", 900)
    mux.set_score("^~ http://mux.test/static/*", 10)
    mux.set_score("http://mux.test/blog/*", 300)
    mux.set_score("http://mux.test/*", 100)
    mux.set_score("~ \\.php$", 1)
    mux.set_freq("http://mux.test/blog/*", 3)
    mux.set_max_depth("http://mux.test/static/*", 2)
    mux.do_not_follow("~ \\.php$")
    mux.set_host_interval("http://mux.test/static/*", 500)

    ev = _t(spark, sf_dir, "events")
    eid = F.col("event_id").cast("string")
    path = (
        F.when(F.col("event_id") % 7 == 0, F.lit("/home"))
        .when(F.col("event_id") % 7 == 1, F.concat(F.lit("/static/img"), eid))
        .when(F.col("event_id") % 7 == 2, F.concat(F.lit("/blog/post"), eid))
        .when(F.col("event_id") % 7 == 3, F.concat(F.lit("/app/page"), eid, F.lit(".php")))
        .when(F.col("event_id") % 7 == 4, F.lit("/about"))
        .when(F.col("event_id") % 7 == 5, F.concat(F.lit("/blog/post"), eid, F.lit(".php")))
        .otherwise(F.concat(F.lit("/static/x"), eid, F.lit(".php")))
    )
    urls = ev.select("event_id", F.concat(F.lit("http://mux.test"), path).alias("url"))
    return mux.config_for_urls(urls, "url").select(
        "event_id", "url", "accept", "score", "freq",
        "follow_depth", "nofollow", "interval_ms",
    )


MUX_CONFIG_SQL = r"""
WITH u AS (
  SELECT event_id,
    'http://mux.test' || CASE event_id % 7
      WHEN 0 THEN '/home'
      WHEN 1 THEN '/static/img' || event_id
      WHEN 2 THEN '/blog/post' || event_id
      WHEN 3 THEN '/app/page' || event_id || '.php'
      WHEN 4 THEN '/about'
      WHEN 5 THEN '/blog/post' || event_id || '.php'
      ELSE '/static/x' || event_id || '.php'
    END AS url
  FROM events
)
SELECT event_id, url,
  CASE WHEN url = 'http://mux.test/about' THEN FALSE
       WHEN regexp_matches(url, '\.php$') THEN FALSE
       WHEN url LIKE 'http://mux.test/%' THEN TRUE
       ELSE FALSE END AS accept,
  CAST(CASE WHEN url = 'http://mux.test/home' THEN 900
       WHEN url LIKE 'http://mux.test/static/%' THEN 10
       WHEN regexp_matches(url, '\.php$') THEN 1
       WHEN url LIKE 'http://mux.test/blog/%' THEN 300
       WHEN url LIKE 'http://mux.test/%' THEN 100
       ELSE 0 END AS INTEGER) AS score,
  CAST(CASE WHEN url LIKE 'http://mux.test/blog/%' THEN 3 ELSE 1 END AS INTEGER) AS freq,
  CAST(CASE WHEN url LIKE 'http://mux.test/static/%' THEN 2 ELSE -1 END AS INTEGER) AS follow_depth,
  regexp_matches(url, '\.php$') AS nofollow,
  CAST(CASE WHEN url LIKE 'http://mux.test/static/%' THEN 500 ELSE 0 END AS BIGINT) AS interval_ms
FROM u
"""


def q_cache_route(spark, sf_dir):
    """S5 — RFC freshness routing (hit/revalidate/miss) over a cache
    table synthesized from orders."""
    from crawler_spark.operators.cache import cache_route_col

    NOW_MS = 883_612_800_000  # 1998-01-01 UTC
    od = _t(spark, sf_dir, "orders")
    c = od.select(
        "o_orderkey",
        F.unix_millis(F.col("o_orderdate").cast("timestamp")).alias("fetched_ms"),
        F.lit(0).cast("long").alias("age_ms"),
        F.when(F.col("o_orderstatus") == "O", F.lit(157_680_000_000).cast("long"))
        .otherwise(F.lit(0).cast("long")).alias("max_age_ms"),
        F.when(F.col("o_totalprice") > 200_000.0, F.lit("e")).alias("etag"),
        F.lit(None).cast("long").alias("last_modified_ms"),
        F.col("o_orderpriority").startswith("1").alias("need_validate"),
    )
    return c.withColumn("cache_route", cache_route_col(NOW_MS)).select(
        "o_orderkey", "cache_route"
    )


def q_cache_merge(spark, sf_dir):
    """S5 cache-store lifecycle (Set/Update/Remove + RFC 13.12 date
    guard, cache.go:176-264 + client.go:155-204) as a batch MERGE over a
    cache/results pair synthesized deterministically from orders."""
    from crawler_spark.operators.cache import cache_merge

    NOW = 900_000_000_000
    od = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    url = F.concat(F.lit("u"), k.cast("string"))
    cache = od.where(k % 3 != 0).select(
        url.alias("url"),
        (F.lit(800_000_000_000) + (k % 1000) * 1000).cast("long").alias("fetched_ms"),
        (F.lit(800_000_000_000) + (k % 1000) * 1000).cast("long").alias("date_ms"),
        F.lit(50_000).cast("long").alias("max_age_ms"),
        F.lit(0).cast("long").alias("age_ms"),
        F.when(k % 2 == 0, F.concat(F.lit("e"), k.cast("string"))).alias("etag"),
        F.lit(None).cast("long").alias("last_modified_ms"),
        F.lit(False).alias("need_validate"),
        (k % 500).cast("long").alias("body_bytes"),
    )
    route = (
        F.when(k % 3 == 0, F.lit("miss"))
        .when(k % 4 == 0, F.lit("hit"))
        .otherwise(F.lit("revalidate"))
    )
    results = od.select(
        url.alias("url"),
        route.alias("cache_route"),
        F.when(k % 5 == 0, F.lit(503))
        .when((route == "revalidate") & (k % 2 == 0), F.lit(304))
        .otherwise(F.lit(200))
        .cast("int")
        .alias("status"),
        (k % 7 != 0).alias("resp_cacheable"),
        (F.lit(800_000_000_000) + (k % 2000) * 750).cast("long").alias("resp_date_ms"),
        F.lit(60_000).cast("long").alias("resp_max_age_ms"),
        F.lit(0).cast("long").alias("resp_age_ms"),
        F.concat(F.lit("n"), k.cast("string")).alias("resp_etag"),
        F.lit(None).cast("long").alias("resp_last_modified_ms"),
        (k % 6 == 0).alias("resp_need_validate"),
        (k % 997).cast("long").alias("resp_body_bytes"),
    )
    return cache_merge(cache, results, NOW)


_CACHE_MERGE_SQL = """
WITH c AS (
  SELECT 'u' || o_orderkey AS url,
    CAST(800000000000 + (o_orderkey % 1000) * 1000 AS BIGINT) AS fetched_ms,
    CAST(800000000000 + (o_orderkey % 1000) * 1000 AS BIGINT) AS date_ms,
    CAST(50000 AS BIGINT) AS max_age_ms, CAST(0 AS BIGINT) AS age_ms,
    CASE WHEN o_orderkey % 2 = 0 THEN 'e' || o_orderkey END AS etag,
    CAST(NULL AS BIGINT) AS last_modified_ms, FALSE AS need_validate,
    CAST(o_orderkey % 500 AS BIGINT) AS body_bytes
  FROM orders WHERE o_orderkey % 3 <> 0
), r AS (
  SELECT 'u' || o_orderkey AS url,
    CASE WHEN o_orderkey % 3 = 0 THEN 'miss'
         WHEN o_orderkey % 4 = 0 THEN 'hit' ELSE 'revalidate' END AS cache_route,
    CASE WHEN o_orderkey % 5 = 0 THEN 503
         WHEN o_orderkey % 3 <> 0 AND o_orderkey % 4 <> 0 AND o_orderkey % 2 = 0 THEN 304
         ELSE 200 END AS status,
    (o_orderkey % 7 <> 0) AS resp_cacheable,
    CAST(800000000000 + (o_orderkey % 2000) * 750 AS BIGINT) AS resp_date_ms,
    CAST(60000 AS BIGINT) AS resp_max_age_ms, CAST(0 AS BIGINT) AS resp_age_ms,
    'n' || o_orderkey AS resp_etag, CAST(NULL AS BIGINT) AS resp_last_modified_ms,
    (o_orderkey % 6 = 0) AS resp_need_validate,
    CAST(o_orderkey % 997 AS BIGINT) AS resp_body_bytes
  FROM orders
), j AS (
  SELECT COALESCE(c.url, r.url) AS url, c.url AS curl,
    c.fetched_ms, c.date_ms, c.max_age_ms, c.age_ms, c.etag,
    c.last_modified_ms, c.need_validate, c.body_bytes,
    r.cache_route, r.status, COALESCE(r.resp_cacheable, FALSE) AS resp_cacheable,
    r.resp_date_ms, r.resp_max_age_ms, r.resp_age_ms, r.resp_etag,
    r.resp_last_modified_ms, r.resp_need_validate, r.resp_body_bytes
  FROM c FULL JOIN r ON c.url = r.url
), a AS (
  SELECT *,
    CASE
      WHEN cache_route IS NULL OR cache_route = 'hit' THEN 'old'
      WHEN cache_route = 'revalidate' AND status = 304 THEN
        CASE WHEN resp_date_ms < date_ms THEN 'old'
             WHEN NOT resp_cacheable THEN 'drop'
             ELSE 'upd' END
      WHEN status BETWEEN 200 AND 299 AND resp_cacheable THEN 'new'
      WHEN cache_route = 'revalidate' AND status BETWEEN 200 AND 299
           AND NOT resp_cacheable THEN 'drop'
      ELSE 'old' END AS action
  FROM j
)
SELECT url,
  CASE WHEN action = 'old' THEN fetched_ms ELSE 900000000000 END AS fetched_ms,
  CASE WHEN action = 'old' THEN date_ms ELSE resp_date_ms END AS date_ms,
  CASE WHEN action = 'old' THEN max_age_ms ELSE resp_max_age_ms END AS max_age_ms,
  CASE WHEN action = 'old' THEN age_ms ELSE resp_age_ms END AS age_ms,
  CASE WHEN action = 'old' THEN etag ELSE resp_etag END AS etag,
  CASE WHEN action = 'old' THEN last_modified_ms ELSE resp_last_modified_ms END AS last_modified_ms,
  CASE WHEN action = 'old' THEN need_validate ELSE resp_need_validate END AS need_validate,
  CASE WHEN action = 'new' THEN resp_body_bytes ELSE body_bytes END AS body_bytes
FROM a
WHERE action <> 'drop' AND NOT (action = 'old' AND curl IS NULL)
"""


def q_cache_evict(spark, sf_dir):
    """S5 size-bounded cache eviction (cache.go:202-208; deterministic
    newest-first refinement): keep the most recently fetched entries
    within a byte budget, ties by url."""
    from crawler_spark.operators.cache import evict_cache

    od = _t(spark, sf_dir, "orders")
    k = F.col("o_orderkey")
    cache = od.where(k % 3 != 0).select(
        F.concat(F.lit("u"), k.cast("string")).alias("url"),
        (F.lit(800_000_000_000) + (k % 1000) * 1000).cast("long").alias("fetched_ms"),
        (k % 500).cast("long").alias("body_bytes"),
    )
    return evict_cache(cache, 200_000).select("url", "fetched_ms", "body_bytes")


_CACHE_EVICT_SQL = """
WITH c AS (
  SELECT 'u' || o_orderkey AS url,
    CAST(800000000000 + (o_orderkey % 1000) * 1000 AS BIGINT) AS fetched_ms,
    CAST(o_orderkey % 500 AS BIGINT) AS body_bytes
  FROM orders WHERE o_orderkey % 3 <> 0
)
SELECT url, fetched_ms, body_bytes FROM (
  SELECT *, SUM(COALESCE(body_bytes, 0)) OVER (
    ORDER BY fetched_ms DESC, url ASC
    ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum
  FROM c
) WHERE cum <= 200000
"""


def q_host_budget_cancel(spark, sf_dir):
    """C6 — per-host fetch-budget cancellation (make.go:56-62,
    schedule.go:94-101; example controller cancels hosts past 500
    responses): within-batch rank follows emission order (emit_ms, prio,
    seq), pops past the budget are Prepare-cancelled."""
    from crawler_spark.plans.crawl import tag_cancelled

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 30_000)
    selected = ev.select(
        F.concat(F.lit("u"), (F.col("user_id") % 40).cast("string"), F.lit(".t")).alias("host_key"),
        F.col("event_id").alias("seq"),
        (F.col("event_id") % 97).cast("long").alias("emit_ms"),
        (F.col("event_id") % 11).cast("int").alias("prio"),
    )
    host_state = (
        ev.groupBy((F.col("user_id") % 40).alias("h"))
        .agg(F.count("*").alias("c"))
        .select(
            F.concat(F.lit("u"), F.col("h").cast("string"), F.lit(".t")).alias("host_key"),
            (F.col("c") % 7).cast("long").alias("n_resp"),
        )
    )
    return tag_cancelled(selected, host_state, 500).select(
        "host_key", "seq", "cancelled"
    )


_HOST_BUDGET_SQL = """
WITH sel AS (
  SELECT 'u' || (user_id % 40) || '.t' AS host_key,
    event_id AS seq,
    CAST(event_id % 97 AS BIGINT) AS emit_ms,
    CAST(event_id % 11 AS INT) AS prio
  FROM events WHERE event_id < 30000
), hs AS (
  SELECT 'u' || (user_id % 40) || '.t' AS host_key,
    CAST(COUNT(*) % 7 AS BIGINT) AS n_resp
  FROM events WHERE event_id < 30000 GROUP BY user_id % 40
)
SELECT s.host_key, s.seq,
  (COALESCE(h.n_resp, 0) + ROW_NUMBER() OVER (
     PARTITION BY s.host_key ORDER BY s.emit_ms, s.prio, s.seq)) > 500 AS cancelled
FROM sel s LEFT JOIN hs h ON s.host_key = h.host_key
"""


# ===================================================================== #
# the crawl engine itself, driven from testdata (rows-only check)
# ===================================================================== #

def _derived_web(spark, sf_dir, n_events: int = 2000):
    """Deterministic synthetic web derived from the events table:
    url = http://u<user_id>.events.test/e/<event_id>; two out-links per
    page via fixed arithmetic on event ids; error events are 5xx."""
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") < n_events)
        .select("event_id", "user_id", "event_type")
    )
    n = ev.agg(F.max("event_id")).first()[0] + 1
    url = F.concat(
        F.lit("http://u"), F.col("user_id").cast("string"),
        F.lit(".events.test/e/"), F.col("event_id").cast("string"),
    )
    tgt = ev.select(
        F.col("event_id").alias("t_id"),
        F.concat(
            F.lit("http://u"), F.col("user_id").cast("string"),
            F.lit(".events.test/e/"), F.col("event_id").cast("string"),
        ).alias("t_url"),
    )
    links = (
        ev.select(
            "event_id",
            F.explode(
                F.array(
                    (F.col("event_id") * 2 + 1) % n,
                    (F.col("event_id") * 3 + 7) % n,
                )
            ).alias("t_id"),
        )
        .join(tgt, "t_id")
        .groupBy("event_id")
        .agg(F.array_sort(F.collect_list("t_url")).alias("out_links"))
    )
    web = (
        ev.join(links, "event_id", "left")
        .select(
            url.alias("url"),
            F.concat(F.lit("u"), F.col("user_id").cast("string"), F.lit(".events.test")).alias("host_key"),
            F.when(F.col("event_type") == "error", 500).otherwise(200).alias("status"),
            F.coalesce("out_links", F.array().cast("array<string>")).alias("out_links"),
            F.lit(None).cast("string").alias("redirect_to"),
        )
    )
    seeds = [r["url"] for r in web.orderBy("url").limit(3).collect()]
    return web, seeds


def q_crawl_bfs(spark, sf_dir):
    """End-to-end frontier/scheduler run on the derived web (rows-only:
    the serial-oracle equivalence is asserted in tests/test_crawl_e2e)."""
    import tempfile

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    web, seeds = _derived_web(spark, sf_dir)
    policy = CrawlPolicy(max_depth=4, max_retry=1, obey_robots=False)
    eng = CrawlEngine(
        spark, web, policy=policy,
        workdir=tempfile.mkdtemp(prefix="crawl_entry_"),
        max_pops=60,
    )
    res = eng.run(seeds)
    return res.emitted.select("emit_ord", "url", "depth", "status", "outcome").orderBy("emit_ord")


def q_crawl_html(spark, sf_dir):
    """The whole-crawl entry in HTML MODE (VERDICT r3 #4): the same
    derived web as crawl_bfs, but pages carry rendered HTML BODIES and
    no pre-extracted links — the engine tokenizes each popped body with
    the real extractor (functions/extract) at fetch time, same-host
    hrefs rendered RELATIVE so resolution earns its keep. Links render
    in sorted-target order (the order _derived_web's arrays carry), so
    the DuckDB oracle is the same arithmetic BFS re-derivation as
    crawl_bfs — the SQL independently recomputes every link the parser
    must find."""
    import tempfile

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    web, seeds = _derived_web(spark, sf_dir)
    pre = F.concat(F.lit("http://"), F.col("host_key"), F.lit("/e/"))
    html = F.concat(
        F.lit("<html><head><title>t</title></head><body>"),
        F.array_join(
            F.transform(
                "out_links",
                lambda l: F.concat(
                    F.lit('<a href="'),
                    F.when(
                        l.startswith(pre),
                        l.substr(F.length(pre) + F.lit(1), F.length(l)),
                    ).otherwise(l),
                    F.lit('">x</a>'),
                ),
            ),
            "",
        ),
        F.lit("<script>var u='not a link';</script></body></html>"),
    )
    web_html = web.select("url", "host_key", "status", html.alias("html"), "redirect_to")
    policy = CrawlPolicy(max_depth=4, max_retry=1, obey_robots=False)
    eng = CrawlEngine(
        spark, web_html, policy=policy,
        workdir=tempfile.mkdtemp(prefix="crawl_html_entry_"),
        max_pops=60,
    )
    assert eng.html_mode
    res = eng.run(seeds)
    return res.emitted.select("emit_ord", "url", "depth", "status", "outcome").orderBy("emit_ord")


def q_crawl_live_dedup(spark, sf_dir):
    """Crawl × image — the graft cell composed end to end: the engine
    runs the same derived-web BFS as crawl_bfs while folding each step's
    fetched payloads into the in-loop incremental dedup index
    (CrawlEngine(payloads=...) → operators/incremental.LSMPhashIndex,
    O(step delta) per fold, compaction mid-run; reference analog: the
    BK-tree controller folding each NEW fingerprint into the existing
    tree, bktree.go:21-62). Output = near-dup cluster labels for every
    image the crawl fetched, components named by min event_id — graded
    against the oracle's INDEPENDENT re-derivation (arithmetic BFS +
    md5-family phash + recursive-CTE closure). Step batching, LSM
    frames, and compaction must all be invisible in the end state."""
    import tempfile

    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine

    web, seeds = _derived_web(spark, sf_dir)
    eid = F.regexp_extract("url", "/e/(\\d+)$", 1).cast("long")
    web_img = web.withColumn("image_id", eid.cast("string"))
    # payload table (input_hint shape, metadata cols elided): one image
    # per page, phash from the md5 family DuckDB recomputes independently
    payloads = web.select(eid.alias("doc_id")).select(
        F.col("doc_id").cast("string").alias("image_id"),
        F.expr(_phash_sql_expr("spark")).alias("phash"),
    )
    eng = CrawlEngine(
        spark, web_img,
        policy=CrawlPolicy(max_depth=4, max_retry=1, obey_robots=False),
        workdir=tempfile.mkdtemp(prefix="crawl_dedup_entry_"),
        max_pops=40,  # r5: 60→40 cuts the entry wall so the driver's
        # per-entry budget catches it (VERDICT r4 item 1); scale evidence
        # lives in tools/scale_rehearsal.py, not here
        payloads=payloads, dedup_radius=6, dedup_compact_folds=4,
        dedup_fold_every=6,  # end state is cadence-invariant (tested);
        # fewer folds keep the entry's wall down at sandbox scale
    )
    res = eng.run(seeds)
    crawled = (
        res.seen.where(F.col("num_visit") >= 1).select("url")
        .join(web_img.select("url", "image_id"), "url")
        .select("image_id").distinct()
        .join(payloads, "image_id")
    )
    lab = (
        crawled.select(F.col("image_id").cast("long").alias("eid"), "phash")
        .join(res.dedup_index, "phash")
        .where((F.col("gsz") >= 2) | F.col("has_edge"))
        .select("eid", "comp")
    )
    rep = lab.groupBy("comp").agg(F.min("eid").alias("component"))
    return (
        lab.join(F.broadcast(rep), "comp")
        .select(F.col("eid").alias("image_id"), "component")
        .orderBy("image_id")
    )


def _phash_sql_expr(dialect: str) -> str:
    """60-bit deterministic perceptual-hash stand-in, expressible in both
    Spark SQL and DuckDB so the oracle recomputes it independently:
    base = md5('pg' || group) hex digits packed 4 bits each (group =
    doc_id % 40); up to (doc_id % 4) planted bit-flips at md5-derived
    positions — every intra-group pair lands within Hamming 6, modelling
    the near-dup structure of the input_hint phash column."""
    if dialect == "spark":
        def hv(s):
            return f"CAST(conv({s}, 16, 10) AS BIGINT)"
        cast_s = "STRING"
        def xor(a, b):
            return f"({a} ^ {b})"
        def shl(a, n):
            return f"shiftleft({a}, CAST({n} AS INT))"
    else:
        def hv(s):
            return f"CAST(strpos('0123456789abcdef', {s}) - 1 AS BIGINT)"
        cast_s = "VARCHAR"
        def xor(a, b):
            return f"xor({a}, {b})"
        def shl(a, n):
            return f"({a} << ({n}))"
    mg = f"md5(concat('pg', CAST(doc_id % 40 AS {cast_s})))"
    base = " + ".join(
        f"{hv(f'substr({mg}, {d + 1}, 1)')} * {1 << (4 * d)}" for d in range(15)
    )
    mp = f"md5(concat('pp', CAST(doc_id AS {cast_s})))"

    def pos(j):
        return (
            f"(({hv(f'substr({mp}, {2 * j + 1}, 1)')} * 16 + "
            f"{hv(f'substr({mp}, {2 * j + 2}, 1)')}) % 60)"
        )

    terms = [
        f"(CASE WHEN doc_id % 4 > {j} THEN {shl('CAST(1 AS BIGINT)', pos(j))} "
        f"ELSE CAST(0 AS BIGINT) END)"
        for j in range(3)
    ]
    mask = "(" + " | ".join(terms) + ")"
    return xor(f"({base})", mask)


def q_phash_near_dups(spark, sf_dir):
    """M6/M7 on the image axis — perceptual-hash Hamming≤6 near-dup
    pairs via the pigeonhole-blocked join (multimodal.phash_near_dups →
    radius+1 disjoint bit-blocks → equi-join → bit_count filter; never
    all-pairs). The oracle recomputes the same phash in SQL and does the
    exact all-pairs check at sf scale."""
    from crawler_spark.operators.multimodal import phash_near_dups

    d = _t(spark, sf_dir, "documents")
    payload = d.select(
        F.col("doc_id").alias("image_id"),
        F.expr(_phash_sql_expr("spark")).alias("phash"),
    )
    return phash_near_dups(payload, radius=6)


def q_image_dup_groups(spark, sf_dir):
    """Image-axis dedup end-to-end: perceptual-hash Hamming≤6 pairs
    (pigeonhole-blocked join, never all-pairs) closed into clusters by
    connected components — the canonical-image-per-cluster table a
    training-data pipeline actually consumes. The oracle recomputes the
    phash in SQL, does the exact all-pairs check at sf scale, and
    closes the pair graph with a recursive CTE."""
    from crawler_spark.operators.components import grouped_labels
    from crawler_spark.operators.dedup import simhash_group_pairs

    d = _t(spark, sf_dir, "documents")
    sh = d.select(
        F.col("doc_id").alias("id"),
        F.expr(_phash_sql_expr("spark")).alias("simhash"),
    )
    # group-reduced consumption: the label loop runs over distinct
    # phash values + cross-hash edges; members (incl. equal-hash
    # cliques) attach by membership. Output is identical to
    # connected_components over the expanded member pairs (equality
    # pinned in tests/test_components.py); the labels are pinned
    # node-scale so the window-tag table releases before return.
    gpairs, mem, tagged = simhash_group_pairs(sh, radius=6)
    try:
        out = grouped_labels(gpairs, mem).localCheckpoint()
    finally:
        tagged.unpersist()
    return out.select(F.col("id").alias("image_id"), "component")


def q_incremental_dedup(spark, sf_dir):
    """Incremental corpus maintenance (operators/incremental.py) — the
    10^10 story made literal: a continuous crawl folds each fetched
    batch into a persisted hash-scale dedup index at O(delta) cost
    instead of re-clustering the world. The reference's BK-tree
    controller does the same serially (one fingerprint at a time into
    the existing tree, bktree.go:21-62); here the batch is
    pigeonhole-probed against the index map-side, new pairs contract
    onto component supernodes, and a delta-sized connected-components
    pass merges labels. The entry splits the corpus 2:1 by doc_id,
    builds the index on the base, folds the delta in incrementally,
    and emits member labels — which must hash-match the oracle's ONE-
    SHOT recursive-CTE closure over the whole corpus: the incremental
    path is only correct if batching is invisible in the end state."""
    from crawler_spark.operators.incremental import (
        member_labels,
        phash_index_build,
        phash_index_update,
    )
    from crawler_spark.state.ckpt import release_checkpoint

    d = _t(spark, sf_dir, "documents")
    images = d.select(
        F.col("doc_id").alias("image_id"),
        F.expr(_phash_sql_expr("spark")).alias("phash"),
    )
    base = images.where(F.col("image_id") % 3 != 0)
    delta = images.where(F.col("image_id") % 3 == 0)
    idx0 = phash_index_build(base, radius=6)
    idx1 = phash_index_update(idx0, delta, radius=6)
    release_checkpoint(idx0)
    return member_labels(images, idx1).select(
        F.col("id").alias("image_id"), "component"
    )


def _mm_quality_payload(d):
    """Deterministic image+caption payload (input_hint shape) derived
    from documents, with every quality-gate rule represented: small
    w/h (the +8 offsets), extreme aspect ratios (8×218 ≈ 27:1),
    low bytes-per-pixel (text bytes over large pixel counts), and a
    doc_id%11 slice of too-short captions."""
    return d.select(
        F.concat(F.lit("img"), F.col("doc_id").cast("string")).alias("image_id"),
        F.encode("text", "utf-8").alias("bytes"),
        ((F.col("doc_id") % 97) + 8).cast("int").alias("w"),
        ((F.col("doc_id") % 211) + 8).cast("int").alias("h"),
        F.lit("png").alias("fmt"),
        F.when(F.col("doc_id") % 11 == 0, F.lit("short"))
        .otherwise(
            F.concat(F.lit("caption for image "), F.col("doc_id").cast("string"))
        )
        .alias("caption"),
        F.lit(0).cast("long").alias("phash"),
    )


def q_image_quality(spark, sf_dir):
    """Image-axis corpus gate (multimodal.image_quality_filter):
    keep/reject verdicts from metadata alone — min dims, aspect ratio,
    bytes-per-pixel plausibility, caption length. Pure JVM column
    expressions (the byte column only reaches octet_length); the oracle
    re-derives every verdict with the same first-match CASE in SQL."""
    from crawler_spark.operators.multimodal import image_quality_filter

    d = _t(spark, sf_dir, "documents")
    return image_quality_filter(_mm_quality_payload(d))


_IMAGE_QUALITY_SQL = """
WITH p AS (
  SELECT 'img' || doc_id AS image_id,
         octet_length(encode(text)) AS n_bytes,
         CAST(doc_id % 97 + 8 AS INT) AS w,
         CAST(doc_id % 211 + 8 AS INT) AS h,
         CASE WHEN doc_id % 11 = 0 THEN 'short'
              ELSE 'caption for image ' || doc_id END AS caption
  FROM documents
)
SELECT image_id, w, h, CAST(n_bytes AS INT) AS n_bytes,
  CAST(length(trim(caption)) AS INT) AS caption_len,
  CAST(floor((n_bytes / (CAST(w AS BIGINT) * h)) * 10000) AS BIGINT) AS bpp_e4,
  CASE
    WHEN w IS NULL OR h IS NULL OR w <= 0 OR h <= 0 THEN 'bad_dims'
    WHEN w < 64 THEN 'too_narrow'
    WHEN h < 64 THEN 'too_short'
    WHEN CAST(greatest(w, h) AS DOUBLE) / CAST(least(w, h) AS DOUBLE) > 4.0
      THEN 'extreme_aspect'
    WHEN n_bytes / (CAST(w AS BIGINT) * h) < 0.05 THEN 'low_entropy'
    WHEN n_bytes / (CAST(w AS BIGINT) * h) > 20.0 THEN 'suspicious_size'
    WHEN length(trim(caption)) < 8 THEN 'caption_too_short'
    ELSE 'keep'
  END AS verdict
FROM p
"""


def q_caption_dedup_best(spark, sf_dir):
    """Caption-level exact dedup keeping the best copy
    (multimodal.caption_dedup_best): one partial-aggregated groupBy
    whose argmax is a min over a (−pixels, image_id) struct — no
    window, no secondary sort. doc_id%137 caption keys give ~3-4
    copies per caption; the oracle picks the same winner with a
    row_number window at sf scale."""
    from crawler_spark.operators.multimodal import caption_dedup_best

    d = _t(spark, sf_dir, "documents")
    payload = d.select(
        F.concat(F.lit("img"), F.col("doc_id").cast("string")).alias("image_id"),
        ((F.col("doc_id") % 97) + 8).cast("int").alias("w"),
        ((F.col("doc_id") % 211) + 8).cast("int").alias("h"),
        F.concat(F.lit("Cap "), (F.col("doc_id") % 137).cast("string")).alias("caption"),
    )
    return caption_dedup_best(payload)


_CAPTION_DEDUP_SQL = """
WITH p AS (
  SELECT lower(trim('Cap ' || (doc_id % 137))) AS caption_key,
         'img' || doc_id AS image_id,
         CAST(doc_id % 97 + 8 AS BIGINT) * (doc_id % 211 + 8) AS px
  FROM documents
), r AS (
  SELECT caption_key, image_id, px,
         row_number() OVER (PARTITION BY caption_key
                            ORDER BY px DESC, image_id) AS rn,
         count(*) OVER (PARTITION BY caption_key) AS n_copies
  FROM p
)
SELECT caption_key, n_copies, image_id AS keep_image_id, px AS keep_pixels
FROM r WHERE rn = 1
"""


def q_corpus_canonical(spark, sf_dir):
    """The end-to-end corpus pipeline (plans/corpus.py): payload →
    image_quality_filter → caption_dedup_best → phash Hamming≤6 pairs →
    connected components → canonical corpus. One composed entry — the
    face a training-data user actually runs; every stage is also
    oracle-checked standalone (image_quality, caption_dedup_best,
    phash_near_dups, image_dup_groups). The oracle re-derives the whole
    chain in SQL: the keep gate as a boolean conjunction (equivalent to
    the first-match CASE because 'keep' = no rule fired), the best-copy
    argmax as a window, the clustering as a recursive-CTE closure."""
    from crawler_spark.plans.corpus import canonical_image_corpus

    d = _t(spark, sf_dir, "documents")
    payload = d.select(
        F.col("doc_id").alias("image_id"),
        F.encode(
            F.expr("repeat('x', CAST(doc_id % 100 AS INT) * 100 + 100)"), "utf-8"
        ).alias("bytes"),
        ((F.col("doc_id") % 97) + 64).cast("int").alias("w"),
        ((F.col("doc_id") % 211) + 64).cast("int").alias("h"),
        F.lit("png").alias("fmt"),
        F.concat(F.lit("Caption "), (F.col("doc_id") % 137).cast("string")).alias("caption"),
        F.expr(_phash_sql_expr("spark")).alias("phash"),
    )
    return canonical_image_corpus(payload)


def _corpus_canonical_sql() -> str:
    return f"""
WITH RECURSIVE payload AS (
  SELECT doc_id AS image_id,
         CAST(doc_id % 100 AS INT) * 100 + 100 AS n_bytes,
         CAST(doc_id % 97 + 64 AS INT) AS w,
         CAST(doc_id % 211 + 64 AS INT) AS h,
         'Caption ' || (doc_id % 137) AS caption,
         {_phash_sql_expr('duck')} AS phash
  FROM documents
), keeps AS (
  SELECT * FROM payload
  WHERE w >= 64 AND h >= 64
    AND CAST(greatest(w, h) AS DOUBLE) / CAST(least(w, h) AS DOUBLE) <= 4.0
    AND n_bytes / (CAST(w AS BIGINT) * h) >= 0.05
    AND n_bytes / (CAST(w AS BIGINT) * h) <= 20.0
    AND length(trim(caption)) >= 8
), best AS (
  SELECT image_id FROM (
    SELECT image_id,
           row_number() OVER (PARTITION BY lower(trim(caption))
                              ORDER BY CAST(w AS BIGINT) * h DESC, image_id) AS rn
    FROM keeps) WHERE rn = 1
), kc AS (
  SELECT p.* FROM keeps p JOIN best USING (image_id)
), p2 AS (
  SELECT a.image_id AS u, b.image_id AS v FROM kc a JOIN kc b
  ON a.image_id < b.image_id AND bit_count(xor(a.phash, b.phash)) <= 6
), ed AS (
  SELECT u, v FROM p2 UNION SELECT v, u FROM p2
), r AS (
  SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed)
  UNION SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u
), comp AS (
  SELECT u AS id, min(m) AS component FROM r GROUP BY u
)
SELECT image_id, lower(trim(caption)) AS caption_key,
       CAST(w AS BIGINT) * h AS px
FROM kc
WHERE image_id NOT IN (SELECT id FROM comp WHERE id <> component)
"""


# robots_gate fixture: rule table exercising every RFC 9309 feature the
# production gate implements ('*' wildcards, terminal-'$' anchor,
# Allow-wins-ties, longest-match precedence, no-rules default-allow)
_ROBOTS_FIXTURE_RULES = {
    "a.test": [
        (False, "/private"),
        (True, "/private/pub"),
        (False, "/tmp*"),
        (False, "/exact$"),
        (False, "/a*b"),
    ],
    "b.test": [(False, "/")],
    "c.test": [(True, "/"), (False, "/x")],
}
_ROBOTS_FIXTURE_HOSTS = ["a.test", "b.test", "c.test", "d.test"]
_ROBOTS_FIXTURE_PATHS = [
    "/private/x", "/private/pub/y", "/tmp123", "/exact", "/exact/z",
    "/x/y", "/ok", "/", "/axxb/c", "/ab",
]


def q_corpus_canonical_docs(spark, sf_dir):
    """The end-to-end TEXT corpus pipeline (plans/corpus.
    canonical_text_corpus) — the document analog of `corpus_canonical`:
    docs → quality-score gate → MinHash+LSH near-dup pairs (md5 family
    so the oracle recomputes signatures exactly; group-reduced banding)
    → connected-component clustering → canonical corpus (min-id
    representative per cluster + unpaired survivors). Every stage is
    also oracle-checked standalone (quality_filter, minhash_near_dups,
    dedup_groups)."""
    from crawler_spark.plans.corpus import canonical_text_corpus

    d = _t(spark, sf_dir, "documents")
    # k=16 / 2-row bands: the composed face needs band recall, not a
    # fine-grained estimate; halves the (KB-scale md5-family) signature
    # width on both the Spark and oracle sides
    out = canonical_text_corpus(d, "doc_id", "text", feature_hash="md5",
                                k=16, bands=8, rows=2)
    return out.select("doc_id", F.round("quality", 6).alias("quality"))


def _corpus_canonical_docs_sql() -> str:
    """Quality gate (the _QUALITY_SQL formula, unrounded filter) →
    group-reduced minhash pair CTEs over the gated docs → recursive-CTE
    min-reachable closure → anti-join the non-representative members."""
    pair_ctes = _minhash_pair_ctes(k=16, bands=8, rows=2, source="gdocs")
    return f"""
WITH RECURSIVE qb AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,
    length(text) AS n,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS np,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na,
    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nns
  FROM documents
), qt AS (
  SELECT doc_id, text,
    (least(CAST(nt AS DOUBLE) / 100.0, 1.0)
     + CASE WHEN n = 0 THEN 0.0 ELSE CAST(na AS DOUBLE) / n END
     + 1.0 - least((CASE WHEN n = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / n END) * 5.0, 1.0)
     + CASE WHEN (CASE WHEN nt = 0 THEN 0.0 ELSE CAST(nns AS DOUBLE) / nt END) >= 3.0
             AND (CASE WHEN nt = 0 THEN 0.0 ELSE CAST(nns AS DOUBLE) / nt END) <= 10.0
            THEN 1.0 ELSE 0.5 END) / 4.0 AS quality
  FROM qb
), gdocs AS (
  SELECT doc_id, text, quality FROM qt WHERE quality >= 0.5
), {pair_ctes}, ed AS (
  SELECT id_a AS u, id_b AS v FROM pairs WHERE id_a <> id_b
  UNION
  SELECT id_b, id_a FROM pairs WHERE id_a <> id_b
), r AS (
  SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed)
  UNION
  SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u
), comp AS (
  SELECT u AS id, min(m) AS component FROM r GROUP BY u
), dropset AS (
  SELECT id FROM comp WHERE id <> component
)
SELECT g.doc_id, ROUND(g.quality, 6) AS quality
FROM gdocs g LEFT JOIN dropset d ON d.id = g.doc_id
WHERE d.id IS NULL
"""


def q_robots_gate(spark, sf_dir):
    """S10/L4 — the production RFC 9309 longest-match gate
    (robots_gate_udf → allowed(): '*' wildcards, terminal-'$' anchors
    only, Allow wins length ties) over a synthesized (host, path)
    stream; the oracle re-derives every decision in SQL from the same
    rule table."""
    from crawler_spark.functions.robots import robots_gate_udf

    ev = _t(spark, sf_dir, "events")
    hosts = F.array(*[F.lit(h) for h in _ROBOTS_FIXTURE_HOSTS])
    paths = F.array(*[F.lit(p) for p in _ROBOTS_FIXTURE_PATHS])
    df = ev.select(
        "event_id",
        F.element_at(hosts, (F.col("event_id") % 4).cast("int") + 1).alias("host"),
        F.element_at(paths, (F.col("event_id") % 10).cast("int") + 1).alias("path"),
    )
    gate = robots_gate_udf(spark, _ROBOTS_FIXTURE_RULES)
    return df.withColumn("allowed", gate("host", "path"))


def _robots_gate_oracle_sql() -> str:
    vals = []
    for h, rl in _ROBOTS_FIXTURE_RULES.items():
        for is_allow, pat in rl:
            if pat.endswith("$") and "*" not in pat:
                kind = "a"  # terminal anchor: exact path equality
            elif "*" in pat:
                kind = "s"  # wildcard: LIKE with '*'->'%'
            else:
                kind = "p"  # literal prefix
            vals.append(f"('{h}', {'TRUE' if is_allow else 'FALSE'}, '{pat}', '{kind}')")
    hosts = ", ".join(f"'{h}'" for h in _ROBOTS_FIXTURE_HOSTS)
    paths = ", ".join(f"'{p}'" for p in _ROBOTS_FIXTURE_PATHS)
    return f"""
WITH u AS (
  SELECT event_id,
         [{hosts}][CAST(event_id % 4 AS INT) + 1] AS host,
         [{paths}][CAST(event_id % 10 AS INT) + 1] AS path
  FROM events
), r(host, is_allow, pat, kind) AS (VALUES {", ".join(vals)}),
m AS (
  SELECT u.event_id, u.host, u.path, r.is_allow, length(r.pat) AS plen,
         CASE r.kind
           WHEN 'p' THEN starts_with(u.path, r.pat)
           WHEN 's' THEN u.path LIKE replace(r.pat, '*', '%') || '%'
           ELSE u.path = substr(r.pat, 1, length(r.pat) - 1)
         END AS matched
  FROM u JOIN r ON u.host = r.host
), b AS (
  SELECT event_id, host, path,
         max(CASE WHEN matched AND is_allow THEN plen ELSE -1 END) AS ba,
         max(CASE WHEN matched AND NOT is_allow THEN plen ELSE -1 END) AS bd
  FROM m GROUP BY event_id, host, path
)
SELECT event_id, host, path, (ba >= bd) AS allowed FROM b
UNION ALL
SELECT event_id, host, path, TRUE AS allowed
FROM u WHERE host NOT IN (SELECT host FROM r)
"""


def q_extract_links(spark, sf_dir):
    """L1/L2 + U1/U2 — the real HTML link extractor (streaming parser
    with <base>-tag rebasing) + RFC 3986 resolution + canonicalization
    (lowercase host, default-port strip, fragment drop) over synthesized
    pages; the oracle reconstructs the resolved URLs by string algebra
    from the same page recipe."""
    from crawler_spark.functions.extract import extractor_udf

    d = _t(spark, sf_dir, "documents")
    g = (F.col("doc_id") % 50).cast("string")
    base = F.concat(F.lit("http://d"), g, F.lit(".test/dir/index.html"))
    html = F.concat(
        F.lit('<html><head><base href="/sub/"></head><body><a href="p'),
        F.col("doc_id").cast("string"),
        F.lit('.html">x</a><a href="//CDN.test:80/img'),
        F.col("doc_id").cast("string"),
        F.lit('">y</a><a href="?q='),
        (F.col("doc_id") % 7).cast("string"),
        F.lit('#frag">z</a></body></html>'),
    )
    udf = extractor_udf()
    return (
        d.select("doc_id", F.posexplode(udf(base, html)).alias("ordinal", "l"))
        .select(
            "doc_id", "ordinal",
            F.col("l.url").alias("url"),
            F.col("l.host_key").alias("host_key"),
        )
    )


_EXTRACT_LINKS_SQL = """
SELECT doc_id, 0 AS ordinal,
       'http://d' || (doc_id % 50) || '.test/sub/p' || doc_id || '.html' AS url,
       'd' || (doc_id % 50) || '.test' AS host_key FROM documents
UNION ALL
SELECT doc_id, 1 AS ordinal, 'http://cdn.test/img' || doc_id AS url,
       'cdn.test' AS host_key FROM documents
UNION ALL
SELECT doc_id, 2 AS ordinal,
       'http://d' || (doc_id % 50) || '.test/sub/?q=' || (doc_id % 7) AS url,
       'd' || (doc_id % 50) || '.test' AS host_key FROM documents
"""


# ===================================================================== #
# driver contract
# ===================================================================== #

def entry(spark: SparkSession) -> DataFrame:
    """Flagship: the crawl engine end-to-end on sf0.001-derived web."""
    return q_crawl_bfs(spark, "/root/testdata/sf0.001")


def q_diskqueue_pop_order(spark, sf_dir):
    """Q4 — the DiskQueue spill queue (reference diskqueue.go:220-395):
    3000 events pushed in scrambled batches through a 1024-slot bounded-
    memory queue (spill + write-behind buffer + half-reloads engaged),
    drained to a pop log. A correct spill queue's pop sequence equals
    the plain (next_ms, seq) total order over everything pushed — the
    oracle. Minute-floored timestamps force heavy ties so the FIFO
    tie-break is load-bearing."""
    import tempfile

    from crawler_spark.operators.diskqueue import SpilledWaitQueue, pop_all_ordered

    ev = _t(spark, sf_dir, "events").where(F.col("event_id") < 3000)
    ms = F.unix_millis(F.col("ts").cast("timestamp"))
    items = ev.select(
        (ms - ms % 60000).alias("next_ms"),
        F.col("event_id").alias("seq"),
    )
    q = SpilledWaitQueue(
        spark,
        workdir=tempfile.mkdtemp(prefix="dq_entry_"),
        limit=1024,
        buf_size=256,
    )
    # scrambled push order: interleave front/back halves batch by batch
    for lo in range(0, 3000, 600):
        half = 300
        q.push(
            items.where(
                ((F.col("seq") >= lo) & (F.col("seq") < lo + half))
                | ((F.col("seq") >= 2700 - lo) & (F.col("seq") < 3000 - lo))
            )
        )
    out = pop_all_ordered(q, batch=2048).select(
        F.col("seq").alias("event_id"), "next_ms", "pop_ord"
    ).localCheckpoint()
    q.close()
    return out


def q_store_state_machine(spark, sf_dir):
    """M2/M4 — the Store contract state machine (store.go:12-28,
    storage_test.go:28-104) replayed at table scale through the
    LSMStore backend (the leveldb analog; state/stores.py): 4
    sequential batches of PutNX → Update → Complete derived from the
    events table, one mid-run compaction, final table out. First
    writer wins puts (arg-min event), latest update wins fields
    (arg-max click), purchases complete. The oracle re-derives the
    final table in pure SQL."""
    import tempfile

    from crawler_spark.state.stores import LSMStore

    tms = F.unix_millis(F.col("ts").cast("timestamp"))
    ev = (
        _t(spark, sf_dir, "events")
        .where(F.col("event_id") < 8000)
        .select(
            "event_id",
            "user_id",
            "event_type",
            tms.alias("tms"),
            F.concat(F.lit("http://store.test/p"), (F.col("event_id") % 229).cast("string")).alias("url"),
        )
        .localCheckpoint()
    )
    store = LSMStore(
        spark, workdir=tempfile.mkdtemp(prefix="store_entry_"), compact_frames=100
    )
    put_vals = F.struct(
        (F.col("user_id") % 9).cast("int").alias("depth"),
        F.lit(False).alias("done"),
        F.lit(0).alias("status"),
        F.col("tms").alias("last_ms"),
        F.lit(0).alias("num_visit"),
        F.lit(0).alias("num_retry"),
    )
    upd_vals = F.struct(
        (F.lit(200) + F.col("user_id") % 3).cast("int").alias("status"),
        (F.col("tms") + 1000).alias("last_ms"),
        (F.lit(1) + F.col("event_id") % 5).cast("int").alias("num_visit"),
        (F.col("event_id") % 2).cast("int").alias("num_retry"),
    )
    for lo in range(0, 8000, 2000):
        evb = ev.where((F.col("event_id") >= lo) & (F.col("event_id") < lo + 2000))
        puts = (
            evb.groupBy("url")
            .agg(F.min_by(put_vals, "event_id").alias("_v"))
            .select("url", "_v.*")
        )
        store.put_nx(puts)
        upds = (
            evb.where(F.col("event_type") == "click")
            .groupBy("url")
            .agg(F.max_by(upd_vals, "event_id").alias("_v"))
            .select("url", "_v.*")
        )
        store.update(upds)
        store.complete_df(
            evb.where(F.col("event_type") == "purchase").select("url")
        )
        if lo == 2000:
            store.compact()  # mid-run fold: resolution must survive it
    out = store.snapshot().select(
        "url", "depth", "status", "num_visit", "num_retry", "last_ms", "done"
    ).localCheckpoint()
    store.close()
    from crawler_spark.state.ckpt import release_checkpoint

    release_checkpoint(ev)
    return out


def _stream_events(spark, sf_dir):
    """events table phrased as the emitted-event stream schema
    (streaming/metrics.EVENT_SCHEMA): user_id%50 plays host, event_type
    plays outcome, error rows carry status 500."""
    ev = _t(spark, sf_dir, "events")
    return ev.select(
        F.concat(F.lit("u://"), F.col("event_id").cast("string")).alias("url"),
        F.concat(F.lit("h"), (F.col("user_id") % 50).cast("string")).alias("host"),
        F.col("event_type").alias("outcome"),
        F.when(F.col("event_type") == "error", 500).otherwise(200).cast("int").alias("status"),
        F.unix_millis(F.col("ts").cast("timestamp")).alias("emit_ms"),
        F.col("event_id").alias("seq"),
    )


def q_stream_rollup(spark, sf_dir):
    """C8 as a STREAM — the watermarked windowed metrics rollup
    (streaming/metrics.fetch_rollup_stream) run to completion with
    Trigger.AvailableNow over the event log: hourly (window, outcome)
    counts published once per FINALIZED window (append mode; a window
    is final when the watermark = max event time − 30 min passes its
    end). The oracle re-derives exactly the finalized-window set in
    SQL. Reference behavior: the monotone counter Stats the store
    aggregates as the crawl runs (store.go:36-47)."""
    import tempfile

    from crawler_spark.streaming.metrics import (
        fetch_rollup_stream, read_event_stream,
    )

    tmp = tempfile.mkdtemp(prefix="stream_rollup_")
    events_dir = os.path.join(tmp, "events")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    # one file -> one data micro-batch: every event enters state before
    # the finalizing no-data batch publishes closed windows
    _stream_events(spark, sf_dir).coalesce(1).write.parquet(events_dir)
    q = fetch_rollup_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        window="1 hour", watermark="30 minutes", available_now=True,
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).select(
        F.date_format("window_start", "yyyy-MM-dd HH:mm:ss").alias("window_start"),
        F.date_format("window_end", "yyyy-MM-dd HH:mm:ss").alias("window_end"),
        "outcome",
        "n",
        "n_err",
    )


def q_stream_host_budget(spark, sf_dir):
    """C6 as a STREAM — the per-host lifetime response budget carried
    in GroupState across micro-batches
    (streaming/metrics.host_budget_stream): each event is admitted
    while its host's admitted-so-far count is below the budget and
    cancelled after (the incremental restatement of the batch rank
    cancel, plans/crawl.py:173-203; the reference bumps the counter one
    response at a time, schedule.go:256). Oracle: the equivalent
    ROW_NUMBER rank rule over the same log."""
    import tempfile

    from crawler_spark.streaming.metrics import (
        host_budget_stream, read_event_stream,
    )

    tmp = tempfile.mkdtemp(prefix="stream_budget_")
    events_dir = os.path.join(tmp, "events")
    out = os.path.join(tmp, "out")
    ckpt = os.path.join(tmp, "ckpt")
    _stream_events(spark, sf_dir).coalesce(1).write.parquet(events_dir)
    q = host_budget_stream(
        read_event_stream(spark, events_dir), out, ckpt,
        budget=120, available_now=True,
    )
    q.awaitTermination(600)
    return spark.read.parquet(out).select(
        "host", "url", "seq", "n_before", "verdict"
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return {
        "frontier_topk": q_frontier_topk,
        "politeness_budget": q_politeness_budget,
        "token_bucket": q_token_bucket,
        "max_hosts_admission": q_max_hosts_admission,
        "seen_antijoin": q_seen_antijoin,
        "first_writer_wins": q_first_writer_wins,
        "retry_taxonomy": q_retry_taxonomy,
        "host_metrics": q_host_metrics,
        "recovery_scan": q_recovery_scan,
        "emit_order": q_emit_order,
        "sessionize": q_sessionize,
        "hourly_rollup": q_hourly_rollup,
        "lineitem_rollup": q_lineitem_rollup,
        "top_revenue": q_top_revenue,
        "region_rollup": q_region_rollup,
        "url_canonicalize": q_url_canonicalize,
        "download_path": q_download_path,
        "dedup_exact": q_dedup_exact,
        "dedup_groups": q_dedup_groups,
        "doc_fingerprint": q_doc_fingerprint,
        "text_stats": q_text_stats,
        "lang_id": q_lang_id,
        "token_stats_by_lang": q_token_stats_by_lang,
        "quality_filter": q_quality_filter,
        "ngram_jaccard": q_ngram_jaccard,
        "minhash_near_dups": q_minhash_near_dups,
        "simhash": q_simhash,
        "ann_cosine_topk": q_ann_cosine_topk,
        "ann_srp_topk": q_ann_srp_topk,
        "ann_hamming_topk": q_ann_hamming_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "ann_ivf_append": q_ann_ivf_append,
        "embedding_dup_pairs": q_embedding_dup_pairs,
        "mm_payload_stats": q_mm_payload_stats,
        "payload_fmt_rollup": q_payload_fmt_rollup,
        "urltrie_census": q_urltrie_census,
        "mux_config": q_mux_config,
        "cache_route": q_cache_route,
        "cache_merge": q_cache_merge,
        "cache_evict": q_cache_evict,
        "host_budget_cancel": q_host_budget_cancel,
        "phash_near_dups": q_phash_near_dups,
        "image_dup_groups": q_image_dup_groups,
        "incremental_dedup": q_incremental_dedup,
        "image_quality": q_image_quality,
        "caption_dedup_best": q_caption_dedup_best,
        "corpus_canonical": q_corpus_canonical,
        "corpus_canonical_docs": q_corpus_canonical_docs,
        "robots_gate": q_robots_gate,
        "extract_links": q_extract_links,
        "crawl_bfs": q_crawl_bfs,
        "crawl_html": q_crawl_html,
        "crawl_live_dedup": q_crawl_live_dedup,
        "diskqueue_pop_order": q_diskqueue_pop_order,
        "store_state_machine": q_store_state_machine,
        "stream_rollup": q_stream_rollup,
        "stream_host_budget": q_stream_host_budget,
    }


_LANG_SQL = """
WITH p AS (
  SELECT doc_id, ' ' || lower(text) || ' ' AS pt FROM documents
), s AS (
  SELECT doc_id,
    CAST((length(pt) - length(replace(pt, ' the ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' and ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' of ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' to ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' is ', ''))) / 4 AS BIGINT) AS s_en,
    CAST((length(pt) - length(replace(pt, ' der ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' die ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' und ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' ist ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' das ', ''))) / 5 AS BIGINT) AS s_de,
    CAST((length(pt) - length(replace(pt, ' le ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' la ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' et ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' les ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' est ', ''))) / 5 AS BIGINT) AS s_fr,
    CAST((length(pt) - length(replace(pt, ' el ', ''))) / 4 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' los ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' que ', ''))) / 5 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' y ', ''))) / 3 AS BIGINT)
    + CAST((length(pt) - length(replace(pt, ' es ', ''))) / 4 AS BIGINT) AS s_es
  FROM p
)
SELECT doc_id,
  CASE WHEN greatest(s_en, s_de, s_fr, s_es) <= 0 THEN 'und'
       WHEN s_en = greatest(s_en, s_de, s_fr, s_es) THEN 'en'
       WHEN s_de = greatest(s_en, s_de, s_fr, s_es) THEN 'de'
       WHEN s_fr = greatest(s_en, s_de, s_fr, s_es) THEN 'fr'
       ELSE 'es' END AS lang_guess
FROM s
"""

_QUALITY_SQL = """
WITH b AS (
  SELECT doc_id, text,
    CASE WHEN length(trim(text)) = 0 THEN 0
         ELSE len(string_split_regex(trim(text), '\\s+')) END AS nt,
    length(text) AS n,
    length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS np,
    length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS na,
    length(regexp_replace(trim(text), '\\s+', '', 'g')) AS nns
  FROM documents
), t AS (
  SELECT doc_id,
    least(CAST(nt AS DOUBLE) / 100.0, 1.0) AS length_term,
    CASE WHEN n = 0 THEN 0.0 ELSE CAST(na AS DOUBLE) / n END AS alpha_term,
    1.0 - least((CASE WHEN n = 0 THEN 0.0 ELSE CAST(np AS DOUBLE) / n END) * 5.0, 1.0) AS punct_term,
    CASE WHEN nt = 0 THEN 0.0 ELSE CAST(nns AS DOUBLE) / nt END AS wl
  FROM b
)
SELECT doc_id,
  ROUND((length_term + alpha_term + punct_term
         + CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.5 END) / 4.0, 6) AS quality
FROM t
WHERE (length_term + alpha_term + punct_term
       + CASE WHEN wl >= 3.0 AND wl <= 10.0 THEN 1.0 ELSE 0.5 END) / 4.0 >= 0.5
"""

_NGRAM_JACCARD_SQL = """
WITH nt AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t
  FROM documents
), sh0 AS (
  SELECT DISTINCT doc_id, substr(t, CAST(i AS BIGINT), 3) AS sh
  FROM nt, UNNEST(range(1, greatest(length(t) - 1, 1))) AS u(i)
  WHERE length(t) >= 3
), sh AS (
  SELECT sh0.* FROM sh0
  JOIN (SELECT sh, count(*) AS df_ FROM sh0 GROUP BY sh) f USING (sh)
  WHERE f.df_ <= 1000
), sizes AS (
  SELECT doc_id, count(*) AS n_sh FROM sh0 GROUP BY doc_id
), inter AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_inter
  FROM sh a JOIN sh b USING (sh)
  WHERE a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b,
  ROUND(CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter), 6) AS jaccard
FROM inter
JOIN sizes sa ON sa.doc_id = id_a
JOIN sizes sb ON sb.doc_id = id_b
WHERE CAST(n_inter AS DOUBLE) / (sa.n_sh + sb.n_sh - n_inter) >= 0.8
"""

def _minhash_pair_ctes(k=32, bands=8, rows=4, threshold=0.6,
                       max_bucket=1000, source="documents"):
    """CTE chain defining ``pairs`` = (id_a, id_b, est_jaccard) with the
    group-reduced semantics of operators/dedup.minhash_near_dups: same
    shingling (3-gram over normalized text), same per-permutation hash
    min(md5('<i>_'||sh)), banding over DISTINCT signature vectors
    (gid = min member id), the degenerate-bucket cap counted in distinct
    signatures, equal-signature pairs emitted at est 1.0 outside the
    banded path, and cross-group estimates expanded back to members."""
    mins = ", ".join(f"min(md5('{i}_' || sh)) AS h{i}" for i in range(k))
    hcols = ", ".join(f"h{i}" for i in range(k))
    band_selects = " UNION ALL ".join(
        "SELECT gid, {b} AS band, md5({cc}) AS bh FROM sgrp".format(
            b=b, cc=" || '|' || ".join(f"h{b * rows + j}" for j in range(rows)))
        for b in range(bands)
    )
    eq = " + ".join(f"CAST(sa.h{i} = sb.h{i} AS INT)" for i in range(k))
    return f"""nt AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM {source}
), shg AS (
  SELECT DISTINCT doc_id, substr(t, CAST(i AS BIGINT), 3) AS sh
  FROM nt, UNNEST(range(1, greatest(length(t) - 1, 1))) AS u(i)
  WHERE length(t) >= 3
), sig AS (
  SELECT doc_id, {mins} FROM shg GROUP BY doc_id
), sgrp AS (
  SELECT min(doc_id) AS gid, {hcols} FROM sig GROUP BY {hcols}
), mem AS (
  SELECT s.doc_id, g.gid FROM sig s JOIN sgrp g USING ({hcols})
), bandrows AS ({band_selects}
), keepb AS (
  SELECT band, bh FROM bandrows GROUP BY band, bh HAVING count(*) <= {max_bucket}
), b2 AS (
  SELECT bandrows.* FROM bandrows JOIN keepb USING (band, bh)
), gcand AS (
  SELECT DISTINCT a.gid AS gid_a, b.gid AS gid_b
  FROM b2 a JOIN b2 b USING (band, bh) WHERE a.gid < b.gid
), gest AS (
  SELECT gid_a, gid_b, ({eq}) / {float(k)} AS est_jaccard
  FROM gcand JOIN sgrp sa ON sa.gid = gid_a JOIN sgrp sb ON sb.gid = gid_b
  WHERE ({eq}) / {float(k)} >= {threshold}
), pairs AS (
  SELECT least(ma.doc_id, mb.doc_id) AS id_a,
         greatest(ma.doc_id, mb.doc_id) AS id_b, est_jaccard
  FROM gest JOIN mem ma ON ma.gid = gid_a JOIN mem mb ON mb.gid = gid_b
  UNION ALL
  SELECT a.doc_id, b.doc_id, 1.0
  FROM mem a JOIN mem b ON a.gid = b.gid AND a.doc_id < b.doc_id
)"""


def _minhash_oracle_sql(k=32, bands=8, rows=4, threshold=0.6, max_bucket=1000):
    """DuckDB recomputation of the md5-family MinHash+LSH operator via
    the shared group-reduced CTE chain (`_minhash_pair_ctes`)."""
    ctes = _minhash_pair_ctes(k=k, bands=bands, rows=rows,
                              threshold=threshold, max_bucket=max_bucket)
    return (f"WITH {ctes} SELECT id_a, id_b, "
            "ROUND(est_jaccard, 6) AS est_jaccard FROM pairs")


def _simhash_oracle_sql():
    """DuckDB recomputation of the md5-family SimHash: per-feature 64-bit
    hash = first 16 hex chars of md5(shingle); per-bit ±1 votes; bit set
    iff vote sum > 0."""
    votes = ", ".join(
        "sum(CASE WHEN (((strpos('0123456789abcdef', substr(m, {pos}, 1)) - 1) >> {sh}) & 1) = 1 "
        "THEN 1 ELSE -1 END) AS b{b}".format(pos=16 - b // 4, sh=b % 4, b=b)
        for b in range(64)
    )
    terms = " + ".join(
        ("CASE WHEN b63 > 0 THEN -9223372036854775808 ELSE 0 END" if b == 63
         else f"CASE WHEN b{b} > 0 THEN {1 << b} ELSE 0 END")
        for b in range(64)
    )
    return f"""
WITH nt AS (
  SELECT doc_id, lower(trim(regexp_replace(text, '\\s+', ' ', 'g'))) AS t FROM documents
), sh AS (
  SELECT doc_id, substr(t, CAST(i AS BIGINT), 3) AS ft
  FROM nt, UNNEST(range(1, greatest(length(t) - 1, 1))) AS u(i)
  WHERE length(t) >= 3
), h AS (
  SELECT doc_id, md5(ft) AS m FROM sh
), v AS (
  SELECT doc_id, {votes} FROM h GROUP BY doc_id
)
SELECT doc_id, CAST({terms} AS BIGINT) AS simhash FROM v
"""


def _srp_oracle_sql(bits=6, seed=42, k=10):
    """DuckDB recomputation of md5-parity SRP bucketing + in-bucket
    cosine top-k. Projections run over the raw double vector (SRP signs
    are scale-invariant), matching the Spark md5 variant exactly."""
    def proj(i):
        return (
            "list_reduce(list_transform(v, (x, j) -> CASE WHEN "
            f"((strpos('0123456789abcdef', substr(md5('{seed}_{i}_' || (j - 1)), 32, 1)) - 1) % 2) = 1 "
            "THEN x ELSE -x END), (a, b) -> a + b)"
        )
    projs = ", ".join(f"{proj(i)} AS p{i}" for i in range(bits))
    bucket = " + ".join(f"CASE WHEN p{i} > 0 THEN {1 << i} ELSE 0 END" for i in range(bits))
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
), p AS (
  SELECT vec_id, v, {projs} FROM e
), bk AS (
  SELECT vec_id, v, CAST({bucket} AS BIGINT) AS bucket FROM p
), n AS (
  SELECT vec_id, bucket,
    CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS u
  FROM bk
), q AS (
  SELECT bucket AS qbucket, u AS qu FROM n
  WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
)
SELECT vec_id, ROUND(list_dot_product(u, qu), 4) AS score
FROM n, q WHERE bucket = qbucket
ORDER BY list_dot_product(u, qu) DESC, vec_id ASC
LIMIT {k}
"""


def _ivf_oracle_sql(nc=8, nprobe=4, k=10, train_filter=None):
    """DuckDB recomputation of the deterministic IVF index: init = first
    nc vectors by id, 2 Lloyd iterations (same argmin tie-break: lowest
    centroid id), probe the nprobe nearest cells, cosine top-k.
    ``train_filter`` restricts TRAINING (init + Lloyd assignments) to a
    base slice while the final assignment covers every vector — the
    append-entry face, where the delta is folded in against frozen
    centroids."""
    def sqd(vcol, ccol):
        return (f"list_reduce(list_transform({vcol}, (x, j) -> (x - {ccol}[j]) * (x - {ccol}[j])), "
                "(a, b) -> a + b)")

    tsrc = "eb" if train_filter else "e"

    def assign(cents, src=None):
        src = src or tsrc
        return f"""
  SELECT vec_id, v, cid FROM (
    SELECT e.vec_id, e.v, c.cid,
      row_number() OVER (PARTITION BY e.vec_id
                         ORDER BY {sqd('e.v', 'c.cv')} ASC, c.cid ASC) AS rn
    FROM {src} e CROSS JOIN {cents} c) WHERE rn = 1"""

    def means(asg):
        return f"""
  SELECT cid, list(m ORDER BY pos) AS cv FROM (
    SELECT cid, pos, avg(x) AS m FROM (
      SELECT cid, generate_subscripts(v, 1) AS pos, unnest(v) AS x FROM {asg}) t1
    GROUP BY cid, pos) t2
  GROUP BY cid"""

    cos = ("CASE WHEN sqrt(list_dot_product(sel.v, sel.v)) = 0 OR sqrt(list_dot_product(q.qv, q.qv)) = 0 THEN 0.0 "
           "ELSE list_dot_product(sel.v, q.qv) / (sqrt(list_dot_product(sel.v, sel.v)) * sqrt(list_dot_product(q.qv, q.qv))) END")
    eb_cte = (
        f", eb AS (\n  SELECT * FROM e WHERE {train_filter}\n)"
        if train_filter else ""
    )
    return f"""
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v FROM embeddings
){eb_cte}, c0 AS (
  SELECT CAST(row_number() OVER (ORDER BY vec_id) - 1 AS INT) AS cid, v AS cv
  FROM {tsrc} ORDER BY vec_id LIMIT {nc}
), a1 AS ({assign('c0')}
), m1 AS ({means('a1')}
), c1 AS (
  SELECT c0.cid, COALESCE(m1.cv, c0.cv) AS cv FROM c0 LEFT JOIN m1 USING (cid)
), a2 AS ({assign('c1')}
), m2 AS ({means('a2')}
), c2 AS (
  SELECT c1.cid, COALESCE(m2.cv, c1.cv) AS cv FROM c1 LEFT JOIN m2 USING (cid)
), q AS (
  SELECT v AS qv FROM e WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
), probe AS (
  SELECT c2.cid FROM c2, q ORDER BY {sqd('q.qv', 'c2.cv')} ASC, c2.cid ASC LIMIT {nprobe}
), a3 AS ({assign('c2', 'e')}
), sel AS (
  SELECT a3.vec_id, a3.v FROM a3 JOIN probe USING (cid)
)
SELECT vec_id, ROUND({cos}, 4) AS score FROM sel, q
ORDER BY {cos} DESC, vec_id ASC
LIMIT {k}
"""


_ANN_SQL = """
WITH q AS (
  SELECT list_transform(embedding, x -> CAST(x AS DOUBLE)) AS qv
  FROM embeddings WHERE vec_id = (SELECT min(vec_id) FROM embeddings)
), e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
)
SELECT vec_id,
  ROUND(CASE WHEN sqrt(list_dot_product(v, v)) = 0 OR sqrt(list_dot_product(qv, qv)) = 0
        THEN 0.0
        ELSE list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv)))
        END, 4) AS score
FROM e, q
ORDER BY CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN 0.0
         ELSE list_dot_product(v, qv) / (sqrt(list_dot_product(v, v)) * sqrt(list_dot_product(qv, qv))) END DESC,
         vec_id ASC
LIMIT 10
"""

def _crawl_bfs_oracle_sql(n_events=2000, n_seeds=3, max_depth=4, max_pops=60):
    """Whole-crawl DuckDB oracle for q_crawl_bfs — the reference's own
    verification style (godoc_test.go:24-47: full crawl vs an external
    oracle), re-derived in SQL.

    Why the emit order is SQL-expressible under this entry's policy
    (interval 0, score 0 → prio 999, ticket_at='avail', max_visits=1,
    max_retry=1): no item is ever re-pushed (first visit completes or
    first error exhausts retries), every push happens at virtual time 0
    (interval 0 keeps the host clock at 0, so discovery time ≡ 0), so
    the two-level politeness order (emit, prio, seq) degenerates to pure
    ``seq`` = discovery order. Discovery is breadth-first: pops proceed
    in seq order and every link's seq exceeds its parent's, so levels
    are contiguous and first-writer-wins for a URL is decided by
    min(parent_seq, ordinal) among the previous level's ok parents.
    With max_depth=4 the BFS has at most 5 levels, so the closure
    unrolls into 5 static CTE stages — no recursion, no iteration.
    Truncation at max_pops keeps rows with seq < max_pops: pops follow
    seq order, and expansions by parents with seq >= max_pops can only
    first-write URLs whose seq is also >= max_pops (their discovery
    order keys exceed every sub-max_pops key), so including them in the
    closure is harmless.

    The derived web is recomputed independently from the events table
    (same arithmetic link rule as _derived_web)."""
    return (
        "\nWITH "
        + _crawl_bfs_ctes(n_events, n_seeds, max_depth)
        + f"""
SELECT CAST(a.seq AS INT) AS emit_ord, a.url, CAST(a.depth AS INT) AS depth,
       CAST(p.status AS INT) AS status,
       CASE WHEN p.status = 200 THEN 'ok' ELSE 'retry' END AS outcome
FROM all_nodes a JOIN pages p ON p.url = a.url
WHERE a.seq < {max_pops}
ORDER BY emit_ord
"""
    )


def _crawl_bfs_ctes(n_events=2000, n_seeds=3, max_depth=4):
    """The shared CTE chain (ev → pages/edges → unrolled BFS levels →
    all_nodes) behind every whole-crawl oracle; callers prepend
    "WITH " or "WITH RECURSIVE " and append their final select."""
    sql = f"""ev AS (
  SELECT event_id, user_id, event_type FROM events WHERE event_id < {n_events}
), nn AS (
  SELECT MAX(event_id) + 1 AS n FROM ev
), pages AS (
  SELECT 'http://u' || CAST(user_id AS VARCHAR) || '.events.test/e/'
           || CAST(event_id AS VARCHAR) AS url,
         event_id,
         CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status
  FROM ev
), cand AS (
  SELECT event_id, (event_id * 2 + 1) % (SELECT n FROM nn) AS t_id FROM ev
  UNION ALL
  SELECT event_id, (event_id * 3 + 7) % (SELECT n FROM nn) AS t_id FROM ev
), edges AS (
  SELECT s.url AS src, t.url AS dst,
         ROW_NUMBER() OVER (PARTITION BY s.url ORDER BY t.url) AS ordinal
  FROM cand c
  JOIN pages s ON s.event_id = c.event_id
  JOIN pages t ON t.event_id = c.t_id
), l0 AS (
  SELECT url, 0 AS depth,
         CAST(ROW_NUMBER() OVER (ORDER BY url) - 1 AS BIGINT) AS seq
  FROM (SELECT url FROM pages ORDER BY url LIMIT {n_seeds})
), seen0 AS (SELECT url FROM l0)"""
    for d in range(1, max_depth + 1):
        p = d - 1
        sql += f""", c{d} AS (
  SELECT e.dst AS url, MIN(p.seq * 16 + e.ordinal) AS fw_key
  FROM l{p} p
  JOIN pages ps ON ps.url = p.url AND ps.status = 200
  JOIN edges e ON e.src = p.url
  WHERE e.dst NOT IN (SELECT url FROM seen{p})
  GROUP BY e.dst
), l{d} AS (
  SELECT url, {d} AS depth,
         (SELECT COUNT(*) FROM seen{p})
           + ROW_NUMBER() OVER (ORDER BY fw_key) - 1 AS seq
  FROM c{d}
), seen{d} AS (SELECT url FROM seen{p} UNION ALL SELECT url FROM l{d})"""
    levels = " UNION ALL ".join(f"SELECT * FROM l{d}" for d in range(max_depth + 1))
    sql += f", all_nodes AS ({levels})"
    return sql


def _crawl_dedup_oracle_sql(n_events=2000, n_seeds=3, max_depth=4, max_pops=60):
    """Whole-crawl × image oracle for q_crawl_live_dedup: WHICH pages get
    crawled comes from the same arithmetic BFS as crawl_bfs; WHAT the
    near-dup clusters of their payloads are comes from the md5-family
    phash + a recursive-CTE closure at Hamming ≤ 6 (the one-shot
    re-derivation the engine's per-step incremental folds must be
    indistinguishable from). Components are named by min event_id so the
    naming is independent of the engine's internal 64-bit member ids."""
    phash = _phash_sql_expr("duck")
    return (
        "WITH RECURSIVE "
        + _crawl_bfs_ctes(n_events, n_seeds, max_depth)
        + f""", crawled AS MATERIALIZED (
  SELECT DISTINCT pg.event_id
  FROM all_nodes a JOIN pages pg ON pg.url = a.url
  WHERE a.seq < {max_pops} AND pg.status = 200
), ph AS MATERIALIZED (
  SELECT doc_id, {phash} AS phash
  FROM (SELECT event_id AS doc_id FROM crawled) t
), pr AS (
  SELECT a.doc_id AS u, b.doc_id AS v FROM ph a JOIN ph b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.phash, b.phash)) <= 6
), ed AS MATERIALIZED (SELECT u, v FROM pr UNION SELECT v, u FROM pr),
r AS (
  SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed)
  UNION SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u
)
SELECT CAST(u AS BIGINT) AS image_id, CAST(min(m) AS BIGINT) AS component
FROM r GROUP BY u ORDER BY image_id
"""
    )


_EMB_PAIRS_SQL = """
WITH e AS (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
), n AS (
  SELECT vec_id,
    CASE WHEN sqrt(list_dot_product(v, v)) = 0 THEN v
         ELSE list_transform(v, x -> x / sqrt(list_dot_product(v, v))) END AS u
  FROM e
)
SELECT a.vec_id AS id_a, b.vec_id AS id_b,
  ROUND(list_dot_product(a.u, b.u), 4) AS cosine
FROM n a, n b
WHERE a.vec_id < b.vec_id AND list_dot_product(a.u, b.u) >= 0.35
"""


def oracle_sql() -> dict[str, str]:
    norm = "lower(trim(regexp_replace(text, '\\s+', ' ', 'g')))"
    return {
        "frontier_topk": (
            "SELECT event_id, strftime(ts, '%Y-%m-%d %H:%M:%S.%f') AS ts_s, value "
            "FROM events ORDER BY ts ASC, value DESC, event_id ASC LIMIT 100"
        ),
        "politeness_budget": (
            "SELECT user_id AS host, event_id, rn FROM ("
            " SELECT user_id, event_id, ROW_NUMBER() OVER "
            " (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS rn FROM events)"
            " WHERE rn <= 2"
        ),
        "token_bucket": (
            "WITH RECURSIVE reqs AS ("
            " SELECT user_id AS host, event_id, epoch_ms(ts) AS t,"
            "        CAST(200 + (user_id % 7) * 150 AS BIGINT) AS d,"
            "        CAST(1 + (user_id % 4) AS BIGINT) AS b,"
            "        ROW_NUMBER() OVER (PARTITION BY user_id"
            "                           ORDER BY epoch_ms(ts), event_id) AS rn"
            " FROM events"
            "), tb AS ("
            " SELECT host, event_id, t, d, b, rn, b*d - d AS credit"
            " FROM reqs WHERE rn = 1"
            " UNION ALL"
            " SELECT r.host, r.event_id, r.t, r.d, r.b, r.rn,"
            "        least(r.b*r.d, tb.credit + (r.t - tb.t)) - r.d"
            " FROM reqs r JOIN tb ON r.host = tb.host AND r.rn = tb.rn + 1"
            ") SELECT host, event_id,"
            "         greatest(0, -credit) AS wait_ms,"
            "         t + greatest(0, -credit) AS reserve_at_ms"
            " FROM tb"
        ),
        "max_hosts_admission": (
            "WITH a AS (SELECT user_id, min(event_id) AS s0 FROM events"
            "           GROUP BY user_id ORDER BY s0 LIMIT 10)"
            " SELECT e.user_id AS host, e.event_id"
            " FROM events e JOIN a ON a.user_id = e.user_id"
        ),
        "seen_antijoin": (
            "SELECT event_type, count(*) AS n_unseen FROM events e "
            "WHERE NOT EXISTS (SELECT 1 FROM customer c "
            "WHERE c.c_custkey < 75 AND c.c_custkey = e.user_id) "
            "GROUP BY event_type"
        ),
        "first_writer_wins": (
            "SELECT user_id, event_type, min(event_id) AS first_event_id, "
            "count(*) AS n_events FROM events GROUP BY user_id, event_type"
        ),
        "retry_taxonomy": (
            "SELECT CASE WHEN event_type IN ('click','view','purchase') THEN 'ok' "
            "WHEN event_type = 'error' AND value < 100.0 THEN 'retry' "
            "ELSE 'drop' END AS outcome, count(*) AS n FROM events GROUP BY 1"
        ),
        "host_metrics": (
            "SELECT user_id AS host, count(*) AS n_fetch, "
            "strftime(min(ts), '%Y-%m-%d %H:%M:%S.%f') AS first_ts, "
            "strftime(max(ts), '%Y-%m-%d %H:%M:%S.%f') AS last_ts, "
            "ROUND(sum(value) / count(*), 6) AS mean_value "
            "FROM events GROUP BY user_id"
        ),
        "recovery_scan": (
            "SELECT o_orderstatus, count(*) AS n_open, "
            "ROUND(sum(o_totalprice), 4) AS open_value "
            "FROM orders WHERE o_orderstatus <> 'F' GROUP BY o_orderstatus"
        ),
        "emit_order": (
            "SELECT ROW_NUMBER() OVER (ORDER BY ts ASC, event_id ASC) - 1 AS emit_ord, "
            "event_id, user_id AS host FROM "
            "(SELECT * FROM events ORDER BY ts ASC, event_id ASC LIMIT 500)"
        ),
        "sessionize": (
            "SELECT user_id, CAST(sum(ns) AS BIGINT) AS n_sessions, count(*) AS n_events FROM ("
            " SELECT user_id, CASE WHEN prev IS NULL OR "
            " (epoch_us(ts) - epoch_us(prev)) > 1800 * 1000000 THEN 1 ELSE 0 END AS ns"
            " FROM (SELECT user_id, ts, LAG(ts) OVER "
            "  (PARTITION BY user_id ORDER BY ts ASC, event_id ASC) AS prev FROM events))"
            " GROUP BY user_id"
        ),
        "hourly_rollup": (
            "SELECT strftime(date_trunc('hour', ts), '%Y-%m-%d %H:%M:%S') AS hour, "
            "event_type, count(*) AS n, ROUND(sum(value), 4) AS sum_value "
            "FROM events GROUP BY 1, 2"
        ),
        "lineitem_rollup": (
            "SELECT l_returnflag, l_linestatus, "
            "ROUND(sum(l_quantity), 4) AS sum_qty, "
            "ROUND(sum(l_extendedprice), 4) AS sum_base_price, "
            "ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price, "
            "ROUND(sum(l_quantity) / count(*), 6) AS avg_qty, "
            "count(*) AS count_order "
            "FROM lineitem WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00' "
            "GROUP BY l_returnflag, l_linestatus"
        ),
        "top_revenue": (
            "SELECT l_orderkey, ROUND(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue "
            "FROM lineitem JOIN orders ON l_orderkey = o_orderkey "
            "JOIN customer ON o_custkey = c_custkey "
            "WHERE c_mktsegment = 'BUILDING' "
            "GROUP BY l_orderkey ORDER BY revenue DESC, l_orderkey ASC LIMIT 10"
        ),
        "region_rollup": (
            "SELECT r_name AS region, count(*) AS n_suppliers, "
            "ROUND(sum(s_acctbal), 4) AS total_bal "
            "FROM supplier JOIN nation ON s_nationkey = n_nationkey "
            "JOIN region ON n_regionkey = r_regionkey GROUP BY r_name"
        ),
        "url_canonicalize": (
            "SELECT c_custkey, "
            "'http://cust' || c_custkey || '.example.com/a/c' AS url_norm, "
            "'cust' || c_custkey || '.example.com' AS host FROM customer"
        ),
        "download_path": (
            "SELECT c_custkey, 'h' || c_custkey || '.test' || "
            "CASE c_custkey % 4 "
            "WHEN 0 THEN '/a/index.html' "
            "WHEN 1 THEN '/p' || c_custkey || '.html' "
            "WHEN 2 THEN '/dir/f' || c_custkey || '/index.html' "
            "ELSE '/s/index.html?a=' || c_custkey || '&b=2' END AS file_path "
            "FROM customer"
        ),
        "dedup_exact": (
            f"SELECT md5({norm}) AS fp, min(doc_id) AS keep_id, "
            f"count(*) AS n_dups FROM documents GROUP BY 1"
        ),
        "dedup_groups": (
            # same arithmetic graph as the Spark side; component = min
            # reachable node id via the undirected closure (recursive
            # CTE with set-union semantics => guaranteed fixpoint)
            "WITH RECURSIVE base AS ("
            "  SELECT event_id % 4000 AS a,"
            "         (event_id % 4000) - ((event_id % 4000) % 40)"
            "           + (event_id * 7919) % 40 AS b"
            "  FROM events WHERE event_id % 7 = 0"
            "), ed AS ("
            "  SELECT a AS u, b AS v FROM base WHERE a <> b"
            "  UNION"
            "  SELECT b, a FROM base WHERE a <> b"
            "), r AS ("
            "  SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed)"
            "  UNION"
            "  SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u"
            ")"
            " SELECT u AS id, min(m) AS component FROM r GROUP BY u"
        ),
        "doc_fingerprint": f"SELECT doc_id, md5({norm}) AS fp FROM documents",
        "text_stats": (
            "SELECT doc_id, "
            "CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END AS n_tokens, "
            "length(text) AS n_chars_calc, "
            "ROUND(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
            "CAST(length(regexp_replace(text, '[^.,!?;:]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS punct_ratio, "
            "ROUND(CASE WHEN length(text) = 0 THEN 0.0 ELSE "
            "CAST(length(regexp_replace(text, '[^A-Za-z]', '', 'g')) AS DOUBLE) / length(text) END, 6) AS alpha_ratio "
            "FROM documents"
        ),
        "lang_id": _LANG_SQL,
        "token_stats_by_lang": (
            "SELECT lang, count(*) AS n_docs, "
            "CAST(sum(CASE WHEN length(trim(text)) = 0 THEN 0 "
            "ELSE len(string_split_regex(trim(text), '\\s+')) END) AS BIGINT) AS total_tokens, "
            "ROUND(CAST(sum(length(text)) AS DOUBLE) / count(*), 6) AS mean_chars "
            "FROM documents GROUP BY lang"
        ),
        "quality_filter": _QUALITY_SQL,
        "ngram_jaccard": _NGRAM_JACCARD_SQL,
        "minhash_near_dups": _minhash_oracle_sql(),
        "corpus_canonical_docs": _corpus_canonical_docs_sql(),
        "simhash": _simhash_oracle_sql(),
        "ann_cosine_topk": _ANN_SQL,
        "ann_srp_topk": _srp_oracle_sql(),
        # the hamming prefilter's entry point is candidate-complete on
        # this table (verified deterministic), so exact cosine IS the oracle
        "ann_hamming_topk": _ANN_SQL,
        "ann_ivf_topk": _ivf_oracle_sql(),
        # append face: training restricted to the base slice, final
        # assignment over everything — frozen-centroid fold invisible
        "ann_ivf_append": _ivf_oracle_sql(train_filter="vec_id % 5 <> 0"),
        "embedding_dup_pairs": _EMB_PAIRS_SQL,
        "mm_payload_stats": (
            "SELECT doc_id, octet_length(encode(text)) AS n_bytes, "
            "octet_length(encode(text)) - length(text) AS n_multibyte_extra "
            "FROM documents"
        ),
        "payload_fmt_rollup": _PAYLOAD_FMT_SQL,
        "urltrie_census": (
            "WITH u AS (SELECT 'u' || user_id || '.events.test' AS host, "
            "event_type, CAST(event_id AS VARCHAR) AS eid FROM events) "
            "SELECT host, 1 AS depth, '/' AS prefix, "
            "count(DISTINCT event_type) AS n_children FROM u GROUP BY host "
            "HAVING count(DISTINCT event_type) >= 6 "
            "UNION ALL "
            "SELECT host, 2 AS depth, '/' || event_type AS prefix, "
            "count(DISTINCT eid) AS n_children FROM u GROUP BY host, event_type "
            "HAVING count(DISTINCT eid) >= 5"
        ),
        "mux_config": MUX_CONFIG_SQL,
        "cache_merge": _CACHE_MERGE_SQL,
        "cache_evict": _CACHE_EVICT_SQL,
        "host_budget_cancel": _HOST_BUDGET_SQL,
        "phash_near_dups": (
            f"WITH ph AS (SELECT doc_id, {_phash_sql_expr('duck')} AS phash FROM documents) "
            "SELECT a.doc_id AS id_a, b.doc_id AS id_b, "
            "CAST(bit_count(xor(a.phash, b.phash)) AS INTEGER) AS hamming "
            "FROM ph a JOIN ph b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.phash, b.phash)) <= 6"
        ),
        "image_dup_groups": (
            f"WITH RECURSIVE ph AS (SELECT doc_id, {_phash_sql_expr('duck')} "
            "AS phash FROM documents), "
            "p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM ph a "
            "JOIN ph b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.phash, b.phash)) <= 6), "
            "ed AS (SELECT u, v FROM p UNION SELECT v, u FROM p), "
            "r AS (SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed) "
            "UNION SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u) "
            "SELECT u AS image_id, min(m) AS component FROM r GROUP BY u"
        ),
        # the incremental fold must be invisible: same one-shot closure
        # as image_dup_groups grades the batched index end state
        "incremental_dedup": (
            f"WITH RECURSIVE ph AS (SELECT doc_id, {_phash_sql_expr('duck')} "
            "AS phash FROM documents), "
            "p AS (SELECT a.doc_id AS u, b.doc_id AS v FROM ph a "
            "JOIN ph b ON a.doc_id < b.doc_id "
            "WHERE bit_count(xor(a.phash, b.phash)) <= 6), "
            "ed AS (SELECT u, v FROM p UNION SELECT v, u FROM p), "
            "r AS (SELECT u, u AS m FROM (SELECT DISTINCT u FROM ed) "
            "UNION SELECT e.v AS u, r.m FROM r JOIN ed e ON e.u = r.u) "
            "SELECT u AS image_id, min(m) AS component FROM r GROUP BY u"
        ),
        "image_quality": _IMAGE_QUALITY_SQL,
        "caption_dedup_best": _CAPTION_DEDUP_SQL,
        "corpus_canonical": _corpus_canonical_sql(),
        "robots_gate": _robots_gate_oracle_sql(),
        "extract_links": _EXTRACT_LINKS_SQL,
        "cache_route": (
            "WITH c AS (SELECT o_orderkey, epoch_ms(o_orderdate) AS fetched_ms, "
            "CASE WHEN o_orderstatus = 'O' THEN 157680000000 ELSE 0 END AS max_age_ms, "
            "CASE WHEN o_totalprice > 200000.0 THEN 'e' END AS etag, "
            "(o_orderpriority LIKE '1%') AS need_validate FROM orders) "
            "SELECT o_orderkey, "
            "CASE WHEN NOT need_validate AND (883612800000 - fetched_ms) < max_age_ms "
            "THEN 'hit' WHEN etag IS NOT NULL THEN 'revalidate' ELSE 'miss' END "
            "AS cache_route FROM c"
        ),
        # whole-crawl oracle: the BFS degenerate case is SQL-expressible
        # (see _crawl_bfs_oracle_sql's proof); the general scheduler is
        # additionally checksum-matched against the serial oracle in
        # tests/test_crawl_e2e.py::test_entry_bfs_checksum.
        "crawl_bfs": _crawl_bfs_oracle_sql(),
        # html-mode whole-crawl: the SQL re-derives every link arithmetically
        # (the same BFS oracle) — the entry must re-FIND them by parsing HTML
        "crawl_html": _crawl_bfs_oracle_sql(),
        # crawl × image: in-loop incremental dedupe graded against the
        # one-shot BFS + phash-closure re-derivation
        "crawl_live_dedup": _crawl_dedup_oracle_sql(max_pops=40),
        # Q4: a correct spill queue's pop sequence IS the plain total
        # order over everything pushed — spills/reloads must not change it
        "diskqueue_pop_order": (
            "SELECT event_id, next_ms, "
            "ROW_NUMBER() OVER (ORDER BY next_ms, event_id) - 1 AS pop_ord "
            "FROM (SELECT event_id, "
            " epoch_ms(ts) - epoch_ms(ts) % 60000 AS next_ms "
            " FROM events WHERE event_id < 3000)"
        ),
        # M2/M4: the store state machine re-derived declaratively —
        # first put (arg-min event) wins depth/initial last, latest
        # click (arg-max event) wins the Update field set, any purchase
        # completes
        "store_state_machine": (
            "WITH ev AS ("
            " SELECT event_id, user_id, event_type, epoch_ms(ts) AS tms,"
            "        'http://store.test/p' || CAST(event_id % 229 AS VARCHAR) AS url"
            " FROM events WHERE event_id < 8000"
            "), puts AS ("
            " SELECT url,"
            "        CAST(arg_min(user_id % 9, event_id) AS INT) AS depth,"
            "        arg_min(tms, event_id) AS put_last"
            " FROM ev GROUP BY url"
            "), upds AS ("
            " SELECT url,"
            "        CAST(arg_max(200 + user_id % 3, event_id) AS INT) AS status,"
            "        CAST(arg_max(1 + event_id % 5, event_id) AS INT) AS num_visit,"
            "        CAST(arg_max(event_id % 2, event_id) AS INT) AS num_retry,"
            "        arg_max(tms + 1000, event_id) AS upd_last"
            " FROM ev WHERE event_type = 'click' GROUP BY url"
            "), dones AS (SELECT DISTINCT url FROM ev WHERE event_type = 'purchase')"
            " SELECT p.url, p.depth,"
            "        COALESCE(u.status, 0) AS status,"
            "        COALESCE(u.num_visit, 0) AS num_visit,"
            "        COALESCE(u.num_retry, 0) AS num_retry,"
            "        COALESCE(u.upd_last, p.put_last) AS last_ms,"
            "        d.url IS NOT NULL AS done"
            " FROM puts p LEFT JOIN upds u ON p.url = u.url"
            " LEFT JOIN dones d ON p.url = d.url"
        ),
        # finalized-window set: hourly windows whose end the watermark
        # (max event-time ms - 30 min) has passed; emit_ms truncates ts
        # to millis, mirrored via epoch_ms on both sides
        "stream_rollup": (
            "WITH ev AS ("
            " SELECT event_type AS outcome,"
            "        CASE WHEN event_type = 'error' THEN 500 ELSE 200 END AS status,"
            "        date_trunc('hour', ts) AS ws"
            " FROM events"
            "), wm AS (SELECT max(epoch_ms(ts)) - 30*60*1000 AS wms FROM events)"
            " SELECT strftime(ws, '%Y-%m-%d %H:%M:%S') AS window_start,"
            "        strftime(ws + INTERVAL 1 HOUR, '%Y-%m-%d %H:%M:%S') AS window_end,"
            "        outcome, count(*) AS n,"
            "        count(CASE WHEN status >= 400 THEN 1 END) AS n_err"
            " FROM ev, wm"
            " WHERE epoch_ms(ws + INTERVAL 1 HOUR) <= wm.wms"
            " GROUP BY 1, 2, 3"
        ),
        "stream_host_budget": (
            "WITH r AS ("
            " SELECT 'h' || CAST(user_id % 50 AS VARCHAR) AS host,"
            "        'u://' || CAST(event_id AS VARCHAR) AS url,"
            "        event_id AS seq,"
            "        ROW_NUMBER() OVER ("
            "          PARTITION BY user_id % 50 ORDER BY event_id) AS rn"
            " FROM events)"
            " SELECT host, url, seq,"
            "        LEAST(rn - 1, 120) AS n_before,"
            "        CASE WHEN rn <= 120 THEN 'admit' ELSE 'cancel' END AS verdict"
            " FROM r"
        ),
    }
