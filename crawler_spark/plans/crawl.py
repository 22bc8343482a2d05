"""The crawl engine: an iterative DataFrame superstep loop.

One *step* of the driver loop is the Spark equivalent of the reference's
scheduler ring (crawler.go:44-61, schedule.go:60-216) — see SURVEY.md §3:

    select   politeness selection over the frontier       (operators/selection)
    fetch    join the web/payload table (test semantics of Client.Do,
             client.go:83-153; production: vectorized HTTP per host batch)
    extract  resolve + canonicalize out-links             (functions/urlnorm)
    accept   max-depth / same-host / robots gates          (extract/extract.go,
             ctrl.go:28-32)
    dedupe   first-writer-wins within the batch + anti-join against the
             seen set (handle.go:83-115: Accept → Exist → PutNX)
    ticket   score/next for fresh links + resched/retry of the fetched
             URLs (schedule.go:235-313)
    commit   new frontier / seen / host_state, metrics, emitted log

All state lives in DataFrames; every per-row computation is a column
expression or an Arrow-vectorized UDF; the driver holds only scalars
(virtual clock, seq counter, step number).

Scale design (the 10^10-URL story — test scale just shrinks the numbers):
  * frontier/seen are hash-partitioned by host_key / url; the selection
    operator aggregates per host before any sort, so the per-step working
    set is bounded by (hosts at e_min × per_host_batch_cap).
  * the seen anti-join is the only frontier-sized shuffle per step; an
    optional sharded bloom prefilter (operators/bloom) drops almost all
    true-negatives before it.
  * host_policy is broadcast; AQE handles skewed hosts in the fetch join,
    and `heavy_host_salt` adds explicit salting for the fetch stage.
  * state materialization per step uses localCheckpoint (lineage cut);
    every `snapshot_every` steps the state is durably committed through
    SnapshotStore (Iceberg-snapshot semantics) for exact resume.
  * the frontier never needs to be memory-resident: Spark shuffle spill
    covers the per-step operator paths, and the reference's explicit
    bounded-memory spill queue (Q4 DiskQueue) exists as
    operators/diskqueue.SpilledWaitQueue (hot cached slice + watermarked
    sorted parquet frames) for queue-shaped consumers outside the
    superstep loop.
"""

from __future__ import annotations

import os
from dataclasses import dataclass, field
from typing import Optional

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.types import (
    ArrayType, BooleanType, IntegerType, LongType, StringType, StructField, StructType,
)

from crawler_spark.config import CrawlPolicy
from crawler_spark.functions.urlnorm import canonicalize_udf, resolve_links_udf
from crawler_spark.operators.ordering import dense_ordinal, prio_col, with_emit_order
from crawler_spark.operators.selection import (
    admit_hosts,
    phase1_agg,
    phase1_heads,
    select_batch,
)
from crawler_spark.state.ckpt import checkpoint_cut_stats, release_checkpoint
from crawler_spark.state.snapshot import SnapshotStore

FRONTIER_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host_key", StringType()),
    StructField("next_ms", LongType()),
    StructField("avail_ms", LongType()),
    StructField("score", IntegerType()),
    StructField("prio", IntegerType()),
    StructField("seq", LongType()),
    StructField("depth", IntegerType()),
    StructField("num_retry", IntegerType()),
])

SEEN_SCHEMA = StructType([
    StructField("url", StringType()),
    StructField("host_key", StringType()),
    StructField("depth", IntegerType()),
    StructField("done", BooleanType()),
    StructField("last_ms", LongType()),
    StructField("status", IntegerType()),
    StructField("num_visit", IntegerType()),
    StructField("num_retry", IntegerType()),
    StructField("seq", LongType()),
])

HOST_STATE_SCHEMA = StructType([
    StructField("host_key", StringType()),
    StructField("last_ms", LongType()),
    StructField("interval_ms", LongType()),
    StructField("n_resp", LongType()),  # C6 budget counter (fetch attempts)
])

HOST_POLICY_SCHEMA = StructType([
    StructField("host_key", StringType()),
    StructField("interval_ms", LongType()),
    StructField("max_visits", IntegerType()),
    StructField("robots_disallow", ArrayType(StringType())),
])

# S5: the engine's fetch_cache state — the standard control fields of
# operators/cache.CACHE_SCHEMA plus the test-semantics body stand-in
# (status + raw link list + base_url = what serving the cached response
# must reproduce). Column order defines cache_merge's struct layout.
ENGINE_CACHE_SCHEMA = (
    "url string, fetched_ms long, date_ms long, max_age_ms long, age_ms long, "
    "etag string, last_modified_ms long, need_validate boolean, body_bytes long, "
    "status int, links array<string>, base_url string"
)
_CACHE_JOIN_COLS = (
    "fetched_ms", "date_ms", "max_age_ms", "age_ms", "etag",
    "last_modified_ms", "need_validate", "status", "links", "base_url",
)


_FORCE_CKPT_FALLBACK = False  # tests flip this to exercise the fallback


def _checkpoint(df: DataFrame) -> DataFrame:
    """Materialize + cut lineage AND cut statistics — see
    state/ckpt.checkpoint_cut_stats (shared with the LSM dedup index,
    which hits the same Catalyst stats-poisoning failure mode when its
    fold frames chain). `_FORCE_CKPT_FALLBACK` is the test seam that
    exercises the plain-localCheckpoint fallback path."""
    return checkpoint_cut_stats(df, force_fallback=_FORCE_CKPT_FALLBACK)


# free the blocks of a _checkpoint'ed DataFrame — shared with the other
# iterative loops (connected_components); see state/ckpt.py for why
_release_checkpoint = release_checkpoint


def tag_cancelled(
    selected: DataFrame, host_state: DataFrame, budget: Optional[int]
) -> DataFrame:
    """C6 host budget: pops past ``budget`` total fetches per host are
    cancelled in Prepare and complete without a fetch (make.go:56-62,
    schedule.go:94-101). Within-batch rank follows emission order
    (emit_ms, prio, seq) so the budget boundary matches the serial
    schedule. host_state carries the host's prior response count
    ``n_resp``; broadcast-sized by design."""
    if budget is None:
        return selected.withColumn("cancelled", F.lit(False))
    hs = host_state.select(
        "host_key", F.coalesce("n_resp", F.lit(0)).alias("_n_resp")
    )
    w = Window.partitionBy("host_key").orderBy("emit_ms", "prio", "seq")
    return (
        selected.join(F.broadcast(hs), "host_key", "left")
        .withColumn("_rk", F.row_number().over(w))
        .withColumn(
            "cancelled",
            (F.coalesce("_n_resp", F.lit(0)) + F.col("_rk")) > F.lit(budget),
        )
        .drop("_n_resp", "_rk")
    )


def dedup_member_id(image_id):
    """The member-id mapping the in-loop dedup index folds under:
    xxhash64 of the payload identity (U3's 64-bit URL identity applied
    to image_id — functions/hashing.py). Consumers reproducing index
    labels (tests, entries) must map their ids the same way."""
    return F.xxhash64(image_id)


@dataclass
class CrawlResult:
    emitted: DataFrame  # crawl order log with emit_ord
    seen: DataFrame
    steps: int
    pops: int
    metrics: list = field(default_factory=list)
    fetch_cache: Optional[DataFrame] = None  # final S5 cache state (if enabled)
    # resolved in-loop dedup index (phash, gid, gsz, has_edge, comp) when
    # the engine ran with a payload table — see CrawlEngine(payloads=...)
    dedup_index: Optional[DataFrame] = None


class CrawlEngine:
    def __init__(
        self,
        spark: SparkSession,
        web: DataFrame,
        host_policy: Optional[DataFrame] = None,
        policy: CrawlPolicy = CrawlPolicy(),
        workdir: str = "/tmp/crawler_spark_work",
        mode: str = "exact",
        snapshot_every: int = 0,
        max_steps: int = 100_000,
        max_pops: Optional[int] = None,
        mux=None,
        metrics_level: int = 1,
        enqueue_dir: Optional[str] = None,
        seq_assign: str = "auto",
        seq_offset_threshold: int = 50_000,
        bloom_rebuild_rows: int = 20_000,
        bloom_rebuild_steps: int = 8,
        emit_every: int = 4,
        deferred_emin: str = "auto",
        robots_broadcast_max_hosts: int = 100_000,
        state_maintenance: str = "rewrite",
        compact_rows: int = 500_000,
        compact_steps: int = 8,
        payloads: Optional[DataFrame] = None,
        dedup_radius: int = 6,
        dedup_max_bucket: int = 4096,
        dedup_compact_folds: int = 8,
        dedup_fold_every: int = 4,
        pipeline_phase1: bool = True,
    ):
        self.spark = spark
        self.web = web
        # S4+L1 html mode: a web fixture carrying raw `html` bodies
        # (and no pre-extracted `out_links`) routes every fetched page
        # through the REAL link extractor (functions/extract, incl.
        # <base> rebasing) at fetch time — the loop then does what the
        # reference's handler does to live bodies (handle.go:63-160)
        self.html_mode = "html" in web.columns and "out_links" not in web.columns
        self.policy = policy
        # Per-URL config via the nginx-style mux (operators/mux.UrlMux —
        # mux/mux.go:173-238,280-322): when present, pattern lookups
        # drive link admission (Accept: default-deny filter + the
        # parent's nofollow / follow-depth), ticket scores (Sched and
        # Resched both take the mux score), and per-URL revisit budget
        # (freq overrides host_policy/policy max_visits). Exactness
        # caveat (same as score_expr policies): the default batched
        # 'exact' mode reproduces the serial order when a link's mux
        # score never exceeds its parent's; use mode="serial" for
        # arbitrary preemptive score patterns. Host intervals keep
        # flowing through host_policy (mux.interval_ms can build it).
        self.mux = mux
        if policy.ticket_at == "zero":
            # preemptive tickets: batched bounded-preemption when the
            # policy's score guarantee holds, else one-pop-per-step
            self.mode = (
                "serial"
                if mode == "serial" or not policy.score_nonincreasing_depth
                else "exact_zero"
            )
        else:
            self.mode = mode
        if self.mode == "exact" and not policy.score_nonincreasing_depth:
            # the exact-mode finalization proof (selection.py module doc)
            # REQUIRES link score ≤ parent score; a policy that declares
            # the guarantee broken must not silently get a maybe-wrong
            # batched order — serial mode is exact for ANY policy
            raise ValueError(
                "mode='exact' requires policy.score_nonincreasing_depth: "
                "a link whose score exceeds its parent's can preempt "
                "already-finalized pops. Use mode='serial' (exact for any "
                "policy, one pop per step) or a non-increasing score_expr."
            )
        self.snapshot_every = snapshot_every
        self.max_steps = max_steps
        self.max_pops = max_pops
        self.workdir = workdir
        # S2: directory fed by streaming/enqueue.py; merged at tick starts
        self.enqueue_dir = enqueue_dir
        self.store = SnapshotStore(workdir)
        if host_policy is None:
            host_policy = spark.createDataFrame([], HOST_POLICY_SCHEMA)
        self.host_policy = host_policy.persist()
        # Full RFC 9309 robots gate: when host_policy carries the
        # untranslated rule lists (robots_to_host_policy emits them),
        # links are gated by longest-match evaluation — wildcards, '$'
        # anchors, and Allow overrides — instead of the literal-prefix
        # gate. host_policy is broadcast-sized by design, so the one-time
        # driver collect here is scalar-scale metadata, not row data.
        # Auto-switch by host count (threshold below): the broadcast UDF
        # collects every host's rules to the driver once — right while
        # the robots cache is broadcast-sized — but past the threshold
        # the rules stay a TABLE and the gate becomes robots_gate_join
        # (per-row rules through a hash join; executor memory flat).
        self._robots_gate = None
        self._robots_rules_df = None
        self.robots_broadcast_max_hosts = robots_broadcast_max_hosts
        if policy.obey_robots and "robots_rules" in self.host_policy.columns:
            rules_df = self.host_policy.select("host_key", "robots_rules").where(
                F.size(F.coalesce("robots_rules", F.array())) > 0
            )
            n_rule_hosts = rules_df.count()
            if n_rule_hosts > self.robots_broadcast_max_hosts:
                self._robots_rules_df = rules_df
            elif n_rule_hosts:
                from crawler_spark.functions.robots import robots_gate_udf

                rules = {
                    r["host_key"]: [(bool(x["allow"]), x["pat"]) for x in r["robots_rules"]]
                    for r in rules_df.collect()
                }
                self._robots_gate = robots_gate_udf(spark, rules)
        self.metrics: list[dict] = []
        from concurrent.futures import ThreadPoolExecutor

        # concurrent job submission for the independent per-step actions
        # (metrics probe + up to 5 state checkpoints with cache on + LSM
        # consumed-frame + dedup id-frame + the next step's phase-1
        # precompute = up to 8 concurrent tasks). INVARIANT: any task
        # that BLOCKS on sibling futures (today only the phase-1
        # precompute) must be submitted LAST, after every future it
        # awaits — FIFO then guarantees its dependencies hold workers,
        # not queue slots, so the pool cannot deadlock even when full.
        self._pool = ThreadPoolExecutor(max_workers=8)
        # Pipelined phase-1 selection (exact modes): the NEXT step's
        # per-host-heads aggregate depends only on the new frontier +
        # host_state being checkpointed anyway, so its one driver
        # round-trip job rides the state-checkpoint wall instead of
        # opening the next step (4 sequential job walls/step → 3).
        # Same jobs, strictly more overlap, bit-identical scalars —
        # disabled when a runtime-enqueue dir can mutate the frontier
        # between steps (the merge invalidates the precomputed view).
        self.pipeline_phase1 = pipeline_phase1
        self._p1_fut = None  # None | Future | resolved Row
        self._p1_hits = 0  # steps that consumed a precomputed row
        self._p1_failures = 0  # precompute tasks that raised (warned once)
        # M5: sharded bloom prefilter in front of the exact seen anti-join
        # (never rejects alone — storage/boltstore's bloom-only Exist can
        # drop URLs; the north rule demands the exact set)
        self.bloom = None
        if policy.bloom_prefilter:
            if policy.seen_filter == "cuckoo":
                from crawler_spark.operators.cuckoo import CuckooShards

                # equal memory to the bloom sizing: 16-bit fp × 4 slots
                # per bucket = 64 bits/bucket
                self.bloom = CuckooShards(
                    policy.bloom_shards, max(16, policy.bloom_bits_per_shard // 64)
                )
            else:
                from crawler_spark.operators.bloom import BloomShards, optimal_k

                self.bloom = BloomShards(
                    policy.bloom_shards,
                    policy.bloom_bits_per_shard,
                    optimal_k(policy.bloom_bits_per_shard, 1_000_000 // policy.bloom_shards),
                )
        # LSM-style bloom maintenance: the broadcast shards cover seen
        # rows with seq < _bloom_cover_seq; newer rows are the "recent"
        # slice handled by a broadcast anti-join in prefilter_fresh. A
        # distributed rebuild (BloomShards.build — no driver collect of
        # row data) folds the slice in every `bloom_rebuild_steps` steps
        # or when it exceeds `bloom_rebuild_rows` rows.
        self._bloom_cover_seq = 0
        self._bloom_recent_rows = 0
        self._bloom_steps_since_rebuild = 0
        self.n_bloom_rebuilds = 0
        self.bloom_rebuild_rows = bloom_rebuild_rows
        self.bloom_rebuild_steps = bloom_rebuild_steps
        # seq assignment: "window" = single global sort window (fine for
        # small per-step batches), "offset" = range-partition + per-
        # partition prefix offsets (no single-task sort — the 100× path),
        # "auto" = offset once a step's new items exceed the threshold.
        self.seq_assign = seq_assign
        self.seq_offset_threshold = seq_offset_threshold
        self._last_n_items = 0
        self._last_seq_mode = None
        # State maintenance strategy. "rewrite" re-materializes the full
        # frontier/seen every step (simple; per-step cost O(|state|)).
        # "lsm" is the 10^10-URL path: frontier/seen live as an immutable
        # checkpointed BASE plus small per-step frames —
        #   frontier = (base ∪ add-frames) ⟕̸ broadcast(consumed seqs)
        #   seen     = base + one merged upsert DELTA (latest row wins)
        # so each step writes O(step delta) instead of O(|state|); the
        # full-state rewrite amortizes to the compaction cadence below,
        # which also re-covers the bloom/cuckoo shards (the seen delta IS
        # the filter's recent slice — one unified LSM).
        if state_maintenance not in ("rewrite", "lsm"):
            raise ValueError(f"state_maintenance: {state_maintenance!r}")
        self.state_maintenance = state_maintenance
        self.compact_rows = compact_rows
        self.compact_steps = compact_steps
        self._f_base = None
        self._f_adds: list = []
        self._f_cons: list = []
        self._s_base = None
        self._s_delta = None
        self._lsm_delta_rows = 0
        self._lsm_cons_rows = 0
        self._lsm_steps = 0
        self.n_compactions = 0
        # L8 trap guard state (trap_check_every > 1 keeps a stale list)
        self._traps = None
        self._trap_steps_since_refresh = 0
        # emitted-log write batching: one partitioned write job per
        # `emit_every` steps instead of one per step
        self.emit_every = max(1, emit_every)
        self._emit_buf: list = []
        # 0 = no per-step metric jobs (throughput runs); 1 = per-step
        # outcome/link counters (C8 metrics, extra Spark jobs per step)
        self.metrics_level = metrics_level
        # deferred e_min (exact mode only): fold the phase-1 scalar into
        # the consumer plan instead of a driver .first() round-trip.
        # Measured SLOWER wherever the driver round-trip is cheap — both
        # single-JVM local mode AND a same-host 4-executor local-cluster
        # (interleaved on/off loop reps: best 46 vs 84 URLs/s; the two
        # extra broadcast-agg stages cost more than the saved .first()).
        # "auto" therefore enables it only for genuinely remote masters
        # (spark://, yarn, k8s), where a driver round-trip is a
        # network-latency job gap this sandbox cannot reproduce.
        # In-loop incremental dedupe (the north rule's "fetch/dedupe
        # metrics" made literal): when a payload table (input_hint shape:
        # image_id, ..., phash) is supplied and the web fixture keys its
        # pages to it via an `image_id` column, the loop folds each
        # step's first-visit ok pops into a persisted LSMPhashIndex —
        # O(step delta) per fold (operators/incremental.py), compaction
        # on a fold cadence, index resumable from snapshots. The payload
        # join is the deterministic stand-in for computing phash from
        # the fetched bytes (multimodal.extract_features does exactly
        # that in production — the bytes never need to enter this loop).
        # The reference folds each new fingerprint into its BK-tree the
        # same way, one at a time (bktree.go:21-62); here it's batched.
        # Contract: image_id is the payload identity of the fetched page
        # (unique per url) and castable to long — at production scale
        # that is the URL's 64-bit hash (U3, functions/hashing.py).
        self.payloads = payloads
        self.dedup_radius = dedup_radius
        self.dedup_max_bucket = dedup_max_bucket
        self.dedup_compact_folds = max(1, dedup_compact_folds)
        self._dedup = None
        self._dedup_folds = 0
        self.n_dedup_compactions = 0
        # fold cadence: per-step image deltas are tiny checkpointed
        # frames; the index fold (a ~10-job pipeline whose cost is
        # dominated by fixed stage latency at batch sizes below ~10^6)
        # amortizes over `dedup_fold_every` steps — the same cadence
        # discipline as LSM compaction and the bloom rebuild. Exactly-
        # once across the cadence is structural: a url first-visits
        # once, and image_id is unique per url (the payload contract).
        self.dedup_fold_every = max(1, dedup_fold_every)
        self._dedup_pending: list = []
        self._dedup_pending_rows = 0
        if payloads is not None:
            if "image_id" not in web.columns:
                raise ValueError(
                    "payloads given but the web table has no image_id column"
                )
            from crawler_spark.operators.incremental import LSMPhashIndex

            empty = spark.createDataFrame(
                [], "phash long, gid long, gsz long, has_edge boolean, comp long"
            )
            self._dedup = LSMPhashIndex(
                empty, radius=dedup_radius, max_bucket=dedup_max_bucket
            )
            self._payload_phash = payloads.select("image_id", "phash")
        if deferred_emin == "auto":
            master = spark.sparkContext.master
            # "local" (bare), "local[N]", and "local-cluster[...]" all run
            # on this host where the driver round-trip is cheap.
            self.deferred_emin = self.mode == "exact" and not master.startswith("local")
        else:
            self.deferred_emin = deferred_emin == "on" and self.mode == "exact"

    # ------------------------------------------------------------------ #
    def _init_state(self, seeds: list[str]):
        """Seed injection: normalize → first-writer dedupe → depth-0
        tickets (crawler.go:120-140). Invalid seeds are dropped and
        counted (the reference aborts; a batch engine records instead)."""
        spark = self.spark
        raw = spark.createDataFrame([(s, i) for i, s in enumerate(seeds)], ["raw", "ord"])
        c = raw.select("ord", canonicalize_udf("raw").alias("c")).select("ord", "c.*")
        valid = c.where("valid")
        w_dup = Window.partitionBy("url").orderBy("ord")
        w_seq = Window.orderBy("ord")
        seed_score = (
            self.mux.config_udf()(F.col("url"))["score"]
            if self.mux is not None
            else F.expr(self.policy.score_expr)
        )
        seeded = (
            valid.withColumn("rn", F.row_number().over(w_dup))
            .where("rn = 1")
            .withColumn("seq", (F.row_number().over(w_seq) - 1).cast("long"))
            .withColumn("depth", F.lit(0))
            .withColumn("score", seed_score.cast("int"))
        )
        frontier = seeded.select(
            "url",
            "host_key",
            F.lit(0).cast("long").alias("next_ms"),
            F.lit(0).cast("long").alias("avail_ms"),
            "score",
            prio_col(F.col("score")).alias("prio"),
            "seq",
            "depth",
            F.lit(0).alias("num_retry"),
        )
        seen = seeded.select(
            "url",
            "host_key",
            "depth",
            F.lit(False).alias("done"),
            F.lit(None).cast("long").alias("last_ms"),
            F.lit(None).cast("int").alias("status"),
            F.lit(0).alias("num_visit"),
            F.lit(0).alias("num_retry"),
            "seq",
        )
        host_state = self.host_policy.select(
            "host_key",
            F.lit(None).cast("long").alias("last_ms"),
            "interval_ms",
            F.lit(0).cast("long").alias("n_resp"),
        )
        n_invalid = c.where(~F.col("valid")).count()
        frontier = _checkpoint(frontier)
        seq_base = frontier.count()
        fetch_cache = (
            _checkpoint(spark.createDataFrame([], ENGINE_CACHE_SCHEMA))
            if self.policy.cache_enabled
            else None
        )
        # bloom starts empty with cover_seq=0: every seed sits in the
        # "recent" slice until the first cadence rebuild — exact by design
        return (
            frontier, _checkpoint(seen), _checkpoint(host_state), fetch_cache,
            seq_base, n_invalid,
        )

    # ------------------------------------------------------------------ #
    def _tag_cancelled(self, selected: DataFrame, host_state: DataFrame) -> DataFrame:
        return tag_cancelled(selected, host_state, self.policy.max_fetches_per_host)

    # ticket-parquet bytes past which drain seq assignment goes
    # distributed (≈ several hundred thousand ticket rows)
    _DRAIN_OFFSET_BYTES = 8 << 20

    def _assign_drain_seq(
        self, fresh: DataFrame, seq_base: int, drained_files: list
    ) -> DataFrame:
        """seq for drained enqueue tickets, dense in ORDER BY url (the
        drain's deterministic insertion order; url is unique after the
        first-writer dedupe, so the key is a strict total order).
        Small batches — the common case — pay one tiny window; past
        ``_DRAIN_OFFSET_BYTES`` of listed ticket parquet the global
        window would be a single-task sort of the whole batch, so the
        range-partition + prefix-offset form (dense_ordinal, the same
        machinery as step seq and emit_ord) takes over. The switch is
        keyed on the listed files' byte size — known before any Spark
        job runs, unlike a row count."""
        try:
            nbytes = sum(os.path.getsize(p) for p in drained_files)
        except OSError:  # listing raced the stream: assume large
            nbytes = self._DRAIN_OFFSET_BYTES
        if nbytes >= self._DRAIN_OFFSET_BYTES:
            return _checkpoint(
                dense_ordinal(
                    fresh, ["url"], base=seq_base, out_col="seq",
                    dtype="long", checkpoint=_checkpoint,
                )
            )
        w = Window.orderBy("url")
        return _checkpoint(
            fresh.withColumn(
                "seq", (F.row_number().over(w) - 1 + F.lit(seq_base)).cast("long")
            )
        )

    def _merge_enqueued(self, frontier, seen, seq_base, step):
        """S2: fold streamed-in tickets into frontier+seen at a tick
        boundary (the batch analog of Enqueue feeding scheduler.NewIn,
        crawler.go:143-158).

        Exactly-once protocol:
          * drain_enqueued reads an explicit file list; only THOSE files
            are consumed below — parts appended by the live stream after
            the listing stay in place for the next tick (no silent loss).
          * consumed files are moved (not deleted) to
            ``enqueue_consumed/step=<step>``; ``resume()`` replays every
            consumed dir newer than the snapshot it restores, and the
            seen anti-join here deduplicates any replayed URL that had
            already reached a committed snapshot — at-least-once replay +
            exact dedupe = exactly-once URLs."""
        from crawler_spark.streaming.enqueue import drain_enqueued

        drained, drained_files = drain_enqueued(self.spark, self.enqueue_dir)
        if drained is None:
            return frontier, seen, seq_base
        w = Window.partitionBy("url").orderBy("url")
        fresh = (
            drained.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
            .join(seen.select("url"), "url", "left_anti")
        )
        fresh = self._assign_drain_seq(fresh, seq_base, drained_files)
        n = fresh.count()
        if n:
            frontier = _checkpoint(frontier.unionByName(fresh.select(*[f.name for f in FRONTIER_SCHEMA.fields])))
            seen = _checkpoint(seen.unionByName(fresh.select(
                "url", "host_key", "depth",
                F.lit(False).alias("done"),
                F.lit(None).cast("long").alias("last_ms"),
                F.lit(None).cast("int").alias("status"),
                F.lit(0).alias("num_visit"),
                F.lit(0).alias("num_retry"),
                "seq",
            )))
            self._bloom_recent_rows += n  # enqueued rows join the recent slice
        _release_checkpoint(fresh)  # frontier/seen checkpoints hold the rows now
        # consume EXACTLY the files the drained read listed (parts
        # appended since the listing drain next tick); fresh/frontier
        # are already materialized via _checkpoint at this point
        self._consume_enqueue_files(drained_files, step)
        return frontier, seen, seq_base + n

    def _replay_consumed_after(self, snapshot_step: int) -> int:
        """Resume support: consumed enqueue files from merges newer than
        the restored snapshot never reached a committed state — move them
        back into enqueue_dir so the next tick re-merges them (the seen
        anti-join drops anything the snapshot already has). A merge
        recorded under ``step=k`` is first durable in snapshot k+1, so
        replay every dir with step >= snapshot_step."""
        if not self.enqueue_dir:
            return 0
        root = os.path.join(self.workdir, "enqueue_consumed")
        if not os.path.isdir(root):
            return 0
        n = 0
        for d in sorted(os.listdir(root)):
            if not d.startswith("step="):
                continue
            if int(d.split("=", 1)[1]) < snapshot_step:
                continue
            src = os.path.join(root, d)
            for fn in os.listdir(src):
                os.rename(os.path.join(src, fn),
                          os.path.join(self.enqueue_dir, f"replay_{d}_{fn}"))
                n += 1
            os.rmdir(src)
        return n

    def _bloom_rebuild(self, seen: DataFrame, cover_seq: int) -> None:
        """Distributed rebuild of the bloom shards from the full seen set
        (one applyInPandas pass per shard — the driver receives finished
        bitmaps only, never row data), advancing the coverage watermark
        so the recent slice resets to empty."""
        if self.bloom is None:
            return
        old = self.bloom
        p = self.policy
        hashes = seen.select(F.xxhash64("url").alias("url_hash"))
        if p.seen_filter == "cuckoo":
            from crawler_spark.operators.cuckoo import CuckooShards

            self.bloom = CuckooShards.build(
                hashes,
                "url_hash",
                n_shards=p.bloom_shards,
                buckets_per_shard=max(16, p.bloom_bits_per_shard // 64),
            )
        else:
            from crawler_spark.operators.bloom import BloomShards

            self.bloom = BloomShards.build(
                hashes,
                "url_hash",
                n_shards=p.bloom_shards,
                bits_per_shard=p.bloom_bits_per_shard,
                expected_n=max(cover_seq, 1),
            )
        old.release()
        self._bloom_cover_seq = cover_seq
        self._bloom_recent_rows = 0
        self._bloom_steps_since_rebuild = 0
        self.n_bloom_rebuilds += 1

    def _bloom_after_step(self, seen: DataFrame, seq_base: int, n_new: int) -> None:
        """Advance the recent-slice bookkeeping; rebuild on cadence."""
        if self.bloom is None:
            return
        self._bloom_recent_rows += n_new
        self._bloom_steps_since_rebuild += 1
        if (
            self._bloom_recent_rows >= self.bloom_rebuild_rows
            or self._bloom_steps_since_rebuild >= self.bloom_rebuild_steps
        ):
            self._bloom_rebuild(seen, seq_base)

    # ---------------- pipelined phase-1 selection ---------------------- #
    def _p1_settle(self) -> None:
        """Resolve a pending phase-1 precompute IN PLACE (Future → Row).
        Must run before any operation that releases checkpoint blocks
        the precompute job may still be reading (LSM compaction folds
        and frees the frontier frames; the agg row itself stays valid —
        compaction never changes frontier CONTENT).

        A failed precompute falls back to the synchronous .first() in
        select_batch — correct either way — but is NOT silent: the
        first failure warns (a permanently broken precompute would
        otherwise quietly re-pay the per-step driver round-trip), and
        `self._p1_failures` counts them for tests/diagnosis."""
        from concurrent.futures import Future

        if isinstance(self._p1_fut, Future):
            try:
                self._p1_fut = self._p1_fut.result()
            except Exception as exc:
                self._p1_failures += 1
                if self._p1_failures == 1:
                    import warnings

                    warnings.warn(
                        "phase-1 precompute failed; falling back to the "
                        f"synchronous selection aggregate: {exc!r}"
                    )
                self._p1_fut = None

    def _p1_take(self):
        """Consume the precomputed phase-1 row (or None)."""
        self._p1_settle()
        row, self._p1_fut = self._p1_fut, None
        if row is not None:
            self._p1_hits += 1
        return row

    def _phase1_precompute(
        self, lsm, f_base, adds, conss, f_fut, cons_fut, h_fut, c_fut,
        step_done, pops_done,
    ):
        """Pool task: the NEXT step's phase-1 aggregate, overlapped with
        the current step's state-checkpoint wall. Rebuilds the exact
        frontier view the next loop iteration will see from the frame
        SNAPSHOTS passed in (the driver mutates its lists after this
        task is submitted) + the in-flight checkpoint futures. Returns
        the agg Row, or None when the loop is about to terminate (then
        no frame may be touched — the terminal branch releases them)."""
        cnt_rows = c_fut.result()
        n_sel = sum(r["n"] for r in cnt_rows if r["t"] == "s")
        if n_sel == 0:
            return None  # terminal: loop breaks/errors before next select
        if self.max_pops is not None and pops_done + n_sel >= self.max_pops:
            return None  # loop exits at the top — skip the wasted job
        if step_done >= self.max_steps:
            return None
        nf = f_fut.result()
        nh = h_fut.result()
        if lsm:
            frontier = self._frontier_view(
                base=f_base, adds=[*adds, nf],
                conss=[*conss, cons_fut.result()],
            )
        else:
            frontier = nf
        p = self.policy
        if p.max_hosts is not None:
            frontier = admit_hosts(frontier, p.max_hosts)
        heads = phase1_heads(
            frontier, nh, default_interval_ms=p.default_interval_ms
        )
        return phase1_agg(heads).first()

    # ---------------- LSM state maintenance (state_maintenance="lsm") #
    def _frontier_view(self, base=None, adds=None, conss=None) -> DataFrame:
        """Pending frontier = (base ∪ add-frames) minus consumed seqs.
        The consumed side is per-step frames of ONE long column, bounded
        by the compaction cadence — broadcast it so the anti-join never
        shuffles the base (selection scans the view twice per step; a
        broadcast filter keeps both scans shuffle-free).

        Defaults read the live engine state; the phase-1 precompute
        passes explicit (base, adds, conss) snapshots so BOTH consumers
        share this one composition (no drift between the precomputed
        view and the one the next iteration selects from)."""
        base = self._f_base if base is None else base
        adds = self._f_adds if adds is None else adds
        conss = self._f_cons if conss is None else conss
        v = base
        for fr in adds:
            v = v.unionByName(fr)
        if conss:
            cons = conss[0]
            for c in conss[1:]:
                cons = cons.unionAll(c)
            v = v.join(F.broadcast(cons), "seq", "left_anti")
        return v

    def _seen_view(self) -> DataFrame:
        """Membership/census view: base ∪ delta WITHOUT latest-row
        resolution. A url updated since the last compaction appears
        twice (stale base row + delta row) — sound for every reader of
        this view (anti-join membership, distinct-prefix census, seq>=
        cover recent-slice), all of which are duplicate-insensitive.
        Latest-VALUE lookups go through the precedence join in _fetch."""
        return self._s_base.unionByName(self._s_delta)

    def _empty_seen(self) -> DataFrame:
        return self.spark.createDataFrame([], SEEN_SCHEMA)

    def _lsm_compact(self, seq_base: int, rebuild_filter: bool = True) -> None:
        """Fold the frames into fresh bases (the amortized full rewrite)
        and re-cover the bloom/cuckoo shards from the compacted seen —
        after which the recent slice (seq >= cover) is empty again. The
        folds run SEQUENTIALLY: compaction is the amortized path where
        peak memory matters more than latency (two concurrent full-state
        folds measured an executor-memory OOM at a 15M-row frontier that
        the sequential form clears)."""
        if not (self._f_adds or self._f_cons or self._lsm_delta_rows):
            return  # nothing staged — the bases ARE the state
        # a pipelined phase-1 job may still be reading the frames this
        # compaction is about to release — wait for its (content-stable)
        # scalar before freeing blocks
        self._p1_settle()
        new_f = _checkpoint(self._frontier_view())
        new_s = _checkpoint(
            self._s_base.join(self._s_delta.select("url"), "url", "left_anti")
            .unionByName(self._s_delta)
        )
        for old in (self._f_base, self._s_base, self._s_delta, *self._f_adds, *self._f_cons):
            _release_checkpoint(old)
        self._f_base, self._f_adds, self._f_cons = new_f, [], []
        self._s_base, self._s_delta = new_s, self._empty_seen()
        self._lsm_delta_rows = self._lsm_cons_rows = self._lsm_steps = 0
        self.n_compactions += 1
        if rebuild_filter and self.bloom is not None:
            self._bloom_rebuild(new_s, seq_base)

    def _lsm_after_step(self, n_sel: int, n_items: int, seq_base: int) -> None:
        """Advance frame bookkeeping; compact when any frame family
        crosses the cadence (consumed is also the broadcast-size bound)."""
        self._lsm_steps += 1
        self._lsm_delta_rows += n_sel + n_items
        self._lsm_cons_rows += n_sel
        if (
            self._lsm_steps >= self.compact_steps
            or self._lsm_delta_rows >= self.compact_rows
            or self._lsm_cons_rows >= self.compact_rows
        ):
            self._lsm_compact(seq_base)

    def _consume_enqueue_files(self, drained_files, step: int) -> None:
        consumed = os.path.join(self.workdir, "enqueue_consumed", f"step={step}")
        os.makedirs(consumed, exist_ok=True)
        for path in drained_files:
            os.rename(path, os.path.join(consumed, os.path.basename(path)))

    def _merge_enqueued_lsm(self, seq_base: int, step: int) -> int:
        """S2 merge under LSM state: enqueued tickets append a frontier
        add-frame and fold into the seen delta (urls are anti-joined
        against the full view first, so delta stays upsert-unique).
        Same exactly-once file protocol as _merge_enqueued."""
        from crawler_spark.streaming.enqueue import drain_enqueued

        drained, drained_files = drain_enqueued(self.spark, self.enqueue_dir)
        if drained is None:
            return seq_base
        w = Window.partitionBy("url").orderBy("url")
        fresh = (
            drained.withColumn("rn", F.row_number().over(w)).where("rn = 1").drop("rn")
            .join(self._seen_view().select("url"), "url", "left_anti")
        )
        fresh = self._assign_drain_seq(fresh, seq_base, drained_files)
        n = fresh.count()
        if n:
            add = _checkpoint(fresh.select(*[f.name for f in FRONTIER_SCHEMA.fields]))
            new_delta = _checkpoint(
                self._s_delta.unionByName(
                    fresh.select(
                        "url", "host_key", "depth",
                        F.lit(False).alias("done"),
                        F.lit(None).cast("long").alias("last_ms"),
                        F.lit(None).cast("int").alias("status"),
                        F.lit(0).alias("num_visit"),
                        F.lit(0).alias("num_retry"),
                        "seq",
                    )
                )
            )
            self._f_adds.append(add)
            _release_checkpoint(self._s_delta)
            self._s_delta = new_delta
            self._lsm_delta_rows += n
        _release_checkpoint(fresh)
        self._consume_enqueue_files(drained_files, step)
        return seq_base + n

    def _web_cols(self, with_cache: bool = False):
        web = self.web
        if with_cache:
            # a web fixture without cache-header columns = every response
            # uncacheable (all routes 'miss', cache stays empty)
            for c, t in (
                ("cache_max_age_ms", "long"),
                ("cache_etag", "string"),
                ("cache_need_validate", "boolean"),
            ):
                if c not in web.columns:
                    web = web.withColumn(c, F.lit(None).cast(t))
        extra_src = (
            [
                F.col("cache_max_age_ms").alias("w_cma"),
                F.col("cache_etag").alias("w_etag"),
                F.col("cache_need_validate").alias("w_nv"),
            ]
            if with_cache
            else []
        )
        extra_tgt = (
            [
                F.col("cache_max_age_ms").alias("t_cma"),
                F.col("cache_etag").alias("t_etag"),
                F.col("cache_need_validate").alias("t_nv"),
            ]
            if with_cache
            else []
        )
        if self.html_mode:
            # html mode carries the raw body through the join; link
            # extraction happens AFTER it, on the popped rows only (the
            # UDF never runs over the whole web table)
            src_links = F.col("html").alias("w_html")
            tgt_links = F.col("html").alias("t_html")
        else:
            src_links = F.col("out_links").alias("w_links")
            tgt_links = F.col("out_links").alias("t_links")
        if self._dedup is not None:
            # payload identity rides the fetch (S6/dedupe: the page's
            # image keys into the payload table at fold time). Source
            # side only: a redirect pop re-serves the TARGET's payload,
            # which folds exactly once when the target itself is popped
            # (follow_redirects injects it as a link) — folding it under
            # the redirecting url too would double-count the image.
            extra_src = extra_src + [F.col("image_id").alias("w_img")]
        src = web.select(
            "url",
            F.col("status").alias("w_status"),
            src_links,
            "redirect_to",
            *extra_src,
        )
        tgt = web.select(
            F.col("url").alias("redirect_to"),
            F.col("status").alias("t_status"),
            tgt_links,
            *extra_tgt,
        )
        return src, tgt

    def _fetch(
        self, selected: DataFrame, seen: DataFrame,
        fetch_cache: Optional[DataFrame] = None,
        seen_delta: Optional[DataFrame] = None,
    ) -> DataFrame:
        """Test-semantics fetch: join the web fixture (deterministic stand-in
        for Client.Do, client.go:83-153), one redirect hop resolved
        (fetch.go:73-81), status classified per client.go:120-136.

        With ``fetch_cache`` (S5, client.go:98-113): each pop is routed
        hit/revalidate/miss at its own emit_ms; 'hit' serves the cached
        (status, links, base_url) — the web columns are ignored for that
        row, which is the batch phrasing of "no network fetch";
        'revalidate' compares the cached etag against the response's
        current etag — a match is a 304 (serve cached body, refresh
        control fields), a mismatch is a full response. The merge inputs
        (merge_status / resp_*) ride the fetched frame so the post-step
        cache MERGE is pure column logic."""
        p = self.policy
        use_cache = fetch_cache is not None
        src, tgt = self._web_cols(with_cache=use_cache)
        _lookup = ("last_ms", "num_visit", "num_retry", "seq")
        _out = ("old_last_ms", "old_num_visit", "old_num_retry", "seen_seq")
        if seen_delta is None:
            seenj = seen.select(
                "url", *[F.col(c).alias(o) for c, o in zip(_lookup, _out)]
            )
            f = selected.join(seenj, "url", "left")
        else:
            # LSM latest-value lookup: ROW precedence (delta row wins
            # over the stale base row for the same url — per-column
            # coalesce would be wrong: delta rows carry legitimate
            # NULLs, e.g. last_ms of a never-visited insert). `seen`
            # here is the BASE; both probes key the small selected
            # batch, so neither side rewrites state.
            d = seen_delta.select(
                "url",
                *[F.col(c).alias(f"_d_{c}") for c in _lookup],
                F.lit(True).alias("_d_has"),
            )
            b = seen.select(
                "url", *[F.col(c).alias(f"_b_{c}") for c in _lookup]
            )
            f = selected.join(d, "url", "left").join(b, "url", "left")
            for c, o in zip(_lookup, _out):
                f = f.withColumn(
                    o,
                    F.when(F.col("_d_has"), F.col(f"_d_{c}")).otherwise(
                        F.col(f"_b_{c}")
                    ),
                )
            f = f.drop(
                "_d_has", *[f"_d_{c}" for c in _lookup], *[f"_b_{c}" for c in _lookup]
            )
        if use_cache:
            cj = fetch_cache.select(
                "url", *[F.col(c).alias(f"c_{c}") for c in _CACHE_JOIN_COLS]
            )
            f = f.join(cj, "url", "left")
        f = f.join(src, "url", "left").join(tgt, "redirect_to", "left")
        eff_status = F.when(
            F.col("redirect_to").isNotNull(), F.coalesce("t_status", F.lit(0))
        ).otherwise(F.coalesce("w_status", F.lit(0)))
        base_url = F.coalesce("redirect_to", "url")
        inject = F.col("redirect_to").isNotNull() & F.lit(p.follow_redirects)
        if self.html_mode:
            # tokenize the fetched body against its FINAL url (after the
            # redirect hop — links resolve against the response URL,
            # handle.go:66-76); one Arrow batch per fetched frame
            from crawler_spark.functions.extract import href_urls_udf

            eff_html = F.when(
                F.col("redirect_to").isNotNull(), F.col("t_html")
            ).otherwise(F.col("w_html"))
            # measured r5 (tools/href_fast_bench.py): a regexp pre-scan
            # (JVM or python-re) is 0.46-1.2x the tokenizer — html.parser
            # is C-find-driven and per-link RESOLUTION dominates either
            # way, so the hot path stays on the plain tokenizer UDF;
            # extract.href_urls_auto remains as the optional scan face
            eff_links = F.coalesce(
                href_urls_udf()(base_url, eff_html), F.array().cast("array<string>")
            )
        else:
            eff_links = F.when(
                F.col("redirect_to").isNotNull(), F.coalesce("t_links", F.array().cast("array<string>"))
            ).otherwise(F.coalesce("w_links", F.array().cast("array<string>")))
        links_arr = F.when(
            inject, F.concat(F.array(F.col("redirect_to")), eff_links)
        ).otherwise(eff_links)

        cache_cols = []
        if use_cache:
            from crawler_spark.operators.cache import CACHEABLE_STATUS, cache_route_col

            route = F.when(F.col("cancelled"), F.lit(None).cast("string")).otherwise(
                cache_route_col(F.col("emit_ms"), prefix="c_")
            )
            eff_cma = F.when(F.col("redirect_to").isNotNull(), F.col("t_cma")).otherwise(F.col("w_cma"))
            eff_etag = F.when(F.col("redirect_to").isNotNull(), F.col("t_etag")).otherwise(F.col("w_etag"))
            eff_nv = F.coalesce(
                F.when(F.col("redirect_to").isNotNull(), F.col("t_nv")).otherwise(F.col("w_nv")),
                F.lit(False),
            )
            f = f.withColumn("cache_route", route)
            r304 = (
                (F.col("cache_route") == "revalidate")
                & F.col("c_etag").isNotNull()
                & eff_etag.isNotNull()
                & (F.col("c_etag") == eff_etag)
            )
            served_cached = (F.col("cache_route") == "hit") | r304
            eff_status = F.when(served_cached, F.col("c_status")).otherwise(eff_status)
            links_arr = F.when(served_cached, F.col("c_links")).otherwise(links_arr)
            base_url = F.when(served_cached, F.col("c_base_url")).otherwise(base_url)
            merge_status = F.when(r304, F.lit(304)).otherwise(
                F.when(F.col("redirect_to").isNotNull(), F.coalesce("t_status", F.lit(0)))
                .otherwise(F.coalesce("w_status", F.lit(0)))
            )
            resp_cacheable = eff_cma.isNotNull() & (
                r304 | merge_status.isin(list(CACHEABLE_STATUS))
            )
            cache_cols = [
                F.col("cache_route"),
                merge_status.cast("int").alias("merge_status"),
                resp_cacheable.alias("resp_cacheable"),
                eff_cma.cast("long").alias("resp_max_age_ms"),
                eff_etag.alias("resp_etag"),
                eff_nv.alias("resp_need_validate"),
            ]
        else:
            cache_cols = [F.lit(None).cast("string").alias("cache_route")]

        f = f.withColumn(
            "status",
            F.when(F.col("cancelled"), F.lit(None)).otherwise(eff_status).cast("int"),
        ).withColumn(
            "outcome",
            F.when(F.col("cancelled"), F.lit("cancel"))  # C6: Prepare-cancel
            .when((F.col("status") >= 200) & (F.col("status") < 300), F.lit("ok"))
            .when(
                (F.col("status") >= 500)
                | ((F.col("status") >= 400) & (F.col("status") != 404))
                | (F.col("status") == 0),
                F.lit("retry"),
            )
            .otherwise(F.lit("drop")),
        )
        mux_cols = []
        if self.mux is not None:
            # one Arrow batch per step evaluates every mux key for the
            # popped urls (Resched score/freq + the parent follow gate);
            # materialized as a single struct column so the UDF runs once
            f = f.withColumn("_mcfg", self.mux.config_udf()(F.col("url")))
            mux_cols = [
                F.col("_mcfg.score").alias("mux_score"),
                F.col("_mcfg.freq").alias("mux_freq"),
                F.col("_mcfg.follow_depth").alias("mux_follow_depth"),
                F.col("_mcfg.nofollow").alias("mux_nofollow"),
            ]
        img_cols = []
        if self._dedup is not None:
            # payload identity of CANONICALLY fetched pages only — a
            # redirect pop serves the target's payload, which folds when
            # the target itself is popped (see _web_cols)
            img_cols = [
                F.when(F.col("redirect_to").isNull(), F.col("w_img")).alias(
                    "image_id"
                )
            ]
        return f.select(
            "url", "host_key", "depth", "score", "prio", "seq", "emit_ms",
            "cancelled",
            "old_last_ms", "old_num_visit", "old_num_retry", "seen_seq",
            "status", "outcome",
            base_url.alias("base_url"), links_arr.alias("links_arr"),
            *cache_cols,
            *mux_cols,
            *img_cols,
        )

    def _extract_links(self, fetched: DataFrame, seen: DataFrame):
        """links of OK responses: resolve → canonicalize → accept gates →
        first-writer dedupe → anti-join seen (handle.go:83-115)."""
        p = self.policy
        ok = fetched.where("outcome = 'ok'")
        if self.mux is not None:
            # parent follow gate (mux DoNotFollow / SetMaxDepth applied
            # to the PAGE, mux.go follow semantics): a nofollow page, or
            # one at/past its follow-depth, contributes no links
            ok = ok.where(
                ~F.col("mux_nofollow")
                & ((F.col("mux_follow_depth") < 0) | (F.col("depth") < F.col("mux_follow_depth")))
            )
        lk = ok.select(
            F.col("emit_ms").alias("p_emit"),
            F.col("prio").alias("p_prio"),
            F.col("seq").alias("p_seq"),
            F.col("depth").alias("p_depth"),
            F.col("host_key").alias("p_host"),
            F.posexplode(resolve_links_udf("base_url", "links_arr")).alias("ordinal", "c"),
        )
        lk = lk.select(
            "p_emit", "p_prio", "p_seq", "p_depth", "p_host", "ordinal",
            F.col("c.url").alias("url"),
            F.col("c.host_key").alias("host_key"),
            F.col("c.path").alias("path"),
            F.col("c.valid").alias("valid"),
        )
        if self.metrics_level >= 1:
            # persisted so the items checkpoint fills the cache and the
            # combined count job re-reads it (no second UDF pass, no
            # dedicated count actions — stats ride the step's one
            # counting job, see _loop)
            lk = lk.persist()
        good = lk.where("valid").withColumn("depth", F.col("p_depth") + 1)
        if p.max_depth is not None:
            good = good.where(F.col("depth") <= p.max_depth)
        if p.same_host_only:
            good = good.where(F.col("host_key") == F.col("p_host"))
        if p.obey_robots:
            if self._robots_gate is not None:
                # full longest-match evaluation (wildcards / '$' / Allow)
                good = good.where(self._robots_gate(F.col("host_key"), F.col("path")))
            elif self._robots_rules_df is not None:
                # beyond-broadcast host count: join-based gate (see
                # __init__'s auto-switch; robots.py:robots_gate_join)
                from crawler_spark.functions.robots import robots_gate_join

                good = robots_gate_join(good, self._robots_rules_df)
            else:
                hp = self.host_policy.select("host_key", "robots_disallow")
                good = good.join(F.broadcast(hp), "host_key", "left").where(
                    ~F.coalesce(
                        F.exists("robots_disallow", lambda pre: F.col("path").startswith(pre)),
                        F.lit(False),
                    )
                ).drop("robots_disallow")
        if self.mux is not None:
            # mux Accept: default-DENY pattern filter (mux.go:311-316) +
            # the per-link Sched score, one Arrow batch for all keys
            good = good.withColumn("_mcfg", self.mux.config_udf()(F.col("url"))).where(
                F.col("_mcfg.accept")
            )
        # first-writer-wins inside the batch: the earliest-emitting parent
        # claims the URL and assigns its depth (handle.go:108-111).
        # min_by aggregate, not a rank window: partial-aggregated map-side
        # (duplicate links collapse before the shuffle) and no per-key
        # sort — measured 0.71 vs 0.58 scaling efficiency 8→32 cores at
        # 8M candidate links. (p_emit, p_prio, p_seq, ordinal) is a
        # strict total order ⇒ identical row choice to the window.
        good = good.drop("path", "p_host")
        ocols = [c for c in good.columns if c != "url"]
        okey = F.struct(F.col("p_emit"), F.col("p_prio"), F.col("p_seq"), F.col("ordinal"))
        good = (
            good.groupBy("url")
            .agg(F.min_by(F.struct(*ocols), okey).alias("_w"))
            .select("url", "_w.*")
        )
        # L8: URL-trie trap guard at link admission (urltrie.go:65-193,
        # wired like example/static-crawler/main.go:42-49's Accept hook).
        # Census = exact distinct-child counts over seen ∪ this batch's
        # candidates; trapped prefixes broadcast-anti-join the batch.
        # Monotone batch semantics: rejections are a SUPERSET of the
        # serial trie's (any node the serial walk finds full is at or
        # past threshold in this census), so a trap can never leak URLs
        # the reference would have blocked. With trap_check_every > 1 a
        # checkpointed trap list is reused between refreshes.
        if p.trap_threshold_expr is not None:
            from crawler_spark.operators.urltrie import filter_trapped, trap_prefixes

            if (
                self._traps is None
                or self._trap_steps_since_refresh >= p.trap_check_every - 1
            ):
                census_src = good.select("url", "host_key").unionByName(
                    seen.select("url", "host_key")
                )
                traps = trap_prefixes(
                    census_src, p.trap_threshold_expr, exact=True
                )
                if p.trap_check_every > 1:
                    traps = _checkpoint(traps)
                    _release_checkpoint(self._traps)
                    self._traps = traps
                    self._trap_steps_since_refresh = 0
            else:
                traps = self._traps
                self._trap_steps_since_refresh += 1
            good = filter_trapped(good, traps)

        # exact URL-seen anti-join (north rule: exact set); with bloom
        # enabled, proven-fresh rows skip the shuffle probe (M5). The
        # recent slice is broadcast only while its driver-known row bound
        # is broadcast-sized: the rewrite path's rebuild cadence keeps it
        # at bloom_rebuild_rows; an LSM engine's slice is bounded by the
        # compaction window, which can be millions of rows at full scale.
        if self.bloom is not None:
            recent_bound = (
                self._lsm_delta_rows
                if self.state_maintenance == "lsm"
                else self._bloom_recent_rows
            )
            fresh = self.bloom.prefilter_fresh(
                good, seen, recent_min_seq=self._bloom_cover_seq,
                broadcast_recent=recent_bound <= 200_000,
            )
        else:
            fresh = good.join(seen.select("url"), "url", "left_anti")
        link_score = (
            F.col("_mcfg.score") if self.mux is not None else F.expr(p.score_expr)
        )
        fresh = (
            fresh.withColumn("score", link_score.cast("int"))
            .withColumn("prio", prio_col(F.col("score")))
            .withColumn(
                "next_ms",
                (F.col("p_emit") if p.ticket_at == "avail" else F.lit(0)).cast("long"),
            )
            .withColumn("avail_ms", F.col("p_emit").cast("long"))
            .withColumn("num_retry", F.lit(0))
            .withColumn("kind", F.lit(0))
        )
        return fresh, (lk if self.metrics_level >= 1 else None)

    def _self_items(self, fetched: DataFrame) -> DataFrame:
        """resched of visited URLs + retry of errored ones
        (schedule.go:246-313). kind=1 orders them after the same parent's
        links (schedule.go:124-140: links are scheduled first)."""
        p = self.policy
        # per-URL mux freq overrides host_policy / policy max_visits
        # (Resched, mux.go:280-292); the resched ticket takes the mux
        # score (mux.go:293-296) where the NopController default is 0
        mv = (
            F.col("mux_freq")
            if self.mux is not None
            else F.coalesce(F.col("hp_max_visits"), F.lit(p.max_visits))
        )
        re_score = F.col("mux_score") if self.mux is not None else F.lit(0)
        f = fetched.join(
            F.broadcast(self.host_policy.select("host_key", F.col("max_visits").alias("hp_max_visits"))),
            "host_key",
            "left",
        )
        ok = f.where("outcome = 'ok'")
        resched_at = F.greatest(
            (F.col("emit_ms") if p.ticket_at == "avail" else F.lit(0)).cast("long"),
            (F.coalesce("old_last_ms", F.lit(0)) + F.lit(p.min_delay_ms)).cast("long"),
        )
        resched = (
            ok.where(F.col("old_num_visit") + 1 < mv)
            .select(
                "url", "host_key",
                resched_at.alias("next_ms"),
                F.col("emit_ms").cast("long").alias("avail_ms"),
                re_score.cast("int").alias("score"),
                prio_col(re_score).alias("prio"),
                "depth",
                F.lit(0).alias("num_retry"),
                F.col("emit_ms").alias("p_emit"), F.col("prio").alias("p_prio"), F.col("seq").alias("p_seq"),
            )
        )
        retry = (
            fetched.where("outcome = 'retry'")
            .where(F.col("old_num_retry") + 1 < F.lit(p.max_retry))
            .select(
                "url", "host_key",
                (F.col("emit_ms") + F.lit(p.retry_delay_ms)).cast("long").alias("next_ms"),
                F.col("emit_ms").cast("long").alias("avail_ms"),
                F.lit(0).alias("score"),
                prio_col(F.lit(0)).alias("prio"),
                "depth",
                (F.col("old_num_retry") + 1).cast("int").alias("num_retry"),
                F.col("emit_ms").alias("p_emit"), F.col("prio").alias("p_prio"), F.col("seq").alias("p_seq"),
            )
        )
        return resched.unionByName(retry).withColumn("kind", F.lit(1)).withColumn("ordinal", F.lit(-1))

    _SEQ_ORDER = ("p_emit", "p_prio", "p_seq", "kind", "ordinal")

    def _assign_seq(self, items: DataFrame, seq_base: int) -> DataFrame:
        """Dense insertion-order seq: sort by (parent emit, parent prio,
        parent seq, kind, ordinal) — the serial scheduler's push order.
        The order key is a strict total order (p_seq unique per parent,
        ordinal unique per parent link), so both assignment strategies
        below produce identical seq values:

        * ``window`` — one global row_number window; single-task sort of
          *this step's new items only*, fine for small batches.
        * ``offset`` — range-partition on the order key, sort within
          partitions, then per-partition exclusive prefix offsets (the
          only driver data is one count per partition). No single-task
          stage anywhere — the 100×-scale path.

        ``auto`` picks offset once the previous step's batch crossed
        ``seq_offset_threshold`` (the current batch's size isn't known
        before an action; neighbour steps are strongly correlated)."""
        mode = self.seq_assign
        if mode == "auto":
            mode = "offset" if self._last_n_items >= self.seq_offset_threshold else "window"
        self._last_seq_mode = mode
        if mode == "offset":
            return self._assign_seq_offset(items, seq_base)
        w = Window.orderBy(*self._SEQ_ORDER)
        return items.withColumn("seq", (F.row_number().over(w) - 1 + seq_base).cast("long"))

    def _assign_seq_offset(self, items: DataFrame, seq_base: int) -> DataFrame:
        """Two-pass distributed seq assignment: range-partition by the
        order key (partition p holds keys ≤ partition p+1), count rows
        per partition (scalar metadata only), convert to exclusive prefix
        offsets, then per-partition row_number + offset. Identical values
        to the global window because the order key is a strict total
        order — asserted by the crawl-order exact-match E2E suite run in
        this mode. Shared machinery: operators.ordering.dense_ordinal
        (also behind emit_ord and large enqueue-drain batches); the
        stats-cutting _checkpoint rides in so the loop's plan statistics
        stay truncated. The aux materialization is released with the
        step's items checkpoint."""
        return dense_ordinal(
            items, list(self._SEQ_ORDER), base=seq_base, out_col="seq",
            dtype="long", checkpoint=_checkpoint,
        )

    # ------------------------------------------------------------------ #
    def _dedup_step(self, dedup_batch: DataFrame, n_img: int) -> dict:
        """Stage one step's new payload ids (a tiny ALREADY-checkpointed
        frame, materialized on the step's concurrent wall — `fetched` is
        released before the cadence fold runs) and fold the accumulated
        delta into the index every `dedup_fold_every` steps. Returns the
        step's dedupe metrics (C8)."""
        stats = {"img_new": n_img}
        if n_img:
            self._dedup_pending.append(dedup_batch)
            self._dedup_pending_rows += n_img
        else:
            _release_checkpoint(dedup_batch)  # empty frame — drop now
        if (
            self._dedup_pending
            and (len(self._dedup_pending) >= self.dedup_fold_every)
        ):
            stats.update(self._dedup_flush())
        return stats

    def _dedup_flush(self) -> dict:
        """Fold every pending step delta into the incremental dedup index
        (operators/incremental.LSMPhashIndex): delta-broadcast pigeonhole
        probe + contracted-supernode clustering + ONE changed-rows frame —
        O(delta), never O(corpus). Compaction every `dedup_compact_folds`
        folds bounds the frame stack."""
        if not self._dedup_pending:
            return {}
        ids = self._dedup_pending[0]
        for fr in self._dedup_pending[1:]:
            ids = ids.unionByName(fr)
        # fixture stand-in for computing phash from the fetched bytes
        # (production: multimodal.extract_features over the response
        # payload — same (image_id, phash) rows, no corpus-side join).
        # Member ids are xxhash64(image_id) — U3's 64-bit identity
        # applied to the payload key, so any id format folds and the
        # index's gid/comp labels are deterministic (collisions 2^-64).
        delta = ids.join(self._payload_phash, "image_id").select(
            dedup_member_id(F.col("image_id")).alias("image_id"), "phash"
        )
        self._dedup = self._dedup.update(delta)
        self._dedup_folds += 1
        frame_rows = self._dedup.frames[-1].count()
        for fr in self._dedup_pending:
            _release_checkpoint(fr)
        folded = self._dedup_pending_rows
        self._dedup_pending, self._dedup_pending_rows = [], 0
        if self._dedup_folds % self.dedup_compact_folds == 0:
            self._dedup_compact()
        return {
            "dedup_folded": folded,
            "dedup_frame_rows": frame_rows,
            "dedup_frames": len(self._dedup.frames),
        }

    def _dedup_compact(self) -> None:
        """Fold the index frames into a fresh base; release every
        superseded checkpoint generation after the new base materializes
        (the _release_checkpoint discipline all loops here follow)."""
        if not self._dedup.frames:
            return
        gens = [self._dedup.base] + list(self._dedup.frames)
        self._dedup = self._dedup.compact()
        for g in gens:
            _release_checkpoint(g)
        self.n_dedup_compactions += 1

    def run(self, seeds: list[str]) -> CrawlResult:
        frontier, seen, host_state, cache, seq_base, n_invalid_seeds = self._init_state(seeds)
        return self._loop(frontier, seen, host_state, cache, seq_base, step0=0, pops0=0)

    def resume(self) -> CrawlResult:
        m = self.store.latest()
        if m is None:
            raise RuntimeError("no snapshot to resume from")
        frames = self.store.load(self.spark, m["step"])
        self.metrics = list(m.get("metrics", []))  # restore metric history
        # distributed rebuild from the snapshot (no driver collect of URLs)
        self._bloom_rebuild(frames["seen"], m["seq_base"])
        self._replay_consumed_after(m["step"])
        cache = None
        if self.policy.cache_enabled:
            # pre-cache snapshots resume with an empty cache (routes
            # degrade to 'miss' — correctness unaffected, see _fetch)
            cache = _checkpoint(
                frames["fetch_cache"]
                if "fetch_cache" in frames
                else self.spark.createDataFrame([], ENGINE_CACHE_SCHEMA)
            )
        if self._dedup is not None:
            if "dedup_index" not in frames:
                raise RuntimeError(
                    "dedupe enabled but the snapshot carries no dedup_index "
                    "frame — it was written by an engine without payloads; "
                    "resuming would silently drop pre-snapshot images"
                )
            from crawler_spark.operators.incremental import LSMPhashIndex

            self._dedup = LSMPhashIndex(
                _checkpoint(frames["dedup_index"]),
                radius=self.dedup_radius,
                max_bucket=self.dedup_max_bucket,
            )
        return self._loop(
            _checkpoint(frames["frontier"]),
            _checkpoint(frames["seen"]),
            _checkpoint(frames["host_state"]),
            cache,
            m["seq_base"],
            step0=m["step"],
            pops0=m["pops"],
        )

    def _flush_emitted(self) -> None:
        """Write buffered per-step emit frames in ONE job, partitioned by
        step (layout emitted/step=N/ — identical to per-step writes).
        Dynamic partition overwrite keeps replays idempotent: a step
        re-run after resume rewrites exactly its own partition. The
        buffered frames are projections over checkpointed RDDs, so
        buffering costs no recompute; their blocks are released here."""
        if not self._emit_buf:
            return
        out = None
        for s, fetched in self._emit_buf:
            f = fetched.select(
                "emit_ms", "prio", "seq", "url",
                "host_key", "depth", "score", "status", "outcome", "cache_route",
            ).withColumn("step", F.lit(s))
            out = f if out is None else out.unionByName(f)
        (
            out.write.mode("overwrite")
            .option("partitionOverwriteMode", "dynamic")
            .partitionBy("step")
            .parquet(os.path.join(self.workdir, "emitted"))
        )
        for _, fetched in self._emit_buf:
            _release_checkpoint(fetched)
        self._emit_buf = []

    def _loop(
        self, frontier, seen, host_state, fetch_cache, seq_base,
        step0: int, pops0: int,
    ) -> CrawlResult:
        p = self.policy
        step, pops = step0, pops0
        self._p1_fut = None  # no precompute carries across runs
        lsm = self.state_maintenance == "lsm"
        if lsm:
            # incoming frames become the immutable bases; per-step writes
            # from here on are O(step delta) frames (see __init__ notes)
            self._f_base, self._f_adds, self._f_cons = frontier, [], []
            self._s_base, self._s_delta = seen, self._empty_seen()
            self._lsm_delta_rows = self._lsm_cons_rows = self._lsm_steps = 0
        while step < self.max_steps:
            if self.max_pops is not None and pops >= self.max_pops:
                break
            if self.enqueue_dir:
                if lsm:
                    seq_base = self._merge_enqueued_lsm(seq_base, step)
                else:
                    frontier, seen, seq_base = self._merge_enqueued(
                        frontier, seen, seq_base, step
                    )
            if lsm:
                # cheap plans over checkpointed frames, rebuilt per step
                frontier, seen = self._frontier_view(), self._seen_view()
            # deferred e_min folds the scalar into the plan (no driver
            # round-trip) — see deferred_emin in __init__ for when.
            deferred = self.deferred_emin
            # C10: restrict selection to the first max_hosts hosts by
            # min live seq; non-empty whenever the frontier is, so the
            # drained-break below still detects true termination
            sel_frontier = (
                admit_hosts(frontier, p.max_hosts)
                if p.max_hosts is not None
                else frontier
            )
            sel = select_batch(
                sel_frontier,
                host_state,
                default_interval_ms=p.default_interval_ms,
                mode=self.mode,
                per_host_cap=p.per_host_batch_cap,
                deferred=deferred,
                precomputed_agg=self._p1_take(),
            )
            if sel.selected is None:
                break  # frontier drained — IsFinished (store.go:145-149)
            # the selection plan materializes once, inside fetched — no
            # separate checkpoint/count jobs for the selected batch
            selected_plan = self._tag_cancelled(sel.selected, host_state)
            fetched = _checkpoint(
                self._fetch(
                    selected_plan,
                    self._s_base if lsm else seen,
                    fetch_cache,
                    seen_delta=self._s_delta if lsm else None,
                )
            )
            sel.release()
            step += 1

            # emitted log: buffered over the fetched checkpoint blocks and
            # flushed every `emit_every` steps / at snapshots / at exit
            # (dynamic partition overwrite keeps per-step idempotence for
            # exact resume — a replayed step rewrites its own partition)
            self._emit_buf.append((step, fetched))

            fresh, lk = self._extract_links(fetched, seen)
            items = self._assign_seq(
                fresh.select(
                    "url", "host_key", "next_ms", "avail_ms", "score", "prio",
                    "depth", "num_retry", "p_emit", "p_prio", "p_seq", "kind", "ordinal",
                ).unionByName(self._self_items(fetched)),
                seq_base,
            )
            items = _checkpoint(items)
            # ONE counting job for the whole step: batch size, new-item
            # count, per-outcome metrics, and link stats (the lk scan hits
            # the cache the items checkpoint just filled). Submitted
            # CONCURRENTLY with the three state checkpoints below — the
            # counts only feed driver bookkeeping and the rare terminal /
            # liveness branch, and the state plans never read them, so the
            # step pays ONE wall latency for all four jobs.
            probe = fetched.select(F.lit("s").alias("t"), F.col("outcome").alias("k")).unionAll(
                items.select(F.lit("i").alias("t"), F.lit(None).cast("string").alias("k"))
            )
            if lk is not None:
                probe = probe.unionAll(
                    lk.select(F.lit("l").alias("t"), F.col("valid").cast("string").alias("k"))
                )
            dedup_batch = None
            if self._dedup is not None:
                # exactly-once fold set: first-visit ok pops carrying a
                # payload (revisits/cache-hits re-serve an already-folded
                # image; errors and Prepare-cancels never fetched one)
                dedup_batch = (
                    fetched.where(
                        (F.col("outcome") == "ok")
                        & F.col("image_id").isNotNull()
                        & (F.coalesce(F.col("old_num_visit"), F.lit(0)) == 0)
                    )
                    .select("image_id")
                    .distinct()
                )
                probe = probe.unionAll(
                    dedup_batch.select(
                        F.lit("d").alias("t"), F.lit(None).cast("string").alias("k")
                    )
                )
            c_fut = self._pool.submit(
                probe.groupBy("t", "k").agg(F.count("*").alias("n")).collect
            )

            # ---- state updates ----------------------------------------
            new_frontier_rows = items.select(
                "url", "host_key", "next_ms", "avail_ms", "score", "prio", "seq", "depth", "num_retry"
            )
            if lsm:
                # frontier writes = this step's add-frame; the popped
                # seqs become a consumed-frame (anti-joined at read time)
                new_frontier_plan = new_frontier_rows
            else:
                new_frontier_plan = frontier.join(
                    fetched.select("seq"), "seq", "left_anti"
                ).unionByName(new_frontier_rows)

            mv = (
                F.col("mux_freq")
                if self.mux is not None
                else F.coalesce(F.col("hp_max_visits"), F.lit(p.max_visits))
            )
            upd = fetched.join(
                F.broadcast(self.host_policy.select("host_key", F.col("max_visits").alias("hp_max_visits"))),
                "host_key",
                "left",
            ).select(
                "url", "host_key", "depth",
                F.when(F.col("outcome") == "ok", F.col("old_num_visit") + 1 >= mv)
                .when(F.col("outcome") == "retry", F.col("old_num_retry") + 1 >= F.lit(p.max_retry))
                .otherwise(F.lit(True))
                .alias("done"),
                F.when(F.col("outcome") == "ok", F.col("emit_ms"))
                .otherwise(F.col("old_last_ms"))
                .cast("long")
                .alias("last_ms"),
                F.col("status").cast("int").alias("status"),
                F.when(F.col("outcome") == "ok", F.col("old_num_visit") + 1)
                .otherwise(F.col("old_num_visit"))
                .cast("int")
                .alias("num_visit"),
                F.when(F.col("outcome") == "ok", F.lit(0))
                .when(F.col("outcome") == "retry", F.col("old_num_retry") + 1)
                .otherwise(F.col("old_num_retry"))
                .cast("int")
                .alias("num_retry"),
                F.col("seen_seq").alias("seq"),
            )
            fresh_seen = items.where("kind = 0").select(
                "url", "host_key", "depth",
                F.lit(False).alias("done"),
                F.lit(None).cast("long").alias("last_ms"),
                F.lit(None).cast("int").alias("status"),
                F.lit(0).alias("num_visit"),
                F.lit(0).alias("num_retry"),
                "seq",
            )
            if lsm:
                # seen writes = the delta upsert-merge: latest row per
                # url within the delta; stale BASE rows stay (resolved
                # at read time by _fetch's precedence join / harmless to
                # the duplicate-insensitive membership readers)
                delta_ups = upd.unionByName(fresh_seen)
                new_seen = (
                    self._s_delta.join(delta_ups.select("url"), "url", "left_anti")
                    .unionByName(delta_ups)
                )
            else:
                new_seen = (
                    seen.join(fetched.select("url"), "url", "left_anti")
                    .unionByName(upd)
                    .unionByName(fresh_seen)
                )

            host_upd = fetched.groupBy("host_key").agg(
                F.max("emit_ms").alias("new_last"),
                F.sum(F.when(F.col("cancelled"), 0).otherwise(1)).alias("n_new_resp"),
            )
            new_host_state = (
                host_state.join(host_upd, "host_key", "full")
                .select(
                    "host_key",
                    F.coalesce("new_last", "last_ms").cast("long").alias("last_ms"),
                    "interval_ms",
                    (F.coalesce("n_resp", F.lit(0)) + F.coalesce("n_new_resp", F.lit(0)))
                    .cast("long")
                    .alias("n_resp"),
                )
            )
            # the three state updates are independent — materialize them as
            # concurrent Spark jobs (the driver loop's fixed latency is the
            # sandbox-scale throughput bound; on a cluster these jobs also
            # overlap their shuffles)
            f_fut = self._pool.submit(_checkpoint, new_frontier_plan)
            s_fut = self._pool.submit(_checkpoint, new_seen)
            h_fut = self._pool.submit(_checkpoint, new_host_state)
            # the step's dedup id-frame (a tiny projection over the
            # fetched checkpoint) rides the same wall instead of paying
            # its own after the counts resolve
            d_fut = (
                self._pool.submit(_checkpoint, dedup_batch)
                if dedup_batch is not None
                else None
            )
            cons_fut = (
                self._pool.submit(_checkpoint, fetched.select("seq")) if lsm else None
            )
            c_fut2 = None
            if fetch_cache is not None:
                # S5 cache MERGE (Pool.Set/Update/Remove, cache.go:190-264)
                # + size-bounded eviction on its cadence — one more
                # independent state job, checkpointed concurrently
                from crawler_spark.operators.cache import cache_merge, evict_cache

                results = fetched.select(
                    "url", "cache_route", "emit_ms",
                    F.col("merge_status").alias("status"),
                    "resp_cacheable",
                    F.col("emit_ms").cast("long").alias("resp_date_ms"),
                    F.col("resp_max_age_ms"),
                    F.lit(0).cast("long").alias("resp_age_ms"),
                    "resp_etag",
                    F.lit(None).cast("long").alias("resp_last_modified_ms"),
                    "resp_need_validate",
                    (F.lit(100) + F.lit(10) * F.coalesce(F.size("links_arr"), F.lit(0)))
                    .cast("long")
                    .alias("resp_body_bytes"),
                    F.col("status").cast("int").alias("resp_status"),
                    F.col("links_arr").alias("resp_links"),
                    F.col("base_url").alias("resp_base_url"),
                )
                new_cache_plan = cache_merge(fetch_cache, results, F.col("emit_ms"))
                if p.cache_max_bytes is not None and step % p.cache_evict_every == 0:
                    new_cache_plan = evict_cache(
                        new_cache_plan, p.cache_max_bytes,
                        partitioned=p.cache_evict_partitioned,
                    )
                c_fut2 = self._pool.submit(_checkpoint, new_cache_plan)

            if (
                self.pipeline_phase1
                and not deferred
                and not self.enqueue_dir
                and self.mode != "fast"  # fast mode never reads precomputed_agg
            ):
                # overlap the NEXT step's phase-1 selection aggregate with
                # this wall: it needs only the frontier/host_state being
                # checkpointed here. List snapshots, not self._f_adds —
                # the driver appends to those after the futures resolve.
                self._p1_fut = self._pool.submit(
                    self._phase1_precompute,
                    lsm,
                    self._f_base if lsm else None,
                    list(self._f_adds) if lsm else None,
                    list(self._f_cons) if lsm else None,
                    f_fut, cons_fut, h_fut, c_fut,
                    step, pops,
                )

            cnt_rows = c_fut.result()
            if lk is not None:
                lk.unpersist()
            n_sel = sum(r["n"] for r in cnt_rows if r["t"] == "s")
            n_items = sum(r["n"] for r in cnt_rows if r["t"] == "i")
            counts = {r["k"]: r["n"] for r in cnt_rows if r["t"] == "s"}
            link_stats = {}
            if lk is not None:
                link_stats = {
                    "links_raw": sum(r["n"] for r in cnt_rows if r["t"] == "l"),
                    "links_invalid": sum(
                        r["n"] for r in cnt_rows if r["t"] == "l" and r["k"] == "false"
                    ),
                }
            new_frontier = f_fut.result()
            new_seen = s_fut.result()
            new_host_state = h_fut.result()
            new_cons = cons_fut.result() if cons_fut is not None else None
            new_cache = c_fut2.result() if c_fut2 is not None else None
            if n_sel == 0:
                if deferred and frontier.isEmpty():
                    step -= 1  # empty tail step: frontier drained — IsFinished
                    self._emit_buf.pop()  # nothing was emitted this step
                    rel_tail = [fetched, items, new_frontier, new_seen,
                                new_host_state, new_cons, new_cache]
                    if dedup_batch is not None:
                        rel_tail.append(d_fut.result())
                    for nf in rel_tail:
                        _release_checkpoint(nf)
                    break
                raise RuntimeError(f"liveness violation: no pop at e_min={sel.e_min}")
            pops += n_sel
            seq_base += n_items
            self._last_n_items = n_items
            n_img = sum(r["n"] for r in cnt_rows if r["t"] == "d")
            dedup_stats = {}
            if dedup_batch is not None:
                dedup_stats = self._dedup_step(d_fut.result(), n_img)

            # free the previous generation's checkpoint blocks + step
            # frames (fetched stays alive in the emit buffer until flush).
            # In LSM mode the frontier/seen locals are VIEWS over the live
            # bases (with no frames staged, the view IS the base object) —
            # never release them; bases free at compaction.
            rel = (
                (host_state, items, fetch_cache)
                if lsm
                else (frontier, seen, host_state, items, fetch_cache)
            )
            for old in rel:
                _release_checkpoint(old)
            if len(self._emit_buf) >= self.emit_every:
                self._flush_emitted()
            if lsm:
                self._f_adds.append(new_frontier)
                self._f_cons.append(new_cons)
                _release_checkpoint(self._s_delta)
                self._s_delta = new_seen
                host_state = new_host_state
            else:
                frontier, seen, host_state = new_frontier, new_seen, new_host_state
            fetch_cache = new_cache
            if lsm:
                # compaction cadence folds frames into fresh bases AND
                # re-covers the bloom/cuckoo shards (one unified LSM)
                self._lsm_after_step(n_sel, n_items, seq_base)
            else:
                # bloom cadence: fold the recent slice into the shards via
                # a distributed rebuild when it grows past the broadcast
                # budget
                self._bloom_after_step(seen, seq_base, n_items)
            if step % 20 == 0:
                # nudge ContextCleaner: dead broadcast/shuffle refs are only
                # collected after a JVM GC (see _release_checkpoint docstring)
                self.spark.sparkContext._jvm.System.gc()

            self.metrics.append(
                dict(step=step, e_min=sel.e_min, selected=n_sel, new_items=n_items,
                     hosts=sel.n_hosts, seq_mode=self._last_seq_mode,
                     **counts, **link_stats, **dedup_stats)
            )
            if self.snapshot_every and step % self.snapshot_every == 0:
                # flush first: a snapshot must only become visible with
                # its emitted-log prefix durable (resume replays forward)
                self._flush_emitted()
                if lsm:
                    # snapshots store materialized state: compact so the
                    # bases ARE the state (and resume starts frame-free)
                    self._lsm_compact(seq_base)
                    frames = {
                        "frontier": self._f_base,
                        "seen": self._s_base,
                        "host_state": host_state,
                    }
                else:
                    frames = {"frontier": frontier, "seen": seen, "host_state": host_state}
                if fetch_cache is not None:
                    frames["fetch_cache"] = fetch_cache
                if self._dedup is not None:
                    # flush staged deltas + compact so the snapshot
                    # stores ONE materialized index frame (resume
                    # restarts frame-free, same as the LSM bases above)
                    self._dedup_flush()
                    self._dedup_compact()
                    frames["dedup_index"] = self._dedup.base
                self.store.commit(
                    step,
                    {"seq_base": seq_base, "pops": pops, "metrics": self.metrics},
                    frames,
                )

        # don't leave a pipelined phase-1 job in flight past the loop
        # (rewrite mode has no compaction guard to settle it)
        self._p1_settle()
        self._p1_fut = None
        if lsm:
            # materialize the final state exactly once (no filter
            # rebuild — the run is over)
            self._lsm_compact(seq_base, rebuild_filter=False)
            seen = self._s_base
        self._flush_emitted()
        emitted_root = os.path.join(self.workdir, "emitted")
        emitted = (
            self.spark.read.option("basePath", emitted_root).parquet(emitted_root + "/step=*")
            if os.path.exists(emitted_root)
            else self.spark.createDataFrame([], "step int, emit_ms long, prio int, seq long, url string, host_key string, depth int, score int, status int, outcome string, cache_route string")
        )
        if self._dedup is not None:
            self._dedup_flush()  # fold any staged tail deltas
        emitted = with_emit_order(emitted.where(F.col("step") <= step))
        return CrawlResult(
            emitted=emitted, seen=seen, steps=step, pops=pops,
            metrics=self.metrics, fetch_cache=fetch_cache,
            dedup_index=(
                self._dedup.resolved() if self._dedup is not None else None
            ),
        )
