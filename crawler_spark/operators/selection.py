"""Host-aware politeness selection — the rate-limit queue as a batch operator.

Reimplements the semantics of the reference's two-level rate-limit queue
(queue/ratelimitq/queue.go:12-46,154-259): a primary heap of hosts ordered
by ``host.Next = max(host.Last + interval(host), secondary.Top().Next)``
and per-host secondary heaps in the frontier total order (see ordering.py).
Serially, ``Pop`` emits one item from the minimum host, sets
``host.Last = now`` and re-keys the host (queue.go:228-247); a drained host
parks its ``Last`` in ``timewait`` and restores it on re-appearance
(queue.go:154-166,230-232). We keep ``last_ms`` per host forever, which is
the same semantics.

Item fields: ``next_ms`` is the ticket's earliest-crawl time *as an
ordering key* (queue/queue.go:182-193); ``avail_ms`` is the virtual time
the item was pushed (an item cannot pop before it exists — implicit in the
serial queue, explicit here); ``due_ms = max(next_ms, avail_ms)``.

Batched formulation (one *selection* = one step of the crawl driver loop):

    ready(h)  = last_ms(h) + interval_ms(h)   (0 if never popped)
    emit(h)   = max(ready(h), min over items of due_ms)
    e_min     = min over hosts of emit(h)           — the virtual clock
    p_min     = best head priority among hosts with emit == e_min

A *finalized* pop is one whose outcome cannot be changed by items pushed
by any other finalized pop (all pushes carry avail ≥ e_min, and e_min
never decreases across steps). Three modes:

* ``exact`` — requires the engine's default ticket ``next_ms = avail_ms =
  discovery time``. On every host with emit == e_min, finalize the pops
  that happen AT e_min: the full due run of an interval-0 host (its
  re-key time stays e_min) but only the head of an interval>0 host —
  pops at e_min + k·interval must not be finalized because a pop at any
  t ≥ e_min can discover an item that emits (and claims seen-entries) at
  an earlier virtual time than k·interval later. Admitted items satisfy
  ``due < e_min OR (due == e_min AND prio == p_min)``: a fresh item is
  discovered at some finalized emit ≥ e_min so it sorts strictly after
  every admitted item, and claims are ordered by (p_emit, p_prio, p_seq,
  ordinal) — the serial push order. Exactly reproduces the serial oracle
  for any policy whose link score does not exceed its parent's score
  (true of the reference's defaults and example policy).
* ``fast`` — admits ``due == e_min`` items of any priority and caps
  multi-pop emits below e_next (the next head emit). Exact when all
  scores are equal; looser batching for throughput runs.
* ``serial`` — finalize only the single globally-first candidate per step
  (host ties broken by head (prio, seq)). Exact for *any* policy,
  including preemptive ``At = 0`` tickets (the reference example's
  priority policy), at one pop per step — for order-golden tests.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

INF = 1 << 62


def _host_join_cols(host_state: DataFrame) -> DataFrame:
    return host_state.select(
        "host_key",
        F.col("last_ms").alias("_last_ms"),
        F.col("interval_ms").alias("_interval_ms"),
    )


def phase1_heads(
    frontier: DataFrame,
    host_state: DataFrame,
    *,
    default_interval_ms: int = 0,
) -> DataFrame:
    """Phase-1 per-host timing heads via partial aggregation (no global
    sort): the min due_ms gives the host's earliest possible pop;
    ``emit = max(ready, min_due)``. ``n_rows`` rides along so the driver
    can skip per-host-cap enforcement on steps where no host can exceed
    the cap (the common case).

    ``_host_pmin`` rides along too: every candidate row (due ≤ e_min AND
    ready_host ≤ e_min) provably lives on a host with emit == e_min
    (min_due ≤ due ≤ e_min and ready ≤ e_min force max(ready, min_due)
    ≤ e_min, and emit ≥ e_min by minimality), and on such a host the
    candidate cutoff IS emit(h): if ready ≤ min_due the candidates are
    exactly the min-due rows (their min prio = prio field of the
    (due, prio)-lexicographic minimum), else the rows with due ≤ ready
    (a plain conditional min — ready is a per-row constant after the
    broadcast join). So min-over-candidates(prio) folds into this same
    aggregation and the separate p_min scan of the frontier disappears
    (3 scans/step → 2).

    Factored out of `select_batch` so the crawl driver can overlap the
    phase-1 job with the previous step's state-checkpoint wall (the
    aggregate depends only on the new frontier + host_state)."""
    hs = _host_join_cols(host_state)
    due = F.greatest("next_ms", "avail_ms")
    enriched = (
        frontier.join(F.broadcast(hs), "host_key", "left")
        .withColumn("_iv", F.coalesce(F.col("_interval_ms"), F.lit(default_interval_ms)).cast("long"))
        .withColumn("_ready", F.coalesce(F.col("_last_ms") + F.col("_iv"), F.lit(0).cast("long")))
    )
    return (
        enriched.groupBy("host_key")
        .agg(
            F.min(due).alias("min_due"),
            F.count("*").alias("n_rows"),
            F.first("_ready").alias("ready_ms"),
            F.first("_iv").alias("_iv"),
            F.min(F.when(due <= F.col("_ready"), F.col("prio"))).alias("_p_le_ready"),
            F.min(F.struct(due.alias("d"), F.col("prio").alias("p"))).alias("_dp"),
        )
        .withColumn("emit_ms", F.greatest("ready_ms", "min_due"))
        .withColumn(
            "_host_pmin",
            F.when(F.col("ready_ms") <= F.col("min_due"), F.col("_dp")["p"]).otherwise(
                F.col("_p_le_ready")
            ),
        )
        .select("host_key", "ready_ms", "emit_ms", "_iv", "n_rows", "_host_pmin")
    )


def phase1_agg(heads: DataFrame) -> DataFrame:
    """The scalar phase-1 reduction over the per-host heads: the virtual
    clock e_min, host/row counts for cap short-circuits, the interval
    range for the homogeneous-interval shortcut, and the lexicographic
    (e_min, p_min) pair. One row; `select_batch` accepts it precomputed
    (``precomputed_agg``) so the driver can run it ahead of time."""
    return heads.agg(
        F.min("emit_ms").alias("e_min"),
        F.count("*").alias("n"),
        F.max("n_rows").alias("max_n"),
        F.min("_iv").alias("min_iv"),
        F.max("_iv").alias("max_iv"),
        # lexicographic min: (e_min, min host-pmin among emit==e_min hosts)
        F.min(F.struct(F.col("emit_ms").alias("e"), F.col("_host_pmin").alias("p"))).alias("_ep"),
    )


@dataclass
class Selection:
    selected: Optional[DataFrame]  # frontier rows + emit_ms (fast mode adds rn)
    e_min: Optional[int]  # virtual time of this batch (None = frontier empty)
    n_hosts: int = 0
    _heads: Optional[DataFrame] = None  # persisted intermediate; release() after materializing

    def release(self) -> None:
        if self._heads is not None:
            self._heads.unpersist()


def select_batch(
    frontier: DataFrame,
    host_state: DataFrame,
    *,
    default_interval_ms: int = 0,
    mode: str = "exact",
    per_host_cap: int = 4096,
    deferred: bool = False,
    precomputed_agg=None,
) -> Selection:
    """One politeness-selection step.

    frontier:   url, host_key, next_ms, avail_ms, score, prio, seq, depth…
    host_state: host_key, last_ms, interval_ms (absent host = never popped)
    Returns selected rows with ``emit_ms`` (their virtual pop timestamps).

    ``deferred=True`` (exact mode only): the e_min scalar is folded into
    the selection plan as a broadcast aggregate instead of a driver
    ``first()`` — zero driver round-trips; Selection.e_min/n_hosts are
    None and the empty-frontier case surfaces as an empty selected
    batch (the caller disambiguates with one isEmpty probe at
    termination). Trade-off (measured): in local mode the consumer's job
    grows two broadcast-agg stages and ends up SLOWER than the .first()
    round-trip; intended for high-latency clusters where a driver
    round-trip costs a full job.

    ``precomputed_agg`` (non-deferred modes): the `phase1_agg(...)` Row,
    computed by the caller ahead of time over content-identical
    frontier/host_state — the crawl driver overlaps that job with the
    previous step's state-checkpoint wall, removing the synchronous
    driver round-trip this call otherwise opens with. Scalars are
    bit-identical by construction (same plan, same content), pinned by
    the pipelined-vs-sync E2E equality test.
    """
    hs = _host_join_cols(host_state)
    due = F.greatest("next_ms", "avail_ms")
    heads = phase1_heads(
        frontier, host_state, default_interval_ms=default_interval_ms
    )
    if deferred or mode == "fast":
        # these paths re-read heads (deferred plan / fast-mode e_next)
        heads = heads.persist()
    if deferred and mode == "exact":
        emin_df = heads.agg(F.min("emit_ms").alias("_e_min"))
        qual = (
            heads.crossJoin(F.broadcast(emin_df))
            .where(F.col("emit_ms") == F.col("_e_min"))
            .select("host_key", "emit_ms", "_iv", "_e_min")
        )
        cand = frontier.join(qual, "host_key", "inner").where(due <= F.col("_e_min"))
        w = Window.partitionBy("host_key").orderBy(
            F.col("next_ms").asc(), F.col("prio").asc(), F.col("seq").asc()
        )
        # p_min from the persisted per-host heads (lexicographic min picks
        # the best host-pmin among emit==e_min hosts) — no frontier rescan
        pmin_df = heads.agg(
            F.min(F.struct(F.col("emit_ms"), F.col("_host_pmin"))).alias("_ep")
        ).select(F.col("_ep")["_host_pmin"].alias("_p_min"))
        cand = cand.crossJoin(F.broadcast(pmin_df))
        cond = (due < F.col("_e_min")) | (
            (due == F.col("_e_min")) & (F.col("prio") == F.col("_p_min"))
        )
        sel = (
            cand.where(cond)
            .withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_host_cap)
            .where((F.col("rn") == 1) | (F.col("_iv") == 0))
            .withColumn("emit_ms", F.col("_e_min").cast("long"))
            .drop("_p_min", "_e_min", "_iv")
        )
        return Selection(selected=sel, e_min=None, n_hosts=0, _heads=heads)

    # ``precomputed_agg`` (exact/serial modes): the phase-1 scalar row,
    # computed by the caller over content-identical frontier/host_state
    # (the crawl driver overlaps that job with the previous step's
    # state-checkpoint wall) — skips the one synchronous driver
    # round-trip this call would otherwise pay.
    agg = precomputed_agg if precomputed_agg is not None else phase1_agg(heads).first()
    e_min, n_hosts, max_host_rows = agg["e_min"], agg["n"], agg["max_n"]
    min_iv, max_iv = agg["min_iv"], agg["max_iv"]
    p_min = agg["_ep"]["p"] if agg["_ep"] is not None else None
    if n_hosts == 0:  # empty frontier — no separate isEmpty() job
        if deferred or mode == "fast":
            heads.unpersist()
        return Selection(None, None)

    # Candidate admission WITHOUT a frontier⋈heads join: a host qualifies
    # (emit == e_min) iff ready_host ≤ e_min AND min_due_host ≤ e_min —
    # and the second conjunct is subsumed row-wise by `due_row ≤ e_min`
    # (any admitted row proves it; rows with due > e_min are filtered
    # anyway, and emit ≥ e_min always since e_min is the global min). So
    # the only per-host data needed is host_state — broadcast-sized BY
    # DESIGN — not the per-host aggregate. One frontier scan, one
    # broadcast-hash join, no sort, no 10^5-row qual broadcast (measured:
    # a 400k-row qual broadcast serialized the whole selection on the
    # driver; this shape scans + filters at memory bandwidth).
    cand = (
        frontier.join(F.broadcast(hs), "host_key", "left")
        .withColumn("_iv", F.coalesce(F.col("_interval_ms"), F.lit(default_interval_ms)).cast("long"))
        .withColumn("_ready", F.coalesce(F.col("_last_ms") + F.col("_iv"), F.lit(0).cast("long")))
        .where((due <= e_min) & (F.col("_ready") <= e_min))
        .drop("_last_ms", "_interval_ms", "_ready")
    )

    if mode == "serial":
        # head per host via min_by partial aggregation, then global first
        sel = (
            _head_per_host(cand)
            .orderBy(F.col("prio").asc(), F.col("seq").asc())
            .limit(1)
            .withColumn("emit_ms", F.lit(int(e_min)).cast("long"))
            .drop("_iv")
        )
        return Selection(selected=sel, e_min=int(e_min), n_hosts=int(n_hosts))

    # p_min: lower bound on the priority of every pop that can happen at
    # virtual time e_min (any candidate item), so that a same-millisecond
    # child (prio >= its parent's >= p_min) can never preempt an admitted
    # due==e_min item of priority p_min (ties lose on fresh, larger seq).
    # Computed inside the phase-1 aggregation (see heads) — a plan
    # literal here, no extra frontier scan.
    if mode in ("exact", "exact_zero"):
        cand = cand.withColumn("_p_min", F.lit(p_min).cast("int"))
        if mode == "exact_zero":
            # Bounded-preemption batch for preemptive At=0 tickets (the
            # reference example's priority policy): the frontier order is
            # (next=0, prio, seq) ⇒ priority-first, so a discovered link
            # can preempt ANY waiting lower-priority item at the same
            # virtual instant. Finalize exactly the due items at the
            # global minimum prio: the policy guarantee (child score ≤
            # parent score ⇒ child prio ≥ parent prio ≥ p_min) plus
            # larger child seq means no discovery can sort before an
            # admitted pop; hosts whose heads rank worse than p_min are
            # deferred a step so same-instant cross-host preemption is
            # re-decided with the discoveries on the board. ≥1 pop per
            # step (the p_min item itself) keeps liveness; order-golden
            # proof = the priority-policy E2E run in this mode.
            cond = (due <= e_min) & (F.col("prio") == F.col("_p_min"))
        else:
            cond = (due < e_min) | ((due == e_min) & (F.col("prio") == F.col("_p_min")))
        cand = cand.where(cond).drop("_p_min")
        # Claims (first-writer-wins on fresh links) follow pop order, so a
        # pop may only be finalized if no *unfinalized* pop — including
        # pops of items this very batch will discover — can precede it. A
        # discovery at time t can emit as early as t (fresh host, ready
        # 0), so only pops AT e_min are finalizable: the full due run of
        # an interval-0 host (its re-key time stays e_min,
        # ratelimitq/queue.go:239-243), but only the head of an
        # interval>0 host (its k-th pop at e_min + k·interval would race
        # later-step discoveries at earlier virtual times — observed as a
        # first-writer divergence in the politeness E2E test).
        #
        # Physical shape: the interval-0 run needs NO per-host rank (every
        # admitted row pops at e_min) and the interval>0 head is a min_by
        # aggregate — both partial-aggregated map-side, no frontier sort.
        # The per-host cap (C10 backpressure) is enforced via the overflow
        # -host pattern: only rows of the (rare) hosts exceeding the cap
        # go through a rank window.
        # homogeneous-interval shortcut (the phase-1 aggregate carries
        # min/max interval): an all-interval-0 crawl needs only the runs
        # branch and an all-throttled crawl only the heads branch —
        # avoiding a dead second scan of the candidate plan per step
        if max_iv == 0:
            sel = cand
            if max_host_rows is not None and max_host_rows > per_host_cap:
                sel = _cap_per_host(sel, per_host_cap)
        elif min_iv is not None and min_iv > 0:
            sel = _head_per_host(cand)
        else:
            runs = cand.where(F.col("_iv") == 0)
            if max_host_rows is not None and max_host_rows > per_host_cap:
                # only steps where SOME host could exceed the cap pay the
                # overflow machinery (max_n_rows rides phase 1)
                runs = _cap_per_host(runs, per_host_cap)
            sel = runs.unionByName(_head_per_host(cand.where(F.col("_iv") > 0)))
        sel = sel.withColumn("emit_ms", F.lit(int(e_min)).cast("long")).drop("_iv")
        return Selection(selected=sel, e_min=int(e_min), n_hosts=int(n_hosts))

    if mode != "fast":
        raise ValueError(f"unknown selection mode {mode!r}")

    # fast: per-host runs emit k·interval apart (the serial re-key
    # schedule), capped below the next head emit — exact only when
    # links don't matter (static frontier) or scores are uniform.
    #
    # Physical shape mirrors exact mode: interval-0 rows all pop AT e_min
    # (pop_ms ≡ e_min for every rank) so they need NO window — only the
    # per-host cap, enforced via the overflow-host pattern. Only
    # interval>0 rows pay a rank window, for the k·interval stagger and
    # the < e_next truncation; an all-interval-0 throughput crawl is
    # fully window-free in this mode too.
    def _stagger(rows: DataFrame) -> DataFrame:
        w = Window.partitionBy("host_key").orderBy(
            F.col("next_ms").asc(), F.col("prio").asc(), F.col("seq").asc()
        )
        e_next_row = heads.where(F.col("emit_ms") > e_min).agg(F.min("emit_ms")).first()
        e_next = int(e_next_row[0]) if e_next_row[0] is not None else INF
        return (
            rows.withColumn("rn", F.row_number().over(w))
            .where(F.col("rn") <= per_host_cap)
            .withColumn(
                "pop_ms",
                F.lit(int(e_min)).cast("long")
                + (F.col("rn") - 1).cast("long") * F.col("_iv"),
            )
            .where((F.col("pop_ms") == e_min) | (F.col("pop_ms") < e_next))
            .withColumn("emit_ms", F.col("pop_ms"))
            .drop("pop_ms")
        )

    def _runs0(rows: DataFrame) -> DataFrame:
        if max_host_rows is not None and max_host_rows > per_host_cap:
            rows = _cap_per_host(rows, per_host_cap)
        # rn column kept for schema parity with the stagger branch
        return rows.withColumn("rn", F.lit(1)).withColumn(
            "emit_ms", F.lit(int(e_min)).cast("long")
        )

    if max_iv == 0:
        selected = _runs0(cand).drop("_iv")
    elif min_iv is not None and min_iv > 0:
        selected = _stagger(cand).drop("_iv")
    else:
        selected = (
            _runs0(cand.where(F.col("_iv") == 0))
            .unionByName(_stagger(cand.where(F.col("_iv") > 0)))
            .drop("_iv")
        )
    return Selection(selected=selected, e_min=int(e_min), n_hosts=int(n_hosts), _heads=heads)


def _head_per_host(cand: DataFrame) -> DataFrame:
    """One row per host — the minimum of the frontier total order
    (next_ms, prio, seq) — as a min_by aggregation: partial-aggregated
    map-side, no sort, no window. seq is unique ⇒ deterministic."""
    cols = [c for c in cand.columns if c != "host_key"]
    key = F.struct(F.col("next_ms"), F.col("prio"), F.col("seq"))
    return (
        cand.groupBy("host_key")
        .agg(F.min_by(F.struct(*cols), key).alias("_r"))
        .select("host_key", "_r.*")
    )


def _cap_per_host(rows: DataFrame, cap: int) -> DataFrame:
    """Keep the first ``cap`` rows per host in the frontier total order.
    Overflow hosts are rare (C10 backpressure boundary), so only their
    rows pay a rank window; everything else passes through untouched —
    a cheap count aggregate instead of a full sort."""
    over = (
        rows.groupBy("host_key")
        .agg(F.count("*").alias("_n"))
        .where(F.col("_n") > cap)
        .select("host_key")
    )
    over = F.broadcast(over)
    fast_path = rows.join(over, "host_key", "left_anti")
    w = Window.partitionBy("host_key").orderBy(
        F.col("next_ms").asc(), F.col("prio").asc(), F.col("seq").asc()
    )
    capped = (
        rows.join(over, "host_key", "left_semi")
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") <= cap)
        .drop("_rn")
    )
    return fast_path.unionByName(capped)


def admit_hosts(
    frontier: DataFrame,
    max_hosts: int,
    *,
    host_col: str = "host_key",
    seq_col: str = "seq",
) -> DataFrame:
    """C10 — ``MaxHosts`` backpressure (reference ratelimitq/queue.go:
    112,184-191): the serial queue BLOCKS ``Push`` while the primary
    heap already holds ``MaxHosts`` distinct hosts, so hosts are
    admitted in the arrival order of their first item and newcomers
    wait until an admitted host drains.

    The batch refinement defers instead of blocking (a superstep engine
    has no producer to suspend): per tick, only the first ``max_hosts``
    hosts ranked by their minimum live ``seq`` — the batch image of
    "arrival order of the first queued item" — are eligible for
    selection; the rest stay in the frontier untouched. Starvation-free:
    an admitted host's min live seq only grows as its items are
    consumed, so every deferred host's (fixed) min seq eventually ranks
    inside the top ``max_hosts``. Cross-host order may differ from the
    serial blocking schedule (documented divergence); the within-host
    schedule and the final seen/pop sets are unchanged
    (test_backpressure.py).

    Plan shape: one partial-aggregated groupBy(host) min + a global
    top-K (TakeOrderedAndProject — K rows move) + a broadcast left-semi
    join; no frontier-scale sort or window.
    """
    active = (
        frontier.groupBy(host_col)
        .agg(F.min(seq_col).alias("_s0"))
        .orderBy(F.col("_s0").asc())
        .limit(int(max_hosts))
        .select(host_col)
    )
    return frontier.join(F.broadcast(active), host_col, "left_semi")
