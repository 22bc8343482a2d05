"""Crawl policy — the engine's equivalent of the reference's Controller.

The reference's extension surface is the ``Controller`` interface
(ctrl.go:17-47: Prepare/Handle/Accept/Sched/Resched/Retry + Etc) plus
per-pattern config via mux (mux/mux.go:173-238). Our policies must be
*columnar* (evaluated for a whole DataFrame at once), so each hook is a
Spark SQL expression string over well-known column names, paired with a
Python lambda with identical semantics for the serial oracle.

Defaults mirror the reference's defaults:
  * score 0, due immediately (NopController ctrl.go:66-68)
  * visit once then done (NopController ctrl.go:69-71, mux/mux.go:290-293)
  * retry delay 10s, max 4 retries (ctrl.go:72-74)
  * revisit floor MinDelay 10s (option.go:24, clamp schedule.go:276-279)
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional


def _clamp_score(s: int) -> int:
    return 0 if s < 0 else (999 if s > 999 else s)


@dataclass(frozen=True)
class CrawlPolicy:
    # --- Sched: priority of a newly discovered URL -----------------------
    # SQL expression over column `depth` → int score. Higher = sooner at
    # equal due-time (queue/queue.go:182-193). Oracle uses score_fn.
    score_expr: str = "0"
    score_fn: Callable[[int], int] = lambda depth: 0

    # --- ticket time semantics --------------------------------------------
    # "avail": a ticket's earliest-crawl time = its discovery time — the
    #   engine's deterministic refinement of the reference's At=0 default
    #   (identical order under uniform scores; batchable exactly).
    # "zero":  faithful preemptive At=0 (reference example policy); exact
    #   in batched `exact_zero` selection when score_nonincreasing_depth
    #   holds (else the engine falls back to serial = one pop per step).
    ticket_at: str = "avail"

    # Structural guarantee consumed by the exact_zero batched selection:
    # a link's score never exceeds its parent's (true for constant scores
    # and for the reference example's 1000-100·depth). Engines MUST set
    # this False for custom score_exprs that can raise score with depth.
    score_nonincreasing_depth: bool = True

    # --- politeness -------------------------------------------------------
    default_interval_ms: int = 0  # per-host crawl interval when host_policy has no row
    max_hosts: Optional[int] = None  # backpressure analog (ratelimitq MaxHosts); None = unbounded
    # C6: per-host response budget — pops beyond it are cancelled in
    # Prepare and completed without a fetch (make.go:56-62,
    # schedule.go:94-101; example controller cancels busy hosts)
    max_fetches_per_host: Optional[int] = None

    # --- Resched: revisit control ----------------------------------------
    max_visits: int = 1  # visits before done
    min_delay_ms: int = 10_000  # revisit floor (option.go:24)

    # --- Retry: error control (ctrl.go:72-74) -----------------------------
    retry_delay_ms: int = 10_000
    max_retry: int = 4

    # --- Accept: link admission ------------------------------------------
    max_depth: Optional[int] = None  # extract/extract.go:38-41 MaxDepth gate
    same_host_only: bool = False  # SameOrigin-ish filter (extract/extract.go:62-70)
    follow_redirects: bool = True  # inject NewURL as a link (handle.go:63-76)
    obey_robots: bool = True

    # --- S5: HTTP fetch cache wired into the loop (client.go:98-113) ------
    # when enabled, the engine keeps a fetch_cache state table; each pop
    # is routed hit/revalidate/miss at its emit_ms, hits serve the cached
    # response without consulting the web, revalidations are conditional
    # (etag match → 304 → control refresh, body kept), and the post-fetch
    # merge runs cache.cache_merge semantics (Pool.Set/Update/Remove).
    cache_enabled: bool = False
    cache_max_bytes: Optional[int] = None  # None = no eviction
    cache_evict_every: int = 8  # eviction cadence in steps
    cache_evict_partitioned: bool = False  # per-partition budget at scale

    # --- L8: URL-trie crawl-trap guard wired into link admission ----------
    # SQL expression over `depth` (trie node depth, root=0) giving the
    # max children a path node may have before the prefix is a trap
    # (sample/urltrie/urltrie.go:65-193; example thresholds main.go:42-49
    # e.g. "CASE WHEN depth <= 2 THEN 300 ELSE 30 END"). None = guard off.
    # Batch semantics are MONOTONE (a trapped prefix rejects the whole
    # candidate batch under it, not just late arrivals): rejections are a
    # superset of the serial trie's, order-free and deterministic.
    trap_threshold_expr: Optional[str] = None
    # census refresh cadence in steps: 1 = exact census (seen ∪ batch)
    # every step (the superset guarantee holds); >1 amortizes the seen
    # scan — the trap list goes stale between refreshes (still
    # deterministic, truncation lands at the next refresh).
    trap_check_every: int = 1

    # --- scale knobs -------------------------------------------------------
    per_host_batch_cap: int = 4096  # max pops finalized per host per iteration
    bloom_prefilter: bool = False  # seen-filter shards before the exact anti-join
    seen_filter: str = "bloom"  # "bloom" | "cuckoo" (cuckoo adds deletion)
    bloom_shards: int = 8
    bloom_bits_per_shard: int = 1 << 22
    heavy_host_salt: int = 0  # >0: salt fetch-stage partitioning for skew

    @staticmethod
    def prio_of(score: int) -> int:
        """Disk-order priority encoding: 999 - clamp(score,0,999), ascending
        = higher score first (diskheap.go:34-44)."""
        return 999 - _clamp_score(score)


# The example static-crawler policy (example/static-crawler/controller.go:137-141):
# preemptive priority — shallow pages jump the queue (ticket At stays zero).
PRIORITY_POLICY = CrawlPolicy(
    score_expr="1000 - 100 * depth",
    score_fn=lambda depth: 1000 - 100 * depth,
    ticket_at="zero",
)
