"""Serial discrete-event crawl oracle — the executable spec.

A pure-Python, single-threaded simulation of the reference crawler's
scheduler semantics under a deterministic virtual clock, used as the
golden source for crawl order, depths, and the final URL-seen set (the
reference's own precedent: godoc_test.go:24-47 compares a whole crawl
against an external oracle).

Semantics modeled (reference citations):
  * two-level politeness queue: per-host secondary order
    (next, 999-clamp(score), seq) — queue/queue.go:182-193 refined by the
    diskheap total order (diskheap.go:25-44); host emits at
    max(last + interval(host), head due) — ratelimitq/queue.go:18-21,
    228-247; drained hosts keep their Last (timewait, queue.go:154-166).
  * host ties at equal emit broken by head (prio, seq) — a deterministic
    refinement of the reference's arbitrary heap tie.
  * seed injection: normalize → first-writer PutNX → depth 0
    (crawler.go:120-140); invalid seeds dropped (recorded).
  * fetch classification: 2xx ok; 5xx and 4xx except 404 retryable;
    others complete (client.go:120-136); unresolvable URL = network error
    = retryable (client.go:104-106).
  * redirects followed one hop; final URL injected as a link
    (fetch.go:73-81, handle.go:63-76).
  * link pipeline: resolve against final URL → normalize → accept filters
    (max-depth extract/extract.go:38-41, robots, same-host) → first-writer
    dedupe with depth = parent+1 (handle.go:83-115) → ticket
    (schedule.go:235-244); links scheduled before the parent's resched
    (schedule.go:124-140).
  * resched: num_visit++, num_retry=0, Last=now; done when num_visit >=
    max_visits; else next = old_last + min_delay (schedule.go:246-281).
  * retry: num_retry++; done when >= max_retry; else next = now + delay,
    fresh uid, score 0 (schedule.go:283-313).

Virtual time is integer milliseconds starting at 0 (seed push time).
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Optional

from crawler_spark.config import CrawlPolicy
from crawler_spark.functions.robots import RobotsRules, allowed
from crawler_spark.functions.urlnorm import canonicalize, resolve


@dataclass
class WebRow:
    url: str
    status: int = 200
    out_links: tuple = ()
    redirect_to: Optional[str] = None
    # S5 cache headers of THIS response (None max-age = uncacheable)
    cache_max_age_ms: Optional[int] = None
    cache_etag: Optional[str] = None
    cache_need_validate: bool = False
    # html mode (L1): raw body; when set (and out_links empty) the page's
    # links come from the REAL extractor — functions/extract.extract_links,
    # <base> rebasing included — exactly like the engine's html-mode fetch
    html: Optional[str] = None


@dataclass
class HostPolicy:
    interval_ms: int = 0
    max_visits: Optional[int] = None  # None → policy.max_visits
    robots_disallow: tuple = ()
    # full (is_allow, pattern) rule list in file order; when non-empty the
    # gate uses RFC 9309 longest-match (functions/robots.allowed) instead
    # of the literal-prefix check — mirrors the engine's _robots_gate
    robots_rules: tuple = ()


@dataclass
class Item:
    next_ms: int
    prio: int
    seq: int
    avail_ms: int
    url: str
    depth: int
    score: int


@dataclass
class SeenRow:
    depth: int
    done: bool = False
    last_ms: Optional[int] = None
    status: Optional[int] = None
    num_visit: int = 0
    num_retry: int = 0
    seq: int = 0


@dataclass
class OracleResult:
    emitted: list = field(default_factory=list)  # dicts, in exact crawl order
    seen: dict = field(default_factory=dict)  # url -> SeenRow
    rejected: dict = field(default_factory=dict)  # reason -> count
    cache: dict = field(default_factory=dict)  # url -> fetch_cache entry dict


def crawl_oracle(
    seeds: list[str],
    web: dict[str, WebRow],
    host_policy: dict[str, HostPolicy],
    policy: CrawlPolicy = CrawlPolicy(),
    ticket_at: str = "avail",
    max_pops: int = 1_000_000,
    trap_threshold=None,
    mux=None,
) -> OracleResult:
    """``trap_threshold`` (L8): callable depth→int enabling the serial
    URL-trie trap guard at link admission (urltrie.go:65-193) — one trie
    per host, reference-exact first-N-win semantics. The engine's batch
    guard is the monotone refinement: it rejects a superset, so trie-
    rejected URLs are an upper bound on what the engine admits."""
    res = OracleResult()
    tries: dict[str, "object"] = {}
    if trap_threshold is not None:
        from crawler_spark.operators.urltrie import PyTrie

        def trie_for(host: str):
            t = tries.get(host)
            if t is None:
                t = tries[host] = PyTrie(trap_threshold)
            return t
    secondary: dict[str, list[Item]] = {}
    last_ms: dict[str, int] = {}
    resp_count: dict[str, int] = {}  # C6 host budget counter
    seq_counter = 0

    def hp(host: str) -> HostPolicy:
        return host_policy.get(host, HostPolicy())

    def interval(host: str) -> int:
        v = hp(host).interval_ms
        return v if v is not None else policy.default_interval_ms

    def reject(reason: str):
        res.rejected[reason] = res.rejected.get(reason, 0) + 1

    def push(url: str, host: str, next_ms: int, avail_ms: int, score: int, depth: int, seq: int):
        secondary.setdefault(host, []).append(
            Item(next_ms, CrawlPolicy.prio_of(score), seq, avail_ms, url, depth, score)
        )

    def ticket_next(avail: int) -> int:
        return avail if ticket_at == "avail" else 0

    # --- seeds (crawler.go:120-140) --------------------------------------
    # a seed may be a plain url or a (url, score) pair — the latter is
    # how sitemap-discovered seeds carry their priority-derived score
    # through the S2 enqueue path (sources/sitemap.write_sitemap_tickets)
    for raw in seeds:
        seed_score = None
        if isinstance(raw, tuple):
            raw, seed_score = raw
        c = canonicalize(raw)
        if not c.valid:
            reject(f"seed-{c.reason}")
            continue
        if c.url in res.seen:
            continue
        if seed_score is not None:
            score = seed_score
        else:
            score = mux.score(c.url) if mux is not None else policy.score_fn(0)
        res.seen[c.url] = SeenRow(depth=0, seq=seq_counter)
        if trap_threshold is not None:
            trie_for(c.host_key).add(c.url, enforce=False)  # seeds bypass
        push(c.url, c.host_key, ticket_next(0), 0, score, 0, seq_counter)
        seq_counter += 1

    # --- event loop -------------------------------------------------------
    while secondary and len(res.emitted) < max_pops:
        # choose the globally-first pop: min (emit, head prio, head seq)
        best = None
        for host, items in secondary.items():
            r = last_ms[host] + interval(host) if host in last_ms else 0
            emit_h = min(max(r, max(it.next_ms, it.avail_ms)) for it in items)
            head = min(
                (it for it in items if max(it.next_ms, it.avail_ms) <= emit_h),
                key=lambda it: (it.next_ms, it.prio, it.seq),
            )
            key = (emit_h, head.prio, head.seq)
            if best is None or key < best[0]:
                best = (key, host, head)
        (emit, _, _), host, item = best
        secondary[host].remove(item)
        if not secondary[host]:
            del secondary[host]
        last_ms[host] = emit

        sr = res.seen[item.url]
        # --- C6 host budget: cancel in Prepare, complete without fetch ----
        if (
            policy.max_fetches_per_host is not None
            and resp_count.get(host, 0) >= policy.max_fetches_per_host
        ):
            res.emitted.append(
                dict(
                    emit_ord=len(res.emitted), url=item.url, host_key=host,
                    depth=item.depth, emit_ms=emit, score=item.score,
                    prio=item.prio, seq=item.seq, status=None, outcome="cancel",
                    cache_route=None,
                )
            )
            sr.status = None
            sr.done = True
            continue
        resp_count[host] = resp_count.get(host, 0) + 1

        # --- S5 cache route (client.go:98-113): hit serves the cached
        # response without touching the web; revalidate is a conditional
        # fetch (etag match → 304 → control refresh, body kept) ----------
        route = None
        ent = res.cache.get(item.url) if policy.cache_enabled else None
        if policy.cache_enabled:
            if (
                ent is not None
                and not ent["need_validate"]
                and ent["age_ms"] + (emit - ent["fetched_ms"]) < ent["max_age_ms"]
            ):
                route = "hit"
            elif ent is not None and (
                ent["etag"] is not None or ent["last_modified_ms"] is not None
            ):
                route = "revalidate"
            else:
                route = "miss"

        # --- fetch (test semantics: join the web fixture) -----------------
        if route == "hit":
            status = ent["status"]
            links = list(ent["links"])
            base = ent["base_url"]
        else:
            row = web.get(item.url)
            injected: list[str] = []
            base = item.url
            if row is not None and row.redirect_to is not None:
                if policy.follow_redirects:
                    injected = [row.redirect_to]
                base = row.redirect_to
                row = web.get(row.redirect_to)
            status = row.status if row is not None else 0
            if row is not None and row.html is not None and not row.out_links:
                from crawler_spark.functions.extract import extract_links

                body_links = [c.url for c in extract_links(row.html, base) if c.valid]
            else:
                body_links = list(row.out_links or ()) if row else []
            links = list(injected) + body_links
            eff_cma = row.cache_max_age_ms if row is not None else None
            eff_etag = row.cache_etag if row is not None else None
            eff_nv = bool(row.cache_need_validate) if row is not None else False
            if (
                route == "revalidate"
                and ent["etag"] is not None
                and eff_etag is not None
                and ent["etag"] == eff_etag
            ):
                # 304 Not Modified: serve the cached body; Update control
                # fields (cache.go:227-230) or Remove if now uncacheable
                status, links, base = ent["status"], list(ent["links"]), ent["base_url"]
                if eff_cma is None:
                    del res.cache[item.url]
                else:
                    ent.update(
                        fetched_ms=emit, date_ms=emit, max_age_ms=eff_cma,
                        age_ms=0, etag=eff_etag, need_validate=eff_nv,
                    )
            elif policy.cache_enabled:
                # full response: Set if cacheable, Remove on a modified
                # revalidation that came back uncacheable (client.go:184-186)
                cacheable = eff_cma is not None and status in (200, 203, 206, 300, 301)
                if 200 <= status < 300 and cacheable:
                    res.cache[item.url] = dict(
                        fetched_ms=emit, date_ms=emit, max_age_ms=eff_cma,
                        age_ms=0, etag=eff_etag, last_modified_ms=None,
                        need_validate=eff_nv, body_bytes=100 + 10 * len(links),
                        status=status, links=list(links), base_url=base,
                    )
                elif route == "revalidate" and 200 <= status < 300 and not cacheable:
                    res.cache.pop(item.url, None)
        if 200 <= status < 300:
            outcome = "ok"
        elif status >= 500 or (400 <= status != 404) or status == 0:
            outcome = "retry"
        else:
            outcome = "drop"

        res.emitted.append(
            dict(
                emit_ord=len(res.emitted),
                url=item.url,
                host_key=host,
                depth=item.depth,
                emit_ms=emit,
                score=item.score,
                prio=item.prio,
                seq=item.seq,
                status=status,
                outcome=outcome,
                cache_route=route,
            )
        )

        if outcome == "ok":
            # parent follow gate (mux DoNotFollow / SetMaxDepth)
            if mux is not None and not mux.follow(item.url, item.depth):
                links = []
            # links first (schedule.go:129-136), then resched (:137-140)
            for raw in links:
                c = resolve(base, raw)
                if not c.valid:
                    reject(f"link-{c.reason}")
                    continue
                d = item.depth + 1
                if policy.max_depth is not None and d > policy.max_depth:
                    reject("link-maxdepth")
                    continue
                if policy.same_host_only and c.host_key != host:
                    reject("link-crosshost")
                    continue
                hpol = hp(c.host_key)
                if policy.obey_robots and (
                    (not allowed(RobotsRules(rules=list(hpol.robots_rules)), c.path))
                    if hpol.robots_rules
                    else any(c.path.startswith(p) for p in hpol.robots_disallow)
                ):
                    reject("link-robots")
                    continue
                if mux is not None and not mux.accept(c.url):
                    reject("link-muxfilter")  # default-deny (mux.go:311-316)
                    continue
                if trap_threshold is not None and not trie_for(c.host_key).add(c.url):
                    reject("link-trap")
                    continue
                if c.url in res.seen:
                    continue
                score = mux.score(c.url) if mux is not None else policy.score_fn(d)
                res.seen[c.url] = SeenRow(depth=d, seq=seq_counter)
                push(c.url, c.host_key, ticket_next(emit), emit, score, d, seq_counter)
                seq_counter += 1

            old_last = sr.last_ms if sr.last_ms is not None else 0
            sr.num_visit += 1
            sr.num_retry = 0
            sr.last_ms = emit
            sr.status = status
            if mux is not None:
                mv = mux.freq(item.url)  # per-URL freq (mux.go:280-292)
            else:
                mv = hp(host).max_visits
                mv = mv if mv is not None else policy.max_visits
            re_score = mux.score(item.url) if mux is not None else 0
            if sr.num_visit >= mv:
                sr.done = True
            else:
                push(
                    item.url, host,
                    max(ticket_next(emit), old_last + policy.min_delay_ms),
                    emit, re_score, item.depth, seq_counter,
                )
                seq_counter += 1
        elif outcome == "retry":
            sr.num_retry += 1
            sr.status = status
            if sr.num_retry >= policy.max_retry:
                sr.done = True
            else:
                push(item.url, host, emit + policy.retry_delay_ms, emit, 0, item.depth, seq_counter)
                seq_counter += 1
        else:  # drop → Complete
            sr.status = status
            sr.done = True

    return res
