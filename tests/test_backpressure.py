"""C10 — MaxHosts backpressure wired into the loop.

Reference: RateLimitQueue blocks Push while the primary heap holds
MaxHosts distinct hosts (ratelimitq/queue.go:112,184-191), so at most
MaxHosts hosts are schedulable at any instant and newcomers wait for an
admitted host to drain. The batch refinement (selection.admit_hosts)
defers instead of blocking; these tests pin the invariants that survive
the refinement:

  * at most max_hosts distinct hosts appear in any step's pops;
  * the cap binds (the unbounded twin uses more hosts in some step);
  * the final pop set, seen set, and within-host schedules are
    IDENTICAL to the unbounded run (no cross-host links, so host-local
    order is independent of cross-host interleaving);
  * every host completes (starvation-freedom).
"""

from pyspark.sql import functions as F

from crawler_spark.config import CrawlPolicy
from crawler_spark.plans.crawl import CrawlEngine
from crawler_spark.sources.fixtures import WEB_SCHEMA

N_HOSTS = 5
CHAIN = 5


def five_host_web():
    """Five independent hosts, each a short chain + one fan-out page.
    No cross-host links: each host's schedule is provably independent
    of the admission interleaving."""
    rows = []

    def page(url, host, links):
        rows.append(dict(
            url=url, host_key=host, status=200, out_links=links,
            redirect_to=None, image_id=None, bytes=None, w=None, h=None,
            fmt=None, caption=None, phash=None, cache_max_age_ms=None,
            cache_etag=None, cache_need_validate=False,
        ))

    for h in range(N_HOSTS):
        host = f"h{h}.test"
        for j in range(CHAIN):
            links = [f"http://{host}/p{j + 1}"] if j + 1 < CHAIN else []
            if j == 1:  # a little fan-out so steps overlap
                links += [f"http://{host}/x{k}" for k in range(3)]
            page(f"http://{host}/p{j}", host, links)
        for k in range(3):
            page(f"http://{host}/x{k}", host, [])
    seeds = [f"http://h{h}.test/p0" for h in range(N_HOSTS)]
    return rows, seeds


def run(spark, tmp_path, tag, max_hosts):
    rows, seeds = five_host_web()
    policy = CrawlPolicy(obey_robots=False, max_hosts=max_hosts)
    eng = CrawlEngine(
        spark,
        spark.createDataFrame([tuple(r.values()) for r in rows], WEB_SCHEMA),
        policy=policy,
        workdir=str(tmp_path / f"work_{tag}"),
    )
    return eng.run(seeds)


def test_max_hosts_bounds_each_step_and_preserves_sets(spark, tmp_path):
    unbounded = run(spark, tmp_path, "unb", None)
    bounded = run(spark, tmp_path, "b2", 2)

    u_rows = unbounded.emitted.select("step", "host_key", "url", "emit_ord").collect()
    b_rows = bounded.emitted.select("step", "host_key", "url", "emit_ord").collect()

    def hosts_by_step(rs):
        out = {}
        for r in rs:
            out.setdefault(r.step, set()).add(r.host_key)
        return out

    bh = hosts_by_step(b_rows)
    assert all(len(hs) <= 2 for hs in bh.values()), bh
    # the cap binds: the unbounded twin exceeds it somewhere
    assert any(len(hs) > 2 for hs in hosts_by_step(u_rows).values())

    # identical coverage: same pop set and same seen set
    assert {r.url for r in b_rows} == {r.url for r in u_rows}
    g_seen = {r["url"] for r in bounded.seen.collect()}
    assert g_seen == {r["url"] for r in unbounded.seen.collect()}
    # every host completed under the cap (starvation-freedom)
    assert {r.host_key for r in b_rows} == {f"h{h}.test" for h in range(N_HOSTS)}

    # within-host schedule unchanged (no cross-host links)
    def per_host_order(rs):
        seqs = {}
        for r in sorted(rs, key=lambda r: r.emit_ord):
            seqs.setdefault(r.host_key, []).append(r.url)
        return seqs

    assert per_host_order(b_rows) == per_host_order(u_rows)


def test_admission_prefers_earliest_first_item(spark, tmp_path):
    # seeds are assigned seq in list order -> h0/h1 are the first two
    # admitted hosts, so step 1 pops only them
    bounded = run(spark, tmp_path, "order", 2)
    step1 = {
        r.host_key
        for r in bounded.emitted.where(F.col("step") == 1).collect()
    }
    assert step1 == {"h0.test", "h1.test"}
