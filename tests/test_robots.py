"""robots.txt parsing/evaluation (S10) tests."""

from crawler_spark.functions.robots import (
    allowed,
    parse_robots,
    robots_to_host_policy,
)

ROBOTS = """
# comments ignored
User-agent: *
Disallow: /private/
Disallow: /tmp
Allow: /private/ok/
Crawl-delay: 2

User-agent: special-bot
Disallow: /only-for-special

Sitemap: http://a.test/sitemap.xml
Sitemap: http://a.test/sitemap2.xml
"""


def test_parse_star_group():
    r = parse_robots(ROBOTS, "MyCrawler/1.0")
    assert (False, "/private/") in r.rules
    assert (True, "/private/ok/") in r.rules
    assert r.crawl_delay_s == 2.0
    assert r.sitemaps == ["http://a.test/sitemap.xml", "http://a.test/sitemap2.xml"]


def test_agent_group_selection():
    r = parse_robots(ROBOTS, "special-bot/2.0")
    assert r.rules == [(False, "/only-for-special")]
    assert r.crawl_delay_s is None  # special group has no delay


def test_allowed_longest_match():
    r = parse_robots(ROBOTS, "*")
    assert not allowed(r, "/private/x")
    assert allowed(r, "/private/ok/x")  # Allow is longer → wins
    assert not allowed(r, "/tmp/foo")
    assert allowed(r, "/public")


def test_wildcards_and_anchor():
    txt = "User-agent: *\nDisallow: /*.pdf$\nDisallow: /a*b/"
    r = parse_robots(txt, "*")
    assert not allowed(r, "/doc/file.pdf")
    assert allowed(r, "/doc/file.pdfx")  # $ anchor
    assert not allowed(r, "/aXXb/c")


def test_empty_and_missing():
    r = parse_robots(None, "*")
    assert allowed(r, "/anything")
    r2 = parse_robots("User-agent: *\nDisallow:", "*")
    assert allowed(r2, "/anything")  # empty Disallow = allow all


def test_multiple_agents_one_group():
    txt = "User-agent: a\nUser-agent: b\nDisallow: /x"
    assert parse_robots(txt, "a").rules == [(False, "/x")]
    assert parse_robots(txt, "b").rules == [(False, "/x")]


def test_robots_to_host_policy_df(spark):
    df = spark.createDataFrame(
        [("a.test", ROBOTS), ("b.test", None)], ["host_key", "robots_txt"]
    )
    hp = {r["host_key"]: r for r in robots_to_host_policy(df, default_interval_ms=500).collect()}
    assert hp["a.test"]["interval_ms"] == 2000  # Crawl-delay 2s
    assert "/private/" in hp["a.test"]["robots_disallow"]
    assert hp["b.test"]["interval_ms"] == 500  # default when no robots
    assert hp["b.test"]["robots_disallow"] == []


def test_host_policy_feeds_engine(spark, tmp_path):
    """robots-derived host_policy plugs straight into CrawlEngine."""
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.sources.fixtures import synth_web

    fx = synth_web(n_pages=15, n_hosts=2, seed=4, error_rate=0.0, robots_rate=0.5)
    robots_txt = "User-agent: *\nDisallow: /admin\nCrawl-delay: 0"
    robots = spark.createDataFrame(
        [(h["host_key"], robots_txt) for h in fx.host_policy], ["host_key", "robots_txt"]
    )
    hp = robots_to_host_policy(robots)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=hp,
        policy=CrawlPolicy(max_depth=4, obey_robots=True),
        workdir=str(tmp_path / "w"),
    )
    got = eng.run(fx.seeds)
    rows = got.emitted.collect()
    assert rows, "crawl produced pops"
    # the robots gate applies to extracted links (handle.go:83-115), not
    # seeds (crawler.go:120-140 bypasses Accept) — assert on depth ≥ 1
    assert not any("/admin" in r["url"] for r in rows if r["depth"] > 0), (
        "robots disallow respected for discovered links"
    )


def test_dollar_mid_pattern_is_literal():
    """RFC 9309: only a trailing '$' anchors; mid-pattern '$' is literal."""
    txt = "User-agent: *\nDisallow: /a$b"
    r = parse_robots(txt, "*")
    assert not allowed(r, "/a$b/x")  # rule is a prefix of the path
    assert allowed(r, "/ab")  # '$' is not "match anything"


def test_prefix_safe_rules():
    from crawler_spark.functions.robots import prefix_safe_rules

    rules = [
        (False, "/plain"), (False, "/trail*"), (False, "/*.pdf"),
        (False, "/x$"), (True, "/allowed-ignored"),
    ]
    assert prefix_safe_rules(rules) == ["/plain", "/trail"]


def test_full_gate_engine_matches_oracle(spark, tmp_path):
    """Wildcard + Allow-override robots rules: the engine's full
    longest-match gate (robots_gate_udf) must match the serial oracle
    evaluating the same rules — and such rules are NOT expressible in
    the legacy prefix gate (prefix_safe_rules drops them), so this is
    the discriminating test for the RFC evaluation path."""
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.plans.oracle import HostPolicy, crawl_oracle
    from crawler_spark.sources.fixtures import synth_web

    fx = synth_web(n_pages=30, n_hosts=3, seed=9, robots_rate=0.5, error_rate=0.0)
    robots_txt = "User-agent: *\nDisallow: /adm*n/\nAllow: /admin/p1$"
    robots = spark.createDataFrame(
        [(h["host_key"], robots_txt) for h in fx.host_policy], ["host_key", "robots_txt"]
    )
    hp = robots_to_host_policy(robots)
    policy = CrawlPolicy(max_depth=5, obey_robots=True)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=hp,
        policy=policy, workdir=str(tmp_path / "w"),
    )
    assert eng._robots_gate is not None, "full gate should be active"
    got = eng.run(fx.seeds)

    rules = ((False, "/adm*n/"), (True, "/admin/p1$"))
    oracle_hp = {
        h["host_key"]: HostPolicy(interval_ms=0, robots_rules=rules)
        for h in fx.host_policy
    }
    want = crawl_oracle(fx.seeds, fx.oracle_web(), oracle_hp, policy=policy,
                        ticket_at=policy.ticket_at)
    g = [(r["emit_ord"], r["url"], r["emit_ms"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"]) for e in want.emitted]
    assert g == w
    assert want.rejected.get("link-robots", 0) > 0, "fixture never hit the gate"
    g_seen = set(r["url"] for r in got.seen.collect())
    assert g_seen == set(want.seen)


def test_robots_gate_join_matches_broadcast_gate(spark):
    """The join-based gate (beyond-broadcast scale path) must make the
    same per-link decisions as the broadcast UDF gate / allowed()."""
    from crawler_spark.functions.robots import robots_gate_join

    host_rules = {
        "a.test": [(False, "/private"), (True, "/private/ok"), (False, "/*.pdf$")],
        "b.test": [(False, "/")],
    }
    rules_rows = [
        (h, [{"allow": a, "pat": p} for a, p in rl]) for h, rl in host_rules.items()
    ]
    rules = spark.createDataFrame(
        rules_rows,
        "host_key string, robots_rules array<struct<allow:boolean,pat:string>>",
    )
    links = spark.createDataFrame(
        [
            ("a.test", "/public/x"),          # no matching rule -> allowed
            ("a.test", "/private/z"),          # disallow /private
            ("a.test", "/private/ok/y"),       # longer Allow wins
            ("a.test", "/docs/file.pdf"),      # $-anchored wildcard blocks
            ("a.test", "/docs/file.pdfx"),     # anchor => not blocked
            ("b.test", "/anything"),           # disallow all
            ("c.test", "/no/rules/host"),      # host absent -> allowed
        ],
        "host_key string, path string",
    )
    got = {
        (r["host_key"], r["path"])
        for r in robots_gate_join(links, rules).collect()
    }
    assert got == {
        ("a.test", "/public/x"),
        ("a.test", "/private/ok/y"),
        ("a.test", "/docs/file.pdfx"),
        ("c.test", "/no/rules/host"),
    }
    # decisions identical under the broadcast join strategy
    got_bc = {
        (r["host_key"], r["path"])
        for r in robots_gate_join(links, rules, broadcast_rules=True).collect()
    }
    assert got_bc == got
    # and identical to the reference evaluator row by row
    from crawler_spark.functions.robots import RobotsRules, allowed
    for h, p in [(r["host_key"], r["path"]) for r in links.collect()]:
        want = allowed(RobotsRules(rules=host_rules.get(h, [])), p)
        assert ((h, p) in got) == want


def test_full_gate_engine_join_regime_matches_oracle(spark, tmp_path):
    """Force the beyond-broadcast regime (robots_broadcast_max_hosts=0):
    the engine auto-switches to robots_gate_join and must reproduce the
    same oracle order as the broadcast-UDF gate."""
    from crawler_spark.config import CrawlPolicy
    from crawler_spark.plans.crawl import CrawlEngine
    from crawler_spark.plans.oracle import HostPolicy, crawl_oracle
    from crawler_spark.sources.fixtures import synth_web

    fx = synth_web(n_pages=30, n_hosts=3, seed=9, robots_rate=0.5, error_rate=0.0)
    robots_txt = "User-agent: *\nDisallow: /adm*n/\nAllow: /admin/p1$"
    robots = spark.createDataFrame(
        [(h["host_key"], robots_txt) for h in fx.host_policy], ["host_key", "robots_txt"]
    )
    hp = robots_to_host_policy(robots)
    policy = CrawlPolicy(max_depth=5, obey_robots=True)
    eng = CrawlEngine(
        spark, fx.web_df(spark), host_policy=hp,
        policy=policy, workdir=str(tmp_path / "w"),
        robots_broadcast_max_hosts=0,
    )
    assert eng._robots_gate is None and eng._robots_rules_df is not None
    got = eng.run(fx.seeds)

    rules = ((False, "/adm*n/"), (True, "/admin/p1$"))
    oracle_hp = {
        h["host_key"]: HostPolicy(interval_ms=0, robots_rules=rules)
        for h in fx.host_policy
    }
    want = crawl_oracle(fx.seeds, fx.oracle_web(), oracle_hp, policy=policy,
                        ticket_at=policy.ticket_at)
    g = [(r["emit_ord"], r["url"], r["emit_ms"]) for r in got.emitted.orderBy("emit_ord").collect()]
    w = [(e["emit_ord"], e["url"], e["emit_ms"]) for e in want.emitted]
    assert g == w
    assert set(r["url"] for r in got.seen.collect()) == set(want.seen)
