"""Deterministic synthetic web fixtures (FIXTURES.md §1-3).

The "web" replaces the network: fetching a URL = joining this table
(SURVEY.md §2.1 S4). One row per crawlable URL, with out-links that
exercise the canonicalizer (relative refs, uppercase hosts, default
ports, fragments, duplicates, cross-host links, dead links), statuses
that exercise the retry taxonomy (client.go:120-136), redirects, and a
Zipf-ish host skew for politeness/salting tests. Image payload columns
follow BASELINE.json.input_hint: (image_id, bytes, w, h, fmt, caption,
phash) — bytes are tiny deterministic fake PNGs (see payload_bytes).

Everything derives from random.Random(seed) — same seed, same web.
"""

from __future__ import annotations

import random
import struct
import zlib
from dataclasses import dataclass, field
from typing import Optional

from crawler_spark.plans.oracle import HostPolicy, WebRow

WEB_SCHEMA = (
    "url string, host_key string, status int, out_links array<string>, redirect_to string, "
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long, "
    "cache_max_age_ms long, cache_etag string, cache_need_validate boolean"
)
# html-mode web: raw bodies instead of pre-extracted out_links — the
# engine routes these through the REAL extractor (plans/crawl html_mode)
HTML_WEB_SCHEMA = (
    "url string, host_key string, status int, html string, redirect_to string, "
    "image_id string, bytes binary, w int, h int, fmt string, caption string, phash long, "
    "cache_max_age_ms long, cache_etag string, cache_need_validate boolean"
)
HOST_POLICY_COLS = ["host_key", "interval_ms", "max_visits", "robots_disallow"]


def payload_bytes(rng: random.Random, w: int = 4, h: int = 4) -> bytes:
    """A tiny valid PNG with deterministic pixels (pure stdlib encoder)."""
    raw = b"".join(
        b"\x00" + bytes(rng.randrange(256) for _ in range(w * 3)) for _ in range(h)
    )

    def chunk(tag: bytes, data: bytes) -> bytes:
        return (
            struct.pack(">I", len(data)) + tag + data + struct.pack(">I", zlib.crc32(tag + data))
        )

    ihdr = struct.pack(">IIBBBBB", w, h, 8, 2, 0, 0, 0)
    return (
        b"\x89PNG\r\n\x1a\n"
        + chunk(b"IHDR", ihdr)
        + chunk(b"IDAT", zlib.compress(raw))
        + chunk(b"IEND", b"")
    )


@dataclass
class SynthWeb:
    rows: list  # list[dict] matching WEB_SCHEMA (or HTML_WEB_SCHEMA)
    seeds: list
    host_policy: list  # list[dict] matching HOST_POLICY_COLS
    html_mode: bool = False

    def web_df(self, spark):
        if self.html_mode:
            return spark.createDataFrame(
                [
                    {k: v for k, v in r.items() if k != "out_links"}
                    for r in self.rows
                ],
                HTML_WEB_SCHEMA,
            )
        return spark.createDataFrame(self.rows, WEB_SCHEMA)

    def host_policy_df(self, spark):
        from crawler_spark.plans.crawl import HOST_POLICY_SCHEMA

        return spark.createDataFrame(
            [tuple(h[c] for c in HOST_POLICY_COLS) for h in self.host_policy], HOST_POLICY_SCHEMA
        )

    def oracle_web(self) -> dict:
        return {
            r["url"]: WebRow(
                url=r["url"],
                status=r["status"],
                out_links=() if self.html_mode else tuple(r["out_links"] or ()),
                redirect_to=r["redirect_to"],
                cache_max_age_ms=r.get("cache_max_age_ms"),
                cache_etag=r.get("cache_etag"),
                cache_need_validate=bool(r.get("cache_need_validate") or False),
                html=r.get("html") if self.html_mode else None,
            )
            for r in self.rows
        }

    def oracle_host_policy(self) -> dict:
        return {
            h["host_key"]: HostPolicy(
                interval_ms=h["interval_ms"],
                max_visits=h["max_visits"],
                robots_disallow=tuple(h["robots_disallow"] or ()),
            )
            for h in self.host_policy
        }


def to_html_web(fx: SynthWeb, seed: int = 99) -> SynthWeb:
    """Render each page's out-links into a REAL HTML body and drop the
    pre-extracted array — the engine (and oracle) must re-derive links
    by tokenizing the body (functions/extract), exactly like the
    reference handler does to live responses (handle.go:63-160).

    Link renderings per page (deterministic rng):
      * kind 0 — plain: every href verbatim (absolute or the fixture's
        messy relative forms), no <base>;
      * kind 1 — genuine <base> rebasing: <base href="http://OTHER/">
        points at ANOTHER host's root and ~half the same-host links are
        rendered host-relative, so they resolve onto the other host —
        the crawl genuinely goes somewhere it wouldn't without the
        rebase;
      * kind 2 — relative <base href="sub/"> (itself resolved against
        the page URL per handle.go:144-146), hrefs verbatim.
    Noise elements (<script>, comments, self-closing tags, a non-href
    anchor) are mixed in so the parser earns its keep.
    """
    import html as _html

    rng = random.Random(seed)
    hosts = sorted({r["host_key"] for r in fx.rows})
    new_rows = []
    for r in fx.rows:
        out = list(r["out_links"] or ())
        kind = rng.randrange(3)
        base_tag = ""
        rendered = []
        if kind == 1 and out and len(hosts) > 1:
            other = hosts[(hosts.index(r["host_key"]) + 1) % len(hosts)]
            base_tag = f'<base href="http://{other}/">'
            pre = f"http://{r['host_key']}/"
            for l in out:
                if l.startswith(pre) and rng.random() < 0.5:
                    rendered.append(l[len(pre):])  # rebases onto `other`
                else:
                    rendered.append(l)
        else:
            if kind == 2:
                base_tag = '<base href="sub/">'
            rendered = out
        body = "".join(
            f'<a href="{_html.escape(l, quote=True)}">l{i}</a>'
            + ("<br/>" if i % 3 == 0 else "")
            for i, l in enumerate(rendered)
        )
        html_doc = (
            f"<html><head>{base_tag}<title>{r['url']}</title></head><body>"
            f"<!-- comment with a fake href=\"http://nowhere.test/\" -->"
            f"<a name='no-href-anchor'>skip</a>{body}"
            f"<script>var x = 'not a link';</script></body></html>"
        )
        nr = dict(r)
        nr.pop("out_links", None)
        nr["html"] = html_doc
        new_rows.append(nr)
    return SynthWeb(
        rows=new_rows, seeds=fx.seeds, host_policy=fx.host_policy, html_mode=True
    )


def synth_web(
    n_pages: int = 40,
    n_hosts: int = 4,
    seed: int = 42,
    links_per_page: tuple = (1, 5),
    error_rate: float = 0.10,
    redirect_rate: float = 0.08,
    dead_link_rate: float = 0.05,
    messy_link_rate: float = 0.25,
    robots_rate: float = 0.08,
    intervals=(0, 25, 50, 100),
    n_seeds: int = 3,
    max_visits: int = 1,
    with_payload: bool = True,
    zipf_s: float = 1.2,
    cache_rate: float = 0.0,
) -> SynthWeb:
    rng = random.Random(seed)
    # cache headers come from an INDEPENDENT stream so turning them on
    # (or changing cache_rate) never perturbs the web topology existing
    # seeded tests were recorded against
    crng = random.Random(seed ^ 0x5CACE5)
    hosts = [f"h{i}.example.com" for i in range(n_hosts)]
    # Zipf-ish page counts per host (skew fixture)
    weights = [1.0 / ((i + 1) ** zipf_s) for i in range(n_hosts)]
    tot = sum(weights)
    counts = [max(1, round(n_pages * w / tot)) for w in weights]
    while sum(counts) > n_pages:
        counts[counts.index(max(counts))] -= 1
    while sum(counts) < n_pages:
        counts[0] += 1

    urls: list[tuple[str, str]] = []  # (url, host)
    for h, c in zip(hosts, counts):
        for j in range(c):
            path = f"/p{j}" if rng.random() > robots_rate else f"/admin/p{j}"
            urls.append((f"http://{h}{path}", h))
    url_set = [u for u, _ in urls]

    def messy(target: str, host: str) -> str:
        """Render a link target in a non-canonical way."""
        scheme, rest = target.split("://", 1)
        thost, tpath = rest.split("/", 1)
        tpath = "/" + tpath
        choice = rng.randrange(5)
        if choice == 0:
            return f"HTTP://{thost.upper()}{tpath}"
        if choice == 1:
            return f"http://{thost}:80{tpath}#frag{rng.randrange(9)}"
        if choice == 2 and thost == host:
            return tpath  # relative
        if choice == 3:
            return f"http://{thost}/x/..{tpath}"
        return f"//{thost}{tpath}"

    rows = []
    redirect_targets = set()
    for i, (u, h) in enumerate(urls):
        r = rng.random()
        if r < error_rate / 2:
            status = rng.choice([500, 503, 429])
        elif r < error_rate:
            status = rng.choice([404, 403, 401]) if rng.random() < 0.5 else 404
        else:
            status = 200
        nl = rng.randint(*links_per_page)
        out = []
        for _ in range(nl):
            if rng.random() < dead_link_rate:
                out.append(f"http://{h}/dead{rng.randrange(1000)}")
                continue
            tgt = rng.choice(url_set)
            out.append(messy(tgt, h) if rng.random() < messy_link_rate else tgt)
        redirect_to = None
        if rng.random() < redirect_rate and status == 200:
            cand = rng.choice(url_set)
            if cand != u and cand not in redirect_targets:
                redirect_to = cand
                redirect_targets.add(u)  # this row redirects; don't chain onto it
        # S5 cache headers (client.go:98-113 / cache.go:58-134 inputs):
        # a cache_rate slice of pages is cacheable, split across the
        # freshness regimes the router distinguishes — long-fresh (hit
        # on revisit), short-fresh + etag (fresh then revalidate),
        # no-cache + etag (always revalidate), uncacheable (miss).
        cma, cet, cnv = None, None, False
        if crng.random() < cache_rate:
            kind = crng.randrange(4)
            if kind == 0:
                cma, cet = 1_000_000_000, f"W/\"e{i}\""
            elif kind == 1:
                cma, cet = crng.choice([50, 100, 200]), f"W/\"e{i}\""
            elif kind == 2:
                cma, cet, cnv = 0, f"W/\"e{i}\"", True
            # kind 3: uncacheable (all null)
        prng = random.Random(seed * 1_000_003 + i)
        rows.append(
            dict(
                url=u,
                host_key=h,
                status=status,
                out_links=out,
                redirect_to=redirect_to,
                image_id=f"img{i}",
                bytes=payload_bytes(prng) if with_payload else None,
                w=4,
                h=4,
                fmt="png",
                caption=f"caption {i} — 图{i}",
                phash=prng.getrandbits(63),
                cache_max_age_ms=cma,
                cache_etag=cet,
                cache_need_validate=cnv,
            )
        )
    # avoid redirect chains: a row that is itself a redirect target must not redirect
    by_url = {r["url"]: r for r in rows}
    for r in rows:
        t = r["redirect_to"]
        if t is not None and by_url[t]["redirect_to"] is not None:
            r["redirect_to"] = None

    host_policy = [
        dict(
            host_key=h,
            interval_ms=intervals[i % len(intervals)],
            max_visits=max_visits,
            robots_disallow=["/admin"],
        )
        for i, h in enumerate(hosts)
    ]
    seeds = []
    for k in range(n_seeds):
        u = url_set[(k * 7919) % len(url_set)]
        if k == 0:
            seeds.append(u)
        elif k % 2:
            scheme, rest = u.split("://", 1)
            seeds.append(f"HTTP://{rest}#top")  # non-canonical seed
        else:
            seeds.append(u)
    seeds.append("ftp://bad.example.com/x")  # invalid seed (rejected)
    return SynthWeb(rows=rows, seeds=seeds, host_policy=host_policy)
