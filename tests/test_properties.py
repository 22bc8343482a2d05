"""Property-based tests (hypothesis) over the pure-Python kernels that
every crawl row passes through — the invariants that must hold for ANY
input at 10^10-URL scale, not just the golden vectors:

* canonicalize is idempotent and total (never raises, flags instead);
* a valid canonical URL round-trips: url == scheme://host_key + path?query;
* resolve(base, ref) == canonicalize(urljoin) and absolute refs ignore base;
* robots longest-match: a more-specific Allow always beats a shorter
  Disallow; '$' is an anchor only when terminal; evaluation is total.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from crawler_spark.functions.robots import RobotsRules, allowed, parse_robots
from crawler_spark.functions.urlnorm import canonicalize, resolve

# URL-ish text: printable junk, exotic unicode, and plausible URLs
_urlish = st.one_of(
    st.text(max_size=120),
    st.builds(
        lambda scheme, host, port, path, q, frag: f"{scheme}://{host}{port}{path}{q}{frag}",
        st.sampled_from(["http", "https", "HTTP", "ftp", "", "hTTps"]),
        st.text(
            alphabet=string.ascii_letters + string.digits + ".-",
            min_size=1, max_size=30,
        ),
        st.sampled_from(["", ":80", ":443", ":8080", ":0", ":x"]),
        st.text(
            alphabet=string.ascii_letters + string.digits + "/._~%!$&'()*+,;=:@- ^{}|\\\"<>",
            max_size=40,
        ).map(lambda p: "/" + p if p and not p.startswith("/") else p),
        st.sampled_from(["", "?a=1", "?q=%2F&b", "?~"]),
        st.sampled_from(["", "#frag", "#"]),
    ),
)


@given(_urlish)
@settings(max_examples=400, deadline=None)
def test_canonicalize_total_and_idempotent(raw):
    c = canonicalize(raw)  # must never raise
    if not c.valid:
        assert c.url is None and c.reason is not None
        return
    # idempotence: a canonical URL is its own canonical form
    c2 = canonicalize(c.url)
    assert c2.valid, (raw, c.url, c2.reason)
    assert c2.url == c.url
    assert c2.host_key == c.host_key
    assert c2.path == c.path
    # shape invariants the engine relies on
    assert c.url.startswith(("http://", "https://"))
    assert "#" not in c.url  # fragment always stripped
    assert c.host == c.host.lower()
    assert c.path.startswith("/")
    if not c.host.startswith("["):  # bracketed IPv6 carries colons
        assert c.host_key.split(":")[0] == c.host
    # default ports never survive
    scheme = c.url.split(":", 1)[0]
    assert not (scheme == "http" and c.host_key.endswith(":80"))
    assert not (scheme == "https" and c.host_key.endswith(":443"))


@given(_urlish, _urlish)
@settings(max_examples=200, deadline=None)
def test_resolve_consistent_with_canonicalize(base, ref):
    r = resolve(base, ref)  # total
    if ref.lower().startswith(("http://", "https://")):
        # absolute refs ignore the base entirely (RFC 3986 §5.2.2)
        c = canonicalize(ref)
        assert r.valid == c.valid
        if r.valid:
            assert r.url == c.url


_pathchars = string.ascii_lowercase + string.digits + "/._-"


@given(
    st.text(alphabet=_pathchars + "*$", max_size=20),
    st.text(alphabet=_pathchars, max_size=30).map(lambda p: "/" + p),
)
@settings(max_examples=300, deadline=None)
def test_robots_allowed_total_and_specificity(pat, path):
    rules = RobotsRules(rules=[(False, pat)], crawl_delay_s=None, sitemaps=[])
    allowed(rules, path)  # total — any pattern/path pair evaluates
    # an Allow at least as specific as the Disallow always wins ties
    rules2 = RobotsRules(
        rules=[(False, pat), (True, pat)], crawl_delay_s=None, sitemaps=[]
    )
    assert allowed(rules2, path)


@given(st.text(alphabet=_pathchars, min_size=1, max_size=15))
@settings(max_examples=200, deadline=None)
def test_robots_terminal_dollar_only(seg):
    # '/a$b' has a mid-pattern '$' — literal, still blocks '/a$b/x'
    mid = RobotsRules(rules=[(False, f"/{seg}$x")], crawl_delay_s=None, sitemaps=[])
    assert not allowed(mid, f"/{seg}$x/deeper")
    # terminal '$' anchors: blocks the exact path, not extensions
    term = RobotsRules(rules=[(False, f"/{seg}$")], crawl_delay_s=None, sitemaps=[])
    assert not allowed(term, f"/{seg}")
    assert allowed(term, f"/{seg}.html")


@given(st.text(max_size=200))
@settings(max_examples=200, deadline=None)
def test_parse_robots_total(text):
    r = parse_robots(text)  # arbitrary junk parses to some rule set
    assert isinstance(r.rules, list)
    assert allowed(r, "/") in (True, False)
