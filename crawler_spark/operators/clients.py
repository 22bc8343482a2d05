"""Alternate fetch clients (S7 Electron, S8 proxy) — the configuration
and message-protocol layer, network transport injectable.

The reference ships two non-default clients:

* a proxied ``http.Client`` factory (``proxy.New``,
  /root/reference/proxy/proxy.go:14-61): parse the proxy address, accept
  ``socks5`` (with optional userinfo auth) and ``http``/``https``, reject
  everything else, and wire fixed dial/keep-alive/TLS timeouts.
* an Electron browser client (/root/reference/electron/electron.go):
  per-request ``BrowserConfig`` (electron.go:30-42), a JSON request
  message (``reqToMsg``, electron.go:56-90) sent to a browser farm, and
  a response message decoded back into a normal response
  (``msgToResp``, electron.go:92-150) — including canonical header keys,
  a Content-Type override, and redirect aliasing (``OriginalURL`` vs
  ``NewURL``).

This sandbox has no network, so the *transport* stays an injectable
callable (same seam as operators/fetcher.default_client). Everything
deterministic — address parsing, config validation, message encode /
decode, redirect aliasing — is real and tested. Both clients produce a
``client_fn(urls: pd.Series) -> pd.DataFrame`` compatible with
``fetch_batch``, so a proxied or browser-rendered crawl is a one-line
config swap exactly like the reference's ``Option.MaxHTML``-style knobs.
"""

from __future__ import annotations

from dataclasses import dataclass, field
from typing import Callable, Optional
from urllib.parse import unquote, urlsplit

import pandas as pd

# ---------------------------------------------------------------------- #
# S8: proxy client factory (proxy.go:14-61)
# ---------------------------------------------------------------------- #

#: transport timeouts the reference hard-codes (proxy.go:26-29,40-52)
DIAL_TIMEOUT_MS = 5_000
KEEP_ALIVE_MS = 30_000
TLS_HANDSHAKE_TIMEOUT_MS = 10_000


@dataclass(frozen=True)
class ProxyConfig:
    scheme: str  # "socks5" | "http" | "https"
    host: str  # host:port the transport dials
    username: Optional[str] = None  # socks5 auth (proxy.go:30-35)
    password: Optional[str] = None
    dial_timeout_ms: int = DIAL_TIMEOUT_MS
    keep_alive_ms: int = KEEP_ALIVE_MS
    tls_handshake_timeout_ms: int = TLS_HANDSHAKE_TIMEOUT_MS


def parse_proxy(addr: str) -> ProxyConfig:
    """``proxy.New`` address validation (proxy.go:18-61).

    socks5 carries optional ``user:pass@`` auth; http/https proxies use
    the URL as-is; any other scheme is an error (the reference returns
    ``"proxy: unsupported proxy type"``)."""
    u = urlsplit(addr)
    if u.scheme == "socks5":
        if not u.netloc:
            raise ValueError("proxy: socks5 address has no host")
        return ProxyConfig(
            scheme="socks5",
            host=u.netloc.rsplit("@", 1)[-1],
            username=unquote(u.username) if u.username is not None else None,
            password=unquote(u.password) if u.password is not None else None,
        )
    if u.scheme in ("http", "https"):
        if not u.netloc:
            raise ValueError("proxy: http address has no host")
        return ProxyConfig(scheme=u.scheme, host=u.netloc)
    raise ValueError("proxy: unsupported proxy type")


def proxy_client(
    addr: str, transport_fn: Optional[Callable] = None
) -> Callable[["pd.Series"], "pd.DataFrame"]:
    """Build a ``fetch_batch``-compatible client routed through a proxy.

    ``transport_fn(conf: ProxyConfig, urls: pd.Series) -> pd.DataFrame``
    performs the actual proxied I/O; the address is validated eagerly
    (like ``proxy.New``) so a bad config fails at build time, not per
    task. Default transport is the no-network stub."""
    conf = parse_proxy(addr)

    def client_fn(urls: "pd.Series") -> "pd.DataFrame":
        if transport_fn is None:
            raise NotImplementedError(
                "no network in this environment; inject transport_fn("
                "conf, urls) -> pd.DataFrame[status,final_url,content_type,body]"
            )
        return transport_fn(conf, urls)

    client_fn.proxy = conf  # introspectable for tests / logging
    return client_fn


# ---------------------------------------------------------------------- #
# S7: Electron browser client (electron/electron.go)
# ---------------------------------------------------------------------- #


@dataclass(frozen=True)
class BrowserConfig:
    """electron.go:30-42. ``mode`` is INJECT (injected JS decides when the
    document is done and calls FINISH(content[, type])) or MAIN_WAIT
    (run ``fetch_code`` after window load; default grabs outerHTML).
    The zero value is "" — like Go's zero-value ``Mode`` — so a default
    config omits ``mode`` on the wire (omitempty parity) and the browser
    side applies its own default (MAIN_WAIT behavior)."""

    mode: str = ""  # "" (browser default) | INJECT | MAIN_WAIT
    fetch_code: str = ""
    injection: str = ""
    timeout_ms: int = 0

    def __post_init__(self):
        if self.mode not in ("", "INJECT", "MAIN_WAIT"):
            raise ValueError(f"electron: unknown mode {self.mode!r}")


def request_msg(
    task_id: int,
    url: str,
    conf: Optional[BrowserConfig] = None,
    headers: Optional[dict] = None,
) -> dict:
    """The JSON request message the browser farm receives (``reqToMsg``,
    electron.go:56-90). Zero-valued fields are omitted (Go's
    ``omitempty``), so the wire format matches byte-for-byte."""
    m: dict = {"taskID": task_id, "url": url}
    if headers:
        m["headers"] = {k: list(v) if isinstance(v, (list, tuple)) else [v] for k, v in headers.items()}
    if conf is not None:
        if conf.timeout_ms:
            m["timeout"] = conf.timeout_ms
        if conf.mode:
            m["mode"] = conf.mode
        if conf.fetch_code:
            m["fetchCode"] = conf.fetch_code
        if conf.injection:
            m["injection"] = conf.injection
    return m


def _canonical_header_key(k: str) -> str:
    """net/http CanonicalHeaderKey: Title-Case each '-' segment."""
    return "-".join(p[:1].upper() + p[1:].lower() for p in k.split("-"))


def response_from_msg(msg: dict) -> dict:
    """Decode a browser-farm response message (``msgToResp``,
    electron.go:92-150): canonicalize header keys, let an explicit
    contentType override the header, keep the request keyed by
    ``originalURL`` with ``newURL`` as the post-redirect alias
    (fetch.go:73-81 redirect aliasing)."""
    headers = {}
    for k, vv in (msg.get("headers") or {}).items():
        ck = _canonical_header_key(k)
        headers.setdefault(ck, [])
        headers[ck].extend(vv if isinstance(vv, list) else [vv])
    content_type = msg.get("contentType") or ""
    if content_type:
        headers["Content-Type"] = [content_type]
    elif headers.get("Content-Type"):
        content_type = headers["Content-Type"][0]
    new_url = msg.get("newURL") or ""
    original = msg.get("originalURL") or ""
    return {
        "url": original,
        "final_url": new_url if new_url and new_url != original else original,
        "status": int(msg.get("statusCode") or 0),
        "content_type": content_type,
        "headers": headers,
        "body": (msg.get("content") or "").encode(),
    }


def electron_client(
    conf: Optional[BrowserConfig] = None,
    transport_fn: Optional[Callable] = None,
) -> Callable[["pd.Series"], "pd.DataFrame"]:
    """Build a ``fetch_batch``-compatible dynamic-page client.

    ``transport_fn(msgs: list[dict]) -> list[dict]`` is the websocket /
    NATS round-trip to the Electron farm (electron.go's nats.Conn);
    everything around it — message construction with per-batch task ids,
    response decoding, redirect aliasing — is the tested, deterministic
    part. Batch shape matches fetch_batch: one call per (host, salt)
    group."""

    def client_fn(urls: "pd.Series") -> "pd.DataFrame":
        if transport_fn is None:
            raise NotImplementedError(
                "no network in this environment; inject transport_fn("
                "msgs: list[dict]) -> list[dict] (responseMsg JSON)"
            )
        msgs = [request_msg(i, u, conf) for i, u in enumerate(urls)]
        raw = transport_fn(msgs)
        by_task = {int(r.get("taskID", i)): r for i, r in enumerate(raw)}
        rows = []
        for i, u in enumerate(urls):
            r = by_task.get(i)
            dec = response_from_msg(r) if r is not None else {
                "final_url": u, "status": 0, "content_type": "", "body": b"",
            }
            rows.append(
                (dec["status"], dec["final_url"] or u, dec["content_type"], dec["body"])
            )
        return pd.DataFrame(
            rows, columns=["status", "final_url", "content_type", "body"]
        )

    client_fn.browser_config = conf
    return client_fn
