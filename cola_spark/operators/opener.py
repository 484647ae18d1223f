"""Opener abstraction — cola/core/opener.py re-expressed.

The reference ships three openers: BuiltinOpener (urllib2+cookielib),
MechanizeOpener (browser emulation, forms/login), SpynnerOpener
(QtWebKit JS rendering) — all pluggable via JobDescription.opener_cls.

Here an opener is a *batch* function bytes-per-URL (vectorized — one
Python call per Arrow batch, never per row):

  * SyntheticOpener — deterministic sandbox fetch keyed by url hash
    into a payload table (the tested path; operators/fetch.py uses the
    join-based equivalent for full pushdown)
  * HttpOpener — real urllib-based fetch, environment-gated: the
    sandbox has no network, so it exists for API parity and raises a
    clear error when the first request fails to resolve. JS-rendering
    openers (Spynner analogue) would slot in the same way and are
    explicitly out of scope offline.

Openers plug into the crawl via ``fetch_with_opener`` — a mapInPandas
stage with the same output shape as synthetic_fetch(decode=False).
"""

from __future__ import annotations

from typing import Callable, Iterator

import pandas as pd
from pyspark.sql import DataFrame

OpenerFn = Callable[[list[str]], list[bytes | None]]


def synthetic_opener_factory(n_images: int) -> OpenerFn:
    """Deterministic page bytes from the synthetic images universe."""

    def open_batch(urls: list[str]) -> list[bytes | None]:
        import hashlib

        from cola_spark.codecs import encode_image
        from cola_spark.codecs.pixels import gen_pixels

        out = []
        for u in urls:
            i = int.from_bytes(hashlib.md5(u.encode()).digest()[:4], "big") % n_images
            image_id = f"img{i:08d}"
            d = hashlib.md5(image_id.encode()).digest()
            dims = [16, 24, 32]
            w, h = dims[d[2] % 3], dims[d[3] % 3]
            fmt = "png" if d[4] % 2 == 0 else "jpgq"
            out.append(encode_image(gen_pixels(image_id, w, h), fmt))
        return out

    return open_batch


def http_opener_factory(timeout: float = 10.0) -> OpenerFn:
    """Real network opener (BuiltinOpener analogue). Environment-gated:
    raises RuntimeError naming the failure on a no-network sandbox."""

    def open_batch(urls: list[str]) -> list[bytes | None]:
        import urllib.error
        import urllib.request

        out: list[bytes | None] = []
        for u in urls:
            try:
                with urllib.request.urlopen(u, timeout=timeout) as r:
                    out.append(r.read())
            except urllib.error.URLError as e:
                raise RuntimeError(
                    f"network fetch unavailable in this environment ({e.reason}); "
                    "use synthetic_opener_factory offline"
                ) from e
        return out

    return open_batch


def synthetic_login_hook(creds: dict[str, tuple[str, str]]):
    """Deterministic synthetic auth service — the cola login_hook seam
    (cola/job/__init__.py login_hook + contrib/weibo/login.py): called
    once per host per worker, returns a session cookie or None.

    The fake auth server accepts username ``u_<host>`` with password
    ``md5(host)[:6]``; the cookie is a pure function of (host, user,
    pw) so tests are deterministic. A real login_hook would POST a
    login form / run the js flow here and return the cookiejar.
    """

    def login(host: str) -> str | None:
        import hashlib

        if host not in creds:
            return None
        user, pw = creds[host]
        if user == f"u_{host}" and pw == hashlib.md5(host.encode()).hexdigest()[:6]:
            return hashlib.md5(f"{host}|{user}|{pw}".encode()).hexdigest()[:8]
        return None

    return login


def auth_opener_factory(
    base_opener: OpenerFn, auth_hosts: set[str], login_hook=None
) -> OpenerFn:
    """Authenticated-session opener wrapper.

    Hosts in ``auth_hosts`` require a login cookie before any fetch —
    without one every request to them fails (payload None → fetch_ok
    False → normal retry/requeue semantics). The login_hook is invoked
    lazily once per host per Python worker and the cookie cached, which
    is exactly cola's opener-instance cookiejar lifetime (one opener
    per executor process).
    """
    cookies: dict[str, str | None] = {}

    def open_batch(urls: list[str]) -> list[bytes | None]:
        from urllib.parse import urlsplit

        allowed_idx: list[int] = []
        out: list[bytes | None] = [None] * len(urls)
        for i, u in enumerate(urls):
            host = urlsplit(u).hostname
            if host in auth_hosts:
                if host not in cookies:
                    cookies[host] = login_hook(host) if login_hook else None
                if not cookies[host]:
                    continue  # unauthenticated: fetch fails
            allowed_idx.append(i)
        if allowed_idx:
            payloads = base_opener([urls[i] for i in allowed_idx])
            for i, p in zip(allowed_idx, payloads):
                out[i] = p
        return out

    return open_batch


def rendering_opener_factory(base_opener: OpenerFn, render) -> OpenerFn:
    """JS-rendering opener seam — cola's SpynnerOpener analogue
    (cola/core/opener.py ~L120-200, QtWebKit wait_for_selector).

    ``render(url, payload) -> payload`` post-processes the raw fetch
    exactly where a browser engine would execute scripts and return the
    settled DOM. Offline the render fn is a deterministic fake; a real
    deployment plugs a headless browser into the same signature.
    """

    def open_batch(urls: list[str]) -> list[bytes | None]:
        raw = base_opener(urls)
        return [None if p is None else render(u, p) for u, p in zip(urls, raw)]

    return open_batch


def fetch_with_opener(scheduled: DataFrame, opener: OpenerFn) -> DataFrame:
    """Vectorized fetch stage: adds (payload binary, fetch_ok boolean)."""
    cols = scheduled.columns

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            payloads = opener(list(pdf["url_canon"]))
            out = pdf[cols].copy()
            out["payload"] = payloads
            out["fetch_ok"] = [p is not None for p in payloads]
            yield out

    schema = ", ".join(f"{f.name} {f.dataType.simpleString()}" for f in scheduled.schema.fields)
    return scheduled.mapInPandas(batches, schema + ", payload binary, fetch_ok boolean")
