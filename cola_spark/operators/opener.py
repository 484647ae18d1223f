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
