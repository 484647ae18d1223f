"""Opener plumbing + readability-style extraction."""

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.extractor import (
    extract_content,
    extract_links,
    extract_main_text,
    extract_title,
)
from cola_spark.operators.opener import (
    fetch_with_opener,
    http_opener_factory,
    synthetic_opener_factory,
)

HTML = """
<html><head><title> My  Page </title><script>var x = "<p>junk</p>";</script></head>
<body><div>Navigation: <a href="/a">Home</a> <a href="/b">About</a> <a href="/c">More</a></div>
<p>This is the real article body with plenty of text in it to keep.</p>
<p>tiny</p>
<p>Another substantial paragraph with a single <a href="/ref">reference</a> inside it.</p>
</body></html>
"""


def test_extract_title_and_text():
    assert extract_title(HTML) == "My Page"
    text = extract_main_text(HTML)
    assert "real article body" in text
    assert "Another substantial paragraph" in text
    assert "Navigation" not in text  # link farm dropped
    assert "tiny" not in text  # too short
    assert "junk" not in text  # script stripped


def test_extract_links():
    assert extract_links(HTML) == ["/a", "/b", "/c", "/ref"]


def test_extract_content_stage(spark):
    df = spark.createDataFrame([("p1", HTML.encode()), ("p2", b"<html></html>")],
                               "page_id string, html binary")
    got = {r.page_id: (r.title, r.n_links) for r in extract_content(df).collect()}
    assert got["p1"] == ("My Page", 4)
    assert got["p2"] == ("", 0)


def test_synthetic_opener_fetch(spark):
    from cola_spark.codecs import decode_image

    sched = spark.createDataFrame(
        [(f"http://h/p/{i}",) for i in range(6)], "url_canon string"
    )
    out = fetch_with_opener(sched, synthetic_opener_factory(20)).collect()
    assert len(out) == 6 and all(r.fetch_ok for r in out)
    # payloads decode as valid images
    for r in out[:2]:
        data = bytes(r.payload)
        fmt = "png" if data[:4] == b"\x89PNG" else "jpgq"
        assert decode_image(data, fmt).ndim == 3
    # determinism
    out2 = fetch_with_opener(sched, synthetic_opener_factory(20)).collect()
    assert {r.url_canon: bytes(r.payload) for r in out} == {
        r.url_canon: bytes(r.payload) for r in out2
    }


def test_http_opener_gated_offline(spark):
    sched = spark.createDataFrame([("http://no-such-host.invalid/x",)], "url_canon string")
    with pytest.raises(Exception) as ei:
        fetch_with_opener(sched, http_opener_factory(timeout=2)).collect()
    assert "network fetch unavailable" in str(ei.value) or "URLError" in str(ei.value)


def test_auth_opener_login_hook(spark):
    """cola login_hook parity: an auth-gated host is fetchable only
    after a successful login; wrong creds keep failing; other hosts are
    unaffected."""
    import hashlib

    from cola_spark.operators.opener import auth_opener_factory, synthetic_login_hook

    host = "members.example"
    good_pw = hashlib.md5(host.encode()).hexdigest()[:6]
    sched = spark.createDataFrame(
        [(f"http://{host}/p/{i}",) for i in range(3)]
        + [("http://open.example/p/0",)],
        "url_canon string",
    )
    base = synthetic_opener_factory(20)

    # no login hook at all: gated host fails, open host succeeds
    opener = auth_opener_factory(base, {host})
    got = {r.url_canon: r.fetch_ok for r in fetch_with_opener(sched, opener).collect()}
    assert not any(ok for u, ok in got.items() if host in u)
    assert got["http://open.example/p/0"]

    # wrong password: still gated
    bad = auth_opener_factory(base, {host}, synthetic_login_hook({host: (f"u_{host}", "nope")}))
    got = {r.url_canon: r.fetch_ok for r in fetch_with_opener(sched, bad).collect()}
    assert not any(ok for u, ok in got.items() if host in u)

    # correct creds: login once, then every fetch to the host succeeds
    good = auth_opener_factory(base, {host}, synthetic_login_hook({host: (f"u_{host}", good_pw)}))
    got = {r.url_canon: r.fetch_ok for r in fetch_with_opener(sched, good).collect()}
    assert all(got.values())


def test_auth_gated_host_crawled_only_after_login(spark):
    """End-to-end through the retry path: without login the gated
    host's rows fail fetch (and would requeue); with login they all
    crawl — same scheduled set, same opener stage."""
    from cola_spark.operators.opener import auth_opener_factory, synthetic_login_hook
    import hashlib

    host = "auth.example"
    pw = hashlib.md5(host.encode()).hexdigest()[:6]
    sched = spark.createDataFrame(
        [(f"http://{host}/p/{i}",) for i in range(5)], "url_canon string"
    )
    base = synthetic_opener_factory(10)
    before = fetch_with_opener(sched, auth_opener_factory(base, {host})).collect()
    after = fetch_with_opener(
        sched,
        auth_opener_factory(base, {host}, synthetic_login_hook({host: (f"u_{host}", pw)})),
    ).collect()
    assert sum(r.fetch_ok for r in before) == 0
    assert sum(r.fetch_ok for r in after) == 5


def test_rendering_opener_seam(spark):
    """SpynnerOpener-analogue render() plug point: deterministic
    payload post-processing applied inside the fetch stage."""
    from cola_spark.operators.opener import rendering_opener_factory

    def render(url, payload):
        return payload + b"<!--rendered:" + url.encode() + b"-->"

    sched = spark.createDataFrame(
        [(f"http://h/p/{i}",) for i in range(4)], "url_canon string"
    )
    base = synthetic_opener_factory(10)
    plain = {r.url_canon: bytes(r.payload) for r in fetch_with_opener(sched, base).collect()}
    rendered = {
        r.url_canon: bytes(r.payload)
        for r in fetch_with_opener(sched, rendering_opener_factory(base, render)).collect()
    }
    for u, p in rendered.items():
        assert p == plain[u] + b"<!--rendered:" + u.encode() + b"-->"
