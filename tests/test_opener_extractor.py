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
