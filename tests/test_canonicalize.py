"""URL canonicalization contract (SURVEY.md §2 row 12)."""

from pyspark.sql import functions as F

from cola_spark.functions import canonicalize_url, host_of, path_of, url_hash_col


def _canon(spark, urls):
    df = spark.createDataFrame([(u,) for u in urls], "url string")
    return [r[0] for r in df.select(canonicalize_url(F.col("url"))).collect()]


def test_fragment_stripped(spark):
    a, b = _canon(spark, ["http://a.example/p/1#frag", "http://a.example/p/1"])
    assert a == b == "http://a.example/p/1"


def test_query_order_normalized(spark):
    a, b = _canon(spark, ["http://a.example/p?b=2&a=1", "http://a.example/p?a=1&b=2"])
    assert a == b == "http://a.example/p?a=1&b=2"


def test_case_and_default_port(spark):
    got = _canon(
        spark,
        [
            "HTTP://A.Example:80/p/1",
            "https://b.example:443/x",
            "http://c.example:8080/y",
        ],
    )
    assert got == [
        "http://a.example/p/1",
        "https://b.example/x",
        "http://c.example:8080/y",
    ]


def test_empty_path_and_invalid(spark):
    got = _canon(spark, ["http://a.example", "not a url"])
    assert got[0] == "http://a.example/"
    assert got[1] is None


def test_host_path_hash(spark):
    df = spark.createDataFrame([("http://H1.Example/p/7?z=1#f",)], "url string")
    row = df.select(
        host_of(F.col("url")).alias("h"),
        path_of(F.col("url")).alias("p"),
        url_hash_col(canonicalize_url(F.col("url"))).alias("k"),
    ).first()
    assert row.h == "h1.example"
    assert row.p == "/p/7"
    assert isinstance(row.k, int)


def test_sitemap_seed_expand_semantics(spark):
    """The sitemap query's invariants beyond the oracle: every admitted
    URL is in recipe-canonical form (messy scheme/port/fragment/query
    all normalized), no admitted URL has a seen page id (k < 10), and
    within-batch duplicate <loc> entries collapse."""
    import re

    from cola_spark.queries import q_sitemap_seed_expand

    rows = q_sitemap_seed_expand(spark, "/root/testdata/sf0.001").collect()
    assert rows
    pat = re.compile(r"^http://h(\d+)\.example\.com/p(\d+)\?a=1&b=2$")
    seen_pairs = set()
    for r in rows:
        m = pat.match(r["url_canon"])
        assert m, r["url_canon"]
        assert r["host"] == f"h{m.group(1)}.example.com"
        assert int(m.group(2)) >= 10          # seen pages filtered
        key = (m.group(1), m.group(2))
        assert key not in seen_pairs          # distinct admitted set
        seen_pairs.add(key)


def test_sitemap_lastmod_refetch_pairs_zip_positionally(spark):
    """The (loc, lastmod) zip must pair each URL with ITS OWN date:
    replay the md5 recipe per row and pin both branches of the
    decision."""
    import hashlib

    from cola_spark.queries import q_sitemap_lastmod_refetch

    def md5i(s):
        return int(hashlib.md5(s.encode()).hexdigest()[:15], 16)

    rows = q_sitemap_lastmod_refetch(spark, "/root/testdata/sf0.001").collect()
    assert len(rows) == 160
    for r in rows:
        h = r.url.split("//h", 1)[1].split(".", 1)[0]
        j = r.url.rsplit("/p", 1)[1]
        assert r.lastmod_day == md5i(f"lm:{h}_{j}") % 28 + 1
        assert r.fetched_day == md5i(f"fd:{r.url}") % 28 + 1
        assert r.refetch == (r.lastmod_day > r.fetched_day)
    assert any(r.refetch for r in rows) and any(not r.refetch for r in rows)
