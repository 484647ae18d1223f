"""Hypothesis property tests (SURVEY §5.2): canonicalization
Spark≡oracle equivalence over generated URLs; grant arithmetic."""

from hypothesis import given, settings
from hypothesis import strategies as st

from cola_spark.plans.oracle import canonicalize as py_canon

_host = st.from_regex(r"[a-z][a-z0-9]{0,8}(\.[a-z]{2,5}){1,2}", fullmatch=True)
_path = st.from_regex(r"(/[a-zA-Z0-9._~-]{0,6}){0,3}", fullmatch=True)
_query = st.one_of(
    st.just(""),
    st.from_regex(r"\?[a-z]=[0-9]{1,3}(&[a-z]=[0-9]{1,3}){0,3}", fullmatch=True),
)
_frag = st.one_of(st.just(""), st.from_regex(r"#[a-zA-Z0-9]{0,5}", fullmatch=True))
_scheme = st.sampled_from(["http", "https", "HTTP", "Http"])
_port = st.sampled_from(["", ":80", ":443", ":8080"])

url_strategy = st.builds(
    lambda s, h, p, pa, q, f: f"{s}://{h}{p}{pa}{q}{f}",
    _scheme, _host, _port, _path, _query, _frag,
)


def test_spark_and_oracle_canonicalize_identically(spark):
    """One Spark job over a large hypothesis-drawn URL sample."""
    urls = set()

    @settings(max_examples=300, deadline=None)
    @given(url_strategy)
    def collect(u):
        urls.add(u)

    collect()
    rows = [(u,) for u in sorted(urls)]
    from pyspark.sql import functions as F

    from cola_spark.functions import canonicalize_url

    df = spark.createDataFrame(rows, "url string").select(
        "url", canonicalize_url(F.col("url")).alias("c")
    )
    got = {r.url: r.c for r in df.collect()}
    for u in urls:
        assert got[u] == py_canon(u), f"diverged on {u!r}: spark={got[u]!r} py={py_canon(u)!r}"


@given(
    st.integers(0, 1000), st.integers(0, 1000), st.integers(1, 100),
    st.integers(0, 50), st.integers(0, 50),
)
@settings(max_examples=200, deadline=None)
def test_grant_arithmetic_invariants(budget, applied0, rate, finish, err):
    """apply never over-grants; error returns budget; applied never
    exceeds budget nor goes negative (pure ledger arithmetic — the same
    formulas the DataFrame ops implement)."""
    applied = min(applied0, budget)
    cap = max(min(budget - applied, rate), 0)
    granted = cap
    finish = min(finish, granted)
    err = min(err, granted - finish)
    applied2 = applied + granted - err
    assert 0 <= applied2 <= budget
    assert granted <= rate and granted <= budget - applied
