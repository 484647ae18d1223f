"""Registrable-domain (eTLD+1) extraction: the PSL contract."""

from __future__ import annotations

from cola_spark.operators.domains import registrable_domain, suffix_frame


def _run(spark, hosts, suffixes=None):
    df = spark.createDataFrame([(h,) for h in hosts], "host string")
    dim = suffix_frame(spark, suffixes) if suffixes is not None else None
    return {
        r.host: (r.public_suffix, r.registrable)
        for r in registrable_domain(df, suffixes=dim).collect()
    }


def test_psl_contract_cases(spark):
    got = _run(
        spark,
        [
            "www.bbc.co.uk",      # 2-label suffix beats its 1-label parent
            "news.bbc.co.uk",     # same registrant, different host
            "a.blogspot.github.io",  # private registry overrides io
            "example.com",
            "deep.x.y.example.org",  # depth collapses to eTLD+1
            "co.uk",              # host IS a suffix: no registrable
            "github.io",
            "zz",                 # single unlisted label
            "site5.zz",           # PSL `*` default: last label is suffix
        ],
    )
    assert got["www.bbc.co.uk"] == ("co.uk", "bbc.co.uk")
    assert got["news.bbc.co.uk"] == ("co.uk", "bbc.co.uk")
    assert got["a.blogspot.github.io"] == ("github.io", "blogspot.github.io")
    assert got["example.com"] == ("com", "example.com")
    assert got["deep.x.y.example.org"] == ("org", "example.org")
    assert got["co.uk"] == ("co.uk", None)
    assert got["github.io"] == ("github.io", None)
    assert got["zz"] == ("zz", None)
    assert got["site5.zz"] == ("zz", "site5.zz")


def test_politeness_regroup_collapses_subdomains(spark):
    # the reason the operator exists: k subdomain hosts of one
    # registrant fold into ONE politeness group
    hosts = [f"s{i}.bbc.co.uk" for i in range(10)] + ["a.site.zz", "b.site.zz"]
    got = _run(spark, hosts)
    regs = {v[1] for v in got.values()}
    assert regs == {"bbc.co.uk", "site.zz"}


def test_custom_suffix_table(spark):
    got = _run(spark, ["x.internal", "a.x.internal"], suffixes=["internal"])
    assert got["x.internal"] == ("internal", "x.internal")
    assert got["a.x.internal"] == ("internal", "x.internal")


def test_registrable_budget_cut_collapses_subdomain_families(spark):
    """The budget key is the registrant, not the host: exactly 3 slots
    per registrable, and families whose subdomains differ still share
    one allocation (some winner sets span multiple hosts)."""
    from cola_spark.queries import q_registrable_budget_cut

    rows = q_registrable_budget_cut(spark, "/root/testdata/sf0.001").collect()
    per = {}
    for r in rows:
        per.setdefault(r.registrable, []).append(r)
    assert all(sorted(x.slot for x in v) == [1, 2, 3] for v in per.values())
    hosts_per_reg = {
        k: {x.url.split("//", 1)[1].split("/", 1)[0] for x in v}
        for k, v in per.items()
    }
    assert any(len(h) > 1 for h in hosts_per_reg.values())
