"""Metrics/lineage tables + UrlPatterns dispatch."""

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.counters import lineage, metrics_by_partition, round_metrics
from cola_spark.operators.fetch import CHILD_SEQ_OFFSET
from cola_spark.operators.patterns import UrlPattern, UrlPatterns


@pytest.fixture(scope="module")
def crawl(spark, tmp_path_factory):
    from cola_spark.plans.scheduler import CrawlConfig, run_crawl
    from cola_spark.sources import gen_budgets, gen_frontier_seeds, gen_images, gen_robots

    wd = str(tmp_path_factory.mktemp("mx"))
    cfg = CrawlConfig(workdir=wd, n_images=30, pages_per_host=20, max_rounds=4, decode=False)
    log = run_crawl(
        spark,
        gen_frontier_seeds(spark, 300, n_hosts=8, pages_per_host=20),
        gen_robots(spark, 8), gen_budgets(spark, 8), gen_images(spark, 30), cfg,
    )
    return log.cache(), wd


def test_metrics_by_partition_consistent(crawl):
    log, _ = crawl
    m = metrics_by_partition(log, n_parts=8)
    tot = m.agg(F.sum("scheduled"), F.sum("fetched_ok"), F.sum("errors")).first()
    assert tot[0] == log.count()
    assert tot[1] == log.filter("fetch_ok").count()
    assert tot[2] == log.filter("NOT fetch_ok").count()
    assert m.filter("part < 0 OR part >= 8").count() == 0


def test_lineage_parent_resolves(crawl, spark):
    log, _ = crawl
    lin = lineage(log).cache()
    kids = lin.filter("is_discovered")
    assert kids.count() > 0
    # every discovered row's parent_seq is a seq that was actually crawled
    parents = kids.select(F.col("parent_seq").alias("seq")).distinct()
    missing = parents.join(log.select("seq").distinct(), "seq", "left_anti").count()
    assert missing == 0
    assert lin.filter("NOT is_discovered").filter("generation != 0").count() == 0
    assert kids.filter("generation < 1").count() == 0


def test_round_metrics_from_manifest(crawl, spark):
    _, wd = crawl
    rm = round_metrics(spark, wd).collect()
    assert len(rm) >= 2
    assert all(r.secs >= 0 for r in rm)


def test_url_patterns_first_match_wins_and_drops(spark):
    up = UrlPatterns(
        UrlPattern(r"/p/1\d$", "teens"),
        UrlPattern(r"/p/\d+$", "pages"),
    )
    df = spark.createDataFrame(
        [("http://h/p/12",), ("http://h/p/3",), ("http://h/about",)], "url_canon string"
    )
    got = {r.url_canon: r.parser_id for r in up.dispatch(df).collect()}
    assert got == {"http://h/p/12": "teens", "http://h/p/3": "pages"}  # /about dropped
    assert up.matches(df).count() == 2


def test_url_template_census_generalizes(spark):
    """Numeric segments collapse to {n}; statics survive verbatim;
    counts replay from the recipe."""
    from cola_spark.queries import q_url_template_census

    rows = {
        r.template: (r.n_urls, r.n_hosts)
        for r in q_url_template_census(
            spark, "/root/testdata/sf0.001"
        ).collect()
    }
    assert set(rows) == {
        "/cat/{n}/item/{n}/v{n}",
        "/blog/{n}/comments",
        "/static/about",
        "/static/contact",
        "/static/terms",
    }
    import duckdb

    con = duckdb.connect()
    con.execute(
        "CREATE VIEW lineitem AS SELECT * FROM"
        " read_parquet('/root/testdata/sf0.001/lineitem.parquet')"
    )
    n = con.execute("SELECT COUNT(*) FROM lineitem").fetchone()[0]
    assert sum(v[0] for v in rows.values()) == n
