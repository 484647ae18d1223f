"""State compaction + foreachBatch continuous mode."""

import glob
import os

import pytest
from pyspark.sql import functions as F

from cola_spark.plans.maintenance import compact_filters, compact_seen, vacuum_old_state
from cola_spark.plans.scheduler import CrawlConfig, crawl_log, final_state, run_crawl
from cola_spark.sources import gen_budgets, gen_frontier_seeds, gen_images, gen_robots


def test_compaction_preserves_state_and_resume(spark, tmp_path):
    wd = str(tmp_path / "c")
    seeds = gen_frontier_seeds(spark, 300, n_hosts=8, pages_per_host=20)
    robots, budgets, images = gen_robots(spark, 8), gen_budgets(spark, 8), gen_images(spark, 30)
    cfg = CrawlConfig(workdir=wd, n_images=30, pages_per_host=20, max_rounds=3,
                      decode=False, dedup_mode="hybrid", filter_parts=8)
    run_crawl(spark, seeds, robots, budgets, images, cfg)
    _, seen_before, _ = final_state(spark, cfg)
    before = {r.url_hash for r in seen_before.collect()}
    n_seen_dirs = len(glob.glob(f"{wd}/seen/delta=*"))
    assert n_seen_dirs >= 2

    assert compact_seen(spark, cfg) == n_seen_dirs
    assert compact_filters(spark, cfg) >= 2
    assert len(glob.glob(f"{wd}/seen/delta=*")) == 1
    assert len(glob.glob(f"{wd}/filters/delta=*")) == 1
    _, seen_after, _ = final_state(spark, cfg)
    assert {r.url_hash for r in seen_after.collect()} == before

    removed = vacuum_old_state(cfg, keep_last=1)
    assert removed >= 1

    # resume continues correctly on the compacted layout
    cfg.max_rounds = 5
    log = run_crawl(spark, seeds, robots, budgets, images, cfg, resume=True)
    # compare to straight run at 5 rounds
    wd2 = str(tmp_path / "f")
    cfg2 = CrawlConfig(workdir=wd2, n_images=30, pages_per_host=20, max_rounds=5,
                       decode=False, dedup_mode="hybrid", filter_parts=8)
    full = run_crawl(spark, seeds, robots, budgets, images, cfg2)
    a = [(r.round, r.host, r.seq) for r in log.orderBy("global_rank").collect()]
    b = [(r.round, r.host, r.seq) for r in full.orderBy("global_rank").collect()]
    assert a == b


def test_foreach_batch_crawler(spark, tmp_path):
    from cola_spark.operators.dedup import prepare_frontier
    from cola_spark.streaming.foreach_batch import ForeachBatchCrawler

    d = str(tmp_path / "drops")
    os.makedirs(d)
    seeds = gen_frontier_seeds(spark, 400, n_hosts=8, pages_per_host=20)
    fr = prepare_frontier(seeds.select("url", "priority", "seq", "force"))
    for i in range(2):
        fr.filter(F.pmod(F.col("seq"), F.lit(2)) == i).write.mode("overwrite").parquet(f"{d}/b{i}")

    schema = spark.read.parquet(f"{d}/b0").schema
    stream = spark.readStream.schema(schema).parquet(f"{d}/b*")
    crawler = ForeachBatchCrawler(
        spark, gen_robots(spark, 8), gen_budgets(spark, 8), str(tmp_path / "wd")
    )
    q = crawler.attach(stream, str(tmp_path / "ck"))
    q.processAllAvailable()
    q.stop()

    sched = spark.read.parquet(f"{tmp_path}/wd/sched/batch=*")
    n = sched.count()
    assert n > 0
    # no URL scheduled twice across micro-batches (cross-batch dedup state)
    assert sched.select("url_hash").distinct().count() == n
    # per-host totals never exceed budget
    per_host = sched.groupBy("host").agg(F.count("*").alias("n")).collect()
    budgets = {r.host: r.budget for r in gen_budgets(spark, 8).collect()}
    assert all(r.n <= budgets[r.host] for r in per_host)
