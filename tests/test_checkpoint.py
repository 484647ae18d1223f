"""M4: checkpoint/resume + dedup-mode equivalence.

- kill after round r, resume → final crawl log identical to a straight
  run (snapshot-manifest semantics)
- hybrid cuckoo admission ≡ exact admission (filter only prunes)
- pure cuckoo mode: bloom semantics (no false negatives: crawled set ⊆
  exact-mode crawled set; near-equal size at tiny FP rate)
"""

import pytest
from pyspark.sql import functions as F

from cola_spark.plans.scheduler import CrawlConfig, latest_round, run_crawl
from cola_spark.sources import gen_budgets, gen_frontier_seeds, gen_images, gen_robots

N, HOSTS, IMGS, PAGES, ROUNDS = 300, 10, 40, 20, 5


@pytest.fixture(scope="module")
def inputs(spark):
    return (
        gen_frontier_seeds(spark, N, n_hosts=HOSTS, pages_per_host=PAGES),
        gen_robots(spark, HOSTS),
        gen_budgets(spark, HOSTS),
        gen_images(spark, IMGS),
    )


def _run(spark, inputs, wd, **kw):
    seeds, robots, budgets, images = inputs
    cfg = CrawlConfig(
        workdir=wd, n_images=IMGS, pages_per_host=PAGES, max_rounds=ROUNDS,
        decode=False, **kw,
    )
    log = run_crawl(spark, seeds, robots, budgets, images, cfg)
    return [
        (r.round, r.priority, r.host, r.seq, r.url_canon, r.host_rank, r.fetch_ok)
        for r in log.orderBy("global_rank").collect()
    ], cfg


def test_resume_reproduces_full_run(spark, inputs, tmp_path_factory):
    full, _ = _run(spark, inputs, str(tmp_path_factory.mktemp("full")))
    wd = str(tmp_path_factory.mktemp("interrupted"))
    seeds, robots, budgets, images = inputs
    cfg = CrawlConfig(workdir=wd, n_images=IMGS, pages_per_host=PAGES, max_rounds=2, decode=False)
    run_crawl(spark, seeds, robots, budgets, images, cfg)
    assert latest_round(cfg) == 1
    cfg.max_rounds = ROUNDS
    log = run_crawl(spark, seeds, robots, budgets, images, cfg, resume=True)
    resumed = [
        (r.round, r.priority, r.host, r.seq, r.url_canon, r.host_rank, r.fetch_ok)
        for r in log.orderBy("global_rank").collect()
    ]
    assert resumed == full


def test_hybrid_mode_identical_to_exact(spark, inputs, tmp_path_factory):
    exact, _ = _run(spark, inputs, str(tmp_path_factory.mktemp("exact")))
    hybrid, _ = _run(
        spark, inputs, str(tmp_path_factory.mktemp("hybrid")),
        dedup_mode="hybrid", filter_parts=8, filter_capacity=1 << 12,
    )
    assert hybrid == exact


def test_cuckoo_mode_bloom_semantics(spark, inputs, tmp_path_factory):
    exact, _ = _run(spark, inputs, str(tmp_path_factory.mktemp("exact2")))
    cuckoo, _ = _run(
        spark, inputs, str(tmp_path_factory.mktemp("cuckoo")),
        dedup_mode="cuckoo", filter_parts=8, filter_capacity=1 << 12,
    )
    # never re-admits a seen URL → crawled set can only shrink vs exact
    exact_urls = {t[4] for t in exact}
    cuckoo_urls = {t[4] for t in cuckoo}
    assert cuckoo_urls <= exact_urls
    # at 16-bit fingerprints the FP rate is ~1e-4: expect (near-)equality
    assert len(cuckoo_urls) >= 0.99 * len(exact_urls)


def test_fused_fetch_mode_same_schedule(spark, inputs, tmp_path_factory):
    """fetch_mode=fused must reproduce the join-mode crawl exactly on
    the scheduling dimensions (fetch_ok coin is JVM-side and shared);
    only the image linkage (md5 vs xxhash mapping) differs."""
    seeds, robots, budgets, images = inputs
    logs = {}
    for mode in ("join", "fused"):
        cfg = CrawlConfig(
            workdir=str(tmp_path_factory.mktemp(f"fm_{mode}")), n_images=IMGS,
            pages_per_host=PAGES, max_rounds=4, decode=True, fetch_mode=mode,
        )
        log = run_crawl(spark, seeds, robots, budgets, images, cfg)
        logs[mode] = [
            (r.round, r.priority, r.host, r.seq, r.url_canon, r.host_rank, r.fetch_ok)
            for r in log.orderBy("global_rank").collect()
        ]
        ok = log.filter(F.col("fetch_ok"))
        assert ok.filter(~F.col("invariant_ok") | (F.col("psnr") < 40.0)).count() == 0
    assert logs["fused"] == logs["join"]
