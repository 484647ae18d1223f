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


def test_natural_stop_commits_final_admissions(spark, tmp_path_factory):
    """A crawl that exhausts its frontier before max_rounds must (a)
    have added the stop round's admissions to the seen set (oracle adds
    to seen before its stop check), (b) leave a manifest at a valid
    round >= 0 with the stopped flag, and (c) resume as a no-op."""
    import json

    from cola_spark.functions.urls import url_hash_col
    from cola_spark.plans.oracle import run_oracle
    from cola_spark.plans.scheduler import _read_seen, latest_round

    seeds = gen_frontier_seeds(spark, 40, n_hosts=4, pages_per_host=6)
    robots, budgets = gen_robots(spark, 4), gen_budgets(spark, 4)
    images = gen_images(spark, IMGS)
    wd = str(tmp_path_factory.mktemp("natstop"))
    cfg = CrawlConfig(workdir=wd, n_images=IMGS, pages_per_host=6, max_rounds=40, decode=False)
    log = run_crawl(spark, seeds, robots, budgets, images, cfg)
    with open(f"{wd}/manifest.json") as f:
        m = json.load(f)
    assert m["round"] >= 0 and m["stats"]["stopped"] is True
    assert m["round"] < 39, "fixture must stop naturally, not at max_rounds"
    oracle = run_oracle(
        [r.asDict() for r in seeds.select("url", "priority", "seq", "force").collect()],
        [r.asDict() for r in robots.collect()],
        [r.asDict() for r in budgets.collect()],
        pages_per_host=6, max_rounds=40,
    )
    want = {
        r.h
        for r in spark.createDataFrame([(u,) for u in oracle["seen"]], "c string")
        .select(url_hash_col(F.col("c")).alias("h"))
        .collect()
    }
    got = {r.url_hash for r in _read_seen(spark, cfg).collect()}
    assert got == want, "stop round's admissions missing from seen"
    # resume after natural stop: no new rounds, identical log
    before = [(r.round, r.seq) for r in log.orderBy("global_rank").collect()]
    log2 = run_crawl(spark, seeds, robots, budgets, images, cfg, resume=True)
    assert [(r.round, r.seq) for r in log2.orderBy("global_rank").collect()] == before
    assert latest_round(cfg) == m["round"]


def test_stop_at_round_zero_is_resumable(spark, tmp_path_factory):
    """Zero-cap budgets stop the crawl in round 0; the manifest must
    not point at round -1 and resume must not raise."""
    seeds = gen_frontier_seeds(spark, 50, n_hosts=4, pages_per_host=10)
    robots = gen_robots(spark, 4)
    budgets = gen_budgets(spark, 4).withColumn("budget", F.lit(0).cast("long"))
    images = gen_images(spark, IMGS)
    wd = str(tmp_path_factory.mktemp("round0"))
    cfg = CrawlConfig(workdir=wd, n_images=IMGS, pages_per_host=10, max_rounds=5, decode=False)
    from cola_spark.plans.scheduler import latest_round

    log = run_crawl(spark, seeds, robots, budgets, images, cfg)
    assert log.count() == 0
    assert latest_round(cfg) == 0
    log2 = run_crawl(spark, seeds, robots, budgets, images, cfg, resume=True)
    assert log2.count() == 0


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


def test_fused_fetch_mode_same_schedule_and_payload(spark, inputs, tmp_path_factory):
    """fetch_mode=fused must reproduce the join-mode crawl exactly —
    scheduling dimensions AND the payload linkage (both derive image_id
    via pmod(xxhash64(url_canon), n_images), so fmt/psnr agree too)."""
    seeds, robots, budgets, images = inputs
    logs = {}
    for mode in ("join", "fused"):
        cfg = CrawlConfig(
            workdir=str(tmp_path_factory.mktemp(f"fm_{mode}")), n_images=IMGS,
            pages_per_host=PAGES, max_rounds=4, decode=True, fetch_mode=mode,
        )
        log = run_crawl(spark, seeds, robots, budgets, images, cfg)
        logs[mode] = [
            (r.round, r.priority, r.host, r.seq, r.url_canon, r.host_rank,
             r.fetch_ok, r.image_id, r.fmt, r.psnr)
            for r in log.orderBy("global_rank").collect()
        ]
        ok = log.filter(F.col("fetch_ok"))
        assert ok.filter(~F.col("invariant_ok") | (F.col("psnr") < 40.0)).count() == 0
    assert logs["fused"] == logs["join"]


def test_resume_reproduces_full_run_on_objectstore(spark, inputs, tmp_path_factory):
    """The resume contract under object-store StateIO semantics (no-op
    makedirs, prefix listing, copy+delete rename): identical final log
    to the POSIX-backend straight run."""
    from cola_spark.stateio import ObjectStoreStateIO

    full, _ = _run(spark, inputs, str(tmp_path_factory.mktemp("os_full")),
                   io=ObjectStoreStateIO())
    wd = str(tmp_path_factory.mktemp("os_interrupted"))
    seeds, robots, budgets, images = inputs
    cfg = CrawlConfig(workdir=wd, n_images=IMGS, pages_per_host=PAGES,
                      max_rounds=2, decode=False, io=ObjectStoreStateIO())
    run_crawl(spark, seeds, robots, budgets, images, cfg)
    assert latest_round(cfg) == 1
    cfg.max_rounds = ROUNDS
    log = run_crawl(spark, seeds, robots, budgets, images, cfg, resume=True)
    resumed = [
        (r.round, r.priority, r.host, r.seq, r.url_canon, r.host_rank, r.fetch_ok)
        for r in log.orderBy("global_rank").collect()
    ]
    assert resumed == full
