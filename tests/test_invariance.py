"""Cluster-size invariance (BASELINE.md): the same job at two
parallelism levels produces identical results — run via the real CLI in
separate JVMs (local[2] vs local[16])."""

import json
import os
import subprocess
import sys

import duckdb

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run(master, wd):
    env = os.environ.copy()
    env["PYTHONPATH"] = REPO
    env["SPARK_GRAFT_DRIVER_MEM"] = "4g"
    out = subprocess.run(
        [sys.executable, "-m", "cola_spark.run_job", "--workdir", wd,
         "--n-urls", "400", "--n-hosts", "10", "--rounds", "3",
         "--no-decode", "--master", master],
        env=env, capture_output=True, text=True, cwd=REPO, timeout=420,
    )
    assert out.returncode == 0, out.stderr[-1500:]
    return json.loads(out.stdout.strip().splitlines()[-1])


def test_driver_queries_invariant_to_shuffle_partitions(spark):
    """The round-2 training-pipeline queries must return identical rows
    at different shuffle-partition counts (partitioning is the main
    nondeterminism surface inside one JVM: hash vs range boundaries,
    agg/window task layout, iterative-join ordering)."""
    from cola_spark.queries import PAIRS

    sf = "/root/testdata/sf0.001"
    names = [
        "dedup_clusters", "corpus_clean", "jaccard_prefix_pairs", "ann_ivf_topk",
        # round-3 additions: span rebuild (window+islands), decontam
        # (broadcast probe + groupBy), sampling (map-side), PQ (argmax
        # aggregate + pivot), unigram (Zipf-split join), full mix
        "span_dedup", "decontam_overlap", "domain_sample", "ann_pq_topk",
        "docs_unigram_quality", "corpus_mix_clean",
        # round-5 additions: the partition-sensitive shapes — two-phase
        # segmented cumsum (spark_partition_id + RangePartitioner),
        # census anti-join + per-doc reassembly, no-window argmax,
        # float-keyed top-k, per-(bucket, shard) windows, vocab-scale
        # merge application, 3-stage nested composition
        "token_budget_mix", "epoch_repeat_mix", "line_boilerplate_dedup",
        "anchor_text_rollup", "caption_image_retrieval",
        "aspect_bucket_pack", "bpe_encode_counts", "trainer_batch_plan",
        # round-5 late additions: iterative joins (redirect hops, AIMD
        # rounds), host-window parse (robots blocks), global-rank cut
        # (clip top-p), sketch merges (HLL), full-outer diff,
        # self-semi-join (reciprocity), longest-suffix match (PSL)
        "redirect_resolve", "aimd_rate_control", "robots_parse_gate",
        "crawl_policy_plan", "clip_percentile_filter", "hll_registers",
        "hll_seen_estimate", "crawl_snapshot_diff", "link_reciprocity",
        "registrable_domain", "rendezvous_route", "url_template_census",
        "fetch_latency_quantiles", "magic_sniff_gate",
        # continuation-session additions: CMS (192-cell spine + broadcast
        # point query), bigram LM (shuffle_hash LM joins + two-phase
        # rank), BM25 (TakeOrdered band + shortlist window), Gopher
        # (two fan-outs + co-partitioned triple join)
        "cms_heavy_hitters", "lm_perplexity_gate", "bm25_search_topk",
        "gopher_rules_gate",
        # priority sampling: TakeOrdered k+1 cut + config-scale tail
        "priority_sample",
    ]
    old = spark.conf.get("spark.sql.shuffle.partitions")
    try:
        results = {}
        for parts in ("7", "32"):
            spark.conf.set("spark.sql.shuffle.partitions", parts)
            results[parts] = {
                n: sorted(map(tuple, PAIRS[n][0](spark, sf).collect())) for n in names
            }
        for n in names:
            assert results["7"][n] == results["32"][n], f"{n} varies with partitions"
            assert results["7"][n], f"{n} returned no rows at sf0.001"
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", old)


def test_identical_crawl_at_two_parallelism_levels(tmp_path):
    r2 = _run("local[2]", str(tmp_path / "p2"))
    r16 = _run("local[16]", str(tmp_path / "p16"))
    assert r2["crawled"] == r16["crawled"] and r2["fetched_ok"] == r16["fetched_ok"]
    con = duckdb.connect()
    q = "SELECT round, priority, host, seq, url_canon, host_rank, fetch_ok FROM read_parquet('{}/log/*/*.parquet') ORDER BY ALL"
    a = con.execute(q.format(tmp_path / "p2")).fetchall()
    b = con.execute(q.format(tmp_path / "p16")).fetchall()
    assert len(a) == r2["crawled"] and a == b, "crawl logs differ across parallelism"
