"""The crawl driver loop — cola's Job/Container/Executor re-expressed
as deterministic batch rounds over snapshot tables.

Reference lifecycle (cola/job/executor.py ~L60-260, cola/job/container.py):
  loop: units = mq.get(batch); granted = budget.apply(n);
        fetch; parse -> new units; mq.put(new) [dedup inside];
        counter.inc; budget.finish/error; requeue on error
  until ALLFINISHED or frontier empty.

Here one loop iteration is one *round*: every stage is a DataFrame
transformation, and the only driver-side values are per-round scalars
(scheduled count, stop condition) — the analogue of cola's two RPCs.

Determinism contract (the BASELINE order-match criterion): the global
crawl order is the total order (round, priority, host, seq). Nothing
depends on partition iteration order or parallelism, so the same seeds
+ budgets yield byte-identical crawl logs at local[8] and local[32] —
and on a 1000-executor cluster.

State is persisted per round under workdir (parquet + manifest), which
both truncates lineage (essential for iterative loops) and gives
checkpoint/resume — the analogue of cola's pickled budget.info /
counter.info / bloom file / mq stores (cola/functions/*.py persistence,
cola/core/mq/store.py). The `seen` table is written hash-partitioned by
pmod(url_hash, P) so the per-round anti-join co-partitions.
"""

from __future__ import annotations

import json
import os
import time
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cola_spark.operators.budget import (
    budget_caps,
    init_budget_state,
    update_budget_state,
)
from cola_spark.operators.dedup import FRONTIER_COLS, admit, prepare_frontier
from cola_spark.operators.fetch import discover_links, synthetic_fetch
from cola_spark.operators.priority import schedule_cut
from cola_spark.operators.retry import split_retry
from cola_spark.operators.robots import robots_gate

SEEN_PARTS = 32  # fixed partition count for the seen table (independent of parallelism)


@dataclass
class CrawlConfig:
    workdir: str
    n_images: int = 200
    pages_per_host: int = 50
    max_rounds: int = 30
    max_retries: int = 3
    salt_buckets: int = 16
    decode: bool = True


def _p(cfg: CrawlConfig, *parts: str) -> str:
    return os.path.join(cfg.workdir, *parts)


def _write_state(cfg, rnd, pending, seen, bstate):
    pending.write.mode("overwrite").parquet(_p(cfg, "state", f"round={rnd}", "pending"))
    (
        seen.repartition(SEEN_PARTS, F.pmod(F.col("url_hash"), F.lit(SEEN_PARTS)))
        .write.mode("overwrite")
        .parquet(_p(cfg, "state", f"round={rnd}", "seen"))
    )
    bstate.write.mode("overwrite").parquet(_p(cfg, "state", f"round={rnd}", "budget"))


def _read_state(spark, cfg, rnd):
    base = _p(cfg, "state", f"round={rnd}")
    return (
        spark.read.parquet(os.path.join(base, "pending")),
        spark.read.parquet(os.path.join(base, "seen")),
        spark.read.parquet(os.path.join(base, "budget")),
    )


def latest_round(cfg: CrawlConfig) -> int | None:
    mf = _p(cfg, "manifest.json")
    if not os.path.exists(mf):
        return None
    with open(mf) as f:
        return json.load(f)["round"]


def _commit_manifest(cfg: CrawlConfig, rnd: int, stats: dict) -> None:
    """Iceberg-snapshot-style commit: state for round r is only visible
    once the manifest points at it (atomic rename)."""
    mf = _p(cfg, "manifest.json")
    tmp = mf + ".tmp"
    hist = []
    if os.path.exists(mf):
        with open(mf) as f:
            hist = json.load(f).get("history", [])
    with open(tmp, "w") as f:
        json.dump({"round": rnd, "stats": stats, "history": hist + [stats]}, f, indent=1)
    os.replace(tmp, mf)


def run_crawl(
    spark: SparkSession,
    seeds: DataFrame,
    robots: DataFrame,
    budgets: DataFrame,
    images: DataFrame,
    cfg: CrawlConfig,
    resume: bool = False,
) -> DataFrame:
    """Run the crawl to completion; returns the crawl log (one row per
    scheduled fetch: round, host_rank, fetch/decode outcome)."""
    empty_frontier = spark.createDataFrame(
        [], "url string, url_canon string, url_hash long, host string, path string,"
        " priority int, seq long, force boolean, error_times int",
    )

    start = latest_round(cfg) if resume else None
    if start is None:
        os.makedirs(cfg.workdir, exist_ok=True)
        candidates = prepare_frontier(
            seeds.select("url", "priority", "seq", "force")
        )
        pending = empty_frontier
        seen = spark.createDataFrame([], "url_hash long")
        bstate = init_budget_state(budgets)
        rnd = 0
    else:
        pending, seen, bstate = _read_state(spark, cfg, start)
        cand_path = _p(cfg, "state", f"round={start}", "candidates")
        candidates = (
            spark.read.parquet(cand_path) if os.path.exists(cand_path) else empty_frontier
        )
        rnd = start + 1

    while rnd < cfg.max_rounds:
        t0 = time.monotonic()
        # 1. admission: dedup gate on everything entering the frontier
        admitted, new_seen = admit(candidates, seen)
        # 2. robots gate (blocked URLs stay in `seen` — never re-admitted)
        allowed = robots_gate(admitted, robots)
        pending = pending.unionByName(allowed.select(*FRONTIER_COLS))
        # 3. budget+rate cut in priority-FIFO order
        scheduled = schedule_cut(pending, budget_caps(bstate), cfg.salt_buckets)
        scheduled.cache()
        n_scheduled = scheduled.count()
        if n_scheduled == 0:
            # stop marker: keep the manifest pointing at the last round
            # that actually committed state (rnd - 1)
            _commit_manifest(cfg, rnd - 1, {"round": rnd - 1, "scheduled": 0, "stopped": True})
            scheduled.unpersist()
            break
        # 4. fetch + decode (vectorized), verify per-row invariants
        fetched = synthetic_fetch(scheduled, images, cfg.n_images, decode=cfg.decode)
        fetched.cache()
        ok = fetched.filter(F.col("fetch_ok"))
        failed = fetched.filter(~F.col("fetch_ok")).select(*FRONTIER_COLS)
        # 5. retry/requeue and link discovery feed the next round
        requeue, _dropped = split_retry(failed, cfg.max_retries)
        children = prepare_frontier(discover_links(ok, cfg.pages_per_host))
        # 6. ledger update (counters: partial agg per host, broadcast-size result)
        by_host = lambda df, name: df.groupBy("host").agg(F.count("*").alias(name))
        bstate = update_budget_state(
            bstate,
            by_host(scheduled, "n_granted"),
            by_host(ok, "n_finished"),
            by_host(failed, "n_errored"),
        )
        # 7. persist round: crawl log, state snapshot, metrics
        log_cols = ["round", *FRONTIER_COLS, "host_rank", "image_id", "fetch_ok"]
        if cfg.decode:
            log_cols += ["fmt", "psnr", "invariant_ok"]
        fetched.withColumn("round", F.lit(rnd)).select(*log_cols).write.mode(
            "overwrite"
        ).parquet(_p(cfg, "log", f"round={rnd}"))

        pending = pending.join(scheduled.select("seq"), "seq", "left_anti")
        seen = seen.unionByName(new_seen)
        _write_state(cfg, rnd, pending, seen, bstate)
        pending, seen, bstate = _read_state(spark, cfg, rnd)

        stats = {
            "round": rnd,
            "scheduled": n_scheduled,
            "secs": round(time.monotonic() - t0, 3),
        }
        _commit_manifest(cfg, rnd, stats)
        fetched.unpersist()
        scheduled.unpersist()
        candidates = children.unionByName(requeue)
        # fold next-round inputs through the same admission gate next iter;
        # but they must survive a resume → persist them as pending-candidates
        candidates.write.mode("overwrite").parquet(_p(cfg, "state", f"round={rnd}", "candidates"))
        candidates = spark.read.parquet(_p(cfg, "state", f"round={rnd}", "candidates"))
        rnd += 1

    return crawl_log(spark, cfg)


def crawl_log(spark: SparkSession, cfg: CrawlConfig) -> DataFrame:
    """The global crawl-order artifact: total order (round, priority,
    host, seq) with a global rank."""
    import glob

    from pyspark.sql import Window

    if not glob.glob(_p(cfg, "log", "round=*")):
        schema = (
            "round int, " + "url string, url_canon string, url_hash long, host string,"
            " path string, priority int, seq long, force boolean, error_times int,"
            " host_rank int, image_id string, fetch_ok boolean"
        )
        if cfg.decode:
            schema += ", fmt string, psnr double, invariant_ok boolean"
        return spark.createDataFrame([], schema + ", global_rank int")
    log = spark.read.option("basePath", _p(cfg, "log")).parquet(_p(cfg, "log", "round=*"))
    w = Window.orderBy("round", "priority", "host", "seq")
    return log.withColumn("global_rank", F.row_number().over(w))


def final_state(spark: SparkSession, cfg: CrawlConfig):
    rnd = latest_round(cfg)
    last = rnd if os.path.exists(_p(cfg, "state", f"round={rnd}", "pending")) else rnd - 1
    return _read_state(spark, cfg, last)
