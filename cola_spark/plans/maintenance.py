"""State maintenance — compaction of the append-only delta layouts.

At the 10^10-URL design point the seen set accrues one delta directory
per round; the per-round anti-join reads all of them. Periodic
compaction (every ~50-100 rounds, or off the critical path on a
separate maintenance job) folds them into a single hash-partitioned
snapshot — the same role Iceberg's rewrite_data_files maintenance
action plays; the filter layout keeps only the newest blob per part.

Safe under the manifest protocol: compaction writes to a fresh delta
dir (delta=<r> with r = current max, replacing all lower ones) and
removes superseded dirs only after the write commits.
"""

from __future__ import annotations

import glob
import os
import shutil

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cola_spark.plans.scheduler import CrawlConfig, _p, _read_filters, _read_seen


def compact_seen(spark: SparkSession, cfg: CrawlConfig) -> int:
    """Fold all seen deltas into one; returns number of dirs removed."""
    dirs = sorted(glob.glob(_p(cfg, "seen", "delta=*")))
    if len(dirs) <= 1:
        return 0
    seen = _read_seen(spark, cfg)
    tmp = _p(cfg, "seen", "_compact_tmp")
    (
        seen.repartition(cfg.seen_parts, F.pmod(F.col("url_hash"), F.lit(cfg.seen_parts)))
        .write.mode("overwrite")
        .parquet(tmp)
    )
    top = max(int(os.path.basename(d).split("=")[1]) for d in dirs)
    final = _p(cfg, "seen", f"delta={top}")
    for d in dirs:
        shutil.rmtree(d)
    os.replace(tmp, final)
    return len(dirs)


def compact_filters(spark: SparkSession, cfg: CrawlConfig) -> int:
    """Keep only the latest blob per part; returns dirs removed."""
    dirs = sorted(glob.glob(_p(cfg, "filters", "delta=*")))
    if len(dirs) <= 1:
        return 0
    latest = _read_filters(spark, cfg)
    top = max(int(os.path.basename(d).split("=")[1]) for d in dirs)
    tmp = _p(cfg, "filters", "_compact_tmp")
    latest.withColumn("delta", F.lit(top)).write.mode("overwrite").parquet(tmp)
    for d in dirs:
        shutil.rmtree(d)
    os.replace(tmp, _p(cfg, "filters", f"delta={top}"))
    return len(dirs)


def vacuum_old_state(cfg: CrawlConfig, keep_last: int = 2) -> int:
    """Drop per-round pending/budget snapshots older than the last
    ``keep_last`` rounds (the manifest only ever points at the newest).
    Crawl logs are never vacuumed — they are the output."""
    dirs = sorted(
        glob.glob(_p(cfg, "state", "round=*")),
        key=lambda d: int(os.path.basename(d).split("=")[1]),
    )
    removed = 0
    for d in dirs[:-keep_last] if keep_last else dirs:
        shutil.rmtree(d)
        removed += 1
    return removed
