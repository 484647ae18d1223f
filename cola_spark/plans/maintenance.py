"""State maintenance — compaction of the append-only delta layouts.

At the 10^10-URL design point the seen set accrues one delta directory
per round; the per-round anti-join reads all of them. Periodic
compaction (every ~50-100 rounds, or off the critical path on a
separate maintenance job) folds them into a single hash-partitioned
snapshot — the same role Iceberg's rewrite_data_files maintenance
action plays; the filter layout keeps only the newest blob per part.

Crash-safety protocol (commit-then-remove, never the reverse):
  1. write the folded snapshot to a tmp dir (Spark write);
  2. atomically rename it to a FRESH ``compacted=<k>`` dir (k strictly
     increasing — never collides with a round-numbered ``delta=<r>``
     dir or an older compacted dir);
  3. only then remove the superseded delta/compacted dirs.
A crash at ANY point leaves the readers seeing a *superset* of the
state: duplicated seen hashes are harmless to the anti-join, and
duplicated filter blobs are byte-identical (the compacted blob for a
part IS the latest delta's blob), so the latest-per-part window is
deterministic even on ties.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession
from pyspark.sql import functions as F

from cola_spark.plans.scheduler import CrawlConfig, _p, _read_filters, _read_seen


def _state_dirs(cfg: CrawlConfig, kind: str) -> tuple[list[str], list[str], int]:
    """(delta_dirs, compacted_dirs, next_compaction_index)."""
    deltas = cfg.io.list_dirs(_p(cfg, kind, "delta=*"))
    compacted = cfg.io.list_dirs(_p(cfg, kind, "compacted=*"))
    nxt = 1 + max(
        (int(os.path.basename(d).split("=")[1]) for d in compacted), default=-1
    )
    return deltas, compacted, nxt


def _commit_compaction(cfg: CrawlConfig, kind: str, df) -> int:
    """Write → rename-commit → remove superseded. Returns dirs removed.
    All driver-side FS mutations go through the cfg.io seam (the Spark
    parquet write speaks the workdir URI natively)."""
    deltas, compacted, nxt = _state_dirs(cfg, kind)
    if len(deltas) + len(compacted) <= 1:
        return 0
    tmp = _p(cfg, kind, "_compact_tmp")
    cfg.io.remove_dir(tmp)  # stale tmp from a crashed run
    df.write.mode("overwrite").parquet(tmp)
    cfg.io.rename(tmp, _p(cfg, kind, f"compacted={nxt}"))  # the commit point
    removed = 0
    for d in deltas + compacted:  # superseded only after the commit
        cfg.io.remove_dir(d)
        removed += 1
    return removed


def compact_seen(spark: SparkSession, cfg: CrawlConfig) -> int:
    """Fold all seen deltas into one snapshot; returns dirs removed.
    distinct() because a crashed prior compaction can leave the same
    hash in both a compacted dir and its source deltas."""
    seen = _read_seen(spark, cfg).distinct()
    folded = seen.repartition(
        cfg.seen_parts, F.pmod(F.col("url_hash"), F.lit(cfg.seen_parts))
    )
    return _commit_compaction(cfg, "seen", folded)


def compact_filters(spark: SparkSession, cfg: CrawlConfig) -> int:
    """Keep only the latest blob per part; returns dirs removed."""
    latest = _read_filters(spark, cfg, with_delta=True)
    return _commit_compaction(cfg, "filters", latest)


def vacuum_old_state(cfg: CrawlConfig, keep_last: int = 2) -> int:
    """Drop per-round pending/budget snapshots older than the last
    ``keep_last`` rounds (the manifest only ever points at the newest).
    Crawl logs are never vacuumed — they are the output."""
    dirs = sorted(
        cfg.io.list_dirs(_p(cfg, "state", "round=*")),
        key=lambda d: int(os.path.basename(d).split("=")[1]),
    )
    removed = 0
    for d in dirs[:-keep_last] if keep_last else dirs:
        cfg.io.remove_dir(d)
        removed += 1
    return removed
