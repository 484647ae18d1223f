"""Frontier admission = URL-seen dedup, re-expressed set-based.

Reference semantics (cola/core/mq/__init__.py put path ~L60-120 +
cola/core/dedup.py exist_or_add ~L20-50): on every put, each non-force
unit is checked against the bloom seen-set and silently dropped if
present; force units bypass the check entirely (and are NOT added to
the seen set — exist_or_add is only called on the non-force branch).
Sequential put order decides which of two same-key units in one batch
survives (first wins).

Spark re-expression: one batch of candidate rows per round;
  * within-batch first-wins  → row_number over (url_hash ORDER BY seq) = 1
  * not-seen-before          → left_anti join against the seen table
  * force branch             → unioned past both checks
The anti-join is the exact-correctness oracle; the approximate fast
path (partitioned cuckoo filter, cola's bloom analogue) lives in
cola_spark.filters.cuckoo and prunes the anti-join input at scale.

Scale notes: `seen` is the big table (10^10 rows design point). We keep
it hash-partitioned by pmod(url_hash, P) on disk so the per-round
anti-join shuffles only the (small) candidate side under AQE; the
window partitions by url_hash — high cardinality, no skew.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cola_spark.functions.urls import canonicalize_url, host_of, path_of, url_hash_col

FRONTIER_COLS = [
    "url", "url_canon", "url_hash", "host", "path",
    "priority", "seq", "force", "error_times",
]


def prepare_frontier(raw: DataFrame) -> DataFrame:
    """Normalize raw (url, priority, seq, force) rows into the frontier
    schema: canonical URL, xxhash64 key, host, path; drops unparseable
    URLs (canon null) — the 100 TB-scale reality is malformed URLs exist.
    """
    df = raw.withColumn("url_canon", canonicalize_url(F.col("url")))
    df = df.filter(F.col("url_canon").isNotNull())
    df = (
        df.withColumn("url_hash", url_hash_col(F.col("url_canon")))
        .withColumn("host", host_of(F.col("url_canon")))
        .withColumn("path", path_of(F.col("url_canon")))
    )
    if "error_times" not in df.columns:
        df = df.withColumn("error_times", F.lit(0))
    return df.select(*FRONTIER_COLS)


def admit(candidates: DataFrame, seen: DataFrame) -> tuple[DataFrame, DataFrame]:
    """Dedup one batch of candidates against the seen set.

    Returns (admitted, newly_seen_hashes). ``seen`` is a DataFrame with
    a single ``url_hash`` column. Force rows pass unchecked and do not
    enter ``seen`` (cola force semantics).
    """
    nonforce = candidates.filter(~F.col("force"))
    w = Window.partitionBy("url_hash").orderBy("seq")
    first = (
        nonforce.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )
    fresh = first.join(seen.select("url_hash"), "url_hash", "left_anti")
    admitted = candidates.filter(F.col("force")).unionByName(fresh)
    return admitted, fresh.select("url_hash")
