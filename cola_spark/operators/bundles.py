"""Bundle mode — cola's `Bundle` unit re-expressed.

Reference (cola/core/unit.py ~L42-90 + contrib/weibo/bundle.py): a
Bundle groups related URLs crawled as one entity (one weibo user =
profile + pages); its identity is the label (str(bundle)), dedup is on
the label, and the executor crawls a bundle's URLs together.

Spark re-expression: frontier rows carry bundle_label; bundle-level
scheduling reduces each bundle to one logical row (priority = best
member priority, seq = first member seq — FIFO by discovery of the
bundle), cuts per host on bundles, then fans back out to the member
URLs. Custom per-bundle generation logic (cola's unit_cls override)
plugs in as a groupBy(label).applyInPandas.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.priority import schedule_cut


def bundle_reduce(frontier: DataFrame) -> DataFrame:
    """One row per bundle: (host, bundle_label, priority=min,
    seq=min, url_hash=xxhash64(label), n_urls)."""
    return frontier.groupBy("host", "bundle_label").agg(
        F.min("priority").alias("priority"),
        F.min("seq").alias("seq"),
        F.count("*").alias("n_urls"),
    ).withColumn("url_hash", F.xxhash64("bundle_label"))


def schedule_bundles(frontier: DataFrame, caps: DataFrame, salt_buckets: int = 16) -> DataFrame:
    """Budget cut at bundle granularity, fanned back to member URLs.

    cap counts *bundles* per host per round (cola grants per unit, and
    a bundle is the unit). Members keep their own (priority, seq) order
    inside the bundle via bundle_rank.
    """
    bundles = bundle_reduce(frontier)
    granted = schedule_cut(bundles, caps, salt_buckets).select(
        "host", "bundle_label", F.col("host_rank").alias("bundle_rank")
    )
    return frontier.join(granted, ["host", "bundle_label"], "inner")
