"""Incremental re-crawl (cola `job.inc: true`, SURVEY §2 row 30).

Reference: finished bundles are re-enqueued into a separate inc queue
for continuous re-crawling (mq inc stores, cola/core/mq/store.py
~L260+). Here: successfully fetched rows from past rounds are
re-admitted with force=True (a re-crawl must bypass the seen gate —
that is exactly what cola's force flag exists for), with a fresh seq
in a disjoint range so FIFO ordering and seq uniqueness hold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.dedup import FRONTIER_COLS

INC_SEQ_OFFSET = 10**15


def inc_requeue(crawl_log: DataFrame, generation: int = 1) -> DataFrame:
    """Candidates for a re-crawl pass: every fetch_ok row, force=True,
    seq shifted into the inc range (per generation), error counter
    reset."""
    return (
        crawl_log.filter(F.col("fetch_ok"))
        .select(
            "url", "url_canon", "url_hash", "host", "path", "priority",
            (F.col("seq") + F.lit(generation) * INC_SEQ_OFFSET).alias("seq"),
            F.lit(True).alias("force"),
            F.lit(0).alias("error_times"),
        )
        .select(*FRONTIER_COLS)
    )
