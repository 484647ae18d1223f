"""Error retry / requeue.

Reference: on fetch/parse error the executor bumps unit.error_times and
re-puts the unit until settings.job.error.times, then drops it when
error.ignore is set (cola/job/executor.py ~L120-260). Re-put units keep
their identity; since the URL is already in the seen set, requeue
re-enters with force semantics so the dedup gate doesn't eat the retry.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.dedup import FRONTIER_COLS


def split_retry(failed: DataFrame, max_retries: int = 3) -> tuple[DataFrame, DataFrame]:
    """(requeue, dropped): bump error_times, requeue below the cap with
    force=True, drop at the cap."""
    bumped = failed.withColumn("error_times", F.col("error_times") + 1).withColumn(
        "force", F.lit(True)
    )
    requeue = bumped.filter(F.col("error_times") < max_retries).select(*FRONTIER_COLS)
    dropped = bumped.filter(F.col("error_times") >= max_retries).select(*FRONTIER_COLS)
    return requeue, dropped
