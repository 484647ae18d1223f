"""Streaming crawl mode — cola's unbounded executor loop re-expressed
as Structured Streaming.

The reference's crawl loop is an unbounded stateful dataflow: the MQ is
refilled by parsers while executors drain it, speed control meters
pages/minute per instance, and the bloom filter carries URL-seen state
(cola/job/executor.py, cola/functions/speed.py). The batch round loop
(plans/scheduler.py) is the *primary* mode — deterministic and
replayable, which the exact-order contract requires — but continuous
operation maps onto Structured Streaming:

  * unbounded source    → file stream of frontier parquet drops
                          (readStream; new seed files appear over time)
  * URL-seen dedup      → dropDuplicates("url_hash") — keyed state store
                          (unbounded by design: a crawl never forgets)
  * speed control       → applyInPandasWithState per host: token-bucket
                          state (budget, tokens) mirroring
                          BudgetApplyServer.apply + SpeedControl rates
  * rate windows        → tumbling-window counts with watermark for
                          late discoveries
  * sink                → parquet/foreachBatch (where each micro-batch
                          can reuse the batch operators wholesale)
"""

from __future__ import annotations

from typing import Iterator, Tuple

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    BooleanType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from cola_spark.functions.urls import canonicalize_url, host_of, path_of, url_hash_col


def configure_rocksdb_state(spark: SparkSession) -> None:
    """Use the RocksDB state store for streaming state.

    The seen-set state (dedup_stream's dropDuplicates) grows without
    bound BY DESIGN — a crawl never forgets. The default HDFS-backed
    store keeps every key in executor heap and OOMs at the 10^10-URL
    design point; RocksDB spills state to local disk with a bounded
    block cache, which is the only configuration under which unbounded
    keyed state is survivable. Ships with Spark (no extra jar); applies
    to queries started after this call.
    """
    spark.conf.set(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    # bound RocksDB memory across all state store instances on an executor
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.boundedMemoryUsage", "true"
    )
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.maxMemoryUsageMB", "512"
    )


def streaming_frontier(spark: SparkSession, seed_dir: str, schema: str | None = None) -> DataFrame:
    """readStream over a directory receiving frontier parquet drops;
    canonicalizes and keys exactly like the batch path."""
    schema = schema or (
        "url string, priority int, seq long, force boolean, discovered_ts timestamp"
    )
    raw = spark.readStream.schema(schema).parquet(seed_dir)
    df = raw.withColumn("url_canon", canonicalize_url(F.col("url")))
    return (
        df.filter(F.col("url_canon").isNotNull())
        .withColumn("url_hash", url_hash_col(F.col("url_canon")))
        .withColumn("host", host_of(F.col("url_canon")))
        .withColumn("path", path_of(F.col("url_canon")))
    )


def dedup_stream(frontier: DataFrame) -> DataFrame:
    """Streaming URL-seen: keyed state store on url_hash. No watermark
    on purpose — the seen set must never expire (cola's bloom filter
    also only grows)."""
    return frontier.dropDuplicates(["url_hash"])


_GATE_OUT = StructType([
    StructField("host", StringType()),
    StructField("url_canon", StringType()),
    StructField("url_hash", LongType()),
    StructField("priority", IntegerType()),
    StructField("seq", LongType()),
    StructField("granted", BooleanType()),
])
_GATE_STATE = StructType([
    StructField("applied", LongType()),
    StructField("budget", LongType()),
    StructField("rate", LongType()),
])


def _gate_fn(budget_default: int, rate_default: int):
    def gate(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-host token bucket: grant up to min(budget-applied, rate)
        rows per micro-batch, in (priority, seq) order — the streaming
        twin of BudgetApplyServer.apply + the per-round rate cap."""
        if state.exists:
            applied, budget, rate = state.get
        else:
            applied, budget, rate = 0, budget_default, rate_default
        for pdf in pdfs:
            pdf = pdf.sort_values(["priority", "seq"], kind="mergesort")
            cap = max(min(budget - applied, rate), 0)
            granted_mask = [i < cap for i in range(len(pdf))]
            applied += min(cap, len(pdf))
            out = pdf[["host", "url_canon", "url_hash", "priority", "seq"]].copy()
            out["granted"] = granted_mask
            yield out
        state.update((applied, budget, rate))

    return gate


def token_bucket_gate(
    frontier: DataFrame, budget: int = 20, rate: int = 5
) -> DataFrame:
    """Stateful per-host politeness gate (applyInPandasWithState)."""
    return frontier.groupBy("host").applyInPandasWithState(
        _gate_fn(budget, rate),
        outputStructType=_GATE_OUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def rate_metrics_stream(frontier: DataFrame, window: str = "1 minute") -> DataFrame:
    """Tumbling-window discovery rates with a late-data watermark —
    cola's pages/minute speed accounting as a streaming agg."""
    return (
        frontier.withWatermark("discovered_ts", "2 minutes")
        .groupBy(F.window("discovered_ts", window).alias("w"), "host")
        .agg(F.count("*").alias("n_urls"))
        .select(F.col("w.start").alias("window_start"), "host", "n_urls")
    )
