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
    ArrayType,
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
    # over-cap carry-over: the host's pending queue rides in state so a
    # row denied this micro-batch competes again next batch (the pure-
    # streaming twin of the batch loop's state/round=N/pending)
    StructField("pend_url", ArrayType(StringType())),
    StructField("pend_hash", ArrayType(LongType())),
    StructField("pend_prio", ArrayType(IntegerType())),
    StructField("pend_seq", ArrayType(LongType())),
])
_GATE_COLS = ["url_canon", "url_hash", "priority", "seq"]


def _gate_fn(budget_default: int, rate_default: int, timeout_revisit: bool = False):
    def gate(
        key: Tuple[str], pdfs: Iterator[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        """Per-host token bucket with PENDING CARRY-OVER: each
        micro-batch grants up to min(budget-applied, rate) rows from
        (carried pending ∪ new arrivals) in (priority, seq) order —
        the streaming twin of BudgetApplyServer.apply + the per-round
        rate cap + the batch loop's pending state. Rows over the cap
        are emitted once as granted=false (the arrival decision) and
        carried in state; when capacity refills in a later batch they
        are re-emitted granted=true — so the output is a decision log
        whose granted=true rows are exactly the grant stream, and
        nothing is ever silently dropped.

        With timeout_revisit, a key with leftover pending arms a (1 ms)
        processing-time timeout: applyInPandasWithState only invokes
        keys present in the micro-batch, so without the timeout a host
        with carried rows but no new arrivals would starve until its
        next arrival.
        """
        if state.exists:
            applied, budget, rate, p_url, p_hash, p_prio, p_seq = state.get
            pending = pd.DataFrame({
                "url_canon": list(p_url or []),
                "url_hash": list(p_hash or []),
                "priority": list(p_prio or []),
                "seq": list(p_seq or []),
            })
        else:
            applied, budget, rate = 0, budget_default, rate_default
            pending = pd.DataFrame(columns=_GATE_COLS)
        host = key[0]
        chunks = [pdf[_GATE_COLS] for pdf in pdfs]
        new = pd.concat(chunks, ignore_index=True) if chunks else pd.DataFrame(
            columns=_GATE_COLS
        )
        queue = pd.concat([pending, new], ignore_index=True).sort_values(
            ["priority", "seq"], kind="mergesort"
        )
        cap = max(min(budget - applied, rate), 0)
        granted = queue.iloc[:cap].copy()
        rest = queue.iloc[cap:]
        applied += len(granted)

        granted["granted"] = True
        # first-arrival denials only — carried rows were already logged
        new_denied = new[new["seq"].isin(set(rest["seq"]))].copy()
        new_denied["granted"] = False
        out = pd.concat([granted, new_denied], ignore_index=True)
        out.insert(0, "host", host)
        state.update((
            applied, budget, rate,
            rest["url_canon"].tolist(),
            [int(x) for x in rest["url_hash"]],
            [int(x) for x in rest["priority"]],
            [int(x) for x in rest["seq"]],
        ))
        # Re-arm only while the key can make progress: rate >= 1 means a
        # revisit with applied < budget always grants something, so the
        # queue drains in finitely many batches. A budget-exhausted key
        # must NOT re-arm — it would busy-loop timeout batches forever
        # (its pending can never be granted by this gate).
        if timeout_revisit and len(rest) and applied < budget:
            state.setTimeoutDuration(1)  # revisit this key next batch
        yield out[["host", "url_canon", "url_hash", "priority", "seq", "granted"]]

    return gate


def token_bucket_gate(
    frontier: DataFrame, budget: int = 20, rate: int = 5,
    timeout_revisit: bool = False,
) -> DataFrame:
    """Stateful per-host politeness gate (applyInPandasWithState) with
    over-cap carry-over across micro-batches.

    timeout_revisit=True additionally revisits pending-holding hosts
    via a processing-time timeout even when no new rows arrive for
    them — starvation-free draining for CONTINUOUS deployments
    (processingTime/continuous triggers). Leave it False for
    drain-and-stop runs: Spark's FlatMapGroupsWithState with
    ProcessingTimeTimeout always reports "may need another batch"
    (processing time keeps advancing), so a Trigger.AvailableNow query
    would run state-cleanup micro-batches forever and
    processAllAvailable() would never return.
    """
    return frontier.groupBy("host").applyInPandasWithState(
        _gate_fn(budget, rate, timeout_revisit),
        outputStructType=_GATE_OUT,
        stateStructType=_GATE_STATE,
        outputMode="append",
        timeoutConf=(
            GroupStateTimeout.ProcessingTimeTimeout
            if timeout_revisit
            else GroupStateTimeout.NoTimeout
        ),
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
