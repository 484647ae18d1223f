"""Batched DNS resolution planning with a host-keyed TTL cache.

A web-scale fetcher cannot resolve per-URL: a 10^10-URL frontier holds
~10^7-10^8 DISTINCT hosts per round, and resolver capacity (plus
politeness toward the DNS infrastructure itself) is a scarce, budgeted
resource exactly like connection slots. cola resolves implicitly per
connection inside its urllib/mechanize opener (public cola
cola/core/opener.py — `MechanizeOpener.open`), which at distributed
scale multiplies identical lookups by the URL count. The Spark-first
shape keeps resolution state host-keyed and host-SCALE:

  * one `distinct` over the frontier's hosts — the same exchange the
    per-host politeness queue already pays, so no new exchange class;
  * a host-keyed LEFT join against the cache table (host, ip_key,
    resolved_at, ttl_s) classifies each host with pure column algebra:
    `hit` (cached, fresh), `expired` (cached, stale), `miss` (never
    resolved);
  * the to-resolve set (miss ∪ expired) is sharded over `n_resolvers`
    by host hash — hosts are DISTINCT keys here, so hash-mod is
    balanced by construction and needs no salting — and each shard's
    work is cut into bounded batches (resolvers accept batched
    queries): batch_idx = per-shard rank DIV batch_size. The per-shard
    window is (distinct hosts / n_resolvers) wide; size `n_resolvers`
    so that holds (1024 shards at 10^8 hosts ⇒ ~10^5 rows per window
    partition).
  * resolution itself is deterministic here — an md5-derived ip_key —
    standing in for the real batch resolver, which plugs in as a
    `mapInPandas` batch client over the SAME (shard, batch_idx) plan.
    The PLAN (cache join, TTL gate, shard + batch assignment) is the
    operator; the network call is the pluggable edge.

Hash families: `xxhash64` (JVM intrinsic) is the scale default;
`md5` gives the cross-engine form DuckDB can replay for the oracle
(queries.py `dns_batch_resolve`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family

_SHARD_SEED = 71


def resolve_ip_key(host_col):
    """Deterministic stand-in resolver: 8 hex chars of md5("ip0:"+host).
    Stable across re-resolutions (a host keeps its address), identical
    in DuckDB, and replaced wholesale by a real batched resolver UDF
    at the same column seam."""
    return F.substring(
        F.md5(F.concat(F.lit("ip0:"), host_col).cast("binary")), 1, 8
    )


def dns_cache_plan(
    frontier: DataFrame,
    cache: DataFrame,
    now_s: int,
    host_col: str = "host",
    n_resolvers: int = 16,
    batch_size: int = 32,
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """Per DISTINCT frontier host: (host, status, shard, batch_idx,
    ip_key).

    `cache` carries (host, ip_key, resolved_at, ttl_s). Hosts with a
    fresh cache row (resolved_at + ttl_s > now_s) are hits: shard and
    batch_idx are -1 and ip_key is served from cache with zero resolver
    work. Everything else is assigned a resolver shard (hash-mod over
    distinct hosts — balanced, salt-free) and a bounded batch within
    that shard, and gets the deterministic resolved ip_key.
    """
    h = hash_family(hash_kind)
    hosts = frontier.select(F.col(host_col).alias("host")).distinct()
    joined = hosts.join(
        cache.select(
            "host",
            F.col("ip_key").alias("_c_ip"),
            "resolved_at",
            "ttl_s",
        ),
        "host",
        "left",
    )
    classified = joined.select(
        "host",
        F.when(F.col("_c_ip").isNull(), F.lit("miss"))
        .when(
            F.col("resolved_at") + F.col("ttl_s") > F.lit(now_s),
            F.lit("hit"),
        )
        .otherwise(F.lit("expired"))
        .alias("status"),
        F.col("_c_ip"),
    )

    hits = classified.filter(F.col("status") == "hit").select(
        "host",
        "status",
        F.lit(-1).cast("long").alias("shard"),
        F.lit(-1).cast("long").alias("batch_idx"),
        F.col("_c_ip").alias("ip_key"),
    )

    to_resolve = classified.filter(F.col("status") != "hit").withColumn(
        "shard", F.pmod(h(F.col("host"), _SHARD_SEED), F.lit(n_resolvers)).cast("long")
    )
    w = Window.partitionBy("shard").orderBy("host")
    resolved = to_resolve.select(
        "host",
        "status",
        "shard",
        ((F.row_number().over(w) - 1) / F.lit(batch_size))
        .cast("long")
        .alias("batch_idx"),
        resolve_ip_key(F.col("host")).alias("ip_key"),
    )
    return hits.unionByName(resolved)


def ip_politeness_cut(
    frontier: DataFrame,
    resolution: DataFrame,
    host_cap: int,
    ip_cap: int,
    host_col: str = "host",
    order_cols: tuple = ("prio", "seq"),
) -> DataFrame:
    """Two-level politeness cut: per-HOST cap, then per-IP cap over the
    survivors.

    Per-host politeness alone under-throttles shared infrastructure: k
    hosts behind one CDN edge or shared-hosting IP each get their full
    host budget, so the IP receives k× the intended connection load.
    The web convention is to cap both. `resolution` is the host→ip_key
    table the DNS cache plan maintains (dns_cache_plan output or the
    cache itself).

    Shape: phase 1 is the host-partitioned FIFO window every politeness
    operator here already uses (embarrassingly host-parallel). Phase 2
    re-keys the SURVIVORS by ip_key: its window width is bounded by
    construction — an IP fronting k hosts sees at most k * host_cap
    rows, never raw frontier scale — so the second window is safe even
    for pathological CDN fan-in (k = 10^4 hosts at host_cap 100 is 10^6
    rows, one partition of work, vs the 10^10-row frontier). Ordering
    inside both windows is (priority, seq[, host]) — deterministic,
    seq is unique.
    """
    oc = [F.col(c) for c in order_cols]
    w_host = Window.partitionBy(host_col).orderBy(*oc)
    per_host = (
        frontier.withColumn(
            "host_rank", F.row_number().over(w_host).cast("long")
        )
        .filter(F.col("host_rank") <= host_cap)
    )
    joined = per_host.join(
        resolution.select(host_col, "ip_key"), host_col
    )
    w_ip = Window.partitionBy("ip_key").orderBy(*oc, F.col(host_col))
    return (
        joined.withColumn(
            "ip_rank", F.row_number().over(w_ip).cast("long")
        )
        .filter(F.col("ip_rank") <= ip_cap)
    )


def connection_wave_plan(
    granted: DataFrame,
    max_conns: int,
    rank_col: str = "host_rank",
) -> DataFrame:
    """Keep-alive execution shape for a host's granted URLs: assign
    each row a persistent-connection slot and a dispatch wave.

    After the politeness cut grants a host k URLs, the fetcher does not
    open k sockets: it holds `max_conns` persistent connections per
    host and pipelines waves across them — slot = (rank-1) mod
    max_conns picks the connection each URL reuses, wave = (rank-1) DIV
    max_conns orders the rounds, and every slot serves its waves in
    FIFO rank order (slot s gets ranks s+1, s+1+max_conns, ... — the
    politeness order is preserved per connection). Pure projection over
    the rank the cut already computed — zero new exchanges, zero
    windows; the fetch stage groups by (host, wave) to execute.
    """
    r0 = (F.col(rank_col) - 1).cast("long")
    return granted.select(
        "*",
        (r0 % F.lit(max_conns)).cast("long").alias("conn_slot"),
        F.expr(f"CAST(({rank_col} - 1) DIV {max_conns} AS BIGINT)").alias(
            "wave"
        ),
    )
