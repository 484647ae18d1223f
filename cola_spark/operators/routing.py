"""Rendezvous (highest-random-weight) frontier routing.

cola routes every frontier message to a fixed worker by hashing the
URL over the node list (SURVEY.md §2 row 4, mq/node routing; the salted
hash partitioner in operators/priority.py is this repo's steady-state
twin). Plain `hash(url) % W` has a production flaw the reference never
had to face at its scale: when the worker set changes (a node joins or
dies mid-crawl), (W-1)/W of all keys change owner, so nearly every
per-host politeness queue, budget counter and in-flight dedup shard
migrates at once. Rendezvous hashing (Thaler & Ravishankar 1998, the
scheme behind consistent routing in most modern frontiers) fixes that:

    owner(url) = argmax over workers w of hash(url, w)

Adding a worker moves exactly the keys whose new-worker score wins —
an expected 1/(W+1) of the frontier — and every moved key moves TO the
new worker; removing one moves only its own keys. Both properties are
pinned in tests and in the driver oracle (the `moved → new owner`
implication is part of the output relation).

Scale design: routing is PURE MAP-SIDE — per row, W integer hashes and
an expanded argmax CASE chain (scalar codegen, no per-row array sort,
no HOF, no shuffle). The worker list is config-scale. At a 10^10-URL
frontier this pipelines inside the canonicalize stage; the only
exchange it ever implies is the one the router exists to produce (the
partition-by-owner write), which the scheduler already pays.

Hash family: "md5" (cross-engine, DuckDB-oracle-able) or "xxhash64"
(JVM intrinsic, the scale default) — textdedup.hash_family.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family


def rendezvous_score(url_col: Column, worker: int, hash_kind: str = "md5") -> Column:
    """The (url, worker) rendezvous score: hash of "url|worker"."""
    h = hash_family(hash_kind)
    return h(F.concat(url_col, F.lit(f"|{worker}")), "hrw")


def rendezvous_owner(
    url_col: Column, n_workers: int, hash_kind: str = "md5"
) -> Column:
    """argmax_w score(url, w) — ties resolve to the SMALLEST worker id
    (array_position returns the FIRST occurrence of the max;
    deterministic, though with 60-bit hashes a tie is ~2^-60).

    Implementation note (round-5 bench lesson): the obvious chained
    `when(s > best, ...)` fold embeds the running best TWICE per step,
    so the expression tree — and the per-row md5 evaluations — grow
    2^W-fold after projection collapse (136 s for 600k rows at W=8+9).
    Building the score ARRAY evaluates each hash exactly once;
    array_max + array_position are single-pass scalar expressions
    (0.9 s for the same input, 150×)."""
    if n_workers < 1:
        raise ValueError("n_workers must be >= 1")
    arr = F.array(
        *[rendezvous_score(url_col, w, hash_kind) for w in range(n_workers)]
    )
    return (F.array_position(arr, F.array_max(arr)) - 1).cast("long")


def rendezvous_route(
    df: DataFrame,
    url_col: str = "url",
    n_before: int = 8,
    n_after: int = 9,
    hash_kind: str = "md5",
) -> DataFrame:
    """Per-URL owner under two worker-set sizes plus the movement
    decision table: (url, owner_before, owner_after, moved).

    The minimal-disruption contract is auditable from the relation
    itself: when n_after = n_before + 1, every moved=true row has
    owner_after = n_before (all movement flows to the new node) and
    the moved fraction concentrates around 1/n_after."""
    u = F.col(url_col)
    before = rendezvous_owner(u, n_before, hash_kind)
    after = rendezvous_owner(u, n_after, hash_kind)
    return df.select(
        u.alias("url"),
        before.alias("owner_before"),
        after.alias("owner_after"),
        (before != after).alias("moved"),
    )


def route_load_report(
    frontier: DataFrame,
    parts: int = 32,
    salt_buckets: int = 8,
    host_col: str = "host",
    seq_col: str = "seq",
) -> DataFrame:
    """Two-row skew audit of the frontier's partition routing: for the
    NAIVE host-hash route and the SALTED (host, seq%B) route, the
    per-partition load histogram reduced to (strategy, parts_used,
    max_load, total, skew_permille) where skew_permille =
    (1000·max_load·parts) DIV total — 1000 is a perfectly level
    cluster, the Zipf host head shows up as max_load·parts ≫ total.

    This is the measurement twin of the salted repartition in
    operators/priority.py: the report quantifies ON the data how much
    imbalance the salt removes, the evidence a 1000-executor deploy
    wants before picking B. Hash is the md5 60-bit family so the full
    computation is DuckDB-oracled (xxhash64 is the production default;
    same trade as minhash/simhash). One fan-out-free pass: two
    constant-size (≤ parts-row) aggregates, a 2-row union output."""
    h_naive = F.conv(
        F.substring(F.md5(F.concat(F.lit("r:"), F.col(host_col))), 1, 15),
        16, 10,
    ).cast("long")
    h_salt = F.conv(
        F.substring(
            F.md5(
                F.concat(
                    F.lit("r:"), F.col(host_col), F.lit(":"),
                    F.pmod(F.col(seq_col), F.lit(salt_buckets)).cast("string"),
                )
            ),
            1, 15,
        ),
        16, 10,
    ).cast("long")

    def summarize(part_col: Column, name: str) -> DataFrame:
        loads = frontier.select(part_col.alias("_p")).groupBy("_p").agg(
            F.count("*").alias("_load")
        )
        return loads.agg(
            F.lit(name).alias("strategy"),
            F.count("*").cast("long").alias("parts_used"),
            F.max("_load").cast("long").alias("max_load"),
            F.sum("_load").cast("long").alias("total"),
        ).select(
            "*",
            F.expr(f"(1000 * max_load * {parts}) DIV total").alias(
                "skew_permille"
            ),
        )

    return summarize(F.pmod(h_naive, F.lit(parts)), "naive").unionByName(
        summarize(F.pmod(h_salt, F.lit(parts)), "salted")
    )
