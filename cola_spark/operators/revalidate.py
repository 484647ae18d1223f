"""Conditional-GET (ETag / If-Modified-Since) revalidation planning.

The incremental re-crawl pass (inc.py, cola `job.inc: true` — public
cola re-enqueues finished bundles for continuous re-crawling) re-admits
every previously fetched URL; fetching full bodies for unchanged pages
wastes the two resources the politeness budget rations — connection
slots and egress. Every production crawler instead keeps per-URL
validators from the last fetch and issues conditional GETs: a 304 Not
Modified costs headers only. This operator emits that plan:

  * `prior` carries the last crawl's validators per URL:
    (key, etag NULLABLE, content_len). A NULL etag means the origin
    sent no validator — revalidation is impossible and the fetch must
    be full.
  * classification is a URL-keyed LEFT join (the SAME key class the
    dedup seen-gate already shuffles on — no new exchange) plus pure
    column algebra:
      - no prior row          → action 'fetch_full'
      - prior, NULL etag      → action 'fetch_full'
      - prior with validator  → action 'revalidate'
  * the conditional GET's outcome is deterministic here — a seeded
    hash parity stands in for "the page actually changed" (the real
    signal arrives from the fetch stage at the same column seam):
    changed ⇒ 200 (full body follows), unchanged ⇒ 304 and
    bytes_saved = the prior content_len. Summing bytes_saved is the
    fleet's egress-savings telemetry; the 304 rows also skip the
    image decode stage entirely.

Hash families: `xxhash64` is the scale default; `md5` is the
cross-engine form the DuckDB oracle replays (queries.py
`revalidate_plan`).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family

_CHANGE_SEED = 101


def revalidate_plan(
    candidates: DataFrame,
    prior: DataFrame,
    key_col: str = "url_id",
    change_mod: int = 5,
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """Per re-crawl candidate: (key, action, not_modified, bytes_saved).

    `candidates` carries one row per URL to re-crawl; `prior` carries
    (key, etag, content_len) from the previous crawl. A candidate whose
    prior row has a validator issues a conditional GET; it comes back
    304 unless the deterministic change indicator fires (hash parity,
    ~1/change_mod of pages). bytes_saved is the prior body size for
    every 304, zero otherwise.
    """
    h = hash_family(hash_kind)
    j = candidates.select(F.col(key_col).alias("key")).join(
        prior.select(
            F.col(key_col).alias("key"),
            "etag",
            F.col("content_len").cast("long").alias("_len"),
        ),
        "key",
        "left",
    )
    has_validator = F.col("etag").isNotNull()
    changed = (
        F.pmod(h(F.col("key").cast("string"), _CHANGE_SEED), F.lit(change_mod))
        == 0
    )
    not_modified = has_validator & ~changed
    return j.select(
        F.col("key").alias(key_col),
        F.when(has_validator, F.lit("revalidate"))
        .otherwise(F.lit("fetch_full"))
        .alias("action"),
        not_modified.alias("not_modified"),
        F.when(not_modified, F.col("_len"))
        .otherwise(F.lit(0))
        .cast("long")
        .alias("bytes_saved"),
    )


def content_length_audit(
    fetches: DataFrame,
    host_col: str = "host",
    claimed_col: str = "claimed_len",
    body_col: str = "body_len",
) -> DataFrame:
    """Per-host fetch integrity report over one round's fetch results:
    (host, fetches, truncated, overrun, exact, truncated_permille,
    wasted_bytes).

    A body shorter than the Content-Length header is a truncated
    transfer (mid-stream disconnect — the page must be refetched, and
    a host doing it chronically is a health signal for the EWMA
    quarantine, operators/health.py); longer means a lying header
    (common with dynamic pages), which only invalidates size-based
    byte budgeting, not the payload. `wasted_bytes` counts the bytes
    moved for truncated transfers — egress spent with nothing to show,
    the number the bytes-budget planner (budget.bytes_budget_cut)
    should see subtracted from a host's next-round allowance.

    One host-keyed aggregate over the round's fetch log (the exchange
    class the crawl log already pays); NULL claimed_len rows (no
    header) are counted as exact — unverifiable, not evidence of
    damage. Integer permille — engine-exact."""
    truncated = (
        F.col(claimed_col).isNotNull()
        & (F.col(body_col) < F.col(claimed_col))
    ).cast("long")
    overrun = (
        F.col(claimed_col).isNotNull()
        & (F.col(body_col) > F.col(claimed_col))
    ).cast("long")
    return (
        fetches.groupBy(F.col(host_col).alias("host"))
        .agg(
            F.count("*").cast("long").alias("fetches"),
            F.sum(truncated).cast("long").alias("truncated"),
            F.sum(overrun).cast("long").alias("overrun"),
            F.sum(
                truncated * F.col(body_col).cast("long")
            ).cast("long").alias("wasted_bytes"),
        )
        .select(
            "host",
            "fetches",
            "truncated",
            "overrun",
            (F.col("fetches") - F.col("truncated") - F.col("overrun"))
            .cast("long")
            .alias("exact"),
            F.expr("(1000 * truncated) div fetches")
            .cast("long")
            .alias("truncated_permille"),
            "wasted_bytes",
        )
    )
