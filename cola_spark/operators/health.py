"""Host health scoring: exponentially-weighted error rate + quarantine.

The feedback loop a production scheduler closes and cola approximates
with its per-error retry counter (public cola cola/job/executor.py —
`unit.error_times` is per-URL and forgets across units): a HOST that
keeps erroring (5xx storms, connection resets, DNS flaps) should lose
its fetch budget for a while, and the signal must weight recent rounds
over old ones without storing unbounded history.

Exact integer EWMA, decay 1/2 per round: with per-round error rates
e_t in milli-units (1000 * errs DIV fetches) over rounds t = 0..T,

    ewma_milli = SUM(e_t << t) DIV SUM(1 << t)

— the most recent round carries weight 2^T, twice the round before it;
the oldest round still counts. All arithmetic is 64-bit integer (shift
+ div), so DuckDB replays it bit-exactly (queries.py
`host_health_score` oracles the whole chain). Rounds are bounded by
the retention horizon (a scheduler keeps the last ~10-20 rounds of
per-host stats); the shift is safe for t <= 52 with milli-rates —
`host_health_ewma` asserts the horizon.

Scale: per-host per-round stats are host-scale (10^7-10^8 rows at a
10^10 frontier — the same key class every politeness structure here
already groups by); the EWMA is ONE keyed aggregate over them, and the
quarantine flag is a projection. No window, no corpus-scale state.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_MAX_HORIZON = 52  # (1000 << 52) is still comfortably inside int64


def host_health_ewma(
    roundstats: DataFrame,
    quarantine_milli: int = 300,
    host_col: str = "host",
    round_col: str = "round",
    errs_col: str = "errs",
    fetches_col: str = "fetches",
) -> DataFrame:
    """(host, rounds_seen, last_round, ewma_milli, quarantined) from a
    per-(host, round) stats frame.

    e_t = 1000 * errs DIV fetches (integer milli-rate; fetches >= 1 by
    construction of a stats row). Weight = 1 << round — rounds must be
    the scheduler's bounded retention window (<= _MAX_HORIZON = 52,
    the int64 overflow bound with milli-rates; re-base round ids to
    the window before calling, as a retention-pruned stats table
    naturally does). A host
    is quarantined when its EWMA milli-error-rate reaches
    `quarantine_milli` (default: 30% weighted error rate)."""
    e_milli = F.expr(
        f"(1000 * CAST({errs_col} AS BIGINT)) div CAST({fetches_col} AS BIGINT)"
    )
    # shiftleft as a SQL expr: the Python F.shiftleft helper takes a
    # literal int for numBits; the SQL form accepts a column.
    wgt = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({round_col} AS INT))"
    )
    scored = roundstats.select(
        F.col(host_col).alias("host"),
        F.col(round_col).cast("long").alias("_r"),
        (e_milli * wgt).cast("long").alias("_num"),
        wgt.cast("long").alias("_den"),
    )
    agg = scored.groupBy("host").agg(
        F.count("*").cast("long").alias("rounds_seen"),
        F.max("_r").alias("last_round"),
        F.sum("_num").alias("_n"),
        F.sum("_den").alias("_d"),
    )
    return agg.select(
        "host",
        "rounds_seen",
        "last_round",
        F.expr("_n div _d").cast("long").alias("ewma_milli"),
    ).select(
        "*",
        (F.col("ewma_milli") >= F.lit(quarantine_milli)).alias(
            "quarantined"
        ),
    )


def retry_backoff_plan(
    failed: DataFrame,
    now_s: int,
    base_s: int = 4,
    attempt_cap: int = 6,
    jitter_s: int = 16,
    key_col: str = "url_id",
    attempt_col: str = "attempt",
    hash_kind: str = "md5",
) -> DataFrame:
    """(url_id, attempt, delay_s, next_due_s): exponential backoff with
    deterministic per-URL jitter for requeued fetch failures.

    delay = base * 2^min(attempt, cap) + (hash(url) mod jitter) — the
    classic truncated-exponential-with-jitter schedule: doubling spaces
    retries out (a struggling host is not hammered on a fixed beat),
    the cap bounds the wait, and the jitter de-synchronizes the retry
    herd WITHOUT randomness: it is a hash of the URL, so the schedule
    is rerun-stable and engine-replayable (md5 family for the DuckDB
    oracle; xxhash64 at scale). Pure projection over the retry split's
    output (retry.split_retry) — zero exchanges."""
    from cola_spark.operators.textdedup import hash_family

    delay = (
        F.expr(
            f"shiftleft(CAST({base_s} AS BIGINT), "
            f"CAST(LEAST(CAST({attempt_col} AS BIGINT), "
            f"CAST({attempt_cap} AS BIGINT)) AS INT))"
        )
        + F.pmod(
            hash_family(hash_kind)(F.col(key_col).cast("string"), "boff"),
            F.lit(jitter_s),
        )
    ).cast("long")
    return failed.select(
        F.col(key_col),
        F.col(attempt_col).cast("long").alias("attempt"),
        delay.alias("delay_s"),
        (F.lit(now_s).cast("long") + delay).alias("next_due_s"),
    )
