"""Budget/speed accounting as a ledger table.

Reference semantics (cola/functions/budget.py BudgetApplyServer
~L20-110): ``apply(k) -> granted = min(k, budgets - applied)``,
``finish(n)`` accumulates toward ALLFINISHED (finished >= budgets),
``error(n)`` returns budget (applied -= n). cola's SpeedControlServer
(cola/functions/speed.py ~L20-220) bounds pages/minute; our analogue is
the per-round token refill ``rate_per_round``.

Ledger columns: host, budget, rate_per_round, applied, finished,
errored. All transitions are joins + column arithmetic — a broadcast-
size table (one row per host config, not per URL).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def init_budget_state(budgets: DataFrame) -> DataFrame:
    return budgets.select(
        "host", "budget", "rate_per_round",
        F.lit(0).cast("long").alias("applied"),
        F.lit(0).cast("long").alias("finished"),
        F.lit(0).cast("long").alias("errored"),
        F.lit(0).cast("long").alias("last_errored"),
    )


def budget_caps(state: DataFrame, adaptive: bool = False) -> DataFrame:
    """Per-host grant cap for this round: min(remaining budget, rate).

    adaptive=True mirrors cola's adaptive speed mode
    (cola/functions/speed.py ~L150-220: rate drops as "banned"/error
    counts rise): the effective rate backs off by last round's error
    count for that host, floored at 1 page/round so recovery is
    possible. Deterministic — derived only from ledger columns.
    """
    rate = F.col("rate_per_round")
    if adaptive:
        rate = F.greatest(rate - F.col("last_errored"), F.lit(1))
    return state.select(
        "host",
        F.least(F.col("budget") - F.col("applied"), rate).alias("cap"),
    ).filter(F.col("cap") > 0)


def round_outcomes(log: DataFrame) -> DataFrame:
    """(host, n_granted, n_finished, n_errored) from one round's crawl
    log in a SINGLE scan/aggregation — three separate groupBys would
    read the log three times per round."""
    return log.groupBy("host").agg(
        F.count("*").alias("n_granted"),
        F.sum(F.col("fetch_ok").cast("long")).alias("n_finished"),
        F.sum((~F.col("fetch_ok")).cast("long")).alias("n_errored"),
    )


def update_budget_state_outcomes(state: DataFrame, outcomes: DataFrame) -> DataFrame:
    """Apply one round's outcomes. Errors return budget (cola error()):
    applied counts only grants that weren't errored back."""
    df = state.join(F.broadcast(outcomes), "host", "left").na.fill(
        {"n_granted": 0, "n_finished": 0, "n_errored": 0}
    )
    return df.select(
        "host", "budget", "rate_per_round",
        (F.col("applied") + F.col("n_granted") - F.col("n_errored")).alias("applied"),
        (F.col("finished") + F.col("n_finished")).alias("finished"),
        (F.col("errored") + F.col("n_errored")).alias("errored"),
        F.col("n_errored").cast("long").alias("last_errored"),
    )


def update_budget_state(
    state: DataFrame,
    granted: DataFrame,   # (host, n_granted)
    finished: DataFrame,  # (host, n_finished)
    errored: DataFrame,   # (host, n_errored)
) -> DataFrame:
    """Three-table variant (kept for callers that already hold separate
    counts); delegates to the single-outcomes join."""
    outcomes = (
        granted.join(finished, "host", "full").join(errored, "host", "full")
        .na.fill({"n_granted": 0, "n_finished": 0, "n_errored": 0})
    )
    return update_budget_state_outcomes(state, outcomes)


def all_finished(state: DataFrame) -> bool:
    """cola's ALLFINISHED: every host's finished >= budget."""
    row = state.agg(
        F.min(F.col("finished") >= F.col("budget")).alias("done")
    ).first()
    return bool(row.done)
