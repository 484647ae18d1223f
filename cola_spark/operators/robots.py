"""robots.txt gating — a north-rule addition with no reference analogue
(cola's openers fetch unconditionally; there is no robotparser anywhere
in cola/core/opener.py).

A URL is blocked when any robots row for its host has a disallow_prefix
that prefixes the URL path. The robots table is tiny relative to the
frontier → broadcast anti-join, zero shuffle of the big side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def robots_gate(
    frontier: DataFrame, robots: DataFrame, broadcast: bool = True
) -> DataFrame:
    """Drop frontier rows disallowed by robots (supports multiple
    disallow prefixes per host).

    broadcast=True for broadcast-sized host universes (a focused
    crawl). At web-scale host sets (10^5+ rules) the per-round
    broadcast build is serial driver-adjacent work that caps stage
    scaling — pass False for a parallel shuffled anti-join on host
    (same knob rationale as schedule_cut's broadcast_caps)."""
    r = robots.select("host", "disallow_prefix")
    if broadcast:
        r = F.broadcast(r)
    cond = (frontier["host"] == r["host"]) & frontier["path"].startswith(
        r["disallow_prefix"]
    )
    return frontier.join(r, cond, "left_anti")
