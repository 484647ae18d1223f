"""Crawler-trap detection over URL paths.

A production frontier must drop trap URLs before they are scheduled:
calendar pages, session-id mazes and spider traps generate unbounded
URL spaces under a handful of hosts (cola's only defenses — SURVEY.md
§2 rows 10/21 — are the seen-set and the per-host budget, which bound
the damage but still spend the budget ON the trap). The standard
pre-fetch signals are structural and need no fetch at all:

  * depth — number of path segments; real content rarely nests >8;
  * segment repetition — the signature of a cycle trap
    (/a/b/a/b/a/b/...): the same segment appearing k times means the
    crawler is walking a loop in the site graph.

Scale design: both signals are PER-URL LOCAL. The explode fans each
URL into its O(depth) segments and the two aggregations are keyed by
the URL key — no corpus-wide shuffle key exists, no skew is possible
beyond one URL's own depth (bounded by max_url_len upstream), and the
whole thing pipelines map-side up to one url-keyed exchange. At 10^10
frontier rows this is the same shuffle shape as canonicalization.

Integer/boolean outputs only — fully DuckDB-oracle-able.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def trap_signals(
    df: DataFrame,
    url_col: str = "url",
    key_col: str = "url_key",
    max_depth: int = 8,
    min_repeat: int = 4,
) -> DataFrame:
    """(key, url, depth, max_repeat, is_trap) per input row.

    `depth` counts path segments of a root-relative path ("/a/b" → 2);
    `max_repeat` is the highest occurrence count of any single segment
    within the path; `is_trap` = depth > max_depth OR max_repeat >=
    min_repeat. One url-keyed exchange total (explode → count →
    max share the key).
    """
    segs = F.split(F.col(url_col).substr(F.lit(2), F.length(url_col)), "/")
    base = df.select(
        F.col(key_col).alias("url_key"),
        F.col(url_col).alias("url"),
        F.size(segs).cast("long").alias("depth"),
        segs.alias("_segs"),
    )
    rep = (
        base.select("url_key", F.explode("_segs").alias("seg"))
        .groupBy("url_key", "seg")
        .agg(F.count("*").alias("c"))
        .groupBy("url_key")
        .agg(F.max("c").cast("long").alias("max_repeat"))
    )
    # both join sides are frontier-scale (one row per URL) — pin
    # shuffle_hash so Catalyst's local size estimate never broadcasts
    # the agg side (the bloom-gate rule: fine at sf0.01, OOM at 10^10)
    return (
        base.drop("_segs")
        .join(rep.hint("shuffle_hash"), "url_key")
        .select(
            "url_key",
            "url",
            "depth",
            "max_repeat",
            (
                (F.col("depth") > max_depth)
                | (F.col("max_repeat") >= min_repeat)
            ).alias("is_trap"),
        )
    )
