"""HyperLogLog seen-set cardinality sketch, integer-exact.

cola reports the seen-set size as a driver-side len() over its pickled
bloom shard (SURVEY.md §2 row 23); this repo's exact twin is
`seen_cardinality` (countDistinct — a full shuffle of the key space).
At a 10^10-URL frontier the exact count is the single most expensive
"metric" a scheduler can ask for, and the standard production answer
is HyperLogLog (Flajolet et al. 2007): m registers of max trailing-zero
ranks, giving a ~1.04/√m relative-error estimate from a sketch of a
few hundred BYTES that is
  * one map-side pass + an m-key combinable groupBy (m = 256 here —
    the reduce side is 256 rows regardless of corpus size);
  * MERGEABLE: sketch(A ∪ B) = elementwise max(sketch(A), sketch(B)),
    so per-partition / per-round / per-node sketches combine for free
    (test-pinned) — the property that lets every crawl round carry a
    running frontier-cardinality metric without ever re-scanning.

Everything is on the integer grid so DuckDB replays it bit-for-bit:

  h       = 60-bit md5-family hash of the key     (textdedup family)
  bucket  = h % m
  w       = h div m                                (nonneg, < 2^52)
  rank    = trailing_zeros(w) + 1 = bit_count(w XOR (w-1)), the
            52-zero sentinel 53 when w = 0; capped at RMAX
  register[b] = max rank over keys in bucket b     (0 if empty)

and the estimate avoids floats entirely: with S = Σ_b 2^(RMAX - r_b)
(exact int64: ≤ m·2^RMAX = 2^48), the harmonic mean m²/Σ2^-r equals
m²·2^RMAX/S, so

  est = (718273 · ((m² << RMAX) div S)) div 1000000

with α_256 = 0.7213/(1 + 1.079/256) ≈ 0.718273 as the exact rational
718273/1e6. The first operand is saturated at 1.28e13 (n ≈ 9.2e12)
before the multiply so ANSI engines never overflow; the small-range
linear-counting correction (n < 2.5m = 640) is omitted — that regime
is below any frontier this sketch would be deployed on (documented,
and the n_empty column makes the regime auditable from the output).

Spark-div vs DuckDB-// note: every division here has a nonnegative
numerator, so truncation ≡ floor and the engines agree (the
embedding_pca1 lesson, applied by construction).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import hash_family

M_DEFAULT = 256
RMAX = 40
_ALPHA_NUM, _ALPHA_DEN = 718273, 1000000
_E1_SAT = 12_800_000_000_000  # keeps ALPHA_NUM * e1 inside int64


def hll_registers(
    df: DataFrame,
    key_col: str = "url",
    m: int = M_DEFAULT,
    hash_kind: str = "md5",
    max_rank: int = RMAX,
) -> DataFrame:
    """The m-row register table (bucket, register), empty buckets
    included at register 0 — the sketch state, elementwise-max
    mergeable. One map-side pass + an m-key groupBy."""
    h = hash_family(hash_kind)(F.col(key_col).cast("string"), "hll")
    occupied = (
        df.select(h.alias("h"))
        .select(
            F.pmod("h", F.lit(m)).cast("long").alias("bucket"),
            F.expr(f"h div {m}").alias("w"),
        )
        .select(
            "bucket",
            F.least(
                F.when(F.col("w") == 0, F.lit(53).cast("long")).otherwise(
                    F.bit_count(
                        F.expr("w ^ (w - CAST(1 AS BIGINT))")
                    ).cast("long")
                ),
                F.lit(max_rank).cast("long"),
            ).alias("rank"),
        )
        .groupBy("bucket")
        .agg(F.max("rank").alias("register"))
    )
    spine = df.sparkSession.range(m).select(F.col("id").alias("bucket"))
    # spine is m rows (config-scale): broadcast IS the rule here
    return (
        F.broadcast(spine)
        .join(occupied, "bucket", "left")
        .select(
            "bucket",
            F.coalesce("register", F.lit(0)).cast("long").alias("register"),
        )
    )


def hll_estimate(
    registers: DataFrame,
    m: int = M_DEFAULT,
    max_rank: int = RMAX,
) -> DataFrame:
    """One-row integer HLL estimate from a register table:
    (m, n_empty, s_scaled, est)."""
    return registers.agg(
        F.lit(m).cast("long").alias("m"),
        F.sum(F.when(F.col("register") == 0, 1).otherwise(0))
        .cast("long")
        .alias("n_empty"),
        F.sum(
            F.expr(
                f"shiftleft(CAST(1 AS BIGINT),"
                f" CAST({max_rank} - register AS INT))"
            )
        )
        .cast("long")
        .alias("s_scaled"),
    ).select(
        "m",
        "n_empty",
        "s_scaled",
        F.expr(
            f"CAST({_ALPHA_NUM} AS BIGINT)"
            f" * least(CAST({m * m} AS BIGINT)"
            f"         * shiftleft(CAST(1 AS BIGINT), {max_rank})"
            f"         div s_scaled,"
            f"         CAST({_E1_SAT} AS BIGINT))"
            f" div {_ALPHA_DEN}"
        )
        .cast("long")
        .alias("est"),
    )


def hll_merge(*register_frames: DataFrame) -> DataFrame:
    """Union of sketches: elementwise max register per bucket."""
    it = iter(register_frames)
    u = next(it)
    for f in it:
        u = u.unionByName(f)
    return u.groupBy("bucket").agg(
        F.max("register").cast("long").alias("register")
    )


# ---------------------------------------------------------------- Count-Min


def cms_cells(
    df: DataFrame,
    key_col: str = "host",
    depth: int = 3,
    width: int = 64,
    hash_kind: str = "md5",
) -> DataFrame:
    """Count-Min sketch state (Cormode & Muthukrishnan 2005): the
    depth x width counter grid as (r, p, cnt) rows, empty cells
    included at 0 — the third sketch family beside the HLL registers
    (distinct counts) and the log2 latency histogram (quantiles),
    covering FREQUENCY: "which hosts dominate the frontier" without
    ever shuffling the corpus by host.

    Each event maps to one cell per hash row (pos_r = h_r(key) % width,
    seeded family "cms{r}"); a cell counts every event hashed into it.
    The whole pass is map-side: the explode emits depth rows per event
    and the groupBy reduces to depth*width keys (192 here) with
    map-side partial aggregation — at a 10^10-event frontier the
    reduce side is still 192 rows. Cell-wise ADD mergeable (test-
    pinned: sketch(A) + sketch(B) = sketch(A ∪ B)), so per-round /
    per-partition sketches fold into a running one for free.

    Integer-exact end to end (counts and md5-family positions), so a
    SQL oracle replays every cell bit-for-bit.
    """
    h = hash_family(hash_kind)
    poss = F.array(
        *[
            F.pmod(h(F.col(key_col).cast("string"), f"cms{r}"), F.lit(width))
            .cast("long")
            for r in range(depth)
        ]
    )
    occ = (
        df.select(F.posexplode(poss).alias("r", "p"))
        .groupBy("r", "p")
        .agg(F.count("*").cast("long").alias("cnt"))
    )
    spine = df.sparkSession.range(depth * width).select(
        F.expr(f"id div {width}").cast("long").alias("r"),
        F.pmod("id", F.lit(width)).cast("long").alias("p"),
    )
    # spine is depth*width rows (config-scale): broadcast IS the rule
    return (
        F.broadcast(spine)
        .join(occ, ["r", "p"], "left")
        .select("r", "p", F.coalesce("cnt", F.lit(0)).cast("long").alias("cnt"))
    )


def cms_estimate(
    cells: DataFrame,
    keys: DataFrame,
    key_col: str = "host",
    depth: int = 3,
    width: int = 64,
    hash_kind: str = "md5",
) -> DataFrame:
    """(key, est): point-query the sketch for each candidate key —
    est = min over the depth rows of the key's cell counters. The
    classic one-sided guarantee holds by construction (every cell the
    key hashes into counted ALL of its occurrences plus any colliding
    mass): est >= true count, over-estimating by at most the colliding
    mass of the lightest row (test-pinned >=; expected overshoot
    ~ N/width per row before the min).

    The candidate side is key-scale (e.g. the distinct hosts a
    frontier round already maintains); the sketch side is depth*width
    rows and broadcasts. No corpus-scale work happens here at all —
    the corpus was spent once in cms_cells' map-side pass.
    """
    h = hash_family(hash_kind)
    poss = F.array(
        *[
            F.pmod(h(F.col(key_col).cast("string"), f"cms{r}"), F.lit(width))
            .cast("long")
            for r in range(depth)
        ]
    )
    probe = keys.select(key_col, F.posexplode(poss).alias("r", "p"))
    return (
        probe.join(F.broadcast(cells), ["r", "p"])
        .groupBy(key_col)
        .agg(F.min("cnt").cast("long").alias("est"))
    )


def cms_merge(*cell_frames: DataFrame) -> DataFrame:
    """Union of sketches: cell-wise SUM per (r, p) — counts add."""
    it = iter(cell_frames)
    u = next(it)
    for f in it:
        u = u.unionByName(f)
    return u.groupBy("r", "p").agg(F.sum("cnt").cast("long").alias("cnt"))
