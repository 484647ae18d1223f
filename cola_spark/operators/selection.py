"""Training-data SELECTION operators: DSIR-style hashed-n-gram
importance resampling, CCNet-style quality trichotomy, and a
Gini–Simpson unigram-concentration signal.

These are the data-selection counterparts of the cleaning operators in
textdedup/textstats: instead of dropping bad documents, they RANK the
corpus against a target distribution (DSIR — Xie et al., "Data
Selection for Language Models via Importance Resampling", NeurIPS
2023) or split it into quality tiers (CCNet — Wenzek et al., LREC
2020, the head/middle/tail perplexity trichotomy).

Spark-first shapes, integer-exact arithmetic so every pipeline is
DuckDB-oracled end-to-end (the repo's dtype-strict gate):

- DSIR's per-feature log(p_target/p_raw) is replaced by the scaled
  integer ratio (SCALE*(tgt+1)) DIV (raw+1) — add-one smoothed, summed
  per document with multiplicity and normalized by the gram count.
  Monotone in the ratio per bucket, so the induced ranking is a
  faithful integer-exact stand-in for the published estimator at the
  resolution the tests pin.
- The bucket-score table is tiny (``buckets`` rows) and explicitly
  broadcast; the gram fan-out reuses the relational posexplode+lead
  build proven in textdedup.shingles (VERDICT r4 #5), WITHOUT the
  per-doc distinct — DSIR counts feature occurrences, not presence.
- The selection cut is a two-phase global rank (operators/ranking.py)
  — no single-partition window anywhere, so the plan survives a
  10^10-row frontier corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cola_spark.operators.ranking import global_rank
from cola_spark.operators.textdedup import spread_small_scan

__all__ = [
    "raw_grams",
    "dsir_weights",
    "dsir_select",
    "quality_tiers",
    "unigram_concentration",
]


def _h60(col: Column) -> Column:
    """60-bit md5 hash (the oracle-portable family: identical in DuckDB
    as ('0x' || substr(md5(x), 1, 15))::BIGINT). xxhash64 is the
    production default elsewhere; md5 keeps this pipeline end-to-end
    SQL-oracled, same trade the minhash/simhash queries make."""
    return F.conv(F.substring(F.md5(col), 1, 15), 16, 10).cast("long")


def raw_grams(
    docs: DataFrame,
    n: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    carry: list[str] | None = None,
) -> DataFrame:
    """(doc_id, gram, *carry): word n-grams WITH multiplicity (no
    per-doc distinct — the counting twin of textdedup.shingles, same
    relational posexplode+lead build so the per-token stage stays
    inside whole-stage codegen). ``carry`` columns ride the fan-out so
    callers never need a grams⋈docs join to recover doc attributes."""
    carry = carry or []
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    base = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"), words.alias("ws"), *carry
    )
    toks = base.filter(F.size("ws") >= n).select(
        "doc_id", F.size("ws").alias("_n"),
        F.posexplode("ws").alias("pos0", "tok"), *carry,
    )
    wd = Window.partitionBy("doc_id").orderBy("pos0")
    gram_cols = [F.col("tok")] + [F.lead("tok", k).over(wd) for k in range(1, n)]
    return (
        toks.select(
            "doc_id", "_n", "pos0",
            F.concat_ws(" ", *gram_cols).alias("gram"), *carry,
        )
        .filter(F.col("pos0") <= F.col("_n") - n)
        .select("doc_id", "gram", *carry)
    )


def dsir_weights(
    docs: DataFrame,
    target: Column,
    *,
    n: int = 2,
    buckets: int = 64,
    scale: int = 1_000_000,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Hashed-n-gram importance weights against a target predicate.

    ``target`` is a boolean Column over ``docs`` marking the target
    domain (the "Wikipedia" of DSIR); the raw distribution is the whole
    corpus. Returns (doc_id, n_grams, dsir_weight) where dsir_weight =
    (Σ_grams bucket_score) DIV n_grams and bucket_score[b] =
    (scale*(tgt_cnt[b]+1)) DIV (raw_cnt[b]+1).

    Scale shape: ONE gram fan-out feeds both the bucket histogram
    (``buckets``-row aggregate — a map-side-combined groupBy whose
    output is constant-size regardless of corpus size) and the per-doc
    re-score, which joins the broadcast score table and aggregates by
    doc. Two shuffles total (bucket agg, doc agg), both on keys with
    bounded skew (hash buckets are uniform by construction; doc_id is
    the natural partition key)."""
    g = raw_grams(
        docs.withColumn("_is_tgt", target),
        n=n, id_col=id_col, text_col=text_col, carry=["_is_tgt"],
    )
    b = g.select(
        "doc_id", "_is_tgt", F.pmod(_h60(F.col("gram")), F.lit(buckets)).alias("bucket")
    )
    hist = b.groupBy("bucket").agg(
        F.count("*").alias("raw_cnt"),
        F.sum(F.col("_is_tgt").cast("long")).alias("tgt_cnt"),
    )
    scores = hist.select(
        "bucket",
        F.expr(f"{scale} * (tgt_cnt + 1) DIV (raw_cnt + 1)").alias("score"),
    )
    perdoc = (
        b.join(F.broadcast(scores), "bucket")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_grams"), F.sum("score").alias("_s"))
    )
    return perdoc.select(
        "doc_id",
        "n_grams",
        F.expr("_s DIV n_grams").alias("dsir_weight"),
    )


def dsir_select(
    docs: DataFrame,
    target: Column,
    *,
    keep_num: int = 1,
    keep_den: int = 4,
    **kw,
) -> DataFrame:
    """Rank by dsir_weight and mark the kept top keep_num/keep_den
    fraction (rounded up). The rank is the two-phase exact global rank
    — (dsir_weight DESC, doc_id ASC) is a total order, so the cut is
    deterministic and engine-stable. The corpus size reaches the
    predicate via a broadcast 1-row aggregate, not a driver action."""
    w = dsir_weights(docs, target, **kw)
    ranked = global_rank(
        w.withColumn("_negw", -F.col("dsir_weight")),
        ["_negw", "doc_id"],
        out_col="sel_rank",
        eager_release=True,
    )
    # ranked is already materialized (eager global_rank) — count IT,
    # not w, so the gram pipeline runs exactly once.
    tot = ranked.agg(F.count("*").alias("_tot"))
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            "doc_id",
            "n_grams",
            "dsir_weight",
            F.col("sel_rank").cast("long").alias("sel_rank"),
            (
                F.col("sel_rank")
                <= F.expr(f"(_tot * {keep_num} + {keep_den} - 1) DIV {keep_den}")
            ).alias("selected"),
        )
    )


def quality_tiers(
    scored: DataFrame,
    order_col: str = "mean_millilog",
    id_col: str = "doc_id",
    tiers: int = 3,
) -> DataFrame:
    """CCNet-style quality trichotomy: rank documents by a quality
    score (descending — best first, CCNet's ascending-perplexity) and
    assign tier i = ((rank-1)*tiers) DIV total + 1, labelled
    head/middle/tail for tiers=3. The even-division formula is used in
    place of NTILE so the bucket boundary is a closed-form function of
    (rank, total) — identical arithmetic on both engines, no window
    semantics to match. Two-phase global rank: no single-partition
    window."""
    ranked = global_rank(
        scored.withColumn("_nego", -F.col(order_col)),
        ["_nego", id_col],
        out_col="q_rank",
        eager_release=True,
    )
    tot = ranked.agg(F.count("*").alias("_tot"))
    tier = F.expr(f"((q_rank - 1) * {tiers}) DIV _tot + 1")
    label = (
        F.when(tier == 1, F.lit("head"))
        .when(tier == tiers, F.lit("tail"))
        .otherwise(F.lit("middle"))
    )
    return (
        ranked.crossJoin(F.broadcast(tot))
        .select(
            id_col,
            order_col,
            F.col("q_rank").cast("long").alias("q_rank"),
            tier.cast("long").alias("tier"),
            label.alias("tier_label"),
        )
    )


def unigram_concentration(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """Gini–Simpson unigram concentration per document, ppm-scaled
    integer: simpson_ppm = (1e6 * Σ c_i(c_i-1)) DIV (N(N-1)) — the
    probability two tokens drawn without replacement are equal. High
    values flag keyword-stuffed / looped spam that the distinct-3-gram
    repetition score (docs_repetition) under-weights when the repeated
    unit is a single token. Docs with N < 2 are excluded (the index is
    undefined). One fan-out, two key-local aggregates — the
    (doc, tok) count groups on the same doc-prefixed key the second
    agg reuses, so Catalyst plans one exchange."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    toks = (
        spread_small_scan(docs, id_col)
        .select(F.col(id_col).alias("doc_id"), F.explode(words).alias("tok"))
    )
    cnt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    per = cnt.groupBy("doc_id").agg(
        F.sum("c").alias("n_tokens"),
        F.count("*").alias("n_distinct"),
        F.sum(F.col("c") * (F.col("c") - 1)).alias("_coll"),
    )
    # greatest(...,1) denominator: rows with n_tokens < 2 are filtered
    # out, but ANSI mode turns x DIV 0 into a runtime error and the
    # optimizer may evaluate a collapsed projection before the filter —
    # the guard keeps the expression total without changing any
    # surviving row (n>=2 → n(n-1)>=2).
    return per.filter(F.col("n_tokens") >= 2).select(
        "doc_id",
        "n_tokens",
        "n_distinct",
        F.expr(
            "1000000 * _coll DIV greatest(n_tokens * (n_tokens - 1), 1)"
        ).alias("simpson_ppm"),
    )


def curriculum_plan(
    scored: DataFrame,
    order_col: str = "mean_millilog",
    id_col: str = "doc_id",
    tiers: int = 3,
    hash_kind: str = "xxhash64",
) -> DataFrame:
    """(doc_id, score, tier, tier_label, curriculum_step): quality-
    curriculum ordering of the training corpus — highest-quality tier
    first, but INTERNALLY shuffled.

    Curriculum training feeds clean data early and noisier data late
    (the quality_tiers trichotomy gives the phases), yet within a phase
    the steps must NOT be quality-sorted — a monotone quality gradient
    inside a phase correlates batch statistics with step index, which
    destabilizes training. The step order here is (tier, hash(doc),
    doc): phases are strictly sequential, and inside a phase the hash
    de-correlates step index from every content property while staying
    deterministic (same corpus -> same step table, any engine).

    Scale: one quality_tiers pass (two-phase global rank — no
    single-partition window) + one more global_rank over the
    (tier, hash) order. Both are the exact 1/P-bounded rank machinery;
    nothing corpus-scale lands in one task. md5 family for the DuckDB
    twin (queries.py `curriculum_phase_plan`)."""
    from cola_spark.operators.textdedup import hash_family

    tiered = quality_tiers(
        scored, order_col=order_col, id_col=id_col, tiers=tiers
    )
    mix = hash_family(hash_kind)(F.col(id_col).cast("string"), "cur")
    return global_rank(
        tiered.withColumn("_mix", mix),
        ["tier", "_mix", id_col],
        out_col="curriculum_step",
        eager_release=True,
    ).select(
        id_col, order_col, "q_rank", "tier", "tier_label",
        "curriculum_step",
    )
