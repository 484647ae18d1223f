"""Learned document-quality classifier: hashed-n-gram logistic
regression TRAINED as DataFrame ops, scored map-side.

The heuristic quality scores (docs_quality, docs_unigram_quality) rank
documents by surface statistics; the standard pipeline op is a trained
classifier (CCNet/GPT-3-style: hashed token features, linear model,
"does this look like the reference corpus?"). The missing distributed
operator is the TRAINING step — this module implements full-batch
gradient descent where every epoch is one broadcast join + two
key-partitioned aggregations, no driver-side math beyond one scalar
count.

Engine-stability (the same discipline as the trained PQ/IVF
quantizers, so the whole train+score pipeline is DuckDB-oracle-able):

  - features are BINARY hashed unigrams: bucket = md5int("q:"||token)
    mod n_buckets, DISTINCT per doc — integer set membership, no tf
    floats.
  - weights live on an integer grid (w_int, scale WS=2^16). A doc's
    logit z = Σ w_int[bucket] is an EXACT BIGINT sum — associative,
    immune to partial-aggregation order.
  - the sigmoid is the HARD sigmoid σ̂(z) = clamp(1/2 + z/(4·WS), 0, 1)
    — rational arithmetic only (libm exp() is NOT bit-stable across
    engines; +,*,/ and clamp are IEEE-identical everywhere).
  - the per-doc residual (y − σ̂) is quantized to the integer grid
    (floor(r·RS), RS=2^16) BEFORE the gradient sum, so the gradient
    per bucket is again an exact BIGINT sum (gradient quantization —
    the standard trick in distributed SGD, here doing double duty as
    the cross-engine determinism guarantee).
  - the update Δw_int = floor((g·lr)/n) is floor-of-double-division of
    exact integers — identical both engines.

Scoring is one broadcast join (n_buckets·8 bytes of weights) plus a
per-doc BIGINT sum; the emitted logit is an integer, so it hashes
exactly in the driver's value comparison.

At corpus scale the training set is a bounded SAMPLE (CCNet trains on
a few hundred MB, not the corpus) — pass the sampled frame to
train_logreg_quality and only score_logreg_quality touches the full
corpus, map-side.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

WS = 1 << 16  # weight scale: w_float = w_int / WS
RS = 1 << 16  # residual scale: r_int = floor((y - sigma) * RS)


def _bucket_expr(tok_col, n_buckets: int):
    """md5-derived feature bucket — replayable in DuckDB as
    CAST(('0x'||substr(md5('q:'||tok),1,15)) AS BIGINT) % n."""
    return (
        F.conv(F.substring(F.md5(F.concat(F.lit("q:"), tok_col)), 1, 15), 16, 10)
        .cast("long") % n_buckets
    ).cast("int")


def hashed_features(
    docs: DataFrame, n_buckets: int = 256,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, bucket): distinct hashed-unigram presence features."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    return toks.select(
        "doc_id", _bucket_expr(F.col("tok"), n_buckets).alias("bucket")
    ).distinct()


def _hard_sigmoid(z_col):
    return F.least(
        F.greatest(
            F.lit(0.5) + z_col.cast("double") / F.lit(float(4 * WS)), F.lit(0.0)
        ),
        F.lit(1.0),
    )


def train_logreg_quality(
    labeled: DataFrame, epochs: int = 3, n_buckets: int = 256, lr: float = 4.0,
    id_col: str = "doc_id", text_col: str = "text", label_col: str = "y",
) -> DataFrame:
    """(bucket, w): integer-grid weights after `epochs` full-batch GD
    epochs over `labeled` (label_col ∈ {0.0, 1.0}). The bucket universe
    is the observed feature buckets (unobserved buckets are implicitly
    0 and never scored differently). One scalar count() action fixes n
    for the update denominator; everything else is joins/aggregations.
    """
    feats = hashed_features(labeled, n_buckets, id_col, text_col).localCheckpoint()
    # (doc_id, y) is doc-count-sized but carries the FULL lineage of
    # `labeled` (in corpus_mix_clean_lr that is the composed pipeline);
    # without a cut every epoch's residual join re-runs it
    ys = labeled.select(
        F.col(id_col).alias("doc_id"), F.col(label_col).cast("double").alias("y")
    ).localCheckpoint()
    n = float(ys.count())
    w = feats.select("bucket").distinct().select(
        "bucket", F.lit(0).cast("long").alias("w")
    ).localCheckpoint()
    for _ in range(int(epochs)):
        z = (
            feats.join(F.broadcast(w), "bucket")
            .groupBy("doc_id")
            .agg(F.sum("w").alias("z"))
        )
        resid = (
            ys.join(z, "doc_id", "left")
            .select(
                "doc_id",
                F.floor(
                    (F.col("y") - _hard_sigmoid(F.coalesce(F.col("z"), F.lit(0))))
                    * F.lit(float(RS))
                ).alias("r"),
            )
        )
        grad = (
            feats.join(resid, "doc_id")
            .groupBy("bucket")
            .agg(F.sum("r").alias("g"))
        )
        w = (
            w.join(grad, "bucket", "left")
            .select(
                "bucket",
                (
                    F.col("w")
                    + F.floor(
                        (F.coalesce(F.col("g"), F.lit(0)).cast("double") * F.lit(float(lr)))
                        / F.lit(n)
                    )
                ).cast("long").alias("w"),
            )
            .localCheckpoint()
        )
    return w


def score_logreg_quality(
    docs: DataFrame, weights: DataFrame, n_buckets: int = 256,
    id_col: str = "doc_id", text_col: str = "text",
) -> DataFrame:
    """(doc_id, logit, keep): integer logit = Σ w[bucket] over the
    doc's hashed features (docs with no scored features get 0), keep =
    logit > 0. Broadcast weights; one doc-keyed aggregation."""
    feats = hashed_features(docs, n_buckets, id_col, text_col)
    z = (
        feats.join(F.broadcast(weights), "bucket")
        .groupBy("doc_id")
        .agg(F.sum("w").alias("_z"))
    )
    return (
        docs.select(F.col(id_col).alias("doc_id"))
        .join(z, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("_z"), F.lit(0)).cast("long").alias("logit"),
            (F.coalesce(F.col("_z"), F.lit(0)) > 0).alias("keep"),
        )
    )
