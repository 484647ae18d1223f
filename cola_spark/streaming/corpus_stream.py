"""Streaming corpus hygiene — the training-data gates in incremental
(Structured Streaming) form, for a corpus that arrives continuously
(the crawl's own output being the canonical producer).

Batch mode (queries.q_corpus_mix_clean) is the primary, fully-oracled
path; this is its micro-batch twin for continuous ingestion:

  * unbounded source      → file stream of document parquet drops
  * exact content dedup   → dropDuplicates(fingerprint) — keyed state
                            store; the seen set never expires, exactly
                            like the URL-seen stream (a corpus never
                            forgets what it has admitted)
  * decontamination gate  → the benchmark n-gram set is SMALL by
                            construction, so it rides to executors as a
                            broadcast variable consumed by ONE
                            Arrow-vectorized pandas UDF — the
                            streaming-compatible form of the batch
                            broadcast semi-join (a stream-side explode
                            + per-doc agg would need watermarked
                            aggregation for no gain)
  * mixture sampling      → the stateless permille-bucket filter —
                            deterministic per key, hence REPLAY-STABLE:
                            a reprocessed micro-batch makes identical
                            keep decisions, which is the property that
                            matters under at-least-once delivery
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import BooleanType

from cola_spark.operators.sampling import permille_bucket


def streaming_documents(
    spark: SparkSession, doc_dir: str,
    schema: str = "doc_id long, text string, lang string",
) -> DataFrame:
    """readStream over a directory receiving document parquet drops,
    fingerprinted exactly like the batch exact-dedup path."""
    raw = spark.readStream.schema(schema).parquet(doc_dir)
    return raw.withColumn(
        "fingerprint", F.md5(F.col("text").cast("binary"))
    )


def _overlap_udf(spark: SparkSession, bench_grams: frozenset, n: int):
    """Vectorized benchmark-overlap test against a broadcast gram set."""
    bc = spark.sparkContext.broadcast(bench_grams)

    @F.pandas_udf(BooleanType())
    def contaminated(texts: pd.Series) -> pd.Series:
        grams = bc.value
        out = []
        for t in texts:
            ws = (t or "").split()
            out.append(
                any(
                    " ".join(ws[i: i + n]) in grams
                    for i in range(len(ws) - n + 1)
                )
            )
        return pd.Series(out)

    return contaminated


def clean_doc_stream(
    spark: SparkSession,
    docs: DataFrame,
    bench: DataFrame,
    rates_permille: dict[str, int],
    n: int = 8,
    default_permille: int = 0,
) -> DataFrame:
    """The hygiene-gated document stream: exact-dedup across
    micro-batches (state store), decontamination (broadcast bench
    grams), deterministic mixture sample. `bench` is a STATIC frame —
    its distinct n-grams are collected once at plan time (eval sets are
    MB-scale by construction)."""
    from cola_spark.operators.textdedup import shingles

    bench_grams = frozenset(
        r.shingle for r in shingles(bench, n=n).select("shingle").distinct().collect()
    )
    is_contaminated = _overlap_udf(spark, bench_grams, n)
    rate = F.lit(default_permille)
    for k, v in sorted(rates_permille.items()):
        rate = F.when(F.col("lang") == k, F.lit(int(v))).otherwise(rate)
    return (
        docs.dropDuplicates(["fingerprint"])
        .filter(~is_contaminated(F.col("text")))
        .withColumn("bucket", permille_bucket(F.col("doc_id")))
        .filter(F.col("bucket") < rate)
        .select("doc_id", "lang", "fingerprint", "bucket")
    )
