"""Benchmark decontamination: flag training documents that overlap an
evaluation/benchmark set by long n-grams.

The standard training-data hygiene step (GPT-3 App. C / PaLM style):
any document sharing at least one >= n-token n-gram with a held-out
benchmark is contaminated and must be dropped (or have the span
scrubbed) before training, otherwise eval numbers are inflated.

No reference analogue — cola (SURVEY.md §2) dedups URL identity only;
this is corpus-content hygiene the training pipeline adds on top.

Scale design (100 TB corpus, ~MB-scale benchmark):
  * the benchmark n-gram set is SMALL by construction (eval suites are
    thousands of documents) — it is built once, made distinct, and
    broadcast; the corpus side then probes it map-side during its own
    n-gram fan-out. No corpus-sized shuffle for the membership test.
  * the only corpus-scale exchange is the per-doc hit count groupBy —
    key = doc_id, perfectly spread.
  * all expressions are whole-stage-codegen column ops (split /
    transform / explode); no Python on the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import shingles


def benchmark_overlap(
    corpus: DataFrame,
    bench: DataFrame,
    n: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Per corpus document: how many distinct n-grams it shares with the
    benchmark set, and the contaminated verdict.

    Returns (doc_id, n_hits BIGINT, contaminated BOOLEAN) — one row per
    corpus doc (n_hits = 0 for clean docs), so the output is a complete
    keep/drop decision table, joinable straight into a cleaning plan.
    """
    bench_grams = (
        shingles(bench, n=n, id_col=id_col, text_col=text_col)
        .select("shingle")
        .distinct()
    )
    corpus_grams = shingles(corpus, n=n, id_col=id_col, text_col=text_col)
    hits = (
        corpus_grams.join(F.broadcast(bench_grams), "shingle")
        .groupBy("doc_id")
        .agg(F.count_distinct("shingle").alias("n_hits"))
    )
    return (
        corpus.select(F.col(id_col).alias("doc_id"))
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            F.coalesce(F.col("n_hits"), F.lit(0)).cast("long").alias("n_hits"),
            (F.coalesce(F.col("n_hits"), F.lit(0)) > 0).alias("contaminated"),
        )
    )
