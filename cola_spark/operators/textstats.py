"""Corpus-statistics quality scoring: unigram log-frequency score.

The static heuristics in queries.q_docs_quality (length / punctuation /
stopword ratios) need no corpus pass; the standard next step in a
training-data pipeline is a LEARNED score — how typical a document's
vocabulary is under the corpus's own unigram distribution (the
poor-man's KenLM: mean log p(w) up to the corpus-size constant).
Gibberish, boilerplate codes and OCR noise score low; fluent text
scores high.

No reference analogue — cola (SURVEY.md §2) has no content scoring.

Integer-exact by construction so the whole two-pass pipeline is
DuckDB-oracle-able: the per-word statistic is floor(log2(corpus
count)) computed as length(bin(cnt)) - 1 — bin() renders identical
strings in Spark and DuckDB, so no float log ever enters the compared
columns.

Scale design:
  * pass 1 (vocab counts) is wordcount: map-side partial agg, shuffle
    by token. Pre-aggregating (doc_id, tok) counts first bounds any
    single doc's contribution to a token key at one row.
  * pass 2 joins corpus tokens back to vocab buckets. The vocab is
    Zipf-skewed — "the" alone can be ~5% of a shuffle — so the join is
    SPLIT: the head_k most frequent words (covering most of the mass)
    are broadcast and joined map-side; only the long flat tail takes
    the shuffle join, whose keys are near-uniform by construction.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import spread_small_scan


def unigram_quality(
    docs: DataFrame,
    head_k: int = 4096,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_tokens, sum_log2f, mean_millilog): per-doc sum and
    scaled mean of floor(log2(corpus frequency)) over token
    occurrences. mean_millilog = (1000 * sum_log2f) DIV n_tokens —
    integer division, engine-exact."""
    toks = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    dt = toks.groupBy("doc_id", "tok").agg(F.count("*").alias("c"))
    vocab = (
        dt.groupBy("tok")
        .agg(F.sum("c").alias("cnt"))
        .select(
            "tok", (F.length(F.bin(F.col("cnt"))) - 1).cast("long").alias("bucket")
        )
    )
    head = vocab.orderBy(F.desc("bucket"), "tok").limit(head_k)
    scored_head = dt.join(F.broadcast(head), "tok")
    tail_dt = dt.join(F.broadcast(head.select("tok")), "tok", "left_anti")
    scored_tail = tail_dt.join(vocab, "tok")
    scored = scored_head.unionByName(scored_tail)
    return (
        scored.groupBy("doc_id")
        .agg(
            F.sum("c").cast("long").alias("n_tokens"),
            F.sum(F.col("c") * F.col("bucket")).cast("long").alias("sum_log2f"),
        )
        .withColumn(
            "mean_millilog",
            F.expr("1000 * sum_log2f DIV n_tokens").cast("long"),
        )
    )
