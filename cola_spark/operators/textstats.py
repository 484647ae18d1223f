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


def lm_coverage(
    docs: DataFrame,
    ref_permille: int = 250,
    hash_kind: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_ref: bool = False,
) -> DataFrame:
    """Reference-LM n-gram coverage (CCNet-shaped quality filter).

    CCNet ranks crawled text by a language model trained on a curated
    corpus (Wikipedia); the integer-exact analogue here scores each
    document by the fraction of its distinct word bigrams that appear
    anywhere in a deterministic curated subset (the `ref_permille`
    md5-permille slice of the corpus standing in for the wiki side).
    Gibberish and OCR noise produce bigrams the curated side never
    contains and score near 0; fluent text reuses the curated bigram
    inventory and scores high. No float log enters the output:
    coverage_permille = (1000 * known) DIV n_bigrams.

    Returns (doc_id, is_ref, n_bigrams, n_known, coverage_permille)
    for every doc with >= 2 tokens (reference docs included — they are
    scored against the same inventory, naturally high).

    Scale: the bigram build is the shared relational shingle stage
    (posexplode + lead, one doc-keyed exchange). The membership join is
    keyed by bigram string — in production the curated inventory is
    wiki-sized (10^8 bigrams, broadcastable: `broadcast_ref=True`);
    the default shuffle join is the engine-neutral form the oracle
    replays. Head skew is bounded because the probe side is DISTINCT
    per doc — a bigram key receives at most one row per document.
    """
    from cola_spark.operators.sampling import permille_bucket
    from cola_spark.operators.textdedup import shingles

    sh = shingles(docs, n=2, id_col=id_col, text_col=text_col)
    bucket = permille_bucket(F.col("doc_id"), hash_kind=hash_kind, seed="lmref")
    sh = sh.withColumn("is_ref", bucket < ref_permille)
    ref = sh.filter("is_ref").select("shingle").distinct()
    # corpus-derived side: pin shuffle_hash unless the caller asserts
    # the curated inventory is broadcast-sized (the bloom-gate rule —
    # Catalyst's local size estimate would broadcast it at sf0.01 and
    # OOM at 10^10)
    known = ref.withColumn("_known", F.lit(1))
    known = F.broadcast(known) if broadcast_ref else known.hint("shuffle_hash")
    return (
        sh.join(known, "shingle", "left")
        .groupBy("doc_id", "is_ref")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.count("_known").cast("long").alias("n_known"),
        )
        .withColumn(
            "coverage_permille",
            F.expr("1000 * n_known DIV n_bigrams").cast("long"),
        )
    )


def tfidf_topk(
    docs: DataFrame,
    k: int = 3,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Integer-exact tf-idf keyword extraction: top-k terms per doc.

    idf is the scaled rational (1_000_000 * n_docs) DIV df — exactly
    monotone in log(n_docs/df) for ranking purposes with zero float
    arithmetic, so the ranks (and the score column) are engine-stable.
    score = tf * idf_micro; ties broken lexically on the term.

    Returns (doc_id, term, tf, df, score, rnk) with rnk in [1, k].

    Scale: tf is a (doc, term)-keyed partial agg; df aggregates the tf
    frame (one row per doc per term — any single term's key volume is
    bounded by n_docs, the same Zipf profile unigram_quality's
    head-split handles; at trainer scale reuse that split here). The
    n_docs scalar rides a 1-row broadcast; the final top-k is a
    doc-keyed window over <= vocab-per-doc rows.
    """
    toks = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("term"),
    )
    tf = toks.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    dfreq = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    n_docs = docs.select(F.countDistinct(id_col).cast("long").alias("n_docs"))
    # dfreq is vocab-scale (10^8+ terms at corpus scale): shuffle_hash,
    # never Catalyst's size-estimate broadcast (the bloom-gate rule)
    scored = (
        tf.join(dfreq.hint("shuffle_hash"), "term")
        .join(F.broadcast(n_docs))
        .select(
            "doc_id",
            "term",
            "tf",
            "df",
            (F.col("tf") * F.expr("(1000000 * n_docs) div df"))
            .cast("long")
            .alias("score"),
        )
    )
    from pyspark.sql import Window

    w = Window.partitionBy("doc_id").orderBy(F.desc("score"), "term")
    return (
        scored.withColumn("rnk", F.row_number().over(w).cast("long"))
        .filter(F.col("rnk") <= k)
    )
