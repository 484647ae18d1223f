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

from pyspark.sql import DataFrame, Window
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


def ngram_lm_perplexity(
    docs: DataFrame,
    ref_permille: int = 250,
    keep_permille: int = 300,
    hash_kind: str = "md5",
    id_col: str = "doc_id",
    text_col: str = "text",
    broadcast_ref: bool = False,
) -> DataFrame:
    """CCNet's actual quality gate: rank documents by PERPLEXITY under
    a language model trained on a curated reference corpus, keep the
    low-perplexity head (Wenzek et al. 2020 §4.3 — lm_coverage is the
    coverage cousin; this is the real thing as a bigram LM).

    The LM is an add-one-smoothed bigram model over the deterministic
    md5-permille curated slice (same "lmref" seed as lm_coverage, so
    both gates share THE curated corpus). The per-occurrence cost is
    the integer-exact bit stand-in for -log2 p(w2|w1):

        bits = fl2(c(w1) + V) - fl2(c(w1,w2) + 1),
        fl2(x) = length(bin(x)) - 1 = floor(log2 x)

    with V = |ref second-word vocab| + 1 (one OOV slot). bin() renders
    identical strings in both engines (the unigram_quality idiom), c12
    <= c1 and V >= 1 keep bits >= 0, and unseen contexts degrade to
    fl2(V) — every division has a nonnegative numerator so Spark DIV
    == DuckDB //. ppl_millibits = (1000 * sum_bits) DIV n_bigrams is
    the scaled mean; the keep set is the bottom `keep_permille`
    fraction by (ppl_millibits, doc_id) via the two-phase global rank
    (CCNet cuts on percentile, not on an absolute threshold — and the
    rank form keeps both branches live at any corpus).

    Scale: the bigram build is the shared relational fan-out
    (raw_grams — occurrences, CCNet scores every token). The c12/c1
    joins are keyed by gram/context with one probe row per OCCURRENCE
    — the same volume every corpus pass pays, no blow-up; the trained
    side is curated-corpus-sized (wiki-scale: broadcastable via
    `broadcast_ref=True`; default shuffle_hash is the engine-neutral
    oracle form — the bloom-gate rule, Catalyst's local size estimate
    must not pick the 10^10-row plan).

    Returns the complete decision table
    (doc_id, is_ref, n_bigrams, sum_bits, ppl_millibits, ppl_rank,
    is_kept) for every doc with >= 2 tokens.
    """
    from cola_spark.operators.ranking import global_rank
    from cola_spark.operators.sampling import permille_bucket
    from cola_spark.operators.selection import raw_grams

    g = raw_grams(docs, n=2, id_col=id_col, text_col=text_col)
    bucket = permille_bucket(F.col("doc_id"), hash_kind=hash_kind, seed="lmref")
    g = g.withColumn("is_ref", bucket < ref_permille)
    ref = g.filter("is_ref")
    c12 = ref.groupBy("gram").agg(F.count("*").cast("long").alias("c12"))
    c1 = (
        ref.select(F.substring_index("gram", " ", 1).alias("w1"))
        .groupBy("w1")
        .agg(F.count("*").cast("long").alias("c1"))
    )
    vocab = ref.select(
        F.substring_index("gram", " ", -1).alias("w2")
    ).agg((F.countDistinct("w2") + 1).cast("long").alias("v"))
    c12 = F.broadcast(c12) if broadcast_ref else c12.hint("shuffle_hash")
    c1 = F.broadcast(c1) if broadcast_ref else c1.hint("shuffle_hash")
    fl2 = lambda c: (F.length(F.bin(c)) - 1).cast("long")  # noqa: E731
    probe = (
        g.join(c12, "gram", "left")
        .withColumn("w1", F.substring_index("gram", " ", 1))
        .join(c1, "w1", "left")
        .crossJoin(F.broadcast(vocab))
        .withColumn(
            "bits",
            fl2(F.coalesce("c1", F.lit(0)) + F.col("v"))
            - fl2(F.coalesce("c12", F.lit(0)) + 1),
        )
    )
    per_doc = (
        probe.groupBy("doc_id", "is_ref")
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("bits").cast("long").alias("sum_bits"),
        )
        .withColumn(
            "ppl_millibits",
            F.expr("1000 * sum_bits DIV n_bigrams").cast("long"),
        )
    )
    ranked = global_rank(
        per_doc, ["ppl_millibits", "doc_id"], out_col="ppl_rank",
        eager_release=True,
    )
    tot = ranked.agg(F.count("*").alias("_tot"))
    return ranked.crossJoin(F.broadcast(tot)).select(
        "doc_id",
        "is_ref",
        "n_bigrams",
        "sum_bits",
        "ppl_millibits",
        F.col("ppl_rank").cast("long").alias("ppl_rank"),
        (F.col("ppl_rank") * 1000 <= F.lit(keep_permille) * F.col("_tot"))
        .alias("is_kept"),
    )


def bm25_topk(
    docs: DataFrame,
    skip: int = 10,
    take: int = 5,
    k: int = 20,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """BM25 retrieval over the corpus — the production ranking function
    (Robertson & Walker 1994; k1 = 6/5, b = 3/4 as exact rationals)
    beside tfidf_topk's raw tf-idf. Everything stays on the integer
    grid so the whole ranking is engine-exact:

        term_permille = (44000*avgdl*tf)
                        DIV (20*avgdl*tf + 6*avgdl + 18*dl)

    is the saturating tf term — tf*(k1+1)/(tf + k1*(1-b+b*dl/avgdl))
    cross-multiplied by 20*avgdl with avgdl = T DIV N snapped to the
    integer grid (every factor is per-doc bounded, so the arithmetic
    never outgrows int64 at ANY corpus size — unlike forms that carry
    the corpus token total T into the numerator); idf_milli =
    (1000*N) DIV df is the tfidf house rational (rank-monotone in
    log(N/df)); score = SUM over query terms of idf_milli *
    term_permille.

    The query is data-derived and deterministic: document-frequency
    ranks skip+1 .. skip+take (the mid-df band — skipping the
    ubiquitous head keeps idf discriminative), selected by TakeOrdered
    (orderBy + limit — distributed partial top-k, config-scale
    result) and broadcast to the tf join. Top-k docs by (score DESC,
    doc_id) via the same TakeOrdered; the final rank window runs on
    the <= k-row shortlist (config-scale, not the banned global
    window).

    Returns (doc_id, dl, n_q_terms, score, rnk), the top k docs.
    """
    from cola_spark.operators.selection import raw_grams

    toks = raw_grams(docs, n=1, id_col=id_col, text_col=text_col)
    tf = toks.groupBy("doc_id", "gram").agg(
        F.count("*").cast("long").alias("tf")
    )
    dl = tf.groupBy("doc_id").agg(F.sum("tf").cast("long").alias("dl"))
    dfq = tf.groupBy("gram").agg(F.count("*").cast("long").alias("df"))
    stats = dl.agg(
        F.count("*").cast("long").alias("n_docs"),
        F.expr("sum(dl) DIV count(*)").cast("long").alias("avgdl"),
    )
    qterms = dfq.orderBy(F.desc("df"), "gram").limit(skip + take)
    wq = Window.orderBy(F.desc("df"), "gram")
    qterms = (
        qterms.withColumn("qrnk", F.row_number().over(wq))
        .filter(F.col("qrnk") > skip)
        .select("gram", "df")
    )
    scored = (
        tf.join(F.broadcast(qterms), "gram")
        .join(dl, "doc_id")
        .crossJoin(F.broadcast(stats))
        .withColumn(
            "term_permille",
            F.expr(
                "(44000 * avgdl * tf)"
                " DIV (20 * avgdl * tf + 6 * avgdl + 18 * dl)"
            ).cast("long"),
        )
        .withColumn(
            "idf_milli", F.expr("(1000 * n_docs) DIV df").cast("long")
        )
    )
    per_doc = scored.groupBy("doc_id", "dl").agg(
        F.count("*").cast("long").alias("n_q_terms"),
        F.sum(F.col("idf_milli") * F.col("term_permille"))
        .cast("long")
        .alias("score"),
    )
    top = per_doc.orderBy(F.desc("score"), "doc_id").limit(k)
    wr = Window.orderBy(F.desc("score"), "doc_id")
    return top.withColumn("rnk", F.row_number().over(wr).cast("long"))


GOPHER_STOPWORDS = ["the", "be", "to", "of", "and", "that", "have", "with"]


def gopher_rules(
    docs: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """The Gopher quality rules (Rae et al. 2021, App. A1.1) as a
    complete per-rule decision table — the NAMED rule-set filter
    (Gopher/Dolma/DataComp lineage) beside the generic heuristic
    scorer (q_docs_quality) and the learned ones (quality_lr,
    ngram_lm_perplexity):

      r_words:    50 <= word count <= 100000
      r_meanlen:  3 <= mean word length <= 10        (milli grid)
      r_symbol:   (# '#' + # '...') / words <= 0.1   (permille)
      r_bullet:   <= 10% of lines start with '- '
      r_ellipsis: <= 30% of lines end with '...'
      r_alpha:    >= 80% of words contain a letter
      r_stop:     >= 2 distinct stopwords present
      keep = AND of all seven

    All thresholds are cross-multiplied integer comparisons (no
    ratios materialize), counts come from two relational fan-outs
    (the shared raw_grams token build + one line posexplode — both
    doc-key partitioned, joins co-partitioned) and two text-level
    length/replace projections (map-side). Every count and boolean is
    engine-exact, so the SQL oracle replays the whole table.
    """
    from cola_spark.operators.selection import raw_grams
    from cola_spark.operators.textdedup import spread_small_scan

    toks = raw_grams(docs, n=1, id_col=id_col, text_col=text_col)
    tok_agg = toks.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_words"),
        F.sum(F.length("gram")).cast("long").alias("sum_len"),
        F.sum(F.when(F.col("gram").rlike("[a-z]"), 1).otherwise(0))
        .cast("long")
        .alias("n_alpha"),
        F.countDistinct(
            F.when(F.col("gram").isin(GOPHER_STOPWORDS), F.col("gram"))
        )
        .cast("long")
        .alias("n_stop"),
    )
    base = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"), F.col(text_col).alias("text")
    )
    lines = base.select(
        "doc_id", F.explode(F.split("text", "\n")).alias("line")
    )
    line_agg = lines.groupBy("doc_id").agg(
        F.count("*").cast("long").alias("n_lines"),
        F.sum(F.when(F.col("line").startswith("- "), 1).otherwise(0))
        .cast("long")
        .alias("n_bullet"),
        F.sum(F.when(F.col("line").endswith("..."), 1).otherwise(0))
        .cast("long")
        .alias("n_ellip_line"),
    )
    textm = base.select(
        "doc_id",
        (F.length("text") - F.length(F.expr("replace(text, '#', '')")))
        .cast("long")
        .alias("n_hash"),
        F.expr("(length(text) - length(replace(text, '...', ''))) DIV 3")
        .cast("long")
        .alias("n_ellip"),
    )
    j = tok_agg.join(line_agg, "doc_id").join(textm, "doc_id")
    out = j.select(
        "doc_id",
        "n_words",
        F.expr("1000 * sum_len DIV n_words").cast("long").alias("mean_len_milli"),
        "n_alpha",
        "n_stop",
        "n_lines",
        "n_bullet",
        "n_ellip_line",
        (F.col("n_hash") + F.col("n_ellip")).cast("long").alias("n_symbol"),
        (F.col("n_words") >= 50).alias("r_words_lo"),
        (F.col("n_words") <= 100000).alias("r_words_hi"),
    )
    out = out.select(
        "*",
        ((F.col("mean_len_milli") >= 3000) & (F.col("mean_len_milli") <= 10000))
        .alias("r_meanlen"),
        (F.col("n_symbol") * 1000 <= F.col("n_words") * 100).alias("r_symbol"),
        (F.col("n_bullet") * 1000 <= F.col("n_lines") * 100).alias("r_bullet"),
        (F.col("n_ellip_line") * 1000 <= F.col("n_lines") * 300)
        .alias("r_ellipsis"),
        (F.col("n_alpha") * 1000 >= F.col("n_words") * 800).alias("r_alpha"),
        (F.col("n_stop") >= 2).alias("r_stop"),
    )
    keep = (
        F.col("r_words_lo")
        & F.col("r_words_hi")
        & F.col("r_meanlen")
        & F.col("r_symbol")
        & F.col("r_bullet")
        & F.col("r_ellipsis")
        & F.col("r_alpha")
        & F.col("r_stop")
    )
    return out.select("*", keep.alias("keep"))
