"""BPE merge-rule training as pure DataFrame ops.

Learns the first K byte-pair-encoding merges (Sennrich et al. 2016,
"Neural Machine Translation of Rare Words with Subword Units") over a
corpus — the tokenizer-induction step of a training-data pipeline,
joining the repo's other trained-as-relational-ops family (logistic
regression GD epochs, Lloyd k-means, damped PageRank: every iteration
is a deterministic DataFrame round the DuckDB oracle replays as CTEs,
so a wrong count, tie-break or overlap rule hash-fails).

No reference analogue — cola extracts structured fields, it never
induces a vocabulary; this is the text-side operator an LLM corpus
build runs after cleaning.

Scale shape: the corpus-sized work is ONE map-side-combinable groupBy
(word → frequency). Everything after runs on the word-TYPE vocabulary
(bounded by vocabulary size, not corpus size — the classic map-reduce
BPE decomposition), with per-round state = (word, freq, pos, piece)
rows ≤ total characters of the distinct vocabulary. Each merge round
is: one word-partitioned lead() window for pair counting, one
broadcast join against the 1-row argmax, two word-keyed windows for
the leftmost-non-overlapping rule, one renumber window — all on the
same word partitioning, so Catalyst plans a single vocab-sized
exchange per round. The argmax itself is TakeOrderedAndProject (no
global sort).

The leftmost-non-overlapping rule: within a maximal run of consecutive
match positions (overlaps share a piece — e.g. merging "aa" in "aaa"),
BPE takes greedy leftmost matches = even offsets within the run
(gaps-and-islands, the duplicate_spans technique).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _word_chars(docs: DataFrame, id_col: str, text_col: str) -> DataFrame:
    """(word, freq, pos, piece): the character-exploded word-frequency
    vocabulary — the only corpus-sized stage is the word count."""
    vocab = (
        docs.select(
            F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word")
        )
        .groupBy("word")
        .agg(F.count("*").cast("long").alias("freq"))
    )
    return vocab.select(
        "word", "freq",
        F.explode(F.sequence(F.lit(1), F.length("word"))).alias("pos"),
    ).withColumn("piece", F.expr("substring(word, pos, 1)"))


def _one_merge(chars: DataFrame) -> tuple[DataFrame, DataFrame]:
    """One BPE round: (next chars state, 1-row winning merge)."""
    wd = Window.partitionBy("word").orderBy("pos")
    p = chars.withColumn("nxt", F.lead("piece").over(wd))
    pc = (
        p.filter(F.col("nxt").isNotNull())
        .groupBy("piece", "nxt")
        .agg(F.sum("freq").alias("cnt"))
    )
    best = (
        pc.orderBy(F.desc("cnt"), F.asc("piece"), F.asc("nxt"))
        .limit(1)
        .select(
            F.col("piece").alias("lpiece"),
            F.col("nxt").alias("rpiece"),
            F.col("cnt").cast("long").alias("pair_freq"),
        )
        .localCheckpoint()  # 1 row, read twice (output + this round's join)
    )
    return _apply_merge(chars, best), best


def _apply_merge(chars: DataFrame, rule: DataFrame) -> DataFrame:
    """Apply ONE (lpiece, rpiece) merge rule — a 1-row broadcast frame —
    to the char state with the leftmost-non-overlapping rule. Shared by
    training (the round's argmax) and encoding (a stored trained rule),
    so apply-time semantics are the training semantics by construction."""
    wd = Window.partitionBy("word").orderBy("pos")
    p = chars.withColumn("nxt", F.lead("piece").over(wd))
    m = p.join(
        F.broadcast(rule.select("lpiece", "rpiece")),
        (F.col("piece") == F.col("lpiece")) & (F.col("nxt") == F.col("rpiece")),
        "left",
    )
    starts = m.filter(F.col("lpiece").isNotNull()).select("word", "pos")
    isl = starts.withColumn(
        "isl", F.col("pos") - F.row_number().over(wd)
    )
    kept = (
        isl.withColumn(
            "off",
            F.col("pos") - F.min("pos").over(Window.partitionBy("word", "isl")),
        )
        .filter(F.col("off") % 2 == 0)
        .select(F.col("word").alias("kw"), F.col("pos").alias("kpos"))
    )
    j = (
        m.join(
            kept,
            (F.col("word") == F.col("kw")) & (F.col("pos") == F.col("kpos")),
            "left",
        )
        .withColumn("started", F.col("kpos").isNotNull())
        .drop("kw", "kpos")
        .join(
            kept,
            (F.col("word") == F.col("kw")) & (F.col("pos") == F.col("kpos") + 1),
            "left",
        )
        .filter(F.col("kpos").isNull())  # consumed by the merge at pos-1
    )
    nxt_chars = j.select(
        "word", "freq",
        F.row_number().over(wd).alias("pos"),
        F.when(F.col("started"), F.concat(F.col("piece"), F.col("nxt")))
        .otherwise(F.col("piece"))
        .alias("piece"),
    )
    return nxt_chars


def bpe_merges(
    docs: DataFrame,
    merges: int = 4,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Learn the first `merges` BPE rules; returns (merge_rank, lpiece,
    rpiece, pair_freq) — the merge table a tokenizer persists. Each
    round's vocab state is localCheckpoint'd: vocab-scale (tiny), keeps
    the unrolled plan shallow, and the checkpoint cut is deterministic
    so the cross-engine oracle still replays every round exactly."""
    chars = _word_chars(docs, id_col, text_col).localCheckpoint()
    out = []
    for rank in range(1, int(merges) + 1):
        chars, best = _one_merge(chars)
        chars = chars.localCheckpoint()
        out.append(best.select(
            F.lit(rank).cast("long").alias("merge_rank"),
            "lpiece", "rpiece", "pair_freq",
        ))
    res = out[0]
    for b in out[1:]:
        res = res.unionByName(b)
    return res


def bpe_encode(
    docs: DataFrame,
    rules: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """(doc_id, n_words, n_pieces, n_chars): tokenize the corpus with a
    TRAINED merge table (bpe_merges' output) — the apply half of the
    tokenizer story: production trains once, then encodes every corpus
    forever. Applying the stored rules in merge_rank order replays the
    training rounds' states exactly (same _apply_merge, same leftmost-
    non-overlapping rule), so on the training corpus the encoded vocab
    IS round-K's state — which is what lets the oracle reuse the
    training CTE chain verbatim.

    Scale shape (the map-reduce BPE decomposition again): encoding is
    a function of the word TYPE, so every merge application runs on
    the distinct-word vocabulary; the corpus-sized stages are ONE
    word-count groupBy and ONE word-keyed join back (shuffle_hash —
    corpus-derived sides). The rules frame is config-scale (a
    tokenizer has a fixed merge list) and is collected to drive the
    loop — the trained-codebook-memo precedent, never corpus data."""
    chars = _word_chars(docs, id_col, text_col).localCheckpoint()
    spark = docs.sparkSession
    rl = sorted(
        rules.select("merge_rank", "lpiece", "rpiece").collect(),
        key=lambda r: r["merge_rank"],
    )
    for r in rl:
        rule = spark.createDataFrame(
            [(r["lpiece"], r["rpiece"])], "lpiece string, rpiece string"
        )
        chars = _apply_merge(chars, rule).localCheckpoint()
    word_enc = chars.groupBy("word").agg(
        F.count("*").cast("long").alias("n_pieces")
    )
    from cola_spark.operators.textdedup import spread_small_scan

    dw = spread_small_scan(docs, id_col).select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("word"),
    )
    return (
        dw.join(word_enc.hint("shuffle_hash"), "word")
        .groupBy("doc_id")
        .agg(
            F.count("*").cast("long").alias("n_words"),
            F.sum("n_pieces").cast("long").alias("n_pieces"),
            F.sum(F.length("word")).cast("long").alias("n_chars"),
        )
    )
