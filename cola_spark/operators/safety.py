"""Source-blocklist + unsafe-lexicon safety gate for caption corpora.

The first curation gate a LAION-style pipeline applies AFTER the crawl
and BEFORE any expensive scoring: drop documents from blocklisted
sources (domain/host blocklists — spam farms, known-bad mirrors) and
documents whose caption text carries too high a density of lexicon
terms (NSFW/violence wordlists in production; this sandbox uses a
stand-in lexicon drawn from the synthetic vocabulary so both branches
of the gate do real work — the machinery, not the wordlist, is the
operator).

No reference analogue — cola (SURVEY.md §2) stops at fetch/parse;
safety filtering is the curation step layered on the crawled corpus.

Scale design: the blocklist is a genuine small dimension (thousands of
hosts against 10^10 docs) → an explicit `broadcast()` left join, the
one place in this repo where broadcast IS the rule rather than the
exception (corpus-derived sides get shuffle_hash; static dims get
broadcast). Term counting is posexplode → map-side-combinable count
keyed by doc_id — one exchange, no per-row Python, no interpreted
higher-order functions. The decision is integer permille (engine-exact
`div`), mirroring docs_repetition / lm_coverage_score.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Stand-in lists for the sandbox's synthetic corpus (documented above).
# Production passes its real host blocklist / NSFW lexicon.
DEFAULT_BLOCKED_SOURCES = ["src3", "src7", "src13"]
DEFAULT_UNSAFE_TERMS = ["slow", "big"]


def safety_gate(
    docs: DataFrame,
    blocked_sources: list[str] | None = None,
    unsafe_terms: list[str] | None = None,
    max_unsafe_permille: int = 80,
    id_col: str = "doc_id",
    text_col: str = "text",
    source_col: str = "source",
) -> DataFrame:
    """(doc_id, source, blocked, n_tok, n_unsafe, unsafe_permille,
    admit): the complete auditable decision table — admit = not
    source-blocked AND unsafe-token density <= max_unsafe_permille.

    Every pruned row says WHY (blocked vs over-threshold), every
    admitted row carries the evidence — the embedding_decontam /
    clip_align decision-table contract."""
    blocked_sources = (
        DEFAULT_BLOCKED_SOURCES if blocked_sources is None else blocked_sources
    )
    unsafe_terms = DEFAULT_UNSAFE_TERMS if unsafe_terms is None else unsafe_terms
    spark = docs.sparkSession
    ntok = F.size(F.split(F.trim(F.col(text_col)), r"\s+")).cast("long")
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        ntok.alias("n_tok"),
    )
    blk = spark.createDataFrame(
        [(s,) for s in blocked_sources], "source string"
    ).withColumn("_blk", F.lit(True))
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    uns = (
        toks.filter(F.col("tok").isin(*unsafe_terms))
        .groupBy("doc_id")
        .agg(F.count("*").cast("long").alias("n_unsafe"))
    )
    out = (
        base.join(F.broadcast(blk), "source", "left")
        .join(uns.hint("shuffle_hash"), "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce(F.col("_blk"), F.lit(False)).alias("blocked"),
            "n_tok",
            F.coalesce(F.col("n_unsafe"), F.lit(0)).cast("long").alias("n_unsafe"),
        )
        .withColumn(
            "unsafe_permille",
            F.expr("(1000 * n_unsafe) div n_tok").cast("long"),
        )
    )
    return out.withColumn(
        "admit",
        (~F.col("blocked"))
        & (F.col("unsafe_permille") <= int(max_unsafe_permille)),
    )


# Stand-in soft-blocklist for the synthetic part-name vocabulary —
# production passes the real (term, weight) list (UT1 / RefinedWeb-style
# word-score URL filtering). "old" is deliberately a substring of
# "cold": the scorer counts SUBSTRING occurrences, the published
# soft-blocklist semantics.
DEFAULT_URL_TERMS: list[tuple[str, int]] = [
    ("hot", 5), ("red", 3), ("gizmo", 2), ("old", 1),
]


def url_blocklist_score(
    urls: DataFrame,
    terms: list[tuple[str, int]] | None = None,
    url_col: str = "url",
    threshold: int = 6,
) -> DataFrame:
    """RefinedWeb-style soft URL blocklist: block_score = Σ weight ×
    substring-occurrences(term, url); url_blocked = score ≥ threshold.

    The URL twin of safety_gate's lexicon branch, applied BEFORE fetch
    (cola gates post-parse; a frontier at 10^10 URLs cannot afford to
    fetch spam first). Scale shape: the term list is static at plan
    time, so each term compiles to a pure length/replace projection —
    zero joins, zero shuffle, whole-stage codegen end-to-end; the plan
    is a scan + project no matter the corpus size. Occurrence count is
    (len(url) - len(replace(url, term))) DIV len(term) — integer-exact,
    identical arithmetic in the DuckDB oracle."""
    terms = DEFAULT_URL_TERMS if terms is None else terms
    score = F.lit(0).cast("long")
    for t, wt in terms:
        if "'" in t:
            raise ValueError(f"term may not contain a quote: {t!r}")
        occ = F.expr(
            f"(length({url_col}) - length(replace({url_col}, '{t}', '')))"
            f" DIV {len(t)}"
        )
        score = score + F.lit(int(wt)).cast("long") * occ
    return urls.select(
        *urls.columns,
        score.cast("long").alias("block_score"),
        (score >= int(threshold)).alias("url_blocked"),
    )
