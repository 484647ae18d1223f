"""Fuzzy document deduplication at scale: MinHash+LSH and SimHash.

No reference analogue — cola dedups on URL identity only
(cola/core/dedup.py); these are the content-level dedup operators a
100 TB training-data pipeline needs on top of the crawl.

Design (Spark-first):
  * Exact n-gram Jaccard (the oracle) and MinHash signatures are pure
    column expressions — shingling via transform/element_at, the
    K-perm signature via min(xxhash64(shingle, seed_k)) aggregates:
    JVM-side, whole-stage codegen, no Python.
  * LSH banding turns the O(n²) pair space into an equi-join on
    (band_id, band_hash) — the only shuffle is by band key.
  * SimHash needs a per-doc fold over token hashes → one Arrow-
    vectorized pandas UDF (numpy bit-matrix popcount), then candidate
    pairs via bucket equi-join + F.bit_count(xor) Hamming distance.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import LongType


def shingles(docs: DataFrame, n: int = 3, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(id, shingle): distinct word n-gram shingles per document."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    idx = F.sequence(F.lit(1), F.greatest(F.size(words) - (n - 1), F.lit(0)))
    gram = F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + k) for k in range(n)])
    )
    return docs.filter(F.size(words) >= n).select(
        F.col(id_col).alias("doc_id"), F.explode(F.array_distinct(gram)).alias("shingle")
    )


def minhash_signatures(sh: DataFrame, num_perm: int = 16) -> DataFrame:
    """(doc_id, sig array<long>): K-perm MinHash from seeded xxhash64.

    min(xxhash64(shingle, k)) over a doc's shingle set is the classic
    min-wise independent permutation estimate; xxhash64's extra-arg
    seeding gives the hash family without any UDF.
    """
    aggs = [
        F.min(F.xxhash64(F.col("shingle"), F.lit(k))).alias(f"h{k}")
        for k in range(num_perm)
    ]
    wide = sh.groupBy("doc_id").agg(*aggs)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{k}") for k in range(num_perm)]).alias("sig")
    )


def lsh_candidate_pairs(sigs: DataFrame, bands: int = 4) -> DataFrame:
    """(doc_a, doc_b): pairs sharing ≥1 LSH band bucket.

    K = bands * rows_per_band; two docs collide in band b iff their
    signature slices agree exactly — the standard S-curve tradeoff.
    """
    first = sigs.select(F.size("sig").alias("k")).first()
    k = first.k if first else 0
    r = max(k // bands, 1)
    band_rows = sigs.select(
        "doc_id",
        F.explode(
            F.array(*[
                F.struct(
                    F.lit(b).alias("band_id"),
                    F.xxhash64(F.concat_ws(",", *[
                        F.col("sig")[b * r + j].cast("string") for j in range(r)
                    ])).alias("band_hash"),
                )
                for b in range(bands)
            ])
        ).alias("band"),
    ).select("doc_id", "band.band_id", "band.band_hash")
    a = band_rows.alias("a")
    b = band_rows.alias("b")
    return (
        a.join(
            b,
            (F.col("a.band_id") == F.col("b.band_id"))
            & (F.col("a.band_hash") == F.col("b.band_hash"))
            & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
        .distinct()
    )


def exact_jaccard(sh: DataFrame, pairs: DataFrame | None = None) -> DataFrame:
    """(doc_a, doc_b, common, na, nb): exact shingle-set overlap; when
    ``pairs`` is given, restricted to those candidates (the LSH verify
    stage), else all co-shingled pairs."""
    sz = sh.groupBy("doc_id").agg(F.count("*").alias("n_sh"))
    a = sh.alias("a")
    b = sh.alias("b")
    joined = a.join(
        b,
        (F.col("a.shingle") == F.col("b.shingle")) & (F.col("a.doc_id") < F.col("b.doc_id")),
    ).select(F.col("a.doc_id").alias("doc_a"), F.col("b.doc_id").alias("doc_b"))
    common = joined.groupBy("doc_a", "doc_b").agg(F.count("*").alias("common"))
    if pairs is not None:
        common = common.join(pairs, ["doc_a", "doc_b"], "left_semi")
    return (
        common.join(sz.select(F.col("doc_id").alias("doc_a"), F.col("n_sh").alias("na")), "doc_a")
        .join(sz.select(F.col("doc_id").alias("doc_b"), F.col("n_sh").alias("nb")), "doc_b")
    )


def minhash_dedup_pairs(
    docs: DataFrame, num_perm: int = 16, bands: int = 4, jaccard_num: int = 2, jaccard_den: int = 10
) -> DataFrame:
    """LSH candidates verified by exact Jaccard ≥ num/den.

    End-to-end near-dup pipeline: shingle → minhash → band-bucket join
    → exact verify. Output (doc_a, doc_b, common, na, nb) matches
    q_ngram_jaccard_pairs' shape so the two are directly comparable.
    """
    sh = shingles(docs)
    cand = lsh_candidate_pairs(minhash_signatures(sh, num_perm), bands)
    j = exact_jaccard(sh, cand)
    return j.filter(
        F.col("common") * jaccard_den
        >= jaccard_num * (F.col("na") + F.col("nb") - F.col("common"))
    ).select("doc_a", "doc_b", "common", "na", "nb")


@F.pandas_udf(LongType())
def _simhash_from_hashes(hashes: pd.Series) -> pd.Series:
    """64-bit SimHash from a list of token hashes (vectorized numpy)."""
    import numpy as np

    out = []
    for hs in hashes:
        if hs is None or len(hs) == 0:
            out.append(0)
            continue
        h = np.asarray(hs, dtype=np.int64).view(np.uint64)
        bits = ((h[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        v = (bits * 2 - 1).sum(axis=0)
        sh = np.uint64(0)
        for b in range(64):
            if v[b] > 0:
                sh |= np.uint64(1) << np.uint64(b)
        out.append(int(sh.astype(np.int64).view(np.int64)))
    return pd.Series(out)


def simhash(docs: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """(doc_id, simhash, bucket): 64-bit SimHash over whitespace tokens;
    bucket = top 16 bits (block key for near-dup candidate join)."""
    toks = docs.select(
        F.col(id_col).alias("doc_id"),
        F.explode(F.split(F.trim(F.col(text_col)), r"\s+")).alias("tok"),
    )
    hashed = toks.select("doc_id", F.xxhash64("tok").alias("th"))
    sig = hashed.groupBy("doc_id").agg(
        _simhash_from_hashes(F.collect_list("th")).alias("simhash")
    )
    return sig.withColumn("bucket", F.shiftrightunsigned(F.col("simhash"), 48).cast("int"))


def simhash_near_pairs(docs: DataFrame, max_hamming: int = 8) -> DataFrame:
    """(doc_a, doc_b, hamming): same-bucket pairs within Hamming radius.
    Hamming distance is JVM-side: bit_count(xor)."""
    s = simhash(docs)
    a = s.alias("a")
    b = s.alias("b")
    return (
        a.join(
            b,
            (F.col("a.bucket") == F.col("b.bucket")) & (F.col("a.doc_id") < F.col("b.doc_id")),
        )
        .select(
            F.col("a.doc_id").alias("doc_a"),
            F.col("b.doc_id").alias("doc_b"),
            F.bit_count(F.col("a.simhash").bitwiseXOR(F.col("b.simhash"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
