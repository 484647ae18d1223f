"""MinHash-LSH and SimHash semantics vs the exact oracles."""

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.textdedup import (
    exact_jaccard,
    lsh_candidate_pairs,
    minhash_dedup_pairs,
    minhash_signatures,
    shingles,
    simhash,
    simhash_near_pairs,
)

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def docs(spark):
    base = spark.read.parquet(f"{SF}/documents.parquet")
    # plant exact + near duplicates with known ids
    dup = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 100000).alias("doc_id"), "text", "lang", "source", "n_chars"
    )
    near = base.filter(F.col("doc_id") < 5).select(
        (F.col("doc_id") + 200000).alias("doc_id"),
        F.concat(F.col("text"), F.lit(" tail tail tail")).alias("text"),
        "lang", "source", "n_chars",
    )
    return base.unionByName(dup).unionByName(near)


def test_minhash_finds_planted_duplicates(docs):
    pairs = {(r.doc_a, r.doc_b) for r in minhash_dedup_pairs(docs).collect()}
    for i in range(5):
        assert (i, i + 100000) in pairs, f"exact dup {i} missed"
        assert (i, i + 200000) in pairs, f"near dup {i} missed"


def test_minhash_pairs_are_exactly_verified(docs):
    """Precision 1.0: every emitted pair passes the exact-Jaccard bar."""
    got = minhash_dedup_pairs(docs)
    sh = shingles(docs)
    exact = exact_jaccard(sh).filter(
        F.col("common") * 10 >= 2 * (F.col("na") + F.col("nb") - F.col("common"))
    )
    extra = got.join(exact.select("doc_a", "doc_b"), ["doc_a", "doc_b"], "left_anti")
    assert extra.count() == 0


def test_minhash_signature_shape_and_determinism(docs):
    sh = shingles(docs.limit(20))
    s1 = {r.doc_id: list(r.sig) for r in minhash_signatures(sh, 16).collect()}
    s2 = {r.doc_id: list(r.sig) for r in minhash_signatures(sh, 16).collect()}
    assert s1 == s2
    assert all(len(v) == 16 for v in s1.values())


def test_lsh_identical_sigs_always_collide(docs):
    sh = shingles(docs)
    sigs = minhash_signatures(sh, 16)
    cand = {(r.doc_a, r.doc_b) for r in lsh_candidate_pairs(sigs, 4).collect()}
    for i in range(5):
        assert (i, i + 100000) in cand  # identical text → identical sig → collide


def test_simhash_exact_dup_distance_zero(docs):
    s = {r.doc_id: r.simhash for r in simhash(docs).collect()}
    for i in range(5):
        assert s[i] == s[i + 100000]
        # near dup: small Hamming distance
        ham = bin((s[i] ^ s[i + 200000]) & (2**64 - 1)).count("1")
        assert ham <= 12, f"near-dup hamming {ham}"


def test_simhash_near_pairs_contains_planted(docs):
    pairs = {(r.doc_a, r.doc_b): r.hamming for r in simhash_near_pairs(docs, 8).collect()}
    for i in range(5):
        assert pairs.get((i, i + 100000)) == 0
