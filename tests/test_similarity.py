"""ANN: brute-force oracle vs LSH-bucketed variant + centroids."""

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.similarity import brute_force_topk, centroids, lsh_bucketed_topk

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


def test_brute_force_topk_shape_and_determinism(emb):
    q = emb.filter(F.col("vec_id") < 5)
    a = [(r.query_id, r.neighbor_id, r.rank) for r in brute_force_topk(q, emb).orderBy("query_id", "rank").collect()]
    b = [(r.query_id, r.neighbor_id, r.rank) for r in brute_force_topk(q, emb).orderBy("query_id", "rank").collect()]
    assert a == b and len(a) == 25
    assert all(n != qid for qid, n, _ in a), "self must be excluded"


def test_lsh_finds_exact_duplicate_vectors(spark, emb):
    """A duplicated vector lands in the same bucket and ranks #1."""
    dup = emb.filter(F.col("vec_id") < 3).select(
        (F.col("vec_id") + 9000).alias("vec_id"), "embedding", "label"
    )
    corpus = emb.unionByName(dup)
    got = lsh_bucketed_topk(emb.filter(F.col("vec_id") < 3), corpus, k=3)
    top1 = {r.query_id: r.neighbor_id for r in got.filter(F.col("rank") == 1).collect()}
    for i in range(3):
        assert top1[i] == i + 9000, f"dup of {i} not found as top-1: {top1}"


def test_lsh_is_subset_of_bucketmates_and_recall_measured(emb):
    """LSH results agree with brute force within the probed bucket; report
    overall recall@5 (approximate method — recall < 1 is expected)."""
    q = emb.filter(F.col("vec_id") < 10)
    exact = {(r.query_id, r.neighbor_id) for r in brute_force_topk(q, emb).collect()}
    approx = {(r.query_id, r.neighbor_id) for r in lsh_bucketed_topk(q, emb, n_planes=2).collect()}
    recall = len(exact & approx) / len(exact)
    assert recall >= 0.3, f"recall@5 {recall:.2f} suspiciously low even for 2 planes"


def test_centroids(emb):
    rows = centroids(emb).collect()
    labels = {r.label for r in rows}
    assert labels == {r.label for r in emb.select("label").distinct().collect()}
    for r in rows:
        assert len(r.centroid) == 64
    # centroid of a single duplicated vector == the vector itself
    import numpy as np

    one = emb.filter(F.col("vec_id") == 7).withColumn("label", F.lit(999))
    c = centroids(one).filter(F.col("label") == 999).first()
    v = emb.filter(F.col("vec_id") == 7).first().embedding
    assert np.allclose(np.array(c.centroid), np.array(v, dtype=float), atol=1e-6)
