"""Connected-components cluster assignment for dedup keep-sets."""

import pytest
from pyspark.sql import functions as F

from cola_spark.operators.clusters import connected_components, dedup_keep_set


def _cc(spark, pairs):
    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r.doc_id: r.cluster_id for r in connected_components(df).collect()}


def test_two_disjoint_cliques(spark):
    got = _cc(spark, [(1, 2), (2, 3), (1, 3), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 10: 10, 11: 10}


def test_long_chain_converges(spark):
    """Adversarial diameter: a 12-node path must still collapse to the
    minimum label (exercises the iteration loop, not just one round)."""
    chain = [(i, i + 1) for i in range(12)]
    got = _cc(spark, chain)
    assert set(got.values()) == {0} and len(got) == 13


def test_bridged_clusters_merge(spark):
    """Two cliques joined by one bridge edge are ONE cluster —
    transitivity is the whole point vs the raw pair list."""
    pairs = [(1, 2), (2, 3), (20, 21), (21, 22), (3, 20)]
    got = _cc(spark, pairs)
    assert set(got.values()) == {1}


def test_keep_set_semantics(spark):
    df = spark.createDataFrame([(5, 9), (9, 7), (30, 40)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep) for r in dedup_keep_set(df).collect()}
    assert rows == {
        5: (5, True), 9: (5, False), 7: (5, False),
        30: (30, True), 40: (30, False),
    }
    # exactly one keeper per cluster
    keepers = [d for d, (c, k) in rows.items() if k]
    assert sorted(keepers) == [5, 30]


def test_image_dedup_clusters_query(spark):
    """The image-side keep-set: every pHash near-dup pair must land in
    one cluster, representatives are cluster minima, and exactly one
    keeper exists per cluster."""
    from cola_spark.operators.multimodal import image_features, phash_near_dup_pairs
    from cola_spark.queries import PAIRS
    from cola_spark.sources import gen_images

    rows = PAIRS["image_dedup_clusters"][0](spark, "/root/testdata/sf0.001").collect()
    cluster = {r.image_id: r.cluster_id for r in rows}
    for r in rows:
        assert r.cluster_id <= r.image_id
        assert r.keep == (r.image_id == r.cluster_id)
    by_cluster = {}
    for r in rows:
        by_cluster.setdefault(r.cluster_id, []).append(r)
    for cid, members in by_cluster.items():
        assert sum(m.keep for m in members) == 1
        assert min(m.image_id for m in members) == cid
    pairs = phash_near_dup_pairs(
        image_features(gen_images(spark, 64)), max_hamming=16
    ).collect()
    assert pairs, "fixture should produce near-dup image pairs"
    for p in pairs:
        assert cluster[p.img_a] == cluster[p.img_b]


def test_empty_pairs(spark):
    df = spark.createDataFrame([], "doc_a long, doc_b long")
    assert connected_components(df).count() == 0
