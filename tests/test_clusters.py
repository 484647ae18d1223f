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
    from cola_spark.operators.clusters import connected_components_star

    assert connected_components_star(df).count() == 0


def _star(spark, pairs, **kw):
    from cola_spark.operators.clusters import connected_components_star

    df = spark.createDataFrame(pairs, "doc_a long, doc_b long")
    return {r.doc_id: r.cluster_id for r in connected_components_star(df, **kw).collect()}


def test_star_matches_minlabel_on_clique_graphs(spark):
    """Same fixpoint as min-label on the clique-and-bridge graphs dedup
    actually produces (plus duplicate/reversed edges and self-loops)."""
    pairs = [
        (1, 2), (2, 3), (1, 3), (10, 11),          # cliques
        (20, 21), (21, 22), (3, 20),               # bridge merges
        (2, 1), (7, 7), (40, 41), (41, 40),        # reversed / self / dup
    ]
    assert _star(spark, pairs) == _cc(spark, pairs) | {7: 7}
    # NB: star returns the self-loop node 7 as its own singleton cluster;
    # min-label drops self-loops from the edge set before labeling


def test_star_long_path_converges_in_log_rounds(spark):
    """The large-star/small-star selling point: a 10^4-node path graph
    has diameter 10^4 (min-label would need 10^4 shuffle rounds and is
    capped at 50) — star must collapse it to cluster 0 within O(log n)
    rounds. max_iter=16 IS the assertion: 2^16 >> 10^4, while a
    per-round-halving-only scheme would fail at this cap."""
    n = 10_000
    path = [(i, i + 1) for i in range(n - 1)]
    got = _star(spark, path, max_iter=16)
    assert len(got) == n
    assert set(got.values()) == {0}


def test_star_keep_set_variant(spark):
    df = spark.createDataFrame([(5, 9), (9, 7), (30, 40)], "doc_a long, doc_b long")
    rows = {r.doc_id: (r.cluster_id, r.keep)
            for r in dedup_keep_set(df, algorithm="star").collect()}
    assert rows == {
        5: (5, True), 9: (5, False), 7: (5, False),
        30: (30, True), 40: (30, False),
    }
    with pytest.raises(ValueError):
        dedup_keep_set(df, algorithm="bogus").collect()


def test_iteration_checkpoints_are_released(spark):
    """ADVICE r2: every CC round localCheckpoints a fresh labels/edges
    frame; superseded rounds' storage must be freed eagerly, not pile up
    until session GC. After a multi-round run, at most the final frame's
    blocks (plus whatever the caller still holds) may remain."""
    from cola_spark.operators.clusters import connected_components_star

    sc = spark.sparkContext
    def n_stored():
        return len([i for i in sc._jsc.sc().getRDDStorageInfo()])

    base = n_stored()
    chain = spark.createDataFrame([(i, i + 1) for i in range(30)], "doc_a long, doc_b long")
    connected_components(chain).collect()          # ~30 min-label rounds
    assert n_stored() <= base + 2   # final labels frame only (+slack)
    connected_components_star(chain).collect()
    assert n_stored() <= base + 4   # final edges frame only (+slack)
