"""Near-duplicate cluster assignment: pairs → connected components →
keep-one-per-cluster.

A dedup pipeline's deliverable is not the pair list but the KEEP SET:
group transitively-linked near-dups into clusters and keep one
representative per cluster. No reference analogue (cola dedups on URL
identity only); this is the step a 100 TB training-data pipeline runs
after minhash/simhash/prefix-join pair generation.

Spark-first: iterative min-label propagation (the Pregel/Hash-to-Min
shape) — each round every node adopts the minimum label among itself
and its neighbors; fixpoint in O(diameter) rounds, detected with a
per-round changed-count (a scalar driver action on an aggregated
frame, not a collect of rows). Near-dup graphs are unions of small
dense cliques, so diameters are tiny (2-3 rounds typical); each round
is one shuffle join by node id. For adversarial long-chain graphs the
large-star/small-star variant halves path lengths per round — noted in
the docstring, not needed for clique-shaped dedup graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
    max_iter: int = 50,
) -> DataFrame:
    """(doc_id, cluster_id): connected components over an undirected
    pair list; cluster_id = the minimum doc_id reachable from doc_id
    (so the representative is the smallest member). Only nodes that
    appear in ``pairs`` are returned — singletons are trivially their
    own cluster and joining them in is the caller's (cheap) business.

    Each iteration: labels ⋈ edges (shuffle by node id) → per-node min
    of neighbor labels → combine with own label; stop when no label
    changed (count on an aggregated scalar). max_iter bounds graph
    diameter; dedup graphs (cliques + short bridges) converge in 2-4.
    """
    edges = (
        pairs.select(F.col(a_col).alias("src"), F.col(b_col).alias("dst"))
        .unionByName(pairs.select(F.col(b_col).alias("src"), F.col(a_col).alias("dst")))
        .distinct()
        .persist()
    )
    try:
        # localCheckpoint (not persist) each round: an iterative plan that
        # only caches still GROWS its logical plan every round, and
        # analysis/optimization cost compounds until the driver chokes —
        # lineage must be CUT. (Production note: prefer reliable
        # checkpoint(dir) when executors can be lost mid-algorithm.)
        labels = (
            edges.select(F.col("src").alias("doc_id")).distinct()
            .withColumn("cluster_id", F.col("doc_id"))
            .localCheckpoint()
        )
        for _ in range(max_iter):
            neighbor_min = (
                edges.join(labels, edges.src == labels.doc_id)
                .groupBy(F.col("dst").alias("doc_id"))
                .agg(F.min("cluster_id").alias("nbr_min"))
            )
            new_labels = (
                labels.join(neighbor_min, "doc_id", "left")
                .select(
                    "doc_id",
                    F.least(
                        F.col("cluster_id"), F.coalesce(F.col("nbr_min"), F.col("cluster_id"))
                    ).alias("cluster_id"),
                )
                .localCheckpoint()
            )
            changed = (
                new_labels.join(labels.withColumnRenamed("cluster_id", "old"), "doc_id")
                .filter(F.col("cluster_id") != F.col("old"))
                .count()
            )
            labels = new_labels
            if changed == 0:
                break
        return labels
    finally:
        edges.unpersist()


def dedup_keep_set(
    pairs: DataFrame, a_col: str = "doc_a", b_col: str = "doc_b",
) -> DataFrame:
    """(doc_id, cluster_id, keep): cluster assignment plus the keep
    flag — keep=true iff the doc is its cluster's representative (the
    minimum id). Every non-kept row is a drop candidate; downstream
    `docs.join(keep_set.filter(~keep), 'doc_id', 'left_anti')` removes
    the near-duplicates while retaining one exemplar per cluster."""
    cc = connected_components(pairs, a_col, b_col)
    return cc.select(
        "doc_id", "cluster_id", (F.col("doc_id") == F.col("cluster_id")).alias("keep")
    )
