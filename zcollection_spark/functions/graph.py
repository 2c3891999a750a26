"""Distributed connected components (HashMin label propagation).

The missing last step of every near-dup pipeline: pair lists
(minhash/jaccard/simhash output) are not deliverable — training-data
dedup needs *clusters* with one canonical representative per cluster.

Spark-first shape: symmetrize the edge list, give every node its own id
as the starting label, then iterate "label = min(label, min(neighbor
labels))" until a fixpoint.  Each round is one equi-join + one groupBy
(two shuffles on node id); rounds needed = graph diameter, and near-dup
graphs are unions of tiny dense cliques, so 2-3 rounds converge.
``localCheckpoint`` cuts the lineage each round — without it the plan
doubles per iteration and the job dies of planning overhead long before
data size matters.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, src: str, dst: str, *,
                         max_iterations: int = 25) -> DataFrame:
    """Return ``(node, component)`` where ``component`` is the minimum
    node id in the node's connected component.

    Nodes are whatever appears in ``edges``; isolated nodes (no edges)
    are the caller's to append if wanted.  Raises if the fixpoint is not
    reached within ``max_iterations`` (diameter bound).
    """
    e = edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
    sym = e.unionByName(
        e.select(F.col("b").alias("a"), F.col("a").alias("b"))).distinct()
    sym = sym.localCheckpoint()
    labels = (sym.select(F.col("a").alias("node")).distinct()
              .withColumn("component", F.col("node"))
              .localCheckpoint())
    for _ in range(max_iterations):
        nbr_min = (sym.join(labels, sym.b == labels.node)
                   .groupBy("a").agg(F.min("component").alias("nbr")))
        updated = (labels.join(nbr_min, labels.node == nbr_min.a, "left")
                   .select(F.col("node"),
                           F.least(F.col("component"),
                                   F.coalesce(F.col("nbr"),
                                              F.col("component")))
                           .alias("component"))
                   .localCheckpoint())
        changed = (updated.alias("u")
                   .join(labels.alias("l"), F.col("u.node") == F.col("l.node"))
                   .where(F.col("u.component") != F.col("l.component"))
                   .count())
        labels = updated
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iterations} rounds")


def dedup_clusters(pairs: DataFrame, id_a: str, id_b: str) -> DataFrame:
    """Near-dup pairs → ``(doc_id, cluster_id)`` with ``cluster_id`` the
    minimum doc id of the cluster (the canonical survivor)."""
    cc = connected_components(pairs, id_a, id_b)
    return cc.select(F.col("node").alias("doc_id"),
                     F.col("component").alias("cluster_id"))
