"""Connected components over near-dup pair edges → dedup CLUSTERS.

LSH/jaccard emit PAIRS; a dedup policy needs groups ("keep one doc per
component"). This is large-star/small-star-style label propagation done
with joins: every node repeatedly adopts the minimum label in its
neighborhood until fixpoint. Each iteration is two shuffles (edge⋈label,
groupBy min); iteration count is O(log(diameter)) in practice for the
short chains near-dup graphs produce. State between iterations is a
DataFrame (not driver-side), so components of any size fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(edges: DataFrame, max_iter: int = 10) -> DataFrame:
    """edges(ida, idb) undirected → (id, component) with component = min id
    reachable. Nodes not in any edge are absent (callers union isolated
    nodes back if needed)."""
    sym = (
        edges.select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
        .union(edges.select(F.col("idb").alias("src"), F.col("ida").alias("dst")))
        .distinct()
        .cache()  # re-joined every iteration
    )
    # self-loop keeps a node's own label in the min
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    for _ in range(max_iter):
        # neighbor labels: for each dst, the labels of all its srcs
        neigh = (
            sym.join(labels, sym.src == labels.id)
            .select(F.col("dst").alias("id"), "component")
        )
        # localCheckpoint: iterative algorithms MUST truncate lineage —
        # otherwise every fixpoint check recomputes the whole history and
        # iteration k costs O(k) plans (exponential wall-clock in practice)
        new_labels = (
            neigh.union(labels)
            .groupBy("id")
            .agg(F.min("component").alias("component"))
            .localCheckpoint()
        )
        changed = (
            new_labels.alias("n")
            .join(labels.alias("o"), "id")
            .filter(F.col("n.component") != F.col("o.component"))
            .limit(1)
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    sym.unpersist()
    return labels


def dedup_survivors_from_pairs(all_ids: DataFrame, pairs: DataFrame) -> DataFrame:
    """Dedup policy: keep the min-id doc of every near-dup component plus
    all docs with no near-dup edge. all_ids must have column 'id'."""
    comp = connected_components(pairs)
    keepers = comp.groupBy("component").agg(F.min("id").alias("id")).select("id")
    isolated = all_ids.join(comp.select("id"), "id", "left_anti")
    return keepers.union(isolated)
