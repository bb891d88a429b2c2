"""Connected components over near-dup pair edges → dedup CLUSTERS.

LSH/jaccard emit PAIRS; a dedup policy needs groups ("keep one doc per
component"). This is one-hop min-label propagation done with joins: every
node repeatedly adopts the minimum label in its neighborhood until
fixpoint. Each iteration is two shuffles (edge⋈label, groupBy min);
convergence takes O(diameter) rounds — near-dup graphs have short chains,
so the cap is generous, and hitting it RAISES rather than returning
silently-split components. For long-chain graphs use
``connected_components_star`` below: the alternating large-star/
small-star contraction converges in O(log n) rounds (differentially
tested against this one and a union-find ground truth). State between
iterations is a DataFrame (not driver-side), so components of any size
fit.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from wordcount_spark.operators.caching import bounded_cache


def connected_components(edges: DataFrame, max_iter: int = 50) -> DataFrame:
    """edges(ida, idb) undirected → (id, component) with component = min id
    reachable. Nodes not in any edge are absent (callers union isolated
    nodes back if needed). Raises RuntimeError if the label propagation
    has not reached fixpoint within max_iter rounds — an unconverged
    result would silently split components and let duplicates survive."""
    sym = (
        edges.select(F.col("ida").alias("src"), F.col("idb").alias("dst"))
        .union(edges.select(F.col("idb").alias("src"), F.col("ida").alias("dst")))
        .distinct()
        .transform(bounded_cache)  # re-joined every iteration
    )
    # self-loop keeps a node's own label in the min
    labels = (
        sym.select(F.col("src").alias("id"))
        .distinct()
        .withColumn("component", F.col("id"))
        .localCheckpoint()
    )
    converged = False
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
            converged = True
            break
    sym.unpersist()
    if not converged:
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(component diameter exceeds the cap; raise max_iter or use a "
            "pointer-doubling formulation)"
        )
    return labels


def dedup_survivors_from_pairs(all_ids: DataFrame, pairs: DataFrame) -> DataFrame:
    """Dedup policy: keep the min-id doc of every near-dup component plus
    all docs with no near-dup edge. all_ids must have column 'id'."""
    comp = connected_components(pairs)
    keepers = comp.groupBy("component").agg(F.min("id").alias("id")).select("id")
    isolated = all_ids.join(comp.select("id"), "id", "left_anti")
    return keepers.union(isolated)


def _min_neighbor(sym: DataFrame) -> DataFrame:
    """(src, dst) symmetric edges → (src, m) with m = min(Γ(src) ∪ {src})."""
    return (
        sym.groupBy("src")
        .agg(F.min("dst").alias("mn"))
        .select("src", F.least("mn", "src").alias("m"))
    )


def connected_components_star(
    edges: DataFrame, max_rounds: int = 20
) -> DataFrame:
    """Connected components by alternating large-star / small-star rounds
    (Kiveris et al., "Connected Components in MapReduce and Beyond") —
    converges in O(log n) rounds instead of the one-hop propagation's
    O(diameter), which is the difference that matters on long-chain
    graphs at cluster scale.

    large-star: every node's LARGER neighbors re-attach to the minimum of
    its neighborhood (incl. itself); small-star: the smaller-or-equal
    neighbors do. Both strictly reduce the potential function, and at
    fixpoint the edge set is a star forest: every node points at its
    component's minimum id. Each round is one neighborhood-min aggregation
    + one join — same shuffle shape as the one-hop variant, exponentially
    fewer rounds. Raises if the cap is hit without convergence.

    Returns (id, component), nodes not in any edge absent — same contract
    as connected_components, which the differential test holds it to."""
    both = edges.select(F.col("ida").alias("src"), F.col("idb").alias("dst")).union(
        edges.select(F.col("idb").alias("src"), F.col("ida").alias("dst"))
    )
    # node set BEFORE dropping self-loops: a node whose only edge is a
    # self-loop is still a (singleton) component — same contract as
    # connected_components
    nodes = both.select(F.col("src").alias("id")).distinct().localCheckpoint()
    sym = (
        both.filter(F.col("src") != F.col("dst"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    cur = sym
    cur_count = cur.count()
    if cur_count == 0:
        # self-loop-only / empty input: every node is its own component
        return nodes.select("id", F.col("id").alias("component"))
    for _ in range(max_rounds):
        # fixpoint = unchanged across the FULL L+S round: a set can be
        # small-star-stable yet still move under large-star, so comparing
        # the two half-round outputs is not a certificate
        start, start_count = cur, cur_count
        # large-star: (v, m) for v ∈ Γ(u), v > u, m = min(Γ(u) ∪ {u})
        mn = _min_neighbor(cur)
        large = (
            cur.join(mn, "src")
            .where(F.col("dst") > F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        cur = (
            large.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(large.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # small-star: (v, m) for v ∈ Γ(u), v < u, plus (u, m)
        mn = _min_neighbor(cur)
        small = (
            cur.join(mn, "src")
            .where(F.col("dst") < F.col("src"))
            .select(F.col("dst").alias("a"), F.col("m").alias("b"))
            .union(mn.select(F.col("src").alias("a"), F.col("m").alias("b")))
            .where(F.col("a") != F.col("b"))
            .distinct()
        )
        new = (
            small.select(F.col("a").alias("src"), F.col("b").alias("dst"))
            .union(small.select(F.col("b").alias("src"), F.col("a").alias("dst")))
            .distinct()
            .localCheckpoint(eager=True)
        )
        # set equality via count + one anti-join probe (equal counts plus
        # new ⊆ start ⇒ equal sets; counts alone can miss swaps). The
        # start count is carried from the previous round — one count job
        # per round, not two
        new_count = new.count()
        same = (
            new_count == start_count
            and new.join(start, ["src", "dst"], "left_anti").limit(1).count()
            == 0
        )
        cur, cur_count = new, new_count
        if same:
            break
    else:
        raise RuntimeError(
            f"star contraction did not converge in {max_rounds} rounds"
        )
    # fixpoint edge set is a star forest: every non-root points at its
    # root; roots (component minima) have no outgoing smaller edge
    roots = cur.groupBy("src").agg(F.min("dst").alias("component"))
    labels = nodes.join(roots, nodes.id == roots.src, "left").select(
        "id",
        F.when(
            F.col("component").isNull() | (F.col("component") > F.col("id")),
            F.col("id"),
        )
        .otherwise(F.col("component"))
        .alias("component"),
    )
    return labels
