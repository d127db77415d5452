"""Connected components — the clustering step after near-dup pair
mining.

Pair miners (MinHash LSH, SimHash, embedding similar-pairs) emit EDGES;
an actual dedup pipeline needs the duplicate CLUSTERS those edges imply,
with one canonical representative per cluster (min doc id here). That
grouping is connected components on the similarity graph.

100 TB design: hash-min label propagation, fully expressed as DataFrame
joins/aggregations — each round propagates the smallest label seen to
every neighbor (one hash-shuffle groupBy per round) and converges in
O(graph diameter) rounds. Near-dup graphs are dense little cliques with
tiny diameters (2-4), so the round count is small and data-independent
of corpus size; per-round cost is O(|E|). The driver-side loop only
checks a per-round convergence COUNT (a scalar), never data. (For
adversarial high-diameter graphs the alternating large-star/small-star
algorithm [Kiveris et al., "Connected Components in MapReduce and
Beyond"] drops rounds to O(log n); near-dup clustering does not need
it.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 30,
) -> DataFrame:
    """(node, component) for every node appearing in ``edges``;
    ``component`` is the smallest node id reachable from the node.

    Raises after ``max_iter`` non-converged rounds rather than returning
    a silently-partial labeling.
    """
    ud = (
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
        .persist()
    )
    ud.count()  # eager: every round re-reads the edge list
    labels = (
        ud.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
        .persist()
    )
    labels.count()
    try:
        for _ in range(max_iter):
            neigh = (
                ud.join(labels, ud["b"] == labels["node"])
                .groupBy(F.col("a").alias("node2"))
                .agg(F.min("comp").alias("nmin"))
            )
            new_labels = (
                labels.join(neigh, labels["node"] == neigh["node2"], "left")
                .select(
                    "node",
                    F.least(
                        F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                    ).alias("comp"),
                    (F.col("nmin") < F.col("comp")).alias("_changed"),
                )
                .persist()
            )
            changed = new_labels.filter(F.col("_changed")).count()  # scalar
            old = labels
            labels = new_labels.drop("_changed").persist()
            labels.count()
            new_labels.unpersist()
            old.unpersist()
            if changed == 0:
                # the converged labels stay persisted: the returned
                # DataFrame is lazy and every downstream action re-reads
                # it, so ownership transfers to the caller (unpersist
                # after materializing if the session is long-lived)
                return labels
        labels.unpersist()  # raise path: nothing downstream will read it
        raise RuntimeError(
            f"connected_components did not converge in {max_iter} rounds "
            "(graph diameter exceeds the bound — raise max_iter or use a "
            "star-contraction variant)"
        )
    finally:
        ud.unpersist()


def canonical_assignment(
    all_ids: DataFrame,
    edges: DataFrame,
    id_col: str,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """(id, canonical_id) for EVERY row of ``all_ids`` — nodes outside
    any edge are their own canonical (singleton clusters). This is the
    dedup assignment table a pipeline joins against to keep one
    representative per duplicate cluster."""
    comp = connected_components(edges, src=src, dst=dst)
    return (
        all_ids.select(id_col)
        .join(comp, all_ids[id_col] == comp["node"], "left")
        .select(
            id_col,
            F.coalesce(F.col("comp"), F.col(id_col)).alias("canonical_id"),
        )
    )
