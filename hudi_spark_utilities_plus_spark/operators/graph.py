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
    def _truncate(df: DataFrame) -> DataFrame:
        """Materialize AND cut lineage — mandatory for the iterative
        loop, not an optimization: round k's plan embeds round k-1's
        plan TWICE (labels feeds both the neighbor aggregation and the
        join), so under ``persist()`` — which caches data but keeps the
        logical plan — the tree doubles every round on top of the
        (already large) upstream pair-mining plan; merely NAMING the
        cached relation (CachedRDDBuilder.cachedName -> treeString)
        OOMed the driver heap in a loaded session. See
        operators/materialize.py."""
        from .materialize import materialize

        return materialize(df)

    ud = _truncate(
        edges.select(F.col(src).alias("a"), F.col(dst).alias("b"))
        .union(edges.select(F.col(dst).alias("a"), F.col(src).alias("b")))
        .distinct()
    )
    labels = _truncate(
        ud.select(F.col("a").alias("node")).distinct()
        .withColumn("comp", F.col("node"))
    )
    for _ in range(max_iter):
        neigh = (
            ud.join(labels, ud["b"] == labels["node"])
            .groupBy(F.col("a").alias("node2"))
            .agg(F.min("comp").alias("nmin"))
        )
        new_labels = _truncate(
            labels.join(neigh, labels["node"] == neigh["node2"], "left")
            .select(
                "node",
                F.least(
                    F.col("comp"), F.coalesce(F.col("nmin"), F.col("comp"))
                ).alias("comp"),
                (F.col("nmin") < F.col("comp")).alias("_changed"),
            )
        )
        changed = new_labels.filter(F.col("_changed")).count()  # scalar
        labels = new_labels.drop("_changed")
        if changed == 0:
            return labels
    raise RuntimeError(
        f"connected_components did not converge in {max_iter} rounds "
        "(graph diameter exceeds the bound — raise max_iter or use a "
        "star-contraction variant)"
    )


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
