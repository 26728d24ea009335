"""Connected components over an edge list — the clustering step of a
near-duplicate pipeline (pairs → clusters → one canonical doc per
cluster).

The reference has no graph operator; this exists because its users'
dedup workflows end in "keep one per duplicate group", and a pair list
alone doesn't give that (A~B, B~C must collapse to one group even when
A~C was never emitted).

Algorithm: min-label propagation to a fixpoint. Each vertex starts as
its own label; every iteration each vertex takes the min of its label
and its neighbors' labels. Near-dup graphs are unions of tiny
quasi-cliques, so the diameter — and the iteration count — is small;
`max_iter` bounds pathological chains. Per iteration: ONE shuffle
(groupBy vertex over the undirected edge list joined to current
labels) and one driver-side convergence action — the standard
distributed-CC loop shape (GraphFrames/Pregel do the same), NOT a
driver-side graph walk; edges and labels stay distributed throughout.
`localCheckpoint` truncates the growing lineage each round so plan
depth stays constant across iterations.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id reachable — deterministic canonical label.
    """
    und = (
        edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
        .unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
        .distinct()
        .localCheckpoint(eager=True)
    )
    labels = (
        und.select("v").distinct().withColumn("label", F.col("v"))
        .localCheckpoint(eager=True)
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels.withColumnRenamed("v", "n"), "n")
            .groupBy("v")
            .agg(F.min("label").alias("nbr_min"))
        )
        new_labels = (
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                F.least(F.col("label"), F.coalesce("nbr_min", F.col("label"))).alias("label"),
            )
            .localCheckpoint(eager=True)
        )
        changed = (
            new_labels.alias("a")
            .join(labels.alias("b"), "v")
            .where(F.col("a.label") != F.col("b.label"))
            .count()
        )
        labels = new_labels
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))
