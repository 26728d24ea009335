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


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
) -> DataFrame:
    """Total triangle count of the undirected simple graph given as an
    edge list (duplicates/self-loops/direction ignored). Returns ONE
    row (n_vertices, n_edges, n_triangles).

    Degree-ordered orientation (the classic MapReduce triangle
    algorithm, Suri & Vassilvitskii WWW'11): orient every edge from
    the lower-(degree, id) endpoint to the higher one, then join each
    oriented wedge (u→v, u→w) against the oriented edge (v→w). Every
    triangle is counted exactly once, and the wedge fan-out per vertex
    is its OUT-degree, which orientation bounds by O(sqrt(m)) on any
    graph (a vertex of out-degree d has d neighbors of degree ≥ its
    own) — so the wedge set is O(m^1.5) worst-case instead of the
    Σ deg² blow-up a hub vertex causes in the unoriented form. Two
    shuffles: wedge groupBy-join on u, closing equi-join on (v, w).
    """
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    deg = (
        und.select(F.col("a").alias("v"))
        .unionByName(und.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("deg"))
    )
    ranked = (
        und.join(deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
    )
    a_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    oriented = ranked.select(
        F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
        F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
    ).persist()
    wedges = (
        oriented.alias("e1")
        .join(oriented.alias("e2"), F.col("e1.u") == F.col("e2.u"))
        .where(F.col("e1.w") < F.col("e2.w"))
        .select(F.col("e1.w").alias("x"), F.col("e2.w").alias("y"))
    )
    closing = oriented.select(
        F.least("u", "w").alias("x"), F.greatest("u", "w").alias("y")
    )
    tri = wedges.join(closing, ["x", "y"]).agg(
        F.count(F.lit(1)).alias("n_triangles")
    )
    counts = und.agg(
        F.count(F.lit(1)).alias("n_edges")
    ).crossJoin(deg.agg(F.count(F.lit(1)).alias("n_vertices")))
    return counts.crossJoin(tri).select("n_vertices", "n_edges", "n_triangles")
