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

import json

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def _lineage_reset(df: DataFrame, checkpoint_dir: "str | None") -> DataFrame:
    """Truncate lineage. Default = ``localCheckpoint`` (eager,
    executor-local blocks — the fast choice on local[*] and for short
    jobs, but blocks DIE WITH THEIR EXECUTOR: on a real cluster a lost
    executor kills a long-horizon run unrecoverably mid-iteration).
    With ``checkpoint_dir`` set, a RELIABLE ``checkpoint`` writes the
    blocks to that (HDFS/S3) directory instead, surviving executor
    loss — the 1000-executor shape for long iterative runs. Checkpoint
    files are cleaned by Spark's ContextCleaner when
    ``spark.cleaner.referenceTracking.cleanCheckpoints`` is true,
    else they are the caller's to GC."""
    if checkpoint_dir is None:
        return df.localCheckpoint(eager=True)
    sc = df.sparkSession.sparkContext
    sc.setCheckpointDir(checkpoint_dir)
    return df.checkpoint(eager=True)


def connected_components(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """(vertex, component) for every vertex appearing in ``edges``;
    component = min vertex id reachable — deterministic canonical label.
    ``checkpoint_dir`` switches the per-iteration lineage reset from
    executor-local blocks to a reliable checkpoint there, so executor
    loss cannot kill a long run on a real cluster (see _lineage_reset).
    """
    und = _lineage_reset(
        edges.select(F.col(src).alias("v"), F.col(dst).alias("n"))
        .unionByName(edges.select(F.col(dst).alias("v"), F.col(src).alias("n")))
        .distinct(),
        checkpoint_dir,
    )
    labels = _lineage_reset(
        und.select("v").distinct().withColumn("label", F.col("v")),
        checkpoint_dir,
    )
    for _ in range(max_iter):
        neighbor_min = (
            und.join(labels.withColumnRenamed("v", "n"), "n")
            .groupBy("v")
            .agg(F.min("label").alias("nbr_min"))
        )
        # the convergence flag rides the label update itself (r18):
        # least(label, nbr_min) < label ⟺ this vertex changed, so the
        # per-round "did anything move" check is a cheap scan of the
        # just-materialized reset blocks — the prior shape re-JOINED
        # new labels against old labels every round, a second full
        # pass over |V| per iteration at any scale.
        new_lab = F.least(F.col("label"), F.coalesce("nbr_min", F.col("label")))
        new_labels = _lineage_reset(
            labels.join(neighbor_min, "v", "left")
            .select(
                "v",
                new_lab.alias("label"),
                (new_lab < F.col("label")).alias("__chg"),
            ),
            checkpoint_dir,
        )
        changed = new_labels.where(F.col("__chg")).count()
        labels = new_labels.select("v", "label")
        if changed == 0:
            break
    return labels.select(F.col("v").alias("vertex"), F.col("label").alias("component"))


def triangle_count(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    strategy: str = "auto",
    broadcast_edge_limit: int = 10_000_000,
) -> DataFrame:
    """Total triangle count of the undirected simple graph given as an
    edge list (duplicates/self-loops/direction ignored). Returns ONE
    row (n_vertices, n_edges, n_triangles).

    Both strategies start from degree-ordered orientation (Suri &
    Vassilvitskii WWW'11): orient every edge from the lower-(degree,
    id) endpoint to the higher one, so every triangle has exactly one
    vertex with both out-edges and out-degree is bounded by O(sqrt(m))
    on any graph — the hub-vertex Σ deg² blow-up cannot happen.

    - ``broadcast_adj``: edge-iterator — broadcast the oriented
      adjacency lists (total size = m ids) and count each edge's
      triangles as |N+(u) ∩ N+(w)| with codegen ``array_intersect``.
      ZERO wedge shuffle; the Σ outdeg² intersection work happens
      in-memory per partition. Measured 1.9 s vs 8.8 s for the shuffle
      path on the sf0.1 co-purchase graph (1.2M edges, max outdeg 97).
    - ``wedge_shuffle``: materialize oriented wedges (u→v, u→w) and
      equi-join them against the oriented closing edge — O(m^1.5)
      shuffle, no broadcast, the unbounded-scale path for graphs whose
      adjacency (m ids ≈ 8m bytes) cannot ship to every executor.
    - ``auto`` (default): the edge count — needed for the n_edges
      output anyway — picks broadcast_adj when m ≤
      ``broadcast_edge_limit`` (default 10M edges ≈ 80 MB broadcast),
      else wedge_shuffle.
    """
    if strategy not in ("auto", "broadcast_adj", "wedge_shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    # every persisted internal goes on this list and is unpersisted in
    # the finally below — a long-lived session composing graph ops must
    # not accumulate cached edge frames. The ONE row the operator
    # returns is collected inside the guarded region (while the caches
    # are still warm) and re-created as a fresh local DataFrame, so
    # after the call NOTHING of this function remains cached.
    cached: list[DataFrame] = []
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    cached.append(und)
    try:
        m = und.count()  # one action: feeds n_edges AND the strategy pick
        if strategy == "auto":
            strategy = (
                "broadcast_adj" if m <= broadcast_edge_limit else "wedge_shuffle"
            )
        deg = (
            und.select(F.col("a").alias("v"))
            .unionByName(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        cached.append(deg)
        ranked = (
            und.join(
                deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a"
            )
            .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        )
        a_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        oriented = ranked.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        ).persist()
        cached.append(oriented)
        return _triangle_result(und.sparkSession, m, deg, oriented, strategy)
    finally:
        for f in cached:
            f.unpersist()


def _triangle_result(
    spark, m: int, deg: DataFrame, oriented: DataFrame, strategy: str
) -> DataFrame:
    tri = _triangle_agg(oriented, strategy)
    counts = deg.agg(F.count(F.lit(1)).alias("n_vertices")).withColumn(
        "n_edges", F.lit(m).cast("long")
    )
    out = counts.crossJoin(tri).select("n_vertices", "n_edges", "n_triangles")
    # the result is exactly ONE bounded row — collect it while the
    # internal caches are live and hand back a local frame, so the
    # caller's later actions never recompute the (now-unpersisted)
    # edge pipeline and no cached RDD outlives the call
    rows = out.collect()
    return spark.createDataFrame(rows, out.schema)


def _triangle_agg(oriented: DataFrame, strategy: str) -> DataFrame:
    """ONE-row (n_triangles) aggregate over a degree-ordered oriented
    edge list (u, w) — the kernel shared by :func:`triangle_count`
    (which derives the orientation inline) and
    :func:`triangle_count_layout` (which reads it from a persisted
    edge layout)."""
    if strategy == "broadcast_adj":
        adj = oriented.groupBy("u").agg(F.collect_list("w").alias("nbrs"))
        empty = F.array().cast(dict(adj.dtypes)["nbrs"])
        tri = (
            oriented.join(F.broadcast(adj), "u")
            .join(
                F.broadcast(
                    adj.select(
                        F.col("u").alias("w"), F.col("nbrs").alias("nbrs_w")
                    )
                ),
                "w",
                "left",
            )
            .select(
                F.size(
                    F.array_intersect("nbrs", F.coalesce("nbrs_w", empty))
                ).alias("t")
            )
            .agg(
                # sum over zero rows is NULL; the wedge path's count
                # yields 0 — coalesce so the strategies agree on an
                # empty/triangle-free graph
                F.coalesce(F.sum("t"), F.lit(0)).cast("long").alias("n_triangles")
            )
        )
    else:
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
    return tri


def pagerank(
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """PageRank over the UNDIRECTED simple graph of ``edges`` after a
    fixed number of power iterations from the uniform start: (vertex,
    rank). Undirected means every edge contributes mass both ways, so
    there are no dangling vertices (every vertex in the edge list has
    degree ≥ 1) and the iteration is the plain
    ``r' = (1-d)/N + d · Σ_in r/deg``.

    A FIXED iteration count (not convergence-to-epsilon) keeps the
    result deterministic and SQL-expressible — the catalog oracle
    unrolls the same iterations as CTE joins. Per iteration: ONE
    shuffle (the groupBy on the destination vertex); contributions are
    computed by joining current ranks to the out-edge list, which
    reuses the same hash partitioning on the vertex id.

    Lineage control: a short loop stays fully LAZY (one job computes
    the whole nested-join DAG — cheaper than an eager materialization
    per round, measured 13s → ~7s on the sf0.1 co-purchase bench);
    every ``checkpoint_every`` rounds the ranks localCheckpoint so a
    long-horizon run keeps constant plan depth (the
    connected_components pattern above).

    Cache hygiene: the internal (out-edge, out-degree) frames are
    persisted only for the duration of the call — the final ranks are
    materialized ONCE via an eager ``localCheckpoint`` (still fully
    distributed, one block per partition) and every internal cache is
    unpersisted in a ``finally``, so composing graph operators in a
    long-lived session accumulates nothing. The returned frame owns
    its checkpoint blocks (size = one (vertex, rank) row per vertex)
    and is released when the caller drops it.

    ``checkpoint_dir`` switches every lineage reset (the periodic one
    and the final materialization) from executor-local blocks to a
    RELIABLE checkpoint in that directory — executor loss on a real
    cluster then costs a recompute-from-checkpoint, not the job (see
    _lineage_reset).
    """
    cached: list[DataFrame] = []
    try:
        ranks = build_pagerank_plan(
            edges,
            cached,
            src=src,
            dst=dst,
            iterations=iterations,
            damping=damping,
            checkpoint_every=checkpoint_every,
            checkpoint_dir=checkpoint_dir,
        )
        # materialize while the internal caches are warm (one job,
        # linked computed once and read from cache per iteration), then
        # release them — later caller actions read the checkpoint
        # blocks (reliable ones under checkpoint_dir, else local)
        return _lineage_reset(ranks, checkpoint_dir)
    finally:
        for f in cached:
            f.unpersist()


def build_pagerank_plan(
    edges: DataFrame,
    cached: list,
    *,
    src: str = "src",
    dst: str = "dst",
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """The LAZY (vertex, rank) plan behind :func:`pagerank`: every
    frame it persists is appended to ``cached`` and the CALLER owns
    unpersisting them after materializing the result. ``pagerank`` is
    the safe wrapper (eager checkpoint + finally-unpersist); this
    builder exists so plan tests can pin the iteration DAG shape and
    so advanced callers can compose the lazy plan further.

    Runs ONE driver action (the vertex count feeding N)."""
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
    )
    out = (
        und.select(F.col("a").alias("u"), F.col("b").alias("v"))
        .unionByName(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        .persist()
    )
    cached.append(out)
    deg = out.groupBy("u").agg(F.count(F.lit(1)).alias("deg")).persist()
    cached.append(deg)
    # N as ONE bounded driver count (the triangle_count precedent) —
    # a broadcast-1-row-join alternative re-runs the whole edge-build
    # subtree per broadcast materialization, once per iteration
    n = deg.count()
    ranks = deg.select("u", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
    # (out-edge, out-degree) is read every iteration — persist it so
    # the edge-build subtree computes once within the final job
    linked = out.join(deg, "u").persist()
    cached.append(linked)
    return _pagerank_loop(
        linked, ranks, n,
        iterations=iterations, damping=damping,
        checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir,
    )


def _pagerank_loop(
    linked: DataFrame,
    ranks: DataFrame,
    n: int,
    *,
    iterations: int,
    damping: float,
    checkpoint_every: int,
    checkpoint_dir: "str | None",
    broadcast_ranks: bool = False,
) -> DataFrame:
    """The power-iteration DAG shared by :func:`build_pagerank_plan`
    (inline edge build) and :func:`pagerank_layout` (persisted edge
    layout): per round ONE shuffle (the groupBy on the destination
    vertex), periodic lineage resets for long horizons.
    ``broadcast_ranks`` hints each iteration's rank frame as the
    broadcast side — sound ONLY when the caller knows n is small
    (pagerank_layout gates it on the layout marker's vertex count)."""
    for i in range(iterations):
        r = F.broadcast(ranks) if broadcast_ranks else ranks
        contrib = (
            linked.join(r, "u")
            .groupBy(F.col("v").alias("u"))
            .agg(F.sum(F.col("rank") / F.col("deg")).alias("mass"))
        )
        ranks = contrib.select(
            "u",
            (F.lit((1.0 - damping) / n) + damping * F.col("mass")).alias("rank"),
        )
        if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
            ranks = _lineage_reset(ranks, checkpoint_dir)
    return ranks.select(F.col("u").alias("vertex"), "rank")


# =========================================================================
# Persisted edge layout — build the graph's derived frames ONCE, run
# many algorithms from the scan (VERDICT r12 item 2)
# =========================================================================

_LAYOUT_META = "_edge_layout.json"


def write_edge_layout(edges: DataFrame, path: str, *, src: str = "src",
                      dst: str = "dst") -> dict:
    """Materialize the undirected simple graph of ``edges`` as a
    scan-ready parquet layout under ``path`` and return its metadata
    ``{"m": n_edges, "n_vertices": n}``.

    Every graph algorithm over one edge set re-derives the same three
    frames — deduped undirected edges, per-vertex degrees, and the
    degree-ordered orientation — and on a pipeline that runs triangles
    AND PageRank AND a degree profile that derivation (a distinct over
    the raw pair stream plus two degree joins) dominates each query's
    cost. Writing the derived frames once turns every downstream
    algorithm into parquet scans with KNOWN SIZES, which also lets
    Catalyst auto-broadcast the small frames (the degree table) that
    an in-lineage computed frame would sort-merge-join.

    Layout (all parquet):

    - ``{path}/edges``    — (a, b) with a < b, distinct: source of truth
    - ``{path}/deg``      — (v, deg): undirected degree per vertex
    - ``{path}/oriented`` — (u, w) degree-ordered (Suri & Vassilvitskii):
      every edge points from the lower-(deg, id) endpoint, so
      out-degree is O(sqrt(m)) — the triangle kernel's input
    - ``{path}/linked``   — (u, v, deg) BOTH directions with the source
      vertex's degree attached: the power-iteration input
      (PageRank/PPR join ranks straight into this scan — the per-run
      union + degree join disappears)
    - ``{path}/_edge_layout.json`` — written LAST: the publish marker
      carrying m and n_vertices so readers never re-count

    Invalidation is the CALLER's contract (same as the persisted ANN /
    MinHash index operators): the layout is a materialized index over
    an immutable-during-use edge set; rebuild it when the source moves.

    Scale: three shuffles total (distinct, degree agg, orientation
    join), each bounded by the edge count; the writes are distributed
    and the layout is re-read with partition/column pruning — at 100 TB
    the amortization argument only gets stronger (the derivation that
    is ~40%% of each query's cost runs once per graph, not once per
    algorithm).
    """
    from replicadb_spark.fs import TableFS, join as fs_join

    cached: list[DataFrame] = []
    und = (
        edges.select(
            F.least(F.col(src), F.col(dst)).alias("a"),
            F.greatest(F.col(src), F.col(dst)).alias("b"),
        )
        .where(F.col("a") != F.col("b"))
        .distinct()
        .persist()
    )
    cached.append(und)
    try:
        m = und.count()
        und.write.mode("overwrite").parquet(fs_join(path, "edges"))
        deg = (
            und.select(F.col("a").alias("v"))
            .unionByName(und.select(F.col("b").alias("v")))
            .groupBy("v")
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist()
        )
        cached.append(deg)
        n = deg.count()
        deg.write.mode("overwrite").parquet(fs_join(path, "deg"))
        out = und.select(F.col("a").alias("u"), F.col("b").alias("v")).unionByName(
            und.select(F.col("b").alias("u"), F.col("a").alias("v"))
        )
        out.join(deg.withColumnRenamed("v", "u"), "u").select(
            "u", "v", "deg"
        ).write.mode("overwrite").parquet(fs_join(path, "linked"))
        ranked = (
            und.join(
                deg.withColumnRenamed("v", "a").withColumnRenamed("deg", "da"), "a"
            )
            .join(deg.withColumnRenamed("v", "b").withColumnRenamed("deg", "db"), "b")
        )
        a_first = (F.col("da") < F.col("db")) | (
            (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
        )
        ranked.select(
            F.when(a_first, F.col("a")).otherwise(F.col("b")).alias("u"),
            F.when(a_first, F.col("b")).otherwise(F.col("a")).alias("w"),
        ).write.mode("overwrite").parquet(fs_join(path, "oriented"))
        meta = {"m": m, "n_vertices": n}
        TableFS(edges.sparkSession, path).write_text(
            fs_join(path, _LAYOUT_META), json.dumps(meta)
        )
        return meta
    finally:
        for f in cached:
            f.unpersist()


class _EdgeLayout:
    """Mapping view over a persisted edge layout that opens each frame
    on FIRST ACCESS only. ``spark.read.parquet`` is not free — it lists
    the directory and reads a footer for schema discovery — so a query
    that needs only ``oriented`` (triangles) must not pay three extra
    opens for frames it never touches. ``linked`` additionally falls
    back to deriving (u, v, deg) from ``edges``+``deg`` when the subdir
    is absent: layouts written before the linked/ frame existed (their
    publish marker carries no version field) stay readable instead of
    failing with an opaque parquet path error."""

    def __init__(self, spark: SparkSession, path: str, meta: dict):
        self._spark = spark
        self._path = path
        self._frames: dict[str, DataFrame] = {}
        self.m = int(meta["m"])
        self.n_vertices = int(meta["n_vertices"])

    def _open(self, name: str) -> DataFrame:
        from replicadb_spark.fs import join as fs_join

        if name not in self._frames:
            self._frames[name] = self._spark.read.parquet(
                fs_join(self._path, name)
            )
        return self._frames[name]

    def _linked(self) -> DataFrame:
        from replicadb_spark.fs import TableFS, join as fs_join

        if "linked" in self._frames:
            return self._frames["linked"]
        if TableFS(self._spark, self._path).exists(
            fs_join(self._path, "linked")
        ):
            return self._open("linked")
        # pre-linked-frame layout: derive the power-iteration input the
        # way write_edge_layout builds it (both directions + src degree)
        und = self._open("edges")
        deg = self._open("deg")
        out = und.select(
            F.col("a").alias("u"), F.col("b").alias("v")
        ).unionByName(und.select(F.col("b").alias("u"), F.col("a").alias("v")))
        linked = out.join(deg.withColumnRenamed("v", "u"), "u").select(
            "u", "v", "deg"
        )
        self._frames["linked"] = linked
        return linked

    def __getitem__(self, key: str):
        if key == "m":
            return self.m
        if key == "n_vertices":
            return self.n_vertices
        if key == "linked":
            return self._linked()
        if key in ("edges", "deg", "oriented"):
            return self._open(key)
        raise KeyError(key)


# Opened layouts memoized per (session, path) — r18: every consumer
# (pagerank opens the layout twice per call: once for n_vertices, once
# on the clone session for the frames; triangles/degree-profile/PPR
# once each) re-paid the marker read (a py4j FS round trip) plus a
# parquet footer read per frame touched, all for an immutable
# per-process layout. The memoized _EdgeLayout holds lazy plans only
# (the tables()/read_parquet_memo contract: zero rows cached). A
# layout is written ONCE into a fresh tempdir per process
# (write_edge_layout's documented invalidation contract is
# "rebuild = new path"), so entries can never go stale.
_EDGE_LAYOUT_MEMO: "weakref.WeakKeyDictionary | None" = None


def read_edge_layout(spark: SparkSession, path: str) -> _EdgeLayout:
    """Open a :func:`write_edge_layout` layout: per-frame LAZY access
    to ``edges`` / ``deg`` / ``oriented`` / ``linked`` plus the counted
    ``m`` / ``n_vertices`` from the publish marker. Nothing is opened
    until a frame is indexed, so a caller that reads only the marker
    counts (or only one frame) pays exactly that much I/O. Opened
    layouts are memoized per (session, path) — repeat opens are free."""
    import weakref

    from replicadb_spark.fs import TableFS, join as fs_join

    global _EDGE_LAYOUT_MEMO
    if _EDGE_LAYOUT_MEMO is None:
        _EDGE_LAYOUT_MEMO = weakref.WeakKeyDictionary()
    memo = _EDGE_LAYOUT_MEMO.setdefault(spark, {})
    lay = memo.get(path)
    if lay is None:
        meta = json.loads(
            TableFS(spark, path).read_text(fs_join(path, _LAYOUT_META))
        )
        lay = memo[path] = _EdgeLayout(spark, path, meta)
    return lay


def triangle_count_layout(
    spark: SparkSession,
    path: str,
    *,
    strategy: str = "auto",
    broadcast_edge_limit: int = 10_000_000,
) -> DataFrame:
    """:func:`triangle_count` sourced from a persisted edge layout:
    the dedup/degree/orientation stages are parquet scans, m and
    n_vertices come from the layout marker (zero extra actions), and
    only the triangle kernel itself runs. Same ONE-row result."""
    if strategy not in ("auto", "broadcast_adj", "wedge_shuffle"):
        raise ValueError(f"unknown strategy {strategy!r}")
    lay = read_edge_layout(spark, path)
    m, n = lay["m"], lay["n_vertices"]
    if strategy == "auto":
        strategy = "broadcast_adj" if m <= broadcast_edge_limit else "wedge_shuffle"
    out = (
        _triangle_agg(lay["oriented"], strategy)
        .select(
            F.lit(n).cast("long").alias("n_vertices"),
            F.lit(m).cast("long").alias("n_edges"),
            F.col("n_triangles"),
        )
    )
    # one bounded row; the inputs are durable parquet (nothing cached),
    # so the frame can stay lazy — collect-and-localize is not needed
    return out


# One clone per parent session, weakly keyed so a released parent does
# not pin its clone (ADVICE r16: a fresh newSession() per pagerank call
# accumulated SessionStates for the life of a long-running process —
# bench loops, streaming drivers).
_SMALL_GRAPH_SESSIONS: "weakref.WeakKeyDictionary" = None  # type: ignore[assignment]


def _small_graph_session(spark: SparkSession) -> SparkSession:
    """A cloned session (same SparkContext, ISOLATED SQLConf) tuned for
    short fixed-iteration jobs over small rank frames: AQE off. AQE
    materializes every exchange as its own query stage with a
    replanning pause between — right for one big skew-prone shuffle,
    wrong for a 3-iteration chain of tiny ones, where the pauses cost
    ~2x the work (measured at sf0.1: 3.0 s → 1.55 s with AQE off +
    broadcast ranks). A clone keeps the toggle invisible to concurrent
    queries on the main session; the parent's timezone is copied, and
    shuffle partitions are capped at 8 for the small-regime reduce
    sides this clone exists for (see inline comment).

    Memoized per PARENT session (WeakKeyDictionary): repeated calls in
    one process reuse one clone instead of accumulating SessionStates.
    Note the contract this implies for callers: a DataFrame returned
    off the clone stays bound to the clone's SQLConf — anything
    composed on top of it also executes AQE-free. The layout-backed
    rank frames are eagerly reset (parquet-backed) before returning,
    so only the internal iteration chain runs under the clone."""
    global _SMALL_GRAPH_SESSIONS
    import weakref

    if _SMALL_GRAPH_SESSIONS is None:
        _SMALL_GRAPH_SESSIONS = weakref.WeakKeyDictionary()
    sess = _SMALL_GRAPH_SESSIONS.get(spark)
    if sess is not None:
        return sess
    sess = spark.newSession()
    for k in ("spark.sql.session.timeZone",):
        try:
            sess.conf.set(k, spark.conf.get(k))
        except Exception:  # noqa: BLE001 — unset key in a bare session
            pass
    sess.conf.set("spark.sql.adaptive.enabled", "false")
    # Small-regime reduce sizing (r17): the clone only ever runs
    # fixed-iteration loops whose per-round reduce side is ≤ n ≤
    # broadcast_rank_limit rows AFTER map-side combine — ≤1M (key,
    # double) rows per iteration, so 8 reduce tasks keeps each at
    # ≤128K rows while the expensive map side (the linked scan +
    # broadcast join) keeps the input's parallelism, which
    # shuffle.partitions does not govern. With AQE off this is what
    # coalescing would have picked without the per-stage replanning
    # pause; measured at sf0.1: 3-iteration pagerank 1.8 → 1.26 s vs
    # inheriting the parent's 32. Fixed at clone creation, never
    # mutated per call — the memoized clone may be shared.
    parent_parts = int(spark.conf.get("spark.sql.shuffle.partitions", "200"))
    sess.conf.set("spark.sql.shuffle.partitions", str(min(parent_parts, 8)))
    _SMALL_GRAPH_SESSIONS[spark] = sess
    return sess


def pagerank_layout(
    edges_or_spark,
    path: str,
    *,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    checkpoint_dir: "str | None" = None,
    broadcast_rank_limit: int = 1_000_000,
) -> DataFrame:
    """:func:`pagerank` sourced from a persisted edge layout. The
    power-iteration input is the layout's pre-joined ``linked`` scan
    ((u, v, deg) both directions — the union + degree join is part of
    the layout build, not the per-run cost), and N comes from the
    marker — ZERO driver actions before the iteration job. On the
    small-graph path the returned (vertex, rank) frame is fully LAZY
    (r18 — every input is a durable parquet scan, so there is nothing
    to persist and nothing to checkpoint; the caller's action runs the
    whole chain as one job); on the shuffled path it is the
    eagerly-materialized frame with every internal cache released, as
    before.

    When the marker's vertex count is at most ``broadcast_rank_limit``
    the iteration runs on the small-graph fast path: each round's rank
    frame broadcasts into the linked scan and the whole fixed-iteration
    chain executes AQE-free in a cloned session (r16; measured 3.0 →
    1.55 s at sf0.1 — stage-scheduling pauses, not arithmetic,
    dominated). Above the limit (a billion-vertex graph cannot
    broadcast its ranks) the shuffled one-exchange-per-iteration shape
    with AQE runs unchanged.

    The 1M default (ADVICE r16, down from 5M): F.broadcast is an
    unconditional hint rebuilt and shipped EVERY iteration, so the
    limit must size the per-round table, not what fits once — 1M
    (long, double) rows ≈ 16 MB serialized (tens of MB as a JVM hash
    relation), the same order as a generous
    autoBroadcastJoinThreshold and inside the regime the sf0.1
    measurement actually validated; 5M rows would ship hundreds of MB
    per iteration and court driver pressure / broadcastTimeout right
    at the cutoff."""
    spark = (
        edges_or_spark
        if isinstance(edges_or_spark, SparkSession)
        else edges_or_spark.sparkSession
    )
    lay = read_edge_layout(spark, path)
    n = lay["n_vertices"]
    small = n <= broadcast_rank_limit
    if small:
        # Small-graph fast path (r18): fully LAZY. Every input is a
        # durable parquet scan, so nothing needs a persist (the three
        # re-scans of linked are cheaper than one cache write at this
        # size) and nothing needs the eager final checkpoint — the
        # caller's single action runs the whole broadcast chain as ONE
        # job with zero construction-time driver work. Measured at
        # sf0.1 (copurchase graph): eager persist+checkpoint shape
        # 1.4 s of build before the caller's action; lazy shape moves
        # the whole query under the action. Periodic mid-loop resets
        # for long horizons still fire inside _pagerank_loop.
        lay = read_edge_layout(_small_graph_session(spark), path)
        deg = lay["deg"].select(F.col("v").alias("u"), "deg")
        ranks = deg.select("u", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
        return _pagerank_loop(
            lay["linked"], ranks, n,
            iterations=iterations, damping=damping,
            checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir,
            broadcast_ranks=True,
        )
    deg = lay["deg"].select(F.col("v").alias("u"), "deg")
    cached: list[DataFrame] = []
    try:
        linked = lay["linked"].persist()
        cached.append(linked)
        ranks = deg.select("u", (F.lit(1.0) / F.lit(float(n))).alias("rank"))
        result = _pagerank_loop(
            linked, ranks, n,
            iterations=iterations, damping=damping,
            checkpoint_every=checkpoint_every, checkpoint_dir=checkpoint_dir,
            broadcast_ranks=False,
        )
        return _lineage_reset(result, checkpoint_dir)
    finally:
        for f in cached:
            f.unpersist()


def personalized_pagerank_layout(
    spark: SparkSession,
    path: str,
    seeds: "list",
    *,
    iterations: int = 3,
    damping: float = 0.85,
    checkpoint_every: int = 5,
    checkpoint_dir: "str | None" = None,
    broadcast_rank_limit: int = 1_000_000,
) -> DataFrame:
    """Personalized PageRank from a persisted edge layout: the restart
    mass returns to the SEED vertices instead of everywhere, so the
    stationary scores measure proximity to the seed set — the "related
    items to THESE items" / seed-expansion primitive (recommendation
    candidates, taxonomy neighbors, seed-set community discovery),
    where global PageRank measures overall centrality.

    Iteration (undirected graph, no dangling mass):
    ``r' = (1−d)·e + d·Σ_in r/deg`` with ``e`` uniform over
    ``seeds ∩ V`` (absent seed ids are ignored; the restart mass is
    1/|seeds ∩ V| over the survivors — one bounded count action).
    Vertices that have received no mass yet simply do not appear in
    the rank frame — mathematically exact, since a zero rank
    contributes nothing; read missing as 0.

    Plan: per iteration the propagated mass rows UNION the (tiny,
    |seeds|-row) restart rows BEFORE the destination groupBy, so each
    round still costs exactly ONE shuffle — the restart fold rides the
    aggregate that plain PageRank already pays. Same fixed-iteration
    determinism contract (the catalog oracle unrolls the identical
    rounds as CTEs), same lineage-reset cadence, same small-graph fast
    path as :func:`pagerank_layout` (rank frames ≤ n_vertices rows
    broadcast; the chain runs AQE-free in a cloned session).
    """
    lay = read_edge_layout(spark, path)
    small = lay["n_vertices"] <= broadcast_rank_limit
    if small:
        lay = read_edge_layout(_small_graph_session(spark), path)
    deg = lay["deg"].select(F.col("v").alias("u"), "deg")
    cached: list[DataFrame] = []
    try:
        seedf = deg.select("u").where(F.col("u").isin(list(seeds)))
        if not small:
            seedf = seedf.persist()
            cached.append(seedf)
        # the seed-survivor count is a REQUIRED bounded driver action
        # (the restart mass is 1/|seeds ∩ V|) on both paths
        s = seedf.count()
        if s == 0:
            raise ValueError(
                "personalized_pagerank_layout: no seed id exists in the "
                "graph — restart mass would be undefined"
            )
        linked = lay["linked"]
        if not small:
            linked = linked.persist()  # pre-joined (u, v, deg) scan
            cached.append(linked)
        restart = seedf.select(
            "u", F.lit((1.0 - damping) / s).alias("m")
        )
        ranks = seedf.select("u", (F.lit(1.0) / F.lit(float(s))).alias("rank"))
        for i in range(iterations):
            r = F.broadcast(ranks) if small else ranks
            moved = linked.join(r, "u").select(
                F.col("v").alias("u"),
                (F.lit(damping) * F.col("rank") / F.col("deg")).alias("m"),
            )
            ranks = (
                moved.unionByName(restart)
                .groupBy("u")
                .agg(F.sum("m").alias("rank"))
            )
            if (i + 1) % checkpoint_every == 0 and (i + 1) < iterations:
                ranks = _lineage_reset(ranks, checkpoint_dir)
        out = ranks.select(F.col("u").alias("vertex"), "rank")
        # small path (r18): fully lazy, like pagerank_layout — durable
        # parquet inputs, a ≤|seeds|-row re-derived seed frame, nothing
        # worth a cache write or an eager checkpoint
        return out if small else _lineage_reset(out, checkpoint_dir)
    finally:
        for f in cached:
            f.unpersist()


def merge_components(
    labels: "DataFrame | None",
    edges: DataFrame,
    *,
    src: str = "src",
    dst: str = "dst",
    max_iter: int = 20,
    checkpoint_dir: "str | None" = None,
) -> DataFrame:
    """Fold a NEW edge batch into an existing (vertex, component)
    assignment without re-reading historical edges — the incremental
    maintenance step of a dedup clustering pipeline (pairs arrive in
    batches; "keep one per duplicate group" must stay current).

    Star contraction: a prior component is fully described by its
    label edges (vertex — component), because every member reaches the
    canonical min-id vertex in one hop. Running plain
    :func:`connected_components` over ``label_edges ∪ batch_edges``
    therefore yields EXACTLY the labels a from-scratch run over all
    historical + new edges would produce (reachability is preserved by
    contraction; the min id of a merged group is the min over its
    stars' min ids, which the label edges carry). Self-labeled
    singletons ride along as (v, v) rows — connected_components keeps
    self-loop vertices — so no vertex is ever forgotten.

    Cost per batch: O(|V_labeled| + |batch|) edge rows and the usual
    min-label iterations, whose count is bounded by the diameter of
    the CONTRACTED graph (stars + new edges) — typically 2-3 for
    near-dup workloads — never by the historical graph's diameter.
    """
    e = edges.select(F.col(src).alias("s"), F.col(dst).alias("d"))
    if labels is not None:
        e = e.unionByName(
            labels.select(
                F.col("vertex").alias("s"), F.col("component").alias("d")
            )
        )
    return connected_components(e, src="s", dst="d", max_iter=max_iter,
                                checkpoint_dir=checkpoint_dir)
