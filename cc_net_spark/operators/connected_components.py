"""Connected components over the duplicate-pair edge list -> cluster ids.

Alternating large-star / small-star (Kiveris et al., "Connected Components
in MapReduce and Beyond", SoCC'14) expressed purely as DataFrame
groupBy/join rounds — converges in O(log n) rounds, no GraphFrames
dependency, no driver-side graph. Each round is localCheckpoint()ed to cut
lineage (the reference has no equivalent; its components are implicit in a
shared hash table).

Deterministic labels: cluster_id = min(node id) of the component
(lexicographic for strings), so re-runs are byte-stable (SURVEY.md §7.3).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _orient(edges: DataFrame) -> DataFrame:
    """Orient (big, small), drop self-loops — narrow ops, no shuffle."""
    return edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient (big, small), drop self-loops, distinct."""
    return _orient(edges).distinct()


def _large_star(edges: DataFrame) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u})."""
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    mins = sym.groupBy("src").agg(F.least(F.min("dst"), F.first("src")).alias("_m"))
    return (
        sym.join(mins, "src")
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect everything
    to the minimum."""
    oriented = _canonical(edges)  # src > dst
    mins = oriented.groupBy("src").agg(F.min("dst").alias("_m"))
    nbrs = oriented.unionByName(
        oriented.select(F.col("src"), F.col("src").alias("dst")).distinct()
    )
    return (
        nbrs.join(mins, "src")
        .filter(F.col("dst") != F.col("_m"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .distinct()
    )


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    # mod before summing: ANSI mode (Spark 4 default) rejects long overflow
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.sum(F.xxhash64("src", "dst") % F.lit(1_000_000_007)), F.lit(0)).alias("h"),
    ).collect()[0]
    return row["n"], row["h"]


def _assign_schema(e: DataFrame):
    """(id, cluster_id) schema matching the edge id type — explicit so an
    empty edge list (zero duplicate pairs) doesn't hit
    CANNOT_INFER_EMPTY_SCHEMA and instead yields an empty assignment."""
    from pyspark.sql.types import StructField, StructType

    id_type = e.schema["src"].dataType
    return StructType(
        [StructField("id", id_type), StructField("cluster_id", id_type)]
    )


def _driver_union_find(e: DataFrame) -> DataFrame:
    """Small-graph fast path: collect the (deduped) edge list and run
    union-find on the driver. The alternating-star rounds cost several
    shuffles + a convergence action each; below the threshold that fixed
    cost dwarfs the work. (GraphFrames' CC has the same local fallback.)

    Transfers both directions through Arrow (``toPandas`` /
    ``createDataFrame(pandas)``) — Row-object collect + pickle
    createDataFrame cost several flat seconds at ~10^5 edges."""
    import pandas as pd

    pdf = e.toPandas()
    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for ra, rb in zip(pdf["src"], pdf["dst"]):
        ra, rb = find(ra), find(rb)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    assign = pd.DataFrame(
        {"id": list(parent), "cluster_id": [find(n) for n in list(parent)]}
    )
    if not len(assign):
        return e.sparkSession.createDataFrame([], _assign_schema(e))
    return e.sparkSession.createDataFrame(assign, _assign_schema(e))


def connected_components(
    edges: DataFrame,
    *,
    src: str = "id_a",
    dst: str = "id_b",
    max_iterations: int = 25,
    driver_threshold: int = 2_000_000,
    edge_count: int | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """(id, cluster_id) for every node appearing in ``edges``.

    cluster_id = min member id of the component. Isolated nodes don't
    appear (join your full id set with a coalesce to get singletons).

    Edge lists up to ``driver_threshold`` (after dedup) run union-find on
    the driver — O(E α(E)) in seconds, zero shuffles. Larger graphs use
    the distributed alternating large-star/small-star rounds. Pass
    ``driver_threshold=0`` to force the distributed path.

    ``edge_count``: a caller-known upper bound on the (pre-dedup) edge
    count; when provided and <= driver_threshold, the sizing count() job
    is skipped entirely (the edges stage manifest already knows its rows).

    ``checkpoint_dir``: DURABLE per-round checkpointing for cluster runs
    (SURVEY.md §7.1 step 5). ``localCheckpoint`` blocks are executor-local
    — on a 1000-executor run a single lost executor would force
    recomputing a truncated lineage that no longer exists. With a
    directory (hdfs/s3a/posix), each round's edge set is written to
    parquet and read back: lineage is cut AND the round survives executor
    loss. Two paths are ping-ponged so storage stays at ~2x one round.
    The single-box default stays ``localCheckpoint`` (no write amp).
    """
    e_raw = _orient(edges.select(F.col(src).alias("src"), F.col(dst).alias("dst")))
    if driver_threshold and edge_count is not None and edge_count <= driver_threshold:
        # union-find is idempotent on duplicate edges, so the driver path
        # skips the dedup SHUFFLE entirely: orientation + self-loop filter
        # are narrow, and the (bounded, <= driver_threshold pre-dedup
        # rows) raw edge list streams straight to the driver via Arrow.
        return _driver_union_find(e_raw)
    e = e_raw.distinct()

    spark = edges.sparkSession
    if checkpoint_dir is not None:
        pingpong = [f"{checkpoint_dir.rstrip('/')}/round_{i}" for i in (0, 1)]

        def _cut(df: DataFrame, rnd: int) -> DataFrame:
            # round r is only overwritten once round r+1 is fully
            # materialized in the OTHER path, so a crash mid-write
            # always leaves the previous round readable
            path = pingpong[rnd % 2]
            df.write.mode("overwrite").parquet(path)
            return spark.read.parquet(path)

        # size BEFORE the first durable write: a graph that falls under
        # the driver threshold would otherwise pay a full write+re-read
        # to object storage just to route to union-find
        if driver_threshold and e.count() <= driver_threshold:
            return _driver_union_find(e)
        e = _cut(e, 0)
    else:

        def _cut(df: DataFrame, rnd: int) -> DataFrame:
            # lazy checkpoint: materialized by whichever action touches
            # it next (the sizing count or the round's fingerprint) —
            # one scheduling round trip instead of two per step.
            return df.localCheckpoint(eager=False)

        e = _cut(e, 0)
        if driver_threshold and e.count() <= driver_threshold:
            return _driver_union_find(e)
    prev = None
    for rnd in range(1, max_iterations + 1):
        e = _cut(_small_star(_large_star(e)), rnd)
        fp = _fingerprint(e)
        if fp == prev:
            break
        prev = fp
    else:
        raise RuntimeError(f"connected_components did not converge in {max_iterations} rounds")
    # Converged state is a star set: every edge is (member, root). Roots
    # themselves appear only as dst, so add their self-assignments.
    members = e.select(F.col("src").alias("id"), F.col("dst").alias("cluster_id"))
    roots = e.select(F.col("dst").alias("id"), F.col("dst").alias("cluster_id")).distinct()
    return members.unionByName(roots).distinct()


def assign_clusters(
    ids: DataFrame, components: DataFrame, id_col: str
) -> DataFrame:
    """(id, cluster_id) over the FULL id set: singletons get their own id."""
    joined = ids.select(F.col(id_col)).join(
        components.withColumnRenamed("id", id_col), id_col, "left"
    )
    return joined.select(
        F.col(id_col), F.coalesce("cluster_id", F.col(id_col)).alias("cluster_id")
    )
