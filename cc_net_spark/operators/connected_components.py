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

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _orient(edges: DataFrame) -> DataFrame:
    """Orient (big, small), drop self-loops — narrow ops, no shuffle."""
    return edges.select(
        F.greatest("src", "dst").alias("src"), F.least("src", "dst").alias("dst")
    ).filter(F.col("src") != F.col("dst"))


def _canonical(edges: DataFrame) -> DataFrame:
    """Orient (big, small), drop self-loops, distinct."""
    return _orient(edges).distinct()


def _large_star(edges: DataFrame, *, dedup: bool = True) -> DataFrame:
    """Connect every strictly-larger neighbor of u to min(Γ(u) ∪ {u}).

    ONE exchange: ``min(Γ(u) ∪ {u})`` is a window min over the same
    ``src`` partitioning the old groupBy+join-back shape paid two
    exchanges (and a join) for — the window rides the single hash
    exchange of ``sym`` (guide §2.4: operations keyed the same way share
    one exchange). ``dedup=False`` skips the output distinct: star
    outputs feeding another star tolerate duplicate edges (min is
    duplicate-insensitive), so intra-round dedup is pure extra shuffle."""
    sym = edges.unionByName(edges.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
    w = Window.partitionBy("src")
    out = (
        sym.withColumn("_m", F.least(F.min("dst").over(w), F.col("src")))
        .filter(F.col("dst") > F.col("src"))
        .select(F.col("dst").alias("src"), F.col("_m").alias("dst"))
        .filter(F.col("src") != F.col("dst"))
    )
    return out.distinct() if dedup else out


def _small_star(edges: DataFrame, *, assume_canonical: bool = False) -> DataFrame:
    """Within each node's smaller-or-equal neighborhood, connect everything
    to the minimum.

    ONE data exchange (the ``src`` window) + the output distinct: the
    old shape paid a canonicalizing distinct, a groupBy, a self-edge
    distinct and a join — four more exchanges for the same output set.
    ``assume_canonical=True`` skips the orient+distinct when the input
    is already (src > dst)-oriented (large-star output is, by
    construction: it emits (v, m) with v > u >= m); duplicates are
    harmless under the window min and the final distinct."""
    oriented = edges if assume_canonical else _canonical(edges)  # src > dst
    w = Window.partitionBy("src")
    tagged = oriented.withColumn("_m", F.min("dst").over(w))
    # every neighbor x in N<=(u) ∪ {u} with x != m(u) connects to m(u):
    # the dst rows... plus u itself (src != m always, since m < src)
    others = tagged.filter(F.col("dst") != F.col("_m")).select(
        F.col("dst").alias("src"), F.col("_m").alias("dst")
    )
    selfs = tagged.select(F.col("src"), F.col("_m").alias("dst"))
    return others.unionByName(selfs).distinct()


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

    Transfers both directions through Arrow (``toArrow`` /
    ``createDataFrame(pyarrow.Table)``) — Row-object collect + pickle
    createDataFrame cost several flat seconds at ~10^5 edges.

    The union-find itself is VECTORIZED (round 6): hook-to-min +
    pointer-jumping over numpy index arrays — O(E) C-speed work per
    pass, O(log n) passes — replacing the 2·E-iteration python dict
    loop (the measured driver-path floor at bench scale). Ids are coded
    in sorted id order, so the min CODE of a component is the min ID
    (lexicographic for strings) and labels are byte-identical to the
    sequential implementation."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.compute as pc

    # Arrow end to end: toArrow() skips the toPandas python-str
    # materialization of every edge endpoint, and string ids are coded
    # via hash-based dictionary_encode (O(n) in C) + a sort of only the
    # UNIQUE ids instead of np.unique's O(n log n) full-array string
    # sort — measured 0.69 s -> 0.10 s at 960k endpoints, byte-identical
    # output. This is pure DRIVER time that does not shrink with
    # executors, i.e. exactly the Amdahl term that caps leg scaling.
    tbl = e.toArrow()
    m = tbl.num_rows
    if not m:
        return e.sparkSession.createDataFrame([], _assign_schema(e))
    both = pa.chunked_array(
        list(tbl["src"].chunks) + list(tbl["dst"].chunks)
    ).combine_chunks()
    if pa.types.is_string(both.type) or pa.types.is_large_string(both.type):
        enc = both.dictionary_encode()
        codes = enc.indices.to_numpy()
        d = enc.dictionary
        # rank codes in sorted-id order so min CODE = min ID (arrow's
        # binary utf8 order = UTF8String order = python str order)
        order = pc.sort_indices(d).to_numpy()
        rank = np.empty(len(d), dtype=codes.dtype)
        rank[order] = np.arange(len(d), dtype=codes.dtype)
        inv = rank[codes]
        uniq = pc.take(d, pa.array(order))
    else:
        # numeric ids: np.unique on fixed-width ints is already C-speed
        arr = both.to_numpy()
        uniq_np, inv = np.unique(arr, return_inverse=True)
        uniq = pa.array(uniq_np)
    u, v = inv[:m], inv[m:]
    parent = np.arange(len(uniq))
    # converges in O(log n) hook+compress passes; the bound is a
    # corruption backstop (64 >> log2 of any driver-threshold graph)
    for _ in range(64):
        while True:  # full path compression (pointer jumping)
            pp = parent[parent]
            if np.array_equal(pp, parent):
                break
            parent = pp
        pu, pv = parent[u], parent[v]
        if np.array_equal(pu, pv):
            break
        # hook the larger root onto the smaller; conflicting hooks of
        # the same root resolve to the minimum (associative, safe)
        np.minimum.at(parent, np.maximum(pu, pv), np.minimum(pu, pv))
    else:
        raise RuntimeError("driver union-find did not converge in 64 passes")
    labels = pc.take(uniq, pa.array(parent))
    out = pa.table({"id": uniq, "cluster_id": labels})
    return e.sparkSession.createDataFrame(out, _assign_schema(e))


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
        # large-star output feeds straight into small-star: no dedup in
        # between (window mins are duplicate-insensitive) and no
        # re-orientation (large-star emits src > dst by construction) —
        # one distinct per ROUND instead of three, with a per-round
        # result SET identical to the fully-deduped composition (the
        # convergence fingerprint sees the same sets, so the round count
        # is unchanged too)
        e = _cut(
            _small_star(_large_star(e, dedup=False), assume_canonical=True),
            rnd,
        )
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
