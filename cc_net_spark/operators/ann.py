"""Approximate nearest-neighbor search over an embedding column
(``array<float>``) — similarity-search operators for a training-data
pipeline (embedding-cosine near-dup, retrieval).

Three tiers:

* ``brute_force_topk`` — exact cosine top-k via a JVM-side cross join
  (``F.zip_with`` dot product). Correctness baseline; O(Q*N), fine when
  either side is small (the query side broadcasts).
* ``brute_force_topk_matmul`` — exact top-k with the corpus partitioned
  and the *queries* broadcast into a numpy matmul per partition
  (mapInPandas + Arrow). Per-partition top-k then a global top-k reduce:
  the scale path for exact search (linear scan, no shuffle of the corpus).
* ``lsh_topk`` — random-hyperplane LSH: bucket by sign-bit bands, search
  only within matching buckets. Sub-linear candidate generation at the
  cost of recall; same verification join as the exact path.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _cosine(a, b) -> F.Column:
    dot = F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y), F.lit(0.0), lambda acc, v: acc + v
    )
    na = F.sqrt(F.aggregate(a, F.lit(0.0), lambda acc, v: acc + v * v))
    nb = F.sqrt(F.aggregate(b, F.lit(0.0), lambda acc, v: acc + v * v))
    return F.when((na > 0) & (nb > 0), dot / (na * nb)).otherwise(F.lit(0.0))


def brute_force_topk(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int = 6,
) -> DataFrame:
    """(query_id, neighbor_id, rank, cosine) — exact, JVM-side expressions.

    Cosine is computed in double and rounded before ranking so results are
    reproducible across engines; ties break by neighbor id. Self-matches
    are excluded.
    """
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    c = corpus.select(
        F.col(id_col).alias("neighbor_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_cv"),
    )
    scored = (
        F.broadcast(q)
        .crossJoin(c)
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_cv")), round_to))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def brute_force_topk_matmul(
    queries: DataFrame,
    corpus: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
) -> DataFrame:
    """Exact top-k at scale: queries collected+broadcast as one numpy
    matrix; each corpus partition does a single matmul and emits its local
    top-k; a global window reduces to the final top-k. The corpus is
    scanned once, never shuffled (only Q*k*P candidate rows move)."""
    qrows = queries.select(id_col, vec_col).collect()
    q_ids = np.array([r[id_col] for r in qrows])
    qm = np.array([list(r[vec_col]) for r in qrows], dtype=np.float64)
    qn = qm / np.maximum(1e-12, np.linalg.norm(qm, axis=1, keepdims=True))
    sc = queries.sparkSession.sparkContext
    bq = sc.broadcast((q_ids, qn))

    src = corpus.select(F.col(id_col).alias("neighbor_id"), F.col(vec_col).alias("_v"))

    def topk_part(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        q_ids_l, qn_l = bq.value
        for pdf in batches:
            if not len(pdf):
                continue
            cm = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
            cn = cm / np.maximum(1e-12, np.linalg.norm(cm, axis=1, keepdims=True))
            sims = qn_l @ cn.T  # (Q, B)
            kk = min(k + 1, sims.shape[1])
            idx = np.argpartition(-sims, kk - 1, axis=1)[:, :kk]
            out = []
            for qi in range(sims.shape[0]):
                for ci in idx[qi]:
                    out.append((q_ids_l[qi], pdf["neighbor_id"].iloc[ci], float(sims[qi, ci])))
            yield pd.DataFrame(out, columns=["query_id", "neighbor_id", "cosine"])

    cand = src.mapInPandas(topk_part, schema="query_id long, neighbor_id long, cosine double")
    cand = cand.filter(F.col("query_id") != F.col("neighbor_id")).withColumn(
        "cosine", F.round("cosine", 6)
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        cand.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def hyperplane_signatures(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    n_bits: int = 16,
    seed: int = 7,
    keep_vec: bool = False,
) -> DataFrame:
    """(id, sig long[, v array<double>]): sign-bit signature under seeded
    random hyperplanes. The id column keeps its input type.
    ``keep_vec=True`` carries the float64 vector through in the SAME
    Arrow pass — callers that persist (sig, vector) state together (the
    incremental embedding family) avoid a per-batch self-join."""
    rng = np.random.default_rng(seed)
    planes = rng.normal(size=(n_bits, dim))
    sc = df.sparkSession.sparkContext
    bp = sc.broadcast(planes)
    src = df.select(F.col(id_col), F.col(vec_col).alias("_v"))
    id_type = src.schema[id_col].dataType.simpleString()

    def compute(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        pl = bp.value
        weights = (1 << np.arange(pl.shape[0], dtype=np.uint64)).astype(np.uint64)
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
            bits = (m @ pl.T) > 0  # (B, n_bits)
            sig = (bits.astype(np.uint64) * weights).sum(axis=1).astype(np.int64)
            out = {id_col: pdf[id_col], "sig": sig}
            if keep_vec:
                out["v"] = [row.tolist() for row in m]
            yield pd.DataFrame(out)

    schema = f"{id_col} {id_type}, sig long"
    if keep_vec:
        schema += ", v array<double>"
    return src.mapInPandas(compute, schema=schema)


def hyperplane_bands(
    sigs: DataFrame, id_col: str, *, n_bits: int, bands: int
) -> DataFrame:
    """Explode hyperplane signatures into (id, band, key) LSH band rows —
    ``bands`` contiguous (n_bits // bands)-bit slices, the candidate keys
    for both the batch near-dup pass and the incremental state tables."""
    width = n_bits // bands
    band_structs = F.array(
        *[
            F.struct(
                F.lit(i).alias("band"),
                F.shiftrightunsigned(F.col("sig"), i * width)
                .bitwiseAND(F.lit((1 << width) - 1))
                .alias("key"),
            )
            for i in range(bands)
        ]
    )
    return sigs.select(id_col, F.explode(band_structs).alias("_b")).select(
        id_col, F.col("_b.band").alias("band"), F.col("_b.key").alias("key")
    )


def embedding_near_dup_pairs(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    threshold: float = 0.95,
    n_bits: int = 16,
    bands: int = 4,
    bucket_cap: int = 500,
    seed: int = 7,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs (the fifth dedup family):
    hyperplane-LSH banded candidates -> exact cosine verify >= threshold.
    Same skew-capped bucket join as the text passes; (id_a, id_b, cosine).
    """
    from cc_net_spark.operators.pairs import candidate_pairs

    sigs = hyperplane_signatures(
        df, id_col=id_col, vec_col=vec_col, dim=dim, n_bits=n_bits, seed=seed
    )
    bucketed = hyperplane_bands(sigs, id_col, n_bits=n_bits, bands=bands)
    cand = candidate_pairs(
        bucketed, ["band", "key"], id_col, bucket_cap=bucket_cap, assume_unique=True
    )
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    scored = (
        cand.join(vecs.select(F.col(id_col).alias("id_a"), F.col("_v").alias("_qv")), "id_a")
        .join(vecs.select(F.col(id_col).alias("id_b"), F.col("_v").alias("_cv")), "id_b")
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    return scored.filter(F.col("cosine") >= threshold).select("id_a", "id_b", "cosine")


def kmeans_centroids(
    df: DataFrame,
    *,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_cells: int = 64,
    sample: int = 4096,
    iters: int = 10,
    seed: int = 7,
    corpus_rows: int | None = None,
) -> np.ndarray:
    """Deterministic coarse quantizer for IVF: numpy Lloyd iterations over
    a deterministic DISTRIBUTED hash-sample. ``pmod(xxhash64(id), m) == 0``
    with m sized from the corpus row count selects ~``sample`` rows with a
    filter that pushes into the scan — no global TakeOrdered over the full
    corpus (the round-2 shape, a per-training global top-k at 100x).
    The driver-side sort of the ~sample collected rows keeps the result
    independent of partitioning. Pass ``corpus_rows`` (e.g. from a Parquet
    footer read) to skip the sizing count(). The quantizer trains on a
    bounded subset by design — the assignment pass below is fully
    distributed."""
    n = corpus_rows if corpus_rows is not None else df.count()
    modulus = max(1, n // max(1, sample))
    picked = (
        df.filter(F.pmod(F.xxhash64(F.col(id_col)), F.lit(modulus)) == 0)
        .select(id_col, vec_col)
        .limit(8 * sample)  # safety valve; expected matches ~= sample
        .collect()
    )
    rows = sorted(picked, key=lambda r: r[id_col])[:sample]
    m = np.array([list(r[vec_col]) for r in rows], dtype=np.float64)
    m = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
    rng = np.random.default_rng(seed)
    k = min(n_cells, len(m))
    cents = m[rng.choice(len(m), size=k, replace=False)]
    for _ in range(iters):
        sims = m @ cents.T
        assign = np.argmax(sims, axis=1)
        for c in range(k):
            members = m[assign == c]
            if len(members):
                v = members.sum(axis=0)
                cents[c] = v / max(1e-12, np.linalg.norm(v))
    return cents


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 1,
) -> DataFrame:
    """(id, cell): nearest-centroid cell(s) per vector — one matmul per
    Arrow batch, centroids broadcast. nprobe > 1 emits the top-nprobe
    cells (used on the query side for recall)."""
    sc = df.sparkSession.sparkContext
    bc = sc.broadcast(centroids)
    src = df.select(F.col(id_col), F.col(vec_col).alias("_v"))

    def assign(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cents = bc.value
        for pdf in batches:
            if not len(pdf):
                continue
            m = np.array([list(v) for v in pdf["_v"]], dtype=np.float64)
            m = m / np.maximum(1e-12, np.linalg.norm(m, axis=1, keepdims=True))
            sims = m @ cents.T
            p = min(nprobe, sims.shape[1])
            top = np.argpartition(-sims, p - 1, axis=1)[:, :p]
            out_ids = np.repeat(pdf[id_col].to_numpy(), p)
            yield pd.DataFrame({id_col: out_ids, "cell": top.ravel().astype(np.int32)})

    id_type = dict(src.dtypes)[id_col]
    return src.mapInPandas(assign, schema=f"{id_col} {id_type}, cell int")


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_cells: int = 64,
    nprobe: int = 4,
    seed: int = 7,
    corpus_cells: DataFrame | None = None,
    query_cells: DataFrame | None = None,
) -> DataFrame:
    """IVF search (the third ANN tier next to exact-matmul and LSH):
    train a coarse quantizer, partition the corpus into cells, probe only
    the query's top-nprobe cells, exact-cosine rerank. Candidate volume is
    ~nprobe/n_cells of the corpus per query — the sub-linear scale path
    with tunable recall (raise nprobe). Precomputed cell assignments can
    be passed in (a stored IVF index; also lets an oracle re-derive the
    probe join from the exported assignment tables)."""
    if corpus_cells is None or query_cells is None:
        cents = kmeans_centroids(
            corpus, vec_col=vec_col, id_col=id_col, n_cells=n_cells, seed=seed
        )
        if corpus_cells is None:
            corpus_cells = ivf_assign(
                corpus, cents, id_col=id_col, vec_col=vec_col, nprobe=1
            )
        if query_cells is None:
            query_cells = ivf_assign(
                queries, cents, id_col=id_col, vec_col=vec_col, nprobe=nprobe
            ).withColumnRenamed(id_col, "query_id")
    cand = (
        F.broadcast(query_cells)
        .join(corpus_cells.withColumnRenamed(id_col, "neighbor_id"), "cell")
        .filter(F.col("query_id") != F.col("neighbor_id"))
        .select("query_id", "neighbor_id")
        .distinct()
    )
    vecs = corpus.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    qvecs = queries.select(
        F.col(id_col).alias("query_id"),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_qv"),
    )
    scored = (
        cand.join(qvecs, "query_id")
        .join(vecs.select(F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_cv")), "neighbor_id")
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )


def lsh_topk(
    df: DataFrame,
    *,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    dim: int,
    k: int = 5,
    n_bits: int = 16,
    bands: int = 4,
    seed: int = 7,
    hot_threshold: int = 200,
) -> DataFrame:
    """All-pairs LSH search: candidates = same band value; rerank by exact
    cosine; top-k per vector. Recall < 1 by design (bucketing).

    Skew defense: a degenerate hyperplane bucket (many near-zero or
    duplicated embeddings landing on one band key) is a quadratic blow-up
    under a raw self-join. Top-k search cannot tolerate the recall loss of
    a size CAP, so candidates come from the salted full-recall pair
    generator (``salted_candidate_pairs``): buckets above
    ``hot_threshold`` are tiled across a salt grid — the exact same
    candidate set, with the quadratic work spread over ~n_salts^2/2 tasks
    instead of one straggler."""
    from cc_net_spark.operators.pairs import salted_candidate_pairs

    sigs = hyperplane_signatures(
        df, id_col=id_col, vec_col=vec_col, dim=dim, n_bits=n_bits, seed=seed
    )
    bucketed = hyperplane_bands(sigs, id_col, n_bits=n_bits, bands=bands)
    # undirected co-bucket pairs (salted, full recall), mirrored into the
    # directed candidate set the top-k rerank needs — identical to the raw
    # self-join's output, without its single-task quadratic bucket risk
    upairs = salted_candidate_pairs(
        bucketed, ["band", "key"], id_col, hot_threshold=hot_threshold,
        assume_unique=True,
    )
    cand = upairs.select(
        F.col("id_a").alias("query_id"), F.col("id_b").alias("neighbor_id")
    ).unionByName(
        upairs.select(
            F.col("id_b").alias("query_id"), F.col("id_a").alias("neighbor_id")
        )
    )
    vecs = df.select(
        F.col(id_col),
        F.transform(F.col(vec_col), lambda x: x.cast("double")).alias("_v"),
    )
    scored = (
        cand.join(vecs.select(F.col(id_col).alias("query_id"), F.col("_v").alias("_qv")), "query_id")
        .join(vecs.select(F.col(id_col).alias("neighbor_id"), F.col("_v").alias("_cv")), "neighbor_id")
        .withColumn("cosine", F.round(_cosine(F.col("_qv"), F.col("_cv")), 6))
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("neighbor_id"))
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "rank", "cosine")
    )
