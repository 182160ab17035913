"""TF-IDF cosine near-duplicate detection — the classic lexical-vector
dedup family, complementing MinHash (set overlap), SimHash (bit sketch)
and the substring pass (verbatim runs).

Reference parity note: cc_net has no TF-IDF stage (its dedup unit is the
SHA1 paragraph hash, cc_net/dedup.py); this family is part of the graft's
training-data-pipeline surface — lexical near-dup where word *frequency*
matters (template pages, boilerplate with numbers swapped) and the
threshold is a real-valued similarity rather than a set Jaccard.

Design (all DataFrame ops, no UDFs — every kernel is a JVM expression):

  docs ─ tokenize (regexp, lowercase) ─ explode
       ─ tf:   groupBy(id, term) count                 [shuffle 1: (id,term)]
       ─ df:   window count over term                  [shuffle 2: term]
       ─ PRUNE df < min_df (can't pair) and df > max_df (the skew cap —
               a posting list's pair count is quadratic in df, and a term
               in >max_df_ratio of the corpus carries ~zero idf anyway;
               this is the same defense as pairs.candidate_pairs'
               bucket_cap, expressed as vocabulary pruning so the oracle
               semantics stay exact)
       ─ unit: tf·ln(N/df) / ‖doc‖₂  (window sum over id) [shuffle 3: id]
       ─ self-join postings on term (id_a < id_b)      [shuffle 4: term,
               one exchange — AQE reuses it across both identical branches]
       ─ cosine: groupBy(id_a,id_b) sum(u_a·u_b)       [shuffle 5: pair,
               map-side partial agg]

Every shuffle is linear in the postings table; the one quadratic hazard
(hot terms) is removed by the df prune BEFORE the join, with drop
metrics. At 10^12 docs the vocabulary table is tiny relative to postings
and the pair aggregation is the dominant exchange — exactly the shape a
1000-executor cluster wants (hash-partitioned, partially aggregated,
no broadcast of anything unbounded).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

TOKEN_RE = "[a-z0-9]+"


@dataclass
class TfidfMetrics:
    n_terms: int
    n_terms_pruned_common: int  # df > max_df (the skew cap)
    n_terms_pruned_rare: int  # df < min_df (can't produce a pair)
    n_postings_dropped: int  # posting rows removed by the common-prune


def tokenize(df: DataFrame, text_col: str, id_col: str) -> DataFrame:
    """(id, term) posting rows: lowercase alnum runs. The regex is the
    operator's contract — the DuckDB oracle applies the identical
    ``regexp_extract_all(lower(text), '[a-z0-9]+')``."""
    return df.select(
        F.col(id_col),
        F.explode(
            F.expr(f"regexp_extract_all(lower({text_col}), '{TOKEN_RE}', 0)")
        ).alias("term"),
    )


def tfidf_postings(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    min_df: int = 2,
    max_df: int | None = None,
    n_total: int | None = None,
    with_metrics: bool = False,
):
    """L2-normalized tf-idf posting list: (id, term, unit_weight).

    ``n_total``: corpus size for the idf denominator; pass it when the
    caller already knows the row count (a stage manifest, a parquet
    footer count) — otherwise one count() job runs here.
    ``min_df``/``max_df``: the vector space is the terms with
    min_df <= df <= max_df. min_df=2 is free (a df-1 term co-occurs with
    nothing, so it only inflates norms); max_df is the skew cap — REQUIRED
    for the pair join (default: 50% of the corpus).

    idf = ln(N/df); weight = tf·idf; unit = weight / ‖doc vector‖₂ over
    the pruned space, so the later pair sum IS the cosine.
    """
    if n_total is None:
        n_total = df.count()
    if max_df is None:
        max_df = max(min_df, n_total // 2)

    tf = tokenize(df, text_col, id_col).groupBy(id_col, "term").agg(
        F.count(F.lit(1)).alias("tf")
    )
    # df rides a window over the SAME term-partitioning the pair join
    # needs later (one row per (id,term) ⇒ count == document frequency)
    tf = tf.withColumn("df", F.count(F.lit(1)).over(Window.partitionBy("term")))

    metrics = None
    if with_metrics:
        # the metrics agg below is an ACTION over tf's full lineage
        # (tokenize -> tf groupBy -> df window); checkpoint so the
        # returned postings reuse that work instead of re-running the
        # operator's two big shuffles (lazy: materialized by the collect)
        tf = tf.localCheckpoint(eager=False)
        vocab = tf.groupBy("term").agg(F.first("df").alias("df"))
        m = vocab.agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(F.when(F.col("df") > max_df, 1).otherwise(0)).alias("common"),
            F.sum(F.when(F.col("df") < min_df, 1).otherwise(0)).alias("rare"),
            F.sum(F.when(F.col("df") > max_df, F.col("df")).otherwise(0)).alias(
                "postings"
            ),
        ).collect()[0]
        metrics = TfidfMetrics(
            n_terms=m["n"] or 0,
            n_terms_pruned_common=m["common"] or 0,
            n_terms_pruned_rare=m["rare"] or 0,
            n_postings_dropped=m["postings"] or 0,
        )

    pruned = tf.filter((F.col("df") >= min_df) & (F.col("df") <= max_df))
    w = F.col("tf") * F.log(F.lit(float(n_total)) / F.col("df"))
    pruned = pruned.withColumn("_w", w)
    norm = F.sqrt(F.sum(F.col("_w") * F.col("_w")).over(Window.partitionBy(id_col)))
    unit = (
        pruned.withColumn("_n", norm)
        .filter(F.col("_n") > 0)
        .select(id_col, "term", (F.col("_w") / F.col("_n")).alias("u"))
    )
    return (unit, metrics) if with_metrics else unit


def tfidf_cosine_pairs(
    df: DataFrame,
    text_col: str,
    id_col: str,
    *,
    threshold: float = 0.3,
    min_df: int = 2,
    max_df: int | None = None,
    n_total: int | None = None,
    round_digits: int = 6,
    with_metrics: bool = False,
):
    """Unordered doc pairs (id_a < id_b, cosine) with tf-idf cosine >=
    ``threshold`` over the df-pruned vector space.

    The cosine is rounded to ``round_digits`` BEFORE the threshold
    compare (and emitted rounded), so the operator's results are stable
    across summation orders and engines — the same round-then-compare
    contract the Jaccard family uses.
    """
    res = tfidf_postings(
        df, text_col, id_col,
        min_df=min_df, max_df=max_df, n_total=n_total,
        with_metrics=with_metrics,
    )
    unit, metrics = res if with_metrics else (res, None)
    a = unit.select(
        "term", F.col(id_col).alias("id_a"), F.col("u").alias("_ua")
    )
    b = unit.select(
        "term", F.col(id_col).alias("id_b"), F.col("u").alias("_ub")
    )
    pairs = (
        a.join(b, "term")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.round(F.sum(F.col("_ua") * F.col("_ub")), round_digits).alias("cosine"))
        .filter(F.col("cosine") >= threshold)
    )
    return (pairs, metrics) if with_metrics else pairs
