"""Local replica of the driver's correctness gate: run every queries()
entry at sf0.001 and diff it against its oracle_sql() via DuckDB
(row count + column names + order-insensitive values)."""

import duckdb
import pandas as pd
import pytest

import __spark_entry__ as entrymod

SF_DIR = "/root/testdata/sf0.001"
TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="module")
def ddb():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )
    return con


def canon(df: pd.DataFrame) -> pd.DataFrame:
    """dtype-insensitive canonicalization. Floats are NOT rounded here:
    the real driver hashes exact values, so queries must round Spark-side
    to match their oracle — a replica that rounds both sides would mask
    exactly that class of bug (it did, round 2). Rows sort by non-float
    columns first so float ulp noise cannot scramble the order."""
    df = df.reindex(sorted(df.columns), axis=1)
    for c in df.columns:
        if pd.api.types.is_integer_dtype(df[c]):
            df[c] = df[c].astype("int64")
        elif pd.api.types.is_float_dtype(df[c]):
            df[c] = df[c].astype("float64")
        elif pd.api.types.is_datetime64_any_dtype(df[c]):
            df[c] = pd.to_datetime(df[c]).dt.tz_localize(None)
    sort_cols = [c for c in df.columns if not pd.api.types.is_float_dtype(df[c])]
    sort_cols += [c for c in df.columns if pd.api.types.is_float_dtype(df[c])]
    return df.sort_values(by=sort_cols).reset_index(drop=True)


ORACLED = sorted(entrymod.oracle_sql())
ROWS_ONLY = sorted(set(entrymod.queries()) - set(ORACLED))


@pytest.mark.parametrize("name", ORACLED)
def test_query_matches_oracle(spark, ddb, name):
    got = canon(entrymod.queries()[name](spark, SF_DIR).toPandas())
    exp = canon(ddb.execute(entrymod.oracle_sql()[name]).df())
    assert list(got.columns) == list(exp.columns), (
        f"{name} columns {list(got.columns)} != {list(exp.columns)}"
    )
    assert len(got) == len(exp), f"{name} rows {len(got)} != {len(exp)}"
    pd.testing.assert_frame_equal(got, exp, check_dtype=False, atol=1e-9)


@pytest.mark.parametrize("name", ROWS_ONLY)
def test_rows_only_queries_run(spark, name):
    df = entrymod.queries()[name](spark, SF_DIR)
    assert df.count() >= 0
    assert len(df.columns) > 0


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    assert df.count() > 0


# every component family must keep at least one query inside the
# driver's 50-row oracle window (the driver verifies only the FIRST 50
# registry entries, in order) — round 4 silently lost hard verification
# for the incremental streaming + video families when new queries pushed
# them past slot 50. One representative prefix per family; a family with
# no query in the window is a registry-curation regression.
DRIVER_WINDOW = 50
FAMILY_PREFIXES = [
    "dedup_chunks",          # exact dedup
    "dup_chunk",             # probe join
    "cc_clusters",           # connected components
    "minhash_lsh",           # MinHash-LSH
    "simhash",               # SimHash
    "tfidf_cosine",          # TF-IDF cosine
    "ngram_jaccard",         # n-gram Jaccard
    "substring",             # suffix/substring pass
    "ann_",                  # ANN (brute/LSH/IVF)
    "embedding_near_dup",    # embedding near-dup
    "language_id",           # LID
    "quality_scores",        # quality scoring
    "token_counts",          # tokenization
    "fingerprints",          # document fingerprinting
    "unique_sentences",      # sentence extraction
    "select_where",          # jsonql select/where surface
    "describe",              # describe profiling
    "length_histogram",      # histogram
    "unminify",              # minifier roundtrip
    "fallback_tags",         # dmoz fallback join
    "audio_",                # audio multimodal
    "image_",                # image multimodal
    "video_",                # video multimodal
    "clips_",                # fused clip clustering
    "incremental_near_dup",  # incremental LSH streaming
    "incremental_embedding", # incremental embedding streaming
    "incremental_clusters",  # incremental cluster maintenance
    "incremental_substring", # incremental substring
]


def test_every_family_within_driver_window():
    window = list(entrymod.queries())[:DRIVER_WINDOW]
    missing = [
        p for p in FAMILY_PREFIXES
        if not any(name.startswith(p) for name in window)
    ]
    assert not missing, (
        f"families with no query in the first {DRIVER_WINDOW} registry "
        f"slots (driver would not oracle them): {missing}"
    )
    # and every windowed query must actually have an oracle
    unoracled = [n for n in window if n not in entrymod.oracle_sql()]
    assert not unoracled, f"windowed queries without oracles: {unoracled}"
