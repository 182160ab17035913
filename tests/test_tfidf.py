"""TF-IDF cosine near-dup family (operators/tfidf.py).

Planted-corpus semantics plus a numpy re-derivation of the full math —
the same differential strategy the driver oracle uses in SQL."""

import math

import pytest
from pyspark.sql import functions as F

from cc_net_spark.operators.tfidf import (
    tfidf_cosine_pairs,
    tfidf_postings,
    tokenize,
)

DOCS = [
    (1, "the quick brown fox jumps over the lazy dog"),
    (2, "the quick brown fox jumps over the lazy dog"),  # exact dup of 1
    (3, "the quick brown fox leaps over the lazy dog"),  # one word swapped
    (4, "entirely different subject matter about spark shuffles"),
    (5, "spark shuffles and spark partitions and spark joins"),
    (6, ""),  # empty doc must vanish, not crash
]


def _df(spark):
    return spark.createDataFrame(DOCS, ["doc_id", "text"])


def _numpy_pairs(docs, min_df, max_df, threshold):
    """Independent re-derivation of the operator contract in pure python."""
    import re
    from collections import Counter

    toks = {i: re.findall("[a-z0-9]+", t.lower()) for i, t in docs}
    n = len(docs)
    df_count = Counter()
    tf = {i: Counter(ts) for i, ts in toks.items()}
    for c in tf.values():
        for term in c:
            df_count[term] += 1
    vocab = {t for t, d in df_count.items() if min_df <= d <= max_df}
    vecs = {}
    for i, c in tf.items():
        w = {t: c[t] * math.log(n / df_count[t]) for t in c if t in vocab}
        nrm = math.sqrt(sum(x * x for x in w.values()))
        if nrm > 0:
            vecs[i] = {t: x / nrm for t, x in w.items()}
    out = {}
    ids = sorted(vecs)
    for ai in range(len(ids)):
        for bi in range(ai + 1, len(ids)):
            a, b = ids[ai], ids[bi]
            shared = set(vecs[a]) & set(vecs[b])
            # a pair exists only if it shares >=1 vector-space term (the
            # posting join produces no row otherwise — even at threshold 0)
            if not shared:
                continue
            cos = round(sum(vecs[a][t] * vecs[b][t] for t in shared), 6)
            if cos >= threshold:
                out[(a, b)] = cos
    return out


def test_tokenize_contract(spark):
    rows = tokenize(
        spark.createDataFrame([(1, "A-b c2! [x]")], ["doc_id", "text"]),
        "text", "doc_id",
    ).collect()
    assert [r["term"] for r in rows] == ["a", "b", "c2", "x"]


def test_pairs_match_numpy_rederivation(spark):
    got = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            _df(spark), "text", "doc_id",
            threshold=0.2, min_df=2, max_df=3, n_total=len(DOCS),
        ).collect()
    }
    exp = _numpy_pairs(DOCS, 2, 3, 0.2)
    assert got == exp
    assert got[(1, 2)] == 1.0  # exact dup pair is cosine 1 by construction
    assert (1, 3) in got  # one-word swap stays similar
    assert (1, 4) not in got and (1, 5) not in got


def test_min_df_one_terms_never_pair_but_change_norms(spark):
    """min_df=1 keeps singleton terms in the space: they add norm mass
    (lowering every cosine) without ever producing a pair."""
    strict = {
        (r["id_a"], r["id_b"]): r["cosine"]
        for r in tfidf_cosine_pairs(
            _df(spark), "text", "doc_id",
            threshold=0.0, min_df=1, max_df=5, n_total=len(DOCS),
        ).collect()
    }
    assert strict == _numpy_pairs(DOCS, 1, 5, 0.0)
    assert strict[(1, 3)] < _numpy_pairs(DOCS, 2, 5, 0.0)[(1, 3)]


def test_max_df_prune_is_the_skew_cap(spark):
    """A term in every doc (boilerplate) is pruned by max_df — the
    posting self-join never sees the hot list — and the drop is metered."""
    docs = [(i, f"boiler plate unique{i} word{i}") for i in range(10)]
    df = spark.createDataFrame(docs, ["doc_id", "text"])
    pairs, m = tfidf_cosine_pairs(
        df, "text", "doc_id",
        threshold=0.0, min_df=2, max_df=5, n_total=10, with_metrics=True,
    )
    assert pairs.count() == 0  # only shared terms were the pruned boilerplate
    assert m.n_terms_pruned_common == 2  # 'boiler', 'plate' (df=10 > 5)
    assert m.n_postings_dropped == 20
    assert m.n_terms_pruned_rare == 20  # unique{i}, word{i}


def test_empty_and_allpruned_docs_vanish(spark):
    unit = tfidf_postings(
        _df(spark), "text", "doc_id", min_df=2, max_df=3, n_total=len(DOCS)
    )
    ids = {r["doc_id"] for r in unit.select("doc_id").distinct().collect()}
    assert 6 not in ids  # empty text
    # norms are unit: sum of squares == 1 per doc
    sq = unit.groupBy("doc_id").agg(F.round(F.sum(F.col("u") * F.col("u")), 9).alias("s"))
    assert all(r["s"] == pytest.approx(1.0) for r in sq.collect())


def test_no_python_udfs_in_plan(spark):
    plan = tfidf_cosine_pairs(
        _df(spark), "text", "doc_id", n_total=len(DOCS)
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "ArrowEvalPython" not in plan
