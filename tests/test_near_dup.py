"""MinHash/SimHash/substring/connected-components operator tests, including
differential checks vs exact oracles (SURVEY.md §5 test plan items b/e)."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from cc_net_spark.operators import minhash as mh
from cc_net_spark.operators import simhash as sh
from cc_net_spark.operators import substring as ss
from cc_net_spark.operators.connected_components import assign_clusters, connected_components
from cc_net_spark.operators.pairs import candidate_pairs


def _letters(n: int) -> str:
    # digit-free token names: normalize_for_dedup maps every digit to '0',
    # which would collapse a digit-suffixed vocabulary
    s = ""
    n += 1
    while n:
        n, r = divmod(n, 26)
        s += chr(ord("a") + r)
    return s


def _mutate(rng, words, frac):
    out = list(words)
    n = max(1, int(len(out) * frac))
    for idx in rng.choice(len(out), size=n, replace=False):
        out[idx] = "mut" + _letters(int(rng.integers(1e9)))
    return out


@pytest.fixture(scope="module")
def near_dup_corpus(spark):
    """60 docs: 20 bases, each with a near-dup (5% edits) and an unrelated doc."""
    rng = np.random.default_rng(42)
    vocab = ["w" + _letters(i) for i in range(500)]
    rows = []
    for g in range(20):
        base = list(rng.choice(vocab, size=120))
        near = _mutate(np.random.default_rng(100 + g), base, 0.05)
        unrelated = list(np.random.default_rng(200 + g).choice(vocab, size=120))
        rows.append((f"doc-{g:03d}-a", " ".join(base)))
        rows.append((f"doc-{g:03d}-b", " ".join(near)))
        rows.append((f"doc-{g:03d}-c", " ".join(unrelated)))
    return spark.createDataFrame(rows, "clip_id string, transcript string")


def exact_jaccard(t1, t2, n=5):
    def grams(t):
        toks = t.split()
        return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}

    a, b = grams(t1), grams(t2)
    return len(a & b) / len(a | b) if a | b else 0.0


def test_minhash_estimates_match_exact_jaccard(spark, near_dup_corpus):
    sig = mh.shingle_signatures(near_dup_corpus, "transcript", "clip_id", num_perm=128)
    pairs = spark.createDataFrame(
        [(f"doc-{g:03d}-a", f"doc-{g:03d}-b") for g in range(20)], "id_a string, id_b string"
    )
    est = {
        (r["id_a"], r["id_b"]): r["jaccard_est"]
        for r in mh.estimated_jaccard(pairs, sig, "clip_id", threshold=0.0).collect()
    }
    texts = dict(near_dup_corpus.collect())
    for (a, b), e in est.items():
        truth = exact_jaccard(texts[a], texts[b])
        assert abs(e - truth) < 0.2, (a, b, e, truth)


def test_lsh_finds_planted_near_dups(spark, near_dup_corpus):
    sig = mh.shingle_signatures(near_dup_corpus, "transcript", "clip_id", num_perm=128)
    cand = mh.minhash_candidate_pairs(sig, "clip_id", bands=32, rows_per_band=4)
    verified = mh.verify_jaccard(cand, sig, "clip_id", threshold=0.5)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    expected = {(f"doc-{g:03d}-a", f"doc-{g:03d}-b") for g in range(20)}
    # recall: all planted near-dups found
    assert expected <= got
    # precision: no unrelated docs joined
    for a, b in got - expected:
        assert a.rsplit("-", 1)[0] == b.rsplit("-", 1)[0]


def test_identical_docs_have_identical_signatures(spark):
    df = spark.createDataFrame(
        [("a", "the same exact text here okay"), ("b", "the same exact text here okay")],
        "clip_id string, transcript string",
    )
    rows = mh.shingle_signatures(df, "transcript", "clip_id", shingle_size=3).collect()
    sigs = {r["clip_id"]: list(r["sig"]) for r in rows}
    assert sigs["a"] == sigs["b"]


def test_simhash_pipeline(spark, near_dup_corpus):
    sim = sh.simhash_signatures(near_dup_corpus, "transcript", "clip_id")
    rows = {r["clip_id"]: r["simhash"] for r in sim.collect()}
    # near dups are close in hamming, unrelated far
    def ham(x, y):
        return bin((x ^ y) & ((1 << 64) - 1)).count("1")

    near = [ham(rows[f"doc-{g:03d}-a"], rows[f"doc-{g:03d}-b"]) for g in range(20)]
    far = [ham(rows[f"doc-{g:03d}-a"], rows[f"doc-{g:03d}-c"]) for g in range(20)]
    assert np.mean(near) < np.mean(far)
    k = 8
    cand = sh.simhash_candidate_pairs(sim, "clip_id", max_hamming=k)
    verified = sh.verify_hamming(cand, sim, "clip_id", max_hamming=k)
    got = {(r["id_a"], r["id_b"]) for r in verified.collect()}
    # banding + verify == brute force at the same k (exactness of pigeonhole)
    ids = sorted(rows)
    brute = {
        (a, b) for i, a in enumerate(ids) for b in ids[i + 1 :] if ham(rows[a], rows[b]) <= k
    }
    assert got == brute


def test_substring_pass(spark):
    shared = "this long shared run of characters appears verbatim in two transcripts"
    rows = [
        ("s1", "prefix one two three " + shared + " suffix alpha"),
        ("s2", "completely different opening " + shared + " and another tail"),
        ("s3", "no overlap here at all just words " * 3),
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    pairs = ss.substring_candidate_pairs(df, "transcript", "clip_id", length=50)
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {("s1", "s2")}
    v = ss.verify_overlap_length(pairs, df, "transcript", "clip_id", min_length=50).collect()
    assert len(v) == 1 and v[0]["overlap_len"] >= len(shared)


def test_winnowed_substring_detects_guaranteed_runs(spark):
    # winnowing guarantee: shared run >= L + w - 1 always detected
    shared = "x" * 0 + "the guaranteed shared character run is this long ok!"  # 52 chars
    assert len(shared) >= 30 + 21 - 1
    rows = [
        ("w1", "unrelated prefix alpha beta " + shared),
        ("w2", shared + " totally different suffix gamma delta"),
        ("w3", "nothing in common with the others at all here words"),
    ]
    df = spark.createDataFrame(rows, "clip_id string, transcript string")
    pairs = ss.substring_candidate_pairs(
        df, "transcript", "clip_id", length=30, winnow_window=21
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert ("w1", "w2") in got
    assert not any("w3" in p for p in got)


def test_winnow_selection_properties():
    from cc_net_spark.functions.hashing import window_hashes, winnow

    h = window_hashes("a quick brown fox jumped over the lazy dog repeatedly", 10)
    sel = winnow(h, 7)
    assert 0 < len(sel) < len(h)
    assert set(sel.tolist()) <= set(h.tolist())
    # deterministic
    assert (winnow(h, 7) == sel).all()


def test_candidate_pairs_bucket_cap(spark):
    # one hot bucket (cap exceeded) must be dropped, with metrics
    rows = [("hot", f"id{i:02d}") for i in range(30)] + [("ok", "a"), ("ok", "b")]
    df = spark.createDataFrame(rows, "key string, clip_id string")
    pairs, metrics = candidate_pairs(
        df, ["key"], "clip_id", bucket_cap=10, with_metrics=True
    )
    got = {(r["id_a"], r["id_b"]) for r in pairs.collect()}
    assert got == {("a", "b")}
    assert metrics.n_buckets == 2
    assert metrics.n_buckets_dropped == 1
    assert metrics.n_rows_dropped == 30


def test_observe_metrics_match_eager(spark):
    """with_metrics='observe' (metrics computed inside the caller's own
    action — no second scan) must report exactly the eager groupBy
    numbers, for both the capped and the salted generator, even though
    the observed node is consumed by multiple self-join branches."""
    from cc_net_spark.operators.pairs import salted_candidate_pairs

    rows = (
        [("hot", f"id{i:02d}") for i in range(30)]
        + [("warm", f"w{i}") for i in range(8)]
        + [("ok", "a"), ("ok", "b"), ("solo", "s")]
    )
    df = spark.createDataFrame(rows, "key string, clip_id string")

    eager_p, eager_m = candidate_pairs(
        df, ["key"], "clip_id", bucket_cap=10, with_metrics=True
    )
    obs_p, resolve = candidate_pairs(
        df, ["key"], "clip_id", bucket_cap=10, with_metrics="observe"
    )
    obs_rows = {(r["id_a"], r["id_b"]) for r in obs_p.collect()}
    assert obs_rows == {(r["id_a"], r["id_b"]) for r in eager_p.collect()}
    assert resolve().__dict__ == eager_m.__dict__

    eager_p2, eager_m2 = salted_candidate_pairs(
        df, ["key"], "clip_id", hot_threshold=5, n_salts=4, bucket_cap=10,
        with_metrics=True,
    )
    obs_p2, resolve2 = salted_candidate_pairs(
        df, ["key"], "clip_id", hot_threshold=5, n_salts=4, bucket_cap=10,
        with_metrics="observe",
    )
    assert {(r["id_a"], r["id_b"]) for r in obs_p2.collect()} == {
        (r["id_a"], r["id_b"]) for r in eager_p2.collect()
    }
    assert resolve2().__dict__ == eager_m2.__dict__

    # ZERO-output case: every bucket over cap -> AQE empty-relation
    # propagation prunes the observed subtree and Observation.get fails;
    # resolve must fall back to the eager scan and still report the drops
    # (empty output coinciding with real truncation is exactly when the
    # counters matter most)
    only_hot = spark.createDataFrame(
        [("hot", f"id{i:02d}") for i in range(30)], "key string, clip_id string"
    )
    empty_p, resolve3 = candidate_pairs(
        only_hot, ["key"], "clip_id", bucket_cap=10, with_metrics="observe"
    )
    assert empty_p.count() == 0
    m3 = resolve3()
    assert m3.n_buckets == 1
    assert m3.n_buckets_dropped == 1
    assert m3.n_rows_dropped == 30


class UnionFind:
    def __init__(self):
        self.p = {}

    def find(self, x):
        self.p.setdefault(x, x)
        while self.p[x] != x:
            self.p[x] = self.p[self.p[x]]
            x = self.p[x]
        return x

    def union(self, a, b):
        ra, rb = self.find(a), self.find(b)
        if ra != rb:
            self.p[max(ra, rb)] = min(ra, rb)


def test_connected_components_vs_union_find(spark):
    rng = np.random.default_rng(7)
    edges = [
        (f"n{int(a):03d}", f"n{int(b):03d}")
        for a, b in rng.integers(0, 200, size=(300, 2))
        if a != b
    ]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    # distributed alternating-star path (driver fallback disabled) must
    # agree with the driver union-find path AND the python oracle
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    got_driver = {r["id"]: r["cluster_id"] for r in connected_components(df).collect()}
    assert got == got_driver
    uf = UnionFind()
    for a, b in edges:
        uf.union(a, b)
    expected = {n: uf.find(n) for n in {x for e in edges for x in e}}
    # canonicalize union-find roots to min member
    comp = {}
    for n, r in expected.items():
        comp.setdefault(r, []).append(n)
    expected_min = {n: min(comp[r]) for n, r in expected.items()}
    assert got == expected_min


def test_connected_components_empty_edges(spark):
    # a corpus with zero duplicate pairs must yield all-singleton clusters,
    # not CANNOT_INFER_EMPTY_SCHEMA (both id types, both paths)
    for ddl in ("id_a string, id_b string", "id_a long, id_b long"):
        empty = spark.createDataFrame([], ddl)
        for thresh in (2_000_000, 0):
            comp = connected_components(empty, driver_threshold=thresh)
            assert comp.count() == 0
            assert comp.columns == ["id", "cluster_id"]
    ids = spark.createDataFrame([("a",), ("b",)], "clip_id string")
    comp = connected_components(
        spark.createDataFrame([], "id_a string, id_b string")
    )
    assigned = {
        r["clip_id"]: r["cluster_id"]
        for r in assign_clusters(ids, comp, "clip_id").collect()
    }
    assert assigned == {"a": "a", "b": "b"}


def test_connected_components_known_edge_count_skips_sizing(spark):
    # edge_count passed from a stage manifest takes the driver path with
    # no sizing count() job; result identical to the default path
    edges = [("x1", "x2"), ("x2", "x3"), ("y1", "y2")]
    df = spark.createDataFrame(edges, "id_a string, id_b string")
    got = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, edge_count=len(edges)).collect()
    }
    assert got == {"x1": "x1", "x2": "x1", "x3": "x1", "y1": "y1", "y2": "y1"}


def test_connected_components_chain_and_singletons(spark):
    # a long chain exercises multi-round convergence
    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)]
    df = spark.createDataFrame(chain, "id_a string, id_b string")
    comp = connected_components(df, driver_threshold=0)
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    assert set(got.values()) == {"c00"}
    assert len(got) == 31
    ids = spark.createDataFrame([(f"c{i:02d}",) for i in range(33)], "clip_id string")
    assigned = {r["clip_id"]: r["cluster_id"] for r in assign_clusters(ids, comp, "clip_id").collect()}
    assert assigned["c31"] == "c31" and assigned["c32"] == "c32"
    assert assigned["c15"] == "c00"


def test_connected_components_durable_checkpoint(spark, tmp_path):
    """checkpoint_dir= runs the forced-distributed rounds with durable
    parquet checkpoints (cluster-safe: survives executor loss, unlike
    executor-local localCheckpoint blocks) — same assignments, and the
    ping-pong round files really exist on disk."""
    import os

    chain = [(f"c{i:02d}", f"c{i + 1:02d}") for i in range(30)]
    df = spark.createDataFrame(chain, "id_a string, id_b string")
    ck = tmp_path / "cc_ckpt"
    comp = connected_components(df, driver_threshold=0, checkpoint_dir=str(ck))
    got = {r["id"]: r["cluster_id"] for r in comp.collect()}
    exp = {
        r["id"]: r["cluster_id"]
        for r in connected_components(df, driver_threshold=0).collect()
    }
    assert got == exp and set(got.values()) == {"c00"}
    rounds = sorted(os.listdir(ck))
    assert rounds and all(r.startswith("round_") for r in rounds)
    assert len(rounds) <= 2  # ping-pong keeps storage at ~2x one round


def test_salted_candidate_pairs_full_recall_on_hot_bucket(spark):
    """Salting a hot bucket must produce the EXACT pair set of the
    uncapped self-join (no recall loss, unlike the cap), for every salt
    orientation; cold buckets take the plain path."""
    from cc_net_spark.operators.pairs import candidate_pairs, salted_candidate_pairs

    rows = [("hot", f"m{i:03d}") for i in range(60)]  # 60 members -> 1770 pairs
    rows += [("cold", "x1"), ("cold", "x2"), ("cold", "x3")]
    df = spark.createDataFrame(rows, "bucket string, id string")

    got = {
        (r["id_a"], r["id_b"])
        for r in salted_candidate_pairs(
            df, ["bucket"], "id", hot_threshold=10, n_salts=4
        ).collect()
    }
    exact = {
        (r["id_a"], r["id_b"])
        for r in candidate_pairs(df, ["bucket"], "id", bucket_cap=10**6).collect()
    }
    assert got == exact
    assert len(got) == 60 * 59 // 2 + 3

    # bucket_cap on top still drops pathological buckets entirely
    capped = salted_candidate_pairs(
        df, ["bucket"], "id", hot_threshold=10, n_salts=4, bucket_cap=50
    ).collect()
    assert {(r["id_a"], r["id_b"]) for r in capped} == {
        ("x1", "x2"), ("x1", "x3"), ("x2", "x3")
    }
