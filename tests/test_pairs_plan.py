"""Plan-shape regression tests for the candidate-pair generators.

The round-4 scaling work pinned a specific physical shape (see
operators/pairs.py):

* ``assume_unique=True`` skips the defensive dropDuplicates shuffle for
  band tables that are one row per (bucket, id) by construction;
* bucket sizes come from a WINDOW COUNT over the self-join's own
  exchange — the bucket table is shuffled once (hash-partitioned +
  sorted on the bucket cols by WindowExec), the size filter runs in
  place, and the SortMergeJoin consumes both branches with NO further
  exchange or sort (the earlier groupBy-sizes + shuffle-hash join-back
  shape paid a second, partial-aggregated exchange);
* at runtime AQE reuses the band-table exchange across the self-join's
  two branches (ReusedExchange), so the band rows are shuffled ONCE.

These tests lock the shape so a refactor can't silently regress it.
"""

from __future__ import annotations

import io
import re
from contextlib import redirect_stdout

from pyspark.sql import functions as F

from cc_net_spark.operators.pairs import candidate_pairs, salted_candidate_pairs


def _bands(spark, n=400):
    # a few dozen buckets, several members each — all joins exercised
    return spark.createDataFrame(
        [(i % 13, i % 5, f"d{i:03d}") for i in range(n)],
        "band int, key long, clip_id string",
    )


def _static_plan(df) -> str:
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def _n_exchanges(plan: str) -> int:
    return len(re.findall(r"\(\d+\) Exchange", plan))


def test_candidate_pairs_plan_shape(spark):
    bands = _bands(spark)
    pairs = candidate_pairs(
        bands, ["band", "key"], "clip_id", bucket_cap=50, assume_unique=True
    )
    plan = _static_plan(pairs)
    # exactly 3 static exchanges: the band-table shuffle x 2 self-join
    # branches (deduped to one by AQE ReusedExchange at runtime, asserted
    # below) + the pair distinct. A 4th exchange means someone
    # re-partitioned between the window filter and the self-join — the
    # regression this test exists to catch. Count is pinned to the
    # repo's Spark (4.1.x); revisit consciously on upgrade.
    assert _n_exchanges(plan) == 3, plan
    tree = plan.split("== Physical Plan ==")[1].split("(1) ")[0]
    # sizes computed in place by a window over the join's own exchange
    assert len(re.findall(r"Window \(\d+\)", tree)) == 2, tree
    assert "SortMergeJoin" in tree, tree
    # the SMJ adds no sort of its own: the only sorts are WindowExec's
    # (immediately above each exchange), so each branch reads
    # ...SortMergeJoin <- Project <- Filter <- Window <- Sort <- Exchange
    assert len(re.findall(r"Sort \(\d+\)", tree)) == 2, tree
    # assume_unique really removes a shuffle vs the defensive path
    dedup_pairs = candidate_pairs(
        bands, ["band", "key"], "clip_id", bucket_cap=50, assume_unique=False
    )
    assert _n_exchanges(plan) < _n_exchanges(_static_plan(dedup_pairs))


def test_candidate_pairs_runtime_exchange_reuse(spark):
    bands = _bands(spark)
    pairs = candidate_pairs(
        bands, ["band", "key"], "clip_id", bucket_cap=50, assume_unique=True
    )
    # collect() executes THIS DataFrame's queryExecution (count() would
    # build a separate one), finalizing the adaptive plan
    pairs.collect()
    executed = pairs._jdf.queryExecution().executedPlan().toString()
    assert "isFinalPlan=true" in executed, executed
    # the band-table shuffle feeds both self-join branches ONCE
    assert "ReusedExchange" in executed, executed


def test_salted_candidate_pairs_plan_shape(spark):
    bands = _bands(spark)
    pairs = salted_candidate_pairs(
        bands, ["band", "key"], "clip_id", hot_threshold=8, assume_unique=True
    )
    plan = _static_plan(pairs)
    # sizes come from a window, not a groupBy+join-back
    assert re.search(r"Window \(\d+\)", plan), plan
    # identical output to the defensive path (uniqueness really holds here)
    base = salted_candidate_pairs(
        bands, ["band", "key"], "clip_id", hot_threshold=8, assume_unique=False
    )
    assert pairs.exceptAll(base).count() == 0
    assert base.exceptAll(pairs).count() == 0


def test_carry_pair_filter_equivalence(spark):
    """carry + pair_filter (pre-distinct) produce exactly the pairs a
    post-hoc join-back verify would — including through the hot-cell
    least/greatest canonicalization where carried columns must swap with
    their ids."""
    rows = [(i % 3, 0, f"d{i:02d}", i * 37 % 11) for i in range(60)]
    bands = spark.createDataFrame(rows, "band int, key long, id string, v long")
    flt = (F.col("v_a") + F.col("v_b")) % 2 == 0
    got = salted_candidate_pairs(
        bands, ["band", "key"], "id",
        hot_threshold=5, assume_unique=True, carry=["v"], pair_filter=flt,
    ).select("id_a", "id_b")
    base = salted_candidate_pairs(
        bands, ["band", "key"], "id", hot_threshold=5, assume_unique=True
    )
    vals = bands.select("id", "v").dropDuplicates(["id"])
    a = vals.select(F.col("id").alias("id_a"), F.col("v").alias("v_a"))
    b = vals.select(F.col("id").alias("id_b"), F.col("v").alias("v_b"))
    exp = base.join(a, "id_a").join(b, "id_b").filter(flt).select("id_a", "id_b")
    assert got.exceptAll(exp).count() == 0
    assert exp.exceptAll(got).count() == 0
    # carried values follow their ids: spot-check one emitted pair row
    row = salted_candidate_pairs(
        bands, ["band", "key"], "id",
        hot_threshold=5, assume_unique=True, carry=["v"],
    ).first()
    v_by_id = {r["id"]: r["v"] for r in vals.collect()}
    assert row["v_a"] == v_by_id[row["id_a"]]
    assert row["v_b"] == v_by_id[row["id_b"]]
