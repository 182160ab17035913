"""End-to-end `mine` composition (the reference's main pipeline,
cc_net/mine.py:36-45): dedup -> lid -> lm -> bucket -> minify ->
split_by_lang."""

from pyspark.sql import functions as F

from cc_net_spark.plans.mine import mine


def _docs(spark):
    rows = [
        # en docs sharing a duplicated paragraph (dropped by two-pass)
        (1, "the cat sat on the mat and it was good\nunique one for the dog"),
        (2, "the cat sat on the mat and it was good\nanother unique line is here"),
        # de doc
        (3, "der hund ist nicht auf der matte und das ist gut"),
        # junk doc (heavy digits/punct -> tail bucket candidate)
        (4, "!!! 111 ??? 222 ### 333 $$$ 444 %%% 555 ^^^ 666 *** 777 !!!"),
        # doc that is entirely a duplicated paragraph -> vanishes
        (5, "the cat sat on the mat and it was good"),
    ]
    return spark.createDataFrame(rows, "doc_id long, raw_content string")


def test_mine_end_to_end(spark, tmp_path):
    out = mine(
        spark, _docs(spark), langs=["en", "de"], drop_tail=False,
        output_path=str(tmp_path / "mined"),
    )
    docs = {r["doc_id"]: r for r in out["docs"].collect()}
    # doc 5 vanished (every paragraph was a corpus-wide duplicate);
    # docs 1/2 lost the shared paragraph but kept their unique lines
    assert 5 not in docs
    assert docs[1]["raw_content"] == "unique one for the dog"
    assert docs[1]["lang"] == "en" and docs[3]["lang"] == "de"
    assert 4 not in docs  # junk doc has no en/de stopwords -> keep_lang drops
    for r in docs.values():
        assert r["bucket"] in ("head", "middle", "tail")
        assert r["perplexity"] >= 0.0

    # reference parity: top-5 LID maps before AND after dedup
    # (cc_net/mine.py:362-376, split_by_lang.py:52-112) — doc 1's raw
    # text is stopword-heavy, the surviving line has fewer hits, so the
    # two maps must differ; every map ranks en first for doc 1
    for r in docs.values():
        assert set(r["lid_before_dedup"]) == {"en", "de", "fr", "es", "it"}
        assert len(r["lid_after_dedup"]) == 5
    before1 = docs[1]["lid_before_dedup"]
    after1 = docs[1]["lid_after_dedup"]
    assert max(before1, key=before1.get) == "en"
    assert before1["en"] > after1["en"] >= 0.0  # dedup changed the text

    meta = {r["doc_id"]: r for r in out["metadata"].collect()}
    assert set(meta) == set(docs)
    assert meta[1]["line_ids"] == [1]  # surviving paragraph was line 1
    assert "language" in out["metadata"].columns

    # split_by_lang sink: one directory per (lang, bucket)
    dirs = {p.name for p in (tmp_path / "mined").glob("lang=*")}
    assert dirs == {"lang=en", "lang=de"}
    back = spark.read.parquet(str(tmp_path / "mined"))
    assert back.count() == len(docs)
    assert {r["lang"] for r in back.select("lang").distinct().collect()} == {"en", "de"}


def test_mine_deterministic(spark):
    a = {(r["doc_id"], r["perplexity"], r["bucket"]) for r in
         mine(spark, _docs(spark), drop_tail=False)["docs"].collect()}
    b = {(r["doc_id"], r["perplexity"], r["bucket"]) for r in
         mine(spark, _docs(spark), drop_tail=False)["docs"].collect()}
    assert a == b
