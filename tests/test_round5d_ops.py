"""Round-5 batch 4: corpus-diff keywords (q98), n-gram memorization
risk (q99), sitemap coverage audit (q100)."""

from pyspark.sql import Row

from datascrapexter_spark.ops.dedup import ngram_risk_scores
from datascrapexter_spark.ops.textstats import corpus_diff_keywords
from datascrapexter_spark.sources.sitemap import sitemap_coverage


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# ------------------------------------------------------ corpus diff


def test_diff_markers_dominate(spark):
    a = _docs(spark, [(1, "shared shared zonk"), (2, "shared zonk")])
    b = _docs(spark, [(3, "shared shared quux"), (4, "shared quux")])
    out = corpus_diff_keywords(a, b, k=5).collect()
    by_dir = {}
    for r in out:
        by_dir.setdefault(r["direction"], []).append(r)
    assert by_dir["a"][0]["token"] == "zonk"
    assert by_dir["b"][0]["token"] == "quux"
    # zonk: a_ppm = 2e6*? -> a has 5 tokens, zonk 2 -> 400000 ppm; b 0
    zonk = by_dir["a"][0]
    assert (zonk["a_n"], zonk["b_n"]) == (2, 0)
    assert zonk["a_ppm"] == (1_000_000 * 2) // 5
    assert zonk["diff_ppm"] == zonk["a_ppm"]
    assert zonk["lift_milli"] == (1000 * (zonk["a_ppm"] + 1)) // 1


def test_diff_shared_vocab_cancels(spark):
    a = _docs(spark, [(1, "x y"), (2, "x y")])
    b = _docs(spark, [(3, "x y"), (4, "x y")])
    assert corpus_diff_keywords(a, b, k=5).count() == 0


def test_diff_k_caps_each_direction(spark):
    a = _docs(spark, [(1, " ".join(f"a{i}" for i in range(10)))])
    b = _docs(spark, [(2, " ".join(f"b{i}" for i in range(10)))])
    out = corpus_diff_keywords(a, b, k=3).collect()
    assert sum(1 for r in out if r["direction"] == "a") == 3
    assert sum(1 for r in out if r["direction"] == "b") == 3
    # tie-break: equal diff -> token ascending
    assert [r["token"] for r in out if r["direction"] == "a"] \
        == ["a0", "a1", "a2"]


# ------------------------------------------------------- n-gram risk


def test_risk_duplicated_doc_full_risk(spark):
    text = " ".join(f"w{i}" for i in range(12))   # 5 8-gram instances
    docs = _docs(spark, [(1, text), (2, text),
                         (3, " ".join(f"u{i}" for i in range(12)))])
    rows = {r["doc_id"]: r for r in ngram_risk_scores(docs).collect()}
    assert rows[1]["n_instances"] == 5 and rows[1]["risk_ppm"] == 1_000_000
    assert rows[2]["risk_ppm"] == 1_000_000
    assert rows[3]["risk_ppm"] == 0 and rows[3]["n_risky"] == 0


def test_risk_short_doc_single_shingle(spark):
    docs = _docs(spark, [(1, "tiny doc"), (2, "tiny doc"), (3, "other")])
    rows = {r["doc_id"]: r for r in ngram_risk_scores(docs).collect()}
    # < 8 tokens -> exactly one (short) shingle per doc
    assert rows[1]["n_instances"] == 1
    assert rows[1]["risk_ppm"] == 1_000_000   # duplicated short doc
    assert rows[3]["risk_ppm"] == 0


def test_risk_partial_overlap(spark):
    shared = " ".join(f"s{i}" for i in range(8))          # one shared 8-gram
    docs = _docs(spark, [(1, shared + " x1 x2 x3"),
                         (2, shared + " y1 y2 y3")])
    rows = {r["doc_id"]: r for r in ngram_risk_scores(docs).collect()}
    # 4 instances each (11 tokens), only the pure-shared first one risky
    assert rows[1]["n_instances"] == 4
    assert rows[1]["n_risky"] == 1
    assert rows[1]["risk_ppm"] == 250_000


# -------------------------------------------------- sitemap coverage


def test_coverage_counters(spark):
    listed = spark.createDataFrame(
        [Row(loc=f"https://a.com/p{i}") for i in range(4)]
        + [Row(loc="https://b.com/only-listed")])
    crawled = spark.createDataFrame(
        [Row(url=f"https://a.com/p{i}") for i in range(2)]
        + [Row(url="https://a.com/unlisted"),
           Row(url="https://c.com/stray")])
    out = {r["host"]: r for r in
           sitemap_coverage(listed, crawled).collect()}
    a = out["a.com"]
    assert (a["n_listed"], a["n_crawled"], a["n_missed"],
            a["n_unlisted"]) == (4, 2, 2, 1)
    assert a["coverage_ppm"] == 500_000
    assert out["b.com"]["coverage_ppm"] == 0
    assert out["c.com"]["n_listed"] == 0 and out["c.com"]["coverage_ppm"] == 0


def test_coverage_distinct_and_host_col(spark):
    listed = spark.createDataFrame(
        [Row(loc="https://a.com/p", h="a.com")] * 3)   # dup listings
    crawled = spark.createDataFrame(
        [Row(url="https://a.com/p", h="a.com")] * 2)   # dup captures
    r = sitemap_coverage(listed, crawled, host_col="h").collect()[0]
    assert (r["host"], r["n_listed"], r["n_crawled"]) == ("a.com", 1, 1)
    assert r["coverage_ppm"] == 1_000_000


# ------------------------------------------- reliable-checkpoint seam


def test_cc_reliable_checkpoint_seam(spark, tmp_path):
    import os

    from datascrapexter_spark.ops.dedup import connected_components

    nodes = spark.createDataFrame([Row(doc_id=i) for i in range(8)])
    pairs = spark.createDataFrame(
        [Row(id_a=0, id_b=1), Row(id_a=1, id_b=2), Row(id_a=5, id_b=6)])
    base = {r["doc_id"]: r["cluster_id"]
            for r in connected_components(nodes, pairs).collect()}
    sc = spark.sparkContext
    ckdir = str(tmp_path / "ck")
    sc.setCheckpointDir(ckdir)
    try:
        rel = {r["doc_id"]: r["cluster_id"]
               for r in connected_components(nodes, pairs).collect()}
    finally:
        # reset to "no dir configured" so later tests keep the
        # localCheckpoint default ($eq setter needs getattr — the $ is
        # not valid Python attribute syntax)
        getattr(sc._jsc.sc(), "checkpointDir_$eq")(
            sc._jvm.scala.Option.apply(None))
    assert rel == base == {0: 0, 1: 0, 2: 0, 3: 3, 4: 4, 5: 5, 6: 5, 7: 7}
    # reliable checkpoint files actually landed in the configured dir
    found = [fn for _, _, files in os.walk(ckdir) for fn in files]
    assert found, "no reliable checkpoint data written"


# ------------------------------------------------- proximity search


def test_proximity_ordered_within_slop(spark):
    from datascrapexter_spark.ops.retrieval import proximity_search

    docs = _docs(spark, [(1, "alpha x beta"),        # distance 2
                         (2, "alpha x y z beta"),    # distance 4 > slop
                         (3, "beta alpha"),          # wrong order
                         (4, "alpha beta alpha beta")])
    out = {r["doc_id"]: r["n_pairs"]
           for r in proximity_search(docs, "alpha", "beta", slop=3)
           .collect()}
    # doc4: a@0->b@1 (1), a@0->b@3 (3), a@2->b@3 (1) = 3 pairs
    assert out == {1: 1, 4: 3}


def test_proximity_parity_random(spark):
    import random

    from datascrapexter_spark.ops.retrieval import proximity_search

    rng = random.Random(101)
    docs = [(i, " ".join(rng.choice(["a", "b", "x"])
                         for _ in range(rng.randint(0, 14))))
            for i in range(250)]

    def count(t, slop=3):
        toks = t.split()
        return sum(1 for i, x in enumerate(toks) if x == "a"
                   for j in range(i + 1, min(i + slop + 1, len(toks)))
                   if toks[j] == "b")

    expect = {i: count(t) for i, t in docs if count(t) > 0}
    df = spark.createDataFrame([Row(doc_id=i, text=t) for i, t in docs])
    got = {r["doc_id"]: r["n_pairs"]
           for r in proximity_search(df, "a", "b", slop=3).collect()}
    assert got == expect


def test_proximity_validation(spark):
    from datascrapexter_spark.ops.retrieval import proximity_search

    docs = _docs(spark, [(1, "x")])
    for bad in [("", "b", 3), ("a", "b", 0)]:
        try:
            proximity_search(docs, bad[0], bad[1], slop=bad[2])
        except ValueError:
            pass
        else:
            raise AssertionError(f"must raise for {bad}")
