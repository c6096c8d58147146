"""Round-5 batch 3: positional phrase search (q93), stupid-backoff
word-LM scores (q94), exact group quantiles (q95), CDX snapshot delta
(q96), schedule-fairness Gini (q97)."""

from pyspark.sql import Row

from datascrapexter_spark.functions.surt import cdx_delta
from datascrapexter_spark.monitoring import schedule_fairness
from datascrapexter_spark.ops.retrieval import phrase_search
from datascrapexter_spark.ops.sketches import exact_group_quantiles
from datascrapexter_spark.ops.textstats import stupid_backoff_scores


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


# --------------------------------------------------------- phrase search


def test_phrase_adjacent_only(spark):
    docs = _docs(spark, [(1, "big red fox"),
                         (2, "big fox red"),       # words, wrong order
                         (3, "big red herring"),   # prefix only
                         (4, "the big red fox ran")])
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "big red fox").collect()}
    assert out == {1: 1, 4: 1}


def test_phrase_overlapping_and_repeated_word(spark):
    # "a b a b a" contains "a b a" at starts 0 and 2 (overlapping)
    docs = _docs(spark, [(1, "a b a b a"), (2, "a b a"), (3, "b a b")])
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "a b a").collect()}
    assert out == {1: 2, 2: 1}


def test_phrase_case_insensitive_single_word(spark):
    docs = _docs(spark, [(1, "Hello world Hello"), (2, "goodbye")])
    out = {r["doc_id"]: r["n_matches"]
           for r in phrase_search(docs, "hello").collect()}
    assert out == {1: 2}


def test_phrase_empty_raises(spark):
    docs = _docs(spark, [(1, "x")])
    try:
        phrase_search(docs, "   ")
    except ValueError:
        pass
    else:
        raise AssertionError("empty phrase must raise")


# ------------------------------------------------------ stupid backoff LM


def test_backoff_seen_bigram_exact_ppm(spark):
    # training: "x y" twice, "x z" once -> ctx(x)=3, c2(x,y)=2
    train = _docs(spark, [(0, "x y"), (2, "x y"), (4, "x z")])
    score = _docs(spark, [(1, "x y")])
    r = stupid_backoff_scores(train, score).collect()[0]
    assert r["n_bigrams"] == 1
    assert r["sum_ppm"] == (1_000_000 * 2) // 3
    assert r["avg_ppm"] == r["sum_ppm"]


def test_backoff_unseen_bigram_uses_unigram(spark):
    # "y x" never trained; uni(y) counts y as bigram END: c2 table is
    # {(x,y):1,(y,z):1} -> uni(y)=1, T=2 -> 400000*1//2 = 200000
    train = _docs(spark, [(0, "x y z")])
    score = _docs(spark, [(1, "q y")])  # (q,y) unseen, y known end
    r = stupid_backoff_scores(train, score).collect()[0]
    assert r["sum_ppm"] == 200_000


def test_backoff_unseen_unigram_zero_and_short_doc(spark):
    train = _docs(spark, [(0, "x y")])
    score = _docs(spark, [(1, "q zz"), (3, "solo"), (5, "")])
    rows = {r["doc_id"]: r for r in
            stupid_backoff_scores(train, score).collect()}
    assert rows[1]["sum_ppm"] == 0          # zz never seen anywhere
    assert rows[3]["n_bigrams"] == 0        # 1 token -> no bigrams
    assert rows[5]["n_bigrams"] == 0        # empty doc kept, zeros
    assert set(rows) == {1, 3, 5}


# -------------------------------------------------------- exact quantiles


def test_quantiles_type1_discrete(spark):
    df = spark.createDataFrame(
        [Row(g="a", v=i) for i in range(1, 11)]      # 1..10
        + [Row(g="b", v=5) for _ in range(4)])
    out = {r["g"]: r for r in
           exact_group_quantiles(df, "g", "v").collect()}
    # type-1 lower quantile: smallest v with cum >= ceil(p*n/100)
    assert (out["a"]["p50"], out["a"]["p90"], out["a"]["p99"]) == (5, 9, 10)
    assert out["a"]["n"] == 10
    assert (out["b"]["p50"], out["b"]["p99"]) == (5, 5)


def test_quantiles_ties_collapse(spark):
    # heavy ties: histogram has 2 rows, quantiles still exact
    df = spark.createDataFrame([Row(g="x", v=1)] * 99 + [Row(g="x", v=100)])
    r = exact_group_quantiles(df, "g", "v").collect()[0]
    assert (r["p50"], r["p90"], r["p99"]) == (1, 1, 1)
    assert r["n"] == 100


# -------------------------------------------------------------- cdx delta


def test_cdx_delta_statuses(spark):
    old = spark.createDataFrame([
        Row(surt_key="com,a)/p1", digest="d1"),
        Row(surt_key="com,a)/p2", digest="d2"),
        Row(surt_key="com,a)/gone", digest="d3")])
    new = spark.createDataFrame([
        Row(surt_key="com,a)/p1", digest="d1"),        # unchanged
        Row(surt_key="com,a)/p2", digest="d2x"),       # changed
        Row(surt_key="net,b)/fresh", digest="d4")])    # added
    out = {r["surt_key"]: r for r in cdx_delta(old, new).collect()}
    assert out["com,a)/p1"]["status"] == "unchanged"
    assert out["com,a)/p2"]["status"] == "changed"
    assert out["com,a)/gone"]["status"] == "removed"
    assert out["net,b)/fresh"]["status"] == "added"
    assert out["net,b)/fresh"]["host_rev"] == "net,b"
    assert out["com,a)/gone"]["new_digest"] is None


def test_cdx_delta_latest_capture_wins(spark):
    import datetime as dt
    t0 = dt.datetime(2026, 1, 1)
    t1 = dt.datetime(2026, 1, 2)
    old = spark.createDataFrame([
        Row(surt_key="com,a)/p", ts=t0, digest="old"),
        Row(surt_key="com,a)/p", ts=t1, digest="cur")])
    new = spark.createDataFrame([
        Row(surt_key="com,a)/p", ts=t1, digest="cur")])
    r = cdx_delta(old, new).collect()[0]
    assert r["status"] == "unchanged" and r["old_digest"] == "cur"


# --------------------------------------------------------------- fairness


def test_gini_uniform_is_zero(spark):
    df = spark.createDataFrame([Row(host=f"h{i}", w=7) for i in range(10)])
    r = schedule_fairness(df, "host", "w").collect()[0]
    assert r["gini_ppm"] == 0 and r["n_hosts"] == 10 and r["total"] == 70


def test_gini_concentrated_near_one(spark):
    # one host holds 991 of 1000 units across 10 hosts
    rows = [Row(host="big", w=991)] + [Row(host=f"h{i}", w=1)
                                       for i in range(9)]
    r = schedule_fairness(spark.createDataFrame(rows), "host", "w") \
        .collect()[0]
    # exact: gini = sum((2i-n-1)x_i)/(n*sum) with x sorted asc
    xs = sorted([991] + [1] * 9)
    n, s = len(xs), sum(xs)
    expect = (1_000_000 * sum((2 * (i + 1) - n - 1) * x
                              for i, x in enumerate(xs))) // (n * s)
    assert r["gini_ppm"] == expect


def test_gini_unweighted_counts_rows(spark):
    df = spark.createDataFrame(
        [Row(host="a"), Row(host="a"), Row(host="b")])
    r = schedule_fairness(df, "host").collect()[0]
    assert r["total"] == 3 and r["n_hosts"] == 2
    xs = [1, 2]
    n, s = 2, 3
    expect = (1_000_000 * sum((2 * (i + 1) - n - 1) * x
                              for i, x in enumerate(xs))) // (n * s)
    assert r["gini_ppm"] == expect


def test_quantiles_nulls_excluded(spark):
    from pyspark.sql import functions as F
    df = spark.createDataFrame(
        [Row(g="x", v=1), Row(g="x", v=3)]).unionByName(
        spark.range(2).select(F.lit("x").alias("g"),
                              F.lit(None).cast("long").alias("v")))
    r = exact_group_quantiles(df, "g", "v").collect()[0]
    assert r["n"] == 2 and (r["p50"], r["p99"]) == (1, 3)
