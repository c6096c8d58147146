"""Round-5 operators: SemDeDup semantic dedup (q82), DSIR importance
weights (q83), soft-404 detection (q84), CCNet surprisal tertiles (q85)."""

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datascrapexter_spark.ops.mix import dsir_weights
from datascrapexter_spark.ops.similarity import semantic_dedup_flags
from datascrapexter_spark.ops.textstats import (
    soft404_columns,
    surprisal_buckets,
)


# ---------------------------------------------------------------- SemDeDup


def _vecs(spark, rows):
    return spark.createDataFrame(
        [Row(vec_id=i, embedding=[float(x) for x in v]) for i, v in rows])


def test_semantic_dedup_exact_copy_flagged(spark):
    # two identical vectors + one orthogonal: the copy (larger id) is the
    # dup, the original and the orthogonal are kept
    out = semantic_dedup_flags(
        _vecs(spark, [(1, [1, 0, 0]), (2, [1, 0, 0]), (3, [0, 1, 0])]),
        n_centroids=2, threshold=0.99, train_iters=0,
    ).collect()
    flags = {r["vec_id"]: r["is_dup"] for r in out}
    assert flags == {1: False, 2: True, 3: False}


def test_semantic_dedup_cross_cell_pair_not_compared(spark):
    # identical vectors forced into different cells are NOT compared —
    # the documented SemDeDup within-cluster contract
    df = _vecs(spark, [(1, [1, 0, 0]), (2, [0, 1, 0])])
    out = semantic_dedup_flags(df, n_centroids=2, threshold=0.5,
                               train_iters=0).collect()
    cells = {r["vec_id"]: r["cell"] for r in out}
    if cells[1] != cells[2]:  # orthogonal -> different cells
        assert not any(r["is_dup"] for r in out)


def test_semantic_dedup_min_id_wins_chain(spark):
    # a ~ b ~ c all mutually similar in one cell: only min id survives
    base = [1.0, 0.5, 0.25]
    out = semantic_dedup_flags(
        _vecs(spark, [(10, base), (11, base), (12, base)]),
        n_centroids=1, threshold=0.99, train_iters=0,
    ).collect()
    flags = {r["vec_id"]: r["is_dup"] for r in out}
    assert flags == {10: False, 11: True, 12: True}


def test_semantic_dedup_every_row_present(spark):
    df = _vecs(spark, [(i, [float(i + 1), 1.0]) for i in range(20)])
    out = semantic_dedup_flags(df, n_centroids=4, threshold=0.999999,
                               train_iters=1)
    assert out.count() == 20
    assert set(out.columns) == {"vec_id", "cell", "is_dup"}


# -------------------------------------------------------------------- DSIR


def _docs(spark, rows):
    return spark.createDataFrame(
        [Row(doc_id=i, text=t) for i, t in rows])


def test_dsir_target_like_scores_higher(spark):
    raw = _docs(spark, [(1, "the cat sat"), (2, "xyzzy qwerty plugh"),
                        (3, "the cat sat on the mat")])
    target = _docs(spark, [(100, "the cat sat on the mat"),
                           (101, "the cat ran")])
    out = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n_buckets=4096).collect()}
    # doc 1 and 3 share target features; doc 2 has none -> max penalty
    assert out[1]["avg_millibits"] > out[2]["avg_millibits"]
    assert out[3]["avg_millibits"] > out[2]["avg_millibits"]


def test_dsir_feature_count_unigrams_plus_bigrams(spark):
    raw = _docs(spark, [(1, "a b c"), (2, "solo"), (3, "  ")])
    target = _docs(spark, [(9, "a b")])
    out = {r["doc_id"]: r for r in
           dsir_weights(raw, target, n_buckets=4096).collect()}
    assert out[1]["n_feats"] == 5      # 3 unigrams + 2 bigrams
    assert out[2]["n_feats"] == 1      # 1 unigram, no bigram
    assert out[3]["n_feats"] == 0      # empty doc contract
    assert out[3]["llr_bits"] == 0 and out[3]["avg_millibits"] == 0


def test_dsir_avg_truncates_toward_zero(spark):
    # negative llr: avg must truncate toward zero (match the SQL twin),
    # i.e. avg_millibits * n_feats >= 1000 * llr_bits for negative llr
    raw = _docs(spark, [(1, "zz yy")])
    target = _docs(spark, [(9, "aa bb cc dd ee")])
    r = dsir_weights(raw, target, n_buckets=4096).collect()[0]
    assert r["llr_bits"] < 0
    n, llr, avg = r["n_feats"], r["llr_bits"], r["avg_millibits"]
    assert 0 <= avg * n - 1000 * llr < n  # trunc toward zero, not floor


# ----------------------------------------------------------------- soft404


def test_soft404_signals(spark):
    pages = spark.createDataFrame([
        Row(doc_id=1, title="404 Not Found",
            text="The page you requested was not found."),
        Row(doc_id=2, title="Great recipes",
            text=" ".join(["word"] * 40)),
        Row(doc_id=3, title="Short page", text="tiny"),
        Row(doc_id=4, title="Oops - Error",
            text=" ".join(["word"] * 40)),
    ])
    out = {r["doc_id"]: r for r in pages.select(
        "doc_id", *soft404_columns("title", "text")).collect()}
    assert out[1]["is_soft404"] and out[1]["soft404_score"] == 5
    assert not out[2]["is_soft404"] and out[2]["soft404_score"] == 0
    # tiny body alone does not clear the threshold
    assert out[3]["tiny_body"] and not out[3]["is_soft404"]
    # title marker alone does
    assert out[4]["title_404"] and out[4]["is_soft404"]


# ------------------------------------------------------- surprisal buckets


def test_surprisal_buckets_thirds_and_order(spark):
    # 9 docs: 3 plain-repetitive (low surprisal), 3 mixed, 3 with rare
    # chars (high surprisal); buckets are thirds in surprisal order
    rows = []
    for i in range(3):
        rows.append((i, "aaaaaaaaaaaaaaaaaaaaaaaaaaaa"))
    for i in range(3, 6):
        rows.append((i, "the quick brown fox " * 3))
    for i in range(6, 9):
        rows.append((i, "q%7#xz@!v" + chr(0x2603) * 5 + f"{i}"))
    out = surprisal_buckets(_docs(spark, rows)).collect()
    assert len(out) == 9
    by_bucket = {}
    for r in out:
        by_bucket.setdefault(r["bucket"], []).append(r["avg_millibits"])
    assert set(by_bucket) == {"head", "middle", "tail"}
    assert max(by_bucket["head"]) <= min(by_bucket["middle"])
    assert max(by_bucket["middle"]) <= min(by_bucket["tail"])


def test_surprisal_buckets_ties_share_bucket(spark):
    # identical docs -> identical surprisal -> all land in 'head'
    out = surprisal_buckets(
        _docs(spark, [(i, "same text here") for i in range(6)])).collect()
    assert {r["bucket"] for r in out} == {"head"}


def test_surprisal_buckets_short_docs_zero(spark):
    out = {r["doc_id"]: r for r in surprisal_buckets(
        _docs(spark, [(1, "ab"), (2, "abcdefgh abcdefgh"),
                      (3, "zz!@#$%^&*()")])).collect()}
    assert out[1]["avg_millibits"] == 0  # < n chars -> 0 by q70 contract
    assert out[1]["bucket"] == "head"


# ------------------------------------------------------- mix composition


def test_mix_surprisal_tail_gate(spark):
    from datascrapexter_spark.ops.mix import MixConfig, build_training_mix

    rows = [(i, "the quick brown fox jumps over the lazy dog") for i in
            range(6)] + [(i, "z@#!%" + chr(0x2603) * 6 + str(i))
                         for i in range(6, 9)]
    docs = _docs(spark, rows)
    cfg = MixConfig(min_quality_ppm=0, max_noise_ppm=None, langs=None,
                    dedup=False, drop_surprisal_tail=True)
    run = build_training_mix(docs, cfg)
    kept_ids = {r["doc_id"] for r in run.df.select("doc_id").collect()}
    assert "after_surprisal" in run.stages
    # the 6 tied plain docs satisfy both cutoffs (cum=6, 3*6 >= 9 and
    # >= 2*9) so they are all head; the 3 rare-char docs are the tail
    assert kept_ids == set(range(6))


def test_mix_dsir_gate(spark):
    from datascrapexter_spark.ops.mix import MixConfig, build_training_mix

    # raw = target-identical doc + junk doc: the target doc's buckets
    # carry identical counts in both models (score 0/feature), the junk
    # doc's buckets are target-absent (score -1/feature at these totals:
    # bits_r == bits_t, bitlen(1) - 0 = 1) -> avg exactly -1000
    docs = _docs(spark, [(1, "the cat sat " * 20),
                         (2, "qwerty xyzzy plugh foobar")])
    target = _docs(spark, [(9, "the cat sat " * 20)])
    cfg = MixConfig(min_quality_ppm=0, max_noise_ppm=None, langs=None,
                    dedup=False, dsir_target=target,
                    min_dsir_millibits=-500)
    run = build_training_mix(docs, cfg)
    kept_ids = {r["doc_id"] for r in run.df.select("doc_id").collect()}
    assert "after_dsir" in run.stages
    assert kept_ids == {1}
