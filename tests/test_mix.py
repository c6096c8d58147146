"""Training-mix builder (ops.mix.build_training_mix): stage composition,
manifest counters, determinism, stage skipping."""

from __future__ import annotations

import pytest

from datascrapexter_spark.ops.mix import MixConfig, MixRun, build_training_mix

GOOD = ("the quick brown fox jumps over the lazy dog while the sun sets "
        "slowly behind the quiet hills and the river keeps moving along")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = [
        (1, "keep.com", GOOD),                      # clean english
        (2, "keep.com", GOOD + " second variant"),  # clean english
        (3, "keep.com", GOOD),                      # exact dup of 1 -> dropped
        (4, "keep.com", "x y"),                     # low quality -> dropped
        (5, "block.com", GOOD + " blocked site"),   # blocklisted domain
        (6, "keep.com", "der und die das ist ein mit von auf nicht"),  # german
    ]
    return spark.createDataFrame(rows, "doc_id long, source string, text string")


def test_stage_composition_and_manifest(spark, corpus):
    cfg = MixConfig(min_quality_ppm=500_000, max_noise_ppm=10_000,
                    langs=("en",), blocked_domains=("block.com",),
                    domain_col="source", dedup=True,
                    lang_rates={}, default_lang_rate=1.0,
                    token_budget=None)
    run = build_training_mix(corpus, cfg)
    assert run.stages == ["after_quality", "after_noise", "after_lang",
                          "after_blocklist", "after_dedup"]
    kept = sorted(r["doc_id"] for r in run.df.collect())
    assert kept == [1, 2]          # 3 dup, 4 junk, 5 blocked, 6 german
    m = run.manifest()
    assert m["kept_docs"] == 2
    assert m["kept_tokens"] == sum(
        len(r["text"].split()) for r in corpus.collect() if r["doc_id"] in (1, 2))


def test_budget_cut_and_determinism(spark, corpus):
    cfg = MixConfig(min_quality_ppm=0, max_noise_ppm=None, langs=None,
                    dedup=False, token_budget=40)
    r1 = build_training_mix(corpus, cfg)
    r2 = build_training_mix(corpus, cfg)
    rows1 = sorted((r["doc_id"], r["cum_tokens"]) for r in r1.df.collect())
    rows2 = sorted((r["doc_id"], r["cum_tokens"]) for r in r2.df.collect())
    assert rows1 == rows2 and rows1           # same mix every run
    assert max(c for _, c in rows1) <= 40
    assert r1.stages == ["after_budget"]


def test_blocklist_requires_domain_col(spark, corpus):
    with pytest.raises(ValueError):
        build_training_mix(corpus, MixConfig(blocked_domains=("x",),
                                             domain_col=None))


def test_corpus_report(spark):
    from datascrapexter_spark.ops.mix import corpus_report

    good = ("the quick brown fox jumps over the lazy dog and keeps on "
            "running through the quiet field near the old farm house")
    rows = [(1, good), (2, good),          # exact dup pair
            (3, good + " unique tail"),
            (4, "z q w")]                  # low quality, no stopwords
    df = spark.createDataFrame(rows, "doc_id long, text string")
    m = {r["metric"]: r["value"] for r in corpus_report(df).collect()}
    assert m["n_docs"] == 4
    assert m["n_exact_dup_docs"] == 1
    assert m["n_low_quality"] == 1
    assert m["n_en"] == 3 and m["n_lang_unknown"] == 1
    assert m["n_noisy"] == 0
    assert m["total_tokens"] == sum(len(t.split()) for _, t in rows)
