"""Domain-level quality rollup + blocklist (textstats.domain_quality_rollup,
apply_domain_blocklist): the RefinedWeb-style whole-site filter."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.ops import textstats

GOOD = ("the quick brown fox jumps over the lazy dog while the sun "
        "settles slowly behind the quiet hills of the old town")


@pytest.fixture(scope="module")
def corpus(spark):
    rows = []
    # clean.example: 6 distinct good docs -> not blocked
    for i in range(6):
        rows.append((i, "clean.example", GOOD + f" variant {i}"))
    # junk.example: 6 docs, 3 degraded ("x y" -> quality 0.3) -> low gate
    for i in range(6):
        rows.append((10 + i, "junk.example", "x y" if i % 2 == 0 else GOOD + f" v{i}"))
    # mirror.example: 6 docs, 4 identical -> dup gate
    for i in range(6):
        rows.append((20 + i, "mirror.example",
                     GOOD if i < 4 else GOOD + f" tail {i}"))
    # tiny.example: 2 junk docs but below min_docs -> never blocked
    rows.append((30, "tiny.example", "x y"))
    rows.append((31, "tiny.example", "x y"))
    return rows


def _rollup(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, source string, text string")
    out = textstats.domain_quality_rollup(
        df, "source", min_docs=5,
        max_low_frac_ppm=250_000, max_dup_frac_ppm=250_000)
    return {r["host"]: r.asDict() for r in out.collect()}


def test_blocklist_decisions(spark, corpus):
    by = _rollup(spark, corpus)
    assert not by["clean.example"]["blocked"]
    assert by["junk.example"]["blocked"]          # 3/6 low quality
    assert by["mirror.example"]["blocked"]        # 3/6 duplicate pages
    assert not by["tiny.example"]["blocked"]      # below min_docs


def test_ppm_arithmetic_exact(spark, corpus):
    by = _rollup(spark, corpus)
    j = by["junk.example"]
    assert j["n_docs"] == 6
    assert j["low_quality_frac_ppm"] == 500_000   # 3/6 exactly
    m = by["mirror.example"]
    # 6 docs, 3 distinct fingerprints -> dup_frac = 3/6
    assert m["dup_frac_ppm"] == 500_000
    c = by["clean.example"]
    assert c["low_quality_frac_ppm"] == 0 and c["dup_frac_ppm"] == 0
    # "variant {i}" digits shave alpha_ratio slightly below 1.0
    assert 990_000 < c["mean_quality_ppm"] <= 1_000_000


def test_apply_blocklist_broadcast_anti(spark, corpus):
    df = spark.createDataFrame(corpus, "doc_id long, source string, text string")
    rollup = textstats.domain_quality_rollup(
        df, "source", min_docs=5,
        max_low_frac_ppm=250_000, max_dup_frac_ppm=250_000)
    kept = textstats.apply_domain_blocklist(df, rollup, "source")
    hosts = {r["source"] for r in kept.select("source").distinct().collect()}
    assert hosts == {"clean.example", "tiny.example"}
    plan = kept._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan


def test_crawl_blocklist_gate_sim_parity(spark, tmp_path):
    """blocked_domains: out-links to a blocked registered domain never
    enter the frontier or seen set; crawl order bit-exact vs the oracle
    simulator. Seeds are NOT gated."""
    from tests.crawl_oracle import CrawlSimulator
    from tests.test_crawl_engine import make_cfg, run_spark_crawl, spark_log

    # distinct REGISTERED domains (the gate keys on eTLD+1:
    # registered_domain("junk.ex.com") would collapse to "ex.com")
    good, bad = "good-site.com", "junk-site.com"
    home = (f'<html><body><a href="https://{good}/a">a</a>'
            f'<a href="https://{bad}/spam">spam</a></body></html>')
    rows = [
        (f"https://{good}/", None, home.encode(), "", "en"),
        (f"https://{good}/a", None, b"<html><h1>a</h1></html>", "", "en"),
        (f"https://{bad}/spam", None, b"<html><h1>s</h1></html>", "", "en"),
    ]
    seeds = [(f"https://{good}/", 5)]
    web = (rows, seeds, {})
    cfg = make_cfg(blocked_domains=("junk-site.com",), max_rounds=4,
                   restrict_to_seed_hosts=False)
    engine, _ = run_spark_crawl(spark, tmp_path, web, cfg)
    sim = CrawlSimulator.from_raw(web[0], web[2], cfg)
    sim.run(web[1])
    assert spark_log(engine) == sim.sorted_log()
    scheduled = {row[3] for row in spark_log(engine)}
    assert f"https://{good}/a" in scheduled
    assert not any(bad in u for u in scheduled)

    # gate off: the junk link IS crawled
    cfg_off = make_cfg(max_rounds=4, restrict_to_seed_hosts=False)
    engine2, _ = run_spark_crawl(spark, tmp_path / "off", web, cfg_off)
    sim2 = CrawlSimulator.from_raw(web[0], web[2], cfg_off)
    sim2.run(web[1])
    assert spark_log(engine2) == sim2.sorted_log()
    assert any(bad in u for u in {row[3] for row in spark_log(engine2)})


def test_encoding_noise_hand_computed(spark):
    """encoding_noise_cols: exact counts on hand-built strings."""
    from datascrapexter_spark.ops.textstats import encoding_noise_cols

    rows = [
        (1, "clean plain ascii text"),
        (2, "caf\u00c3\u00a9 twice caf\u00c3\u00a9"),            # 2 mojibake seqs
        (3, "bad \ufffd and \ufffd and \ufffd"),                  # 3 replacement chars
        (4, "ctl\x07and\x1fbytes"),                                # 2 C0 controls
        (5, ""),                                                     # empty -> all zeros
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    nz = encoding_noise_cols("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(k) for k, c in nz.items()]).collect()}
    assert out[1]["noise_ppm"] == 0
    assert out[2]["n_mojibake"] == 2 and out[2]["n_replacement"] == 0
    assert out[3]["n_replacement"] == 3
    assert out[4]["n_control"] == 2
    assert out[5]["noise_ppm"] == 0
    # ppm floor arithmetic: 3 noise chars / len chars
    n = len(rows[2][1])
    assert out[3]["noise_ppm"] == (1_000_000 * 3) // len("bad \ufffd and \ufffd and \ufffd")


def test_readability_hand_computed(spark):
    from datascrapexter_spark.ops.textstats import readability_cols

    rows = [(1, "The cat sat. The dog ran! Did it rain?"),
            (2, "word")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    rc = readability_cols("text")
    out = {r["doc_id"]: r for r in df.select(
        "doc_id", *[c.alias(k) for k, c in rc.items()]).collect()}
    d = out[1]
    assert d["n_words"] == 9 and d["n_sentences"] == 3
    # vowel groups: e,a,a,e,o,a,i,i,ai -> 9
    assert d["n_syllables"] == 9
    assert d["flesch_milli"] == 206835 - (1015 * 9) // 3 - (84600 * 9) // 9
    s = out[2]
    assert s["n_words"] == 1 and s["n_sentences"] == 1 and s["n_syllables"] == 1
    assert s["flesch_milli"] == 206835 - 1015 - 84600


def test_collocations_hand_computed(spark):
    """Integer lift on a tiny corpus + TakeOrderedAndProject top-k plan."""
    from datascrapexter_spark.ops.textstats import collocations

    # "new york" always adjacent (5x); "the city" 5x but 'the' appears 10x
    rows = [(i, "the city has new york and the town") for i in range(5)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = collocations(df, k=10, min_count=5)
    got = {r["bigram"]: (r["n_pair"], r["lift_ppm"]) for r in out.collect()}
    # counts: each doc has 7 bigrams -> N = 35; 'new'=5,'york'=5,
    # 'new york'=5 -> lift = 1e6*5*35/(5*5) = 7_000_000
    assert got["new york"] == (5, 7_000_000)
    # 'the'=10,'city'=5,'the city'=5 -> 1e6*5*35/(10*5) = 3_500_000
    assert got["the city"] == (5, 3_500_000)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
