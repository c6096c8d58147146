"""Spider-trap detection on targeted URL fixtures — covers the flag
boundaries the synthetic q52 corpus does not (deep_path, UUID session
values, repeat threshold at exactly 2 surplus, shallow calendar paths)
plus filter_traps and plan shape (single codegen Filter, no Python)."""
from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from datascrapexter_spark.frontier.traps import filter_traps, trap_cols

CASES = [
    # (url, flag_name_expected_true...), checked against trap_cols
    ("https://a.com/x/y?page=1", []),
    ("https://a.com/a/b/a/b", ["repeat_trap", "is_trap"]),
    # one duplicate segment only (surplus 1) is not a trap
    ("https://a.com/a/b/a", []),
    ("https://a.com/p/q/r/2024/7/14/e", ["calendar_trap"]),
    # calendar shape but shallow: no flag
    ("https://a.com/2024/7/14", []),
    ("https://a.com/p?sid=1", ["session_param"]),
    ("https://a.com/p?ref=123e4567-e89b-42d3-a456-426614174000",
     ["session_param"]),
    ("https://a.com/p?v=0123456789abcdef0123456789abcdef",
     ["session_param"]),
    ("https://a.com/" + "/".join(f"s{i}" for i in range(13)), ["deep_path"]),
    ("https://a.com/s?a=1&b=2&c=3&d=4&e=5&f=6&g=7&h=8&i=9", ["param_blowup"]),
    # stacked: repeat + session -> score 60
    ("https://a.com/a/b/a/b?sid=9", ["repeat_trap", "session_param",
                                     "is_trap"]),
]

BOOL_FLAGS = ["repeat_trap", "calendar_trap", "session_param", "deep_path",
              "param_blowup", "is_trap"]


@pytest.fixture(scope="module")
def flagged(spark):
    df = spark.createDataFrame(
        [Row(i=i, url=c[0]) for i, c in enumerate(CASES)],
        "i int, url string")
    cols = trap_cols(F.col("url"))
    out = df.select("i", *[v.alias(k) for k, v in cols.items()])
    return {r["i"]: r for r in out.collect()}


@pytest.mark.parametrize("idx", range(len(CASES)))
def test_trap_flags(flagged, idx):
    _, expected = CASES[idx]
    row = flagged[idx]
    for flag in BOOL_FLAGS:
        assert row[flag] == (flag in expected), (flag, CASES[idx][0])


def test_filter_traps_drops_only_traps(spark):
    df = spark.createDataFrame(
        [Row(url=c[0]) for c in CASES], "url string")
    kept = filter_traps(df).collect()
    expect = [c[0] for c in CASES if "is_trap" not in c[1]]
    assert sorted(r["url"] for r in kept) == sorted(expect)


def test_filter_traps_is_codegen_filter(spark):
    df = spark.createDataFrame([Row(url="https://a.com/x")], "url string")
    plan = filter_traps(df)._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "Python" not in plan and "BatchEval" not in plan


def test_py_twin_parity(spark):
    """trap_score_py must agree with the codegen trap_score bit-for-bit
    on every fixture URL (the security.py twin-parity pattern)."""
    from pyspark.sql import Row

    from datascrapexter_spark.frontier.traps import trap_score_py

    urls = [c[0] for c in CASES] + [
        "https://a.com", "https://a.com/", "notaurl",
        "https://a.com/p?x", "https://a.com/p?x=&sid=",
        "https://a.com/2024/12/31/a/2024/12/31",
    ]
    df = spark.createDataFrame([Row(url=u) for u in urls], "url string")
    got = {r["url"]: r["trap_score"] for r in df.select(
        "url", trap_cols(F.col("url"))["trap_score"].alias("trap_score")
    ).collect()}
    for u in urls:
        assert got[u] == trap_score_py(u), u


def test_crawl_trap_gate_sim_parity(spark, tmp_path):
    """trap_filter=True: trap out-links never enter the frontier or the
    seen set; crawl order bit-exact vs the oracle simulator."""
    from tests.crawl_oracle import CrawlSimulator
    from tests.test_crawl_engine import make_cfg, run_spark_crawl, spark_log

    host = "trapped.ex.com"
    home = (f'<html><body><a href="https://{host}/ok">ok</a>'
            f'<a href="https://{host}/p?jsessionid='
            f'{"ab" * 16}&x=1&sid=1">sess</a>'
            f'<a href="https://{host}/a/b/a/b/a/b">loop</a>'
            "</body></html>")
    rows = [
        (f"https://{host}/", None, home.encode(), "", "en"),
        (f"https://{host}/ok", None, b"<html><h1>ok</h1></html>", "", "en"),
        (f"https://{host}/a/b/a/b/a/b", None,
         b"<html><h1>trap</h1></html>", "", "en"),
    ]
    seeds = [(f"https://{host}/", 5)]
    web = (rows, seeds, {})
    cfg = make_cfg(trap_filter=True, trap_threshold=20, max_rounds=4)
    engine, _ = run_spark_crawl(spark, tmp_path, web, cfg)

    sim = CrawlSimulator.from_raw(web[0], web[2], cfg)
    sim.run(web[1])
    assert spark_log(engine) == sim.sorted_log()
    scheduled = {row[3] for row in spark_log(engine)}
    assert f"https://{host}/ok" in scheduled
    assert not any("/a/b/a/b" in u or "jsessionid" in u for u in scheduled)

    # gate off: the repeat-trap link IS scheduled (and fetched)
    cfg_off = make_cfg(trap_filter=False, max_rounds=4)
    engine2, _ = run_spark_crawl(
        spark, tmp_path / "off", web, cfg_off)
    sim2 = CrawlSimulator.from_raw(web[0], web[2], cfg_off)
    sim2.run(web[1])
    assert spark_log(engine2) == sim2.sorted_log()
    scheduled2 = {row[3] for row in spark_log(engine2)}
    assert f"https://{host}/a/b/a/b/a/b" in scheduled2
