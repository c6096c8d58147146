"""Redirect-chain resolution: terminals, chains, cycles, hop cap."""

import pytest
from pyspark.sql import Row

from datascrapexter_spark.frontier.redirects import resolve_redirects


def _resolve(spark, urls, redirects, **kw):
    u = spark.createDataFrame([Row(url=x) for x in urls], "url string")
    r = spark.createDataFrame([Row(src=a, dst=b) for a, b in redirects],
                              "src string, dst string")
    return {row["url"]: row.asDict()
            for row in resolve_redirects(u, r, **kw).collect()}


def test_chains_cycles_terminals(spark):
    redirects = [("a", "b"), ("b", "c"),          # chain a->b->c
                 ("x", "y"), ("y", "x")]          # 2-cycle
    out = _resolve(spark, ["a", "b", "c", "x", "t"], redirects, max_hops=8)
    assert out["a"] == {"url": "a", "final_url": "c", "n_hops": 2,
                        "status": "ok"}
    assert out["b"]["final_url"] == "c" and out["b"]["n_hops"] == 1
    # terminal and never-redirected URLs resolve to themselves at 0 hops
    assert out["c"] == {"url": "c", "final_url": "c", "n_hops": 0,
                        "status": "ok"}
    assert out["t"]["status"] == "ok" and out["t"]["n_hops"] == 0
    # cycle: walks 8 hops and gives up where it stands
    assert out["x"]["status"] == "unresolved"
    assert out["x"]["n_hops"] == 8
    assert out["x"]["final_url"] == "x"            # even cycle length


def test_hop_cap_semantics(spark):
    # chain of exactly max_hops edges: followed fully but the terminal
    # is never CONFIRMED (that needs one more lookup) -> unresolved
    chain = [(f"u{i}", f"u{i + 1}") for i in range(3)]   # u0->u1->u2->u3
    out = _resolve(spark, ["u0"], chain, max_hops=3)
    assert out["u0"] == {"url": "u0", "final_url": "u3", "n_hops": 3,
                         "status": "unresolved"}
    out = _resolve(spark, ["u0"], chain, max_hops=4)
    assert out["u0"]["status"] == "ok" and out["u0"]["n_hops"] == 3


def test_max_hops_validation(spark):
    df = spark.createDataFrame([Row(url="a")], "url string")
    r = spark.createDataFrame([], "src string, dst string")
    with pytest.raises(ValueError):
        resolve_redirects(df, r, max_hops=0)
    out = {x["url"]: x.asDict()
           for x in resolve_redirects(df, r, max_hops=1).collect()}
    assert out["a"]["status"] == "ok" and out["a"]["n_hops"] == 0


def test_redirect_map_cached_across_hops(spark):
    from pyspark.sql import Row

    u = spark.createDataFrame([Row(url="a")], "url string")
    r = spark.createDataFrame([Row(src="a", dst="b"), Row(src="b", dst="c")],
                              "src string, dst string")
    plan = resolve_redirects(u, r, max_hops=4)._jdf \
        .queryExecution().executedPlan().toString()
    # every hop probes the persisted src-partitioned map (InMemory scans),
    # so the map is shuffled once, not once per hop
    assert plan.count("InMemoryTableScan") >= 4
