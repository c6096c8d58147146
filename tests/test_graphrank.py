"""Link-graph PageRank (ops/graphrank.py) — exactness properties of the
fixed-point variant, ranking parity of the float fast path, and the
plan-shape guarantees (edge side partitioned once, no crossJoin, no
collect in the iteration loop). Cross-engine exactness is gated by q47."""

import math

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.ops import graphrank

N = 200


@pytest.fixture(scope="module")
def nodes(spark):
    return spark.range(N).select(F.col("id").alias("doc_id"))


@pytest.fixture(scope="module")
def edges(spark, nodes):
    return graphrank.synth_link_edges(nodes, n_nodes=N).persist()


def test_edges_deterministic_and_in_range(edges):
    rows = {(r.src, r.dst) for r in edges.collect()}
    rows2 = {(r.src, r.dst) for r in edges.collect()}
    assert rows == rows2
    assert all(0 <= d < N for _, d in rows)
    # out_deg=4 draws minus rare collisions
    assert len(rows) > 3.5 * N


def test_micro_ranks_exact_and_stable(spark, nodes, edges):
    a = graphrank.pagerank_micro(nodes, edges, iters=5, node_col="doc_id")
    b = graphrank.pagerank_micro(
        nodes.repartition(7), edges.repartition(11), iters=5,
        node_col="doc_id")
    ra = {r.node: r.rank_micro for r in a.collect()}
    rb = {r.node: r.rank_micro for r in b.collect()}
    # partitioning-independent: integer sums are associative
    assert ra == rb
    assert len(ra) == N
    # rank mass stays near n * SCALE (floor losses + dangling-free graph);
    # every node keeps at least the teleport term
    total = sum(ra.values())
    assert 0.9 * N * graphrank.SCALE < total <= N * graphrank.SCALE
    assert min(ra.values()) >= graphrank.TELEPORT_MICRO


def test_double_path_matches_exact_ranking(nodes, edges):
    exact = graphrank.pagerank_micro(nodes, edges, iters=5,
                                     node_col="doc_id")
    fast = graphrank.pagerank_double(nodes, edges, iters=5,
                                     node_col="doc_id")
    e = {r.node: r.rank_micro for r in exact.collect()}
    f = {r.node: r.rank for r in fast.collect()}
    # values agree to float precision (micro-unit quantization ~1e-6)
    for n in e:
        assert math.isclose(e[n] / graphrank.SCALE, f[n], abs_tol=5e-5)
    # induced top-10 ordering identical (ties broken by node id)
    top_e = sorted(e, key=lambda n: (-e[n], n))[:10]
    top_f = sorted(f, key=lambda n: (-f[n], n))[:10]
    assert top_e == top_f


def test_iteration_plan_shape(nodes, edges):
    ranks = graphrank.pagerank_micro(nodes, edges, iters=3,
                                     node_col="doc_id")
    plan = ranks._jdf.queryExecution().executedPlan().toString()
    assert "CartesianProduct" not in plan
    assert "BroadcastNestedLoopJoin" not in plan
    # the persisted prepared-edge table is reused each iteration
    assert "InMemoryTableScan" in plan


def test_checkpoint_bounds_lineage(nodes, edges):
    ranks = graphrank.pagerank_micro(nodes, edges, iters=4,
                                     node_col="doc_id", checkpoint_every=2)
    # lineage cut: the analyzed plan bottoms out at a checkpoint scan,
    # not 4 stacked join rounds
    plan = ranks._jdf.queryExecution().analyzed().toString()
    assert "LogicalRDD" in plan
    assert len({r.node for r in ranks.collect()}) == N


def test_anchor_topk_normalizes_and_ranks(spark):
    from pyspark.sql import Row
    edges = spark.createDataFrame([
        Row(dst="t", anchor="Click  Here"),
        Row(dst="t", anchor="  click here "),
        Row(dst="t", anchor="CLICK HERE"),
        Row(dst="t", anchor="read more"),
        Row(dst="t", anchor="read more"),
        Row(dst="t", anchor="about"),
        Row(dst="t", anchor="zzz"),
        Row(dst="u", anchor="solo"),
    ], "dst string, anchor string")
    out = {(r["dst"], r["rank"]): r for r in
           graphrank.anchor_text_topk(edges, k=3).collect()}
    assert out[("t", 1)]["anchor"] == "click here"
    assert out[("t", 1)]["n_links"] == 3
    assert out[("t", 2)]["anchor"] == "read more"
    # count tie between 'about' and 'zzz' broken lexicographically
    assert out[("t", 3)]["anchor"] == "about"
    assert ("t", 4) not in out
    assert out[("u", 1)]["anchor"] == "solo"


def test_anchor_topk_uses_window_group_limit(spark):
    from pyspark.sql import Row
    edges = spark.createDataFrame([Row(dst="t", anchor="a")],
                                  "dst string, anchor string")
    plan = graphrank.anchor_text_topk(edges, k=3)._jdf \
        .queryExecution().executedPlan().toString()
    # per-task top-k retention before the dst exchange (q43 pattern)
    assert "WindowGroupLimit" in plan
    assert "Python" not in plan


def test_host_graph_rollup(spark):
    from pyspark.sql import Row
    edges = [
        # a -> b twice from two pages; b -> a once (reciprocal pair)
        Row(src_url="https://a.com/p/1", dst_url="https://b.com/x"),
        Row(src_url="https://a.com/p/1", dst_url="https://b.com/y"),
        Row(src_url="https://a.com/p/2", dst_url="https://b.com/x"),
        Row(src_url="https://b.com/q", dst_url="https://a.com/p/1"),
        # a -> c one-way; a -> a internal
        Row(src_url="https://a.com/p/1", dst_url="https://c.com/"),
        Row(src_url="https://a.com/p/3", dst_url="https://a.com/p/4"),
    ]
    df = spark.createDataFrame(edges,
                               "src_url string, dst_url string")
    out = {(r["src_host"], r["dst_host"]): r.asDict()
           for r in graphrank.host_graph_rollup(df).collect()}
    ab = out[("a.com", "b.com")]
    assert ab["n_links"] == 3 and ab["n_src_pages"] == 2
    assert ab["reciprocal"] is True and ab["internal"] is False
    assert out[("b.com", "a.com")]["reciprocal"] is True
    ac = out[("a.com", "c.com")]
    assert ac["reciprocal"] is False and ac["internal"] is False
    aa = out[("a.com", "a.com")]
    assert aa["internal"] is True and aa["reciprocal"] is True
