"""Link-graph PageRank for crawl prioritization.

The reference schedules fetches by config-declared priority plus politeness
(internal/scraper/engine.go:720-792 round loop); it has no global link-graph
signal. At 10^10-URL frontier scale the standard upgrade is link-graph
authority (PageRank / OPIC) feeding the frontier's priority column, so this
module is a first-class extension, not a port.

Two implementations share one plan shape (edges ⋈ ranks equi-join on src →
groupBy dst partial agg → left join back to nodes, iterated a fixed number
of times, driver loop only — no collect, no crossJoin):

- ``pagerank_micro`` — **fixed-point integer arithmetic** (ranks held in
  micro-units, BIGINT). Integer sums are associative, so the result is
  bit-identical regardless of partitioning / aggregation order; this is the
  oracle-gated variant (q47), its DuckDB twin replays the same recurrence in
  generated CTEs (oracles._pagerank_sql).
- ``pagerank_double`` — plain float arithmetic, one fewer cast per edge; the
  deployment fast path. Not oracle-gated (float summation order), but the
  induced ranking is asserted to match the exact variant in tests.

Scale notes (100 TB / 10^10 nodes):
- the edge table is the big side; it is repartitioned by ``src`` ONCE and
  persisted, so every iteration's join reuses the same partitioning and only
  the (much smaller) rank table shuffles per iteration. At rest you'd bucket
  edges by src (same layout as the url_seen bucketed table,
  frontier/state.py) to remove even that one-time shuffle.
- per-iteration lineage is cut every
  ``checkpoint_every`` iterations so long runs don't accumulate a
  1000-stage plan.
- fixed-point micro-units bound: rank mass is n * 1e6; a node's in-contrib
  times the damping numerator must fit int64, which holds up to ~1e12 total
  mass — beyond that the double variant (or 1e3 scaling) is the documented
  path.
"""

from __future__ import annotations

from .dedup import _cut_lineage
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

SCALE = 1_000_000          # micro-units per 1.0 of rank
TELEPORT_MICRO = 150_000   # (1 - damping) * SCALE
DAMP_MICRO = 850_000       # damping * SCALE


def synth_link_edges(docs: DataFrame, n_nodes: int, id_col: str = "doc_id",
                     out_deg: int = 4) -> DataFrame:
    """Deterministic synthetic link graph over a dense 0..n-1 id space:
    each node links to ``out_deg`` md5-derived targets (distinct, self-loops
    kept). Mirrors the DuckDB derivation in oracles._pagerank_sql so both
    engines walk the identical graph."""
    e = docs.select(
        F.col(id_col).alias("src"),
        F.explode(F.sequence(F.lit(0), F.lit(out_deg - 1))).alias("i"),
    )
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.col("src").cast("string"), F.lit(":"),
                           F.col("i").cast("string"))), 1, 8),
        16, 10).cast("long")
    return e.select("src", (h % F.lit(n_nodes)).alias("dst")).distinct()


def _prepared_edges(edges: DataFrame) -> DataFrame:
    """Attach out-degree and co-partition by src so every iteration's
    rank-join reuses one layout. Persisted: scanned ``iters`` times."""
    deg = edges.groupBy("src").agg(F.count(F.lit(1)).alias("out_deg"))
    return edges.join(deg, "src").repartition("src").persist()


def pagerank_micro(nodes: DataFrame, edges: DataFrame, iters: int = 5,
                   node_col: str = "node",
                   checkpoint_every: int = 10) -> DataFrame:
    """Exact fixed-point PageRank: rank held as BIGINT micro-units.

    Recurrence (all integer, order-independent):
      contrib(v) = sum over in-edges (u,v) of  rank(u) div out_deg(u)
      rank'(v)   = TELEPORT_MICRO + (DAMP_MICRO * contrib(v)) div SCALE
    Dangling mass is dropped (documented rule; the oracle replays it).
    """
    ed = _prepared_edges(edges)
    ranks = nodes.select(F.col(node_col).alias("node"),
                         F.lit(SCALE).cast("long").alias("rank_micro"))
    base = nodes.select(F.col(node_col).alias("node"))
    for it in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(ed.dst, F.expr("rank_micro div out_deg").alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .select(
                base.node,
                (F.lit(TELEPORT_MICRO)
                 + F.expr(f"({DAMP_MICRO} * coalesce(contrib, 0L))"
                          f" div {SCALE}")).cast("long").alias("rank_micro"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = _cut_lineage(ranks)
    return ranks


def pagerank_double(nodes: DataFrame, edges: DataFrame, iters: int = 5,
                    node_col: str = "node", damping: float = 0.85,
                    checkpoint_every: int = 10) -> DataFrame:
    """Deployment fast path: identical plan shape, float arithmetic.
    Returns (node, rank double). Ranking parity with pagerank_micro is
    asserted in tests, values are not oracle-gated (summation order)."""
    ed = _prepared_edges(edges)
    ranks = nodes.select(F.col(node_col).alias("node"),
                         F.lit(1.0).alias("rank"))
    base = nodes.select(F.col(node_col).alias("node"))
    for it in range(iters):
        contrib = (
            ed.join(ranks, ed.src == ranks.node)
            .select(ed.dst, (F.col("rank") / F.col("out_deg")).alias("c"))
            .groupBy("dst").agg(F.sum("c").alias("contrib"))
        )
        ranks = (
            base.join(contrib, base.node == contrib.dst, "left")
            .select(base.node,
                    (F.lit(1.0 - damping)
                     + damping * F.coalesce(F.col("contrib"), F.lit(0.0))
                     ).alias("rank"))
        )
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = _cut_lineage(ranks)
    return ranks


def anchor_text_topk(edges: DataFrame, dst_col: str = "dst",
                     anchor_col: str = "anchor", k: int = 3) -> DataFrame:
    """Top-k in-link anchor texts per target URL.

    Anchor text is the classic off-page relevance signal (what OTHER
    pages call a URL); search-oriented crawls aggregate it per target at
    index time. The reference extracts per-page fields only (no
    cross-page signal); this is the web-graph companion to
    ``pagerank_micro``.

    Anchors are normalized (trim, collapse whitespace, lowercase) before
    counting; ranking is (count DESC, anchor ASC) via row_number so ties
    are deterministic.

    Scale shape: groupBy(dst, anchor) with map-side partials is the only
    corpus-sized exchange; the per-dst top-k runs as
    WindowGroupLimit Partial/Final (each task keeps <= k rows per dst
    BEFORE the dst exchange — the q43 plan pattern), so the window never
    materializes a full per-target anchor list.
    """
    from pyspark.sql import Window

    norm = F.lower(F.trim(F.regexp_replace(F.col(anchor_col), "\\s+", " ")))
    agg = (edges
           .groupBy(F.col(dst_col).alias("dst"), norm.alias("anchor"))
           .agg(F.count(F.lit(1)).alias("n_links")))
    w = Window.partitionBy("dst").orderBy(
        F.col("n_links").desc(), F.col("anchor").asc())
    return (agg.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k))


def host_graph_rollup(edges: DataFrame, src_col: str = "src_url",
                      dst_col: str = "dst_url") -> DataFrame:
    """Roll a page-level link graph up to the host level.

    One row per (src_host, dst_host) with ``n_links`` (page-level edge
    count), ``n_src_pages`` (distinct linking pages), ``internal``
    (same-host), and ``reciprocal`` (the reverse host pair also links —
    the classic mirror / link-exchange signal feeding
    frontier/reputation.py alongside dedup.host_mirror_stats).

    The reference has no cross-page signals (per-page extraction only,
    internal/scraper/engine.go); this is the host-granular web-graph
    companion to ``pagerank_micro``.

    Scale shape: host parsing is map-side codegen; the corpus-sized
    exchange is the (src_host, dst_host) partial-agg groupBy (URL
    payloads collapse map-side). Reciprocity is a self-equi-join of the
    ALREADY-AGGREGATED host-pair table on the reversed key — host-pair
    cardinality is ~|hosts| * avg-host-out-degree, millions of rows at
    10^10-URL scale, so the join is a small keyed shuffle (or broadcast)
    regardless of corpus size.
    """
    from ..functions.urltemplates import url_host_col

    pairs = edges.select(
        url_host_col(src_col).alias("src_host"),
        url_host_col(dst_col).alias("dst_host"),
        F.col(src_col).alias("_src"))
    agg = (pairs.groupBy("src_host", "dst_host")
           .agg(F.count(F.lit(1)).alias("n_links"),
                F.countDistinct("_src").alias("n_src_pages")))
    rev = agg.select(F.col("dst_host").alias("src_host"),
                     F.col("src_host").alias("dst_host"),
                     F.lit(True).alias("_rev"))
    return (agg.join(rev, ["src_host", "dst_host"], "left")
            .select("src_host", "dst_host", "n_links", "n_src_pages",
                    (F.col("src_host") == F.col("dst_host"))
                    .alias("internal"),
                    F.coalesce(F.col("_rev"), F.lit(False))
                    .alias("reciprocal")))


def hits_micro(nodes: DataFrame, edges: DataFrame, iters: int = 4,
               node_col: str = "node",
               checkpoint_every: int = 10) -> DataFrame:
    """Exact fixed-point HITS (Kleinberg hubs & authorities) — the other
    classical link-graph crawl-priority signal: hubs are good frontier
    expansion points (their out-links reach many authorities), and
    authorities are fetch-priority targets. Complements ``pagerank_micro``
    the way the reference's priority column is complemented by it.

    Scores are BIGINT micro-units; each half-iteration max-normalizes
    (score·SCALE div max) instead of the textbook L2 norm, which keeps
    the recurrence in exact integer arithmetic so the result is
    bit-identical regardless of partitioning — the repo's oracle
    discipline (oracles._hits_sql replays the identical recurrence in
    generated CTEs). All values nonnegative, so Spark ``div`` and DuckDB
    ``//`` agree. Nodes with no in-edges hold authority 0; no out-edges,
    hub 0. int64 bound: max in-degree · SCALE² must fit — holds to
    ~9·10^6 in-degree, beyond which drop SCALE to 1e3 (documented like
    pagerank_micro's mass bound).

    Scale shape: the big edge table is laid down TWICE, once partitioned
    by src (the hub→authority join key) and once by dst (the
    authority→hub join key) — two at-rest layouts like a both-ways
    bucketed join table — so per iteration only the node-width score
    tables shuffle. The per-phase max is a 1-row driver scalar
    (bounded collect) inlined as a literal into the next plan, which
    doubles as the iteration barrier every synchronous HITS needs.
    Lineage is cut (dedup._cut_lineage: localCheckpoint, or a
    reliable checkpoint when the session configures a dir) every
    ``checkpoint_every``
    iterations.

    Returns (node, hub_micro, auth_micro).
    """
    e_src = edges.repartition("src").persist()   # phase 1: join h on src
    e_dst = edges.repartition("dst").persist()   # phase 2: join a on dst
    base = nodes.select(F.col(node_col).alias("node"))
    h = base.select("node", F.lit(SCALE).cast("long").alias("hub_micro"))
    a = None
    # Each raw table feeds its argmax AND the normalized select; left
    # lazy, the plan doubles per half-iteration (2^(2*iters) replays —
    # the q75 double-eval lesson). The max is a 1-row driver scalar by
    # construction, so collect it (bounded, the repo's driver-shape
    # contract), inline it as a literal, and persist the raw table the
    # collect just materialized: every iteration's plan then roots at a
    # cached node-width table and stays O(1) deep.
    for it in range(iters):
        araw = (e_src.join(h, e_src.src == h.node)
                .groupBy("dst").agg(F.sum("hub_micro").alias("araw"))
                .persist())
        amax = araw.agg(F.max("araw")).collect()[0][0] or 1
        a = araw.select(F.col("dst").alias("node"),
                        F.expr(f"({SCALE} * araw) div {amax}")
                        .cast("long").alias("auth_micro"))
        hraw = (e_dst.join(a, e_dst.dst == a.node)
                .groupBy("src").agg(F.sum("auth_micro").alias("hraw"))
                .persist())
        hmax = hraw.agg(F.max("hraw")).collect()[0][0] or 1
        h = hraw.select(F.col("src").alias("node"),
                        F.expr(f"({SCALE} * hraw) div {hmax}")
                        .cast("long").alias("hub_micro"))
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            h = _cut_lineage(h)
            a = _cut_lineage(a)
    return (base
            .join(h, "node", "left")
            .join(a, "node", "left")
            .select("node",
                    F.coalesce("hub_micro", F.lit(0)).cast("long")
                    .alias("hub_micro"),
                    F.coalesce("auth_micro", F.lit(0)).cast("long")
                    .alias("auth_micro")))
