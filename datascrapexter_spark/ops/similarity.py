"""Similarity search over an embedding column (array<float>).

Three paths:
  * `cosine_topk`         exact brute-force top-k (broadcast the queries,
                          scan the corpus once) — the correctness baseline.
  * `ann_topk_lsh`        signed-random-projection LSH buckets: corpus and
                          queries are bucketed by hyperplane sign bits and
                          only same-bucket pairs are scored — the scale
                          path (candidate generation is an equi-join).
  * `ivf_topk`            IVF-flat: corpus inverted-listed by nearest
                          deterministic centroid, queries probe n_probe
                          cells — the scale path when the corpus is
                          persisted partitioned by cell (partition-pruned
                          probes); n_probe == n_centroids reproduces the
                          exact result (recall-1 identity, tested).

Hyperplanes are deterministic: weight(plane p, dim d) = +1 if the first
hex digit of md5(f"plane{p}dim{d}") >= 8 else -1, computed driver-side
(hashlib) and shipped as literal arrays — reproducible by any engine, no
RNG state. Rademacher (+-1) hyperplanes are a standard SRP choice.

Scale notes: queries are assumed small (broadcast). For corpus x corpus
joins use dedup.embedding_neardup_pairs / bucket first. The corpus scan
projects only (id, vec) — column pruning keeps the fat text columns out.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import as_double_array, cosine_from_norms, cosine_sim_col, norm_col


def srp_plane(plane: int, dim: int) -> list[float]:
    """Deterministic Rademacher hyperplane (+1/-1 per dimension)."""
    out = []
    for d in range(dim):
        h = hashlib.md5(f"plane{plane}dim{d}".encode()).hexdigest()
        out.append(1.0 if int(h[0], 16) >= 8 else -1.0)
    return out


def lsh_bucket_col(vec: Column | str, dim: int, n_planes: int = 8,
                   plane_offset: int = 0) -> Column:
    """SRP bucket id: bit p set iff dot(vec, plane_{plane_offset + p}) > 0.

    `plane_offset` selects an independent plane set (offset s*n_planes for
    set s) — used by dedup.embedding_neardup_pairs_lsh for multi-set recall.
    """
    v = as_double_array(vec)
    bucket = None
    for p in range(n_planes):
        plane = F.array(*[F.lit(w) for w in srp_plane(plane_offset + p, dim)])
        dot = F.aggregate(
            F.zip_with(v, plane, lambda x, y: x * y),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
        term = F.when(dot > 0, F.lit(1 << p)).otherwise(F.lit(0))
        bucket = term if bucket is None else bucket + term
    return bucket.cast("int")


def cosine_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    round_to: int | None = 6,
) -> DataFrame:
    """Exact top-k corpus neighbours per query vector by cosine.

    Output: (qid, cid, cos, rank) — rank 1..k, deterministic tie-break on
    (rounded cos desc, cid asc). Broadcast-joins the queries against the
    corpus: one corpus scan, no shuffle of the corpus.
    """
    q = queries.select(
        F.col(id_col).alias("qid"), as_double_array(vec_col).alias("qv")
    ).withColumn("_nq", norm_col(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
    ).withColumn("_nc", norm_col(F.col("cv")))
    # norms factored per vector (bit-identical; corpus norm once per row
    # instead of once per (row, query) pair)
    cos = cosine_from_norms(F.col("qv"), F.col("cv"),
                            F.col("_nq"), F.col("_nc"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = c.join(F.broadcast(q)).withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def ann_topk_lsh(
    corpus: DataFrame,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    round_to: int | None = 6,
) -> DataFrame:
    """Approximate top-k: score only candidates in the query's SRP bucket.

    Same output shape as `cosine_topk`; recall depends on n_planes (8 planes
    => 256 buckets). At cluster scale the corpus is written bucketed by
    `bucket` so the probe is a partition-pruned scan + equi-join.
    """
    q = queries.select(
        F.col(id_col).alias("qid"),
        as_double_array(vec_col).alias("qv"),
        lsh_bucket_col(vec_col, dim, n_planes).alias("bucket"),
    ).withColumn("_nq", norm_col(F.col("qv")))
    c = corpus.select(
        F.col(id_col).alias("cid"),
        as_double_array(vec_col).alias("cv"),
        lsh_bucket_col(vec_col, dim, n_planes).alias("bucket"),
    ).withColumn("_nc", norm_col(F.col("cv")))
    cos = cosine_from_norms(F.col("qv"), F.col("cv"),
                            F.col("_nq"), F.col("_nc"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = c.join(F.broadcast(q), "bucket").withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def write_lsh_index(corpus: DataFrame, path: str, dim: int,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_planes: int = 8) -> None:
    """Persist the corpus PARTITIONED BY SRP bucket — the ANN index's
    at-rest layout. A probe then reads only the queries' buckets
    (`PartitionFilters` in the scan, proven by test_ops' plan assert)
    instead of the whole corpus: with 8 planes that is 1/256th of the
    files per probed bucket."""
    (
        corpus.select(
            F.col(id_col).alias("cid"),
            as_double_array(vec_col).alias("cv"),
            lsh_bucket_col(vec_col, dim, n_planes).alias("bucket"),
        )
        .write.mode("overwrite").partitionBy("bucket").parquet(path)
    )


def ann_topk_lsh_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    dim: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_planes: int = 8,
    round_to: int | None = 6,
) -> DataFrame:
    """ann_topk_lsh over a persisted bucket-partitioned index: the query
    set's buckets (queries are broadcast-small by contract, so collecting
    their bucket ids driver-side is O(queries)) prune the corpus scan to
    matching partitions, then the same broadcast equi-join + window top-k.
    Identical results to ann_topk_lsh on the same corpus (tested)."""
    q = queries.select(
        F.col(id_col).alias("qid"),
        as_double_array(vec_col).alias("qv"),
        lsh_bucket_col(vec_col, dim, n_planes).alias("bucket"),
    )
    buckets = [r["bucket"] for r in q.select("bucket").distinct().collect()]
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("bucket").isin(buckets))  # -> PartitionFilters
    )
    cos = cosine_sim_col(F.col("qv"), F.col("cv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = c.join(F.broadcast(q), "bucket").withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def write_ivf_index(corpus: DataFrame, path: str,
                    id_col: str = "vec_id", vec_col: str = "embedding",
                    n_centroids: int = 16,
                    round_to: int = 6, train_iters: int = 2) -> list[list[float]]:
    """Persist the corpus PARTITIONED BY IVF cell (the inverted lists as
    the physical layout); returns the deterministic centroids the caller
    re-derives probes from. A probe reads only n_probe of n_centroids
    partitions. Centroids from seeded k-means (train_iters=0: raw pick)."""
    cents = (train_centroids(corpus, id_col, vec_col, n_centroids,
                             n_iters=train_iters)
             if train_iters > 0
             else pick_centroids(corpus, id_col, vec_col, n_centroids))
    (
        corpus.select(
            F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
        )
        .withColumn("cell", assign_cells_col(F.col("cv"), cents, round_to))
        .write.mode("overwrite").partitionBy("cell").parquet(path)
    )
    return cents


def ivf_topk_indexed(
    spark,
    index_path: str,
    queries: DataFrame,
    cents: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_probe: int = 4,
    round_to: int | None = 6,
) -> DataFrame:
    """ivf_topk over a persisted cell-partitioned index: per-query probe
    cells are ranked from the centroid literals, their union prunes the
    corpus scan (PartitionFilters), then broadcast equi-join on cell +
    window top-k. Identical results to ivf_topk given the same centroids."""
    q = queries.select(
        F.col(id_col).alias("qid"), as_double_array(vec_col).alias("qv")
    ).withColumn("_c", F.explode(_centroid_array(cents)))
    qcos = F.round(cosine_sim_col(F.col("qv"), F.col("_c.cvec")), round_to or 6)
    wq = Window.partitionBy("qid").orderBy(F.col("_qcos").desc(),
                                           F.col("_c.cell").asc())
    probes = (
        q.withColumn("_qcos", qcos)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("qid", "qv", F.col("_c.cell").alias("cell"))
    )
    cells = [r["cell"] for r in probes.select("cell").distinct().collect()]
    c = (
        spark.read.parquet(index_path)
        .filter(F.col("cell").isin(cells))  # -> PartitionFilters
    )
    cos = cosine_sim_col(F.col("qv"), F.col("cv"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = c.join(F.broadcast(probes), "cell").withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def pick_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                   n_centroids: int) -> list[list[float]]:
    """Deterministic IVF centroid INIT: the n corpus vectors with the
    smallest (md5(id), id) — a reproducible sample any engine can
    re-derive. Centroids are driver-scale BY DESIGN (IVF uses 2^4..2^16
    of them) and ship to executors as literals. `train_centroids` refines
    this pick with seeded Lloyd iterations; a raw sample gives unbalanced
    cells on clustered embeddings (hot partitions at scale)."""
    rows = (
        corpus.select(
            F.col(id_col).alias("id"),
            as_double_array(vec_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("m"),
        )
        .orderBy("m", "id")
        .limit(n_centroids)
        .collect()
    )
    return [list(r["v"]) for r in rows]


def _round_half_up(x: float, digits: int) -> float:
    """Spark F.round / DuckDB round twin (HALF_UP, away from zero) —
    Python's built-in round is banker's and would diverge on .5 exactly."""
    import math

    p = 10.0 ** digits
    return math.copysign(math.floor(abs(x) * p + 0.5), x) / p


def train_centroids(corpus: DataFrame, id_col: str, vec_col: str,
                    n_centroids: int, n_iters: int = 2,
                    sample_size: int = 256,
                    round_to: int = 6) -> list[list[float]]:
    """Deterministic k-means for IVF centroids (the standard IVF training
    step, seeded): init = `pick_centroids`, then `n_iters` Lloyd
    iterations over a bounded md5-ordered training sample, run on the
    DRIVER in a FIXED accumulation order so the result is bit-reproducible
    (a distributed float sum is order-dependent; the training sample is
    driver-scale by construction — centroid count × a small multiplier).

    Per iteration: each sample vector joins its nearest centroid by
    round(cosine, round_to) with ties to the smaller cell — the exact
    rule `assign_cells_col` applies executor-side — and each centroid
    becomes the member mean, every component rounded HALF_UP to
    `round_to` (cross-engine reproducibility: the DuckDB oracle replays
    the same recurrence in SQL). Empty cells keep their previous
    centroid. Cosine-identical recall contract of ivf_topk is preserved:
    at n_probe = n_centroids the probe still covers every cell."""
    rows = (
        corpus.select(
            F.col(id_col).alias("id"),
            as_double_array(vec_col).alias("v"),
            F.md5(F.col(id_col).cast("string")).alias("m"),
        )
        .orderBy("m", "id")
        .limit(max(sample_size, n_centroids))
        .collect()
    )
    sample = [list(r["v"]) for r in rows]
    cents = [list(v) for v in sample[:n_centroids]]
    if not sample:
        return cents
    dim = len(sample[0])

    def _norm(v):
        return sum(x * x for x in v) ** 0.5

    for _ in range(n_iters):
        sums = [[0.0] * dim for _ in range(n_centroids)]
        counts = [0] * n_centroids
        cnorms = [_norm(c) for c in cents]
        for v in sample:  # md5 order — fixed accumulation order
            vn = _norm(v)
            best_cos, best_cell = -2.0, -1
            for cell, (c, cn) in enumerate(zip(cents, cnorms)):
                dot = sum(a * b for a, b in zip(v, c))
                denom = vn * cn
                cos = _round_half_up(dot / denom, round_to) if denom else -2.0
                if cos > best_cos:  # strict: ties keep the smaller cell
                    best_cos, best_cell = cos, cell
            if best_cell >= 0:
                counts[best_cell] += 1
                s = sums[best_cell]
                for i, x in enumerate(v):
                    s[i] += x
        cents = [
            [_round_half_up(s[i] / n, round_to) for i in range(dim)]
            if n else cents[cell]
            for cell, (s, n) in enumerate(zip(sums, counts))
        ]
    return cents


def _centroid_array(cents: list[list[float]]) -> Column:
    return F.array(*[
        F.struct(
            F.lit(i).alias("cell"),
            F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
        )
        for i, c in enumerate(cents)
    ])


def _exact_norm(v: list[float]) -> float:
    """sqrt(sum x*x) with the SAME left-to-right IEEE accumulation order
    and correctly-rounded sqrt the executor-side fold
    (`sqrt(aggregate(v, 0.0, acc + x*x))`) evaluates — bit-identical, so
    a driver-computed centroid norm can replace the per-row re-fold."""
    import math

    s = 0.0
    for x in v:
        s += x * x
    return math.sqrt(s)


def assign_cells_col(vec: Column, cents: list[list[float]],
                     round_to: int = 6) -> Column:
    """Nearest-centroid cell id, per row, zero shuffle: one fold over the
    centroid literal array (ties -> smaller cell, matching a
    (cos DESC, cell ASC) rank). At 2^14+ centroids swap this for an
    Arrow-batched numpy argmax (matrix multiply) — the contract (cell id
    per vector) is unchanged.

    r06: the row norm rides in the fold's INIT accumulator (evaluated
    once) and centroid norms are driver-computed literals (`_exact_norm`
    — bit-identical to the executor fold), so each of the n_centroids
    steps evaluates only its dot product instead of re-folding both
    norms: 3n folds per row -> n+1."""
    acc0 = F.struct(
        F.lit(-2.0).alias("cos"), F.lit(-1).alias("cell"),
        F.sqrt(F.aggregate(vec, F.lit(0.0),
                           lambda acc, x: acc + x * x)).alias("na"),
    )
    arr = F.array(*[
        F.struct(
            F.lit(i).alias("cell"),
            F.array(*[F.lit(float(x)) for x in c]).alias("cvec"),
            F.lit(_exact_norm(c)).alias("cnorm"),
        )
        for i, c in enumerate(cents)
    ])

    def step(a, s):
        dot = F.aggregate(
            F.zip_with(vec, s["cvec"], lambda x, y: x * y),
            F.lit(0.0), lambda acc, x: acc + x)
        cos = F.round(dot / (a["na"] * s["cnorm"]), round_to)
        better = cos > a["cos"]
        return F.struct(
            F.when(better, cos).otherwise(a["cos"]).alias("cos"),
            F.when(better, s["cell"]).otherwise(a["cell"]).alias("cell"),
            a["na"].alias("na"),
        )

    return F.aggregate(arr, acc0, step)["cell"]


def ivf_topk(
    corpus: DataFrame,
    queries: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 5,
    n_centroids: int = 16,
    n_probe: int = 4,
    round_to: int | None = 6,
    train_iters: int = 2,
) -> DataFrame:
    """IVF-flat approximate top-k: corpus vectors are inverted-listed by
    nearest centroid; each query probes its `n_probe` nearest cells and
    scores exact cosine only there.

    Same output shape as `cosine_topk` (qid, cid, cos, rank); recall is
    governed by n_probe/n_centroids. Scale path: persist the corpus
    PARTITIONED BY cell so a probe is a partition-pruned scan + equi-join;
    assignment is a per-row fold over broadcast centroid literals (no
    shuffle, no cross join). Centroids: deterministic seeded k-means
    (`train_centroids`; train_iters=0 falls back to the raw md5 pick).
    """
    cents = (train_centroids(corpus, id_col, vec_col, n_centroids,
                             n_iters=train_iters)
             if train_iters > 0
             else pick_centroids(corpus, id_col, vec_col, n_centroids))
    c = corpus.select(
        F.col(id_col).alias("cid"), as_double_array(vec_col).alias("cv")
    ).withColumn("cell", assign_cells_col(F.col("cv"), cents, round_to or 6))

    # query probes: rank all centroids per query, keep the n_probe nearest
    q = queries.select(
        F.col(id_col).alias("qid"), as_double_array(vec_col).alias("qv")
    ).withColumn("_c", F.explode(_centroid_array(cents)))
    qcos = F.round(cosine_sim_col(F.col("qv"), F.col("_c.cvec")), round_to or 6)
    wq = Window.partitionBy("qid").orderBy(F.col("_qcos").desc(),
                                           F.col("_c.cell").asc())
    probes = (
        q.withColumn("_qcos", qcos)
        .withColumn("_rn", F.row_number().over(wq))
        .filter(F.col("_rn") <= n_probe)
        .select("qid", "qv", F.col("_c.cell").alias("cell"))
    )

    c = c.withColumn("_nc", norm_col(F.col("cv")))
    probes = probes.withColumn("_nq", norm_col(F.col("qv")))
    cos = cosine_from_norms(F.col("qv"), F.col("cv"),
                            F.col("_nq"), F.col("_nc"))
    if round_to is not None:
        cos = F.round(cos, round_to)
    scored = c.join(F.broadcast(probes), "cell").withColumn("cos", cos)
    w = Window.partitionBy("qid").orderBy(F.col("cos").desc(), F.col("cid").asc())
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("qid", "cid", "cos", "rank")
    )


def semantic_dedup_flags(
    corpus: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    threshold: float = 0.99,
    round_to: int = 6,
    train_iters: int = 2,
) -> DataFrame:
    """SemDeDup (Abbas et al. 2023, arXiv:2303.09540): semantic
    deduplication by embedding similarity WITHIN k-means clusters — the
    LLM-training-data step that removes paraphrase/boilerplate
    duplicates exact and MinHash dedup both miss.

    A document is a duplicate iff some SAME-CELL document with a
    smaller id has cosine >= ``threshold`` with it (the paper keeps an
    arbitrary member of each similar group; min-id is that choice made
    deterministic and oracle-replayable). Clustering reuses the
    deterministic seeded k-means of the IVF index (`train_centroids`),
    so the whole operator — centroids, assignment, in-cell pairs — is
    reproducible bit-for-bit by an independent SQL engine.

    Scale shape: the paper's contract is n_centroids grows with the
    corpus (they use ~100k clusters for LAION) so cells stay bounded
    (thousands of members), making the in-cell self-join a cell-keyed
    equi-join whose per-cell candidate count is bounded — never an
    all-pairs. Assignment is a per-row fold over broadcast centroid
    literals (zero shuffle); the only corpus-width exchanges are the
    cell-keyed join and the distinct on loser ids. The assigned table
    is persisted: three consumers (join left, join right, output spine)
    would otherwise re-derive the assignment per consumer.

    Returns (id_col, cell, is_dup) for EVERY corpus row.
    """
    cents = train_centroids(corpus, id_col, vec_col, n_centroids,
                            n_iters=train_iters)
    # r06: the vector norm is computed ONCE per row at assignment time and
    # persisted; the in-cell O(cell^2) pair scoring then folds only the dot
    # product. sqrt(sum x*x) is the identical expression cosine_sim_col
    # evaluates (same fold order, same sqrt), so dot/(na*nb) is
    # bit-identical to the inlined form — 3 interpreted HOF folds per pair
    # become 1, on the operator's dominant stage.
    norm = F.sqrt(F.aggregate(F.col("_v"), F.lit(0.0),
                              lambda acc, x: acc + x * x))
    assigned = (
        corpus.select(F.col(id_col).alias("_id"),
                      as_double_array(vec_col).alias("_v"))
        .withColumn("cell", assign_cells_col(F.col("_v"), cents, round_to))
        .withColumn("_nrm", norm)
        .persist()
    )
    left = assigned.select("cell", F.col("_id").alias("_ida"),
                           F.col("_v").alias("_va"),
                           F.col("_nrm").alias("_na"))
    right = assigned.select("cell", F.col("_id").alias("_idb"),
                            F.col("_v").alias("_vb"),
                            F.col("_nrm").alias("_nb"))
    dot = F.aggregate(
        F.zip_with(F.col("_va"), F.col("_vb"), lambda x, y: x * y),
        F.lit(0.0), lambda acc, x: acc + x)
    cos = F.round(dot / (F.col("_na") * F.col("_nb")), round_to)
    losers = (
        left.join(right, "cell")
        .filter(F.col("_idb") < F.col("_ida"))
        .filter(cos >= F.lit(threshold))
        .select(F.col("_ida").alias("_id"))
        .distinct()
        .withColumn("_dup", F.lit(True))
    )
    return (
        assigned.join(losers, "_id", "left")
        .select(F.col("_id").alias(id_col), "cell",
                F.coalesce("_dup", F.lit(False)).alias("is_dup"))
    )
