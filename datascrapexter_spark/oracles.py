"""DuckDB oracle SQL for every query in queries.QUERIES (minus the iterative
crawl, which the driver checks rows-only and pytest checks exactly).

Every oracle recomputes the query's result from the raw parquet views using
only engine-portable constructs: md5 for all content hashing (bit-identical
across engines), integer arithmetic for fakes/buckets, round(x, n) applied
identically on both sides wherever float summation order could differ.

The hash-heavy oracles (minhash / simhash / SRP buckets) are generated
programmatically so the constants provably match the Spark operators.
"""

from __future__ import annotations

from .ops.similarity import srp_plane
from .ops.textstats import MOJIBAKE_SEQS, STOPWORDS

# ---------------------------------------------------------------------------
# shared SQL fragments
# ---------------------------------------------------------------------------

_AUG = (
    "SELECT doc_id, text FROM documents "
    "UNION ALL SELECT doc_id + 100000, text || ' qqzz' FROM documents"
)

# word-3-gram shingles, distinct per doc (matches ops.dedup.shingles_col)
_SHINGLES = r"""
tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '[ {t}{n}{r}]+') AS toks FROM aug),
sh AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, greatest(len(toks) - 2, 1) + 1),
                               i -> array_to_string(toks[i:i+2], ' '))) AS shingle
  FROM tok
)""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


def _minhash_pair_ctes(num_hashes: int = 16, bands: int = 4,
                       aug_sql: str | None = None) -> str:
    """Shared CTE chain (aug ... j) producing minhash-LSH verified pair
    rows — composed by the q14 pair query, the q35 cluster oracle, and
    (with a custom aug_sql corpus) the q75 best-representative oracle."""
    rows = num_hashes // bands
    # 4 x 32-bit slices per digest — must mirror dedup.minhash_signature
    mins = ", ".join(
        f"min(substring(md5(shingle || '#{s // 4}'), {1 + 8 * (s % 4)}, 8))"
        f" AS h{s}"
        for s in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band, md5(concat_ws('|', {cols})) AS key FROM sig".format(
            j=j, cols=", ".join(f"h{j * rows + r}" for r in range(rows))
        )
        for j in range(bands)
    )
    return f"""aug AS ({aug_sql or _AUG}),
{_SHINGLES},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_a, b.doc_id AS id_b
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id < b.doc_id
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ov AS (
  SELECT c.id_a, c.id_b, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_a
  JOIN sh sb ON sb.doc_id = c.id_b AND sb.shingle = sa.shingle
  GROUP BY c.id_a, c.id_b
),
j AS (
  SELECT ov.id_a, ov.id_b,
         ov.n_common::DOUBLE / (na.n_sh + nb.n_sh - ov.n_common) AS jac
  FROM ov
  JOIN sizes na ON na.doc_id = ov.id_a
  JOIN sizes nb ON nb.doc_id = ov.id_b
)"""


def _minhash_sql(num_hashes: int = 16, bands: int = 4, threshold: float = 0.5) -> str:
    return f"""
WITH {_minhash_pair_ctes(num_hashes, bands)}
SELECT id_a, id_b, round(jac, 6)::DOUBLE AS jaccard FROM j WHERE jac >= {threshold}
"""


def _incremental_dedup_sql(num_hashes: int = 16, bands: int = 4,
                           threshold: float = 0.5) -> str:
    """q72: the batch-vs-corpus MinHash probe replayed without the index —
    corpus UNION batch (ids disjoint: corpus < 100000, batch >= 200000),
    identical per-doc signatures/band keys, candidate join restricted to
    (batch, corpus) pairs, exact Jaccard verification. The persisted
    bucket/shingle-shard layout is physical only, so the oracle sees the
    same semantics."""
    rows = num_hashes // bands
    mins = ", ".join(
        f"min(substring(md5(shingle || '#{s // 4}'), {1 + 8 * (s % 4)}, 8))"
        f" AS h{s}"
        for s in range(num_hashes)
    )
    band_selects = " UNION ALL ".join(
        "SELECT doc_id, {j} AS band, md5(concat_ws('|', {cols})) AS key FROM sig".format(
            j=j, cols=", ".join(f"h{j * rows + r}" for r in range(rows))
        )
        for j in range(bands)
    )
    union = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 200000, text FROM documents "
        "WHERE doc_id % 20 = 0 "
        "UNION ALL SELECT doc_id + 200000, text || ' qqzz qqzz2 qqzz3' "
        "FROM documents WHERE doc_id % 20 = 1 "
        "UNION ALL SELECT doc_id + 200000, "
        "'novel doc ' || doc_id || ' fresh crawl content with no corpus twin' "
        "FROM documents WHERE doc_id % 20 = 2"
    )
    return f"""
WITH aug AS ({union}),
{_SHINGLES},
sig AS (SELECT doc_id, {mins} FROM sh GROUP BY doc_id),
bands AS ({band_selects}),
cand AS (
  SELECT DISTINCT a.doc_id AS id_new, b.doc_id AS id_corpus
  FROM bands a JOIN bands b ON a.band = b.band AND a.key = b.key
  WHERE a.doc_id >= 200000 AND b.doc_id < 200000
),
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ov AS (
  SELECT c.id_new, c.id_corpus, count(*) AS n_common
  FROM cand c
  JOIN sh sa ON sa.doc_id = c.id_new
  JOIN sh sb ON sb.doc_id = c.id_corpus AND sb.shingle = sa.shingle
  GROUP BY c.id_new, c.id_corpus
),
j AS (
  SELECT ov.id_new, ov.id_corpus,
         ov.n_common::DOUBLE / (na.n_sh + nb.n_sh - ov.n_common) AS jac
  FROM ov
  JOIN sizes na ON na.doc_id = ov.id_new
  JOIN sizes nb ON nb.doc_id = ov.id_corpus
)
SELECT id_new, id_corpus, round(jac, 6)::DOUBLE AS jaccard FROM j
WHERE jac >= {threshold}
"""


def _dedup_clusters_sql(num_hashes: int = 16, bands: int = 4,
                        threshold: float = 0.5) -> str:
    """Reproduces dedup.connected_components over the q14 minhash pair
    graph: cluster_id = min doc_id reachable (recursive closure; the
    Spark side converges to the same fixpoint by min-label propagation)."""
    return f"""
WITH RECURSIVE {_minhash_pair_ctes(num_hashes, bands)},
p AS (SELECT id_a, id_b FROM j WHERE jac >= {threshold}),
edges AS (SELECT id_a AS a, id_b AS b FROM p
          UNION ALL SELECT id_b, id_a FROM p),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM aug
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n)
SELECT doc_id, cluster_id,
       (doc_id = cluster_id) AS is_representative
FROM comp
"""


def _best_representatives_sql(num_hashes: int = 16, bands: int = 4,
                              threshold: float = 0.5) -> str:
    """q75: the q35 recursive closure + the q73 quality-ppm expressions,
    winner per cluster = max q_ppm then min doc_id (row_number replay),
    isolated docs kept by definition. Corpus: every third ORIGINAL gets
    digit junk; its clone stays clean — the clone should win."""
    aug75 = (
        "SELECT doc_id, CASE WHEN doc_id % 3 = 0 "
        "THEN text || ' 00 11 22 33' ELSE text END AS text FROM documents "
        "UNION ALL SELECT doc_id + 100000, text FROM documents"
    )
    return f"""
WITH RECURSIVE {_minhash_pair_ctes(num_hashes, bands, aug_sql=aug75)},
p AS (SELECT id_a, id_b FROM j WHERE jac >= {threshold}),
edges AS (SELECT id_a AS a, id_b AS b FROM p
          UNION ALL SELECT id_b, id_a FROM p),
reach(n, m) AS (
  SELECT doc_id, doc_id FROM aug
  UNION
  SELECT r.n, e.b FROM reach r JOIN edges e ON e.a = r.m
),
comp AS (SELECT n AS doc_id, min(m) AS cluster_id FROM reach GROUP BY n),
feat AS (
  SELECT doc_id,
         length(regexp_replace(text, '[ \t\n\r]', '', 'g'))::DOUBLE
           / greatest(len(regexp_split_to_array(trim(text), '[ \t\n\r]+')), 1)
           AS mean_tok,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS alpha,
         length(text) AS n_chars
  FROM aug
),
qual AS (
  SELECT doc_id, round(round(
    (CASE WHEN n_chars >= 20 AND n_chars <= 100000 THEN 0.4 ELSE 0.0 END)
    + (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0 THEN 0.3 ELSE 0.0 END)
    + least(alpha, 1.0) * 0.3, 6) * 1000000)::BIGINT AS q_ppm
  FROM feat
),
pn AS (SELECT id_a AS doc_id FROM p UNION SELECT id_b FROM p),
rnk AS (
  SELECT c.doc_id,
         row_number() OVER (PARTITION BY c.cluster_id
                            ORDER BY q.q_ppm DESC, c.doc_id ASC) AS rn
  FROM comp c
  JOIN qual q ON q.doc_id = c.doc_id
  WHERE c.doc_id IN (SELECT doc_id FROM pn)
)
SELECT c.doc_id, c.cluster_id, q.q_ppm,
       coalesce(r.rn = 1, TRUE) AS kept
FROM comp c
JOIN qual q ON q.doc_id = c.doc_id
LEFT JOIN rnk r ON r.doc_id = c.doc_id
"""


def _ngram_jaccard_sql(threshold: float = 0.6) -> str:
    return f"""
WITH aug AS ({_AUG}),
{_SHINGLES},
sizes AS (SELECT doc_id, count(*) AS n_sh FROM sh GROUP BY doc_id),
ov AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*) AS n_common
  FROM sh a JOIN sh b ON a.shingle = b.shingle AND a.doc_id < b.doc_id
  GROUP BY 1, 2
),
j AS (
  SELECT ov.id_a, ov.id_b,
         ov.n_common::DOUBLE / (na.n_sh + nb.n_sh - ov.n_common) AS jac
  FROM ov
  JOIN sizes na ON na.doc_id = ov.id_a
  JOIN sizes nb ON nb.doc_id = ov.id_b
)
SELECT id_a, id_b, round(jac, 6)::DOUBLE AS jaccard FROM j WHERE jac >= {threshold}
"""


def _simhash_sql(bits: int = 32, max_hamming: int = 3) -> str:
    sums = ", ".join(
        f"sum(CASE WHEN (h >> {b}) & 1 = 1 THEN 1 ELSE -1 END) AS s{b}"
        for b in range(bits)
    )
    recompose = " + ".join(
        f"CASE WHEN s{b} > 0 THEN {1 << b} ELSE 0 END" for b in range(bits)
    )
    return f"""
WITH aug AS ({_AUG}),
tok AS (SELECT doc_id, unnest(regexp_split_to_array(trim(text), '[ \t\n\r]+')) AS token FROM aug),
th AS (SELECT doc_id, ('0x' || substr(md5(token), 1, {bits // 4}))::BIGINT AS h FROM tok),
sums AS (SELECT doc_id, {sums} FROM th GROUP BY doc_id),
fp AS (SELECT doc_id, ({recompose})::BIGINT AS simhash FROM sums)
SELECT a.doc_id AS id_a, b.doc_id AS id_b,
       bit_count(xor(a.simhash, b.simhash))::INT AS hamming
FROM fp a JOIN fp b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.simhash, b.simhash)) <= {max_hamming}
"""


# exploded embedding vectors with 1-based dim index
_EMB_EXPLODED = """
e AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
)"""


def _cosine_topk_sql(k: int = 5, n_queries: int = 10) -> str:
    return f"""
WITH {_EMB_EXPLODED},
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
d AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
  FROM e q JOIN e c USING (i)
  WHERE q.vec_id < {n_queries}
  GROUP BY 1, 2
),
s AS (
  SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6)::DOUBLE AS cos
  FROM d JOIN n nq ON nq.vec_id = d.qid JOIN n nc ON nc.vec_id = d.cid
),
r AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::INT AS rank
  FROM s
)
SELECT qid, cid, cos, rank FROM r WHERE rank <= {k}
"""


def _ann_lsh_sql(dim: int, k: int = 5, n_queries: int = 10,
                 n_planes: int = 8) -> str:
    plane_terms = []
    for p in range(n_planes):
        arr = ", ".join(str(w) for w in srp_plane(p, dim))
        plane_terms.append(
            f"CASE WHEN sum(v * (([{arr}])::DOUBLE[])[i]) > 0 THEN {1 << p} ELSE 0 END"
        )
    bucket_expr = " + ".join(plane_terms)
    return f"""
WITH {_EMB_EXPLODED},
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
bk AS (SELECT vec_id, ({bucket_expr})::INT AS bucket FROM e GROUP BY vec_id),
d AS (
  SELECT q.vec_id AS qid, c.vec_id AS cid, sum(q.v * c.v) AS dot
  FROM e q
  JOIN bk bq ON bq.vec_id = q.vec_id
  JOIN bk bc ON bc.bucket = bq.bucket
  JOIN e c ON c.vec_id = bc.vec_id AND c.i = q.i
  WHERE q.vec_id < {n_queries}
  GROUP BY 1, 2
),
s AS (
  SELECT qid, cid, round(dot / (nq.nrm * nc.nrm), 6)::DOUBLE AS cos
  FROM d JOIN n nq ON nq.vec_id = d.qid JOIN n nc ON nc.vec_id = d.cid
),
r AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::INT AS rank
  FROM s
)
SELECT qid, cid, cos, rank FROM r WHERE rank <= {k}
"""


# q22/q23 shared: exploded base + deterministically perturbed copies
_AUG_EMB = """
base AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
aug AS (
  SELECT vec_id, i, v FROM base
  UNION ALL
  SELECT vec_id + 100000, i,
         v * (1.0 + ((vec_id + i - 1) % 7)::DOUBLE / 100.0)
  FROM base
)"""


def _embedding_neardup_lsh_sql(dim: int, threshold: float = 0.99,
                               n_planes: int = 8, n_plane_sets: int = 2) -> str:
    """Reproduces dedup.embedding_neardup_pairs_lsh: SRP buckets per plane
    set (set s = planes s*n_planes..s*n_planes+n_planes-1), candidates from
    the (pset, bucket) equi-join, exact cosine verification."""
    set_selects = []
    for s in range(n_plane_sets):
        plane_terms = []
        for p in range(n_planes):
            arr = ", ".join(str(w) for w in srp_plane(s * n_planes + p, dim))
            plane_terms.append(
                f"CASE WHEN sum(v * (([{arr}])::DOUBLE[])[i]) > 0 "
                f"THEN {1 << p} ELSE 0 END"
            )
        set_selects.append(
            f"SELECT vec_id, {s} AS pset, ({' + '.join(plane_terms)})::INT "
            "AS bucket FROM aug GROUP BY vec_id"
        )
    buckets = " UNION ALL ".join(set_selects)
    return f"""
WITH {_AUG_EMB},
bk AS ({buckets}),
cand AS (
  SELECT DISTINCT a.vec_id AS id_a, b.vec_id AS id_b
  FROM bk a JOIN bk b ON a.pset = b.pset AND a.bucket = b.bucket
  WHERE a.vec_id < b.vec_id
),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM aug GROUP BY vec_id),
d AS (
  SELECT c.id_a, c.id_b, sum(a.v * b.v) AS dot
  FROM cand c
  JOIN aug a ON a.vec_id = c.id_a
  JOIN aug b ON b.vec_id = c.id_b AND b.i = a.i
  GROUP BY 1, 2
),
s AS (
  SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cos
  FROM d JOIN n na ON na.vec_id = d.id_a JOIN n nb ON nb.vec_id = d.id_b
)
SELECT id_a, id_b, round(cos, 6)::DOUBLE AS cos FROM s WHERE cos >= {threshold}
"""


def _kmeans_iter_ctes(train_iters: int) -> str:
    """Lloyd-iteration CTEs c1..cT over init c0 (cell, i, v), shared by
    the IVF (q26) and SemDeDup (q82) oracles. References CTEs `e`
    (vec_id, i, v exploded corpus), `samp` (training-sample ids) and
    `n` (per-vector norms) that the caller must define."""
    iters = []
    for t in range(1, train_iters + 1):
        p = t - 1
        iters.append(f"""
nc{p} AS (SELECT cell, sqrt(sum(v * v)) AS nrm FROM c{p} GROUP BY cell),
a{t} AS (
  SELECT vec_id, cell FROM (
    SELECT s.vec_id, c.cell,
           row_number() OVER (
             PARTITION BY s.vec_id
             ORDER BY round(sum(e.v * c.v)
                            / (any_value(n.nrm) * any_value(nc.nrm)), 6)
                        DESC, c.cell ASC) AS rn
    FROM samp s
    JOIN e ON e.vec_id = s.vec_id
    JOIN c{p} c ON c.i = e.i
    JOIN n ON n.vec_id = s.vec_id
    JOIN nc{p} nc ON nc.cell = c.cell
    GROUP BY s.vec_id, c.cell
  ) WHERE rn = 1
),
m{t} AS (
  SELECT a.cell, e.i, round(avg(e.v), 6) AS v
  FROM a{t} a JOIN e ON e.vec_id = a.vec_id
  GROUP BY a.cell, e.i
),
c{t} AS (
  SELECT p.cell, p.i, coalesce(m.v, p.v) AS v
  FROM c{p} p LEFT JOIN m{t} m ON m.cell = p.cell AND m.i = p.i
)""".strip())
    return (",\n" + ",\n".join(iters)) if iters else ""


def _ivf_sql(k: int = 5, n_queries: int = 10, n_centroids: int = 16,
             n_probe: int = 4, train_iters: int = 2,
             sample_size: int = 256) -> str:
    """Reproduces similarity.ivf_topk: md5-picked centroid INIT refined by
    `train_iters` deterministic Lloyd iterations over the md5-ordered
    training sample (similarity.train_centroids — per-iteration: nearest
    cell by round(cos,6) with ties to the smaller cell, member means
    rounded to 6, empty cells carry forward), then nearest-cell
    assignment, n_probe query cells, exact in-cell cosine top-k."""
    iter_ctes = _kmeans_iter_ctes(train_iters)
    return f"""
WITH {_EMB_EXPLODED},
cpick AS (
  SELECT cvid, cell FROM (
    SELECT vec_id AS cvid,
           (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
            - 1)::INT AS cell
    FROM embeddings
  ) WHERE cell < {n_centroids}
),
samp AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rn
    FROM embeddings
  ) WHERE rn <= {max(sample_size, n_centroids)}
),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
c0 AS (SELECT c.cell, e.i, e.v FROM cpick c JOIN e ON e.vec_id = c.cvid)
{iter_ctes},
ce AS (SELECT cell, i, v FROM c{train_iters}),
nc AS (SELECT cell, sqrt(sum(v * v)) AS nrm FROM ce GROUP BY cell),
ac AS (
  SELECT a.vec_id, c.cell,
         round(sum(a.v * c.v) / (any_value(na.nrm) * any_value(ncc.nrm)), 6) AS cos
  FROM e a
  JOIN ce c ON c.i = a.i
  JOIN n na ON na.vec_id = a.vec_id
  JOIN nc ncc ON ncc.cell = c.cell
  GROUP BY a.vec_id, c.cell
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cell ASC) AS rn
    FROM ac
  ) WHERE rn = 1
),
probes AS (
  SELECT vec_id AS qid, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cell ASC) AS rn
    FROM ac WHERE vec_id < {n_queries}
  ) WHERE rn <= {n_probe}
),
cand AS (SELECT p.qid, a.vec_id AS cid FROM probes p
         JOIN assign a ON a.cell = p.cell),
d AS (
  SELECT c.qid, c.cid, sum(q.v * t.v) AS dot
  FROM cand c
  JOIN e q ON q.vec_id = c.qid
  JOIN e t ON t.vec_id = c.cid AND t.i = q.i
  GROUP BY c.qid, c.cid
),
s AS (
  SELECT qid, cid, round(dot / (nq.nrm * nt.nrm), 6)::DOUBLE AS cos
  FROM d JOIN n nq ON nq.vec_id = d.qid JOIN n nt ON nt.vec_id = d.cid
),
r AS (
  SELECT qid, cid, cos,
         row_number() OVER (PARTITION BY qid ORDER BY cos DESC, cid ASC)::INT AS rank
  FROM s
)
SELECT qid, cid, cos, rank FROM r WHERE rank <= {k}
"""


def _semantic_dedup_sql(n_centroids: int = 16, threshold: float = 0.99,
                        train_iters: int = 2,
                        sample_size: int = 256) -> str:
    """Reproduces similarity.semantic_dedup_flags over the augmented
    near-dup corpus: the same deterministic k-means chain as q26 (over
    the AUG ids), nearest-cell assignment, then a doc is a duplicate iff
    a smaller-id same-cell member has round(cos, 6) >= threshold."""
    iter_ctes = _kmeans_iter_ctes(train_iters)
    return f"""
WITH {_AUG_EMB},
e AS (SELECT vec_id, i, v FROM aug),
ids AS (SELECT DISTINCT vec_id FROM e),
cpick AS (
  SELECT cvid, cell FROM (
    SELECT vec_id AS cvid,
           (row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
            - 1)::INT AS cell
    FROM ids
  ) WHERE cell < {n_centroids}
),
samp AS (
  SELECT vec_id FROM (
    SELECT vec_id,
           row_number() OVER (ORDER BY md5(CAST(vec_id AS VARCHAR)), vec_id)
           AS rn
    FROM ids
  ) WHERE rn <= {max(sample_size, n_centroids)}
),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM e GROUP BY vec_id),
c0 AS (SELECT c.cell, e.i, e.v FROM cpick c JOIN e ON e.vec_id = c.cvid)
{iter_ctes},
ce AS (SELECT cell, i, v FROM c{train_iters}),
nc AS (SELECT cell, sqrt(sum(v * v)) AS nrm FROM ce GROUP BY cell),
ac AS (
  SELECT a.vec_id, c.cell,
         round(sum(a.v * c.v) / (any_value(na.nrm) * any_value(ncc.nrm)), 6) AS cos
  FROM e a
  JOIN ce c ON c.i = a.i
  JOIN n na ON na.vec_id = a.vec_id
  JOIN nc ncc ON ncc.cell = c.cell
  GROUP BY a.vec_id, c.cell
),
assign AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell,
           row_number() OVER (PARTITION BY vec_id
                              ORDER BY cos DESC, cell ASC) AS rn
    FROM ac
  ) WHERE rn = 1
),
pd AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b
  FROM assign a JOIN assign b ON b.cell = a.cell AND b.vec_id < a.vec_id
),
dt AS (
  SELECT p.id_a, p.id_b, sum(x.v * y.v) AS dot
  FROM pd p
  JOIN e x ON x.vec_id = p.id_a
  JOIN e y ON y.vec_id = p.id_b AND y.i = x.i
  GROUP BY 1, 2
),
sc AS (
  SELECT id_a, round(dot / (na.nrm * nb.nrm), 6) AS cos
  FROM dt JOIN n na ON na.vec_id = dt.id_a JOIN n nb ON nb.vec_id = dt.id_b
),
dup AS (SELECT DISTINCT id_a AS vec_id FROM sc WHERE cos >= {threshold})
SELECT a.vec_id, a.cell, (d.vec_id IS NOT NULL) AS is_dup
FROM assign a LEFT JOIN dup d USING (vec_id)
"""


def _dsir_feats_cte(src: str, prefix: str) -> str:
    """Shared DSIR feature pipeline: whitespace tokens of lowercased text
    (full [ \\t\\n\\r] edge trim — dedup.tokens_col's rule), 'u:' unigram
    + 'b:' bigram features, md5-slice 60-bit bucket hash."""
    return rf"""
{prefix}tk AS (
  SELECT doc_id,
         CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT doc_id,
               regexp_replace(lower(text), '^[ \t\n\r]+|[ \t\n\r]+$', '')
                 AS t2
        FROM {src})
),
{prefix}ft AS (
  SELECT doc_id, unnest(list_concat(
    list_transform(toks, x -> 'u:' || x),
    CASE WHEN len(toks) >= 2
         THEN list_transform(range(1, len(toks)),
                i -> 'b:' || toks[i::INT] || ' ' || toks[(i + 1)::INT])
         ELSE []::VARCHAR[] END)) AS feat
  FROM {prefix}tk
)""".strip()


def _dsir_sql(n_buckets: int = 1024) -> str:
    """Reproduces mix.dsir_weights(documents, documents WHERE lang='en'):
    bit-length integer log-likelihood ratio of hashed unigram+bigram
    models; absent target bucket -> bitlen 0; truncate-toward-zero
    average ((x - x % n) / n — NOT `//`, which floors negatives)."""
    return f"""
WITH {_dsir_feats_cte("documents", "r")},
{_dsir_feats_cte("(SELECT doc_id, text FROM documents WHERE lang = 'en')",
                 "t")},
doc_tf AS (
  SELECT doc_id,
         ('0x' || substr(md5(feat), 1, 15))::BIGINT % {n_buckets} AS bucket,
         count(*)::BIGINT AS tf
  FROM rft GROUP BY 1, 2
),
raw AS (SELECT bucket, sum(tf)::BIGINT AS cr FROM doc_tf GROUP BY 1),
tgt AS (
  SELECT ('0x' || substr(md5(feat), 1, 15))::BIGINT % {n_buckets} AS bucket,
         count(*)::BIGINT AS ct
  FROM tft GROUP BY 1
),
model AS (
  SELECT r.bucket,
         ((CASE WHEN t.ct IS NULL THEN 0
                ELSE length(format('{{:b}}', t.ct)) END)
          - length(format('{{:b}}', r.cr)))::INT AS rel
  FROM raw r LEFT JOIN tgt t USING (bucket)
),
tot AS (
  SELECT length(format('{{:b}}', (SELECT sum(cr) FROM raw)::BIGINT))::INT
           AS bits_r,
         length(format('{{:b}}', (SELECT sum(ct) FROM tgt)::BIGINT))::INT
           AS bits_t
),
pd AS (
  SELECT doc_id, sum(tf)::BIGINT AS n_feats,
         sum(tf * rel)::BIGINT AS wrel
  FROM doc_tf JOIN model USING (bucket) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(pd.n_feats, 0)::BIGINT AS n_feats,
       coalesce(pd.wrel + pd.n_feats * (t.bits_r - t.bits_t), 0)::BIGINT
         AS llr_bits,
       (CASE WHEN pd.n_feats IS NULL OR pd.n_feats = 0 THEN 0
             ELSE (1000 * (pd.wrel + pd.n_feats * (t.bits_r - t.bits_t))
                   - (1000 * (pd.wrel + pd.n_feats * (t.bits_r - t.bits_t)))
                     % pd.n_feats) / pd.n_feats
        END)::BIGINT AS avg_millibits
FROM documents d LEFT JOIN pd USING (doc_id) CROSS JOIN tot t
"""


# Reproduces queries.q84_soft404 + textstats.soft404_columns: synthesized
# titles/bodies (every 17th doc an error page), lowercase substring
# markers, additive score, flag at >= 2.
_SOFT404_SQL = r"""
WITH p AS (
  SELECT doc_id,
         lower(CASE WHEN doc_id % 17 = 0
                    THEN '404 Not Found - Doc ' || doc_id
                    ELSE 'Doc ' || doc_id END) AS t,
         lower(CASE WHEN doc_id % 17 = 0
                    THEN 'The page you requested was not found on this server.'
                    ELSE text END) AS b
  FROM documents
),
s AS (
  SELECT doc_id,
         (t LIKE '%404%' OR t LIKE '%not found%' OR t LIKE '%error%')
           AS title_404,
         (b LIKE '%not found%' OR b LIKE '%does not exist%'
          OR b LIKE '%no longer available%' OR b LIKE '%page unavailable%')
           AS body_404,
         len(CASE WHEN b2 = '' THEN []::VARCHAR[]
                  ELSE regexp_split_to_array(b2, '[ \t\n\r]+') END) < 16
           AS tiny_body
  FROM (SELECT *,
               regexp_replace(b, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS b2
        FROM p)
)
SELECT doc_id, title_404, body_404, tiny_body,
       (title_404::INT * 2 + body_404::INT * 2 + tiny_body::INT)::INT
         AS soft404_score,
       (title_404::INT * 2 + body_404::INT * 2 + tiny_body::INT) >= 2
         AS is_soft404
FROM s
"""


# Reproduces textstats.surprisal_buckets: q70's integer surprisal, then
# head/middle/tail by exact integer rank over the value histogram
# (3*cum >= N and 3*cum >= 2*N smallest values; ties share a bucket).
# {q70} is substituted via .replace at registration (the q70 SQL itself
# contains format('{:b}') braces, so str.format would choke).
_SURPRISAL_BUCKETS_SQL = """
WITH sc AS (
  SELECT doc_id, avg_millibits FROM ({q70}) q70
),
hist AS (SELECT avg_millibits, count(*)::BIGINT AS c FROM sc GROUP BY 1),
cum AS (
  SELECT avg_millibits,
         sum(c) OVER (ORDER BY avg_millibits
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
           AS cum
  FROM hist
),
tot AS (SELECT sum(c)::BIGINT AS n FROM hist),
cuts AS (
  SELECT min(CASE WHEN 3 * cum >= n THEN avg_millibits END) AS cut1,
         min(CASE WHEN 3 * cum >= 2 * n THEN avg_millibits END) AS cut2
  FROM cum CROSS JOIN tot
)
SELECT sc.doc_id, sc.avg_millibits,
       CASE WHEN sc.avg_millibits <= cuts.cut1 THEN 'head'
            WHEN sc.avg_millibits <= cuts.cut2 THEN 'middle'
            ELSE 'tail' END AS bucket
FROM sc CROSS JOIN cuts
"""


# Reproduces queries.q36_c4_line_filter + textstats.c4_clean_cols:
# deterministic 8-token lines with seeded punctuation, lorem-injected
# pages, then the C4 line-keep predicate (terminal punct, >=3 words, no
# 'javascript') and whole-page forbidden-marker drop.
_C4_LINE_FILTER_SQL = """
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), ' +') AS toks
  FROM documents
),
g AS (SELECT doc_id, toks, cast(ceil(len(toks) / 8.0) AS INT) AS ng FROM t),
l AS (
  SELECT doc_id,
         list_transform(range(0, ng), i ->
           array_to_string(toks[i*8+1 : i*8+8], ' ') ||
           CASE WHEN (doc_id + i) % 4 = 0 THEN '' ELSE '.' END) AS lines
  FROM g
),
ml AS (
  SELECT doc_id,
         CASE WHEN doc_id % 50 = 0
              THEN array_to_string(lines, chr(10)) || chr(10)
                   || 'lorem ipsum filler {'
              ELSE array_to_string(lines, chr(10)) END AS text_ml
  FROM l
),
res AS (
  SELECT doc_id,
         (contains(lower(text_ml), 'lorem ipsum')
          OR contains(lower(text_ml), '{')) AS doc_dropped,
         string_split(text_ml, chr(10)) AS all_lines,
         list_filter(string_split(text_ml, chr(10)), x ->
           regexp_matches(trim(x), '[.!?"]$')
           AND len(regexp_split_to_array(trim(x), ' +')) >= 3
           AND NOT contains(lower(trim(x)), 'javascript')) AS kept
  FROM ml
)
SELECT doc_id, doc_dropped,
       len(all_lines)::INT AS n_lines,
       (CASE WHEN doc_dropped THEN 0 ELSE len(kept) END)::INT
         AS n_kept_lines,
       CASE WHEN doc_dropped THEN NULL
            -- coalesce: DuckDB's array_to_string of an empty list is
            -- NULL; Spark's array_join is '' — a zero-kept-lines page is
            -- an empty (not null) cleaned text
            ELSE coalesce(array_to_string(kept, chr(10)), '') END
         AS cleaned_text
FROM res
"""


# Reproduces queries.q37_stratified_split + ops.sampling: u(key, seed) =
# first 32 md5 bits of 'key#seed' as a unit float; per-lang keep rates;
# disjoint split thresholds on an independent seed.
_STRATIFIED_SPLIT_SQL = """
WITH u AS (
  SELECT doc_id, lang,
         ('0x' || substr(md5(doc_id::VARCHAR || '#1'), 1, 8))::BIGINT
           / 4294967296.0 AS u_sample,
         ('0x' || substr(md5(doc_id::VARCHAR || '#2'), 1, 8))::BIGINT
           / 4294967296.0 AS u_split
  FROM documents
)
SELECT doc_id, lang,
       CASE WHEN u_split < 0.05 THEN 'val'
            WHEN u_split < 0.10 THEN 'test'
            ELSE 'train' END AS split
FROM u
WHERE u_sample < CASE lang WHEN 'en' THEN 0.5
                           WHEN 'zh' THEN 0.25
                           ELSE 1.0 END
"""


def _pii_scrub_sql() -> str:
    """Reproduces queries.q38_pii_scrub: same injected PII, same
    PII_PATTERNS (RE2-compatible by construction) replayed with global
    regexp_replace in the same order."""
    from .ops.pii import PII_PATTERNS

    counts = ", ".join(
        f"len(regexp_extract_all(t, '{pat}'))::INT AS n_{kind}"
        for kind, pat, _ in PII_PATTERNS
    )
    scrub = "t"
    for _, pat, token in PII_PATTERNS:
        scrub = f"regexp_replace({scrub}, '{pat}', '{token}', 'g')"
    return f"""
WITH d AS (
  SELECT doc_id,
         text
         || CASE WHEN doc_id % 3 = 0
                 THEN ' contact user' || doc_id::VARCHAR
                      || '@example.com now' ELSE '' END
         || CASE WHEN doc_id % 5 = 0
                 THEN ' from 192.168.' || (doc_id % 256)::VARCHAR || '.7'
                 ELSE '' END
         || CASE WHEN doc_id % 7 = 0
                 THEN ' call +1555010'
                      || lpad((doc_id % 1000)::VARCHAR, 3, '0')
                 ELSE '' END AS t
  FROM documents
)
SELECT doc_id, {counts}, {scrub} AS scrubbed FROM d
"""


_PARAGRAPH_DEDUP_SQL = r"""
WITH d AS (
  SELECT doc_id,
         list_filter([
             substr(text, 1, 120),
             substr(text, 121, 100000),
             CASE WHEN doc_id % 4 = 0
                  THEN 'subscribe to our newsletter for updates' END,
             CASE WHEN doc_id % 6 = 0
                  THEN 'all rights reserved copyright notice' END
         ], p -> p IS NOT NULL AND p <> '') AS paras
  FROM documents
),
e AS (
  SELECT doc_id, len(paras)::INT AS n_paras,
         unnest(paras) AS para,
         unnest(range(len(paras)))::INT AS pos
  FROM d
),
k AS (
  SELECT *, row_number() OVER (PARTITION BY md5(para)
                               ORDER BY doc_id, pos) AS rn
  FROM e
)
SELECT doc_id, any_value(n_paras) AS n_paras,
       count(*)::BIGINT AS n_kept,
       string_agg(para, chr(10) || chr(10) ORDER BY pos) AS text
FROM k WHERE rn = 1
GROUP BY doc_id
"""


_SHUFFLE_SHARDS_SQL = """
WITH u AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR || '#42'), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
)
SELECT doc_id, floor(u * 8)::INT AS shard,
       (row_number() OVER (PARTITION BY floor(u * 8)
                           ORDER BY u, doc_id) - 1)::INT AS seq
FROM u
"""


def _decontamination_sql() -> str:
    """Reproduces queries.q41_decontamination: same injected benchmark
    sentence, same distinct word-8-gram sets on both sides, same
    hit-count/left-join shape."""
    from .queries import _BENCH_SENTENCE

    shingle8 = ("list_transform(range(1, greatest(len(toks) - 7, 1) + 1), "
                "i -> array_to_string(toks[i:i+7], ' '))")
    ws = "[ {t}{n}{r}]+".replace("{t}", "\t").replace("{n}", "\n") \
                        .replace("{r}", "\r")
    return f"""
WITH d AS (
  SELECT doc_id,
         text || CASE WHEN doc_id % 11 = 0
                      THEN ' {_BENCH_SENTENCE}' ELSE '' END AS text
  FROM documents
),
tok AS (SELECT doc_id, regexp_split_to_array(trim(text), '{ws}') AS toks
        FROM d),
sh AS (SELECT DISTINCT doc_id, unnest({shingle8}) AS shingle FROM tok),
bt AS (SELECT * FROM (VALUES ('{_BENCH_SENTENCE}'),
  ('completely unrelated benchmark passage nothing matches here'))
  v(text)),
btok AS (SELECT regexp_split_to_array(trim(text), '{ws}') AS toks FROM bt),
b AS (SELECT DISTINCT unnest({shingle8}) AS shingle FROM btok),
sizes AS (SELECT doc_id, count(*) AS n_shingles FROM sh GROUP BY doc_id),
hits AS (
  SELECT doc_id, count(*) AS n_contaminated
  FROM sh WHERE shingle IN (SELECT shingle FROM b)
  GROUP BY doc_id
)
SELECT s.doc_id, s.n_shingles::INT AS n_shingles,
       coalesce(h.n_contaminated, 0)::BIGINT AS n_contaminated,
       coalesce(h.n_contaminated, 0) > 0 AS contaminated
FROM sizes s LEFT JOIN hits h USING (doc_id)
"""


_DOMAIN_CAP_SQL = """
WITH u AS (
  SELECT doc_id, source,
         ('0x' || substr(md5(doc_id::VARCHAR || '#3'), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
),
r AS (
  SELECT doc_id, source,
         row_number() OVER (PARTITION BY source ORDER BY u, doc_id) AS rn
  FROM u
)
SELECT doc_id, source FROM r WHERE rn <= 10
"""


_TFIDF_SQL = """
WITH tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(text), '[ {t}{n}{r}]+')) AS token
  FROM documents
),
tf AS (SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY 1, 2),
dfq AS (SELECT token, count(*) AS df FROM tf GROUP BY 1),
s AS (
  SELECT tf.doc_id, tf.token, tf.tf, dfq.df,
         round(tf.tf::DOUBLE / dfq.df, 6)::DOUBLE AS score,
         row_number() OVER (PARTITION BY tf.doc_id
                            ORDER BY tf.tf::DOUBLE / dfq.df DESC,
                                     tf.token) AS rn
  FROM tf JOIN dfq USING (token)
)
SELECT doc_id, token, tf::BIGINT AS tf, df::BIGINT AS df, score,
       rn::INT AS rank
FROM s WHERE rn <= 5
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


_TOKEN_BUDGET_SQL = """
WITH d AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '[ {t}{n}{r}]+'))::BIGINT
           AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR || '#4'), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
),
c AS (
  SELECT doc_id, n_tokens,
         sum(n_tokens) OVER (ORDER BY u, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM d
)
SELECT doc_id, n_tokens, cum::BIGINT AS cum_tokens
FROM c WHERE cum <= 10000
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


def _staged_pipeline_sql() -> str:
    """Replays queries.q45_staged_pipeline stage by stage: the q12
    extraction algebra, the same transform chains, the options-whitelist
    default substitution, keep-first dedup per heading, and the literal
    tier dim as a VALUES join."""
    allowed = ", ".join(f"'SRC{i}'" for i in range(20) if i not in (7, 13))
    return f"""
WITH x AS (
  SELECT doc_id,
         'Doc ' || doc_id AS title,
         upper(source) AS heading,
         trim(substr(text, 1, 50)) AS description,
         ((n_chars::VARCHAR) || '.99')::DOUBLE AS price
  FROM documents
),
t AS (
  SELECT doc_id, upper(title) AS title, heading,
         lower(trim(description)) AS description, price
  FROM x
),
v AS (
  SELECT doc_id, title,
         CASE WHEN heading IN ({allowed}) THEN heading
              ELSE 'OTHER' END AS heading,
         description, price,
         CASE WHEN heading IN ({allowed}) THEN 0 ELSE 1 END AS n_violations
  FROM t
),
d AS (
  SELECT *, row_number() OVER (PARTITION BY heading
                               ORDER BY doc_id) AS rn
  FROM v
)
SELECT d.doc_id, d.heading, d.title, d.description, d.price,
       d.n_violations::INT AS n_violations, e.tier
FROM d LEFT JOIN (VALUES ('SRC0', 'gold'), ('SRC1', 'silver'),
                         ('OTHER', 'quarantine')) e(heading, tier)
  ON d.heading = e.heading
WHERE d.rn = 1
"""


def _gopher_filter_sql() -> str:
    """Replays queries.q46_gopher_filter: the q19/q27 measure twins plus
    the same fixed-order threshold reasons."""
    en = "[" + ", ".join(f"'{w}'" for w in STOPWORDS["en"]) + "]"
    ws = "[ {t}{n}{r}]+".replace("{t}", "\t").replace("{n}", "\n") \
                        .replace("{r}", "\r")
    return f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '{ws}') AS toks
  FROM documents
),
bi AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> array_to_string(toks[i:i+1], ' ')) AS bigrams
  FROM t
),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
top AS (SELECT doc_id, max(c) AS mx FROM tc GROUP BY doc_id),
ln AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, chr(10)),
                     x -> trim(x) != '') AS lines
  FROM t
),
m AS (
  SELECT t.doc_id,
         len(t.toks)::BIGINT AS n_tokens,
         round(length(regexp_replace(t.text, '[ \\t\\n\\r]', '', 'g'))::DOUBLE
               / greatest(len(t.toks), 1), 6)::DOUBLE AS mean_token_len,
         round(length(regexp_replace(t.text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
               / greatest(length(t.text), 1), 6)::DOUBLE AS alpha_ratio,
         len(list_filter(t.toks,
             x -> list_contains({en}, lower(x))))::INT AS stop_hits,
         round(coalesce(top.mx, 0)::DOUBLE
               / greatest(len(t.toks), 1), 6)::DOUBLE AS top_token_ratio,
         round(1.0 - len(list_distinct(bi.bigrams))::DOUBLE
               / greatest(len(bi.bigrams), 1), 6)::DOUBLE AS dup_bigram_ratio,
         round(1.0 - len(list_distinct(ln.lines))::DOUBLE
               / greatest(len(ln.lines), 1), 6)::DOUBLE AS dup_line_ratio
  FROM t
  JOIN bi ON bi.doc_id = t.doc_id
  JOIN ln ON ln.doc_id = t.doc_id
  LEFT JOIN top ON top.doc_id = t.doc_id
),
r AS (
  SELECT *,
         list_filter([
           CASE WHEN n_tokens < 50 OR n_tokens > 100000
                THEN 'token_count' END,
           CASE WHEN mean_token_len < 3.0 OR mean_token_len > 10.0
                THEN 'mean_token_len' END,
           CASE WHEN alpha_ratio < 0.8 THEN 'alpha_ratio' END,
           CASE WHEN stop_hits < 2 THEN 'stopwords' END,
           CASE WHEN top_token_ratio > 0.3 THEN 'top_token' END,
           CASE WHEN dup_bigram_ratio > 0.2 THEN 'dup_bigram' END,
           CASE WHEN dup_line_ratio > 0.3 THEN 'dup_line' END
         ], x -> x IS NOT NULL) AS reason_list
  FROM m
)
SELECT doc_id, n_tokens, mean_token_len, alpha_ratio, stop_hits,
       top_token_ratio, dup_bigram_ratio, dup_line_ratio,
       len(reason_list) = 0 AS keep,
       coalesce(array_to_string(reason_list, ','), '') AS reasons
FROM r
"""


_REPETITION_SQL = r"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '[ {T}{N}{R}]+') AS toks
  FROM documents
),
bi AS (
  SELECT doc_id,
         list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                        i -> array_to_string(toks[i:i+1], ' ')) AS bigrams
  FROM t
),
tok AS (SELECT doc_id, unnest(toks) AS tk FROM t),
tc AS (SELECT doc_id, tk, count(*) AS c FROM tok GROUP BY doc_id, tk),
top AS (SELECT doc_id, max(c) AS mx FROM tc GROUP BY doc_id),
ln AS (
  SELECT doc_id,
         list_filter(regexp_split_to_array(text, '{N}'),
                     x -> trim(x) != '') AS lines
  FROM t
)
SELECT t.doc_id,
       round(len(list_distinct(t.toks))::DOUBLE
             / greatest(len(t.toks), 1), 6)::DOUBLE AS distinct_token_ratio,
       round(coalesce(top.mx, 0)::DOUBLE
             / greatest(len(t.toks), 1), 6)::DOUBLE AS top_token_ratio,
       round(1.0 - len(list_distinct(bi.bigrams))::DOUBLE
             / greatest(len(bi.bigrams), 1), 6)::DOUBLE AS dup_bigram_ratio,
       round(1.0 - len(list_distinct(ln.lines))::DOUBLE
             / greatest(len(ln.lines), 1), 6)::DOUBLE AS dup_line_ratio
FROM t
JOIN bi ON bi.doc_id = t.doc_id
JOIN ln ON ln.doc_id = t.doc_id
LEFT JOIN top ON top.doc_id = t.doc_id
""".replace("{T}", "\t").replace("{N}", "\n").replace("{R}", "\r")


def _text_stats_sql() -> str:
    def lst(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    score = " ".join(
        f"WHEN s_{lang} > 0 "
        + " ".join(
            f"AND s_{lang} >= s_{other}"
            for other in ("en", "de", "fr", "es")
            if other != lang and ("en", "de", "fr", "es").index(other) > ("en", "de", "fr", "es").index(lang)
        )
        + f" THEN '{lang}'"
        for lang in ("en", "de", "fr", "es")
    )
    return f"""
WITH t AS (
  SELECT doc_id, text,
         regexp_split_to_array(trim(text), '[ \t\n\r]+') AS toks,
         length(text) AS n_chars_obs
  FROM documents
),
sc AS (
  SELECT doc_id, text, toks, n_chars_obs,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('en')})) AS s_en,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('de')})) AS s_de,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('fr')})) AS s_fr,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('es')})) AS s_es,
         len(toks) AS n_tok,
         length(regexp_replace(text, '[ \t\n\r]', '', 'g'))::DOUBLE
           / greatest(len(toks), 1) AS mean_tok,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS alpha,
         len(list_filter(toks, x -> list_contains({lst('en')}, lower(x))))::DOUBLE
           / greatest(len(toks), 1) AS stop_ratio
  FROM t
)
SELECT doc_id,
       CASE {score} ELSE 'unknown' END AS lang_pred,
       n_tok::BIGINT AS n_tokens_ws,
       len(regexp_extract_all(text, '\\w+|[^\\w\\s]'))::BIGINT AS n_tokens_bpe,
       round(mean_tok, 6)::DOUBLE AS mean_token_len,
       round(alpha, 6)::DOUBLE AS alpha_ratio,
       round(stop_ratio, 6)::DOUBLE AS stopword_ratio,
       round(
         (CASE WHEN n_chars_obs >= 20 AND n_chars_obs <= 100000 THEN 0.4 ELSE 0.0 END)
         + (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0 THEN 0.3 ELSE 0.0 END)
         + least(alpha, 1.0) * 0.3, 6)::DOUBLE AS quality_score,
       substr(md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))), 1, 16) AS fingerprint
FROM sc
"""


def _encoding_noise_sql(clean_max_ppm: int = 1000) -> str:
    """q74: the same literal replace()-delta counting, generated from
    MOJIBAKE_SEQS so the sequence set provably matches the Spark op."""
    moji = " + ".join(
        f"(length(text) - length(replace(text, '{s}', ''))) // {len(s)}"
        for s in MOJIBAKE_SEQS
    )
    return f"""
WITH m AS (
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN text || ' cafÃ© said â€™helloâ€™'
              ELSE text END AS text
  FROM documents
), m2 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 11 = 0
              THEN text || ' bad�decode�' ELSE text END AS text
  FROM m
), m3 AS (
  SELECT doc_id,
         CASE WHEN doc_id % 13 = 0
              THEN text || ' ctl' || chr(7) || 'byte' ELSE text END AS text
  FROM m2
), f AS (
  SELECT doc_id,
         (length(text) - length(replace(text, '�', '')))::BIGINT AS n_replacement,
         (length(text) - length(regexp_replace(text,
            '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')))::BIGINT AS n_control,
         ({moji})::BIGINT AS n_mojibake,
         greatest(length(text), 1) AS n_chars
  FROM m3
)
SELECT doc_id, n_replacement, n_control, n_mojibake,
       ((1000000 * (n_replacement + n_control + n_mojibake)) // n_chars)::BIGINT
         AS noise_ppm,
       ((1000000 * (n_replacement + n_control + n_mojibake)) // n_chars
        <= {clean_max_ppm}) AS is_clean
FROM f
"""


def _domain_quality_sql(low_quality_ppm: int = 500_000, min_docs: int = 5,
                        max_low_frac_ppm: int = 250_000,
                        max_dup_frac_ppm: int = 250_000) -> str:
    """q73: per-domain rollup of the q19 quality-score / fingerprint
    expressions over the degraded corpus, integer-ppm floor arithmetic,
    same blocklist predicate."""
    return f"""
WITH m AS (
  SELECT doc_id, source,
         CASE WHEN doc_id % 20 < 8 AND doc_id % 3 = 0 THEN 'x y'
              WHEN doc_id % 20 >= 16 AND doc_id % 5 IN (1, 2)
                THEN 'duplicate content page boilerplate mirror copy'
              ELSE text END AS text
  FROM documents
),
f AS (
  SELECT doc_id, source,
         len(regexp_split_to_array(trim(text), '[ \t\n\r]+')) AS n_toks,
         length(regexp_replace(text, '[ \t\n\r]', '', 'g'))::DOUBLE
           / greatest(len(regexp_split_to_array(trim(text), '[ \t\n\r]+')), 1)
           AS mean_tok,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS alpha,
         length(text) AS n_chars,
         substr(md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))), 1, 16) AS fp
  FROM m
),
q AS (
  SELECT source, n_toks, fp,
         round(round(
           (CASE WHEN n_chars >= 20 AND n_chars <= 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0 THEN 0.3 ELSE 0.0 END)
           + least(alpha, 1.0) * 0.3, 6) * 1000000)::BIGINT AS q_ppm
  FROM f
),
a AS (
  SELECT source AS host,
         count(*)::BIGINT AS n_docs,
         sum(q_ppm)::BIGINT AS sq,
         sum(CASE WHEN q_ppm < {low_quality_ppm} THEN 1 ELSE 0 END)::BIGINT AS n_low,
         count(DISTINCT fp)::BIGINT AS n_fp,
         sum(n_toks)::BIGINT AS st
  FROM q GROUP BY source
)
SELECT host, n_docs,
       (sq // n_docs)::BIGINT AS mean_quality_ppm,
       ((1000000 * n_low) // n_docs)::BIGINT AS low_quality_frac_ppm,
       ((1000000 * (n_docs - n_fp)) // n_docs)::BIGINT AS dup_frac_ppm,
       (st // n_docs)::BIGINT AS mean_tokens,
       (n_docs >= {min_docs}
        AND ((1000000 * n_low) // n_docs > {max_low_frac_ppm}
             OR (1000000 * (n_docs - n_fp)) // n_docs > {max_dup_frac_ppm}))
         AS blocked
FROM a
"""



_DOC_CHUNKING_SQL = """
WITH t AS (
  SELECT doc_id,
         CASE WHEN trim(text) = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(trim(text), '[ {t}{n}{r}]+')
         END AS toks
  FROM documents
),
k AS (
  SELECT doc_id, toks,
         (1 + (greatest(len(toks) - 16, 0) + 11) // 12)::INT AS n_chunks
  FROM t
),
e AS (SELECT doc_id, toks, unnest(range(0, n_chunks)) AS chunk_idx FROM k)
SELECT doc_id,
       chunk_idx::BIGINT AS chunk_idx,
       len(toks[chunk_idx*12+1 : chunk_idx*12+16])::BIGINT AS n_chunk_tokens,
       array_to_string(toks[chunk_idx*12+1 : chunk_idx*12+16], ' ') AS chunk_text
FROM e
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


def _training_mix_sql() -> str:
    """q77: the mix composition replayed stage by stage — q19's lang
    scoring, q73's quality ppm, q74's noise counting (generated from
    MOJIBAKE_SEQS), exact_dedup's sentinel digest keep-first, the
    u(key,seed) rebalance, and the q44 cumulative budget cut."""
    def lst(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    order = ("en", "de", "fr", "es")
    score = " ".join(
        f"WHEN s_{lang} > 0 "
        + " ".join(
            f"AND s_{lang} >= s_{other}"
            for other in order
            if other != lang and order.index(other) > order.index(lang)
        )
        + f" THEN '{lang}'"
        for lang in order
    )
    moji = " + ".join(
        f"(length(text) - length(replace(text, '{s}', ''))) // {len(s)}"
        for s in MOJIBAKE_SEQS
    )
    return f"""
WITH sc AS (
  SELECT doc_id, source, text,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('en')})) AS s_en,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('de')})) AS s_de,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('fr')})) AS s_fr,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('es')})) AS s_es,
         len(regexp_split_to_array(trim(text), '[ \t\n\r]+'))::BIGINT AS n_tokens,
         length(regexp_replace(text, '[ \t\n\r]', '', 'g'))::DOUBLE
           / greatest(len(regexp_split_to_array(trim(text), '[ \t\n\r]+')), 1) AS mean_tok,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS alpha,
         length(text) AS n_chars,
         ((length(text) - length(replace(text, '�', '')))
          + (length(text) - length(regexp_replace(text,
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')))
          + ({moji}))::BIGINT AS n_noise
  FROM documents
),
q AS (
  SELECT doc_id, source, text, n_tokens,
         CASE {score} ELSE 'unknown' END AS lang_pred,
         round(round(
           (CASE WHEN n_chars >= 20 AND n_chars <= 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0 THEN 0.3 ELSE 0.0 END)
           + least(alpha, 1.0) * 0.3, 6) * 1000000)::BIGINT AS q_ppm,
         (1000000 * n_noise) // greatest(n_chars, 1) AS noise_ppm
  FROM sc
),
g AS (
  SELECT * FROM q
  WHERE q_ppm >= 500000 AND noise_ppm <= 10000 AND lang_pred = 'en'
    AND source NOT IN ('src3', 'src7')
),
dd AS (
  SELECT *, row_number() OVER (
    PARTITION BY md5(coalesce(text, chr(0) || '<null>'))
    ORDER BY doc_id ASC) AS _rn
  FROM g
),
s AS (
  SELECT doc_id, lang_pred, q_ppm, n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR || '#4'), 1, 8))::BIGINT
           / 4294967296.0 AS u4
  FROM dd
  WHERE _rn = 1
    AND ('0x' || substr(md5(doc_id::VARCHAR || '#1'), 1, 8))::BIGINT
          / 4294967296.0 < 0.5
),
c AS (
  SELECT doc_id, lang_pred, q_ppm, n_tokens,
         sum(n_tokens) OVER (ORDER BY u4, doc_id
                             ROWS UNBOUNDED PRECEDING) AS cum
  FROM s
)
SELECT doc_id, lang_pred, q_ppm, n_tokens, cum::BIGINT AS cum_tokens
FROM c WHERE cum <= 10000
"""



_READABILITY_SQL = """
WITH f AS (
  SELECT doc_id,
         greatest(len(regexp_split_to_array(trim(text), '[ {t}{n}{r}]+')), 1)::BIGINT AS n_words,
         greatest(len(regexp_extract_all(text, '[.!?]+')), 1)::BIGINT AS n_sentences,
         len(regexp_extract_all(lower(text), '[aeiouy]+'))::BIGINT AS n_syllables
  FROM documents
)
SELECT doc_id, n_words, n_sentences, n_syllables,
       (206835 - (1015 * n_words) // n_sentences
               - (84600 * n_syllables) // n_words)::BIGINT AS flesch_milli
FROM f
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")



# q79: outline rows re-derived from the generating formula (h1, h2-A,
# optional h3 on even ids, optional h2-B on ids % 3 = 0; pos = document
# order with the optional rows shifting later positions)
_OUTLINE_SQL = """
SELECT doc_id, 0::BIGINT AS pos, 1::BIGINT AS level,
       'Title ' || doc_id AS heading FROM documents
UNION ALL
SELECT doc_id, 1, 2, 'Section A ' || (doc_id % 5) FROM documents
UNION ALL
SELECT doc_id, 2, 3, 'Detail ' || (doc_id % 7) FROM documents
WHERE doc_id % 2 = 0
UNION ALL
SELECT doc_id, 2 + (CASE WHEN doc_id % 2 = 0 THEN 1 ELSE 0 END), 2,
       'Section B' FROM documents
WHERE doc_id % 3 = 0
"""


def _corpus_report_sql() -> str:
    """q80: the corpus_report aggregate replayed over the q75 degraded
    corpus — q19 lang CASE, q73 quality ppm, q74 noise counting, q19
    fingerprint; global aggregate + scalar-select unpivot."""
    def lst(lang: str) -> str:
        return "[" + ", ".join(f"'{w}'" for w in STOPWORDS[lang]) + "]"

    order = ("en", "de", "fr", "es")
    score = " ".join(
        f"WHEN s_{lang} > 0 "
        + " ".join(
            f"AND s_{lang} >= s_{other}"
            for other in order
            if other != lang and order.index(other) > order.index(lang)
        )
        + f" THEN '{lang}'"
        for lang in order
    )
    moji = " + ".join(
        f"(length(text) - length(replace(text, '{s}', ''))) // {len(s)}"
        for s in MOJIBAKE_SEQS
    )
    return f"""
WITH aug AS (
  SELECT doc_id, CASE WHEN doc_id % 3 = 0
                      THEN text || ' 00 11 22 33' ELSE text END AS text
  FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
),
f AS (
  SELECT doc_id, text,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('en')})) AS s_en,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('de')})) AS s_de,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('fr')})) AS s_fr,
         len(list_intersect(list_distinct(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+')), {lst('es')})) AS s_es,
         len(regexp_split_to_array(trim(text), '[ \t\n\r]+'))::BIGINT AS toks,
         length(regexp_replace(text, '[ \t\n\r]', '', 'g'))::DOUBLE
           / greatest(len(regexp_split_to_array(trim(text), '[ \t\n\r]+')), 1) AS mean_tok,
         length(regexp_replace(text, '[^a-zA-Z ]', '', 'g'))::DOUBLE
           / greatest(length(text), 1) AS alpha,
         length(text) AS n_chars,
         substr(md5(trim(regexp_replace(lower(text), '[ \t\n\r]+', ' ', 'g'))), 1, 16) AS fp,
         ((length(text) - length(replace(text, '�', '')))
          + (length(text) - length(regexp_replace(text,
               '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]', '', 'g')))
          + ({moji}))::BIGINT AS n_noise
  FROM aug
),
p AS (
  SELECT toks, fp,
         CASE {score} ELSE 'unknown' END AS lang,
         round(round(
           (CASE WHEN n_chars >= 20 AND n_chars <= 100000 THEN 0.4 ELSE 0.0 END)
           + (CASE WHEN mean_tok >= 2.0 AND mean_tok <= 12.0 THEN 0.3 ELSE 0.0 END)
           + least(alpha, 1.0) * 0.3, 6) * 1000000)::BIGINT AS q_ppm,
         (1000000 * n_noise) // greatest(n_chars, 1) AS noise_ppm
  FROM f
),
a AS (
  SELECT count(*)::BIGINT AS n_docs,
         count(DISTINCT fp)::BIGINT AS n_distinct,
         coalesce(sum(toks), 0)::BIGINT AS total_tokens,
         sum(CASE WHEN q_ppm < 500000 THEN 1 ELSE 0 END)::BIGINT AS n_low,
         sum(CASE WHEN lang = 'en' THEN 1 ELSE 0 END)::BIGINT AS n_en,
         sum(CASE WHEN lang = 'unknown' THEN 1 ELSE 0 END)::BIGINT AS n_unk,
         sum(CASE WHEN noise_ppm > 1000 THEN 1 ELSE 0 END)::BIGINT AS n_noisy
  FROM p
)
SELECT 'n_docs' AS metric, n_docs AS value FROM a
UNION ALL SELECT 'n_exact_dup_docs', n_docs - n_distinct FROM a
UNION ALL SELECT 'total_tokens', total_tokens FROM a
UNION ALL SELECT 'n_low_quality', n_low FROM a
UNION ALL SELECT 'n_en', n_en FROM a
UNION ALL SELECT 'n_lang_unknown', n_unk FROM a
UNION ALL SELECT 'n_noisy', n_noisy FROM a
"""



def _collocations_sql(k: int = 20, min_count: int = 5) -> str:
    """q81: bigram/unigram counts + integer lift + deterministic top-k."""
    return f"""
WITH tok AS (
  SELECT regexp_split_to_array(trim(text), '[ {{t}}{{n}}{{r}}]+') AS toks
  FROM documents
),
bi AS (
  SELECT unnest(list_transform(range(1, greatest(len(toks) - 1, 1) + 1),
                               i -> array_to_string(toks[i:i+1], ' '))) AS bigram
  FROM tok
),
bc AS (SELECT bigram, count(*)::BIGINT AS n_pair FROM bi
       GROUP BY bigram HAVING count(*) >= {min_count}),
uc AS (
  SELECT u AS token, count(*)::BIGINT AS n_tok
  FROM (SELECT unnest(toks) AS u FROM tok) WHERE u != '' GROUP BY u
),
nt AS (SELECT count(*)::BIGINT AS n_total FROM bi),
s AS (
  SELECT bc.bigram, bc.n_pair,
         (1000000 * bc.n_pair * nt.n_total)
           // (u1.n_tok * u2.n_tok) AS lift_ppm
  FROM bc
  CROSS JOIN nt
  JOIN uc u1 ON u1.token = string_split(bc.bigram, ' ')[1]
  JOIN uc u2 ON u2.token = string_split(bc.bigram, ' ')[2]
)
SELECT bigram, n_pair, lift_ppm::BIGINT AS lift_ppm
FROM s ORDER BY lift_ppm DESC, bigram ASC LIMIT {k}
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


def _pagerank_sql(iters: int = 5, out_deg: int = 4) -> str:
    """CTE replay of ops.graphrank.pagerank_micro: same md5-derived edges,
    same integer recurrence (BIGINT micro-units, ``//`` floor division) —
    exact regardless of evaluation order, so no float tolerance needed."""
    from .ops.graphrank import DAMP_MICRO, SCALE, TELEPORT_MICRO
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM documents)",
        "edges AS (SELECT DISTINCT doc_id AS src, "
        "('0x'||substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),1,8))::BIGINT"
        f" % (SELECT n FROM nn) AS dst FROM documents, range({out_deg}) t(i))",
        "deg AS (SELECT src, count(*) AS out_deg FROM edges GROUP BY src)",
        f"r0 AS (SELECT doc_id AS node, {SCALE}::BIGINT AS rank_micro"
        " FROM documents)",
    ]
    for k in range(1, iters + 1):
        parts.append(
            f"c{k} AS (SELECT e.dst,"
            " sum(r.rank_micro // d.out_deg) AS contrib"
            " FROM edges e JOIN deg d USING (src)"
            f" JOIN r{k - 1} r ON r.node = e.src GROUP BY e.dst)")
        parts.append(
            f"r{k} AS (SELECT d.doc_id AS node,"
            f" ({TELEPORT_MICRO} + ({DAMP_MICRO} * coalesce(c.contrib, 0))"
            f" // {SCALE})::BIGINT AS rank_micro"
            f" FROM documents d LEFT JOIN c{k} c ON c.dst = d.doc_id)")
    return ",\n".join(parts) + f"\nSELECT node, rank_micro FROM r{iters}"


# ---------------------------------------------------------------------------
# the catalog
# ---------------------------------------------------------------------------

def _url_templates_sql() -> str:
    """q59 oracle — replays functions.urltemplates over the same
    deterministic URL corpus; the segment CASE is generated from
    urltemplates.SEGMENT_CLASSES so the regex table provably matches."""
    from .functions.urltemplates import (_DIGIT_REQUIRED, _HAS_DIGIT,
                                         SEGMENT_CLASSES)
    whens = []
    for pat, cls in SEGMENT_CLASSES:
        cond = f"regexp_matches(lower(s), '{pat}')"
        if cls in _DIGIT_REQUIRED:
            cond += f" AND regexp_matches(lower(s), '{_HAS_DIGIT}')"
        whens.append(f"WHEN {cond} THEN '{cls}'")
    case = "CASE " + " ".join(whens) + " ELSE s END"
    md = "md5(doc_id::VARCHAR)"
    return """
WITH urls AS (
  SELECT 'https://shop' || (doc_id % 3) || '.example.com' ||
     CASE doc_id % 5
       WHEN 0 THEN '/product/' || (doc_id * 7919 % 100000)
       WHEN 1 THEN '/product/' || (doc_id * 7919 % 100000)
                   || '/review-' || (doc_id % 7)
       WHEN 2 THEN '/item/' || substr(MD, 1, 12)
       WHEN 3 THEN '/u/' || substr(MD, 1, 8) || '-' || substr(MD, 9, 4)
                   || '-' || substr(MD, 13, 4) || '-' || substr(MD, 17, 4)
                   || '-' || substr(MD, 21, 12)
       ELSE '/static/css/main.css?v=' || (doc_id % 10)
     END AS url
  FROM documents
), parsed AS (
  SELECT url,
     lower(regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1)) AS host,
     regexp_extract(url, '^[a-z][a-z0-9+.-]*://[^/?#]+([^?#]*)', 1) AS path
  FROM urls
), t AS (
  SELECT url, host,
     host || '/' || array_to_string(
       list_transform(list_filter(str_split(path, '/'), s -> s != ''),
                      s -> CASE_EXPR), '/') AS template,
     regexp_matches(url, '^[a-z][a-z0-9+.-]*://[^?#]*\\?')::INT AS has_q
  FROM parsed
)
SELECT host, template, count(*)::BIGINT AS n_urls,
       count(DISTINCT url)::BIGINT AS n_distinct,
       sum(has_q)::BIGINT AS n_with_query,
       min(url) AS example_url
FROM t GROUP BY host, template
""".replace("MD", md).replace("CASE_EXPR", case)


# q68: same line rendering as the Spark side (_hostdocs_with_lines), then the
# CCNet-style within-host frequency pass re-derived independently.
_HOST_BOILERPLATE_SQL = r"""
WITH d0 AS (
  SELECT doc_id, source AS host,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM documents
), d AS (
  SELECT doc_id, host,
         list_transform(range(1, CAST(ceil(len(toks) / 8.0) AS INT) + 1),
                        i -> array_to_string(toks[(i-1)*8+1 : i*8], ' '))
         || (CASE WHEN doc_id % 10 <> 0
                  THEN ['all rights reserved footer ' || host]
                  ELSE [] END)
         || (CASE WHEN doc_id % 3 = 0
                  THEN ['subscribe newsletter updates ' || host]
                  ELSE [] END) AS lines
  FROM d0
), e AS (
  SELECT doc_id, host, len(lines)::INT AS n_lines,
         unnest(lines) AS line,
         unnest(range(len(lines)))::INT AS pos
  FROM d
), per_doc AS (
  SELECT DISTINCT doc_id, host, md5(line) AS lh FROM e
), freq AS (
  SELECT host, lh, count(*) AS nd FROM per_doc GROUP BY host, lh
), totals AS (
  SELECT host, count(*) AS n_docs FROM d GROUP BY host
), boiler AS (
  SELECT f.host, f.lh
  FROM freq f JOIN totals t USING (host)
  WHERE f.nd >= 3 AND f.nd >= ceil(0.5 * t.n_docs)
), kept AS (
  SELECT e.doc_id, e.host, e.n_lines, e.line, e.pos
  FROM e LEFT JOIN boiler b
    ON e.host = b.host AND md5(e.line) = b.lh
  WHERE b.lh IS NULL
)
SELECT doc_id, any_value(host) AS host, any_value(n_lines) AS n_lines,
       count(*)::BIGINT AS n_kept,
       string_agg(line, chr(10) ORDER BY pos) AS text
FROM kept GROUP BY doc_id
"""


# q69: fixed-12-token-window exact span dedup, winner = lexicographic
# min(doc_id, pos) via struct min (id-range safe: no packed-BIGINT overflow),
# re-derived with list functions (window hashes, covered positions, rebuild).
_REPEATED_SPANS_SQL = r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 100000 AS doc_id,
         'intro w' || (doc_id % 7) || ' ' || text AS text
  FROM documents
), t AS (
  SELECT doc_id,
         list_filter(string_split(trim(text), ' '), x -> x <> '') AS toks
  FROM corpus
), occ0 AS (
  SELECT doc_id,
         unnest(range(greatest(len(toks) - 11, 0)))::INT AS pos,
         unnest(list_transform(
             range(greatest(len(toks) - 11, 0)),
             i -> md5(array_to_string(toks[i+1 : i+12], ' ')))) AS h
  FROM t
), occ AS (
  SELECT doc_id, pos, h,
         struct_pack(i := doc_id, p := pos) AS wkey
  FROM occ0
), w AS (
  SELECT h, min(wkey) AS wmin FROM occ GROUP BY h HAVING count(*) > 1
), dup AS (
  SELECT o.doc_id, o.pos FROM occ o JOIN w USING (h) WHERE o.wkey <> w.wmin
), cov AS (
  SELECT DISTINCT doc_id, tpos FROM (
    SELECT doc_id, unnest(range(pos, pos + 12))::BIGINT AS tpos FROM dup)
), covlist AS (
  SELECT doc_id, list(tpos) AS cov FROM cov GROUP BY doc_id
)
SELECT t.doc_id,
       len(toks)::INT AS n_tokens,
       (CASE WHEN c.cov IS NULL THEN len(toks)
             ELSE len(list_filter(range(len(toks)),
                                  i -> NOT list_contains(c.cov, i)))
        END)::BIGINT AS n_kept,
       CASE WHEN c.cov IS NULL THEN array_to_string(toks, ' ')
            ELSE coalesce(array_to_string(
                list_transform(
                    list_filter(range(len(toks)),
                                i -> NOT list_contains(c.cov, i)),
                    i -> toks[i+1]), ' '), '')
       END AS text
FROM t LEFT JOIN covlist c USING (doc_id)
"""


# q70: integer-exact char-trigram LM surprisal — bitlen(T) - bitlen(cnt)
# per gram, weighted by in-doc frequency; exact integer division for the
# per-gram average (millibits).
_LM_SURPRISAL_SQL = r"""
WITH d AS (
  SELECT doc_id, text FROM documents
), g AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(text) - 1),
                               i -> substr(text, i::INT, 3))) AS gram
  FROM d WHERE len(text) >= 3
), tf AS (
  SELECT doc_id, gram, count(*) AS tf FROM g GROUP BY doc_id, gram
), model AS (
  SELECT gram, sum(tf)::BIGINT AS cnt FROM tf GROUP BY gram
), mb AS (
  SELECT gram, length(format('{:b}', cnt))::INT AS bits FROM model
), tot AS (
  SELECT length(format('{:b}', sum(cnt)::BIGINT))::INT AS bits_t FROM model
), pd AS (
  SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_grams,
         sum(tf.tf * coalesce(mb.bits, 0))::BIGINT AS wb
  FROM tf LEFT JOIN mb USING (gram) GROUP BY tf.doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_grams, 0)::BIGINT AS n_grams,
       coalesce(pd.n_grams * t.bits_t - pd.wb, 0)::BIGINT AS sum_bits,
       (CASE WHEN pd.n_grams IS NULL OR pd.n_grams = 0 THEN 0
             ELSE (1000 * (pd.n_grams * t.bits_t - pd.wb)) // pd.n_grams
        END)::BIGINT AS avg_millibits
FROM d LEFT JOIN pd USING (doc_id) CROSS JOIN tot t
"""


# q71: vocab fit (top-16, count DESC token ASC) + per-doc OOV ppm, all
# exact integers.
_VOCAB_OOV_SQL = r"""
WITH tok AS (
  SELECT doc_id, unnest(list_filter(string_split(trim(text), ' '),
                                    x -> x <> '')) AS token
  FROM documents
), tf AS (
  SELECT doc_id, token, count(*) AS tf FROM tok GROUP BY doc_id, token
), counts AS (
  SELECT token, sum(tf)::BIGINT AS cnt FROM tf GROUP BY token
), vocab AS (
  SELECT token FROM (
    SELECT token, row_number() OVER (ORDER BY cnt DESC, token ASC) AS r
    FROM counts) WHERE r <= 16
), pd AS (
  SELECT tf.doc_id, sum(tf.tf)::BIGINT AS n_tokens,
         sum(CASE WHEN v.token IS NULL THEN tf.tf ELSE 0 END)::BIGINT
           AS n_oov
  FROM tf LEFT JOIN vocab v USING (token) GROUP BY tf.doc_id
)
SELECT d.doc_id,
       coalesce(pd.n_tokens, 0)::BIGINT AS n_tokens,
       coalesce(pd.n_oov, 0)::BIGINT AS n_oov,
       coalesce((1000000 * pd.n_oov) // pd.n_tokens, 0)::BIGINT AS oov_ppm
FROM documents d LEFT JOIN pd USING (doc_id)
"""


def _bpe_train_ctes(n_merges: int = 8, carry_word: bool = False) -> str:
    """CTE chain replaying ops/bpe's training loop: word-frequency table
    -> n_merges greedy rounds, each a generated block (pair counts from
    the double-space sentinel encoding, 1-row argmax with (cnt DESC, lhs,
    rhs) tie-break, merge applied via one leftmost-non-overlapping
    replace() — identical semantics in both engines on this encoding).
    Rounds that run out of pairs produce empty b{r} CTEs, matching the
    Spark loop's early break. ``carry_word`` keeps the word column on
    every e{r} so the final table doubles as the word->encoding vocab
    (the q92 encode oracle)."""
    w = "word, " if carry_word else ""
    rounds = []
    for r in range(1, n_merges + 1):
        p = r - 1
        rounds.append(f"""
p{r} AS MATERIALIZED (
  SELECT l, r2, sum(freq)::BIGINT AS cnt FROM (
    SELECT freq,
           unnest(list_transform(range(1, len(syms)), i -> syms[i])) AS l,
           unnest(list_transform(range(1, len(syms)), i -> syms[i + 1]))
             AS r2
    FROM (SELECT freq, str_split(trim(enc), '  ') AS syms FROM e{p})
  ) GROUP BY 1, 2
),
b{r} AS MATERIALIZED (SELECT l, r2, cnt FROM p{r}
         ORDER BY cnt DESC, l ASC, r2 ASC LIMIT 1),
e{r} AS MATERIALIZED (
  SELECT {w}freq,
         replace(enc,
                 ' ' || (SELECT l FROM b{r}) || '  '
                     || (SELECT r2 FROM b{r}) || ' ',
                 ' ' || (SELECT l FROM b{r})
                     || (SELECT r2 FROM b{r}) || ' ') AS enc
  FROM e{p})""".strip())
    return f"""wf AS MATERIALIZED (
  SELECT w AS word, count(*)::BIGINT AS freq FROM (
    SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                        '[ \t\n\r]+')) AS w
    FROM documents) WHERE w <> '' GROUP BY 1
),
e0 AS MATERIALIZED (
  SELECT {w}freq,
         ' ' || array_to_string(
                  list_transform(range(1, length(word) + 1),
                                 i -> word[i]), '  ') || ' ' AS enc
  FROM wf
),
{",".join(rounds)}"""


def _bpe_sql(n_merges: int = 8) -> str:
    """Replays ops/bpe.bpe_merges via _bpe_train_ctes; the final select
    unions each round's 1-row argmax into the merge table."""
    finals = "\n  UNION ALL ".join(
        f"SELECT {r}::INT AS merge_rank, l AS lhs, r2 AS rhs, "
        f"l || r2 AS merged, cnt AS pair_count FROM b{r}"
        for r in range(1, n_merges + 1))
    return f"""
WITH {_bpe_train_ctes(n_merges)}
SELECT * FROM (
  {finals}
) ORDER BY merge_rank
"""


def _bpe_encode_sql(n_merges: int = 8) -> str:
    """Replays queries.q92_bpe_encode: training CTEs with the word column
    carried to the final e{n} table (word -> merged encoding vocab), then
    per-doc word counts joined against the vocab's symbol counts; empty
    docs report 0/0 via the documents-spine left join."""
    return f"""
WITH {_bpe_train_ctes(n_merges, carry_word=True)},
v AS (SELECT word, len(str_split(trim(enc), '  '))::BIGINT AS n_syms
      FROM e{n_merges}),
dw AS (
  SELECT doc_id, w AS word, count(*)::BIGINT AS cnt FROM (
    SELECT doc_id,
           unnest(regexp_split_to_array(trim(lower(text)),
                                        '[ \t\n\r]+')) AS w
    FROM documents) WHERE w <> '' GROUP BY 1, 2
),
per AS (
  SELECT doc_id, sum(cnt)::BIGINT AS n_words,
         sum(cnt * n_syms)::BIGINT AS n_bpe_tokens
  FROM dw JOIN v USING (word) GROUP BY doc_id
)
SELECT d.doc_id,
       coalesce(per.n_words, 0)::BIGINT AS n_words,
       coalesce(per.n_bpe_tokens, 0)::BIGINT AS n_bpe_tokens
FROM documents d LEFT JOIN per USING (doc_id)
"""


def _bm25_sql(k: int = 10, k1m: int = 1200, bm: int = 750) -> str:
    """Replays queries.q88_bm25_topk / ops/retrieval.bm25_topk: same
    synthetic tag/grp vocabulary, bit-length idf, milli-unit tf
    normalization with truncating division at every named step (all
    values nonnegative, so DuckDB ``//`` == Spark ``div``)."""
    return f"""
WITH pages AS (
  SELECT doc_id,
         text || ' tag' || (doc_id % 97) || ' grp' || (doc_id % 13) AS text
  FROM documents
),
q AS (
  SELECT i AS query_id,
         'tag' || (i * 11) || ' grp' || (i % 13) || ' value scan' AS qtext
  FROM range(8) t(i)
),
tok AS (
  SELECT doc_id,
         unnest(regexp_split_to_array(trim(lower(text)), '[ {{t}}{{n}}{{r}}]+'))
           AS term
  FROM pages
),
postings AS (SELECT term, doc_id, count(*)::BIGINT AS tf FROM tok
             WHERE term <> '' GROUP BY 1, 2),
lens AS (SELECT doc_id, sum(tf)::BIGINT AS dl FROM postings GROUP BY 1),
dft AS (SELECT term, count(*)::BIGINT AS df FROM postings GROUP BY 1),
consts AS (SELECT count(*)::BIGINT AS n_docs,
                  (1000 * sum(dl)) // count(*) AS avgdl_m
           FROM lens),
qt AS (
  SELECT DISTINCT query_id,
         unnest(regexp_split_to_array(trim(lower(qtext)), '[ {{t}}{{n}}{{r}}]+'))
           AS term
  FROM q
),
qidf AS (
  SELECT qt.query_id, qt.term,
         length(bin(c.n_docs)) - length(bin(d.df)) AS idf_bits
  FROM qt JOIN dft d USING (term) CROSS JOIN consts c
),
sc AS (
  SELECT qi.query_id, p.doc_id,
         qi.idf_bits * ((1000 * p.tf * ({k1m} + 1000)) //
           (1000 * p.tf + ({k1m} * ((1000 - {bm}) +
              ({bm} * ((1000000 * l.dl) // c.avgdl_m)) // 1000)) // 1000))
           AS c
  FROM postings p
  JOIN qidf qi USING (term)
  JOIN lens l USING (doc_id)
  CROSS JOIN consts c
),
agg AS (SELECT query_id, doc_id, sum(c)::BIGINT AS score_milli
        FROM sc GROUP BY 1, 2),
r AS (SELECT *, row_number() OVER (
        PARTITION BY query_id ORDER BY score_milli DESC, doc_id ASC)
        AS rank FROM agg)
SELECT query_id, doc_id, score_milli, rank::INT AS rank
FROM r WHERE rank <= {k}
""".replace("{t}", "\t").replace("{n}", "\n").replace("{r}", "\r")


def _hits_sql(iters: int = 4, out_deg: int = 4) -> str:
    """CTE replay of ops.graphrank.hits_micro: same md5-derived edges as
    _pagerank_sql, same integer max-normalized recurrence (BIGINT
    micro-units, ``//`` floor division on nonnegative values)."""
    from .ops.graphrank import SCALE
    parts = [
        "WITH nn AS (SELECT count(*) AS n FROM documents)",
        "edges AS MATERIALIZED (SELECT DISTINCT doc_id AS src, "
        "('0x'||substr(md5(doc_id::VARCHAR || ':' || i::VARCHAR),1,8))::BIGINT"
        f" % (SELECT n FROM nn) AS dst FROM documents, range({out_deg}) t(i))",
        f"h0 AS (SELECT doc_id AS node, {SCALE}::BIGINT AS hub"
        " FROM documents)",
    ]
    # every ar{k}/hr{k} is referenced twice (argmax subquery + main FROM):
    # MATERIALIZED keeps DuckDB's inlining from going exponential in iters
    for k in range(1, iters + 1):
        p = k - 1
        parts.append(
            f"ar{k} AS MATERIALIZED (SELECT e.dst, sum(h.hub) AS araw"
            f" FROM edges e"
            f" JOIN h{p} h ON h.node = e.src GROUP BY e.dst)")
        parts.append(
            f"a{k} AS MATERIALIZED (SELECT dst AS node, ({SCALE} * araw)"
            f" // (SELECT max(araw) FROM ar{k}) AS auth FROM ar{k})")
        parts.append(
            f"hr{k} AS MATERIALIZED (SELECT e.src, sum(a.auth) AS hraw"
            f" FROM edges e"
            f" JOIN a{k} a ON a.node = e.dst GROUP BY e.src)")
        parts.append(
            f"h{k} AS MATERIALIZED (SELECT src AS node, ({SCALE} * hraw)"
            f" // (SELECT max(hraw) FROM hr{k}) AS hub FROM hr{k})")
    return (",\n".join(parts)
            + f"""
SELECT d.doc_id AS node,
       coalesce(h.hub, 0)::BIGINT AS hub_micro,
       coalesce(a.auth, 0)::BIGINT AS auth_micro
FROM documents d
LEFT JOIN h{iters} h ON h.node = d.doc_id
LEFT JOIN a{iters} a ON a.node = d.doc_id
""")


def _fuzzy_decon_sql(threshold: float = 0.5) -> str:
    """q90: the symmetric minhash pair CTEs over corpus UNION benchmark
    (benchmark ids offset by 400000, so id_a < id_b puts the corpus doc
    first in every cross-side pair); the final filter keeps only
    (corpus, benchmark) pairs, matching minhash_batch_pairs' asymmetric
    candidate join."""
    aug = (
        "SELECT doc_id, text FROM documents "
        "UNION ALL SELECT doc_id + 400000, text || ' eval answer label' "
        "FROM documents WHERE doc_id % 50 = 0 "
        "UNION ALL SELECT doc_id + 400000, 'benchmark item ' || doc_id || "
        "' with wholly novel question content' "
        "FROM documents WHERE doc_id % 50 = 1"
    )
    return f"""
WITH {_minhash_pair_ctes(16, 4, aug_sql=aug)}
SELECT id_a AS doc_id, id_b AS benchmark_id,
       round(jac, 6)::DOUBLE AS jaccard
FROM j
WHERE jac >= {threshold} AND id_a < 400000 AND id_b >= 400000
"""


_TEMPERATURE_MIX_SQL = """
WITH per AS (
  SELECT source, count(*)::BIGINT AS n_docs,
         floor(sqrt(count(*)))::BIGINT AS weight
  FROM documents GROUP BY source
),
t AS (SELECT sum(n_docs)::BIGINT AS n_total,
             sum(weight)::BIGINT AS w_total FROM per)
SELECT source, n_docs, weight,
       ((1000000 * weight) // w_total)::BIGINT AS share_ppm,
       ((n_total * ((1000000 * weight) // w_total)) // 1000000)::BIGINT
         AS target_n,
       ((1000 * ((n_total * ((1000000 * weight) // w_total)) // 1000000))
         // n_docs)::BIGINT AS repeat_milli
FROM per CROSS JOIN t
"""


def _winnowing_sql(k: int = 4, w: int = 5, threshold: float = 0.5) -> str:
    """Replays q87: wrapped-corpus construction, word k-gram 60-bit md5
    hashes, per-window min with rightmost tie-break (max gpos where
    h = window min), value-distinct fingerprint sets, fp equi-join,
    containment overlap on the rounded value."""
    return f"""
WITH base AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 300000,
         'prepended chrome header tokens then ' || text ||
         ' trailing footer junk appended'
  FROM documents WHERE doc_id % 3 = 0
),
tok AS (
  SELECT doc_id,
         regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+') AS toks
  FROM base
),
g AS (
  SELECT doc_id,
         unnest(range(0, len(toks) - {k} + 1)) AS gpos,
         unnest(list_transform(range(0, len(toks) - {k} + 1),
           p -> ('0x' || substr(md5(array_to_string(
                   toks[p + 1:p + {k}], ' ')), 1, 15))::BIGINT)) AS h
  FROM tok WHERE len(toks) >= {k}
),
nw AS (SELECT doc_id, count(*) AS n FROM g GROUP BY 1),
s AS (
  SELECT doc_id, unnest(range(0, greatest(n - {w}, 0) + 1)) AS start
  FROM nw
),
wmin AS (
  SELECT s.doc_id, s.start, min(g.h) AS mn
  FROM s JOIN g ON g.doc_id = s.doc_id
              AND g.gpos BETWEEN s.start AND s.start + {w - 1}
  GROUP BY 1, 2
),
fps AS (
  SELECT DISTINCT doc_id, mn AS fp FROM wmin
),
sz AS (SELECT doc_id, count(*) AS n_fp FROM fps GROUP BY 1),
pr AS (
  SELECT a.doc_id AS id_a, b.doc_id AS id_b, count(*)::BIGINT AS n_shared
  FROM fps a JOIN fps b ON a.fp = b.fp AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT id_a, id_b, n_shared,
       round(n_shared / least(sa.n_fp, sb.n_fp), 6)::DOUBLE AS overlap
FROM pr
JOIN sz sa ON sa.doc_id = pr.id_a
JOIN sz sb ON sb.doc_id = pr.id_b
WHERE round(n_shared / least(sa.n_fp, sb.n_fp), 6) >= {threshold}
"""


ORACLES: dict[str, str] = {
    "q59_url_templates": _url_templates_sql(),
    "q68_host_boilerplate": _HOST_BOILERPLATE_SQL,
    "q69_repeated_spans": _REPEATED_SPANS_SQL,
    "q70_lm_surprisal": _LM_SURPRISAL_SQL,
    "q71_vocab_oov": _VOCAB_OOV_SQL,
    "q67_wet_pipeline": """
WITH p AS (
  SELECT doc_id,
    list_filter(string_split(substr(text, 1, 150), ' '), x -> x <> '')
      AS w1,
    list_filter(string_split(substr(text, 151, 150), ' '), x -> x <> '')
      AS w2
  FROM documents
), c AS (
  SELECT doc_id, len(w1) AS n1, len(w2) AS n2,
         array_to_string(w1, ' ') AS t1, array_to_string(w2, ' ') AS t2
  FROM p
)
SELECT doc_id,
  md5(concat_ws(chr(10),
    CASE WHEN n1 >= 10 THEN t1 END,
    CASE WHEN n2 >= 10 THEN t2 END)) AS main_md5,
  (CASE WHEN n1 >= 10 THEN n1 ELSE 0 END
   + CASE WHEN n2 >= 10 THEN n2 ELSE 0 END)::INT AS content_words,
  ((1000000 * (15 + n1 + n2
     - (CASE WHEN n1 >= 10 THEN n1 ELSE 0 END
        + CASE WHEN n2 >= 10 THEN n2 ELSE 0 END)))
   // (15 + n1 + n2))::BIGINT AS boiler_ppm
FROM c
""",
    "q66_social_meta": """
SELECT doc_id,
       'Doc ' || doc_id AS og_title,
       'article' AS og_type,
       CASE WHEN doc_id % 2 = 0 THEN 'summary' END AS tw_card,
       '@site' || (doc_id % 7) AS tw_site,
       '{"og:title":"Doc ' || doc_id || '","og:type":"article",'
       || CASE WHEN doc_id % 2 = 0
               THEN '"twitter:card":"summary",' ELSE '' END
       || '"twitter:site":"@site' || (doc_id % 7) || '"}' AS social_json
FROM documents
""",
    "q65_revisit_decisions": """
WITH s AS (
  SELECT 'https://f.ex.com/p/' || doc_id AS url,
         (doc_id * 37) % 1000001 AS change_rate_micro,
         doc_id % 1000 AS age_hours,
         doc_id % 3 = 0 AS has_etag,
         doc_id % 5 = 0 AS has_lm,
         CASE WHEN doc_id % 4 = 0 THEN 24
              WHEN doc_id % 4 = 1 THEN 168 END AS prior_hours
  FROM documents
), d AS (
  SELECT *,
         least(coalesce(prior_hours, 720)::BIGINT,
               least(720::BIGINT, greatest(1::BIGINT,
                 (24 * 1000000) // greatest(change_rate_micro, 1))))
           AS interval_hours
  FROM s
)
SELECT url, change_rate_micro, age_hours, interval_hours,
       age_hours >= interval_hours AS due,
       CASE WHEN age_hours < interval_hours THEN 'skip'
            WHEN has_etag OR has_lm THEN 'conditional_get'
            ELSE 'fetch' END AS decision
FROM d
""",
    "q64_hll_sketch": """
WITH u AS (
  SELECT 'https://s.ex.com/p/' || (o_orderkey % 4096) AS url FROM orders
), h AS (
  SELECT ('0x' || substr(md5(url || '#0'), 1, 15))::BIGINT AS h FROM u
), r AS (
  SELECT h // 4503599627370496 AS reg,
         h % 4503599627370496 AS rem
  FROM h
)
SELECT reg,
       max(CASE WHEN rem = 0 THEN 53
                ELSE 53 - length(bin(rem)) END)::INT AS max_rho
FROM r GROUP BY reg
""",
    "q63_inverted_index": """
WITH toks AS (
  SELECT doc_id AS doc,
         unnest(regexp_split_to_array(trim(lower(text)), '[ \t\n\r]+'))
           AS term
  FROM documents
), tf AS (
  SELECT term, doc, count(*)::BIGINT AS tf
  FROM toks WHERE term != '' GROUP BY term, doc
), stats AS (
  SELECT term, count(*)::BIGINT AS df, sum(tf)::BIGINT AS tf_total
  FROM tf GROUP BY term HAVING count(*) >= 2
), top AS (
  SELECT term, doc,
         row_number() OVER (PARTITION BY term ORDER BY doc) AS rn
  FROM tf
), postings AS (
  SELECT term, array_agg(doc ORDER BY doc) AS postings
  FROM top WHERE rn <= 16 GROUP BY term
)
SELECT s.term, s.df, s.tf_total, p.postings, s.df > 16 AS truncated
FROM stats s JOIN postings p USING (term)
""",
    "q62_sequence_packing": """
WITH RECURSIVE d AS (
  SELECT doc_id,
         len(regexp_split_to_array(trim(text), '[ \t\n\r]+'))::BIGINT
           AS n_tokens,
         ('0x' || substr(md5(doc_id::VARCHAR || '#0'), 1, 8))::BIGINT
           / 4294967296.0 AS u
  FROM documents
), o AS (
  SELECT doc_id, n_tokens, u, floor(u * 8)::INT AS shard,
         row_number() OVER (PARTITION BY floor(u * 8)::INT
                            ORDER BY u, doc_id) AS rn
  FROM d
), pack AS (
  SELECT shard, rn, doc_id, n_tokens,
         0::BIGINT AS bin_idx, 0::BIGINT AS bin_offset,
         n_tokens AS fill
  FROM o WHERE rn = 1
  UNION ALL
  SELECT nx.shard, nx.rn, nx.doc_id, nx.n_tokens,
         CASE WHEN p.fill > 0 AND p.fill + nx.n_tokens > 300
              THEN p.bin_idx + 1 ELSE p.bin_idx END,
         CASE WHEN p.fill > 0 AND p.fill + nx.n_tokens > 300
              THEN 0 ELSE p.fill END,
         CASE WHEN p.fill > 0 AND p.fill + nx.n_tokens > 300
              THEN nx.n_tokens ELSE p.fill + nx.n_tokens END
  FROM pack p JOIN o nx ON nx.shard = p.shard AND nx.rn = p.rn + 1
)
SELECT doc_id, n_tokens, shard, bin_idx, bin_offset,
       n_tokens > 300 AS truncated
FROM pack
""",
    "q61_redirect_chains": """
WITH RECURSIVE r AS (
  SELECT 'https://r.ex.com/u/' || doc_id AS src,
         'https://r.ex.com/u/' || (doc_id - 1) AS dst
  FROM documents WHERE doc_id % 8 != 0
  UNION ALL
  SELECT DISTINCT 'https://r.ex.com/c/' || (doc_id % 10),
         'https://r.ex.com/c/' || ((doc_id % 10 + 1) % 10)
  FROM documents
), urls AS (
  SELECT 'https://r.ex.com/u/' || doc_id AS url FROM documents
  UNION ALL
  SELECT DISTINCT 'https://r.ex.com/c/' || (doc_id % 10) FROM documents
), walk AS (
  SELECT u.url, coalesce(r.dst, u.url) AS cur,
         (r.dst IS NOT NULL)::BIGINT AS hops, r.dst IS NULL AS done
  FROM urls u LEFT JOIN r ON u.url = r.src
  UNION ALL
  SELECT w.url, coalesce(r.dst, w.cur),
         w.hops + (r.dst IS NOT NULL)::BIGINT, r.dst IS NULL
  FROM walk w LEFT JOIN r ON w.cur = r.src
  WHERE NOT w.done AND w.hops < 8
)
SELECT url, cur AS final_url, hops AS n_hops,
       CASE WHEN done THEN 'ok' ELSE 'unresolved' END AS status
FROM walk
QUALIFY row_number() OVER (PARTITION BY url
                           ORDER BY done DESC, hops DESC) = 1
""",
    "q60_host_graph": """
WITH e AS (
  SELECT 'https://h' || (doc_id % 7) || '.ex.com/p/' || doc_id AS src_url,
         'h' || (doc_id % 7) || '.ex.com' AS src_host,
         'h' || ((doc_id % 7 + off) % 7) || '.ex.com' AS dst_host
  FROM documents, (VALUES (0), (1), (2), (6)) AS o(off)
), agg AS (
  SELECT src_host, dst_host, count(*)::BIGINT AS n_links,
         count(DISTINCT src_url)::BIGINT AS n_src_pages
  FROM e GROUP BY src_host, dst_host
)
SELECT a.src_host, a.dst_host, a.n_links, a.n_src_pages,
       a.src_host = a.dst_host AS internal,
       (r.src_host IS NOT NULL) AS reciprocal
FROM agg a
LEFT JOIN agg r ON a.src_host = r.dst_host AND a.dst_host = r.src_host
""",
    "q01_pricing_summary": """
SELECT l_returnflag, l_linestatus,
       round(sum(l_quantity), 2)::DOUBLE AS sum_qty,
       round(sum(l_extendedprice), 2)::DOUBLE AS sum_base_price,
       round(sum(l_extendedprice * (1 - l_discount)), 2)::DOUBLE AS sum_disc_price,
       round(avg(l_quantity), 4)::DOUBLE AS avg_qty,
       count(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '2000-12-01'
GROUP BY l_returnflag, l_linestatus
""",
    "q02_revenue_by_nation": """
SELECT r_name, n_name,
       round(sum(o_totalprice), 2)::DOUBLE AS revenue,
       count(*) AS n_orders
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name, n_name
""",
    "q03_top_orders_per_segment": """
SELECT c_mktsegment, rank, o_orderkey, o_totalprice
FROM (
  SELECT c_mktsegment, o_orderkey, o_totalprice,
         row_number() OVER (PARTITION BY c_mktsegment
                            ORDER BY o_totalprice DESC, o_orderkey ASC)::INT AS rank
  FROM orders JOIN customer ON o_custkey = c_custkey
)
WHERE rank <= 3
""",
    "q04_priority_distribution": """
SELECT o_orderpriority, count(*) AS n,
       round(count(*)::DOUBLE / (SELECT count(*) FROM orders), 6)::DOUBLE AS pct
FROM orders
GROUP BY o_orderpriority
ORDER BY o_orderpriority
""",
    "q05_events_hourly": """
SELECT epoch_us(time_bucket(INTERVAL '1 hour', ts)) AS bucket_us,
       event_type,
       count(*) AS n_events,
       round(sum(value), 2)::DOUBLE AS sum_value
FROM events
GROUP BY 1, 2
""",
    "q06_viewers_no_purchase": """
SELECT DISTINCT user_id FROM events
WHERE event_type = 'click' AND value > 300
AND user_id NOT IN (SELECT user_id FROM events
                    WHERE event_type = 'purchase' AND value > 300)
""",
    "q07_brand_revenue": """
SELECT p_brand,
       round(sum(l_extendedprice * (1 - l_discount)), 2)::DOUBLE AS revenue,
       count(*) AS n_items
FROM lineitem
JOIN part ON l_partkey = p_partkey
JOIN supplier ON l_suppkey = s_suppkey
GROUP BY p_brand
""",
    "q08_user_sessions": """
WITH o AS (
  SELECT user_id, event_id, ts, epoch_us(ts) AS us,
         lag(epoch_us(ts)) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev
  FROM events
),
s AS (
  SELECT user_id,
         sum(CASE WHEN prev IS NULL OR us - prev > 1800000000 THEN 1 ELSE 0 END)
           OVER (PARTITION BY user_id ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING)
           AS session_id
  FROM o
),
p AS (SELECT user_id, session_id, count(*) AS n_ev FROM s GROUP BY 1, 2)
SELECT user_id, max(session_id)::BIGINT AS n_sessions,
       max(n_ev) AS max_session_events
FROM p GROUP BY user_id
""",
    "q09_event_props_json": """
WITH e AS (SELECT event_type, json_extract(props, '$.k')::BIGINT AS k FROM events)
SELECT event_type,
       round(avg(k), 6)::DOUBLE AS avg_k,
       max(k) AS max_k,
       count(*) FILTER (WHERE k > 50) AS n_high
FROM e GROUP BY event_type
""",
    "q10_url_canonicalize": """
SELECT o_orderkey,
       'https://www.shop' || (o_custkey % 50) || '.example.com/orders/'
         || o_orderkey || '?a=1&b=2' AS url_canon,
       'www.shop' || (o_custkey % 50) || '.example.com' AS host,
       'example.com' AS domain
FROM orders
""",
    "q11_transform_chains": """
SELECT p_partkey,
       upper(regexp_replace(trim(p_name), '[\t\n\f\r ]+', ' ', 'g')) AS name_norm,
       coalesce(nullif(regexp_extract(p_brand, '\\d+(?:\\.\\d+)?', 0), ''), '0') AS brand_num,
       replace(p_brand, '#', '-') AS brand_dash,
       CASE WHEN length(p_name) >= 20 THEN p_name
            ELSE lpad(p_name, 20, '*') END AS name_padded
FROM part
""",
    "q12_field_extraction": """
SELECT doc_id,
       'Doc ' || doc_id AS title,
       upper(source) AS heading,
       trim(substr(text, 1, 50)) AS description,
       ((n_chars::VARCHAR) || '.99')::DOUBLE AS price,
       2::INT AS link_count,
       TRUE AS has_price
FROM documents
""",
    "q13_dedup_exact": """
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL SELECT doc_id + 100000, text FROM documents
),
r AS (
  SELECT doc_id, text,
         row_number() OVER (PARTITION BY md5(text) ORDER BY doc_id) AS rn
  FROM corpus
)
SELECT doc_id, md5(text) AS digest FROM r WHERE rn = 1
""",
    "q14_minhash_lsh": _minhash_sql(16, 4, 0.5),
    "q72_incremental_dedup": _incremental_dedup_sql(16, 4, 0.5),
    "q73_domain_quality": _domain_quality_sql(),
    "q74_encoding_noise": _encoding_noise_sql(),
    "q75_best_representatives": _best_representatives_sql(16, 4, 0.5),
    "q76_doc_chunking": _DOC_CHUNKING_SQL,
    "q77_training_mix": _training_mix_sql(),
    "q78_readability": _READABILITY_SQL,
    "q79_outline": _OUTLINE_SQL,
    "q80_corpus_report": _corpus_report_sql(),
    "q81_collocations": _collocations_sql(20, 5),
    "q82_semantic_dedup": _semantic_dedup_sql(16, 0.99),
    "q83_dsir_weights": _dsir_sql(1024),
    "q84_soft404": _SOFT404_SQL,
    "q85_surprisal_buckets": _SURPRISAL_BUCKETS_SQL.replace(
        "{q70}", _LM_SURPRISAL_SQL),
    "q86_bpe_merges": _bpe_sql(8),
    "q87_winnowing": _winnowing_sql(4, 5, 0.5),
    "q88_bm25_topk": _bm25_sql(10),
    "q89_hits_scores": _hits_sql(4),
    "q90_fuzzy_decontamination": _fuzzy_decon_sql(0.5),
    "q91_temperature_mix": _TEMPERATURE_MIX_SQL,
    "q92_bpe_encode": _bpe_encode_sql(8),
    "q35_dedup_clusters": _dedup_clusters_sql(16, 4, 0.5),
    "q36_c4_line_filter": _C4_LINE_FILTER_SQL,
    "q37_stratified_split": _STRATIFIED_SPLIT_SQL,
    "q38_pii_scrub": _pii_scrub_sql(),
    "q39_paragraph_dedup": _PARAGRAPH_DEDUP_SQL,
    "q40_shuffle_shards": _SHUFFLE_SHARDS_SQL,
    "q41_decontamination": _decontamination_sql(),
    "q42_domain_cap": _DOMAIN_CAP_SQL,
    "q43_tfidf_keywords": _TFIDF_SQL,
    "q44_token_budget": _TOKEN_BUDGET_SQL,
    "q45_staged_pipeline": _staged_pipeline_sql(),
    "q46_gopher_filter": _gopher_filter_sql(),
    "q47_pagerank_priority": _pagerank_sql(),
    "q49_surt_cdx": r"""
WITH raw AS (
  SELECT o_orderkey,
         (CASE WHEN o_orderkey % 2 = 0 THEN 'HTTP://' ELSE 'https://' END)
         || 'WWW.Shop' || (o_custkey % 50) || '.Example.COM'
         || (CASE WHEN o_orderkey % 2 = 0 THEN ':80' ELSE ':443' END)
         || '/Items/' || o_orderkey || '/?z=9&A=1&m=5#frag' AS url,
         o_orderdate AS ts
  FROM orders
), parts AS (
  SELECT url, ts, u,
         regexp_extract(u, '^([a-z][a-z0-9+.-]*)://', 1) AS scheme,
         regexp_extract(u, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS hostport,
         regexp_extract(u, '^[a-z][a-z0-9+.-]*://[^/?#]+(/[^?#]*)?', 1) AS path,
         regexp_extract(u, '\?([^#]*)', 1) AS query
  FROM (SELECT url, ts, regexp_replace(lower(url), '#.*$', '') AS u FROM raw)
), hostfix AS (
  SELECT *, regexp_replace(
    CASE WHEN scheme = 'http' THEN regexp_replace(hostport, ':80$', '')
         WHEN scheme = 'https' THEN regexp_replace(hostport, ':443$', '')
         ELSE hostport END, '^www\.', '') AS host
  FROM parts
)
SELECT array_to_string(list_reverse(string_split(
         regexp_replace(host, ':[0-9]+$', ''), '.')), ',')
       || regexp_extract(host, '(:[0-9]+)$', 1) || ')'
       || path
       || (CASE WHEN query = '' THEN ''
           ELSE '?' || array_to_string(list_sort(string_split(query, '&')),
                                       '&') END) AS surt_key,
       epoch_us(ts) AS ts_us,
       md5(url) AS digest,
       url
FROM hostfix
""",
    "q50_revisit_priority": """
WITH h AS (
  SELECT 'https://h' || (user_id % 40) || '.example.net/p/'
         || (event_id % 25) AS url,
         ts, epoch_us(ts) AS ts_us, event_id, md5(event_type) AS digest
  FROM events
), o AS (
  SELECT url, ts_us,
         CASE WHEN lag(digest) OVER w IS NOT NULL
               AND lag(digest) OVER w <> digest THEN 1 ELSE 0 END AS changed
  FROM h
  WINDOW w AS (PARTITION BY url ORDER BY ts, event_id)
), p AS (
  SELECT url, count(*) AS n_fetches, sum(changed)::BIGINT AS n_changes,
         max(ts_us) AS last_us
  FROM o GROUP BY url
), nw AS (SELECT max(epoch_us(ts)) AS now_us FROM events)
SELECT url, n_fetches, n_changes,
       (CASE WHEN n_fetches > 1
             THEN (1000000 * n_changes) // (n_fetches - 1)
             ELSE 500000 END)::BIGINT AS change_rate_micro,
       (((SELECT now_us FROM nw) - last_us) // 3600000000)::BIGINT
         AS age_hours,
       ((CASE WHEN n_fetches > 1
              THEN (1000000 * n_changes) // (n_fetches - 1)
              ELSE 500000 END)
        * (((SELECT now_us FROM nw) - last_us) // 3600000000))::BIGINT
         AS priority_micro
FROM p
""",
    "q51_content_sniff": """
WITH d AS (
  SELECT doc_id, doc_id % 10 AS k, doc_id % 3 AS s FROM documents
)
SELECT doc_id,
  CASE k WHEN 0 THEN 'image/png' WHEN 1 THEN 'image/gif'
         WHEN 2 THEN 'image/jpeg' WHEN 3 THEN 'application/pdf'
         WHEN 4 THEN 'application/zip' WHEN 5 THEN 'application/gzip'
         WHEN 6 THEN 'text/html' WHEN 7 THEN 'application/xml'
         WHEN 8 THEN 'application/json' ELSE 'text/plain' END AS mime,
  CASE WHEN k <= 5 THEN NULL
       WHEN k = 6 THEN (CASE s WHEN 0 THEN 'utf-8' WHEN 1 THEN 'iso-8859-1'
                               ELSE 'windows-1252' END)
       WHEN k = 7 THEN 'utf-8'
       WHEN k = 8 THEN 'us-ascii'
       ELSE (CASE s WHEN 0 THEN 'utf-8' WHEN 1 THEN 'utf-16le'
                    ELSE 'us-ascii' END) END AS charset,
  (k = 9 AND s IN (0, 1)) AS has_bom,
  (k >= 6) AS is_text
FROM d
""",
    "q52_trap_detection": r"""
WITH raw AS (
  SELECT o_orderkey,
    CASE o_orderkey % 5
      WHEN 0 THEN 'https://shop' || (o_custkey % 50) || '.example.com/items/'
                  || o_orderkey || '?page=2'
      WHEN 1 THEN 'https://trap.example.com'
                  || repeat('/cat/list', CAST(2 + o_orderkey % 3 AS INT))
      WHEN 2 THEN 'https://cal.example.com'
                  || (CASE WHEN o_orderkey % 2 = 0 THEN '/archive/a/b/c'
                      ELSE '' END)
                  || '/2024/' || (1 + o_orderkey % 12) || '/'
                  || (1 + o_orderkey % 28)
      WHEN 3 THEN 'https://s.example.com/p/' || o_orderkey
                  || '?jsessionid=' || md5(o_orderkey::VARCHAR) || '&x=1'
      ELSE 'https://q.example.com/search?'
           || 'p0=0&p1=1&p2=2&p3=3&p4=4&p5=5&p6=6&p7=7&p8=8&p9=9'
    END AS url
  FROM orders
), parts AS (
  SELECT o_orderkey, url,
    regexp_extract(url, '^[a-z][a-z0-9+.\-]*://[^/?#]+(/[^?#]*)?', 1)
      AS path,
    regexp_extract(url, '\?([^#]*)', 1) AS q
  FROM raw
), feat AS (
  SELECT *,
    list_filter(string_split(path, '/'), x -> x <> '') AS segs,
    CASE WHEN q = '' THEN [] ELSE string_split(q, '&') END AS params
  FROM parts
), flags AS (
  SELECT o_orderkey, url,
    len(segs) AS depth,
    (len(segs) - len(list_distinct(segs))) >= 2 AS repeat_trap,
    (regexp_matches(path, '/[0-9]{4}/[0-9]{1,2}/[0-9]{1,2}(/|$)')
     AND len(segs) > 6) AS calendar_trap,
    len(list_filter(params, p ->
      lower(regexp_extract(p, '^([^=]*)', 1)) IN
        ('sessionid','phpsessid','jsessionid','sid','session','sess','token')
      OR regexp_matches(lower(regexp_extract(p, '=(.*)$', 1)),
                        '^[0-9a-f]{32}$')
      OR regexp_matches(lower(regexp_extract(p, '=(.*)$', 1)),
         '^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$')
    )) > 0 AS session_param,
    len(segs) > 12 AS deep_path,
    len(params) > 8 AS param_blowup
  FROM feat
)
SELECT o_orderkey, url, depth::INT AS path_depth, repeat_trap,
  calendar_trap, session_param, param_blowup,
  (repeat_trap::INT * 40 + calendar_trap::INT * 30 + session_param::INT * 20
   + deep_path::INT * 20 + param_blowup::INT * 10)::INT AS trap_score,
  ((repeat_trap::INT * 40 + calendar_trap::INT * 30 + session_param::INT * 20
    + deep_path::INT * 20 + param_blowup::INT * 10) >= 40) AS is_trap
FROM flags
""",
    "q53_host_budgets": """
WITH h AS (
  SELECT 'h' || (user_id % 40) || '.example.net' AS host,
         (event_id % 9 = 0)::INT AS e, (event_id % 7 = 0)::INT AS d
  FROM events
), a AS (
  SELECT host, count(*) AS n_fetches,
         sum(e)::BIGINT AS n_errors, sum(d)::BIGINT AS n_dups
  FROM h GROUP BY host
), s AS (
  SELECT host, n_fetches,
         (1000000 * n_errors) // n_fetches AS err_ppm,
         (1000000 * n_dups) // n_fetches AS dup_ppm
  FROM a
), sc AS (
  SELECT *, greatest(
    ((1000000 - err_ppm) * (1000000 - dup_ppm)) // 1000000,
    10000)::BIGINT AS score_micro
  FROM s
)
SELECT host, n_fetches, err_ppm::BIGINT AS err_ppm,
       dup_ppm::BIGINT AS dup_ppm, score_micro,
       ((100000 * score_micro)
        // (SELECT sum(score_micro) FROM sc))::BIGINT AS budget
FROM sc
""",
    "q54_capture_drift": """
WITH h AS (
  SELECT 'https://h' || (user_id % 40) || '.example.net/p/'
         || (event_id % 25) AS url,
         ts, epoch_us(ts) AS ts_us, event_id,
         'alpha beta gamma delta w' || (event_id % 5) || ' epsilon zeta w'
         || (event_id % 3) || ' eta theta iota kappa' AS text
  FROM events
), tok AS (
  SELECT url, ts, ts_us, event_id,
         regexp_split_to_array(trim(text), '[ \t\n\r]+') AS toks
  FROM h
), sh AS (
  SELECT url, ts, ts_us, event_id,
         list_distinct(list_transform(
           range(1, greatest(len(toks) - 2, 1) + 1),
           i -> array_to_string(toks[i:i+2], ' '))) AS s
  FROM tok
), lagd AS (
  SELECT url, ts_us, s,
         lag(s) OVER (PARTITION BY url ORDER BY ts, event_id) AS p
  FROM sh
), m AS (
  SELECT url, ts_us, len(s)::INT AS n_shingles,
         CASE WHEN p IS NULL THEN NULL
              ELSE len(list_intersect(s, p))::INT END AS overlap,
         CASE WHEN p IS NULL THEN NULL
              ELSE (len(s) + len(p) - len(list_intersect(s, p)))::INT
              END AS union_size
  FROM lagd
)
SELECT url, ts_us, n_shingles, overlap, union_size,
       (CASE WHEN overlap IS NULL THEN NULL
             WHEN union_size > 0 THEN (1000000 * overlap) // union_size
             ELSE 1000000 END)::BIGINT AS jaccard_ppm,
       (CASE WHEN overlap IS NULL THEN NULL
             WHEN union_size > 0
               THEN 1000000 - (1000000 * overlap) // union_size
             ELSE 0 END)::BIGINT AS drift_ppm
FROM m
""",
    "q55_anchor_topk": r"""
WITH e AS (
  SELECT 'https://t.example.com/p/' || (o_custkey % 200) AS dst,
         o_orderkey AS k,
         CASE o_orderkey % 7
           WHEN 0 THEN 'click here' WHEN 1 THEN 'read more'
           WHEN 2 THEN 'home page' WHEN 3 THEN 'product page'
           WHEN 4 THEN 'details' WHEN 5 THEN 'buy now'
           ELSE 'official site' END AS b
  FROM orders
), noisy AS (
  SELECT dst, k,
         CASE WHEN k % 2 = 0 THEN '  ' || replace(b, ' ', '   ') || ' '
              ELSE b END AS x
  FROM e
), raw AS (
  SELECT dst, CASE WHEN k % 3 = 0 THEN upper(x) ELSE x END AS anchor_raw
  FROM noisy
), a AS (
  SELECT dst, lower(trim(regexp_replace(anchor_raw, '\s+', ' ', 'g')))
           AS anchor,
         count(*) AS n_links
  FROM raw GROUP BY 1, 2
), r AS (
  SELECT *, row_number() OVER (PARTITION BY dst
             ORDER BY n_links DESC, anchor) AS rnk
  FROM a
)
SELECT dst, anchor, n_links, rnk::INT AS rank FROM r WHERE rnk <= 3
""",
    "q56_main_content": """
WITH p AS (
  SELECT doc_id,
    list_filter(string_split(substr(text, 1, 150), ' '), x -> x <> '')
      AS w1,
    list_filter(string_split(substr(text, 151, 150), ' '), x -> x <> '')
      AS w2
  FROM documents
), c AS (
  SELECT doc_id, len(w1) AS n1, len(w2) AS n2,
         array_to_string(w1, ' ') AS t1, array_to_string(w2, ' ') AS t2
  FROM p
)
SELECT doc_id,
  concat_ws(chr(10),
    CASE WHEN n1 >= 10 THEN t1 END,
    CASE WHEN n2 >= 10 THEN t2 END) AS main_text,
  (5 + CASE WHEN n2 > 0 THEN 1 ELSE 0 END)::INT AS n_blocks,
  (CASE WHEN n1 >= 10 THEN 1 ELSE 0 END
   + CASE WHEN n2 >= 10 THEN 1 ELSE 0 END)::INT AS n_content_blocks,
  (15 + n1 + n2)::INT AS total_words,
  (CASE WHEN n1 >= 10 THEN n1 ELSE 0 END
   + CASE WHEN n2 >= 10 THEN n2 ELSE 0 END)::INT AS content_words,
  ((1000000 * (15 + n1 + n2
     - (CASE WHEN n1 >= 10 THEN n1 ELSE 0 END
        + CASE WHEN n2 >= 10 THEN n2 ELSE 0 END)))
   // (15 + n1 + n2))::BIGINT AS boiler_ppm
FROM c
""",
    "q57_sitemap_parse": """
WITH u AS (
  SELECT 'https://s' || (o_custkey % 20) || '.ex.com/sitemap.xml'
           AS sitemap_url,
         'https://s' || (o_custkey % 20) || '.ex.com/o/' || o_orderkey
           AS loc,
         strftime(o_orderdate, '%Y-%m-%d') AS lastmod,
         CASE o_orderkey % 4 WHEN 0 THEN 'daily' WHEN 1 THEN 'weekly'
              WHEN 2 THEN 'monthly' ELSE 'yearly' END AS changefreq,
         CASE o_orderkey % 3 WHEN 0 THEN '0.5' WHEN 1 THEN '0.8'
              ELSE '1.0' END AS priority,
         FALSE AS is_index
  FROM orders
), i AS (
  SELECT DISTINCT
         'https://index.ex.com/sitemap-index.xml' AS sitemap_url,
         'https://s' || (o_custkey % 20) || '.ex.com/sitemap.xml' AS loc,
         NULL::VARCHAR AS lastmod, NULL::VARCHAR AS changefreq,
         NULL::VARCHAR AS priority, TRUE AS is_index
  FROM orders
), allrows AS (SELECT * FROM u UNION ALL SELECT * FROM i)
SELECT *,
  (CASE changefreq WHEN 'always' THEN 1 WHEN 'hourly' THEN 1
        WHEN 'daily' THEN 24 WHEN 'weekly' THEN 168
        WHEN 'monthly' THEN 720 WHEN 'yearly' THEN 8760
        WHEN 'never' THEN 8760 END)::INT AS freq_hours
FROM allrows
""",
    "q58_host_mirrors": """
WITH p AS (
  SELECT 'm' || (doc_id % 8) || '.ex.com' AS host,
         md5((doc_id % 60)::VARCHAR) AS d
  FROM documents
), pp AS (SELECT d, host, count(*) AS n FROM p GROUP BY 1, 2),
pd AS (SELECT d, count(*) AS n_hosts FROM pp GROUP BY 1),
j AS (SELECT pp.host, pp.n, pd.n_hosts FROM pp JOIN pd USING (d)),
s AS (SELECT host, sum(n)::BIGINT AS n_pages,
             count(*) AS n_distinct,
             sum(CASE WHEN n_hosts > 1 THEN n ELSE 0 END)::BIGINT
               AS n_mirrored
      FROM j GROUP BY host)
SELECT host, n_pages, n_distinct,
       ((1000000 * (n_pages - n_distinct)) // n_pages)::BIGINT
         AS intra_dup_ppm,
       ((1000000 * n_mirrored) // n_pages)::BIGINT AS mirror_ppm
FROM s
""",
    "q48_warc_roundtrip": """
SELECT doc_id, md5(text) AS payload_md5, strlen(text)::BIGINT AS n_bytes
FROM documents
""",
    "q15_ngram_jaccard": _ngram_jaccard_sql(0.6),
    "q16_simhash": _simhash_sql(32, 3),
    "q17_embedding_topk": _cosine_topk_sql(5, 10),
    "q18_ann_lsh": _ann_lsh_sql(64, 5, 10, 8),
    "q19_text_stats": _text_stats_sql(),
    "q20_multimodal_meta": """
WITH m AS (SELECT doc_id, strlen(text) AS n FROM documents)
SELECT doc_id,
       n::BIGINT AS byte_len,
       (64 + (n % 577))::INT AS width,
       (64 + ((n * 31) % 433))::INT AS height,
       (1 + (n % 7))::INT AS n_frames,
       ((1 + (n % 7) + 1) // 2)::BIGINT AS n_sampled_frames
FROM m
""",
    "q22_embedding_neardup": """
WITH base AS (
  SELECT vec_id, unnest(embedding)::DOUBLE AS v,
         unnest(range(1, len(embedding) + 1)) AS i
  FROM embeddings
),
aug AS (
  SELECT vec_id, i, v FROM base
  UNION ALL
  SELECT vec_id + 100000, i,
         v * (1.0 + ((vec_id + i - 1) % 7)::DOUBLE / 100.0)
  FROM base
),
n AS (SELECT vec_id, sqrt(sum(v * v)) AS nrm FROM aug GROUP BY vec_id),
d AS (
  SELECT a.vec_id AS id_a, b.vec_id AS id_b, sum(a.v * b.v) AS dot
  FROM aug a JOIN aug b ON a.i = b.i AND a.vec_id < b.vec_id
  GROUP BY 1, 2
),
s AS (
  SELECT id_a, id_b, dot / (na.nrm * nb.nrm) AS cos
  FROM d JOIN n na ON na.vec_id = d.id_a JOIN n nb ON nb.vec_id = d.id_b
)
SELECT id_a, id_b, round(cos, 6)::DOUBLE AS cos FROM s WHERE cos >= 0.99
""",
    "q23_embedding_neardup_lsh": _embedding_neardup_lsh_sql(64, 0.99, 8, 2),
    "q28_field_types_extended": """
SELECT doc_id,
       (doc_id % 2 = 0) AS in_stock,
       '2024-03-' || lpad((doc_id % 27 + 1)::VARCHAR, 2, '0') AS listed_on,
       'https://shop' || (doc_id % 5) || '.example.com/cat/item/' || doc_id
         AS more_url,
       'user' || doc_id || '@mail' || (doc_id % 7) || '.example.org'
         AS contact_email,
       '055123' || lpad((doc_id % 10000)::VARCHAR, 4, '0') AS contact_phone
FROM documents
""",
    "q29_jsonld_extraction": """
SELECT doc_id,
       'Doc ' || doc_id AS prod_name,
       (n_chars || '.99')::DOUBLE AS price,
       'SKU-' || doc_id AS sku,
       '{"@type":"Product","name":"Doc ' || doc_id
         || '","offers":{"price":' || n_chars || '.99},"sku":"SKU-'
         || doc_id || '"}' AS ld_json
FROM documents
""",
    "q32_microdata_extraction": """
SELECT doc_id,
       'https://schema.org/Product' AS item_type,
       'Doc ' || doc_id AS prod_name,
       '/img/' || doc_id || '.jpg' AS image,
       (n_chars || '.99')::DOUBLE AS price,
       '{"properties":{"image":["/img/' || doc_id
         || '.jpg"],"name":["Doc ' || doc_id
         || '"],"offers":[{"properties":{"price":["' || n_chars
         || '.99"]},"type":"https://schema.org/Offer"}]},"type":"https://schema.org/Product"}'
         AS md_json
FROM documents
""",
    "q33_rdfa_extraction": """
SELECT doc_id,
       'Product' AS item_type,
       'https://schema.org/' AS vocab,
       'Doc ' || doc_id AS prod_name,
       (n_chars || '.99')::DOUBLE AS price,
       '{"properties":{"name":["Doc ' || doc_id
         || '"],"offers":[{"properties":{"price":["' || n_chars
         || '.99"]},"type":"Offer","vocab":"https://schema.org/"}],"url":["/d/'
         || doc_id
         || '"]},"type":"Product","vocab":"https://schema.org/"}' AS rd_json
FROM documents
""",
    "q34_media_extraction": """
SELECT doc_id,
       3::INT AS n_media,
       'img' AS first_kind,
       '/i/' || doc_id || '.jpg' AS first_src,
       'pic ' || doc_id AS first_alt,
       '/p/' || doc_id || '.jpg' AS video_poster,
       '/a/' || doc_id || '.ogg' AS audio_src
FROM documents
""",
    "q31_url_security": """
-- flags derived from the generating arithmetic (the construction rule is
-- the spec); weights: medium 15 / high 30, http warning +10
WITH f AS (
  SELECT c_custkey,
         (c_custkey % 13 = 0) AS too_long,
         (c_custkey % 4 = 2)  AS bad_scheme,
         (c_custkey % 5 = 0)  AS localhost_access,
         (c_custkey % 3 = 0)  AS sensitive_path,
         (c_custkey % 11 = 0) AS sql_keywords,
         (c_custkey % 4 = 1)  AS is_http
  FROM customer
)
SELECT c_custkey, too_long, bad_scheme, localhost_access, sensitive_path,
       sql_keywords,
       (too_long::INT * 15 + bad_scheme::INT * 30
        + localhost_access::INT * 15 + sensitive_path::INT * 15
        + sql_keywords::INT * 30 + is_http::INT * 10)::INT AS risk_score
FROM f
""",
    "q26_ann_ivf": _ivf_sql(5, 10, 16, 4),
    "q27_repetition_stats": _REPETITION_SQL,
    "q25_gdpr_flags": """
WITH t AS (
  SELECT (['.com', '.de', '.fr', '.co.uk', '.jp', '.eu', '.nl'])
           [(c_custkey % 7) + 1] AS tld,
         'shop' || (c_custkey % 100) ||
         (['.com', '.de', '.fr', '.co.uk', '.jp', '.eu', '.nl'])
           [(c_custkey % 7) + 1] AS domain
  FROM customer
),
f AS (
  SELECT tld, domain,
         (suffix(domain, '.de') OR suffix(domain, '.fr')
          OR suffix(domain, '.co.uk') OR suffix(domain, '.eu')
          OR suffix(domain, '.it') OR suffix(domain, '.es')
          OR suffix(domain, '.nl')) AS gdpr
  FROM t
)
SELECT tld, gdpr, count(*) AS n_domains,
       count(DISTINCT domain) AS n_distinct
FROM f GROUP BY tld, gdpr
""",
    "q24_enrichment": """
SELECT o_orderkey, c_mktsegment AS segment, n_name AS nation, o_totalprice
FROM orders
LEFT JOIN customer ON o_custkey = c_custkey
LEFT JOIN nation ON c_nationkey = n_nationkey
""",
    "q21_validation_rules": """
WITH v AS (
  SELECT p_partkey, p_name, p_type,
         CASE WHEN p_name IS NULL THEN 'required field p_name is missing'
              WHEN strlen(p_name) < 9 THEN 'p_name: string too short'
         END AS v1,
         CASE WHEN p_type IS NOT NULL
                   AND p_type NOT IN ('ECONOMY', 'STANDARD', 'PREMIUM')
              THEN 'p_type: value not in allowed options' END AS v2
  FROM part
)
SELECT p_partkey,
       CASE WHEN v1 IS NOT NULL THEN 'invalid' ELSE p_name END AS p_name,
       CASE WHEN v2 IS NOT NULL THEN NULL ELSE p_type END AS p_type,
       ((v1 IS NOT NULL)::INT + (v2 IS NOT NULL)::INT) AS n_violations,
       concat_ws('; ', v1, v2) AS violations
FROM v
""",
    # q93: positional phrase search — replays queries.q93_phrase_search /
    # ops/retrieval.phrase_search (slot votes, count DISTINCT slots per
    # candidate start, overlapping matches counted).
    "q93_phrase_search": r"""
WITH d AS (
  SELECT doc_id,
         lower(text) || CASE
           WHEN doc_id % 4 = 0
             THEN ' frontier crawl frontier crawl frontier'
           WHEN doc_id % 4 = 1 THEN ' frontier crawl engine'
           ELSE '' END AS text
  FROM documents
),
tk AS (
  SELECT doc_id,
         CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT doc_id,
               regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM d)
),
pos AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM tk
),
slots AS (SELECT * FROM (VALUES ('frontier', 0), ('crawl', 1),
                                ('frontier', 2)) v(term, slot)),
votes AS (
  SELECT doc_id, pos - slot AS start, slot
  FROM pos JOIN slots ON tok = term
  WHERE pos - slot >= 0
),
st AS (
  SELECT doc_id, start FROM votes
  GROUP BY doc_id, start HAVING count(DISTINCT slot) = 3
)
SELECT doc_id, count(*)::BIGINT AS n_matches FROM st GROUP BY doc_id
""",
    # q94: stupid-backoff bigram LM — replays queries.q94_word_lm /
    # ops/textstats.stupid_backoff_scores (ctx = bigram-start counts,
    # uni = bigram-end counts, alpha = 0.4 in ppm, truncating division).
    "q94_word_lm": r"""
WITH tr AS (
  SELECT doc_id, lower(text) AS text FROM documents WHERE doc_id % 2 = 0
),
sc AS (
  SELECT doc_id,
         lower(text) || CASE WHEN doc_id % 10 = 1
                             THEN ' zzoov' || (doc_id % 7)
                             ELSE '' END AS text
  FROM documents WHERE doc_id % 2 = 1
),
trtk AS (
  SELECT CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM tr)
),
trbg AS (
  SELECT toks[g] AS w1, toks[g + 1] AS w2
  FROM (SELECT toks, unnest(range(1, len(toks))) AS g FROM trtk)
),
c2 AS (SELECT w1, w2, count(*)::BIGINT AS c2 FROM trbg GROUP BY w1, w2),
ctx AS (SELECT w1, sum(c2)::BIGINT AS ctx FROM c2 GROUP BY w1),
uni AS (SELECT w2, sum(c2)::BIGINT AS uni FROM c2 GROUP BY w2),
t AS (SELECT sum(uni)::BIGINT AS t_total FROM uni),
sctk AS (
  SELECT doc_id,
         CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT doc_id,
               regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM sc)
),
scbg AS (
  SELECT doc_id, toks[g] AS w1, toks[g + 1] AS w2, count(*)::BIGINT AS k
  FROM (SELECT doc_id, toks, unnest(range(1, len(toks))) AS g FROM sctk)
  GROUP BY doc_id, w1, w2
),
scored AS (
  SELECT s.doc_id, s.k,
         CASE WHEN c2.c2 IS NOT NULL
              THEN (1000000 * c2.c2) // ctx.ctx
              ELSE COALESCE((400000 * uni.uni)
                            // (SELECT t_total FROM t), 0) END AS s_ppm
  FROM scbg s
  LEFT JOIN c2 ON s.w1 = c2.w1 AND s.w2 = c2.w2
  LEFT JOIN ctx ON s.w1 = ctx.w1
  LEFT JOIN uni ON s.w2 = uni.w2
),
per_doc AS (
  SELECT doc_id, sum(k)::BIGINT AS n_bigrams,
         sum(k * s_ppm)::BIGINT AS sum_ppm
  FROM scored GROUP BY doc_id
)
SELECT sp.doc_id,
       COALESCE(n_bigrams, 0)::BIGINT AS n_bigrams,
       COALESCE(sum_ppm, 0)::BIGINT AS sum_ppm,
       COALESCE(CASE WHEN n_bigrams > 0 THEN sum_ppm // n_bigrams END,
                0)::BIGINT AS avg_ppm
FROM (SELECT DISTINCT doc_id FROM sc) sp
LEFT JOIN per_doc USING (doc_id)
""",
    # q95: exact per-language discrete quantiles — replays
    # queries.q95_length_quantiles / ops/sketches.exact_group_quantiles
    # (type-1 lower quantile via value-histogram running sum).
    "q95_length_quantiles": r"""
WITH tk AS (
  SELECT lang,
         CASE WHEN t2 = '' THEN 0
              ELSE len(regexp_split_to_array(t2, '[ \t\n\r]+')) END
           AS n_tokens
  FROM (SELECT lang,
               regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM documents)
),
h AS (SELECT lang, n_tokens AS v, count(*)::BIGINT AS c
      FROM tk GROUP BY lang, n_tokens),
cum AS (
  SELECT lang, v, c,
         sum(c) OVER (PARTITION BY lang ORDER BY v) AS cum,
         sum(c) OVER (PARTITION BY lang) AS n
  FROM h
)
SELECT lang, max(n)::BIGINT AS n,
       min(CASE WHEN 100 * cum >= 50 * n THEN v END)::BIGINT AS p50,
       min(CASE WHEN 100 * cum >= 90 * n THEN v END)::BIGINT AS p90,
       min(CASE WHEN 100 * cum >= 99 * n THEN v END)::BIGINT AS p99
FROM cum GROUP BY lang
""",
    # q96: CDX snapshot delta — replays queries.q96_cdx_delta /
    # functions/surt.cdx_delta (latest capture per key by (ts, digest)
    # max, full-outer diff, null-ness/digest CASE).
    "q96_cdx_delta": r"""
WITH base AS (
  SELECT o_orderkey AS k,
         'com,example,shop' || (o_custkey % 50) || ')/items/'
           || o_orderkey AS surt_key,
         o_orderdate AS ts
  FROM orders
),
old_s AS (
  SELECT surt_key, ts, md5(surt_key) AS digest FROM base
  UNION ALL
  SELECT surt_key, ts + INTERVAL 1 DAY, md5(surt_key || 'v2')
  FROM base WHERE k % 5 = 0
),
new_s AS (
  SELECT surt_key, ts,
         CASE WHEN k % 10 = 1 THEN md5(surt_key || 'v3')
              WHEN k % 5 = 0 THEN md5(surt_key || 'v2')
              ELSE md5(surt_key) END AS digest
  FROM base WHERE k % 10 <> 0
  UNION ALL
  SELECT 'net,fresh)/p/' || k AS surt_key, ts,
         md5(base.surt_key) AS digest
  FROM base WHERE k % 7 = 0
),
lo AS (
  SELECT surt_key, digest AS old_digest FROM (
    SELECT surt_key, digest,
           row_number() OVER (PARTITION BY surt_key
                              ORDER BY ts DESC, digest DESC) AS rn
    FROM old_s) WHERE rn = 1
),
ln AS (
  SELECT surt_key, digest AS new_digest FROM (
    SELECT surt_key, digest,
           row_number() OVER (PARTITION BY surt_key
                              ORDER BY ts DESC, digest DESC) AS rn
    FROM new_s) WHERE rn = 1
)
SELECT surt_key,
       regexp_extract(surt_key, '^([^)]*)\)', 1) AS host_rev,
       CASE WHEN old_digest IS NULL THEN 'added'
            WHEN new_digest IS NULL THEN 'removed'
            WHEN old_digest = new_digest THEN 'unchanged'
            ELSE 'changed' END AS status,
       old_digest, new_digest
FROM lo FULL JOIN ln USING (surt_key)
""",
    # q97: schedule-fairness Gini — replays queries.q97_schedule_fairness
    # / monitoring.schedule_fairness (blocked rank formula over the
    # per-host-total value histogram).
    "q97_schedule_fairness": r"""
WITH s AS (
  SELECT 'h' || (l_orderkey % 500) || '.example.com' AS host,
         l_quantity::BIGINT AS w
  FROM lineitem
),
ph AS (SELECT host, sum(w)::BIGINT AS c FROM s GROUP BY host),
h AS (SELECT c, count(*)::BIGINT AS m FROM ph GROUP BY c),
cum AS (SELECT c, m, sum(m) OVER (ORDER BY c) AS cum_m FROM h),
t AS (
  SELECT sum(m)::BIGINT AS n_hosts, sum(c * m)::BIGINT AS total,
         sum(c * (2 * m * (cum_m - m + 1) + m * (m - 1)))::BIGINT AS a
  FROM cum
)
SELECT n_hosts, total,
       ((1000000 * (a - (n_hosts + 1) * total))
        // (n_hosts * total))::BIGINT AS gini_ppm
FROM t
""",
    # q98: corpus-diff keywords — replays queries.q98_corpus_diff /
    # ops/textstats.corpus_diff_keywords (ppm rates, add-one lift,
    # top-k per direction with (diff, token) total order).
    "q98_corpus_diff": r"""
WITH atk AS (
  SELECT CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT regexp_replace(
          lower(text) || ' alpha' || (doc_id % 5) || ' shared',
          '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM documents WHERE doc_id % 2 = 0)
),
btk AS (
  SELECT CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT regexp_replace(
          lower(text) || ' beta' || (doc_id % 5) || ' shared',
          '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM documents WHERE doc_id % 2 = 1)
),
ca AS (SELECT token, count(*)::BIGINT AS a_n
       FROM (SELECT unnest(toks) AS token FROM atk) GROUP BY token),
cb AS (SELECT token, count(*)::BIGINT AS b_n
       FROM (SELECT unnest(toks) AS token FROM btk) GROUP BY token),
ta AS (SELECT sum(a_n)::BIGINT AS a_t FROM ca),
tb AS (SELECT sum(b_n)::BIGINT AS b_t FROM cb),
j AS (
  SELECT token, COALESCE(a_n, 0) AS a_n, COALESCE(b_n, 0) AS b_n
  FROM ca FULL JOIN cb USING (token)
),
r AS (
  SELECT token, a_n, b_n,
         (1000000 * a_n) // (SELECT a_t FROM ta) AS a_ppm,
         (1000000 * b_n) // (SELECT b_t FROM tb) AS b_ppm
  FROM j
),
rr AS (
  SELECT token, a_n, b_n, a_ppm, b_ppm, a_ppm - b_ppm AS diff_ppm,
         (1000 * (a_ppm + 1)) // (b_ppm + 1) AS lift_milli
  FROM r
)
SELECT * FROM (
  SELECT 'a' AS direction, token, a_n, b_n,
         a_ppm::BIGINT AS a_ppm, b_ppm::BIGINT AS b_ppm,
         diff_ppm::BIGINT AS diff_ppm, lift_milli::BIGINT AS lift_milli
  FROM rr WHERE diff_ppm > 0
  ORDER BY diff_ppm DESC, token ASC LIMIT 15)
UNION ALL
SELECT * FROM (
  SELECT 'b' AS direction, token, a_n, b_n,
         a_ppm::BIGINT, b_ppm::BIGINT, diff_ppm::BIGINT,
         lift_milli::BIGINT
  FROM rr WHERE diff_ppm < 0
  ORDER BY diff_ppm ASC, token ASC LIMIT 15)
""",
    # q99: n-gram memorization risk — replays queries.q99_ngram_risk /
    # ops/dedup.ngram_risk_scores (8-gram instances, 60-bit md5-slice
    # keys, corpus-frequency >= 2, ppm with truncating div).
    "q99_ngram_risk": r"""
WITH c AS (
  SELECT doc_id, lower(text) AS text FROM documents
  UNION ALL
  SELECT doc_id + 500000, lower(text) FROM documents WHERE doc_id % 6 = 0
),
tk AS (
  SELECT doc_id,
         CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT doc_id,
               regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM c)
),
sh AS (
  SELECT doc_id, ('0x' || substr(md5(s), 1, 15))::BIGINT AS k
  FROM (SELECT doc_id,
               unnest(list_transform(
                 range(1, greatest(len(toks) - 7, 1) + 1),
                 i -> array_to_string(toks[i:i+7], ' '))) AS s
        FROM tk)
),
f AS (SELECT k, count(*)::BIGINT AS fr FROM sh GROUP BY k)
SELECT doc_id, count(*)::BIGINT AS n_instances,
       sum((fr >= 2)::BIGINT)::BIGINT AS n_risky,
       ((1000000 * sum((fr >= 2)::BIGINT)) // count(*))::BIGINT
         AS risk_ppm
FROM sh JOIN f USING (k)
GROUP BY doc_id
""",
    # q100: sitemap coverage audit — replays queries.q100_sitemap_coverage
    # / sources/sitemap.sitemap_coverage (distinct sides, full-outer url
    # join, per-host counters + coverage ppm).
    "q100_sitemap_coverage": r"""
WITH l AS (
  SELECT DISTINCT 'https://shop' || (o_custkey % 30)
         || '.example.org/o/' || o_orderkey AS url
  FROM orders WHERE o_orderkey % 3 <> 0
),
c AS (
  SELECT DISTINCT url FROM (
    SELECT 'https://shop' || (o_custkey % 30) || '.example.org/o/'
           || o_orderkey AS url
    FROM orders WHERE o_orderkey % 2 <> 0
    UNION ALL
    SELECT 'https://shop' || (o_custkey % 30) || '.example.org/extra/'
           || o_orderkey AS url
    FROM orders WHERE o_orderkey % 11 = 0)
),
j AS (
  SELECT COALESCE(l.url, c.url) AS url,
         (l.url IS NOT NULL)::INT AS li, (c.url IS NOT NULL)::INT AS ci
  FROM l FULL JOIN c ON l.url = c.url
),
g AS (
  SELECT regexp_extract(url, '^[a-z][a-z0-9+.-]*://([^/?#]+)', 1) AS host,
         sum(li)::BIGINT AS n_listed, sum(li * ci)::BIGINT AS n_crawled,
         sum(li * (1 - ci))::BIGINT AS n_missed,
         sum((1 - li) * ci)::BIGINT AS n_unlisted
  FROM j GROUP BY host
)
SELECT host, n_listed, n_crawled, n_missed, n_unlisted,
       COALESCE(CASE WHEN n_listed > 0
                     THEN (1000000 * n_crawled) // n_listed END,
                0)::BIGINT AS coverage_ppm
FROM g
""",
    # q101: ordered proximity search — replays queries.q101_proximity
    # _search / ops/retrieval.proximity_search (per-doc position pair
    # count, 1 <= p2 - p1 <= slop).
    "q101_proximity_search": r"""
WITH d AS (
  SELECT doc_id,
         lower(text) || ' alpha '
         || COALESCE(array_to_string(
              list_transform(range(1, (doc_id % 6) + 1), i -> 'fill'),
              ' '), '')
         || CASE WHEN doc_id % 6 = 0 THEN '' ELSE ' ' END
         || 'beta'
         || CASE WHEN doc_id % 9 = 0 THEN ' alpha beta' ELSE '' END
           AS text
  FROM documents
),
tk AS (
  SELECT doc_id,
         CASE WHEN t2 = '' THEN []::VARCHAR[]
              ELSE regexp_split_to_array(t2, '[ \t\n\r]+') END AS toks
  FROM (SELECT doc_id,
               regexp_replace(text, '^[ \t\n\r]+|[ \t\n\r]+$', '') AS t2
        FROM d)
),
pos AS (
  SELECT doc_id, unnest(toks) AS tok,
         generate_subscripts(toks, 1) - 1 AS pos
  FROM tk
),
p1 AS (SELECT doc_id, pos FROM pos WHERE tok = 'alpha'),
p2 AS (SELECT doc_id, pos FROM pos WHERE tok = 'beta')
SELECT p1.doc_id, count(*)::BIGINT AS n_pairs
FROM p1 JOIN p2 ON p1.doc_id = p2.doc_id
WHERE p2.pos - p1.pos BETWEEN 1 AND 3
GROUP BY p1.doc_id
""",
    # q30_crawl_rounds: iterative crawl — no SQL oracle (rows-only check);
    # exact order/seen-set parity is asserted by tests/test_crawl_engine.py.
}
