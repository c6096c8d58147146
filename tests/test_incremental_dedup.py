"""Incremental (batch-vs-corpus) MinHash dedup: the continuous-crawl path.

Covers ops.dedup.minhash_batch_pairs (two-table LSH), write_minhash_index
(bucket/shard at-rest layout), and dedup_batch_indexed (partition-pruned
probe). The scale claim under test: the indexed probe returns results
IDENTICAL to the two-table operator while its corpus reads carry real
PartitionFilters — i.e. a new crawl batch dedupes against the kept corpus
without rescanning it.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from datascrapexter_spark.ops import dedup

CORPUS = [
    (1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    (2, "one two three four five six seven eight nine ten eleven twelve"),
    (3, "red orange yellow green blue indigo violet ultra infra deep"),
    (4, "north south east west up down left right forward backward"),
]
BATCH = [
    # exact copy of corpus doc 1 -> jaccard 1.0
    (101, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
    # near copy of corpus doc 2 (appended tail) -> 0.5 <= jaccard < 1
    (102, "one two three four five six seven eight nine ten eleven twelve tail1 tail2"),
    # novel -> no pair
    (103, "completely fresh document with entirely novel shingle content here"),
]


@pytest.fixture(scope="module")
def corpus(spark):
    return spark.createDataFrame(CORPUS, "doc_id long, text string")


@pytest.fixture(scope="module")
def batch(spark):
    return spark.createDataFrame(BATCH, "doc_id long, text string")


def _rows(df):
    return sorted((r["id_new"], r["id_corpus"], round(r["jaccard"], 6))
                  for r in df.collect())


def test_batch_pairs_semantics(corpus, batch):
    got = _rows(dedup.minhash_batch_pairs(
        corpus, batch, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.5))
    ids = [(a, b) for a, b, _ in got]
    assert (101, 1) in ids          # exact copy found
    assert (102, 2) in ids          # near copy found
    assert all(a != 103 for a, _ in ids)  # novel doc matches nothing
    exact = dict(((a, b), j) for a, b, j in got)
    assert exact[(101, 1)] == 1.0
    assert 0.5 <= exact[(102, 2)] < 1.0


def test_indexed_probe_identical_and_pruned(spark, corpus, batch, tmp_path):
    path = str(tmp_path / "mh_idx")
    dedup.write_minhash_index(corpus, path, "doc_id", "text",
                              num_hashes=16, bands=4, key_prefix_len=2,
                              n_shingle_shards=4)
    indexed = dedup.dedup_batch_indexed(
        spark, path, batch, "doc_id", "text", num_hashes=16, bands=4,
        threshold=0.5, key_prefix_len=2, n_shingle_shards=4)
    direct = dedup.minhash_batch_pairs(
        corpus, batch, "doc_id", "text", num_hashes=16, bands=4,
        threshold=0.5)
    assert _rows(indexed) == _rows(direct)

    # both corpus-side scans are partition-pruned: the buckets read
    # filters on (band, kp), the shingles read on shard
    plan = indexed._jdf.queryExecution().executedPlan().toString()
    filters = re.findall(r"PartitionFilters: \[([^\]]*)\]", plan)
    nonempty = [f for f in filters if f.strip()]
    assert any("band" in f and "kp" in f for f in nonempty), plan
    assert any("shard" in f for f in nonempty), plan


def test_indexed_probe_empty_batch(spark, corpus, tmp_path):
    path = str(tmp_path / "mh_idx_empty")
    dedup.write_minhash_index(corpus, path, "doc_id", "text",
                              num_hashes=16, bands=4)
    empty = spark.createDataFrame([], "doc_id long, text string")
    out = dedup.dedup_batch_indexed(spark, path, empty, "doc_id", "text")
    assert out.columns == ["id_new", "id_corpus", "jaccard"]
    assert out.count() == 0


def test_indexed_probe_all_novel(spark, corpus, tmp_path):
    """A batch whose band keys miss every corpus bucket: the candidate set
    is empty and the shingle table is never joined."""
    path = str(tmp_path / "mh_idx_novel")
    dedup.write_minhash_index(corpus, path, "doc_id", "text",
                              num_hashes=16, bands=4)
    novel = spark.createDataFrame(
        [(900, "zz yy xx ww vv uu tt ss rr qq pp oo nn mm")],
        "doc_id long, text string")
    out = dedup.dedup_batch_indexed(spark, path, novel, "doc_id", "text")
    assert out.count() == 0
    assert out.columns == ["id_new", "id_corpus", "jaccard"]


def test_neardup_ingest_stream_two_batches(spark, tmp_path):
    """Continuous ingest: micro-batch 1 seeds the index; micro-batch 2's
    dup-of-batch-1 and dup-of-itself are dropped, novels kept, and the
    index grows so batch 3 would see batch 2's docs too."""
    from datascrapexter_spark.streaming.events import neardup_ingest_stream
    import pyspark.sql.types as T

    land = tmp_path / "landing"
    land.mkdir()
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    ckpt = str(tmp_path / "ckpt")

    def run_batch(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(str(land))
        stream = (spark.readStream.schema(schema).parquet(str(land)))
        q = neardup_ingest_stream(
            stream, idx, out, ckpt, "doc_id", "text",
            num_hashes=16, bands=4, threshold=0.5,
            key_prefix_len=1, n_shingle_shards=4)
        q.awaitTermination(120)

    b1 = [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
          (2, "one two three four five six seven eight nine ten eleven")]
    run_batch(b1)
    kept1 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept1 == [1, 2]

    b2 = [
        (10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),  # dup of 1
        (11, "red orange yellow green blue indigo violet ultra infra"),    # novel
        (12, "red orange yellow green blue indigo violet ultra infra"),    # dup of 11 (same batch, min-id wins)
    ]
    run_batch(b2)
    kept2 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept2 == [1, 2, 11]

    # the index grew: a third batch duplicating doc 11 is also dropped
    b3 = [(20, "red orange yellow green blue indigo violet ultra infra")]
    run_batch(b3)
    kept3 = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept3 == [1, 2, 11]


def test_compact_minhash_index(spark, corpus, batch, tmp_path):
    """Append growth + at-least-once double-append healed: after compact,
    each partition cell holds ONE file, duplicate identity rows are gone,
    and probe results are unchanged."""
    import glob

    path = str(tmp_path / "mh_idx_compact")
    dedup.write_minhash_index(corpus, path, "doc_id", "text",
                              num_hashes=16, bands=4, key_prefix_len=1,
                              n_shingle_shards=4)
    # simulate an at-least-once replay: append the SAME corpus again
    dedup.write_minhash_index(corpus, path, "doc_id", "text",
                              num_hashes=16, bands=4, key_prefix_len=1,
                              n_shingle_shards=4, mode="append")
    before = _rows(dedup.dedup_batch_indexed(
        spark, path, batch, "doc_id", "text", num_hashes=16, bands=4,
        threshold=0.5, key_prefix_len=1, n_shingle_shards=4))

    def files_per_cell(table):
        cells = {}
        for f in glob.glob(f"{path}/{table}/**/*.parquet", recursive=True):
            cell = f[len(path) + len(table) + 2:].rsplit("/", 1)[0]
            cells[cell] = cells.get(cell, 0) + 1
        return cells

    assert any(v > 1 for v in files_per_cell("buckets").values())
    dedup.compact_minhash_index(spark, path)
    assert all(v == 1 for v in files_per_cell("buckets").values())
    assert all(v == 1 for v in files_per_cell("shingles").values())
    # duplicate identity rows healed
    n_bucket_rows = spark.read.parquet(f"{path}/buckets").count()
    n_distinct = (spark.read.parquet(f"{path}/buckets")
                  .select("cid", "band", "key").distinct().count())
    assert n_bucket_rows == n_distinct
    after = _rows(dedup.dedup_batch_indexed(
        spark, path, batch, "doc_id", "text", num_hashes=16, bands=4,
        threshold=0.5, key_prefix_len=1, n_shingle_shards=4))
    # dirty index emits one pair per duplicate identity row (documented
    # probe contract); compaction heals the duplication, same pair SET
    assert len(before) > len(set(before))
    assert after == sorted(set(before))
    assert len(after) == len(set(after))


def test_best_representative_decisions(spark):
    """Quality-weighted cluster winners: best score wins, ties fall back
    to min id, isolated docs always kept, losers leave via anti-join."""
    docs = spark.createDataFrame(
        [(1, 10), (2, 90), (3, 50),     # cluster {1,2,3}: 2 wins (score)
         (7, 40), (8, 40),              # cluster {7,8}: tie -> 7 wins
         (9, 5)],                       # isolated -> kept
        "doc_id long, score long")
    pairs = spark.createDataFrame(
        [(1, 2), (2, 3), (7, 8)], "id_a long, id_b long")
    dec = {r["doc_id"]: r for r in dedup.best_representative_decisions(
        docs, pairs, "score").collect()}
    assert [dec[i]["kept"] for i in (1, 2, 3, 7, 8, 9)] == [
        False, True, False, True, False, True]
    assert dec[2]["cluster_id"] == 1 and dec[8]["cluster_id"] == 7
    kept = dedup.dedup_best_representatives(docs, pairs, "score")
    assert sorted(r["doc_id"] for r in kept.collect()) == [2, 7, 9]


def test_ingest_stream_with_compaction_between_drains(spark, tmp_path):
    """The full continuous-pipeline loop: drain -> compact -> drain. The
    compacted index must keep answering probes correctly and the second
    drain's appends land in the compacted layout."""
    from datascrapexter_spark.streaming.events import neardup_ingest_stream
    import pyspark.sql.types as T

    land = tmp_path / "landing"
    land.mkdir()
    schema = T.StructType([T.StructField("doc_id", T.LongType()),
                           T.StructField("text", T.StringType())])
    idx, out, ckpt = (str(tmp_path / p) for p in ("idx", "out", "ckpt"))

    def drain(rows):
        spark.createDataFrame(rows, schema).coalesce(1).write.mode(
            "append").parquet(str(land))
        q = neardup_ingest_stream(
            spark.readStream.schema(schema).parquet(str(land)),
            idx, out, ckpt, "doc_id", "text",
            key_prefix_len=1, n_shingle_shards=4)
        q.awaitTermination(120)

    drain([(1, "alpha beta gamma delta epsilon zeta eta theta iota"),
           (2, "one two three four five six seven eight nine ten")])
    dedup.compact_minhash_index(spark, idx)
    drain([(10, "alpha beta gamma delta epsilon zeta eta theta iota"),  # dup of 1
           (11, "north south east west upward downward leftward rightward")])
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 11]
    dedup.compact_minhash_index(spark, idx)
    drain([(20, "north south east west upward downward leftward rightward")])  # dup of 11
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 11]


def test_capped_batch_pairs_catch_exact_duplicates(spark):
    """Round-5 advice regression: with max_shingle_doc_freq set, v1 capped
    only the corpus-side signatures, so a byte-identical batch copy could
    band differently and be missed. The cap must be symmetric (corpus
    doc-freq drop set applied to BOTH sides) and the capped index probe
    must equal the capped two-table operator."""
    # 'stop stop ...' shingles appear in every corpus doc -> df=4 > cap=2
    common = "stop one stop two stop three stop four stop five"
    corpus = spark.createDataFrame(
        [(i, f"{common} corpusdoc{i} uniq{i}a uniq{i}b uniq{i}c uniq{i}d "
              f"uniq{i}e uniq{i}f uniq{i}g uniq{i}h")
         for i in range(1, 5)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(101, f"{common} corpusdoc2 uniq2a uniq2b uniq2c uniq2d "
               "uniq2e uniq2f uniq2g uniq2h"),   # byte-identical to doc 2
         (103, "entirely novel words that share nothing with the corpus "
               "at all in any shingle")],
        "doc_id long, text string")

    got = _rows(dedup.minhash_batch_pairs(
        corpus, batch, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.5, max_shingle_doc_freq=2))
    exact = dict(((a, b), j) for a, b, j in got)
    assert (101, 2) in exact, "capped run missed an exact duplicate"
    assert exact[(101, 2)] == 1.0   # verify stays uncapped-exact
    assert all(a != 103 for a, _, _ in got)


def test_capped_index_probe_matches_capped_two_table(spark, tmp_path):
    common = "stop one stop two stop three stop four stop five"
    corpus = spark.createDataFrame(
        [(i, f"{common} corpusdoc{i} uniq{i}a uniq{i}b uniq{i}c uniq{i}d "
              f"uniq{i}e uniq{i}f uniq{i}g uniq{i}h")
         for i in range(1, 5)],
        "doc_id long, text string")
    batch = spark.createDataFrame(
        [(101, f"{common} corpusdoc2 uniq2a uniq2b uniq2c uniq2d "
               "uniq2e uniq2f uniq2g uniq2h"),
         (102, f"{common} corpusdoc3 uniq3a uniq3b uniq3c uniq3d "
               "uniq3e uniq3f uniq3g uniq3h extra tail words here now"),
         (103, "entirely novel words that share nothing with the corpus "
               "at all in any shingle")],
        "doc_id long, text string")
    idx = str(tmp_path / "capped_idx")
    dedup.write_minhash_index(corpus, idx, "doc_id", "text",
                              n=3, num_hashes=16, bands=4,
                              max_shingle_doc_freq=2)
    two_table = _rows(dedup.minhash_batch_pairs(
        corpus, batch, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.5, max_shingle_doc_freq=2))
    indexed = _rows(dedup.dedup_batch_indexed(
        spark, idx, batch, "doc_id", "text", n=3, num_hashes=16, bands=4,
        threshold=0.5))
    assert indexed == two_table
    assert any(a == 101 for a, _, _ in indexed)


def test_capped_index_append_refused(spark, tmp_path, corpus):
    with pytest.raises(ValueError, match="overwrite"):
        dedup.write_minhash_index(corpus, str(tmp_path / "x"), "doc_id",
                                  "text", max_shingle_doc_freq=2,
                                  mode="append")


def test_replayed_batch_is_exactly_once_even_before_compaction(spark,
                                                               tmp_path):
    """Round-5 verdict item #8: foreachBatch re-runs an uncommitted batch
    with the SAME batch_id after a restart. With epoch-partitioned
    dynamic-overwrite writes and probe-side epoch exclusion, a replay —
    even after a PARTIAL index write — must leave zero duplicate
    identity rows and the identical kept set, with no compaction run."""
    from datascrapexter_spark.ops import dedup
    from datascrapexter_spark.streaming.events import make_neardup_processor

    idx = str(tmp_path / "idx")
    out = str(tmp_path / "out")
    proc = make_neardup_processor(idx, out, str(tmp_path / "ckpt"),
                                  "doc_id", "text", num_hashes=16, bands=4,
                                  threshold=0.5, key_prefix_len=1,
                                  n_shingle_shards=4)
    b0 = spark.createDataFrame(
        [(1, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (2, "one two three four five six seven eight nine ten eleven")],
        "doc_id long, text string")
    proc(b0, 0)
    b1 = spark.createDataFrame(
        [(10, "alpha beta gamma delta epsilon zeta eta theta iota kappa"),
         (11, "red orange yellow green blue indigo violet ultra infra")],
        "doc_id long, text string")
    # simulate a crash mid-batch-1: the index write for epoch 1 ran
    # (partially or fully) but the batch never committed...
    proc(b1, 1)
    before = sorted(map(tuple, spark.read.parquet(f"{idx}/buckets")
                        .select("cid", "band", "key").collect()))
    # ...then the stream restarts and REPLAYS batch_id=1 verbatim
    proc(b1, 1)
    after = sorted(map(tuple, spark.read.parquet(f"{idx}/buckets")
                       .select("cid", "band", "key").collect()))
    assert after == before                      # no doubled identity rows
    assert len(after) == len(set(after))
    sh = [r["cid"] for r in spark.read.parquet(f"{idx}/shingles").collect()]
    assert sorted(sh) == sorted(set(sh))
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 11]                   # 10 is still a dup of 1
    # and the next batch probes the healthy index as usual
    b2 = spark.createDataFrame(
        [(20, "red orange yellow green blue indigo violet ultra infra")],
        "doc_id long, text string")
    proc(b2, 2)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(out).collect())
    assert kept == [1, 2, 11]


def test_stream_refuses_legacy_nonepoch_index(spark, corpus, tmp_path):
    from datascrapexter_spark.ops import dedup
    from datascrapexter_spark.streaming.events import make_neardup_processor

    idx = str(tmp_path / "legacy_idx")
    dedup.write_minhash_index(corpus, idx, "doc_id", "text",
                              key_prefix_len=1, n_shingle_shards=4)
    proc = make_neardup_processor(idx, str(tmp_path / "out"),
                                  str(tmp_path / "ckpt"))
    b = spark.createDataFrame([(50, "novel words entirely")],
                              "doc_id long, text string")
    with pytest.raises(ValueError, match="compact_minhash_index"):
        proc(b, 0)
    # compaction migrates the layout; the stream then proceeds
    dedup.compact_minhash_index(spark, idx)
    proc(b, 0)
    assert spark.read.parquet(str(tmp_path / "out")).count() == 1
