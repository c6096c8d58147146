"""Round-5 batch 2: BM25 retrieval (q88), HITS hubs/authorities (q89),
fuzzy MinHash decontamination (q90), temperature mixture weights (q91),
BPE encode counts (q92)."""

from pyspark.sql import Row

from datascrapexter_spark.ops.bpe import bpe_encode_counts
from datascrapexter_spark.ops.dedup import fuzzy_decontaminate
from datascrapexter_spark.ops.graphrank import SCALE, hits_micro
from datascrapexter_spark.ops.mix import temperature_weights
from datascrapexter_spark.ops.retrieval import bm25_topk


def _docs(spark, rows):
    return spark.createDataFrame([Row(doc_id=i, text=t) for i, t in rows])


def _queries(spark, rows):
    return spark.createDataFrame([Row(query_id=i, qtext=t) for i, t in rows])


# ------------------------------------------------------------------- BM25


def test_bm25_rare_term_outranks_common(spark):
    # "zebra" appears in one doc, "the" in all four: the zebra doc must
    # top the ranking for a query containing both
    docs = _docs(spark, [(1, "the zebra grazes"),
                         (2, "the cat sat"),
                         (3, "the dog ran"),
                         (4, "the bird flew")])
    out = bm25_topk(docs, _queries(spark, [(0, "the zebra")]), k=4).collect()
    assert out[0]["doc_id"] == 1 and out[0]["rank"] == 1


def test_bm25_ubiquitous_term_scores_zero(spark):
    # df == n_docs -> idf_bits == 0 -> every match scores 0 (the
    # stopwords-contribute-nothing contract); all docs still returned
    docs = _docs(spark, [(1, "the cat"), (2, "the dog")])
    out = bm25_topk(docs, _queries(spark, [(0, "the")]), k=5).collect()
    assert sorted(r["doc_id"] for r in out) == [1, 2]
    assert all(r["score_milli"] == 0 for r in out)
    # zero ties break by ascending doc id
    assert [r["doc_id"] for r in sorted(out, key=lambda r: r["rank"])] == [1, 2]


def test_bm25_nonmatching_docs_absent_and_k_respected(spark):
    docs = _docs(spark, [(i, f"common word{i}") for i in range(1, 6)]
                 + [(9, "nothing shared here")])
    out = bm25_topk(docs, _queries(spark, [(0, "common")]), k=3).collect()
    assert len(out) == 3           # k caps the per-query list
    assert all(r["doc_id"] != 9 for r in out)  # no shared term -> absent


def test_bm25_multi_query_independent(spark):
    docs = _docs(spark, [(1, "alpha only"), (2, "beta only")])
    out = bm25_topk(docs, _queries(spark, [(0, "alpha"), (1, "beta")]),
                    k=10).collect()
    by_q = {(r["query_id"], r["doc_id"]) for r in out}
    assert by_q == {(0, 1), (1, 2)}


def test_bm25_shorter_doc_wins_at_equal_tf(spark):
    # same tf for the query term, shorter doc -> larger tf-norm -> higher
    # score (the b length penalty)
    docs = _docs(spark, [(1, "needle x"),
                         (2, "needle " + " ".join(f"pad{i}" for i in range(20))),
                         (3, "filler a"), (4, "filler b")])  # keep df < n
    out = sorted(bm25_topk(docs, _queries(spark, [(0, "needle")]), k=2)
                 .collect(), key=lambda r: r["rank"])
    assert [r["doc_id"] for r in out] == [1, 2]
    assert out[0]["score_milli"] > out[1]["score_milli"]


# ------------------------------------------------------------------- HITS


def _edges(spark, pairs):
    return spark.createDataFrame([Row(src=s, dst=d) for s, d in pairs])


def test_hits_one_iteration_exact_integers(spark):
    # h1 -> {a1, a2}, h2 -> a1.  Hand-replay of one iteration:
    #   araw: a1 = 2*SCALE, a2 = SCALE; amax = 2*SCALE
    #   auth: a1 = SCALE, a2 = SCALE*SCALE div 2*SCALE = SCALE div 2
    #   hraw: h1 = SCALE + SCALE div 2, h2 = SCALE; hmax = hraw(h1)
    #   hub:  h1 = SCALE, h2 = SCALE*SCALE div (3*SCALE div 2)
    nodes = spark.createDataFrame([Row(node=n) for n in
                                   ["h1", "h2", "a1", "a2"]])
    out = {r["node"]: r for r in hits_micro(
        nodes, _edges(spark, [("h1", "a1"), ("h1", "a2"), ("h2", "a1")]),
        iters=1).collect()}
    half = SCALE // 2
    assert out["a1"]["auth_micro"] == SCALE
    assert out["a2"]["auth_micro"] == (SCALE * SCALE) // (2 * SCALE)
    assert out["h1"]["hub_micro"] == SCALE
    assert out["h2"]["hub_micro"] == (SCALE * SCALE) // (SCALE + half)
    # pure hubs have no in-links (auth 0); pure authorities no out-links
    assert out["h1"]["auth_micro"] == 0 and out["h2"]["auth_micro"] == 0
    assert out["a1"]["hub_micro"] == 0 and out["a2"]["hub_micro"] == 0


def test_hits_max_normalized_and_total(spark):
    # every node present; scores within [0, SCALE]; the max of each
    # column is exactly SCALE (max-normalization invariant)
    nodes = spark.createDataFrame([Row(node=i) for i in range(6)])
    edges = _edges(spark, [(i, (i * 2 + 1) % 6) for i in range(6)]
                   + [(i, (i + 3) % 6) for i in range(6)])
    rows = hits_micro(nodes, edges, iters=3).collect()
    assert len(rows) == 6
    assert max(r["hub_micro"] for r in rows) == SCALE
    assert max(r["auth_micro"] for r in rows) == SCALE
    assert all(0 <= r["hub_micro"] <= SCALE
               and 0 <= r["auth_micro"] <= SCALE for r in rows)


def test_hits_empty_edges_all_zero(spark):
    nodes = spark.createDataFrame([Row(node=i) for i in range(3)])
    empty = _edges(spark, [(0, 0)]).filter("src < 0")
    rows = hits_micro(nodes, empty, iters=2).collect()
    assert len(rows) == 3
    assert all(r["hub_micro"] == 0 and r["auth_micro"] == 0 for r in rows)


# ---------------------------------------------------- fuzzy decontamination


def test_fuzzy_decon_exact_copy_caught_novel_missed(spark):
    corpus = _docs(spark, [
        (1, "the quick brown fox jumps over the lazy dog again and again"),
        (2, "completely unrelated corpus text about databases and joins"),
    ])
    bench = _docs(spark, [
        (100, "the quick brown fox jumps over the lazy dog again and again"),
        (101, "wholly novel benchmark question nothing in common at all"),
    ])
    out = fuzzy_decontaminate(corpus, bench, "doc_id", "text",
                              threshold=0.5).collect()
    assert {(r["doc_id"], r["benchmark_id"]) for r in out} == {(1, 100)}
    assert out[0]["jaccard"] == 1.0


def test_fuzzy_decon_threshold_gates_verified_jaccard(spark):
    # candidate pair via a shared 30-word prefix (band match), but the
    # verified exact jaccard < a strict threshold -> dropped
    base = " ".join(f"tok{i}" for i in range(30))
    corpus = _docs(spark, [(1, base)])
    bench = _docs(spark, [(7, base + " tail only the benchmark has")])
    hit = fuzzy_decontaminate(corpus, bench, "doc_id", "text",
                              threshold=0.3).collect()
    miss = fuzzy_decontaminate(corpus, bench, "doc_id", "text",
                               threshold=0.99).collect()
    assert [(r["doc_id"], r["benchmark_id"]) for r in hit] == [(1, 7)]
    assert 0.3 <= hit[0]["jaccard"] < 0.99
    assert miss == []


def test_fuzzy_decon_separate_bench_id_column(spark):
    corpus = _docs(spark, [(1, "shared text body for the id test")])
    bench = spark.createDataFrame(
        [Row(item_id=42, text="shared text body for the id test")])
    out = fuzzy_decontaminate(corpus, bench, "doc_id", "text",
                              bench_id_col="item_id").collect()
    assert [(r["doc_id"], r["benchmark_id"]) for r in out] == [(1, 42)]


# ---------------------------------------------------- temperature mixing


def test_temperature_weights_exact_integer_math(spark):
    # 100 head docs vs 4 tail docs: weights isqrt -> 10 vs 2,
    # shares 10/12 and 2/12 in ppm with truncation, targets/repeat in
    # the same truncating integer chain the docstring documents
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="head") for i in range(100)]
        + [Row(doc_id=100 + i, source="tail") for i in range(4)])
    out = {r["source"]: r for r in
           temperature_weights(docs, "source", "doc_id").collect()}
    assert out["head"]["n_docs"] == 100 and out["head"]["weight"] == 10
    assert out["tail"]["n_docs"] == 4 and out["tail"]["weight"] == 2
    assert out["head"]["share_ppm"] == (1_000_000 * 10) // 12
    assert out["tail"]["share_ppm"] == (1_000_000 * 2) // 12
    assert out["head"]["target_n"] == (104 * out["head"]["share_ppm"]) // 1_000_000
    assert out["tail"]["target_n"] == (104 * out["tail"]["share_ppm"]) // 1_000_000
    assert out["tail"]["repeat_milli"] == (1000 * out["tail"]["target_n"]) // 4


def test_temperature_weights_flattens_toward_tail(spark):
    # sqrt scaling: the tail's share_ppm strictly exceeds its
    # proportional share; the head's is strictly below
    docs = spark.createDataFrame(
        [Row(doc_id=i, source="head") for i in range(400)]
        + [Row(doc_id=400 + i, source="tail") for i in range(4)])
    out = {r["source"]: r for r in
           temperature_weights(docs, "source", "doc_id").collect()}
    assert out["tail"]["share_ppm"] > (1_000_000 * 4) // 404
    assert out["head"]["share_ppm"] < (1_000_000 * 400) // 404
    # upsampled tail repeats > 1000 milli; downsampled head < 1000
    assert out["tail"]["repeat_milli"] > 1000
    assert out["head"]["repeat_milli"] < 1000


# ------------------------------------------------------------- BPE encode


def test_bpe_encode_counts_trained_merge_applied(spark):
    # 'ab' dominates -> first merge is (a, b); 'ab' encodes to 1 symbol,
    # 'cd' stays 2 ('c d' pair is seen once, below the ab count)
    docs = _docs(spark, [(1, "ab ab ab"), (2, "ab cd"), (3, "")])
    out = {r["doc_id"]: r for r in
           bpe_encode_counts(docs, n_merges=1).collect()}
    assert out[1]["n_words"] == 3 and out[1]["n_bpe_tokens"] == 3
    assert out[2]["n_words"] == 2 and out[2]["n_bpe_tokens"] == 1 + 2
    # empty docs report 0/0 (the empty->0 contract)
    assert out[3]["n_words"] == 0 and out[3]["n_bpe_tokens"] == 0


def test_bpe_encode_counts_explicit_merges_skip_training(spark):
    docs = _docs(spark, [(1, "abc abc xyz")])
    out = {r["doc_id"]: r for r in
           bpe_encode_counts(docs, merges=[("a", "b"), ("ab", "c")])
           .collect()}
    # 'abc' -> ab -> abc = 1 symbol; 'xyz' untouched = 3 symbols
    assert out[1]["n_words"] == 3
    assert out[1]["n_bpe_tokens"] == 1 + 1 + 3


def test_bpe_encode_counts_zero_merges_is_char_count(spark):
    docs = _docs(spark, [(1, "hi there")])
    out = bpe_encode_counts(docs, merges=[]).collect()[0]
    assert out["n_words"] == 2
    assert out["n_bpe_tokens"] == len("hi") + len("there")
