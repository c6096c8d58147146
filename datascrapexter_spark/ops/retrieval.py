"""BM25 full-text retrieval over a web-text corpus — integer-exact.

A crawl corpus is only useful if it can be queried; BM25 (Robertson &
Sparck Jones probabilistic model, the Lucene/Elasticsearch default) is
the standard lexical ranking function, and a training-data pipeline uses
the same scorer for retrieval-based quality auditing ("which kept pages
answer our probe queries") and RAG-corpus evaluation. The reference
engine (Go) stops at extraction and has no search surface; this module
is first-class extension surface like ops/graphrank.py.

Oracle discipline (the repo rule — see tfidf_topk / char_lm_surprisal):
every transcendental is replaced by a deterministic integer form so an
independent SQL engine reproduces each score bit-for-bit:

- idf: ``bitlen(N) - bitlen(df)`` — the bit-length integer log2(N/df)
  (within 1 of the Robertson idf's magnitude, same trick as the HLL rho
  and DSIR weights). Common terms (df within a power of two of N) score
  0, exactly the "stopwords contribute nothing" behavior BM25's idf is
  there for.
- tf normalization: the classical ``tf·(k1+1) / (tf + k1·(1-b+b·dl/avgdl))``
  held in milli-units with truncating division at each named step, so
  the value is a BIGINT both engines derive identically (reproducibility
  is the contract; the value is within 1/1000 of the float form).

Scale shape (100 TB corpus, handful-to-thousands of queries):

- ONE corpus scan builds the postings (term, doc, tf) + doc-length
  table; df and the avgdl constant aggregate from the postings — the
  text is never rescanned.
- the query side is tiny by definition, so the per-term idf table is
  shrunk to query terms FIRST (broadcast query ⋈ vocab-width df table),
  then broadcast into the postings scan: the corpus-width path sees one
  broadcast hash join and one (query, doc) score groupBy, nothing else.
- top-k per query is a rank window that Catalyst rewrites to
  WindowGroupLimit partial/final (the q55/q71 pattern) — never a global
  sort.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from .dedup import tokens_col


def _bits(c: Column) -> Column:
    """bitlen(c) for positive BIGINT c (bin() length, the q70 idiom)."""
    return F.length(F.bin(c)).cast("int")


def bm25_topk(docs: DataFrame, queries: DataFrame, k: int = 10,
              id_col: str = "doc_id", text_col: str = "text",
              query_id_col: str = "query_id", query_text_col: str = "qtext",
              k1_milli: int = 1200, b_milli: int = 750) -> DataFrame:
    """Top-k documents per query under integer-exact BM25.

    Returns (query_id, doc_id, score_milli, rank) — rank 1..k per query,
    ties broken by ascending doc id so the output is fully deterministic.
    Documents sharing no query term are absent (standard posting-driven
    evaluation: only matching docs are ever scored).

    score_milli = Σ_terms idf_bits(term) · tfnorm_milli(term, doc) with
      idf_bits      = bitlen(N) - bitlen(df)
      dl_ratio_m    = (1_000_000·dl)    div avgdl_milli
      inner_m       = (1000 - b) + (b·dl_ratio_m) div 1000
      denom_m       = 1000·tf + (k1·inner_m) div 1000
      tfnorm_milli  = (1000·tf·(k1 + 1000)) div denom_m
    (k1, b in milli; all quantities nonnegative, so Spark's ``div`` and
    DuckDB's ``//`` agree.) Query term multiplicity is ignored (distinct
    query terms — the short-query convention).
    """
    base = docs.select(F.col(id_col).alias("_id"),
                       tokens_col(F.lower(F.col(text_col))).alias("_toks"))
    postings = (base.select("_id", F.explode("_toks").alias("term"))
                .groupBy("term", "_id")
                .agg(F.count(F.lit(1)).alias("tf"))
                .persist())  # three consumers: df, lens, scoring join
    # doc length = Σ tf — derived from the postings, so the corpus text
    # is scanned exactly once (empty docs have no postings and no score)
    lens = postings.groupBy("_id").agg(F.sum("tf").alias("dl"))
    df_t = postings.groupBy("term").agg(F.count(F.lit(1)).alias("df"))
    # one row: corpus size + average doc length in milli-tokens
    consts = (lens.agg(F.count(F.lit(1)).alias("n_docs"),
                       F.sum("dl").alias("_a"))
              .select(F.lit(1).alias("_k"), "n_docs",
                      F.expr("(1000 * _a) div n_docs").alias("avgdl_m")))
    qterms = (queries.select(
        F.col(query_id_col).alias("query_id"),
        F.explode(F.array_distinct(
            tokens_col(F.lower(F.col(query_text_col))))).alias("term")))
    # query-term idf table: vocab-width df ⋈ broadcast(tiny queries),
    # then 1-row consts — result is <= |query terms| rows
    q_idf = (df_t.join(F.broadcast(qterms), "term")
             .withColumn("_k", F.lit(1))
             .join(F.broadcast(consts.select("_k", "n_docs")), "_k")
             .select("query_id", "term",
                     (_bits(F.col("n_docs")) - _bits(F.col("df")))
                     .alias("idf_bits")))
    scored = (postings
              .join(F.broadcast(q_idf), "term")
              .join(lens, "_id")
              .withColumn("_k", F.lit(1))
              .join(F.broadcast(consts.select("_k", "avgdl_m")), "_k")
              .withColumn("_dlr", F.expr("(1000000 * dl) div avgdl_m"))
              .withColumn("_inner",
                          F.lit(1000 - b_milli)
                          + F.expr(f"({b_milli} * _dlr) div 1000"))
              .withColumn("_denom", F.expr(
                  f"1000 * tf + ({k1_milli} * _inner) div 1000"))
              .withColumn("_c", F.expr(
                  f"idf_bits * ((1000 * tf * ({k1_milli} + 1000))"
                  f" div _denom)")))
    per_doc = (scored.groupBy("query_id", "_id")
               .agg(F.sum("_c").alias("score_milli")))
    w = Window.partitionBy("query_id").orderBy(
        F.desc("score_milli"), F.asc("_id"))
    return (per_doc.withColumn("rank", F.row_number().over(w))
            .filter(F.col("rank") <= k)
            .select("query_id", F.col("_id").alias(id_col),
                    F.col("score_milli").cast("long").alias("score_milli"),
                    "rank"))


def phrase_search(docs: DataFrame, phrase: str, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """Exact positional phrase query: occurrences of ``phrase`` as
    ADJACENT tokens (whitespace tokenization, lowercased), overlapping
    matches counted — the positional-postings companion to the q63
    inverted index and q88 BM25 (both term-frequency-only). Reference
    parity: DataScrapexter's extraction filters are substring/regex
    (internal/scraper/extractor.go); token-adjacency search is engine
    extension surface like bm25_topk above.

    Returns (doc_id, n_matches) for documents with >= 1 occurrence.

    Scale shape (100 TB corpus, phrase of n words):
    - ONE corpus scan; the posexplode Generate is immediately filtered
      by a LITERAL in-set of the n phrase words (codegen; no join, no
      broadcast, nothing Python), so everything downstream is sized by
      phrase-term frequency, not corpus width.
    - a token matching phrase position i at doc position p votes for a
      candidate start p - i (literal map term -> positions, exploded);
      a start with all n distinct votes is a match. Both aggregations
      key on (doc, start) / (doc) — the second is a shrink of the
      first, no corpus-width exchange anywhere.
    - repeated words inside the phrase are handled by the multi-vote
      map (each token instance votes once per slot it could fill), and
      (doc, start, slot) rows are unique by construction so a plain
      count equals the distinct-slot count, and overlapping
      occurrences stay exact.
    """
    words = phrase.lower().split()
    n = len(words)
    if n == 0:
        raise ValueError("empty phrase")
    slots: dict[str, list[int]] = {}
    for i, w in enumerate(words):
        slots.setdefault(w, []).append(i)
    # literal map word -> array of phrase slots it fills
    kv: list[Column] = []
    for w, idxs in slots.items():
        kv.append(F.lit(w))
        kv.append(F.array(*[F.lit(i) for i in idxs]))
    slot_map = F.create_map(*kv)
    tok = (docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col))))
        .alias("pos", "token"))
        .filter(F.col("token").isin(list(slots))))
    votes = tok.select(
        "_id", "pos",
        F.explode(F.element_at(slot_map, F.col("token"))).alias("slot"))
    # (doc, start, slot) rows are UNIQUE by construction (pos = start +
    # slot is determined, and a token matches a slot's word at most
    # once), so a plain count equals the distinct-slot count — dodging
    # count_distinct's extra Expand + exchange
    starts = (votes.select("_id", (F.col("pos") - F.col("slot"))
                           .alias("start"), "slot")
              .filter(F.col("start") >= 0)
              .groupBy("_id", "start")
              .agg(F.count(F.lit(1)).alias("n_slots")))
    return (starts.filter(F.col("n_slots") == n)
            .groupBy("_id")
            .agg(F.count(F.lit(1)).alias("n_matches"))
            .select(F.col("_id").alias(id_col), "n_matches"))


def proximity_search(docs: DataFrame, w1: str, w2: str, slop: int = 3,
                     id_col: str = "doc_id",
                     text_col: str = "text") -> DataFrame:
    """Ordered proximity query (Lucene ordered-span / NEAR semantics):
    per document, the number of position pairs where ``w2`` occurs
    AFTER ``w1`` within ``slop`` tokens (1 = adjacent). Sits between
    phrase_search (exact adjacency) and bm25_topk (bag-of-words) —
    the retrieval primitive for "terms co-occur closely" corpus audits.

    Returns (doc_id, n_pairs) for documents with >= 1 qualifying pair.

    Scale shape: ONE corpus scan; the posexplode Generate is cut by the
    two-word literal in-set (codegen — no join); a single (doc) groupBy
    collects the two sorted position arrays (occurrence-count-width),
    and the pair count is a higher-order-function fold over them —
    no self-join, no second exchange. Pair counting is O(occ1 x occ2)
    per doc but only over the two words' occurrences; the count is
    collect-order-independent, so the value is deterministic under any
    partitioning.
    """
    a, b = w1.lower(), w2.lower()
    if not a or not b:
        raise ValueError("both words required")
    if slop < 1:
        raise ValueError("slop must be >= 1")
    tok = (docs.select(
        F.col(id_col).alias("_id"),
        F.posexplode(tokens_col(F.lower(F.col(text_col))))
        .alias("pos", "token"))
        .filter(F.col("token").isin([a, b])))
    agg = tok.groupBy("_id").agg(
        F.sort_array(F.collect_list(
            F.when(F.col("token") == a, F.col("pos")))).alias("_p1"),
        F.sort_array(F.collect_list(
            F.when(F.col("token") == b, F.col("pos")))).alias("_p2"))
    n = F.aggregate(
        "_p2", F.lit(0),
        lambda acc, p2: acc + F.size(F.filter(
            F.col("_p1"),
            lambda p1: (p2 - p1 >= 1) & (p2 - p1 <= slop))))
    return (agg.select(F.col("_id").alias(id_col),
                       n.cast("long").alias("n_pairs"))
            .filter(F.col("n_pairs") > 0))
