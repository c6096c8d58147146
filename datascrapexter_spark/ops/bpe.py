"""Distributed BPE merge induction — train a byte-pair-encoding merge
table over a web-text corpus (Sennrich et al. 2016, "Neural Machine
Translation of Rare Words with Subword Units", the tokenizer-training
step every LLM data pipeline runs before packing).

Spark-first shape (the whole point at 100 TB):

  * ONE corpus-width scan builds the word-frequency table — after that
    every merge round runs over the VOCAB-width table only (a web-scale
    corpus has billions of documents but a bounded distinct-word set;
    heaps-law sublinear). The corpus text is never rescanned.
  * Each round is one vocab-width groupBy (pair counts, map-side
    combinable) + a 1-row argmax collect. The collect is
    driver-bounded by contract (exactly one row per round, like
    similarity.train_centroids's k-row centroid collect).
  * Merge application is pure codegen: the word's symbol sequence is
    kept as a sentinel-delimited string (`' s1  s2  s3 '`, two spaces
    between symbols, one at each edge) and a merge (a, b) -> ab is ONE
    `replace(enc, ' a  b ', ' ab ')`. Both engines' replace() scans
    leftmost, non-overlapping, and resumes AFTER the replacement — on
    this encoding that is exactly the greedy leftmost merge order of
    the reference BPE implementation ('a a a a' -> 'aa aa', 'a a a' ->
    'aa a'), and the surrounding-space pattern can never match inside
    a token (tokens contain no spaces). DuckDB replays the identical
    recurrence with generated per-round CTEs (oracles._bpe_sql).

Determinism: ties on pair count break by (lhs ASC, rhs ASC) byte order;
the corpus is lowercased through the repo tokenizer; no RNG anywhere, so
any re-run — or an independent SQL engine — derives the same merge table.
Reference scope: the reference engine (Go) has no tokenizer training;
this is part of the LLM-training-data surface the graft adds on top
(like ops/mix.py, ops/sampling.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

from .dedup import tokens_col

MERGE_SCHEMA = StructType([
    StructField("merge_rank", IntegerType(), False),
    StructField("lhs", StringType(), False),
    StructField("rhs", StringType(), False),
    StructField("merged", StringType(), False),
    StructField("pair_count", LongType(), False),
])


def _char_symbols(word) -> F.Column:
    """Word -> array of single-character symbols (code-point split; the
    corpus contract is ASCII-safe — both engines split identically)."""
    return F.transform(
        F.sequence(F.lit(1), F.length(word)),
        lambda i: F.substring(word, i, F.lit(1)),
    )


def _encode(symbols) -> F.Column:
    """Symbols -> sentinel string: one space at each edge, two between.

    The double delimiter is load-bearing: consecutive occurrences of the
    same pair ('a a a a') do not share delimiter characters, so one
    non-overlapping replace() merges every disjoint occurrence in a
    single pass (a single-space encoding would consume the shared space
    and miss every second occurrence)."""
    return F.concat(F.lit(" "), F.array_join(symbols, "  "), F.lit(" "))


def _pair_counts(words: DataFrame) -> DataFrame:
    """(enc, freq) -> (lhs, rhs, cnt): adjacent-symbol pair frequencies.

    F.get (0-based) returns NULL out of range even under ANSI mode, so a
    single-symbol word contributes no pairs via the rhs-NULL filter —
    never an index error. Vocab-width: one map-side-combinable groupBy."""
    syms = F.split(F.trim(F.col("enc")), "  ")
    idx = F.sequence(F.lit(0), F.greatest(F.size(syms) - 2, F.lit(0)))
    pairs = F.filter(
        F.transform(idx, lambda i: F.struct(
            F.get(syms, i).alias("lhs"), F.get(syms, i + 1).alias("rhs"))),
        lambda p: p["rhs"].isNotNull(),
    )
    return (
        words.select(F.col("freq"), F.explode(pairs).alias("p"))
        .groupBy(F.col("p.lhs").alias("lhs"), F.col("p.rhs").alias("rhs"))
        .agg(F.sum("freq").alias("cnt"))
    )


def bpe_merges(df: DataFrame, text_col: str = "text",
               n_merges: int = 8) -> DataFrame:
    """Induce the first `n_merges` BPE merges over `df[text_col]`.

    Returns a DataFrame (merge_rank, lhs, rhs, merged, pair_count)
    ordered by merge_rank — the merge table a tokenizer would apply.
    Stops early (fewer rows) if the corpus runs out of adjacent pairs.

    Scale: one corpus scan -> persisted word-frequency table; rounds are
    vocab-width with a 1-row collect each. n_merges is the driver-side
    loop bound (a real vocab build runs ~30k rounds over a table this
    op keeps cluster-side; the per-round cost never touches the corpus).
    """
    spark: SparkSession = df.sparkSession
    wf = (
        df.select(F.explode(tokens_col(F.lower(F.col(text_col))))
                  .alias("word"))
        .groupBy("word").agg(F.count(F.lit(1)).alias("freq"))
    )
    # vocab-width (heaps-law bounded); every round re-reads this, never
    # the corpus
    base = wf.select(
        "freq", _encode(_char_symbols(F.col("word"))).alias("enc")).persist()
    words = base
    try:
        merges: list[tuple] = []
        for rank in range(1, n_merges + 1):
            top = (_pair_counts(words)
                   .orderBy(F.desc("cnt"), F.asc("lhs"), F.asc("rhs"))
                   .limit(1).collect())        # 1 row by contract
            if not top:
                break
            lhs, rhs, cnt = top[0]["lhs"], top[0]["rhs"], top[0]["cnt"]
            merges.append((rank, lhs, rhs, lhs + rhs, cnt))
            words = words.select(
                "freq",
                F.replace(
                    F.col("enc"),
                    F.lit(f" {lhs}  {rhs} "),
                    F.lit(f" {lhs}{rhs} "),
                ).alias("enc"))
        return spark.createDataFrame(merges, MERGE_SCHEMA)
    finally:
        base.unpersist()


def apply_merges(df: DataFrame, merges: list[tuple[str, str]],
                 text_col: str = "text",
                 out_col: str = "bpe_tokens") -> DataFrame:
    """Tokenize `df[text_col]` with a trained merge list: per word,
    char-split then replay every merge in rank order (the standard BPE
    encoder). Pure codegen — a chain of replace() Projects over the
    sentinel encoding, no Python, no shuffle; the merge list is a plan
    literal (merge tables are small by construction).

    Returns df + `out_col` array<string> of subword tokens in document
    order."""
    return df.withColumn(
        out_col,
        F.flatten(F.transform(
            tokens_col(F.lower(F.col(text_col))),
            lambda w: F.split(
                F.trim(_apply_enc_literal(w, merges)), "  "),
        )),
    )


def _apply_enc_literal(word, merges: list[tuple[str, str]]) -> F.Column:
    enc = _encode(_char_symbols(word))
    for lhs, rhs in merges:
        enc = F.replace(enc, F.lit(f" {lhs}  {rhs} "),
                        F.lit(f" {lhs}{rhs} "))
    return enc


def bpe_encode_counts(docs: DataFrame, id_col: str = "doc_id",
                      text_col: str = "text", n_merges: int = 8,
                      merges: list[tuple[str, str]] | None = None
                      ) -> DataFrame:
    """Per-document subword statistics under a trained BPE merge table —
    the token-accounting step between tokenizer training (bpe_merges)
    and budget carving / packing (ops/sampling.py), which both consume
    token counts, not raw text.

    If ``merges`` is None the table is trained on ``docs`` itself
    (n_merges rounds; the collect is <= n_merges rows by bpe_merges'
    contract). Encoding then runs at VOCAB width, not corpus width: one
    corpus scan builds the (doc, word, cnt) table, the distinct-word
    side gets the merge replace() chain applied once per word (pure
    codegen), and the word-keyed join back is vocab-bounded — a 100-TB
    corpus re-encodes each distinct word once, never each occurrence
    (the bpe_merges heaps-law argument again). Oracle: DuckDB replays
    training AND encoding on the carried word column
    (oracles._bpe_encode_sql).

    Returns (id_col, n_words, n_bpe_tokens) with 0/0 for empty docs —
    the empty->0 contract every counting operator follows.
    """
    if merges is None:
        merges = [(r["lhs"], r["rhs"])
                  for r in bpe_merges(docs, text_col, n_merges)
                  .select("lhs", "rhs").collect()]
    dw = (docs.select(F.col(id_col).alias("_id"),
                      F.explode(tokens_col(F.lower(F.col(text_col))))
                      .alias("word"))
          .groupBy("_id", "word").agg(F.count(F.lit(1)).alias("cnt")))
    vocab = (dw.select("word").distinct()
             .select("word",
                     F.size(F.split(
                         F.trim(_apply_enc_literal(F.col("word"), merges)),
                         "  ")).alias("n_syms")))
    per_doc = (dw.join(vocab, "word")
               .groupBy("_id")
               .agg(F.sum("cnt").alias("n_words"),
                    F.sum(F.col("cnt") * F.col("n_syms"))
                    .alias("n_bpe_tokens")))
    return (docs.select(F.col(id_col).alias("_id"))
            .join(per_doc, "_id", "left")
            .select(F.col("_id").alias(id_col),
                    F.coalesce("n_words", F.lit(0)).cast("long")
                    .alias("n_words"),
                    F.coalesce("n_bpe_tokens", F.lit(0)).cast("long")
                    .alias("n_bpe_tokens")))
