"""Training-mix construction: the "carve a clean N-token mix out of a raw
crawl corpus" call, composing the pipeline's own operators in the standard
order — quality gate → encoding-noise gate → language filter → domain
blocklist → exact dedup → language rebalance → token-budget cut.

Every stage is an existing, individually oracle-gated operator (quality /
noise: textstats; dedup: ops.dedup.exact_dedup; rebalance + budget:
ops.sampling), composed into ONE lazy plan with per-stage counters riding
the same action via DataFrame.observe (zero extra passes — the
ops.pipeline discipline). Every decision is content-hash-deterministic, so
the identical mix comes out of every re-run, resume, or independent SQL
replay.

Scale: the gates are pure codegen filters that push into the scan; dedup
is one digest-keyed shuffle; the budget cut is the distributed prefix sum
of take_token_budget (driver sees <= n_buckets rows). Nothing here adds a
shuffle beyond its parts.
"""

from __future__ import annotations

from dataclasses import dataclass, field

from pyspark.sql import DataFrame, Observation
from pyspark.sql import functions as F

from .dedup import exact_dedup
from .sampling import take_token_budget, hash_unit_col
from .textstats import (
    encoding_noise_cols,
    fingerprint_col,
    lang_id_col,
    quality_columns,
    token_count_col,
)


@dataclass
class MixConfig:
    min_quality_ppm: int = 500_000          # quality gate (0 disables)
    max_noise_ppm: int | None = 10_000      # encoding-noise gate
    langs: tuple[str, ...] | None = ("en",)  # predicted-language filter
    blocked_domains: tuple[str, ...] | None = None  # needs domain_col
    domain_col: str | None = None
    dedup: bool = True                      # exact content dedup
    drop_surprisal_tail: bool = False       # CCNet gate: drop the worst
                                            # surprisal tertile (q85)
    dsir_target: DataFrame | None = None    # DSIR selection target corpus
    min_dsir_millibits: int = 0             # keep docs with
                                            # avg_millibits >= this (q83)
    lang_rates: dict[str, float] = field(default_factory=dict)
    default_lang_rate: float = 1.0
    token_budget: int | None = None
    sample_seed: int = 1
    budget_seed: int = 4


@dataclass
class MixRun:
    df: DataFrame                           # the kept mix (lazy)
    observation: Observation
    stages: list[str] = field(default_factory=list)  # gates that ran, in order

    def manifest(self) -> dict[str, int]:
        """Per-stage survivor counts + kept token total. Triggers the
        plan if no action has run yet (observe values materialize with
        the first action over the observed plan)."""
        self.df.count()
        return {k: int(v) for k, v in self.observation.get.items()}


def build_training_mix(docs: DataFrame, cfg: MixConfig | None = None,
                       id_col: str = "doc_id",
                       text_col: str = "text") -> MixRun:
    """Compose the mix. Returns the kept docs with (lang_pred, q_ppm,
    n_tokens, cum_tokens) decision columns, plus an Observation carrying
    per-stage survivor counts.

    Stage order is the conventional one (cheap codegen gates first so
    the digest shuffle and the budget window see the smallest possible
    corpus); every stage is skippable via config, mirroring the
    reference pipeline's optional components (pipeline.go:115-215).
    """
    cfg = cfg or MixConfig()
    qc = quality_columns(text_col)
    q_ppm = F.round(qc["quality_score"] * 1_000_000).cast("long")
    d = docs.withColumn("q_ppm", q_ppm) \
            .withColumn("lang_pred", lang_id_col(text_col)) \
            .withColumn("n_tokens", token_count_col(text_col).cast("long"))

    stages = []
    if cfg.min_quality_ppm:
        d = d.filter(F.col("q_ppm") >= cfg.min_quality_ppm)
        stages.append("after_quality")
    if cfg.max_noise_ppm is not None:
        noise = encoding_noise_cols(text_col)["noise_ppm"]
        d = d.filter(noise <= cfg.max_noise_ppm)
        stages.append("after_noise")
    if cfg.langs is not None:
        d = d.filter(F.col("lang_pred").isin(list(cfg.langs)))
        stages.append("after_lang")
    if cfg.blocked_domains:
        if not cfg.domain_col:
            raise ValueError("blocked_domains requires domain_col")
        bl = d.sparkSession.createDataFrame(
            [(x,) for x in sorted(set(cfg.blocked_domains))],
            f"{cfg.domain_col} string")
        d = d.join(F.broadcast(bl), cfg.domain_col, "left_anti")
        stages.append("after_blocklist")
    if cfg.dedup:
        d = exact_dedup(d, [text_col], order_col=id_col)
        stages.append("after_dedup")
    if cfg.drop_surprisal_tail:
        # CCNet's perplexity gate: keep head+middle tertiles. The bucket
        # join is aggregate-width (value-histogram cutoffs broadcast back
        # — surprisal_buckets' contract), so this adds one doc-keyed join
        # on the already-gated survivor set, not a corpus re-scan.
        from .textstats import surprisal_buckets

        kept = (surprisal_buckets(d, id_col, text_col)
                .filter(F.col("bucket") != "tail")
                .select(id_col))
        d = d.join(kept, id_col, "left_semi")
        stages.append("after_surprisal")
    if cfg.dsir_target is not None:
        # DSIR selection: keep docs at least as target-like as the
        # threshold. Model tables are <= n_buckets rows (broadcast), the
        # weight join is doc-keyed on the survivor set.
        w = (dsir_weights(d, cfg.dsir_target, id_col, text_col)
             .filter(F.col("avg_millibits") >= cfg.min_dsir_millibits)
             .select(id_col))
        d = d.join(w, id_col, "left_semi")
        stages.append("after_dsir")
    if cfg.lang_rates or cfg.default_lang_rate != 1.0:
        rate = F.lit(float(cfg.default_lang_rate))
        for value, r in sorted(cfg.lang_rates.items()):
            rate = F.when(F.col("lang_pred") == value,
                          F.lit(float(r))).otherwise(rate)
        d = d.filter(hash_unit_col(id_col, cfg.sample_seed) < rate)
        stages.append("after_rebalance")
    if cfg.token_budget is not None:
        d = take_token_budget(d, cfg.token_budget, id_col,
                              tokens_col="n_tokens", seed=cfg.budget_seed)
        stages.append("after_budget")
    else:
        d = d.withColumn("cum_tokens", F.lit(None).cast("long"))

    obs = Observation("mix_manifest")
    d = d.observe(obs,
                  F.count(F.lit(1)).alias("kept_docs"),
                  F.coalesce(F.sum("n_tokens"), F.lit(0)).alias("kept_tokens"))
    return MixRun(df=d, observation=obs, stages=stages)


def corpus_report(docs: DataFrame, id_col: str = "doc_id",
                  text_col: str = "text") -> DataFrame:
    """One-call corpus health summary — the numbers an operator reads
    before and after a mix build: volume, exact-duplication, language
    split, quality split, token totals. Returns a tall (metric, value)
    table of exact BIGINTs.

    Scale: one pass builds the per-doc feature projection (all codegen);
    the report is a single global aggregate of it (count/sum/countDistinct
    — two-phase, map-side partials), then a constant-width unpivot. No
    joins, no windows; at 100 TB this costs one scan + one tiny exchange.
    """
    qc = quality_columns(text_col)
    q_ppm = F.round(qc["quality_score"] * 1_000_000).cast("long")
    per = docs.select(
        F.col(id_col),
        q_ppm.alias("q"),
        lang_id_col(text_col).alias("lang"),
        token_count_col(text_col).cast("long").alias("toks"),
        fingerprint_col(text_col).alias("fp"),
        encoding_noise_cols(text_col)["noise_ppm"].alias("noise"),
    )
    agg = per.agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.countDistinct("fp").alias("n_distinct"),
        F.coalesce(F.sum("toks"), F.lit(0)).alias("total_tokens"),
        F.coalesce(F.sum(F.when(F.col("q") < 500_000, 1).otherwise(0)),
                   F.lit(0)).alias("n_low_quality"),
        F.coalesce(F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)),
                   F.lit(0)).alias("n_en"),
        F.coalesce(F.sum(F.when(F.col("lang") == "unknown", 1).otherwise(0)),
                   F.lit(0)).alias("n_lang_unknown"),
        F.coalesce(F.sum(F.when(F.col("noise") > 1000, 1).otherwise(0)),
                   F.lit(0)).alias("n_noisy"),
    ).select(
        F.col("n_docs").cast("long").alias("n_docs"),
        (F.col("n_docs") - F.col("n_distinct")).cast("long")
        .alias("n_exact_dup_docs"),
        F.col("total_tokens").cast("long").alias("total_tokens"),
        F.col("n_low_quality").cast("long").alias("n_low_quality"),
        F.col("n_en").cast("long").alias("n_en"),
        F.col("n_lang_unknown").cast("long").alias("n_lang_unknown"),
        F.col("n_noisy").cast("long").alias("n_noisy"),
    )
    metrics = ["n_docs", "n_exact_dup_docs", "total_tokens",
               "n_low_quality", "n_en", "n_lang_unknown", "n_noisy"]
    pairs = []
    for m in metrics:
        pairs.extend([F.lit(m), F.col(m)])
    return (agg.select(F.explode(F.create_map(*pairs))
                       .alias("metric", "value"))
            .select("metric", F.col("value").cast("long").alias("value")))


def dsir_weights(docs: DataFrame, target: DataFrame,
                 id_col: str = "doc_id", text_col: str = "text",
                 n_buckets: int = 4096) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, arXiv:2302.03169):
    score each raw document by how target-like its hashed n-gram
    feature distribution is — the data-selection step that lets a
    100-TB crawl be subsampled toward a quality target corpus
    (Wikipedia/books) before training.

    DSIR's weight is log p_target(doc) - log p_raw(doc) under
    bag-of-hashed-ngram unigram+bigram models. The transcendental is
    replaced by the repo's bit-length integer (char_lm_surprisal's
    rule: bitlen(c) is within 1 of log2(c)+1), so per-bucket score =
    (bitlen(c_t) - bitlen(T_t)) - (bitlen(c_r) - bitlen(T_r)) and the
    per-doc weight is a BIGINT an independent SQL engine reproduces
    bit-for-bit. Buckets absent from the target model get bitlen 0 —
    the maximum-penalty smoothing. avg_millibits uses the
    truncate-toward-zero division (x - x % n) / n, identical in Spark
    and DuckDB for NEGATIVE weights too (both use sign-of-dividend
    remainder; DuckDB's `//` would floor and diverge).

    Scale shape: feature hashing (md5-slice % n_buckets) is pure
    codegen in the scan; scoring is per OCCURRENCE (Σ _rel over
    occurrences ≡ Σ tf·_rel — identical integers), so no corpus-width
    (doc, bucket) aggregate exists: the raw model collapses to
    bucket-width map-side and the per-doc groupBy ships doc-width
    partials. BOTH models aggregate to <= n_buckets rows, so the
    scoring join is a broadcast of a few-thousand-row table — the
    corpus is scanned once for features and once (the target side scans
    its own corpus once). Empty docs report n_feats 0, weight 0.

    Returns (id_col, n_feats, llr_bits, avg_millibits).
    """
    from .dedup import tokens_col

    def feats(df: DataFrame, idc: str) -> DataFrame:
        toks = tokens_col(F.lower(F.col(text_col)))
        uni = F.transform(toks, lambda t: F.concat(F.lit("u:"), t))
        n = F.size(toks)
        bi = F.when(
            n >= 2,
            F.zip_with(
                F.slice(toks, 1, n - 1), F.slice(toks, 2, n - 1),
                lambda a, b: F.concat(F.lit("b:"), a, F.lit(" "), b)),
        ).otherwise(F.array().cast("array<string>"))
        h = F.conv(F.substring(F.md5(F.col("_feat")), 1, 15), 16, 10) \
            .cast("long")
        return (df.select(F.col(idc).alias("_id"),
                          F.explode(F.concat(uni, bi)).alias("_feat"))
                .select("_id", F.pmod(h, F.lit(n_buckets)).alias("bucket")))

    # r06: occurrence-level scoring (the q70 transformation) — Σ_rel over
    # occurrences ≡ Σ tf·_rel, so the corpus-width (doc, bucket) tf
    # aggregate and its exchange are gone: the raw model collapses to
    # bucket-width map-side and the per-doc groupBy ships doc-width
    # partials. The occurrence table persists for its two consumers.
    occ = feats(docs, id_col).persist()
    raw = occ.groupBy("bucket").agg(F.count(F.lit(1)).alias("cr"))
    tgt = (feats(target, id_col)
           .groupBy("bucket").agg(F.count(F.lit(1)).alias("ct")))
    bits = lambda c: F.length(F.bin(c)).cast("int")  # noqa: E731
    # bitlen(0) must be 0 (bin(0) is "0", length 1 — the q70 coalesce
    # lesson), so the absent-bucket penalty is explicit, not bits(0)
    tbits = F.when(F.col("ct").isNull(), F.lit(0)) \
        .otherwise(bits(F.col("ct")))
    model = (raw.join(tgt, "bucket", "left")
             .select("bucket", (tbits - bits(F.col("cr"))).alias("_rel")))
    totals = (raw.agg(bits(F.sum("cr")).alias("_bits_r"))
              .withColumn("_k", F.lit(1))
              .join(tgt.agg(bits(F.sum("ct")).alias("_bits_t"))
                    .withColumn("_k", F.lit(1)), "_k"))
    per_doc = (occ.join(F.broadcast(model), "bucket")
               .groupBy("_id")
               .agg(F.count(F.lit(1)).alias("n_feats"),
                    F.sum(F.col("_rel")).alias("_wrel")))
    spine = docs.select(F.col(id_col).alias("_id")) \
        .withColumn("_k", F.lit(1))
    joined = (spine.join(per_doc, "_id", "left")
              .join(F.broadcast(totals), "_k"))
    llr = (F.col("_wrel")
           + F.col("n_feats") * (F.col("_bits_r") - F.col("_bits_t")))
    scaled = F.lit(1000) * llr
    avg = ((scaled - scaled % F.col("n_feats")) / F.col("n_feats")) \
        .cast("long")
    return joined.select(
        F.col("_id").alias(id_col),
        F.coalesce("n_feats", F.lit(0)).cast("long").alias("n_feats"),
        F.coalesce(llr, F.lit(0)).cast("long").alias("llr_bits"),
        F.coalesce(avg, F.lit(0)).cast("long").alias("avg_millibits"))


def temperature_weights(docs: DataFrame, domain_col: str = "source",
                        id_col: str = "doc_id") -> DataFrame:
    """Temperature-based mixture rebalancing at T=2 (sqrt scaling) — the
    multilingual/multi-domain upsampling rule (mT5/PaLM data mixing:
    sample domain d with probability ∝ n_d^(1/T)), which lifts
    small-but-valuable domains without letting the head domains dominate
    a training mix the way proportional sampling does.

    T=2 keeps the repo's integer-exact oracle discipline without a
    transcendental: w_d = floor(sqrt(n_d)). IEEE-754 sqrt is correctly
    rounded in both engines and sqrt(non-square) is irrational, so
    floor(sqrt(n)) == isqrt(n) exactly for n < 2^40 (documented bound —
    far above any per-domain document count here; beyond it, compute
    isqrt via one Newton step on the float seed). Shares/targets use
    truncating division on nonnegative values, identical in Spark
    (``div``) and DuckDB (``//``).

    Scale shape: ONE domain-keyed corpus aggregate (map-side
    combinable); everything after runs on the domains-width table with a
    broadcast 1-row totals join. Returns one row per domain:
      (domain_col, n_docs, weight, share_ppm, target_n, repeat_milli)
    where target_n = total·share_ppm div 1e6 is the post-rebalance
    document budget and repeat_milli = 1000·target_n div n_docs is the
    up/down-sampling factor a sampler (ops/sampling.py) applies.
    """
    per = (docs.groupBy(F.col(domain_col).alias("_dom"))
           .agg(F.count(F.lit(1)).alias("n_docs"))
           .withColumn("weight",
                       F.floor(F.sqrt(F.col("n_docs"))).cast("long")))
    totals = (per.agg(F.sum("n_docs").alias("n_total"),
                      F.sum("weight").alias("w_total"))
              .withColumn("_k", F.lit(1)))
    return (per.withColumn("_k", F.lit(1))
            .join(F.broadcast(totals), "_k")
            .select(
                F.col("_dom").alias(domain_col),
                F.col("n_docs").cast("long").alias("n_docs"),
                "weight",
                F.expr("(1000000 * weight) div w_total")
                .cast("long").alias("share_ppm"),
                F.expr("(n_total * ((1000000 * weight) div w_total))"
                       " div 1000000").cast("long").alias("target_n"),
                F.expr("(1000 * ((n_total * ((1000000 * weight)"
                       " div w_total)) div 1000000)) div n_docs")
                .cast("long").alias("repeat_milli")))
