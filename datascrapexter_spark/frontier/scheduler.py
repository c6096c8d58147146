"""The crawl-round driver loop: schedule -> fetch -> extract -> dedup ->
checkpoint, generalized from the reference's strictly-sequential page loop
(/root/reference/internal/scraper/engine.go:678-804) to a batch-incremental
frontier at cluster scale (north_rule).

Round r (all DataFrame ops; the only Python crossings are the Arrow-batched
UDFs for robots prefix-match, URL canonicalization, HTML link extraction,
and Bloom probe):

 1. pending frontier rows, robots-filtered (broadcast rules; denied ->
    'blocked' — compliance_test.go:226-238 semantics);
 2. per-domain budgets from the deterministic politeness recurrence
    (politeness.py; ratelimiter.go semantics evaluated round-wise);
 3. salted two-phase top-k picks this round's fetch set with a
    deterministic total order (priority DESC, round_added, url_hash);
 4. "fetch" = left equi-join against the canonical pages table (the
    sandbox stand-in for the HTTP fetch — BASELINE.json input_hint);
    misses re-enqueue with attempts+1 (client.go:311-322 retry semantics,
    deterministic), up to max_attempts;
 5. out-links -> canonicalize -> Bloom prefilter (definitely-new skips
    the exact check) -> exact check vs the bucketed-at-rest url_seen
    (seen ⋉ probe semi, then probe ▷ dupes anti — the seen set is
    scanned, never exchanged or hash-built) -> append frontier;
 6. checkpoint everything to snapshot tables + commit the round journal
    (crash mid-round resumes from the last committed round).

Identity for dedup is xxhash64(url_canon) per north_rule; the sequential
oracle simulator (tests/crawl_oracle.py) reproduces every step bit-for-bit,
which is how crawl order + seen set are verified.

Frontier state is INCREMENTAL — per-round I/O is O(this round's work),
never O(total frontier) (the reference's page loop touches only the active
page, engine.go:720-792; at 10^10 URLs a full-frontier rewrite per round
would dominate every other cost):

  * `frontier`         append-only base; every row is written with
                       state='pending' (seeds at init, new URLs per round);
  * `frontier_updates` append-only state-transition deltas
                       (url_hash, state, attempts, round); readers keep
                       the latest delta per url_hash (max round wins);
  * `frontier_archive` terminal rows (done/failed/blocked*), appended once
                       at transition time and never touched again.

Reading the pending set = base ⟕ latest-deltas (the deltas span at most
`frontier_compact_every` rounds of scheduled work — a key-width join far
below frontier size; AQE broadcasts it when small), filtered to 'pending'.
Every `frontier_compact_every` rounds the reconciled pending set is folded
back into the base and the deltas truncate, bounding reconcile depth. The
full frontier (fixtures, resume) = reconciled-pending ∪ archive.
"""

from __future__ import annotations

import time
from dataclasses import dataclass, field as dc_field
from typing import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T

from ..functions.urlnorm import (
    canonicalize_struct_udf,
    normalize_url_udf,
    registered_domain,
)
from ..functions.urlnorm import host_col
from .bloom import BloomShards, build_bitset, probe_maybe_seen_df
from .cuckoo import CuckooShards
from .cuckoo import build_shard_blob as cuckoo_build_blob
from .cuckoo import probe_maybe_seen_cuckoo_df
from .links import extract_links_df
from .pagination import PaginationSpec, extract_next_urls_df
from .politeness import (
    PolitenessConfig,
    interval_multiplier,
    next_consec_errors,
    schedule_topk,
    strategy_tokens_from_state,
    tokens_per_round,
)
from .robots import RobotsIndex, allowed_rules_col, rules_array_df
from .state import StateStore

FRONTIER_SCHEMA = T.StructType([
    T.StructField("url_canon", T.StringType()),
    T.StructField("url_hash", T.LongType()),
    T.StructField("host", T.StringType()),
    T.StructField("domain", T.StringType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("attempts", T.IntegerType()),
    T.StructField("round_added", T.IntegerType()),
    T.StructField("state", T.StringType()),
])

FRONTIER_UPDATES_SCHEMA = T.StructType([
    T.StructField("url_hash", T.LongType()),
    T.StructField("state", T.StringType()),
    T.StructField("attempts", T.IntegerType()),
    T.StructField("round", T.IntegerType()),
])

CRAWL_LOG_SCHEMA = T.StructType([
    T.StructField("round", T.IntegerType()),
    T.StructField("domain", T.StringType()),
    T.StructField("seq", T.IntegerType()),
    T.StructField("url_canon", T.StringType()),
    T.StructField("url_hash", T.LongType()),
    T.StructField("priority", T.IntegerType()),
    T.StructField("status", T.StringType()),
])


@dataclass
class CrawlConfig:
    politeness: PolitenessConfig = dc_field(default_factory=PolitenessConfig)
    max_attempts: int = 3
    max_rounds: int = 20
    user_agent: str = "DataScrapexter"
    link_selector: str = "a[href]"
    # DOM-dependent pagination (cursor / next_button): when set, the round
    # loop follows ONLY the strategy's next-URL per fetched page (the
    # reference's sequential page loop, engine.go:720-792, per host) instead
    # of full link extraction. Cursor-repeat state is checkpointed per
    # (host, chain) — one entry per strategy instance
    # in the pagination_state table (lastCursor, pagination_strategies.go:
    # 144-149).
    pagination_spec: PaginationSpec | None = None
    restrict_to_seed_hosts: bool = True
    default_priority: int = 5          # JobPriority normal (pkg/types/types.go:47)
    # URL-seen prefilter family (north_rule: "partitioned Bloom/cuckoo
    # URL-seen filter"): "bloom" (OR-mergeable bitsets, densest) or
    # "cuckoo" (fingerprint table — supports deletion for recrawl
    # deployments, two bucket reads per probe). Both are prefilters only;
    # the exact anti-join always settles correctness, so the two configs
    # produce bit-identical crawls (test_cuckoo).
    seen_filter: str = "bloom"
    bloom_n_shards: int = 16
    bloom_m_bits: int = 1 << 20
    bloom_k: int = 7
    cuckoo_n_buckets: int = 1 << 15   # per shard; *4 slots = 128Ki entries
    cuckoo_slots: int = 4
    # above this total filter size the probe switches from driver-broadcast
    # (zero shuffle) to the distributed cogroup probe (shards never leave
    # executors) — at 10^10 URLs the filter is tens of GiB
    bloom_broadcast_max_bytes: int = 32 << 20
    # circuit breaker per domain (reference: internal/utils/performance.go:
    # 426-515, config-gated wiring engine.go:264-300, default maxFailures=5
    # errors/service.go:14). Round-wise rendering: breaker_failures
    # accumulates fetch failures across rounds and resets to 0 on ANY
    # success (recordSuccess resets the count); reaching
    # quarantine_max_failures opens the breaker -> the domain is skipped
    # while round <= quarantined_until (pending URLs stay pending), then
    # HALF-OPEN: the first round after expiry probes with budget 1 —
    # success closes the breaker, failure re-opens it. 0 = disabled
    # (the reference's ErrorRecovery block is opt-in).
    quarantine_max_failures: int = 0
    quarantine_reset_rounds: int = 2
    # seed robots.txt Sitemap URLs into the frontier (the reference only
    # EXPOSES GetSitemaps, compliance_test.go:250-252 — consuming them is
    # opt-in); fetched sitemap pages yield their <loc> URLs as out-links
    seed_sitemaps: bool = False
    # GDPR TLD gate (compliance.py): "off" (reference's checker is
    # unwired) or "block" — EU-TLD domains get state 'blocked_gdpr'
    gdpr_mode: str = "off"
    # fold frontier_updates deltas back into the frontier base every K
    # rounds (caps reconcile-join depth at K rounds of scheduled work;
    # compaction itself costs O(pending), amortized over K rounds)
    frontier_compact_every: int = 8
    # maybe-seen rows at or below this probe the seen set via broadcast
    # reverse-semi; above it (link-heavy round) the probe rides a
    # shuffle-hash semi co-located with the bucketed seen table. BOTH
    # paths scan url_seen without exchanging it and hash-build only the
    # round-sized probe (2M hashes ~ 16 MB broadcast)
    seen_probe_broadcast_max: int = 2_000_000
    # buckets for url_seen at rest (state.BucketedSeenTable). Size so one
    # bucket streams through one task: 10^10 hashes / 4096 buckets ≈ 20 MB
    # of longs each; sandbox default = local cores
    seen_n_buckets: int = 32
    # seeded per-request user-agent rotation (antidetect.py): each fetch
    # gets a deterministic UA keyed on (url_hash, round, seed) and
    # request_metrics gains an `agent` label column. Off by default — the
    # reference's antidetect module is opt-in config too
    rotate_user_agents: bool = False
    ua_rotation_seed: int = 0
    user_agent_pool: tuple[str, ...] | None = None
    # spider-trap gate (traps.py): drop discovered candidates whose trap
    # score reaches trap_threshold BEFORE dedup, so calendar/session-id
    # URL mints never enter url_seen. Off by default — the reference
    # relies on max-depth/max-pages caps only (engine.go crawl limits);
    # at a 10^10-URL frontier the gate is the scale-safety upgrade.
    trap_filter: bool = False
    trap_threshold: int = 40
    trap_max_depth: int = 12
    trap_max_params: int = 8
    # registered-domain blocklist (e.g. textstats.domain_quality_rollup's
    # blocked hosts, or any curated list): discovered out-links on these
    # domains die before hashing/dedup, so a junk/mirror site costs zero
    # url_seen probes and no frontier rows. Off by default; seeds are NOT
    # gated (an explicit seed is an operator decision).
    blocked_domains: tuple[str, ...] | None = None
    # reputation-proportional budgets (reputation.py / q53 wired into the
    # round loop): each domain's politeness token budget is scaled by its
    # CUMULATIVE reputation score (integer micro-units, error signal from
    # the domain_state totals this flag also maintains; the dup signal
    # stays available to pipelines that track content dups, q58). A new
    # domain has no history -> full score. Floor of 1 token mirrors the
    # 1% score floor: a bad host keeps a probe-sized budget and can
    # recover. Opt-in; off = bit-identical crawls to round-4 fixtures.
    reputation_budgets: bool = False


class CrawlEngine:
    def __init__(self, spark: SparkSession, store: StateStore,
                 pages: DataFrame, robots_texts: dict[str, str],
                 config: CrawlConfig | None = None):
        self.spark = spark
        self.store = store
        self.cfg = config or CrawlConfig()
        self.robots = RobotsIndex.from_texts(robots_texts or {})
        # rules as a DataFrame folded to one ordered-array row per host,
        # cached for broadcast at every round's gate (SURVEY §2.8 rules
        # table) — rules never ride a pickled UDF closure, so 10^8-host
        # crawls stay off the driver (swap createDataFrame for a table
        # read at that scale; the gate is unchanged)
        self.robots_rules = rules_array_df(
            self.robots.rules_df(spark), self.cfg.user_agent).cache()
        self.pages = self._prepare_pages(pages).cache()
        self.allowed_hosts: set[str] | None = None
        self._snapshot_ids: dict[str, int | None] = {}

    # ------------------------------------------------------------------
    # preparation
    # ------------------------------------------------------------------

    # above this many duplicated url_canon keys the dup-key set stops
    # being broadcastable and pages prep falls back to the full window
    # (degenerate corpus: most URLs re-fetched; bucket the pages table by
    # url_canon at ingest instead)
    PAGES_DUP_BROADCAST_MAX = 4_000_000

    def _prepare_pages(self, pages: DataFrame) -> DataFrame:
        """Canonicalize the pages table once; keep first row per url_canon
        (earliest warc_ts — WARC convention for re-fetches) WITHOUT
        shuffling the fat html column.

        A window over the whole table would push every page body through
        one exchange at startup — at 100 TB that shuffle dominates the
        crawl. Re-fetches are the exception, so: find duplicated keys with
        a key-width groupBy (html pruned from that scan), broadcast them,
        and run the keep-first window ONLY over the duplicated rows; the
        unique majority passes through shuffle-free via a broadcast
        anti-join. Plan extract in PLANS.md: no `html` in any Exchange."""
        canon = pages.withColumn("url_canon", normalize_url_udf("url"))
        has_ts = "warc_ts" in pages.columns
        dup_keys = (
            canon.groupBy("url_canon").count()
            .filter(F.col("count") > 1).select("url_canon")
        )
        n_dup = dup_keys.count()  # keys only — html never read here
        if n_dup == 0:
            return canon.select("url_canon", "html")
        order_cols = [F.col("warc_ts").asc()] if has_ts else []
        order_cols.append(F.col("url").asc())
        w = Window.partitionBy("url_canon").orderBy(*order_cols)
        if n_dup > self.PAGES_DUP_BROADCAST_MAX:
            return (
                canon.withColumn("_rn", F.row_number().over(w))
                .filter(F.col("_rn") == 1)
                .select("url_canon", "html")
            )
        uniq = canon.join(F.broadcast(dup_keys), "url_canon", "left_anti")
        dups = canon.join(F.broadcast(dup_keys), "url_canon", "left_semi")
        dedup = (
            dups.withColumn("_rn", F.row_number().over(w))
            .filter(F.col("_rn") == 1)
        )
        return (uniq.select("url_canon", "html")
                .unionByName(dedup.select("url_canon", "html")))

    def _frontier_rows(self, urls: DataFrame, priority_col, round_no: int) -> DataFrame:
        """url column -> full frontier-schema rows (one fused Arrow pass for
        host/domain; canonicalization is idempotent on url_canon)."""
        return (
            urls.withColumn("url_hash", F.xxhash64("url_canon"))
            .withColumn("c", canonicalize_struct_udf("url_canon"))
            .withColumn("host", F.col("c.host"))
            .withColumn("domain", F.col("c.domain"))
            .drop("c")
            .withColumn("priority", priority_col.cast("int"))
            .withColumn("attempts", F.lit(0))
            .withColumn("round_added", F.lit(round_no))
            .withColumn("state", F.lit("pending"))
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        )

    # ------------------------------------------------------------------
    # lifecycle
    # ------------------------------------------------------------------

    def init(self, seeds: DataFrame) -> None:
        """Seed the frontier. seeds: (url[, priority])."""
        if "priority" not in seeds.columns:
            seeds = seeds.withColumn("priority", F.lit(self.cfg.default_priority))
        if self.cfg.seed_sitemaps:
            sitemaps = self.robots.all_sitemaps()
            if sitemaps:
                sm = self.spark.createDataFrame(
                    [(u, self.cfg.default_priority) for u in sitemaps],
                    "url string, priority int")
                seeds = seeds.select("url", "priority").unionByName(sm)
        canon = (
            seeds.withColumn("url_canon", normalize_url_udf("url"))
            .select("url_canon", "priority")
        )
        # one row per canonical URL; highest priority wins, deterministic
        w = Window.partitionBy("url_canon").orderBy(F.col("priority").desc())
        canon = (canon.withColumn("_rn", F.row_number().over(w))
                 .filter(F.col("_rn") == 1).drop("_rn"))
        frontier = self._frontier_rows(canon, F.col("priority"), 0)

        if self.cfg.restrict_to_seed_hosts:
            hosts = [r["host"] for r in frontier.select("host").distinct().collect()]
            self.allowed_hosts = set(hosts)

        sids = {}
        sids["frontier"] = self.store["frontier"].overwrite(frontier)
        sids["frontier_updates"] = self.store["frontier_updates"].overwrite(
            self.spark.createDataFrame([], FRONTIER_UPDATES_SCHEMA))
        sids["frontier_archive"] = self.store["frontier_archive"].overwrite(
            self.spark.createDataFrame([], FRONTIER_SCHEMA))
        seen = frontier.select("url_hash")
        self.store.url_seen.n_buckets = self.cfg.seen_n_buckets
        sids["url_seen"] = self.store.url_seen.overwrite_all(
            self.spark, seen, round_no=0)
        sids["bloom_shards"] = self.store["bloom_shards"].overwrite(
            self._bloom_partials(seen, 0)
        )
        empty_state = self.spark.createDataFrame(
            [], "domain string, err_rate double, consec_err int, "
                "breaker_failures int, quarantined_until int, "
                "rate_mult double, n_fetch_total long, n_err_total long")
        sids["domain_state"] = self.store["domain_state"].overwrite(empty_state)
        sids["pagination_state"] = self.store["pagination_state"].overwrite(
            self.spark.createDataFrame(
                [], "host string, chain_id long, last_cursor string"))
        sids["pagination_chains"] = self.store["pagination_chains"].overwrite(
            self.spark.createDataFrame([], "url_hash long, chain_id long"))
        sids["crawl_log"] = self.store["crawl_log"].overwrite(
            self.spark.createDataFrame([], CRAWL_LOG_SCHEMA))
        sids["lineage_metrics"] = self.store["lineage_metrics"].overwrite(
            self.spark.createDataFrame(
                [], "round int, partition_id int, scheduled long, fetched long, "
                    "errors long"))
        req_schema = ("round int, host string, status string, agent string, "
                      "n long") if self.cfg.rotate_user_agents else \
                     "round int, host string, status string, n long"
        sids["request_metrics"] = self.store["request_metrics"].overwrite(
            self.spark.createDataFrame([], req_schema))
        sids["round_metrics"] = self.store["round_metrics"].overwrite(
            self.spark.createDataFrame(
                [], "round int, scheduled long, fetched long, new_urls long, "
                    "pending long, wall_ms long"))
        self.store.commit_round(0, sids)
        self._snapshot_ids = sids

    def resume(self) -> int:
        """Roll state back to the last committed round; returns that round.
        Uncommitted snapshots written by a crashed round are simply not
        referenced (north_rule: resumable mid-crawl)."""
        last = self.store.last_committed_round()
        if last is None:
            raise RuntimeError("no committed rounds to resume from")
        self._snapshot_ids = last["snapshots"]
        if self.cfg.restrict_to_seed_hosts and self.allowed_hosts is None:
            seed_hosts = (self.frontier_df()
                          .filter(F.col("round_added") == 0)
                          .select("host").distinct().collect())
            self.allowed_hosts = {r["host"] for r in seed_hosts}
        return last["round"]

    def _read(self, table: str) -> DataFrame:
        return self.store[table].read(self.spark, self._snapshot_ids.get(table))

    def _append(self, table: str, df: DataFrame) -> int:
        """Append relative to the journal-committed snapshot (never onto a
        crashed round's uncommitted appends)."""
        return self.store[table].append(
            df, base_snapshot_id=self._snapshot_ids.get(table))

    # ------------------------------------------------------------------
    # incremental frontier views
    # ------------------------------------------------------------------

    @staticmethod
    def _reconcile(base: DataFrame, updates: DataFrame | None) -> DataFrame:
        """Apply the latest state-transition delta per url_hash. The delta
        set spans at most frontier_compact_every rounds of scheduled work —
        key-width, typically broadcastable — so the base (which holds the
        fat url_canon strings) never shuffles."""
        if updates is None:
            return base
        latest = (
            updates.groupBy("url_hash")
            .agg(F.max_by(F.struct("state", "attempts"), "round").alias("_u"))
        )
        return (
            base.join(latest, "url_hash", "left")
            .withColumn("state", F.coalesce(F.col("_u.state"), F.col("state")))
            .withColumn(
                "attempts",
                F.coalesce(F.col("_u.attempts"), F.col("attempts")).cast("int"))
            .drop("_u")
        )

    def _pending_frontier(self) -> DataFrame:
        """The schedulable set: every base row is written pending, so rows
        leave this view purely via terminal deltas (no archive scan)."""
        return self._reconcile(
            self._read("frontier"), self._read("frontier_updates")
        ).filter(F.col("state") == "pending")

    def frontier_df(self) -> DataFrame:
        """Full frontier (pending ∪ terminal) — fixtures, resume, q30.
        Terminal rows live exactly once in the archive (appended at
        transition), pending rows exactly once in the reconciled base."""
        archive = self._read("frontier_archive")
        pending = self._pending_frontier()
        if archive is None:
            return pending
        return pending.unionByName(archive)

    # ------------------------------------------------------------------
    # seen-filter helpers (bloom or cuckoo shards — cfg.seen_filter; both
    # persist per-round partial blobs in the `bloom_shards` snapshot
    # table and merge reader-side: OR for bloom, fingerprint re-insert
    # for cuckoo)
    # ------------------------------------------------------------------

    def _filter_total_bytes(self) -> int:
        cfg = self.cfg
        if cfg.seen_filter == "cuckoo":
            return cfg.bloom_n_shards * (
                16 + cfg.cuckoo_n_buckets * cfg.cuckoo_slots * 2)
        return cfg.bloom_n_shards * cfg.bloom_m_bits // 8

    def _bloom_partials(self, hashes: DataFrame, round_no: int) -> DataFrame:
        """Executor-side shard build: group new hashes by shard, one
        serialized filter blob per shard per round (append-only)."""
        cfg = self.cfg
        n_shards = cfg.bloom_n_shards
        out_schema = "shard_id int, round int, bitset binary"
        if cfg.seen_filter == "cuckoo":
            n_buckets, slots = cfg.cuckoo_n_buckets, cfg.cuckoo_slots

            def build(pdf: pd.DataFrame) -> pd.DataFrame:
                shard = int(pdf["shard_id"].iloc[0])
                bs = cuckoo_build_blob(pdf["url_hash"].to_numpy(),
                                       n_buckets, slots)
                return pd.DataFrame(
                    {"shard_id": [shard], "round": [round_no], "bitset": [bs]})
        else:
            m_bits, k = cfg.bloom_m_bits, cfg.bloom_k

            def build(pdf: pd.DataFrame) -> pd.DataFrame:
                shard = int(pdf["shard_id"].iloc[0])
                bs = build_bitset(pdf["url_hash"].to_numpy(), m_bits, k)
                return pd.DataFrame(
                    {"shard_id": [shard], "round": [round_no], "bitset": [bs]})

        return (
            hashes.withColumn("shard_id",
                              F.pmod(F.col("url_hash"), F.lit(n_shards)).cast("int"))
            .groupBy("shard_id").applyInPandas(build, out_schema)
        )

    def _load_bloom(self):
        """Merged driver-side filter handle (BloomShards or CuckooShards —
        both expose maybe_seen for the broadcast probe UDF)."""
        df = self._read("bloom_shards")
        rows = [] if df is None else [
            (r["shard_id"], r["round"], r["bitset"]) for r in df.collect()
        ]
        if self.cfg.seen_filter == "cuckoo":
            return CuckooShards.from_rows(
                rows, self.cfg.bloom_n_shards, self.cfg.cuckoo_n_buckets,
                self.cfg.cuckoo_slots)
        return BloomShards.from_rows(
            rows, self.cfg.bloom_n_shards, self.cfg.bloom_m_bits, self.cfg.bloom_k)

    # ------------------------------------------------------------------
    # one round
    # ------------------------------------------------------------------

    def run_round(self, round_no: int) -> dict:
        t0 = time.monotonic()
        cfg, pol = self.cfg, self.cfg.politeness
        pending = self._pending_frontier()

        # --- robots gate: broadcast rules-array join + codegen prefix
        # match (no Python crossing, no driver-pickled rule dict) ---
        with_path = pending.withColumn(
            "path", F.coalesce(F.parse_url("url_canon", F.lit("PATH")), F.lit("")))
        gated = (
            with_path.join(F.broadcast(self.robots_rules), "host", "left")
            .withColumn("allowed",
                        allowed_rules_col(F.col("path"), F.col("rules")))
            .drop("path", "rules")
        ).cache()
        blocked = gated.filter(~F.col("allowed")).drop("allowed")
        eligible = gated.filter(F.col("allowed")).drop("allowed")

        # --- GDPR TLD gate (compliance.py; opt-in) ---
        gdpr_blocked = None
        if cfg.gdpr_mode == "block":
            from .compliance import gdpr_required_col

            gflag = gdpr_required_col(F.col("domain"))
            gdpr_blocked = eligible.filter(gflag)
            eligible = eligible.filter(~gflag)

        # --- budgets (pure Column recurrence over previous-round state) ---
        delays = self._domain_delays_df()
        prev_state = self._read("domain_state")
        if "breaker_failures" not in prev_state.columns:  # pre-breaker state
            prev_state = (
                prev_state.withColumn("breaker_failures", F.lit(0))
                .withColumn("quarantined_until", F.lit(None).cast("int")))
        if "rate_mult" not in prev_state.columns:  # pre-strategy state
            prev_state = prev_state.withColumn("rate_mult", F.lit(1.0))
        if "n_fetch_total" not in prev_state.columns:  # pre-reputation state
            prev_state = (
                prev_state.withColumn("n_fetch_total", F.lit(0).cast("long"))
                .withColumn("n_err_total", F.lit(0).cast("long")))

        # --- circuit breaker gate: open domains are skipped entirely ---
        if cfg.quarantine_max_failures > 0:
            quarantined = prev_state.filter(
                F.coalesce("quarantined_until", F.lit(-1)) >= round_no
            ).select("domain")
            eligible = eligible.join(
                F.broadcast(quarantined), "domain", "left_anti")

        domains = eligible.select("domain").distinct()
        if pol.use_strategy_budgets:
            tokens = strategy_tokens_from_state(
                F.coalesce(F.col("crawl_delay_s"), F.lit(0.0)),
                F.col("err_rate"), F.col("rate_mult"), pol)
        else:
            tokens = tokens_per_round(
                F.coalesce(F.col("crawl_delay_s"), F.lit(0.0)),
                F.col("err_rate"), F.col("consec_err"), pol)
        budgets = (
            domains.join(F.broadcast(delays), "domain", "left")
            .join(F.broadcast(prev_state.select(
                "domain", "err_rate", "consec_err", "rate_mult",
                "n_fetch_total", "n_err_total")),
                "domain", "left")
            .select("domain", tokens.alias("tokens"),
                    "n_fetch_total", "n_err_total")
        )
        if cfg.reputation_budgets:
            # cumulative score (reputation.py formula, dup signal 0 on
            # the engine path): score = MICRO - err_ppm floored at 1%;
            # no history -> full score. tokens scale proportionally,
            # floor 1 (the half-open-probe analogue).
            from .reputation import MICRO, _idiv

            err_ppm = _idiv(F.lit(MICRO) * F.col("n_err_total"),
                            F.greatest(F.col("n_fetch_total"), F.lit(1)))
            score = F.when(
                F.coalesce("n_fetch_total", F.lit(0)) == 0, F.lit(MICRO)
            ).otherwise(
                F.greatest(F.lit(MICRO) - err_ppm, F.lit(MICRO // 100)))
            budgets = budgets.withColumn(
                "tokens",
                F.greatest(_idiv(F.col("tokens") * score, F.lit(MICRO)),
                           F.lit(1)))
        budgets = budgets.select("domain", "tokens")
        if cfg.quarantine_max_failures > 0:
            # half-open: first round after expiry probes with budget 1
            half = prev_state.filter(
                F.col("quarantined_until") == round_no - 1
            ).select("domain", F.lit(True).alias("_half"))
            budgets = (
                budgets.join(F.broadcast(half), "domain", "left")
                .withColumn("tokens", F.when(F.col("_half"), F.lit(1))
                            .otherwise(F.col("tokens")))
                .drop("_half")
            )

        scheduled = schedule_topk(eligible, budgets, pol).cache()

        # --- "fetch": equi-join the canonical pages table ---
        fetched = (
            scheduled.join(self.pages, "url_canon", "left")
            .withColumn("found", F.col("html").isNotNull())
        ).cache()

        # --- per-partition lineage metrics (north_rule) ---
        metrics = (
            fetched.groupBy(F.spark_partition_id().alias("partition_id"))
            .agg(F.count("*").alias("scheduled"),
                 F.sum(F.col("found").cast("long")).alias("fetched"),
                 F.sum((~F.col("found")).cast("long")).alias("errors"))
            .withColumn("round", F.lit(round_no))
            .select("round", "partition_id", "scheduled", "fetched", "errors")
        )

        # --- per-round per-host per-status request counters (the
        # RecordRequest / RecordPageScraped families,
        # internal/monitoring/metrics.go:601-661, rendered round-wise;
        # host is the reference's label, status our deterministic
        # fetched/miss stand-in for its code classes). With UA rotation
        # on (antidetect.py), each request also carries its seeded agent
        # label — pure codegen, keyed (url_hash, round, seed) ---
        status_col = (F.when(F.col("found"), "fetched").otherwise("miss")
                      .alias("status"))
        if cfg.rotate_user_agents:
            from .antidetect import user_agent_col

            agent = user_agent_col(
                F.col("url_hash"), F.lit(round_no),
                list(cfg.user_agent_pool) if cfg.user_agent_pool else None,
                seed=cfg.ua_rotation_seed).alias("agent")
            request_metrics = (
                fetched.groupBy("host", status_col, agent)
                .agg(F.count("*").alias("n"))
                .select(F.lit(round_no).alias("round"), "host", "status",
                        "agent", "n")
            )
        else:
            request_metrics = (
                fetched.groupBy("host", status_col)
                .agg(F.count("*").alias("n"))
                .select(F.lit(round_no).alias("round"), "host", "status", "n")
            )

        # --- out-links -> new frontier candidates ---
        spec = cfg.pagination_spec
        new_pag_state = new_chain_rows = None
        if spec is not None and spec.type in ("cursor", "next_button"):
            links, new_pag_state, new_chain_rows = self._pagination_links(
                fetched.filter("found").select("url_canon", "html"),
                spec, round_no)
        else:
            links = extract_links_df(
                fetched.filter("found").select("url_canon", "html"),
                selector=cfg.link_selector,
            )
        candidates = links.select(
            F.col("out_url_canon").alias("url_canon")).distinct()
        candidates = (
            candidates.withColumn("c", canonicalize_struct_udf("url_canon"))
            .withColumn("host", F.col("c.host"))
            .withColumn("cand_domain", F.col("c.domain"))
            .drop("c")
        )
        if self.allowed_hosts is not None:
            hosts_df = self.spark.createDataFrame(
                [(h,) for h in sorted(self.allowed_hosts)], "host string")
            candidates = candidates.join(F.broadcast(hosts_df), "host", "semi")
        if cfg.blocked_domains:
            # domains-sized list -> broadcast anti-join on the registered
            # domain already computed by the fused canonicalize crossing
            bl = self.spark.createDataFrame(
                [(d,) for d in sorted(set(cfg.blocked_domains))],
                "cand_domain string")
            candidates = candidates.join(
                F.broadcast(bl), "cand_domain", "left_anti")
        if cfg.trap_filter:
            # one codegen Filter over the canonical URL — traps die before
            # hashing/dedup, so they never cost a url_seen probe or row
            from .traps import trap_cols

            score = trap_cols(F.col("url_canon"),
                              max_depth=cfg.trap_max_depth,
                              max_params=cfg.trap_max_params)["trap_score"]
            candidates = candidates.filter(score < cfg.trap_threshold)
        candidates = candidates.withColumn("url_hash", F.xxhash64("url_canon"))

        # --- dedup: bloom/cuckoo prefilter, then exact anti-join for
        # maybe-seen (cfg.seen_filter picks the family; identical contract:
        # no false negatives, exact check settles) ---
        if self._filter_total_bytes() <= cfg.bloom_broadcast_max_bytes:
            # small filter: collect+broadcast, probe with zero extra shuffle
            filt = self._load_bloom()
            bbc = self.spark.sparkContext.broadcast(filt)

            @F.pandas_udf(T.BooleanType())
            def maybe_seen_udf(h: pd.Series) -> pd.Series:
                return pd.Series(bbc.value.maybe_seen(h.to_numpy()))

            flagged = candidates.withColumn(
                "maybe_seen", maybe_seen_udf("url_hash"))
        elif cfg.seen_filter == "cuckoo":
            flagged = probe_maybe_seen_cuckoo_df(
                candidates, self._read("bloom_shards"), cfg.bloom_n_shards)
        else:
            # cluster-scale filter: distributed cogroup probe — shards stay
            # on executors, candidates shuffle once by shard_id
            flagged = probe_maybe_seen_df(
                candidates, self._read("bloom_shards"),
                cfg.bloom_n_shards, cfg.bloom_m_bits, cfg.bloom_k)
        # flagged is consumed by BOTH branches below — cached so the
        # links -> canonicalize -> bloom Arrow chain runs once, not twice;
        # the cache materialization also prices the probe strategy choice
        flagged = flagged.cache()
        n_maybe = flagged.filter(F.col("maybe_seen")).count()
        definite_new = flagged.filter(~F.col("maybe_seen")).drop("maybe_seen")
        needs_check = flagged.filter(F.col("maybe_seen")).drop("maybe_seen")
        # url_seen grows with the crawl (10^10 hashes = ~80 GB) — it must
        # be SCANNED, never SHUFFLED and never HASH-BUILT, per round. Both
        # probe strategies share one shape: semi-join the seen scan
        # against the round-sized probe (dupes = seen ⋉ probe), then
        # anti-join the probe against those dupes — every build side and
        # every exchanged side is O(this round's links).
        url_seen = self.store.url_seen.read(
            self.spark, self._snapshot_ids.get("url_seen"))
        probe = needs_check.select("url_hash")
        if n_maybe <= cfg.seen_probe_broadcast_max:
            # quiet round (bloom FP ~1%): driver-broadcast probe — one
            # parallel seen scan, zero exchange anywhere
            dupes = url_seen.join(F.broadcast(probe), "url_hash",
                                  "left_semi")
        else:
            # link-heavy round (steady-state crawls re-discover most
            # links): probe too big to collect — shuffle it into the seen
            # table's bucket layout instead. url_seen is bucketed at rest
            # by url_hash (state.BucketedSeenTable), so Catalyst plans a
            # shuffled-hash semi where the seen side is a bare bucketed
            # FileScan (no Exchange, `Bucketed: true` — PLANS.md extract)
            # and only the probe is exchanged + built.
            dupes = url_seen.join(probe.hint("shuffle_hash"), "url_hash",
                                  "left_semi")
        confirmed_new = needs_check.join(dupes, "url_hash", "left_anti")
        new_urls = definite_new.unionByName(confirmed_new)
        # cached: new_rows feeds four consumers (url_seen append, bloom
        # shard build, frontier union, stats) — without the cache the whole
        # links->bloom->anti-join chain re-executes per consumer
        new_rows = (
            new_urls.withColumnRenamed("cand_domain", "domain")
            .withColumn("priority", F.lit(cfg.default_priority))
            .withColumn("attempts", F.lit(0))
            .withColumn("round_added", F.lit(round_no))
            .withColumn("state", F.lit("pending"))
            .select([f.name for f in FRONTIER_SCHEMA.fields])
        ).cache()

        # --- frontier state transitions: O(round work) DELTAS, never a
        # full-frontier join/rewrite. Terminal rows (done/failed/blocked*)
        # go to the archive once, with a masking delta so they drop out of
        # the pending view; retries are a delta only (attempts+1). ---
        fcols = [f.name for f in FRONTIER_SCHEMA.fields]

        def _as_update(df: DataFrame, state_col, attempts_col) -> DataFrame:
            return df.select(
                "url_hash", state_col.alias("state"),
                attempts_col.cast("int").alias("attempts"),
                F.lit(round_no).alias("round"))

        def _as_archive(df: DataFrame, state_col, attempts_col) -> DataFrame:
            return (df.withColumn("state", state_col)
                    .withColumn("attempts", attempts_col.cast("int"))
                    .select(fcols))

        done = fetched.filter("found")
        failed = fetched.filter(
            ~F.col("found") & (F.col("attempts") + 1 >= cfg.max_attempts))
        retried = fetched.filter(
            ~F.col("found") & (F.col("attempts") + 1 < cfg.max_attempts))

        terminal = [
            (done, F.lit("done"), F.col("attempts")),
            (failed, F.lit("failed"), F.col("attempts") + 1),
            (blocked, F.lit("blocked"), F.col("attempts")),
        ]
        if gdpr_blocked is not None:
            terminal.append(
                (gdpr_blocked, F.lit("blocked_gdpr"), F.col("attempts")))

        updates_df = _as_update(retried, F.lit("pending"),
                                F.col("attempts") + 1)
        archive_rows = None
        for df, st, att in terminal:
            updates_df = updates_df.unionByName(_as_update(df, st, att))
            part = _as_archive(df, st, att)
            archive_rows = part if archive_rows is None \
                else archive_rows.unionByName(part)

        # --- crawl log (the reproducible order fixture) ---
        log = fetched.select(
            F.lit(round_no).alias("round"), "domain", "seq", "url_canon",
            "url_hash", "priority",
            F.when(F.col("found"), "fetched").otherwise("miss").alias("status"),
        )

        # --- domain adaptation + breaker state for the next round ---
        # full-outer merge so UNSCHEDULED domains (e.g. quarantined) keep
        # their state — matching the oracle simulator's persistent dict
        round_err = (
            fetched.groupBy("domain")
            .agg(F.count("*").alias("att"),
                 F.sum((~F.col("found")).cast("long")).alias("errs"),
                 F.sum(F.col("found").cast("long")).alias("succ"))
            .withColumn("r_err_rate", F.col("errs") / F.col("att"))
        )
        prev_s = prev_state.select(
            "domain",
            F.col("err_rate").alias("p_err_rate"),
            F.col("consec_err").alias("p_consec"),
            F.col("breaker_failures").alias("p_breaker"),
            F.col("quarantined_until").alias("p_quar"),
            F.col("rate_mult").alias("p_mult"),
            F.col("n_fetch_total").alias("p_fetch_total"),
            F.col("n_err_total").alias("p_err_total"),
        )
        merged = round_err.join(prev_s, "domain", "full")
        attempted = F.col("att").isNotNull()
        new_consec = F.when(
            attempted,
            next_consec_errors(F.col("r_err_rate"), F.col("p_consec"), pol),
        ).otherwise(F.coalesce("p_consec", F.lit(0)))
        # recordSuccess resets the failure count on ANY success
        # (performance.go:503-510), rendered round-wise
        new_breaker = (
            F.when(~attempted, F.coalesce("p_breaker", F.lit(0)))
            .when(F.col("succ") > 0, F.lit(0))
            .otherwise(F.coalesce("p_breaker", F.lit(0)) + F.col("errs"))
        ).cast("int")
        if cfg.quarantine_max_failures > 0:
            # (re-)open only on an attempted round's failures — an already
            # open, unattempted domain keeps its expiry so it can half-open
            new_quar = (
                F.when(attempted & (new_breaker >= cfg.quarantine_max_failures),
                       F.lit(round_no + cfg.quarantine_reset_rounds))
                .otherwise(F.col("p_quar"))
            ).cast("int")
        else:
            new_quar = F.lit(None).cast("int")
        # interval multiplier for the strategy family: min-change-gated
        # recurrence from this round's stats (updateAdaptiveRate,
        # ratelimiter.go:363-409 evaluated round-wise; consumed next round
        # by strategy_tokens_from_state)
        new_mult = F.when(
            attempted,
            interval_multiplier(F.col("r_err_rate"), new_consec,
                                F.col("p_mult"), pol),
        ).otherwise(F.coalesce("p_mult", F.lit(1.0)))
        new_domain_state = merged.select(
            "domain",
            F.when(attempted, F.col("r_err_rate"))
            .otherwise(F.col("p_err_rate")).alias("err_rate"),
            new_consec.cast("int").alias("consec_err"),
            new_breaker.alias("breaker_failures"),
            new_quar.alias("quarantined_until"),
            new_mult.cast("double").alias("rate_mult"),
            (F.coalesce("p_fetch_total", F.lit(0))
             + F.coalesce("att", F.lit(0))).cast("long")
            .alias("n_fetch_total"),
            (F.coalesce("p_err_total", F.lit(0))
             + F.coalesce("errs", F.lit(0))).cast("long")
            .alias("n_err_total"),
        )

        # --- checkpoint + round commit: every frontier write is an
        # O(round-work) append (base_snapshot pinned to the committed
        # journal so crashed rounds can't leak uncommitted data) ---
        sids = dict(self._snapshot_ids)
        sids["frontier"] = self._append("frontier", new_rows)
        sids["frontier_updates"] = self._append("frontier_updates", updates_df)
        sids["frontier_archive"] = self._append("frontier_archive",
                                                archive_rows)
        sids["url_seen"] = self.store.url_seen.append_round(
            self.spark, new_rows.select("url_hash"), round_no)
        new_hashes = new_rows.select("url_hash")
        sids["bloom_shards"] = self._append(
            "bloom_shards", self._bloom_partials(new_hashes, round_no))
        sids["domain_state"] = self.store["domain_state"].overwrite(new_domain_state)
        if new_pag_state is not None:
            sids["pagination_state"] = self.store["pagination_state"].overwrite(
                new_pag_state)
        if new_chain_rows is not None:
            # chain membership of next-round pages: O(advancing chains)
            # rows per round, append-only
            sids["pagination_chains"] = self._append(
                "pagination_chains", new_chain_rows)
        sids["crawl_log"] = self._append("crawl_log", log)
        sids["lineage_metrics"] = self._append("lineage_metrics", metrics)
        sids["request_metrics"] = self._append("request_metrics",
                                               request_metrics)

        stats_row = fetched.agg(
            F.count("*").alias("scheduled"),
            F.sum(F.col("found").cast("long")).alias("fetched")).collect()[0]
        n_new = new_rows.count()

        # post-round pending view over the freshly written snapshots (scan
        # is O(pending + uncompacted deltas), independent of archive size)
        base_new = self.store["frontier"].read(self.spark, sids["frontier"])
        upd_new = self.store["frontier_updates"].read(
            self.spark, sids["frontier_updates"])
        pend_new = self._reconcile(base_new, upd_new).filter(
            F.col("state") == "pending")
        pending_left = pend_new.count()

        # periodic compaction: fold deltas into the base (all-pending by
        # construction) and truncate them — bounds reconcile depth
        if (cfg.frontier_compact_every > 0
                and round_no % cfg.frontier_compact_every == 0):
            sids["frontier"] = self.store["frontier"].overwrite(pend_new)
            sids["frontier_updates"] = self.store["frontier_updates"].overwrite(
                self.spark.createDataFrame([], FRONTIER_UPDATES_SCHEMA))

        wall_ms = int((time.monotonic() - t0) * 1000)
        stats = {
            "round": round_no,
            "scheduled": stats_row["scheduled"] or 0,
            "fetched": stats_row["fetched"] or 0,
            "new_urls": n_new,
            "pending": pending_left,
            "wall_ms": wall_ms,
        }
        # round-level observability row (the dashboard-counter family,
        # metrics.go RecordPageScraped totals, rendered per round)
        sids["round_metrics"] = self._append(
            "round_metrics",
            self.spark.createDataFrame(
                [(round_no, stats["scheduled"], stats["fetched"],
                  n_new, pending_left, wall_ms)],
                "round int, scheduled long, fetched long, new_urls long, "
                "pending long, wall_ms long"))
        self.store.commit_round(round_no, sids)
        self._snapshot_ids = sids

        gated.unpersist()
        scheduled.unpersist()
        fetched.unpersist()
        flagged.unpersist()
        new_rows.unpersist()
        return stats

    def _pagination_links(
            self, fetched_pages: DataFrame, spec: PaginationSpec,
            round_no: int
    ) -> tuple[DataFrame, DataFrame | None, DataFrame | None]:
        """DOM-dependent pagination step: one Arrow pass per fetched page
        emits (next_url, cursor) with the reference's exact semantics
        (pagination_strategies.go:95-311 — disabled-button heuristics,
        cursor from selector text/attr, stop on empty cursor / page cap).

        Cursor-repeat protection across rounds (the reference's PER-
        STRATEGY-INSTANCE lastCursor, pagination_strategies.go:144-149) is
        keyed by (host, chain_id) — chain_id is the chain's seed
        url_hash, carried forward to each next page through the
        append-only pagination_chains mapping — so two paginated listings
        on one host never interfere: each chain compares its cursor only
        against ITS previous cursor. Both joins are broadcast (state is
        O(live chains), key-width).

        Returns (links in (src_url_canon, out_url_canon) shape,
        new pagination_state, new pagination_chains rows —
        the latter two None for next_button)."""
        nxt = extract_next_urls_df(fetched_pages, spec, page_num=round_no)
        new_state = new_chains = None
        if spec.type == "cursor":
            prev = self._read("pagination_state")
            if prev is None:
                prev = self.spark.createDataFrame(
                    [], "host string, chain_id long, last_cursor string")
            chains = self._read("pagination_chains")
            if chains is None:
                chains = self.spark.createDataFrame(
                    [], "url_hash long, chain_id long")
            # chain membership: a seed page starts its own chain
            # (chain_id = its url_hash); next pages inherit via the mapping
            nxt = (
                nxt.withColumn("host", host_col(F.col("src_url")))
                .withColumn("src_hash", F.xxhash64("src_url"))
                .join(F.broadcast(chains.dropDuplicates(["url_hash"])),
                      F.col("src_hash") == F.col("url_hash"), "left")
                .drop("url_hash")
                .withColumn("chain_id",
                            F.coalesce("chain_id", F.col("src_hash")))
                .join(F.broadcast(prev), ["host", "chain_id"], "left")
                .withColumn(
                    "next_url",
                    F.when(F.col("cursor") == F.coalesce("last_cursor", F.lit("")),
                           F.lit(None).cast("string"))
                    .otherwise(F.col("next_url")),
                )
            ).cache()
            this_round = (
                nxt.filter(F.col("cursor") != "")
                .groupBy("host", "chain_id")
                .agg(F.max("cursor").alias("new_cursor"))
            )
            new_state = (
                prev.join(this_round, ["host", "chain_id"], "full")
                .select(
                    "host", "chain_id",
                    F.coalesce("new_cursor", "last_cursor").alias("last_cursor"),
                )
            )
            new_chains = (
                nxt.filter(F.col("next_url").isNotNull())
                .select(
                    F.xxhash64(normalize_url_udf("next_url")).alias("url_hash"),
                    "chain_id")
            )
        links = (
            nxt.filter(F.col("next_url").isNotNull())
            .select(
                F.col("src_url").alias("src_url_canon"),
                normalize_url_udf("next_url").alias("out_url_canon"),
            )
        )
        return links, new_state, new_chains

    def _domain_delays_df(self) -> DataFrame:
        delays: dict[str, float] = {}
        for host, rules in self.robots.by_host.items():
            d = rules.get_crawl_delay(self.cfg.user_agent)
            if d > 0:
                dom = registered_domain(host)
                delays[dom] = max(delays.get(dom, 0.0), d)
        rows = [(k, float(v)) for k, v in sorted(delays.items())]
        if not rows:
            return self.spark.createDataFrame([], "domain string, crawl_delay_s double")
        return self.spark.createDataFrame(rows, "domain string, crawl_delay_s double")

    # ------------------------------------------------------------------
    # full crawl
    # ------------------------------------------------------------------

    def run(self, seeds: DataFrame | None = None,
            max_rounds: int | None = None) -> list[dict]:
        """Run until the frontier drains or max_rounds; returns round stats.
        Pass seeds to start fresh; omit to resume from the journal."""
        if seeds is not None:
            self.init(seeds)
            start = 1
        else:
            start = self.resume() + 1
        stats = []
        limit = max_rounds or self.cfg.max_rounds
        for r in range(start, limit + 1):
            s = self.run_round(r)
            stats.append(s)
            if s["pending"] == 0:
                break
        return stats

    def crawl_log(self) -> DataFrame:
        return (self._read("crawl_log")
                .orderBy("round", "domain", "seq"))

    def seen_hashes(self) -> DataFrame:
        return self.store.url_seen.read(
            self.spark, self._snapshot_ids.get("url_seen"))
