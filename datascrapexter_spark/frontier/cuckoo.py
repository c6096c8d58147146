"""Partitioned cuckoo URL-seen prefilter — the second filter family the
north_rule names ("partitioned Bloom/cuckoo URL-seen filter built in
vectorized Arrow UDFs"), selectable via CrawlConfig.seen_filter.

Same contract as the Bloom shards (frontier/bloom.py): a NO-FALSE-
NEGATIVE prefilter whose only job is to shrink the exact anti-join's
probe side; correctness is always settled by the exact check against
the bucketed `url_seen` table. What cuckoo adds over Bloom (Fan et al.,
"Cuckoo Filter: Practically Better Than Bloom", CoNEXT 2014):

- **Deletion** (`remove_hashes` / `delete_from_blob`): a Bloom bitset
  cannot un-set bits, so scheduled re-crawls of known URLs would keep
  paying the exact-check path forever; a cuckoo shard forgets a URL in
  O(1). The crawl loop's url_seen stays append-only (exactness);
  deletion is for recrawl-scheduling deployments that intentionally
  re-admit URLs.
- Two bucket reads per probe (cache-friendly) vs k scattered bit reads.

Design per shard (partial-key cuckoo hashing):
  fingerprint fp in [1, 0xFFFF] (0 = empty slot sentinel), buckets of
  `slots` uint16 entries, i1 = h & (n_buckets-1),
  i2 = i1 ^ spread(fp) — an involution, so any resident (bucket, fp)
  pair reconstructs its alternate bucket without the original key.
  Inserts that still fail after bounded eviction kicks land in a small
  overflow stash (bucket<<16|fp keys) — that is what keeps the filter
  false-negative-free even at adversarial load, where a textbook cuckoo
  filter would *reject* the insert.

Sharding/persistence mirror the Bloom path exactly: shard_id =
pmod(url_hash, n_shards); shard blobs build executor-side in
applyInPandas (one serialized blob per shard per round, append-only)
and merge by fingerprint re-insertion; the scheduler persists them in
the same `bloom_shards` snapshot table (binary blob column) and either
driver-broadcasts the merged shards (small filter) or cogroups
candidates with their shard's blobs (cluster scale — shards never visit
the driver).

Everything is numpy-vectorized: bulk placement resolves whole
batches of (bucket, fp) pairs per pass (sorted-run ranking into free
slots), and only the eviction tail (a few percent at high load) walks
item-at-a-time. Probes are fully vectorized gathers.

Reference anchor: supersedes the pass-through dedup stubs at
internal/pipeline/components.go:173-263, like the Bloom path.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

DEFAULT_N_SHARDS = 16
DEFAULT_N_BUCKETS = 1 << 15   # per shard; * 4 slots = 131072 entries/shard
DEFAULT_SLOTS = 4
MAX_KICKS = 500

_MAGIC = 0x434B4632  # "CKF2" — v2: bucket1 decorrelated from shard bits
_FP_SPREAD = np.uint64(0x5BD1E995)   # Murmur2 multiplier
_MIX = np.uint64(0x9E3779B97F4A7C15)  # splitmix64 golden-ratio constant
_BUCKET_MIX = np.uint64(0xC2B2AE3D27D4EB4F)  # xxhash64 PRIME64_2


def _fingerprints(hashes: np.ndarray) -> np.ndarray:
    """fp in [1, 0xFFFF] — 0 is the empty-slot sentinel. Derived from a
    multiplicative mix of the xxhash64 value's high bits so fp is
    independent of i1 (which uses the low bits)."""
    h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    mixed = (h * _MIX) >> np.uint64(48)
    return (mixed % np.uint64(0xFFFF) + np.uint64(1)).astype(np.uint16)


def _bucket1(hashes: np.ndarray, n_buckets: int) -> np.ndarray:
    """Primary bucket. Shard assignment is pmod(h, n_shards) — for a
    power-of-two shard count that pins the hash's LOW bits per shard, so
    the bucket index must NOT reuse them (v1's `h & mask` left only
    n_buckets/n_shards reachable primary buckets per shard: 8-14% of
    entries spilled to the stash at 75-90% load). Mix with a multiplier
    DIFFERENT from the fingerprint's `_MIX` so bucket and fp stay
    independent regardless of n_buckets."""
    h = np.asarray(hashes, dtype=np.int64).astype(np.uint64)
    mixed = (h * _BUCKET_MIX) >> np.uint64(32)
    return (mixed & np.uint64(n_buckets - 1)).astype(np.uint32)


def _alt_bucket(bucket: np.ndarray, fp: np.ndarray, n_buckets: int) -> np.ndarray:
    """Partial-key displacement: an involution of (bucket, fp)."""
    spread = (fp.astype(np.uint64) * _FP_SPREAD) & np.uint64(n_buckets - 1)
    return (bucket.astype(np.uint64) ^ spread).astype(np.uint32)


class CuckooShard:
    """One shard: a (n_buckets, slots) uint16 table + overflow stash."""

    def __init__(self, n_buckets: int = DEFAULT_N_BUCKETS,
                 slots: int = DEFAULT_SLOTS,
                 table: np.ndarray | None = None,
                 stash: set[int] | None = None):
        if n_buckets & (n_buckets - 1):
            raise ValueError("n_buckets must be a power of two")
        self.n_buckets = n_buckets
        self.slots = slots
        self.table = (table if table is not None
                      else np.zeros((n_buckets, slots), dtype=np.uint16))
        self.stash: set[int] = stash if stash is not None else set()

    # -- membership -------------------------------------------------------

    def _pair_contains(self, b1: np.ndarray, fp: np.ndarray) -> np.ndarray:
        b2 = _alt_bucket(b1, fp, self.n_buckets)
        in1 = (self.table[b1] == fp[:, None]).any(axis=1)
        in2 = (self.table[b2] == fp[:, None]).any(axis=1)
        out = in1 | in2
        if self.stash:
            st = np.fromiter(self.stash, dtype=np.uint64, count=len(self.stash))
            k1 = (b1.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
            k2 = (b2.astype(np.uint64) << np.uint64(16)) | fp.astype(np.uint64)
            out |= np.isin(k1, st) | np.isin(k2, st)
        return out

    def contains(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.int64)
        if not len(hashes):
            return np.zeros(0, dtype=bool)
        return self._pair_contains(_bucket1(hashes, self.n_buckets),
                                   _fingerprints(hashes))

    # -- insertion --------------------------------------------------------

    def _bulk_place(self, buckets: np.ndarray, fps: np.ndarray) -> np.ndarray:
        """Place each (bucket, fp) into a free slot of `bucket` where room
        exists — vectorized over the whole batch. Returns placed mask."""
        n = len(buckets)
        if not n:
            return np.zeros(0, dtype=bool)
        order = np.argsort(buckets, kind="stable")
        b_s, f_s = buckets[order], fps[order]
        starts = np.r_[0, np.flatnonzero(b_s[1:] != b_s[:-1]) + 1]
        run_id = np.zeros(n, dtype=np.int64)
        run_id[starts] = 1
        run_id = np.cumsum(run_id) - 1
        rank = np.arange(n) - starts[run_id]
        rows = self.table[b_s]                       # (n, slots) gather
        occupied = rows != 0
        free = self.slots - occupied.sum(axis=1)
        can = rank < free
        # rank-th free slot: stable argsort puts empty columns first
        free_order = np.argsort(occupied, axis=1, kind="stable")
        slot = free_order[np.arange(n), np.minimum(rank, self.slots - 1)]
        self.table[b_s[can], slot[can]] = f_s[can]
        placed = np.zeros(n, dtype=bool)
        placed[order] = can
        return placed

    def _insert_pairs(self, buckets: np.ndarray, fps: np.ndarray) -> None:
        """Set-semantics insert of (bucket, fp) pairs (bucket may be either
        of the pair's two legal buckets — partial-key reconstructs the
        other). Never fails: eviction overflow goes to the stash."""
        if not len(buckets):
            return
        buckets = buckets.astype(np.uint32)
        fps = fps.astype(np.uint16)
        # intra-batch dedupe on canonical key (min of the two buckets — the
        # same element may arrive labeled with either bucket)
        alt = _alt_bucket(buckets, fps, self.n_buckets)
        canon = np.minimum(buckets, alt)
        key = (canon.astype(np.uint64) << np.uint64(16)) | fps.astype(np.uint64)
        _, first = np.unique(key, return_index=True)
        buckets, fps = buckets[np.sort(first)], fps[np.sort(first)]
        # already-resident pairs are no-ops (set semantics across rounds)
        fresh = ~self._pair_contains(buckets, fps)
        buckets, fps = buckets[fresh], fps[fresh]
        # pass 1: primary bucket; pass 2: alternate bucket — both vectorized
        placed = self._bulk_place(buckets, fps)
        buckets, fps = buckets[~placed], fps[~placed]
        if len(buckets):
            alt = _alt_bucket(buckets, fps, self.n_buckets)
            placed = self._bulk_place(alt, fps)
            buckets, fps = buckets[~placed], fps[~placed]
        # eviction tail (both buckets full): item-at-a-time bounded kicks
        rng = np.random.default_rng(np.uint64(0xC0FFEE))  # deterministic kicks
        for b, fp in zip(buckets.tolist(), fps.tolist()):
            self._insert_one_evicting(int(b), int(fp), rng)

    def _insert_one_evicting(self, bucket: int, fp: int, rng) -> None:
        cur_b, cur_fp = bucket, fp
        for _ in range(MAX_KICKS):
            row = self.table[cur_b]
            empty = np.flatnonzero(row == 0)
            if len(empty):
                self.table[cur_b, empty[0]] = cur_fp
                return
            # kick a random resident to its alternate bucket
            victim = int(rng.integers(0, self.slots))
            vic_fp = int(row[victim])
            row[victim] = cur_fp
            cur_fp = vic_fp
            cur_b = int(_alt_bucket(np.uint32(cur_b), np.uint16(cur_fp),
                                    self.n_buckets))
        # table effectively full on this cycle: stash keeps the no-false-
        # negative guarantee (a textbook filter would reject the insert)
        self.stash.add((cur_b << 16) | cur_fp)

    def add_hashes(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.int64)
        if not len(hashes):
            return
        self._insert_pairs(_bucket1(hashes, self.n_buckets),
                           _fingerprints(hashes))

    # -- deletion (the cuckoo advantage) ----------------------------------

    def remove_hashes(self, hashes: np.ndarray) -> np.ndarray:
        """Remove each hash's fingerprint (one copy) from the shard.
        Returns a removed-mask; absent fingerprints are no-ops (False).
        Only delete hashes that were actually inserted — deleting a
        never-inserted hash whose fingerprint collides with a resident
        one would evict the resident (standard cuckoo-filter contract)."""
        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        if not len(hashes):
            return out
        b1 = _bucket1(hashes, self.n_buckets)
        fps = _fingerprints(hashes)
        for i in range(len(hashes)):
            fp = fps[i]
            for b in (int(b1[i]),
                      int(_alt_bucket(b1[i:i + 1], fps[i:i + 1],
                                      self.n_buckets)[0])):
                hit = np.flatnonzero(self.table[b] == fp)
                if len(hit):
                    self.table[b, hit[0]] = 0
                    out[i] = True
                    break
                key = (b << 16) | int(fp)
                if key in self.stash:
                    self.stash.discard(key)
                    out[i] = True
                    break
        return out

    # -- persistence ------------------------------------------------------

    def to_blob(self) -> bytes:
        stash = np.fromiter(sorted(self.stash), dtype=np.uint64,
                            count=len(self.stash))
        header = np.array([_MAGIC, self.n_buckets, self.slots, len(stash)],
                          dtype=np.uint32)
        return header.tobytes() + self.table.tobytes() + stash.tobytes()

    @classmethod
    def from_blob(cls, blob: bytes) -> "CuckooShard":
        header = np.frombuffer(blob[:16], dtype=np.uint32)
        if int(header[0]) != _MAGIC:
            raise ValueError("not a cuckoo shard blob")
        n_buckets, slots, n_stash = (int(header[1]), int(header[2]),
                                     int(header[3]))
        t_end = 16 + n_buckets * slots * 2
        table = (np.frombuffer(blob[16:t_end], dtype=np.uint16)
                 .reshape(n_buckets, slots).copy())
        stash = set(np.frombuffer(blob[t_end:t_end + n_stash * 8],
                                  dtype=np.uint64).tolist())
        return cls(n_buckets, slots, table, stash)

    def merge_from(self, other: "CuckooShard") -> None:
        """Union by re-inserting the other shard's resident pairs — the
        cuckoo analog of the Bloom OR-merge (used when folding per-round
        partial blobs into one probeable shard)."""
        if (other.n_buckets, other.slots) != (self.n_buckets, self.slots):
            raise ValueError("shard geometry mismatch")
        idx = np.flatnonzero(other.table.ravel())
        buckets = (idx // other.slots).astype(np.uint32)
        fps = other.table.ravel()[idx]
        if other.stash:
            st = np.fromiter(other.stash, dtype=np.uint64,
                             count=len(other.stash))
            buckets = np.r_[buckets, (st >> np.uint64(16)).astype(np.uint32)]
            fps = np.r_[fps, (st & np.uint64(0xFFFF)).astype(np.uint16)]
        self._insert_pairs(buckets, fps)


def build_shard_blob(hashes: np.ndarray, n_buckets: int = DEFAULT_N_BUCKETS,
                     slots: int = DEFAULT_SLOTS) -> bytes:
    shard = CuckooShard(n_buckets, slots)
    shard.add_hashes(hashes)
    return shard.to_blob()


def merge_shard_blobs(a: bytes, b: bytes) -> bytes:
    shard = CuckooShard.from_blob(a)
    shard.merge_from(CuckooShard.from_blob(b))
    return shard.to_blob()


def probe_shard_blob(blob: bytes, hashes: np.ndarray) -> np.ndarray:
    return CuckooShard.from_blob(blob).contains(hashes)


class CuckooShards:
    """Driver-side handle over all shards; same surface as BloomShards so
    the scheduler's broadcast probe path is filter-agnostic."""

    def __init__(self, n_shards: int = DEFAULT_N_SHARDS,
                 n_buckets: int = DEFAULT_N_BUCKETS,
                 slots: int = DEFAULT_SLOTS,
                 shards: dict[int, CuckooShard] | None = None):
        self.n_shards = n_shards
        self.n_buckets = n_buckets
        self.slots = slots
        self.shards = shards or {}

    def shard_of(self, hashes: np.ndarray) -> np.ndarray:
        """pmod semantics — must agree with the Spark F.pmod shard columns
        (see BloomShards.shard_of)."""
        return np.mod(np.asarray(hashes, dtype=np.int64),
                      np.int64(self.n_shards)).astype(np.int64)

    def _shard(self, s: int) -> CuckooShard:
        if s not in self.shards:
            self.shards[s] = CuckooShard(self.n_buckets, self.slots)
        return self.shards[s]

    def add_hashes(self, hashes: np.ndarray) -> None:
        hashes = np.asarray(hashes, dtype=np.int64)
        if not len(hashes):
            return
        sh = self.shard_of(hashes)
        for s in np.unique(sh):
            self._shard(int(s)).add_hashes(hashes[sh == s])

    def remove_hashes(self, hashes: np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        if not len(hashes):
            return out
        sh = self.shard_of(hashes)
        for s in np.unique(sh):
            shard = self.shards.get(int(s))
            if shard is None:
                continue
            mask = sh == s
            out[mask] = shard.remove_hashes(hashes[mask])
        return out

    def maybe_seen(self, hashes: pd.Series | np.ndarray) -> np.ndarray:
        hashes = np.asarray(hashes, dtype=np.int64)
        out = np.zeros(len(hashes), dtype=bool)
        if not len(hashes):
            return out
        sh = self.shard_of(hashes)
        for s in np.unique(sh):
            shard = self.shards.get(int(s))
            if shard is None:
                continue
            mask = sh == s
            out[mask] = shard.contains(hashes[mask])
        return out

    # -- persistence (same row shape as BloomShards: shard_id/round/blob) --

    def to_rows(self, round_no: int) -> list[tuple[int, int, bytes]]:
        return [(int(s), round_no, shard.to_blob())
                for s, shard in sorted(self.shards.items())]

    @classmethod
    def from_rows(cls, rows, n_shards: int = DEFAULT_N_SHARDS,
                  n_buckets: int = DEFAULT_N_BUCKETS,
                  slots: int = DEFAULT_SLOTS) -> "CuckooShards":
        shards: dict[int, CuckooShard] = {}
        for shard_id, _round, blob in rows:
            incoming = CuckooShard.from_blob(bytes(blob))
            cur = shards.get(shard_id)
            if cur is None:
                shards[shard_id] = incoming
            else:
                cur.merge_from(incoming)
        return cls(n_shards, n_buckets, slots, shards)


def probe_maybe_seen_cuckoo_df(candidates: DataFrame, shards_df: DataFrame,
                               n_shards: int, hash_col: str = "url_hash"
                               ) -> DataFrame:
    """Distributed probe, mirror of bloom.probe_maybe_seen_df: candidates
    cogrouped with their shard's per-round blobs; each task merges only
    its shard (a few hundred KiB) and probes vectorized — no shard ever
    visits the driver. Output = candidates + `maybe_seen` boolean."""
    out_schema = T.StructType(
        list(candidates.schema.fields)
        + [T.StructField("maybe_seen", T.BooleanType())]
    )
    out_cols = [f.name for f in out_schema.fields]
    shard_col = F.pmod(F.col(hash_col), F.lit(n_shards)).cast("int")
    cand = candidates.withColumn("_shard_id", shard_col)
    sh = shards_df.withColumnRenamed("shard_id", "_shard_id")

    def probe(cand_pdf: pd.DataFrame, shards_pdf: pd.DataFrame) -> pd.DataFrame:
        if cand_pdf.empty:
            return pd.DataFrame(columns=out_cols)
        shard: CuckooShard | None = None
        for bs in shards_pdf["bitset"]:
            incoming = CuckooShard.from_blob(bytes(bs))
            if shard is None:
                shard = incoming
            else:
                shard.merge_from(incoming)
        hashes = cand_pdf[hash_col].to_numpy()
        maybe = (np.zeros(len(hashes), dtype=bool) if shard is None
                 else shard.contains(hashes))
        out = cand_pdf.drop(columns=["_shard_id"]).copy()
        out["maybe_seen"] = maybe
        return out

    return (
        cand.groupBy("_shard_id")
        .cogroup(sh.groupBy("_shard_id"))
        .applyInPandas(probe, out_schema)
    )
