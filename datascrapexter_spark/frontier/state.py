"""Checkpointed table state for the crawl engine.

Production target is Iceberg (`df.writeTo(tbl).append()` + snapshot-id
time travel; the frontier table bucketed by url_hash, identity-partitioned
by crawl round). This sandbox has no Iceberg runtime jar, so this module
implements the same contract over Parquet directories with an atomic JSON
snapshot manifest:

  {root}/{table}/data/<snapshot>-<uuid>/part-*.parquet   (immutable files)
  {root}/{table}/_snapshots.json                          (atomic pointer)

- append = write a NEW data directory, then atomically publish a new
  snapshot whose file list = previous snapshot's dirs + the new dir
  (no rewrite of existing data — O(delta), like an Iceberg append);
- overwrite = new snapshot referencing only the new dir;
- reads resolve the current snapshot's dir list (or any older snapshot id
  — time travel, which is what crash-resume uses);
- publishing is a tmp-file + os.replace, so a killed driver never leaves
  a torn manifest: resume sees the last fully committed snapshot.

The swap to real Iceberg is confined to this file.
"""

from __future__ import annotations

import json
import os
import uuid

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, root: str, name: str):
        self.dir = os.path.join(root, name)
        self.manifest_path = os.path.join(self.dir, "_snapshots.json")
        os.makedirs(os.path.join(self.dir, "data"), exist_ok=True)

    # -- manifest ---------------------------------------------------------

    def _read_manifest(self) -> dict:
        if not os.path.exists(self.manifest_path):
            return {"current": None, "snapshots": []}
        with open(self.manifest_path) as fh:
            return json.load(fh)

    def _publish(self, manifest: dict) -> None:
        tmp = self.manifest_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(manifest, fh)
        os.replace(tmp, self.manifest_path)  # atomic commit

    def snapshots(self) -> list[dict]:
        return self._read_manifest()["snapshots"]

    def current_snapshot_id(self) -> int | None:
        return self._read_manifest()["current"]

    def _dirs_for(self, snapshot_id: int | None) -> list[str]:
        m = self._read_manifest()
        sid = snapshot_id if snapshot_id is not None else m["current"]
        if sid is None:
            return []
        for snap in m["snapshots"]:
            if snap["id"] == sid:
                return snap["dirs"]
        raise KeyError(f"snapshot {sid} not found in {self.manifest_path}")

    # -- IO ---------------------------------------------------------------

    def _write_data_dir(self, df: DataFrame, snapshot_id: int) -> str:
        rel = f"data/{snapshot_id:06d}-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(os.path.join(self.dir, rel))
        return rel

    def _commit(self, dirs: list[str], meta: dict | None) -> int:
        m = self._read_manifest()
        sid = (m["current"] or 0) + 1
        m["snapshots"].append({"id": sid, "dirs": dirs, "meta": meta or {}})
        m["current"] = sid
        self._publish(m)
        return sid

    def append(self, df: DataFrame, meta: dict | None = None,
               base_snapshot_id: int | None = None) -> int:
        """Append a delta on top of `base_snapshot_id` (default: current).

        Passing the caller's last COMMITTED snapshot id makes appends safe
        across crash-resume: a crashed round may have published snapshots
        the round journal never committed, and appending onto `current`
        would silently resurrect that uncommitted data. The crawl engine
        always appends relative to its journal-committed snapshot."""
        rel = self._write_data_dir(df, (self.current_snapshot_id() or 0) + 1)
        return self._commit(self._dirs_for(base_snapshot_id) + [rel], meta)

    def overwrite(self, df: DataFrame, meta: dict | None = None) -> int:
        rel = self._write_data_dir(df, (self.current_snapshot_id() or 0) + 1)
        return self._commit([rel], meta)

    def read(self, spark: SparkSession, snapshot_id: int | None = None) -> DataFrame | None:
        dirs = self._dirs_for(snapshot_id)
        if not dirs:
            return None
        paths = [os.path.join(self.dir, d) for d in dirs]
        return spark.read.parquet(*paths)

    def exists(self) -> bool:
        return self.current_snapshot_id() is not None


class StateStore:
    """All engine state tables under one root + a round-commit journal.

    A crawl round is committed by `commit_round(round_no, snapshot_ids)`:
    resume reads the highest committed round and time-travels every table
    back to the snapshot ids recorded for it (so a crash mid-round replays
    that round from its start — per north_rule, resumable mid-crawl)."""

    TABLES = ("frontier", "frontier_updates", "frontier_archive", "url_seen",
              "bloom_shards", "domain_state", "pagination_state", "crawl_log",
              "lineage_metrics", "request_metrics", "extraction_metrics",
              "round_metrics")

    def __init__(self, root: str):
        self.root = root
        os.makedirs(root, exist_ok=True)
        self.tables = {name: SnapshotTable(root, name) for name in self.TABLES}
        self.journal_path = os.path.join(root, "_rounds.json")

    def __getitem__(self, name: str) -> SnapshotTable:
        return self.tables[name]

    def commit_round(self, round_no: int, snapshot_ids: dict[str, int | None]) -> None:
        journal = self._read_journal()
        journal["rounds"].append({"round": round_no, "snapshots": snapshot_ids})
        tmp = self.journal_path + f".tmp-{uuid.uuid4().hex}"
        with open(tmp, "w") as fh:
            json.dump(journal, fh)
        os.replace(tmp, self.journal_path)

    def _read_journal(self) -> dict:
        if not os.path.exists(self.journal_path):
            return {"rounds": []}
        with open(self.journal_path) as fh:
            return json.load(fh)

    def last_committed_round(self) -> dict | None:
        rounds = self._read_journal()["rounds"]
        return rounds[-1] if rounds else None
