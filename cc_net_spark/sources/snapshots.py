"""Snapshot table layer — Iceberg-style commit semantics on plain Parquet.

The north rule's table layer is Iceberg; this sandbox has no Iceberg
runtime jar, so round 2 documented a *mapping* (Parquet directory ==
table, manifest == snapshot) without code. This module implements the
mapping for real, with the exact commit semantics the engine's resume
and incremental-dedup layers rely on — swap `SnapshotTable` for a real
Iceberg catalog table and the call sites keep their contracts:

* every write is an immutable SNAPSHOT: a JSON manifest listing the
  parquet data files (by content: rows/bytes), its parent, and the
  operation (`append` / `overwrite` / `merge`). Data files are never
  mutated — appends add files, overwrites/merges swap the *file list*,
  old snapshots stay readable (time travel),
* commits are ATOMIC: manifest written to a tmp name then os.rename'd;
  the CURRENT pointer is a one-line file swapped the same way. A crash
  mid-write can never produce a half-visible snapshot (the Iceberg
  metadata-pointer model, public spec),
* `merge_into(updates, keys)` is copy-on-write MERGE INTO: rows whose
  keys appear in `updates` are replaced, everything else is carried —
  one anti-join + union, committed as a new snapshot,
* `expire_snapshots(keep_last)` deletes manifests older than the
  retention window and any data file no retained snapshot references —
  the `expire_snapshots` maintenance action,
* `snapshots()` / `read(snapshot_id)` expose lineage + time travel.

Single-writer by design (the engine's DAG runner serializes stage
commits); a real catalog adds optimistic concurrency on the pointer
swap — documented, not needed in-process.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from pathlib import Path

from pyspark.sql import DataFrame, SparkSession


class SnapshotTable:
    def __init__(self, spark: SparkSession, path: str | Path):
        self.spark = spark
        self.root = Path(path)
        (self.root / "data").mkdir(parents=True, exist_ok=True)
        (self.root / "_snapshots").mkdir(parents=True, exist_ok=True)

    # -- metadata ------------------------------------------------------------
    def _current_path(self) -> Path:
        return self.root / "_snapshots" / "CURRENT"

    def current_snapshot_id(self) -> int | None:
        p = self._current_path()
        if not p.exists():
            return None
        return int(p.read_text().strip())

    def _manifest_path(self, sid: int) -> Path:
        return self.root / "_snapshots" / f"v{sid:06d}.json"

    def manifest(self, sid: int | None = None) -> dict | None:
        sid = sid if sid is not None else self.current_snapshot_id()
        if sid is None:
            return None
        return json.loads(self._manifest_path(sid).read_text())

    def snapshots(self) -> list[dict]:
        out = []
        for p in sorted((self.root / "_snapshots").glob("v*.json")):
            out.append(json.loads(p.read_text()))
        return out

    # -- reads ---------------------------------------------------------------
    def read(self, snapshot_id: int | None = None) -> DataFrame:
        """Current table state, or time travel to an older snapshot."""
        m = self.manifest(snapshot_id)
        if m is None or not m["files"]:
            raise ValueError("table has no committed snapshot (or it is empty)")
        paths = [str(self.root / f["path"]) for f in m["files"]]
        return self.spark.read.parquet(*paths)

    def rows(self, snapshot_id: int | None = None) -> int:
        """Committed row count — manifest lookup, no Spark job."""
        m = self.manifest(snapshot_id)
        return sum(f["rows"] for f in m["files"]) if m else 0

    # -- commits -------------------------------------------------------------
    def _write_data(self, df: DataFrame) -> list[dict]:
        """Materialize df into a fresh immutable batch dir; return file
        records (relative path, rows, bytes) from the Parquet footers."""
        import pyarrow.parquet as pq

        batch = f"data/batch-{uuid.uuid4().hex[:12]}"
        tmp = self.root / f"_tmp-{uuid.uuid4().hex[:8]}"
        df.write.mode("overwrite").parquet(str(tmp))
        os.rename(tmp, self.root / batch)
        recs = []
        for f in sorted((self.root / batch).glob("*.parquet")):
            md = pq.ParquetFile(f).metadata
            recs.append(
                {
                    "path": f"{batch}/{f.name}",
                    "rows": md.num_rows,
                    "bytes": f.stat().st_size,
                }
            )
        return recs

    def _commit(self, files: list[dict], operation: str) -> int:
        parent = self.current_snapshot_id()
        sid = (parent or 0) + 1
        manifest = {
            "snapshot_id": sid,
            "parent_id": parent,
            "operation": operation,
            "files": files,
            "total_rows": sum(f["rows"] for f in files),
        }
        mp = self._manifest_path(sid)
        tmp = mp.with_suffix(".json.tmp")
        tmp.write_text(json.dumps(manifest, indent=2))
        os.rename(tmp, mp)  # atomic: manifest appears fully-formed or not
        cur_tmp = self._current_path().with_suffix(".tmp")
        cur_tmp.write_text(str(sid))
        os.rename(cur_tmp, self._current_path())  # atomic pointer swap
        return sid

    def append(self, df: DataFrame) -> int:
        """Commit df's rows on top of the current snapshot (new files only
        are written — write cost ∝ batch, the incremental-dedup contract)."""
        new = self._write_data(df)
        prev = self.manifest()
        files = (prev["files"] if prev else []) + new
        return self._commit(files, "append")

    def overwrite(self, df: DataFrame) -> int:
        """Commit df as the table's entire new state. Old files stay on
        disk, referenced by older snapshots (time travel) until expired."""
        return self._commit(self._write_data(df), "overwrite")

    def merge_into(self, updates: DataFrame, keys: list[str]) -> int:
        """Copy-on-write MERGE INTO: delete current rows whose key matches
        `updates`, insert all of `updates` (upsert). One anti-join + union."""
        if self.current_snapshot_id() is None:
            return self.overwrite(updates)
        cur = self.read()
        survivors = cur.join(updates.select(*keys).distinct(), keys, "left_anti")
        return self._commit(
            self._write_data(survivors.unionByName(updates)), "merge"
        )

    # -- maintenance -----------------------------------------------------------
    def expire_snapshots(self, keep_last: int = 1) -> dict:
        """Drop all but the newest `keep_last` snapshots and delete data
        files no retained snapshot references. Returns counters."""
        snaps = self.snapshots()
        if len(snaps) <= keep_last:
            return {"snapshots_expired": 0, "files_deleted": 0}
        retained = snaps[-keep_last:]
        expired = snaps[:-keep_last]
        keep_files = {f["path"] for m in retained for f in m["files"]}
        deleted = 0
        for m in expired:
            for f in m["files"]:
                if f["path"] in keep_files:
                    continue
                p = self.root / f["path"]
                if p.exists():
                    p.unlink()
                    deleted += 1
            self._manifest_path(m["snapshot_id"]).unlink()
        # sweep now-empty batch dirs
        for d in (self.root / "data").iterdir():
            if d.is_dir() and not any(d.iterdir()):
                shutil.rmtree(d)
        return {"snapshots_expired": len(expired), "files_deleted": deleted}
