"""Resumable stage DAG with per-stage lineage + metrics.

Spark-native replacement for the reference's file-level idempotence
(skip-if-output-exists at ``cc_net/mine.py:254-257,312-321`` and atomic
tmp->rename at ``cc_net/mine.py:221-234``):

* each stage materializes ONE Parquet table under ``workdir/<stage>``
  (written to a tmp dir then atomically renamed — a crash mid-write can
  never be mistaken for a completed stage),
* a manifest JSON under ``workdir/_manifest/<stage>.json`` commits the
  stage: rows written, input stage fingerprints, free-form metrics,
* re-running the DAG skips every stage whose manifest + data exist AND
  whose recorded input fingerprints still match (lineage-aware resume,
  per the north rule "resumable from checkpoint with per-partition
  lineage + metrics"),
* ``lineage()``/``metrics()`` expose the records as DataFrames.

With an Iceberg catalog configured the same layer maps onto table
snapshots + commit metadata; Parquet-directory mode is the dependency-free
default used in this environment (no Iceberg runtime jar available).
"""

from __future__ import annotations

import json
import os
import shutil
import time
import uuid
from dataclasses import dataclass, field
from pathlib import Path
from typing import Callable

from pyspark.sql import DataFrame, SparkSession


@dataclass
class Stage:
    name: str
    build: Callable[..., DataFrame]  # (spark, **input_dfs) -> DataFrame
    inputs: list[str] = field(default_factory=list)
    # optional callable computing extra metrics from the materialized output
    metrics_fn: Callable[[DataFrame], dict] | None = None


class StageRunner:
    def __init__(self, spark: SparkSession, workdir: str | Path):
        self.spark = spark
        self.workdir = Path(workdir)
        (self.workdir / "_manifest").mkdir(parents=True, exist_ok=True)

    # -- paths -------------------------------------------------------------
    def data_path(self, stage: str) -> Path:
        return self.workdir / stage

    def manifest_path(self, stage: str) -> Path:
        return self.workdir / "_manifest" / f"{stage}.json"

    # -- manifest ----------------------------------------------------------
    def read_manifest(self, stage: str) -> dict | None:
        p = self.manifest_path(stage)
        if not p.exists():
            return None
        return json.loads(p.read_text())

    def _fingerprint(self, stage: str) -> str:
        m = self.read_manifest(stage)
        return m["fingerprint"] if m else ""

    def is_complete(self, stage: Stage) -> bool:
        m = self.read_manifest(stage.name)
        if m is None or not (self.data_path(stage.name) / "_SUCCESS").exists():
            return False
        expected = {i: self._fingerprint(i) for i in stage.inputs}
        return m.get("input_fingerprints", {}) == expected

    # -- execution ---------------------------------------------------------
    def load(self, stage_name: str) -> DataFrame:
        return self.spark.read.parquet(str(self.data_path(stage_name)))

    def run(self, stages: list[Stage], force: bool = False) -> dict[str, dict]:
        """Run stages in order; returns {stage: manifest}. Completed stages
        (manifest + data + matching input lineage) are skipped."""
        results: dict[str, dict] = {}
        for st in stages:
            if not force and self.is_complete(st):
                results[st.name] = {**self.read_manifest(st.name), "skipped": True}
                continue
            t0 = time.time()
            inputs = {name: self.load(name) for name in st.inputs}
            df = st.build(self.spark, **inputs)

            final = self.data_path(st.name)
            tmp = self.workdir / f"_tmp-{st.name}-{uuid.uuid4().hex[:8]}"
            df.write.mode("overwrite").parquet(str(tmp))
            if final.exists():
                shutil.rmtree(final)
            os.rename(tmp, final)

            out = self.load(st.name)
            n_rows = out.count()
            n_files = len(list(final.glob("*.parquet")))
            extra = st.metrics_fn(out) if st.metrics_fn else {}
            manifest = {
                "stage": st.name,
                "rows": n_rows,
                "files": n_files,
                "wall_seconds": round(time.time() - t0, 3),
                "input_fingerprints": {i: self._fingerprint(i) for i in st.inputs},
                "fingerprint": uuid.uuid4().hex,
                "metrics": extra,
            }
            self.manifest_path(st.name).write_text(json.dumps(manifest, indent=2))
            results[st.name] = manifest
        return results

    # -- lineage / metrics tables -------------------------------------------
    def lineage(self) -> DataFrame:
        rows = []
        for p in sorted((self.workdir / "_manifest").glob("*.json")):
            m = json.loads(p.read_text())
            for inp, fp in m.get("input_fingerprints", {}).items():
                rows.append((m["stage"], inp, fp, m["fingerprint"]))
            if not m.get("input_fingerprints"):
                rows.append((m["stage"], None, None, m["fingerprint"]))
        return self.spark.createDataFrame(
            rows, "stage string, input_stage string, input_fingerprint string, fingerprint string"
        )

    def metrics(self) -> DataFrame:
        rows = []
        for p in sorted((self.workdir / "_manifest").glob("*.json")):
            m = json.loads(p.read_text())
            rows.append(
                (m["stage"], m["rows"], m["files"], m["wall_seconds"], json.dumps(m["metrics"]))
            )
        return self.spark.createDataFrame(
            rows, "stage string, rows long, files long, wall_seconds double, metrics_json string"
        )
