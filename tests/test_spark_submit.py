"""End-to-end spark-submit --py-files deployment test (north rule:
"launched via spark-submit --py-files on multi-executor clusters").

Builds the dist zip, copies the driver script into a scratch dir, and
runs the real ``spark-submit`` binary from there with a stripped
PYTHONPATH — so ``import cc_net_spark`` can only resolve from the
--py-files artifact, exactly as it would on a fresh cluster node.
"""

import json
import os
import shutil
import subprocess
import sys
from pathlib import Path

import duckdb

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO / "scripts"))
from make_pyfiles import build_zip  # noqa: E402

SPARK_SUBMIT = Path(__import__("pyspark").__file__).parent / "bin" / "spark-submit"

N = 80  # 10 groups of 8 roles: roles 0-4 cluster, 5-7 singletons


def _submit(tmp_path, master: str, extra_conf: list[str] = (), extra_args: list[str] = ()):
    zip_path = build_zip(tmp_path / "cc_net_spark.zip")
    driver = tmp_path / "submit_near_dup.py"
    shutil.copy(REPO / "scripts" / "submit_near_dup.py", driver)

    env = dict(os.environ)
    env.pop("PYTHONPATH", None)  # the zip must be the only package source
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    env["SPARK_WORKER_DIR"] = str(tmp_path / "worker")

    proc = subprocess.run(
        [
            str(SPARK_SUBMIT),
            "--master", master,
            "--driver-memory", "4g",
            "--conf", "spark.sql.shuffle.partitions=4",
            "--conf", "spark.ui.enabled=false",
            *extra_conf,
            "--py-files", str(zip_path),
            str(driver),
            "--clips", str(tmp_path / "clips"),
            "--workdir", str(tmp_path / "work"),
            "--output", str(tmp_path / "clusters"),
            "--generate", str(N),
            "--fused",
            *extra_args,
        ],
        cwd=tmp_path,
        env=env,
        capture_output=True,
        text=True,
        timeout=600,
    )
    assert proc.returncode == 0, f"spark-submit failed:\n{proc.stderr[-4000:]}"

    summary = json.loads(proc.stdout.strip().splitlines()[-1])
    assert summary["rows"] == N
    # per group of 8: one 5-member cluster + 3 singletons = 4 distinct ids
    assert summary["n_clusters"] == N // 8 * 4

    # independent re-read of the artifact the driver wrote
    con = duckdb.connect()
    rows, clusters = con.execute(
        "SELECT count(*), count(DISTINCT cluster_id) FROM "
        f"read_parquet('{tmp_path / 'clusters'}/*.parquet')"
    ).fetchone()
    assert (rows, clusters) == (N, N // 8 * 4)


def test_spark_submit_py_files_near_dup(tmp_path):
    _submit(tmp_path, "local[2]")


def test_spark_submit_multi_executor_local_cluster(tmp_path):
    """The north rule's literal deployment shape: spark-submit --py-files
    against a MULTI-EXECUTOR master. local-cluster[2,1,1536] launches two
    separate executor JVMs (own heap, shuffle server, python workers) that
    can only import cc_net_spark from the shipped --py-files zip — the
    exact contract of a fresh multi-node cluster, minus the network."""
    _submit(
        tmp_path,
        "local-cluster[2,1,1536]",
        extra_conf=["--conf", "spark.executor.memory=1g"],
    )


def test_spark_submit_int_ids_strict_validation(tmp_path):
    """The deployment CLI's --int-ids (surrogate-long pair path) and
    --validate-ids strict (pre-flight key check) flags work end-to-end
    through a real spark-submit; cluster COUNTS are id-space-invariant."""
    _submit(tmp_path, "local[2]",
            extra_args=["--int-ids", "--validate-ids", "strict"])
