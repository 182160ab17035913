"""Cheap contract checks on bench.py internals (no Spark sessions)."""
import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
bench = importlib.import_module("bench")


def test_executor_leg_rejects_indivisible_core_count():
    """Silently rounding cores to EXEC_CORES multiples would misreport
    the scaling-efficiency denominator (a cores=1 leg would really run
    a 2-core executor); the leg must refuse instead."""
    assert bench.EXEC_CORES > 1  # guard is only meaningful then
    with pytest.raises(ValueError, match="not a multiple"):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)


def test_worker_dir_is_stable_across_calls(monkeypatch, tmp_path):
    """SPARK_WORKER_DIR must not leak a fresh temp dir per make_spark
    call; the indivisible-cores guard fires after the env setup, so the
    refused call still exercises the env path."""
    monkeypatch.delenv("SPARK_WORKER_DIR", raising=False)
    with pytest.raises(ValueError):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)
    first = os.environ["SPARK_WORKER_DIR"]
    with pytest.raises(ValueError):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)
    assert os.environ["SPARK_WORKER_DIR"] == first
    assert os.path.isdir(first)
