"""Cheap contract checks on bench.py internals (no Spark sessions)."""
import importlib
import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
bench = importlib.import_module("bench")


def test_executor_leg_rejects_indivisible_core_count(monkeypatch):
    """Silently rounding cores to EXEC_CORES multiples would misreport
    the scaling-efficiency denominator (a cores=3 leg would really run
    one 2-core executor); the leg must refuse instead. Pin the width to
    2 — the default geometry is 1 core/executor, where every core count
    divides and the guard is vacuous."""
    monkeypatch.setattr(bench, "EXEC_CORES", 2)
    with pytest.raises(ValueError, match="not a multiple"):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)


def test_worker_dir_is_stable_across_calls(monkeypatch, tmp_path):
    """SPARK_WORKER_DIR must not leak a fresh temp dir per make_spark
    call; the indivisible-cores guard fires after the env setup, so the
    refused call still exercises the env path."""
    monkeypatch.setattr(bench, "EXEC_CORES", 2)
    monkeypatch.delenv("SPARK_WORKER_DIR", raising=False)
    with pytest.raises(ValueError):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)
    first = os.environ["SPARK_WORKER_DIR"]
    with pytest.raises(ValueError):
        bench.make_spark(bench.EXEC_CORES + 1, executors=True)
    assert os.environ["SPARK_WORKER_DIR"] == first
    assert os.path.isdir(first)


def test_default_geometry_is_single_core_executors():
    """Round-4 session 9: the recorded scaling basis is 1 executor x 1
    core vs 4 x 1 (geometry A/B in BENCH/BASELINE.md); EXEC_CORES=1
    unless the env restores the historical 2-core basis."""
    if "SPARK_GRAFT_EXEC_CORES" not in os.environ:
        assert bench.EXEC_CORES == 1


def test_raw_eff_best_of_per_leg():
    """The adaptive top-up decides on best-of-per-leg efficiency: each
    leg's min sample, so extra reps are monotone (can only move a leg
    toward its reproducible floor)."""
    legs = {2: [{"seconds": 100.0}, {"seconds": 80.0}],
            8: [{"seconds": 50.0}, {"seconds": 25.0}]}
    # best lo=80, best hi=25 -> (80/25)/4 = 0.8
    assert bench._raw_eff(legs, 2, 8) == pytest.approx(0.8)


def test_scaling_topup_knobs_parse():
    """SPARK_GRAFT_SCALING_TARGET / _BUDGET must exist with sane
    defaults: target inside (0,1], budget >= 0 (0 disables top-up)."""
    assert 0.0 < bench.SCALING_TARGET <= 1.0
    assert bench.SCALING_TOPUP_BUDGET >= 0.0
