"""Probe-gated geometry-B scaling run: 1 executor x 1 core vs 4 x 1,
using bench.run_scaling's own interleave + adaptive top-up machinery so
per-leg best-of converges to the reproducible floor. Records the gate
probes and the full scaling dict to stdout as one JSON line.
"""
import json
import os
import sys
import tempfile

os.environ.setdefault("SPARK_GRAFT_SCALE_LO", "1")
os.environ.setdefault("SPARK_GRAFT_SCALE_HI", "4")
os.environ.setdefault("SPARK_GRAFT_EXEC_CORES", "1")
os.environ.setdefault("SPARK_GRAFT_SCALING_TARGET", "0.8")
os.environ.setdefault("SPARK_GRAFT_SCALING_BUDGET", "900")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import bench

probe = bench.wait_for_window("pre_scaling_geom_b")
scaling = bench.run_scaling(tempfile.mkdtemp(prefix="geom_b_"))
print(json.dumps({"window_probe": probe, "scaling": scaling}))
