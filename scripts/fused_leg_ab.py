"""Interleaved matched-window A/B: staged vs fused pipeline shape on the
scaling legs (geometry B: 1 executor x 1 core vs 4 x 1).

Hypothesis: the fused shape (3 stage commits: signatures -> edges ->
clusters) removes ~3 stage-table commits + their manifest/job barriers
relative to the staged shape (6 commits), a core-count-INVARIANT cost
that the 1-core lo leg pays serially — so fused should lower the lo leg
more than the hi leg and raise raw scaling efficiency.
"""
import json
import os
import subprocess
import sys

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "2"))
N = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "120000"))
CLIPS = os.environ.get("CLIPS_PATH", "/tmp/geom_b_rec_clips/clips.parquet")

legs: dict[tuple[str, int], list[dict]] = {}
for rep in range(REPS):
    for shape, fused in (("staged", "0"), ("fused", "1")):
        for cores in (1, 4):
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALE_MODE="executors",
                SPARK_GRAFT_EXEC_CORES="1",
                SPARK_GRAFT_SCALING_CLIPS=str(N),
                SPARK_GRAFT_LEG_FUSED=fused,
            )
            p = subprocess.run(
                [sys.executable, "bench.py", "--leg", str(cores), CLIPS],
                capture_output=True, text=True, env=env,
            )
            if p.returncode != 0:
                print("FAIL", shape, cores, p.stderr[-800:])
                sys.exit(1)
            rec = json.loads(p.stdout.strip().splitlines()[-1])
            legs.setdefault((shape, cores), []).append(rec)
            print(json.dumps({
                "shape": shape, "cores": cores, "rep": rep,
                "sec": rec["seconds"], "ctl": rec["control_seconds"],
                "spin": rec["spin_ops_per_sec"],
                "membw": rec["membw_bytes_per_sec"],
                "recall": rec["dup_pair_recall"],
            }), flush=True)

for shape in ("staged", "fused"):
    lo = min(r["seconds"] for r in legs[(shape, 1)])
    hi = min(r["seconds"] for r in legs[(shape, 4)])
    clo = min(r["control_seconds"] for r in legs[(shape, 1)])
    chi = min(r["control_seconds"] for r in legs[(shape, 4)])
    eff = (lo / hi) / 4
    ceff = (clo / chi) / 4
    print(json.dumps({
        "shape": shape, "lo_s": lo, "hi_s": hi,
        "raw_eff": round(eff, 3), "control_eff": round(ceff, 3),
        "vs_control": round(eff / ceff, 3),
    }))
