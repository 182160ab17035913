"""Interleaved matched-window A/B: scaling-leg efficiency at two executor
GEOMETRIES on the same 120k-clip input.

  A (recorded default): lo = 1 executor x 2 cores, hi = 4 x 2 (2 vs 8 cores)
  B (rule-literal):     lo = 1 executor x 1 core,  hi = 4 x 1 (1 vs 4 cores)

Rationale for B: the north rule's phrasing is "N and 4N executors" — the
executor is the scaling unit, not the core. On this single-socket box the
hi leg's extra cores contend for one memory-bandwidth domain, a contention
that does NOT exist when a real cluster adds 3 more machines; fewer cores
per leg keeps both legs inside the same contention regime, so geometry B
is the closer stand-in for the multi-machine regime the rule describes.
The control job (same Spark machinery, compute-bound kernel) rides every
leg so the framework+box ceiling is measured per-geometry too.
"""
import json
import os
import subprocess
import sys

os.chdir(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
REPS = int(os.environ.get("REPS", "2"))
N = int(os.environ.get("SPARK_GRAFT_SCALING_CLIPS", "120000"))
CLIPS = os.environ.get("CLIPS_PATH", "/tmp/geom_ab/clips120k.parquet")

GEOMS = {
    "A_2v8_ec2": {"lo": 2, "hi": 8, "exec_cores": 2},
    "B_1v4_ec1": {"lo": 1, "hi": 4, "exec_cores": 1},
}

if not os.path.exists(os.path.join(CLIPS, "_SUCCESS")):
    sys.path.insert(0, os.getcwd())
    import bench
    from cc_net_spark.sources import synth

    s0 = bench.make_spark(8)
    try:
        synth.generate_clips(
            s0, N, seed=42, with_audio=False, size_scale=bench.SIZE_SCALE,
            partitions=64,
        ).write.mode("overwrite").parquet(CLIPS)
    finally:
        s0.stop()

legs: dict[tuple[str, int], list[dict]] = {}
for rep in range(REPS):
    for gname, g in GEOMS.items():
        for cores in (g["lo"], g["hi"]):
            env = dict(
                os.environ,
                SPARK_GRAFT_SCALE_MODE="executors",
                SPARK_GRAFT_EXEC_CORES=str(g["exec_cores"]),
                SPARK_GRAFT_SCALING_CLIPS=str(N),
            )
            p = subprocess.run(
                [sys.executable, "bench.py", "--leg", str(cores), CLIPS],
                capture_output=True, text=True, env=env,
            )
            if p.returncode != 0:
                print("FAIL", gname, cores, p.stderr[-1200:])
                sys.exit(1)
            rec = json.loads(p.stdout.strip().splitlines()[-1])
            legs.setdefault((gname, cores), []).append(rec)
            print(json.dumps({
                "geom": gname, "cores": cores, "rep": rep,
                "sec": rec["seconds"], "ctl": rec["control_seconds"],
                "spin": rec["spin_ops_per_sec"],
                "membw": rec["membw_bytes_per_sec"],
                "recall": rec["dup_pair_recall"],
            }), flush=True)

for gname, g in GEOMS.items():
    lo = min(r["seconds"] for r in legs[(gname, g["lo"])])
    hi = min(r["seconds"] for r in legs[(gname, g["hi"])])
    clo = min(r["control_seconds"] for r in legs[(gname, g["lo"])])
    chi = min(r["control_seconds"] for r in legs[(gname, g["hi"])])
    ratio = g["hi"] / g["lo"]
    eff = (lo / hi) / ratio
    ceff = (clo / chi) / ratio
    print(json.dumps({
        "geom": gname, "lo_s": lo, "hi_s": hi,
        "lo_cps": round(N / lo, 1), "hi_cps": round(N / hi, 1),
        "raw_eff": round(eff, 3), "control_eff": round(ceff, 3),
        "vs_control": round(eff / ceff, 3),
    }))
