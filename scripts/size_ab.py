"""Interleaved matched-window A/B: scaling-leg efficiency at two corpus sizes."""
import json, os, subprocess, sys
os.chdir('/root/repo')
REPS = int(os.environ.get("REPS", "2"))
legs = {}  # (size, cores) -> [records]
cases = [(120000, "/tmp/prof/clips120k.parquet"), (240000, "/tmp/prof/clips240k.parquet")]
for rep in range(REPS):
    for n, path in cases:
        for cores in (2, 8):
            env = dict(os.environ, SPARK_GRAFT_SCALING_CLIPS=str(n))
            p = subprocess.run([sys.executable, "bench.py", "--leg", str(cores), path],
                               capture_output=True, text=True, env=env)
            if p.returncode != 0:
                print("FAIL", n, cores, p.stderr[-800:]); sys.exit(1)
            rec = json.loads(p.stdout.strip().splitlines()[-1])
            legs.setdefault((n, cores), []).append(rec)
            print(json.dumps({"n": n, "cores": cores, "rep": rep,
                              "sec": rec["seconds"], "ctl": rec["control_seconds"],
                              "spin": rec["spin_ops_per_sec"], "membw": rec["membw_bytes_per_sec"],
                              "recall": rec["dup_pair_recall"]}), flush=True)
for n, _ in cases:
    lo = min(r["seconds"] for r in legs[(n, 2)])
    hi = min(r["seconds"] for r in legs[(n, 8)])
    clo = min(r["control_seconds"] for r in legs[(n, 2)])
    chi = min(r["control_seconds"] for r in legs[(n, 8)])
    eff = (lo/hi)/4; ceff = (clo/chi)/4
    print(json.dumps({"n": n, "lo": lo, "hi": hi, "raw_eff": round(eff,3),
                      "control_eff": round(ceff,3), "vs_control": round(eff/ceff,3)}))
