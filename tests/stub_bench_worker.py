"""Stub bench worker for orchestrator tests: lands fake results instantly,
or stalls forever on presets named in STUB_STALL (after writing the .cand
marker, like a real worker stuck in a remote compile). Appends every plan
it receives to STUB_LOG so tests can verify retry/fallback plan rewrites.
Exits 3 (pool down) STUB_POOL_DOWN times before serving."""
import json
import os
import sys
import time

plan_path = os.environ["BENCH_WORKER_PLAN"]
outdir = os.environ["BENCH_WORKER_OUT"]

downs = int(os.environ.get("STUB_POOL_DOWN", "0"))
marker = os.path.join(outdir, "pool_down_count")
seen = 0
if os.path.exists(marker):
    with open(marker) as f:
        seen = int(f.read() or 0)
if seen < downs:
    with open(marker, "w") as f:
        f.write(str(seen + 1))
    sys.exit(3)

with open(plan_path) as f:
    plan = json.load(f)
log = os.environ.get("STUB_LOG")
if log:
    with open(log, "a") as f:
        f.write(json.dumps(plan["proxies"]) + "\n")
stall = set(filter(None, os.environ.get("STUB_STALL", "").split(",")))

for p in plan["proxies"]:
    preset = p["preset"]
    with open(os.path.join(outdir, preset + ".cand"), "w") as f:
        json.dump({"name": p["cands"][0], "ts": time.time()}, f)
    if preset in stall:
        time.sleep(3600)
    detail = {
        "matrix": preset,
        "m": 10,
        "n": 10,
        "nnz": 100,
        "kernel": p["cands"][0],
        "config": "",
        "time_s": 1e-6,
        "gflops": 2.0 * p["ref"],
        "ref_gflops": p["ref"],
        "ratio": 2.0,
        "dtype": plan["dtype"],
        "result_dtype": "float32",
    }
    with open(os.path.join(outdir, preset + ".done"), "w") as f:
        json.dump(detail, f)
sys.exit(0)
