#!/usr/bin/env python
"""Round-4 on-TPU validation queue (run via scripts/tpu_claim_run.py).

Revalidates the routed engine after the round-4 changes (heavy sums routed
through perm_out instead of an XLA scatter on y; the t=1 second reduction
level fused into _w3_r3_reduce). Stages, selectable via R4_STAGES:

  routed_ab — caida_like through the in-process bench path with the A/B
              candidate set (PL_CSR_ROUTED_BF16 + PL_CSR_ROUTED): oracle
              check + slope timing, record to R4_OUT dir.
  profroute — routed stage-budget profile on caida_like (32-bit; must run
              before any f64 stage — x64 is process-sticky).
  webbase   — webbase_like (RoutedChunks heavy path) through the bench
              extended suite, bf16 candidate only.
  routed_f64— caida_like at float64 (df engine shares the heavy path).
"""
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

STAGES = os.environ.get(
    "R4_STAGES", "routed_ab,profroute,webbase,routed_f64"
).split(",")
OUT = os.environ.get("R4_OUT", "/tmp/r4bench")
os.makedirs(OUT, exist_ok=True)


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


from _payload_common import bench_inproc as _bench_inproc  # noqa: E402


def bench_inproc(subdir, **env):
    _bench_inproc(OUT, subdir, **env)


def stage_routed_ab():
    bench_inproc("f32", BENCH_ONLY="caida_like", BENCH_AB="1")


def stage_profroute():
    saved = sys.argv
    sys.argv = ["profile_routed.py", "caida_like"]
    try:
        runpy.run_path(
            os.path.join(REPO, "scripts", "profile_routed.py"),
            run_name="__main__",
        )
    finally:
        sys.argv = saved


def stage_webbase():
    bench_inproc("ext", BENCH_SUITE="extended", BENCH_ONLY="webbase_like")


def stage_routed_f64():
    bench_inproc("f64", SPMV_DTYPE="float64", BENCH_ONLY="caida_like")


for s in STAGES:
    banner(s)
    try:
        globals()[f"stage_{s}"]()
    except Exception as e:  # keep the queue moving; record the failure
        import traceback

        print(f"stage {s} FAILED: {e}", flush=True)
        traceback.print_exc()
