#!/usr/bin/env python
"""Round-4c on-TPU queue (run via scripts/tpu_claim_run.py).

Stage groups are selected via R4C_STAGES; run f32 and f64 groups in
SEPARATE processes (jax_enable_x64 is process-sticky — a f64 stage
poisons later f32 traces).

  f32 group (R4C_STAGES=hl_suite,ext_suite):
    hl_suite — full f32 headline suite -> R4C_OUT/hl/BENCH_DETAILS.json
               (refresh after the round-4 routed changes).
    ext_suite— full f32 extended suite (5 rows incl. sg_like +
               cube_coup_like) -> R4C_OUT/ext/.

  f64 group (R4C_STAGES=df_raefsky,f64_suite,f64_ext): with the
    window-presplit + x-window-side DIA presplit kernels
    (ops/dfloat.py df_mul_acc_presplit_b / two_prod_presplit_a).
    df_raefsky — f64 BENCH_ONLY=raefsky1_like A/B check first (the
                 streamed-presplit variant measured 41.7 GF/s vs 49.5
                 baseline and was replaced; expect >= baseline now).
    f64_suite  — full f64 suite -> R4C_OUT/f64/.
    f64_ext    — extended f64 suite -> R4C_OUT/extf64/.

  sweep group (R4C_STAGES=sweep): bench/sweep.py over ALL synthetic
    presets x the reference's 6-grid list (testAll.sh:13-38 analog),
    log -> scripts/sweep_tpu_r4.log (rows flush incrementally; an outer
    timeout only truncates the tail).  Smallest matrices first.
"""
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
os.chdir(REPO)

STAGES = os.environ.get("R4C_STAGES", "hl_suite,ext_suite").split(",")
OUT = os.environ.get("R4C_OUT", "/tmp/r4cbench")
os.makedirs(OUT, exist_ok=True)


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


from _payload_common import bench_inproc as _bench_inproc  # noqa: E402


def bench_inproc(subdir, **env):
    _bench_inproc(OUT, subdir, **env)


def stage_hl_suite():
    bench_inproc("hl")


def stage_ext_suite():
    bench_inproc("ext", BENCH_SUITE="extended")


def stage_df_raefsky():
    bench_inproc("raef", SPMV_DTYPE="float64", BENCH_ONLY="raefsky1_like")


def stage_f64_suite():
    bench_inproc("f64", SPMV_DTYPE="float64")


def stage_f64_ext():
    bench_inproc("extf64", SPMV_DTYPE="float64", BENCH_SUITE="extended")


SWEEP_ORDER = [
    "west2021_like", "delaunay_n12_like", "cavity10_like",
    "raefsky1_like", "sg_like", "caida_like", "fem_3d_thermal2_like",
    "webbase_like", "thermal2_like", "cube_coup_like",
]


def stage_sweep():
    from spmv_openmp_cuda_tpu.bench import sweep as sw

    log_path = os.path.join(REPO, "scripts", "sweep_tpu_r4.log")
    rc = sw.main(SWEEP_ORDER + ["--full-grids", "--log", log_path])
    print(f"sweep rc={rc}", flush=True)


for s in STAGES:
    banner(s)
    try:
        globals()[f"stage_{s}"]()
    except Exception as e:  # keep the queue moving; record the failure
        import traceback

        print(f"stage {s} FAILED: {e}", flush=True)
        traceback.print_exc()
