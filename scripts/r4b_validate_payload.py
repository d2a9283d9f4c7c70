#!/usr/bin/env python
"""Round-4b on-TPU validation queue (run via scripts/tpu_claim_run.py).

Validates the df-DIA presplit work (prepare-time Veltkamp split of the
matrix slab + once-per-step split of the staged x window:
ops/dfloat.py::df_mul_acc_presplit) on the real chip, then refreshes the
f64 records.  Stages, selectable via R4B_STAGES:

  df_cli     — CLI drive of an f64 banded matrix through PL_DIA_F64 with
               --check (end-to-end verify surface: mmio -> prepare ->
               presplit Mosaic kernel -> oracle check -> dumps).
  df_raefsky — f64 BENCH_ONLY=raefsky1_like (PL_DIA_RESID_F64 presplit):
               the VERDICT weak row (was 1.06x / 49.5 GF/s).
  f64_suite  — full f64 suite -> R4B_OUT/f64/BENCH_DETAILS_F64.json.
  f64_ext    — extended f64 suite -> R4B_OUT/ext/.
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
    "R4B_STAGES", "df_cli,df_raefsky,f64_suite,f64_ext"
).split(",")
OUT = os.environ.get("R4B_OUT", "/tmp/r4bbench")
os.makedirs(OUT, exist_ok=True)


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


from _payload_common import bench_inproc as _bench_inproc  # noqa: E402


def bench_inproc(subdir, **env):
    _bench_inproc(OUT, subdir, **env)


def stage_df_cli():
    from spmv_openmp_cuda_tpu.utils import synth
    from spmv_openmp_cuda_tpu.io.mmio import write_mtx

    path = os.path.join(OUT, "vfy_df.mtx")
    write_mtx(path, synth.banded(40000, 40000, 9, fill=0.95, seed=7))
    saved = sys.argv
    sys.argv = [
        "spmv", path, "RNDVECT", "PL_DIA_F64", "--check", "--dtype",
        "float64",
    ]
    try:
        from spmv_openmp_cuda_tpu.cli import main

        rc = main(sys.argv[1:])
        print(f"df_cli rc={rc}", flush=True)
    finally:
        sys.argv = saved


def stage_df_raefsky():
    bench_inproc("raef", SPMV_DTYPE="float64", BENCH_ONLY="raefsky1_like")


def stage_f64_suite():
    bench_inproc("f64", SPMV_DTYPE="float64")


def stage_f64_ext():
    bench_inproc("ext", SPMV_DTYPE="float64", BENCH_SUITE="extended")


for s in STAGES:
    banner(s)
    try:
        globals()[f"stage_{s}"]()
    except Exception as e:  # keep the queue moving; record the failure
        import traceback

        print(f"stage {s} FAILED: {e}", flush=True)
        traceback.print_exc()
