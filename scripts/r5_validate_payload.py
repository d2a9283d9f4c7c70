#!/usr/bin/env python
"""Round-5 on-TPU queue (run via scripts/tpu_claim_run.py).

Run f32 and f64 stage groups in SEPARATE processes (jax_enable_x64 is
process-sticky — a f64 stage poisons later f32 traces).

  f32 group (R5_STAGES=verify_cli,hl_suite,ext_suite,sg_audit):
    verify_cli — the verify skill's fast end-to-end drive: synth fixture
                 through the CLI with --check (AUTO + one forced mode).
    hl_suite   — full f32 headline refresh -> R5_OUT/hl/.
    ext_suite  — full f32 extended suite -> R5_OUT/ext/.
    sg_audit   — the adversarial no-locality SG twin (sg_rand_like):
                 measured lower bound for the structure-unverified SG row.
    sweep      — bench/sweep.py over ALL synthetic presets x the
                 reference's 6-grid list (testAll.sh:13-38 analog), log ->
                 scripts/sweep_tpu_r5.log (rows flush incrementally).

  f64 group (R5_STAGES=f64_raefsky_ab,f64_suite,f64_ext):
    f64_raefsky_ab — raefsky df A/B: window-df vs the DIA-resid holder.
    f64_suite      — full f64 six-proxy suite -> R5_OUT/f64/.
    f64_ext        — extended f64 suite -> R5_OUT/extf64/
                     (the BENCH_DETAILS_EXTENDED_F64 record, round-4
                     task that was coded but never produced).

(The round-5 window packed-pair / batched A/B stages that ran earlier in
the round measured losers and were deleted with the code they tested;
artifacts: scripts/sample_ab_window_r5*.log.)
"""
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
os.chdir(REPO)

from _payload_common import bench_inproc as _bi, run_stages  # noqa: E402

STAGES = os.environ.get(
    "R5_STAGES", "verify_cli,hl_suite,ext_suite,sg_audit"
).split(",")
OUT = os.environ.get("R5_OUT", "/tmp/r5bench")
os.makedirs(OUT, exist_ok=True)


def bench_inproc(subdir, **env):
    _bi(OUT, subdir, **env)


def stage_verify_cli():
    # in-process (runpy): the payload already holds the exclusive TPU
    # claim, a CLI subprocess could not claim it again
    import runpy

    from spmv_openmp_cuda_tpu.utils import synth
    from spmv_openmp_cuda_tpu.io.mmio import write_mtx

    write_mtx("/tmp/vfy_r5.mtx", synth.banded(2000, 2000, 8, fill=0.9, seed=7))
    for mode in ("AUTO", "PL_CSR_WINDOW_BF16"):
        t0 = time.time()
        saved = sys.argv
        sys.argv = ["spmv", "/tmp/vfy_r5.mtx", "RNDVECT", mode, "--check",
                    "--no-dump"]
        try:
            runpy.run_module("spmv_openmp_cuda_tpu", run_name="__main__")
            rc = 0
        except SystemExit as e:
            rc = e.code or 0
        finally:
            sys.argv = saved
        print(f"[verify_cli] {mode} rc={rc} ({time.time()-t0:.0f}s)",
              flush=True)


def stage_hl_suite():
    bench_inproc("hl")


def stage_ext_suite():
    bench_inproc("ext", BENCH_SUITE="extended")


def stage_sg_audit():
    import json

    import bench as B

    cfg = B.make_cfg("float32")
    det = B.measure_proxy(
        "sg_rand_like", 2.25, ["PL_CSR_ROUTED_BF16"], cfg
    )
    out = os.path.join(OUT, "sg_audit.json")
    with open(out, "w") as f:
        json.dump(det, f, indent=1)
    print(f"[sg_audit] wrote {out}: {det}", flush=True)


def stage_sweep():
    from spmv_openmp_cuda_tpu.bench import sweep as sw

    log_path = os.path.join(REPO, "scripts", "sweep_tpu_r5.log")
    # smallest matrices first so a timeout truncates only the tail;
    # cube_coup excluded (XLA tile modes at 127M nnz — the reference's
    # sweep likewise skips its infeasible combinations). The grid axis
    # only parameterizes the 5 grid-consuming reference-shaped modes; the
    # full 26-mode axis at one grid is the committed allkernels artifact.
    order = [
        "west2021_like", "delaunay_n12_like", "cavity10_like",
        "raefsky1_like", "caida_like", "sg_like", "webbase_like",
        "fem_3d_thermal2_like", "thermal2_like",
    ]
    rc = sw.main(order + [
        "--full-grids", "--log", log_path,
        "--kernels",
        "CSR_ROWS_GROUPS,CSR_TILES,CSR_TILES_ALLOCD,ELL_ROWS_GROUPS,"
        "ELL_TILES",
    ])
    print(f"[sweep] rc={rc} -> {log_path}", flush=True)


def stage_f64_raefsky_ab():
    bench_inproc(
        "f64raef", SPMV_DTYPE="float64", BENCH_ONLY="raefsky1_like",
        BENCH_CANDS="PL_DIA_RESID_F64,PL_CSR_WINDOW_F64",
    )


def stage_f64_suite():
    bench_inproc("f64", SPMV_DTYPE="float64")


def stage_f64_ext():
    bench_inproc("extf64", SPMV_DTYPE="float64", BENCH_SUITE="extended")


if __name__ == "__main__":
    run_stages(STAGES, {
        "verify_cli": stage_verify_cli,
        "hl_suite": stage_hl_suite,
        "ext_suite": stage_ext_suite,
        "sg_audit": stage_sg_audit,
        "sweep": stage_sweep,
        "f64_raefsky_ab": stage_f64_raefsky_ab,
        "f64_suite": stage_f64_suite,
        "f64_ext": stage_f64_ext,
    })
