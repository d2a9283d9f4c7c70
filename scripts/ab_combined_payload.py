#!/usr/bin/env python
"""Combined on-TPU measurement queue (run via scripts/tpu_claim_run.py).

Stages, in descending value per compile-second (each isolated; results
stream to stdout as they land so a mid-queue outage keeps earlier wins):

  1. fusemid  — routed caida_like, SPMV_ROUTED_FUSEMID 0 vs 1
  2. window   — ab_window_v5 bps/xdirect A/B (3 presets)
  3. f64      — bench.py SPMV_DTYPE=float64 -> BENCH_DETAILS_F64.json
                (validates the dfloat Mosaic lowerings on real TPU)
  4. extended — bench.py BENCH_SUITE=extended -> BENCH_DETAILS_EXTENDED.json
  5. calwin   — calibrate_window fem_3d grid (cost-model refit input)
  6. profroute— profile_routed caida stage breakdown

Select a subset: AB_STAGES=fusemid,window ... (default: all, in order).
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
    "AB_STAGES", "fusemid,window,f64,extended,calwin,profroute"
).split(",")


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


def stage_fusemid():
    import jax.numpy as jnp
    import numpy as np
    from spmv_openmp_cuda_tpu.formats import routed as R
    from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.utils import synth
    from ab_window_v5 import slope_time

    coo = synth.preset("caida_like", seed=0)
    csr = coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=1)
    oracle = serial_csr_spmv(csr, x)
    xj = jnp.asarray(x, jnp.float32)
    t0 = time.perf_counter()
    mat = R.prepare_routed_auto(csr, vals_dtype=jnp.bfloat16)
    print(f"[fusemid] prepare {time.perf_counter()-t0:.0f}s", flush=True)
    for flag in ("0", "1"):
        os.environ["SPMV_ROUTED_FUSEMID"] = flag
        try:
            t0 = time.perf_counter()
            dt, y = slope_time(
                lambda xx: R.routed_auto_spmv(mat, xx), xj
            )
            err = float(
                np.abs(np.asarray(y, np.float64)[: csr.shape[0]] - oracle).max()
            )
            gf = 2.0 * csr.nnz / dt / 1e9
            print(
                f"[fusemid={flag}] caida_like {dt*1e6:.2f} us -> "
                f"{gf:.1f} GF/s maxerr={err:.1e} "
                f"(compile {time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"[fusemid={flag}] ERROR {str(e)[:300]}", flush=True)
    os.environ.pop("SPMV_ROUTED_FUSEMID", None)


def stage_window():
    import ab_window_v5
    old = sys.argv
    sys.argv = ["ab_window_v5.py"]
    try:
        ab_window_v5.main()
    finally:
        sys.argv = old


def _run_bench(env):
    old = {k: os.environ.get(k) for k in env}
    os.environ.update(env)
    try:
        runpy.run_path(os.path.join(REPO, "bench.py"), run_name="__main__")
    except SystemExit:
        pass
    finally:
        for k, v in old.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v


def stage_f64():
    # BENCH_INPROC: this process already holds the TPU claim — bench.py's
    # subprocess orchestrator (which spawns claiming workers) must not run
    _run_bench(
        {
            "SPMV_DTYPE": "float64",
            "BENCH_DEADLINE_S": "900",
            "BENCH_INPROC": "1",
        }
    )


def stage_extended():
    _run_bench(
        {
            "BENCH_SUITE": "extended",
            "BENCH_DEADLINE_S": "900",
            "BENCH_INPROC": "1",
        }
    )


def stage_calwin():
    import calibrate_window
    old = sys.argv
    sys.argv = ["calibrate_window.py", "fem_3d_thermal2_like"]
    os.environ.setdefault("CAL_DEADLINE_S", "600")
    try:
        calibrate_window.main()
    finally:
        sys.argv = old


def stage_profroute():
    old = sys.argv
    sys.argv = ["profile_routed.py", "caida_like"]
    try:
        runpy.run_path(
            os.path.join(REPO, "scripts", "profile_routed.py"),
            run_name="__main__",
        )
    except SystemExit:
        pass
    finally:
        sys.argv = old


FN = {
    "fusemid": stage_fusemid,
    "window": stage_window,
    "f64": stage_f64,
    "extended": stage_extended,
    "calwin": stage_calwin,
    "profroute": stage_profroute,
}

for name in STAGES:
    banner(name)
    t0 = time.perf_counter()
    try:
        FN[name.strip()]()
        print(f"===== stage {name} DONE in {time.perf_counter()-t0:.0f}s",
              flush=True)
    except Exception as e:
        import traceback
        traceback.print_exc()
        print(f"===== stage {name} FAILED: {str(e)[:300]}", flush=True)
print("\n===== ALL STAGES COMPLETE =====", flush=True)
