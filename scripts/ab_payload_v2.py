#!/usr/bin/env python
"""Round-2b on-TPU queue (run via scripts/tpu_claim_run.py).

Stages (ordered; f64 LAST because the f64 bench enables jax_enable_x64,
which is process-global and sticky — see ops/dfloat.py::x32_trace_scope):

  1. winval   — slope-measure the window engine's AUTO picks (post-refit
                cost model, bps policy auto) on the 3 window presets
  2. extended — bench.py BENCH_SUITE=extended -> BENCH_DETAILS_EXTENDED.json
  3. f64      — bench.py SPMV_DTYPE=float64 -> BENCH_DETAILS_F64.json
                (df engines; first real-TPU record of the double path)

Select a subset: AB_STAGES=winval,extended,f64
"""
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

STAGES = os.environ.get("AB_STAGES", "winval,extended,f64").split(",")


def stage_winval():
    import jax.numpy as jnp
    import numpy as np
    from spmv_openmp_cuda_tpu.formats import window as W
    from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.utils import synth
    from ab_window_v5 import slope_time

    for preset in (
        "thermal2_like", "fem_3d_thermal2_like", "delaunay_n12_like"
    ):
        try:
            coo = synth.preset(preset)
            csr = coo_to_csr(coo)
            x = fill_rnd_vector(csr.shape[1], seed=1)
            oracle = serial_csr_spmv(csr, x)
            xj = jnp.asarray(x, jnp.float32)
            vdt = jnp.bfloat16 if csr.nnz > 500_000 else jnp.float32
            t0 = time.perf_counter()
            mat = W.prepare_window_auto(csr, vals_dtype=vdt)
            tprep = time.perf_counter() - t0
            t0 = time.perf_counter()
            dt, y = slope_time(lambda xx: W.window_spmv(mat, xx), xj)
            err = float(
                np.abs(
                    np.asarray(y, np.float64)[: csr.shape[0]] - oracle
                ).max()
            )
            gf = 2.0 * csr.nnz / dt / 1e9
            print(
                f"[winval {preset}] g={mat.g} k_pad={mat.k_pad} "
                f"k_c={mat.k_c} nblocks={mat.nblocks} bps={mat.bps} "
                f"shared_w={mat.shared_w} {dt*1e6:.2f} us -> {gf:.1f} GF/s "
                f"maxerr={err:.1e} (prep {tprep:.0f}s, "
                f"compile {time.perf_counter()-t0:.0f}s)",
                flush=True,
            )
        except Exception as e:
            print(f"[winval {preset}] ERROR {str(e)[:300]}", flush=True)


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


FN = {
    "winval": stage_winval,
    "extended": lambda: _run_bench(
        {"BENCH_SUITE": "extended", "BENCH_DEADLINE_S": "420"}
    ),
    "f64": lambda: _run_bench(
        {"SPMV_DTYPE": "float64", "BENCH_DEADLINE_S": "420"}
    ),
}

for name in STAGES:
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)
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
