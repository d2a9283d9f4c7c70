#!/usr/bin/env python
"""Round-3 on-TPU validation queue (run via scripts/tpu_claim_run.py).

Stages:
  winpick  — measure what the refit cost model's DEFAULT auto scan picks
             on thermal2/fem (round-3 refit moved the picks to unmeasured
             high-cap/low-v configs); emits calibrate_window-format CSV
             rows so the points extend the fit either way.
  profroute— routed-engine stage breakdown on caida_like (x64-leak fixed).

Select a subset: R3_STAGES=winpick ... (default: all, in order).
"""
import os
import runpy
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)
sys.path.insert(0, os.path.join(REPO, "scripts"))
os.chdir(REPO)

STAGES = os.environ.get("R3_STAGES", "winpick,profroute").split(",")


def banner(name):
    print(f"\n===== stage {name} @ {time.strftime('%H:%M:%S')} =====",
          flush=True)


def stage_winpick():
    import jax.numpy as jnp
    import numpy as np
    from spmv_openmp_cuda_tpu.formats import window as W
    from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.utils import synth
    from ab_window_v5 import slope_time

    print(
        "preset,label,g,cap,k_pad,k_c,v,nblocks,bps,n_ktiles,slots,"
        "tile_vol,fold_vol,pass_vol,steps,us,gflops,maxerr,shared_w",
        flush=True,
    )
    presets = os.environ.get(
        "WINPICK_PRESETS", "thermal2_like,fem_3d_thermal2_like"
    ).split(",")
    for preset in presets:
        coo = synth.preset(preset)
        csr = coo_to_csr(coo)
        x = fill_rnd_vector(csr.shape[1], seed=1)
        oracle = serial_csr_spmv(csr, x)
        xj = jnp.asarray(x, jnp.float32)
        vdt = jnp.bfloat16 if csr.nnz > 500_000 else jnp.float32
        t0 = time.perf_counter()
        mat = W.prepare_window_auto(csr, vals_dtype=vdt)
        print(f"# {preset} auto pick: g={mat.g} bps={mat.bps} "
              f"k_pad={mat.k_pad} k_c={mat.k_c} nblocks={mat.nblocks} "
              f"(prep {time.perf_counter()-t0:.0f}s)", flush=True)
        try:
            dt, y = slope_time(lambda xx: W.window_spmv(mat, xx), xj)
            err = float(
                np.abs(np.asarray(y, np.float64)[: csr.shape[0]] - oracle).max()
            )
            g, k_pad, k_c = mat.g, mat.k_pad, mat.k_c
            v = k_pad - k_c
            nb, bps = mat.nblocks, mat.bps
            ktiles = mat.n_ktiles
            gf = 2.0 * csr.nnz / dt / 1e9
            print(
                f"{preset},autopick-g{g}-b{bps},{g},auto,{k_pad},{k_c},{v},"
                f"{nb},{bps},{ktiles},{nb * k_pad * 128},"
                f"{nb * ktiles * 128 * 128},{nb * k_c * 128 * (-(-g // 8))},"
                f"{nb * v * 128 * g},{nb // bps},{dt*1e6:.2f},{gf:.1f},"
                f"{err:.1e},{int(mat.shared_w)}",
                flush=True,
            )
        except Exception as e:
            print(f"# {preset} autopick ERROR {str(e)[:200]}", flush=True)


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
    "winpick": stage_winpick,
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
