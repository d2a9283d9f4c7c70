#!/usr/bin/env python
"""On-TPU calibration grid for the window-engine cost model.

The current model (formats/window.py::_cost_of) charges the gather+assembly
phase per SLOT (_C_GATHER). But the kernel's source-assembly taa runs over
whole 128-slot-row TILES: its volume is n_ktiles * 128 * 128 per block
regardless of k_pad, so configs with k_pad well under a tile multiple pay
up to ~3x more assembly work per slot than the model sees. This grid varies
k_pad at fixed g (via the packing-cap ladder), g at auto cap, and bps, and
prints one CSV-ish line per config with every model input + measured time —
enough to fit

    t = c_slot * slots + c_tile * tile_vol + c_fold * fold_vol
        + c_pass * pass_vol + c_step * steps

host-side afterwards and recalibrate _cost_of.

Usage: python scripts/calibrate_window.py [preset ...]
Slope-based timing per CLAUDE.md measurement rules.
"""
import os
import sys
import time

import jax.numpy as jnp
import numpy as np

from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.utils import synth

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
from ab_window_v5 import slope_time  # same chain-slope machinery


def grid(csr):
    """(label, prepare kwargs) pairs spanning k_pad, g and bps."""
    cfgs = []
    for g in (8, 16, 24, 32):
        cfgs.append((f"g{g}-auto-b1", dict(g=g, cap="auto", bps=1)))
    # vary k_pad at fixed g via the cap ladder (k_c = 8*cap + overflow)
    for cap in (8, 16, 32, 64):
        cfgs.append((f"g16-cap{cap}-b1", dict(g=16, cap=cap, bps=1)))
    cfgs.append(("g16-capN-b1", dict(g=16, cap=None, bps=1)))
    # bps ladder at two g's (per-step fixed cost + bigger-block VPU rate);
    # shared_w auto-enables where the union span fits — the -nosw twins
    # isolate the shared-staging delta
    for g, bps in ((16, 4), (16, 8), (32, 4), (32, 8)):
        cfgs.append((f"g{g}-auto-b{bps}", dict(g=g, cap="auto", bps=bps)))
    for g, bps in ((16, 4), (16, 8)):
        cfgs.append(
            (f"g{g}-auto-b{bps}-nosw",
             dict(g=g, cap="auto", bps=bps, shared_w=False))
        )
    return cfgs


def main():
    presets = sys.argv[1:] or ["fem_3d_thermal2_like"]
    print(
        "preset,label,g,cap,k_pad,k_c,v,nblocks,bps,n_ktiles,slots,"
        "tile_vol,fold_vol,pass_vol,steps,us,gflops,maxerr,shared_w",
        flush=True,
    )
    deadline = float(os.environ.get("CAL_DEADLINE_S", "inf"))
    start = time.perf_counter()
    for preset in presets:
        coo = synth.preset(preset)
        csr = coo_to_csr(coo)
        x = fill_rnd_vector(csr.shape[1], seed=1)
        oracle = serial_csr_spmv(csr, x)
        xj = jnp.asarray(x, jnp.float32)
        vdt = jnp.bfloat16 if csr.nnz > 500_000 else jnp.float32
        for label, kw in grid(csr):
            if time.perf_counter() - start > deadline:
                print(f"# {preset},{label}: SKIPPED (past "
                      f"{deadline:.0f}s deadline)", flush=True)
                continue
            try:
                t0 = time.perf_counter()
                mat = W.prepare_window(csr, vals_dtype=vdt, max_pad=30.0, **kw)
                dt, y = slope_time(lambda xx: W.window_spmv(mat, xx), xj)
                err = float(
                    np.abs(
                        np.asarray(y, np.float64)[: csr.shape[0]] - oracle
                    ).max()
                )
                g, k_pad, k_c = mat.g, mat.k_pad, mat.k_c
                v = k_pad - k_c
                nb, bps = mat.nblocks, mat.bps
                ktiles = mat.n_ktiles
                slots = nb * k_pad * 128
                tile_vol = nb * ktiles * 128 * 128  # assembly taa volume
                fold_vol = nb * k_c * 128 * (-(-g // 8))
                pass_vol = nb * v * 128 * g
                steps = nb // bps
                gf = 2.0 * csr.nnz / dt / 1e9
                print(
                    f"{preset},{label},{g},{kw['cap']},{k_pad},{k_c},{v},"
                    f"{nb},{bps},{ktiles},{slots},{tile_vol},{fold_vol},"
                    f"{pass_vol},{steps},{dt*1e6:.2f},{gf:.1f},{err:.1e},"
                    f"{int(mat.shared_w)}",
                    flush=True,
                )
                print(
                    f"# compile+prep {time.perf_counter()-t0:.0f}s",
                    file=sys.stderr, flush=True,
                )
            except Exception as e:
                print(f"# {preset},{label}: ERROR {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    main()
