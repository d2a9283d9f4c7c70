#!/usr/bin/env python
"""On-TPU A/B of the window-engine v5 knobs: blocks-per-step (bps) and the
xdirect single-block fast path.

Usage: python scripts/ab_window_v5.py [preset ...]
Defaults to thermal2_like fem_3d_thermal2_like delaunay_n12_like.

Slope-based timing (chain of K-unrolled spmv's under a traced fori_loop),
per CLAUDE.md measurement rules.
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.formats.convert import coo_to_csr
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.utils import synth

K = 8


def slope_time(run, x0):
    @jax.jit
    def loop(x, iters):
        y0 = run(x)
        x = x * (1.0 + jnp.sum(y0) * 1e-30)

        def body(i, c):
            x, _ = c
            for _ in range(K):
                y = run(x)
                x = x * (1.0 + jnp.sum(y) * 1e-30)
            return (x, y)

        return jax.lax.fori_loop(0, iters, body, (x, y0), unroll=False)

    def timed(steps):
        iters = -(-steps // K)
        s = jnp.int32(iters)
        _ = float(jnp.sum(loop(x0, s)[0]))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            _ = float(jnp.sum(loop(x0, s)[0]))
            best = min(best, time.perf_counter() - t)
        return best, iters * K

    y = np.asarray(loop(x0, jnp.int32(0))[1])
    t_lo, lo_n = timed(16)
    est = max(t_lo / lo_n, 1e-7)
    cap = int(8.0 / est)
    t_hi, hi_n = timed(16 + max(min(int(1.0 / est), cap), 50))
    if t_hi - t_lo < 0.5:
        slope1 = max((t_hi - t_lo) / (hi_n - lo_n), 1e-7)
        t_hi, hi_n = timed(16 + max(min(int(1.0 / slope1), cap), 50))
    return (t_hi - t_lo) / (hi_n - lo_n), y


def main():
    presets = sys.argv[1:] or [
        "thermal2_like", "fem_3d_thermal2_like", "delaunay_n12_like",
    ]
    for preset in presets:
        coo = synth.preset(preset)
        csr = coo_to_csr(coo)
        x = fill_rnd_vector(csr.shape[1], seed=1)
        oracle = serial_csr_spmv(csr, x)
        xj = jnp.asarray(x, jnp.float32)
        bf16 = csr.nnz > 500_000
        vdt = jnp.bfloat16 if bf16 else jnp.float32
        configs = []
        if csr.shape[0] <= 64 * 128:
            configs += [("xdirect", dict(xdirect=True, bps=None)),
                        ("std-bps1", dict(xdirect=False, bps=1))]
        else:
            # bps=2 dropped: the cost model puts it strictly between 1 and
            # 4 everywhere — save the remote-compile budget
            configs += [
                ("bps1", dict(xdirect=False, bps=1)),
                ("bps4", dict(xdirect=False, bps=4)),
                ("bps8", dict(xdirect=False, bps=8)),
            ]
        for name, kw in configs:
            try:
                t0 = time.perf_counter()
                mat = W.prepare_window_auto(csr, vals_dtype=vdt, **kw)
                run = lambda xx: W.window_spmv(mat, xx)
                dt, y = slope_time(run, xj)
                err = float(
                    np.abs(np.asarray(y, np.float64)[: csr.shape[0]] - oracle).max()
                )
                gf = 2.0 * csr.nnz / dt / 1e9
                print(
                    f"[{preset}] {name}: g={mat.g} bps={mat.bps} "
                    f"xdirect={mat.xdirect} {dt*1e6:.2f} us -> {gf:.1f} GF/s "
                    f"maxerr={err:.1e} (compile {time.perf_counter()-t0:.0f}s)",
                    flush=True,
                )
            except Exception as e:
                print(f"[{preset}] {name}: ERROR {str(e)[:200]}", flush=True)


if __name__ == "__main__":
    main()
