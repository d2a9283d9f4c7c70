#!/usr/bin/env python
"""Sweep the DIA kernel's VMEM block budget on a preset (slope timing).

The grid's block size trades DMA pipelining depth against VMEM residency;
this probes whether the default 2 MB budget sits at the knee.

    python scripts/probe_dia_blocks.py [preset] [budgets_mb ...]
"""
import sys
import time

import jax
import jax.numpy as jnp

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.formats.dia import prepare_dia
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.spmv_pallas import (
    dia_spmv_pallas,
    pad_dia_for_pallas,
    plan_dia,
)
from spmv_openmp_cuda_tpu.utils import synth


def slope(fn, x0, lo=16, budget=1.0, K=8):
    @jax.jit
    def loop(x, iters):
        def body(i, x):
            for _ in range(K):
                y = fn(x)
                x = x * (1.0 + jnp.sum(y) * 1e-30)
            return x

        return jax.lax.fori_loop(0, iters, body, x, unroll=False)

    def timed(steps):
        it = -(-steps // K)
        _ = float(jnp.sum(loop(x0, jnp.int32(it))))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            _ = float(jnp.sum(loop(x0, jnp.int32(it))))
            best = min(best, time.perf_counter() - t)
        return best, it * K

    t_lo, lo_n = timed(lo)
    est = max(t_lo / lo_n, 1e-7)
    t_hi, hi_n = timed(lo_n + max(100, min(400_000, int(budget / est))))
    if t_hi - t_lo < 0.5 * budget:
        s1 = max((t_hi - t_lo) / (hi_n - lo_n), 1e-8)
        t_hi, hi_n = timed(lo_n + min(int(budget / s1), 2_000_000))
    return (t_hi - t_lo) / (hi_n - lo_n)


def main():
    preset = sys.argv[1] if len(sys.argv) > 1 else "thermal2_like"
    budgets = [float(v) for v in sys.argv[2:]] or [1.0, 2.0, 4.0, 8.0]
    coo = synth.preset(preset, seed=0)
    csr = S.coo_to_csr(coo)
    mat0 = prepare_dia(csr, dtype=jnp.float32)
    x = jnp.asarray(fill_rnd_vector(csr.shape[1], seed=1), jnp.float32)
    for mb in budgets:
        plan = plan_dia(mat0, vmem_budget=int(mb * 2**20))
        mat = pad_dia_for_pallas(mat0, plan)
        dt = slope(lambda v: dia_spmv_pallas(mat, v, plan), x)
        print(
            f"budget {mb:4.1f} MB bs={plan.bs:5d} nblocks={plan.nblocks:3d}: "
            f"{dt*1e6:7.2f} us -> {2*csr.nnz/dt/1e9:7.2f} GFLOPS"
        )


if __name__ == "__main__":
    main()
