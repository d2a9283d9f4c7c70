#!/usr/bin/env python
"""Round-4 A/B: transposed-space routed pipeline (SPMV_ROUTED_TSPACE) on
caida_like — full-engine slope for both variants plus per-stage slopes, so
the win decomposes into gather / mid / reduce deltas.

Run via the claim wrapper:
    PALLAS_AXON_POOL_IPS= python scripts/tpu_claim_run.py scripts/ab_tspace_r4.py
"""
import os
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import spmv_openmp_cuda_tpu as S  # noqa: E402
from spmv_openmp_cuda_tpu.formats import routed as R  # noqa: E402
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector  # noqa: E402
from spmv_openmp_cuda_tpu.ops.route import (  # noqa: E402
    apply_sw_w2_sw,
    apply_sw_w2_sw_transposed,
)
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv  # noqa: E402
from spmv_openmp_cuda_tpu.utils import synth  # noqa: E402

LANE = 128


def slope(fn, x0, budget=1.2, k=8):
    @jax.jit
    def loop(x, iters):
        def body(i, x):
            for _ in range(k):
                y = fn(x)
                x = x * (1.0 + jnp.sum(y) * 1e-30)
            return x

        return jax.lax.fori_loop(0, iters, body, x, unroll=False)

    def timed(steps):
        it = -(-steps // k)
        s = jnp.int32(it)
        _ = float(jnp.sum(loop(x0, s)))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            _ = float(jnp.sum(loop(x0, s)))
            best = min(best, time.perf_counter() - t)
        return best, it * k

    t_lo, lo = timed(16)
    est = max(t_lo / lo, 1e-7)
    t_hi, hi = timed(lo + max(100, min(400_000, int(budget / est))))
    if t_hi - t_lo < 0.5 * budget:
        s1 = max((t_hi - t_lo) / (hi - lo), 1e-8)
        t_hi, hi = timed(lo + min(int(budget / s1), 2_000_000))
    return (t_hi - t_lo) / (hi - lo)


def main():
    jax.config.update("jax_enable_x64", False)
    preset = os.environ.get("AB_PRESET", "caida_like")
    coo = synth.preset(preset, seed=0)
    csr = S.coo_to_csr(coo)
    t0 = time.time()
    mat = R.prepare_routed(csr, vals_dtype=jnp.bfloat16)
    print(f"prepare {time.time()-t0:.0f}s t={mat.perm_products.t}", flush=True)
    x = jnp.asarray(fill_rnd_vector(coo.shape[1], seed=1), dtype=jnp.float32)
    oracle = serial_csr_spmv(csr, np.asarray(x))
    nnz = csr.nnz

    for ts in (False, True):
        os.environ["SPMV_ROUTED_TSPACE"] = "1" if ts else "0"
        t0 = time.time()
        y = np.asarray(R.routed_spmv(mat, x), np.float64)
        md = np.abs(y - oracle).max()
        print(
            f"tspace={ts}: compile {time.time()-t0:.0f}s maxdiff {md:.2e}",
            flush=True,
        )
        assert md < 7e-4, md
        dt = slope(lambda v: R.routed_spmv(mat, v), x)
        print(
            f"tspace={ts}: FULL {dt*1e6:8.2f} us -> "
            f"{2*nnz/dt/1e9:6.2f} GFLOPS",
            flush=True,
        )

    # stage slopes
    xw = R._pack_xw(mat, x)
    x2 = R._gather_w1(mat, xw, tspace=False)
    x2t = R._gather_w1(mat, xw, tspace=True)
    x5 = apply_sw_w2_sw(mat.perm_products, x2)
    x5t = apply_sw_w2_sw_transposed(mat.perm_products, x2t)
    stages = {
        "gather_w1": (lambda v: R._gather_w1(mat, v, tspace=False), xw),
        "gather_w1_t": (lambda v: R._gather_w1(mat, v, tspace=True), xw),
        "sw_w2_sw": (lambda v: apply_sw_w2_sw(mat.perm_products, v), x2),
        "sw_w2_sw_t": (
            lambda v: apply_sw_w2_sw_transposed(mat.perm_products, v), x2t),
        "w3_r3_reduce": (
            lambda v: R._w3_r3_reduce(
                v, mat.perm_products, mat.runs, w1_next=mat.perm_out.w1
            )[0],
            x5,
        ),
        "w3_r3_reduce_t": (
            lambda v: R._w3_r3_reduce(
                v, mat.perm_products, mat.runs, w1_next=mat.perm_out.w1,
                tspace=True,
            )[0],
            x5t,
        ),
    }
    for name, (fn, x0) in stages.items():
        dt = slope(fn, x0, budget=0.8)
        print(f"{name:>16}: {dt*1e6:8.2f} us", flush=True)


if __name__ == "__main__":
    main()
