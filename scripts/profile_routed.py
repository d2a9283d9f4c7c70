#!/usr/bin/env python
"""Stage-level slope profile of the routed engine on a preset matrix.

Each stage is timed as its own on-device fori_loop chain (carry is the
stage's own input shape, perturbed by a data-dependent epsilon so XLA cannot
elide the chain); per-step = slope between two chain lengths. Usage:

    python scripts/profile_routed.py [preset] [stage ...]
"""
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.formats import routed as R
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.route import apply_permutation
from spmv_openmp_cuda_tpu.utils import synth

LANE = 128


def slope(fn, x0, lo=10, budget=1.0):
    @jax.jit
    def loop(x, steps):
        def body(i, x):
            y = fn(x)
            return x * (1.0 + jnp.sum(y) * 1e-30)

        return jax.lax.fori_loop(0, steps, body, x, unroll=False)

    def timed(steps):
        s = jnp.int32(steps)
        _ = float(jnp.sum(loop(x0, s)))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            _ = float(jnp.sum(loop(x0, s)))
            best = min(best, time.perf_counter() - t)
        return best

    t_lo = timed(lo)
    est = max(t_lo / lo, 1e-7)
    hi = lo + max(100, min(400_000, int(budget / est)))
    t_hi = timed(hi)
    if t_hi - t_lo < 0.5 * budget:
        s1 = max((t_hi - t_lo) / (hi - lo), 1e-8)
        hi = lo + min(int(budget / s1), 2_000_000)
        t_hi = timed(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    # this script is 32-bit throughout; an ambient jax_enable_x64 (sticky
    # after any f64 stage in the same process, e.g. ab_combined_payload's
    # f64 bench) would promote plan scalars to int64 inside the Pallas
    # kernels and Mosaic rejects the trace
    jax.config.update("jax_enable_x64", False)
    preset = sys.argv[1] if len(sys.argv) > 1 else "caida_like"
    want = set(sys.argv[2:])
    coo = synth.preset(preset, seed=0)
    csr = S.coo_to_csr(coo)
    t0 = time.time()
    mat = R.prepare_routed(csr)
    print(f"prepare {time.time()-t0:.1f}s", file=sys.stderr)
    x = jnp.asarray(fill_rnd_vector(coo.shape[1], seed=1), dtype=jnp.float32)
    xw = R._pack_xw(mat, x)
    pa = R._gather_products(mat, xw)
    h1 = mat.perm_products.h
    pa_p = jnp.pad(pa, ((0, h1 - pa.shape[0]), (0, 0)))
    slab = apply_permutation(mat.perm_products, pa_p, skip_r3=True)
    sums = R._reduce_runs_fused(slab, mat.perm_products.r3, mat.runs)

    from spmv_openmp_cuda_tpu.ops.route import apply_sw_w2_sw

    x2 = R._gather_w1(mat, xw)
    x5m = apply_sw_w2_sw(mat.perm_products, x2)
    t1 = mat.perm_products.t

    stages = {}
    stages["full"] = (lambda v: R.routed_spmv(mat, v), x)
    stages["pack_xw"] = (lambda v: R._pack_xw(mat, v), x)
    stages["gather"] = (lambda v: R._gather_products(mat, v), xw)
    stages["gather_w1"] = (lambda v: R._gather_w1(mat, v), xw)
    stages["sw_w2_sw"] = (
        lambda v: apply_sw_w2_sw(mat.perm_products, v),
        x2,
    )
    stages["xla_sw_only"] = (
        lambda v: v.reshape(t1, 128, LANE).swapaxes(0, 1).reshape(t1 * 128, LANE)
        if t1 > 1 else v,
        x2,
    )
    stages["w3_r3_reduce"] = (
        lambda v: R._w3_r3_reduce(v, mat.perm_products, mat.runs),
        x5m,
    )
    stages["perm_products"] = (
        lambda v: apply_permutation(mat.perm_products, v, skip_r3=True),
        pa_p,
    )
    stages["reduce_fused"] = (
        lambda v: R._reduce_runs_fused(v, mat.perm_products.r3, mat.runs),
        slab,
    )
    if mat.lvl_perms:
        pk, mk_, rk = mat.lvl_perms[0], mat.lvl_masks[0], mat.lvl_runs[0]
        prev = sums.reshape(-1)[: pk.h * LANE]
        prev2d = jnp.pad(
            prev, (0, max(0, pk.h * LANE - prev.size))
        ).reshape(pk.h, LANE)

        def lvl(v):
            s = apply_permutation(pk, v, skip_r3=True)
            return R._reduce_runs_fused(s, pk.r3, rk, mask=mk_)

        stages["level0"] = (lvl, prev2d)
    dom_o = mat.perm_out.h * LANE
    cc = jnp.zeros(dom_o, dtype=jnp.float32).reshape(mat.perm_out.h, LANE)
    stages["perm_out"] = (lambda v: apply_permutation(mat.perm_out, v), cc)
    if mat.hvals is not None:
        stages["heavy"] = (lambda v: R._heavy_sums(mat, v), xw)
    if mat.hdense is not None:
        stages["hdense_mv"] = (lambda v: R._hdense_mv(mat, v), x)

    def assembly(v):
        # concat/pad + output perm + slice (y assembly minus level sums)
        dom_o = mat.perm_out.h * LANE
        cc = jnp.pad(v.reshape(-1), (0, dom_o - v.size))
        y = apply_permutation(mat.perm_out, cc.reshape(mat.perm_out.h, LANE))
        return y.reshape(-1)[: mat.shape[0]]

    stages["assembly"] = (assembly, sums)

    for name, (fn, x0) in stages.items():
        if want and name not in want:
            continue
        dt = slope(fn, x0)
        print(f"{name:>14}: {dt*1e6:8.2f} us")


if __name__ == "__main__":
    main()
