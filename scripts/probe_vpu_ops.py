#!/usr/bin/env python
"""Per-primitive VPU/MXU throughput probe (single-block kernels, VMEM-resident).

Measures the in-kernel cost of the ops the routed engine's passes are built
from, by chaining K dependent applications inside ONE kernel and taking the
slope between two K values (cancels launch + load/store cost):

  taa       lane gather: y = take_along_axis(y, idx, axis=1)
  taa_pack2 the same taa on int32 carrying 2 packed bf16 (per-ELEMENT rate
            is 2x the per-lane rate if equal)
  transp    per-128x128-tile transpose
  sel8      8-way masked accumulate (the masked group reduce pattern)
  trimm     per-tile (128,128)@(128,128) f32 matmul (cumsum/reduce on MXU)
  copy      whole-array VMEM copy via scratch
  copy2     2-row strided slice copies (the t=64 in-kernel SW pattern)
  copy8     8-row strided slice copies (the t=16 in-kernel SW pattern)

Run:  python scripts/probe_vpu_ops.py   (claims the TPU)
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

R = 2048  # rows (t=16 domain); 1 MB f32 slab
LANE = 128


def mk_kernel(body, k, dtype=jnp.float32, extra=None):
    """Single-block kernel: y <- body(y) applied k times (data-dependent)."""
    extra = extra or []

    def kernel(*refs):
        refs_l = list(refs)
        x_ref = refs_l.pop(0)
        e_refs = [refs_l.pop(0) for _ in extra]
        o_ref = refs_l.pop(0)
        s_ref = refs_l.pop(0)
        s_ref[:] = x_ref[:]
        for _ in range(k):
            body(s_ref, e_refs)
        o_ref[:] = s_ref[:]

    def run(x, *e):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((R, LANE), dtype),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * (1 + len(extra)),
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((R, LANE), dtype)],
            interpret=jax.default_backend() != "tpu",
        )(x, *e)

    return run


def slope_of(mk, args, k_lo=2, k_hi=18, reps=600):
    """Per-application time: slope between k_lo and k_hi chained applications,
    each timed via an outer on-device fori_loop chain."""
    times = {}
    for k in (k_lo, k_hi):
        run = mk(k)

        @jax.jit
        def loop(x, steps, _run=run, _args=args[1:]):
            def body(i, x):
                y = _run(x, *_args)
                # dtype-preserving data dependency so XLA cannot elide
                return y + (jnp.sum(y) * 0).astype(y.dtype)

            return jax.lax.fori_loop(0, steps, body, x, unroll=False)

        x0 = args[0]
        _ = float(jnp.sum(loop(x0, jnp.int32(2))))
        best = float("inf")
        lo_s, hi_s = 30, 30 + reps
        ts = {}
        for steps in (lo_s, hi_s):
            b = float("inf")
            _ = float(jnp.sum(loop(x0, jnp.int32(steps))))
            for _r in range(2):
                t0 = time.perf_counter()
                _ = float(jnp.sum(loop(x0, jnp.int32(steps))))
                b = min(b, time.perf_counter() - t0)
            ts[steps] = b
        times[k] = (ts[hi_s] - ts[lo_s]) / (hi_s - lo_s)
        print(f"    k={k}: {times[k]*1e6:.2f} us/app", file=sys.stderr)
    per_op = (times[k_hi] - times[k_lo]) / (k_hi - k_lo)
    return per_op


def main():
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((R, LANE)), jnp.float32)
    idx = jnp.asarray(rng.integers(0, LANE, (R, LANE)), jnp.int32)
    gid = jnp.asarray(rng.integers(0, 8, (R, LANE)), jnp.int32)
    xi = jnp.asarray(rng.integers(0, 2**31 - 1, (R, LANE)), jnp.int32)
    elems = R * LANE

    results = {}

    def report(name, per_op, n_elems=elems):
        rate = n_elems / per_op / 1e9
        results[name] = (per_op, rate)
        print(f"{name:>10}: {per_op*1e6:7.3f} us/pass  {rate:7.1f} Gelem/s")

    # taa
    def taa_body(s, e):
        s[:] = jnp.take_along_axis(s[:], e[0][:], axis=1)

    report("taa", slope_of(lambda k: mk_kernel(taa_body, k, extra=[1]), (x, idx)))

    # taa on int32 (2 packed bf16 per lane)
    def taa_i_body(s, e):
        s[:] = jnp.take_along_axis(s[:], e[0][:], axis=1)

    per = slope_of(
        lambda k: mk_kernel(taa_i_body, k, dtype=jnp.int32, extra=[1]), (xi, idx)
    )
    report("taa_pack2", per, n_elems=2 * elems)

    # per-tile transpose (chained: transpose twice per app to keep shape... no,
    # one transpose per app, shape (128,128) per tile preserved)
    def tr_body(s, e):
        for t in range(R // LANE):
            sl = slice(t * LANE, (t + 1) * LANE)
            s[sl, :] = s[sl, :].T

    report("transp", slope_of(lambda k: mk_kernel(tr_body, k), (x,)))

    # 8-way masked accumulate (one full pass = 8 masked sums folded into y)
    def sel_body(s, e):
        v = s[:]
        g = e[0][:]
        rows = [
            jnp.sum(jnp.where(g == gg, v, 0.0), axis=0, keepdims=True)
            for gg in range(8)
        ]
        acc = jnp.concatenate(rows, axis=0)
        s[0:8, :] = s[0:8, :] * (1.0 + acc * 1e-30)

    report("sel8", slope_of(lambda k: mk_kernel(sel_body, k, extra=[1]), (x, gid)))

    # per-tile triangular matmul (f32, MXU)
    def mm_body(s, e):
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
        tri = (rows_i <= cols_i).astype(jnp.float32) * 1e-3
        for t in range(R // LANE):
            sl = slice(t * LANE, (t + 1) * LANE)
            s[sl, :] = jax.lax.dot(
                s[sl, :], tri, preferred_element_type=jnp.float32
            )

    report("trimm", slope_of(lambda k: mk_kernel(mm_body, k), (x,)))

    # whole-array copy via second scratch
    def mk_copy(k):
        def kernel(x_ref, o_ref, s_ref, s2_ref):
            s_ref[:] = x_ref[:]
            for i in range(k):
                if i % 2 == 0:
                    s2_ref[:] = s_ref[:]
                else:
                    s_ref[:] = s2_ref[:]
            o_ref[:] = s_ref[:] if k % 2 == 0 else s2_ref[:]

        def run(xv):
            return pl.pallas_call(
                kernel,
                out_shape=jax.ShapeDtypeStruct((R, LANE), jnp.float32),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                scratch_shapes=[
                    pltpu.VMEM((R, LANE), jnp.float32),
                    pltpu.VMEM((R, LANE), jnp.float32),
                ],
                interpret=jax.default_backend() != "tpu",
            )(xv)

        return run

    report("copy", slope_of(mk_copy, (x,)))

    # strided slice copies: SW pattern out[j*128+d] rows from t slices
    def mk_sw(rows_per_slice):
        t = LANE // rows_per_slice  # slices per tile

        def body(s, e):
            # one SW-like pass: for each tile, t slices of rows_per_slice rows
            for j in range(R // LANE):
                for q in range(t):
                    src = ((j * t + q) * rows_per_slice) % R
                    dst = j * LANE + q * rows_per_slice
                    s[dst : dst + rows_per_slice, :] = s[
                        src : src + rows_per_slice, :
                    ] * (1.0 if q else 1.0)

        return body

    report(
        "copy8",
        slope_of(lambda k: mk_kernel(mk_sw(8), k), (x,)),
    )
    report(
        "copy2",
        slope_of(lambda k: mk_kernel(mk_sw(2), k), (x,)),
    )


if __name__ == "__main__":
    main()
