#!/usr/bin/env python
"""Probe which rounding fences stop XLA:CPU's LLVM FMA contraction.

The df TwoSum needs fl(a*b) — if LLVM contracts the mul into the
following add (fma), the sum absorbs the UNROUNDED product while the
error term was extracted for the rounded one.  This probe runs a single
df_mul_acc chain under jit with each candidate fence and reports the
max |err| vs an exact numpy simulation of the intended f32 op chain.

Run CPU-only:  PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_fma_fence.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

_SPLIT = np.float32(4097.0)


def two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def velt(a):
    c = _SPLIT * a
    hi = c - (c - a)
    return hi, a - hi


def make_chain(fence):
    def df_mul_acc(acc_h, acc_l, ah, al, bh, bl):
        p = fence(ah * bh)
        xh, xl = velt(ah)
        yh, yl = velt(bh)
        e = ((xh * yh - p) + xh * yl + xl * yh) + xl * yl
        e = e + (ah * bl + al * bh)
        acc_h, err = two_sum(acc_h, p)
        return acc_h, acc_l + (err + e)

    @jax.jit
    def chain(A, Al, B, Bl):
        acc_h = jnp.zeros((1, 128), jnp.float32)
        acc_l = jnp.zeros((1, 128), jnp.float32)
        for i in range(32):
            acc_h, acc_l = df_mul_acc(
                acc_h, acc_l, A[i : i + 1], Al[i : i + 1],
                B[i : i + 1], Bl[i : i + 1],
            )
        return acc_h, acc_l

    return chain


def simulate(A, Al, B, Bl):
    """Exact elementwise f32 simulation of the same op chain (numpy f32
    scalar semantics, no contraction)."""
    f = np.float32
    acc_h = np.zeros_like(A[0])
    acc_l = np.zeros_like(A[0])
    for i in range(32):
        ah, al, bh, bl = A[i], Al[i], B[i], Bl[i]
        p = f(ah * bh)
        c = f(_SPLIT * ah); xh = f(c - f(c - ah)); xl = f(ah - xh)
        c = f(_SPLIT * bh); yh = f(c - f(c - bh)); yl = f(bh - yh)
        e = f(f(f(f(xh * yh) - p) + f(xh * yl) + f(xl * yh)) + f(xl * yl))
        e = f(e + f(f(ah * bl) + f(al * bh)))
        s = f(acc_h + p)
        bb = f(s - acc_h)
        err = f(f(acc_h - f(s - bb)) + f(p - bb))
        acc_h = s
        acc_l = f(acc_l + f(err + e))
    return acc_h, acc_l


FENCES = {
    "none": lambda p: p,
    "opt_barrier": lambda p: lax.optimization_barrier(p),
    "reduce_precision": lambda p: lax.reduce_precision(p, 8, 23),
    "rp22_would_lose": lambda p: lax.reduce_precision(p, 8, 22),
    "bitcast_pair": lambda p: lax.bitcast_convert_type(
        lax.bitcast_convert_type(p, jnp.int32), jnp.float32
    ),
    "bitcast_xor": lambda p: lax.bitcast_convert_type(
        lax.bitcast_convert_type(p, jnp.int32) ^ jnp.int32(0),
        jnp.float32,
    ),
    "barrier_pair": lambda p: lax.optimization_barrier(
        lax.reduce_precision(p, 8, 23)
    ),
}


def main():
    rng = np.random.default_rng(7)
    a = rng.standard_normal((32, 128)).astype(np.float64) * 3
    b = rng.standard_normal((32, 128)).astype(np.float64)
    A = a.astype(np.float32); Al = (a - A).astype(np.float32)
    B = b.astype(np.float32); Bl = (b - B).astype(np.float32)
    ref_h, ref_l = simulate(A, Al, B, Bl)
    ref = ref_h.astype(np.float64) + ref_l.astype(np.float64)
    for name, fence in FENCES.items():
        try:
            h, l = make_chain(fence)(A, Al, B, Bl)
            got = np.asarray(h)[0].astype(np.float64) + np.asarray(l)[0].astype(
                np.float64
            )
            err = np.abs(got - ref).max()
            exact_h = np.array_equal(np.asarray(h)[0], ref_h)
            print(f"{name:18s} maxdiff_vs_sim={err:.3e} hi_bitexact={exact_h}")
        except Exception as e:
            print(f"{name:18s} FAILED: {e}")


if __name__ == "__main__":
    main()
