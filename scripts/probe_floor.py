#!/usr/bin/env python
"""Measure true per-step device time: host readback forces sync; two-point
(slope) timing cancels the fixed tunnel/dispatch latency.

per_step = (T(steps_hi) - T(steps_lo)) / (steps_hi - steps_lo)
"""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp


def log(m):
    print(m, file=sys.stderr, flush=True)


key = jax.random.PRNGKey(0)
LO, HI = 10, 110


def slope_time(mk_chain, carry):
    """mk_chain(steps) -> jitted fn; returns seconds per step."""
    ts = {}
    for steps in (LO, HI):
        chain = mk_chain(steps)
        r = chain(carry)
        _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]  # warm+sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(carry)
            _ = np.asarray(jax.tree_util.tree_leaves(r)[0]).ravel()[0]
            best = min(best, time.perf_counter() - t0)
        ts[steps] = best
    return (ts[HI] - ts[LO]) / (HI - LO), ts[LO]


def report(name, per_step, t_lo, bytes_per_step, flops_per_step=0):
    log(
        f"{name:46s} per-step={per_step*1e6:9.1f} us  "
        f"{bytes_per_step/per_step/1e9:7.1f} GB/s  "
        f"{flops_per_step/per_step/1e9:8.2f} GFLOP/s  (t_lo={t_lo*1e3:.2f} ms)"
    )


# --- elementwise bandwidth (fold-proof: scalar depends on carry) -----------
for size_mb, shape in [(32, (16384, 512)), (256, (65536, 1024))]:
    x = jax.random.normal(key, shape, jnp.float32) * 1e-3

    def mk(steps):
        @jax.jit
        def chain(c):
            def body(i, c):
                return c * (1.0 + c[0, 0] * 1e-12)

            return jax.lax.fori_loop(0, steps, body, c, unroll=False)

        return chain

    ps, tlo = slope_time(mk, x)
    report(f"elementwise mul {size_mb}MB", ps, tlo, 2 * x.size * 4)

# --- slab mul+reduce (ELL_T core op) ---------------------------------------
W, MP = 32, 147968
slab = jax.random.normal(key, (W, MP), jnp.float32)


def mk_slab(steps):
    @jax.jit
    def chain(c):
        def body(i, c):
            return jnp.sum(slab * (1.0 + c[0] * 1e-12), axis=0)

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


ps, tlo = slope_time(mk_slab, jnp.zeros((MP,), jnp.float32))
report("slab mul+reduce (32x148k)", ps, tlo, W * MP * 4, 2 * W * MP)

# --- XLA 1D gather ---------------------------------------------------------
NV = 192 * 1024
xsrc = jax.random.normal(key, (NV,), jnp.float32)
for G in (805_000, 3_700_000):
    idx = jax.random.randint(key, (G,), 0, NV, jnp.int32)

    def mk_g(steps, idx=idx, G=G):
        @jax.jit
        def chain(c):
            def body(i, c):
                return (xsrc * (1.0 + c[0] * 1e-12))[idx]

            return jax.lax.fori_loop(0, steps, body, c, unroll=False)

        return chain

    ps, tlo = slope_time(mk_g, jnp.zeros((G,), jnp.float32))
    report(f"XLA 1D gather G={G/1e6:.1f}M", ps, tlo, G * 8)

# --- DIA 1D unrolled -------------------------------------------------------
D = 25
dia = jax.random.normal(key, (D, MP), jnp.float32)
xp = jax.random.normal(key, (MP + 256,), jnp.float32)
offs = list(range(-12, 13))


def mk_dia(steps):
    @jax.jit
    def chain(c):
        def body(i, c):
            xq = xp * (1.0 + c[0] * 1e-12)
            acc = jnp.zeros((MP,), jnp.float32)
            for k, o in enumerate(offs):
                acc = acc + dia[k] * jax.lax.slice_in_dim(xq, 128 + o, 128 + o + MP)
            return acc

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


ps, tlo = slope_time(mk_dia, jnp.zeros((MP,), jnp.float32))
report("DIA 1D unrolled (25x148k)", ps, tlo, D * MP * 4, 2 * D * MP)

# --- dense matvec MXU ------------------------------------------------------
Bm, Bk = 8192, 512
band = jax.random.normal(key, (Bm, Bk), jnp.float32)


def mk_mv(steps):
    @jax.jit
    def chain(c):
        def body(i, c):
            return band @ jnp.pad(c[:Bk] * (1.0 + c[0] * 1e-12), (0, 0))

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


ps, tlo = slope_time(mk_mv, jnp.ones((Bm,), jnp.float32) * 1e-3)
report("dense matvec (8192x512)", ps, tlo, Bm * Bk * 4, 2 * Bm * Bk)

# --- dense matmul MXU flops ceiling ---------------------------------------
Mm = 2048
a = jax.random.normal(key, (Mm, Mm), jnp.float32) * 1e-3


def mk_mm(steps):
    @jax.jit
    def chain(c):
        def body(i, c):
            return a @ c * 1e-3

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


ps, tlo = slope_time(mk_mm, jnp.eye(Mm, dtype=jnp.float32))
report("dense matmul 2048^3 f32", ps, tlo, 3 * Mm * Mm * 4, 2 * Mm**3)
