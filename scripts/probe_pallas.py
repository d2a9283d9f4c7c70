#!/usr/bin/env python
"""Probe in-Pallas primitive speeds on TPU: VMEM-resident lane-aligned
gather (take_along_axis axis0), tile transpose, triangular-matmul cumsum,
and the 2D two-slice DIA shift. These decide the sparse-format designs."""
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def log(m):
    print(m, file=sys.stderr, flush=True)


key = jax.random.PRNGKey(0)
LO, HI = 10, 110


def slope_time(mk_chain, carry):
    ts = {}
    for steps in (LO, HI):
        chain = mk_chain(steps)
        r = chain(carry)
        _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))  # warm + sync
        best = 1e9
        for _ in range(3):
            t0 = time.perf_counter()
            r = chain(carry)
            _ = float(jnp.sum(jax.tree_util.tree_leaves(r)[0]))
            best = min(best, time.perf_counter() - t0)
        ts[steps] = best
    return (ts[HI] - ts[LO]) / (HI - LO)


def report(name, per_step, bytes_per_step=0, elems_per_step=0):
    msg = f"{name:52s} per-step={per_step*1e6:9.1f} us"
    if bytes_per_step:
        msg += f"  {bytes_per_step/per_step/1e9:7.1f} GB/s"
    if elems_per_step:
        msg += f"  {elems_per_step/per_step/1e9:7.2f} Gelem/s"
    log(msg)


# ---------------------------------------------------------------------------
# 1. Pallas take_along_axis axis0: gather from VMEM-resident (S,128) x
# ---------------------------------------------------------------------------
S = 1504  # 192k/128
K = 6292  # ~805k gathers
x2d = jax.random.normal(key, (S, 128), jnp.float32)
idx = jax.random.randint(key, (K, 128), 0, S, jnp.int32)


def taa_kernel(x_ref, idx_ref, o_ref):
    o_ref[:] = jnp.take_along_axis(x_ref[:], idx_ref[:], axis=0)


def mk_taa(steps):
    call = pl.pallas_call(
        taa_kernel,
        out_shape=jax.ShapeDtypeStruct((K, 128), jnp.float32),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chain(c):
        def body(i, c):
            return call(x2d * (1.0 + c[0, 0] * 1e-12), idx)

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


try:
    ps = slope_time(mk_taa, jnp.zeros((K, 128), jnp.float32))
    report("pallas taa axis0 (K=6292x128 from 1504x128)", ps, K * 128 * 8, K * 128)
except Exception as e:
    log(f"pallas taa axis0: FAIL {str(e)[:300]}")

# ---------------------------------------------------------------------------
# 2. XLA (non-pallas) taa axis0 same shapes, for comparison
# ---------------------------------------------------------------------------
def mk_taa_xla(steps):
    @jax.jit
    def chain(c):
        def body(i, c):
            return jnp.take_along_axis(x2d * (1.0 + c[0, 0] * 1e-12), idx, axis=0)

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


ps = slope_time(mk_taa_xla, jnp.zeros((K, 128), jnp.float32))
report("XLA taa axis0 (same shapes)", ps, K * 128 * 8, K * 128)

# ---------------------------------------------------------------------------
# 3. Pallas 128x128 tile transposes (the lane-routing primitive)
# ---------------------------------------------------------------------------
T = 90  # number of tiles
tiles = jax.random.normal(key, (T * 128, 128), jnp.float32)


def tr_kernel(t_ref, o_ref):
    for t in range(T):
        blk = t_ref[t * 128 : (t + 1) * 128, :]
        o_ref[t * 128 : (t + 1) * 128, :] = blk.T


def mk_tr(steps):
    call = pl.pallas_call(
        tr_kernel,
        out_shape=jax.ShapeDtypeStruct((T * 128, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chain(c):
        def body(i, c):
            return call(tiles * (1.0 + c[0, 0] * 1e-12))

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


try:
    ps = slope_time(mk_tr, jnp.zeros((T * 128, 128), jnp.float32))
    report(f"pallas {T}x 128x128 transpose", ps, T * 128 * 128 * 8, T * 128 * 128)
except Exception as e:
    log(f"pallas transpose: FAIL {str(e)[:300]}")

# ---------------------------------------------------------------------------
# 4. chunked cumsum via lower-triangular matmul (K=11520 x 128)
# ---------------------------------------------------------------------------
KC = 11520
p = jax.random.normal(key, (KC, 128), jnp.float32) * 1e-3
tri = jnp.tril(jnp.ones((128, 128), jnp.float32))


def cum_kernel(p_ref, o_ref):
    nchunk = KC // 128
    carry = jnp.zeros((1, 128), jnp.float32)
    for t in range(nchunk):
        blk = p_ref[t * 128 : (t + 1) * 128, :]
        c = jnp.dot(tri, blk, preferred_element_type=jnp.float32) + carry
        o_ref[t * 128 : (t + 1) * 128, :] = c
        carry = c[127:128, :]


def mk_cum(steps):
    call = pl.pallas_call(
        cum_kernel,
        out_shape=jax.ShapeDtypeStruct((KC, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chain(c):
        def body(i, c):
            return call(p * (1.0 + c[0, 0] * 1e-12))

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


try:
    ps = slope_time(mk_cum, jnp.zeros((KC, 128), jnp.float32))
    report("pallas tri-matmul cumsum (11520x128)", ps, KC * 128 * 8, KC * 128)
except Exception as e:
    log(f"pallas cumsum: FAIL {str(e)[:300]}")

# ---------------------------------------------------------------------------
# 5. jnp.cumsum axis0 in pallas, same shape
# ---------------------------------------------------------------------------
def cum2_kernel(p_ref, o_ref):
    o_ref[:] = jnp.cumsum(p_ref[:], axis=0)


def mk_cum2(steps):
    call = pl.pallas_call(
        cum2_kernel,
        out_shape=jax.ShapeDtypeStruct((KC, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )

    @jax.jit
    def chain(c):
        def body(i, c):
            return call(p * (1.0 + c[0, 0] * 1e-12))

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


try:
    ps = slope_time(mk_cum2, jnp.zeros((KC, 128), jnp.float32))
    report("pallas jnp.cumsum axis0 (11520x128)", ps, KC * 128 * 8, KC * 128)
except Exception as e:
    log(f"pallas jnp.cumsum: FAIL {str(e)[:300]}")

# ---------------------------------------------------------------------------
# 6. Pallas DIA 2D two-slice shift: 25 diag x 148k rows, blocked grid
# ---------------------------------------------------------------------------
D = 25
S8 = 148096 // 128  # 1157 sublane-rows... use 1152 for divisibility
S8 = 1152
MPAD = S8 * 128
dia = jax.random.normal(key, (D, S8, 128), jnp.float32)
xpad = jax.random.normal(key, (S8 + 2, 128), jnp.float32)
offs = list(range(-12, 13))
BS = 288  # sublane-rows per block (1152/4)


def dia_kernel(x_ref, dia_ref, o_ref):
    i = pl.program_id(0)
    base = i * BS
    acc = jnp.zeros((BS, 128), jnp.float32)
    for k, o in enumerate(offs):
        q, r = divmod(o + 128, 128)
        lo = x_ref[pl.ds(base + q, BS), :]
        if r == 0:
            sh = lo
        else:
            hi = x_ref[pl.ds(base + q + 1, BS), :]
            sh = jnp.concatenate([lo[:, r:], hi[:, :r]], axis=1)
        acc = acc + dia_ref[k] * sh
    o_ref[:] = acc


def mk_dia(steps):
    call = pl.pallas_call(
        dia_kernel,
        grid=(S8 // BS,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.VMEM),  # full padded x resident
            pl.BlockSpec((D, BS, 128), lambda i: (0, i, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((BS, 128), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((S8, 128), jnp.float32),
    )

    @jax.jit
    def chain(c):
        def body(i, c):
            return call(xpad * (1.0 + c[0, 0] * 1e-12), dia)

        return jax.lax.fori_loop(0, steps, body, c, unroll=False)

    return chain


try:
    ps = slope_time(mk_dia, jnp.zeros((S8, 128), jnp.float32))
    report(
        "pallas DIA 2D two-slice (25 x 147k)",
        ps,
        D * MPAD * 4,
        D * MPAD,
    )
except Exception as e:
    log(f"pallas DIA 2D: FAIL {str(e)[:300]}")
