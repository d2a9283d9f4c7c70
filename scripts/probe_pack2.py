#!/usr/bin/env python
"""Round-5 probe: packed-pair (int32 = 2 x bf16) window assembly primitives.

Validates, in one Mosaic kernel each, the constructs the packed window
engine needs, then measures the chained rate of the packed
assembly+gather pipeline vs the round-4 unpacked one:

  pack    : f32 (128,128) -> bf16-round -> int32 (64,128) pair planes
            (bitcast via jax.lax.bitcast_convert_type + shift/or)
  taa_p   : taa on the (128,128) duplicated packed window with a pair
            Q map (the packed assembly pass)
  unpack  : parity select + bitcast back to f32
  chain   : assembly taa + transpose + 2 gather taas per tile PAIR
            (packed) vs 2x (assembly taa + transpose + store) + big
            gather (unpacked round-4 shape)

Run on TPU:  python scripts/tpu_claim_run.py scripts/probe_pack2.py
"""
import functools
import sys
import time

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE = 128


def _interp():
    return jax.default_backend() != "tpu"


def pack_window(wt):
    """wt (128,128) f32 -> wt_p2 (128,128) int32: row r2 holds
    pack(bf16(wt[r2]), bf16(wt[r2+64])) duplicated vertically."""
    b = wt.astype(jnp.bfloat16).astype(jnp.float32)
    bits = jax.lax.bitcast_convert_type(b, jnp.int32)
    lo = jax.lax.shift_right_logical(bits[0:64, :], 16)
    hi = jnp.bitwise_and(bits[64:128, :], jnp.int32(-65536))
    wt_p = jnp.bitwise_or(lo, hi)
    return jnp.concatenate([wt_p, wt_p], axis=0)


def unpack(p, parity):
    """packed int32 + parity (0 = lo residue r<64, 1 = hi) -> f32."""
    lo = jax.lax.shift_left(p, 16)
    hi = jnp.bitwise_and(p, jnp.int32(-65536))
    return jax.lax.bitcast_convert_type(
        jnp.where(parity == 1, hi, lo), jnp.float32
    )


def correctness():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((LANE, LANE)).astype(np.float32)
    qv = rng.integers(0, LANE, (LANE, LANE)).astype(np.int32)
    sidx = rng.integers(0, LANE, (LANE, LANE)).astype(np.int32)
    par = rng.integers(0, 2, (LANE, LANE)).astype(np.int32)

    def kernel(w_ref, q_ref, s_ref, p_ref, o_ref):
        wt = w_ref[:].T
        wp2 = pack_window(wt)
        st = jnp.take_along_axis(wp2, q_ref[:], axis=1)
        at = st.T
        g = jnp.take_along_axis(at, s_ref[:], axis=1)
        o_ref[:] = unpack(g, p_ref[:])

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((LANE, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(w, qv, sidx, par)
    out = np.asarray(jax.block_until_ready(out))
    # reference: wt = w.T; packed row r2 = (bf16(wt[r2]), bf16(wt[r2+64]))
    wt = w.T
    wb = wt.astype(jnp.bfloat16).astype(np.float32)
    # emulate: st[r, j] = packed pair at (r % 64 base) -> after .T and the
    # sidx gather, lane l picks column sidx[j, l] of at; parity selects.
    wp_lo = wb[0:64]
    wp_hi = wb[64:128]
    stack_lo = np.vstack([wp_lo, wp_lo])
    stack_hi = np.vstack([wp_hi, wp_hi])
    st_l = np.take_along_axis(stack_lo, qv, axis=1)
    st_h = np.take_along_axis(stack_hi, qv, axis=1)
    at_l, at_h = st_l.T, st_h.T
    g_l = np.take_along_axis(at_l, sidx, axis=1)
    g_h = np.take_along_axis(at_h, sidx, axis=1)
    ref = np.where(par == 1, g_h, g_l)
    md = np.abs(out - ref).max()
    print(f"[pack2] correctness maxdiff = {md:.2e}", flush=True)
    assert md == 0.0, "packed pipeline mismatch"


def _mk_chain(packed, n_tiles, reps):
    """One kernel: an in-kernel fori_loop of `reps` full per-block
    assembly+gather pipelines over n_tiles slot-row tiles; data-dependent
    carry via the window."""

    def kernel(w_ref, q_ref, s_ref, p_ref, o_ref, st_ref):
        wt0 = w_ref[:].T

        def body(_, acc):
            # dependency: perturb wt by the previous accumulator rows
            wt = wt0 + jnp.concatenate([acc] * 16, axis=0) * 1e-30
            if packed:
                wp2 = pack_window(wt)
                for tp in range(n_tiles // 2):
                    qv = q_ref[tp * LANE : (tp + 1) * LANE, :]
                    st = jnp.take_along_axis(wp2, qv, axis=1)
                    at = st.T
                    for h in range(2):
                        t = 2 * tp + h
                        g = jnp.take_along_axis(
                            at, s_ref[t * LANE : (t + 1) * LANE, :], axis=1
                        )
                        v = unpack(g, p_ref[t * LANE : (t + 1) * LANE, :])
                        acc = acc * 0.5 + v[0:8, :]
            else:
                for t in range(n_tiles):
                    qv = q_ref[t * LANE : (t + 1) * LANE, :]
                    st = jnp.take_along_axis(wt, qv, axis=1)
                    st_ref[t * LANE : (t + 1) * LANE, :] = st.T
                for t in range(n_tiles):
                    g = jnp.take_along_axis(
                        st_ref[t * LANE : (t + 1) * LANE, :],
                        s_ref[t * LANE : (t + 1) * LANE, :],
                        axis=1,
                    )
                    acc = acc * 0.5 + g[0:8, :]
            return acc

        o_ref[:] = jax.lax.fori_loop(
            0, reps, body, jnp.zeros((8, LANE), jnp.float32)
        )

    def run(w, qv, sidx, par):
        return pl.pallas_call(
            kernel,
            out_shape=jax.ShapeDtypeStruct((8, LANE), jnp.float32),
            in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
            out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
            scratch_shapes=[pltpu.VMEM((n_tiles * LANE, LANE), jnp.float32)],
            interpret=_interp(),
        )(w, qv, sidx, par)

    return run


def rate(packed, n_tiles=4):
    rng = np.random.default_rng(1)
    w = rng.standard_normal((LANE, LANE)).astype(np.float32)
    qv = rng.integers(0, LANE, (n_tiles * LANE, LANE)).astype(np.int32)
    sidx = rng.integers(0, LANE, (n_tiles * LANE, LANE)).astype(np.int32)
    par = rng.integers(0, 2, (n_tiles * LANE, LANE)).astype(np.int32)
    if _interp():
        print("[pack2] rate: skipped (interpret mode)", flush=True)
        return
    lo, hi = 20000, 120000
    ts = {}
    for k in (lo, hi):
        f = jax.jit(_mk_chain(packed, n_tiles, k))
        float(np.asarray(f(w, qv, sidx, par))[0, 0])  # warm + sync
        best = float("inf")
        for _ in range(3):
            t0 = time.perf_counter()
            float(np.asarray(f(w, qv, sidx, par))[0, 0])
            best = min(best, time.perf_counter() - t0)
        ts[k] = best
    per = (ts[hi] - ts[lo]) / (hi - lo)
    elems = n_tiles * LANE * LANE
    print(
        f"[pack2] {'packed' if packed else 'unpacked'}: {per*1e6:.3f} us/rep "
        f"({per/elems*1e12:.2f} ps/slot-elem)", flush=True
    )


if __name__ == "__main__":
    correctness()
    rate(False)
    rate(True)
    print("[pack2] OK", flush=True)
