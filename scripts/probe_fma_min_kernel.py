#!/usr/bin/env python
"""Minimal Pallas interpret-mode repro of the grid>=2 df hi-word bug.

Two r=0 diagonals, two grid steps, bs=8: per block
    acc = two_sum chain of (d0*x0) then (d1*x1)
Outputs hi and lo.  Compare per-element against exact f32 numpy
simulation; dump HLO when XLA_FLAGS has --xla_dump_to.

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_fma_min_kernel.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.experimental import pallas as pl

BS, LANE, D = 8, 128, 2


def two_sum(a, b):
    s = a + b
    bb = s - a
    e = (a - (s - bb)) + (b - bb)
    return s, e


def kernel(d_ref, x_ref, oh_ref, ol_ref):
    acc_h = jnp.zeros((BS, LANE), jnp.float32)
    acc_l = jnp.zeros((BS, LANE), jnp.float32)
    for k in range(D):
        p = d_ref[k] * x_ref[k]
        acc_h, err = two_sum(acc_h, p)
        acc_l = acc_l + err
    oh_ref[...] = acc_h
    ol_ref[...] = acc_l


def run(nblocks):
    rng = np.random.default_rng(0)
    d = rng.standard_normal((D, nblocks * BS, LANE)).astype(np.float32)
    x = rng.standard_normal((D, nblocks * BS, LANE)).astype(np.float32)
    spec = pl.BlockSpec((D, BS, LANE), lambda i: (0, i, 0))
    ospec = pl.BlockSpec((BS, LANE), lambda i: (i, 0))
    oh, ol = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=[spec, spec],
        out_specs=[ospec, ospec],
        out_shape=[
            jax.ShapeDtypeStruct((nblocks * BS, LANE), jnp.float32)
        ] * 2,
        interpret=True,
    )(d, x)
    return np.asarray(oh), np.asarray(ol), d, x


def simulate(d, x):
    f = np.float32
    acc_h = np.zeros(d.shape[1:], np.float32)
    acc_l = np.zeros(d.shape[1:], np.float32)
    for k in range(D):
        p = f(d[k] * x[k])
        s = f(acc_h + p)
        bb = f(s - acc_h)
        err = f(f(acc_h - f(s - bb)) + f(p - bb))
        acc_h, acc_l = s, f(acc_l + err)
    return acc_h, acc_l


for nb in (1, 2):
    oh, ol, d, x = run(nb)
    sh, sl = simulate(d, x)
    bh = int((oh != sh).sum()); bl = int((ol != sl).sum())
    print(f"nblocks={nb}: hi mismatches={bh}/{oh.size} lo mismatches={bl}")
    if bh:
        i = np.argwhere(oh != sh)[0]
        r, c = int(i[0]), int(i[1])
        p0 = np.float32(d[0, r, c] * x[0, r, c])
        p1 = np.float32(d[1, r, c] * x[1, r, c])
        fma = np.float32(
            np.float64(d[1, r, c]) * np.float64(x[1, r, c]) + np.float64(p0)
        )
        print(f"  first bad ({r},{c}): got={oh[r, c]!r} want={sh[r, c]!r} "
              f"fma(d1,x1,p0)={fma!r} match_fma={oh[r, c] == fma}")
