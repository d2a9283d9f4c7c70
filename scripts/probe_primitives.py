#!/usr/bin/env python
"""Probe achievable TPU primitive throughput for the SpMV building blocks.

Times each candidate primitive with an on-device fori_loop chain (the value
fed back between iterations so XLA cannot hoist loop-invariant work), which
amortizes the ~3.4 ms tunnel dispatch latency to noise.

Run: python scripts/probe_primitives.py [--steps 50]
"""
import argparse
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=50)
    ap.add_argument("--only", type=str, default="")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    STEPS = args.steps

    def timed(name, make_step, carry, bytes_per_step, flops_per_step=0):
        """make_step: fn(carry)->carry (jittable). Times STEPS iterations."""
        if args.only and args.only not in name:
            return

        @jax.jit
        def chain(c):
            return jax.lax.fori_loop(0, STEPS, lambda i, c: make_step(c), c)

        r = chain(carry)  # compile + warm
        jax.block_until_ready(r)
        t0 = time.perf_counter()
        r = chain(carry)
        jax.block_until_ready(r)
        dt = (time.perf_counter() - t0) / STEPS
        gbs = bytes_per_step / dt / 1e9
        gfl = flops_per_step / dt / 1e9
        log(f"{name:44s} {dt*1e6:10.1f} us  {gbs:8.1f} GB/s  {gfl:8.2f} GFLOP/s")

    key = jax.random.PRNGKey(0)

    # --- 1. dense 2D elementwise bandwidth ceiling -------------------------
    M2, N2 = 16384, 512  # 32 MB f32
    x2 = jax.random.normal(key, (M2, N2), jnp.float32)
    timed(
        "2D elementwise y=x*a (32MB, read+write)",
        lambda c: c * 1.0000001,
        x2,
        bytes_per_step=2 * M2 * N2 * 4,
    )

    # --- 2. 1D elementwise -------------------------------------------------
    n1 = M2 * N2
    x1 = x2.reshape(-1)
    timed(
        "1D elementwise y=x*a (32MB)",
        lambda c: c * 1.0000001,
        x1,
        bytes_per_step=2 * n1 * 4,
    )

    # --- 3. 2D reduce over sublanes (ELL_T style): (W, M) -> (M,) ----------
    W, MP = 32, 147968
    slab = jax.random.normal(key, (W, MP), jnp.float32)

    def red_step(c):
        s = jnp.sum(slab * (1.0 + c[0] * 0.0), axis=0)
        return s

    timed(
        "2D mul+reduce axis0 (W=32 x 148k)",
        red_step,
        jnp.zeros((MP,), jnp.float32),
        bytes_per_step=W * MP * 4,
        flops_per_step=2 * W * MP,
    )

    # --- 4. XLA gather 1D: x[idx] -----------------------------------------
    NV = 192 * 1024
    xsrc = jax.random.normal(key, (NV,), jnp.float32)
    for G in (805_000, 3_700_000):
        idx = jax.random.randint(key, (G,), 0, NV, jnp.int32)

        def gather_step(c, idx=idx, G=G):
            g = xsrc[idx] * (1.0 + c[0] * 0.0)
            return g

        timed(
            f"XLA 1D gather x[idx] G={G/1e6:.1f}M",
            gather_step,
            jnp.zeros((G,), jnp.float32),
            bytes_per_step=G * 8,
        )

    # --- 5. lane-aligned take_along_axis axis0 ----------------------------
    S = NV // 128
    x2d = xsrc.reshape(S, 128)
    for K in (6291, 28906):  # ~805k, ~3.7M gathers
        idx2 = jax.random.randint(key, (K, 128), 0, S, jnp.int32)

        def taa_step(c, idx2=idx2):
            g = jnp.take_along_axis(x2d * (1.0 + c[0, 0] * 0.0), idx2, axis=0)
            return g

        timed(
            f"take_along_axis axis0 (K={K}x128)",
            taa_step,
            jnp.zeros((K, 128), jnp.float32),
            bytes_per_step=K * 128 * 8,
        )

    # --- 6. XLA 2D gather: x[idx2] with 2D index array --------------------
    Mg = 28906
    idxl = jax.random.randint(key, (Mg, 128), 0, NV, jnp.int32)

    def g2_step(c):
        g = (xsrc * (1.0 + c[0, 0] * 0.0))[idxl]
        return g

    timed(
        "XLA 2D-idx gather x[idx] (28906x128)",
        g2_step,
        jnp.zeros((Mg, 128), jnp.float32),
        bytes_per_step=Mg * 128 * 8,
    )

    # --- 7. sorted segment_sum --------------------------------------------
    NNZ = 3_512_503
    Mrows = 147_900
    vals = jax.random.normal(key, (NNZ,), jnp.float32)
    seg = jnp.sort(jax.random.randint(key, (NNZ,), 0, Mrows, jnp.int32))

    def seg_step(c):
        return jax.ops.segment_sum(
            vals * (1.0 + c[0] * 0.0), seg, num_segments=Mrows,
            indices_are_sorted=True,
        )

    timed(
        "sorted segment_sum (3.5M nnz -> 148k rows)",
        seg_step,
        jnp.zeros((Mrows,), jnp.float32),
        bytes_per_step=NNZ * 8,
    )

    # --- 8. one-hot matmul gather on MXU ----------------------------------
    # gather 128 cols from x per 128-row tile: A_onehot (128, NV) too big;
    # instead: dense band matmul throughput (128-wide band as dense blocks)
    Bm, Bk = 8192, 512
    band = jax.random.normal(key, (Bm, Bk), jnp.float32)
    xb = jax.random.normal(key, (Bk,), jnp.float32)

    def band_step(c):
        return band @ (xb * (1.0 + c[0] * 0.0))

    timed(
        "dense band matvec (8192x512) MXU",
        band_step,
        jnp.zeros((Bm,), jnp.float32),
        bytes_per_step=Bm * Bk * 4,
        flops_per_step=2 * Bm * Bk,
    )

    # --- 9. current DIA XLA path (25 diagonals, 148k) ---------------------
    D = 25
    dia = jax.random.normal(key, (D, MP), jnp.float32)
    xp = jax.random.normal(key, (MP + 256,), jnp.float32)
    offs = list(range(-12, 13))

    def dia_step(c):
        acc = jnp.zeros((MP,), jnp.float32)
        xq = xp * (1.0 + c[0] * 0.0)
        for i, o in enumerate(offs):
            acc = acc + dia[i] * jax.lax.slice_in_dim(xq, 128 + o, 128 + o + MP)
        return acc

    timed(
        "DIA 1D unrolled (25 diag x 148k)",
        dia_step,
        jnp.zeros((MP,), jnp.float32),
        bytes_per_step=D * MP * 4,
        flops_per_step=2 * D * MP,
    )

    # --- 10. DIA as 2D rows: data (D*S8, 128)? shift via 2-slice 2D -------
    S8 = MP // 128
    dia2d = jax.random.normal(key, (D, S8, 128), jnp.float32)
    xp2 = jax.random.normal(key, (S8 + 2, 128), jnp.float32)

    def dia2d_step(c):
        acc = jnp.zeros((S8, 128), jnp.float32)
        xq = xp2 * (1.0 + c[0, 0] * 0.0)
        for i, o in enumerate(offs):
            q, r = divmod(o + 128, 128)
            lo = jax.lax.dynamic_slice(xq, (q, 0), (S8, 128))
            hi = jax.lax.dynamic_slice(xq, (q + 1, 0), (S8, 128))
            if r == 0:
                sh = lo
            else:
                sh = jnp.concatenate([lo[:, r:], hi[:, :r]], axis=1)
            acc = acc + dia2d[i] * sh
        return acc

    timed(
        "DIA 2D two-slice (25 diag x 148k)",
        dia2d_step,
        jnp.zeros((S8, 128), jnp.float32),
        bytes_per_step=D * MP * 4,
        flops_per_step=2 * D * MP,
    )


if __name__ == "__main__":
    main()
