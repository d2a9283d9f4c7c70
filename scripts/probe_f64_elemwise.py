#!/usr/bin/env python
"""Probe XLA's emulated-f64 elementwise/reduce throughput on this backend.

Motivation: the bench timing chain multiplies the f64 x vector by a
data-dependent scalar between chained spmv's. If emulated f64 elementwise
ops run far below f32, that per-step cost taxes the double-float engine
measurements (the carry reduce already runs in f32 — bench.py _dep). This
probe records mul/add/convert/sum rates at 1M elements so the chain
overhead can be subtracted from any suspicious f64 slope.

Usage: python scripts/probe_f64_elemwise.py [n_elems]
"""
import sys
import time

import jax
import jax.numpy as jnp


def slope(fn, x0, lo=20):
    @jax.jit
    def loop(x, steps):
        def body(i, x):
            y = fn(x)
            return x * (1.0 + jnp.sum(y[:8].astype(jnp.float32)).astype(x.dtype) * 1e-30)

        return jax.lax.fori_loop(0, steps, body, x, unroll=False)

    def timed(steps):
        s = jnp.int32(steps)
        _ = float(jnp.sum(loop(x0, s)[:4].astype(jnp.float32)))
        best = float("inf")
        for _ in range(2):
            t = time.perf_counter()
            _ = float(jnp.sum(loop(x0, s)[:4].astype(jnp.float32)))
            best = min(best, time.perf_counter() - t)
        return best

    t_lo = timed(lo)
    est = max(t_lo / lo, 1e-7)
    hi = lo + max(min(int(1.0 / est), int(8.0 / est)), 50)
    t_hi = timed(hi)
    return (t_hi - t_lo) / (hi - lo)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 1_000_000
    for dt in (jnp.float32, jnp.float64):
        try:
            x = jnp.arange(n, dtype=dt) * 1e-9
            dtm = slope(lambda v: v * jnp.float32(1.0000001).astype(dt), x)
            dta = slope(lambda v: v + jnp.float32(1e-30).astype(dt), x)
            print(
                f"{dt.__name__}: mul {n/dtm/1e9:.2f} Gelem/s "
                f"({dtm*1e6:.1f} us), add {n/dta/1e9:.2f} Gelem/s",
                flush=True,
            )
        except Exception as e:
            print(f"{dt.__name__}: ERROR {str(e)[:160]}", flush=True)
    # f64 full-vector sum (the pre-fix chain carry)
    try:
        x64 = jnp.arange(n, dtype=jnp.float64) * 1e-9
        dts = slope(lambda v: v * (1.0 + jnp.sum(v) * 1e-30), x64)
        print(f"float64 sum+mul chain step: {dts*1e6:.1f} us", flush=True)
    except Exception as e:
        print(f"float64 sum: ERROR {str(e)[:160]}", flush=True)


if __name__ == "__main__":
    import os

    if os.environ.get("SPMV_PROBE_X64", "1") == "1":
        jax.config.update("jax_enable_x64", True)
    main()
