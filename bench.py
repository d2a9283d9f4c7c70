#!/usr/bin/env python
"""Headline benchmark for the driver: prints ONE JSON line.

Protocol mirrors the reference's (BASELINE.md): mean of 25 timed reps,
GFLOPS = 2*NNZ/time, correctness vs the serial oracle at 7e-4 tolerance with
|x| < 3e-5 inputs. Matrix: a synthetic proxy of FEM_3D_thermal2 (147.9k^2,
~3.4M nnz banded — SuiteSparse is unreachable here, zero egress), on which the
reference's best CUDA kernel (Quadro RTX 5000) hit 39.14 GFLOPS — that is
vs_baseline's denominator.
"""
import json
import sys
import time

import numpy as np


def log(msg):
    print(msg, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp

    import spmv_openmp_cuda_tpu as S
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.ops import registry
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.utils import synth
    from spmv_openmp_cuda_tpu.utils.compare import vectors_diff

    REFERENCE_GFLOPS = 39.14  # BASELINE.md FEM_3D_thermal2, CUDA best
    REPS = 25

    log(f"backend={jax.default_backend()} devices={jax.devices()}")
    t0 = time.perf_counter()
    coo = synth.preset("fem_3d_thermal2_like", seed=0)
    csr = S.coo_to_csr(coo)
    ell = S.coo_to_ell(coo)
    x = fill_rnd_vector(coo.shape[1], seed=1)
    log(
        f"matrix fem_3d_thermal2_like: {csr.shape[0]}x{csr.shape[1]} "
        f"nnz={csr.nnz} maxRowNZ={csr.max_row_nz} (gen {time.perf_counter()-t0:.1f}s)"
    )
    oracle = serial_csr_spmv(csr, x)
    cfg = Config(dtype="float32", avg_times_iteration=REPS)

    candidates = ["ELL_ROWS", "ELL_ROWS_T", "CSR_ROWS", "ELL_ROWS_NORL"]
    # include Pallas kernels if registered
    candidates += [s.name for s in registry.all_kernels(impl="pallas")]

    best = (None, 0.0)
    for name in candidates:
        try:
            spec = registry.get(name)
        except KeyError:
            continue
        try:
            ops = spec.prepare(csr, ell, cfg)
            f = spec.jitted(ops)
            xj = jax.device_put(jnp.asarray(x, dtype=cfg.jnp_dtype))
            y = jax.block_until_ready(f(xj))
            rep = vectors_diff(
                np.asarray(y, dtype=np.float64)[: csr.shape[0]], oracle
            )
            if not rep.ok:
                log(f"{name}: FAILED tolerance ({rep.max_abs_diff:.2e}) — skipped")
                continue
            # timed protocol: chained reps, device-synced once
            for _ in range(3):
                y = f(xj)
            jax.block_until_ready(y)
            t0 = time.perf_counter()
            for _ in range(REPS):
                y = f(xj)
            jax.block_until_ready(y)
            dt = (time.perf_counter() - t0) / REPS
            gflops = 2.0 * csr.nnz / dt / 1e9
            log(f"{name}: {dt*1e6:.1f} us -> {gflops:.2f} GFLOPS")
            if gflops > best[1]:
                best = (name, gflops)
        except Exception as e:
            log(f"{name}: ERROR {str(e)[:200]}")

    if best[0] is None:
        print(json.dumps({"metric": "spmv_gflops", "value": 0.0, "unit": "GFLOP/s", "vs_baseline": 0.0}))
        return 1
    log(f"best: {best[0]}")
    print(
        json.dumps(
            {
                "metric": "spmv_gflops_fem3d_proxy",
                "value": round(best[1], 3),
                "unit": "GFLOP/s",
                "vs_baseline": round(best[1] / REFERENCE_GFLOPS, 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
