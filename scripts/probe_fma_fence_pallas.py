#!/usr/bin/env python
"""Fence candidates against the REAL failing case: dia_spmv_pallas_df at
grid>=2 under CPU interpret mode (XLA:CPU output fusion recomputes the
final acc+p with the mul contracted to FMA).

PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu python scripts/probe_fma_fence_pallas.py
"""
import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
os.environ.setdefault("PALLAS_AXON_POOL_IPS", "")
os.environ["JAX_ENABLE_X64"] = "1"

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

import spmv_openmp_cuda_tpu.ops.dfloat as dfloat
from spmv_openmp_cuda_tpu.utils import synth
from spmv_openmp_cuda_tpu.formats import convert as S
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.ops.spmv_pallas import (
    dia_spmv_pallas_df, prepare_dia_df_pallas,
)

FENCES = {
    "opt_barrier": lambda p: lax.optimization_barrier(p),
    "none": lambda p: p,
    "bitcast_pair": lambda p: lax.bitcast_convert_type(
        lax.bitcast_convert_type(p, jnp.int32), jnp.float32
    ),
    "tag_nan": lambda p: jnp.where(jnp.isnan(p), p, p),
}


def run_case(name):
    # two diagonals, 2 sublane blocks => grid 2 (min failing shape per the
    # round-4 bisection); band matrix big enough for nblocks >= 2
    from spmv_openmp_cuda_tpu.formats.dia import prepare_dia_df
    from spmv_openmp_cuda_tpu.ops.spmv_pallas import (
        pad_dia_df_for_pallas, plan_dia,
    )

    csr = S.coo_to_csr(synth.banded(20480, 20480, 3, fill=1.0, seed=3))
    mat = prepare_dia_df(csr)
    plan = plan_dia(mat.as_dia(), vmem_budget=1 << 14)  # force grid >= 2
    ops = pad_dia_df_for_pallas(mat, plan)
    rng = np.random.default_rng(5)
    x = rng.standard_normal(csr.shape[1])
    want = serial_csr_spmv(csr, x)
    y = np.asarray(
        jax.jit(
            lambda d, p, xv: dia_spmv_pallas_df(d, xv, p),
            static_argnums=1,
        )(ops, plan, jnp.asarray(x, jnp.float64)),
        np.float64,
    )
    err = float(np.abs(y - want).max()) / float(np.abs(want).max())
    print(f"{name:14s} nblocks={plan.nblocks:3d} rel_err={err:.3e}")
    return err


for name, fence in FENCES.items():
    dfloat._nofma = (lambda f: (lambda p: f(p) if jax.default_backend() != "tpu" else p))(fence)
    try:
        run_case(name)
    except Exception as e:
        print(f"{name:14s} FAILED: {type(e).__name__}: {e}")
