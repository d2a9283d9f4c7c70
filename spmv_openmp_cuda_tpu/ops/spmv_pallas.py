"""Pallas TPU kernels for the SpMV hot path.

Hand-scheduled counterparts of the XLA kernels in spmv_xla.py, for the cases
where explicit VMEM blocking wins (or where we need to prove XLA's fusion is
already at the roofline — the harness A/Bs them like the reference A/B'd its
CUDA variants against OMP).

Mosaic constraints that shaped these designs (probed on v5e):
- arbitrary gathers from a VMEM-resident vector are NOT lowerable; only
  same-shape 2D take_along_axis (axis 0/1, 128 lanes). Hence the dense-x
  gather stays in XLA (pre-gathered slab input) except in DIA, which needs no
  gather at all.
- 1D blocks lower to a single-sublane layout; kernels below therefore use
  (8, L) output tiles.

Kernels run in interpreter mode automatically off-TPU (CPU tests).
"""
from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANE, SUBLANE
from ..formats.dia import DeviceDIA, pad_x_dia
from ..formats.matrix import DeviceELL, _ceil_to


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _pick_block(m_pad: int, want: int) -> int:
    """Largest LANE multiple <= want that divides m_pad (m_pad is always a
    LANE multiple)."""
    f = m_pad // LANE
    k = min(want // LANE, f)
    while f % k:
        k -= 1
    return k * LANE


# ---------------------------------------------------------------------------
# Transposed-ELL slab multiply-reduce (pregathered x)
# ---------------------------------------------------------------------------


def ell_t_slab_pallas(mat: DeviceELL, x: jax.Array, block_n: int = 2048) -> jax.Array:
    """SpMV over the transposed (W, M) slab: the x gather runs in XLA (see
    module docstring), the multiply+reduce streams (W, BN) tiles through VMEM.

    The lane-level sum over W sublanes is the warp-shuffle-reduction analog
    (reference cudaSpMVWarpPerRowCSR / reduceWarpRegs, cudaUtils.h:101-106).
    """
    assert mat.transposed
    w, m_pad = mat.data.shape
    bn = _pick_block(m_pad, block_n)
    xg = x[mat.cols].astype(mat.data.dtype)  # (W, M_pad)

    def kernel(data_ref, xg_ref, o_ref):
        prods = data_ref[:] * xg_ref[:]
        s = jnp.sum(prods, axis=0)  # (BN,)
        o_ref[:] = s.reshape(o_ref.shape)

    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bn,),
        in_specs=[
            pl.BlockSpec((w, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((w, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), mat.data.dtype),
        interpret=_interpret(),
    )(mat.data, xg)
    return out[0, : mat.shape[0]]


# ---------------------------------------------------------------------------
# Fused DIA kernel: one pass over the diagonal slab, x halo in VMEM
# ---------------------------------------------------------------------------


def dia_spmv_pallas(mat: DeviceDIA, x: jax.Array, block_n: int = 2048) -> jax.Array:
    """y = A @ x over diagonals, fully fused in one Pallas kernel.

    Grid over output blocks of BN rows. The shifted x reads come from a
    3-block sliding window (blocks i, i+1, i+2 of the padded vector), valid
    while pad + max|offset| <= 2*BN. Each diagonal contributes a static slice
    of the window — no gather, no indices.
    """
    d, m_pad = mat.data.shape
    bn = _pick_block(m_pad, block_n)
    if mat.pad > bn:
        raise ValueError("diagonal reach exceeds block size")
    offsets = mat.offsets
    pad = mat.pad

    xp = pad_x_dia(x, mat).astype(mat.data.dtype)
    # extend so block i+2 exists for the last grid step
    total = (m_pad // bn + 2) * bn
    xp = jnp.pad(xp, (0, total - xp.shape[0]))

    def kernel(dia_ref, x0_ref, x1_ref, x2_ref, o_ref):
        xw = jnp.concatenate([x0_ref[0], x1_ref[0], x2_ref[0]])  # (3*BN,)
        acc = jnp.zeros((bn,), dia_ref.dtype)
        for k, off in enumerate(offsets):  # static unroll over diagonals
            seg = jax.lax.slice_in_dim(xw, pad + off, pad + off + bn)
            acc = acc + dia_ref[k, :] * seg
        o_ref[:] = acc.reshape(o_ref.shape)

    x2d = xp.reshape(1, -1)
    out = pl.pallas_call(
        kernel,
        grid=(m_pad // bn,),
        in_specs=[
            pl.BlockSpec((d, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i + 1), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, bn), lambda i: (0, i + 2), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, bn), lambda i: (0, i), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((1, m_pad), mat.data.dtype),
        interpret=_interpret(),
    )(mat.data, x2d, x2d, x2d)
    return out[0, : mat.shape[0]]


# ---------------------------------------------------------------------------
# registry hook (imported by ops.registry.register_pallas_kernels)
# ---------------------------------------------------------------------------


def _register() -> None:
    from ..formats.dia import prepare_dia
    from ..formats.matrix import device_ell
    from .registry import KernelSpec, register

    register(
        KernelSpec(
            name="PL_ELL_ROWS_T",
            fmt="ell",
            impl="pallas",
            prepare=lambda csr, ell, cfg: (
                device_ell(ell, dtype=cfg.jnp_dtype, transposed=True),
                cfg.pallas_block_n,
            ),
            run=lambda ops, x: ell_t_slab_pallas(ops[0], x, block_n=ops[1]),
            doc="Pallas transposed-slab multiply-reduce (VMEM-tiled; "
            "lane-level reduction = warp-shuffle analog)",
        )
    )
    register(
        KernelSpec(
            name="PL_DIA_ROWS",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: (
                prepare_dia(csr, dtype=cfg.jnp_dtype),
                cfg.pallas_block_n,
            ),
            run=lambda ops, x: dia_spmv_pallas(ops[0], x, block_n=ops[1]),
            doc="Pallas fused diagonal kernel: one pass over the diagonal "
            "slab with a 3-block sliding x window in VMEM",
        )
    )


_register()
