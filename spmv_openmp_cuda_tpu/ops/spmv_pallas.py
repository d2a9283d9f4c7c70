"""Pallas TPU kernels for the SpMV hot path.

Hand-scheduled counterparts of the XLA kernels in spmv_xla.py, for the cases
where explicit VMEM blocking wins (or where we need to prove XLA's fusion is
already at the roofline — the harness A/Bs them like the reference A/B'd its
CUDA variants against OMP).

Mosaic constraints that shaped these designs (probed on v5e):
- arbitrary gathers from a VMEM-resident vector are NOT lowerable; the one
  fast gather primitive is same-shape 2D `take_along_axis(..., axis=1)` —
  each sublane-row picks freely among its 128 lanes. axis=0 take_along_axis
  crashes the backend compiler.
- 1D arrays occupy a single sublane per (8, 128) tile; all hot loops below
  are therefore 2D (sublane-rows x 128 lanes). The 2D DIA formulation runs
  at ~500 GB/s where the 1D one measured ~23 GB/s.
- XLA-level gathers run at ~1 GB/s on v5e — any format whose SpMV needs an
  XLA gather of x is dead on arrival; gathers must happen in-kernel via the
  lane-gather primitive.

Kernels run in interpreter mode automatically off-TPU (CPU tests).
"""
from __future__ import annotations

import dataclasses
import functools
import os
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
    k = min(max(want // LANE, 1), f)
    while f % k:
        k -= 1
    return k * LANE


# ---------------------------------------------------------------------------
# Transposed-ELL slab multiply-reduce (pregathered x)
# ---------------------------------------------------------------------------


def ell_t_slab_pallas(mat: DeviceELL, x: jax.Array, block_n: int = 2048) -> jax.Array:
    """SpMV over the transposed (W, M) slab: the x gather runs in XLA (slow —
    kept as the faithful ELL-transposed analog; see CSR_LANES for the fast
    general path), the multiply+reduce streams (W, BN) tiles through VMEM.

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
# Fused DIA kernel — 2D sublane-row layout, two-slice lane shifts
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[],
    meta_fields=["bs", "nblocks", "s_pad"],
)
@dataclasses.dataclass(frozen=True)
class DiaPallasPlan:
    """Static launch plan for the Pallas DIA kernel (all-static pytree so
    kernel operands can be passed as jit arguments)."""

    bs: int  # sublane-rows per output block
    nblocks: int
    s_pad: int  # padded sublane-row count (= bs * nblocks)


def plan_dia(mat: DeviceDIA, vmem_budget: int = 2 << 20) -> DiaPallasPlan:
    d, s, _ = mat.data.shape
    # data block d*bs*LANE*4 bytes ~ vmem_budget; bs a multiple of 16 (the
    # bf16 sublane tile height, also valid for f32), and bs > pad_sub so the
    # 3-block x window covers every shift.
    bs = max(vmem_budget // (d * LANE * 4), 2 * SUBLANE)
    bs = _ceil_to(bs, 2 * SUBLANE)
    bs = min(bs, _ceil_to(s, 2 * SUBLANE))
    # the 3-block window invariant bs > pad_sub outranks the s clamp (wide
    # bands on short matrices: shifts reach far beyond one block of rows)
    bs = max(bs, _ceil_to(mat.pad_sub + 1, 2 * SUBLANE))
    s_pad = _ceil_to(s, bs)
    return DiaPallasPlan(bs=bs, nblocks=s_pad // bs, s_pad=s_pad)


def pad_dia_for_pallas(mat: DeviceDIA, plan: DiaPallasPlan) -> DeviceDIA:
    """Pad the diagonal slab's sublane-row axis up to the plan's block grid
    (one-time host-side prepare step, the upload-path analog of the
    reference's pitched ELL device copy, cudaUtils.cu:56-98)."""
    d, s, _ = mat.data.shape
    if s == plan.s_pad:
        return mat
    data = jnp.pad(mat.data, ((0, 0), (0, plan.s_pad - s), (0, 0)))
    return DeviceDIA(
        data=data,
        offsets=mat.offsets,
        shape=mat.shape,
        nnz=mat.nnz,
        pad_sub=mat.pad_sub,
    )


def dia_spmv_pallas(
    mat: DeviceDIA, x: jax.Array, plan: DiaPallasPlan | None = None
) -> jax.Array:
    """y = A @ x over diagonals, fully fused in one Pallas kernel.

    Grid over output blocks of BS sublane-rows (BS*128 rows). The shifted x
    reads come from a 3-block sliding window (blocks i, i+1, i+2 of the
    sublane-row-padded vector); each diagonal contributes a two-slice
    lane-shifted view of the window — no gather, no indices. Measured ~500
    GB/s of diagonal-slab traffic on v5e (the 1D formulation: ~23 GB/s).
    """
    if plan is None:
        plan = plan_dia(mat)
        mat = pad_dia_for_pallas(mat, plan)
    d, s_pad, _ = mat.data.shape
    bs, ps = plan.bs, mat.pad_sub
    offsets = mat.offsets
    dtype = mat.data.dtype

    # bf16 mode: only the big diagonal slab stays bf16 (the HBM win); the x
    # window and all in-kernel slicing run in f32 — sub-16-row bf16 slices
    # crash the Mosaic backend
    acc_dtype = jnp.float32 if dtype == jnp.bfloat16 else dtype

    # window layout: xk rows [0, nblocks+2 blocks); xp origin (x row 0) sits
    # at row ps; kernel block i covers out rows [i*bs, (i+1)*bs) and reads
    # window rows [ps+q, ps+q+bs+1) for q in [-ps, ps], all inside blocks
    # [i, i+3) of xk since ps < bs.
    xp = pad_x_dia(x, mat).astype(acc_dtype)  # (s + 2*ps, LANE)
    xk = jnp.pad(xp, ((0, (plan.nblocks + 2) * bs - xp.shape[0]), (0, 0)))

    use_roll = os.environ.get("SPMV_DIA_ROLL", "0") == "1"

    def kernel(x0_ref, x1_ref, x2_ref, dia_ref, o_ref, w_ref):
        # Stage the 3-block window in a VMEM scratch *ref*: slicing the lane-
        # shifted views out of a ref lowers to clean VMEM loads, while the
        # same slices of a concatenated SSA value crash the Mosaic backend.
        w_ref[0:bs] = x0_ref[:]
        w_ref[bs : 2 * bs] = x1_ref[:]
        w_ref[2 * bs : 3 * bs] = x2_ref[:]
        acc = jnp.zeros((bs, LANE), acc_dtype)
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (bs, LANE), 1)
        for k, off in enumerate(offsets):
            q, r = divmod(off, LANE)
            lo = w_ref[ps + q : ps + q + bs, :]
            if r == 0:
                sh = lo
            elif use_roll:
                # lane rotation + row blend (A/B alternative to the
                # two-slice concat; gated for measurement)
                hi = w_ref[ps + q + 1 : ps + q + 1 + bs, :]
                sh = jnp.where(
                    lane_i < LANE - r,
                    pltpu.roll(lo, LANE - r, 1),
                    pltpu.roll(hi, LANE - r, 1),
                )
            else:
                hi = w_ref[ps + q + 1 : ps + q + 1 + bs, :]
                sh = jnp.concatenate([lo[:, r:], hi[:, :r]], axis=1)
            acc = acc + dia_ref[k].astype(acc_dtype) * sh
        o_ref[:] = acc
    out = pl.pallas_call(
        kernel,
        grid=(plan.nblocks,),
        in_specs=[
            pl.BlockSpec((bs, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, LANE), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((bs, LANE), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (d, bs, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((bs, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, LANE), acc_dtype),
        scratch_shapes=[pltpu.VMEM((3 * bs, LANE), acc_dtype)],
        interpret=_interpret(),
    )(xk, xk, xk, mat.data)
    return out.reshape(-1)[: mat.shape[0]]


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

    def _mk_prep_dia(force_dtype=None):
        def _prep(csr, ell, cfg):
            mat = prepare_dia(csr, dtype=force_dtype or cfg.jnp_dtype)
            plan = plan_dia(mat)
            return (pad_dia_for_pallas(mat, plan), plan)

        return _prep

    register(
        KernelSpec(
            name="PL_DIA_ROWS",
            fmt="csr",
            impl="pallas",
            prepare=_mk_prep_dia(),
            run=lambda ops, x: dia_spmv_pallas(ops[0], x, ops[1]),
            doc="Pallas fused diagonal kernel: 2D sublane-row layout, "
            "3-block sliding x window, two-slice lane shifts (~500 GB/s)",
        )
    )
    register(
        KernelSpec(
            name="PL_DIA_BF16",
            fmt="csr",
            impl="pallas",
            prepare=_mk_prep_dia(jnp.bfloat16),
            run=lambda ops, x: dia_spmv_pallas(ops[0], x, ops[1]),
            doc="bf16 diagonal slab (f32 accumulate): halves HBM traffic on "
            "the bandwidth-bound banded path; valid inside the reference "
            "7e-4 tolerance for bounded-band matrices",
        )
    )

    from ..formats.lanes import lanes_small_spmv, prepare_lanes_small

    register(
        KernelSpec(
            name="PL_CSR_LANES",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_lanes_small(
                csr, dtype=cfg.jnp_dtype
            ),
            run=lanes_small_spmv,
            doc="lane-gather engine for unstructured matrices (small-G): "
            "in-VMEM take_along_axis gather + masked group accumulate "
            "(the 2D-tiles/warp analog for random sparsity)",
        )
    )

    from ..formats.window import prepare_window_auto, window_spmv

    register(
        KernelSpec(
            name="PL_CSR_WINDOW",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_window_auto(
                csr, dtype=cfg.jnp_dtype
            ),
            run=window_spmv,
            doc="windowed local-gather engine for banded-LOCALITY matrices "
            "(unstructured FEM): per row-block chunk-class slots, "
            "data-driven window assembly, masked group reduce — no global "
            "permutation (the reference's ELL capability for such "
            "matrices, SpMV_ELL_OMP.c:33-67, TPU-first)",
        )
    )
    register(
        KernelSpec(
            name="PL_CSR_WINDOW_BF16",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_window_auto(
                csr, dtype=jnp.float32, vals_dtype=jnp.bfloat16
            ),
            run=window_spmv,
            doc="windowed local-gather with bf16 value slabs (f32 gather/"
            "accumulate): halves the dominant slot-value HBM stream",
        )
    )

    from ..formats.routed import prepare_routed_auto, routed_auto_spmv

    register(
        KernelSpec(
            name="PL_CSR_ROUTED",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_routed_auto(
                csr, dtype=cfg.jnp_dtype
            ),
            run=routed_auto_spmv,
            doc="Clos-routed CSR: lane-gather products in panel order, "
            "static Clos permutation to width-binned reduction slabs, "
            "multi-level dense sublane reduces — the fully general "
            "large-G engine for unstructured/power-law matrices",
        )
    )

    register(
        KernelSpec(
            name="PL_CSR_ROUTED_BF16",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_routed_auto(
                csr, dtype=jnp.float32, vals_dtype=jnp.bfloat16
            ),
            run=routed_auto_spmv,
            doc="Clos-routed CSR with bf16 value slabs (f32 gather/route/"
            "accumulate): halves the gather phase's dominant HBM stream; "
            "the bf16-value trade of PL_DIA_BF16 applied to the general "
            "engine",
        )
    )


_register()
