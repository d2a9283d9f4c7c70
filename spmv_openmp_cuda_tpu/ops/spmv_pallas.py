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
from .dfloat import interpret_mode, traced_x32 as _traced_x32


def _interpret() -> bool:
    return interpret_mode()


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


def plan_dia(
    mat: DeviceDIA, vmem_budget: int = 2 << 20, max_bs: int | None = None
) -> DiaPallasPlan:
    from ..formats.dia import DiaFillError

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
    if max_bs is not None:
        # residual mode: the 3-block window must fit the 128-row transposed
        # staging tile (3*bs <= 128)
        if _ceil_to(mat.pad_sub + 1, 2 * SUBLANE) > max_bs:
            raise DiaFillError("band too wide for the residual window")
        bs = min(bs, max_bs)
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


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mat", "rvals", "rsidx", "rgid", "rsrc", "rvals_lo"],
    meta_fields=["k_pad", "nnz_resid"],
)
@dataclasses.dataclass
class DiaResid:
    """DIA + windowed-residual hybrid (real banded matrices = dense
    diagonals + a scattered fringe; reference corpus example: raefsky1).

    The dense-offset core rides the fused diagonal kernel; the fringe nnz
    become windowed-gather slots (the formats/window.py layout, with the
    DIA kernel's own 3-block x window as the gather source and the block's
    bs sublane-rows as the masked-reduce groups) evaluated INSIDE the same
    kernel — zero extra launches or memory passes."""

    mat: DeviceDIA  # DeviceDIADF in double-float mode
    rvals: jax.Array  # (nblocks*k_pad, 128)
    rsidx: jax.Array  # (nblocks*k_pad, 128) int8: c % 128
    rgid: jax.Array  # (nblocks*k_pad, 128) int8: sublane-row within block
    rsrc: jax.Array  # (nblocks*n_ktiles*8, 128) int32: window row/slot-row
    rvals_lo: jax.Array | None = None  # double-float mode: f32 low words
    k_pad: int = 16
    nnz_resid: int = 0

    @property
    def n_ktiles(self) -> int:
        return -(-self.k_pad // LANE)


def prepare_dia_resid(
    csr, dtype=jnp.float32, dia_dtype=None, vals_dtype=None, df: bool = False
):
    """(DiaResid, plan): dense-offset DIA core + windowed residual fringe.

    dia_dtype/vals_dtype default to dtype; pass bfloat16 for the halved-HBM
    variant (accumulation stays f32). df=True builds the double-float
    hybrid: DeviceDIADF core + (hi, lo) residual values (ops/dfloat.py)."""
    import numpy as _np

    from ..formats.dia import prepare_dia, prepare_dia_df, split_offsets
    from ..formats.matrix import CSRMatrix

    if dia_dtype is None:
        dia_dtype = dtype
    if vals_dtype is None:
        vals_dtype = dtype
    m, n = csr.shape
    keep = split_offsets(csr)
    rows_all = csr.row_ids().astype(_np.int64)
    kept = CSRMatrix(
        shape=(m, n),
        indptr=_np.r_[
            0, _np.cumsum(_np.bincount(rows_all[keep], minlength=m))
        ].astype(_np.int64),
        indices=csr.indices[keep],
        data=csr.data[keep],
    )
    if df:
        mat = prepare_dia_df(kept)
        plan = plan_dia(mat.as_dia(), vmem_budget=DF_DIA_VMEM_BUDGET, max_bs=42)
        mat = pad_dia_df_for_pallas(mat, plan)
    else:
        mat = prepare_dia(kept, dtype=dia_dtype)
        plan = plan_dia(mat, max_bs=42)
        mat = pad_dia_for_pallas(mat, plan)
    bs, ps, nblocks = plan.bs, mat.pad_sub, plan.nblocks

    rows_r = rows_all[~keep]
    cols_r = csr.indices[~keep].astype(_np.int64)
    data_r = csr.data[~keep]
    blk = rows_r // (bs * LANE)
    lane = rows_r % LANE
    gid_v = (rows_r // LANE) % bs
    dq = cols_r // LANE + ps - blk * bs
    assert dq.min(initial=0) >= 0 and dq.max(initial=0) < 3 * bs, "window"
    # depth within (block, window-row, lane)
    nqw = 3 * bs
    cell = (blk * nqw + dq) * LANE + lane
    order = _np.argsort(cell, kind="stable")
    cs = cell[order]
    if cs.size:
        starts = _np.r_[0, _np.flatnonzero(_np.diff(cs)) + 1]
        rid = _np.zeros(cs.shape[0], dtype=_np.int64)
        rid[starts] = 1
        rid = _np.cumsum(rid) - 1
        depth = _np.arange(cs.shape[0]) - starts[rid]
    else:  # fully dense band: empty residual, zero slots only
        depth = _np.zeros(0, dtype=_np.int64)
    depth_u = _np.empty_like(depth)
    depth_u[order] = depth
    bq_id = blk * nqw + dq
    need = _np.zeros(nblocks * nqw, dtype=_np.int64)
    if bq_id.size:
        _np.maximum.at(need, bq_id, depth_u + 1)
    base = _np.zeros(nblocks * nqw, dtype=_np.int64)
    csum = need.reshape(nblocks, nqw).cumsum(axis=1)
    base.reshape(nblocks, nqw)[:, 1:] = csum[:, :-1]
    k_max = int(csum[:, -1].max(initial=1))
    k_pad = max(_ceil_to(k_max, 2 * SUBLANE), 2 * SUBLANE)
    n_ktiles = -(-k_pad // LANE)
    slot_row = blk * k_pad + base[bq_id] + depth_u
    rvals = _np.zeros((nblocks * k_pad, LANE), dtype=_np.float64)
    rsidx = _np.zeros((nblocks * k_pad, LANE), dtype=_np.int8)
    rgid = _np.zeros((nblocks * k_pad, LANE), dtype=_np.int8)
    rvals[slot_row, lane] = data_r
    rsidx[slot_row, lane] = (cols_r % LANE).astype(_np.int8)
    rgid[slot_row, lane] = gid_v.astype(_np.int8)
    rsrc_rows = _np.zeros(nblocks * k_pad, dtype=_np.int32)
    rsrc_rows[slot_row] = dq.astype(_np.int32)
    rsrc = _np.zeros((nblocks * n_ktiles * 8, LANE), dtype=_np.int32)
    for t in range(n_ktiles):
        seg = _np.zeros((nblocks, LANE), dtype=_np.int32)
        lo, hi = t * LANE, min((t + 1) * LANE, k_pad)
        seg[:, : hi - lo] = rsrc_rows.reshape(nblocks, k_pad)[:, lo:hi]
        rsrc.reshape(nblocks, n_ktiles, 8, LANE)[:, t, 0, :] = seg
    if df:
        from .dfloat import split_f64

        rhi, rlo = split_f64(rvals)
        rvals_j, rvals_lo_j = jnp.asarray(rhi), jnp.asarray(rlo)
    else:
        rvals_j, rvals_lo_j = jnp.asarray(rvals, dtype=vals_dtype), None
    dr = DiaResid(
        mat=mat,
        rvals=rvals_j,
        rsidx=jnp.asarray(rsidx),
        rgid=jnp.asarray(rgid),
        rsrc=jnp.asarray(rsrc),
        rvals_lo=rvals_lo_j,
        k_pad=k_pad,
        nnz_resid=int(rows_r.shape[0]),
    )
    return dr, plan


@_traced_x32
def dia_spmv_pallas(
    mat: DeviceDIA,
    x: jax.Array,
    plan: DiaPallasPlan | None = None,
    resid: "DiaResid | None" = None,
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
    k_pad = resid.k_pad if resid is not None else 0
    n_kt = resid.n_ktiles if resid is not None else 0

    def kernel(*refs):
        refs_l = list(refs)
        x0_ref, x1_ref, x2_ref, dia_ref = refs_l[:4]
        refs_l = refs_l[4:]
        if resid is not None:
            rvals_ref, rsidx_ref, rgid_ref, rsrc_ref = refs_l[:4]
            refs_l = refs_l[4:]
        o_ref, w_ref = refs_l[:2]
        if resid is not None:
            s128_ref, src_ref = refs_l[2:4]
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
        if resid is not None:
            # windowed residual fringe (see DiaResid): assemble per-slot-row
            # source rows from the transposed 3-block window, lane-gather,
            # masked sublane-sums into the block's bs accumulator rows
            s128_ref[0 : 3 * bs, :] = w_ref[:]
            if 3 * bs < LANE:
                s128_ref[3 * bs :, :] = jnp.zeros(
                    (LANE - 3 * bs, LANE), acc_dtype
                )
            wt = s128_ref[:].T
            for t in range(n_kt):
                qv = jnp.broadcast_to(
                    rsrc_ref[t * 8 : t * 8 + 8, :][0:1, :], (LANE, LANE)
                )
                src_ref[t * LANE : (t + 1) * LANE, :] = jnp.take_along_axis(
                    wt, qv, axis=1
                ).T
            gathered = jnp.take_along_axis(
                src_ref[0:k_pad, :], rsidx_ref[:].astype(jnp.int32), axis=1
            )
            prod = rvals_ref[:].astype(acc_dtype) * gathered
            gv = rgid_ref[:].astype(jnp.int32)
            racc = jnp.concatenate(
                [
                    jnp.sum(
                        jnp.where(gv == gg, prod, 0.0), axis=0, keepdims=True
                    )
                    for gg in range(bs)
                ],
                axis=0,
            )
            acc = acc + racc
        o_ref[:] = acc

    in_specs = [
        pl.BlockSpec((bs, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, LANE), lambda i: (i + 1, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((bs, LANE), lambda i: (i + 2, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec(
            (d, bs, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        ),
    ]
    args = [xk, xk, xk, mat.data]
    scratch = [pltpu.VMEM((3 * bs, LANE), acc_dtype)]
    if resid is not None:
        kspec = pl.BlockSpec(
            (k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        )
        in_specs += [
            kspec,
            kspec,
            kspec,
            pl.BlockSpec(
                (n_kt * 8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ]
        args += [resid.rvals, resid.rsidx, resid.rgid, resid.rsrc]
        scratch += [
            pltpu.VMEM((LANE, LANE), acc_dtype),
            pltpu.VMEM((n_kt * LANE, LANE), acc_dtype),
        ]
    out = pl.pallas_call(
        kernel,
        grid=(plan.nblocks,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((bs, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((s_pad, LANE), acc_dtype),
        scratch_shapes=scratch,
        interpret=_interpret(),
    )(*args)
    return out.reshape(-1)[: mat.shape[0]]


# ---------------------------------------------------------------------------
# Double-float DIA kernel — f64 semantics on the f32 VPU (ops/dfloat.py)
# ---------------------------------------------------------------------------

#: per-slab VMEM budget for the df plans: the (hi, lo) pair keeps TWO f32
#: planes of each diagonal block resident, so the per-plane budget is half
#: the f32 kernel's 2<<20 (same total)
DF_DIA_VMEM_BUDGET = 1 << 20


def pad_dia_df_for_pallas(mat, plan: DiaPallasPlan):
    """pad_dia_for_pallas for the (hi, lo) pair format."""
    from ..formats.dia import DeviceDIADF

    d, s, _ = mat.data.shape
    if s == plan.s_pad:
        return mat
    pad = ((0, 0), (0, plan.s_pad - s), (0, 0))
    return DeviceDIADF(
        data=jnp.pad(mat.data, pad),
        data_lo=jnp.pad(mat.data_lo, pad),
        offsets=mat.offsets,
        shape=mat.shape,
        nnz=mat.nnz,
        pad_sub=mat.pad_sub,
    )


def dia_spmv_pallas_df(
    mat, x: jax.Array, plan: DiaPallasPlan, resid: "DiaResid | None" = None
) -> jax.Array:
    """y = A @ x with double-precision semantics: A and x carried as
    (hi, lo) f32 pairs, the inner loop error-compensated on the f32 VPU
    (Dekker TwoProduct + Knuth TwoSum, ops/dfloat.py), one f64 combine at
    the end. Same fused 3-block-window structure as dia_spmv_pallas,
    including the optional windowed residual fringe (df slot values,
    compensated reduce trees).

    The reference computes double throughout (macros.h:63-76); XLA's
    emulated f64 runs gather engines at ~0.1 GFLOP/s on this chip — this
    kernel is the TPU-native double path (~28 VPU flops/nnz, measured
    ~1e-12 relative error on O(1) dense inputs vs f32's ~1e-6).

    Presplit variants measured and REJECTED on TPU (round 4): streaming
    the value slab's prepare-time Veltkamp split lost (raefsky df 49.5 ->
    41.7 GF/s — two extra HBM planes), and splitting the staged x window
    once per step into scratch lost harder (-> 33.9: four shifted()
    slice-concats per diagonal plus the scratch round trip beat the 8
    saved velt flops).  The in-loop TwoProduct is the measured
    optimum."""
    from ..formats.dia import pad_x_dia
    from ..formats.window import _df_add, _halve_pairs
    from .dfloat import df_combine64, df_mul_acc, split_f64_jnp, two_prod

    d, s_pad, _ = mat.data.shape
    bs, ps = plan.bs, mat.pad_sub
    offsets = mat.offsets
    k_pad = resid.k_pad if resid is not None else 0
    n_kt = resid.n_ktiles if resid is not None else 0

    xh, xl = split_f64_jnp(x.astype(jnp.float64))
    from .dfloat import x32_trace_scope

    with x32_trace_scope():  # 32-bit kernel trace; f64 only outside
        dia_view = mat.as_dia()
        rows_k = (plan.nblocks + 2) * bs

        def _padded(xs):
            xp = pad_x_dia(xs, dia_view)
            return jnp.pad(xp, ((0, rows_k - xp.shape[0]), (0, 0)))

        xkh, xkl = _padded(xh), _padded(xl)

        def kernel(*refs):
            refs_l = list(refs)
            x0h, x1h, x2h, x0l, x1l, x2l, diah_ref, dial_ref = refs_l[:8]
            refs_l = refs_l[8:]
            if resid is not None:
                rv_ref, rvlo_ref, rsidx_ref, rgid_ref, rsrc_ref = refs_l[:5]
                refs_l = refs_l[5:]
            ohi_ref, olo_ref, wh_ref, wl_ref = refs_l[:4]
            refs_l = refs_l[4:]
            if resid is not None:
                sh128_ref, sl128_ref, srch_ref, srcl_ref = refs_l[:4]
            wh_ref[0:bs] = x0h[:]
            wh_ref[bs : 2 * bs] = x1h[:]
            wh_ref[2 * bs : 3 * bs] = x2h[:]
            wl_ref[0:bs] = x0l[:]
            wl_ref[bs : 2 * bs] = x1l[:]
            wl_ref[2 * bs : 3 * bs] = x2l[:]
            acc_hi = jnp.zeros((bs, LANE), jnp.float32)
            acc_lo = jnp.zeros((bs, LANE), jnp.float32)
            for k, off in enumerate(offsets):
                q, r = divmod(off, LANE)

                def shifted(ref):
                    lo_p = ref[ps + q : ps + q + bs, :]
                    if r == 0:
                        return lo_p
                    hi_p = ref[ps + q + 1 : ps + q + 1 + bs, :]
                    return jnp.concatenate(
                        [lo_p[:, r:], hi_p[:, :r]], axis=1
                    )

                acc_hi, acc_lo = df_mul_acc(
                    acc_hi, acc_lo, diah_ref[k], dial_ref[k],
                    shifted(wh_ref), shifted(wl_ref),
                )
            if resid is not None:
                # windowed residual fringe in df (see the f32 twin above)
                sh128_ref[0 : 3 * bs, :] = wh_ref[:]
                sl128_ref[0 : 3 * bs, :] = wl_ref[:]
                if 3 * bs < LANE:
                    z = jnp.zeros((LANE - 3 * bs, LANE), jnp.float32)
                    sh128_ref[3 * bs :, :] = z
                    sl128_ref[3 * bs :, :] = z
                wt_h = sh128_ref[:].T
                wt_l = sl128_ref[:].T
                for t in range(n_kt):
                    qv = jnp.broadcast_to(
                        rsrc_ref[t * 8 : t * 8 + 8, :][0:1, :], (LANE, LANE)
                    )
                    srch_ref[t * LANE : (t + 1) * LANE, :] = jnp.take_along_axis(
                        wt_h, qv, axis=1
                    ).T
                    srcl_ref[t * LANE : (t + 1) * LANE, :] = jnp.take_along_axis(
                        wt_l, qv, axis=1
                    ).T
                sv = rsidx_ref[:].astype(jnp.int32)
                g_hi = jnp.take_along_axis(srch_ref[0:k_pad, :], sv, axis=1)
                g_lo = jnp.take_along_axis(srcl_ref[0:k_pad, :], sv, axis=1)
                vh = rv_ref[:]
                ph, pe = two_prod(vh, g_hi)
                p_lo = pe + (vh * g_lo + rvlo_ref[:] * g_hi)
                gv = rgid_ref[:].astype(jnp.int32)
                grows = []
                for gg in range(bs):
                    mh = jnp.where(gv == gg, ph, 0.0)
                    ml = jnp.where(gv == gg, p_lo, 0.0)
                    t8 = _halve_pairs(
                        [
                            (mh[i * 8 : (i + 1) * 8], ml[i * 8 : (i + 1) * 8])
                            for i in range(k_pad // 8)
                        ],
                        lambda a, b: _df_add(a[0], a[1], b[0], b[1]),
                    )
                    grows.append(
                        _halve_pairs(
                            [
                                (t8[0][j : j + 1], t8[1][j : j + 1])
                                for j in range(8)
                            ],
                            lambda a, b: _df_add(a[0], a[1], b[0], b[1]),
                        )
                    )
                r_hi = jnp.concatenate([r[0] for r in grows], axis=0)
                r_lo = jnp.concatenate([r[1] for r in grows], axis=0)
                acc_hi, acc_lo = _df_add(acc_hi, acc_lo, r_hi, r_lo)
            ohi_ref[:] = acc_hi
            olo_ref[:] = acc_lo

        xspec = lambda j: pl.BlockSpec(  # noqa: E731
            (bs, LANE), functools.partial(lambda j, i: (i + j, 0), j),
            memory_space=pltpu.VMEM,
        )
        dspec = pl.BlockSpec(
            (d, bs, LANE), lambda i: (0, i, 0), memory_space=pltpu.VMEM
        )
        ospec = pl.BlockSpec((bs, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        in_specs = [xspec(0), xspec(1), xspec(2)] * 2 + [dspec, dspec]
        args = [xkh, xkh, xkh, xkl, xkl, xkl, mat.data, mat.data_lo]
        scratch = [pltpu.VMEM((3 * bs, LANE), jnp.float32) for _ in range(2)]
        if resid is not None:
            kspec = pl.BlockSpec(
                (k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            )
            in_specs += [
                kspec, kspec, kspec, kspec,
                pl.BlockSpec(
                    (n_kt * 8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
                ),
            ]
            args += [resid.rvals, resid.rvals_lo, resid.rsidx, resid.rgid,
                     resid.rsrc]
            scratch += [
                pltpu.VMEM((LANE, LANE), jnp.float32),
                pltpu.VMEM((LANE, LANE), jnp.float32),
                pltpu.VMEM((n_kt * LANE, LANE), jnp.float32),
                pltpu.VMEM((n_kt * LANE, LANE), jnp.float32),
            ]
        out_hi, out_lo = pl.pallas_call(
            kernel,
            grid=(plan.nblocks,),
            in_specs=in_specs,
            out_specs=[ospec, ospec],
            out_shape=[
                jax.ShapeDtypeStruct((s_pad, LANE), jnp.float32),
                jax.ShapeDtypeStruct((s_pad, LANE), jnp.float32),
            ],
            scratch_shapes=scratch,
            interpret=_interpret(),
        )(*args)
    m = mat.shape[0]
    return df_combine64(
        out_hi.reshape(-1)[:m], out_lo.reshape(-1)[:m]
    )


def prepare_dia_df_pallas(csr, max_fill_ratio: float = 3.0):
    """(DeviceDIADF, plan) ready for dia_spmv_pallas_df (halved per-slab
    VMEM budget: the pair doubles the resident diagonal block)."""
    from ..formats.dia import prepare_dia_df

    mat = prepare_dia_df(csr, max_fill_ratio=max_fill_ratio)
    plan = plan_dia(mat.as_dia(), vmem_budget=DF_DIA_VMEM_BUDGET)
    return (pad_dia_df_for_pallas(mat, plan), plan)


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
    def _mk_prep_resid(dt=None):
        def _prep(csr, ell, cfg):
            return prepare_dia_resid(
                csr,
                dtype=cfg.jnp_dtype,
                dia_dtype=dt,
                vals_dtype=dt,
            )

        return _prep

    def _run_resid(ops, x):
        dr, plan = ops
        return dia_spmv_pallas(dr.mat, x, plan, resid=dr)

    register(
        KernelSpec(
            name="PL_DIA_RESID",
            fmt="csr",
            impl="pallas",
            prepare=_mk_prep_resid(),
            run=_run_resid,
            doc="DIA + windowed-residual hybrid: dense-offset diagonals in "
            "the fused DIA kernel, the scattered fringe as windowed-gather "
            "slots inside the SAME kernel (real banded matrices = band + "
            "fringe; pure DIA pays a full diagonal per straggler offset)",
        )
    )
    register(
        KernelSpec(
            name="PL_DIA_RESID_BF16",
            fmt="csr",
            impl="pallas",
            prepare=_mk_prep_resid(jnp.bfloat16),
            run=_run_resid,
            doc="DIA+residual hybrid with bf16 slabs (f32 accumulate)",
        )
    )
    def _run_resid_df(ops, x):
        dr, plan = ops
        return dia_spmv_pallas_df(dr.mat, x, plan, resid=dr)

    register(
        KernelSpec(
            name="PL_DIA_RESID_F64",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_dia_resid(csr, df=True),
            run=_run_resid_df,
            doc="double-precision DIA+residual hybrid on the f32 VPU: "
            "double-float diagonal core + df residual slots with "
            "compensated reduce trees (ops/dfloat.py) — halves the pure "
            "PL_DIA_F64 slot padding on band+fringe matrices (raefsky "
            "class)",
            f64=True,
        )
    )

    register(
        KernelSpec(
            name="PL_DIA_F64",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_dia_df_pallas(csr),
            run=lambda ops, x: dia_spmv_pallas_df(ops[0], x, ops[1]),
            doc="double-precision DIA on the f32 VPU: slabs and x as "
            "(hi, lo) double-float pairs, error-compensated inner loop "
            "(Dekker TwoProduct + Knuth TwoSum), f64 combine at the end — "
            "the TPU-native path for the reference's f64 semantics "
            "(macros.h:63-76); ~1e-12 relative error vs f32's ~1e-6",
            f64=True,
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
            name="PL_CSR_WINDOW_F64",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_window_auto(csr, df=True),
            run=window_spmv,
            doc="double-precision windowed local-gather on the f32 VPU: "
            "slot values and x as (hi, lo) double-float pairs, "
            "error-compensated gather products and reduce trees "
            "(ops/dfloat.py) — f64 semantics for banded-locality matrices "
            "(fem/thermal2 class) without the ~0.1 GFLOP/s XLA-f64 path",
            f64=True,
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

    from ..formats.routed import prepare_routed_df_auto, routed_df_auto_spmv

    register(
        KernelSpec(
            name="PL_CSR_ROUTED_F64",
            fmt="csr",
            impl="pallas",
            prepare=lambda csr, ell, cfg: prepare_routed_df_auto(csr),
            run=routed_df_auto_spmv,
            doc="double-precision Clos-routed CSR on the f32 VPU: (hi, lo) "
            "double-float value/product slabs (TwoProduct gather, TwoSum "
            "reduce trees, ops/dfloat.py); every permutation stage moves "
            "each word once (slot placement is value-independent). Heavy "
            "fast paths stay off — heavy rows demote into the multi-level "
            "reduction runs. f64 semantics for the power-law/global "
            "structure class (caida/webbase) the XLA-f64 fallback served "
            "at ~0.1 GFLOP/s",
            f64=True,
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
