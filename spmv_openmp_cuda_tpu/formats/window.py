"""Windowed local-gather SpMV engine (PL_CSR_WINDOW).

The engine between exact-DIA (needs few global diagonals) and the fully
general Clos-routed path (pays ~5 permutation passes per nnz): for matrices
with banded *locality* — every nnz within a bounded window of the diagonal,
at irregular per-row offsets (real unstructured-FEM matrices: thermal2,
FEM_3D_thermal2) — no global permutation is needed at all. This is the
capability the reference's ELL covers for such matrices
(reference src/SpMV_ELL_OMP.c:33-67) re-designed TPU-first.

Layout (one grid step per block of G*128 rows):
- a slot at (k, l) holds one nnz with lane l = row % 128 and in-chunk index
  c % 128; slot rows may MIX source chunks freely: the only constraint is
  that within one slot row, all slots sourcing the same residue class
  (c % 128) share a window row — because the source assembly materializes,
  per slot row, one window row PER RESIDUE (the Q map below). Packing is
  EXACT: slot rows are the colors of a proper edge coloring of the
  per-block (out-lane x source-residue) bipartite multigraph (at most one
  entry per (row, lane) and per (row, residue) — so the Q constraint holds
  with nothing left over), built by the Euler-split router on the graph
  padded to D-regular. Rows per block = D = next_pow2(max degree) exactly;
  the auto scan picks the group size G so the degree lands just under a
  power of two.
- the block's x window (the 2*Wr + G chunk rows it can touch) is staged
  through sliding 8-row input blocks at index (i*G)//8 (the remainder is
  folded into Q host-side, so G is unrestricted); slot-row sources are
  assembled fully data-driven
  with one transposed take_along_axis per 128-slot-row tile:
  S_T[residue, k] = window[Q[residue, k], residue] — so one compiled kernel
  serves every block (uniform grid, no per-block unrolled code).
- gather: one same-shape taa picks c % 128 within each assembled row;
  reduce: G masked sublane-sums into the (G, 128) output block (measured
  ~0.7 ps/slot/group in situ on v5e — cheaper than any routing pass).

Eligibility: window radius (max |chunk(c) - block| over nnz) must keep the
staged window under 128 rows, and the padding factor under a cap; power-law
or global-random matrices are rejected (WindowError) and fall back to the
routed engine.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANE
from ..utils.pallas_env import interpret as _interp
from .matrix import CSRMatrix, _ceil_to


class WindowError(ValueError):
    """Matrix not eligible (window too wide or padding too high)."""


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "sidx", "gid", "rsrc"],
    meta_fields=["shape", "nnz", "g", "k_pad", "wr", "nspecs", "nblocks"],
)
@dataclasses.dataclass
class WindowCSR:
    """Prepared windowed-gather format (see module docstring)."""

    vals: jax.Array  # (nblocks*k_pad, 128) dtype — slot values
    sidx: jax.Array  # (nblocks*k_pad, 128) int8 — c % 128 per slot
    gid: jax.Array  # (nblocks*k_pad, 128) int8 — (row//128) % G per slot
    rsrc: jax.Array  # (nblocks*n_ktiles*128, 128) int8 — the Q map:
    # per slot-row tile, Q[residue, slot-row-in-tile] = window row that
    # slots of this row sourcing this residue read from
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    g: int = 8  # row groups per block (block = g*128 rows)
    k_pad: int = 8  # slot rows per block (padded)
    wr: int = 1  # window radius in 128-chunks
    nspecs: int = 2  # staged (G,128) window blocks per step
    nblocks: int = 1

    @property
    def n_ktiles(self) -> int:
        return -(-self.k_pad // LANE)


def _next_pow2(v: int) -> int:
    p = 1
    while p < v:
        p *= 2
    return p


def _pack_stats(csr: CSRMatrix, g: int):
    """(slots_total, d_colors, wr, nspecs) for group size g.

    d_colors is EXACT (the Latin/edge-coloring packer uses exactly
    next_pow2(max bipartite degree) rows per block), so the auto scan can
    pick the g whose degree lands just under a power of two."""
    m, n = csr.shape
    b = g * LANE
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    blk = rows // b
    lane = rows % LANE
    q = cols // LANE
    d = q - blk * g  # chunk relative to block start
    wr = max(int(max(-d.min(initial=0), 0)), int(max(d.max(initial=0) - g + 1, 0)), 1)
    s_w = g + 2 * wr
    # the x window is staged in 8-row blocks at index (i*g)//8 + j, with the
    # per-block remainder (i*g) % 8 folded into the Q data host-side — so g
    # is NOT restricted to sublane multiples
    nspecs = -(-(s_w + 7) // 8)
    if nspecs * 8 > LANE:
        raise WindowError(f"window span {s_w} chunk-rows exceeds the 128 cap")
    nblocks = -(-m // b)
    dl = np.bincount(blk * LANE + lane, minlength=nblocks * LANE)
    dr = np.bincount(blk * LANE + (cols % LANE), minlength=nblocks * LANE)
    d_colors = _next_pow2(
        max(int(dl.max(initial=1)), int(dr.max(initial=1)), 16)
    )
    if d_colors > _K_CAP:
        raise WindowError(f"{d_colors} colors exceed the row cap")
    return nblocks * d_colors * LANE, d_colors, wr, nspecs


#: packing row cap per block (VMEM residency of the slot slabs)
_K_CAP = 16 * LANE


def _pack_coloring(blk, lane, jres, nblocks, d_target):
    """Latin packing by bipartite edge coloring: slot row = color.

    Entries are edges (out-lane -> source-residue) of a per-block bipartite
    multigraph; a proper D-coloring puts at most one entry per (row, lane)
    and per (row, residue) in every block — so the per-(row, residue)
    single-window-row constraint holds with NOTHING evicted, and every
    block uses exactly D = d_target rows (k_pad uniformity by
    construction). The graph is padded to exactly D-regular with dummy
    edges and colored by the Euler-split router (ops/route.py, native C++
    when built); D must be a power of two.
    """
    from ..ops.route import color_bipartite_pow2

    assert d_target & (d_target - 1) == 0
    n = blk.shape[0]
    left = blk * LANE + lane
    right = blk * LANE + jres
    dl = np.bincount(left, minlength=nblocks * LANE)
    dr = np.bincount(right, minlength=nblocks * LANE)
    if max(dl.max(initial=0), dr.max(initial=0)) > d_target:
        raise WindowError("degree exceeds the color budget")
    # dummy edges: pair left/right deficiency slots blockwise (both sides
    # lack exactly D*128 - n_b edges per block)
    pad_l = np.repeat(np.arange(nblocks * LANE), d_target - dl)
    pad_r = np.repeat(np.arange(nblocks * LANE), d_target - dr)
    colors = color_bipartite_pow2(
        np.r_[left, pad_l], np.r_[right, pad_r], d_target
    )
    return colors[:n].astype(np.int64)


def prepare_window(
    csr: CSRMatrix, g: int = 8, dtype=jnp.float32, vals_dtype=None,
    max_pad: float = 4.5,
) -> WindowCSR:
    if vals_dtype is None:
        vals_dtype = dtype
    m, n = csr.shape
    if csr.nnz == 0 or m == 0:
        raise WindowError("empty matrix")
    assert 2 <= g <= 64, "g must be in [2, 64] (output rows per block)"
    _slots, k_pad, wr, nspecs = _pack_stats(csr, g)
    b = g * LANE
    nblocks = -(-m // b)
    n_ktiles = -(-k_pad // LANE)
    if nblocks * k_pad * LANE > max_pad * csr.nnz:
        raise WindowError(
            f"padding {nblocks * k_pad * LANE / csr.nnz:.1f}x "
            f"exceeds {max_pad}x cap"
        )

    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    blk = rows // b
    lane = rows % LANE
    q = cols // LANE
    dq = q - blk * g + wr  # window row in [0, nspecs*g)
    jres = cols % LANE  # source residue

    srow = _pack_coloring(blk, lane, jres, nblocks, k_pad)

    slot_row = blk * k_pad + srow
    vals = np.zeros((nblocks * k_pad, LANE), dtype=np.float64)
    sidx = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    gid = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    vals[slot_row, lane] = csr.data
    sidx[slot_row, lane] = jres.astype(np.int8)
    gid[slot_row, lane] = ((rows // LANE) % g).astype(np.int8)

    # Q map: per slot-row tile, Q[residue, slot-row-in-tile] = window row
    # (unset pairs read window row 0; their slots have vals == 0)
    rsrc = np.zeros((nblocks * n_ktiles * LANE, LANE), dtype=np.int8)
    t_of = srow // LANE
    jj_in = srow % LANE
    # window row within the staged 8-row blocks: dq plus the per-block
    # staging remainder (the window starts at x2d row blk*g, staged from
    # 8-row block (blk*g)//8)
    dq_staged = dq + (blk * g) % 8
    rsrc[(blk * n_ktiles + t_of) * LANE + jres, jj_in] = dq_staged.astype(
        np.int8
    )

    return WindowCSR(
        vals=jnp.asarray(vals, dtype=vals_dtype),
        sidx=jnp.asarray(sidx),
        gid=jnp.asarray(gid),
        rsrc=jnp.asarray(rsrc),
        shape=(m, n),
        nnz=csr.nnz,
        g=g,
        k_pad=k_pad,
        wr=wr,
        nspecs=nspecs,
        nblocks=nblocks,
    )


#: candidate group sizes for the auto scan: the Latin packer uses exactly
#: next_pow2(max degree) rows, so the winning g usually puts the degree
#: just under a power of two
_G_LADDER = (4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56, 64)


def window_cost(csr: CSRMatrix, g: int) -> float:
    """Predicted SpMV cost in ps (v5e-measured constants: ~14 ps/slot
    gather/assembly + ~0.35*g masked reduce + ~0.17 us fixed per step)."""
    slots, _d, _wr, _ns = _pack_stats(csr, g)
    nblocks = -(-csr.shape[0] // (g * LANE))
    return slots * (14.0 + 0.3 * g) + nblocks * 250_000.0


def prepare_window_auto(
    csr: CSRMatrix, dtype=jnp.float32, vals_dtype=None, max_pad: float = 4.5
) -> WindowCSR:
    """Pick the group size g by the exact-slots cost model."""
    best = None
    for g in _G_LADDER:
        try:
            cost = window_cost(csr, g)
        except WindowError:
            continue
        if best is None or cost < best[1]:
            best = (g, cost)
    if best is None:
        raise WindowError("no feasible window configuration")
    return prepare_window(
        csr, g=best[0], dtype=dtype, vals_dtype=vals_dtype, max_pad=max_pad
    )


def window_kernel_call(
    vals, sidx, gid, rsrc, xp2, *, g, k_pad, nspecs, nblocks
):
    """The fused gather+reduce kernel over a prepared slot-array set and an
    ALREADY-PADDED x window stack (xp2 row wr = x row 0). Exposed separately
    so the row-sharded multi-chip path (parallel/sharded.py) can run it on
    local block ranges with halo-exchanged x."""
    n_ktiles = -(-k_pad // LANE)
    g_pad = max(-(-g // 8) * 8, 8)  # output tile height (sublane multiple)
    acc_dtype = jnp.float32

    def kernel(*refs):
        xrefs = list(refs[:nspecs])
        vals_ref, sidx_ref, gid_ref, rsrc_ref, o_ref, w_ref, src_ref = refs[
            nspecs:
        ]
        for j in range(nspecs):
            w_ref[j * 8 : (j + 1) * 8, :] = xrefs[j][:]
        if nspecs * 8 < LANE:
            w_ref[nspecs * 8 :, :] = jnp.zeros(
                (LANE - nspecs * 8, LANE), acc_dtype
            )
        wt = w_ref[:].T  # (residue, window row)
        for t in range(n_ktiles):
            qv = rsrc_ref[t * LANE : (t + 1) * LANE, :].astype(jnp.int32)
            # st[residue, k] = window[Q[residue, k], residue]
            st = jnp.take_along_axis(wt, qv, axis=1)
            src_ref[t * LANE : (t + 1) * LANE, :] = st.T
        gathered = jnp.take_along_axis(
            src_ref[0:k_pad, :], sidx_ref[:].astype(jnp.int32), axis=1
        )
        prod = vals_ref[:].astype(acc_dtype) * gathered
        gv = gid_ref[:].astype(jnp.int32)
        rows = [
            jnp.sum(jnp.where(gv == gg, prod, 0.0), axis=0, keepdims=True)
            for gg in range(g)
        ]
        if g_pad > g:
            rows.append(jnp.zeros((g_pad - g, LANE), acc_dtype))
        o_ref[:] = jnp.concatenate(rows, axis=0)

    xspec = [
        pl.BlockSpec(
            (8, LANE),
            functools.partial(lambda j, i: ((i * g) // 8 + j, 0), j),
        )
        for j in range(nspecs)
    ]
    return pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=xspec
        + [
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_ktiles * LANE, LANE),
                lambda i: (i, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (g_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * g_pad, LANE), acc_dtype),
        scratch_shapes=[
            pltpu.VMEM((LANE, LANE), acc_dtype),
            pltpu.VMEM((n_ktiles * LANE, LANE), acc_dtype),
        ],
        interpret=_interp(),
    )(xp2, *([xp2] * (nspecs - 1)), vals, sidx, gid, rsrc)


def window_x_rows(nblocks: int, g: int, nspecs: int) -> int:
    """Rows of the padded x window stack the kernel expects."""
    return -(-((nblocks - 1) * g) // 8) * 8 + nspecs * 8 + 8


def window_spmv(mat: WindowCSR, x: jax.Array) -> jax.Array:
    """y = A @ x, one fused gather+reduce kernel, grid over row blocks."""
    m, n = mat.shape
    g, k_pad, wr, nspecs = mat.g, mat.k_pad, mat.wr, mat.nspecs
    nblocks = mat.nblocks
    g_pad = max(-(-g // 8) * 8, 8)
    acc_dtype = jnp.float32

    # padded x: wr leading zero chunk-rows; tail covers the last window
    total_rows = window_x_rows(nblocks, g, nspecs)
    xp = jnp.zeros(total_rows * LANE, dtype=acc_dtype)
    xp = jax.lax.dynamic_update_slice(
        xp, x[: (total_rows * LANE - wr * LANE)].astype(acc_dtype), (wr * LANE,)
    )
    xp2 = xp.reshape(total_rows, LANE)
    out = window_kernel_call(
        mat.vals, mat.sidx, mat.gid, mat.rsrc, xp2,
        g=g, k_pad=k_pad, nspecs=nspecs, nblocks=nblocks,
    )
    if g_pad > g:
        out = out.reshape(nblocks, g_pad, LANE)[:, :g, :]
    return out.reshape(-1)[:m]
