"""Windowed local-gather SpMV engine (PL_CSR_WINDOW).

The engine between exact-DIA (needs few global diagonals) and the fully
general Clos-routed path (pays ~5 permutation passes per nnz): for matrices
with banded *locality* — every nnz within a bounded window of the diagonal,
at irregular per-row offsets (real unstructured-FEM matrices: thermal2,
FEM_3D_thermal2) — no global permutation is needed at all. This is the
capability the reference's ELL covers for such matrices
(reference src/SpMV_ELL_OMP.c:33-67) re-designed TPU-first.

Layout (one grid step per block of G*128 rows):
- slot rows are grouped by column CHUNK q = c // 128 (sorted); a slot at
  (k, l) holds one nnz with lane l = row % 128, source chunk q_k, and an
  in-chunk index c % 128. Per (block, chunk, lane) collisions stack in
  depth rows. Padding factor = sum_q max_l count(l, q) / ideal; larger G
  raises chunk occupancy and lowers padding.
- the block's x window (the 2*Wr + G chunk rows it can touch) is staged
  through a sliding set of (G, 128) input blocks (the DIA 3-block-window
  pattern generalized); per-slot-row source rows are assembled fully
  data-driven with one transposed take_along_axis per 128-slot-row tile:
  S_T = taa(window^T, broadcast(rsrc)) — so one compiled kernel serves
  every block (uniform grid, no per-block unrolled code).
- gather: one same-shape taa picks c % 128 within each assembled row;
  reduce: G masked sublane-sums into the (G, 128) output block (measured
  ~0.7 ps/slot/group on v5e — cheaper than any routing pass).

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
    rsrc: jax.Array  # (nblocks*n_ktiles*8, 128) int32 — window row per
    # slot-row (row 0 of each 8-row group carries the tile's 128 values)
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


def _pack_stats(csr: CSRMatrix, g: int):
    """(k_rows_total, k_max, wr) for group size g — host-side cost probe."""
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
    nspecs = -(-s_w // g)
    if nspecs * g > LANE:
        raise WindowError(f"window span {s_w} chunk-rows exceeds the 128 cap")
    # slot rows per (block, chunk) = max over lanes of cell count
    nq = n // LANE + 2
    cell = (blk * LANE + lane) * nq + q
    uk, cnt = np.unique(cell, return_counts=True)
    bq = (uk // nq // LANE) * nq + uk % nq  # (block, chunk) id
    order = np.argsort(bq, kind="stable")
    bq_s, cnt_s = bq[order], cnt[order]
    starts = np.r_[0, np.flatnonzero(np.diff(bq_s)) + 1, bq_s.shape[0]]
    kmax_pc = np.maximum.reduceat(cnt_s, starts[:-1])
    ub = bq_s[starts[:-1]] // nq  # block per (block, chunk) run
    k_per_block = np.zeros(-(-m // b), dtype=np.int64)
    np.add.at(k_per_block, ub, kmax_pc)
    return int(k_per_block.sum()), int(k_per_block.max(initial=1)), wr, nspecs


def prepare_window(
    csr: CSRMatrix, g: int = 8, dtype=jnp.float32, vals_dtype=None,
    max_pad: float = 4.5,
) -> WindowCSR:
    if vals_dtype is None:
        vals_dtype = dtype
    m, n = csr.shape
    if csr.nnz == 0 or m == 0:
        raise WindowError("empty matrix")
    assert g in (8, 16, 32), "g must be 8/16/32 (output block height)"
    k_total, k_max, wr, nspecs = _pack_stats(csr, g)
    if k_max > 16 * LANE:
        raise WindowError(f"k_max {k_max} slot rows per block")
    b = g * LANE
    nblocks = -(-m // b)
    if nblocks * k_max * LANE > max_pad * csr.nnz:
        raise WindowError(
            f"padding {nblocks * k_max * LANE / csr.nnz:.1f}x exceeds "
            f"{max_pad}x cap"
        )

    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    blk = rows // b
    lane = rows % LANE
    q = cols // LANE
    dq = q - blk * g + wr  # window row in [0, nspecs*g)

    # depth within (block, window-row, lane)
    nqw = nspecs * g
    cell = (blk * nqw + dq) * LANE + lane
    order = np.argsort(cell, kind="stable")
    cs = cell[order]
    starts = np.r_[0, np.flatnonzero(np.diff(cs)) + 1]
    rid = np.zeros(cs.shape[0], dtype=np.int64)
    rid[starts] = 1
    rid = np.cumsum(rid) - 1
    depth = np.arange(cs.shape[0]) - starts[rid]
    depth_u = np.empty_like(depth)
    depth_u[order] = depth

    # per (block, window-row): rows needed = max depth + 1; bases by cumsum
    bq_id = blk * nqw + dq
    need = np.zeros(nblocks * nqw, dtype=np.int64)
    np.maximum.at(need, bq_id, depth_u + 1)
    base = np.zeros(nblocks * nqw, dtype=np.int64)
    base_flat = need.reshape(nblocks, nqw).cumsum(axis=1)
    base.reshape(nblocks, nqw)[:, 1:] = base_flat[:, :-1]
    # 16-row alignment: bf16 value slabs need >= 16-sublane tiles (Mosaic)
    k_pad = max(_ceil_to(k_max, 16), 16)
    n_ktiles = -(-k_pad // LANE)

    slot_row = blk * k_pad + base[bq_id] + depth_u
    vals = np.zeros((nblocks * k_pad, LANE), dtype=np.float64)
    sidx = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    gid = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    vals[slot_row, lane] = csr.data
    sidx[slot_row, lane] = (cols % LANE).astype(np.int8)
    gid[slot_row, lane] = ((rows // LANE) % g).astype(np.int8)

    # per-slot-row window row (pad rows point at row 0; their vals are 0)
    rsrc_rows = np.zeros(nblocks * k_pad, dtype=np.int32)
    rsrc_rows[slot_row] = dq.astype(np.int32)
    rsrc = np.zeros((nblocks * n_ktiles * 8, LANE), dtype=np.int32)
    for t in range(n_ktiles):
        seg = np.zeros((nblocks, LANE), dtype=np.int32)
        lo, hi = t * LANE, min((t + 1) * LANE, k_pad)
        seg[:, : hi - lo] = rsrc_rows.reshape(nblocks, k_pad)[:, lo:hi]
        rsrc.reshape(nblocks, n_ktiles, 8, LANE)[:, t, 0, :] = seg

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


def prepare_window_auto(
    csr: CSRMatrix, dtype=jnp.float32, vals_dtype=None, max_pad: float = 4.5
) -> WindowCSR:
    """Pick the group size G by a slots-based cost model (gather cost ~14
    ps/slot + masked reduce ~0.7*G ps/slot, measured on v5e)."""
    best = None
    for g in (8, 16, 32):
        try:
            k_total, k_max, wr, nspecs = _pack_stats(csr, g)
        except WindowError:
            continue
        nblocks = -(-csr.shape[0] // (g * LANE))
        slots = nblocks * max(_ceil_to(k_max, 16), 16) * LANE
        # measured v5e: ~14 ps/slot gather/assembly + ~0.35*G masked
        # reduce + ~0.17 us fixed per grid step
        cost = slots * (14.0 + 0.35 * g) + nblocks * 170_000.0
        if best is None or cost < best[1]:
            best = (g, cost)
    if best is None:
        raise WindowError("no feasible window configuration")
    return prepare_window(
        csr, g=best[0], dtype=dtype, vals_dtype=vals_dtype, max_pad=max_pad
    )


def window_spmv(mat: WindowCSR, x: jax.Array) -> jax.Array:
    """y = A @ x, one fused gather+reduce kernel, grid over row blocks."""
    m, n = mat.shape
    g, k_pad, wr, nspecs = mat.g, mat.k_pad, mat.wr, mat.nspecs
    n_ktiles = mat.n_ktiles
    nblocks = mat.nblocks
    acc_dtype = jnp.float32

    # padded x: wr leading zero chunk-rows; tail covers the last window
    total_rows = (nblocks - 1 + nspecs) * g
    xp = jnp.zeros(total_rows * LANE, dtype=acc_dtype)
    xp = jax.lax.dynamic_update_slice(
        xp, x[: (total_rows * LANE - wr * LANE)].astype(acc_dtype), (wr * LANE,)
    )
    xp2 = xp.reshape(total_rows, LANE)

    def kernel(*refs):
        xrefs = list(refs[:nspecs])
        vals_ref, sidx_ref, gid_ref, rsrc_ref, o_ref, w_ref, src_ref = refs[
            nspecs:
        ]
        for j in range(nspecs):
            w_ref[j * g : (j + 1) * g, :] = xrefs[j][:]
        if nspecs * g < LANE:
            w_ref[nspecs * g :, :] = jnp.zeros(
                (LANE - nspecs * g, LANE), acc_dtype
            )
        wt = w_ref[:].T  # (lane, window row)
        for t in range(n_ktiles):
            qv = jnp.broadcast_to(
                rsrc_ref[t * 8 : t * 8 + 8, :][0:1, :], (LANE, LANE)
            )
            st = jnp.take_along_axis(wt, qv, axis=1)  # [l, j] = w[rsrc[j], l]
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
        o_ref[:] = jnp.concatenate(rows, axis=0)

    xspec = [
        pl.BlockSpec((g, LANE), functools.partial(lambda j, i: (i + j, 0), j))
        for j in range(nspecs)
    ]
    out = pl.pallas_call(
        kernel,
        grid=(nblocks,),
        in_specs=xspec
        + [
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (n_ktiles * 8, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec((g, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((nblocks * g, LANE), acc_dtype),
        scratch_shapes=[
            pltpu.VMEM((LANE, LANE), acc_dtype),
            pltpu.VMEM((n_ktiles * LANE, LANE), acc_dtype),
        ],
        interpret=_interp(),
    )(xp2, *([xp2] * (nspecs - 1)), mat.vals, mat.sidx, mat.gid, mat.rsrc)
    return out.reshape(-1)[:m]
