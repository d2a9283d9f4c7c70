"""Lane-gather sparse engine for general (unstructured) matrices, small-G
variant.

The TPU has no fast arbitrary gather (XLA gathers measured ~1 GB/s on v5e);
the one fast gather primitive is Mosaic's same-shape
`take_along_axis(axis=1)` — each slot in a (128, 128) tile picks freely among
the 128 lanes of its own sublane-row, at ~225-300 Gelem/s in single-block kernels. This module builds a
format around that primitive:

- x is viewed in *windows* of 128 panels x 128 residues = 16384 values;
  windowT[a, p] = x[w*16384 + p*128 + a] (residues on sublanes, panels on
  lanes).
- each nnz (r, c, v) is assigned a slot in a (128, 128) tile of its window:
  sublane a = c % 128 (its residue — so the gather can address it), lane
  l = r % 128 (its output lane — so the reduction is lane-aligned). Colliding
  nnz stack into further tiles of the same window.
- SpMV: per tile, products = vals * take_along_axis(windowT, panel_idx,
  axis=1); the reduction is G masked sublane-sums into y2d[(G, 128)] where
  g = r // 128 — the scheduling analog of the reference's 2D tiling with
  partial-sum buffers (spmvTilesCSR, reference SpMV_CSR_OMP.c:101-162), with
  the 128-lane axis playing the warp role.

The masked reduction costs G passes over the slot array, so this engine is
registered for G = ceil(m/128) <= max_groups (small/medium matrices — the
delaunay/west2021/cavity regime of the reference corpus). The general
large-G engine (Clos-routed products) builds on the same gather phase.
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
from ..utils.pallas_env import n_windows_for, pack_x_windows_flat
from .matrix import CSRMatrix

WINDOW_PANELS = LANE  # panels per window (taa width cap = 128 lanes)
WINDOW_ELEMS = LANE * WINDOW_PANELS  # 16384 x values per window


class LanesError(ValueError):
    """Matrix not eligible for this engine (too many row groups / slots)."""


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "pidx", "gid"],
    meta_fields=["window_tiles", "shape", "nnz", "n_groups"],
)
@dataclasses.dataclass
class LanesSmall:
    """Slot arrays for the small-G lane-gather engine.

    vals/pidx/gid are (Ks, 128) slot slabs; rows [t*128, (t+1)*128) form
    tile t; window_tiles[w] = (tile_lo, tile_hi) half-open tile range of
    window w. Empty slots have vals == 0 (pidx/gid arbitrary but in-range).
    """

    vals: jax.Array  # (Ks, LANE) dtype
    pidx: jax.Array  # (Ks, LANE) int32, panel-in-window of each slot
    gid: jax.Array  # (Ks, LANE) int32, output row-group of each slot
    window_tiles: Tuple[Tuple[int, int], ...]
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    n_groups: int = 0


def prepare_lanes_small(
    csr: CSRMatrix,
    dtype=jnp.float32,
    max_groups: int = 64,
    max_slots: int = 1 << 20,  # total slots (slot-rows * 128)
) -> LanesSmall:
    m, n = csr.shape
    g_count = -(-m // LANE)
    if g_count > max_groups:
        raise LanesError(
            f"{g_count} row groups > {max_groups}; use the large-G engine"
        )
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    w = cols // WINDOW_ELEMS
    a = cols % LANE  # residue -> slot sublane within tile
    p = (cols // LANE) % WINDOW_PANELS  # panel within window -> gather idx
    l = rows % LANE  # output lane
    g = rows // LANE  # output group

    # stack depth: ordinal of each nnz within its (window, residue, lane) cell
    cell = (w * LANE + a) * LANE + l
    order = np.argsort(cell, kind="stable")
    cell_sorted = cell[order]
    # depth[i] = position of i within its run of equal cells
    starts = np.r_[0, np.flatnonzero(np.diff(cell_sorted)) + 1]
    run_id = np.zeros(cell_sorted.shape[0], dtype=np.int64)
    run_id[starts] = 1
    run_id = np.cumsum(run_id) - 1
    depth_sorted = np.arange(cell_sorted.shape[0]) - starts[run_id]
    depth = np.empty_like(depth_sorted)
    depth[order] = depth_sorted

    nwin = n_windows_for(n, int(w.max(initial=0)) if cols.size else 0, WINDOW_ELEMS)
    tiles_per_win = np.zeros(nwin, dtype=np.int64)
    np.maximum.at(tiles_per_win, w, depth + 1)
    tile_base = np.r_[0, np.cumsum(tiles_per_win)]
    ks = int(tile_base[-1]) * LANE
    if ks * LANE > max_slots:  # cap on total slots (VMEM residency)
        raise LanesError(f"{ks * LANE} slots exceed cap {max_slots}")

    vals = np.zeros((max(ks, LANE), LANE), dtype=np.float64)
    pidx = np.zeros((max(ks, LANE), LANE), dtype=np.int32)
    gid = np.zeros((max(ks, LANE), LANE), dtype=np.int32)
    slot_row = (tile_base[w] + depth) * LANE + a
    vals[slot_row, l] = csr.data
    pidx[slot_row, l] = p
    gid[slot_row, l] = g
    window_tiles = tuple(
        (int(tile_base[i]), int(tile_base[i + 1])) for i in range(nwin)
    )
    return LanesSmall(
        vals=jnp.asarray(vals, dtype=dtype),
        pidx=jnp.asarray(pidx),
        gid=jnp.asarray(gid),
        window_tiles=window_tiles,
        shape=(m, n),
        nnz=csr.nnz,
        n_groups=g_count,
    )


def pack_x_windows(x: jax.Array, mat: LanesSmall) -> jax.Array:
    """x -> (nwin, 128 residues, 128 panels) transposed window stack."""
    nwin = len(mat.window_tiles)
    return pack_x_windows_flat(
        x, nwin, mat.shape[1], mat.vals.dtype, WINDOW_PANELS
    ).reshape(nwin, LANE, WINDOW_PANELS)


def lanes_small_spmv(mat: LanesSmall, x: jax.Array) -> jax.Array:
    """y = A @ x via the lane-gather + masked group accumulate engine."""
    xw = pack_x_windows(x, mat)
    g_count = mat.n_groups
    window_tiles = mat.window_tiles
    dtype = mat.vals.dtype
    ks = mat.vals.shape[0]

    def kernel(xw_ref, vals_ref, pidx_ref, gid_ref, o_ref, acc_ref):
        acc_ref[:] = jnp.zeros((g_count, LANE), dtype)
        for w, (t0, t1) in enumerate(window_tiles):
            wt = xw_ref[w]  # (128 residues, 128 panels)
            for t in range(t0, t1):
                sl = slice(t * LANE, (t + 1) * LANE)
                gathered = jnp.take_along_axis(wt, pidx_ref[sl, :], axis=1)
                prod = vals_ref[sl, :] * gathered
                g_tile = gid_ref[sl, :]
                for g in range(g_count):
                    acc_ref[g, :] = acc_ref[g, :] + jnp.sum(
                        jnp.where(g_tile == g, prod, jnp.zeros((), dtype)),
                        axis=0,
                    )
        o_ref[:] = acc_ref[:]

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g_count, LANE), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[pltpu.VMEM((g_count, LANE), dtype)],
        interpret=_interp(),
    )(xw, mat.vals, mat.pidx, mat.gid)
    return out.reshape(-1)[: mat.shape[0]]
