"""Clos-routed CSR — the fully general large-G sparse engine.

Pipeline (all structure static, only x flows at run time):

1. *Gather phase* (Pallas): x is windowed as 128-residue x 128-panel tiles
   (see formats/lanes.py); every nnz gets a slot with sublane = col % 128 so
   the in-VMEM lane-gather (`take_along_axis(axis=1)`, ~225-300 Gelem/s in single-block kernels) can fetch
   its x value; lanes are packed tightly (free choice). Products come out in
   column-panel order.
2. *Routing phase* (ops/route.py): a planned Clos permutation moves every
   product from panel order to its reduction slot — the TPU-native analog of
   the scatter/atomics a GPU CSR kernel leans on.
3. *Reduce phase*: reduction slots form width-binned transposed slabs — rows
   are split into subrow units of <= wcap nnz, units sorted by length and
   grouped 128 to a column-group with width = the group max (the reference's
   row-binning / dynamic-scheduling analog, ompChunksDivide.h) — so every
   unit sum is a dense sublane reduction. Long rows reduce over multiple
   levels (subrow partial sums feed the next level's slabs).
4. *Assembly*: a second (small) Clos permutation routes every row's final
   unit sum into natural row order.

Correctness-critical invariant: the routing domain is a total bijection —
padding slots on the gather side hold val = 0 and map onto the padding slots
of the reduction slabs.
"""
from __future__ import annotations

import dataclasses
import functools
import os
from typing import List, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..config import LANE
from ..ops.dfloat import traced_x32 as _traced_x32
from ..ops.route import (
    PlannedPermutation,
    apply_permutation,
    apply_permutation_from_w1,
    apply_permutation_to_mid,
    apply_sw_w2_sw,
    apply_w_stage,
    pick_t,
    plan_permutation,
    plan_row_to_slot,
)
from ..utils.pallas_env import interpret as _interp
from ..utils.pallas_env import n_windows_for, pack_x_windows_flat
from .lanes import WINDOW_ELEMS, WINDOW_PANELS
from .matrix import CSRMatrix

WCAP = LANE  # max unit width: one slab column-group spans <= 128 sublanes


class RoutedError(ValueError):
    """Matrix too large for the single-domain routed engine."""


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=[
        "vals", "pidx", "widx", "perm_products", "lvl_perms", "lvl_masks",
        "perm_out", "hvals", "hpidx", "hwidx", "hreduce", "hlo", "hhi",
        "hdense",
    ],
    meta_fields=[
        "shape", "nnz", "n_windows", "rows_a", "runs", "lvl_runs", "out_t",
        "heavy_rows", "widx_t", "heavy_lanes",
    ],
)
@dataclasses.dataclass
class RoutedCSR:
    vals: jax.Array  # (rows_a, 128) dtype — gather slot values
    pidx: jax.Array  # (rows_a, 128) int8 — panel-in-window per slot
    widx: jax.Array  # (rows_a//128,) int32 — window id per 128-row tile
    perm_products: PlannedPermutation  # r1 folded: vals sit in middle lanes
    lvl_perms: Tuple[PlannedPermutation, ...]  # prev sums -> level slab
    # 0/1 masks zeroing slab slots that are padding inside reduce runs —
    # the level perms backfill them with leftover (nonzero) sums
    lvl_masks: Tuple[jax.Array, ...] = ()
    perm_out: PlannedPermutation = None
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    n_windows: int = 1
    rows_a: int = 0
    # level-1 reduce runs: (row0, n_groups, width, out_group0)
    runs: Tuple[Tuple[int, int, int, int], ...] = ()
    # per extra level: its runs tuple
    lvl_runs: Tuple[Tuple[Tuple[int, int, int, int], ...], ...] = ()
    out_t: int = 1
    # residue-dual heavy-row path (rows >= HEAVY_THRESHOLD nnz)
    hvals: jax.Array | None = None  # (128 * n_heavy_tiles, 128)
    hpidx: jax.Array | None = None
    hwidx: jax.Array | None = None  # (n_heavy_tiles,) window per tile
    hreduce: jax.Array | None = None  # (n_heavy, n_tiles*128) 0/1 lane->row
    # pooled heavy layout (v2): per-tile per-row-slot cumsum range bounds,
    # (128 * n_tiles, 128) int8, -1 = zero term; None = legacy owner layout
    hlo: jax.Array | None = None
    hhi: jax.Array | None = None
    # dense heavy fast path: (n_heavy, n_pad) bf16 row block, y_h = H @ x —
    # purely bandwidth-bound, no gather at all; used when the block is small
    # enough that streaming its zeros beats the pooled tiles' extra passes
    hdense: jax.Array | None = None
    heavy_rows: Tuple[int, ...] = ()
    # static copy of widx (window per gather tile), only materialized for
    # <= 32-tile domains: lets the single-block gather kernels slice xw at
    # compile-time offsets; () otherwise and on legacy formats
    widx_t: Tuple[int, ...] = ()
    # hdense heavy sums routed THROUGH perm_out (round 4): heavy element k
    # enters the output-assembly domain at (row n_sums_rows + k//128, lane
    # heavy_lanes[k]) and the router delivers it to y[heavy_rows[k]] — no
    # XLA scatter-add on y. () = legacy scatter path.
    heavy_lanes: Tuple[int, ...] = ()


def _next_pow2(x: int) -> int:
    p = 1
    while p < x:
        p *= 2
    return p


def _ladder_counts(lens: np.ndarray) -> dict:
    """Pow2-quantized width ladder: {width: n_groups} with units of
    next_pow2(len) == width packed 128 to a group. The quantization wastes
    <= 2x slab rows but makes the (width, count) schema unifiable across
    chunks — the basis of the single-program multi-device routed path."""
    q = np.array([_next_pow2(max(int(v), 1)) for v in lens], dtype=np.int64)
    out = {}
    for w in sorted(set(q.tolist()), reverse=True):
        out[int(w)] = int(-(-int((q == w).sum()) // LANE))
    return out


def merge_ladders(ladders) -> dict:
    """Elementwise-max merge of {width: n_groups} ladders (schema union)."""
    out: dict = {}
    for lad in ladders:
        for w, c in lad.items():
            out[w] = max(out.get(w, 0), c)
    return dict(sorted(out.items(), reverse=True))


def _group_units_ladder(lens: np.ndarray, schema: dict):
    """Schema-forced grouping: place every unit into the pow2 ladder class
    next_pow2(len), groups padded to exactly schema[w] per width — the
    resulting `runs` tuple is identical for every chunk sharing the schema.

    Returns (rank, group_row_base, runs, n_rows): rank[u] = slot rank of
    unit u (group = rank // 128); pad ranks are simply unoccupied."""
    u = lens.shape[0]
    q = np.array([_next_pow2(max(int(v), 1)) for v in lens], dtype=np.int64)
    widths_all, counts_all = [], []
    for w, c in sorted(schema.items(), reverse=True):
        widths_all.append(w)
        counts_all.append(c)
    n_groups = int(sum(counts_all))
    widths = np.repeat(np.array(widths_all, np.int64),
                       np.array(counts_all, np.int64))
    base = np.r_[0, np.cumsum(widths)]
    runs: List[Tuple[int, int, int, int]] = []
    g = 0
    for w, c in zip(widths_all, counts_all):
        runs.append((int(base[g]), c, int(w), g))
        g += c
    # rank: units of class w take the leading slots of w's groups, packed
    # in descending-length order (order within a class is free)
    rank = np.empty(u, dtype=np.int64)
    g0 = 0
    class_off = {}
    for w, c in zip(widths_all, counts_all):
        class_off[w] = g0 * LANE
        g0 += c
    order = np.argsort(-lens, kind="stable")
    qo = q[order]
    for w in widths_all:
        sel = qo == w
        ids = order[sel]
        if ids.size > schema[w] * LANE:
            raise RoutedError(
                f"ladder overflow: {ids.size} units of width {w} > "
                f"schema {schema[w]} groups"
            )
        rank[ids] = class_off[w] + np.arange(ids.size)
    return rank, base, tuple(runs), int(base[-1])


def _group_units(lens: np.ndarray, child_first: np.ndarray | None = None):
    """Sort units desc by length, group 128 to a slab column-group.

    With child_first (bool per unit), units consumed by the next reduction
    level sort before final units so the next level's extraction permutation
    only spans their (few) leading groups.

    Returns (order, group_row_base, runs, n_rows): order[rank] = unit id;
    group g holds ranks [g*128, (g+1)*128) at rows
    [group_row_base[g], +width_g); runs are (row0, n_groups, width,
    out_group0) maximal equal-width stretches.
    """
    u = lens.shape[0]
    if child_first is None:
        order = np.argsort(-lens, kind="stable")
    else:
        order = np.lexsort((-lens, np.where(child_first, 0, 1)))
    n_groups = -(-u // LANE)
    # per-group width = max length in the group (with two-class ordering the
    # first element is no longer necessarily the maximum)
    lens_sorted = np.r_[lens[order], np.zeros(n_groups * LANE - u, np.int64)]
    widths = np.maximum(lens_sorted.reshape(n_groups, LANE).max(axis=1), 1)
    base = np.r_[0, np.cumsum(widths)]
    runs: List[Tuple[int, int, int, int]] = []
    g = 0
    while g < n_groups:
        g2 = g
        while g2 < n_groups and widths[g2] == widths[g]:
            g2 += 1
        runs.append((int(base[g]), g2 - g, int(widths[g]), g))
        g = g2
    return order, base, tuple(runs), int(base[-1])


#: rows with at least this many nnz bypass the routed pipeline entirely via
#: the residue-dual heavy path (dense per-(row, window) gather tiles + full
#: reductions — no permutation); equals the nnz count that would force a
#: third reduction level
HEAVY_THRESHOLD = WCAP * LANE

#: dense heavy block cap: (n_heavy, n_pad) bf16 must stream in under this
#: many bytes per spmv to beat the pooled tiles' extra taa passes
_DENSE_HEAVY_MAX_BYTES = 12 * 2**20


#: pooled heavy packing groups at most this many rows per pool so a tile's
#: distinct-row count stays within the 128 row-slot lanes
_HEAVY_POOL_ROWS = 96


def _build_heavy(rows_h, csr: CSRMatrix):
    """Pooled residue-dual gather tiles for heavy rows.

    All heavy nnz of a window pool together: per residue a (the slot
    sublane, = col % 128, gatherable from the transposed window), entries
    sort by row and take consecutive lanes k across however many 128-lane
    tiles the window's deepest residue needs — packing efficiency is
    avg/max of the POOLED residue histogram instead of per-row.

    Each (row, window, residue) run is a contiguous k-range, so per tile a
    row's partial sum is a difference of two lane-cumsum samples: the kernel
    computes C = inclusive cumsum of products along lanes (one triangular
    MXU matmul) and taa-gathers C at per-(residue, row-slot) hi/lo bounds
    (hlo/hhi int8, -1 = zero term). Summing the differences over sublanes
    yields each row-slot's tile partial; a static (n_heavy, n_tiles*128)
    0/1 matmul maps slot partials back to rows.
    """
    n_h = len(rows_h)
    ri_all, cols_all, data_all = [], [], []
    for ri, r in enumerate(rows_h):
        i0, i1 = int(csr.indptr[r]), int(csr.indptr[r + 1])
        ri_all.append(np.full(i1 - i0, ri, dtype=np.int64))
        cols_all.append(csr.indices[i0:i1].astype(np.int64))
        data_all.append(csr.data[i0:i1])
    ri = np.concatenate(ri_all)
    cols = np.concatenate(cols_all)
    data = np.concatenate(data_all)
    w = cols // WINDOW_ELEMS
    a = cols % LANE
    p = (cols // LANE) % WINDOW_PANELS
    pool = ri // _HEAVY_POOL_ROWS  # cap rows per pool (row-slot lanes = 128)

    # ordinals k within each (pool, window, residue), entries sorted by row
    order = np.lexsort((ri, a, w, pool))
    sp, sw, sa, sri = pool[order], w[order], a[order], ri[order]
    key = (sp * (int(w.max(initial=0)) + 1) + sw) * LANE + sa
    starts = np.r_[0, np.flatnonzero(np.diff(key)) + 1]
    rid = np.zeros(key.shape[0], dtype=np.int64)
    rid[starts] = 1
    rid = np.cumsum(rid) - 1
    k = np.arange(key.shape[0]) - starts[rid]

    # tiles per (pool, window): deepest pooled residue
    pw_ids, pw_inv = np.unique(key // LANE, return_inverse=True)
    lanes_pw = np.zeros(pw_ids.shape[0], dtype=np.int64)
    np.maximum.at(lanes_pw, pw_inv, k + 1)
    tiles_pw = -(-lanes_pw // LANE)
    tile_base = np.r_[0, np.cumsum(tiles_pw)]
    n_tiles = int(tile_base[-1])
    tg = tile_base[pw_inv] + k // LANE  # global tile per entry

    hvals = np.zeros((n_tiles * LANE, LANE), dtype=np.float64)
    hpidx = np.zeros((n_tiles * LANE, LANE), dtype=np.int8)
    hvals[tg * LANE + sa, k % LANE] = data[order]
    hpidx[tg * LANE + sa, k % LANE] = p[order]
    hwidx = np.repeat(pw_ids % (int(w.max(initial=0)) + 1), tiles_pw).astype(
        np.int32
    )

    # per-(pool, window, residue, row) runs -> per-tile row-slot bounds
    key2 = key * n_h + sri
    starts2 = np.r_[0, np.flatnonzero(np.diff(key2)) + 1, key2.shape[0]]
    hlo = np.full((n_tiles * LANE, LANE), -1, dtype=np.int8)
    hhi = np.full((n_tiles * LANE, LANE), -1, dtype=np.int8)
    slot_of: dict = {}  # (tile, ri) -> row-slot lane j
    slots_used = np.zeros(n_tiles, dtype=np.int64)
    owner_ri: List[int] = []  # flat (tile*128 + j) -> ri
    owner_pos: List[int] = []
    for s0 in range(starts2.shape[0] - 1):
        lo_, hi_ = int(starts2[s0]), int(starts2[s0 + 1])
        if lo_ == hi_:
            continue
        a_ = int(sa[lo_])
        ri_ = int(sri[lo_])
        klo, khi = int(k[lo_]), int(k[hi_ - 1]) + 1
        base_t = int(tile_base[pw_inv[lo_]])
        for tl in range(klo // LANE, -(-khi // LANE)):
            t_ = base_t + tl
            j = slot_of.get((t_, ri_))
            if j is None:
                j = int(slots_used[t_])
                slots_used[t_] += 1
                slot_of[(t_, ri_)] = j
                owner_ri.append(ri_)
                owner_pos.append(t_ * LANE + j)
            l0 = max(klo - tl * LANE, 0)
            l1 = min(khi - tl * LANE, LANE)
            hlo[t_ * LANE + a_, j] = l0 - 1
            hhi[t_ * LANE + a_, j] = l1 - 1
    reduce_mat = np.zeros((n_h, n_tiles * LANE), dtype=np.float64)
    reduce_mat[np.asarray(owner_ri, dtype=np.int64),
               np.asarray(owner_pos, dtype=np.int64)] = 1.0
    return hvals, hpidx, hwidx, reduce_mat, hlo, hhi


def _pick_heavy_threshold(
    csr: CSRMatrix, lens_full: np.ndarray, dtype=jnp.float32
) -> int:
    """Choose the heavy/light split minimizing a taa-pass cost model.

    The routed permutation costs ~4 taa passes over the whole power-of-two
    domain, so pushing skewed rows into the unrouted heavy path pays off
    exactly when it drops the domain a power of two. Costs are slot counts
    (taa throughput is slot-proportional); the heavy side is the cheaper of
    the dense bf16 row block (half-slot per element streamed) and the
    pooled residue tiles (matching _build_heavy's _HEAVY_POOL_ROWS split).
    """
    m, n = csr.shape
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    w = cols // WINDOW_ELEMS
    a = cols % LANE
    nwin = max(int(w.max(initial=0)) + 1, 1)
    best_thr, best_cost = HEAVY_THRESHOLD, None
    for thr in (HEAVY_THRESHOLD, 8192, 4096, 2048, 1024, 512):
        heavy = lens_full >= thr
        if heavy.sum() == m:
            heavy[np.argmin(lens_full)] = False
        light = ~heavy[rows]
        # light gather rows: sum over windows of 128 * max_a ceil(cnt/128)
        cell = w[light] * LANE + a[light]
        cnt = np.bincount(cell, minlength=nwin * LANE).reshape(nwin, LANE)
        rows_a = int((128 * np.ceil(cnt / LANE).max(axis=1)).sum())
        # light reduce-slab rows (exact unit grouping)
        lens_l = np.where(heavy, 0, lens_full)
        n_sub = np.maximum(-(-lens_l // WCAP), 1)
        u1 = int(n_sub.sum())
        lens1 = np.full(u1, WCAP, dtype=np.int64)
        last = np.cumsum(n_sub) - 1
        lens1[last] = lens_l - (n_sub - 1) * WCAP
        srt = np.sort(lens1)[::-1]
        widths = np.maximum(srt[:: LANE], 1)
        rows_c = int(widths.sum())
        try:
            t1 = pick_t(max(rows_a, rows_c))
        except ValueError:
            continue
        # heavy side: cheaper of dense bf16 block and pooled residue tiles
        hcost = 0
        if heavy.any():
            hsel = heavy[rows]
            # pooled tiles: per (pool, window), tiles = ceil(max pooled
            # per-residue count / 128); pools follow _build_heavy's
            # _HEAVY_POOL_ROWS row-ordinal split. The x2 weights the
            # kernel's extra taa passes and cumsum matmul per slot.
            hord = np.cumsum(heavy) - 1  # heavy ordinal per row
            pool = hord[rows[hsel]] // _HEAVY_POOL_ROWS
            keyh = (pool * nwin + w[hsel]) * LANE + a[hsel]
            npools = int(pool.max(initial=0)) + 1
            cnth = np.bincount(
                keyh, minlength=npools * nwin * LANE
            ).reshape(npools * nwin, LANE)
            tiles_h = np.ceil(cnth.max(axis=1) / LANE).sum()
            hcost = int(2 * tiles_h * LANE * LANE)
            n_pad = -(-n // LANE) * LANE
            n_h = int(heavy.sum())
            if (
                np.dtype(dtype) == np.dtype("float32")
                and n_h * n_pad * 2 <= _DENSE_HEAVY_MAX_BYTES
                and os.environ.get("SPMV_DENSE_HEAVY", "1") != "0"
            ):
                hcost = min(hcost, n_h * n_pad // 2)
        cost = hcost + rows_a * LANE + 4 * t1 * LANE * LANE
        if best_cost is None or cost < best_cost:
            best_thr, best_cost = thr, cost
    return best_thr


def routed_schema_stats(csr: CSRMatrix) -> dict:
    """Pass A of the single-program multi-device prepare: the shape-
    determining stats of this chunk's routed structure under the pow2
    width ladder (no heavy split, no routing calls — pure numpy, cheap).

    Returns {'rows_a', 'nwin', 'ladders': (level-1 ladder, ...), 'm'};
    merge across chunks with `merge_routed_schemas`."""
    m, n = csr.shape
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    lens = np.diff(csr.indptr.astype(np.int64))
    w = cols // WINDOW_ELEMS
    a = cols % LANE
    nwin = n_windows_for(n, int(w.max(initial=0)), WINDOW_ELEMS)
    cell = w * LANE + a
    cnt = np.bincount(cell, minlength=nwin * LANE).reshape(nwin, LANE)
    rows_a = int((LANE * np.ceil(cnt / LANE).max(axis=1)).sum())
    ladders = []
    n_sub = np.maximum(-(-lens // WCAP), 1)
    u = int(n_sub.sum())
    lens_k = np.full(u, WCAP, dtype=np.int64)
    lens_k[np.cumsum(n_sub) - 1] = lens - (n_sub - 1) * WCAP
    ladders.append(_ladder_counts(lens_k))
    counts = n_sub[n_sub > 1]
    while counts.size:
        nsub2 = np.maximum(-(-counts // WCAP), 1)
        u2 = int(nsub2.sum())
        lens2 = np.full(u2, WCAP, dtype=np.int64)
        lens2[np.cumsum(nsub2) - 1] = counts - (nsub2 - 1) * WCAP
        ladders.append(_ladder_counts(lens2))
        counts = nsub2[nsub2 > 1]
    return {"rows_a": rows_a, "nwin": nwin, "ladders": tuple(ladders),
            "m": m}


def merge_routed_schemas(stats) -> dict:
    """Merge per-chunk pass-A stats into the shared schema every chunk's
    schema'd prepare (and therefore the one shard_map program) uses."""
    n_levels = max(len(s["ladders"]) for s in stats)
    ladders = []
    for k in range(n_levels):
        lads = [s["ladders"][k] for s in stats if len(s["ladders"]) > k]
        merged = merge_ladders(lads)
        if not merged:
            merged = {1: 1}
        ladders.append(merged)
    # out domain: every level's groups + the largest chunk's y rows
    total_groups = sum(sum(l.values()) for l in ladders)
    out_rows = max(
        total_groups, max(-(-s["m"] // LANE) for s in stats)
    )
    return {
        "rows_a": max(s["rows_a"] for s in stats),
        "nwin": max(s["nwin"] for s in stats),
        "ladders": tuple(ladders),
        "n_levels": n_levels,
        "out_rows": out_rows,
    }


def prepare_routed(
    csr: CSRMatrix,
    dtype=jnp.float32,
    heavy_threshold: int | None = None,
    vals_dtype=None,
    schema: dict | None = None,
) -> RoutedCSR:
    """vals_dtype (default = dtype) is the storage dtype of the streamed
    value slabs only; the gathered x, product slab and all reductions stay
    in `dtype` (bf16 vals halve the gather phase's dominant HBM stream at
    ~0.4% relative value rounding — the PL_DIA_BF16 trade).

    schema (from merge_routed_schemas) forces the pow2-ladder run
    structure, padded gather rows, window count and out domain so every
    chunk sharing the schema yields SHAPE-IDENTICAL operands and static
    metadata — the requirement of the single shard_map program
    (parallel/routed_spmd.py). Heavy extraction is disabled (heavy rows
    demote into the multi-level reduction, correct and uniform)."""
    if vals_dtype is None:
        vals_dtype = dtype
    m, n = csr.shape
    if csr.nnz == 0 or m == 0:
        raise RoutedError("empty matrix")
    rows = csr.row_ids().astype(np.int64)
    cols = csr.indices.astype(np.int64)
    data = csr.data
    indptr = csr.indptr.astype(np.int64)
    lens_full = np.diff(indptr)

    # ---- heavy-row split --------------------------------------------------
    if schema is not None:
        heavy_threshold = 1 << 60
    if heavy_threshold is None:
        heavy_threshold = _pick_heavy_threshold(csr, lens_full, dtype)
    heavy_sel = lens_full >= heavy_threshold
    while heavy_sel.any() and lens_full[~heavy_sel].sum() == 0:
        # the routed pipeline needs at least one light nnz (a zero-row
        # gather domain would emit an empty pallas grid): demote the
        # smallest heavy row
        cand = np.flatnonzero(heavy_sel)
        heavy_sel[cand[np.argmin(lens_full[cand])]] = False
    rows_h = np.flatnonzero(heavy_sel)
    hvals = hpidx = hwidx = hreduce = hlo = hhi = hdense = None
    if rows_h.size:
        n_pad = -(-n // LANE) * LANE
        use_dense = (
            np.dtype(dtype) == np.dtype("float32")
            and rows_h.size * n_pad * 2 <= _DENSE_HEAVY_MAX_BYTES
            and os.environ.get("SPMV_DENSE_HEAVY", "1") != "0"
        )
        if use_dense:
            hd = np.zeros((rows_h.size, n_pad), dtype=np.float32)
            row_map = np.full(m, -1, dtype=np.int64)
            row_map[rows_h] = np.arange(rows_h.size)
            hnz = heavy_sel[rows]
            hd[row_map[rows[hnz]], cols[hnz]] = data[hnz]
            hdense = hd
        else:
            hvals, hpidx, hwidx, hreduce, hlo, hhi = _build_heavy(rows_h, csr)
        keep = ~heavy_sel[rows]
        rows, cols, data = rows[keep], cols[keep], data[keep]
        lens_light = np.where(heavy_sel, 0, lens_full)
        indptr = np.r_[0, np.cumsum(lens_light)]
        csr = CSRMatrix(
            shape=(m, n),
            indptr=indptr,
            indices=cols,
            data=data,
        )
    nnz = cols.shape[0]

    # ---- gather-phase packing (rows fixed, lanes assigned by the router) --
    w = cols // WINDOW_ELEMS
    a = cols % LANE
    p = (cols // LANE) % WINDOW_PANELS
    nwin = n_windows_for(n, int(w.max(initial=0)), WINDOW_ELEMS)
    if schema is not None:
        nwin = max(nwin, schema["nwin"])
    # ordinal within (w, a)
    key = w * LANE + a
    order = np.argsort(key, kind="stable")
    key_sorted = key[order]
    starts = np.r_[0, np.flatnonzero(np.diff(key_sorted)) + 1]
    run_id = np.zeros(nnz, dtype=np.int64)
    run_id[starts] = 1
    run_id = np.cumsum(run_id) - 1
    j_sorted = np.arange(nnz) - starts[run_id]
    j = np.empty(nnz, dtype=np.int64)
    j[order] = j_sorted
    depth = j // LANE
    tiles_per_win = np.zeros(nwin, dtype=np.int64)
    np.maximum.at(tiles_per_win, w, depth + 1)
    tile_base = np.r_[0, np.cumsum(tiles_per_win)]
    n_tiles = int(tile_base[-1])
    rows_a = n_tiles * LANE
    row_a = (tile_base[w] + depth) * LANE + a  # slot row per nnz; lane TBD
    pad_tiles = 0  # schema: trailing all-zero gather tiles (widx -> 0)
    if schema is not None:
        if rows_a > schema["rows_a"]:
            raise RoutedError(
                f"chunk gather rows {rows_a} exceed schema {schema['rows_a']}"
            )
        pad_tiles = schema["rows_a"] // LANE - n_tiles
        n_tiles += pad_tiles
        rows_a = schema["rows_a"]

    # ---- reduction units (multi-level row splitting) ----------------------
    lens = np.diff(csr.indptr).astype(np.int64)
    ordinal = np.arange(nnz) - csr.indptr[rows].astype(np.int64)
    # level-1 units: subrows of <= WCAP nnz, in row-major order
    n_sub = np.maximum(-(-lens // WCAP), 1)
    sub_base = np.r_[0, np.cumsum(n_sub)]  # unit id = sub_base[r] + o//WCAP
    u1 = int(sub_base[-1])
    unit_of_nnz = sub_base[rows] + ordinal // WCAP
    k_of_nnz = ordinal % WCAP
    # exact per-unit lengths: full WCAP except each row's last subrow
    # (zero-length rows get a single length-0 unit)
    lens1 = np.full(u1, WCAP, dtype=np.int64)
    last = sub_base[1:] - 1
    lens1[last] = lens - (n_sub - 1) * WCAP

    # units consumed by level 2 (subunits of split rows) sort first
    is_child1 = np.repeat(n_sub > 1, n_sub)
    if schema is not None:
        rank1, base1, runs1, rows_c = _group_units_ladder(
            lens1, schema["ladders"][0]
        )
    else:
        order1, base1, runs1, rows_c = _group_units(
            lens1, child_first=is_child1
        )
        rank1 = np.empty(u1, dtype=np.int64)
        rank1[order1] = np.arange(u1)
    n_child = [int(is_child1.sum())]  # per level: #units feeding the next

    # ---- pass 1: unit/group structure for every reduction level -----------
    # (in-group lanes are NOT fixed here — the output-assembly router assigns
    # them so its own first lane-perm stage folds away entirely)
    levels = []  # per extra level: dict of structure arrays
    level_groups = [
        sum(schema["ladders"][0].values()) if schema is not None
        else -(-u1 // LANE)
    ]
    # map each original row to (level, unit id within that level)
    final_level = np.zeros(m, dtype=np.int64)
    final_unit = sub_base[:-1].copy()  # rows with one subrow: that unit
    parents = np.flatnonzero(n_sub > 1)
    child_counts = n_sub
    child_first = sub_base[:-1]
    level = 0
    while parents.size:
        level += 1
        plens_full = child_counts[parents]
        nsub2 = np.maximum(-(-plens_full // WCAP), 1)
        sb2 = np.r_[0, np.cumsum(nsub2)]
        u2 = int(sb2[-1])
        lens2 = np.full(u2, WCAP, dtype=np.int64)
        last2 = sb2[1:] - 1
        lens2[last2] = plens_full - (nsub2 - 1) * WCAP
        is_child2 = np.repeat(nsub2 > 1, nsub2)
        if schema is not None:
            if level >= len(schema["ladders"]):
                raise RoutedError(
                    f"chunk needs level {level} beyond schema depth"
                )
            rank2, base2, runs2, rows2 = _group_units_ladder(
                lens2, schema["ladders"][level]
            )
        else:
            order2, base2, runs2, rows2 = _group_units(
                lens2, child_first=is_child2
            )
            rank2 = np.empty(u2, dtype=np.int64)
            rank2[order2] = np.arange(u2)
        n_child.append(int(is_child2.sum()))
        # one element per (unit, k<len): its source is a child unit at the
        # previous level
        el_unit = np.repeat(np.arange(u2), lens2)
        el_start = np.r_[0, np.cumsum(lens2)]
        el_k = np.arange(int(el_start[-1])) - el_start[el_unit]
        unit_parent = np.repeat(np.arange(parents.shape[0]), nsub2)
        src_unit = (
            child_first[parents][unit_parent[el_unit]]
            + (el_unit - sb2[unit_parent[el_unit]]) * WCAP
            + el_k
        )
        levels.append(
            dict(
                u=u2, rank=rank2, base=base2, runs=runs2, rows=rows2,
                el_unit=el_unit, el_k=el_k, src_unit=src_unit,
            )
        )
        level_groups.append(
            sum(schema["ladders"][level].values())
            if schema is not None
            else -(-u2 // LANE)
        )
        done = nsub2 == 1
        final_level[parents[done]] = level
        final_unit[parents[done]] = sb2[:-1][done]
        still = np.flatnonzero(~done)
        parents_next = parents[still]
        child_counts_next = np.zeros(
            max(int(parents.max(initial=0)) + 1, m), dtype=np.int64
        )
        child_first_next = np.zeros_like(child_counts_next)
        child_counts_next[parents_next] = nsub2[still]
        child_first_next[parents_next] = sb2[:-1][still]
        child_counts = child_counts_next
        child_first = child_first_next
        parents = parents_next
        if level > 8:
            raise RoutedError("row splitting failed to converge")

    if schema is not None:
        # pad to the schema's level count with degenerate levels (one dummy
        # length-0 unit, no extraction elements, all-zero mask): the level
        # machinery runs identically on every chunk
        empty = np.zeros(0, dtype=np.int64)
        while len(levels) < schema["n_levels"] - 1:
            lad = schema["ladders"][len(levels) + 1]
            rank_d, base_d, runs_d, rows_d = _group_units_ladder(
                np.zeros(1, dtype=np.int64), lad
            )
            levels.append(
                dict(
                    u=1, rank=rank_d, base=base_d, runs=runs_d,
                    rows=rows_d, el_unit=empty, el_k=empty, src_unit=empty,
                )
            )
            level_groups.append(sum(lad.values()))
            n_child.append(0)

    # ---- pass 2: output assembly routing assigns every in-group lane ------
    # elements = all units of all levels (every sums row has exactly 128
    # incl. pads); finals route to y rows, the rest to the pad region
    group_offs = np.r_[0, np.cumsum(level_groups)]
    total = int(group_offs[-1]) * LANE
    # hdense heavy sums enter the assembly domain as extra source rows
    # after the level groups and route straight to their y rows — the
    # perm_out delivery replaces the XLA scatter-add on y
    n_hroute = rows_h.size if hdense is not None else 0
    h_extra_rows = -(-n_hroute // LANE) if n_hroute else 0
    out_rows = max(
        -(-total // LANE) + h_extra_rows, -(-m // LANE)
    )
    if schema is not None:
        if out_rows > schema["out_rows"]:
            raise RoutedError(
                f"chunk out rows {out_rows} exceed schema "
                f"{schema['out_rows']}"
            )
        out_rows = schema["out_rows"]
    t_out = pick_t(out_rows)
    h_out = t_out * LANE
    dom_o = h_out * LANE
    all_ranks = [rank1] + [lv["rank"] for lv in levels]
    src_rows_lvl = [
        group_offs[k] + r // LANE for k, r in enumerate(all_ranks)
    ]
    unit_src_row = np.concatenate(src_rows_lvl)
    unit_offs = np.r_[0, np.cumsum([r.shape[0] for r in all_ranks])]
    # dst: finals -> y row; everything else -> free slots
    dst_unit = np.full(unit_src_row.shape[0], -1, dtype=np.int64)
    fin_ids = unit_offs[final_level] + final_unit
    dst_unit[fin_ids] = np.arange(m)
    if n_hroute:
        # heavy rows' (empty, zero-sum) final units yield their y slot to
        # the routed heavy sums
        dst_unit[fin_ids[rows_h]] = -1
        heavy_src = int(group_offs[-1]) + np.arange(n_hroute) // LANE
        unit_src_row = np.r_[unit_src_row, heavy_src]
        dst_unit = np.r_[dst_unit, rows_h]
    # pad elements fill every domain row to exactly 128
    cnt_row_o = np.bincount(unit_src_row, minlength=h_out)
    pad_rows_o = np.repeat(np.arange(h_out), LANE - cnt_row_o)
    src_all_o = np.r_[unit_src_row, pad_rows_o]
    dst_all_o = np.full(src_all_o.shape[0], -1, dtype=np.int64)
    dst_all_o[: dst_unit.shape[0]] = dst_unit
    used_o = np.zeros(dom_o, dtype=bool)
    used_o[np.arange(m)] = True
    dst_all_o[dst_all_o < 0] = np.flatnonzero(~used_o)
    perm_out, m_out = plan_row_to_slot(src_all_o, dst_all_o, t_out)
    heavy_lanes = (
        tuple(
            int(v)
            for v in m_out[
                unit_src_row.shape[0] - n_hroute : unit_src_row.shape[0]
            ]
        )
        if n_hroute
        else ()
    )
    # in-group lane of every unit, per level
    lanes_lvl = [
        m_out[unit_offs[k] : unit_offs[k + 1]] for k in range(len(all_ranks))
    ]
    pos_lvl = [
        (r // LANE) * LANE + lanes_lvl[k] for k, r in enumerate(all_ranks)
    ]

    # ---- pass 3: lane-dependent structures --------------------------------
    slot_c = (
        (base1[rank1[unit_of_nnz] // LANE] + k_of_nnz) * LANE
        + lanes_lvl[0][unit_of_nnz]
    )

    # products permutation (source lanes assigned by its own router)
    dom_rows = max(rows_a, rows_c)
    try:
        t1 = pick_t(dom_rows)
    except ValueError as e:
        raise RoutedError(str(e)) from e
    h1 = t1 * LANE
    dom = h1 * LANE
    cnt_row = np.zeros(h1, dtype=np.int64)
    np.add.at(cnt_row, row_a, 1)
    pad_rows = np.repeat(np.arange(h1), LANE - cnt_row)
    src_row_all = np.r_[row_a, pad_rows]
    used_dst = np.zeros(dom, dtype=bool)
    used_dst[slot_c] = True
    dst_all = np.r_[slot_c, np.flatnonzero(~used_dst)]
    perm_products, m_all = plan_row_to_slot(src_row_all, dst_all, t1)
    lane_a = m_all[:nnz]  # the router's lane assignment for each nnz

    # level permutations: prev sums -> level slab
    lvl_gather: List = []
    lvl_runs: List[Tuple] = []
    for k, lv in enumerate(levels):
        gidx = np.full(lv["rows"] * LANE, -1, dtype=np.int64)
        dst_rows = lv["base"][lv["rank"][lv["el_unit"]] // LANE] + lv["el_k"]
        gidx[dst_rows * LANE + lanes_lvl[k + 1][lv["el_unit"]]] = pos_lvl[k][
            lv["src_unit"]
        ]
        # with child-first ordering the previous level's child sums occupy
        # only its leading groups — the extraction domain shrinks to those
        # schema mode has no child-first ordering: child sums sit anywhere
        # in the previous level's groups, so the extraction spans them all
        prev_rows = (
            level_groups[k]
            if schema is not None
            else -(-max(n_child[k], 1) // LANE)
        )
        t_k = pick_t(max(prev_rows, lv["rows"]))
        dom_k = t_k * LANE * LANE
        dst_k = np.full(dom_k, -1, dtype=np.int64)
        real = gidx >= 0
        dst_k[gidx[real]] = np.flatnonzero(real)
        used_k = np.zeros(dom_k, dtype=bool)
        used_k[np.flatnonzero(real)] = True
        dst_k[dst_k < 0] = np.flatnonzero(~used_k)
        mask_k = np.zeros((t_k * LANE, LANE), dtype=np.float32)
        mask_k.reshape(-1)[np.flatnonzero(real)] = 1.0
        lvl_gather.append((plan_permutation(dst_k, t_k), mask_k))
        lvl_runs.append(lv["runs"])

    # ---- device arrays ----------------------------------------------------
    # pidx holds panel ids < 128, stored int8 to halve its HBM stream; pad
    # tiles beyond rows_a are never materialized — the gather kernels emit
    # their zeros directly
    vals = np.zeros((rows_a, LANE), dtype=np.float64)
    pidx = np.zeros((rows_a, LANE), dtype=np.int8)
    vals[row_a, lane_a] = csr.data
    pidx[row_a, lane_a] = p
    widx = np.repeat(np.arange(nwin, dtype=np.int32), tiles_per_win)
    if pad_tiles:
        # schema pad tiles: all-zero vals -> zero products; window 0 read
        widx = np.r_[widx, np.zeros(pad_tiles, dtype=np.int32)]
    return RoutedCSR(
        vals=jnp.asarray(vals, dtype=vals_dtype),
        pidx=jnp.asarray(pidx),
        widx=jnp.asarray(widx),
        hvals=jnp.asarray(hvals, dtype=vals_dtype) if hvals is not None else None,
        hpidx=jnp.asarray(hpidx, dtype=jnp.int8) if hpidx is not None else None,
        hwidx=jnp.asarray(hwidx) if hwidx is not None else None,
        hreduce=jnp.asarray(hreduce, dtype=dtype) if hreduce is not None else None,
        hlo=jnp.asarray(hlo) if hlo is not None else None,
        hhi=jnp.asarray(hhi) if hhi is not None else None,
        hdense=jnp.asarray(hdense, dtype=jnp.bfloat16)
        if hdense is not None
        else None,
        heavy_rows=tuple(int(r) for r in rows_h),
        heavy_lanes=heavy_lanes,
        perm_products=perm_products,
        lvl_perms=tuple(pk for pk, _mk in lvl_gather),
        lvl_masks=tuple(jnp.asarray(mk, dtype=dtype) for _pk, mk in lvl_gather),
        perm_out=perm_out,
        shape=(m, n),
        nnz=nnz,
        n_windows=nwin,
        rows_a=rows_a,
        widx_t=tuple(int(v) for v in widx)
        if rows_a <= 128 * LANE and schema is None
        else (),
        runs=runs1,
        lvl_runs=tuple(lvl_runs),
        out_t=t_out,
    )


def _slab_dtype(mat: RoutedCSR):
    """Compute/slab dtype: f32 when vals stream as bf16 (the taa source and
    the permuted product slab must stay f32 — Mosaic bf16 taa crashes and
    accumulation wants the precision)."""
    return jnp.float32 if mat.vals.dtype == jnp.bfloat16 else mat.vals.dtype


def _pack_xw(mat: RoutedCSR, x: jax.Array) -> jax.Array:
    """x -> transposed window stack, flattened rows: rows [w*128, (w+1)*128)
    = window w."""
    return pack_x_windows_flat(
        x, mat.n_windows, mat.shape[1], _slab_dtype(mat), WINDOW_PANELS
    )


def _gather_products(mat: RoutedCSR, xw: jax.Array) -> jax.Array:
    """Phase 1: products in panel order, (h1, 128)."""
    dtype = _slab_dtype(mat)
    n_tiles = mat.vals.shape[0] // LANE

    def kernel(widx_ref, wt_ref, vals_ref, pidx_ref, o_ref):
        o_ref[:] = vals_ref[:].astype(dtype) * jnp.take_along_axis(
            wt_ref[:], pidx_ref[:].astype(jnp.int32), axis=1
        )

    tile = pl.BlockSpec((LANE, LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[
            # window tile selected by the prefetched widx -> pipelined DMA
            pl.BlockSpec(
                (LANE, LANE), lambda i, s: (s[i], 0), memory_space=pltpu.VMEM
            ),
            tile,
            tile,
        ],
        out_specs=tile,
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((mat.vals.shape[0], LANE), dtype),
        interpret=_interp(),
    )(mat.widx, xw, mat.vals, mat.pidx)


def _gather_w1(mat: RoutedCSR, xw: jax.Array) -> jax.Array:
    """Phases 1+2a fused: per-tile lane-gather products immediately W1-
    permuted (the Clos ingress sublane perm) — the product slab never
    round-trips HBM between gather and routing. Pad tiles (vals = 0) emit
    permuted zeros, which is exactly what their pad slots must carry.

    Small domains run as ONE block with the whole xw resident and static
    window offsets (widx_t) — the per-tile grid pipeline's step overhead
    dominates at these sizes. The output covers the full permutation domain;
    pad tiles past the gather rows are zeroed in-kernel without any HBM
    read."""
    dtype = _slab_dtype(mat)
    n_real = mat.vals.shape[0] // LANE
    h1 = mat.perm_products.h
    if len(mat.widx_t) == n_real and n_real <= 72:
        # single-block whole-domain kernel: no grid-pipeline per-step
        # overhead (measured ~140 Gelem/s on the per-tile grid vs ~260-300
        # in single-block kernels). Only the chunk's own window range is
        # staged (chunked locality: a few windows, not the whole xw).
        w_lo = min(mat.widx_t)
        w_hi = max(mat.widx_t) + 1
        if (w_hi - w_lo) * LANE * LANE * xw.dtype.itemsize <= 4 * 2**20:
            wl = tuple(w - w_lo for w in mat.widx_t)
            xw_sl = jax.lax.slice_in_dim(xw, w_lo * LANE, w_hi * LANE)

            def kernel1(xw_ref, vals_ref, pidx_ref, w1_ref, o_ref):
                for i in range(n_real):
                    sl = slice(i * LANE, (i + 1) * LANE)
                    wt = xw_ref[wl[i] * LANE : (wl[i] + 1) * LANE, :]
                    prod = vals_ref[sl, :].astype(dtype) * jnp.take_along_axis(
                        wt, pidx_ref[sl, :].astype(jnp.int32), axis=1
                    )
                    w1p = jnp.take_along_axis(
                        prod.T, w1_ref[sl, :].astype(jnp.int32), axis=1
                    )
                    o_ref[sl, :] = w1p.T
                if h1 > n_real * LANE:
                    o_ref[n_real * LANE :, :] = jnp.zeros(
                        (h1 - n_real * LANE, LANE), dtype
                    )

            return pl.pallas_call(
                kernel1,
                out_shape=jax.ShapeDtypeStruct((h1, LANE), dtype),
                in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 4,
                out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
                interpret=_interp(),
            )(xw_sl, mat.vals, mat.pidx, mat.perm_products.w1)

    def kernel(widx_ref, wt_ref, vals_ref, pidx_ref, w1_ref, o_ref):
        i = pl.program_id(0)

        @pl.when(i < n_real)
        def _():
            prod = vals_ref[:].astype(dtype) * jnp.take_along_axis(
                wt_ref[:], pidx_ref[:].astype(jnp.int32), axis=1
            )
            w1p = jnp.take_along_axis(
                prod.T, w1_ref[:].astype(jnp.int32), axis=1
            )
            o_ref[:] = w1p.T

        @pl.when(i >= n_real)
        def _():
            o_ref[:] = jnp.zeros((LANE, LANE), dtype)

    # pad tiles re-read tile 0's inputs (clamped index) but never use them
    clamp = lambda i, s: (jnp.minimum(i, n_real - 1), 0)  # noqa: E731
    tile_spec = pl.BlockSpec((LANE, LANE), clamp, memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(h1 // LANE,),
        in_specs=[
            # window tile selected by the prefetched widx -> pipelined DMA
            pl.BlockSpec(
                (LANE, LANE),
                lambda i, s: (s[jnp.minimum(i, n_real - 1)], 0),
                memory_space=pltpu.VMEM,
            ),
            tile_spec,
            tile_spec,
            tile_spec,
        ],
        out_specs=pl.BlockSpec(
            (LANE, LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((h1, LANE), dtype),
        interpret=_interp(),
    )(mat.widx, xw, mat.vals, mat.pidx, mat.perm_products.w1)


def _hdense_mv(mat: RoutedCSR, x: jax.Array, placed: bool = False):
    """y_h = H @ x for the dense bf16 heavy block. XLA's skinny matvec runs
    far below bandwidth (measured ~3x slower), so small blocks use a
    single-block kernel: per heavy row, an elementwise multiply over the
    (C, 128)-shaped row and a full f32 sum.

    placed=True returns the sums as assembly-domain rows — sum k at
    (row k // 128, lane mat.heavy_lanes[k]), the slots the output
    permutation routes to y[heavy_rows[k]] (targets are static, so the
    kernel places them for free)."""
    n_h, n_pad = mat.hdense.shape
    c = n_pad // LANE
    rows_h_pad = max(-(-n_h // LANE), 1)
    xb = jnp.pad(x, (0, n_pad - x.shape[0]))
    if n_h > 64 or mat.hdense.size * 2 > 6 * 2**20:
        # x stays f32 (same contract as the kernel path: only the stored
        # values carry bf16 rounding); XLA fuses the convert into the dot
        yh = jax.lax.dot(
            mat.hdense.astype(jnp.float32), xb.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        )
        if not placed:
            return yh
        flat = jnp.zeros(rows_h_pad * LANE, jnp.float32)
        idx = (
            jnp.arange(n_h) // LANE * LANE
            + jnp.asarray(mat.heavy_lanes, dtype=jnp.int32)
        )
        return flat.at[idx].set(yh).reshape(rows_h_pad, LANE)

    hd = mat.hdense.reshape(n_h * c, LANE)
    x2 = xb.reshape(c, LANE).astype(jnp.float32)
    out_rows = max(rows_h_pad, 8) if placed else 8

    def kernel(h_ref, x_ref, o_ref):
        rows_i = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 0)
        cols_i = jax.lax.broadcasted_iota(jnp.int32, (out_rows, LANE), 1)
        acc = jnp.zeros((out_rows, LANE), jnp.float32)
        for r in range(n_h):
            prod = h_ref[r * c : (r + 1) * c, :].astype(jnp.float32) * x_ref[:]
            s = jnp.sum(prod)
            lane = mat.heavy_lanes[r] if placed else r % LANE
            acc = acc + jnp.where(
                (rows_i == r // LANE) & (cols_i == lane), s, 0.0
            )
        o_ref[:] = acc

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((out_rows, LANE), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 2,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(hd, x2)
    if placed:
        return out[:rows_h_pad]
    return out.reshape(-1)[:n_h]


def _heavy_sums(mat: RoutedCSR, xw: jax.Array) -> jax.Array:
    """Pooled residue-dual heavy path (see _build_heavy): per tile, gather
    products, inclusive lane-cumsum via one triangular MXU matmul, and
    sample the cumsum at each row-slot's per-residue bounds; slot partials
    map back to rows with a static 0/1 matmul. Legacy (owner-packed)
    serialized formats lack hlo/hhi and use the plain per-lane sum."""
    dtype = (
        jnp.float32 if mat.hvals.dtype == jnp.bfloat16 else mat.hvals.dtype
    )
    n_tiles = mat.hvals.shape[0] // LANE
    v2 = mat.hlo is not None
    tile_spec = pl.BlockSpec(
        (LANE, LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )

    def kernel(hwidx_ref, wt_ref, vals_ref, pidx_ref, *rest):
        prod = vals_ref[:].astype(dtype) * jnp.take_along_axis(
            wt_ref[:], pidx_ref[:].astype(jnp.int32), axis=1
        )
        if v2:
            lo_ref, hi_ref, o_ref = rest
            # C[a, j] = sum_{l <= j} prod[a, l]: one triangular matmul
            rows_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 0)
            cols_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)
            tri = (rows_i <= cols_i).astype(dtype)
            c = jax.lax.dot(
                prod, tri, preferred_element_type=jnp.float32
            ).astype(dtype)
            lo = lo_ref[:].astype(jnp.int32)
            hi = hi_ref[:].astype(jnp.int32)
            t_hi = jnp.take_along_axis(c, jnp.maximum(hi, 0), axis=1) * (
                hi >= 0
            ).astype(dtype)
            t_lo = jnp.take_along_axis(c, jnp.maximum(lo, 0), axis=1) * (
                lo >= 0
            ).astype(dtype)
            s = jnp.sum(t_hi - t_lo, axis=0).reshape(1, LANE)
        else:
            (o_ref,) = rest
            s = jnp.sum(prod, axis=0).reshape(1, LANE)
        # (8, LANE) block: sublane-aligned output tile, row 0 carries the sum
        o_ref[:] = jnp.broadcast_to(s, (8, LANE))

    ins = [
        pl.BlockSpec(
            (LANE, LANE), lambda i, s: (s[i], 0), memory_space=pltpu.VMEM
        ),
        tile_spec,
        tile_spec,
    ]
    args = [mat.hwidx, xw, mat.hvals, mat.hpidx]
    if v2:
        ins += [tile_spec, tile_spec]
        args += [mat.hlo, mat.hhi]
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=ins,
        out_specs=pl.BlockSpec(
            (8, LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM
        ),
    )
    partials = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n_tiles * 8, LANE), dtype),
        interpret=_interp(),
    )(*args)
    lane_sums = partials.reshape(n_tiles, 8, LANE)[:, 0, :]  # (T, 128)
    # one static 0/1 matmul maps per-slot sums back to their heavy rows
    return mat.hreduce @ lane_sums.reshape(-1)


#: fused-reduce VMEM budget: slab f32 + r3 int8 + gathered temp must fit
_FUSED_REDUCE_MAX_ROWS = 8192

#: budget for the W3+R3+reduce single-block kernel (adds a second
#: full-domain scratch slab + the w3 index array): ~10 MB VMEM at 8192 rows
#: without a mask; the masked (level) variant adds a full-domain mask, so it
#: keeps the stricter cap
_W3_FUSED_MAX_ROWS = 8192
_W3_FUSED_MASKED_MAX_ROWS = 4096


def _w3_r3_reduce(x5, plan, runs, mask=None, w1_next=None, lvl=None):
    """Last permutation stages (per-tile W3 sublane perm, R3 lane perm)
    fused with the width-binned reduce in one single-block kernel: the slab
    is read from HBM exactly once and never rematerializes. The optional
    mask zeroes in-run padding slots after R3 (level slabs).

    With w1_next (the output permutation's W1 stage array), the kernel ALSO
    emits the W1'-transformed sums for every full 128-group tile — the
    output permutation's ingress stage costs no extra memory pass. Returns
    (raw sums, transformed leading tiles) in that case.

    lvl=(r1, wc, r3, mask, runs_lvl): a single-tile (t == 1) second
    reduction level fused in — its extraction permutation reads the first
    128 sums rows just written and its level sums append after the
    level-1 groups (one kernel instead of a launch + HBM round trip)."""
    t = plan.t
    n_groups_total = runs[-1][3] + runs[-1][1]
    lvl_groups = lvl[4][-1][3] + lvl[4][-1][1] if lvl is not None else 0
    n_all = n_groups_total + lvl_groups
    g_pad = max(-(-n_all // 8) * 8, 8)
    k_full = n_groups_total // LANE if w1_next is not None else 0

    def kernel(*refs):
        refs_l = list(refs)
        x5_ref = refs_l.pop(0)
        w3_ref = refs_l.pop(0)
        r3_ref = refs_l.pop(0)
        mask_ref = refs_l.pop(0) if mask is not None else None
        w1n_ref = refs_l.pop(0) if k_full else None
        lvl_refs = [refs_l.pop(0) for _ in range(4)] if lvl is not None else None
        o_ref = refs_l.pop(0)
        ow1_ref = refs_l.pop(0) if k_full else None
        s_ref = refs_l.pop(0)
        for tt in range(t):
            sl = slice(tt * LANE, (tt + 1) * LANE)
            xt = x5_ref[sl, :].T
            s_ref[sl, :] = jnp.take_along_axis(
                xt, w3_ref[sl, :].astype(jnp.int32), axis=1
            ).T
        g = jnp.take_along_axis(s_ref[:], r3_ref[:].astype(jnp.int32), axis=1)
        if mask is not None:
            g = g * mask_ref[:]
        for row0, n_groups, width, g0 in runs:
            seg = g[row0 : row0 + n_groups * width, :]
            o_ref[g0 : g0 + n_groups, :] = seg.reshape(
                n_groups, width, LANE
            ).sum(axis=1)
        if lvl is not None:
            r1l_ref, wcl_ref, r3l_ref, ml_ref = lvl_refs
            prev = o_ref[0:LANE, :]
            x1 = jnp.take_along_axis(
                prev, r1l_ref[:].astype(jnp.int32), axis=1
            )
            x2l = jnp.take_along_axis(
                x1.T, wcl_ref[:].astype(jnp.int32), axis=1
            ).T
            g2 = jnp.take_along_axis(
                x2l, r3l_ref[:].astype(jnp.int32), axis=1
            ) * ml_ref[:]
            for row0, n_groups, width, g0 in lvl[4]:
                seg = g2[row0 : row0 + n_groups * width, :]
                o_ref[
                    n_groups_total + g0 : n_groups_total + g0 + n_groups, :
                ] = seg.reshape(n_groups, width, LANE).sum(axis=1)
        for kk in range(k_full):
            sl = slice(kk * LANE, (kk + 1) * LANE)
            ow1_ref[sl, :] = jnp.take_along_axis(
                o_ref[sl, :].T, w1n_ref[sl, :].astype(jnp.int32), axis=1
            ).T

    args = [x5, plan.w3, plan.r3]
    if mask is not None:
        args.append(mask)
    if k_full:
        args.append(w1_next[: k_full * LANE])
    if lvl is not None:
        args.extend(lvl[:4])
    out_shapes = [jax.ShapeDtypeStruct((g_pad, LANE), x5.dtype)]
    if k_full:
        out_shapes.append(
            jax.ShapeDtypeStruct((k_full * LANE, LANE), x5.dtype)
        )
    scratch = [pltpu.VMEM((t * LANE, LANE), x5.dtype)]
    out = pl.pallas_call(
        kernel,
        out_shape=out_shapes if k_full else out_shapes[0],
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * len(out_shapes)
            if k_full
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        ),
        scratch_shapes=scratch,
        interpret=_interp(),
    )(*args)
    if k_full:
        return out[0][:n_all], out[1]
    return out[:n_all]


def _perm_reduce_t1(prev2d, plan, mask, runs) -> jax.Array:
    """Whole level stage in ONE kernel for single-tile (t == 1) level perms:
    the SW stages are identity, so the permutation collapses to
    r1 . w_combined . r3, fused with the mask and the width-binned reduce."""
    n_groups_total = runs[-1][3] + runs[-1][1]
    g_pad = max(-(-n_groups_total // 8) * 8, 8)

    def kernel(x_ref, r1_ref, wc_ref, r3_ref, mask_ref, o_ref):
        x1 = jnp.take_along_axis(x_ref[:], r1_ref[:].astype(jnp.int32), axis=1)
        x2 = jnp.take_along_axis(x1.T, wc_ref[:].astype(jnp.int32), axis=1).T
        g = jnp.take_along_axis(x2, r3_ref[:].astype(jnp.int32), axis=1)
        g = g * mask_ref[:]
        for row0, n_groups, width, g0 in runs:
            seg = g[row0 : row0 + n_groups * width, :]
            o_ref[g0 : g0 + n_groups, :] = seg.reshape(
                n_groups, width, LANE
            ).sum(axis=1)

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g_pad, LANE), prev2d.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 5,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(prev2d, plan.r1, plan.wc, plan.r3, mask)
    return out[:n_groups_total]


def _reduce_runs_fused(slab: jax.Array, r3, runs, mask=None) -> jax.Array:
    """Width-binned reduce with the routing's final lane-perm (R3) fused in:
    one in-VMEM taa followed by static reshape-sums — saves a full memory
    pass over the product slab versus applying R3 as its own stage. The
    optional mask zeroes in-run padding slots (level slabs; applied AFTER
    the lane perm, matching `apply_permutation(...) * mask`)."""
    n_groups_total = runs[-1][3] + runs[-1][1]
    g_pad = max(-(-n_groups_total // 8) * 8, 8)

    def kernel(*refs):
        if mask is None:
            slab_ref, r3_ref, o_ref = refs
        else:
            slab_ref, r3_ref, mask_ref, o_ref = refs
        g = jnp.take_along_axis(
            slab_ref[:], r3_ref[:].astype(jnp.int32), axis=1
        )
        if mask is not None:
            g = g * mask_ref[:]
        for row0, n_groups, width, g0 in runs:
            seg = g[row0 : row0 + n_groups * width, :]
            o_ref[g0 : g0 + n_groups, :] = seg.reshape(
                n_groups, width, LANE
            ).sum(axis=1)

    args = (slab, r3) if mask is None else (slab, r3, mask)
    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((g_pad, LANE), slab.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        interpret=_interp(),
    )(*args)
    return out[:n_groups_total]


def _reduce_runs(slab: jax.Array, runs) -> jax.Array:
    """Width-binned slab -> per-group unit sums (XLA reshape-sums)."""
    outs = []
    for row0, n_groups, width, _g0 in runs:
        blk = jax.lax.slice_in_dim(slab, row0, row0 + n_groups * width)
        outs.append(blk.reshape(n_groups, width, LANE).sum(axis=1))
    return jnp.concatenate(outs, axis=0)


def _routed_small_spmv(mat: RoutedCSR, xw: jax.Array) -> jax.Array:
    """The ENTIRE routed pipeline in ONE kernel for tiny domains (products
    t <= 4, output t <= 4, no levels, no heavy rows): at this scale the
    per-launch and XLA-glue costs dominate, so gather, the full products
    Clos (SW done in transposed space as a static lane interleave), the
    width-binned reduce and the output permutation all run back to back in
    VMEM. SW in transposed space: C_k[m, p] = T_{p%t}[m, (128/t)k + p/t]
    — t taa's + a lane-class select per tile, exact because t | 128."""
    pp = mat.perm_products
    po = mat.perm_out
    t = pp.t
    to = po.t
    runs = mat.runs
    n_groups_total = runs[-1][3] + runs[-1][1]
    wl = mat.widx_t
    n_real = mat.vals.shape[0] // LANE
    dtype = _slab_dtype(mat)

    def kernel(
        xw_ref, vals_ref, pidx_ref, w1_ref, w2_ref, w3_ref, r3_ref,
        w1o_ref, w2o_ref, w3o_ref, r3o_ref, o_ref, s_ref, d_ref,
    ):
        lane_i = jax.lax.broadcasted_iota(jnp.int32, (LANE, LANE), 1)

        def sw_w2_sw_w3(ts_list, w2r, w3r, tt_n, out_ref):
            """SW + W2 + SW^-1 + W3 on transposed tiles, rows written back
            to out_ref in row space."""
            cs = []
            for k in range(tt_n):
                acc = jnp.zeros((LANE, LANE), dtype)
                idx = (LANE // tt_n) * k + lane_i // tt_n
                for tt in range(tt_n):
                    gk = jnp.take_along_axis(ts_list[tt], idx, axis=1)
                    acc = jnp.where((lane_i % tt_n) == tt, gk, acc)
                cs.append(
                    jnp.take_along_axis(
                        acc,
                        w2r[k * LANE : (k + 1) * LANE, :].astype(jnp.int32),
                        axis=1,
                    )
                )
            for tt in range(tt_n):
                acc = jnp.zeros((LANE, LANE), dtype)
                idx = (lane_i % (LANE // tt_n)) * tt_n + tt
                for k in range(tt_n):
                    gk = jnp.take_along_axis(cs[k], idx, axis=1)
                    acc = jnp.where((lane_i // (LANE // tt_n)) == k, gk, acc)
                t5 = jnp.take_along_axis(
                    acc,
                    w3r[tt * LANE : (tt + 1) * LANE, :].astype(jnp.int32),
                    axis=1,
                )
                out_ref[tt * LANE : (tt + 1) * LANE, :] = t5.T

        # gather + W1, staying in transposed space (T_tt[m, ss])
        ts = []
        for tt in range(t):
            if tt < n_real:
                sl = slice(tt * LANE, (tt + 1) * LANE)
                wt = xw_ref[wl[tt] * LANE : (wl[tt] + 1) * LANE, :]
                prod = vals_ref[sl, :].astype(dtype) * jnp.take_along_axis(
                    wt, pidx_ref[sl, :].astype(jnp.int32), axis=1
                )
            else:
                prod = jnp.zeros((LANE, LANE), dtype)
            ts.append(
                jnp.take_along_axis(
                    prod.T,
                    w1_ref[tt * LANE : (tt + 1) * LANE, :].astype(jnp.int32),
                    axis=1,
                )
            )
        sw_w2_sw_w3(ts, w2_ref, w3_ref, t, s_ref)
        # R3 + width-binned reduce into the output domain rows
        g = jnp.take_along_axis(
            s_ref[0 : t * LANE, :], r3_ref[:].astype(jnp.int32), axis=1
        )
        # stage the output domain rows through a scratch ref (taa over
        # concatenated SSA values is a known Mosaic crash)
        for row0, n_groups, width, g0 in runs:
            seg = g[row0 : row0 + n_groups * width, :]
            d_ref[g0 : g0 + n_groups, :] = seg.reshape(
                n_groups, width, LANE
            ).sum(axis=1)
        if n_groups_total < to * LANE:
            d_ref[n_groups_total:, :] = jnp.zeros(
                (to * LANE - n_groups_total, LANE), dtype
            )
        # output permutation (r1 folded by the assembly router)
        if to == 1:
            # SW stages are identity: single composed W (w1o carries wc)
            x2o = jnp.take_along_axis(
                d_ref[:].T, w1o_ref[:].astype(jnp.int32), axis=1
            ).T
            o_ref[:] = jnp.take_along_axis(
                x2o, r3o_ref[:].astype(jnp.int32), axis=1
            )
        else:
            ts_o = [
                jnp.take_along_axis(
                    d_ref[k * LANE : (k + 1) * LANE, :].T,
                    w1o_ref[k * LANE : (k + 1) * LANE, :].astype(jnp.int32),
                    axis=1,
                )
                for k in range(to)
            ]
            sw_w2_sw_w3(ts_o, w2o_ref, w3o_ref, to, d_ref)
            o_ref[:] = jnp.take_along_axis(
                d_ref[:], r3o_ref[:].astype(jnp.int32), axis=1
            )

    out = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((to * LANE, LANE), dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * 11,
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((t * LANE, LANE), dtype),
            pltpu.VMEM((to * LANE, LANE), dtype),
        ],
        interpret=_interp(),
    )(
        xw, mat.vals, mat.pidx, pp.w1, pp.w2, pp.w3, pp.r3,
        po.wc if to == 1 else po.w1, po.w2, po.w3, po.r3,
    )
    return out.reshape(-1)[: mat.shape[0]]


@_traced_x32
def routed_spmv(mat: RoutedCSR, x: jax.Array, xw: jax.Array | None = None) -> jax.Array:
    if xw is None:
        xw = _pack_xw(mat, x)
    h1 = mat.perm_products.h
    small_ok = len(mat.widx_t) == mat.vals.shape[0] // LANE
    if (
        small_ok
        and mat.perm_products.t <= 4
        and mat.perm_out.t <= 4
        and (mat.perm_out.t > 1 or mat.perm_out.wc is not None)
        and mat.perm_out.r1 is None
        and not mat.lvl_perms
        and mat.hvals is None
        and mat.hdense is None
        and xw.shape[0] * LANE * xw.dtype.itemsize <= 2 * 2**20
    ):
        return _routed_small_spmv(mat, xw)
    sums_w1 = None
    lvl_fused = False
    if h1 <= _W3_FUSED_MAX_ROWS:
        # Two fusion variants were A/B'd here and deleted as measured
        # losers: in-kernel SW/W2/SW^-1 (rounds 2-3: 27.2 vs 32.1 GF/s on
        # caida, sample_ab_r3.log) and the transposed-tile exchange
        # (round 4: 79.3 -> 100.4 us, sample_ab_tspace_r4.log — the
        # transposed-space SW becomes a lane-crossing XLA transpose).
        x2 = _gather_w1(mat, xw)
        x5 = apply_sw_w2_sw(mat.perm_products, x2)
        n_g1 = mat.runs[-1][3] + mat.runs[-1][1]
        lvl_fused = (
            len(mat.lvl_perms) == 1
            and mat.lvl_perms[0].t == 1
            and mat.lvl_perms[0].wc is not None
            and mat.lvl_perms[0].r1 is not None
            and n_g1 >= LANE
        )
        lvl_arg = (
            (
                mat.lvl_perms[0].r1,
                mat.lvl_perms[0].wc,
                mat.lvl_perms[0].r3,
                mat.lvl_masks[0],
                mat.lvl_runs[0],
            )
            if lvl_fused
            else None
        )
        res = _w3_r3_reduce(
            x5, mat.perm_products, mat.runs, w1_next=mat.perm_out.w1,
            lvl=lvl_arg,
        )
        sums, sums_w1 = res if isinstance(res, tuple) else (res, None)
    else:
        pa = _gather_products(mat, xw)
        pa = jnp.pad(pa, ((0, h1 - pa.shape[0]), (0, 0)))
        if h1 <= _FUSED_REDUCE_MAX_ROWS:
            slab = apply_permutation(mat.perm_products, pa, skip_r3=True)
            sums = _reduce_runs_fused(slab, mat.perm_products.r3, mat.runs)
        else:  # slab too large for the single-block fused kernel
            slab = apply_permutation(mat.perm_products, pa)
            sums = _reduce_runs(slab, mat.runs)
    flats = [sums.reshape(-1)]
    lvl_zip = (
        ()  # level rows already appended by the fused reduce kernel
        if lvl_fused
        else zip(mat.lvl_perms, mat.lvl_masks, mat.lvl_runs)
    )
    for perm_k, mask_k, runs in lvl_zip:
        prev2d = flats[-1].reshape(-1, LANE)
        if prev2d.shape[0] > perm_k.h:
            # child sums occupy only the leading groups (child-first sort)
            prev2d = prev2d[: perm_k.h]
        else:
            prev2d = jnp.pad(prev2d, ((0, perm_k.h - prev2d.shape[0]), (0, 0)))
        if perm_k.t == 1 and perm_k.wc is not None:
            flats.append(_perm_reduce_t1(prev2d, perm_k, mask_k, runs).reshape(-1))
        elif perm_k.h <= _W3_FUSED_MASKED_MAX_ROWS:
            x5_k = apply_permutation_to_mid(perm_k, prev2d)
            flats.append(
                _w3_r3_reduce(x5_k, perm_k, runs, mask=mask_k).reshape(-1)
            )
        elif perm_k.h <= _FUSED_REDUCE_MAX_ROWS:
            slab_k = apply_permutation(perm_k, prev2d, skip_r3=True)
            flats.append(
                _reduce_runs_fused(slab_k, perm_k.r3, runs, mask=mask_k)
                .reshape(-1)
            )
        else:
            slab_k = apply_permutation(perm_k, prev2d) * mask_k
            flats.append(_reduce_runs(slab_k, runs).reshape(-1))
    routed_heavy = mat.hdense is not None and bool(mat.heavy_lanes)
    if routed_heavy:
        # heavy sums enter the assembly domain at their planned slots and
        # perm_out delivers them to y (no scatter on y)
        flats.append(_hdense_mv(mat, x, placed=True).reshape(-1))
    concat = jnp.concatenate(flats)
    dom_o = mat.perm_out.h * LANE
    concat = jnp.pad(concat, (0, dom_o - concat.shape[0]))
    dom2d = concat.reshape(mat.perm_out.h, LANE)
    if sums_w1 is not None and mat.perm_out.r1 is None:
        # W1' for the leading full level-1 tiles already came out of the
        # reduce kernel; only the boundary/level/pad tail needs the stage
        k_rows = sums_w1.shape[0]
        if k_rows < mat.perm_out.h:
            tail_w1 = apply_w_stage(
                mat.perm_out.w1[k_rows:], dom2d[k_rows:]
            )
            x2_o = jnp.concatenate([sums_w1, tail_w1])
        else:
            x2_o = sums_w1
        y = apply_permutation_from_w1(mat.perm_out, x2_o)
    else:
        y = apply_permutation(mat.perm_out, dom2d)
    y = y.reshape(-1)[: mat.shape[0]]
    if mat.hdense is not None and not routed_heavy:
        # legacy (pre-heavy_lanes) checkpoints: scatter-add on y
        hsums = _hdense_mv(mat, x)
        y = y.at[jnp.asarray(mat.heavy_rows)].add(hsums.astype(y.dtype))
    elif mat.hvals is not None:
        hsums = _heavy_sums(mat, xw)
        # heavy rows carry no light nnz, so their y is exactly zero here
        y = y.at[jnp.asarray(mat.heavy_rows)].add(hsums.astype(y.dtype))
    return y


# ---------------------------------------------------------------------------
# Chunked wrapper: matrices beyond the single permutation domain
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["chunks"],
    meta_fields=["bounds", "shape", "nnz"],
)
@dataclasses.dataclass
class RoutedChunks:
    """Row-block decomposition into independent routed engines — the scale
    path for matrices whose nnz exceed one (128*128)-row routing domain
    (webbase/Cube_Coup-class inputs; the reference's only recourse there was
    CSR because the ELL cap tripped, parser.c:223-232). Row blocks are also
    the unit of multi-chip sharding."""

    chunks: Tuple[RoutedCSR, ...]
    bounds: Tuple[int, ...]  # row boundaries, len = n_chunks + 1
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0


def _sub_csr(csr: CSRMatrix, r0: int, r1: int) -> CSRMatrix:
    i0, i1 = int(csr.indptr[r0]), int(csr.indptr[r1])
    return CSRMatrix(
        shape=(r1 - r0, csr.shape[1]),
        indptr=(csr.indptr[r0 : r1 + 1] - i0).astype(np.int64),
        indices=csr.indices[i0:i1],
        data=csr.data[i0:i1],
    )


def _predict_domain_rows(csr: CSRMatrix, r0: int, r1: int) -> int:
    """Predicted permutation-domain rows max(rows_a, rows_c) for the light
    path of rows [r0, r1) (ignores the heavy split — exact for FEM-degree
    matrices, a safe overestimate otherwise)."""
    i0, i1 = int(csr.indptr[r0]), int(csr.indptr[r1])
    cols = csr.indices[i0:i1].astype(np.int64)
    if cols.size == 0:
        return 1
    w = cols // WINDOW_ELEMS
    a = cols % LANE
    cell = (w - w.min()) * LANE + a
    cnt = np.bincount(cell)
    # tiles per window = max over residues of ceil(cnt/128); rows = 128/tile
    nwin = int(w.max() - w.min()) + 1
    cnt2 = np.zeros(nwin * LANE, dtype=np.int64)
    cnt2[: cnt.shape[0]] = cnt
    rows_a = int(
        (128 * np.ceil(cnt2.reshape(nwin, LANE) / LANE).max(axis=1)).sum()
    )
    lens = np.diff(csr.indptr[r0 : r1 + 1]).astype(np.int64)
    n_sub = np.maximum(-(-lens // WCAP), 1)
    u1 = int(n_sub.sum())
    lens1 = np.full(u1, WCAP, dtype=np.int64)
    last = np.cumsum(n_sub) - 1
    lens1[last] = lens - (n_sub - 1) * WCAP
    srt = np.sort(lens1)[::-1]
    rows_c = int(np.maximum(srt[::LANE], 1).sum())
    return max(rows_a, rows_c, 1)


def _fit_chunk_bounds(csr: CSRMatrix, target_rows: int = 8064) -> List[int]:
    """Chunk boundaries chosen so each chunk's predicted permutation domain
    fills its power-of-two tile grid (pick_t rounds rows up to the next
    power of two <= 128 tiles; a 0.76-full domain taxes every routing pass
    ~1.3x, so aim just under the boundary)."""
    m = csr.shape[0]
    bounds = [0]
    while bounds[-1] < m:
        r0 = bounds[-1]
        lo, hi = r0 + 1, m
        # exponential probe then bisection on the end row
        step = max((m - r0) // 8, 1)
        r = min(r0 + step, m)
        while r < m and _predict_domain_rows(csr, r0, r) < target_rows:
            lo = r
            r = min(r + step, m)
            step *= 2
        hi = r
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if _predict_domain_rows(csr, r0, mid) <= target_rows:
                lo = mid
            else:
                hi = mid - 1
        bounds.append(max(lo, r0 + 1))
    return bounds


def prepare_routed_chunked(
    csr: CSRMatrix, dtype=jnp.float32, chunk_nnz: int = 700_000,
    vals_dtype=None, fit_domains: bool = True,
) -> RoutedChunks:
    """Split rows into blocks whose routing domains fill a t <= 64 tile grid
    (fit_domains, the default: boundaries by bisection on the predicted
    domain size) and prepare a routed engine per block (recursive halving if
    a block still exceeds its domain). fit_domains=False falls back to the
    greedy <= chunk_nnz split."""
    m = csr.shape[0]
    lens = np.diff(csr.indptr)
    if fit_domains and not os.environ.get("SPMV_CHUNK_GREEDY"):
        bounds = _fit_chunk_bounds(csr)
    else:
        bounds = [0]
        acc = 0
        for r in range(m):
            ln = int(lens[r])
            if acc + min(ln, HEAVY_THRESHOLD) > chunk_nnz and r > bounds[-1]:
                bounds.append(r)
                acc = 0
            acc += min(ln, HEAVY_THRESHOLD)
        bounds.append(m)
    chunks = []
    final_bounds = [0]
    stack = [(bounds[i], bounds[i + 1]) for i in range(len(bounds) - 1)][::-1]
    while stack:
        r0, r1 = stack.pop()
        try:
            chunks.append(
                prepare_routed(
                    _sub_csr(csr, r0, r1), dtype=dtype, vals_dtype=vals_dtype
                )
            )
            final_bounds.append(r1)
        except RoutedError:
            if r1 - r0 <= 1:
                raise
            mid = (r0 + r1) // 2
            stack.append((mid, r1))
            stack.append((r0, mid))
    return RoutedChunks(
        chunks=tuple(chunks),
        bounds=tuple(final_bounds),
        shape=csr.shape,
        nnz=csr.nnz,
    )


def routed_chunked_spmv(mat: RoutedChunks, x: jax.Array) -> jax.Array:
    # all chunks share shape[1], so the window stack is identical: pack once
    xw = _pack_xw(mat.chunks[0], x)
    return jnp.concatenate([routed_spmv(c, x, xw=xw) for c in mat.chunks])


def prepare_routed_auto(csr: CSRMatrix, dtype=jnp.float32, vals_dtype=None):
    """RoutedCSR when one domain suffices, RoutedChunks otherwise."""
    try:
        return prepare_routed(csr, dtype=dtype, vals_dtype=vals_dtype)
    except RoutedError:
        return prepare_routed_chunked(csr, dtype=dtype, vals_dtype=vals_dtype)


def routed_auto_spmv(mat, x: jax.Array) -> jax.Array:
    if isinstance(mat, RoutedChunks):
        return routed_chunked_spmv(mat, x)
    return routed_spmv(mat, x)


# ---------------------------------------------------------------------------
# Double-float routed engine — f64 semantics for the fully general path
# (reference computes double throughout, src/include/macros.h:63-76; the
# caida/webbase structure class previously had only the XLA-f64 binned
# fallback at ~0.1 GFLOP/s). Design: slot placement is VALUE-INDEPENDENT,
# so the (hi, lo) value slabs come from two structurally identical
# prepares; every permutation stage is pure data movement and runs once
# per word; products use TwoProduct + cross terms in one df gather
# kernel; reductions are XLA-level TwoSum trees (ops/dfloat.py). The
# heavy-row fast paths are value-split-hostile and stay OFF — heavy rows
# demote into the multi-level reduction runs the engine already has.
# ---------------------------------------------------------------------------


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mat", "vals_lo", "hdense_hi", "hdense_lo"],
    meta_fields=["heavy_rows_df"],
)
@dataclasses.dataclass
class RoutedDF:
    """Routed engine operands in double-float: hi words ride mat.vals, lo
    words in vals_lo (identical slot placement). Heavy rows (hub rows in
    power-law matrices) carry a dense (hi, lo) f32 row block reduced by a
    compensated pairwise tree in plain XLA f32 ops — double-class
    precision at f32 elementwise speed (XLA's EMULATED f64 dot measured
    1.4 ms for 3M MACs on this backend), and it keeps the light domain
    the same size as the f32 engine's instead of demoting 100k-nnz rows
    into the multi-level reduction runs (measured 6x on caida)."""

    mat: RoutedCSR
    vals_lo: jax.Array
    hdense_hi: jax.Array | None = None  # (n_heavy, n_pad) f32 pairs
    hdense_lo: jax.Array | None = None
    heavy_rows_df: Tuple[int, ...] = ()

    @property
    def shape(self):
        return self.mat.shape

    @property
    def nnz(self):
        return self.mat.nnz

    @property
    def perm_products(self):
        return self.mat.perm_products


#: dense f64 heavy-block budget (bytes); beyond it heavy rows demote into
#: the multi-level runs (correct, slower)
_DF_HDENSE_MAX_BYTES = 256 * 2**20


def prepare_routed_df(csr: CSRMatrix) -> RoutedDF:
    """Two structure-identical prepares over the split f64 values (slot
    placement is value-independent, so hi/lo slabs align); heavy rows get
    a dense f64 block when it fits the budget."""
    from ..ops.dfloat import split_f64

    m, n = csr.shape
    lens_full = np.diff(csr.indptr.astype(np.int64))
    thr = _pick_heavy_threshold(csr, lens_full, jnp.float32)
    heavy_sel = lens_full >= thr
    n_pad = -(-n // LANE) * LANE
    hdense64 = None
    heavy_rows: tuple = ()
    data = csr.data
    indptr = csr.indptr.astype(np.int64)
    if heavy_sel.any() and (
        int(heavy_sel.sum()) * n_pad * 8 <= _DF_HDENSE_MAX_BYTES
        and lens_full[~heavy_sel].sum() > 0
    ):
        rows_h = np.flatnonzero(heavy_sel)
        rows_all = csr.row_ids().astype(np.int64)
        hd = np.zeros((rows_h.size, n_pad), dtype=np.float64)
        row_map = np.full(m, -1, dtype=np.int64)
        row_map[rows_h] = np.arange(rows_h.size)
        hnz = heavy_sel[rows_all]
        hd[row_map[rows_all[hnz]], csr.indices[hnz]] = data[hnz]
        hd_hi, hd_lo = split_f64(hd)
        hdense64 = (jnp.asarray(hd_hi), jnp.asarray(hd_lo))
        heavy_rows = tuple(int(r) for r in rows_h)
        keep = ~hnz
        lens_light = np.where(heavy_sel, 0, lens_full)
        indptr = np.r_[0, np.cumsum(lens_light)]
        csr = CSRMatrix(
            shape=(m, n), indptr=indptr, indices=csr.indices[keep],
            data=data[keep],
        )
    hi, lo = split_f64(csr.data)
    no_heavy = 1 << 60
    mat_h = prepare_routed(
        CSRMatrix(shape=csr.shape, indptr=csr.indptr, indices=csr.indices,
                  data=hi),
        heavy_threshold=no_heavy,
    )
    mat_l = prepare_routed(
        CSRMatrix(shape=csr.shape, indptr=csr.indptr, indices=csr.indices,
                  data=lo),
        heavy_threshold=no_heavy,
    )
    return RoutedDF(
        mat=mat_h, vals_lo=mat_l.vals,
        hdense_hi=None if hdense64 is None else hdense64[0],
        hdense_lo=None if hdense64 is None else hdense64[1],
        heavy_rows_df=heavy_rows,
    )


def _gather_products_df(mat: RoutedCSR, vals_lo, xw_h, xw_l):
    """Phase 1 in double-float: (hi, lo) product slabs in panel order."""
    from ..ops.dfloat import df_mul_acc

    n_tiles = mat.vals.shape[0] // LANE

    def kernel(widx_ref, wth_ref, wtl_ref, vh_ref, vl_ref, pidx_ref,
               oh_ref, ol_ref):
        idx = pidx_ref[:].astype(jnp.int32)
        gh = jnp.take_along_axis(wth_ref[:], idx, axis=1)
        gl = jnp.take_along_axis(wtl_ref[:], idx, axis=1)
        z = jnp.zeros((LANE, LANE), jnp.float32)
        ph, pl_ = df_mul_acc(z, z, vh_ref[:], vl_ref[:], gh, gl)
        oh_ref[:] = ph
        ol_ref[:] = pl_

    tile = pl.BlockSpec(
        (LANE, LANE), lambda i, s: (i, 0), memory_space=pltpu.VMEM
    )
    wspec = pl.BlockSpec(
        (LANE, LANE), lambda i, s: (s[i], 0), memory_space=pltpu.VMEM
    )
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(n_tiles,),
        in_specs=[wspec, wspec, tile, tile, tile],
        out_specs=[tile, tile],
    )
    shp = jax.ShapeDtypeStruct((mat.vals.shape[0], LANE), jnp.float32)
    return pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[shp, shp],
        interpret=_interp(),
    )(mat.widx, xw_h, xw_l, mat.vals, vals_lo, mat.pidx)


def _reduce_runs_df(slab_h, slab_l, runs, mask=None):
    """Width-binned unit sums with TwoSum trees (XLA level — adds only)."""
    from ..ops.dfloat import two_sum

    def dadd(a, b):
        s, e = two_sum(a[0], b[0])
        return s, a[1] + b[1] + e

    def halve(parts):
        while len(parts) > 1:
            parts = [
                dadd(parts[i], parts[i + 1]) if i + 1 < len(parts)
                else parts[i]
                for i in range(0, len(parts), 2)
            ]
        return parts[0]

    if mask is not None:
        slab_h = slab_h * mask
        slab_l = slab_l * mask
    outs_h, outs_l = [], []
    for row0, n_groups, width, _g0 in runs:
        bh = jax.lax.slice_in_dim(slab_h, row0, row0 + n_groups * width)
        bl = jax.lax.slice_in_dim(slab_l, row0, row0 + n_groups * width)
        bh = bh.reshape(n_groups, width, LANE)
        bl = bl.reshape(n_groups, width, LANE)
        h, lo = halve([(bh[:, i, :], bl[:, i, :]) for i in range(width)])
        outs_h.append(h)
        outs_l.append(lo)
    return jnp.concatenate(outs_h, axis=0), jnp.concatenate(outs_l, axis=0)


def _routed_df_32(mdf: RoutedDF, xh, xl):
    """All-f32 body (traced under x32_trace_scope): the full general
    pipeline with every slab as an (hi, lo) pair."""
    mat = mdf.mat
    plan = mat.perm_products
    h1 = plan.h
    xw_h = _pack_xw(mat, xh)
    xw_l = _pack_xw(mat, xl)
    ph, plo = _gather_products_df(mat, mdf.vals_lo, xw_h, xw_l)
    ph = jnp.pad(ph, ((0, h1 - ph.shape[0]), (0, 0)))
    plo = jnp.pad(plo, ((0, h1 - plo.shape[0]), (0, 0)))
    slab_h = apply_permutation(plan, ph)
    slab_l = apply_permutation(plan, plo)
    sums = _reduce_runs_df(slab_h, slab_l, mat.runs)
    flats_h = [sums[0].reshape(-1)]
    flats_l = [sums[1].reshape(-1)]
    for perm_k, mask_k, runs in zip(mat.lvl_perms, mat.lvl_masks, mat.lvl_runs):
        prevs = []
        for flats in (flats_h, flats_l):
            prev2d = flats[-1].reshape(-1, LANE)
            if prev2d.shape[0] > perm_k.h:
                prev2d = prev2d[: perm_k.h]
            else:
                prev2d = jnp.pad(
                    prev2d, ((0, perm_k.h - prev2d.shape[0]), (0, 0))
                )
            prevs.append(apply_permutation(perm_k, prev2d))
        s_h, s_l = _reduce_runs_df(prevs[0], prevs[1], runs, mask=mask_k)
        flats_h.append(s_h.reshape(-1))
        flats_l.append(s_l.reshape(-1))
    dom_o = mat.perm_out.h * LANE
    ys = []
    for flats in (flats_h, flats_l):
        concat = jnp.concatenate(flats)
        concat = jnp.pad(concat, (0, dom_o - concat.shape[0]))
        y = apply_permutation(mat.perm_out, concat.reshape(-1, LANE))
        ys.append(y.reshape(-1)[: mat.shape[0]])
    return ys[0], ys[1]


def _df_dense_rowdot(hh, hl, xh, xl):
    """(n_h,) double-float row sums of a dense (hi, lo) block times an
    (hi, lo) vector — plain XLA f32 ops (TwoProduct + compensated
    pairwise tree), no Mosaic, no emulated f64."""
    from ..ops.dfloat import two_prod, two_sum

    ph, pe = two_prod(hh, xh[None, :])
    plo = pe + (hh * xl[None, :] + hl * xh[None, :])
    n = ph.shape[1]
    p2 = 1
    while p2 < n:
        p2 *= 2
    ph = jnp.pad(ph, ((0, 0), (0, p2 - n)))
    plo = jnp.pad(plo, ((0, 0), (0, p2 - n)))
    while p2 > 1:
        half = p2 // 2
        s, e = two_sum(ph[:, :half], ph[:, half:p2])
        plo = plo[:, :half] + plo[:, half:p2] + e
        ph = s
        p2 = half
    return ph[:, 0], plo[:, 0]


def routed_spmv_df(mdf: RoutedDF, x: jax.Array) -> jax.Array:
    """y = A @ x with f64 semantics on the f32 units (double-float)."""
    from ..ops.dfloat import df_combine64, split_f64_jnp, x32_trace_scope

    x64 = x.astype(jnp.float64)
    xh, xl = split_f64_jnp(x64)
    with x32_trace_scope():
        yh, yl = _routed_df_32(mdf, xh, xl)
        if mdf.hdense_hi is not None:
            pad = mdf.hdense_hi.shape[1] - xh.shape[0]
            rh, rl = _df_dense_rowdot(
                mdf.hdense_hi, mdf.hdense_lo,
                jnp.pad(xh, (0, pad)), jnp.pad(xl, (0, pad)),
            )
    y = df_combine64(yh, yl)
    if mdf.hdense_hi is not None:
        y = y.at[jnp.asarray(mdf.heavy_rows_df)].set(
            df_combine64(rh, rl).astype(y.dtype)
        )
    return y


def prepare_routed_df_auto(csr: CSRMatrix):
    """RoutedDF for one domain, RoutedChunks of RoutedDF otherwise (the
    chunk bounds come from the standard fit; each block df-prepares)."""
    try:
        return prepare_routed_df(csr)
    except RoutedError:
        base = prepare_routed_chunked(csr)  # reuse the fitted bounds
        chunks = []
        for i in range(len(base.bounds) - 1):
            r0, r1 = base.bounds[i], base.bounds[i + 1]
            chunks.append(prepare_routed_df(_sub_csr(csr, r0, r1)))
        return RoutedChunks(
            chunks=tuple(chunks),
            bounds=base.bounds,
            shape=csr.shape,
            nnz=csr.nnz,
        )


def routed_df_auto_spmv(mat, x: jax.Array) -> jax.Array:
    if isinstance(mat, RoutedChunks):
        return jnp.concatenate(
            [routed_spmv_df(c, x) for c in mat.chunks]
        )
    return routed_spmv_df(mat, x)
