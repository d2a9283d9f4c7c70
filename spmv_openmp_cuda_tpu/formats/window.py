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
  a proper edge coloring of the per-block (out-lane x source-residue)
  bipartite multigraph (at most one entry per (row, lane) and per
  (row, residue) — so the Q constraint holds with nothing left over),
  built by the Euler-split router on the graph padded to D-regular.
- MOD-8 INTERLEAVED REDUCE (the default packing): slot rows [0, k_c) are
  additionally constrained to hold only entries with gid % 8 == k % 8
  (gid = (row // 128) % G, the output row within the block). The coloring
  runs per residue class r on the class subgraph peeled to degree <= cap
  (k_c = 8*cap rows, row = r + 8*color); peeled-off excess entries land in
  an unconstrained overflow region [k_c, k_pad) colored globally. The
  reduce then needs only ceil(G/8) masked passes over the constrained
  rows — a (k_c/8, 8, 128) sublane fold puts each gid's partial sum at
  sublane gid % 8 for free — plus G masked passes over the (small)
  overflow rows, instead of G full-slab passes. cap=None disables the
  split (k_c = 0: the round-1 global pow2 coloring, kept for A/B and
  checkpoint back-compat).
- the block's x window (the 2*Wr + G chunk rows it can touch) is staged
  through sliding 8-row input blocks at index (i*G)//8 (the remainder is
  folded into Q host-side, so G is unrestricted); slot-row sources are
  assembled fully data-driven with one transposed take_along_axis per
  128-slot-row tile: S_T[residue, k] = window[Q[residue, k], residue] — so
  one compiled kernel serves every block (uniform grid, no per-block
  unrolled code).
- gather: one same-shape taa picks c % 128 within each assembled row;
  reduce: as above (measured ~0.35 ps/slot/masked-pass on v5e).

Eligibility: window radius (max |chunk(c) - block| over nnz) must keep the
staged window under 128 rows, and the padding factor under a cap; power-law
or global-random matrices are rejected (WindowError) and fall back to the
routed engine.
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

from ..config import LANE
from ..utils.pallas_env import interpret as _interp
from .matrix import CSRMatrix


class WindowError(ValueError):
    """Matrix not eligible (window too wide or padding too high)."""


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["vals", "sidx", "gid", "rsrc", "vals_lo"],
    meta_fields=[
        "shape", "nnz", "g", "k_pad", "wr", "nspecs", "nblocks", "k_c",
        "bps", "xdirect", "shared_w",
    ],
)
@dataclasses.dataclass
class WindowCSR:
    """Prepared windowed-gather format (see module docstring)."""

    vals: jax.Array  # (nblocks*k_pad, 128) dtype — slot values
    sidx: jax.Array  # (nblocks*k_pad, 128) int8 — c % 128 per slot
    gid: jax.Array  # (nblocks*k_pad, 128) int8 — rows < k_c: gid // 8
    # (gid % 8 == slot row % 8 by construction); rows >= k_c: full gid
    rsrc: jax.Array  # (nblocks*n_ktiles*128, 128) int8 — the Q map:
    # per slot-row tile, Q[residue, slot-row-in-tile] = window row that
    # slots of this row sourcing this residue read from
    vals_lo: jax.Array | None = None  # double-float mode: f32 low words of
    # the f64 slot values (ops/dfloat.py); the engine then carries x and
    # the accumulators as (hi, lo) pairs and returns f64.  (A prepare-time
    # Veltkamp presplit of this slab was A/B'd on TPU in round 4 and
    # measured NEUTRAL on every window proxy — assembly taa dominates the
    # df window kernel, not the velt flops — so the two extra streamed
    # planes were reverted.)
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    g: int = 8  # row groups per block (block = g*128 rows)
    k_pad: int = 8  # slot rows per block (padded)
    wr: int = 1  # window radius in 128-chunks
    nspecs: int = 2  # staged (G,128) window blocks per step
    nblocks: int = 1
    k_c: int = 0  # mod-8-constrained slot rows (0 = legacy global packing)
    bps: int = 1  # blocks evaluated per grid step (in-kernel sub-block loop)
    # single-block fast path: Q addresses x chunk-rows DIRECTLY (no wr
    # shift) so the kernel takes x as-is with no XLA pad/shift chain
    xdirect: bool = False
    # bps > 1 with the UNION window staged once per grid step (Q baked
    # union-relative): the per-sub-block restage + wT transpose disappear.
    # Needs the union span ((bps-1)*g + g + 2*wr chunk rows) under 128.
    shared_w: bool = False
    # (A round-5 packed-pair/batched-assembly family — bf16 residue pairs
    # in int32 window lanes, step-batched assembly tiles — was built,
    # A/B'd on TPU in five kernel/config variants and DELETED as a
    # measured loser on every window proxy; see doc/REPORT.md round-5
    # summary and scripts/sample_ab_window_r5*.log.)

    @property
    def n_ktiles(self) -> int:
        return -(-self.k_pad // LANE)


def _next_pow2(v: int) -> int:
    p = 1
    while p < v:
        p *= 2
    return p


#: packing row cap per block (VMEM residency of the slot slabs)
_K_CAP = 16 * LANE

#: cap ladder for the mod-8 class coloring (k_c = 8*sum(caps)); None =
#: legacy global packing. Tuples are MULTI-BAND peels (round 3): each
#: band colors the previous bands' leftover with its own pow2 Euler
#: split, giving k_c values between the pow2 points — fold slots are
#: ~g/ceil(g/8)x cheaper than overflow slots, so intermediate k_c often
#: wins where a pow2 jump would blow the per-step VMEM cap.
_CAP_LADDER = (
    None, 8, 16, 32, 64, 128,
    (8, 4), (16, 8), (16, 8, 4), (32, 16), (32, 16, 8),
    (64, 32), (64, 32, 16), (128, 32),
)


def _base_fields(csr: CSRMatrix):
    """g-independent per-nnz fields, hoisted so the (g, cap) auto scans
    don't recompute full-nnz divisions fifteen times (prepare-time win on
    multi-M-nnz matrices)."""
    rows = csr.row_ids().astype(np.int64)
    rq = rows // LANE  # 128-row chunk of the output row
    lane = rows % LANE
    cols = csr.indices.astype(np.int64)
    q = cols // LANE  # 128-element chunk of the column
    jres = cols % LANE
    return rq, lane, q, jres


def _scan_g(csr: CSRMatrix, g: int, base, want_hist: bool):
    """Per-g prepare scan: (wr, nspecs, nblocks, dl8, dr8). One fused
    threaded pass through the native backend when built (io/native.py),
    numpy passes otherwise. dl8/dr8 (the (nblocks, 8, 128) per-(block,
    gid%8) lane/residue degree histograms) are None when want_hist is
    False and the numpy path runs."""
    m, n = csr.shape
    nblocks = -(-m // (g * LANE))
    rq, lane, q, jres = base
    from ..io.native import window_scan_native

    res = window_scan_native(rq, lane, q, jres, g, nblocks)
    if res is not None:
        d_min, d_max, dl8, dr8 = res
    else:
        blk = rq // g
        d = q - blk * g  # chunk relative to block start
        d_min = int(d.min(initial=0))
        d_max = int(d.max(initial=0))
        if want_hist:
            cls = (rq % g) % 8
            key = (blk * 8 + cls) * LANE
            dl8 = np.bincount(
                key + lane, minlength=nblocks * 8 * LANE
            ).reshape(nblocks, 8, LANE)
            dr8 = np.bincount(
                key + jres, minlength=nblocks * 8 * LANE
            ).reshape(nblocks, 8, LANE)
        else:
            dl8 = dr8 = None
    wr = max(max(-d_min, 0), max(d_max - g + 1, 0), 1)
    s_w = g + 2 * wr
    # the x window is staged in 8-row blocks at index (i*g)//8 + j, with the
    # per-block remainder (i*g) % 8 folded into the Q data host-side — so g
    # is NOT restricted to sublane multiples
    nspecs = -(-(s_w + 7) // 8)
    if nspecs * 8 > LANE:
        raise WindowError(f"window span {s_w} chunk-rows exceeds the 128 cap")
    return wr, nspecs, nblocks, dl8, dr8


def _geometry(csr: CSRMatrix, g: int, base=None):
    """(wr, nspecs, nblocks) — window reach for group size g."""
    if base is None:
        base = _base_fields(csr)
    return _scan_g(csr, g, base, want_hist=False)[:3]


def _rank_in_group(keys: np.ndarray, minlength: int) -> np.ndarray:
    """rank[i] = #entries before i (stable order) with the same key.

    Keys here are blk * (8*LANE) + local with a non-decreasing blk prefix
    (CSR row order): the native O(n) threaded pass applies; the argsort
    fallback covers unbuilt-library runs."""
    from ..io.native import rank_in_group_native

    nblocks = minlength // (8 * LANE)
    if keys.size and nblocks > 0:
        out = rank_in_group_native(keys, 8 * LANE, nblocks)
        if out is not None:
            return out
    order = np.argsort(keys, kind="stable")
    sk = keys[order]
    n = sk.size
    ranks = np.empty(n, np.int64)
    if n:
        newrun = np.r_[True, sk[1:] != sk[:-1]]
        run_start = np.maximum.accumulate(np.where(newrun, np.arange(n), 0))
        ranks[order] = np.arange(n) - run_start
    return ranks


def _entry_fields(csr: CSRMatrix, g: int, base=None):
    rq, lane, q, jres = base if base is not None else _base_fields(csr)
    blk = rq // g
    gid = rq % g
    return q, blk, lane, jres, gid


def _cap_bands(cap) -> tuple:
    """Normalize a cap spec to a tuple of pow2 band caps: tuples pass
    through (validated), ints decompose by binary expansion (12 -> (8, 4))
    so any total is expressible as stacked Euler-colorable bands."""
    if isinstance(cap, tuple):
        for c in cap:
            if c <= 0 or c & (c - 1):
                raise WindowError(f"band caps must be powers of two: {cap}")
        return cap
    if cap <= 0:
        raise WindowError(f"cap must be positive: {cap}")
    return tuple(1 << b for b in range(cap.bit_length() - 1, -1, -1)
                 if cap >> b & 1)


def _peel_once(blk, lane, jres, cls, nblocks, cap, remaining):
    """One two-pass rank peel over the still-unassigned entries: keep mask
    (within `remaining`) whose per-(block, class) lane AND residue degrees
    are <= cap."""
    idx = np.where(remaining)[0]
    key_l = ((blk * 8 + cls) * LANE + lane)[idx]
    rl = _rank_in_group(key_l, nblocks * 8 * LANE)
    k1 = rl < cap
    key_r = ((blk * 8 + cls) * LANE + jres)[idx[k1]]
    rr = _rank_in_group(key_r, nblocks * 8 * LANE)
    kept = idx[k1][rr < cap]
    keep = np.zeros(remaining.shape[0], bool)
    keep[kept] = True
    return keep


def _overflow_v(blk, lane, jres, nblocks, of):
    """Overflow color budget: pow2 of the class-BLIND per-block degrees."""
    if not of.any():
        return 0
    dl = np.bincount((blk * LANE + lane)[of], minlength=nblocks * LANE)
    dr = np.bincount((blk * LANE + jres)[of], minlength=nblocks * LANE)
    return _next_pow2(max(int(dl.max()), int(dr.max()), 8))


def _class_split(blk, lane, jres, gid, nblocks, cap):
    """Rank peel(s) for the mod-8 class region + overflow V.

    cap may be a TUPLE of pow2 caps (multi-band peel, round 3): each band
    b peels the previous bands' leftover at cap[b] and is colored with its
    own cap[b]-color Euler split, occupying rows [8*sum(cap[:b]),
    8*sum(cap[:b+1])). Bands sidestep the pow2 quantization of a single
    cap — e.g. caps (16, 8, 4) give k_c = 224 where the single-cap ladder
    only offers 128 or 256 — and every band row joins the SAME cheap
    ceil(g/8)-pass fold (gid%8 == row%8 holds per band), converting
    overflow slots (g full masked passes each) into fold slots. Measured
    motivation: thermal2 g24/bps8's cap-16 config spent 83 us of 240 in
    overflow passes. Returns (band keep masks tuple, v)."""
    caps = _cap_bands(cap)
    cls = gid % 8
    remaining = np.ones(blk.shape[0], bool)
    bands = []
    for c in caps:
        keep = _peel_once(blk, lane, jres, cls, nblocks, c, remaining)
        bands.append(keep)
        remaining &= ~keep
    v = _overflow_v(blk, lane, jres, nblocks, remaining)
    return tuple(bands), v


#: measured v5e cost-model constants (ps per element / per step); the
#: calibration grid (scripts/calibrate_window.py + fit_window_model.py)
#: refits these.
#: refit 2026-08-19 (round 3) on 19 on-TPU points: the full fem
#: calibration grid (k_pad/g/bps/shared_w sweep, scripts/sample_ab_r3.log
#: stage "calwin"), the thermal2/fem/delaunay bps-ladder A/B points with
#: exact CPU-reconstructed geometry (stage "window"), AND the two
#: high-cap/low-v configs an intermediate 17-point fit had (wrongly)
#: picked — measured 25% slower than that fit predicted
#: (scripts/r3_validate_payload.py stage "winpick": thermal2 g24/b4
#: 276 us vs 214 predicted, fem g16/b2 83 vs 70). With those points the
#: nonneg least squares lands back on round-2's structure: the assembly
#: cost is TILE-QUANTIZED (~9.8 ps per n_ktiles*128*128 element,
#: per-slot term zero). Residuals: mean 8.7%, worst delaunay -42%
#: (sub-2us config: fixed kernel overhead outside the model). Ranking
#: (what selection needs) is correct on every measured ladder INCLUDING
#: the two mispicks: thermal2 g24/b8 < g40/b4 < autopick-b4 < g64/b1,
#: fem g40/b1 < g16/b4 < autopick-b2 < g32/b1.
_C_GATHER = 0.0
_C_TILE = 9.83  # per assembly-taa element (n_ktiles*128*128 per block)
_C_PASS = 0.53
_C_FOLD = 0.88  # per constrained slot per ceil(g/8)-pass (mask+fold)
_C_BLOCK = 331_000.0  # fixed per grid step (ps)
#: cost of the XLA x pad/shift chain (one zeros+dynamic_update_slice
#: dispatch feeding the kernel), NET of the in-kernel addressing loss of
#: the direct-x path that skips it: measured delaunay_n12 std 1.72 us vs
#: xdirect 1.29 us (round-3 A/B, reversing the round-2 single-point
#: measurement). xdirect is AUTO-ON for eligible single-block configs,
#: which therefore skip this charge in the cost scans.
_C_PADCHAIN = 430_000.0


def _cost_of(g: int, cap, k_c: int, v: int, nblocks: int, bps: int = 1) -> float:
    nh = -(-g // 8)
    k_pad = k_c + v
    n_ktiles = -(-k_pad // LANE)
    return (
        k_pad * LANE * nblocks * _C_GATHER
        + n_ktiles * LANE * LANE * nblocks * _C_TILE
        + k_c * LANE * nblocks * _C_FOLD * nh
        + v * LANE * nblocks * _C_PASS * g
        + (-(-nblocks // bps)) * _C_BLOCK
    )


def _cap_candidates(csr: CSRMatrix, g: int, base=None):
    """Feasible (cap, k_c, V) configs for group size g over the cap ladder,
    plus nblocks. V per cap is ESTIMATED from per-class degree excess
    (histograms only — the exact two-pass rank peel over every (g, cap)
    candidate costs an argsort per pair, ~minutes on 8M-nnz matrices);
    prepare_window re-peels the chosen config exactly."""
    if base is None:
        base = _base_fields(csr)
    _wr, _nspecs, nblocks, dl8, dr8 = _scan_g(csr, g, base, want_hist=True)
    d_glob = _next_pow2(
        max(int(dl8.sum(axis=1).max(initial=1)),
            int(dr8.sum(axis=1).max(initial=1)), 16)
    )
    cands = []
    for cap in _CAP_LADDER:
        if cap is None:
            k_c, v = 0, d_glob
        else:
            # multi-band tuples estimated at their summed cap (each band's
            # peel is 2-sided, so the true leftover can be slightly
            # larger; the exact re-peel in prepare corrects the shortlist)
            total = sum(cap) if isinstance(cap, tuple) else cap
            ofl = np.maximum(dl8 - total, 0).sum(axis=1)
            ofr = np.maximum(dr8 - total, 0).sum(axis=1)
            d_of = max(int(ofl.max(initial=0)), int(ofr.max(initial=0)))
            v = _next_pow2(max(d_of, 8)) if d_of else 0
            k_c = 8 * total
        if k_c + v > _K_CAP:
            continue
        cands.append((cap, k_c, v))
    if not cands:
        raise WindowError("no feasible packing under the row cap")
    return cands, nblocks


def _pad_ok(nnz: int, k_pad: int, nblocks: int, max_pad: float) -> bool:
    """prepare_window's slot-padding feasibility cap — the scans must
    apply it too, or the auto policy picks configs prepare rejects."""
    return nblocks * k_pad * LANE <= max_pad * nnz


def _feasible_costed(cands, nblocks, bps_list, nnz, max_pad, g):
    """The ONE feasibility + cost rule every scan shares: yields
    (cap, k_c, v, bps, cost) for configs within the per-step VMEM row cap
    and the slot-padding cap (the exact checks prepare_window enforces)."""
    for b in bps_list:
        for cap, k_c, v in cands:
            if (k_c + v) * b > _K_CAP:
                continue  # per-step VMEM residency of the slot slabs
            if not _pad_ok(nnz, k_c + v, nblocks, max_pad):
                continue
            yield cap, k_c, v, b, _cost_of(g, cap, k_c, v, nblocks, b)


def _scan_caps(
    csr: CSRMatrix, g: int, bps: int = 1, max_pad: float = 4.5, base=None
):
    """Best (cap, k_c, V, cost) for group size g at a given blocks-per-step."""
    cands, nblocks = _cap_candidates(csr, g, base)
    best = None
    for cap, k_c, v, _b, cost in _feasible_costed(
        cands, nblocks, (bps,), csr.nnz, max_pad, g
    ):
        if best is None or cost < best[3]:
            best = (cap, k_c, v, cost)
    if best is None:
        raise WindowError("no feasible packing under the row/padding caps")
    return best


def _pack_coloring(blk, lane, jres, nblocks, d_target):
    """Proper edge coloring of the (out-lane x source-residue) bipartite
    multigraph: slot row = color. A D-coloring puts at most one entry per
    (row, lane) and per (row, residue) in every block — so the
    per-(row, residue) single-window-row constraint holds with NOTHING
    evicted. The graph is padded to exactly D-regular with dummy edges and
    colored by the Euler-split router (ops/route.py, native C++ when
    built); D must be a power of two.
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


def _legacy_srow(blk, lane, jres, gid, nblocks, cap):
    """Slot-row assignment by the exact Euler edge coloring (the legacy
    prepare path): per-class band
    peels + pow2 colorings, overflow colored class-blind. Returns
    (srow, k_c, v)."""
    srow = np.empty(gid.shape[0], np.int64)
    if cap is None:
        dl = np.bincount(blk * LANE + lane, minlength=nblocks * LANE)
        dr = np.bincount(blk * LANE + jres, minlength=nblocks * LANE)
        k_c = 0
        v = _next_pow2(
            max(int(dl.max(initial=1)), int(dr.max(initial=1)), 16)
        )
        keep = np.zeros(gid.shape[0], bool)
    else:
        caps = _cap_bands(cap)
        bands, v = _class_split(blk, lane, jres, gid, nblocks, caps)
        k_c = 8 * sum(caps)
        cls = gid % 8
        keep = np.zeros(gid.shape[0], bool)
        base_row = 0
        for cap_b, keep_b in zip(caps, bands):
            for r in range(8):
                sel = keep_b & (cls == r)
                if not sel.any():
                    continue
                colors = _pack_coloring(
                    blk[sel], lane[sel], jres[sel], nblocks, cap_b
                )
                srow[sel] = base_row + r + 8 * colors
            keep |= keep_b
            base_row += 8 * cap_b
    if v:
        of = ~keep
        colors = _pack_coloring(blk[of], lane[of], jres[of], nblocks, v)
        srow[of] = k_c + colors
    return srow, k_c, v


def prepare_window(
    csr: CSRMatrix, g: int = 8, dtype=jnp.float32, vals_dtype=None,
    max_pad: float = 4.5, cap="auto", bps: int = 1, xdirect: bool = False,
    df: bool = False, base=None, shared_w: bool | None = None,
) -> WindowCSR:
    if vals_dtype is None:
        vals_dtype = dtype
    m, n = csr.shape
    if csr.nnz == 0 or m == 0:
        raise WindowError("empty matrix")
    assert 2 <= g <= 64, "g must be in [2, 64] (output rows per block)"
    if bps > 1 and g % 8:
        raise WindowError("bps > 1 requires g % 8 == 0 (uniform staging)")
    if base is None:
        base = _base_fields(csr)
    wr, nspecs, nblocks = _geometry(csr, g, base)
    # union staging: one window stage + transpose per grid step instead of
    # per sub-block; auto-on when the union span fits the 128-row window
    ns_tot = (bps - 1) * (g // 8) + nspecs if bps > 1 else nspecs
    if shared_w is None:
        shared_w = bps > 1 and ns_tot * 8 <= LANE
    elif shared_w:
        if bps <= 1:
            shared_w = False
        elif ns_tot * 8 > LANE:
            raise WindowError(
                f"shared_w union span {ns_tot * 8} rows exceeds the 128 cap"
            )
    q, blk, lane, jres, gid = _entry_fields(csr, g, base)

    if cap == "auto":
        # the scan must see the caller's padding budget and per-step bps
        # residency, or it filters configs prepare would accept (and vice
        # versa)
        cap = _scan_caps(csr, g, bps=bps, max_pad=max_pad, base=base)[0]

    srow, k_c, v = _legacy_srow(blk, lane, jres, gid, nblocks, cap)

    k_pad = k_c + v
    n_ktiles = -(-k_pad // LANE)
    if nblocks * k_pad * LANE > max_pad * csr.nnz:
        raise WindowError(
            f"padding {nblocks * k_pad * LANE / csr.nnz:.1f}x "
            f"exceeds {max_pad}x cap"
        )
    if k_pad > _K_CAP:
        raise WindowError(f"{k_pad} slot rows exceed the row cap")
    if k_pad * bps > _K_CAP:
        raise WindowError(
            f"bps={bps} x {k_pad} slot rows exceed the per-step VMEM cap"
        )

    if xdirect:
        if nblocks != 1 or -(-n // LANE) > LANE:
            raise WindowError("xdirect needs a single block and x <= 128 "
                              "chunk-rows")
        bps = 1
        shared_w = False

    # slot slabs + Q map bake. Per-cell semantics (numpy path below; the
    # native fill fuses it all into one threaded pass):
    # - vals/sidx at (blk*k_pad + srow, lane);
    # - gslab: constrained rows store gid // 8 (the fold pass id), overflow
    #   rows the full gid (their masked loop compares against gid);
    # - rsrc (the Q map): per slot-row tile,
    #   Q[residue, slot-row-in-tile] = window row (unset pairs read window
    #   row 0; their slots have vals == 0). The window row is dq plus the
    #   per-block staging remainder (window starts at x2d row blk*g, staged
    #   from 8-row block (blk*g)//8); xdirect addresses x chunk-rows
    #   directly (== q); shared_w is UNION-relative — sub-block b of a step
    #   sees its window g*b chunk rows into the union stage (g % 8 == 0
    #   makes the step's staging remainder exactly zero).
    vals = np.zeros((nblocks * k_pad, LANE), dtype=np.float64)
    sidx = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    gslab = np.zeros((nblocks * k_pad, LANE), dtype=np.int8)
    rsrc = np.zeros((nblocks * n_ktiles * LANE, LANE), dtype=np.int8)
    from ..io.native import window_fill_native

    mode = 1 if xdirect else 2 if shared_w else 0
    if not window_fill_native(
        base[0], lane, q, jres, srow, csr.data, g, k_pad, k_c, n_ktiles,
        wr, bps, mode, vals, sidx, gslab, rsrc,
    ):
        dq = q - blk * g + wr  # window row in [0, nspecs*g)
        slot_row = blk * k_pad + srow
        vals[slot_row, lane] = csr.data
        sidx[slot_row, lane] = jres.astype(np.int8)
        gslab[slot_row, lane] = np.where(srow < k_c, gid // 8, gid).astype(
            np.int8
        )
        t_of = srow // LANE
        jj_in = srow % LANE
        if xdirect:
            dq_staged = q
        elif shared_w:
            dq_staged = dq + (blk % bps) * g
        else:
            dq_staged = dq + (blk * g) % 8
        rsrc[(blk * n_ktiles + t_of) * LANE + jres, jj_in] = dq_staged.astype(
            np.int8
        )

    nblocks_pad = -(-nblocks // bps) * bps
    if nblocks_pad > nblocks:
        # trailing all-zero blocks fill the last grid step; their outputs
        # fall past row m and are sliced off
        def _ext(a, rows):
            return np.concatenate(
                [a, np.zeros(((nblocks_pad - nblocks) * rows, LANE), a.dtype)]
            )

        vals = _ext(vals, k_pad)
        sidx = _ext(sidx, k_pad)
        gslab = _ext(gslab, k_pad)
        rsrc = _ext(rsrc, n_ktiles * LANE)

    if df:
        # double-float slot values: (hi, lo) f32 pair of the f64 slab
        from ..ops.dfloat import split_f64

        vhi, vlo = split_f64(vals)
        vals_j, vals_lo_j = jnp.asarray(vhi), jnp.asarray(vlo)
    else:
        vals_j, vals_lo_j = jnp.asarray(vals, dtype=vals_dtype), None

    return WindowCSR(
        vals=vals_j,
        sidx=jnp.asarray(sidx),
        gid=jnp.asarray(gslab),
        rsrc=jnp.asarray(rsrc),
        vals_lo=vals_lo_j,
        shape=(m, n),
        nnz=csr.nnz,
        g=g,
        k_pad=k_pad,
        wr=wr,
        nspecs=nspecs,
        nblocks=nblocks_pad,
        k_c=k_c,
        bps=bps,
        xdirect=xdirect,
        shared_w=shared_w,
    )


#: candidate group sizes for the auto scan
_G_LADDER = (4, 6, 8, 10, 12, 14, 16, 20, 24, 28, 32, 40, 48, 56, 64)

#: blocks-per-step candidates for the joint auto scan (requires g % 8 == 0)
_BPS_LADDER = (1, 2, 4, 8)

#: default bps policy until the on-TPU A/B lands: a single block per grid
#: step ("1"); flip to "auto" (joint (g, cap, bps) cost scan) on a win.
#: SPMV_WINDOW_BPS overrides: an integer forces that bps, "auto" forces
#: the joint scan.
#: "auto" since the 2026-08-19 refit: the tile-quantized cost model now
#: predicts the measured bps ladder within ~1.5% on thermal2 (bps>1
#: amortizes the 0.43 us step cost AND raises the per-tile taa rate) and
#: correctly keeps fem/delaunay at bps=1.
_BPS_POLICY_DEFAULT = "auto"


def _bps_policy() -> str:
    import os

    return os.environ.get("SPMV_WINDOW_BPS", "") or _BPS_POLICY_DEFAULT


def _bps_options(g: int, nblocks: int, policy: str):
    if policy != "auto":
        return (int(policy),) if int(policy) == 1 or g % 8 == 0 else (1,)
    if g % 8:
        return (1,)
    return tuple(b for b in _BPS_LADDER if b == 1 or b <= nblocks)


def _xdirect_eligible(csr: CSRMatrix, nblocks: int) -> bool:
    return nblocks == 1 and -(-csr.shape[1] // LANE) <= LANE


def window_cost(
    csr: CSRMatrix, g: int, bps: int | None = None, max_pad: float = 4.5,
    base=None,
) -> float:
    """Predicted SpMV cost in ps (v5e-measured constants), minimized over
    the packing-cap ladder (and the bps ladder when the policy is auto).
    Multi-block configs carry the x pad-chain cost xdirect configs skip.
    Configs prepare_window would reject (padding over max_pad) are skipped
    so the selection policy and prepare agree on feasibility."""
    if bps is not None:
        return _scan_caps(csr, g, bps, max_pad, base)[3]
    cands, nblocks = _cap_candidates(csr, g, base)
    # xdirect is auto-on for eligible single-block configs (round-3 A/B:
    # 1.29 us vs 1.72 us on delaunay), so exactly those skip the pad-chain
    # charge — consistent with what prepare_window_auto would run
    extra = 0.0 if _xdirect_eligible(csr, nblocks) else _C_PADCHAIN
    best = None
    for *_cfg, cost in _feasible_costed(
        cands, nblocks, _bps_options(g, nblocks, _bps_policy()),
        csr.nnz, max_pad, g,
    ):
        if best is None or cost + extra < best:
            best = cost + extra
    if best is None:
        raise WindowError("no feasible packing under the row/padding caps")
    return best


def window_cost_scan(csr: CSRMatrix, max_pad: float = 4.5) -> float:
    """Best predicted cost over the whole g ladder, sharing one per-nnz
    field pass (the format-selection entry point — a fresh _base_fields per
    g costs tens of seconds on multi-M-nnz matrices)."""
    base = _base_fields(csr)
    best = None
    for g in _G_LADDER:
        try:
            cost = window_cost(csr, g, max_pad=max_pad, base=base)
        except WindowError:
            continue
        if best is None or cost < best:
            best = cost
    if best is None:
        raise WindowError("no feasible window configuration")
    return best


def prepare_window_auto(
    csr: CSRMatrix, dtype=jnp.float32, vals_dtype=None, max_pad: float = 4.5,
    bps: int | None = None, xdirect: bool | None = None, df: bool = False,
) -> WindowCSR:
    """Pick group size g, packing cap and blocks-per-step by the
    exact-slots cost model. bps=None follows the policy (SPMV_WINDOW_BPS
    env override; see _BPS_POLICY_DEFAULT); an explicit bps pins it and
    the scan only picks (g, cap)."""
    policy = str(bps) if bps is not None else _bps_policy()
    base = _base_fields(csr)
    by_g = {}
    for g in _G_LADDER:
        try:
            cands, nblocks = _cap_candidates(csr, g, base)
        except WindowError:
            continue
        eligible = _xdirect_eligible(csr, nblocks)
        if xdirect is True and not eligible:
            continue  # pinned xdirect: only single-block configs qualify
        # eligible configs run xdirect (auto-on unless pinned off) and
        # skip the x pad/shift chain
        extra = (
            _C_PADCHAIN if (xdirect is False or not eligible) else 0.0
        )
        for cap, _k_c, _v, b, cost in _feasible_costed(
            cands, nblocks, _bps_options(g, nblocks, policy),
            csr.nnz, max_pad, g,
        ):
            if g not in by_g or cost + extra < by_g[g][1]:
                by_g[g] = (g, cost + extra, cap, b, eligible)
    if not by_g:
        raise WindowError("no feasible window configuration")
    # The scan's V (so k_pad, so the tile-quantized assembly cost) is
    # ESTIMATED from per-class degree histograms, and the estimate is
    # optimistic at small g (same-lane collisions inflate the exact rank
    # peel): measured on fem_3d, est v=64 vs exact 256 flipped the pick
    # from the 113.8 GF/s config to a 60.9 one.  Exact-prepare the top
    # _AUTO_SHORTLIST distinct-g candidates and decide on their EXACT
    # geometry (native threaded prep makes each ~seconds).
    short = sorted(by_g.values(), key=lambda t: t[1])[:_AUTO_SHORTLIST]
    best = (None, float("inf"))
    for g, est, cap, bps_pick, eligible in short:
        if est >= best[1]:
            # sound prune: the histogram V estimate is OPTIMISTIC (exact
            # peel only ever inflates v), so est >= a candidate's already
            # EXACT cost means this one cannot win — skip its prepare
            continue
        mat = _try_prepare_auto(
            csr, g, cap, bps_pick, dtype, vals_dtype, max_pad,
            eligible if xdirect is None else xdirect,
            df, base, bps_auto=policy == "auto",
        )
        if mat is None:
            continue
        exact = _cost_of(
            g, cap, mat.k_c, mat.k_pad - mat.k_c, mat.nblocks, mat.bps
        )
        if exact < best[1]:
            best = (mat, exact)
    if best[0] is None:
        raise WindowError("no feasible window configuration")
    return best[0]


#: exact-prepare depth of the auto scan: the estimated-V misranking that
#: motivated the shortlist (see above) showed a >2-deep flip on fem_3d,
#: and the multi-band ladder (whose histogram V estimate is optimistic at
#: small g — band peels are 2-sided) pushed fem's true winner (g40) to
#: estimated rank 5. Native threaded prep keeps 5 exact prepares at
#: seconds each.
_AUTO_SHORTLIST = 5


def _try_prepare_auto(
    csr, g, cap, bps_pick, dtype, vals_dtype, max_pad, xdirect, df, base,
    bps_auto=True,
):
    # xdirect arrives resolved: prepare_window_auto passes the per-g
    # eligibility when the caller didn't pin it. Round-3 on-TPU A/B
    # (delaunay_n12, single-block): xdirect 1.29 us vs standard staging
    # 1.72 us — the direct-x path saves the XLA pad/shift chain and wins
    # net of its un-shifted window addressing, so it is AUTO-ON where
    # eligible. (Reverses the round-2 single-point measurement of 1.87 vs
    # 1.66; the kernel's staging changed in between, and the round-3 pair
    # compiled clean at 5-6 s each.)
    # the scan's V (and so k_pad) is ESTIMATED from degree histograms;
    # prepare re-peels exactly and can land just over the per-step VMEM
    # cap at the chosen bps — halve bps until it fits (bps=1 always
    # passes the same caps the scan enforced). Only when the AUTO policy
    # chose bps: a caller-pinned bps (arg or SPMV_WINDOW_BPS) must not
    # silently degrade — its feasibility errors propagate.
    b = 1 if xdirect else bps_pick
    while True:
        try:
            return prepare_window(
                csr, g=g, dtype=dtype, vals_dtype=vals_dtype,
                max_pad=max_pad, cap=cap, bps=b, xdirect=xdirect, df=df,
                base=base,
            )
        except WindowError:
            if not bps_auto:
                raise
            if b == 1:
                return None  # shortlist entry infeasible at exact peel
            b = max(b // 2, 1)


def _df_add(ah, al, bh, bl):
    from ..ops.dfloat import two_sum

    s, e = two_sum(ah, bh)
    return s, al + bl + e


def _halve_pairs(parts, add):
    while len(parts) > 1:
        parts = [
            add(parts[i], parts[i + 1]) if i + 1 < len(parts) else parts[i]
            for i in range(0, len(parts), 2)
        ]
    return parts[0]


def _gather_reduce_block(
    w_ref, vals_ref, sidx_ref, gid_ref, rsrc_ref, src_ref, o_ref,
    *, kb, rb, ob, g, k_pad, k_c,
    wl_ref=None, vlo_ref=None, srcl_ref=None, olo_ref=None,
    wt=None, wtl=None,
):
    """Gather + reduce for ONE block whose x window is already staged in
    w_ref; kb/rb/ob offset into the slab/rsrc/output refs (sub-block
    position within a multi-block grid step).

    Double-float mode (wl_ref/vlo_ref/srcl_ref/olo_ref given): the x
    window, slot values and accumulators are (hi, lo) f32 pairs; products
    use Dekker TwoProduct, every reduction add is a Knuth TwoSum
    (ops/dfloat.py) — f64 semantics on the f32 VPU.

    wt (and wtl in df mode) pass an ALREADY-TRANSPOSED window — the
    shared_w path transposes the union stage once per grid step and every
    sub-block reuses it (its Q is baked union-relative)."""
    df = wl_ref is not None or wtl is not None
    n_ktiles = -(-k_pad // LANE)
    nh = -(-g // 8)
    g_pad = nh * 8
    acc_dtype = jnp.float32
    if wt is None:
        wt = w_ref[:].T  # (residue, window row)
        wtl = wl_ref[:].T if df else None
    for t in range(n_ktiles):
        qv = rsrc_ref[rb + t * LANE : rb + (t + 1) * LANE, :].astype(
            jnp.int32
        )
        # st[residue, k] = window[Q[residue, k], residue]
        st = jnp.take_along_axis(wt, qv, axis=1)
        src_ref[t * LANE : (t + 1) * LANE, :] = st.T
        if df:
            stl = jnp.take_along_axis(wtl, qv, axis=1)
            srcl_ref[t * LANE : (t + 1) * LANE, :] = stl.T
    sv = sidx_ref[kb : kb + k_pad, :].astype(jnp.int32)
    gathered = jnp.take_along_axis(src_ref[0:k_pad, :], sv, axis=1)
    vh = vals_ref[kb : kb + k_pad, :].astype(acc_dtype)
    if df:
        from ..ops.dfloat import two_prod

        g_lo = jnp.take_along_axis(srcl_ref[0:k_pad, :], sv, axis=1)
        vl = vlo_ref[kb : kb + k_pad, :]
        ph, pe = two_prod(vh, gathered)
        prod = ph
        prod_lo = pe + (vh * g_lo + vl * gathered)
    else:
        prod = vh * gathered
        prod_lo = None
    gv = gid_ref[kb : kb + k_pad, :].astype(jnp.int32)

    def masked(h_sel, lo, hi):
        m = jnp.where(gv[lo:hi] == h_sel, prod[lo:hi], 0.0)
        if df:
            return m, jnp.where(gv[lo:hi] == h_sel, prod_lo[lo:hi], 0.0)
        return (m,)

    add = (
        (lambda a, b: _df_add(a[0], a[1], b[0], b[1]))
        if df
        else (lambda a, b: (a[0] + b[0],))
    )

    def rows_of(t8, r):
        return tuple(v[r * 8 : (r + 1) * 8] for v in t8)

    if k_c:
        # mod-8 fold: sublane s of pass h accumulates gid 8h + s
        tiles = []
        for h in range(nh):
            m8 = masked(h, 0, k_c)
            tiles.append(
                _halve_pairs([rows_of(m8, i) for i in range(k_c // 8)], add)
            )
        out = tuple(
            jnp.concatenate([t[j] for t in tiles], axis=0)
            for j in range(2 if df else 1)
        )
    else:
        out = tuple(
            jnp.zeros((g_pad, LANE), acc_dtype) for _ in range(2 if df else 1)
        )
    if k_pad > k_c:
        v_rows = k_pad - k_c
        grows = []
        for gg in range(g):
            mv = masked(gg, k_c, k_pad)
            if df:
                # error-compensated tree over the overflow rows: halve
                # 8-row chunks, then fold the final 8 sublanes pairwise
                t8 = _halve_pairs(
                    [rows_of(mv, i) for i in range(v_rows // 8)], add
                )
                srow = _halve_pairs(
                    [tuple(v[j : j + 1] for v in t8) for j in range(8)], add
                )
                grows.append(srow)
            else:
                grows.append(
                    (jnp.sum(mv[0], axis=0, keepdims=True),)
                )
        if g_pad > g:
            grows.append(
                tuple(
                    jnp.zeros((g_pad - g, LANE), acc_dtype)
                    for _ in range(2 if df else 1)
                )
            )
        ovf = tuple(
            jnp.concatenate([r[j] for r in grows], axis=0)
            for j in range(2 if df else 1)
        )
        out = add(out, ovf) if df else (out[0] + ovf[0],)
    o_ref[ob : ob + g_pad, :] = out[0]
    if df:
        olo_ref[ob : ob + g_pad, :] = out[1]


def window_kernel_call(
    vals, sidx, gid, rsrc, xp2, *, g, k_pad, nspecs, nblocks, k_c=0, bps=1,
    vals_lo=None, xp2_lo=None, shared_w=False,
):
    """The fused gather+reduce kernel over a prepared slot-array set and an
    ALREADY-PADDED x window stack (xp2 row wr = x row 0). Exposed separately
    so the row-sharded multi-chip path (parallel/sharded.py) can run it on
    local block ranges with halo-exchanged x.

    bps > 1 evaluates that many consecutive blocks per grid step with an
    in-kernel sub-block loop (requires g % 8 == 0 and bps | nblocks): the
    per-step pipeline overhead amortizes and the taa passes run at the
    bigger-block VPU rate.

    vals_lo/xp2_lo switch on the double-float mode: returns the
    (hi, lo) output pair instead of a single slab.

    shared_w stages the UNION window of the step's bps sub-blocks once and
    transposes it once; every sub-block gathers from the shared transposed
    window (its Q was baked union-relative by prepare)."""
    assert nblocks % bps == 0, "prepare pads nblocks to a bps multiple"
    assert bps == 1 or g % 8 == 0
    df = vals_lo is not None
    n_ktiles = -(-k_pad // LANE)
    nh = -(-g // 8)
    g_pad = nh * 8
    acc_dtype = jnp.float32
    ns_tot = (bps - 1) * (g // 8) + nspecs if bps > 1 else nspecs
    assert not shared_w or (bps > 1 and ns_tot * 8 <= LANE)

    def kernel(*refs):
        refs_l = list(refs)
        xrefs = [refs_l.pop(0) for _ in range(ns_tot)]
        xlrefs = [refs_l.pop(0) for _ in range(ns_tot)] if df else None
        vals_ref = refs_l.pop(0)
        vlo_ref = refs_l.pop(0) if df else None
        sidx_ref, gid_ref, rsrc_ref, o_ref = refs_l[:4]
        refs_l = refs_l[4:]
        olo_ref = refs_l.pop(0) if df else None
        w_ref = refs_l.pop(0)
        wl_ref = refs_l.pop(0) if df else None
        src_ref = refs_l.pop(0)
        srcl_ref = refs_l.pop(0) if df else None
        n_stage = ns_tot if shared_w else nspecs
        if n_stage * 8 < LANE:
            z = jnp.zeros((LANE - n_stage * 8, LANE), acc_dtype)
            w_ref[n_stage * 8 :, :] = z
            if df:
                wl_ref[n_stage * 8 :, :] = z
        wt_shared = wtl_shared = None
        if shared_w:
            for j in range(ns_tot):
                w_ref[j * 8 : (j + 1) * 8, :] = xrefs[j][:]
                if df:
                    wl_ref[j * 8 : (j + 1) * 8, :] = xlrefs[j][:]
            wt_shared = w_ref[:].T
            if df:
                wtl_shared = wl_ref[:].T
        for b in range(bps):
            if not shared_w:
                j0 = b * (g // 8) if bps > 1 else 0
                for j in range(nspecs):
                    w_ref[j * 8 : (j + 1) * 8, :] = xrefs[j0 + j][:]
                    if df:
                        wl_ref[j * 8 : (j + 1) * 8, :] = xlrefs[j0 + j][:]
            _gather_reduce_block(
                w_ref, vals_ref, sidx_ref, gid_ref, rsrc_ref, src_ref,
                o_ref, kb=b * k_pad, rb=b * n_ktiles * LANE, ob=b * g_pad,
                g=g, k_pad=k_pad, k_c=k_c,
                wl_ref=wl_ref, vlo_ref=vlo_ref, srcl_ref=srcl_ref,
                olo_ref=olo_ref, wt=wt_shared, wtl=wtl_shared,
            )

    def xspec_list():
        return [
            pl.BlockSpec(
                (8, LANE),
                functools.partial(lambda j, i: ((i * bps * g) // 8 + j, 0), j),
            )
            for j in range(ns_tot)
        ]

    kspec = pl.BlockSpec(
        (bps * k_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    ospec = pl.BlockSpec(
        (bps * g_pad, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM
    )
    oshape = jax.ShapeDtypeStruct((nblocks * g_pad, LANE), acc_dtype)
    in_specs = xspec_list() + ([] if not df else xspec_list()) + [kspec] * (
        3 + df
    ) + [
        pl.BlockSpec(
            (bps * n_ktiles * LANE, LANE),
            lambda i: (i, 0),
            memory_space=pltpu.VMEM,
        )
    ]
    scratch = [
        pltpu.VMEM((LANE, LANE), acc_dtype),
        pltpu.VMEM((n_ktiles * LANE, LANE), acc_dtype),
    ]
    if df:
        scratch = [scratch[0], scratch[0], scratch[1], scratch[1]]
    args = [xp2] * ns_tot
    if df:
        args += [xp2_lo] * ns_tot
    args += [vals] + ([vals_lo] if df else []) + [sidx, gid, rsrc]
    out = pl.pallas_call(
        kernel,
        grid=(nblocks // bps,),
        in_specs=in_specs,
        out_specs=[ospec, ospec] if df else ospec,
        out_shape=[oshape, oshape] if df else oshape,
        scratch_shapes=scratch,
        interpret=_interp(),
    )(*args)
    return out


def _window_single_call(
    vals, sidx, gid, rsrc, x2d, *, g, k_pad, k_c, vals_lo=None, x2d_lo=None
):
    """Whole-matrix single-block kernel (xdirect): x arrives as raw
    (xrows8, 128) chunk-rows with NO leading wr pad — Q was baked with
    direct x rows — so the caller needs no XLA pad/shift chain at all.
    vals_lo/x2d_lo = double-float mode (returns the (hi, lo) pair)."""
    df = vals_lo is not None
    n_ktiles = -(-k_pad // LANE)
    g_pad = -(-g // 8) * 8
    acc_dtype = jnp.float32
    xrows8 = x2d.shape[0]

    def kernel(*refs):
        refs_l = list(refs)
        x_ref = refs_l.pop(0)
        xl_ref = refs_l.pop(0) if df else None
        vals_ref = refs_l.pop(0)
        vlo_ref = refs_l.pop(0) if df else None
        sidx_ref, gid_ref, rsrc_ref, o_ref = refs_l[:4]
        refs_l = refs_l[4:]
        olo_ref = refs_l.pop(0) if df else None
        w_ref = refs_l.pop(0)
        wl_ref = refs_l.pop(0) if df else None
        src_ref = refs_l.pop(0)
        srcl_ref = refs_l.pop(0) if df else None
        w_ref[0:xrows8, :] = x_ref[:].astype(acc_dtype)
        if df:
            wl_ref[0:xrows8, :] = xl_ref[:].astype(acc_dtype)
        if xrows8 < LANE:
            z = jnp.zeros((LANE - xrows8, LANE), acc_dtype)
            w_ref[xrows8:, :] = z
            if df:
                wl_ref[xrows8:, :] = z
        _gather_reduce_block(
            w_ref, vals_ref, sidx_ref, gid_ref, rsrc_ref, src_ref, o_ref,
            kb=0, rb=0, ob=0, g=g, k_pad=k_pad, k_c=k_c,
            wl_ref=wl_ref, vlo_ref=vlo_ref, srcl_ref=srcl_ref,
            olo_ref=olo_ref,
        )

    oshape = jax.ShapeDtypeStruct((g_pad, LANE), acc_dtype)
    scratch = [
        pltpu.VMEM((LANE, LANE), acc_dtype),
        pltpu.VMEM((n_ktiles * LANE, LANE), acc_dtype),
    ]
    if df:
        scratch = [scratch[0], scratch[0], scratch[1], scratch[1]]
    args = [x2d] + ([x2d_lo] if df else []) + [vals] + (
        [vals_lo] if df else []
    ) + [sidx, gid, rsrc]
    return pl.pallas_call(
        kernel,
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=(
            [pl.BlockSpec(memory_space=pltpu.VMEM)] * 2
            if df
            else pl.BlockSpec(memory_space=pltpu.VMEM)
        ),
        out_shape=[oshape, oshape] if df else oshape,
        scratch_shapes=scratch,
        interpret=_interp(),
    )(*args)


def window_x_rows(nblocks: int, g: int, nspecs: int) -> int:
    """Rows of the padded x window stack the kernel expects."""
    return -(-((nblocks - 1) * g) // 8) * 8 + nspecs * 8 + 8


def window_spmv(mat: WindowCSR, x: jax.Array) -> jax.Array:
    """y = A @ x, one fused gather+reduce kernel, grid over row blocks.

    Double-float formats (mat.vals_lo set) take x in f64, run the whole
    pipeline as (hi, lo) f32 pairs and return f64 (ops/dfloat.py)."""
    m, n = mat.shape
    g, k_pad, wr, nspecs = mat.g, mat.k_pad, mat.wr, mat.nspecs
    nblocks = mat.nblocks
    g_pad = max(-(-g // 8) * 8, 8)
    acc_dtype = jnp.float32
    df = mat.vals_lo is not None
    if df:
        from ..ops.dfloat import df_combine64, split_f64_jnp

        xh, xl = split_f64_jnp(x.astype(jnp.float64))
    else:
        xh, xl = x, None

    def _finish(out):
        # 32-bit reshapes here; the single f64 combine happens in the
        # caller, outside the x32 trace scope.
        outs = out if df else (out,)
        ys = []
        for o in outs:
            if g_pad > g and not mat.xdirect:
                o = o.reshape(nblocks, g_pad, LANE)[:, :g, :]
            elif g_pad > g:
                o = o[:g]
            ys.append(o.reshape(-1)[:m])
        return ys

    from ..ops.dfloat import x32_trace_scope

    with x32_trace_scope():
        ys = _window_spmv_32(mat, xh, xl, _finish, acc_dtype)
    return df_combine64(ys[0], ys[1]) if df else ys[0]


def _window_spmv_32(mat, xh, xl, _finish, acc_dtype):
    """The all-32-bit body of window_spmv (traced under x32_trace_scope)."""
    m, n = mat.shape
    g, k_pad, wr, nspecs = mat.g, mat.k_pad, mat.wr, mat.nspecs
    nblocks = mat.nblocks
    df = mat.vals_lo is not None

    if mat.xdirect:
        xrows8 = -(-n // (8 * LANE)) * 8

        def _xd(xs):
            xf = xs.astype(acc_dtype)
            if n < xrows8 * LANE:
                xf = jnp.pad(xf, (0, xrows8 * LANE - n))
            return xf.reshape(xrows8, LANE)

        out = _window_single_call(
            mat.vals, mat.sidx, mat.gid, mat.rsrc, _xd(xh),
            g=g, k_pad=k_pad, k_c=mat.k_c,
            vals_lo=mat.vals_lo, x2d_lo=_xd(xl) if df else None,
        )
        return _finish(out)

    # padded x: wr leading zero chunk-rows; tail covers the last window
    total_rows = window_x_rows(nblocks, g, nspecs)

    def _padded(xs):
        xp = jnp.zeros(total_rows * LANE, dtype=acc_dtype)
        xp = jax.lax.dynamic_update_slice(
            xp,
            xs[: (total_rows * LANE - wr * LANE)].astype(acc_dtype),
            (wr * LANE,),
        )
        return xp.reshape(total_rows, LANE)

    out = window_kernel_call(
        mat.vals, mat.sidx, mat.gid, mat.rsrc, _padded(xh),
        g=g, k_pad=k_pad, nspecs=nspecs, nblocks=nblocks, k_c=mat.k_c,
        bps=mat.bps, shared_w=mat.shared_w,
        vals_lo=mat.vals_lo, xp2_lo=_padded(xl) if df else None,
    )
    return _finish(out)
