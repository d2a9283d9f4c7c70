"""Static permutation routing for TPU: arbitrary bijections of (H, 128)
slot arrays at VPU speed.

Why this exists: Mosaic's only fast data-movement primitives are (a)
same-shape `take_along_axis(axis=1)` — each sublane-row permutes/gathers
freely among its 128 lanes (~225-300 Gelem/s in single-block kernels) — and (b) 128x128 tile transposes
(~300 Gelem/s). XLA's general gather runs at ~1 GB/s, unusable for routing
nnz-scale data. This module decomposes ANY static bijection of an
(H = T*128, 128) slot array (T a power of two <= 128) into stages built only
from those primitives:

  R1 (lane perm) . W1 (in-tile sublane perm) . SW (row-grid swap)
  . W2 . SW^-1 . W3 . R3 (lane perm)

- R-stages are per-row lane permutations (one taa each).
- W-stages are per-lane sublane permutations within 128-row tiles,
  implemented as transpose . taa . transpose per tile.
- SW is the row-grid transpose (t*128+s -> s*T+t), a lane-preserving
  reshape/swapaxes handled by XLA between kernels.

Routing (host, all static): by König's theorem a 128-regular bipartite
multigraph is 128-edge-colorable; the color picked for each element is the
"middle lane" it rides through the column stage (classic 3-stage Clos
rearrangeability). The same theorem routes each lane's tile-to-tile movement
through a "middle sublane". Colorings are computed by recursive Euler
splitting, vectorized with numpy pointer jumping (no Python-loop graph
walks).

This is the communication substrate of the general sparse engine (the role
warp shuffles play in the reference's CUDA path, reference
src/commons/cudaUtils.h:101-106) — and is exposed as a first-class op:
route.plan_permutation / route.apply_permutation.
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


# ---------------------------------------------------------------------------
# bipartite 128-edge-coloring via vectorized Euler splitting
# ---------------------------------------------------------------------------

_NATIVE_COLOR = ()  # lazily resolved once: (fn,) or (None,)


def _native_color():
    """Cached handle to the native C++ router (None when not built)."""
    global _NATIVE_COLOR
    if _NATIVE_COLOR == ():
        try:
            from ..io.native import color_bipartite_native

            _NATIVE_COLOR = (color_bipartite_native,)
        except ImportError:
            _NATIVE_COLOR = (None,)
    return _NATIVE_COLOR[0]


def _euler_split(left: np.ndarray, right: np.ndarray, cls: np.ndarray) -> np.ndarray:
    """One Euler-split level: within each color class (even-regular bipartite
    multigraph), 2-color edges so every (node, class) sees an exact half
    split. Returns the new bit (0/1) per edge. Vectorized: pair incident
    edge-slots per (class, node), walk the alternating pairing cycles by
    pointer jumping."""
    e = left.shape[0]
    # pair consecutive edges per (class, left-node): L involution
    # (single-key stable argsort beats lexsort)
    nl = int(left.max()) + 1 if e else 1
    order_l = np.argsort(cls * nl + left, kind="stable")
    lpair = np.empty(e, dtype=np.int64)
    a, b = order_l[0::2], order_l[1::2]
    lpair[a], lpair[b] = b, a
    # pair per (class, right-node): R involution
    nr = int(right.max()) + 1 if e else 1
    order_r = np.argsort(cls * nr + right, kind="stable")
    rpair = np.empty(e, dtype=np.int64)
    a, b = order_r[0::2], order_r[1::2]
    rpair[a], rpair[b] = b, a
    # orbits of m = lpair(rpair(.)) are exactly the same-color classes of the
    # alternating cycle; e and rpair(e) get opposite colors.
    m = lpair[rpair]
    # pointer-jumped orbit minimum
    f = m.copy()
    val = np.arange(e, dtype=np.int64)
    steps = max(1, int(np.ceil(np.log2(max(e, 2)))))
    for _ in range(steps):
        val = np.minimum(val, val[f])
        f = f[f]
    # color: my orbit-min vs my R-partner's orbit-min (the two orbits of the
    # cycle); deterministic tie-free since orbits are disjoint edge sets
    return (val < val[rpair]).astype(np.int8)


def color_bipartite_pow2(
    left: np.ndarray, right: np.ndarray, n_colors: int
) -> np.ndarray:
    """Proper n_colors-edge-coloring (n_colors a power of two) of a bipartite
    multigraph that is exactly n_colors-regular on every node that appears.

    Edges sharing a left node get distinct colors, likewise right nodes.
    Uses the native C++ Euler-split router when built (native/), the
    vectorized numpy implementation otherwise.
    """
    e = left.shape[0]
    assert n_colors & (n_colors - 1) == 0
    out = _native_color()(left, right, n_colors) if _native_color() else None
    if out is not None:
        return out
    cls = np.zeros(e, dtype=np.int64)
    bits = int(np.log2(n_colors))
    for _ in range(bits):
        bit = _euler_split(left, right, cls)
        cls = cls * 2 + bit
    return cls


# ---------------------------------------------------------------------------
# Clos plan
# ---------------------------------------------------------------------------


def pick_t(rows: int) -> int:
    """Smallest power-of-two tile count T <= 128 with T*128 >= rows."""
    t = 1
    while t * LANE < rows:
        t *= 2
    if t > LANE:
        raise ValueError(f"{rows} rows exceed the {LANE * LANE}-row domain")
    return t


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["r1", "w1", "w2", "w3", "r3", "wc"],
    meta_fields=["t"],
)
@dataclasses.dataclass
class PlannedPermutation:
    """Stage index arrays (all (T*128, 128) int8, values < 128).

    r1 is None when the source lane assignment was folded into the producer
    (plan_row_to_slot): elements are emitted directly in their middle lane.
    wc is the single-tile composition w1.w2.w3 (SW stages are identity when
    t == 1), letting callers apply the whole permutation as r1 . wc . r3 in
    one kernel; None for t > 1.
    """

    r1: jax.Array | None
    w1: jax.Array
    w2: jax.Array
    w3: jax.Array
    r3: jax.Array
    wc: jax.Array | None = None
    t: int = LANE

    @property
    def h(self) -> int:
        return self.t * LANE


def _stages_from_routing(hs, hd, ld, m, t: int, with_r1, ls=None):
    """Common stage-array construction given the big coloring m."""
    h = t * LANE
    ts, ss = hs // LANE, hs % LANE
    td, sd = hd // LANE, hd % LANE
    # per-lane colorings over (src tile -> dst tile): exactly 128-regular
    # per (m, tile) node — all lanes colored in one call
    sigma = color_bipartite_pow2(m * t + ts, m * t + td, LANE)

    # stage index arrays, taa semantics out[i, j] = in[i, idx[i, j]]
    r1 = None
    if with_r1:
        r1 = np.empty((h, LANE), dtype=np.int8)
        r1[hs, m] = ls
    # W1: within tile ts, lane m: sublane ss -> sigma. After the in-kernel
    # transpose the tile is (lane, in-tile pos): out[m, sigma] = in[m, ss]
    w1 = np.empty((h, LANE), dtype=np.int8)  # rows = tile*128 + lane m
    w1[ts * LANE + m, sigma] = ss
    # SW: (ts, sigma) -> row sigma*T + ts; runs of T stay inside one
    # 128-row tile because T | 128
    mid = lambda sg, tt: sg * t + tt  # noqa: E731  row in the swapped grid
    w2 = np.empty((h, LANE), dtype=np.int8)
    w2[(mid(sigma, td) // LANE) * LANE + m, mid(sigma, td) % LANE] = (
        mid(sigma, ts) % LANE
    )
    # SW^-1: -> row td*128 + sigma
    w3 = np.empty((h, LANE), dtype=np.int8)
    w3[td * LANE + m, sd] = sigma
    # R3: out[hd, ld] = in[hd, m]
    r3 = np.empty((h, LANE), dtype=np.int8)
    r3[hd, ld] = m
    wc = None
    if t == 1:
        # SW stages are identity: compose the three sublane perms into one
        # (taa chains right-to-left: out[m, j] = in[m, w1[m, w2[m, w3[m, j]]]])
        rows_ = np.arange(LANE)[:, None]
        wc = w1[rows_, w2[rows_, w3.astype(np.int64)].astype(np.int64)]
    return PlannedPermutation(
        r1=None if r1 is None else jnp.asarray(r1),
        w1=jnp.asarray(w1),
        w2=jnp.asarray(w2),
        w3=jnp.asarray(w3),
        r3=jnp.asarray(r3),
        wc=None if wc is None else jnp.asarray(wc),
        t=t,
    )


def plan_permutation(dst_of: np.ndarray, t: int | None = None) -> PlannedPermutation:
    """Plan the bijection slot -> dst_of[slot] on an (H=T*128, 128) domain.

    Slots are flat ids row*128 + lane; dst_of must be a permutation of
    arange(H*128). T (power of two <= 128) defaults to the smallest domain
    that fits.
    """
    n = dst_of.shape[0]
    if t is None:
        t = pick_t(n // LANE)
    h = t * LANE
    assert n == h * LANE, (n, h)
    src = np.arange(n, dtype=np.int64)
    hs, ls = src // LANE, src % LANE
    hd, ld = dst_of // LANE, dst_of % LANE
    # middle lane: big coloring over (src row -> dst row); exactly
    # 128-regular since dst_of is a bijection on full rows
    m = color_bipartite_pow2(hs, hd, LANE)
    return _stages_from_routing(hs, hd, ld, m, t, with_r1=True, ls=ls)


def plan_row_to_slot(
    src_row: np.ndarray, dst_of: np.ndarray, t: int
) -> Tuple[PlannedPermutation, np.ndarray]:
    """Plan a routing where each element has a fixed source ROW but a free
    source lane (the producer can emit into any lane, e.g. the gather phase's
    slot packing). Returns (plan with r1 folded away, src_lane per element):
    the producer must place element i at (src_row[i], src_lane[i]).

    src_row must list each row of the (T*128)-row domain exactly 128 times;
    dst_of must be a bijection onto the domain's slots.
    """
    h = t * LANE
    assert src_row.shape[0] == h * LANE
    hd, ld = dst_of // LANE, dst_of % LANE
    m = color_bipartite_pow2(src_row, hd, LANE)
    plan = _stages_from_routing(src_row, hd, ld, m, t, with_r1=False)
    return plan, m


# ---------------------------------------------------------------------------
# apply kernels
# ---------------------------------------------------------------------------


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


def _i32(ref):
    return ref[:].astype(jnp.int32)


def _row_and_tile_kernel(x_ref, r_ref, w_ref, o_ref):
    """taa lane-perm with r_ref, then in-tile per-lane sublane perm with
    w_ref (transpose . taa . transpose). One 128-row tile per grid step."""
    x1 = jnp.take_along_axis(x_ref[:], _i32(r_ref), axis=1)
    xt = x1.T  # (lane, in-tile pos)
    x2t = jnp.take_along_axis(xt, _i32(w_ref), axis=1)
    o_ref[:] = x2t.T


def _tile_kernel(x_ref, w_ref, o_ref):
    xt = x_ref[:].T
    x2t = jnp.take_along_axis(xt, _i32(w_ref), axis=1)
    o_ref[:] = x2t.T


def _tile_and_row_kernel(x_ref, w_ref, r_ref, o_ref):
    xt = x_ref[:].T
    x2t = jnp.take_along_axis(xt, _i32(w_ref), axis=1)
    o_ref[:] = jnp.take_along_axis(x2t.T, _i32(r_ref), axis=1)


def _tiled_call(kernel, n_in: int, t: int, dtype):
    specs = [
        pl.BlockSpec((LANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM)
        for _ in range(n_in)
    ]
    return pl.pallas_call(
        kernel,
        grid=(t,),
        in_specs=specs,
        out_specs=pl.BlockSpec((LANE, LANE), lambda i: (i, 0), memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t * LANE, LANE), dtype),
        interpret=_interpret(),
    )


#: whole-domain single-block kernels beat the per-tile grid pipeline (the
#: grid's per-step overhead dominates at these sizes); cap keeps the three
#: resident buffers (f32 in + idx + f32 out, ~9 MB at t=64) within VMEM
_WHOLE_MAX_T = 64


def _whole_w_call(x, w, r=None, r_after=None):
    """Single-block W stage: per-tile transpose.taa.transpose over the whole
    (t*128, 128) domain, optionally preceded (r) or followed (r_after) by a
    full-array lane perm."""
    t = x.shape[0] // LANE

    def kernel(*refs):
        refs_l = list(refs)
        x_ref = refs_l.pop(0)
        r_ref = refs_l.pop(0) if r is not None else None
        w_ref = refs_l.pop(0)
        ra_ref = refs_l.pop(0) if r_after is not None else None
        o_ref = refs_l.pop(0)
        s_ref = refs_l.pop(0) if r_after is not None else o_ref
        xin = x_ref
        if r_ref is not None:
            xr = jnp.take_along_axis(
                x_ref[:], r_ref[:].astype(jnp.int32), axis=1
            )
        for tt in range(t):
            sl = slice(tt * LANE, (tt + 1) * LANE)
            blk = xr[sl, :] if r_ref is not None else xin[sl, :]
            s_ref[sl, :] = jnp.take_along_axis(
                blk.T, w_ref[sl, :].astype(jnp.int32), axis=1
            ).T
        if ra_ref is not None:
            o_ref[:] = jnp.take_along_axis(
                s_ref[:], ra_ref[:].astype(jnp.int32), axis=1
            )

    args = [x] + ([r] if r is not None else []) + [w] + (
        [r_after] if r_after is not None else []
    )
    return pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct(x.shape, x.dtype),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM)] * len(args),
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
        scratch_shapes=(
            [pltpu.VMEM(x.shape, x.dtype)] if r_after is not None else []
        ),
        interpret=_interpret(),
    )(*args)


def apply_sw_w2_sw(plan: PlannedPermutation, x2: jax.Array) -> jax.Array:
    """Middle stages SW . W2 . SW^-1, for callers that fused W1 into their
    producer kernel (e.g. the routed gather)."""
    t = plan.t
    x3 = x2.reshape(t, LANE, LANE).swapaxes(0, 1).reshape(t * LANE, LANE)
    if t <= _WHOLE_MAX_T:
        x4 = _whole_w_call(x3, plan.w2)
    else:
        x4 = _tiled_call(_tile_kernel, 2, t, x2.dtype)(x3, plan.w2)
    return x4.reshape(LANE, t, LANE).swapaxes(0, 1).reshape(t * LANE, LANE)


def apply_permutation_to_mid(plan: PlannedPermutation, x: jax.Array) -> jax.Array:
    """First four stages only (W1[+r1], SW, W2, SW^-1): the returned x5 still
    needs the per-tile W3 sublane perm and the R3 lane perm, which callers
    fuse into their consumer kernel (e.g. the routed reduce)."""
    t = plan.t
    dtype = x.dtype
    if t <= _WHOLE_MAX_T:
        x2 = _whole_w_call(x, plan.w1, r=plan.r1)
    elif plan.r1 is None:
        x2 = _tiled_call(_tile_kernel, 2, t, dtype)(x, plan.w1)
    else:
        x2 = _tiled_call(_row_and_tile_kernel, 3, t, dtype)(x, plan.r1, plan.w1)
    return apply_sw_w2_sw(plan, x2)


def apply_w_stage(w: jax.Array, x: jax.Array) -> jax.Array:
    """One W stage (per-tile transpose.taa.transpose) over any row-aligned
    slice of a domain: w must be the matching row slice of the stage array."""
    return _whole_w_call(x, w)


def apply_permutation_from_w1(
    plan: PlannedPermutation, x2: jax.Array, skip_r3: bool = False
) -> jax.Array:
    """Remaining stages for callers that already applied W1 (e.g. fused into
    their producer): SW . W2 . SW^-1 . W3 [. R3]. (An in-VMEM fused variant
    of the middle stages existed through round 2 — SPMV_ROUTED_FUSEMID —
    but measured SLOWER than the XLA grid transposes on caida, 27.2 vs
    32.1 GF/s, and was removed; see scripts/sample_ab_r3.log.)"""
    x5 = apply_sw_w2_sw(plan, x2)
    t = plan.t
    if t <= _WHOLE_MAX_T:
        return _whole_w_call(x5, plan.w3, r_after=None if skip_r3 else plan.r3)
    if skip_r3:
        return _tiled_call(_tile_kernel, 2, t, x2.dtype)(x5, plan.w3)
    return _tiled_call(_tile_and_row_kernel, 3, t, x2.dtype)(x5, plan.w3, plan.r3)


def apply_permutation(
    plan: PlannedPermutation, x: jax.Array, skip_r3: bool = False
) -> jax.Array:
    """y[dst_of[slot]] = x[slot] for the planned bijection; x is (H, 128).

    With skip_r3=True the final per-row lane permutation is left to the
    caller (who applies plan.r3 itself, e.g. fused into a reduction): the
    returned array holds each element in its middle lane m, i.e.
    true[h, l] == returned[h, r3[h, l]].
    """
    t = plan.t
    dtype = x.dtype
    if t == 1 and plan.wc is not None:
        # SW stages are identity: the whole permutation is one kernel
        return _whole_w_call(
            x, plan.wc, r=plan.r1, r_after=None if skip_r3 else plan.r3
        )
    x5 = apply_permutation_to_mid(plan, x)
    if t <= _WHOLE_MAX_T:
        return _whole_w_call(
            x5, plan.w3, r_after=None if skip_r3 else plan.r3
        )
    if skip_r3:
        return _tiled_call(_tile_kernel, 2, t, dtype)(x5, plan.w3)
    return _tiled_call(_tile_and_row_kernel, 3, t, dtype)(x5, plan.w3, plan.r3)
