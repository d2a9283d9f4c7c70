"""Single-program multi-device routed engine (shard_map).

Round-3's multidevice routed path was host-looped: per-chunk jits, x
replicated per device by hand, np.concatenate on host. This module replaces
it with ONE jitted shard_map program:

- rows split fairly by nnz into mesh.shape[ROWS] chunks;
- every chunk prepared against a SHARED pow2-ladder schema
  (formats/routed.py::routed_schema_stats / merge_routed_schemas /
  prepare_routed(schema=...)), so all per-chunk operands are SHAPE-IDENTICAL
  pytrees with EQUAL static metadata (t, runs, level structure, window
  count);
- the chunk RoutedCSR pytrees stack on a leading device axis and shard
  P(ROWS, ...); the local body indexes its shard and runs the standard
  single-chip pipeline (the same Pallas kernels — gather+W1, whole-domain
  W2, fused W3+R3+reduce);
- x stays replicated (every chunk reads arbitrary columns — the power-law
  regime has no column locality to exploit), packed into the window layout
  ONCE.

Heavy-row extraction is disabled by the schema (hub rows demote into the
multi-level reduction) — uniform structure beats the special case across
devices. Reference anchor: SURVEY.md §5 distributed backend bullet; the
reference itself has no distributed path at all.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from ..config import LANE
from ..formats.matrix import CSRMatrix
from ..formats import routed as R
from ..ops.route import apply_permutation, apply_sw_w2_sw
from ..utils.pallas_env import pack_x_windows_flat
from .mesh import ROWS
from .sharded import shard_map


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["mats"],
    meta_fields=["bounds", "shape", "nnz", "nwin", "h_out"],
)
@dataclasses.dataclass
class SpmdRouted:
    """Stacked shape-identical chunk operands (leading axis = device)."""

    mats: R.RoutedCSR  # every array leaf (nd, ...), sharded P(ROWS, ...)
    bounds: Tuple[int, ...]  # chunk row bounds (len nd+1)
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    nwin: int = 1
    h_out: int = 0


def _fair_nnz_bounds(csr: CSRMatrix, nd: int) -> Tuple[int, ...]:
    cum = csr.indptr.astype(np.int64)
    targets = (np.arange(1, nd) * csr.nnz) // nd
    cuts = np.searchsorted(cum, targets, side="left")
    bounds = [0]
    for c in cuts:
        bounds.append(int(min(max(c, bounds[-1] + 1), csr.shape[0] - (nd - len(bounds)))))
    bounds.append(csr.shape[0])
    return tuple(bounds)


def prepare_routed_spmd(
    csr: CSRMatrix, mesh, dtype=jnp.float32, vals_dtype=None
) -> SpmdRouted:
    nd = mesh.shape[ROWS]
    if csr.nnz < nd:
        raise R.RoutedError(f"need at least {nd} nnz for {nd}-way split")
    bounds = _fair_nnz_bounds(csr, nd)
    chunks = [
        R._sub_csr(csr, bounds[b], bounds[b + 1]) for b in range(nd)
    ]
    schema = R.merge_routed_schemas(
        [R.routed_schema_stats(c) for c in chunks]
    )
    mats = [
        R.prepare_routed(c, dtype=dtype, vals_dtype=vals_dtype, schema=schema)
        for c in chunks
    ]
    h_out = mats[0].perm_out.h
    # normalize the per-chunk meta (shape/nnz differ; the run path below
    # never reads them) so the pytrees stack under one treedef
    canon = [
        dataclasses.replace(m, shape=(h_out * LANE, csr.shape[1]), nnz=-1)
        for m in mats
    ]
    stacked = jax.tree.map(lambda *xs: jnp.stack(xs), *canon)
    sh = lambda a: NamedSharding(  # noqa: E731
        mesh, P(ROWS, *([None] * (a.ndim - 1)))
    )
    stacked = jax.tree.map(lambda a: jax.device_put(a, sh(a)), stacked)
    return SpmdRouted(
        mats=stacked,
        bounds=bounds,
        shape=csr.shape,
        nnz=csr.nnz,
        nwin=schema["nwin"],
        h_out=h_out,
    )


def make_routed_spmd(mesh, op: SpmdRouted):
    """One jitted shard_map program: every device runs the standard routed
    pipeline on its chunk's shard of the stacked operands."""
    h_out = op.h_out
    nd = mesh.shape[ROWS]
    bounds = op.bounds
    m_total = op.shape[0]

    def local(mats_stacked, xw):
        mat = jax.tree.map(lambda a: a[0], mats_stacked)
        plan = mat.perm_products
        h1 = plan.h
        x2 = R._gather_w1(mat, xw)
        if h1 <= R._W3_FUSED_MAX_ROWS:
            x5 = apply_sw_w2_sw(plan, x2)
            sums = R._w3_r3_reduce(x5, plan, mat.runs)
        else:
            from ..ops.route import apply_permutation_from_w1

            slab = apply_permutation_from_w1(plan, x2, skip_r3=True)
            sums = R._reduce_runs_fused(slab, plan.r3, mat.runs)
        flats = [sums.reshape(-1)]
        for perm_k, mask_k, runs in zip(
            mat.lvl_perms, mat.lvl_masks, mat.lvl_runs
        ):
            prev2d = flats[-1].reshape(-1, LANE)
            if prev2d.shape[0] > perm_k.h:
                prev2d = prev2d[: perm_k.h]
            else:
                prev2d = jnp.pad(
                    prev2d, ((0, perm_k.h - prev2d.shape[0]), (0, 0))
                )
            slab_k = apply_permutation(perm_k, prev2d) * mask_k
            flats.append(R._reduce_runs(slab_k, runs).reshape(-1))
        concat = jnp.concatenate(flats)
        concat = jnp.pad(concat, (0, h_out * LANE - concat.shape[0]))
        return apply_permutation(mat.perm_out, concat.reshape(h_out, LANE))

    specs = jax.tree.map(
        lambda a: P(ROWS, *([None] * (a.ndim - 1))), op.mats
    )
    f = shard_map(
        local,
        mesh=mesh,
        in_specs=(specs, P(None, None)),
        out_specs=P(ROWS, None),
        check_vma=False,  # pallas_call bodies don't annotate vma
    )

    xw_sharding = NamedSharding(mesh, P(None, None))

    @jax.jit
    def spmv(op_: SpmdRouted, x):
        xw = pack_x_windows_flat(
            x, op_.nwin, op_.shape[1], jnp.float32, R.WINDOW_PANELS
        )
        xw = jax.lax.with_sharding_constraint(xw, xw_sharding)
        out = f(op_.mats, xw)  # (nd * h_out, 128)
        parts = []
        for b in range(nd):
            m_b = bounds[b + 1] - bounds[b]
            parts.append(
                out[b * h_out : (b + 1) * h_out].reshape(-1)[:m_b]
            )
        return jnp.concatenate(parts)[:m_total]

    return spmv
