"""DIA (diagonal) device format — the zero-gather SpMV path.

The reference stores banded FEM/thermal matrices (its headline benchmarks) as
CSR/ELL and pays per-nnz index reads plus random x access. On TPU the
idiomatic storage for such matrices is by diagonal: y = sum_d diag_d * x
shifted by d. No column indices (half the memory traffic of ELL), no gather
(the shift is a static slice), everything dense and lane-parallel — this is
the speed-of-light format whenever the matrix's nnz concentrate on few
diagonals.

Like the reference's ELL size cap (parser.c:223-232), conversion enforces a
padding budget: if the dense diagonals would exceed `max_fill_ratio` x nnz,
DiaFillError is raised and callers fall back to ELL/binned-CSR.
"""
from __future__ import annotations

import dataclasses
import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..config import LANE
from .matrix import CSRMatrix, _ceil_to


class DiaFillError(ValueError):
    """Diagonal materialization would exceed the padding budget."""


@functools.partial(
    jax.tree_util.register_dataclass,
    data_fields=["data"],
    meta_fields=["offsets", "shape", "nnz", "pad"],
)
@dataclasses.dataclass
class DeviceDIA:
    """data[d, i] = A[i, i + offsets[d]] (0 where outside the matrix).

    `pad` is the x padding (max |offset|, lane-aligned) so shifted reads are
    in-bounds static slices of the padded vector.
    """

    data: jax.Array  # (D, M_pad)
    offsets: Tuple[int, ...]  # static: diagonal offsets (c - r)
    shape: Tuple[int, int] = (0, 0)
    nnz: int = 0
    pad: int = 0


def prepare_dia(
    csr: CSRMatrix, dtype=jnp.float32, max_fill_ratio: float = 3.0
) -> DeviceDIA:
    m, n = csr.shape
    rows = csr.row_ids().astype(np.int64)
    offs = csr.indices - rows  # c - r per nnz
    uniq, inv = np.unique(offs, return_inverse=True)
    d = uniq.shape[0]
    m_pad = max(_ceil_to(max(m, 1), LANE), LANE)
    if d * m_pad > max_fill_ratio * max(csr.nnz, 1):
        raise DiaFillError(
            f"{d} diagonals x {m_pad} rows = {d * m_pad} slots > "
            f"{max_fill_ratio}x nnz ({csr.nnz})"
        )
    data = np.zeros((d, m_pad), dtype=np.float64)
    data[inv, rows] = csr.data
    pad = int(max(np.abs(uniq).max(initial=0), 1))
    pad = _ceil_to(pad, LANE)
    return DeviceDIA(
        data=jnp.asarray(data, dtype=dtype),
        offsets=tuple(int(o) for o in uniq),
        shape=(m, n),
        nnz=csr.nnz,
        pad=pad,
    )


def pad_x_dia(x: jax.Array, mat: DeviceDIA) -> jax.Array:
    """Zero-pad x so every shifted diagonal read is a static in-bounds slice.

    Padded layout: [pad zeros | x (length n) | zeros up to M_pad + pad]."""
    m_pad = mat.data.shape[1]
    n = mat.shape[1]
    return jnp.pad(x, (mat.pad, m_pad + mat.pad - n))


def dia_spmv_padded(mat: DeviceDIA, xp: jax.Array) -> jax.Array:
    """y = A @ x from pre-padded xp (see pad_x_dia).

    Each diagonal contributes data[d] * xp[pad + off_d : pad + off_d + M_pad]
    — a static slice, unrolled over the (static) diagonal set. XLA fuses the
    whole sum into one pass over the data slab.
    """
    m_pad = mat.data.shape[1]
    acc = jnp.zeros(m_pad, dtype=mat.data.dtype)
    for i, off in enumerate(mat.offsets):
        seg = jax.lax.slice_in_dim(xp, mat.pad + off, mat.pad + off + m_pad)
        acc = acc + mat.data[i] * seg.astype(mat.data.dtype)
    return acc[: mat.shape[0]]


def dia_spmv(mat: DeviceDIA, x: jax.Array) -> jax.Array:
    return dia_spmv_padded(mat, pad_x_dia(x, mat))
