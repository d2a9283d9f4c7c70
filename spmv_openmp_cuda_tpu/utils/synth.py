"""Synthetic sparse matrix generators.

The reference benchmarks against a SuiteSparse corpus (doc/relazione.tex:460-463)
that cannot be fetched here (zero egress); these generators produce matrices
with the structural regimes that corpus spans — uniform random, banded/FEM-like
(narrow row-length spread), and power-law/graph-like (skewed row lengths, the
regime where ELL padding explodes and scheduling matters).
"""
from __future__ import annotations

from typing import Optional, Tuple

import numpy as np

from ..formats.matrix import COOMatrix
from ..formats.convert import sort_coo


def random_uniform(
    m: int, n: int, density: float, seed: int = 0, val_scale: float = 1.0
) -> COOMatrix:
    """Uniform random sparsity (Erdos-Renyi style)."""
    rng = np.random.default_rng(seed)
    nnz_target = int(m * n * density)
    rows = rng.integers(0, m, size=nnz_target)
    cols = rng.integers(0, n, size=nnz_target)
    vals = rng.standard_normal(nnz_target) * val_scale
    return sort_coo(COOMatrix((m, n), rows, cols, vals))


def banded(
    m: int, n: int, bandwidth: int, fill: float = 1.0, seed: int = 0,
    val_scale: float = 1.0,
) -> COOMatrix:
    """Banded matrix (FEM/thermal-style locality): nnz within +-bandwidth of
    the diagonal, each present with probability `fill`."""
    rng = np.random.default_rng(seed)
    r = np.repeat(np.arange(m), 2 * bandwidth + 1)
    c = r + np.tile(np.arange(-bandwidth, bandwidth + 1), m)
    ok = (c >= 0) & (c < n)
    r, c = r[ok], c[ok]
    if fill < 1.0:
        keep = rng.random(r.shape[0]) < fill
        r, c = r[keep], c[keep]
    vals = rng.standard_normal(r.shape[0]) * val_scale
    return sort_coo(COOMatrix((m, n), r, c, vals))


def power_law(
    m: int, n: int, avg_nnz_per_row: float, alpha: float = 1.5, seed: int = 0,
    max_row_nz: Optional[int] = None, val_scale: float = 1.0,
) -> COOMatrix:
    """Skewed row lengths ~ Zipf (caidaRouterLevel/webbase-style graphs).

    This is the regime where the reference's ELL size cap triggers and where
    dynamic scheduling / row binning pays off.
    """
    rng = np.random.default_rng(seed)
    raw = rng.zipf(alpha, size=m).astype(np.float64)
    raw *= avg_nnz_per_row * m / raw.sum()
    lens = np.maximum(1, raw.astype(np.int64))
    cap = max_row_nz if max_row_nz is not None else n
    lens = np.minimum(lens, cap)
    rows = np.repeat(np.arange(m), lens)
    cols = rng.integers(0, n, size=int(lens.sum()))
    vals = rng.standard_normal(rows.shape[0]) * val_scale
    return sort_coo(COOMatrix((m, n), rows, cols, vals))


def diagonal(m: int, val: float = 1.0) -> COOMatrix:
    idx = np.arange(m)
    return COOMatrix((m, m), idx, idx, np.full(m, val))


PRESETS = {
    # name -> (generator, kwargs) proxies for the reference's headline
    # SuiteSparse matrices (BASELINE.md); dims/nnz match, structure approximates.
    "delaunay_n12_like": (random_uniform, dict(m=4096, n=4096, density=24500 / 4096**2)),
    "raefsky1_like": (banded, dict(m=3242, n=3242, bandwidth=45, fill=1.0)),
    "cavity10_like": (banded, dict(m=2597, n=2597, bandwidth=15, fill=0.97)),
    "fem_3d_thermal2_like": (banded, dict(m=147900, n=147900, bandwidth=12, fill=0.95)),
    "thermal2_like": (banded, dict(m=1228045, n=1228045, bandwidth=3, fill=1.0)),
    "caida_like": (power_law, dict(m=192244, n=192244, avg_nnz_per_row=6.3, alpha=1.7)),
    # the reference's OpenMP-baseline matrices (BASELINE.md)
    "west2021_like": (random_uniform, dict(m=2021, n=2021, density=7310 / 2021**2)),
    "webbase_like": (power_law, dict(m=1000005, n=1000005, avg_nnz_per_row=3.1, alpha=1.9)),
}


def preset(name: str, seed: int = 0) -> COOMatrix:
    gen, kw = PRESETS[name]
    return gen(seed=seed, val_scale=1.0, **kw)
