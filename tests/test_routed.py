"""Clos routing machinery + routed CSR engine vs the oracle (CPU interpret).

Reference parity: this is the TPU-native general-sparsity engine standing in
for the reference's CSR scalar/warp kernels (SpMV_CSR_OMP.c, SpMV_CUDA.cu).
"""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.config import LANE
from spmv_openmp_cuda_tpu.formats.routed import prepare_routed, routed_spmv
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.ops.route import (
    apply_permutation,
    color_bipartite_pow2,
    plan_permutation,
)
from spmv_openmp_cuda_tpu.utils import synth
from spmv_openmp_cuda_tpu.utils.compare import vectors_diff


@pytest.mark.parametrize("t", [1, 4, 16, 64, 128])
def test_permutation_roundtrip(t):
    rng = np.random.default_rng(t)
    n = t * LANE * LANE
    perm = rng.permutation(n)
    plan = plan_permutation(perm, t)
    x = rng.standard_normal((t * LANE, LANE)).astype(np.float32)
    y = np.asarray(apply_permutation(plan, jnp.asarray(x)))
    want = np.empty(n, np.float32)
    want[perm] = x.reshape(-1)
    assert np.array_equal(y.reshape(-1), want)


def test_coloring_proper():
    rng = np.random.default_rng(0)
    # random 32-regular bipartite multigraph
    nl = 40
    left = np.repeat(np.arange(nl), 32)
    right = left.copy()
    rng.shuffle(right)
    cls = color_bipartite_pow2(left, right, 32)
    for side in (left, right):
        pairs = set(zip(side.tolist(), cls.tolist()))
        assert len(pairs) == side.shape[0], "color collision on a node"


@pytest.mark.parametrize(
    "gen,kw",
    [
        (synth.random_uniform, dict(m=2500, n=2500, density=0.003)),
        (synth.power_law, dict(m=4000, n=4000, avg_nnz_per_row=5.0, alpha=1.6)),
        (synth.banded, dict(m=1500, n=1500, bandwidth=6, fill=0.9)),
        (synth.random_uniform, dict(m=500, n=40000, density=0.0005)),
        (synth.power_law, dict(m=3000, n=3000, avg_nnz_per_row=8.0, alpha=1.3)),
    ],
)
def test_routed_matches_oracle(gen, kw):
    coo = gen(seed=17, **kw)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(coo.shape[1], seed=4)
    mat = prepare_routed(csr)
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def _make_spiked(m, n, spike_nnz, bg_nnz, seed):
    rng = np.random.default_rng(seed)
    heavy_cols = rng.choice(n, size=spike_nnz, replace=False)
    rows = np.r_[np.zeros(spike_nnz, np.int64), rng.integers(0, m, bg_nnz)]
    cols = np.r_[heavy_cols, rng.integers(0, n, bg_nnz)]
    vals = rng.standard_normal(rows.shape[0])
    from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
    from spmv_openmp_cuda_tpu.formats.convert import sort_coo

    return S.coo_to_csr(sort_coo(COOMatrix((m, n), rows, cols, vals)))


def test_routed_multilevel_split_row():
    # a ~3k-nnz row stays below HEAVY_THRESHOLD and forces a second
    # reduction level through the routed pipeline
    csr = _make_spiked(3000, 30000, 3000, 5000, seed=5)
    x = fill_rnd_vector(30000, seed=6)
    mat = prepare_routed(csr)
    assert len(mat.lvl_runs) >= 1 and not mat.heavy_rows
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_heavy_row_residue_path():
    # a 20k-nnz row rides the residue-dual heavy path (no permutation)
    csr = _make_spiked(3000, 30000, 20000, 5000, seed=5)
    x = fill_rnd_vector(30000, seed=6)
    mat = prepare_routed(csr)
    assert mat.heavy_rows == (0,)
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_heavy_pooled_multi_row(monkeypatch):
    # several heavy rows pool per window: row-slot ranges span tile
    # boundaries and multiple rows share tiles (hlo/hhi cumsum path)
    monkeypatch.setenv("SPMV_DENSE_HEAVY", "0")  # force the pooled tiles
    rng = np.random.default_rng(11)
    m, n = 2000, 40000
    rows_l, cols_l = [], []
    for r in range(10):  # 10 heavy rows, ~5k nnz each, all windows
        c = rng.choice(n, size=5000, replace=False)
        rows_l.append(np.full(5000, r))
        cols_l.append(c)
    rows_l.append(rng.integers(10, m, 8000))
    cols_l.append(rng.integers(0, n, 8000))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    rows, cols = np.unique(np.stack([rows, cols]), axis=1)
    coo = S.COOMatrix(
        shape=(m, n), rows=rows, cols=cols,
        vals=rng.uniform(-3e-5, 3e-5, rows.shape[0]),
    )
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(n, seed=12)
    mat = prepare_routed(csr, heavy_threshold=4096)
    assert len(mat.heavy_rows) == 10 and mat.hlo is not None
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


@pytest.mark.parametrize(
    "mn,nnz,out_t_max", [(9000, 40000, 1), (6000, 15000, 1), (25000, 35000, 2)]
)
def test_routed_small_single_kernel(mn, nnz, out_t_max):
    # tiny domains (t <= 4, output t <= 4) run the whole pipeline in one
    # kernel with the SW stages as transposed-space lane interleaves
    rng = np.random.default_rng(7)
    rows = rng.integers(0, mn, nnz)
    cols = rng.integers(0, mn, nnz)
    rows, cols = np.unique(np.stack([rows, cols]), axis=1)
    coo = S.COOMatrix(
        shape=(mn, mn), rows=rows, cols=cols,
        vals=rng.uniform(-3e-5, 3e-5, rows.shape[0]),
    )
    csr = S.coo_to_csr(coo)
    mat = prepare_routed(csr)
    assert mat.perm_products.t <= 4 and mat.out_t <= max(out_t_max, 1)
    x = fill_rnd_vector(mn, seed=2)
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_bf16_vals():
    # bf16 value slabs, f32 gather/route/accumulate: stays inside the
    # protocol tolerance on bounded-magnitude inputs
    csr = S.coo_to_csr(synth.power_law(3000, 3000, avg_nnz_per_row=6.0, seed=41))
    x = fill_rnd_vector(3000, seed=42)
    mat = prepare_routed(csr, vals_dtype=jnp.bfloat16)
    assert mat.vals.dtype == jnp.bfloat16
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_heavy_dense_block():
    # small heavy sets ride the dense bf16 row block (y_h = H @ x); f32
    # accumulate keeps the protocol tolerance (7e-4, |x| < 3e-5)
    csr = _make_spiked(3000, 30000, 20000, 5000, seed=31)
    x = fill_rnd_vector(30000, seed=32)
    mat = prepare_routed(csr)
    assert mat.heavy_rows == (0,) and mat.hdense is not None
    assert mat.hvals is None
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_heavy_dense_block_large_fallback():
    # > 64 heavy rows take the XLA-dot fallback of the dense block; x stays
    # f32 so precision matches the kernel path
    rng = np.random.default_rng(51)
    n_heavy, per_row, m, n = 70, 600, 200, 8000
    rows_l = [np.full(per_row, r) for r in range(n_heavy)]
    cols_l = [rng.choice(n, size=per_row, replace=False) for _ in range(n_heavy)]
    rows_l.append(rng.integers(n_heavy, m, 1500))
    cols_l.append(rng.integers(0, n, 1500))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    rows, cols = np.unique(np.stack([rows, cols]), axis=1)
    coo = S.COOMatrix(
        shape=(m, n), rows=rows, cols=cols,
        vals=rng.uniform(-3e-5, 3e-5, rows.shape[0]),
    )
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(n, seed=52)
    mat = prepare_routed(csr, heavy_threshold=512)
    assert mat.hdense is not None and mat.hdense.shape[0] > 64
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_heavy_pool_cap_split(monkeypatch):
    # more heavy rows than one pool admits (> _HEAVY_POOL_ROWS): rows split
    # into pools so no tile exceeds its 128 row-slot lanes
    from spmv_openmp_cuda_tpu.formats.routed import _HEAVY_POOL_ROWS

    monkeypatch.setenv("SPMV_DENSE_HEAVY", "0")
    rng = np.random.default_rng(21)
    n_heavy = _HEAVY_POOL_ROWS + 10
    m, n = n_heavy + 50, 20000
    per_row = 600
    rows_l = [np.full(per_row, r) for r in range(n_heavy)]
    cols_l = [rng.choice(n, size=per_row, replace=False) for _ in range(n_heavy)]
    rows_l.append(rng.integers(n_heavy, m, 2000))
    cols_l.append(rng.integers(0, n, 2000))
    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    rows, cols = np.unique(np.stack([rows, cols]), axis=1)
    coo = S.COOMatrix(
        shape=(m, n), rows=rows, cols=cols,
        vals=rng.uniform(-3e-5, 3e-5, rows.shape[0]),
    )
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(n, seed=22)
    mat = prepare_routed(csr, heavy_threshold=512)
    assert len(mat.heavy_rows) == n_heavy
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_level_slab_padding_not_corrupted():
    # Split rows whose level-2 units share a group with differing lengths:
    # the shorter unit's column has in-run padding slots; the level perm
    # backfills those with leftover (nonzero) sums, which must be masked out
    # of the reduction. Regression: caida proxy rows were off by ~1e-3.
    rng = np.random.default_rng(8)
    m, n = 4000, 20000
    rows_l, cols_l = [], []
    for i, ln in enumerate([385, 129, 500, 130, 257, 650, 131] * 3):
        r = i * 37
        rows_l.append(np.full(ln, r))
        cols_l.append(rng.choice(n, ln, replace=False))
    rows_l.append(rng.integers(0, m, 8000))
    cols_l.append(rng.integers(0, n, 8000))
    from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
    from spmv_openmp_cuda_tpu.formats.convert import sort_coo

    rows = np.concatenate(rows_l)
    cols = np.concatenate(cols_l)
    vals = rng.standard_normal(rows.shape[0])
    coo = sort_coo(COOMatrix((m, n), rows, cols, vals))
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(n, seed=9)
    mat = prepare_routed(csr)
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    d = np.abs(y - serial_csr_spmv(csr, x))
    # corruption shows up at ~1e-4; fp32 noise is ~1e-9
    assert d.max() < 1e-6, d.max()


def test_routed_chunked_large():
    from spmv_openmp_cuda_tpu.formats.routed import (
        RoutedChunks,
        prepare_routed_auto,
        routed_auto_spmv,
    )

    # ~2.5M uniformly spread nnz (no heavy rows to offload) exceed one
    # routing domain -> chunked engine
    coo = synth.random_uniform(500_000, 500_000, 5.0 / 500_000, seed=23)
    csr = S.coo_to_csr(coo)
    mat = prepare_routed_auto(csr)
    assert isinstance(mat, RoutedChunks) and len(mat.chunks) >= 2
    x = fill_rnd_vector(csr.shape[1], seed=24)
    y = np.asarray(
        jax.jit(routed_auto_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64
    )
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_routed_all_nnz_heavy():
    # every nnz sits in rows above the heavy threshold (plus empty rows):
    # the engine must demote a heavy row rather than emit an empty gather
    rng = np.random.default_rng(33)
    from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
    from spmv_openmp_cuda_tpu.formats.convert import sort_coo

    m, n = 200, 40000
    cols0 = rng.choice(n, 17000, replace=False)
    cols1 = rng.choice(n, 16500, replace=False)
    rows = np.r_[np.zeros(17000, np.int64), np.full(16500, 7, np.int64)]
    cols = np.r_[cols0, cols1]
    coo = sort_coo(COOMatrix((m, n), rows, cols, rng.standard_normal(rows.shape[0])))
    csr = S.coo_to_csr(coo)
    mat = prepare_routed(csr, heavy_threshold=16384)
    x = fill_rnd_vector(n, seed=34)
    y = np.asarray(jax.jit(routed_spmv)(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep




def test_routed_df_double_precision():
    """Double-float routed engine: O(1)-magnitude data where the f32
    engine drifts to ~1e-3; df must hold double-class precision."""
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.formats.routed import (
        prepare_routed_df, routed_spmv_df,
    )

    Config(dtype="float64")  # enable x64
    rng = np.random.default_rng(0)
    coo = synth.power_law(
        20000, 20000, avg_nnz_per_row=6.0, alpha=1.2, seed=3,
        exact_nnz=130000,
    )
    coo.vals[:] = rng.standard_normal(coo.vals.shape[0])
    csr = S.coo_to_csr(coo)
    x = rng.standard_normal(csr.shape[1])
    oracle = serial_csr_spmv(csr, x)
    mdf = prepare_routed_df(csr)
    y = np.asarray(routed_spmv_df(mdf, jnp.asarray(x, jnp.float64)))
    assert y.dtype == np.float64
    rel = np.abs(y - oracle).max() / np.abs(oracle).max()
    assert rel < 1e-11, rel


def test_routed_df_hub_rows_demote():
    """Heavy fast paths are off in df: hub rows must flow through the
    multi-level reduction runs and still hold precision."""
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.formats.routed import (
        prepare_routed_df, routed_spmv_df,
    )

    Config(dtype="float64")  # enable x64
    rng = np.random.default_rng(1)
    coo = synth.power_law(
        30000, 30000, avg_nnz_per_row=8.0, alpha=1.05, seed=5,
        exact_nnz=400000,
    )
    coo.vals[:] = rng.standard_normal(coo.vals.shape[0])
    csr = S.coo_to_csr(coo)
    assert csr.max_row_nz > 128  # multi-level splitting exercised
    mdf = prepare_routed_df(csr)
    assert mdf.mat.hdense is None and mdf.mat.hvals is None
    x = rng.standard_normal(csr.shape[1])
    y = np.asarray(routed_spmv_df(mdf, jnp.asarray(x, jnp.float64)))
    oracle = serial_csr_spmv(csr, x)
    rel = np.abs(y - oracle).max() / np.abs(oracle).max()
    assert rel < 1e-11, rel


def test_routed_df_chunked():
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.formats.routed import (
        RoutedChunks, prepare_routed_df_auto, routed_df_auto_spmv,
    )

    Config(dtype="float64")  # enable x64
    rng = np.random.default_rng(2)
    coo = synth.power_law(
        300000, 300000, avg_nnz_per_row=8.0, alpha=1.3, seed=7,
        exact_nnz=2400000,
    )
    coo.vals[:] = rng.standard_normal(coo.vals.shape[0]) * 0.1
    csr = S.coo_to_csr(coo)
    mat = prepare_routed_df_auto(csr)
    assert isinstance(mat, RoutedChunks) and len(mat.chunks) > 1
    x = rng.standard_normal(csr.shape[1])
    y = np.asarray(routed_df_auto_spmv(mat, jnp.asarray(x, jnp.float64)))
    oracle = serial_csr_spmv(csr, x)
    rel = np.abs(y - oracle).max() / np.abs(oracle).max()
    assert rel < 1e-10, rel


def test_routed_df_registered_mode():
    from spmv_openmp_cuda_tpu.config import Config
    from spmv_openmp_cuda_tpu.ops import registry

    spec = registry.get("PL_CSR_ROUTED_F64")
    assert spec.f64
    coo = synth.power_law(8000, 8000, 5.0, seed=9, exact_nnz=40000)
    csr = S.coo_to_csr(coo)
    ops = spec.prepare(csr, None, Config(dtype="float64"))
    x = fill_rnd_vector(csr.shape[1], seed=2)
    y = np.asarray(spec.run(ops, jnp.asarray(x, jnp.float64)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep
