"""Windowed local-gather engine (formats/window.py, PL_CSR_WINDOW)."""
import numpy as np
import jax.numpy as jnp
import pytest

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.config import Config
from spmv_openmp_cuda_tpu.formats import window as W
from spmv_openmp_cuda_tpu.formats.convert import sort_coo
from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
from spmv_openmp_cuda_tpu.formats.window import WindowError
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops import registry
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.utils import synth
from spmv_openmp_cuda_tpu.utils.compare import vectors_diff


def _check(csr, mat):
    x = fill_rnd_vector(csr.shape[1], seed=1)
    y = np.asarray(W.window_spmv(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


@pytest.mark.parametrize("g", [8, 16])
def test_window_fem_like(g):
    coo = synth.fem_like(m=4000, n=4000, nnz=50000, spread=600, lo=5, hi=20, seed=2)
    csr = S.coo_to_csr(coo)
    _check(csr, W.prepare_window(csr, g=g))


def test_window_banded_and_rect():
    for coo in [
        synth.banded(2000, 2000, 35, fill=0.8, seed=1),
        synth.banded(900, 1400, 25, fill=0.9, seed=5),  # wide
        synth.banded(1400, 900, 25, fill=0.9, seed=6),  # tall
    ]:
        csr = S.coo_to_csr(coo)
        _check(csr, W.prepare_window_auto(csr))


def test_window_bf16_vals():
    coo = synth.fem_like(m=3000, n=3000, nnz=30000, spread=500, lo=3, hi=15, seed=7)
    csr = S.coo_to_csr(coo)
    mat = W.prepare_window_auto(csr, vals_dtype=jnp.bfloat16)
    x = fill_rnd_vector(csr.shape[1], seed=1)
    y = np.asarray(W.window_spmv(mat, jnp.asarray(x, jnp.float32)), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep  # bf16 value rounding stays inside the 7e-4 tolerance


def test_window_rejects_power_law():
    csr = S.coo_to_csr(synth.power_law(20000, 20000, 5.0, seed=1))
    with pytest.raises(WindowError):
        W.prepare_window_auto(csr)


def test_window_registered_modes():
    coo = synth.fem_like(m=2000, n=2000, nnz=22000, spread=400, lo=5, hi=16, seed=3)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(2000, seed=4)
    oracle = serial_csr_spmv(csr, x)
    cfg = Config()
    for name in ("PL_CSR_WINDOW", "PL_CSR_WINDOW_BF16"):
        spec = registry.get(name)
        ops = spec.prepare(csr, None, cfg)
        y = np.asarray(spec.run(ops, jnp.asarray(x, jnp.float32)), np.float64)
        rep = vectors_diff(y, oracle)
        assert rep.ok, (name, rep)


def test_auto_selects_window_for_fem_locality():
    from spmv_openmp_cuda_tpu.models.auto import AutoSpMV, select_format

    coo = synth.fem_like(m=6000, n=6000, nnz=120000, spread=500, lo=10, hi=28, seed=9)
    csr = S.coo_to_csr(coo)
    assert select_format(csr) == "window"
    model = AutoSpMV.from_csr(csr)
    assert model.format == "window"
    x = fill_rnd_vector(6000, seed=2)
    rep = vectors_diff(np.asarray(model(x), np.float64), serial_csr_spmv(csr, x))
    assert rep.ok, rep


@pytest.mark.parametrize("g,cap", [(8, 4), (16, 8), (12, 16)])
def test_window_mod8_packing(g, cap):
    """Forced-cap mod-8 interleaved packing: class region + overflow both
    exercised (cap chosen small enough that the rank peel spills)."""
    coo = synth.fem_like(m=4000, n=4000, nnz=50000, spread=600, lo=5, hi=20, seed=2)
    csr = S.coo_to_csr(coo)
    mat = W.prepare_window(csr, g=g, cap=cap, max_pad=20.0)
    assert mat.k_c == 8 * cap
    assert mat.k_pad > mat.k_c, "cap should force a non-empty overflow region"
    # slot-row invariant: rows < k_c only hold gid % 8 == row % 8 entries
    gs = np.asarray(mat.gid).reshape(mat.nblocks, mat.k_pad, 128)
    vs = np.asarray(mat.vals, np.float64).reshape(mat.nblocks, mat.k_pad, 128)
    nh = -(-g // 8)
    assert int(gs[:, : mat.k_c].max(initial=0)) < nh
    _check(csr, mat)


def test_window_mod8_vs_legacy_same_result():
    coo = synth.fem_like(m=3000, n=3000, nnz=40000, spread=500, lo=4, hi=18, seed=11)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(3000, seed=3)
    ya = np.asarray(
        W.window_spmv(W.prepare_window(csr, g=8, cap=None), jnp.asarray(x, jnp.float32))
    )
    yb = np.asarray(
        W.window_spmv(W.prepare_window(csr, g=8, cap=8, max_pad=20.0), jnp.asarray(x, jnp.float32))
    )
    np.testing.assert_allclose(ya, yb, rtol=1e-5, atol=1e-5)


@pytest.mark.parametrize("g,bps", [(8, 2), (16, 4), (16, 3), (32, 4)])
def test_window_multiblock_steps(g, bps):
    """bps > 1 runs several blocks per grid step (in-kernel sub-block loop)
    and pads nblocks to a bps multiple; results must match bps=1 exactly."""
    coo = synth.fem_like(m=6000, n=6000, nnz=60000, spread=700, lo=4, hi=16, seed=7)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=1)
    base = W.prepare_window(csr, g=g, bps=1)
    multi = W.prepare_window(csr, g=g, bps=bps)
    assert multi.nblocks % bps == 0
    y1 = np.asarray(W.window_spmv(base, jnp.asarray(x, jnp.float32)))
    y2 = np.asarray(W.window_spmv(multi, jnp.asarray(x, jnp.float32)))
    np.testing.assert_array_equal(y1, y2)
    rep = vectors_diff(y2.astype(np.float64), serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_window_multiblock_requires_sublane_group():
    coo = synth.fem_like(m=2000, n=2000, nnz=14000, spread=400, lo=4, hi=10, seed=3)
    csr = S.coo_to_csr(coo)
    with pytest.raises(WindowError):
        W.prepare_window(csr, g=12, bps=2)  # g % 8 != 0


def test_window_xdirect_single_block():
    """xdirect bakes Q with raw x chunk-rows: whole matrix in one block,
    kernel takes x with no pad/shift chain; must match standard baking."""
    coo = synth.fem_like(m=3000, n=3000, nnz=20000, spread=900, lo=4, hi=10, seed=9)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=2)
    # xdirect is opt-in since the on-TPU A/B (the standard staging
    # measured faster on delaunay); pin it to cover the path
    auto = W.prepare_window_auto(csr, xdirect=True)
    assert auto.xdirect and auto.nblocks == 1
    std = W.prepare_window(csr, g=auto.g, xdirect=False)
    ya = np.asarray(W.window_spmv(auto, jnp.asarray(x, jnp.float32)))
    ys = np.asarray(W.window_spmv(std, jnp.asarray(x, jnp.float32)))
    np.testing.assert_allclose(ya, ys, rtol=1e-6)
    rep = vectors_diff(ya.astype(np.float64), serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_window_xdirect_rejects_multiblock():
    coo = synth.fem_like(m=40000, n=40000, nnz=250000, spread=2000, lo=4, hi=10, seed=4)
    csr = S.coo_to_csr(coo)
    with pytest.raises(WindowError):
        W.prepare_window(csr, g=8, xdirect=True)


def test_window_bps_vmem_cap():
    """An explicit bps whose per-step slot residency exceeds the VMEM row
    cap must be rejected up front, not crash Mosaic at compile time."""
    coo = synth.fem_like(m=6000, n=6000, nnz=60000, spread=700, lo=4, hi=16, seed=7)
    csr = S.coo_to_csr(coo)
    mat = W.prepare_window(csr, g=8, bps=1)
    # pin the cap so k_pad cannot shrink under a higher bps (the auto cap
    # scan is free to trade k_pad down to fit the residency cap)
    cap = mat.k_c // 8
    too_many = (W._K_CAP // mat.k_pad) + 1
    with pytest.raises(WindowError):
        W.prepare_window(csr, g=8, cap=cap, bps=too_many)


def test_window_auto_pinned_xdirect_requires_single_block():
    """prepare_window_auto(xdirect=True) must only consider single-block
    configs — a multi-block matrix has none, so the pin is an error."""
    coo = synth.fem_like(m=40000, n=40000, nnz=250000, spread=2000, lo=4, hi=10, seed=4)
    csr = S.coo_to_csr(coo)
    with pytest.raises(WindowError):
        W.prepare_window_auto(csr, xdirect=True)


def test_window_auto_cap_honors_max_pad_and_bps():
    """cap='auto' must scan with the caller's max_pad and bps: a relaxed
    padding budget admits hub matrices the 4.5 default rejects, and the
    chosen cap must fit the per-step residency at the requested bps."""
    rng = np.random.default_rng(0)
    r = np.r_[np.zeros(64, np.int64), rng.integers(0, 256, 510)]
    c = np.r_[np.arange(64), rng.integers(0, 256, 510)]
    coo = sort_coo(
        COOMatrix(shape=(256, 256), rows=r, cols=c, vals=np.ones(r.size))
    )
    csr = S.coo_to_csr(coo)
    with pytest.raises(WindowError):
        W.prepare_window(csr, g=2, cap="auto")  # default 4.5x budget
    mat = W.prepare_window(csr, g=2, cap="auto", max_pad=30.0)
    mat8 = W.prepare_window(csr, g=8, cap="auto", bps=8, max_pad=30.0)
    assert mat8.k_pad * 8 <= W._K_CAP
    x = rng.standard_normal(256)
    for m in (mat, mat8):
        y = np.asarray(W.window_spmv(m, jnp.asarray(x, jnp.float32)))
        rep = vectors_diff(y.astype(np.float64), serial_csr_spmv(csr, x))
        assert rep.ok, rep


@pytest.mark.parametrize("g,bps", [(8, 2), (8, 8), (16, 4)])
def test_window_shared_staging(g, bps):
    """shared_w (union window staged+transposed once per step, Q baked
    union-relative) must reproduce the per-sub-block staging exactly,
    including nblocks padding to a bps multiple."""
    coo = synth.fem_like(m=6000, n=6000, nnz=60000, spread=700, lo=4, hi=16, seed=7)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=1)
    base = W.prepare_window(csr, g=g, bps=1)
    per_sub = W.prepare_window(csr, g=g, bps=bps, shared_w=False)
    shared = W.prepare_window(csr, g=g, bps=bps, shared_w=True)
    assert shared.shared_w and not per_sub.shared_w
    y1 = np.asarray(W.window_spmv(base, jnp.asarray(x, jnp.float32)))
    y2 = np.asarray(W.window_spmv(per_sub, jnp.asarray(x, jnp.float32)))
    y3 = np.asarray(W.window_spmv(shared, jnp.asarray(x, jnp.float32)))
    np.testing.assert_array_equal(y1, y2)
    np.testing.assert_array_equal(y1, y3)
    rep = vectors_diff(y3.astype(np.float64), serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_window_shared_staging_df():
    """Double-float mode through the shared union stage."""
    coo = synth.fem_like(m=4000, n=4000, nnz=36000, spread=500, lo=4, hi=12, seed=5)
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=2)
    mat = W.prepare_window(csr, g=8, bps=4, shared_w=True, df=True)
    y = np.asarray(W.window_spmv(mat, jnp.asarray(x, jnp.float64)))
    err = np.abs(y - serial_csr_spmv(csr, x)).max()
    assert err < 1e-10, err


def test_window_shared_staging_span_cap():
    """A union span past 128 window rows must be rejected when pinned on
    (and silently disabled when auto)."""
    coo = synth.fem_like(m=60000, n=60000, nnz=400000, spread=6000, lo=4, hi=10, seed=3)
    csr = S.coo_to_csr(coo)
    wr, nspecs, _nb = W._geometry(csr, 16)
    bps = 8
    if ((bps - 1) * 2 + nspecs) * 8 <= 128:
        pytest.skip("span unexpectedly fits")
    with pytest.raises(WindowError):
        W.prepare_window(csr, g=16, bps=bps, shared_w=True)
    auto = W.prepare_window(csr, g=16, bps=bps)
    assert not auto.shared_w


def test_window_multiband_caps():
    """Tuple caps run the multi-band peel: every band joins the mod-8 fold
    region (k_c = 8*sum), intermediate k_c values the pow2 single-cap
    ladder cannot express, same kernel, exact results."""
    coo = synth.fem_like(
        m=30000, n=30000, nnz=300000, spread=1500, lo=4, hi=14, seed=5
    )
    csr = S.coo_to_csr(coo)
    x = fill_rnd_vector(csr.shape[1], seed=2)
    oracle = serial_csr_spmv(csr, x)
    xj = jnp.asarray(x, jnp.float32)
    single = W.prepare_window(csr, g=24, cap=16, bps=1, max_pad=8.0)
    multi = W.prepare_window(csr, g=24, cap=(16, 8), bps=1, max_pad=8.0)
    assert multi.k_c == 8 * 24
    # the extra band absorbs overflow slots into the fold region
    assert multi.k_pad - multi.k_c < single.k_pad - single.k_c
    for mat in (single, multi):
        y = np.asarray(W.window_spmv(mat, xj), np.float64)[: csr.shape[0]]
        rep = vectors_diff(y, oracle)
        assert rep.ok, rep


def test_cap_bands_decomposition():
    assert W._cap_bands(12) == (8, 4)
    assert W._cap_bands(16) == (16,)
    assert W._cap_bands((16, 8)) == (16, 8)
    assert W._cap_bands(28) == (16, 8, 4)
    with pytest.raises(WindowError):
        W._cap_bands((12, 4))  # non-pow2 band
    with pytest.raises(WindowError):
        W._cap_bands(0)
