"""Double-float (float-float) arithmetic + the f64-semantics DIA engine.

The reference is double-precision throughout (reference
src/include/macros.h:63-76); these tests prove the df engines carry
genuinely double-class precision (~1e-12 relative on O(1) inputs), not
relabeled f32 (~1e-6 on the same inputs).
"""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.config import Config
from spmv_openmp_cuda_tpu.ops.dfloat import (
    df_combine64,
    df_mul_acc,
    split_f64,
    two_prod,
    two_sum,
)
from spmv_openmp_cuda_tpu.utils import synth


def test_two_sum_exact():
    rng = np.random.default_rng(0)
    a = rng.standard_normal(4096).astype(np.float32)
    b = (rng.standard_normal(4096) * 1e-6).astype(np.float32)
    s, e = jax.jit(two_sum)(jnp.asarray(a), jnp.asarray(b))
    s, e = np.asarray(s), np.asarray(e)
    # TwoSum is EXACT: s + e == a + b in real arithmetic; both summands
    # are f32-representable so the f64 check is exact too
    np.testing.assert_array_equal(
        s.astype(np.float64) + e.astype(np.float64),
        a.astype(np.float64) + b.astype(np.float64),
    )


def test_two_prod_exact():
    rng = np.random.default_rng(1)
    a = rng.standard_normal(4096).astype(np.float32)
    b = rng.standard_normal(4096).astype(np.float32)
    p, e = jax.jit(two_prod)(jnp.asarray(a), jnp.asarray(b))
    p, e = np.asarray(p), np.asarray(e)
    # Dekker TwoProduct is exact: p + e == a * b (f64 product of two f32s
    # is exact: 24+24 mantissa bits fit in 53)
    np.testing.assert_array_equal(
        p.astype(np.float64) + e.astype(np.float64),
        a.astype(np.float64) * b.astype(np.float64),
    )


def test_df_dot_precision():
    """A K-term dot product in df stays ~1e-13 relative where plain f32
    accumulation drifts to ~1e-6."""
    rng = np.random.default_rng(2)
    k = 4096
    a = rng.standard_normal(k)
    b = rng.standard_normal(k)
    want = float(np.sum(a * b))  # f64 oracle (well-conditioned inputs)
    ah, al = split_f64(a)
    bh, bl = split_f64(b)

    @jax.jit
    def df_dot(ah, al, bh, bl):
        # sequential accumulate over sublane rows of a (32, 128) layout —
        # the same op mix the kernels use
        acc_h = jnp.zeros((1, 128), jnp.float32)
        acc_l = jnp.zeros((1, 128), jnp.float32)
        A, Al, B, Bl = (v.reshape(32, 128) for v in (ah, al, bh, bl))
        for i in range(32):
            acc_h, acc_l = df_mul_acc(
                acc_h, acc_l, A[i : i + 1], Al[i : i + 1], B[i : i + 1],
                Bl[i : i + 1],
            )
        return acc_h, acc_l

    h, l = df_dot(*(jnp.asarray(v) for v in (ah, al, bh, bl)))
    # combine on the host (this test runs without jax x64 enabled)
    got = float(
        np.sum(
            np.asarray(h).astype(np.float64) + np.asarray(l).astype(np.float64)
        )
    )
    f32 = float(
        np.sum(a.astype(np.float32) * b.astype(np.float32), dtype=np.float32)
    )
    scale = float(np.sum(np.abs(a * b)))
    assert abs(got - want) / scale < 1e-12, (got, want)
    # plain f32 is measurably worse (numpy pairwise summation keeps it
    # ~1e-9 here; the df result is still 3+ orders tighter)
    assert abs(f32 - want) / scale > 1e-10


@pytest.mark.parametrize("preset", ["cavity10_like"])
def test_dia_df_engine_precision(preset):
    """PL_DIA_F64 matches the numpy f64 serial oracle to ~1e-12 relative on
    O(1)-magnitude inputs, where the f32 DIA engine sits orders above."""
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.ops.spmv_pallas import (
        dia_spmv_pallas,
        dia_spmv_pallas_df,
        pad_dia_for_pallas,
        plan_dia,
        prepare_dia_df_pallas,
    )
    from spmv_openmp_cuda_tpu.formats.dia import prepare_dia

    cfg = Config(dtype="float64")  # enables jax x64
    assert cfg.dtype == "float64"
    csr = S.coo_to_csr(synth.preset(preset))
    rng = np.random.default_rng(5)
    x = rng.standard_normal(csr.shape[1])  # O(1), NOT the tiny bench caps
    want = serial_csr_spmv(csr, x)
    scale = float(np.abs(want).max())

    mat, plan = prepare_dia_df_pallas(csr)
    y = np.asarray(
        jax.jit(lambda m, p, xv: dia_spmv_pallas_df(m, xv, p), static_argnums=1)(
            mat, plan, jnp.asarray(x, jnp.float64)
        ),
        np.float64,
    )
    assert y.dtype == np.float64
    df_err = float(np.abs(y - want).max()) / scale

    mat32 = prepare_dia(csr, dtype=jnp.float32)
    plan32 = plan_dia(mat32)
    mat32 = pad_dia_for_pallas(mat32, plan32)
    y32 = np.asarray(
        jax.jit(lambda m, p, xv: dia_spmv_pallas(m, xv, p), static_argnums=1)(
            mat32, plan32, jnp.asarray(x, jnp.float32)
        ),
        np.float64,
    )
    f32_err = float(np.abs(y32 - want).max()) / scale

    assert df_err < 1e-11, df_err
    assert f32_err > 1e-7, f32_err  # the df gap is real on this input
    assert df_err < f32_err / 1e4


def test_dia_df_serialize_roundtrip(tmp_path):
    """(DeviceDIADF, plan) pairs checkpoint like the f32 DIA pair."""
    from spmv_openmp_cuda_tpu.formats.serialize import (
        load_prepared,
        save_prepared,
    )
    from spmv_openmp_cuda_tpu.ops.spmv_pallas import prepare_dia_df_pallas

    csr = S.coo_to_csr(synth.banded(1000, 1000, 5, fill=0.9, seed=9))
    ops = prepare_dia_df_pallas(csr)
    p = str(tmp_path / "df.npz")
    save_prepared(p, ops)
    mat2, plan2 = load_prepared(p)
    np.testing.assert_array_equal(np.asarray(ops[0].data), np.asarray(mat2.data))
    np.testing.assert_array_equal(
        np.asarray(ops[0].data_lo), np.asarray(mat2.data_lo)
    )
    assert plan2 == ops[1] and mat2.offsets == ops[0].offsets


def test_auto_f64_routes_to_df():
    """AutoSpMV with dtype float64 rides the double-float DIA for
    diagonal-concentrated matrices (including the dia_resid class) and
    returns f64 results within tolerance."""
    from spmv_openmp_cuda_tpu.models.auto import AutoSpMV
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.utils.compare import vectors_diff

    cfg = Config(dtype="float64")
    csr = S.coo_to_csr(synth.preset("cavity10_like"))
    model = AutoSpMV.from_csr(csr, cfg=cfg)
    assert model.format == "dia"
    from spmv_openmp_cuda_tpu.formats.dia import DeviceDIADF

    assert isinstance(model._operands[0], DeviceDIADF)
    x = fill_rnd_vector(csr.shape[1], seed=4)
    y = np.asarray(model(x))
    assert y.dtype == np.float64
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_dia_resid_df_engine_precision():
    """PL_DIA_RESID_F64 (df core + df residual fringe) matches the f64
    oracle to ~1e-12 relative on O(1) inputs (raefsky band+fringe class)."""
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.ops.spmv_pallas import (
        dia_spmv_pallas_df,
        prepare_dia_resid,
    )

    Config(dtype="float64")
    csr = S.coo_to_csr(synth.preset("raefsky1_like"))
    dr, plan = prepare_dia_resid(csr, df=True)
    assert dr.rvals_lo is not None and dr.nnz_resid > 0
    rng = np.random.default_rng(12)
    x = rng.standard_normal(csr.shape[1])
    want = serial_csr_spmv(csr, x)
    y = np.asarray(
        jax.jit(
            lambda d, p, xv: dia_spmv_pallas_df(d.mat, xv, p, resid=d),
            static_argnums=1,
        )(dr, plan, jnp.asarray(x, jnp.float64)),
        np.float64,
    )
    assert y.dtype == np.float64
    scale = float(np.abs(want).max())
    err = float(np.abs(y - want).max()) / scale
    assert err < 1e-11, err


@pytest.mark.parametrize("xdirect", [False, True])
def test_window_df_engine_precision(xdirect):
    """PL_CSR_WINDOW_F64 (both grid and xdirect paths) matches the f64
    oracle to ~1e-12 relative on O(1) inputs."""
    from spmv_openmp_cuda_tpu.formats.window import (
        prepare_window_auto,
        window_spmv,
    )
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv

    Config(dtype="float64")  # enable x64
    if xdirect:
        coo = synth.fem_like(3000, 3000, 27000, spread=900, lo=5, hi=14, seed=6)
    else:
        coo = synth.fem_like(
            40000, 40000, 360000, spread=4000, lo=5, hi=14, seed=6
        )
    csr = S.coo_to_csr(coo)
    # xdirect is opt-in since the on-TPU A/B; pin it to cover both paths
    mat = prepare_window_auto(csr, df=True, xdirect=xdirect or None)
    assert mat.xdirect == xdirect and mat.vals_lo is not None
    rng = np.random.default_rng(8)
    x = rng.standard_normal(csr.shape[1])
    want = serial_csr_spmv(csr, x)
    y = np.asarray(
        jax.jit(window_spmv)(mat, jnp.asarray(x, jnp.float64)), np.float64
    )
    assert y.dtype == np.float64
    scale = float(np.abs(want).max())
    err = float(np.abs(y - want).max()) / scale
    assert err < 1e-11, err


def test_window_df_multiblock_bps():
    """df + bps > 1 compose (the in-kernel sub-block loop runs the paired
    slabs): results match bps=1 exactly."""
    from spmv_openmp_cuda_tpu.formats.window import prepare_window, window_spmv

    Config(dtype="float64")
    csr = S.coo_to_csr(
        synth.fem_like(8000, 8000, 64000, spread=1500, lo=4, hi=12, seed=3)
    )
    rng = np.random.default_rng(9)
    x = jnp.asarray(rng.standard_normal(csr.shape[1]), jnp.float64)
    base = prepare_window(csr, g=16, bps=1, df=True)
    multi = prepare_window(csr, g=16, bps=4, df=True)
    y1 = np.asarray(window_spmv(base, x))
    y4 = np.asarray(window_spmv(multi, x))
    np.testing.assert_array_equal(y1, y4)


def test_auto_f64_window_routes_to_df():
    from spmv_openmp_cuda_tpu.models.auto import AutoSpMV
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.utils.compare import vectors_diff

    cfg = Config(dtype="float64")
    csr = S.coo_to_csr(
        synth.fem_like(20000, 20000, 160000, spread=3000, lo=4, hi=13, seed=7)
    )
    model = AutoSpMV.from_csr(csr, cfg=cfg)
    assert model.format == "window"
    assert model._operands.vals_lo is not None
    x = fill_rnd_vector(csr.shape[1], seed=4)
    y = np.asarray(model(x))
    assert y.dtype == np.float64
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_cli_save_load_dia_df(tmp_path, capsys):
    """--save-prepared / --load-prepared round-trips PL_DIA_F64."""
    from spmv_openmp_cuda_tpu.cli import main
    from spmv_openmp_cuda_tpu.io.mmio import write_mtx

    mtx = str(tmp_path / "m.mtx")
    write_mtx(mtx, synth.banded(400, 400, 4, fill=1.0, seed=2))
    ckpt = str(tmp_path / "prep.npz")
    rc = main([mtx, "RNDVECT", "PL_DIA_F64", "--check", "--no-dump",
               "--dtype", "float64", "--save-prepared", ckpt])
    assert rc == 0
    rc = main([mtx, "RNDVECT", "PL_DIA_F64", "--check", "--no-dump",
               "--dtype", "float64", "--load-prepared", ckpt])
    assert rc == 0
    out = capsys.readouterr().out
    assert "#check: OK" in out
    # the df checkpoint refuses to run under a non-df window/dia mode
    rc = main([mtx, "RNDVECT", "PL_CSR_WINDOW", "--check", "--no-dump",
               "--load-prepared", ckpt])
    assert rc == 1


def test_dia_df_registry_roundtrip():
    """PL_DIA_F64 runs through the registry ABI and returns f64."""
    from spmv_openmp_cuda_tpu.ops import registry
    from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
    from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
    from spmv_openmp_cuda_tpu.utils.compare import vectors_diff

    cfg = Config(dtype="float64")
    spec = registry.get("PL_DIA_F64")
    assert spec.f64
    coo = synth.banded(3000, 3000, 9, fill=0.85, seed=3)
    csr = S.coo_to_csr(coo)
    ops = spec.prepare(csr, None, cfg)
    x = fill_rnd_vector(csr.shape[1], seed=2)
    y = np.asarray(spec.jitted(ops)(jnp.asarray(x, jnp.float64)))
    assert y.dtype == np.float64
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep
