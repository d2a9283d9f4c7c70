"""AutoSpMV model API: format selection + end-to-end correctness."""
import numpy as np
import pytest

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.models.auto import AutoSpMV, select_format
from spmv_openmp_cuda_tpu.io.mmio import write_mtx
from spmv_openmp_cuda_tpu.io.vectors import fill_rnd_vector
from spmv_openmp_cuda_tpu.ops.oracle import serial_csr_spmv
from spmv_openmp_cuda_tpu.utils import synth
from spmv_openmp_cuda_tpu.utils.compare import vectors_diff


def test_select_format_policy():
    assert select_format(S.coo_to_csr(synth.banded(500, 500, 5, seed=1))) == "dia"
    # tiny scattered matrices fit one window block, but power-law hubs
    # blow the slot-padding cap — the scan must agree with prepare_window
    # on feasibility and keep them routed
    tiny = S.coo_to_csr(synth.power_law(400, 400, 5.0, seed=2))
    assert select_format(tiny) == "routed"
    big = S.coo_to_csr(synth.power_law(10000, 10000, 3.0, seed=3))
    assert select_format(big) == "routed"


@pytest.mark.parametrize("gen,fmt", [
    (lambda: synth.banded(300, 300, 6, fill=0.95, seed=4), "dia"),
    (lambda: synth.power_law(300, 280, 5.0, seed=5), "routed"),
    (lambda: synth.power_law(9000, 9000, 4.0, seed=7), "routed"),
])
def test_auto_spmv_correct(gen, fmt):
    coo = gen()
    csr = S.coo_to_csr(coo)
    model = AutoSpMV.from_csr(csr)
    assert model.format == fmt
    x = fill_rnd_vector(coo.shape[1], seed=6)
    y = np.asarray(model(x), np.float64)
    rep = vectors_diff(y, serial_csr_spmv(csr, x))
    assert rep.ok, rep


def test_auto_spmv_forced_format():
    coo = synth.banded(200, 200, 4, seed=7)
    csr = S.coo_to_csr(coo)
    for fmt in ("dia", "ell_t", "binned"):
        model = AutoSpMV.from_csr(csr, format=fmt)
        assert model.format == fmt
        x = fill_rnd_vector(200, seed=8)
        rep = vectors_diff(np.asarray(model(x), np.float64), serial_csr_spmv(csr, x))
        assert rep.ok, (fmt, rep)


def test_auto_spmv_from_file(tmp_path):
    coo = synth.banded(100, 100, 3, seed=9)
    p = str(tmp_path / "m.mtx")
    write_mtx(p, coo)
    model = AutoSpMV.from_file(p)
    x = fill_rnd_vector(100, seed=10)
    rep = vectors_diff(
        np.asarray(model(x), np.float64),
        serial_csr_spmv(S.coo_to_csr(coo), x),
    )
    assert rep.ok


def test_auto_spmv_float64_uses_xla_paths():
    # round 3: every structure class rides a double-float Pallas engine
    # (power-law -> df-routed; only explicit lanes falls back to binned)
    from spmv_openmp_cuda_tpu.config import Config

    for gen, want in [
        (synth.banded(400, 400, 4, seed=2), "dia"),
        (synth.power_law(500, 500, 5.0, seed=3), "routed"),
    ]:
        csr = S.coo_to_csr(gen)
        model = AutoSpMV.from_csr(csr, cfg=Config(dtype="float64"))
        assert model.format == want
        x = fill_rnd_vector(csr.shape[1], seed=4)
        y = np.asarray(model(x), np.float64)
        rep = vectors_diff(y, serial_csr_spmv(csr, x))
        assert rep.ok, rep
