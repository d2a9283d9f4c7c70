"""MatrixMarket I/O tests: typecodes, symmetric expansion, compression
(reference parser behaviors: parser.c:49-91 pattern/real/integer + symmetric
mirroring; utils.c:433-462 compressed input)."""
import numpy as np
import pytest

from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix
from spmv_openmp_cuda_tpu.io.mmio import MMError, read_coo, write_mtx, mm_to_csr


def test_real_general_roundtrip(tmp_path, small_coo):
    coo, dense = small_coo
    p = str(tmp_path / "m.mtx")
    write_mtx(p, coo)
    back = read_coo(p)
    np.testing.assert_allclose(back.to_dense(), dense)


def test_pattern_matrix(tmp_path):
    coo = COOMatrix((4, 4), np.array([0, 1, 2]), np.array([1, 2, 3]), np.ones(3))
    p = str(tmp_path / "p.mtx")
    write_mtx(p, coo, field="pattern")
    back = read_coo(p)
    # pattern entries get val = 1.0 (parser.c:60-61 analog)
    np.testing.assert_allclose(back.vals, 1.0)
    assert back.nnz == 3


def test_integer_matrix(tmp_path):
    coo = COOMatrix((3, 3), np.array([0, 2]), np.array([0, 1]), np.array([5.0, -7.0]))
    p = str(tmp_path / "i.mtx")
    write_mtx(p, coo, field="integer")
    back = read_coo(p)
    np.testing.assert_allclose(back.to_dense(), coo.to_dense())


def test_symmetric_expansion(tmp_path):
    # lower triangle stored; off-diagonals must be mirrored
    # (parser.c:85-91: expanded NZ = 2*stored - diagonal)
    rows = np.array([0, 1, 2, 2])
    cols = np.array([0, 0, 1, 2])
    vals = np.array([1.0, 2.0, 3.0, 4.0])
    coo = COOMatrix((3, 3), rows, cols, vals)
    p = str(tmp_path / "s.mtx")
    write_mtx(p, coo, symmetry="symmetric")
    back = read_coo(p)
    assert back.nnz == 2 * 4 - 2  # 2 diagonal entries
    d = back.to_dense()
    np.testing.assert_allclose(d, d.T)
    assert d[1, 0] == 2.0 and d[0, 1] == 2.0


@pytest.mark.parametrize("ext", ["gz", "xz", "bz2"])
def test_compressed_inputs(tmp_path, small_coo, ext):
    coo, dense = small_coo
    p = str(tmp_path / f"m.mtx.{ext}")
    write_mtx(p, coo)
    back = read_coo(p)
    np.testing.assert_allclose(back.to_dense(), dense)


def test_rejects_dense_array_format(tmp_path):
    p = tmp_path / "d.mtx"
    p.write_text("%%MatrixMarket matrix array real general\n2 2\n1\n2\n3\n4\n")
    with pytest.raises(MMError):
        read_coo(str(p))


def test_rejects_bad_banner(tmp_path):
    p = tmp_path / "b.mtx"
    p.write_text("not a matrix market file\n1 1 0\n")
    with pytest.raises(MMError):
        read_coo(str(p))


def test_nnz_count_mismatch(tmp_path):
    p = tmp_path / "c.mtx"
    p.write_text("%%MatrixMarket matrix coordinate real general\n2 2 3\n1 1 1.0\n")
    with pytest.raises(MMError):
        read_coo(str(p))


def test_mm_to_csr_oneshot(tmp_path, small_coo):
    coo, dense = small_coo
    p = str(tmp_path / "m.mtx")
    write_mtx(p, coo)
    csr = mm_to_csr(p)
    np.testing.assert_allclose(csr.to_dense(), dense)


def test_symmetric_requires_square(tmp_path):
    import pytest as _pytest
    from spmv_openmp_cuda_tpu.io.mmio import MMError, read_coo

    p = str(tmp_path / "bad.mtx")
    with open(p, "w") as f:
        f.write("%%MatrixMarket matrix coordinate real symmetric\n3 2 1\n3 2 1.5\n")
    with _pytest.raises(MMError, match="square"):
        read_coo(p)


def test_write_read_zip_roundtrip(tmp_path):
    from spmv_openmp_cuda_tpu.io.mmio import read_coo, write_mtx
    from spmv_openmp_cuda_tpu.utils import synth

    coo = synth.random_uniform(40, 30, 0.1, seed=2)
    p = str(tmp_path / "m.mtx.zip")
    write_mtx(p, coo)
    coo2 = read_coo(p)
    np.testing.assert_allclose(coo2.to_dense(), coo.to_dense())
