"""Format + conversion tests (reference CONSISTENCY_CHECKS analog,
parser.c:94-97,187,195-202, plus scipy cross-checks)."""
import numpy as np
import pytest
import scipy.sparse as sp

from spmv_openmp_cuda_tpu.formats.matrix import COOMatrix, fair_splits
from spmv_openmp_cuda_tpu.formats.convert import (
    EllSizeError,
    check_sorted,
    coo_to_csr,
    coo_to_ell,
    csr_to_coo,
    sort_coo,
)


def test_coo_to_csr_matches_scipy(small_coo):
    coo, dense = small_coo
    csr = coo_to_csr(coo)
    ref = sp.csr_matrix(dense)
    np.testing.assert_array_equal(csr.indptr, ref.indptr)
    np.testing.assert_array_equal(csr.indices, ref.indices)
    np.testing.assert_allclose(csr.data, ref.data)
    np.testing.assert_allclose(csr.to_dense(), dense)


def test_coo_to_ell_roundtrip(small_coo):
    coo, dense = small_coo
    ell = coo_to_ell(coo)
    assert ell.max_row_nz == int(np.diff(coo_to_csr(coo).indptr).max())
    np.testing.assert_allclose(ell.to_dense(), dense)


def test_ell_size_cap():
    # one dense row of 100 cols with cap below 2*M*maxRow triggers rejection
    # (parser.c:223-232 analog)
    rows = np.zeros(100, dtype=np.int64)
    cols = np.arange(100, dtype=np.int64)
    coo = COOMatrix((50, 100), rows, cols, np.ones(100))
    with pytest.raises(EllSizeError):
        coo_to_ell(coo, max_entries=2 * 50 * 100 - 1)
    ell = coo_to_ell(coo, max_entries=2 * 50 * 100)
    assert ell.max_row_nz == 100


def test_sort_check_rejects_unsorted():
    coo = COOMatrix(
        (3, 3),
        np.array([0, 0, 1]),
        np.array([2, 1, 0]),
        np.array([1.0, 2.0, 3.0]),
    )
    with pytest.raises(ValueError):
        check_sorted(coo)
    s = sort_coo(coo)
    check_sorted(s)


def test_sort_coo_sums_duplicates():
    coo = COOMatrix(
        (2, 2),
        np.array([0, 0, 1]),
        np.array([1, 1, 0]),
        np.array([1.0, 2.0, 3.0]),
    )
    s = sort_coo(coo)
    assert s.nnz == 2
    d = s.to_dense()
    assert d[0, 1] == 3.0 and d[1, 0] == 3.0


def test_csr_to_coo_roundtrip(small_coo):
    coo, dense = small_coo
    back = csr_to_coo(coo_to_csr(coo))
    np.testing.assert_array_equal(back.rows, coo.rows)
    np.testing.assert_array_equal(back.cols, coo.cols)
    np.testing.assert_allclose(back.vals, coo.vals)


def test_fair_splits_balance():
    # UNIF_REMINDER_DISTRI analog: first rem blocks get one extra
    s = fair_splits(17, 5)
    sizes = np.diff(s)
    assert sizes.sum() == 17
    assert sizes.max() - sizes.min() <= 1
    assert list(sizes[:2]) == [4, 4] and list(sizes[2:]) == [3, 3, 3]


def test_empty_rows_and_cols():
    # rows with no nnz must produce zero outputs and valid formats
    coo = COOMatrix((5, 5), np.array([1, 3]), np.array([2, 4]), np.array([1.0, 2.0]))
    csr = coo_to_csr(coo)
    assert csr.indptr.tolist() == [0, 0, 1, 1, 2, 2]
    ell = coo_to_ell(coo)
    assert ell.max_row_nz == 1
    np.testing.assert_allclose(ell.to_dense(), coo.to_dense())


def test_vectors_diff_nan_is_bad():
    from spmv_openmp_cuda_tpu.utils.compare import vectors_diff

    a = np.array([1.0, np.nan, 3.0])
    b = np.array([1.0, 2.0, 3.0])
    rep = vectors_diff(a, b)
    assert not rep.ok and rep.num_exceeding == 1


def test_ell_to_dense_keeps_stored_zeros():
    from spmv_openmp_cuda_tpu.formats.matrix import ELLMatrix

    # row slab [0.0, 5.0]: a stored zero followed by a real entry must both
    # survive a missing-row_lens roundtrip
    ell = ELLMatrix(
        shape=(1, 3),
        ja=np.array([[0, 2]]),
        data=np.array([[0.0, 5.0]]),
        max_row_nz=2,
        nnz=2,
        row_lens=None,
    )
    np.testing.assert_allclose(ell.to_dense(), [[0.0, 0.0, 5.0]])
