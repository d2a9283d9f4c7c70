"""Partitioner property tests (port of the reference's embedded unit test
sparseUtils.c:237-306 + coverage invariants)."""
import numpy as np
import pytest

import spmv_openmp_cuda_tpu as S
from spmv_openmp_cuda_tpu.partition.partitioners import (
    check_cols_offsets_partitioning,
    cols_offsets_partitioning,
    cols_partitioning,
    ell_transpose,
    invert_permutation,
    partition_balance,
    row_binning,
    spmat_diff,
)
from spmv_openmp_cuda_tpu.utils import synth


@pytest.mark.parametrize("grid_cols", [1, 2, 8, 13])
def test_offsets_partitioning_invariants(medium_coo, grid_cols):
    coo, _ = medium_coo
    csr = S.coo_to_csr(coo)
    off = cols_offsets_partitioning(csr, grid_cols)
    check_cols_offsets_partitioning(csr, off)


def test_partition_balance_sums_to_nnz(medium_coo):
    coo, _ = medium_coo
    csr = S.coo_to_csr(coo)
    off = cols_offsets_partitioning(csr, 8)
    bal = partition_balance(off, 4)
    assert bal.shape == (4, 8)
    assert bal.sum() == csr.nnz


@pytest.mark.parametrize("grid_cols", [2, 5, 8])
def test_cols_partitioning_reassembles(medium_coo, grid_cols):
    coo, dense = medium_coo
    csr = S.coo_to_csr(coo)
    parts = cols_partitioning(csr, grid_cols)
    assert sum(p.nnz for p in parts) == csr.nnz
    acc = np.zeros(csr.shape)
    for p in parts:
        acc += p.to_dense()
    np.testing.assert_allclose(acc, dense)


def test_cols_partitioning_column_ranges(medium_coo):
    coo, _ = medium_coo
    csr = S.coo_to_csr(coo)
    gc = 4
    parts = cols_partitioning(csr, gc)
    from spmv_openmp_cuda_tpu.formats.matrix import fair_splits

    splits = fair_splits(csr.shape[1], gc)
    for j, p in enumerate(parts):
        if p.nnz:
            assert p.indices.min() >= splits[j]
            assert p.indices.max() < splits[j + 1]


def test_ell_transpose_roundtrip(small_coo):
    coo, dense = small_coo
    ell = S.coo_to_ell(coo)
    t = ell_transpose(ell)
    assert t.ja.shape == (ell.ja.shape[1], ell.ja.shape[0])
    np.testing.assert_array_equal(t.ja.T, ell.ja)
    np.testing.assert_array_equal(t.data.T, ell.data)


def test_row_binning_orders_by_length():
    coo = synth.power_law(100, 100, 5.0, seed=1)
    csr = S.coo_to_csr(coo)
    rl = csr.compute_row_lens()
    perm = row_binning(rl)
    sorted_lens = rl[perm]
    assert np.all(np.diff(sorted_lens) <= 0)
    inv = invert_permutation(perm)
    np.testing.assert_array_equal(perm[inv], np.arange(100))


def test_spmat_diff(small_coo):
    coo, _ = small_coo
    a = S.coo_to_csr(coo)
    b = S.coo_to_csr(coo)
    assert spmat_diff(a, b)
    b.data = b.data.copy()
    b.data[0] += 1.0
    assert not spmat_diff(a, b)


def test_ell_transpose_to_dense(small_coo):
    coo, dense = small_coo
    ell = S.coo_to_ell(coo)
    t = ell_transpose(ell)
    assert t.slab_transposed
    np.testing.assert_allclose(t.to_dense(), dense)
