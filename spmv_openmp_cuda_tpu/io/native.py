"""ctypes bindings to the native C++ ingestion backend (native/spmv_native.cpp).

The native library is the runtime analog of the reference's C ingestion layer
(mmio.c + parser.c); this wrapper handles decompression in Python, calls the
C ABI for parse/convert, and falls back to the pure-Python implementations in
io/mmio.py when the library is not built.
"""
from __future__ import annotations

import ctypes
import os
from typing import Optional

import numpy as np

from ..formats.matrix import COOMatrix, CSRMatrix, ELLMatrix

_LIB_PATHS = [
    os.path.join(os.path.dirname(__file__), "..", "..", "native", "libspmv_native.so"),
    os.path.join(os.path.dirname(__file__), "libspmv_native.so"),
]

_ERRORS = {
    1: "invalid MatrixMarket banner",
    2: "unsupported matrix type (dense/complex/skew?)",
    3: "invalid size line",
    4: "invalid entry",
    5: "entry count mismatch with header",
    6: "entry index out of bounds",
    7: "allocation failure",
}


class _SpmvCoo(ctypes.Structure):
    _fields_ = [
        ("m", ctypes.c_int64),
        ("n", ctypes.c_int64),
        ("nnz", ctypes.c_int64),
        ("rows", ctypes.POINTER(ctypes.c_int64)),
        ("cols", ctypes.POINTER(ctypes.c_int64)),
        ("vals", ctypes.POINTER(ctypes.c_double)),
        ("row_lens", ctypes.POINTER(ctypes.c_int64)),
    ]


_lib: Optional[ctypes.CDLL] = None


def load_library() -> Optional[ctypes.CDLL]:
    global _lib
    if _lib is not None:
        return _lib
    for p in _LIB_PATHS:
        if os.path.exists(p):
            lib = ctypes.CDLL(os.path.abspath(p))
            lib.spmv_parse_mtx.argtypes = [
                ctypes.c_char_p,
                ctypes.c_int64,
                ctypes.POINTER(_SpmvCoo),
            ]
            lib.spmv_parse_mtx.restype = ctypes.c_int
            lib.spmv_free_coo.argtypes = [ctypes.POINTER(_SpmvCoo)]
            lib.spmv_coo_to_csr.restype = ctypes.c_int
            lib.spmv_coo_to_ell.restype = ctypes.c_int
            _lib = lib
            return lib
    return None


def available() -> bool:
    return load_library() is not None


def parse_mtx_bytes(data: bytes) -> COOMatrix:
    """Parse a MatrixMarket body (already decompressed) natively."""
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built (make -C native)")
    out = _SpmvCoo()
    rc = lib.spmv_parse_mtx(data, len(data), ctypes.byref(out))
    if rc != 0:
        raise ValueError(f"native parse failed: {_ERRORS.get(rc, rc)}")
    try:
        nnz, m = int(out.nnz), int(out.m)
        rows = np.ctypeslib.as_array(out.rows, shape=(nnz,)).copy() if nnz else np.empty(0, np.int64)
        cols = np.ctypeslib.as_array(out.cols, shape=(nnz,)).copy() if nnz else np.empty(0, np.int64)
        vals = np.ctypeslib.as_array(out.vals, shape=(nnz,)).copy() if nnz else np.empty(0, np.float64)
        rl = np.ctypeslib.as_array(out.row_lens, shape=(max(m, 1),))[:m].copy()
    finally:
        lib.spmv_free_coo(ctypes.byref(out))
    return COOMatrix((m, int(out.n)), rows, cols, vals, row_lens=rl)


def read_coo_native(path: str) -> COOMatrix:
    """File -> sorted COO via the native parser (with transparent
    decompression handled Python-side). Runs the entries through sort_coo so
    duplicate-entry merging matches the pure-Python reader exactly."""
    from ..formats.convert import sort_coo
    from .mmio import _open_maybe_compressed

    with _open_maybe_compressed(path) as f:
        data = f.read()
    out = sort_coo(parse_mtx_bytes(data))
    out.compute_row_lens()  # dedup merging may change lengths; recompute
    return out


def coo_to_csr_native(coo: COOMatrix) -> CSRMatrix:
    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built")
    m = coo.shape[0]
    rl = coo.compute_row_lens().astype(np.int64)
    indptr = np.zeros(m + 1, dtype=np.int64)
    indices = np.zeros(coo.nnz, dtype=np.int64)
    data = np.zeros(coo.nnz, dtype=np.float64)
    rc = lib.spmv_coo_to_csr(
        ctypes.c_int64(m),
        ctypes.c_int64(coo.nnz),
        np.ascontiguousarray(coo.rows, dtype=np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(coo.cols, dtype=np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(coo.vals, dtype=np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        rl.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indptr.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        indices.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError(f"native COO->CSR failed: {_ERRORS.get(rc, rc)}")
    return CSRMatrix(coo.shape, indptr, indices, data, row_lens=rl)


_CAP_DEFAULT = object()  # sentinel: "apply the default ELL cap"


def coo_to_ell_native(coo: COOMatrix, max_entries=_CAP_DEFAULT) -> ELLMatrix:
    """max_entries=None disables the cap, matching convert.coo_to_ell."""
    from ..config import ELL_MAX_ENTRIES
    from ..formats.convert import EllSizeError

    lib = load_library()
    if lib is None:
        raise RuntimeError("native library not built")
    m = coo.shape[0]
    rl = coo.compute_row_lens().astype(np.int64)
    w = int(rl.max(initial=0))
    cap = ELL_MAX_ENTRIES if max_entries is _CAP_DEFAULT else max_entries
    if cap is not None and 2 * m * w > cap:
        raise EllSizeError(f"ELL padded entries 2*{m}*{w} exceed cap {cap}")
    wa = max(w, 1)
    ja = np.zeros((m, wa), dtype=np.int64)
    data = np.zeros((m, wa), dtype=np.float64)
    rc = lib.spmv_coo_to_ell(
        ctypes.c_int64(m),
        ctypes.c_int64(coo.nnz),
        np.ascontiguousarray(coo.rows, dtype=np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(coo.cols, dtype=np.int64).ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        np.ascontiguousarray(coo.vals, dtype=np.float64).ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(wa),
        ja.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
    )
    if rc != 0:
        raise ValueError(f"native COO->ELL failed: {_ERRORS.get(rc, rc)}")
    return ELLMatrix(coo.shape, ja, data, max_row_nz=w, nnz=coo.nnz, row_lens=rl)


def color_bipartite_native(
    left: np.ndarray, right: np.ndarray, n_colors: int
) -> Optional[np.ndarray]:
    """Edge-color a bipartite multigraph with the native Euler-split router
    (planning core of ops/route.py). Returns None when the library is not
    built (caller falls back to the numpy implementation)."""
    lib = load_library()
    if lib is None:
        return None
    if not hasattr(lib, "spmv_color_bipartite"):
        return None
    fn = lib.spmv_color_bipartite
    fn.restype = ctypes.c_int
    e = left.shape[0]
    left = np.ascontiguousarray(left, dtype=np.int64)
    right = np.ascontiguousarray(right, dtype=np.int64)
    out = np.empty(e, dtype=np.int64)
    bits = int(n_colors).bit_length() - 1
    rc = fn(
        ctypes.c_int64(e),
        left.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        right.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(int(left.max()) + 1 if e else 1),
        ctypes.c_int64(int(right.max()) + 1 if e else 1),
        ctypes.c_int(bits),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def window_scan_native(
    rq: np.ndarray, lane: np.ndarray, q: np.ndarray, jres: np.ndarray,
    g: int, nblocks: int,
):
    """Fused per-g window-prepare scan (formats/window.py): returns
    (d_min, d_max, hl, hr) where hl/hr are the (nblocks, 8, 128) int32
    per-(block, gid%8) lane/residue degree histograms. None when the
    library is not built (caller falls back to the numpy passes)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "spmv_window_scan"):
        return None
    fn = lib.spmv_window_scan
    fn.restype = ctypes.c_int
    nnz = rq.shape[0]
    arrs = [np.ascontiguousarray(a, dtype=np.int64) for a in (rq, lane, q, jres)]
    hl = np.empty((nblocks, 8, 128), dtype=np.int32)
    hr = np.empty((nblocks, 8, 128), dtype=np.int32)
    d_min = ctypes.c_int64()
    d_max = ctypes.c_int64()
    rc = fn(
        ctypes.c_int64(nnz),
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for a in arrs),
        ctypes.c_int64(g),
        ctypes.c_int64(nblocks),
        ctypes.byref(d_min),
        ctypes.byref(d_max),
        hl.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
        hr.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)),
    )
    if rc != 0:
        return None
    return int(d_min.value), int(d_max.value), hl, hr


def rank_in_group_native(
    key: np.ndarray, stride: int, nblocks: int
) -> Optional[np.ndarray]:
    """Stable rank within equal keys for keys whose key // stride prefix is
    non-decreasing (CSR row order): O(n) threaded native pass replacing the
    argsort in formats/window.py. None when the library is not built."""
    lib = load_library()
    if lib is None or not hasattr(lib, "spmv_rank_in_group"):
        return None
    fn = lib.spmv_rank_in_group
    fn.restype = ctypes.c_int
    key = np.ascontiguousarray(key, dtype=np.int64)
    out = np.empty(key.shape[0], dtype=np.int64)
    rc = fn(
        ctypes.c_int64(key.shape[0]),
        key.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ctypes.c_int64(stride),
        ctypes.c_int64(nblocks),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
    )
    if rc != 0:
        return None
    return out


def window_fill_native(
    rq: np.ndarray, lane: np.ndarray, q: np.ndarray, jres: np.ndarray,
    srow: np.ndarray, data: np.ndarray, g: int, k_pad: int, k_c: int,
    n_ktiles: int, wr: int, bps: int, mode: int,
    vals: np.ndarray, sidx: np.ndarray, gslab: np.ndarray, rsrc: np.ndarray,
) -> bool:
    """Fused slot-slab scatter + Q bake for prepare_window (one threaded
    pass; packing guarantees distinct cells). mode: 0 standard, 1 xdirect,
    2 shared_w. Returns False when the library is not built (caller runs
    the numpy scatters)."""
    lib = load_library()
    if lib is None or not hasattr(lib, "spmv_window_fill"):
        return False
    fn = lib.spmv_window_fill
    fn.restype = ctypes.c_int
    arrs = [
        np.ascontiguousarray(a, dtype=np.int64)
        for a in (rq, lane, q, jres, srow)
    ]
    data = np.ascontiguousarray(data, dtype=np.float64)
    assert vals.flags.c_contiguous and sidx.flags.c_contiguous
    assert gslab.flags.c_contiguous and rsrc.flags.c_contiguous
    rc = fn(
        ctypes.c_int64(rq.shape[0]),
        *(a.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)) for a in arrs),
        data.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        ctypes.c_int64(g),
        ctypes.c_int64(k_pad),
        ctypes.c_int64(k_c),
        ctypes.c_int64(n_ktiles),
        ctypes.c_int64(wr),
        ctypes.c_int64(max(bps, 1)),
        ctypes.c_int(mode),
        vals.ctypes.data_as(ctypes.POINTER(ctypes.c_double)),
        sidx.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        gslab.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
        rsrc.ctypes.data_as(ctypes.POINTER(ctypes.c_int8)),
    )
    return rc == 0
