// Native ingestion backend: fast MatrixMarket parsing + COO normalization.
//
// TPU-native equivalent of the reference's C ingestion layer (vendored NIST
// mmio src/lib/mmio.c + MM->COO parser src/lib/parser.c:30-153): banner and
// typecode validation, real/integer/pattern fields, symmetric expansion
// (off-diagonal mirroring), per-row length accumulation, and (row, col)
// sorting — implemented from scratch in C++17 with OpenMP-parallel sorting,
// exposed over a C ABI consumed via ctypes (io/native.py).
//
// Build: make -C native   ->  libspmv_native.so

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <string>
#include <vector>

#if defined(_OPENMP)
#include <omp.h>
#include <parallel/algorithm>
#define SORT __gnu_parallel::sort
#else
#define SORT std::sort
#endif

extern "C" {

// Error codes
enum {
  SPMV_OK = 0,
  SPMV_ERR_BANNER = 1,
  SPMV_ERR_UNSUPPORTED = 2,
  SPMV_ERR_SIZE_LINE = 3,
  SPMV_ERR_ENTRY = 4,
  SPMV_ERR_COUNT_MISMATCH = 5,
  SPMV_ERR_OOB = 6,
  SPMV_ERR_ALLOC = 7,
};

struct SpmvCoo {
  int64_t m, n, nnz;
  int64_t* rows;
  int64_t* cols;
  double* vals;
  int64_t* row_lens;  // length m
};

void spmv_free_coo(SpmvCoo* c) {
  if (!c) return;
  std::free(c->rows);
  std::free(c->cols);
  std::free(c->vals);
  std::free(c->row_lens);
  c->rows = c->cols = c->row_lens = nullptr;
  c->vals = nullptr;
}

}  // extern "C"

namespace {

struct Cursor {
  const char* p;
  const char* end;
};

inline void skip_ws(Cursor& c) {
  while (c.p < c.end && (*c.p == ' ' || *c.p == '\t' || *c.p == '\r' ||
                         *c.p == '\n'))
    ++c.p;
}

inline bool read_line(Cursor& c, std::string& out) {
  if (c.p >= c.end) return false;
  const char* nl = static_cast<const char*>(
      memchr(c.p, '\n', static_cast<size_t>(c.end - c.p)));
  if (!nl) nl = c.end;
  out.assign(c.p, static_cast<size_t>(nl - c.p));
  while (!out.empty() && out.back() == '\r') out.pop_back();  // CRLF input
  c.p = (nl < c.end) ? nl + 1 : c.end;
  return true;
}

inline int64_t parse_i64(Cursor& c, bool* ok) {
  skip_ws(c);
  char* endp = nullptr;
  long long v = strtoll(c.p, &endp, 10);
  *ok = (endp != c.p);
  c.p = endp;
  return static_cast<int64_t>(v);
}

inline double parse_f64(Cursor& c, bool* ok) {
  skip_ws(c);
  char* endp = nullptr;
  double v = strtod(c.p, &endp);
  *ok = (endp != c.p);
  c.p = endp;
  return v;
}

std::string lower(const std::string& s) {
  std::string out(s);
  for (auto& ch : out) ch = static_cast<char>(tolower(ch));
  return out;
}

}  // namespace

extern "C" {

// Parse a MatrixMarket coordinate body held in memory (decompression happens
// on the Python side). Output entries are sorted by (row, col); symmetric
// matrices are expanded. Duplicate entries are NOT merged (matching the
// reference, which treats them as input errors downstream); callers can
// detect them because rows/cols are sorted.
int spmv_parse_mtx(const char* buf, int64_t len, SpmvCoo* out) {
  Cursor c{buf, buf + len};
  std::string line;
  if (!read_line(c, line)) return SPMV_ERR_BANNER;
  // banner: %%MatrixMarket matrix coordinate <field> <symmetry>
  {
    std::vector<std::string> toks;
    size_t pos = 0;
    while (pos < line.size()) {
      size_t sp = line.find_first_of(" \t", pos);
      if (sp == std::string::npos) sp = line.size();
      if (sp > pos) toks.push_back(line.substr(pos, sp - pos));
      pos = sp + 1;
    }
    if (toks.size() < 5 || toks[0] != "%%MatrixMarket") return SPMV_ERR_BANNER;
    if (lower(toks[1]) != "matrix") return SPMV_ERR_UNSUPPORTED;
    if (lower(toks[2]) != "coordinate") return SPMV_ERR_UNSUPPORTED;
    std::string field = lower(toks[3]), sym = lower(toks[4]);
    bool pattern = field == "pattern";
    bool numeric = field == "real" || field == "integer";
    if (!pattern && !numeric) return SPMV_ERR_UNSUPPORTED;
    bool symmetric = sym == "symmetric";
    if (!symmetric && sym != "general") return SPMV_ERR_UNSUPPORTED;

    // skip comments/blank to size line
    std::string sline;
    for (;;) {
      if (!read_line(c, sline)) return SPMV_ERR_SIZE_LINE;
      size_t i = sline.find_first_not_of(" \t\r");
      if (i == std::string::npos) continue;
      if (sline[i] == '%') continue;
      break;
    }
    Cursor sc{sline.c_str(), sline.c_str() + sline.size()};
    bool ok1, ok2, ok3;
    int64_t m = parse_i64(sc, &ok1);
    int64_t n = parse_i64(sc, &ok2);
    int64_t nz = parse_i64(sc, &ok3);
    if (!ok1 || !ok2 || !ok3 || m < 0 || n < 0 || nz < 0)
      return SPMV_ERR_SIZE_LINE;
    if (symmetric && m != n) return SPMV_ERR_UNSUPPORTED;  // must be square

    // reserve for worst case symmetric expansion (2*nz, parser.c:49-52 analog)
    size_t cap = symmetric ? static_cast<size_t>(2 * nz) : static_cast<size_t>(nz);
    std::vector<int64_t> rows, cols;
    std::vector<double> vals;
    rows.reserve(cap);
    cols.reserve(cap);
    vals.reserve(cap);

    int64_t parsed = 0;
    for (;;) {
      skip_ws(c);
      if (c.p >= c.end) break;
      bool okr, okc;
      int64_t r = parse_i64(c, &okr);
      int64_t col = parse_i64(c, &okc);
      if (!okr || !okc) return SPMV_ERR_ENTRY;
      double v = 1.0;  // pattern value (parser.c:60-61 analog)
      if (numeric) {
        bool okv;
        v = parse_f64(c, &okv);
        if (!okv) return SPMV_ERR_ENTRY;
      }
      --r;
      --col;  // 1-based -> 0-based
      if (r < 0 || r >= m || col < 0 || col >= n) return SPMV_ERR_OOB;
      rows.push_back(r);
      cols.push_back(col);
      vals.push_back(v);
      if (symmetric && r != col) {  // mirror off-diagonal (parser.c:85-91)
        rows.push_back(col);
        cols.push_back(r);
        vals.push_back(v);
      }
      ++parsed;
    }
    if (parsed != nz) return SPMV_ERR_COUNT_MISMATCH;

    // sort by (row, col)
    int64_t total = static_cast<int64_t>(rows.size());
    std::vector<int64_t> order(total);
    for (int64_t i = 0; i < total; ++i) order[i] = i;
    const int64_t* rp = rows.data();
    const int64_t* cp = cols.data();
    SORT(order.begin(), order.end(), [rp, cp](int64_t a, int64_t b) {
      if (rp[a] != rp[b]) return rp[a] < rp[b];
      return cp[a] < cp[b];
    });

    out->m = m;
    out->n = n;
    out->nnz = total;
    size_t alloc_n = total > 0 ? static_cast<size_t>(total) : 1;  // malloc(0)
    out->rows = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * alloc_n));
    out->cols = static_cast<int64_t*>(std::malloc(sizeof(int64_t) * alloc_n));
    out->vals = static_cast<double*>(std::malloc(sizeof(double) * alloc_n));
    out->row_lens = static_cast<int64_t*>(std::calloc(m > 0 ? m : 1, sizeof(int64_t)));
    if (!out->rows || !out->cols || !out->vals || !out->row_lens) {
      spmv_free_coo(out);
      return SPMV_ERR_ALLOC;
    }
#pragma omp parallel for schedule(static)
    for (int64_t i = 0; i < total; ++i) {
      int64_t o = order[i];
      out->rows[i] = rows[o];
      out->cols[i] = cols[o];
      out->vals[i] = vals[o];
    }
    for (int64_t i = 0; i < total; ++i) out->row_lens[out->rows[i]]++;
    return SPMV_OK;
  }
}

// COO (sorted) -> CSR scatter: fills caller-allocated indptr (m+1),
// indices (nnz), data (nnz). The COOtoCSR analog (parser.c:157-215) with the
// prefix-sum + scatter done natively.
int spmv_coo_to_csr(int64_t m, int64_t nnz, const int64_t* rows,
                    const int64_t* cols, const double* vals,
                    const int64_t* row_lens, int64_t* indptr, int64_t* indices,
                    double* data) {
  indptr[0] = 0;
  for (int64_t r = 0; r < m; ++r) indptr[r + 1] = indptr[r] + row_lens[r];
  if (indptr[m] != nnz) return SPMV_ERR_COUNT_MISMATCH;
  // entries sorted by (row, col): contiguous copy per row
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) {
    indices[i] = cols[i];
    data[i] = vals[i];
  }
  // consistency: per-row strictly increasing columns (parser.c:195-202)
  for (int64_t i = 1; i < nnz; ++i) {
    if (rows[i] < rows[i - 1]) return SPMV_ERR_ENTRY;  // rows must ascend
    if (rows[i] == rows[i - 1] && cols[i] <= cols[i - 1]) return SPMV_ERR_ENTRY;
  }
  return SPMV_OK;
}

// COO (sorted) -> ELL slabs: fills caller-allocated (m, width) ja/data
// (row-major, zero padded). The COOtoELL analog (parser.c:217-296); the
// 2*m*max_row_nz cap is enforced by the Python wrapper.
int spmv_coo_to_ell(int64_t m, int64_t nnz, const int64_t* rows,
                    const int64_t* cols, const double* vals, int64_t width,
                    int64_t* ja, double* data) {
  std::memset(ja, 0, sizeof(int64_t) * static_cast<size_t>(m * width));
  std::memset(data, 0, sizeof(double) * static_cast<size_t>(m * width));
  int64_t slot = 0;
  int64_t prev_row = -1;
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t r = rows[i];
    slot = (r == prev_row) ? slot + 1 : 0;
    prev_row = r;
    if (slot >= width) return SPMV_ERR_OOB;
    ja[r * width + slot] = cols[i];
    data[r * width + slot] = vals[i];
  }
  return SPMV_OK;
}

// ---------------------------------------------------------------------------
// Bipartite edge coloring via recursive Euler splitting — the host planner
// core for the Clos permutation router (ops/route.py). A 2^bits-regular
// bipartite multigraph is 2^bits-edge-colorable (Konig); each level pairs
// incident edge slots per (class, node) and 2-colors the alternating pairing
// cycles. All O(E) per level with counting sorts.
// ---------------------------------------------------------------------------
int spmv_color_bipartite(int64_t e, const int64_t* left, const int64_t* right,
                         int64_t n_left, int64_t n_right, int bits,
                         int64_t* colors) {
  if (e <= 0) return SPMV_OK;
  if (e & 1) return SPMV_ERR_ENTRY;  // degrees must be even
  std::vector<int64_t> cls(e, 0), order(e), lpair(e), rpair(e), m(e),
      orbmin(e), counts;
  std::vector<uint8_t> visited(e);
  for (int lvl = 0; lvl < bits; ++lvl) {
    // pair per (class, left node): stable counting sort by key
    auto pair_side = [&](const int64_t* node, int64_t n_nodes,
                         std::vector<int64_t>& pair_out) -> int {
      int64_t n_keys = (int64_t(1) << lvl) * n_nodes;
      counts.assign(static_cast<size_t>(n_keys) + 1, 0);
      for (int64_t i = 0; i < e; ++i) counts[cls[i] * n_nodes + node[i] + 1]++;
      for (int64_t k = 0; k < n_keys; ++k) counts[k + 1] += counts[k];
      for (int64_t i = 0; i < e; ++i)
        order[counts[cls[i] * n_nodes + node[i]]++] = i;
      for (int64_t k = 0; k + 1 < e; k += 2) {
        int64_t a = order[k], b = order[k + 1];
        pair_out[a] = b;
        pair_out[b] = a;
      }
      return SPMV_OK;
    };
    pair_side(left, n_left, lpair);
    pair_side(right, n_right, rpair);
    for (int64_t i = 0; i < e; ++i) m[i] = lpair[rpair[i]];
    // orbit minima of m (cycle walking)
    std::fill(visited.begin(), visited.end(), 0);
    for (int64_t i = 0; i < e; ++i) {
      if (visited[i]) continue;
      int64_t mn = i, j = i;
      do {
        if (j < mn) mn = j;
        visited[j] = 1;
        j = m[j];
      } while (j != i);
      j = i;
      do {
        orbmin[j] = mn;
        j = m[j];
      } while (j != i);
    }
    for (int64_t i = 0; i < e; ++i)
      cls[i] = cls[i] * 2 + (orbmin[i] < orbmin[rpair[i]] ? 1 : 0);
  }
  std::memcpy(colors, cls.data(), sizeof(int64_t) * static_cast<size_t>(e));
  return SPMV_OK;
}

// ---------------------------------------------------------------------------
// Window-engine prepare scan (formats/window.py::_cap_candidates/_geometry):
// one fused pass per group size g over the per-nnz base fields computes the
// window geometry extrema (d = q - blk*g) and the two per-(block, gid%8)
// degree histograms the packing-cap ladder estimates V from. The Python scan
// re-walked 8M+-element arrays ~8 times per g; this is one threaded pass.
// Entries arrive in CSR row order, so blk = rq / g is non-decreasing: thread
// ranges are aligned to block boundaries and the histogram writes are
// disjoint (no merge, no atomics).
// ---------------------------------------------------------------------------
int spmv_window_scan(int64_t nnz, const int64_t* rq, const int64_t* lane,
                     const int64_t* q, const int64_t* jres, int64_t g,
                     int64_t nblocks, int64_t* d_min_out, int64_t* d_max_out,
                     int32_t* hl, int32_t* hr) {
  if (nnz <= 0 || g <= 0 || nblocks <= 0) return SPMV_ERR_ENTRY;
  const int64_t hist_len = nblocks * 8 * 128;
  std::memset(hl, 0, sizeof(int32_t) * static_cast<size_t>(hist_len));
  std::memset(hr, 0, sizeof(int32_t) * static_cast<size_t>(hist_len));
  int64_t d_min = INT64_MAX, d_max = INT64_MIN;
#pragma omp parallel reduction(min : d_min) reduction(max : d_max)
  {
    int nt = omp_get_num_threads(), tid = omp_get_thread_num();
    // block-aligned [lo, hi): first nnz whose blk >= ceil split
    auto lower_bound_blk = [&](int64_t blk_target) -> int64_t {
      int64_t lo = 0, hi = nnz;
      while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (rq[mid] / g < blk_target) lo = mid + 1;
        else hi = mid;
      }
      return lo;
    };
    int64_t b0 = nblocks * tid / nt, b1 = nblocks * (tid + 1) / nt;
    int64_t lo = lower_bound_blk(b0), hi = lower_bound_blk(b1);
    for (int64_t i = lo; i < hi; ++i) {
      int64_t blk = rq[i] / g;
      int64_t d = q[i] - blk * g;
      if (d < d_min) d_min = d;
      if (d > d_max) d_max = d;
      int64_t base = (blk * 8 + (rq[i] % g) % 8) * 128;
      hl[base + lane[i]]++;
      hr[base + jres[i]]++;
    }
  }
  *d_min_out = d_min == INT64_MAX ? 0 : d_min;
  *d_max_out = d_max == INT64_MIN ? 0 : d_max;
  return SPMV_OK;
}

// ---------------------------------------------------------------------------
// Stable rank-within-key-group (formats/window.py::_rank_in_group): for each
// entry, the number of earlier entries with the same key. Keys are
// blk * stride + local with blk = key / stride NON-DECREASING (CSR row
// order), so thread ranges split at blk boundaries and each thread walks its
// slice sequentially with a blk-local counter table — replaces an
// O(n log n) argsort with an O(n) pass.
// ---------------------------------------------------------------------------
int spmv_rank_in_group(int64_t nnz, const int64_t* key, int64_t stride,
                       int64_t nblocks, int64_t* rank_out) {
  if (nnz <= 0 || stride <= 0 || nblocks <= 0) return SPMV_ERR_ENTRY;
#pragma omp parallel
  {
    int nt = omp_get_num_threads(), tid = omp_get_thread_num();
    auto lower_bound_blk = [&](int64_t blk_target) -> int64_t {
      int64_t lo = 0, hi = nnz;
      while (lo < hi) {
        int64_t mid = (lo + hi) / 2;
        if (key[mid] / stride < blk_target) lo = mid + 1;
        else hi = mid;
      }
      return lo;
    };
    int64_t b0 = nblocks * tid / nt, b1 = nblocks * (tid + 1) / nt;
    int64_t lo = lower_bound_blk(b0), hi = lower_bound_blk(b1);
    if (lo < hi) {
      std::vector<int32_t> cnt(static_cast<size_t>((b1 - b0) * stride), 0);
      const int64_t base = b0 * stride;
      for (int64_t i = lo; i < hi; ++i)
        rank_out[i] = cnt[static_cast<size_t>(key[i] - base)]++;
    }
  }
  return SPMV_OK;
}

// ---------------------------------------------------------------------------
// Window slot-slab fill (formats/window.py::prepare_window): scatter every
// nnz into the value/sidx/gid slabs and bake the Q map, one fused threaded
// pass. The edge-coloring packing guarantees one entry per (slot row, lane)
// and per (slot row, residue), so all writes hit distinct cells — plain
// parallel for, no atomics. mode: 0 = standard (dq + (blk*g)%8),
// 1 = xdirect (raw q), 2 = shared_w (dq + (blk%bps)*g).
// ---------------------------------------------------------------------------
int spmv_window_fill(int64_t nnz, const int64_t* rq, const int64_t* lane,
                     const int64_t* q, const int64_t* jres,
                     const int64_t* srow, const double* data, int64_t g,
                     int64_t k_pad, int64_t k_c, int64_t n_ktiles, int64_t wr,
                     int64_t bps, int mode, double* vals, int8_t* sidx,
                     int8_t* gslab, int8_t* rsrc) {
  if (nnz <= 0 || g <= 0 || k_pad <= 0) return SPMV_ERR_ENTRY;
#pragma omp parallel for schedule(static)
  for (int64_t i = 0; i < nnz; ++i) {
    int64_t blk = rq[i] / g, gid = rq[i] % g;
    int64_t row = blk * k_pad + srow[i];
    int64_t cell = row * 128 + lane[i];
    vals[cell] = data[i];
    sidx[cell] = static_cast<int8_t>(jres[i]);
    gslab[cell] = static_cast<int8_t>(srow[i] < k_c ? gid / 8 : gid);
    int64_t dq_staged;
    if (mode == 1) {
      dq_staged = q[i];
    } else {
      int64_t dq = q[i] - blk * g + wr;
      dq_staged = mode == 2 ? dq + (blk % bps) * g : dq + (blk * g) % 8;
    }
    int64_t rrow = (blk * n_ktiles + srow[i] / 128) * 128 + jres[i];
    rsrc[rrow * 128 + srow[i] % 128] = static_cast<int8_t>(dq_staged);
  }
  return SPMV_OK;
}

}  // extern "C"

extern "C" {

int spmv_native_abi_version() { return 4; }

}  // extern "C"
