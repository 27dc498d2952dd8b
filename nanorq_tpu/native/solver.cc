// Native host-side schedule solver for nanorq_tpu.
//
// Replaces the Python _solve_core hot path (precode/solver.py): Gaussian
// elimination with inactivation over matrix *indices* — peel, triangle
// substitution applied to the dense inactive block, GF(2)/GF(256) dense
// solve, Schur pivot-block extraction and inversion.  Pure index/byte work;
// no payload bytes are touched (those run on the TPU).
//
// Reference analog: lib/precode.c:99-377 (precode_matrix_invert), re-designed
// to emit the structured-replay artifacts instead of an op stream.
//
// C ABI (ctypes): nrq_solve() returns an opaque handle with getters; the
// caller copies results into NumPy arrays and frees the handle.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <ctime>
#include <vector>

#if defined(__AVX2__) || defined(__SSSE3__)
#include <immintrin.h>
#endif

namespace {

// NRQ_TIMING=1 in the environment prints per-phase solve timings to stderr.
struct PhaseTimer {
  bool on;
  struct timespec t0;
  PhaseTimer() : on(getenv("NRQ_TIMING") != nullptr) { clock_gettime(CLOCK_MONOTONIC, &t0); }
  void mark(const char* name) {
    if (!on) return;
    struct timespec t1;
    clock_gettime(CLOCK_MONOTONIC, &t1);
    fprintf(stderr, "nrq_solve %-10s %6.1f ms\n", name,
            (t1.tv_sec - t0.tv_sec) * 1e3 + (t1.tv_nsec - t0.tv_nsec) / 1e6);
    t0 = t1;
  }
};

uint8_t GF_MUL[256][256];
uint8_t OCT_INV[256];
// nibble decomposition: a (x) b = NIB_LO[b][a & 15] ^ NIB_HI[b][a >> 4]
alignas(32) uint8_t NIB_LO[256][16];
alignas(32) uint8_t NIB_HI[256][16];

struct TablesInit {
  TablesInit() {
    uint8_t exp_[510];
    int log_[256] = {0};
    int x = 1;
    for (int k = 0; k < 255; k++) {
      exp_[k] = (uint8_t)x;
      log_[x] = k;
      x <<= 1;
      if (x & 0x100) x ^= 0x11D;
    }
    for (int k = 255; k < 510; k++) exp_[k] = exp_[k - 255];
    memset(GF_MUL, 0, sizeof(GF_MUL));
    for (int a = 1; a < 256; a++)
      for (int b = 1; b < 256; b++) GF_MUL[a][b] = exp_[log_[a] + log_[b]];
    OCT_INV[0] = 0;
    for (int a = 1; a < 256; a++) OCT_INV[a] = exp_[255 - log_[a]];
    for (int b = 0; b < 256; b++)
      for (int n = 0; n < 16; n++) {
        NIB_LO[b][n] = GF_MUL[b][n];
        NIB_HI[b][n] = GF_MUL[b][n << 4];
      }
  }
} tables_init_;

inline void row_xor(uint8_t* dst, const uint8_t* src, int n) {
  for (int j = 0; j < n; j++) dst[j] ^= src[j];
}

// dst ^= beta (x) src, PSHUFB nibble-LUT vectorized (the oblas oaxpy trick)
inline void row_axpy(uint8_t* dst, const uint8_t* src, uint8_t beta, int n) {
  int j = 0;
#if defined(__AVX2__)
  const __m256i lo_t = _mm256_broadcastsi128_si256(_mm_load_si128((const __m128i*)NIB_LO[beta]));
  const __m256i hi_t = _mm256_broadcastsi128_si256(_mm_load_si128((const __m128i*)NIB_HI[beta]));
  const __m256i mask = _mm256_set1_epi8(0x0f);
  for (; j + 32 <= n; j += 32) {
    __m256i x = _mm256_loadu_si256((const __m256i*)(src + j));
    __m256i lo = _mm256_and_si256(x, mask);
    __m256i hi = _mm256_and_si256(_mm256_srli_epi64(x, 4), mask);
    __m256i r = _mm256_xor_si256(_mm256_shuffle_epi8(lo_t, lo), _mm256_shuffle_epi8(hi_t, hi));
    __m256i d = _mm256_loadu_si256((const __m256i*)(dst + j));
    _mm256_storeu_si256((__m256i*)(dst + j), _mm256_xor_si256(d, r));
  }
#elif defined(__SSSE3__)
  const __m128i lo_t = _mm_load_si128((const __m128i*)NIB_LO[beta]);
  const __m128i hi_t = _mm_load_si128((const __m128i*)NIB_HI[beta]);
  const __m128i mask = _mm_set1_epi8(0x0f);
  for (; j + 16 <= n; j += 16) {
    __m128i x = _mm_loadu_si128((const __m128i*)(src + j));
    __m128i lo = _mm_and_si128(x, mask);
    __m128i hi = _mm_and_si128(_mm_srli_epi64(x, 4), mask);
    __m128i r = _mm_xor_si128(_mm_shuffle_epi8(lo_t, lo), _mm_shuffle_epi8(hi_t, hi));
    __m128i d = _mm_loadu_si128((const __m128i*)(dst + j));
    _mm_storeu_si128((__m128i*)(dst + j), _mm_xor_si128(d, r));
  }
#endif
  const uint8_t* mul = GF_MUL[beta];
  for (; j < n; j++) dst[j] ^= mul[src[j]];
}

struct Solver {
  // outputs
  std::vector<int32_t> piv_rows, piv_cols;
  std::vector<int32_t> u_cols;
  std::vector<int32_t> order;
  std::vector<uint8_t> uschur_sel;  // [u, u] row-major
  std::vector<uint8_t> vinv;        // [u, u] row-major
  int status = 1;                   // 0 ok, 1 rank-deficient
  int hdpc_used = 0;
};

}  // namespace

extern "C" {

// rows: CSR of the NB binary rows (LT then LDPC) over columns [0, L).
// hdpc: dense [H, L] HDPC rows of A (always provided; used only on demand).
void* nrq_solve(int32_t NB, int32_t L, int32_t W, int32_t S, int32_t H,
                const int32_t* row_ptr, const int32_t* row_cols,
                const uint8_t* hdpc) {
  const int M = NB + H;
  Solver* out = new Solver();
  PhaseTimer pt;

  // ---- column adjacency (transpose of the binary rows) ----
  const int64_t nnz = row_ptr[NB];
  std::vector<int32_t> col_cnt(L + 1, 0);
  for (int64_t e = 0; e < nnz; e++) col_cnt[row_cols[e] + 1]++;
  std::vector<int32_t> col_ptr(L + 1, 0);
  for (int c = 0; c < L; c++) col_ptr[c + 1] = col_ptr[c] + col_cnt[c + 1];
  std::vector<int32_t> col_rows(nnz);
  {
    std::vector<int32_t> cur(col_ptr.begin(), col_ptr.end() - 1);
    for (int r = 0; r < NB; r++)
      for (int32_t e = row_ptr[r]; e < row_ptr[r + 1]; e++)
        col_rows[cur[row_cols[e]]++] = r;
  }

  pt.mark("adj");
  // ---- phase 1: peel (greedy degree-1/2 selection, inactivation) ----
  std::vector<int32_t> nnzV(NB, 0);
  for (int r = 0; r < NB; r++)
    for (int32_t e = row_ptr[r]; e < row_ptr[r + 1]; e++)
      if (row_cols[e] < W) nnzV[r]++;
  std::vector<uint8_t> col_active(L, 0);
  for (int c = 0; c < W; c++) col_active[c] = 1;
  std::vector<uint8_t> row_used(NB, 0);
  std::vector<int32_t> bucket1, bucket2;
  bucket1.reserve(NB);
  bucket2.reserve(NB);
  for (int r = 0; r < NB; r++) {
    if (nnzV[r] == 1) bucket1.push_back(r);
    else if (nnzV[r] == 2) bucket2.push_back(r);
  }
  int n_active = W;
  std::vector<int32_t>& pr = out->piv_rows;
  std::vector<int32_t>& pc = out->piv_cols;
  std::vector<int32_t> inactivated;

  auto remove_col = [&](int c) {
    col_active[c] = 0;
    n_active--;
    for (int32_t e = col_ptr[c]; e < col_ptr[c + 1]; e++) {
      int r = col_rows[e];
      int nz = --nnzV[r];
      if (nz == 1) bucket1.push_back(r);
      else if (nz == 2) bucket2.push_back(r);
    }
  };

  while (n_active > 0) {
    int r = -1;
    while (!bucket1.empty()) {
      int cand = bucket1.back();
      bucket1.pop_back();
      if (!row_used[cand] && nnzV[cand] == 1) { r = cand; break; }
    }
    if (r < 0) {
      while (!bucket2.empty()) {
        int cand = bucket2.back();
        bucket2.pop_back();
        if (!row_used[cand] && nnzV[cand] == 2) { r = cand; break; }
      }
    }
    if (r < 0) break;
    int c1 = -1, c2 = -1;
    for (int32_t e = row_ptr[r]; e < row_ptr[r + 1]; e++) {
      int c = row_cols[e];
      if (col_active[c]) {
        if (c1 < 0) c1 = c;
        else { c2 = c; break; }
      }
    }
    row_used[r] = 1;
    pr.push_back(r);
    pc.push_back(c1);
    remove_col(c1);
    if (c2 >= 0) {
      inactivated.push_back(c2);
      remove_col(c2);
    }
  }

  const int i = (int)pr.size();
  const int u = L - i;

  // inactive column order: leftover active, peel-inactivated, PI cols
  std::vector<int32_t>& uc = out->u_cols;
  uc.reserve(u);
  for (int c = 0; c < W; c++)
    if (col_active[c]) uc.push_back(c);
  for (int32_t c : inactivated) uc.push_back(c);
  for (int c = W; c < L; c++) uc.push_back(c);

  std::vector<int32_t> ucol_of(L, -1);
  for (int j = 0; j < u; j++) ucol_of[uc[j]] = j;
  std::vector<int32_t> pos_of_row(NB, INT32_MAX);
  for (int k = 0; k < i; k++) pos_of_row[pr[k]] = k;
  std::vector<int32_t> pivpos_of_col(L, -1);
  for (int k = 0; k < i; k++) pivpos_of_col[pc[k]] = k;

  pt.mark("peel");
  // ---- U: dense inactive block [M, u] ----
  std::vector<uint8_t> U((size_t)M * u, 0);
  auto Urow = [&](int r) { return U.data() + (size_t)r * u; };
  for (int r = 0; r < NB; r++)
    for (int32_t e = row_ptr[r]; e < row_ptr[r + 1]; e++) {
      int j = ucol_of[row_cols[e]];
      if (j >= 0) Urow(r)[j] = 1;
    }

  pt.mark("ubuild");
  // ---- S1a: triangle forward substitution applied to U ----
  for (int k = 0; k < i; k++) {
    int c = pc[k];
    const uint8_t* srcrow = Urow(pr[k]);
    for (int32_t e = col_ptr[c]; e < col_ptr[c + 1]; e++) {
      int r = col_rows[e];
      int p = pos_of_row[r];
      if (p > k && p < INT32_MAX) row_xor(Urow(r), srcrow, u);
    }
  }
  pt.mark("s1a");
  // ---- S1b: eliminate triangle cols from non-pivot binary rows ----
  for (int k = 0; k < i; k++) {
    int c = pc[k];
    const uint8_t* srcrow = Urow(pr[k]);
    for (int32_t e = col_ptr[c]; e < col_ptr[c + 1]; e++) {
      int r = col_rows[e];
      if (pos_of_row[r] == INT32_MAX) row_xor(Urow(r), srcrow, u);
    }
  }

  pt.mark("s1b");
  std::vector<uint8_t> U_pre(U);  // Schur snapshot (binary rows)

  // ---- dense solve: order, GF(2) first when enough binary rows ----
  std::vector<int32_t>& order = out->order;
  order.resize(M);
  {
    int p = 0;
    for (int k = 0; k < i; k++) order[p++] = pr[k];
    for (int r = 0; r < NB; r++)
      if (!row_used[r]) order[p++] = r;
    for (int h = 0; h < H; h++) order[p++] = NB + h;
  }

  int rank = i;
  if (M - H >= L) {
    for (int p = i; p < L; p++) {
      int jc = p - i;
      int q = -1;
      for (int s = p; s < M - H; s++)
        if (Urow(order[s])[jc]) { q = s; break; }
      if (q < 0) break;
      std::swap(order[p], order[q]);
      const uint8_t* piv = Urow(order[p]);
      for (int s = p + 1; s < M - H; s++) {
        uint8_t* rrow = Urow(order[s]);
        if (rrow[jc]) row_xor(rrow, piv, u);
      }
      rank = p + 1;
    }
  }

  if (rank < L) {
    out->hdpc_used = 1;
    // fill HDPC inactive block and eliminate vs triangle pivots.
    // k outermost: each triangle U row is streamed ONCE while the H output
    // rows (H*u bytes) stay L1-resident — h-outermost re-read the whole
    // [i, u] block H times and was the solve's dominant cost at large K'
    for (int h = 0; h < H; h++) {
      uint8_t* hrow = Urow(NB + h);
      const uint8_t* ah = hdpc + (size_t)h * L;
      for (int j = 0; j < u; j++) hrow[j] = ah[uc[j]];
    }
    for (int k = 0; k < i; k++) {
      const uint8_t* srcrow = Urow(pr[k]);
      const int32_t c = pc[k];
      for (int h = 0; h < H; h++) {
        uint8_t beta = hdpc[(size_t)h * L + c];
        if (beta) row_axpy(Urow(NB + h), srcrow, beta, u);
      }
    }
    for (int h = 0; h < H; h++)
      memcpy(U_pre.data() + (size_t)(NB + h) * u, Urow(NB + h), u);
    // GF(256) elimination from position i over all rows
    for (int p = i; p < L; p++) {
      int jc = p - i;
      int q = -1;
      for (int s = p; s < M; s++)
        if (Urow(order[s])[jc]) { q = s; break; }
      if (q < 0) { out->status = 1; return out; }
      std::swap(order[p], order[q]);
      uint8_t* piv = Urow(order[p]);
      uint8_t b = piv[jc];
      if (b > 1) {
        const uint8_t* mul = GF_MUL[OCT_INV[b]];
        for (int j = 0; j < u; j++) piv[j] = mul[piv[j]];
      }
      for (int s = p + 1; s < M; s++) {
        uint8_t* rrow = Urow(order[s]);
        uint8_t beta = rrow[jc];
        if (beta) row_axpy(rrow, piv, beta, u);
      }
    }
  }

  pt.mark("dense");
  // ---- Schur pivot block + inverse ----
  out->uschur_sel.resize((size_t)u * u);
  for (int s = 0; s < u; s++)
    memcpy(out->uschur_sel.data() + (size_t)s * u,
           U_pre.data() + (size_t)order[i + s] * u, u);

  // invert [u, u] over GF(256) by Gauss-Jordan
  {
    std::vector<uint8_t> A(out->uschur_sel);
    std::vector<uint8_t>& V = out->vinv;
    V.assign((size_t)u * u, 0);
    for (int d = 0; d < u; d++) V[(size_t)d * u + d] = 1;
    auto Ar = [&](int r) { return A.data() + (size_t)r * u; };
    auto Vr = [&](int r) { return V.data() + (size_t)r * u; };
    for (int c = 0; c < u; c++) {
      int piv = -1;
      for (int r = c; r < u; r++)
        if (Ar(r)[c]) { piv = r; break; }
      if (piv < 0) { out->status = 1; return out; }  // cannot happen if solve ok
      if (piv != c) {
        for (int j = 0; j < u; j++) std::swap(Ar(c)[j], Ar(piv)[j]);
        for (int j = 0; j < u; j++) std::swap(Vr(c)[j], Vr(piv)[j]);
      }
      uint8_t b = Ar(c)[c];
      if (b != 1) {
        const uint8_t* mul = GF_MUL[OCT_INV[b]];
        for (int j = 0; j < u; j++) Ar(c)[j] = mul[Ar(c)[j]];
        for (int j = 0; j < u; j++) Vr(c)[j] = mul[Vr(c)[j]];
      }
      for (int r = 0; r < u; r++) {
        if (r == c) continue;
        uint8_t beta = Ar(r)[c];
        if (beta) {
          row_axpy(Ar(r), Ar(c), beta, u);
          row_axpy(Vr(r), Vr(c), beta, u);
        }
      }
    }
  }

  pt.mark("schur");
  out->status = 0;
  return out;
}

int32_t nrq_status(void* h) { return ((Solver*)h)->status; }
int32_t nrq_hdpc_used(void* h) { return ((Solver*)h)->hdpc_used; }
int32_t nrq_i(void* h) { return (int32_t)((Solver*)h)->piv_rows.size(); }
int32_t nrq_u(void* h) { return (int32_t)((Solver*)h)->u_cols.size(); }
const int32_t* nrq_piv_rows(void* h) { return ((Solver*)h)->piv_rows.data(); }
const int32_t* nrq_piv_cols(void* h) { return ((Solver*)h)->piv_cols.data(); }
const int32_t* nrq_u_cols(void* h) { return ((Solver*)h)->u_cols.data(); }
const int32_t* nrq_order(void* h) { return ((Solver*)h)->order.data(); }
const uint8_t* nrq_uschur(void* h) { return ((Solver*)h)->uschur_sel.data(); }
const uint8_t* nrq_vinv(void* h) { return ((Solver*)h)->vinv.data(); }
void nrq_free(void* h) { delete (Solver*)h; }

// ---- GF(2) unit-lower-triangular chunk inversion (for compile_device) ----
// T: [n, CB, CB] row-major 0/1; inverted in place:
//   Tinv[r] = e_r ^ XOR_{c<r, T[r,c]=1} Tinv[c]
void nrq_tinv_chunks(uint8_t* T, int32_t n, int32_t CB) {
  std::vector<uint8_t> inv((size_t)CB * CB);
  for (int q = 0; q < n; q++) {
    uint8_t* Tq = T + (size_t)q * CB * CB;
    memset(inv.data(), 0, inv.size());
    for (int r = 0; r < CB; r++) {
      uint8_t* dst = inv.data() + (size_t)r * CB;
      dst[r] = 1;
      const uint8_t* trow = Tq + (size_t)r * CB;
      for (int c = 0; c < r; c++)
        if (trow[c]) row_xor(dst, inv.data() + (size_t)c * CB, CB);
    }
    memcpy(Tq, inv.data(), inv.size());
  }
}

// Invert + conjugate by an intra-chunk permutation in one pass:
//   out[r'][c'] = Tinv[order[r']][order[c']]   (out = P Tinv P^T)
// order: [n, CB] int32, new position -> old position within the chunk.
// Row gather is a memcpy; the column gather stays L1/L2-resident per row.
void nrq_tinv_conj_chunks(uint8_t* T, const int32_t* order, int32_t n, int32_t CB) {
  std::vector<uint8_t> inv((size_t)CB * CB);
  for (int q = 0; q < n; q++) {
    uint8_t* Tq = T + (size_t)q * CB * CB;
    const int32_t* ord = order + (size_t)q * CB;
    memset(inv.data(), 0, inv.size());
    for (int r = 0; r < CB; r++) {
      uint8_t* dst = inv.data() + (size_t)r * CB;
      dst[r] = 1;
      const uint8_t* trow = Tq + (size_t)r * CB;
      for (int c = 0; c < r; c++)
        if (trow[c]) row_xor(dst, inv.data() + (size_t)c * CB, CB);
    }
    for (int r = 0; r < CB; r++) {
      const uint8_t* src = inv.data() + (size_t)ord[r] * CB;
      uint8_t* dst = Tq + (size_t)r * CB;
      for (int c = 0; c < CB; c++) dst[c] = src[ord[c]];
    }
  }
}

}  // extern "C"
