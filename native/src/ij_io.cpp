// Native IJ file I/O for hypredrive_tpu.
//
// TPU-native equivalent of the reference's C readers (ref:
// src/internal/matrix.c:142-230, src/internal/vector.c:92-210 and the
// ASCII paths behind HYPRE_IJMatrixRead): the ASCII COO parse is the
// hot I/O path for large matrix files and is ~20x faster here than
// numpy.loadtxt.  Exposed to Python via ctypes (no pybind11 in the
// image); buffers are malloc'd here, copied into numpy arrays by the
// caller, then released with hdrv_ij_free.
//
// Build: make -C native   ->  native/libhypredrv_io.so

#include <cctype>
#include <cerrno>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

typedef struct {
  int64_t ilower, iupper, jlower, jupper;  // header window
  int64_t nnz;                             // matrix entries parsed
  int64_t n;                               // vector length
  int64_t *rows;                           // [nnz]
  int64_t *cols;                           // [nnz]
  double *vals;                            // [nnz] or [n]
  char err[256];
} hdrv_ij_buf;

static hdrv_ij_buf *new_buf() {
  hdrv_ij_buf *b = (hdrv_ij_buf *)calloc(1, sizeof(hdrv_ij_buf));
  return b;
}

void hdrv_ij_free(hdrv_ij_buf *b) {
  if (!b) return;
  free(b->rows);
  free(b->cols);
  free(b->vals);
  free(b);
}

namespace {

struct MappedFile {
  const char *data = nullptr;
  size_t size = 0;
  int fd = -1;

  bool open_map(const char *path) {
    fd = ::open(path, O_RDONLY);
    if (fd < 0) return false;
    struct stat st;
    if (fstat(fd, &st) != 0 || st.st_size == 0) {
      // empty file maps are invalid; treat as zero-size OK
      size = 0;
      data = nullptr;
      return st.st_size == 0;
    }
    size = (size_t)st.st_size;
    void *p = mmap(nullptr, size, PROT_READ, MAP_PRIVATE, fd, 0);
    if (p == MAP_FAILED) return false;
    madvise(p, size, MADV_SEQUENTIAL);
    data = (const char *)p;
    return true;
  }

  ~MappedFile() {
    if (data) munmap((void *)data, size);
    if (fd >= 0) close(fd);
  }
};

inline void skip_ws(const char *&p, const char *end) {
  while (p < end && (*p == ' ' || *p == '\t' || *p == '\r' || *p == '\n'))
    ++p;
}

inline bool parse_i64(const char *&p, const char *end, int64_t &out) {
  skip_ws(p, end);
  if (p >= end) return false;
  bool neg = false;
  if (*p == '-') { neg = true; ++p; }
  else if (*p == '+') ++p;
  if (p >= end || !isdigit((unsigned char)*p)) return false;
  int64_t v = 0;
  while (p < end && isdigit((unsigned char)*p)) v = v * 10 + (*p++ - '0');
  out = neg ? -v : v;
  return true;
}

inline bool parse_f64(const char *&p, const char *end, double &out) {
  skip_ws(p, end);
  if (p >= end) return false;
  char *q = nullptr;
  errno = 0;
  out = strtod(p, &q);
  if (q == p) return false;
  p = q;
  return true;
}

}  // namespace

// ASCII matrix: "ilower iupper jlower jupper\n" then "row col val" lines.
hdrv_ij_buf *hdrv_read_ij_matrix_ascii(const char *path) {
  hdrv_ij_buf *b = new_buf();
  if (!b) return nullptr;
  MappedFile mf;
  if (!mf.open_map(path)) {
    snprintf(b->err, sizeof b->err, "cannot open %s", path);
    return b;
  }
  const char *p = mf.data, *end = mf.data + mf.size;
  if (!parse_i64(p, end, b->ilower) || !parse_i64(p, end, b->iupper) ||
      !parse_i64(p, end, b->jlower) || !parse_i64(p, end, b->jupper)) {
    snprintf(b->err, sizeof b->err, "bad IJ ASCII header in %s", path);
    return b;
  }
  // Upper bound on entries: one per remaining line.
  size_t cap = 1024;
  {
    size_t nl = 0;
    for (const char *q = p; q < end; ++q) nl += (*q == '\n');
    cap = nl + 2;
  }
  b->rows = (int64_t *)malloc(cap * sizeof(int64_t));
  b->cols = (int64_t *)malloc(cap * sizeof(int64_t));
  b->vals = (double *)malloc(cap * sizeof(double));
  if (!b->rows || !b->cols || !b->vals) {
    snprintf(b->err, sizeof b->err, "out of memory (%zu entries)", cap);
    return b;
  }
  int64_t n = 0;
  for (;;) {
    int64_t r, c;
    double v;
    skip_ws(p, end);
    if (p >= end) break;
    if (!parse_i64(p, end, r) || !parse_i64(p, end, c) ||
        !parse_f64(p, end, v)) {
      snprintf(b->err, sizeof b->err,
               "malformed entry near offset %ld in %s",
               (long)(p - mf.data), path);
      return b;
    }
    if (!std::isfinite(v)) {
      // ref: matrix.c rejects non-finite coefficients
      snprintf(b->err, sizeof b->err,
               "non-finite coefficient at entry %lld in %s",
               (long long)n, path);
      return b;
    }
    if ((size_t)n >= cap) {
      snprintf(b->err, sizeof b->err, "entry overflow in %s", path);
      return b;
    }
    b->rows[n] = r;
    b->cols[n] = c;
    b->vals[n] = v;
    ++n;
  }
  b->nnz = n;
  return b;
}

// ASCII vector: "ilower iupper\n" then "row val" lines.
hdrv_ij_buf *hdrv_read_ij_vector_ascii(const char *path) {
  hdrv_ij_buf *b = new_buf();
  if (!b) return nullptr;
  MappedFile mf;
  if (!mf.open_map(path)) {
    snprintf(b->err, sizeof b->err, "cannot open %s", path);
    return b;
  }
  const char *p = mf.data, *end = mf.data + mf.size;
  if (!parse_i64(p, end, b->ilower) || !parse_i64(p, end, b->iupper)) {
    snprintf(b->err, sizeof b->err, "bad IJ ASCII vector header in %s", path);
    return b;
  }
  int64_t len = b->iupper - b->ilower + 1;
  if (len < 0) {
    snprintf(b->err, sizeof b->err, "negative window in %s", path);
    return b;
  }
  b->rows = (int64_t *)malloc((size_t)len * sizeof(int64_t));
  b->vals = (double *)calloc((size_t)len, sizeof(double));
  if (!b->rows || !b->vals) {
    snprintf(b->err, sizeof b->err, "out of memory (%lld rows)",
             (long long)len);
    return b;
  }
  int64_t n = 0;
  for (;;) {
    int64_t r;
    double v;
    skip_ws(p, end);
    if (p >= end) break;
    if (!parse_i64(p, end, r) || !parse_f64(p, end, v)) {
      snprintf(b->err, sizeof b->err,
               "malformed vector entry near offset %ld in %s",
               (long)(p - mf.data), path);
      return b;
    }
    if (!std::isfinite(v)) {
      snprintf(b->err, sizeof b->err,
               "non-finite value at entry %lld in %s", (long long)n, path);
      return b;
    }
    int64_t idx = r - b->ilower;
    if (idx < 0 || idx >= len) {
      snprintf(b->err, sizeof b->err,
               "row %lld outside window [%lld,%lld] in %s", (long long)r,
               (long long)b->ilower, (long long)b->iupper, path);
      return b;
    }
    if (n >= len) {
      snprintf(b->err, sizeof b->err, "vector entry overflow in %s", path);
      return b;
    }
    b->rows[n] = idx;
    b->vals[idx] = v;
    ++n;
  }
  b->n = len;
  b->nnz = n;
  return b;
}

// Fast ASCII writers (print_system dumps of large systems).
int hdrv_write_ij_matrix_ascii(const char *path, int64_t ilower,
                               int64_t iupper, int64_t jlower,
                               int64_t jupper, const int64_t *rows,
                               const int64_t *cols, const double *vals,
                               int64_t nnz) {
  FILE *f = fopen(path, "w");
  if (!f) return -1;
  char buf[1 << 16];
  setvbuf(f, buf, _IOFBF, sizeof buf);
  fprintf(f, "%lld %lld %lld %lld\n", (long long)ilower, (long long)iupper,
          (long long)jlower, (long long)jupper);
  for (int64_t i = 0; i < nnz; ++i)
    fprintf(f, "%lld %lld %.15e\n", (long long)rows[i], (long long)cols[i],
            vals[i]);
  int rc = ferror(f);
  fclose(f);
  return rc ? -2 : 0;
}

int hdrv_write_ij_vector_ascii(const char *path, int64_t ilower,
                               const double *vals, int64_t n) {
  FILE *f = fopen(path, "w");
  if (!f) return -1;
  char buf[1 << 16];
  setvbuf(f, buf, _IOFBF, sizeof buf);
  fprintf(f, "%lld %lld\n", (long long)ilower, (long long)(ilower + n - 1));
  for (int64_t i = 0; i < n; ++i)
    fprintf(f, "%lld %.15e\n", (long long)(ilower + i), vals[i]);
  int rc = ferror(f);
  fclose(f);
  return rc ? -2 : 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Gather-plan builder (TPU SpMV setup hot path).
//
// Native counterpart of hypredrive_tpu/ops/gather_plan.py:build_plan —
// one sort by (tile, window, row) then O(n) run-length pass assembly.
// Two-phase API so the caller (numpy) allocates the output buffers and
// the fill writes them exactly once — no intermediate copies, no
// astype pass (the val buffer is filled at the requested width):
//   h = hdrv_plan_begin(rows, cols, vals, n)   // sort + count passes
//   hdrv_plan_np(h)                            // -> pass count
//   hdrv_plan_fill(h, tile, q0, first, sub, lane, val, want_f32)
//   hdrv_plan_end(h)
// rows/cols/vals must stay alive until hdrv_plan_fill returns.
// ---------------------------------------------------------------------------

#include <algorithm>
#include <vector>

extern "C" {

typedef struct {
  int64_t np_;
  int64_t n;
  const int64_t *cols;
  const double *vals;
  void *keyed;  // std::vector<std::pair<int64_t,int64_t>>*
  char err[256];
} hdrv_plan_handle;

void hdrv_plan_end(hdrv_plan_handle *h) {
  if (!h) return;
  delete static_cast<std::vector<std::pair<int64_t, int64_t>> *>(h->keyed);
  free(h);
}

hdrv_plan_handle *hdrv_plan_begin(const int64_t *rows, const int64_t *cols,
                                  const double *vals, int64_t n) {
  hdrv_plan_handle *h =
      (hdrv_plan_handle *)calloc(1, sizeof(hdrv_plan_handle));
  if (!h) return nullptr;
  h->n = n;
  h->cols = cols;
  h->vals = vals;
  if (n == 0) return h;

  auto *keyed = new (std::nothrow)
      std::vector<std::pair<int64_t, int64_t>>((size_t)n);
  if (!keyed) {
    snprintf(h->err, sizeof h->err, "out of memory (%lld entries)",
             (long long)n);
    return h;
  }
  h->keyed = keyed;
  for (int64_t i = 0; i < n; ++i) {
    int64_t tile = rows[i] >> 10;  // 1024-row output tile
    int64_t lrow = rows[i] & 1023;
    int64_t win = cols[i] >> 10;   // 1024-col x window
    (*keyed)[(size_t)i] = {(tile << 40) | (win << 20) | lrow, i};
  }
  std::sort(keyed->begin(), keyed->end());

  // count passes = sum over (tile,win) groups of max same-row run length
  int64_t np_total = 0, run = 0, kmax = 0;
  int64_t prev_key = -1, prev_tw = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t key = (*keyed)[(size_t)i].first;
    int64_t tw = key >> 20;
    if (tw != prev_tw) {
      np_total += kmax;
      kmax = 0;
      run = 0;
      prev_tw = tw;
      prev_key = -1;
    }
    if (key != prev_key) {
      run = 0;
      prev_key = key;
    } else {
      ++run;
    }
    if (run + 1 > kmax) kmax = run + 1;
  }
  np_total += kmax;
  h->np_ = np_total;
  return h;
}

int64_t hdrv_plan_np(const hdrv_plan_handle *h) { return h ? h->np_ : -1; }

const char *hdrv_plan_err(const hdrv_plan_handle *h) {
  return h ? h->err : "alloc failed";
}

// Buffers must be zero-initialized by the caller (holes stay 0).
void hdrv_plan_fill(const hdrv_plan_handle *h, int32_t *pass_tile,
                    int32_t *pass_q0, int32_t *pass_first, int8_t *sub,
                    int8_t *lane, void *val, int want_f32) {
  if (!h || !h->keyed) return;
  const auto &keyed =
      *static_cast<std::vector<std::pair<int64_t, int64_t>> *>(h->keyed);
  float *val32 = want_f32 ? (float *)val : nullptr;
  double *val64 = want_f32 ? nullptr : (double *)val;

  int64_t pbase = 0, kmax = 0, slot = 0;
  int64_t prev_key = -1, prev_tw = -1;
  for (int64_t i = 0; i < h->n; ++i) {
    int64_t key = keyed[(size_t)i].first;
    int64_t e = keyed[(size_t)i].second;
    int64_t tw = key >> 20;
    if (tw != prev_tw) {
      pbase += kmax;
      kmax = 0;
      prev_tw = tw;
      prev_key = -1;
    }
    if (key != prev_key) {
      slot = 0;
      prev_key = key;
    } else {
      ++slot;
    }
    int64_t tile = key >> 40;
    int64_t win = (key >> 20) & ((1 << 20) - 1);
    int64_t p = pbase + slot;
    if (slot + 1 > kmax) {
      kmax = slot + 1;
      pass_tile[p] = (int32_t)tile;
      pass_q0[p] = (int32_t)(win * 8);
    }
    int64_t lrow = key & 1023;
    int64_t c_local = h->cols[e] - win * 1024;
    sub[p * 1024 + lrow] = (int8_t)(c_local >> 7);
    lane[p * 1024 + lrow] = (int8_t)(c_local & 127);
    if (val32)
      val32[p * 1024 + lrow] = (float)h->vals[e];
    else
      val64[p * 1024 + lrow] = h->vals[e];
  }
  for (int64_t p = 0; p < h->np_; ++p)
    pass_first[p] = (p == 0 || pass_tile[p] != pass_tile[p - 1]) ? 1 : 0;
}

}  // extern "C"
