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
// The Python/numpy version costs ~0.2 s per million entries (argsort +
// three fancy-index scatters); this does one radix-friendly std::sort
// and a single fill loop.
// ---------------------------------------------------------------------------

#include <algorithm>
#include <vector>

extern "C" {

typedef struct {
  int64_t np_;        // number of passes
  int32_t *pass_tile; // [np]
  int32_t *pass_q0;   // [np]
  int32_t *pass_first;// [np]
  int8_t *sub;        // [np*1024]
  int8_t *lane;       // [np*1024]
  double *val;        // [np*1024]
  char err[256];
} hdrv_plan_buf;

void hdrv_plan_free(hdrv_plan_buf *b) {
  if (!b) return;
  free(b->pass_tile);
  free(b->pass_q0);
  free(b->pass_first);
  free(b->sub);
  free(b->lane);
  free(b->val);
  free(b);
}

hdrv_plan_buf *hdrv_build_gather_plan(const int64_t *rows,
                                      const int64_t *cols,
                                      const double *vals, int64_t n,
                                      int64_t n_rows, int64_t n_cols) {
  (void)n_rows;
  (void)n_cols;
  hdrv_plan_buf *b = (hdrv_plan_buf *)calloc(1, sizeof(hdrv_plan_buf));
  if (!b) return nullptr;
  if (n == 0) return b;

  // key = tile<<40 | win<<20 | local_row ; keep entry index in low bits
  // of a companion array via pair sort
  std::vector<std::pair<int64_t, int64_t>> keyed((size_t)n);
  for (int64_t i = 0; i < n; ++i) {
    int64_t tile = rows[i] >> 10;           // /1024
    int64_t lrow = rows[i] & 1023;
    int64_t win = cols[i] >> 10;
    keyed[(size_t)i] = {(tile << 40) | (win << 20) | lrow, i};
  }
  std::sort(keyed.begin(), keyed.end());

  // pass 1: count passes = sum over (tile,win) groups of max row-run
  int64_t np_total = 0;
  {
    int64_t run = 0, kmax = 0;
    int64_t prev_key = -1, prev_tw = -1;
    for (int64_t i = 0; i < n; ++i) {
      int64_t key = keyed[(size_t)i].first;
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
  }

  b->np_ = np_total;
  b->pass_tile = (int32_t *)malloc((size_t)np_total * 4);
  b->pass_q0 = (int32_t *)malloc((size_t)np_total * 4);
  b->pass_first = (int32_t *)malloc((size_t)np_total * 4);
  b->sub = (int8_t *)calloc((size_t)np_total * 1024, 1);
  b->lane = (int8_t *)calloc((size_t)np_total * 1024, 1);
  b->val = (double *)calloc((size_t)np_total * 1024, 8);
  if (!b->pass_tile || !b->pass_q0 || !b->pass_first || !b->sub ||
      !b->lane || !b->val) {
    snprintf(b->err, sizeof b->err, "out of memory (%lld passes)",
             (long long)np_total);
    return b;
  }

  // pass 2: fill
  int64_t pbase = 0;       // first pass of current (tile,win) group
  int64_t kmax = 0;
  int64_t slot = 0;
  int64_t prev_key = -1, prev_tw = -1, prev_tile = -1;
  for (int64_t i = 0; i < n; ++i) {
    int64_t key = keyed[(size_t)i].first;
    int64_t e = keyed[(size_t)i].second;
    int64_t tw = key >> 20;
    if (tw != prev_tw) {
      pbase += kmax;
      kmax = 0;
      prev_tw = tw;
      prev_key = -1;
      int64_t tile = key >> 40;
      int64_t win = (key >> 20) & ((1 << 20) - 1);
      // metadata for the passes this group will create is filled as
      // slots appear (kmax grows)
      (void)tile;
      (void)win;
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
      b->pass_tile[p] = (int32_t)tile;
      b->pass_q0[p] = (int32_t)(win * 8);
      b->pass_first[p] = (prev_tile != tile || p == 0) ? 1 : 0;
    }
    int64_t lrow = key & 1023;
    int64_t c_local = cols[e] - win * 1024;
    b->sub[p * 1024 + lrow] = (int8_t)(c_local >> 7);
    b->lane[p * 1024 + lrow] = (int8_t)(c_local & 127);
    b->val[p * 1024 + lrow] = vals[e];
  }

  // fix pass_first: recompute from pass_tile sequence (the in-loop guess
  // is wrong for later slots of a tile's first group)
  for (int64_t p = 0; p < np_total; ++p)
    b->pass_first[p] = (p == 0 || b->pass_tile[p] != b->pass_tile[p - 1]) ? 1 : 0;
  (void)prev_tile;
  return b;
}

}  // extern "C"
