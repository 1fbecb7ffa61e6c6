/* C-embedding example: assemble a 1-D Laplacian in C and solve it
 * through the hypredrive-tpu C API (ref workflow:
 * examples/src/C_laplacian/laplacian.c:331-474 — Initialize → Create →
 * InputArgsParse → SetMatrixFromCSR → SetRHS → PreconCreate →
 * LinearSolverCreate/Setup/Apply → getters → Destroy → Finalize).
 *
 * Build/run (from the repo root):
 *   make -C native libhypredrv_tpu.so
 *   gcc interfaces/c/example_laplacian.c -Lnative -lhypredrv_tpu \
 *       -Inative/include -o /tmp/ex_c && \
 *   LD_LIBRARY_PATH=native PYTHONPATH=. /tmp/ex_c
 */

#include <stdio.h>
#include <stdlib.h>

#include "HYPREDRV_tpu.h"

#define N 64

#define CHECK(call)                                                     \
  do {                                                                  \
    uint32_t rc_ = (call);                                              \
    if (rc_) {                                                          \
      fprintf(stderr, "FAIL %s -> %u: %s (%s)\n", #call, rc_,           \
              HYPREDRV_ErrorCodeDescribe(rc_), HYPREDRV_ErrorMessage());\
      exit(1);                                                          \
    }                                                                   \
  } while (0)

static const char *CONFIG =
    "linear_system:\n"
    "  rhs_mode: ones\n"
    "solver:\n"
    "  pcg:\n"
    "    relative_tol: 1.0e-8\n"
    "    max_iter: 200\n"
    "preconditioner: amg\n";

int main(void) {
  int64_t indptr[N + 1];
  int64_t indices[3 * N];
  double data[3 * N];
  int64_t nnz = 0;

  for (int64_t i = 0; i < N; ++i) {
    indptr[i] = nnz;
    if (i > 0) { indices[nnz] = i - 1; data[nnz++] = -1.0; }
    indices[nnz] = i; data[nnz++] = 2.0;
    if (i < N - 1) { indices[nnz] = i + 1; data[nnz++] = -1.0; }
  }
  indptr[N] = nnz;

  CHECK(HYPREDRV_Initialize());

  HYPREDRV_t drv;
  CHECK(HYPREDRV_Create(&drv));
  CHECK(HYPREDRV_SetLibraryMode(drv));
  CHECK(HYPREDRV_InputArgsParse(drv, CONFIG));
  CHECK(HYPREDRV_LinearSystemSetMatrixFromCSR(drv, N, indptr, indices, data));

  double rhs[N];
  for (int i = 0; i < N; ++i) rhs[i] = 1.0;
  CHECK(HYPREDRV_LinearSystemSetRHSFromArray(drv, N, rhs));

  CHECK(HYPREDRV_PreconCreate(drv));
  CHECK(HYPREDRV_LinearSolverCreate(drv));
  CHECK(HYPREDRV_LinearSolverSetup(drv));
  CHECK(HYPREDRV_LinearSolverApply(drv));

  int32_t iters = -1;
  double relres = -1.0;
  double x[N];
  CHECK(HYPREDRV_LinearSolverGetNumIterations(drv, &iters));
  CHECK(HYPREDRV_LinearSolverGetFinalRelativeResidualNorm(drv, &relres));
  CHECK(HYPREDRV_LinearSystemGetSolutionValues(drv, N, x));

  /* verify the solve in plain C: r = b - A x */
  double rmax = 0.0;
  for (int64_t i = 0; i < N; ++i) {
    double ax = 0.0;
    for (int64_t j = indptr[i]; j < indptr[i + 1]; ++j)
      ax += data[j] * x[indices[j]];
    double r = 1.0 - ax;
    if (r < 0) r = -r;
    if (r > rmax) rmax = r;
  }

  printf("iters=%d relres=%.3e max|b-Ax|=%.3e\n", iters, relres, rmax);

  /* error-path probe: a bad config must return a typed error */
  HYPREDRV_t bad;
  CHECK(HYPREDRV_Create(&bad));
  uint32_t rc = HYPREDRV_InputArgsParse(bad, "solver: warp_drive\n");
  if (rc == 0) {
    fprintf(stderr, "expected error for bad config\n");
    return 1;
  }
  printf("bad-config rc=%u (%s)\n", rc, HYPREDRV_ErrorCodeDescribe(rc));
  CHECK(HYPREDRV_Destroy(&bad));

  CHECK(HYPREDRV_Destroy(&drv));
  CHECK(HYPREDRV_Finalize());
  printf(rmax < 1e-6 ? "PASSED\n" : "FAILED\n");
  return rmax < 1e-6 ? 0 : 1;
}
