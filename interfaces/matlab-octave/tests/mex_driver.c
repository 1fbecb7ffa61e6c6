/* Execution harness for hypredrive_tpu_mex.c without MATLAB: builds a
 * 1-D Laplacian in MATLAB's CSC storage, invokes mexFunction through the
 * mock MEX API (tests/mock_mex/mex.h) and checks the solve residual.
 * Mirrors the reference's MATLAB test intent (solve a small SPD system
 * through the MEX path) in an installation-free way. */
#include "mex.h"

#include <math.h>

jmp_buf mock_mex_err_jmp;
char mock_mex_err_msg[1024];

int
main(void)
{
   const mwSize n = 50;
   /* tridiagonal Laplacian in CSC (symmetric, so CSC == CSR pattern) */
   mwIndex *jc = (mwIndex *)calloc(n + 1, sizeof(mwIndex));
   mwIndex *ir = (mwIndex *)calloc(3 * n, sizeof(mwIndex));
   double *pr = (double *)calloc(3 * n, sizeof(double));
   mwIndex nnz = 0;
   for (mwIndex j = 0; j < n; ++j)
   {
      jc[j] = nnz;
      if (j > 0)
      {
         ir[nnz] = j - 1;
         pr[nnz++] = -1.0;
      }
      ir[nnz] = j;
      pr[nnz++] = 2.0;
      if (j + 1 < n)
      {
         ir[nnz] = j + 1;
         pr[nnz++] = -1.0;
      }
   }
   jc[n] = nnz;

   mxArray A = {0};
   A.m = n;
   A.n = n;
   A.is_sparse = 1;
   A.is_double = 1;
   A.jc = jc;
   A.ir = ir;
   A.pr = pr;

   mxArray b = {0};
   b.m = n;
   b.n = 1;
   b.is_double = 1;
   b.pr = (double *)calloc(n, sizeof(double));
   for (mwIndex i = 0; i < n; ++i)
   {
      b.pr[i] = 1.0;
   }

   mxArray yaml = {0};
   yaml.m = 1;
   yaml.n = 1;
   yaml.str = (char *)"linear_system:\n"
                      "solver:\n"
                      "  pcg:\n"
                      "    max_iter: 200\n"
                      "    relative_tol: 1.0e-10\n"
                      "preconditioner: amg\n";

   const mxArray *prhs[3] = {&A, &b, &yaml};
   mxArray *plhs[1] = {0};

   if (setjmp(mock_mex_err_jmp))
   {
      fprintf(stderr, "MEX error: %s\n", mock_mex_err_msg);
      return 2;
   }
   mexFunction(1, plhs, 3, prhs);

   /* residual check: ||b - A x||_inf small */
   const double *x = mxGetPr(plhs[0]);
   double maxres = 0.0;
   for (mwIndex i = 0; i < n; ++i)
   {
      double r = 1.0 - 2.0 * x[i] + (i > 0 ? x[i - 1] : 0.0) +
                 (i + 1 < n ? x[i + 1] : 0.0);
      if (fabs(r) > maxres)
      {
         maxres = fabs(r);
      }
   }
   printf("mex solve max residual: %.3e\n", maxres);
   return maxres < 1e-6 ? 0 : 3;
}
