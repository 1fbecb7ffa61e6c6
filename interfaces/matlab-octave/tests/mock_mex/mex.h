/* Minimal mock of the MATLAB MEX C API — just enough surface to compile
 * AND EXECUTE hypredrive_tpu_mex.c in CI without a MATLAB/Octave
 * installation (the reference tests its MEX against real MATLAB in its
 * own CI; this repo's CI has none, so the mock provides the execution
 * harness).  Semantics follow the documented MEX API for the subset
 * used: dense/sparse real double arrays, column-compressed storage. */
#ifndef MOCK_MEX_H
#define MOCK_MEX_H

#include <setjmp.h>
#include <stdarg.h>
#include <stdio.h>
#include <stdlib.h>
#include <string.h>

#ifndef _GNU_SOURCE
extern char *strdup(const char *);
#endif

typedef size_t mwIndex;
typedef size_t mwSize;

typedef struct mxArray_tag
{
   mwSize m, n;
   int is_sparse;
   int is_complex;
   int is_double;
   mwIndex *jc;   /* sparse: column pointers, size n+1 */
   mwIndex *ir;   /* sparse: row indices */
   double *pr;    /* values (dense or sparse) */
   char *str;     /* char array contents, if a string */
} mxArray;

#define mxREAL 0

extern jmp_buf mock_mex_err_jmp;
extern char mock_mex_err_msg[1024];

static inline mwSize mxGetM(const mxArray *a) { return a->m; }
static inline mwSize mxGetN(const mxArray *a) { return a->n; }
static inline mwSize mxGetNumberOfElements(const mxArray *a)
{
   return a->m * a->n;
}
static inline int mxIsSparse(const mxArray *a) { return a->is_sparse; }
static inline int mxIsComplex(const mxArray *a) { return a->is_complex; }
static inline int mxIsDouble(const mxArray *a) { return a->is_double; }
static inline mwIndex *mxGetJc(const mxArray *a) { return a->jc; }
static inline mwIndex *mxGetIr(const mxArray *a) { return a->ir; }
static inline double *mxGetPr(const mxArray *a) { return a->pr; }
static inline void *mxMalloc(mwSize nbytes) { return malloc(nbytes); }
static inline void mxFree(void *p) { free(p); }

static inline char *mxArrayToString(const mxArray *a)
{
   return a->str ? strdup(a->str) : NULL;
}

static inline mxArray *mxCreateDoubleMatrix(mwSize m, mwSize n, int flag)
{
   mxArray *a = (mxArray *)calloc(1, sizeof(mxArray));
   (void)flag;
   a->m = m;
   a->n = n;
   a->is_double = 1;
   a->pr = (double *)calloc(m * n ? m * n : 1, sizeof(double));
   return a;
}

static inline void
mexErrMsgIdAndTxt(const char *id, const char *fmt, ...)
{
   va_list ap;
   int off = snprintf(mock_mex_err_msg, sizeof mock_mex_err_msg,
                      "%s: ", id);
   va_start(ap, fmt);
   vsnprintf(mock_mex_err_msg + off, sizeof mock_mex_err_msg - (size_t)off,
             fmt, ap);
   va_end(ap);
   longjmp(mock_mex_err_jmp, 1);
}

static inline void mexWarnMsgIdAndTxt(const char *id, const char *fmt, ...)
{
   (void)id;
   (void)fmt;
}

static inline void mexAtExit(void (*fn)(void)) { atexit(fn); }

void mexFunction(int nlhs, mxArray *plhs[], int nrhs,
                 const mxArray *prhs[]);

#endif /* MOCK_MEX_H */
