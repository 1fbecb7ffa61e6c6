/* C API for the hypredrive-tpu framework.
 *
 * Mirrors the reference's embeddable C surface (ref: include/HYPREDRV.h —
 * lifecycle verbs Initialize, Create, InputArgsParse, the LinearSystem
 * and PreconCreate/LinearSolver families, and the uint32_t
 * error-bitfield contract) while delegating the numerics to the
 * in-process Python/JAX runtime via an embedded CPython interpreter.
 *
 * Thread model: single-threaded by contract, like the reference
 * (ref: include/HYPREDRV.h:66-70).
 *
 * Every call returns 0 on success or a nonzero error code describable
 * with HYPREDRV_ErrorCodeDescribe().
 */

#ifndef HYPREDRV_TPU_H
#define HYPREDRV_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t HYPREDRV_t; /* opaque handle (index into the shim table) */

/* -- lifecycle ---------------------------------------------------------- */
uint32_t HYPREDRV_Initialize(void);
uint32_t HYPREDRV_Finalize(void);
uint32_t HYPREDRV_Create(HYPREDRV_t *handle_ptr);
uint32_t HYPREDRV_Destroy(HYPREDRV_t *handle_ptr);

/* -- error model -------------------------------------------------------- */
const char *HYPREDRV_ErrorCodeDescribe(uint32_t code);
/* last Python-side error message for this process ("" when none) */
const char *HYPREDRV_ErrorMessage(void);

/* -- configuration ------------------------------------------------------ */
uint32_t HYPREDRV_InputArgsParse(HYPREDRV_t, const char *yaml_text_or_path);
uint32_t HYPREDRV_SetLibraryMode(HYPREDRV_t);

/* -- linear system ------------------------------------------------------ */
uint32_t HYPREDRV_LinearSystemBuild(HYPREDRV_t);
uint32_t HYPREDRV_LinearSystemSetMatrixFromCSR(HYPREDRV_t, int64_t num_rows,
                                               const int64_t *indptr,
                                               const int64_t *indices,
                                               const double *data);
uint32_t HYPREDRV_LinearSystemSetRHSFromArray(HYPREDRV_t, int64_t n,
                                              const double *values);
uint32_t HYPREDRV_LinearSystemSetInitialGuess(HYPREDRV_t, int64_t n,
                                              const double *values);
uint32_t HYPREDRV_LinearSystemResetInitialGuess(HYPREDRV_t);
uint32_t HYPREDRV_LinearSystemGetSolutionValues(HYPREDRV_t, int64_t n,
                                                double *out);

/* -- solve lifecycle ----------------------------------------------------- */
uint32_t HYPREDRV_PreconCreate(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverCreate(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverSetup(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverApply(HYPREDRV_t);
uint32_t HYPREDRV_PreconDestroy(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverDestroy(HYPREDRV_t);

/* -- observability ------------------------------------------------------ */
uint32_t HYPREDRV_StatsPrint(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverGetNumIterations(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_LinearSolverGetFinalRelativeResidualNorm(HYPREDRV_t,
                                                           double *out);
uint32_t HYPREDRV_AnnotateBegin(HYPREDRV_t, const char *name, int32_t index);
uint32_t HYPREDRV_AnnotateEnd(HYPREDRV_t, const char *name, int32_t index);

#ifdef __cplusplus
}
#endif

#endif /* HYPREDRV_TPU_H */
