/* C API for the hypredrive-tpu framework.
 *
 * Mirrors the reference's embeddable C surface — all 79 exported
 * HYPREDRV_* verbs (ref: include/HYPREDRV.h: lifecycle :112-289, error
 * :170-221, info :311-358, config :391-641, linear system :669-1518,
 * state vectors :1554-1693, solve lifecycle :1719-1905, stats
 * :1932-2262, eigenspectrum :2109, solver getters :2126-2208) — while
 * delegating the numerics to the in-process Python/JAX runtime via an
 * embedded CPython interpreter.
 *
 * Thread model: single-threaded by contract, like the reference
 * (ref: include/HYPREDRV.h:66-70).
 *
 * Every call returns 0 on success or a nonzero error code describable
 * with HYPREDRV_ErrorCodeDescribe().  Functions taking MPI communicators
 * in the reference take none here (the JAX runtime owns the mesh).
 */

#ifndef HYPREDRV_TPU_H
#define HYPREDRV_TPU_H

#include <stdint.h>

#ifdef __cplusplus
extern "C" {
#endif

typedef int64_t HYPREDRV_t; /* opaque handle (index into the shim table) */

/* -- lifecycle (ref: HYPREDRV.h:112-289) --------------------------------- */
uint32_t HYPREDRV_Initialize(void);
uint32_t HYPREDRV_Finalize(void);
uint32_t HYPREDRV_Create(HYPREDRV_t *handle_ptr);
uint32_t HYPREDRV_Destroy(HYPREDRV_t *handle_ptr);

/* -- error model (ref: HYPREDRV.h:170-221) ------------------------------- */
const char *HYPREDRV_ErrorCodeDescribe(uint32_t code);
uint32_t HYPREDRV_ErrorCodeClear(void);
uint32_t HYPREDRV_ErrorInvalidValue(void);       /* the INVALID_VAL bit */
/* describe + abort on nonzero code (ref: HYPREDRV.h:221) */
void HYPREDRV_SafeCallHandleError(uint32_t code, const char *file, int line);
/* last Python-side error message for this process ("" when none) */
const char *HYPREDRV_ErrorMessage(void);

/* -- info printers (ref: HYPREDRV.h:311-358) ------------------------------ */
uint32_t HYPREDRV_PrintLibInfo(HYPREDRV_t);
uint32_t HYPREDRV_PrintSystemInfo(HYPREDRV_t);
uint32_t HYPREDRV_PrintExitInfo(HYPREDRV_t, const char *argv0);

/* -- configuration (ref: HYPREDRV.h:391-641) ------------------------------ */
uint32_t HYPREDRV_InputArgsParse(HYPREDRV_t, const char *yaml_text_or_path);
uint32_t HYPREDRV_SetLibraryMode(HYPREDRV_t);
uint32_t HYPREDRV_ObjectSetName(HYPREDRV_t, const char *name);
uint32_t HYPREDRV_InputArgsGetNumLinearSystems(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_InputArgsGetNumPreconVariants(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_InputArgsGetNumRepetitions(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_InputArgsGetWarmup(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_InputArgsSetPreconVariant(HYPREDRV_t, int32_t index);
uint32_t HYPREDRV_InputArgsSetPreconPreset(HYPREDRV_t, const char *name);
uint32_t HYPREDRV_InputArgsSetSolverPreset(HYPREDRV_t, const char *name);
uint32_t HYPREDRV_PreconPresetRegister(const char *name, const char *yaml);
uint32_t HYPREDRV_SolverPresetRegister(const char *name, const char *yaml);

/* -- linear system (ref: HYPREDRV.h:669-1335) ----------------------------- */
uint32_t HYPREDRV_LinearSystemBuild(HYPREDRV_t);
uint32_t HYPREDRV_LinearSystemReadMatrix(HYPREDRV_t, const char *path);
/* SetMatrix borrows a CSR triple (same contract as SetMatrixFromCSR with
 * ilower = 0; ref: HYPREDRV.h:728 borrows a HYPRE_Matrix) */
uint32_t HYPREDRV_LinearSystemSetMatrix(HYPREDRV_t, int64_t num_rows,
                                        const int64_t *indptr,
                                        const int64_t *indices,
                                        const double *data);
uint32_t HYPREDRV_LinearSystemSetMatrixFromCSR(HYPREDRV_t, int64_t num_rows,
                                               const int64_t *indptr,
                                               const int64_t *indices,
                                               const double *data);
uint32_t HYPREDRV_LinearSystemSetPrecMatrix(HYPREDRV_t, int64_t num_rows,
                                            const int64_t *indptr,
                                            const int64_t *indices,
                                            const double *data);
uint32_t HYPREDRV_LinearSystemSetRHS(HYPREDRV_t, int64_t n,
                                     const double *values);
uint32_t HYPREDRV_LinearSystemSetRHSFromArray(HYPREDRV_t, int64_t n,
                                              const double *values);
uint32_t HYPREDRV_LinearSystemSetInitialGuess(HYPREDRV_t, int64_t n,
                                              const double *values);
uint32_t HYPREDRV_LinearSystemSetSolution(HYPREDRV_t, int64_t n,
                                          const double *values);
uint32_t HYPREDRV_LinearSystemSetReferenceSolution(HYPREDRV_t, int64_t n,
                                                   const double *values);
uint32_t HYPREDRV_LinearSystemResetInitialGuess(HYPREDRV_t);
uint32_t HYPREDRV_LinearSystemSetNearNullSpace(HYPREDRV_t, int32_t num_vecs,
                                               int64_t n,
                                               const double *values);
uint32_t HYPREDRV_LinearSystemSetNullSpace(HYPREDRV_t, int32_t num_vecs,
                                           int64_t n, const double *values);
uint32_t HYPREDRV_LinearSystemSetDiscreteGradient(
    HYPREDRV_t, int64_t num_rows, const int64_t *indptr,
    const int64_t *indices, const double *data);
uint32_t HYPREDRV_LinearSystemSetDiscreteCurl(
    HYPREDRV_t, int64_t num_rows, const int64_t *indptr,
    const int64_t *indices, const double *data);
uint32_t HYPREDRV_LinearSystemSetCoordinates(HYPREDRV_t, int32_t dim,
                                             int64_t n,
                                             const double *coords);
uint32_t HYPREDRV_LinearSystemSetDofmap(HYPREDRV_t, int64_t n,
                                        const int64_t *labels);
uint32_t HYPREDRV_LinearSystemSetInterleavedDofmap(HYPREDRV_t,
                                                   int32_t num_functions);
uint32_t HYPREDRV_LinearSystemSetContiguousDofmap(HYPREDRV_t,
                                                  int32_t num_functions);
uint32_t HYPREDRV_LinearSystemReadDofmap(HYPREDRV_t, const char *path);
uint32_t HYPREDRV_LinearSystemPrint(HYPREDRV_t, const char *prefix);
uint32_t HYPREDRV_LinearSystemPrintDofmap(HYPREDRV_t, const char *path);
uint32_t HYPREDRV_LinearSystemComputeEigenspectrum(HYPREDRV_t);

/* -- solution getters (ref: HYPREDRV.h:1369-1518) ------------------------- */
uint32_t HYPREDRV_LinearSystemGetSolutionLength(HYPREDRV_t, int64_t *out);
uint32_t HYPREDRV_LinearSystemGetSolutionNorm(HYPREDRV_t, double *out);
uint32_t HYPREDRV_LinearSystemGetSolutionValues(HYPREDRV_t, int64_t n,
                                                double *out);
uint32_t HYPREDRV_LinearSystemGetRHSValues(HYPREDRV_t, int64_t n,
                                           double *out);
/* opaque borrows for API parity with GetMatrix/GetRHS/GetSolution
 * (ref: HYPREDRV.h returns hypre handles; here: internal objects) */
uint32_t HYPREDRV_LinearSystemGetMatrix(HYPREDRV_t, void **out);
uint32_t HYPREDRV_LinearSystemGetRHS(HYPREDRV_t, void **out);
uint32_t HYPREDRV_LinearSystemGetSolution(HYPREDRV_t, void **out);

/* -- state vectors (ref: HYPREDRV.h:1554-1693) ---------------------------- */
uint32_t HYPREDRV_StateVectorSet(HYPREDRV_t, int32_t num_states, int64_t n,
                                 double **vectors);
uint32_t HYPREDRV_StateVectorGetValues(HYPREDRV_t, int32_t index, int64_t n,
                                       double *out);
uint32_t HYPREDRV_StateVectorCopy(HYPREDRV_t, int32_t index_in,
                                  int32_t index_out);
uint32_t HYPREDRV_StateVectorUpdateAll(HYPREDRV_t);
uint32_t HYPREDRV_StateVectorApplyCorrection(HYPREDRV_t, int32_t index);

/* -- solve lifecycle (ref: HYPREDRV.h:1719-1905) -------------------------- */
uint32_t HYPREDRV_PreconCreate(HYPREDRV_t);
uint32_t HYPREDRV_PreconSetup(HYPREDRV_t);
uint32_t HYPREDRV_PreconApply(HYPREDRV_t, int64_t n, const double *r,
                              double *z);
uint32_t HYPREDRV_LinearSolverCreate(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverSetup(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverApply(HYPREDRV_t);
uint32_t HYPREDRV_PreconDestroy(HYPREDRV_t);
uint32_t HYPREDRV_LinearSolverDestroy(HYPREDRV_t);

/* -- stats / observability (ref: HYPREDRV.h:1932-2262) -------------------- */
uint32_t HYPREDRV_StatsPrint(HYPREDRV_t);
uint32_t HYPREDRV_AnnotateBegin(HYPREDRV_t, const char *name, int32_t index);
uint32_t HYPREDRV_AnnotateEnd(HYPREDRV_t, const char *name, int32_t index);
uint32_t HYPREDRV_AnnotateLevelBegin(HYPREDRV_t, const char *name,
                                     int32_t index);
uint32_t HYPREDRV_AnnotateLevelEnd(HYPREDRV_t, const char *name,
                                   int32_t index);
uint32_t HYPREDRV_StatsLevelPrint(HYPREDRV_t);
uint32_t HYPREDRV_StatsLevelGetCount(HYPREDRV_t, const char *name,
                                     int32_t *out);
uint32_t HYPREDRV_StatsLevelGetEntry(HYPREDRV_t, const char *name,
                                     int32_t entry, double *time_out);

/* -- solver getters (ref: HYPREDRV.h:2126-2208) --------------------------- */
uint32_t HYPREDRV_LinearSolverGetNumIterations(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_LinearSolverGetNumIter(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_LinearSolverGetConverged(HYPREDRV_t, int32_t *out);
uint32_t HYPREDRV_LinearSolverGetSetupTime(HYPREDRV_t, double *out);
uint32_t HYPREDRV_LinearSolverGetSolveTime(HYPREDRV_t, double *out);
uint32_t HYPREDRV_LinearSolverGetFinalRelativeResidualNorm(HYPREDRV_t,
                                                           double *out);

#ifdef __cplusplus
}
#endif

#endif /* HYPREDRV_TPU_H */
