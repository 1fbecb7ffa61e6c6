// C API shim: embeds CPython and forwards every call to the
// hypredrive_tpu Python package (api.HypreDrive lifecycle verbs).
//
// Reference parity: the reference exposes its driver as a C library
// (ref: include/HYPREDRV.h) with language bindings layered on top
// (ref: interfaces/). Here the Python package IS the implementation, so
// the C surface embeds the interpreter instead of the other way round.
//
// Error contract: 0 = success; nonzero codes match
// hypredrive_tpu.core.errors.ErrorCode where possible, with 0xFFFF for
// "Python-level failure" (message via HYPREDRV_ErrorMessage).

#include "../include/HYPREDRV_tpu.h"

#include <Python.h>

#include <map>
#include <string>

namespace {

PyObject *g_module = nullptr;           // hypredrive_tpu
std::map<int64_t, PyObject *> g_handles; // handle -> HypreDrive instance
int64_t g_next = 1;
std::string g_err;
bool g_we_initialized = false;

constexpr uint32_t ERR_PY = 0xFFFFu;
constexpr uint32_t ERR_BADHANDLE = 0xFFFEu;
constexpr uint32_t ERR_NOTINIT = 0xFFFDu;

uint32_t record_py_error() {
  PyObject *type = nullptr, *value = nullptr, *tb = nullptr;
  PyErr_Fetch(&type, &value, &tb);
  PyErr_NormalizeException(&type, &value, &tb);
  g_err = "python error";
  uint32_t code = ERR_PY;
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      const char *c = PyUnicode_AsUTF8(s);
      if (c) g_err = c;
      Py_DECREF(s);
    }
    // typed errors carry .code.value (hypredrive_tpu HypredrvError)
    PyObject *codeobj = PyObject_GetAttrString(value, "code");
    if (codeobj) {
      PyObject *v = PyObject_GetAttrString(codeobj, "value");
      if (v && PyLong_Check(v)) code = (uint32_t)PyLong_AsLong(v);
      Py_XDECREF(v);
      Py_DECREF(codeobj);
    } else {
      PyErr_Clear();
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
  return code ? code : ERR_PY;
}

PyObject *handle_obj(HYPREDRV_t h) {
  auto it = g_handles.find(h);
  return it == g_handles.end() ? nullptr : it->second;
}

// call obj.method(*args) discarding the result
uint32_t call0(HYPREDRV_t h, const char *method, PyObject *args = nullptr) {
  PyObject *obj = handle_obj(h);
  if (!obj) {
    g_err = "invalid HYPREDRV_t handle";
    return ERR_BADHANDLE;
  }
  PyObject *m = PyObject_GetAttrString(obj, method);
  if (!m) return record_py_error();
  PyObject *r = PyObject_CallObject(m, args);
  Py_DECREF(m);
  if (!r) return record_py_error();
  Py_DECREF(r);
  return 0;
}

// zero-copy-in marshalling: wrap the C pointer in a memoryview and let
// numpy copy it once (np.frombuffer(mv, dtype).copy()); O(n) memcpy
// instead of n PyObject allocations — production-size arrays stay cheap
PyObject *np_from_buffer(const void *p, int64_t n, const char *dtype) {
  PyObject *np_mod = PyImport_ImportModule("numpy");
  if (!np_mod) return nullptr;
  Py_ssize_t itemsize = dtype[0] == 'i' ? 8 : 8;  // int64 / float64
  PyObject *mv = PyMemoryView_FromMemory(
      (char *)p, (Py_ssize_t)n * itemsize, PyBUF_READ);
  PyObject *arr = nullptr;
  if (mv) {
    PyObject *view = PyObject_CallMethod(np_mod, "frombuffer", "Os", mv,
                                         dtype);
    Py_DECREF(mv);
    if (view) {
      arr = PyObject_CallMethod(view, "copy", nullptr);
      Py_DECREF(view);
    }
  }
  Py_DECREF(np_mod);
  return arr;
}

PyObject *np_from_i64(const int64_t *p, int64_t n) {
  return np_from_buffer(p, n, "int64");
}

PyObject *np_from_f64(const double *p, int64_t n) {
  return np_from_buffer(p, n, "float64");
}


// call obj.method(*args) returning the result object (caller decrefs)
PyObject *call_ret(HYPREDRV_t h, const char *method,
                   PyObject *args = nullptr) {
  PyObject *obj = handle_obj(h);
  if (!obj) {
    g_err = "invalid HYPREDRV_t handle";
    return nullptr;
  }
  PyObject *m = PyObject_GetAttrString(obj, method);
  if (!m) return nullptr;
  PyObject *r = PyObject_CallObject(m, args);
  Py_DECREF(m);
  return r;
}

uint32_t get_f64(HYPREDRV_t h, const char *method, double *out) {
  PyObject *r = call_ret(h, method);
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  *out = PyFloat_AsDouble(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

// copy a returned 1-D float sequence into out[0..n)
uint32_t get_f64_array(HYPREDRV_t h, const char *method, int64_t n,
                       double *out, PyObject *args = nullptr) {
  PyObject *x = call_ret(h, method, args);
  if (!x) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  PyObject *lst = PyObject_CallMethod(x, "tolist", nullptr);
  Py_DECREF(x);
  if (!lst) return record_py_error();
  Py_ssize_t m = PyList_Size(lst);
  for (Py_ssize_t i = 0; i < m && i < (Py_ssize_t)n; ++i)
    out[i] = PyFloat_AsDouble(PyList_GET_ITEM(lst, i));
  Py_DECREF(lst);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

// scipy.sparse.csr_matrix((data, indices, indptr), shape=(n, ncols))
PyObject *scipy_csr(int64_t n, const int64_t *indptr, const int64_t *indices,
                    const double *data, int64_t ncols = -1) {
  int64_t nnz = indptr[n];
  if (ncols < 0) {
    ncols = 0;
    for (int64_t i = 0; i < nnz; ++i)
      if (indices[i] + 1 > ncols) ncols = indices[i] + 1;
  }
  PyObject *sp = PyImport_ImportModule("scipy.sparse");
  if (!sp) return nullptr;
  PyObject *a0 = np_from_f64(data, nnz);
  PyObject *a1 = np_from_i64(indices, nnz);
  PyObject *a2 = np_from_i64(indptr, n + 1);
  PyObject *mat = nullptr;
  if (a0 && a1 && a2) {
    PyObject *inner = PyTuple_Pack(3, a0, a1, a2);
    PyObject *arg = PyTuple_Pack(1, inner);
    PyObject *kw = Py_BuildValue("{s:(LL)}", "shape", (long long)n,
                                 (long long)ncols);
    PyObject *cls = PyObject_GetAttrString(sp, "csr_matrix");
    if (inner && arg && kw && cls) mat = PyObject_Call(cls, arg, kw);
    Py_XDECREF(cls); Py_XDECREF(kw); Py_XDECREF(arg); Py_XDECREF(inner);
  }
  Py_XDECREF(a0); Py_XDECREF(a1); Py_XDECREF(a2);
  Py_DECREF(sp);
  return mat;
}

uint32_t call_str(HYPREDRV_t h, const char *method, const char *s0) {
  PyObject *args = Py_BuildValue("(s)", s0);
  if (!args) return record_py_error();
  uint32_t rc = call0(h, method, args);
  Py_DECREF(args);
  return rc;
}


// ctypes (and other embedders) release the GIL around foreign calls —
// every entry point must (re)acquire it before touching Python state.
struct GIL {
  PyGILState_STATE st{};
  bool active;
  GIL() : active(Py_IsInitialized() != 0) {
    if (active) st = PyGILState_Ensure();
  }
  ~GIL() {
    if (active) PyGILState_Release(st);
  }
  GIL(const GIL &) = delete;
  GIL &operator=(const GIL &) = delete;
};

}  // namespace

extern "C" {

uint32_t HYPREDRV_Initialize(void) {
  GIL gil;
  if (g_module) return 0;
  if (!Py_IsInitialized()) {
    Py_InitializeEx(0);
    g_we_initialized = true;
  }
  g_module = PyImport_ImportModule("hypredrive_tpu");
  if (!g_module) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_Finalize(void) {
  {
    // Scope the GIL guard so its PyGILState_Release runs while the
    // interpreter is still alive; Py_Finalize below destroys the GIL.
    GIL gil;
    for (auto &kv : g_handles) {
      PyObject *r = PyObject_CallMethod(kv.second, "destroy", nullptr);
      Py_XDECREF(r);
      PyErr_Clear();
      Py_DECREF(kv.second);
    }
    g_handles.clear();
    Py_XDECREF(g_module);
    g_module = nullptr;
  }
  if (g_we_initialized && Py_IsInitialized()) {
    // Py_Finalize must run with the GIL held; the matching release never
    // happens because the interpreter (and its GIL) cease to exist.
    PyGILState_Ensure();
    Py_Finalize();
    g_we_initialized = false;
  }
  return 0;
}

uint32_t HYPREDRV_Create(HYPREDRV_t *hp) {
  GIL gil;
  if (!g_module) {
    g_err = "HYPREDRV_Initialize not called";
    return ERR_NOTINIT;
  }
  PyObject *cls = PyObject_GetAttrString(g_module, "HypreDrive");
  if (!cls) return record_py_error();
  PyObject *obj = PyObject_CallObject(cls, nullptr);
  Py_DECREF(cls);
  if (!obj) return record_py_error();
  *hp = g_next++;
  g_handles[*hp] = obj;
  return 0;
}

uint32_t HYPREDRV_Destroy(HYPREDRV_t *hp) {
  GIL gil;
  if (!hp) return ERR_BADHANDLE;
  auto it = g_handles.find(*hp);
  if (it == g_handles.end()) return ERR_BADHANDLE;
  uint32_t rc = call0(*hp, "destroy");
  Py_DECREF(it->second);
  g_handles.erase(it);
  *hp = 0;
  return rc;
}

const char *HYPREDRV_ErrorCodeDescribe(uint32_t code) {
  GIL gil;
  switch (code) {
    case 0: return "success";
    case ERR_PY: return "python-level failure (see HYPREDRV_ErrorMessage)";
    case ERR_BADHANDLE: return "invalid HYPREDRV_t handle";
    case ERR_NOTINIT: return "HYPREDRV_Initialize not called";
    default: break;
  }
  if (g_module) {
    PyObject *r = PyObject_CallMethod(g_module, "error_code_describe", "I",
                                      code);
    if (r) {
      static std::string desc;
      const char *c = PyUnicode_AsUTF8(r);
      desc = c ? c : "unknown error";
      Py_DECREF(r);
      return desc.c_str();
    }
    PyErr_Clear();
  }
  return "unknown error code";
}

const char *HYPREDRV_ErrorMessage(void) {
  GIL gil; return g_err.c_str(); }

uint32_t HYPREDRV_InputArgsParse(HYPREDRV_t h, const char *yaml) {
  GIL gil;
  PyObject *args = Py_BuildValue("(s)", yaml);
  uint32_t rc = call0(h, "input_args_parse", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_SetLibraryMode(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "set_library_mode");
}

uint32_t HYPREDRV_LinearSystemBuild(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "linear_system_build");
}

uint32_t HYPREDRV_LinearSystemSetMatrixFromCSR(HYPREDRV_t h, int64_t n,
                                               const int64_t *indptr,
                                               const int64_t *indices,
                                               const double *data) {
  GIL gil;
  int64_t nnz = indptr[n];
  PyObject *a0 = np_from_i64(indptr, n + 1);
  PyObject *a1 = np_from_i64(indices, nnz);
  PyObject *a2 = np_from_f64(data, nnz);
  if (!a0 || !a1 || !a2) {
    Py_XDECREF(a0); Py_XDECREF(a1); Py_XDECREF(a2);
    return record_py_error();
  }
  PyObject *args = PyTuple_Pack(3, a0, a1, a2);
  Py_DECREF(a0); Py_DECREF(a1); Py_DECREF(a2);
  uint32_t rc = call0(h, "set_matrix_from_csr", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetRHSFromArray(HYPREDRV_t h, int64_t n,
                                              const double *v) {
  GIL gil;
  PyObject *a0 = np_from_f64(v, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = call0(h, "set_rhs", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetInitialGuess(HYPREDRV_t h, int64_t n,
                                              const double *v) {
  GIL gil;
  PyObject *a0 = np_from_f64(v, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = call0(h, "set_initial_guess", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemResetInitialGuess(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "reset_initial_guess");
}

uint32_t HYPREDRV_LinearSystemGetSolutionValues(HYPREDRV_t h, int64_t n,
                                                double *out) {
  GIL gil;
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *x = PyObject_CallMethod(obj, "get_solution", nullptr);
  if (!x) return record_py_error();
  PyObject *lst = PyObject_CallMethod(x, "tolist", nullptr);
  Py_DECREF(x);
  if (!lst) return record_py_error();
  Py_ssize_t m = PyList_Size(lst);
  for (Py_ssize_t i = 0; i < m && i < (Py_ssize_t)n; ++i)
    out[i] = PyFloat_AsDouble(PyList_GET_ITEM(lst, i));
  Py_DECREF(lst);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_PreconCreate(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "precon_create");
}
uint32_t HYPREDRV_LinearSolverCreate(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "linear_solver_create");
}
uint32_t HYPREDRV_LinearSolverSetup(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "linear_solver_setup");
}
uint32_t HYPREDRV_LinearSolverApply(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "linear_solver_apply");
}
uint32_t HYPREDRV_PreconDestroy(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "precon_destroy");
}
uint32_t HYPREDRV_LinearSolverDestroy(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "linear_solver_destroy");
}

uint32_t HYPREDRV_StatsPrint(HYPREDRV_t h) {
  GIL gil; return call0(h, "stats_print"); }

uint32_t HYPREDRV_LinearSolverGetNumIterations(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *r = PyObject_CallMethod(obj, "get_num_iterations", nullptr);
  if (!r) return record_py_error();
  *out = (int32_t)PyLong_AsLong(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_LinearSolverGetFinalRelativeResidualNorm(HYPREDRV_t h,
                                                           double *out) {
  GIL gil;
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *r = PyObject_CallMethod(obj, "get_final_rel_res_norm", nullptr);
  if (!r) return record_py_error();
  *out = PyFloat_AsDouble(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_AnnotateBegin(HYPREDRV_t h, const char *name,
                                int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_begin", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_AnnotateEnd(HYPREDRV_t h, const char *name, int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_end", args);
  Py_DECREF(args);
  return rc;
}


/* -- error model extensions ---------------------------------------------- */

uint32_t HYPREDRV_ErrorCodeClear(void) {
  GIL gil;
  if (!g_module) return 0;
  PyObject *em = PyImport_ImportModule("hypredrive_tpu.core.errors");
  if (!em) return record_py_error();
  PyObject *r = PyObject_CallMethod(em, "error_code_clear", nullptr);
  Py_XDECREF(r);
  Py_DECREF(em);
  g_err.clear();
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_ErrorInvalidValue(void) {
  GIL gil;
  return 1u << 3; /* ErrorCode.INVALID_VAL (core/errors.py) */
}

void HYPREDRV_SafeCallHandleError(uint32_t code, const char *file, int line) {
  GIL gil;
  if (!code) return;
  fprintf(stderr, "HYPREDRIVE Failure!!! %s:%d: %s (%s)\n",
          file ? file : "?", line, HYPREDRV_ErrorCodeDescribe(code),
          g_err.c_str());
  abort();
}

/* -- info printers -------------------------------------------------------- */

uint32_t HYPREDRV_PrintLibInfo(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "print_lib_info");
}
uint32_t HYPREDRV_PrintSystemInfo(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "print_system_info");
}
uint32_t HYPREDRV_PrintExitInfo(HYPREDRV_t h, const char *argv0) {
  GIL gil;
  (void)argv0;
  return call0(h, "print_exit_info");
}

/* -- configuration extensions --------------------------------------------- */

uint32_t HYPREDRV_ObjectSetName(HYPREDRV_t h, const char *name) {
  GIL gil;
  return call_str(h, "object_set_name", name);
}

static uint32_t args_getter_i32(HYPREDRV_t h, const char *attr_path,
                                int32_t *out) {
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *args = PyObject_GetAttrString(obj, "args");
  if (!args || args == Py_None) {
    Py_XDECREF(args);
    g_err = "input args not parsed";
    return ERR_PY;
  }
  PyObject *cur = args;
  std::string path(attr_path);
  size_t pos = 0, next;
  while ((next = path.find('.', pos)) != std::string::npos) {
    PyObject *nxt = PyObject_GetAttrString(cur, path.substr(pos, next - pos).c_str());
    Py_DECREF(cur);
    if (!nxt) return record_py_error();
    cur = nxt;
    pos = next + 1;
  }
  PyObject *val = PyObject_GetAttrString(cur, path.substr(pos).c_str());
  Py_DECREF(cur);
  if (!val) return record_py_error();
  *out = (int32_t)PyLong_AsLong(val);
  if (PyErr_Occurred()) {
    /* bools / non-int -> truthiness */
    PyErr_Clear();
    *out = (int32_t)PyObject_IsTrue(val);
  }
  Py_DECREF(val);
  return 0;
}

uint32_t HYPREDRV_InputArgsGetNumLinearSystems(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  return args_getter_i32(h, "linear_system.num_systems", out);
}
uint32_t HYPREDRV_InputArgsGetNumPreconVariants(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  return args_getter_i32(h, "num_precon_variants", out);
}
uint32_t HYPREDRV_InputArgsGetNumRepetitions(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  return args_getter_i32(h, "general.num_repetitions", out);
}
uint32_t HYPREDRV_InputArgsGetWarmup(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  return args_getter_i32(h, "general.warmup", out);
}

uint32_t HYPREDRV_InputArgsSetPreconVariant(HYPREDRV_t h, int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(i)", index);
  uint32_t rc = call0(h, "set_precon_variant", args);
  Py_DECREF(args);
  return rc;
}

static uint32_t set_preset(HYPREDRV_t h, const char *name, const char *kind) {
  /* re-parse the active config with the preset applied */
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *presets = PyImport_ImportModule("hypredrive_tpu.config.presets");
  if (!presets) return record_py_error();
  PyObject *p = PyObject_CallMethod(presets, "get_preset", "ss", name, kind);
  Py_DECREF(presets);
  if (!p) return record_py_error();
  if (p == Py_None) {
    Py_DECREF(p);
    g_err = std::string("unknown preset '") + name + "'";
    return ERR_PY;
  }
  PyObject *text = PyObject_GetAttrString(p, "text");
  Py_DECREF(p);
  if (!text) return record_py_error();
  PyObject *apply = PyObject_CallMethod(
      handle_obj(h), "apply_preset_text", "Os", text, kind);
  Py_DECREF(text);
  if (!apply) return record_py_error();
  Py_DECREF(apply);
  return 0;
}

uint32_t HYPREDRV_InputArgsSetPreconPreset(HYPREDRV_t h, const char *name) {
  GIL gil;
  return set_preset(h, name, "precon");
}
uint32_t HYPREDRV_InputArgsSetSolverPreset(HYPREDRV_t h, const char *name) {
  GIL gil;
  return set_preset(h, name, "solver");
}

static uint32_t register_preset(const char *name, const char *yaml,
                                const char *fn) {
  PyObject *presets = PyImport_ImportModule("hypredrive_tpu.config.presets");
  if (!presets) return record_py_error();
  PyObject *r = PyObject_CallMethod(presets, fn, "ss", name, yaml);
  Py_DECREF(presets);
  if (!r) return record_py_error();
  Py_DECREF(r);
  return 0;
}

uint32_t HYPREDRV_PreconPresetRegister(const char *name, const char *yaml) {
  GIL gil;
  return register_preset(name, yaml, "register_precon_preset");
}
uint32_t HYPREDRV_SolverPresetRegister(const char *name, const char *yaml) {
  GIL gil;
  return register_preset(name, yaml, "register_solver_preset");
}

/* -- linear system extensions --------------------------------------------- */

uint32_t HYPREDRV_LinearSystemReadMatrix(HYPREDRV_t h, const char *path) {
  GIL gil;
  return call_str(h, "read_matrix", path);
}

uint32_t HYPREDRV_LinearSystemSetMatrix(HYPREDRV_t h, int64_t n,
                                        const int64_t *indptr,
                                        const int64_t *indices,
                                        const double *data) {
  GIL gil;
  return HYPREDRV_LinearSystemSetMatrixFromCSR(h, n, indptr, indices, data);
}

uint32_t HYPREDRV_LinearSystemSetPrecMatrix(HYPREDRV_t h, int64_t n,
                                            const int64_t *indptr,
                                            const int64_t *indices,
                                            const double *data) {
  GIL gil;
  PyObject *mat = scipy_csr(n, indptr, indices, data, n);
  if (!mat) return record_py_error();
  PyObject *args = PyTuple_Pack(1, mat);
  Py_DECREF(mat);
  uint32_t rc = call0(h, "set_prec_matrix", args);
  Py_DECREF(args);
  return rc;
}

static uint32_t set_vec(HYPREDRV_t h, const char *method, int64_t n,
                        const double *v) {
  PyObject *a0 = np_from_f64(v, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = call0(h, method, args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetRHS(HYPREDRV_t h, int64_t n,
                                     const double *v) {
  GIL gil;
  return set_vec(h, "set_rhs", n, v);
}
uint32_t HYPREDRV_LinearSystemSetSolution(HYPREDRV_t h, int64_t n,
                                          const double *v) {
  GIL gil;
  return set_vec(h, "set_solution", n, v);
}
uint32_t HYPREDRV_LinearSystemSetReferenceSolution(HYPREDRV_t h, int64_t n,
                                                   const double *v) {
  GIL gil;
  return set_vec(h, "set_reference_solution", n, v);
}

static uint32_t set_vecs_2d(HYPREDRV_t h, const char *method,
                            int32_t num_vecs, int64_t n, const double *v) {
  PyObject *flat = np_from_f64(v, (int64_t)num_vecs * n);
  if (!flat) return record_py_error();
  PyObject *shaped = PyObject_CallMethod(flat, "reshape", "(ii)",
                                         (int)num_vecs, (int)n);
  Py_DECREF(flat);
  if (!shaped) return record_py_error();
  PyObject *args = PyTuple_Pack(1, shaped);
  Py_DECREF(shaped);
  uint32_t rc = call0(h, method, args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetNearNullSpace(HYPREDRV_t h, int32_t k,
                                               int64_t n, const double *v) {
  GIL gil;
  return set_vecs_2d(h, "set_near_nullspace", k, n, v);
}
uint32_t HYPREDRV_LinearSystemSetNullSpace(HYPREDRV_t h, int32_t k,
                                           int64_t n, const double *v) {
  GIL gil;
  return set_vecs_2d(h, "set_nullspace", k, n, v);
}

static uint32_t set_operator_csr(HYPREDRV_t h, const char *method, int64_t n,
                                 const int64_t *indptr,
                                 const int64_t *indices, const double *data) {
  PyObject *mat = scipy_csr(n, indptr, indices, data);
  if (!mat) return record_py_error();
  PyObject *args = PyTuple_Pack(1, mat);
  Py_DECREF(mat);
  uint32_t rc = call0(h, method, args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetDiscreteGradient(
    HYPREDRV_t h, int64_t n, const int64_t *indptr, const int64_t *indices,
    const double *data) {
  GIL gil;
  return set_operator_csr(h, "set_discrete_gradient", n, indptr, indices,
                          data);
}
uint32_t HYPREDRV_LinearSystemSetDiscreteCurl(
    HYPREDRV_t h, int64_t n, const int64_t *indptr, const int64_t *indices,
    const double *data) {
  GIL gil;
  return set_operator_csr(h, "set_discrete_curl", n, indptr, indices, data);
}

uint32_t HYPREDRV_LinearSystemSetCoordinates(HYPREDRV_t h, int32_t dim,
                                             int64_t n, const double *v) {
  GIL gil;
  PyObject *flat = np_from_f64(v, n * dim);
  if (!flat) return record_py_error();
  PyObject *shaped = PyObject_CallMethod(flat, "reshape", "(ii)", (int)n,
                                         (int)dim);
  Py_DECREF(flat);
  if (!shaped) return record_py_error();
  PyObject *args = PyTuple_Pack(1, shaped);
  Py_DECREF(shaped);
  uint32_t rc = call0(h, "set_coordinates", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetDofmap(HYPREDRV_t h, int64_t n,
                                        const int64_t *labels) {
  GIL gil;
  PyObject *a0 = np_from_i64(labels, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = call0(h, "set_dofmap", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetInterleavedDofmap(HYPREDRV_t h,
                                                   int32_t num_functions) {
  GIL gil;
  PyObject *args = Py_BuildValue("(i)", num_functions);
  uint32_t rc = call0(h, "set_interleaved_dofmap", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemSetContiguousDofmap(HYPREDRV_t h,
                                                  int32_t num_functions) {
  GIL gil;
  PyObject *args = Py_BuildValue("(i)", num_functions);
  uint32_t rc = call0(h, "set_contiguous_dofmap", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemReadDofmap(HYPREDRV_t h, const char *path) {
  GIL gil;
  return call_str(h, "read_dofmap", path);
}
uint32_t HYPREDRV_LinearSystemPrint(HYPREDRV_t h, const char *prefix) {
  GIL gil;
  return call_str(h, "linear_system_print", prefix);
}
uint32_t HYPREDRV_LinearSystemPrintDofmap(HYPREDRV_t h, const char *path) {
  GIL gil;
  return call_str(h, "print_dofmap", path);
}
uint32_t HYPREDRV_LinearSystemComputeEigenspectrum(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "compute_eigenspectrum");
}

/* -- solution getters ------------------------------------------------------ */

uint32_t HYPREDRV_LinearSystemGetSolutionLength(HYPREDRV_t h, int64_t *out) {
  GIL gil;
  PyObject *r = call_ret(h, "get_solution_length");
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  *out = (int64_t)PyLong_AsLongLong(r);
  Py_DECREF(r);
  if (PyErr_Occurred()) return record_py_error();
  return 0;
}

uint32_t HYPREDRV_LinearSystemGetSolutionNorm(HYPREDRV_t h, double *out) {
  GIL gil;
  return get_f64(h, "get_solution_norm", out);
}

uint32_t HYPREDRV_LinearSystemGetRHSValues(HYPREDRV_t h, int64_t n,
                                           double *out) {
  GIL gil;
  return get_f64_array(h, "get_rhs_values", n, out);
}

static uint32_t get_opaque(HYPREDRV_t h, const char *method, void **out) {
  PyObject *r = call_ret(h, method);
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  /* borrowed opaque pointer; lifetime = the driver object's system */
  *out = (void *)r;
  Py_DECREF(r);
  return 0;
}

uint32_t HYPREDRV_LinearSystemGetMatrix(HYPREDRV_t h, void **out) {
  GIL gil;
  PyObject *obj = handle_obj(h);
  if (!obj) return ERR_BADHANDLE;
  PyObject *sys = PyObject_GetAttrString(obj, "system");
  if (!sys) return record_py_error();
  *out = (void *)sys;
  Py_DECREF(sys);
  return 0;
}
uint32_t HYPREDRV_LinearSystemGetRHS(HYPREDRV_t h, void **out) {
  GIL gil;
  return get_opaque(h, "get_rhs_values", out);
}
uint32_t HYPREDRV_LinearSystemGetSolution(HYPREDRV_t h, void **out) {
  GIL gil;
  return get_opaque(h, "get_solution", out);
}

/* -- state vectors --------------------------------------------------------- */

uint32_t HYPREDRV_StateVectorSet(HYPREDRV_t h, int32_t num_states, int64_t n,
                                 double **vectors) {
  GIL gil;
  PyObject *lst = PyList_New(num_states);
  if (!lst) return record_py_error();
  for (int32_t i = 0; i < num_states; ++i) {
    PyObject *a = np_from_f64(vectors[i], n);
    if (!a) {
      Py_DECREF(lst);
      return record_py_error();
    }
    PyList_SET_ITEM(lst, i, a);
  }
  PyObject *args = PyTuple_Pack(1, lst);
  Py_DECREF(lst);
  uint32_t rc = call0(h, "state_vector_set", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_StateVectorGetValues(HYPREDRV_t h, int32_t index,
                                       int64_t n, double *out) {
  GIL gil;
  PyObject *args = Py_BuildValue("(i)", index);
  uint32_t rc = get_f64_array(h, "state_vector_get_values", n, out, args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_StateVectorCopy(HYPREDRV_t h, int32_t in_idx,
                                  int32_t out_idx) {
  GIL gil;
  PyObject *args = Py_BuildValue("(ii)", in_idx, out_idx);
  uint32_t rc = call0(h, "state_vector_copy", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_StateVectorUpdateAll(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "state_vector_update_all");
}

uint32_t HYPREDRV_StateVectorApplyCorrection(HYPREDRV_t h, int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(i)", index);
  uint32_t rc = call0(h, "state_vector_apply_correction", args);
  Py_DECREF(args);
  return rc;
}

/* -- solve lifecycle extensions -------------------------------------------- */

uint32_t HYPREDRV_PreconSetup(HYPREDRV_t h) {
  GIL gil; return call0(h, "precon_setup"); }

uint32_t HYPREDRV_PreconApply(HYPREDRV_t h, int64_t n, const double *r,
                              double *z) {
  GIL gil;
  PyObject *a0 = np_from_f64(r, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = get_f64_array(h, "precon_apply", n, z, args);
  Py_DECREF(args);
  return rc;
}

/* -- stats extensions ------------------------------------------------------ */

uint32_t HYPREDRV_AnnotateLevelBegin(HYPREDRV_t h, const char *name,
                                     int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_level_begin", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_AnnotateLevelEnd(HYPREDRV_t h, const char *name,
                                   int32_t index) {
  GIL gil;
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_level_end", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_StatsLevelPrint(HYPREDRV_t h) {
  GIL gil;
  return call0(h, "stats_level_print");
}

uint32_t HYPREDRV_StatsLevelGetCount(HYPREDRV_t h, const char *name,
                                     int32_t *out) {
  GIL gil;
  PyObject *args = Py_BuildValue("(s)", name);
  PyObject *r = call_ret(h, "get_level_records", args);
  Py_DECREF(args);
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  Py_ssize_t m = PyObject_Length(r);
  Py_DECREF(r);
  if (m < 0) return record_py_error();
  *out = (int32_t)m;
  return 0;
}

uint32_t HYPREDRV_StatsLevelGetEntry(HYPREDRV_t h, const char *name,
                                     int32_t entry, double *time_out) {
  GIL gil;
  PyObject *args = Py_BuildValue("(s)", name);
  PyObject *r = call_ret(h, "get_level_records", args);
  Py_DECREF(args);
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  PyObject *item = PySequence_GetItem(r, entry);
  Py_DECREF(r);
  if (!item) return record_py_error();
  /* record is a dict with "time", (index, time), or .time */
  double t = 0.0;
  if (PyDict_Check(item)) {
    PyObject *v = PyDict_GetItemString(item, "time");  /* borrowed */
    if (v) t = PyFloat_AsDouble(v);
  } else if (PyTuple_Check(item) || PyList_Check(item)) {
    PyObject *v = PySequence_GetItem(item, PySequence_Length(item) - 1);
    if (v) { t = PyFloat_AsDouble(v); Py_DECREF(v); }
  } else if (PyObject_HasAttrString(item, "time")) {
    PyObject *v = PyObject_GetAttrString(item, "time");
    if (v) { t = PyFloat_AsDouble(v); Py_DECREF(v); }
  } else {
    t = PyFloat_AsDouble(item);
  }
  Py_DECREF(item);
  if (PyErr_Occurred()) return record_py_error();
  *time_out = t;
  return 0;
}

/* -- solver getter aliases -------------------------------------------------- */

uint32_t HYPREDRV_LinearSolverGetNumIter(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  return HYPREDRV_LinearSolverGetNumIterations(h, out);
}

uint32_t HYPREDRV_LinearSolverGetConverged(HYPREDRV_t h, int32_t *out) {
  GIL gil;
  PyObject *r = call_ret(h, "get_converged");
  if (!r) return handle_obj(h) ? record_py_error() : ERR_BADHANDLE;
  *out = PyObject_IsTrue(r);
  Py_DECREF(r);
  return 0;
}

uint32_t HYPREDRV_LinearSolverGetSetupTime(HYPREDRV_t h, double *out) {
  GIL gil;
  return get_f64(h, "get_setup_time", out);
}

uint32_t HYPREDRV_LinearSolverGetSolveTime(HYPREDRV_t h, double *out) {
  GIL gil;
  return get_f64(h, "get_solve_time", out);
}

}  // extern "C"
