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

}  // namespace

extern "C" {

uint32_t HYPREDRV_Initialize(void) {
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
  for (auto &kv : g_handles) {
    PyObject *r = PyObject_CallMethod(kv.second, "destroy", nullptr);
    Py_XDECREF(r);
    PyErr_Clear();
    Py_DECREF(kv.second);
  }
  g_handles.clear();
  Py_XDECREF(g_module);
  g_module = nullptr;
  if (g_we_initialized) {
    Py_Finalize();
    g_we_initialized = false;
  }
  return 0;
}

uint32_t HYPREDRV_Create(HYPREDRV_t *hp) {
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

const char *HYPREDRV_ErrorMessage(void) { return g_err.c_str(); }

uint32_t HYPREDRV_InputArgsParse(HYPREDRV_t h, const char *yaml) {
  PyObject *args = Py_BuildValue("(s)", yaml);
  uint32_t rc = call0(h, "input_args_parse", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_SetLibraryMode(HYPREDRV_t h) {
  return call0(h, "set_library_mode");
}

uint32_t HYPREDRV_LinearSystemBuild(HYPREDRV_t h) {
  return call0(h, "linear_system_build");
}

uint32_t HYPREDRV_LinearSystemSetMatrixFromCSR(HYPREDRV_t h, int64_t n,
                                               const int64_t *indptr,
                                               const int64_t *indices,
                                               const double *data) {
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
  PyObject *a0 = np_from_f64(v, n);
  if (!a0) return record_py_error();
  PyObject *args = PyTuple_Pack(1, a0);
  Py_DECREF(a0);
  uint32_t rc = call0(h, "set_initial_guess", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_LinearSystemResetInitialGuess(HYPREDRV_t h) {
  return call0(h, "reset_initial_guess");
}

uint32_t HYPREDRV_LinearSystemGetSolutionValues(HYPREDRV_t h, int64_t n,
                                                double *out) {
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
  return call0(h, "precon_create");
}
uint32_t HYPREDRV_LinearSolverCreate(HYPREDRV_t h) {
  return call0(h, "linear_solver_create");
}
uint32_t HYPREDRV_LinearSolverSetup(HYPREDRV_t h) {
  return call0(h, "linear_solver_setup");
}
uint32_t HYPREDRV_LinearSolverApply(HYPREDRV_t h) {
  return call0(h, "linear_solver_apply");
}
uint32_t HYPREDRV_PreconDestroy(HYPREDRV_t h) {
  return call0(h, "precon_destroy");
}
uint32_t HYPREDRV_LinearSolverDestroy(HYPREDRV_t h) {
  return call0(h, "linear_solver_destroy");
}

uint32_t HYPREDRV_StatsPrint(HYPREDRV_t h) { return call0(h, "stats_print"); }

uint32_t HYPREDRV_LinearSolverGetNumIterations(HYPREDRV_t h, int32_t *out) {
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
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_begin", args);
  Py_DECREF(args);
  return rc;
}

uint32_t HYPREDRV_AnnotateEnd(HYPREDRV_t h, const char *name, int32_t index) {
  PyObject *args = Py_BuildValue("(si)", name, index);
  uint32_t rc = call0(h, "annotate_end", args);
  Py_DECREF(args);
  return rc;
}

}  // extern "C"
