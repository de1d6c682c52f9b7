/* C++ host VM driving per-node thunks.
 *
 * TPU-native analogue of the reference's lazylinker_c.c (CLazyLinker,
 * aesara/link/c/c_code/lazylinker_c.c:103-147): executes a straight-line
 * or lazy (demand-driven) schedule of Python thunk callables without the
 * Python interpreter loop, collecting per-node call counts and wall
 * times.  On the XLA path the whole graph is one executable, so this VM
 * serves the py/oracle/diagnostic linkers and multi-program functions
 * (lazy IfElse branches, partial output_subset evaluation).
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <chrono>
#include <cstdint>
#include <vector>

namespace {

using clock_t_ = std::chrono::steady_clock;

struct CVM {
  PyObject_HEAD
  PyObject *thunks;        /* tuple of callables */
  PyObject *clear_lists;   /* tuple (per thunk) of tuples of storage cells */
  PyObject *node_deps;     /* tuple (per thunk) of tuples of thunk indices */
  int allow_gc;
  int time_thunks;
  std::vector<double> *call_times;
  std::vector<int64_t> *call_counts;
};

static void CVM_dealloc(CVM *self) {
  Py_XDECREF(self->thunks);
  Py_XDECREF(self->clear_lists);
  Py_XDECREF(self->node_deps);
  delete self->call_times;
  delete self->call_counts;
  Py_TYPE(self)->tp_free((PyObject *)self);
}

static int CVM_init(CVM *self, PyObject *args, PyObject *kwargs) {
  static const char *kwlist[] = {"thunks", "clear_lists", "node_deps",
                                 "allow_gc", "time_thunks", nullptr};
  PyObject *thunks = nullptr, *clear_lists = Py_None, *node_deps = Py_None;
  int allow_gc = 0, time_thunks = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "O|OOii", const_cast<char **>(kwlist), &thunks,
          &clear_lists, &node_deps, &allow_gc, &time_thunks))
    return -1;
  PyObject *thunks_t = PySequence_Tuple(thunks);
  if (!thunks_t) return -1;
  Py_XDECREF(self->thunks);
  self->thunks = thunks_t;
  Py_INCREF(clear_lists);
  Py_XDECREF(self->clear_lists);
  self->clear_lists = clear_lists;
  Py_INCREF(node_deps);
  Py_XDECREF(self->node_deps);
  self->node_deps = node_deps;
  self->allow_gc = allow_gc;
  self->time_thunks = time_thunks;
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  delete self->call_times;
  delete self->call_counts;
  self->call_times = new std::vector<double>(n, 0.0);
  self->call_counts = new std::vector<int64_t>(n, 0);
  return 0;
}

static int run_one(CVM *self, Py_ssize_t i) {
  PyObject *thunk = PyTuple_GET_ITEM(self->thunks, i);
  PyObject *res;
  if (self->time_thunks) {
    auto t0 = clock_t_::now();
    res = PyObject_CallNoArgs(thunk);
    auto t1 = clock_t_::now();
    (*self->call_times)[i] +=
        std::chrono::duration<double>(t1 - t0).count();
  } else {
    res = PyObject_CallNoArgs(thunk);
  }
  if (!res) return -1;
  Py_DECREF(res);
  (*self->call_counts)[i] += 1;
  if (self->allow_gc && self->clear_lists != Py_None) {
    PyObject *clears = PySequence_GetItem(self->clear_lists, i);
    if (!clears) return -1;
    Py_ssize_t m = PySequence_Size(clears);
    for (Py_ssize_t j = 0; j < m; ++j) {
      PyObject *cell = PySequence_GetItem(clears, j);
      if (!cell) { Py_DECREF(clears); return -1; }
      if (PyList_Check(cell) && PyList_GET_SIZE(cell) > 0) {
        if (PyList_SetItem(cell, 0, Py_NewRef(Py_None)) < 0) {
          Py_DECREF(cell);
          Py_DECREF(clears);
          return -1;
        }
      }
      Py_DECREF(cell);
    }
    Py_DECREF(clears);
  }
  return 0;
}

/* straight-line schedule */
static PyObject *CVM_call(CVM *self, PyObject *args, PyObject *kwargs) {
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  for (Py_ssize_t i = 0; i < n; ++i) {
    if (run_one(self, i) < 0) {
      /* annotate with node index (reference position_of_error) */
      PyObject *t, *v, *tb;
      PyErr_Fetch(&t, &v, &tb);
      PyErr_NormalizeException(&t, &v, &tb);
      if (v) {
        PyObject *idx = PyLong_FromSsize_t(i);
        PyObject_SetAttrString(v, "position_of_error", idx);
        Py_DECREF(idx);
      }
      PyErr_Restore(t, v, tb);
      return nullptr;
    }
  }
  Py_RETURN_NONE;
}

/* demand-driven lazy evaluation of a subset of target thunks */
static PyObject *CVM_run_subset(CVM *self, PyObject *arg) {
  if (self->node_deps == Py_None) {
    PyErr_SetString(PyExc_ValueError, "run_subset requires node_deps");
    return nullptr;
  }
  PyObject *targets = PySequence_Tuple(arg);
  if (!targets) return nullptr;
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  std::vector<char> done(n, 0), visiting(n, 0);
  /* iterative DFS over deps, post-order execution */
  std::vector<Py_ssize_t> stack;
  Py_ssize_t nt = PyTuple_GET_SIZE(targets);
  for (Py_ssize_t k = 0; k < nt; ++k) {
    long t = PyLong_AsLong(PyTuple_GET_ITEM(targets, k));
    if (t == -1 && PyErr_Occurred()) { Py_DECREF(targets); return nullptr; }
    stack.push_back(t);
  }
  Py_DECREF(targets);
  while (!stack.empty()) {
    Py_ssize_t i = stack.back();
    if (i < 0 || i >= n) {
      PyErr_SetString(PyExc_IndexError, "thunk index out of range");
      return nullptr;
    }
    if (done[i]) { stack.pop_back(); continue; }
    if (!visiting[i]) {
      visiting[i] = 1;
      PyObject *deps = PySequence_GetItem(self->node_deps, i);
      if (!deps) return nullptr;
      Py_ssize_t m = PySequence_Size(deps);
      bool pushed = false;
      for (Py_ssize_t j = 0; j < m; ++j) {
        PyObject *d = PySequence_GetItem(deps, j);
        long di = PyLong_AsLong(d);
        Py_DECREF(d);
        if (di == -1 && PyErr_Occurred()) { Py_DECREF(deps); return nullptr; }
        if (!done[di]) { stack.push_back(di); pushed = true; }
      }
      Py_DECREF(deps);
      if (pushed) continue;
    }
    if (run_one(self, i) < 0) return nullptr;
    done[i] = 1;
    stack.pop_back();
  }
  Py_RETURN_NONE;
}

static PyObject *CVM_get_times(CVM *self, PyObject *) {
  Py_ssize_t n = (Py_ssize_t)self->call_times->size();
  PyObject *lst = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i)
    PyList_SET_ITEM(lst, i, PyFloat_FromDouble((*self->call_times)[i]));
  return lst;
}

static PyObject *CVM_get_counts(CVM *self, PyObject *) {
  Py_ssize_t n = (Py_ssize_t)self->call_counts->size();
  PyObject *lst = PyList_New(n);
  for (Py_ssize_t i = 0; i < n; ++i)
    PyList_SET_ITEM(lst, i, PyLong_FromLongLong((*self->call_counts)[i]));
  return lst;
}

static PyMethodDef CVM_methods[] = {
    {"run_subset", (PyCFunction)CVM_run_subset, METH_O,
     "lazily evaluate only the thunks needed for the given target indices"},
    {"get_times", (PyCFunction)CVM_get_times, METH_NOARGS,
     "per-thunk accumulated seconds"},
    {"get_counts", (PyCFunction)CVM_get_counts, METH_NOARGS,
     "per-thunk call counts"},
    {nullptr, nullptr, 0, nullptr}};

static PyTypeObject CVMType = {
    PyVarObject_HEAD_INIT(nullptr, 0)
};

static PyModuleDef cvm_module = {
    PyModuleDef_HEAD_INIT, "cvm",
    "C++ host VM for aesara_tpu (lazylinker_c analogue)", -1,
    nullptr, nullptr, nullptr, nullptr, nullptr};

}  // namespace

PyMODINIT_FUNC PyInit_cvm(void) {
  CVMType.tp_name = "cvm.CVM";
  CVMType.tp_basicsize = sizeof(CVM);
  CVMType.tp_flags = Py_TPFLAGS_DEFAULT;
  CVMType.tp_new = PyType_GenericNew;
  CVMType.tp_init = (initproc)CVM_init;
  CVMType.tp_dealloc = (destructor)CVM_dealloc;
  CVMType.tp_call = (ternaryfunc)CVM_call;
  CVMType.tp_methods = CVM_methods;
  CVMType.tp_doc = "straight-line / lazy thunk VM";
  if (PyType_Ready(&CVMType) < 0) return nullptr;
  PyObject *m = PyModule_Create(&cvm_module);
  if (!m) return nullptr;
  Py_INCREF(&CVMType);
  if (PyModule_AddObject(m, "CVM", (PyObject *)&CVMType) < 0) {
    Py_DECREF(&CVMType);
    Py_DECREF(m);
    return nullptr;
  }
  return m;
}
