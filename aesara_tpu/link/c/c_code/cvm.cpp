/* C++ host VM driving per-node thunks.
 *
 * TPU-native analogue of the reference's lazylinker_c.c (CLazyLinker,
 * aesara/link/c/c_code/lazylinker_c.c:103-147): executes a straight-line
 * or lazy (demand-driven) schedule of Python thunk callables without the
 * Python interpreter loop, collecting per-node call counts and wall
 * times.  On the XLA path the whole graph is one executable, so this VM
 * serves the py/oracle/diagnostic linkers and multi-program functions
 * (lazy IfElse branches, partial output_subset evaluation).
 *
 * Lazy-thunk protocol: a thunk whose lazy flag is set may return either
 * None (node fully computed) or a sequence of THUNK INDICES that must
 * run before it is retried — this is how IfElse evaluates only the
 * taken branch (the reference returns input positions; here the linker
 * bakes the position→thunk mapping into the thunk, keeping the C side
 * index-only).  Update-storage pairs are applied inside the VM after a
 * full run (reference UpdatingVM / lazylinker update handling).
 *
 * The GIL stays held: every unit of work is a Python callable, so there
 * is no C-side region to release it around (same as the reference VM).
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
  PyObject *update_pairs;  /* tuple of (dst_cell, src_cell) storage lists */
  PyObject *default_targets; /* thunk indices producing fgraph outputs */
  int allow_gc;
  int time_thunks;
  int has_lazy;
  std::vector<char> *lazy;
  std::vector<double> *call_times;
  std::vector<int64_t> *call_counts;
};

static void CVM_dealloc(CVM *self) {
  Py_XDECREF(self->thunks);
  Py_XDECREF(self->clear_lists);
  Py_XDECREF(self->node_deps);
  Py_XDECREF(self->update_pairs);
  Py_XDECREF(self->default_targets);
  delete self->lazy;
  delete self->call_times;
  delete self->call_counts;
  Py_TYPE(self)->tp_free((PyObject *)self);
}

static int CVM_init(CVM *self, PyObject *args, PyObject *kwargs) {
  static const char *kwlist[] = {"thunks", "clear_lists", "node_deps",
                                 "allow_gc", "time_thunks", "lazy_flags",
                                 "update_pairs", "default_targets", nullptr};
  PyObject *thunks = nullptr, *clear_lists = Py_None, *node_deps = Py_None;
  PyObject *lazy_flags = Py_None, *update_pairs = Py_None,
           *default_targets = Py_None;
  int allow_gc = 0, time_thunks = 0;
  if (!PyArg_ParseTupleAndKeywords(
          args, kwargs, "O|OOiiOOO", const_cast<char **>(kwlist), &thunks,
          &clear_lists, &node_deps, &allow_gc, &time_thunks, &lazy_flags,
          &update_pairs, &default_targets))
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
  Py_INCREF(update_pairs);
  Py_XDECREF(self->update_pairs);
  self->update_pairs = update_pairs;
  Py_INCREF(default_targets);
  Py_XDECREF(self->default_targets);
  self->default_targets = default_targets;
  self->allow_gc = allow_gc;
  self->time_thunks = time_thunks;
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  delete self->lazy;
  self->lazy = new std::vector<char>(n, 0);
  self->has_lazy = 0;
  if (lazy_flags != Py_None) {
    for (Py_ssize_t i = 0; i < n; ++i) {
      PyObject *f = PySequence_GetItem(lazy_flags, i);
      if (!f) return -1;
      int truth = PyObject_IsTrue(f);
      Py_DECREF(f);
      if (truth < 0) return -1;
      (*self->lazy)[i] = (char)truth;
      if (truth) self->has_lazy = 1;
    }
  }
  delete self->call_times;
  delete self->call_counts;
  self->call_times = new std::vector<double>(n, 0.0);
  self->call_counts = new std::vector<int64_t>(n, 0);
  return 0;
}

/* call thunk i with timing; returns new ref (its result) or null */
static PyObject *call_thunk(CVM *self, Py_ssize_t i) {
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
  if (res) (*self->call_counts)[i] += 1;
  return res;
}

static int run_one(CVM *self, Py_ssize_t i) {
  PyObject *res = call_thunk(self, i);
  if (!res) return -1;
  Py_DECREF(res);
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

static void annotate_position(Py_ssize_t i) {
  /* attach node index to the in-flight exception (reference
   * position_of_error) */
  PyObject *t, *v, *tb;
  PyErr_Fetch(&t, &v, &tb);
  PyErr_NormalizeException(&t, &v, &tb);
  if (v) {
    PyObject *idx = PyLong_FromSsize_t(i);
    PyObject_SetAttrString(v, "position_of_error", idx);
    Py_DECREF(idx);
  }
  PyErr_Restore(t, v, tb);
}

static int apply_updates(CVM *self) {
  /* dst_cell[0] = src_cell[0] for each update pair (reference
   * UpdatingVM.perform_updates, vm.py:284) */
  if (self->update_pairs == Py_None) return 0;
  Py_ssize_t m = PySequence_Size(self->update_pairs);
  if (m < 0) return -1;
  for (Py_ssize_t k = 0; k < m; ++k) {
    PyObject *pair = PySequence_GetItem(self->update_pairs, k);
    if (!pair) return -1;
    PyObject *dst = PySequence_GetItem(pair, 0);
    PyObject *src = PySequence_GetItem(pair, 1);
    Py_DECREF(pair);
    if (!dst || !src) { Py_XDECREF(dst); Py_XDECREF(src); return -1; }
    PyObject *val = PySequence_GetItem(src, 0);
    if (!val) { Py_DECREF(dst); Py_DECREF(src); return -1; }
    int rc = PySequence_SetItem(dst, 0, val);
    Py_DECREF(val);
    Py_DECREF(dst);
    Py_DECREF(src);
    if (rc < 0) return -1;
  }
  return 0;
}

/* demand-driven post-order execution toward the given target thunks;
 * lazy thunks steer their own dependency requests (the IfElse taken
 * branch).  `done`/`visiting` are caller-owned so repeated waves share
 * completion state. */
static int run_targets(CVM *self, const std::vector<Py_ssize_t> &targets,
                       std::vector<char> &done) {
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  std::vector<char> visiting(n, 0);
  std::vector<int> lazy_rounds(n, 0);
  std::vector<Py_ssize_t> stack(targets.begin(), targets.end());
  while (!stack.empty()) {
    Py_ssize_t i = stack.back();
    if (i < 0 || i >= n) {
      PyErr_SetString(PyExc_IndexError, "thunk index out of range");
      return -1;
    }
    if (done[i]) { stack.pop_back(); continue; }
    if ((*self->lazy)[i]) {
      /* ask the thunk what it still needs */
      PyObject *res = call_thunk(self, i);
      if (!res) { annotate_position(i); return -1; }
      if (res == Py_None) {
        Py_DECREF(res);
        done[i] = 1;
        stack.pop_back();
        continue;
      }
      if (++lazy_rounds[i] > 3) {
        Py_DECREF(res);
        PyErr_SetString(PyExc_RuntimeError,
                        "lazy thunk keeps requesting computed deps");
        return -1;
      }
      PyObject *seq = PySequence_Tuple(res);
      Py_DECREF(res);
      if (!seq) return -1;
      Py_ssize_t m = PyTuple_GET_SIZE(seq);
      bool pushed = false;
      for (Py_ssize_t j = 0; j < m; ++j) {
        long di = PyLong_AsLong(PyTuple_GET_ITEM(seq, j));
        if (di == -1 && PyErr_Occurred()) { Py_DECREF(seq); return -1; }
        if (di >= 0 && !done[di]) { stack.push_back(di); pushed = true; }
      }
      Py_DECREF(seq);
      if (!pushed) {
        PyErr_SetString(PyExc_RuntimeError,
                        "lazy thunk requested only already-computed deps");
        return -1;
      }
      continue;  /* node i stays on the stack for a retry */
    }
    if (!visiting[i]) {
      visiting[i] = 1;
      if (self->node_deps != Py_None) {
        PyObject *deps = PySequence_GetItem(self->node_deps, i);
        if (!deps) return -1;
        Py_ssize_t m = PySequence_Size(deps);
        bool pushed = false;
        for (Py_ssize_t j = 0; j < m; ++j) {
          PyObject *d = PySequence_GetItem(deps, j);
          long di = PyLong_AsLong(d);
          Py_DECREF(d);
          if (di == -1 && PyErr_Occurred()) { Py_DECREF(deps); return -1; }
          if (!done[di]) { stack.push_back(di); pushed = true; }
        }
        Py_DECREF(deps);
        if (pushed) continue;
      }
    }
    if (run_one(self, i) < 0) { annotate_position(i); return -1; }
    done[i] = 1;
    stack.pop_back();
  }
  return 0;
}

/* full run: straight-line when no lazy thunks; demand-driven toward
 * default_targets when lazy nodes exist (only the taken branches run) */
static PyObject *CVM_call(CVM *self, PyObject *args, PyObject *kwargs) {
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  if (self->has_lazy) {
    if (self->default_targets == Py_None || self->node_deps == Py_None) {
      PyErr_SetString(PyExc_ValueError,
                      "lazy thunks require node_deps and default_targets");
      return nullptr;
    }
    std::vector<Py_ssize_t> targets;
    Py_ssize_t m = PySequence_Size(self->default_targets);
    if (m < 0) return nullptr;
    for (Py_ssize_t k = 0; k < m; ++k) {
      PyObject *t = PySequence_GetItem(self->default_targets, k);
      if (!t) return nullptr;
      long ti = PyLong_AsLong(t);
      Py_DECREF(t);
      if (ti == -1 && PyErr_Occurred()) return nullptr;
      targets.push_back(ti);
    }
    std::vector<char> done(n, 0);
    if (run_targets(self, targets, done) < 0) return nullptr;
  } else {
    for (Py_ssize_t i = 0; i < n; ++i) {
      if (run_one(self, i) < 0) {
        annotate_position(i);
        return nullptr;
      }
    }
  }
  if (apply_updates(self) < 0) return nullptr;
  Py_RETURN_NONE;
}

/* demand-driven lazy evaluation of a subset of target thunks */
static PyObject *CVM_run_subset(CVM *self, PyObject *arg) {
  if (self->node_deps == Py_None) {
    PyErr_SetString(PyExc_ValueError, "run_subset requires node_deps");
    return nullptr;
  }
  PyObject *targets_t = PySequence_Tuple(arg);
  if (!targets_t) return nullptr;
  std::vector<Py_ssize_t> targets;
  Py_ssize_t nt = PyTuple_GET_SIZE(targets_t);
  for (Py_ssize_t k = 0; k < nt; ++k) {
    long t = PyLong_AsLong(PyTuple_GET_ITEM(targets_t, k));
    if (t == -1 && PyErr_Occurred()) { Py_DECREF(targets_t); return nullptr; }
    targets.push_back(t);
  }
  Py_DECREF(targets_t);
  Py_ssize_t n = PyTuple_GET_SIZE(self->thunks);
  std::vector<char> done(n, 0);
  if (run_targets(self, targets, done) < 0) return nullptr;
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
