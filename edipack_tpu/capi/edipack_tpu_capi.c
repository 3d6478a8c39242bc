/* Embedded-CPython implementation of the edipack_tpu C API.
 * The reference's C bindings are iso_c_binding wrappers over Fortran
 * globals (src/c_bindings/); here the "native runtime" is the Python/JAX
 * engine, so the C ABI embeds the interpreter and drives the same
 * module-level ed_* API the Python user sees. */
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <stdio.h>
#include <string.h>

#include "edipack_tpu.h"

static PyObject *g_mod = NULL;        /* edipack_tpu module */
static char g_err[1024] = "";

static void set_err_from_python(void) {
  PyObject *type, *value, *tb;
  PyErr_Fetch(&type, &value, &tb);
  if (value) {
    PyObject *s = PyObject_Str(value);
    if (s) {
      snprintf(g_err, sizeof(g_err), "%s", PyUnicode_AsUTF8(s));
      Py_DECREF(s);
    }
  }
  Py_XDECREF(type);
  Py_XDECREF(value);
  Py_XDECREF(tb);
}

const char *edtpu_last_error(void) { return g_err; }

int edtpu_init(void) {
  if (g_mod) return 0;
  if (!Py_IsInitialized()) Py_Initialize();
  g_mod = PyImport_ImportModule("edipack_tpu");
  if (!g_mod) {
    set_err_from_python();
    return -1;
  }
  return 0;
}

void edtpu_finalize(void) {
  if (g_mod) {
    PyObject *r = PyObject_CallMethod(g_mod, "ed_finalize_solver", NULL);
    Py_XDECREF(r);
    Py_CLEAR(g_mod);
  }
}

static PyObject *call(const char *fn, PyObject *args) {
  PyObject *f = PyObject_GetAttrString(g_mod, fn);
  if (!f) {
    set_err_from_python();
    return NULL;
  }
  PyObject *r = PyObject_CallObject(f, args);
  Py_DECREF(f);
  if (!r) set_err_from_python();
  return r;
}

int edtpu_read_input(const char *path) {
  if (edtpu_init()) return -1;
  PyObject *cfgmod = PyImport_ImportModule("edipack_tpu.config");
  if (!cfgmod) { set_err_from_python(); return -1; }
  PyObject *r = PyObject_CallMethod(cfgmod, "ed_read_input", "s", path);
  Py_DECREF(cfgmod);
  if (!r) { set_err_from_python(); return -1; }
  Py_DECREF(r);
  return 0;
}

static int set_option(const char *name, PyObject *value) {
  PyObject *cfgmod = PyImport_ImportModule("edipack_tpu.config");
  if (!cfgmod) { set_err_from_python(); return -1; }
  PyObject *kw = PyDict_New();
  PyDict_SetItemString(kw, name, value);
  PyObject *f = PyObject_GetAttrString(cfgmod, "update_config");
  PyObject *empty = PyTuple_New(0);
  PyObject *r = f ? PyObject_Call(f, empty, kw) : NULL;
  Py_XDECREF(f);
  Py_DECREF(empty);
  Py_DECREF(kw);
  Py_DECREF(cfgmod);
  if (!r) { set_err_from_python(); return -1; }
  Py_DECREF(r);
  return 0;
}

int edtpu_set_option_d(const char *name, double v) {
  if (edtpu_init()) return -1;
  PyObject *o = PyFloat_FromDouble(v);
  int rc = set_option(name, o);
  Py_DECREF(o);
  return rc;
}

int edtpu_set_option_i(const char *name, long v) {
  if (edtpu_init()) return -1;
  PyObject *o = PyLong_FromLong(v);
  int rc = set_option(name, o);
  Py_DECREF(o);
  return rc;
}

int edtpu_set_option_s(const char *name, const char *v) {
  if (edtpu_init()) return -1;
  PyObject *o = PyUnicode_FromString(v);
  int rc = set_option(name, o);
  Py_DECREF(o);
  return rc;
}

int edtpu_get_bath_dimension(void) {
  if (edtpu_init()) return -1;
  PyObject *r = call("ed_get_bath_dimension", NULL);
  if (!r) return -1;
  long n = PyLong_AsLong(r);
  Py_DECREF(r);
  return (int)n;
}

/* helper: copy a 1-D float ndarray into out */
static int copy_array(PyObject *arr, double *out, int nmax) {
  PyObject *lst = PyObject_CallMethod(arr, "tolist", NULL);
  if (!lst) { set_err_from_python(); return -1; }
  PyObject *flat = PySequence_Fast(lst, "expected sequence");
  Py_DECREF(lst);
  if (!flat) { set_err_from_python(); return -1; }
  Py_ssize_t n = PySequence_Fast_GET_SIZE(flat);
  if (n > nmax) n = nmax;
  for (Py_ssize_t i = 0; i < n; ++i)
    out[i] = PyFloat_AsDouble(PySequence_Fast_GET_ITEM(flat, i));
  Py_DECREF(flat);
  return (int)n;
}

int edtpu_init_solver(double *bath, int nb) {
  if (edtpu_init()) return -1;
  PyObject *r = call("ed_init_solver", NULL);
  if (!r) return -1;
  PyObject *rav = PyObject_CallMethod(r, "ravel", NULL);
  Py_DECREF(r);
  if (!rav) { set_err_from_python(); return -1; }
  int n = copy_array(rav, bath, nb);
  Py_DECREF(rav);
  return n < 0 ? -1 : 0;
}

int edtpu_set_hloc(const double *re, const double *im, int nso) {
  if (edtpu_init()) return -1;
  /* build a python list-of-lists complex matrix */
  PyObject *rows = PyList_New(nso);
  for (int i = 0; i < nso; ++i) {
    PyObject *row = PyList_New(nso);
    for (int j = 0; j < nso; ++j) {
      double vr = re ? re[i * nso + j] : 0.0;
      double vi = im ? im[i * nso + j] : 0.0;
      PyList_SET_ITEM(row, j, PyComplex_FromDoubles(vr, vi));
    }
    PyList_SET_ITEM(rows, i, row);
  }
  PyObject *args = PyTuple_Pack(1, rows);
  Py_DECREF(rows);
  PyObject *r = call("ed_set_hloc", args);
  Py_DECREF(args);
  if (!r) return -1;
  Py_DECREF(r);
  return 0;
}

static PyObject *bath_to_pylist(const double *bath, int nb) {
  PyObject *lst = PyList_New(nb);
  for (int i = 0; i < nb; ++i)
    PyList_SET_ITEM(lst, i, PyFloat_FromDouble(bath[i]));
  return lst;
}

int edtpu_solve(const double *bath, int nb) {
  if (edtpu_init()) return -1;
  PyObject *lst = bath_to_pylist(bath, nb);
  PyObject *args = PyTuple_Pack(1, lst);
  Py_DECREF(lst);
  PyObject *r = call("ed_solve", args);
  Py_DECREF(args);
  if (!r) return -1;
  Py_DECREF(r);
  return 0;
}

static int getter_1d(const char *fn, double *out, int nmax) {
  if (edtpu_init()) return -1;
  PyObject *r = call(fn, NULL);
  if (!r) return -1;
  PyObject *rav = PyObject_CallMethod(r, "ravel", NULL);
  Py_DECREF(r);
  if (!rav) { set_err_from_python(); return -1; }
  int n = copy_array(rav, out, nmax);
  Py_DECREF(rav);
  return n;
}

int edtpu_get_dens(double *out, int norb) { return getter_1d("ed_get_dens", out, norb) < 0 ? -1 : 0; }
int edtpu_get_docc(double *out, int norb) { return getter_1d("ed_get_docc", out, norb) < 0 ? -1 : 0; }
int edtpu_get_eimp(double *out4) { return getter_1d("ed_get_eimp", out4, 4) < 0 ? -1 : 0; }

int edtpu_get_evals(double *out, int *n, int nmax) {
  int got = getter_1d("ed_get_evals", out, nmax);
  if (got < 0) return -1;
  *n = got;
  return 0;
}

static int getter_gf(const char *fn, double *out, int lmats) {
  if (edtpu_init()) return -1;
  /* zeta=None -> default Matsubara grid; then take first lmats points via
   * python-side slicing through a small exec */
  PyObject *r = call(fn, NULL);
  if (!r) return -1;
  /* interleave (re, im): use .view(float) trick via numpy on python side */
  PyObject *np = PyImport_ImportModule("numpy");
  PyObject *asc = PyObject_CallMethod(np, "ascontiguousarray", "O", r);
  Py_DECREF(r);
  PyObject *flat = asc ? PyObject_CallMethod(asc, "ravel", NULL) : NULL;
  Py_XDECREF(asc);
  if (!flat) { Py_DECREF(np); set_err_from_python(); return -1; }
  /* copy re/im */
  PyObject *re = PyObject_GetAttrString(flat, "real");
  PyObject *im = PyObject_GetAttrString(flat, "imag");
  Py_DECREF(flat);
  Py_DECREF(np);
  if (!re || !im) { Py_XDECREF(re); Py_XDECREF(im); return -1; }
  PyObject *relist = PyObject_CallMethod(re, "tolist", NULL);
  PyObject *imlist = PyObject_CallMethod(im, "tolist", NULL);
  Py_DECREF(re);
  Py_DECREF(im);
  if (!relist || !imlist) { Py_XDECREF(relist); Py_XDECREF(imlist); return -1; }
  Py_ssize_t n = PyList_Size(relist);
  for (Py_ssize_t i = 0; i < n; ++i) {
    out[2 * i] = PyFloat_AsDouble(PyList_GET_ITEM(relist, i));
    out[2 * i + 1] = PyFloat_AsDouble(PyList_GET_ITEM(imlist, i));
  }
  Py_DECREF(relist);
  Py_DECREF(imlist);
  (void)lmats;
  return 0;
}

int edtpu_get_sigma_matsubara(double *out, int lmats) {
  return getter_gf("ed_get_sigma", out, lmats);
}

int edtpu_get_gimp_matsubara(double *out, int lmats) {
  return getter_gf("ed_get_gimp", out, lmats);
}

int edtpu_chi2_fitgf(const double *func, int l, double *bath, int nb,
                     int ispin) {
  if (edtpu_init()) return -1;
  /* func: interleaved complex, shape inferred python-side as (..., l) —
   * passed as flat list; python reshapes to (norb,norb,l) via ed helper */
  PyObject *np = PyImport_ImportModule("numpy");
  PyObject *flat = PyList_New(2 * (Py_ssize_t)l);
  for (Py_ssize_t i = 0; i < 2 * (Py_ssize_t)l; ++i)
    PyList_SET_ITEM(flat, i, PyFloat_FromDouble(func[i]));
  PyObject *arr = PyObject_CallMethod(np, "asarray", "O", flat);
  Py_DECREF(flat);
  PyObject *cplx = arr ? PyObject_CallMethod(
      arr, "view", "s", "complex128") : NULL;
  Py_XDECREF(arr);
  Py_DECREF(np);
  if (!cplx) { set_err_from_python(); return -1; }
  PyObject *blist = bath_to_pylist(bath, nb);
  PyObject *r = PyObject_CallMethod(g_mod, "ed_chi2_fitgf", "OOi",
                                    cplx, blist, ispin);
  Py_DECREF(cplx);
  Py_DECREF(blist);
  if (!r) { set_err_from_python(); return -1; }
  PyObject *rav = PyObject_CallMethod(r, "ravel", NULL);
  Py_DECREF(r);
  if (!rav) { set_err_from_python(); return -1; }
  int n = copy_array(rav, bath, nb);
  Py_DECREF(rav);
  return n < 0 ? -1 : 0;
}
