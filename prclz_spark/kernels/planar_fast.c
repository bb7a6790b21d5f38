/* planar_fast: C inner loops for the Sutherland–Hodgman clip kernels.
 *
 * Bit-exactness contract (the DJI golden-parity gate depends on it):
 *   - every floating-point operation here is the SAME IEEE-754 double
 *     operation, in the SAME order, as the pure-Python loops in
 *     planar.py (_clip_halfplane_list / _clip_halfplane_scalar);
 *   - the normalization (math.hypot + divisions) stays in PYTHON —
 *     Python's math.hypot is correctly rounded, C's libm hypot is not
 *     guaranteed to be — so this module only ever sees pre-normalized
 *     (a, b, c);
 *   - MUST be compiled with -ffp-contract=off (no FMA contraction) and
 *     without -ffast-math; tools/build_native.py does this. A fused
 *     a*x+b*y would round differently from the Python expression.
 *
 * The module is OPTIONAL: planar.py falls back to the pure-Python loops
 * when the import fails, and tests/test_planar.py asserts C == Python
 * bit-for-bit on randomized sweeps whenever the module is importable.
 */
#define PY_SSIZE_T_CLEAN
#include <Python.h>

/* clip_list(xs, ys, a, b, c, eps, dedupe, px, py)
 *   xs, ys : open-ring coordinates as Python lists of float
 *   a,b,c  : PRE-NORMALIZED half-plane (keep a*x+b*y <= c)
 *   eps    : tolerance (1e-12)
 *   dedupe : int — collapse consecutive ~equal vertices (1e-12), as the
 *            Python dedupe branch does
 *   px, py : anchor for the max-squared-distance refresh (r2), folded in
 *            so the caller skips a Python generator pass
 * returns:
 *   None                      — identity clip (caller keeps xs, ys)
 *   ()                        — ring wiped (empty)
 *   (nxs, nys, r2)            — clipped ring + max (x-px)^2+(y-py)^2
 */
static PyObject *
clip_list(PyObject *self, PyObject *args)
{
    PyObject *xs_o, *ys_o;
    double a, b, c, eps, px, py;
    int dedupe;
    if (!PyArg_ParseTuple(args, "OOddddidd", &xs_o, &ys_o, &a, &b, &c,
                          &eps, &dedupe, &px, &py))
        return NULL;
    if (!PyList_CheckExact(xs_o) || !PyList_CheckExact(ys_o)) {
        PyErr_SetString(PyExc_TypeError, "xs/ys must be lists");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(xs_o);
    if (n != PyList_GET_SIZE(ys_o)) {
        PyErr_SetString(PyExc_ValueError, "xs/ys length mismatch");
        return NULL;
    }
    if (n == 0)
        Py_RETURN_NONE; /* caller's n==0 early-out returns xs, ys */
    if (n > 4096) {
        PyErr_SetString(PyExc_ValueError, "ring too large");
        return NULL;
    }
    double xbuf[4096], ybuf[4096], dbuf[4096];
    unsigned char ins[4096];
    Py_ssize_t nin = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        PyObject *xo = PyList_GET_ITEM(xs_o, i);
        PyObject *yo = PyList_GET_ITEM(ys_o, i);
        double x = PyFloat_AsDouble(xo);
        double y = PyFloat_AsDouble(yo);
        if (PyErr_Occurred())
            return NULL;
        xbuf[i] = x;
        ybuf[i] = y;
        double d = a * x + b * y - c;
        dbuf[i] = d;
        ins[i] = (d <= eps);
        nin += ins[i];
    }
    if (nin == n)
        Py_RETURN_NONE;
    if (nin == 0)
        return PyTuple_New(0);
    /* emission: at most 2n vertices */
    double ox[8192], oy[8192];
    Py_ssize_t m = 0;
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t j = i + 1 == n ? 0 : i + 1;
        if (ins[i]) {
            ox[m] = xbuf[i];
            oy[m] = ybuf[i];
            m++;
        }
        if (ins[i] != ins[j]) {
            double dp = dbuf[i];
            double t = dp / (dp - dbuf[j]);
            ox[m] = xbuf[i] + t * (xbuf[j] - xbuf[i]);
            oy[m] = ybuf[i] + t * (ybuf[j] - ybuf[i]);
            m++;
        }
    }
    if (m < 3)
        return PyTuple_New(0);
    if (dedupe) {
        double rx[8192], ry[8192];
        Py_ssize_t k = 0;
        rx[0] = ox[0];
        ry[0] = oy[0];
        k = 1;
        for (Py_ssize_t i = 1; i < m; i++) {
            double dx = ox[i] - rx[k - 1];
            double dy = oy[i] - ry[k - 1];
            if (dx > 1e-12 || dx < -1e-12 || dy > 1e-12 || dy < -1e-12) {
                rx[k] = ox[i];
                ry[k] = oy[i];
                k++;
            }
        }
        while (k > 1) {
            double dx = rx[0] - rx[k - 1];
            double dy = ry[0] - ry[k - 1];
            if ((dx <= 1e-12 && dx >= -1e-12) && (dy <= 1e-12 && dy >= -1e-12))
                k--;
            else
                break;
        }
        if (k < 3)
            return PyTuple_New(0);
        m = k;
        for (Py_ssize_t i = 0; i < m; i++) {
            ox[i] = rx[i];
            oy[i] = ry[i];
        }
    }
    PyObject *nxs = PyList_New(m);
    PyObject *nys = PyList_New(m);
    if (!nxs || !nys) {
        Py_XDECREF(nxs);
        Py_XDECREF(nys);
        return NULL;
    }
    double r2 = -1.0;
    for (Py_ssize_t i = 0; i < m; i++) {
        double dx = ox[i] - px;
        double dy = oy[i] - py;
        double d2 = dx * dx + dy * dy;
        if (d2 > r2)
            r2 = d2;
        PyList_SET_ITEM(nxs, i, PyFloat_FromDouble(ox[i]));
        PyList_SET_ITEM(nys, i, PyFloat_FromDouble(oy[i]));
    }
    PyObject *out = PyTuple_New(3);
    if (!out) {
        Py_DECREF(nxs);
        Py_DECREF(nys);
        return NULL;
    }
    PyTuple_SET_ITEM(out, 0, nxs);
    PyTuple_SET_ITEM(out, 1, nys);
    PyTuple_SET_ITEM(out, 2, PyFloat_FromDouble(r2));
    return out;
}

static PyMethodDef Methods[] = {
    {"clip_list", clip_list, METH_VARARGS,
     "Sutherland-Hodgman step over coordinate lists (pre-normalized)"},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "planar_fast", NULL, -1, Methods,
};

PyMODINIT_FUNC
PyInit_planar_fast(void)
{
    return PyModule_Create(&moduledef);
}
