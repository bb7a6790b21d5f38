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
#include <float.h>
#include <math.h>

/* ---- correctly-rounded 2-norm: port of CPython 3.11 math.hypot --------
 * (Modules/mathmodule.c vector_norm, n == 2).  Verified bit-identical to
 * math.hypot over 6M random finite doubles incl. full-range bit patterns
 * (and re-asserted by tests/test_planar.py when this module is loaded).
 * Every operation is exactly specified IEEE double arithmetic: mul, add,
 * sub, div, sqrt, fma, ldexp — no libm hypot (glibc's differs by 1 ulp on
 * ~0.04% of inputs). */
typedef struct { double hi; double lo; } DL;

static inline DL dl_fast_sum(double a, double b) {
    double x = a + b;
    double y = (a - x) + b;
    DL r = {x, y};
    return r;
}

static inline DL dl_mul(double x, double y) {
    double z = x * y;
    double zz = fma(x, y, -z);
    DL r = {z, zz};
    return r;
}

static double hypot2(double a, double b) {
    double vec[2];
    double x, h, scale, csum = 1.0, frac1 = 0.0, frac2 = 0.0;
    DL pr, sm;
    int max_e, i;
    double max;
    vec[0] = fabs(a);
    vec[1] = fabs(b);
    max = vec[0] > vec[1] ? vec[0] : vec[1];
    if (isinf(max))
        return max;
    if (isnan(a) || isnan(b))
        return NAN;
    if (max == 0.0)
        return max;
    frexp(max, &max_e);
    if (max_e < -1023)  /* fully subnormal: rescale through DBL_MIN */
        return hypot2(a / DBL_MIN, b / DBL_MIN) * DBL_MIN;
    scale = ldexp(1.0, -max_e);
    for (i = 0; i < 2; i++) {
        x = vec[i] * scale;
        pr = dl_mul(x, x);
        sm = dl_fast_sum(csum, pr.hi);
        csum = sm.hi;
        frac1 += pr.lo;
        frac2 += sm.lo;
    }
    h = sqrt(csum - 1.0 + (frac1 + frac2));
    pr = dl_mul(-h, h);
    sm = dl_fast_sum(csum, pr.hi);
    csum = sm.hi;
    frac1 += pr.lo;
    frac2 += sm.lo;
    x = csum - 1.0 + (frac1 + frac2);
    h += x / (2.0 * h);
    return h / scale;
}

/* ---- numpy pairwise summation: scalar port of pairwise_sum_DOUBLE -----
 * (numpy/core/src/umath/loops.c.src: blocksize 128, 8 accumulators, halves
 * rounded down to a multiple of 8).  Verified bit-identical to np.sum over
 * contiguous float64 for every length <= 8192 on this numpy build,
 * including cancellation / mixed-magnitude / signed-zero / denormal fuzz
 * (tests/test_planar_fused.py); numpy switches to a SIMD variant ONLY
 * above 8192 elements, so every caller here stays under the existing 8192
 * ring caps.  Must not be compiled with -ffast-math (no reassociation). */
static double pw_sum(const double *a, Py_ssize_t n)
{
    if (n < 8) {
        double res = 0.0;
        for (Py_ssize_t i = 0; i < n; i++)
            res += a[i];
        return res;
    }
    else if (n <= 128) {
        double r0 = a[0], r1 = a[1], r2 = a[2], r3 = a[3];
        double r4 = a[4], r5 = a[5], r6 = a[6], r7 = a[7];
        Py_ssize_t i;
        for (i = 8; i < n - (n % 8); i += 8) {
            r0 += a[i + 0]; r1 += a[i + 1]; r2 += a[i + 2]; r3 += a[i + 3];
            r4 += a[i + 4]; r5 += a[i + 5]; r6 += a[i + 6]; r7 += a[i + 7];
        }
        double res = ((r0 + r1) + (r2 + r3)) + ((r4 + r5) + (r6 + r7));
        for (; i < n; i++)
            res += a[i];
        return res;
    }
    else {
        Py_ssize_t n2 = n / 2;
        n2 -= n2 % 8;
        return pw_sum(a, n2) + pw_sum(a + n2, n - n2);
    }
}

/* ---- geom.point_in_ring port (ray cast, boundary inside) --------------
 * rx/ry: CLOSED ring rows (n rows incl. the duplicate last).  Elementwise
 * identical to the numpy expressions (div-by-zero inf and NaN comparisons
 * behave the same; numpy evaluates xint for every edge but only uses it
 * where cond holds, and cond true implies y0 != y1, so guarding the
 * division changes nothing). */
static int pt_in_ring_c(double px, double py,
                        const double *rx, const double *ry, Py_ssize_t n)
{
    Py_ssize_t m = n - 1, i;
    for (i = 0; i < m; i++) {
        double x0 = rx[i], y0 = ry[i], x1 = rx[i + 1], y1 = ry[i + 1];
        double dx = x1 - x0, dy = y1 - y0;
        double cross = (px - x0) * dy - (py - y0) * dx;
        double dot = (px - x0) * dx + (py - y0) * dy;
        double l2 = dx * dx + dy * dy;
        int on = (fabs(cross) < 1e-12) && (dot >= -1e-12)
                 && (dot <= l2 + 1e-12);
        if (on && !(l2 >= 1e-24))
            on = (fabs(px - x0) < 1e-12) && (fabs(py - y0) < 1e-12);
        if (on)
            return 1;
    }
    Py_ssize_t cnt = 0;
    for (i = 0; i < m; i++) {
        double x0 = rx[i], y0 = ry[i], x1 = rx[i + 1], y1 = ry[i + 1];
        if ((y0 > py) != (y1 > py)) {
            double xint = x0 + (py - y0) * (x1 - x0) / (y1 - y0);
            if (px < xint)
                cnt++;
        }
    }
    return (int)(cnt & 1);
}

/* value-equality bits: Python float tuples / np.unique treat -0.0 == 0.0,
 * so hash keys normalize the zero sign before taking bit patterns */
static unsigned long long vbits(double v)
{
    unsigned long long u;
    if (v == 0.0)
        v = 0.0;
    memcpy(&u, &v, 8);
    return u;
}

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

/* ---- shared clip core over C arrays ------------------------------------
 * Mirrors clip_list exactly (same IEEE ops in the same order).
 * Returns: -1 identity (keep input), 0 wiped, else new length written to
 * (ox, oy).  Buffers must hold 2*n doubles. */
static Py_ssize_t
clip_core(const double *xs, const double *ys, Py_ssize_t n,
          double a, double b, double c, double eps, int dedupe,
          double *ox, double *oy)
{
    double dbuf[8192];
    unsigned char ins[8192];
    Py_ssize_t nin = 0, m = 0, i;
    if (n == 0)
        return -1;
    if (n > 4096)
        return -3; /* caller falls back to the Python loop */
    for (i = 0; i < n; i++) {
        double d = a * xs[i] + b * ys[i] - c;
        dbuf[i] = d;
        ins[i] = (d <= eps);
        nin += ins[i];
    }
    if (nin == n)
        return -1;
    if (nin == 0)
        return 0;
    for (i = 0; i < n; i++) {
        Py_ssize_t j = i + 1 == n ? 0 : i + 1;
        if (ins[i]) {
            ox[m] = xs[i];
            oy[m] = ys[i];
            m++;
        }
        if (ins[i] != ins[j]) {
            double dp = dbuf[i];
            double t = dp / (dp - dbuf[j]);
            ox[m] = xs[i] + t * (xs[j] - xs[i]);
            oy[m] = ys[i] + t * (ys[j] - ys[i]);
            m++;
        }
    }
    if (m < 3)
        return 0;
    if (dedupe) {
        Py_ssize_t k = 1;
        for (i = 1; i < m; i++) {
            double dx = ox[i] - ox[k - 1];
            double dy = oy[i] - oy[k - 1];
            if (dx > 1e-12 || dx < -1e-12 || dy > 1e-12 || dy < -1e-12) {
                ox[k] = ox[i];
                oy[k] = oy[i];
                k++;
            }
        }
        while (k > 1) {
            double dx = ox[0] - ox[k - 1];
            double dy = oy[0] - oy[k - 1];
            if ((dx <= 1e-12 && dx >= -1e-12) && (dy <= 1e-12 && dy >= -1e-12))
                k--;
            else
                break;
        }
        if (k < 3)
            return 0;
        m = k;
    }
    return m;
}

static int
load_list(PyObject *o, double *buf, Py_ssize_t cap, Py_ssize_t *n_out)
{
    if (!PyList_CheckExact(o)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return 0;
    }
    Py_ssize_t n = PyList_GET_SIZE(o);
    if (n > cap) {
        PyErr_SetString(PyExc_ValueError, "list too large");
        return 0;
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        buf[i] = PyFloat_AsDouble(PyList_GET_ITEM(o, i));
        if (PyErr_Occurred())
            return 0;
    }
    *n_out = n;
    return 1;
}

static PyObject *
pack_ring(const double *xs, const double *ys, Py_ssize_t m)
{
    PyObject *lx = PyList_New(m), *ly = PyList_New(m), *out;
    if (!lx || !ly) {
        Py_XDECREF(lx);
        Py_XDECREF(ly);
        return NULL;
    }
    for (Py_ssize_t i = 0; i < m; i++) {
        PyList_SET_ITEM(lx, i, PyFloat_FromDouble(xs[i]));
        PyList_SET_ITEM(ly, i, PyFloat_FromDouble(ys[i]));
    }
    out = PyTuple_New(2);
    if (!out) {
        Py_DECREF(lx);
        Py_DECREF(ly);
        return NULL;
    }
    PyTuple_SET_ITEM(out, 0, lx);
    PyTuple_SET_ITEM(out, 1, ly);
    return out;
}

/* per-site half-plane Voronoi clip loop over C arrays — the shared core of
 * voronoi_cell and s0_segs.  cur_x/cur_y (working ring, may alias the
 * initial base copy) and nxt_x/nxt_y are caller scratch of >= 8192 doubles;
 * the base ring must already be copied into cur before the call when they
 * alias (the Python-facing wrapper loads it there directly).
 * Returns the final OPEN ring length (0 = wiped), -3 ring-too-large,
 * -4 Python error from the order list (mode 1 only, PyErr set). */
static Py_ssize_t
vor_cell_core(const double *base_x, const double *base_y, Py_ssize_t n_base,
              const double *ax, const double *ay, Py_ssize_t n_all,
              Py_ssize_t site_i, double px, double py, int mode,
              PyObject *order_o,
              double *cur_x, double *cur_y, double *nxt_x, double *nxt_y)
{
    if (cur_x != base_x) {
        memcpy(cur_x, base_x, n_base * sizeof(double));
        memcpy(cur_y, base_y, n_base * sizeof(double));
    }
    Py_ssize_t n_cur = n_base;
    double r2 = -1.0;
    for (Py_ssize_t t = 0; t < n_cur; t++) {
        double dx = cur_x[t] - px, dy = cur_y[t] - py;
        double d2 = dx * dx + dy * dy;
        if (d2 > r2)
            r2 = d2;
    }
    double thr = mode == 0 ? 4.0 * r2 * (1.0 + 1e-6) : 4.0 * r2;
    Py_ssize_t n_iter = mode == 0 ? n_all : PyList_GET_SIZE(order_o);
    for (Py_ssize_t t = 0; t < n_iter; t++) {
        Py_ssize_t j;
        if (mode == 0)
            j = t;
        else {
            j = PyLong_AsSsize_t(PyList_GET_ITEM(order_o, t));
            if (j == -1 && PyErr_Occurred())
                return -4;
        }
        double qx = ax[j], qy = ay[j];
        if (j == site_i || (qx == px && qy == py))
            continue;
        double ddx = qx - px, ddy = qy - py;
        double d2 = ddx * ddx + ddy * ddy;
        if (mode == 0) {
            if (d2 > thr)
                continue;  /* identity clip (pruning proof in planar.py) */
        } else {
            if (n_cur > 0 && d2 >= thr)
                break;  /* nearest-first order: nothing further can cut */
        }
        double a = 2 * ddx;
        double b = 2 * ddy;
        double c = qx * qx + qy * qy - px * px - py * py;
        double norm = hypot2(a, b);
        if (norm < 1e-15)
            continue;  /* degenerate bisector: identity (see clip_halfplane) */
        Py_ssize_t m = clip_core(cur_x, cur_y, n_cur, a / norm, b / norm,
                                 c / norm, 1e-12, mode == 1, nxt_x, nxt_y);
        if (m == -3)
            return -3;
        if (m < 0)
            continue;  /* identity */
        if (m == 0)
            return 0;
        memcpy(cur_x, nxt_x, m * sizeof(double));
        memcpy(cur_y, nxt_y, m * sizeof(double));
        n_cur = m;
        r2 = -1.0;
        for (Py_ssize_t u = 0; u < n_cur; u++) {
            double dx = cur_x[u] - px, dy = cur_y[u] - py;
            double dd = dx * dx + dy * dy;
            if (dd > r2)
                r2 = dd;
        }
        thr = mode == 0 ? 4.0 * r2 * (1.0 + 1e-6) : 4.0 * r2;
    }
    return n_cur;
}

/* voronoi_cell(base_x, base_y, allx, ally, i, px, py, mode, order)
 * The whole per-site half-plane clip loop of voronoi_pytess (mode 0:
 * iterate all j ascending, skip when d2 > 4*r2*(1+1e-6), no dedupe) and
 * voronoi_cells (mode 1: iterate the given `order`, BREAK when
 * d2 >= 4*r2, dedupe) — bit-exact with the Python loops.
 * Returns (xs, ys) open lists, or () when the ring is wiped. */
static PyObject *
voronoi_cell(PyObject *self, PyObject *args)
{
    PyObject *bx_o, *by_o, *ax_o, *ay_o, *order_o;
    Py_ssize_t site_i;
    double px, py;
    int mode;
    if (!PyArg_ParseTuple(args, "OOOOnddiO", &bx_o, &by_o, &ax_o, &ay_o,
                          &site_i, &px, &py, &mode, &order_o))
        return NULL;
    static double ax[65536], ay[65536];
    static double cur_x[8192], cur_y[8192], nxt_x[8192], nxt_y[8192];
    Py_ssize_t n_base, n_all, n_all2;
    if (!load_list(bx_o, cur_x, 4096, &n_base))
        return NULL;
    if (!load_list(by_o, cur_y, 4096, &n_base))
        return NULL;
    if (!load_list(ax_o, ax, 65536, &n_all))
        return NULL;
    if (!load_list(ay_o, ay, 65536, &n_all2))
        return NULL;
    if (n_all != n_all2) {
        PyErr_SetString(PyExc_ValueError, "allx/ally length mismatch");
        return NULL;
    }
    Py_ssize_t m = vor_cell_core(cur_x, cur_y, n_base, ax, ay, n_all,
                                 site_i, px, py, mode, order_o,
                                 cur_x, cur_y, nxt_x, nxt_y);
    if (m == -3) {
        PyErr_SetString(PyExc_ValueError, "ring too large");
        return NULL; /* wrapper falls back to the Python loop */
    }
    if (m == -4)
        return NULL; /* order list conversion error (PyErr set) */
    if (m == 0)
        return PyTuple_New(0);
    return pack_ring(cur_x, cur_y, m);
}

/* clip_convex_small(sx, sy, p_x, p_y, q_x, q_y)
 * The small-case body of planar.clip_convex: per CONVEX clip edge
 * (p[i]→q[i]), prefilter against the ORIGINAL subject vertices, then
 * sequentially clip the current ring (dedupe, eps 1e-12).  Subject is the
 * OPEN ring; returns (xs, ys) open lists or () when wiped. */
/* core of clip_convex_small over C arrays (same IEEE ops in the same
 * order).  Scratch cur/nxt must hold 8192 doubles each.  Returns -1
 * identity, 0 wiped, -3 ring too large, else the OPEN output length
 * written to (cur_x, cur_y). */
static Py_ssize_t
ccs_core(const double *sx, const double *sy, Py_ssize_t ns,
         const double *epx, const double *epy,
         const double *eqx, const double *eqy, Py_ssize_t ne,
         double *cur_x, double *cur_y, double *nxt_x, double *nxt_y)
{
    Py_ssize_t t;
    memcpy(cur_x, sx, ns * sizeof(double));
    memcpy(cur_y, sy, ns * sizeof(double));
    Py_ssize_t n_cur = ns;
    int changed = 0;
    for (Py_ssize_t i = 0; i < ne; i++) {
        double a = eqy[i] - epy[i];
        double b = -(eqx[i] - epx[i]);
        double c = a * epx[i] + b * epy[i];
        double norm = hypot2(a, b);
        if (norm < 1e-15)
            continue;  /* identity by clip_halfplane's zero-edge guard */
        double an = a / norm, bn = b / norm, cn = c / norm;
        int cuts = 0;
        for (t = 0; t < ns; t++) {
            if (an * sx[t] + bn * sy[t] - cn > 1e-12) {
                cuts = 1;
                break;
            }
        }
        if (!cuts)
            continue;
        Py_ssize_t m = clip_core(cur_x, cur_y, n_cur, an, bn, cn, 1e-12, 1,
                                 nxt_x, nxt_y);
        if (m == -3)
            return -3;
        if (m < 0)
            continue;
        if (m == 0)
            return 0;
        memcpy(cur_x, nxt_x, m * sizeof(double));
        memcpy(cur_y, nxt_y, m * sizeof(double));
        n_cur = m;
        changed = 1;
    }
    if (!changed)
        return -1;
    return n_cur;
}

static PyObject *
clip_convex_small(PyObject *self, PyObject *args)
{
    PyObject *sx_o, *sy_o, *px_o, *py_o, *qx_o, *qy_o;
    if (!PyArg_ParseTuple(args, "OOOOOO", &sx_o, &sy_o, &px_o, &py_o,
                          &qx_o, &qy_o))
        return NULL;
    static double sx[4096], sy[4096], epx[4096], epy[4096], eqx[4096], eqy[4096];
    static double cur_x[8192], cur_y[8192], nxt_x[8192], nxt_y[8192];
    Py_ssize_t ns, ns2, ne;
    if (!load_list(sx_o, sx, 4096, &ns) || !load_list(sy_o, sy, 4096, &ns2))
        return NULL;
    if (!load_list(px_o, epx, 4096, &ne) || !load_list(py_o, epy, 4096, &ne)
        || !load_list(qx_o, eqx, 4096, &ne) || !load_list(qy_o, eqy, 4096, &ne))
        return NULL;
    Py_ssize_t m = ccs_core(sx, sy, ns, epx, epy, eqx, eqy, ne,
                            cur_x, cur_y, nxt_x, nxt_y);
    if (m == -3) {
        PyErr_SetString(PyExc_ValueError, "ring too large");
        return NULL; /* wrapper falls back to the Python loop */
    }
    if (m == -1)
        Py_RETURN_NONE; /* identity: caller returns the subject object */
    if (m == 0)
        return PyTuple_New(0);
    return pack_ring(cur_x, cur_y, m);
}

/* union-find vertex clustering over C arrays — the shared core of
 * cluster_verts and s0_segs.  rep_out[i] = representative ORIGINAL index.
 * Returns 0 ok, -1 allocation failure (PyErr set). */
static int
cluster_core(const double *px, const double *py, Py_ssize_t n, double eps,
             Py_ssize_t *rep_out)
{
    long long *kx = PyMem_Malloc((n + 1) * sizeof(long long));
    long long *ky = PyMem_Malloc((n + 1) * sizeof(long long));
    Py_ssize_t *parent = PyMem_Malloc((n + 1) * sizeof(Py_ssize_t));
    Py_ssize_t *nxt = PyMem_Malloc((n + 1) * sizeof(Py_ssize_t));
    Py_ssize_t cap = 16;
    while (cap < 2 * n + 8)
        cap <<= 1;
    long long *hkx = PyMem_Malloc(cap * sizeof(long long));
    long long *hky = PyMem_Malloc(cap * sizeof(long long));
    Py_ssize_t *hhead = PyMem_Malloc(cap * sizeof(Py_ssize_t));
    Py_ssize_t *htail = PyMem_Malloc(cap * sizeof(Py_ssize_t));
    if (!kx || !ky || !parent || !nxt || !hkx || !hky || !hhead || !htail) {
        PyErr_NoMemory();
        goto fail;
    }
    for (Py_ssize_t i = 0; i < cap; i++)
        hhead[i] = -2; /* empty slot */
    for (Py_ssize_t i = 0; i < n; i++) {
        kx[i] = (long long)floor(px[i] / eps);
        ky[i] = (long long)floor(py[i] / eps);
        parent[i] = i;
        nxt[i] = -1;
    }
#define SLOT_OF(KX, KY, OUT)                                              \
    do {                                                                  \
        unsigned long long hh =                                           \
            (unsigned long long)(KX) * 0x9E3779B97F4A7C15ULL              \
            ^ ((unsigned long long)(KY) * 0xC2B2AE3D27D4EB4FULL);         \
        Py_ssize_t s_ = (Py_ssize_t)(hh & (unsigned long long)(cap - 1)); \
        while (hhead[s_] != -2 && (hkx[s_] != (KX) || hky[s_] != (KY)))   \
            s_ = (s_ + 1) & (cap - 1);                                    \
        (OUT) = s_;                                                       \
    } while (0)
    for (Py_ssize_t i = 0; i < n; i++) {
        double xi = px[i], yi = py[i];
        for (int dx = -1; dx <= 1; dx++) {
            for (int dy = -1; dy <= 1; dy++) {
                long long bx = kx[i] + dx, by = ky[i] + dy;
                Py_ssize_t s;
                SLOT_OF(bx, by, s);
                if (hhead[s] == -2)
                    continue;
                for (Py_ssize_t j = hhead[s]; j != -1; j = nxt[j]) {
                    if (fabs(px[j] - xi) <= eps && fabs(py[j] - yi) <= eps) {
                        Py_ssize_t ri = i, rj = j;
                        while (parent[ri] != ri) {
                            parent[ri] = parent[parent[ri]];
                            ri = parent[ri];
                        }
                        while (parent[rj] != rj) {
                            parent[rj] = parent[parent[rj]];
                            rj = parent[rj];
                        }
                        if (ri != rj)
                            parent[ri] = rj;
                    }
                }
            }
        }
        {
            Py_ssize_t s;
            SLOT_OF(kx[i], ky[i], s);
            if (hhead[s] == -2) {
                hkx[s] = kx[i];
                hky[s] = ky[i];
                hhead[s] = i;
                htail[s] = i;
            } else {
                nxt[htail[s]] = i;
                htail[s] = i;
            }
        }
    }
#undef SLOT_OF
    for (Py_ssize_t i = 0; i < n; i++) {
        Py_ssize_t r = i;
        while (parent[r] != r) {
            parent[r] = parent[parent[r]];
            r = parent[r];
        }
        rep_out[i] = r;
    }
    PyMem_Free(kx); PyMem_Free(ky); PyMem_Free(parent); PyMem_Free(nxt);
    PyMem_Free(hkx); PyMem_Free(hky); PyMem_Free(hhead); PyMem_Free(htail);
    return 0;
fail:
    PyMem_Free(kx); PyMem_Free(ky); PyMem_Free(parent); PyMem_Free(nxt);
    PyMem_Free(hkx); PyMem_Free(hky); PyMem_Free(hhead); PyMem_Free(htail);
    return -1;
}

/* cluster_verts(xs, ys, eps) -> list of representative indices
 * Exact port of planar._cluster_vertices: grid buckets keyed by
 * floor(v/eps), 3x3 neighborhood scan in insertion order, union-find with
 * path halving, parent[find(i)] = find(j) merge order. */
static PyObject *
cluster_verts(PyObject *self, PyObject *args)
{
    PyObject *xs_o, *ys_o;
    double eps;
    if (!PyArg_ParseTuple(args, "OOd", &xs_o, &ys_o, &eps))
        return NULL;
    if (!PyList_CheckExact(xs_o) || !PyList_CheckExact(ys_o)) {
        PyErr_SetString(PyExc_TypeError, "expected lists");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(xs_o);
    if (n != PyList_GET_SIZE(ys_o)) {
        PyErr_SetString(PyExc_ValueError, "length mismatch");
        return NULL;
    }
    double *px = PyMem_Malloc((n + 1) * sizeof(double));
    double *py = PyMem_Malloc((n + 1) * sizeof(double));
    Py_ssize_t *rep = PyMem_Malloc((n + 1) * sizeof(Py_ssize_t));
    if (!px || !py || !rep) {
        PyErr_NoMemory();
        goto fail;
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        px[i] = PyFloat_AsDouble(PyList_GET_ITEM(xs_o, i));
        py[i] = PyFloat_AsDouble(PyList_GET_ITEM(ys_o, i));
        if (PyErr_Occurred())
            goto fail;
    }
    if (cluster_core(px, py, n, eps, rep) < 0)
        goto fail;
    {
        PyObject *out = PyList_New(n);
        if (!out)
            goto fail;
        for (Py_ssize_t i = 0; i < n; i++)
            PyList_SET_ITEM(out, i, PyLong_FromSsize_t(rep[i]));
        PyMem_Free(px); PyMem_Free(py); PyMem_Free(rep);
        return out;
    }
fail:
    PyMem_Free(px); PyMem_Free(py); PyMem_Free(rep);
    return NULL;
}

/* ---- weak-dual sequence (k-index) -------------------------------------
 * Port of planar.weak_dual_sequence_len + trace_faces + inner_faces +
 * weak_dual + face_centroid, bit-exact with the Python implementations:
 *   - rotation order: stable sort of each node's adjacency (in its given
 *     insertion order) by atan2(dx, dy) — C atan2 is the same libm call
 *     math.atan2 wraps (verified 0 mismatches / 5M);
 *   - face seeds iterate in lexicographic (prev.x, prev.y, cur.x, cur.y)
 *     order (== Python's sorted(succ));
 *   - inner faces = stable len-sort minus the last (largest) face;
 *   - dual adjacency = faces sharing an undirected edge, dual edges
 *     inserted in ascending (i, then sorted j) order, dual nodes interned
 *     by exact centroid bits (== nx add_edge identity semantics);
 *   - face_centroid replicates the sequential shoelace accumulation and
 *     the |2A| < 0.02 sorted-vertex-mean fallback.
 */

typedef struct { double x, y; } PTxy;

typedef struct {
    Py_ssize_t n_nodes;
    PTxy *pos;
    Py_ssize_t *adj_off;  /* n_nodes + 1 */
    Py_ssize_t *adj;      /* m2 entries: neighbor node ids, insertion order */
    Py_ssize_t m2;
} Lvl;

static void lvl_free(Lvl *L) {
    PyMem_Free(L->pos);
    PyMem_Free(L->adj_off);
    PyMem_Free(L->adj);
    L->pos = NULL; L->adj_off = NULL; L->adj = NULL;
    L->n_nodes = 0; L->m2 = 0;
}

/* stable merge sort of idx[0..n) by key[idx[i]] ascending (ties keep order) */
static void
stable_sort_by_key(Py_ssize_t *idx, Py_ssize_t n, const double *key,
                   Py_ssize_t *tmp)
{
    if (n < 2)
        return;
    Py_ssize_t mid = n / 2;
    stable_sort_by_key(idx, mid, key, tmp);
    stable_sort_by_key(idx + mid, n - mid, key, tmp);
    Py_ssize_t i = 0, j = mid, t = 0;
    while (i < mid && j < n) {
        if (key[idx[j]] < key[idx[i]])
            tmp[t++] = idx[j++];
        else
            tmp[t++] = idx[i++];
    }
    while (i < mid) tmp[t++] = idx[i++];
    while (j < n) tmp[t++] = idx[j++];
    memcpy(idx, tmp, n * sizeof(Py_ssize_t));
}

/* lexicographic 4-key sort for seeds (keys unique, plain merge sort) */
typedef struct { double k1, k2, k3, k4; Py_ssize_t id; } Seed;

static int seed_lt(const Seed *a, const Seed *b) {
    if (a->k1 != b->k1) return a->k1 < b->k1;
    if (a->k2 != b->k2) return a->k2 < b->k2;
    if (a->k3 != b->k3) return a->k3 < b->k3;
    return a->k4 < b->k4;
}

static void
seed_sort(Seed *s, Py_ssize_t n, Seed *tmp)
{
    if (n < 2) return;
    Py_ssize_t mid = n / 2;
    seed_sort(s, mid, tmp);
    seed_sort(s + mid, n - mid, tmp);
    Py_ssize_t i = 0, j = mid, t = 0;
    while (i < mid && j < n) {
        if (seed_lt(&s[j], &s[i])) tmp[t++] = s[j++];
        else tmp[t++] = s[i++];
    }
    while (i < mid) tmp[t++] = s[i++];
    while (j < n) tmp[t++] = s[j++];
    memcpy(s, tmp, n * sizeof(Seed));
}

/* hash map: 128-bit key (bit patterns of two doubles) -> Py_ssize_t value */
typedef struct {
    unsigned long long *k1, *k2;
    Py_ssize_t *val;
    Py_ssize_t cap;
} Map2;

static int map2_init(Map2 *m, Py_ssize_t want) {
    m->cap = 16;
    while (m->cap < 2 * want + 8) m->cap <<= 1;
    m->k1 = PyMem_Malloc(m->cap * sizeof(unsigned long long));
    m->k2 = PyMem_Malloc(m->cap * sizeof(unsigned long long));
    m->val = PyMem_Malloc(m->cap * sizeof(Py_ssize_t));
    if (!m->k1 || !m->k2 || !m->val) return 0;
    for (Py_ssize_t i = 0; i < m->cap; i++) m->val[i] = -1;
    return 1;
}
static void map2_free(Map2 *m) {
    PyMem_Free(m->k1); PyMem_Free(m->k2); PyMem_Free(m->val);
}
static Py_ssize_t map2_slot(Map2 *m, unsigned long long a, unsigned long long b) {
    unsigned long long h = a * 0x9E3779B97F4A7C15ULL ^ (b * 0xC2B2AE3D27D4EB4FULL);
    Py_ssize_t s = (Py_ssize_t)(h & (unsigned long long)(m->cap - 1));
    while (m->val[s] != -1 && (m->k1[s] != a || m->k2[s] != b))
        s = (s + 1) & (m->cap - 1);
    return s;
}

static unsigned long long dbits(double v) {
    unsigned long long u;
    memcpy(&u, &v, 8);
    return u;
}

/* one weak-dual level: faces of L -> dual level D. Returns:
 *   0  ok (D filled; n_faces_out set)
 *  -1  allocation failure (PyErr set)
 * D->n_nodes == 0 with *n_faces_out == number of inner faces at this level.
 */
static int
dual_level(const Lvl *L, Lvl *D, Py_ssize_t *n_faces_out)
{
    Py_ssize_t n = L->n_nodes, m2 = L->m2;
    Py_ssize_t i, v;
    D->n_nodes = 0; D->pos = NULL; D->adj_off = NULL; D->adj = NULL; D->m2 = 0;
    *n_faces_out = 0;
    if (n < 2 || m2 == 0)
        return 0;
    /* rotations: per node, adjacency sorted stably by atan2 */
    Py_ssize_t *rot = PyMem_Malloc(m2 * sizeof(Py_ssize_t));       /* neighbor ids */
    Py_ssize_t *de_succ = PyMem_Malloc(m2 * sizeof(Py_ssize_t));   /* directed edge -> next */
    Py_ssize_t *de_p = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    Py_ssize_t *de_c = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    double *keybuf = PyMem_Malloc(m2 * sizeof(double));
    Py_ssize_t *ordbuf = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    Py_ssize_t *tmpbuf = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    Map2 demap;
    int demap_ok = map2_init(&demap, m2);
    if (!rot || !de_succ || !de_p || !de_c || !keybuf || !ordbuf || !tmpbuf
        || !demap_ok) {
        PyErr_NoMemory();
        goto fail0;
    }
    /* directed edge id: off[c] + position of p in SORTED rot of c.
     * First build rot per node; register (p, c) -> id in demap. */
    for (v = 0; v < n; v++) {
        Py_ssize_t off = L->adj_off[v], deg = L->adj_off[v + 1] - off;
        for (i = 0; i < deg; i++) {
            Py_ssize_t nb = L->adj[off + i];
            keybuf[i] = atan2(L->pos[nb].x - L->pos[v].x,
                              L->pos[nb].y - L->pos[v].y);
            ordbuf[i] = i;
        }
        stable_sort_by_key(ordbuf, deg, keybuf, tmpbuf);
        for (i = 0; i < deg; i++)
            rot[off + i] = L->adj[off + ordbuf[i]];
        for (i = 0; i < deg; i++) {
            Py_ssize_t id = off + i;           /* directed edge (rot[i], v) */
            de_p[id] = rot[off + i];
            de_c[id] = v;
            Py_ssize_t s = map2_slot(&demap, (unsigned long long)de_p[id],
                                     (unsigned long long)v);
            demap.k1[s] = (unsigned long long)de_p[id];
            demap.k2[s] = (unsigned long long)v;
            demap.val[s] = id;
        }
    }
    /* succ[(nb, v)] = (v, rot_v[pos(nb)+1 mod deg]) */
    for (v = 0; v < n; v++) {
        Py_ssize_t off = L->adj_off[v], deg = L->adj_off[v + 1] - off;
        for (i = 0; i < deg; i++) {
            Py_ssize_t id = off + i;
            Py_ssize_t w = rot[off + (i + 1) % deg];
            Py_ssize_t s = map2_slot(&demap, (unsigned long long)v,
                                     (unsigned long long)w);
            de_succ[id] = demap.val[s];  /* id of (v, w) */
        }
    }
    /* seeds in lexicographic coordinate order */
    Seed *seeds = PyMem_Malloc(m2 * sizeof(Seed));
    Seed *stmp = PyMem_Malloc(m2 * sizeof(Seed));
    unsigned char *used = PyMem_Calloc(m2, 1);
    Py_ssize_t *face_of = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    Py_ssize_t *face_start = PyMem_Malloc((m2 + 2) * sizeof(Py_ssize_t));
    Py_ssize_t *face_seq = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
    if (!seeds || !stmp || !used || !face_of || !face_start || !face_seq) {
        PyErr_NoMemory();
        goto fail1;
    }
    for (i = 0; i < m2; i++) {
        seeds[i].k1 = L->pos[de_p[i]].x;
        seeds[i].k2 = L->pos[de_p[i]].y;
        seeds[i].k3 = L->pos[de_c[i]].x;
        seeds[i].k4 = L->pos[de_c[i]].y;
        seeds[i].id = i;
    }
    seed_sort(seeds, m2, stmp);
    Py_ssize_t n_faces = 0, seq = 0;
    for (i = 0; i < m2; i++) {
        Py_ssize_t seed = seeds[i].id;
        if (used[seed])
            continue;
        face_start[n_faces] = seq;
        face_seq[seq++] = seed;
        used[seed] = 1;
        Py_ssize_t cur = de_succ[seed];
        Py_ssize_t budget = 2 * m2 + 4;
        while (cur != seed && budget) {
            budget--;
            face_seq[seq++] = cur;
            used[cur] = 1;
            cur = de_succ[cur];
        }
        n_faces++;
    }
    face_start[n_faces] = seq;
    *n_faces_out = n_faces > 0 ? n_faces - 1 : 0;  /* inner faces */
    if (n_faces == 0)
        goto done_empty;
    /* inner faces: stable len-sort, drop the last (largest) */
    Py_ssize_t *forder = PyMem_Malloc(n_faces * sizeof(Py_ssize_t));
    Py_ssize_t *ftmp = PyMem_Malloc(n_faces * sizeof(Py_ssize_t));
    double *flen = PyMem_Malloc(n_faces * sizeof(double));
    if (!forder || !ftmp || !flen) {
        PyErr_NoMemory();
        PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
        goto fail1;
    }
    for (i = 0; i < n_faces; i++) {
        forder[i] = i;
        flen[i] = (double)(face_start[i + 1] - face_start[i]);
    }
    stable_sort_by_key(forder, n_faces, flen, ftmp);
    Py_ssize_t n_inner = n_faces - 1;
    *n_faces_out = n_inner;
    if (n_inner == 0) {
        PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
        goto done_empty;
    }
    /* centroids + undirected edge keys per inner face (in sorted order) */
    {
        PTxy *cents = PyMem_Malloc(n_inner * sizeof(PTxy));
        /* edge key table: key -> first face list (chained) */
        Py_ssize_t total_keys = 0;
        for (i = 0; i < n_inner; i++)
            total_keys += face_start[forder[i] + 1] - face_start[forder[i]];
        Map2 ekmap;
        Py_ssize_t *ek_head = PyMem_Malloc((total_keys + 1) * sizeof(Py_ssize_t));
        Py_ssize_t *ek_tail = PyMem_Malloc((total_keys + 1) * sizeof(Py_ssize_t));
        Py_ssize_t *mem_face = PyMem_Malloc((total_keys + 1) * sizeof(Py_ssize_t));
        Py_ssize_t *mem_next = PyMem_Malloc((total_keys + 1) * sizeof(Py_ssize_t));
        Py_ssize_t n_keys = 0, n_mem = 0;
        int ek_ok = map2_init(&ekmap, total_keys + 1);
        /* local per-face dedupe buffer */
        unsigned long long *fk1 = PyMem_Malloc((total_keys + 1) * sizeof(unsigned long long));
        unsigned long long *fk2 = PyMem_Malloc((total_keys + 1) * sizeof(unsigned long long));
        if (!cents || !ek_head || !ek_tail || !mem_face || !mem_next || !ek_ok
            || !fk1 || !fk2) {
            PyErr_NoMemory();
            PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
            PyMem_Free(mem_face); PyMem_Free(mem_next);
            if (ek_ok) map2_free(&ekmap);
            PyMem_Free(fk1); PyMem_Free(fk2);
            PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
            goto fail1;
        }
        for (i = 0; i < n_inner; i++) {
            Py_ssize_t f = forder[i];
            Py_ssize_t s0 = face_start[f], s1 = face_start[f + 1];
            /* face_centroid: sequential shoelace over directed edges */
            double acc_a2 = 0.0, acc_cx = 0.0, acc_cy = 0.0;
            for (Py_ssize_t t = s0; t < s1; t++) {
                Py_ssize_t de = face_seq[t];
                double x0 = L->pos[de_p[de]].x, y0 = L->pos[de_p[de]].y;
                double x1 = L->pos[de_c[de]].x, y1 = L->pos[de_c[de]].y;
                double cr = x0 * y1 - x1 * y0;
                acc_a2 += cr;
                acc_cx += (x0 + x1) * cr;
                acc_cy += (y0 + y1) * cr;
            }
            if (fabs(acc_a2) < 0.02) {
                /* sorted unique vertex mean (Python: sorted(set(nodes))) */
                Py_ssize_t nv = 0;
                Seed *vbuf = PyMem_Malloc(2 * (s1 - s0) * sizeof(Seed));
                Seed *vtmp = PyMem_Malloc(2 * (s1 - s0) * sizeof(Seed));
                if (!vbuf || !vtmp) {
                    PyErr_NoMemory();
                    PyMem_Free(vbuf); PyMem_Free(vtmp);
                    PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
                    PyMem_Free(mem_face); PyMem_Free(mem_next);
                    map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
                    PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
                    goto fail1;
                }
                for (Py_ssize_t t = s0; t < s1; t++) {
                    Py_ssize_t de = face_seq[t];
                    vbuf[nv].k1 = L->pos[de_p[de]].x;
                    vbuf[nv].k2 = L->pos[de_p[de]].y;
                    vbuf[nv].k3 = 0; vbuf[nv].k4 = 0; vbuf[nv].id = 0;
                    nv++;
                    vbuf[nv].k1 = L->pos[de_c[de]].x;
                    vbuf[nv].k2 = L->pos[de_c[de]].y;
                    vbuf[nv].k3 = 0; vbuf[nv].k4 = 0; vbuf[nv].id = 0;
                    nv++;
                }
                seed_sort(vbuf, nv, vtmp);
                double sx = 0.0, sy = 0.0;
                Py_ssize_t cnt = 0;
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    cnt++;
                }
                /* sum in sorted-unique order, sequentially (two passes to
                 * mirror Python's sum over xs then ys) */
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    sx += vbuf[t].k1;
                }
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    sy += vbuf[t].k2;
                }
                cents[i].x = sx / (double)cnt;
                cents[i].y = sy / (double)cnt;
                PyMem_Free(vbuf); PyMem_Free(vtmp);
            } else {
                double a6 = 3.0 * acc_a2;
                cents[i].x = acc_cx / a6;
                cents[i].y = acc_cy / a6;
            }
            /* undirected edge keys, deduped within the face */
            Py_ssize_t fk_n = 0;
            for (Py_ssize_t t = s0; t < s1; t++) {
                Py_ssize_t de = face_seq[t];
                Py_ssize_t a = de_p[de], b = de_c[de];
                unsigned long long ka, kb;
                if (a == b) {
                    ka = (unsigned long long)a;
                    kb = 0xFFFFFFFFFFFFFFFFULL; /* self marker */
                } else {
                    ka = (unsigned long long)(a < b ? a : b);
                    kb = (unsigned long long)(a < b ? b : a);
                }
                int dup = 0;
                for (Py_ssize_t u = 0; u < fk_n; u++)
                    if (fk1[u] == ka && fk2[u] == kb) { dup = 1; break; }
                if (dup)
                    continue;
                fk1[fk_n] = ka; fk2[fk_n] = kb; fk_n++;
                Py_ssize_t s = map2_slot(&ekmap, ka, kb);
                if (ekmap.val[s] == -1) {
                    ekmap.k1[s] = ka; ekmap.k2[s] = kb;
                    ekmap.val[s] = n_keys;
                    ek_head[n_keys] = -1; ek_tail[n_keys] = -1;
                    n_keys++;
                }
                Py_ssize_t key_id = ekmap.val[s];
                mem_face[n_mem] = i;
                mem_next[n_mem] = -1;
                if (ek_head[key_id] == -1)
                    ek_head[key_id] = n_mem;
                else
                    mem_next[ek_tail[key_id]] = n_mem;
                ek_tail[key_id] = n_mem;
                n_mem++;
            }
        }
        /* face pairs (i < j) from shared keys, inserted ascending (i, j):
         * collect per-i sorted unique js */
        /* first gather all pairs */
        Py_ssize_t *pair_i = PyMem_Malloc((n_mem * 4 + 1) * sizeof(Py_ssize_t));
        Py_ssize_t *pair_j = PyMem_Malloc((n_mem * 4 + 1) * sizeof(Py_ssize_t));
        Py_ssize_t n_pairs = 0, cap_pairs = n_mem * 4 + 1;
        int pair_fail = 0;
        if (!pair_i || !pair_j) { PyErr_NoMemory(); pair_fail = 1; }
        for (Py_ssize_t kk = 0; !pair_fail && kk < n_keys; kk++) {
            for (Py_ssize_t ma = ek_head[kk]; ma != -1; ma = mem_next[ma]) {
                for (Py_ssize_t mb = mem_next[ma]; mb != -1; mb = mem_next[mb]) {
                    if (n_pairs == cap_pairs) {
                        cap_pairs *= 2;
                        Py_ssize_t *ni = PyMem_Realloc(pair_i, cap_pairs * sizeof(Py_ssize_t));
                        Py_ssize_t *nj = PyMem_Realloc(pair_j, cap_pairs * sizeof(Py_ssize_t));
                        if (!ni || !nj) { PyErr_NoMemory(); pair_fail = 1; break; }
                        pair_i = ni; pair_j = nj;
                    }
                    pair_i[n_pairs] = mem_face[ma];
                    pair_j[n_pairs] = mem_face[mb];
                    n_pairs++;
                }
                if (pair_fail) break;
            }
        }
        if (pair_fail) {
            PyMem_Free(pair_i); PyMem_Free(pair_j);
            PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
            PyMem_Free(mem_face); PyMem_Free(mem_next);
            map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
            PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
            goto fail1;
        }
        /* sort pairs lexicographically (i, j), dedupe */
        {
            Seed *ps = PyMem_Malloc((n_pairs + 1) * sizeof(Seed));
            Seed *pt = PyMem_Malloc((n_pairs + 1) * sizeof(Seed));
            if (!ps || !pt) {
                PyErr_NoMemory();
                PyMem_Free(ps); PyMem_Free(pt);
                PyMem_Free(pair_i); PyMem_Free(pair_j);
                PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
                PyMem_Free(mem_face); PyMem_Free(mem_next);
                map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
                PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
                goto fail1;
            }
            for (Py_ssize_t t = 0; t < n_pairs; t++) {
                ps[t].k1 = (double)pair_i[t];
                ps[t].k2 = (double)pair_j[t];
                ps[t].k3 = ps[t].k4 = 0;
                ps[t].id = t;
            }
            seed_sort(ps, n_pairs, pt);
            /* build dual graph via add_edge(cents[i], cents[j]) in order */
            Map2 nmap;
            PTxy *dpos = PyMem_Malloc((2 * n_pairs + 1) * sizeof(PTxy));
            Py_ssize_t dn = 0;
            /* adjacency as linked lists per node */
            Py_ssize_t *ahead = PyMem_Malloc((2 * n_pairs + 1) * sizeof(Py_ssize_t));
            Py_ssize_t *atail = PyMem_Malloc((2 * n_pairs + 1) * sizeof(Py_ssize_t));
            Py_ssize_t *anode = PyMem_Malloc((4 * n_pairs + 1) * sizeof(Py_ssize_t));
            Py_ssize_t *anext = PyMem_Malloc((4 * n_pairs + 1) * sizeof(Py_ssize_t));
            Py_ssize_t an = 0;
            int nm_ok = map2_init(&nmap, 2 * n_pairs + 1);
            if (!dpos || !ahead || !atail || !anode || !anext || !nm_ok) {
                PyErr_NoMemory();
                if (nm_ok) map2_free(&nmap);
                PyMem_Free(dpos); PyMem_Free(ahead); PyMem_Free(atail);
                PyMem_Free(anode); PyMem_Free(anext);
                PyMem_Free(ps); PyMem_Free(pt);
                PyMem_Free(pair_i); PyMem_Free(pair_j);
                PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
                PyMem_Free(mem_face); PyMem_Free(mem_next);
                map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
                PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
                goto fail1;
            }
#define INTERN(CX, CY, OUT)                                               \
            do {                                                          \
                unsigned long long b1 = dbits(CX), b2 = dbits(CY);        \
                Py_ssize_t sl = map2_slot(&nmap, b1, b2);                 \
                if (nmap.val[sl] == -1) {                                 \
                    nmap.k1[sl] = b1; nmap.k2[sl] = b2;                   \
                    nmap.val[sl] = dn;                                    \
                    dpos[dn].x = (CX); dpos[dn].y = (CY);                 \
                    ahead[dn] = -1; atail[dn] = -1;                       \
                    dn++;                                                 \
                }                                                         \
                (OUT) = nmap.val[sl];                                     \
            } while (0)
#define ADJ_ADD(U, W)                                                     \
            do {                                                          \
                int found = 0;                                            \
                for (Py_ssize_t q_ = ahead[U]; q_ != -1; q_ = anext[q_])  \
                    if (anode[q_] == (W)) { found = 1; break; }           \
                if (!found) {                                             \
                    anode[an] = (W); anext[an] = -1;                      \
                    if (ahead[U] == -1) ahead[U] = an;                    \
                    else anext[atail[U]] = an;                            \
                    atail[U] = an;                                        \
                    an++;                                                 \
                }                                                         \
            } while (0)
            Py_ssize_t last_i = -1, last_j = -1;
            for (Py_ssize_t t = 0; t < n_pairs; t++) {
                Py_ssize_t fi = (Py_ssize_t)ps[t].k1;
                Py_ssize_t fj = (Py_ssize_t)ps[t].k2;
                if (fi == last_i && fj == last_j)
                    continue;  /* dedupe repeated pair */
                last_i = fi; last_j = fj;
                Py_ssize_t u, w;
                INTERN(cents[fi].x, cents[fi].y, u);
                INTERN(cents[fj].x, cents[fj].y, w);
                ADJ_ADD(u, w);
                if (w != u)
                    ADJ_ADD(w, u);
            }
#undef INTERN
#undef ADJ_ADD
            /* flatten into Lvl D */
            D->n_nodes = dn;
            D->pos = PyMem_Malloc((dn + 1) * sizeof(PTxy));
            D->adj_off = PyMem_Malloc((dn + 2) * sizeof(Py_ssize_t));
            D->adj = PyMem_Malloc((an + 1) * sizeof(Py_ssize_t));
            if (!D->pos || !D->adj_off || !D->adj) {
                PyErr_NoMemory();
                lvl_free(D);
                map2_free(&nmap);
                PyMem_Free(dpos); PyMem_Free(ahead); PyMem_Free(atail);
                PyMem_Free(anode); PyMem_Free(anext);
                PyMem_Free(ps); PyMem_Free(pt);
                PyMem_Free(pair_i); PyMem_Free(pair_j);
                PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
                PyMem_Free(mem_face); PyMem_Free(mem_next);
                map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
                PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
                goto fail1;
            }
            Py_ssize_t pos_ = 0;
            for (Py_ssize_t u = 0; u < dn; u++) {
                D->pos[u] = dpos[u];
                D->adj_off[u] = pos_;
                for (Py_ssize_t q = ahead[u]; q != -1; q = anext[q])
                    D->adj[pos_++] = anode[q];
            }
            D->adj_off[dn] = pos_;
            D->m2 = pos_;
            map2_free(&nmap);
            PyMem_Free(dpos); PyMem_Free(ahead); PyMem_Free(atail);
            PyMem_Free(anode); PyMem_Free(anext);
            PyMem_Free(ps); PyMem_Free(pt);
        }
        PyMem_Free(pair_i); PyMem_Free(pair_j);
        PyMem_Free(cents); PyMem_Free(ek_head); PyMem_Free(ek_tail);
        PyMem_Free(mem_face); PyMem_Free(mem_next);
        map2_free(&ekmap); PyMem_Free(fk1); PyMem_Free(fk2);
    }
    PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
done_empty:
    PyMem_Free(seeds); PyMem_Free(stmp); PyMem_Free(used);
    PyMem_Free(face_of); PyMem_Free(face_start); PyMem_Free(face_seq);
    PyMem_Free(rot); PyMem_Free(de_succ); PyMem_Free(de_p); PyMem_Free(de_c);
    PyMem_Free(keybuf); PyMem_Free(ordbuf); PyMem_Free(tmpbuf);
    map2_free(&demap);
    return 0;
fail1:
    PyMem_Free(seeds); PyMem_Free(stmp); PyMem_Free(used);
    PyMem_Free(face_of); PyMem_Free(face_start); PyMem_Free(face_seq);
fail0:
    PyMem_Free(rot); PyMem_Free(de_succ); PyMem_Free(de_p); PyMem_Free(de_c);
    PyMem_Free(keybuf); PyMem_Free(ordbuf); PyMem_Free(tmpbuf);
    if (demap_ok) map2_free(&demap);
    return -1;
}

/* run the weak-dual level loop to k; takes ownership of L (frees it).
 * Returns a Python int, or NULL on error. */
static PyObject *
run_weak_dual(Lvl L, Py_ssize_t max_k)
{
    Lvl D = {0};
    Py_ssize_t k = 0;
    while (L.n_nodes > 0 && k < max_k) {
        Py_ssize_t n_faces = 0;
        if (dual_level(&L, &D, &n_faces) < 0) {
            lvl_free(&L);
            lvl_free(&D);
            return NULL;
        }
        if (D.n_nodes == 0) {
            if (n_faces == 1)
                k += 1;
            break;
        }
        lvl_free(&L);
        L = D;
        D.pos = NULL; D.adj_off = NULL; D.adj = NULL; D.n_nodes = 0; D.m2 = 0;
        k += 1;
    }
    lvl_free(&L);
    lvl_free(&D);
    return PyLong_FromSsize_t(k);
}

/* weak_dual_k(xs, ys, adj_off, adj, max_k) -> int
 * xs/ys: node coordinates (insertion order); adj_off/adj: neighbor node
 * indices per node in nx adjacency (insertion) order. */
static PyObject *
weak_dual_k(PyObject *self, PyObject *args)
{
    PyObject *xs_o, *ys_o, *off_o, *adj_o;
    Py_ssize_t max_k;
    if (!PyArg_ParseTuple(args, "OOOOn", &xs_o, &ys_o, &off_o, &adj_o, &max_k))
        return NULL;
    if (!PyList_CheckExact(xs_o) || !PyList_CheckExact(ys_o)
        || !PyList_CheckExact(off_o) || !PyList_CheckExact(adj_o)) {
        PyErr_SetString(PyExc_TypeError, "expected lists");
        return NULL;
    }
    Lvl L = {0};
    Py_ssize_t n = PyList_GET_SIZE(xs_o);
    Py_ssize_t m2 = PyList_GET_SIZE(adj_o);
    L.n_nodes = n;
    L.m2 = m2;
    L.pos = PyMem_Malloc((n + 1) * sizeof(PTxy));
    L.adj_off = PyMem_Malloc((n + 2) * sizeof(Py_ssize_t));
    L.adj = PyMem_Malloc((m2 + 1) * sizeof(Py_ssize_t));
    if (!L.pos || !L.adj_off || !L.adj) {
        PyErr_NoMemory();
        lvl_free(&L);
        return NULL;
    }
    for (Py_ssize_t i = 0; i < n; i++) {
        L.pos[i].x = PyFloat_AsDouble(PyList_GET_ITEM(xs_o, i));
        L.pos[i].y = PyFloat_AsDouble(PyList_GET_ITEM(ys_o, i));
        if (PyErr_Occurred()) { lvl_free(&L); return NULL; }
    }
    for (Py_ssize_t i = 0; i <= n; i++) {
        L.adj_off[i] = PyLong_AsSsize_t(PyList_GET_ITEM(off_o, i));
        if (L.adj_off[i] == -1 && PyErr_Occurred()) { lvl_free(&L); return NULL; }
    }
    for (Py_ssize_t i = 0; i < m2; i++) {
        L.adj[i] = PyLong_AsSsize_t(PyList_GET_ITEM(adj_o, i));
        if (L.adj[i] == -1 && PyErr_Occurred()) { lvl_free(&L); return NULL; }
    }
    return run_weak_dual(L, max_k);
}

/* snap_to_canon(rx, ry, cx, cy, eps) -> (rx', ry') — for each ring vertex,
 * the FIRST canon vertex within eps (both axes) replaces it; port of
 * planar._snap_to_canon (comparisons + assignment only, no arithmetic). */
static PyObject *
snap_to_canon(PyObject *self, PyObject *args)
{
    PyObject *rx_o, *ry_o, *cx_o, *cy_o;
    double eps;
    if (!PyArg_ParseTuple(args, "OOOOd", &rx_o, &ry_o, &cx_o, &cy_o, &eps))
        return NULL;
    static double rx[8192], ry[8192];
    static double cx[65536], cy[65536];
    Py_ssize_t nr, nr2, nc, nc2;
    if (!load_list(rx_o, rx, 8192, &nr) || !load_list(ry_o, ry, 8192, &nr2)
        || !load_list(cx_o, cx, 65536, &nc) || !load_list(cy_o, cy, 65536, &nc2))
        return NULL;
    for (Py_ssize_t i = 0; i < nr; i++) {
        for (Py_ssize_t j = 0; j < nc; j++) {
            if (fabs(cx[j] - rx[i]) <= eps && fabs(cy[j] - ry[i]) <= eps) {
                rx[i] = cx[j];
                ry[i] = cy[j];
                break;
            }
        }
    }
    return pack_ring(rx, ry, nr);
}

/* ring_parts(px, py, eps) -> list of node-index lists (sub-ring loops) —
 * port of planar.split_ring_parts minus the final area filter (which the
 * Python wrapper keeps, so all float summation stays in numpy).
 * Input: OPEN ring coordinates. Keys use rint(v/eps) == Python round()
 * (round-half-even for in-range doubles). */
/* core of ring_parts over C arrays: writes loops of ORIGINAL point indices
 * into loop_idx (caller cap >= 3*8192) with loop_off[k]..loop_off[k+1]
 * spans; returns the loop count, -1 allocation failure (PyErr set),
 * -3 input too large. */
static Py_ssize_t
rp_core(const double *px, const double *py, Py_ssize_t n0, double eps,
        Py_ssize_t *loop_idx, Py_ssize_t *loop_off)
{
    if (n0 > 8192)
        return -3;
    /* consecutive-duplicate removal (keep[] indices) */
    static Py_ssize_t keep[8192];
    Py_ssize_t nk = 0;
    if (n0 > 0)
        keep[nk++] = 0;
    for (Py_ssize_t i = 1; i < n0; i++) {
        if (fabs(px[i] - px[keep[nk - 1]]) > eps
            || fabs(py[i] - py[keep[nk - 1]]) > eps)
            keep[nk++] = i;
    }
    if (nk > 1 && fabs(px[keep[0]] - px[keep[nk - 1]]) <= eps
        && fabs(py[keep[0]] - py[keep[nk - 1]]) <= eps)
        nk--;
    loop_off[0] = 0;
    if (nk < 3)
        return 0;
    static long long kx[8192], ky[8192];
    double d = eps > 1e-300 ? eps : 1e-300;
    for (Py_ssize_t i = 0; i < nk; i++) {
        kx[i] = (long long)rint(px[keep[i]] / d);
        ky[i] = (long long)rint(py[keep[i]] / d);
    }
    /* stack-based loop extraction at repeated (kx, ky) keys.  Entries are
     * never deleted from the open-addressed map (that would break probe
     * chains); a map hit is LIVE only if its stack position is still below
     * sp and that position still points back at this slot — popped entries
     * fail one of the two and read as absent, exactly like Python's
     * index.pop(). */
    Map2 idx;
    if (!map2_init(&idx, nk + 1)) {
        PyErr_NoMemory();
        return -1;
    }
    static Py_ssize_t stack_pt[8192];     /* ORIGINAL point index per slot */
    static Py_ssize_t stack_slot[8192];   /* map slot per stack entry */
    Py_ssize_t sp = 0, n_loops = 0, out_n = 0;
    for (Py_ssize_t i = 0; i <= nk; i++) {
        Py_ssize_t ii = i % nk;
        unsigned long long a = (unsigned long long)kx[ii];
        unsigned long long b = (unsigned long long)ky[ii];
        Py_ssize_t s = map2_slot(&idx, a, b);
        int live = idx.val[s] != -1 && idx.val[s] < sp
                   && stack_slot[idx.val[s]] == s;
        if (live) {
            Py_ssize_t j = idx.val[s];
            Py_ssize_t looplen = sp - j;
            if (looplen >= 3) {
                for (Py_ssize_t t = 0; t < looplen; t++)
                    loop_idx[out_n + t] = stack_pt[j + t];
                out_n += looplen;
                loop_off[++n_loops] = out_n;
            }
            sp = j;
            if (i < nk) {
                idx.val[s] = sp;
                stack_pt[sp] = keep[ii];
                stack_slot[sp] = s;
                sp++;
            }
        } else if (i < nk) {
            idx.k1[s] = a;
            idx.k2[s] = b;
            idx.val[s] = sp;
            stack_pt[sp] = keep[ii];
            stack_slot[sp] = s;
            sp++;
        }
    }
    if (sp >= 3) {
        for (Py_ssize_t t = 0; t < sp; t++)
            loop_idx[out_n + t] = stack_pt[t];
        out_n += sp;
        loop_off[++n_loops] = out_n;
    }
    map2_free(&idx);
    return n_loops;
}

static PyObject *
ring_parts(PyObject *self, PyObject *args)
{
    PyObject *px_o, *py_o;
    double eps;
    if (!PyArg_ParseTuple(args, "OOd", &px_o, &py_o, &eps))
        return NULL;
    static double px[8192], py[8192];
    Py_ssize_t n0, n02;
    if (!load_list(px_o, px, 8192, &n0) || !load_list(py_o, py, 8192, &n02))
        return NULL;
    static Py_ssize_t loop_idx[3 * 8192];
    static Py_ssize_t loop_off[8192 + 2];
    Py_ssize_t n_loops = rp_core(px, py, n0, eps, loop_idx, loop_off);
    if (n_loops == -1)
        return NULL;
    if (n_loops == -3) {
        PyErr_SetString(PyExc_ValueError, "ring too large");
        return NULL;
    }
    PyObject *out = PyList_New(n_loops);
    if (!out)
        return NULL;
    for (Py_ssize_t k = 0; k < n_loops; k++) {
        Py_ssize_t a = loop_off[k], b = loop_off[k + 1];
        PyObject *sub = PyList_New(b - a);
        if (!sub) {
            Py_DECREF(out);
            return NULL;
        }
        for (Py_ssize_t t = a; t < b; t++)
            PyList_SET_ITEM(sub, t - a, PyLong_FromSsize_t(loop_idx[t]));
        PyList_SET_ITEM(out, k, sub);
    }
    return out;
}

/* ---- fused per-block s0 construction (round 8) ------------------------
 * s0_segs(bx, by, cx, cy, pair_aspect, canon_eps, snap_eps) -> bytes
 *
 * One call per block replacing the Python glue of planar.s0_graph's
 * production configuration (corner dummies, canon=True, snap=True,
 * arrangement=True): voronoi_pytess -> _canonicalize_cells -> per-cell
 * clip_convex -> _snap_to_canon -> split_ring_parts -> multipart anchor
 * selection, emitting the kept rings' SEGMENTS (x0,y0,x1,y1 per row) as a
 * little-endian float64 buffer for numpy's node_segments.  Bit-exact with
 * the Python path: every arithmetic op is the same IEEE double op in the
 * same order (pw_sum replicates np.sum's pairwise order; hypot2 replicates
 * math.hypot; hash keys normalize -0.0 like Python float equality).
 * Raises ValueError on any capacity overflow — the wrapper then falls back
 * to the Python path for that block. */
static int
grow_pool(double **x, double **y, Py_ssize_t *cap, Py_ssize_t need)
{
    if (need <= *cap)
        return 1;
    Py_ssize_t nc = *cap ? *cap : 1024;
    while (nc < need)
        nc <<= 1;
    if (nc > (Py_ssize_t)1 << 22)
        return 0; /* caller raises ValueError */
    double *nx_ = PyMem_Realloc(*x, nc * sizeof(double));
    if (!nx_)
        return -1;
    *x = nx_;
    double *ny_ = PyMem_Realloc(*y, nc * sizeof(double));
    if (!ny_)
        return -1;
    *y = ny_;
    *cap = nc;
    return 1;
}

static PyObject *
s0_segs(PyObject *self, PyObject *args)
{
    PyObject *bx_o, *by_o, *cx_o, *cy_o;
    double pair_aspect, canon_eps, snap_eps;
    if (!PyArg_ParseTuple(args, "OOOOddd", &bx_o, &by_o, &cx_o, &cy_o,
                          &pair_aspect, &canon_eps, &snap_eps))
        return NULL;
    static double bxv[4096], byv[4096];
    Py_ssize_t n_blk, n_blk2;
    if (!load_list(bx_o, bxv, 4096, &n_blk) || !load_list(by_o, byv, 4096, &n_blk2))
        return NULL;
    if (!PyList_CheckExact(cx_o) || !PyList_CheckExact(cy_o)) {
        PyErr_SetString(PyExc_TypeError, "expected lists");
        return NULL;
    }
    Py_ssize_t n_cent = PyList_GET_SIZE(cx_o);
    if (n_cent != PyList_GET_SIZE(cy_o) || n_cent > 65536 || n_blk < 1) {
        PyErr_SetString(PyExc_ValueError, "bad sizes");
        return NULL;
    }
    /* open subject of the block ring (clip_convex strips the closing dup
     * by value equality) */
    Py_ssize_t ns = n_blk;
    if (n_blk > 1 && bxv[0] == bxv[n_blk - 1] && byv[0] == byv[n_blk - 1])
        ns = n_blk - 1;
    /* everything dynamic lives here so one cleanup path frees it */
    double *centx = NULL, *centy = NULL, *uqx = NULL, *uqy = NULL;
    double *allx = NULL, *ally = NULL;
    double *pool_x = NULL, *pool_y = NULL;       /* closed cell rings */
    Py_ssize_t pool_cap = 0, pool_n = 0;
    double *outp_x = NULL, *outp_y = NULL;       /* kept output rings */
    Py_ssize_t out_cap = 0, out_n = 0;
    Py_ssize_t *cell_off = NULL, *cell_len = NULL, *cell_site = NULL;
    Py_ssize_t *ring_len = NULL;  /* per kept ring */
    Py_ssize_t n_rings = 0, ring_cap = 0;
    Py_ssize_t *rep = NULL;
    Map2 bset = {0}, useen = {0};
    int bset_ok = 0, useen_ok = 0;
    PyObject *result = NULL;
    int raise_val = 0;

    centx = PyMem_Malloc((n_cent + 1) * sizeof(double));
    centy = PyMem_Malloc((n_cent + 1) * sizeof(double));
    uqx = PyMem_Malloc((n_cent + 5) * sizeof(double));
    uqy = PyMem_Malloc((n_cent + 5) * sizeof(double));
    allx = PyMem_Malloc((n_cent + 5) * sizeof(double));
    ally = PyMem_Malloc((n_cent + 5) * sizeof(double));
    cell_off = PyMem_Malloc((n_cent + 1) * sizeof(Py_ssize_t));
    cell_len = PyMem_Malloc((n_cent + 1) * sizeof(Py_ssize_t));
    cell_site = PyMem_Malloc((n_cent + 1) * sizeof(Py_ssize_t));
    if (!centx || !centy || !uqx || !uqy || !allx || !ally
        || !cell_off || !cell_len || !cell_site) {
        PyErr_NoMemory();
        goto done;
    }
    for (Py_ssize_t i = 0; i < n_cent; i++) {
        centx[i] = PyFloat_AsDouble(PyList_GET_ITEM(cx_o, i));
        centy[i] = PyFloat_AsDouble(PyList_GET_ITEM(cy_o, i));
        if (PyErr_Occurred())
            goto done;
    }
    /* boundary set: every block-ring vertex (value-equality keys) */
    bset_ok = map2_init(&bset, n_blk + 1);
    useen_ok = map2_init(&useen, n_cent + 1);
    if (!bset_ok || !useen_ok) {
        PyErr_NoMemory();
        goto done;
    }
    for (Py_ssize_t i = 0; i < n_blk; i++) {
        Py_ssize_t s = map2_slot(&bset, vbits(bxv[i]), vbits(byv[i]));
        if (bset.val[s] == -1) {
            bset.k1[s] = vbits(bxv[i]);
            bset.k2[s] = vbits(byv[i]);
            bset.val[s] = i;
        }
    }
    /* insertion-order value dedupe (Python: set of float tuples) */
    Py_ssize_t n_uniq = 0;
    for (Py_ssize_t i = 0; i < n_cent; i++) {
        Py_ssize_t s = map2_slot(&useen, vbits(centx[i]), vbits(centy[i]));
        if (useen.val[s] == -1) {
            useen.k1[s] = vbits(centx[i]);
            useen.k2[s] = vbits(centy[i]);
            useen.val[s] = n_uniq;
            uqx[n_uniq] = centx[i];
            uqy[n_uniq] = centy[i];
            n_uniq++;
        }
    }
    /* _pytess_pair_degenerate (np.unique count == value-distinct count) */
    if (pair_aspect >= 0.0 && n_uniq == 2) {
        double dx = fabs(uqx[1] - uqx[0]);
        double dy = fabs(uqy[1] - uqy[0]);
        double hi = dx > dy ? dx : dy;
        double lo = dx < dy ? dx : dy;
        if (hi == 0.0 || (lo / hi) < pair_aspect) {
            result = PyBytes_FromStringAndSize(NULL, 0);
            goto done;
        }
    }
    if (n_uniq < 2) {
        result = PyBytes_FromStringAndSize(NULL, 0);
        goto done;
    }
    /* bbox + corner dummies + frame box (voronoi_pytess, corner mode) */
    double xmin = uqx[0], xmax = uqx[0], ymin = uqy[0], ymax = uqy[0];
    for (Py_ssize_t i = 1; i < n_uniq; i++) {
        if (uqx[i] < xmin) xmin = uqx[i];
        if (uqx[i] > xmax) xmax = uqx[i];
        if (uqy[i] < ymin) ymin = uqy[i];
        if (uqy[i] > ymax) ymax = uqy[i];
    }
    double xbuff = xmax - xmin, ybuff = ymax - ymin;
    memcpy(allx, uqx, n_uniq * sizeof(double));
    memcpy(ally, uqy, n_uniq * sizeof(double));
    allx[n_uniq + 0] = xmin - xbuff; ally[n_uniq + 0] = ymin - ybuff;
    allx[n_uniq + 1] = xmax + xbuff; ally[n_uniq + 1] = ymin - ybuff;
    allx[n_uniq + 2] = xmax + xbuff; ally[n_uniq + 2] = ymax + ybuff;
    allx[n_uniq + 3] = xmin - xbuff; ally[n_uniq + 3] = ymax + ybuff;
    Py_ssize_t n_all = n_uniq + 4;
    double pad_x = 50.0 * xbuff, pad_y = 50.0 * ybuff;
    double box_x[4], box_y[4];
    box_x[0] = xmin - pad_x; box_y[0] = ymin - pad_y;
    box_x[1] = xmax + pad_x; box_y[1] = ymin - pad_y;
    box_x[2] = xmax + pad_x; box_y[2] = ymax + pad_y;
    box_x[3] = xmin - pad_x; box_y[3] = ymax + pad_y;
    /* per-site Voronoi cells (mode 0), stored CLOSED in the pool */
    {
        static double vcur_x[8192], vcur_y[8192], vnxt_x[8192], vnxt_y[8192];
        Py_ssize_t n_cells = 0;
        for (Py_ssize_t i = 0; i < n_uniq; i++) {
            Py_ssize_t m = vor_cell_core(box_x, box_y, 4, allx, ally, n_all,
                                         i, uqx[i], uqy[i], 0, NULL,
                                         vcur_x, vcur_y, vnxt_x, vnxt_y);
            if (m == -3) {
                raise_val = 1;
                goto done;
            }
            if (m <= 0)
                continue;
            int gr = grow_pool(&pool_x, &pool_y, &pool_cap, pool_n + m + 1);
            if (gr == 0) { raise_val = 1; goto done; }
            if (gr < 0) { PyErr_NoMemory(); goto done; }
            memcpy(pool_x + pool_n, vcur_x, m * sizeof(double));
            memcpy(pool_y + pool_n, vcur_y, m * sizeof(double));
            pool_x[pool_n + m] = vcur_x[0];
            pool_y[pool_n + m] = vcur_y[0];
            cell_off[n_cells] = pool_n;
            cell_len[n_cells] = m + 1;     /* CLOSED length */
            cell_site[n_cells] = i;
            pool_n += m + 1;
            n_cells++;
        }
        /* canonicalize: cluster all CLOSED ring vertices, snap to reps */
        if (pool_n) {
            rep = PyMem_Malloc((pool_n + 1) * sizeof(Py_ssize_t));
            if (!rep) { PyErr_NoMemory(); goto done; }
            if (cluster_core(pool_x, pool_y, pool_n, canon_eps, rep) < 0)
                goto done;
            /* canon[i] = pool[rep[i]]; rep[i] <= i never guaranteed, so
             * materialize into fresh arrays (all_pts[rep] semantics) */
            double *cnx = PyMem_Malloc((pool_n + 1) * sizeof(double));
            double *cny = PyMem_Malloc((pool_n + 1) * sizeof(double));
            if (!cnx || !cny) {
                PyMem_Free(cnx); PyMem_Free(cny);
                PyErr_NoMemory();
                goto done;
            }
            for (Py_ssize_t i = 0; i < pool_n; i++) {
                cnx[i] = pool_x[rep[i]];
                cny[i] = pool_y[rep[i]];
            }
            PyMem_Free(pool_x); PyMem_Free(pool_y);
            pool_x = cnx; pool_y = cny;
        }
        /* per-cell: boundary skip, clip, snap, split, anchor select */
        static double ep_x[8192], ep_y[8192], eq_x[8192], eq_y[8192];
        static double ccur_x[8192], ccur_y[8192], cnxt_x[8192], cnxt_y[8192];
        static double inter_x[8200], inter_y[8200];
        static double ebuf[8200];
        static Py_ssize_t loop_idx[3 * 8192], loop_off[8192 + 2];
        static double part_x[8200], part_y[8200];
        for (Py_ssize_t ci = 0; ci < n_cells; ci++) {
            double ax_ = uqx[cell_site[ci]], ay_ = uqy[cell_site[ci]];
            {
                Py_ssize_t s = map2_slot(&bset, vbits(ax_), vbits(ay_));
                if (bset.val[s] != -1)
                    continue;  /* anchor on the block boundary */
            }
            Py_ssize_t clen = cell_len[ci];
            if (clen <= 3)
                continue;
            const double *rx = pool_x + cell_off[ci];
            const double *ry = pool_y + cell_off[ci];
            /* clip_convex: ensure clip CCW (np.sum pairwise sign) */
            Py_ssize_t ne = clen - 1;
            if (ne > 4096 || ns > 4096) { raise_val = 1; goto done; }
            for (Py_ssize_t t = 0; t < ne; t++)
                ebuf[t] = rx[t] * ry[t + 1] - rx[t + 1] * ry[t];
            int rev = (0.5 * pw_sum(ebuf, ne)) < 0;
            if (!rev) {
                for (Py_ssize_t t = 0; t < ne; t++) {
                    ep_x[t] = rx[t];     ep_y[t] = ry[t];
                    eq_x[t] = rx[t + 1]; eq_y[t] = ry[t + 1];
                }
            } else {
                /* clip[::-1]: reversed closed ring */
                for (Py_ssize_t t = 0; t < ne; t++) {
                    ep_x[t] = rx[clen - 1 - t];     ep_y[t] = ry[clen - 1 - t];
                    eq_x[t] = rx[clen - 2 - t];     eq_y[t] = ry[clen - 2 - t];
                }
            }
            Py_ssize_t m2 = ccs_core(bxv, byv, ns, ep_x, ep_y, eq_x, eq_y, ne,
                                     ccur_x, ccur_y, cnxt_x, cnxt_y);
            if (m2 == -3) { raise_val = 1; goto done; }
            Py_ssize_t ilen;  /* CLOSED inter length */
            if (m2 == -1) {
                /* identity: inter = the closed block ring as passed */
                ilen = n_blk;
                memcpy(inter_x, bxv, n_blk * sizeof(double));
                memcpy(inter_y, byv, n_blk * sizeof(double));
            } else if (m2 == 0) {
                continue;  /* wiped: len(inter) < 4 */
            } else {
                ilen = m2 + 1;
                memcpy(inter_x, ccur_x, m2 * sizeof(double));
                memcpy(inter_y, ccur_y, m2 * sizeof(double));
                inter_x[m2] = ccur_x[0];
                inter_y[m2] = ccur_y[0];
            }
            if (ilen < 4)
                continue;
            /* _snap_to_canon: first canon vertex within snap_eps on BOTH
             * axes replaces the ring vertex */
            for (Py_ssize_t t = 0; t < ilen; t++) {
                for (Py_ssize_t j = 0; j < pool_n; j++) {
                    if (fabs(pool_x[j] - inter_x[t]) <= snap_eps
                        && fabs(pool_y[j] - inter_y[t]) <= snap_eps) {
                        inter_x[t] = pool_x[j];
                        inter_y[t] = pool_y[j];
                        break;
                    }
                }
            }
            /* split_ring_parts: open pts (strip the closing dup by value
             * equality), loop extraction, area>0 filter */
            Py_ssize_t n_open = ilen;
            if (ilen > 1 && inter_x[0] == inter_x[ilen - 1]
                && inter_y[0] == inter_y[ilen - 1])
                n_open = ilen - 1;
            Py_ssize_t n_loops = rp_core(inter_x, inter_y, n_open, 1e-12,
                                         loop_idx, loop_off);
            if (n_loops == -1)
                goto done;
            if (n_loops == -3) { raise_val = 1; goto done; }
            /* parts: closed sub-rings with nonzero area, in loop order */
            Py_ssize_t part_starts[64];
            Py_ssize_t part_lens[64];   /* CLOSED lengths */
            Py_ssize_t n_parts = 0;
            Py_ssize_t pbuf_n = 0;
            for (Py_ssize_t k = 0; k < n_loops; k++) {
                Py_ssize_t a = loop_off[k], b = loop_off[k + 1];
                Py_ssize_t L_ = b - a;
                if (n_parts >= 64 || pbuf_n + L_ + 1 > 8200) {
                    raise_val = 1;
                    goto done;
                }
                for (Py_ssize_t t = 0; t < L_; t++) {
                    part_x[pbuf_n + t] = inter_x[loop_idx[a + t]];
                    part_y[pbuf_n + t] = inter_y[loop_idx[a + t]];
                }
                part_x[pbuf_n + L_] = part_x[pbuf_n];
                part_y[pbuf_n + L_] = part_y[pbuf_n];
                /* _abs_ring_area > 0 */
                for (Py_ssize_t t = 0; t < L_; t++)
                    ebuf[t] = part_x[pbuf_n + t] * part_y[pbuf_n + t + 1]
                              - part_x[pbuf_n + t + 1] * part_y[pbuf_n + t];
                double area = 0.5 * fabs(pw_sum(ebuf, L_));
                if (area > 0.0) {
                    part_starts[n_parts] = pbuf_n;
                    part_lens[n_parts] = L_ + 1;
                    n_parts++;
                    pbuf_n += L_ + 1;
                }
            }
            /* ring selection (s0_graph): <=1 part -> inter or parts[0];
             * multipart -> first part containing the anchor */
            const double *ox = NULL, *oy = NULL;
            Py_ssize_t olen = 0;
            if (n_parts == 0) {
                ox = inter_x; oy = inter_y; olen = ilen;
            } else if (n_parts == 1) {
                ox = part_x + part_starts[0];
                oy = part_y + part_starts[0];
                olen = part_lens[0];
            } else {
                for (Py_ssize_t k = 0; k < n_parts; k++) {
                    if (pt_in_ring_c(ax_, ay_, part_x + part_starts[k],
                                     part_y + part_starts[k], part_lens[k])) {
                        ox = part_x + part_starts[k];
                        oy = part_y + part_starts[k];
                        olen = part_lens[k];
                        break;
                    }
                }
                if (!ox)
                    continue;  /* no part contains the anchor */
            }
            int gr = grow_pool(&outp_x, &outp_y, &out_cap, out_n + olen);
            if (gr == 0) { raise_val = 1; goto done; }
            if (gr < 0) { PyErr_NoMemory(); goto done; }
            memcpy(outp_x + out_n, ox, olen * sizeof(double));
            memcpy(outp_y + out_n, oy, olen * sizeof(double));
            out_n += olen;
            if (n_rings >= ring_cap) {
                Py_ssize_t nc = ring_cap ? ring_cap * 2 : 64;
                Py_ssize_t *nr = PyMem_Realloc(ring_len, nc * sizeof(Py_ssize_t));
                if (!nr) { PyErr_NoMemory(); goto done; }
                ring_len = nr;
                ring_cap = nc;
            }
            ring_len[n_rings++] = olen;
        }
    }
    /* emit segments: per ring rg, rows (rg[t], rg[t+1]) for t < len-1 */
    {
        Py_ssize_t total = 0;
        for (Py_ssize_t k = 0; k < n_rings; k++)
            if (ring_len[k] >= 2)
                total += ring_len[k] - 1;
        result = PyBytes_FromStringAndSize(NULL,
                                           total * 4 * (Py_ssize_t)sizeof(double));
        if (!result)
            goto done;
        double *w = (double *)PyBytes_AS_STRING(result);
        Py_ssize_t off = 0;
        for (Py_ssize_t k = 0; k < n_rings; k++) {
            Py_ssize_t L_ = ring_len[k];
            if (L_ >= 2) {
                for (Py_ssize_t t = 0; t < L_ - 1; t++) {
                    *w++ = outp_x[off + t];
                    *w++ = outp_y[off + t];
                    *w++ = outp_x[off + t + 1];
                    *w++ = outp_y[off + t + 1];
                }
            }
            off += L_;
        }
    }
done:
    if (raise_val && !PyErr_Occurred())
        PyErr_SetString(PyExc_ValueError, "s0_segs capacity exceeded");
    if (raise_val) {
        Py_XDECREF(result);
        result = NULL;
    }
    PyMem_Free(centx); PyMem_Free(centy); PyMem_Free(uqx); PyMem_Free(uqy);
    PyMem_Free(allx); PyMem_Free(ally);
    PyMem_Free(pool_x); PyMem_Free(pool_y);
    PyMem_Free(outp_x); PyMem_Free(outp_y);
    PyMem_Free(cell_off); PyMem_Free(cell_len); PyMem_Free(cell_site);
    PyMem_Free(ring_len); PyMem_Free(rep);
    if (bset_ok) map2_free(&bset);
    if (useen_ok) map2_free(&useen);
    return result;
}

/* weak_dual_k_segs(pieces, max_k) -> int
 * pieces: float64 buffer of noded arrangement pieces (x0,y0,x1,y1 rows,
 * node_segments output order).  Builds the union graph with
 * graph_from_segments' semantics — nodes interned by VALUE equality in
 * first-seen order (keeping the first-seen coordinate object, like nx
 * node tuples), adjacency in insertion order with duplicate-edge
 * suppression, self-edges skipped — then runs the weak-dual sequence. */
/* graph_from_segments semantics over a pieces buffer: nodes interned by
 * VALUE equality in first-seen order (keeping the first-seen coordinate,
 * like nx node tuples), adjacency in insertion order with duplicate-edge
 * suppression, self-edges skipped.  Fills L (caller lvl_free's it).
 * Returns 0 ok, -1 allocation failure (PyErr set). */
static int
graph_from_pieces_c(const double *d, Py_ssize_t np_, Lvl *L)
{
    Map2 nmap = {0};
    PTxy *pos = PyMem_Malloc((2 * np_ + 1) * sizeof(PTxy));
    Py_ssize_t *ahead = PyMem_Malloc((2 * np_ + 1) * sizeof(Py_ssize_t));
    Py_ssize_t *atail = PyMem_Malloc((2 * np_ + 1) * sizeof(Py_ssize_t));
    Py_ssize_t *anode = PyMem_Malloc((4 * np_ + 1) * sizeof(Py_ssize_t));
    Py_ssize_t *anext = PyMem_Malloc((4 * np_ + 1) * sizeof(Py_ssize_t));
    int nm_ok = map2_init(&nmap, 2 * np_ + 1);
    Py_ssize_t dn = 0, an = 0;
    int rc = -1;
    L->n_nodes = 0; L->pos = NULL; L->adj_off = NULL; L->adj = NULL; L->m2 = 0;
    if (!pos || !ahead || !atail || !anode || !anext || !nm_ok) {
        PyErr_NoMemory();
        goto done;
    }
#define INTERN_V(CX, CY, OUT)                                             \
    do {                                                                  \
        unsigned long long b1 = vbits(CX), b2 = vbits(CY);                \
        Py_ssize_t sl = map2_slot(&nmap, b1, b2);                         \
        if (nmap.val[sl] == -1) {                                         \
            nmap.k1[sl] = b1; nmap.k2[sl] = b2;                           \
            nmap.val[sl] = dn;                                            \
            pos[dn].x = (CX); pos[dn].y = (CY);                           \
            ahead[dn] = -1; atail[dn] = -1;                               \
            dn++;                                                         \
        }                                                                 \
        (OUT) = nmap.val[sl];                                             \
    } while (0)
#define ADJ_ADD_V(U, W)                                                   \
    do {                                                                  \
        int found = 0;                                                    \
        for (Py_ssize_t q_ = ahead[U]; q_ != -1; q_ = anext[q_])          \
            if (anode[q_] == (W)) { found = 1; break; }                   \
        if (!found) {                                                     \
            anode[an] = (W); anext[an] = -1;                              \
            if (ahead[U] == -1) ahead[U] = an;                            \
            else anext[atail[U]] = an;                                    \
            atail[U] = an;                                                \
            an++;                                                         \
        }                                                                 \
    } while (0)
    for (Py_ssize_t t = 0; t < np_; t++) {
        double x0 = d[4 * t], y0 = d[4 * t + 1];
        double x1 = d[4 * t + 2], y1 = d[4 * t + 3];
        if (x0 == x1 && y0 == y1)
            continue;  /* graph_from_segments: if a != b */
        Py_ssize_t u, w;
        INTERN_V(x0, y0, u);
        INTERN_V(x1, y1, w);
        ADJ_ADD_V(u, w);
        ADJ_ADD_V(w, u);
    }
#undef INTERN_V
#undef ADJ_ADD_V
    L->n_nodes = dn;
    L->pos = PyMem_Malloc((dn + 1) * sizeof(PTxy));
    L->adj_off = PyMem_Malloc((dn + 2) * sizeof(Py_ssize_t));
    L->adj = PyMem_Malloc((an + 1) * sizeof(Py_ssize_t));
    if (!L->pos || !L->adj_off || !L->adj) {
        PyErr_NoMemory();
        lvl_free(L);
        goto done;
    }
    {
        Py_ssize_t p_ = 0;
        for (Py_ssize_t u = 0; u < dn; u++) {
            L->pos[u] = pos[u];
            L->adj_off[u] = p_;
            for (Py_ssize_t q = ahead[u]; q != -1; q = anext[q])
                L->adj[p_++] = anode[q];
        }
        L->adj_off[dn] = p_;
        L->m2 = p_;
    }
    rc = 0;
done:
    PyMem_Free(pos); PyMem_Free(ahead); PyMem_Free(atail);
    PyMem_Free(anode); PyMem_Free(anext);
    if (nm_ok) map2_free(&nmap);
    return rc;
}

static PyObject *
weak_dual_k_segs(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    Py_ssize_t max_k;
    if (!PyArg_ParseTuple(args, "y*n", &buf, &max_k))
        return NULL;
    if (buf.len % (4 * sizeof(double))) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "pieces buffer not (n,4) float64");
        return NULL;
    }
    Py_ssize_t np_ = buf.len / (4 * (Py_ssize_t)sizeof(double));
    const double *d = (const double *)buf.buf;
    Lvl L = {0};
    if (graph_from_pieces_c(d, np_, &L) < 0) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    PyBuffer_Release(&buf);
    return run_weak_dual(L, max_k);
}

/* ---- noder: C port of planar._node_pieces (round 8) -------------------
 * node_pieces(segs) -> bytes — segs is an (m,4) float64 buffer; returns
 * the noded, QUANTUM-rounded, zero-length-filtered pieces as an (n,4)
 * float64 buffer.  Bit-exact with the numpy path:
 *   - the candidate-pair stage of _node_pieces provably reduces to "every
 *     (i<j) pair whose bboxes overlap" (complete grid + exact bbox refine
 *     + np.unique canonicalization), so ANY complete enumeration with the
 *     same exact bbox test yields the identical pair set — here a
 *     sort-by-xmin sweep;
 *   - per-pair intersection / collinear-projection math is elementwise,
 *     ported op-for-op (nan/inf short-circuits match because `ok` gates
 *     every non-finite lane exactly like the numpy masks);
 *   - (i, t) items are sorted by composite key and deduped on value
 *     equality — ties are identical values, so sort stability is moot;
 *   - QUANTUM rounding is rint (np.round decimals=0), half-even.
 * Raises ValueError above the 8192-segment cap (callers fall back to the
 * numpy path). */
typedef struct { Py_ssize_t i; double t; } Item;

static int item_cmp(const void *a, const void *b)
{
    const Item *x = (const Item *)a, *y = (const Item *)b;
    if (x->i != y->i)
        return x->i < y->i ? -1 : 1;
    if (x->t != y->t)
        return x->t < y->t ? -1 : 1;
    return 0;
}

static const double *xmin_ctx = NULL;
static int xmin_cmp(const void *a, const void *b)
{
    double xa = xmin_ctx[*(const Py_ssize_t *)a];
    double xb = xmin_ctx[*(const Py_ssize_t *)b];
    if (xa != xb)
        return xa < xb ? -1 : 1;
    return 0;
}

static PyObject *
node_pieces(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    if (!PyArg_ParseTuple(args, "y*", &buf))
        return NULL;
    if (buf.len % (4 * sizeof(double))) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "segs buffer not (m,4) float64");
        return NULL;
    }
    Py_ssize_t m = buf.len / (4 * (Py_ssize_t)sizeof(double));
    const double *sg = (const double *)buf.buf;
    PyObject *result = NULL;
    Item *items = NULL;
    Py_ssize_t items_cap = 0, n_items = 0;
    double *xmn = NULL, *xmx = NULL, *ymn = NULL, *ymx = NULL;
    Py_ssize_t *ord = NULL;
    double *outbuf = NULL;
    if (m > 8192) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "too many segments");
        return NULL;
    }
    if (m == 0) {
        PyBuffer_Release(&buf);
        return PyBytes_FromStringAndSize(NULL, 0);
    }
    xmn = PyMem_Malloc(m * sizeof(double));
    xmx = PyMem_Malloc(m * sizeof(double));
    ymn = PyMem_Malloc(m * sizeof(double));
    ymx = PyMem_Malloc(m * sizeof(double));
    ord = PyMem_Malloc(m * sizeof(Py_ssize_t));
    items_cap = 4 * m + 64;
    items = PyMem_Malloc(items_cap * sizeof(Item));
    if (!xmn || !xmx || !ymn || !ymx || !ord || !items) {
        PyErr_NoMemory();
        goto done;
    }
    for (Py_ssize_t i = 0; i < m; i++) {
        double x0 = sg[4 * i], y0 = sg[4 * i + 1];
        double x1 = sg[4 * i + 2], y1 = sg[4 * i + 3];
        xmn[i] = x0 < x1 ? x0 : x1;
        xmx[i] = x0 < x1 ? x1 : x0;
        ymn[i] = y0 < y1 ? y0 : y1;
        ymx[i] = y0 < y1 ? y1 : y0;
        ord[i] = i;
        items[n_items].i = i; items[n_items].t = 0.0; n_items++;
        items[n_items].i = i; items[n_items].t = 1.0; n_items++;
    }
    xmin_ctx = xmn;
    qsort(ord, m, sizeof(Py_ssize_t), xmin_cmp);
    /* sweep: for a (by xmin) <= b, overlap iff xmin[b] <= xmax[a] plus the
     * exact y test — covers every bbox-overlapping pair exactly once */
    for (Py_ssize_t a = 0; a < m; a++) {
        Py_ssize_t i = ord[a];
        for (Py_ssize_t b = a + 1; b < m; b++) {
            Py_ssize_t j = ord[b];
            if (!(xmn[j] <= xmx[i]))
                break;
            if (!(ymn[i] <= ymx[j] && ymx[i] >= ymn[j]))
                continue;
            /* pair (i, j): the same elementwise math as _node_pieces */
            double pix = sg[4 * i], piy = sg[4 * i + 1];
            double rix = sg[4 * i + 2] - pix, riy = sg[4 * i + 3] - piy;
            double pjx = sg[4 * j], pjy = sg[4 * j + 1];
            double rjx = sg[4 * j + 2] - pjx, rjy = sg[4 * j + 3] - pjy;
            double denom = rix * rjy - riy * rjx;
            double dpx = pjx - pix, dpy = pjy - piy;
            double cross_pr = dpx * riy - dpy * rix;
            if (n_items + 8 > items_cap) {
                items_cap *= 2;
                Item *ni = PyMem_Realloc(items, items_cap * sizeof(Item));
                if (!ni) { PyErr_NoMemory(); goto done; }
                items = ni;
            }
            if (denom != 0.0) {
                double t = (dpx * rjy - dpy * rjx) / denom;
                double u = cross_pr / denom;
                int ok = (t >= -1e-12) && (t <= 1.0 + 1e-12)
                         && (u >= -1e-12) && (u <= 1.0 + 1e-12);
                if (ok) {
                    double tt = t < 0.0 ? 0.0 : (t > 1.0 ? 1.0 : t);
                    double uu = u < 0.0 ? 0.0 : (u > 1.0 ? 1.0 : u);
                    if (tt > 1e-12 && tt < 1.0 - 1e-12) {
                        items[n_items].i = i; items[n_items].t = tt; n_items++;
                    }
                    if (uu > 1e-12 && uu < 1.0 - 1e-12) {
                        items[n_items].i = j; items[n_items].t = uu; n_items++;
                    }
                }
            } else if (cross_pr == 0.0) {
                /* collinear overlap: endpoint projections, both segments
                 * non-degenerate (planar.py round-8 vectorized loop) */
                double li2 = rix * rix + riy * riy;
                double lj2 = rjx * rjx + rjy * rjy;
                if (li2 > 0.0 && lj2 > 0.0) {
                    double qjx = sg[4 * j + 2], qjy = sg[4 * j + 3];
                    double qix = sg[4 * i + 2], qiy = sg[4 * i + 3];
                    double t_;
                    t_ = ((pjx - pix) * rix + (pjy - piy) * riy) / li2;
                    if (t_ > 1e-12 && t_ < 1.0 - 1e-12) {
                        items[n_items].i = i; items[n_items].t = t_; n_items++;
                    }
                    t_ = ((qjx - pix) * rix + (qjy - piy) * riy) / li2;
                    if (t_ > 1e-12 && t_ < 1.0 - 1e-12) {
                        items[n_items].i = i; items[n_items].t = t_; n_items++;
                    }
                    t_ = ((pix - pjx) * rjx + (piy - pjy) * rjy) / lj2;
                    if (t_ > 1e-12 && t_ < 1.0 - 1e-12) {
                        items[n_items].i = j; items[n_items].t = t_; n_items++;
                    }
                    t_ = ((qix - pjx) * rjx + (qiy - pjy) * rjy) / lj2;
                    if (t_ > 1e-12 && t_ < 1.0 - 1e-12) {
                        items[n_items].i = j; items[n_items].t = t_; n_items++;
                    }
                }
            }
        }
    }
    qsort(items, n_items, sizeof(Item), item_cmp);
    /* dedupe exact-equal (i, t); emit pieces per consecutive same-i pair */
    outbuf = PyMem_Malloc((n_items + 1) * 4 * sizeof(double));
    if (!outbuf) {
        PyErr_NoMemory();
        goto done;
    }
    Py_ssize_t n_out = 0;
    Py_ssize_t prev = -1;  /* previous kept item index */
    for (Py_ssize_t k = 0; k < n_items; k++) {
        if (k > 0 && items[k].i == items[k - 1].i
            && items[k].t == items[k - 1].t)
            continue;
        if (prev >= 0 && items[prev].i == items[k].i) {
            Py_ssize_t i = items[k].i;
            double px_ = sg[4 * i], py_ = sg[4 * i + 1];
            double dx_ = sg[4 * i + 2] - px_, dy_ = sg[4 * i + 3] - py_;
            double t0 = items[prev].t, t1 = items[k].t;
            double c0 = rint((px_ + t0 * dx_) / 1e-9) * 1e-9;
            double c1 = rint((py_ + t0 * dy_) / 1e-9) * 1e-9;
            double c2 = rint((px_ + t1 * dx_) / 1e-9) * 1e-9;
            double c3 = rint((py_ + t1 * dy_) / 1e-9) * 1e-9;
            if (c0 != c2 || c1 != c3) {
                outbuf[4 * n_out] = c0;
                outbuf[4 * n_out + 1] = c1;
                outbuf[4 * n_out + 2] = c2;
                outbuf[4 * n_out + 3] = c3;
                n_out++;
            }
        }
        prev = k;
    }
    result = PyBytes_FromStringAndSize((const char *)outbuf,
                                       n_out * 4 * (Py_ssize_t)sizeof(double));
done:
    PyMem_Free(xmn); PyMem_Free(xmx); PyMem_Free(ymn); PyMem_Free(ymx);
    PyMem_Free(ord); PyMem_Free(items); PyMem_Free(outbuf);
    PyBuffer_Release(&buf);
    return result;
}

/* pip_ray(xs, ys, rx, ry) -> bytes of uint8 — bulk point-in-ring with
 * geom._bulk_in_ring | _bulk_on_ring semantics (ray cast, boundary
 * inside).  rx/ry is the CLOSED ring; elementwise identical to the numpy
 * expressions. */
static PyObject *
pip_ray(PyObject *self, PyObject *args)
{
    Py_buffer xb, yb;
    PyObject *rx_o, *ry_o;
    if (!PyArg_ParseTuple(args, "y*y*OO", &xb, &yb, &rx_o, &ry_o))
        return NULL;
    static double rx[8192], ry[8192];
    Py_ssize_t nr, nr2;
    if (!load_list(rx_o, rx, 8192, &nr) || !load_list(ry_o, ry, 8192, &nr2)) {
        PyBuffer_Release(&xb);
        PyBuffer_Release(&yb);
        return NULL;
    }
    Py_ssize_t n = xb.len / (Py_ssize_t)sizeof(double);
    const double *xs = (const double *)xb.buf;
    const double *ys = (const double *)yb.buf;
    PyObject *out = PyBytes_FromStringAndSize(NULL, n);
    if (!out) {
        PyBuffer_Release(&xb);
        PyBuffer_Release(&yb);
        return NULL;
    }
    char *w = PyBytes_AS_STRING(out);
    for (Py_ssize_t k = 0; k < n; k++)
        w[k] = (char)pt_in_ring_c(xs[k], ys[k], rx, ry, nr);
    PyBuffer_Release(&xb);
    PyBuffer_Release(&yb);
    return out;
}

/* region_faces(pieces, rx, ry) -> (coords_bytes, lens)
 * The polygonize_region face stage: union graph from noded pieces
 * (graph_from_segments semantics), iterative degree<=1 pruning, rotation-
 * system face trace (trace_faces semantics: atan2-sorted rotations, seeds
 * in lexicographic directed-edge order), stable len-sort minus the
 * largest (inner_faces), then per inner face the area>0 filter
 * (np.sum-pairwise shoelace), the |2A|<0.02 centroid fallback, and the
 * region-containment test (point_in_ring).  Emits the kept faces' CLOSED
 * rings, in inner_faces order, as one float64 coords buffer + per-ring
 * row counts (the caller sorts by (miny, minx, -len) like the Python
 * path). */
static PyObject *
region_faces(PyObject *self, PyObject *args)
{
    Py_buffer buf;
    PyObject *rx_o, *ry_o;
    if (!PyArg_ParseTuple(args, "y*OO", &buf, &rx_o, &ry_o))
        return NULL;
    static double rgx[8192], rgy[8192];
    Py_ssize_t nrg, nrg2;
    if (!load_list(rx_o, rgx, 8192, &nrg) || !load_list(ry_o, rgy, 8192, &nrg2)) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    if (buf.len % (4 * sizeof(double))) {
        PyBuffer_Release(&buf);
        PyErr_SetString(PyExc_ValueError, "pieces buffer not (n,4) float64");
        return NULL;
    }
    Py_ssize_t np_ = buf.len / (4 * (Py_ssize_t)sizeof(double));
    Lvl G = {0}, L = {0};
    PyObject *result = NULL;
    unsigned char *alive = NULL;
    Py_ssize_t *remap = NULL;
    Py_ssize_t *rot = NULL, *de_succ = NULL, *de_p = NULL, *de_c = NULL;
    double *keybuf = NULL;
    Py_ssize_t *ordbuf = NULL, *tmpbuf = NULL;
    Seed *seeds = NULL, *stmp = NULL;
    unsigned char *used = NULL;
    Py_ssize_t *face_start = NULL, *face_seq = NULL;
    Py_ssize_t *forder = NULL, *ftmp = NULL;
    double *flen = NULL;
    double *coords = NULL;
    double *ebuf2 = NULL;
    PyObject *lens_list = NULL;
    Map2 demap = {0};
    int demap_ok = 0;
    if (graph_from_pieces_c((const double *)buf.buf, np_, &G) < 0) {
        PyBuffer_Release(&buf);
        return NULL;
    }
    PyBuffer_Release(&buf);
    /* iterative leaf pruning: degrees over alive nodes only (removing a
     * node removes its edges, like nx remove_nodes_from) */
    alive = PyMem_Malloc((G.n_nodes + 1) * sizeof(unsigned char));
    remap = PyMem_Malloc((G.n_nodes + 1) * sizeof(Py_ssize_t));
    if (!alive || !remap) {
        PyErr_NoMemory();
        goto done;
    }
    memset(alive, 1, G.n_nodes);
    for (Py_ssize_t v = 0; v < G.n_nodes; v++)
        remap[v] = 0;
    for (;;) {
        Py_ssize_t n_removed = 0;
        for (Py_ssize_t v = 0; v < G.n_nodes; v++) {
            if (!alive[v])
                continue;
            Py_ssize_t deg = 0;
            for (Py_ssize_t q = G.adj_off[v]; q < G.adj_off[v + 1]; q++)
                deg += alive[G.adj[q]];
            if (deg <= 1) {
                remap[v] = -7; /* mark this round (simultaneous removal) */
                n_removed++;
            }
        }
        if (!n_removed)
            break;
        for (Py_ssize_t v = 0; v < G.n_nodes; v++)
            if (alive[v] && remap[v] == -7)
                alive[v] = 0;
        for (Py_ssize_t v = 0; v < G.n_nodes; v++)
            remap[v] = 0;
    }
    /* compact to L (original insertion order, filtered adjacency) */
    {
        Py_ssize_t dn = 0;
        for (Py_ssize_t v = 0; v < G.n_nodes; v++)
            remap[v] = alive[v] ? dn++ : -1;
        L.n_nodes = dn;
        L.pos = PyMem_Malloc((dn + 1) * sizeof(PTxy));
        L.adj_off = PyMem_Malloc((dn + 2) * sizeof(Py_ssize_t));
        L.adj = PyMem_Malloc((G.m2 + 1) * sizeof(Py_ssize_t));
        if (!L.pos || !L.adj_off || !L.adj) {
            PyErr_NoMemory();
            goto done;
        }
        Py_ssize_t p_ = 0;
        for (Py_ssize_t v = 0; v < G.n_nodes; v++) {
            if (!alive[v])
                continue;
            Py_ssize_t u = remap[v];
            L.pos[u] = G.pos[v];
            L.adj_off[u] = p_;
            for (Py_ssize_t q = G.adj_off[v]; q < G.adj_off[v + 1]; q++)
                if (alive[G.adj[q]])
                    L.adj[p_++] = remap[G.adj[q]];
        }
        L.adj_off[dn] = p_;
        L.m2 = p_;
    }
    /* trace_faces (the dual_level rotation/seed/trace machinery) */
    {
        Py_ssize_t n = L.n_nodes, m2 = L.m2;
        Py_ssize_t n_faces = 0, seq = 0;
        if (n < 2 || m2 == 0) {
            coords = PyMem_Malloc(8);
            lens_list = PyList_New(0);
            if (!coords || !lens_list) {
                PyErr_NoMemory();
                goto done;
            }
            PyObject *cb = PyBytes_FromStringAndSize(NULL, 0);
            if (!cb)
                goto done;
            result = PyTuple_New(2);
            if (!result) {
                Py_DECREF(cb);
                goto done;
            }
            PyTuple_SET_ITEM(result, 0, cb);
            PyTuple_SET_ITEM(result, 1, lens_list);
            lens_list = NULL;
            goto done;
        }
        rot = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        de_succ = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        de_p = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        de_c = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        keybuf = PyMem_Malloc(m2 * sizeof(double));
        ordbuf = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        tmpbuf = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        demap_ok = map2_init(&demap, m2);
        seeds = PyMem_Malloc(m2 * sizeof(Seed));
        stmp = PyMem_Malloc(m2 * sizeof(Seed));
        used = PyMem_Calloc(m2, 1);
        face_start = PyMem_Malloc((m2 + 2) * sizeof(Py_ssize_t));
        face_seq = PyMem_Malloc(m2 * sizeof(Py_ssize_t));
        if (!rot || !de_succ || !de_p || !de_c || !keybuf || !ordbuf
            || !tmpbuf || !demap_ok || !seeds || !stmp || !used
            || !face_start || !face_seq) {
            PyErr_NoMemory();
            goto done;
        }
        for (Py_ssize_t v = 0; v < n; v++) {
            Py_ssize_t off = L.adj_off[v], deg = L.adj_off[v + 1] - off;
            for (Py_ssize_t i = 0; i < deg; i++) {
                Py_ssize_t nb = L.adj[off + i];
                keybuf[i] = atan2(L.pos[nb].x - L.pos[v].x,
                                  L.pos[nb].y - L.pos[v].y);
                ordbuf[i] = i;
            }
            stable_sort_by_key(ordbuf, deg, keybuf, tmpbuf);
            for (Py_ssize_t i = 0; i < deg; i++)
                rot[off + i] = L.adj[off + ordbuf[i]];
            for (Py_ssize_t i = 0; i < deg; i++) {
                Py_ssize_t id = off + i;
                de_p[id] = rot[off + i];
                de_c[id] = v;
                Py_ssize_t s = map2_slot(&demap, (unsigned long long)de_p[id],
                                         (unsigned long long)v);
                demap.k1[s] = (unsigned long long)de_p[id];
                demap.k2[s] = (unsigned long long)v;
                demap.val[s] = id;
            }
        }
        for (Py_ssize_t v = 0; v < n; v++) {
            Py_ssize_t off = L.adj_off[v], deg = L.adj_off[v + 1] - off;
            for (Py_ssize_t i = 0; i < deg; i++) {
                Py_ssize_t id = off + i;
                Py_ssize_t w = rot[off + (i + 1) % deg];
                Py_ssize_t s = map2_slot(&demap, (unsigned long long)v,
                                         (unsigned long long)w);
                de_succ[id] = demap.val[s];
            }
        }
        for (Py_ssize_t i = 0; i < m2; i++) {
            seeds[i].k1 = L.pos[de_p[i]].x;
            seeds[i].k2 = L.pos[de_p[i]].y;
            seeds[i].k3 = L.pos[de_c[i]].x;
            seeds[i].k4 = L.pos[de_c[i]].y;
            seeds[i].id = i;
        }
        seed_sort(seeds, m2, stmp);
        for (Py_ssize_t i = 0; i < m2; i++) {
            Py_ssize_t seed = seeds[i].id;
            if (used[seed])
                continue;
            face_start[n_faces] = seq;
            face_seq[seq++] = seed;
            used[seed] = 1;
            Py_ssize_t cur = de_succ[seed];
            Py_ssize_t budget = 2 * m2 + 4;
            while (cur != seed && budget) {
                budget--;
                face_seq[seq++] = cur;
                used[cur] = 1;
                cur = de_succ[cur];
            }
            n_faces++;
        }
        face_start[n_faces] = seq;
        /* inner faces: stable len-sort, drop the largest */
        forder = PyMem_Malloc((n_faces + 1) * sizeof(Py_ssize_t));
        ftmp = PyMem_Malloc((n_faces + 1) * sizeof(Py_ssize_t));
        flen = PyMem_Malloc((n_faces + 1) * sizeof(double));
        coords = PyMem_Malloc((2 * (seq + n_faces) + 2) * sizeof(double));
        lens_list = PyList_New(0);
        if (!forder || !ftmp || !flen || !coords || !lens_list) {
            PyErr_NoMemory();
            goto done;
        }
        for (Py_ssize_t i = 0; i < n_faces; i++) {
            forder[i] = i;
            flen[i] = (double)(face_start[i + 1] - face_start[i]);
        }
        stable_sort_by_key(forder, n_faces, flen, ftmp);
        Py_ssize_t n_inner = n_faces > 0 ? n_faces - 1 : 0;
        Py_ssize_t cpos = 0;
        ebuf2 = PyMem_Malloc((seq + 1) * sizeof(double));
        if (!ebuf2) {
            PyErr_NoMemory();
            goto done;
        }
        for (Py_ssize_t fi = 0; fi < n_inner; fi++) {
            Py_ssize_t f = forder[fi];
            Py_ssize_t s0 = face_start[f], s1 = face_start[f + 1];
            Py_ssize_t flen_ = s1 - s0;
            /* face_area over the closed ring of de_p nodes */
            for (Py_ssize_t t = 0; t < flen_; t++) {
                Py_ssize_t de0 = face_seq[s0 + t];
                Py_ssize_t de1 = face_seq[s0 + (t + 1) % flen_];
                double x0 = L.pos[de_p[de0]].x, y0 = L.pos[de_p[de0]].y;
                double x1 = L.pos[de_p[de1]].x, y1 = L.pos[de_p[de1]].y;
                ebuf2[t] = x0 * y1 - x1 * y0;
            }
            double area = 0.5 * fabs(pw_sum(ebuf2, flen_));
            if (!(area > 0.0))
                continue;
            /* face_centroid (sequential shoelace + sorted-mean fallback) */
            double acc_a2 = 0.0, acc_cx = 0.0, acc_cy = 0.0;
            for (Py_ssize_t t = s0; t < s1; t++) {
                Py_ssize_t de = face_seq[t];
                double x0 = L.pos[de_p[de]].x, y0 = L.pos[de_p[de]].y;
                double x1 = L.pos[de_c[de]].x, y1 = L.pos[de_c[de]].y;
                double cr = x0 * y1 - x1 * y0;
                acc_a2 += cr;
                acc_cx += (x0 + x1) * cr;
                acc_cy += (y0 + y1) * cr;
            }
            double ccx, ccy;
            if (fabs(acc_a2) < 0.02) {
                Py_ssize_t nv = 0;
                Seed *vbuf = PyMem_Malloc(2 * flen_ * sizeof(Seed));
                Seed *vtmp = PyMem_Malloc(2 * flen_ * sizeof(Seed));
                if (!vbuf || !vtmp) {
                    PyMem_Free(vbuf); PyMem_Free(vtmp);
                    PyErr_NoMemory();
                    goto done;
                }
                for (Py_ssize_t t = s0; t < s1; t++) {
                    Py_ssize_t de = face_seq[t];
                    vbuf[nv].k1 = L.pos[de_p[de]].x;
                    vbuf[nv].k2 = L.pos[de_p[de]].y;
                    vbuf[nv].k3 = 0; vbuf[nv].k4 = 0; vbuf[nv].id = 0;
                    nv++;
                    vbuf[nv].k1 = L.pos[de_c[de]].x;
                    vbuf[nv].k2 = L.pos[de_c[de]].y;
                    vbuf[nv].k3 = 0; vbuf[nv].k4 = 0; vbuf[nv].id = 0;
                    nv++;
                }
                seed_sort(vbuf, nv, vtmp);
                double sx = 0.0, sy = 0.0;
                Py_ssize_t cnt = 0;
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    cnt++;
                }
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    sx += vbuf[t].k1;
                }
                for (Py_ssize_t t = 0; t < nv; t++) {
                    if (t > 0 && vbuf[t].k1 == vbuf[t - 1].k1
                        && vbuf[t].k2 == vbuf[t - 1].k2)
                        continue;
                    sy += vbuf[t].k2;
                }
                ccx = sx / (double)cnt;
                ccy = sy / (double)cnt;
                PyMem_Free(vbuf); PyMem_Free(vtmp);
            } else {
                double a6 = 3.0 * acc_a2;
                ccx = acc_cx / a6;
                ccy = acc_cy / a6;
            }
            if (!pt_in_ring_c(ccx, ccy, rgx, rgy, nrg))
                continue;
            /* emit the closed ring (de_p nodes + first again) */
            for (Py_ssize_t t = s0; t < s1; t++) {
                Py_ssize_t de = face_seq[t];
                coords[cpos++] = L.pos[de_p[de]].x;
                coords[cpos++] = L.pos[de_p[de]].y;
            }
            coords[cpos++] = L.pos[de_p[face_seq[s0]]].x;
            coords[cpos++] = L.pos[de_p[face_seq[s0]]].y;
            PyObject *ln = PyLong_FromSsize_t(flen_ + 1);
            if (!ln || PyList_Append(lens_list, ln) < 0) {
                Py_XDECREF(ln);
                goto done;
            }
            Py_DECREF(ln);
        }
        PyObject *cb = PyBytes_FromStringAndSize((const char *)coords,
                                                 cpos * (Py_ssize_t)sizeof(double));
        if (!cb)
            goto done;
        result = PyTuple_New(2);
        if (!result) {
            Py_DECREF(cb);
            goto done;
        }
        PyTuple_SET_ITEM(result, 0, cb);
        PyTuple_SET_ITEM(result, 1, lens_list);
        lens_list = NULL;
    }
done:
    lvl_free(&G);
    lvl_free(&L);
    PyMem_Free(alive); PyMem_Free(remap);
    PyMem_Free(rot); PyMem_Free(de_succ); PyMem_Free(de_p); PyMem_Free(de_c);
    PyMem_Free(keybuf); PyMem_Free(ordbuf); PyMem_Free(tmpbuf);
    PyMem_Free(seeds); PyMem_Free(stmp); PyMem_Free(used);
    PyMem_Free(face_start); PyMem_Free(face_seq);
    PyMem_Free(forder); PyMem_Free(ftmp); PyMem_Free(flen);
    PyMem_Free(coords); PyMem_Free(ebuf2);
    Py_XDECREF(lens_list);
    if (demap_ok) map2_free(&demap);
    return result;
}

/* assign_nearest(x, n, cents, k, d) -> int64 bytes
 * Per-row argmin_c ||x - cents[c]||^2 — the k-means assignment step of
 * the PQ/IVF trainers.  Bit-exact with the numpy cube
 * ((X[:,None,:]-cents)**2).sum(-1).argmin(1): per (row, cent) the
 * elementwise (x-c)^2 temps reduce via pw_sum (np.sum over the
 * contiguous last axis), and ties/NaNs follow np.argmin (first minimum;
 * a NaN is treated as the minimum when the running best is finite).
 * Releases the GIL for the scan, so the trainer's subspace thread pool
 * gets real parallelism. */
static PyObject *
assign_nearest(PyObject *self, PyObject *args)
{
    Py_buffer xb, cb;
    Py_ssize_t n, k, d;
    if (!PyArg_ParseTuple(args, "y*ny*nn", &xb, &n, &cb, &k, &d))
        return NULL;
    if (d <= 0 || d > 8192 || n < 0 || k <= 0
        || xb.len != n * d * (Py_ssize_t)sizeof(double)
        || cb.len != k * d * (Py_ssize_t)sizeof(double)) {
        PyBuffer_Release(&xb);
        PyBuffer_Release(&cb);
        PyErr_SetString(PyExc_ValueError, "assign_nearest: bad shapes");
        return NULL;
    }
    PyObject *out = PyBytes_FromStringAndSize(NULL,
                                              n * (Py_ssize_t)sizeof(long long));
    if (!out) {
        PyBuffer_Release(&xb);
        PyBuffer_Release(&cb);
        return NULL;
    }
    {
        const double *x = (const double *)xb.buf;
        const double *ce = (const double *)cb.buf;
        long long *op = (long long *)PyBytes_AS_STRING(out);
        double tmp[8192];
        Py_BEGIN_ALLOW_THREADS
        for (Py_ssize_t r = 0; r < n; r++) {
            const double *xr = x + r * d;
            double best = 0.0;
            Py_ssize_t bi = 0;
            for (Py_ssize_t c = 0; c < k; c++) {
                const double *cc = ce + c * d;
                for (Py_ssize_t j = 0; j < d; j++) {
                    double df = xr[j] - cc[j];
                    tmp[j] = df * df;
                }
                double d2 = pw_sum(tmp, d);
                if (c == 0 || d2 < best || (isnan(d2) && !isnan(best))) {
                    best = d2;
                    bi = c;
                }
            }
            op[r] = (long long)bi;
        }
        Py_END_ALLOW_THREADS
    }
    PyBuffer_Release(&xb);
    PyBuffer_Release(&cb);
    return out;
}

/* test hooks for the bit-exactness fuzz suites */
static PyObject *
py_pw_sum(PyObject *self, PyObject *args)
{
    PyObject *xs_o;
    if (!PyArg_ParseTuple(args, "O", &xs_o))
        return NULL;
    if (!PyList_CheckExact(xs_o)) {
        PyErr_SetString(PyExc_TypeError, "expected list");
        return NULL;
    }
    Py_ssize_t n = PyList_GET_SIZE(xs_o);
    double *buf = PyMem_Malloc((n + 1) * sizeof(double));
    if (!buf)
        return PyErr_NoMemory();
    for (Py_ssize_t i = 0; i < n; i++) {
        buf[i] = PyFloat_AsDouble(PyList_GET_ITEM(xs_o, i));
        if (PyErr_Occurred()) {
            PyMem_Free(buf);
            return NULL;
        }
    }
    double s = pw_sum(buf, n);
    PyMem_Free(buf);
    return PyFloat_FromDouble(s);
}

static PyObject *
py_pt_in_ring(PyObject *self, PyObject *args)
{
    PyObject *rx_o, *ry_o;
    double px, py;
    if (!PyArg_ParseTuple(args, "ddOO", &px, &py, &rx_o, &ry_o))
        return NULL;
    static double rx[8192], ry[8192];
    Py_ssize_t n, n2;
    if (!load_list(rx_o, rx, 8192, &n) || !load_list(ry_o, ry, 8192, &n2))
        return NULL;
    return PyLong_FromLong(pt_in_ring_c(px, py, rx, ry, n));
}

static PyObject *
py_hypot2(PyObject *self, PyObject *args)
{
    double a, b;
    if (!PyArg_ParseTuple(args, "dd", &a, &b))
        return NULL;
    return PyFloat_FromDouble(hypot2(a, b));
}

static PyMethodDef Methods[] = {
    {"clip_list", clip_list, METH_VARARGS,
     "Sutherland-Hodgman step over coordinate lists (pre-normalized)"},
    {"voronoi_cell", voronoi_cell, METH_VARARGS,
     "per-site half-plane Voronoi clip loop (pytess/cells modes)"},
    {"clip_convex_small", clip_convex_small, METH_VARARGS,
     "convex S-H clip of a small subject ring"},
    {"cluster_verts", cluster_verts, METH_VARARGS,
     "eps union-find vertex clustering (grid buckets)"},
    {"weak_dual_k", weak_dual_k, METH_VARARGS,
     "weak-dual sequence length (k-index) of a planar graph"},
    {"snap_to_canon", snap_to_canon, METH_VARARGS,
     "snap ring vertices to the first eps-close canonical vertex"},
    {"ring_parts", ring_parts, METH_VARARGS,
     "split a degenerate ring into sub-loops at repeated vertices"},
    {"hypot2", py_hypot2, METH_VARARGS,
     "CPython 3.11 math.hypot port (2 args) for equivalence testing"},
    {"s0_segs", s0_segs, METH_VARARGS,
     "fused per-block s0 construction -> kept-ring segments (float64 bytes)"},
    {"weak_dual_k_segs", weak_dual_k_segs, METH_VARARGS,
     "k-index from noded arrangement pieces (graph build + weak duals)"},
    {"pw_sum", py_pw_sum, METH_VARARGS,
     "numpy pairwise-sum port (equivalence testing)"},
    {"node_pieces", node_pieces, METH_VARARGS,
     "noded arrangement pieces from a segment table (float64 bytes)"},
    {"region_faces", region_faces, METH_VARARGS,
     "polygonize face stage: prune + trace + filter -> kept closed rings"},
    {"pip_ray", pip_ray, METH_VARARGS,
     "bulk point-in-ring (boundary inside) -> uint8 bytes"},
    {"assign_nearest", assign_nearest, METH_VARARGS,
     "k-means assignment (argmin squared distance) -> int64 bytes"},
    {"pt_in_ring", py_pt_in_ring, METH_VARARGS,
     "geom.point_in_ring port (equivalence testing)"},
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
