/* Native host-runtime ops for the TPU stereo framework.
 *
 * The reference runs its runtime in C on the Cortex-A9 (frame buffers,
 * fixed-point colour conversion, and the SGM post-processing loops).  On a
 * TPU host the device compute lives in XLA/Pallas, but the host data plane
 * still wants native speed; this extension provides:
 *
 *   gray_from_bgr_planes : fixed-point luma over channel-planar frames
 *                          (the firmware's (wr*R+wg*G+wb*B)>>8,
 *                          ZedBoard .../stereo_matching.c:13-32 semantics)
 *   median3x3_inplace    : the reference's sequential in-place 3x3 median
 *                          (SemiGlobalMatching.c:496-557 call pattern) —
 *                          used by the oracle/golden tooling
 *   speckle_filter       : BFS connected-component speckle removal with
 *                          the reference's pairwise |dd|<=diff predicate
 *                          (SemiGlobalMatching.c:585-642 semantics)
 *
 * Plain CPython C API + buffer protocol; no numpy headers needed.
 */

#define PY_SSIZE_T_CLEAN
#include <Python.h>
#include <math.h>
#include <stdint.h>
#include <stdlib.h>
#include <string.h>

/* --------------------------------------------------------------------- */

static int get_buffer(PyObject* obj, Py_buffer* view, int writable,
                      const char* name)
{
    int flags = PyBUF_C_CONTIGUOUS | (writable ? PyBUF_WRITABLE : PyBUF_SIMPLE);
    if (PyObject_GetBuffer(obj, view, flags) != 0) {
        PyErr_Format(PyExc_TypeError, "%s must be a C-contiguous buffer", name);
        return -1;
    }
    return 0;
}

/* gray_from_bgr_planes(src, h, w, wr, wg, wb, out) */
static PyObject* gray_from_bgr_planes(PyObject* self, PyObject* args)
{
    PyObject *src_obj, *out_obj;
    Py_ssize_t h, w;
    long wr, wg, wb;
    if (!PyArg_ParseTuple(args, "OnnlllO", &src_obj, &h, &w, &wr, &wg, &wb,
                          &out_obj))
        return NULL;

    Py_buffer src, out;
    if (get_buffer(src_obj, &src, 0, "src") != 0) return NULL;
    if (get_buffer(out_obj, &out, 1, "out") != 0) {
        PyBuffer_Release(&src);
        return NULL;
    }
    if (src.len < 3 * h * w || out.len < h * w) {
        PyErr_SetString(PyExc_ValueError, "buffer sizes do not match h*w");
        PyBuffer_Release(&src); PyBuffer_Release(&out);
        return NULL;
    }

    const uint8_t* b = (const uint8_t*)src.buf;            /* plane 0: B */
    const uint8_t* g = b + (size_t)h * w;                  /* plane 1: G */
    const uint8_t* r = g + (size_t)h * w;                  /* plane 2: R */
    uint8_t* dst = (uint8_t*)out.buf;

    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 0; i < h * w; i++) {
        dst[i] = (uint8_t)(((long)wr * r[i] + (long)wg * g[i] +
                            (long)wb * b[i]) >> 8);
    }
    Py_END_ALLOW_THREADS

    PyBuffer_Release(&src); PyBuffer_Release(&out);
    Py_RETURN_NONE;
}

/* --------------------------------------------------------------------- */

static float median9(float v[9])
{
    /* partial insertion sort keeping the smallest five: s[4] is the median */
    float s[5];
    int filled = 0;
    for (int k = 0; k < 9; k++) {
        float x = v[k];
        if (filled < 5) {
            int i = filled - 1;
            while (i >= 0 && s[i] > x) { s[i + 1] = s[i]; i--; }
            s[i + 1] = x;
            filled++;
        } else if (x < s[4]) {
            int i = 3;
            while (i >= 0 && s[i] > x) { s[i + 1] = s[i]; i--; }
            s[i + 1] = x;
        }
    }
    return s[4];
}

/* median3x3_inplace(buf, h, w) — sequential raster scan, out == in */
static PyObject* median3x3_inplace(PyObject* self, PyObject* args)
{
    PyObject* buf_obj;
    Py_ssize_t h, w;
    if (!PyArg_ParseTuple(args, "Onn", &buf_obj, &h, &w)) return NULL;
    Py_buffer buf;
    if (get_buffer(buf_obj, &buf, 1, "buf") != 0) return NULL;
    if (buf.len < (Py_ssize_t)(h * w * sizeof(float))) {
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        PyBuffer_Release(&buf);
        return NULL;
    }
    float* d = (float*)buf.buf;
    Py_BEGIN_ALLOW_THREADS
    for (Py_ssize_t i = 1; i < h - 1; i++) {
        for (Py_ssize_t j = 1; j < w - 1; j++) {
            float win[9] = {
                d[(i - 1) * w + j - 1], d[(i - 1) * w + j], d[(i - 1) * w + j + 1],
                d[i * w + j - 1],       d[i * w + j],       d[i * w + j + 1],
                d[(i + 1) * w + j - 1], d[(i + 1) * w + j], d[(i + 1) * w + j + 1],
            };
            d[i * w + j] = median9(win);
        }
    }
    Py_END_ALLOW_THREADS
    PyBuffer_Release(&buf);
    Py_RETURN_NONE;
}

/* --------------------------------------------------------------------- */

/* speckle_filter(buf, h, w, diff, min_area) — in place, invalid = +inf */
static PyObject* speckle_filter(PyObject* self, PyObject* args)
{
    PyObject* buf_obj;
    Py_ssize_t h, w;
    double diff;
    long min_area;
    if (!PyArg_ParseTuple(args, "Onndl", &buf_obj, &h, &w, &diff, &min_area))
        return NULL;
    Py_buffer buf;
    if (get_buffer(buf_obj, &buf, 1, "buf") != 0) return NULL;
    if (buf.len < (Py_ssize_t)(h * w * sizeof(float))) {
        PyErr_SetString(PyExc_ValueError, "buffer too small");
        PyBuffer_Release(&buf);
        return NULL;
    }
    float* d = (float*)buf.buf;
    const size_t n = (size_t)h * w;
    if (n > (size_t)UINT32_MAX) {
        /* queue entries are uint32 pixel indices; >4G pixels would
         * silently truncate and alias */
        PyErr_SetString(PyExc_ValueError, "image too large (> 2^32 px)");
        PyBuffer_Release(&buf);
        return NULL;
    }
    uint8_t* visited = (uint8_t*)calloc(n, 1);
    uint32_t* queue = (uint32_t*)malloc(n * sizeof(uint32_t));
    if (!visited || !queue) {
        free(visited); free(queue);
        PyBuffer_Release(&buf);
        return PyErr_NoMemory();
    }

    Py_BEGIN_ALLOW_THREADS
    for (size_t p0 = 0; p0 < n; p0++) {
        if (visited[p0] || !isfinite(d[p0])) continue;
        size_t head = 0, size = 0;
        queue[size++] = (uint32_t)p0;
        visited[p0] = 1;
        while (head < size) {
            uint32_t p = queue[head++];
            Py_ssize_t row = p / w, col = p % w;
            float base = d[p];
            for (int dr = -1; dr <= 1; dr++) {
                for (int dc = -1; dc <= 1; dc++) {
                    if (!dr && !dc) continue;
                    Py_ssize_t rr = row + dr, cc = col + dc;
                    if (rr < 0 || rr >= h || cc < 0 || cc >= w) continue;
                    size_t q = (size_t)rr * w + cc;
                    if (!visited[q] && isfinite(d[q]) &&
                        fabs((double)d[q] - (double)base) <= diff) {
                        visited[q] = 1;
                        queue[size++] = (uint32_t)q;
                    }
                }
            }
        }
        if ((long)size < min_area) {
            for (size_t k = 0; k < size; k++) d[queue[k]] = INFINITY;
        }
    }
    Py_END_ALLOW_THREADS

    free(visited); free(queue);
    PyBuffer_Release(&buf);
    Py_RETURN_NONE;
}

/* --------------------------------------------------------------------- */

static PyMethodDef methods[] = {
    {"gray_from_bgr_planes", gray_from_bgr_planes, METH_VARARGS,
     "Fixed-point luma from (3,H,W) planar BGR into (H,W) uint8."},
    {"median3x3_inplace", median3x3_inplace, METH_VARARGS,
     "Reference-exact sequential in-place 3x3 median on float32 (H,W)."},
    {"speckle_filter", speckle_filter, METH_VARARGS,
     "Reference-exact BFS speckle removal on float32 (H,W), in place."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef module = {
    PyModuleDef_HEAD_INIT, "_native",
    "Native host-runtime ops (see module docstring in runtime/native.py)",
    -1, methods,
};

PyMODINIT_FUNC PyInit__native(void) { return PyModule_Create(&module); }
