/* Native host-side packer for ragged survey data.
 *
 * TPU-native counterpart of the reference's Cython Data container
 * (reference data.pyx:34-147): where the reference accelerates *access*
 * to ragged dict-of-arrays storage (concatenation on __getitem__), the
 * rebuild's device format is padded dense tensors, so the native hot
 * spot moves to the one-time ragged -> padded *packing*. This extension
 * performs the per-site copy loops in C (memcpy per site row block),
 * which matters when packing 10^5+ sites; occuspytial_tpu/data.py falls
 * back to the pure-numpy loop when the extension is not built.
 *
 * Exposed function:
 *   pack_rows(w_list, y_list, w_out, y_out, mask_out)
 *     w_list: list of float32 C-contiguous (v_i, n_alpha) arrays
 *     y_list: list of float32 C-contiguous (v_i,) arrays
 *     w_out:  float32 C-contiguous (n_rows, v_max, n_alpha), zeroed
 *     y_out:  float32 C-contiguous (n_rows, v_max), zeroed
 *     mask_out: bool C-contiguous (n_rows, v_max), zeroed
 */

#define PY_SSIZE_T_CLEAN
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <Python.h>
#include <numpy/arrayobject.h>
#include <cstring>

static PyObject *
pack_rows(PyObject *self, PyObject *args)
{
    PyObject *w_list, *y_list;
    PyArrayObject *w_out, *y_out, *mask_out;
    if (!PyArg_ParseTuple(
            args, "O!O!O!O!O!",
            &PyList_Type, &w_list,
            &PyList_Type, &y_list,
            &PyArray_Type, &w_out,
            &PyArray_Type, &y_out,
            &PyArray_Type, &mask_out)) {
        return NULL;
    }

    Py_ssize_t n_rows = PyList_GET_SIZE(w_list);
    if (PyList_GET_SIZE(y_list) != n_rows) {
        PyErr_SetString(PyExc_ValueError,
                        "w_list and y_list must have equal length");
        return NULL;
    }
    if (PyArray_NDIM(w_out) != 3 || PyArray_NDIM(y_out) != 2 ||
        PyArray_NDIM(mask_out) != 2 ||
        PyArray_TYPE(w_out) != NPY_FLOAT32 ||
        PyArray_TYPE(y_out) != NPY_FLOAT32 ||
        PyArray_TYPE(mask_out) != NPY_BOOL ||
        !PyArray_IS_C_CONTIGUOUS(w_out) ||
        !PyArray_IS_C_CONTIGUOUS(y_out) ||
        !PyArray_IS_C_CONTIGUOUS(mask_out)) {
        PyErr_SetString(PyExc_ValueError,
                        "outputs must be C-contiguous float32/bool with "
                        "ndim 3/2/2");
        return NULL;
    }

    npy_intp v_max = PyArray_DIM(w_out, 1);
    npy_intp n_alpha = PyArray_DIM(w_out, 2);
    if (PyArray_DIM(w_out, 0) < n_rows || PyArray_DIM(y_out, 0) < n_rows ||
        PyArray_DIM(mask_out, 0) < n_rows ||
        PyArray_DIM(y_out, 1) != v_max || PyArray_DIM(mask_out, 1) != v_max) {
        PyErr_SetString(PyExc_ValueError, "output shapes inconsistent");
        return NULL;
    }

    float *wp = (float *)PyArray_DATA(w_out);
    float *yp = (float *)PyArray_DATA(y_out);
    npy_bool *mp = (npy_bool *)PyArray_DATA(mask_out);

    for (Py_ssize_t i = 0; i < n_rows; ++i) {
        /* coerce (dtype conversion + contiguity) in C — this is the
         * per-site cost that dominates the pure-Python loop */
        PyArrayObject *wi = (PyArrayObject *)PyArray_FROMANY(
            PyList_GET_ITEM(w_list, i), NPY_FLOAT32, 2, 2,
            NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED | NPY_ARRAY_FORCECAST);
        if (wi == NULL) return NULL;
        PyArrayObject *yi = (PyArrayObject *)PyArray_FROMANY(
            PyList_GET_ITEM(y_list, i), NPY_FLOAT32, 1, 1,
            NPY_ARRAY_C_CONTIGUOUS | NPY_ARRAY_ALIGNED | NPY_ARRAY_FORCECAST);
        if (yi == NULL) { Py_DECREF(wi); return NULL; }

        npy_intp v = PyArray_DIM(wi, 0);
        int bad = (PyArray_DIM(wi, 1) != n_alpha ||
                   PyArray_DIM(yi, 0) != v || v > v_max);
        if (bad) {
            Py_DECREF(wi);
            Py_DECREF(yi);
            PyErr_Format(PyExc_ValueError,
                         "site %zd: shape mismatch or visits exceed "
                         "v_max", i);
            return NULL;
        }
        memcpy(wp + i * v_max * n_alpha, PyArray_DATA(wi),
               (size_t)v * n_alpha * sizeof(float));
        memcpy(yp + i * v_max, PyArray_DATA(yi),
               (size_t)v * sizeof(float));
        memset(mp + i * v_max, 1, (size_t)v);
        Py_DECREF(wi);
        Py_DECREF(yi);
    }

    Py_RETURN_NONE;
}

static PyMethodDef methods[] = {
    {"pack_rows", pack_rows, METH_VARARGS,
     "Fill padded (rows, v_max, ...) arrays from ragged per-site arrays."},
    {NULL, NULL, 0, NULL},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_packer",
    "Native ragged->padded survey-data packer.", -1, methods,
};

PyMODINIT_FUNC
PyInit__packer(void)
{
    import_array();
    return PyModule_Create(&moduledef);
}
