// CPython extension: fast CBOR value decoder for the hot wire paths.
//
// The framework's CBOR layer (utils/cbor.py) mirrors the reference's
// ciborium/serde_cbor encodings (crates/sezkp-core/src/io.rs,
// crates/sezkp-fold/src/lib.rs:142). Decoding multi-MB fold bundles and
// block files through the recursive pure-Python decoder costs ~2s per
// million values; this extension decodes the same value model natively
// (~50x). The Python layer keeps full behavioral control: anything this
// decoder does not support (tags) raises UnsupportedError and falls back
// to the pure-Python implementation, and all malformed input raises
// ValueError exactly like the Python decoder (the CBOR fuzz corpus in
// tests/test_invariants.py runs against both).
//
// Exposed API:
//   decode_at(data: bytes, pos: int) -> (object, new_pos: int)
//   UnsupportedError (exception type; subclass of ValueError)

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <cmath>

static PyObject *UnsupportedError;

struct Dec {
  const unsigned char *p;
  Py_ssize_t n;
  Py_ssize_t pos;
  int depth;
};

static PyObject *fail(const char *msg) {
  PyErr_SetString(PyExc_ValueError, msg);
  return nullptr;
}

static int need(Dec *d, Py_ssize_t k) {
  if (d->pos + k > d->n) {
    PyErr_SetString(PyExc_ValueError, "CBOR: unexpected end of input");
    return 0;
  }
  return 1;
}

// additional-info field -> unsigned argument value
static int read_uint(Dec *d, unsigned info, uint64_t *out) {
  if (info < 24) {
    *out = info;
    return 1;
  }
  int k;
  switch (info) {
    case 24: k = 1; break;
    case 25: k = 2; break;
    case 26: k = 4; break;
    case 27: k = 8; break;
    default:
      PyErr_Format(PyExc_ValueError, "CBOR: unsupported additional info %u", info);
      return 0;
  }
  if (!need(d, k)) return 0;
  uint64_t v = 0;
  for (int i = 0; i < k; i++) v = (v << 8) | d->p[d->pos++];
  *out = v;
  return 1;
}

static double decode_half(uint16_t h) {
  double sign = (h & 0x8000) ? -1.0 : 1.0;
  unsigned exp = (h >> 10) & 0x1F;
  unsigned frac = h & 0x3FF;
  if (exp == 0) return sign * frac * ldexp(1.0, -24);
  if (exp == 31) return sign * (frac == 0 ? HUGE_VAL : NAN);
  return sign * (frac + 1024.0) * ldexp(1.0, (int)exp - 25);
}

static PyObject *decode(Dec *d);

static PyObject *decode_indefinite_string(Dec *d, unsigned major) {
  // chunks must be definite-length strings of the same major type
  PyObject *parts = PyList_New(0);
  if (!parts) return nullptr;
  for (;;) {
    if (!need(d, 1)) { Py_DECREF(parts); return nullptr; }
    unsigned char ib = d->p[d->pos];
    if (ib == 0xFF) { d->pos++; break; }
    PyObject *chunk = decode(d);
    if (!chunk) { Py_DECREF(parts); return nullptr; }
    int ok = (major == 2) ? PyBytes_Check(chunk) : PyUnicode_Check(chunk);
    if (!ok) {
      Py_DECREF(chunk);
      Py_DECREF(parts);
      return fail(major == 2 ? "CBOR: bad indefinite byte chunk"
                             : "CBOR: bad indefinite text chunk");
    }
    if (PyList_Append(parts, chunk) < 0) {
      Py_DECREF(chunk);
      Py_DECREF(parts);
      return nullptr;
    }
    Py_DECREF(chunk);
  }
  PyObject *sep = (major == 2) ? PyBytes_FromStringAndSize("", 0)
                               : PyUnicode_FromStringAndSize("", 0);
  if (!sep) { Py_DECREF(parts); return nullptr; }
  PyObject *out = (major == 2) ? _PyBytes_Join(sep, parts)
                               : PyUnicode_Join(sep, parts);
  Py_DECREF(sep);
  Py_DECREF(parts);
  return out;
}

static PyObject *decode(Dec *d) {
  if (++d->depth > 512) {
    d->depth--;
    return fail("CBOR: nesting too deep");
  }
  PyObject *result = nullptr;
  if (!need(d, 1)) goto done;
  {
    unsigned char ib = d->p[d->pos++];
    unsigned major = ib >> 5, info = ib & 0x1F;
    switch (major) {
      case 0: {
        uint64_t v;
        if (!read_uint(d, info, &v)) goto done;
        result = PyLong_FromUnsignedLongLong(v);
        break;
      }
      case 1: {
        uint64_t v;
        if (!read_uint(d, info, &v)) goto done;
        if (v < (1ULL << 63)) {
          result = PyLong_FromLongLong(-1 - (long long)v);
        } else {
          PyObject *big = PyLong_FromUnsignedLongLong(v);
          if (!big) goto done;
          PyObject *minus1 = PyLong_FromLong(-1);
          if (!minus1) { Py_DECREF(big); goto done; }
          result = PyNumber_Subtract(minus1, big);
          Py_DECREF(minus1);
          Py_DECREF(big);
        }
        break;
      }
      case 2:
      case 3: {
        if (info == 31) {
          result = decode_indefinite_string(d, major);
          break;
        }
        uint64_t len;
        if (!read_uint(d, info, &len)) goto done;
        if (len > (uint64_t)(d->n - d->pos)) {
          fail("CBOR: unexpected end of input");
          goto done;
        }
        const char *s = (const char *)(d->p + d->pos);
        d->pos += (Py_ssize_t)len;
        result = (major == 2)
                     ? PyBytes_FromStringAndSize(s, (Py_ssize_t)len)
                     : PyUnicode_DecodeUTF8(s, (Py_ssize_t)len, nullptr);
        break;
      }
      case 4: {
        PyObject *lst = PyList_New(0);
        if (!lst) goto done;
        if (info == 31) {
          for (;;) {
            if (!need(d, 1)) { Py_DECREF(lst); goto done; }
            if (d->p[d->pos] == 0xFF) { d->pos++; break; }
            PyObject *item = decode(d);
            if (!item || PyList_Append(lst, item) < 0) {
              Py_XDECREF(item);
              Py_DECREF(lst);
              goto done;
            }
            Py_DECREF(item);
          }
        } else {
          uint64_t len;
          if (!read_uint(d, info, &len)) { Py_DECREF(lst); goto done; }
          // grow incrementally: a malicious definite length fails on input
          // exhaustion instead of a giant allocation (matches Python path)
          for (uint64_t i = 0; i < len; i++) {
            PyObject *item = decode(d);
            if (!item || PyList_Append(lst, item) < 0) {
              Py_XDECREF(item);
              Py_DECREF(lst);
              goto done;
            }
            Py_DECREF(item);
          }
        }
        result = lst;
        break;
      }
      case 5: {
        PyObject *map = PyDict_New();
        if (!map) goto done;
        if (info == 31) {
          for (;;) {
            if (!need(d, 1)) { Py_DECREF(map); goto done; }
            if (d->p[d->pos] == 0xFF) { d->pos++; break; }
            PyObject *k = decode(d);
            if (!k) { Py_DECREF(map); goto done; }
            PyObject *v = decode(d);
            if (!v || PyDict_SetItem(map, k, v) < 0) {
              Py_DECREF(k);
              Py_XDECREF(v);
              Py_DECREF(map);
              goto done;
            }
            Py_DECREF(k);
            Py_DECREF(v);
          }
        } else {
          uint64_t len;
          if (!read_uint(d, info, &len)) { Py_DECREF(map); goto done; }
          for (uint64_t i = 0; i < len; i++) {
            PyObject *k = decode(d);
            if (!k) { Py_DECREF(map); goto done; }
            PyObject *v = decode(d);
            if (!v || PyDict_SetItem(map, k, v) < 0) {
              Py_DECREF(k);
              Py_XDECREF(v);
              Py_DECREF(map);
              goto done;
            }
            Py_DECREF(k);
            Py_DECREF(v);
          }
        }
        result = map;
        break;
      }
      case 6:
        PyErr_SetString(UnsupportedError, "CBOR: tagged value (python fallback)");
        break;
      default: {  // major == 7
        switch (info) {
          case 20: result = Py_NewRef(Py_False); break;
          case 21: result = Py_NewRef(Py_True); break;
          case 22: result = Py_NewRef(Py_None); break;
          case 23: result = Py_NewRef(Py_None); break;  // undefined -> None
          case 25: {
            if (!need(d, 2)) break;
            uint16_t h = (uint16_t)((d->p[d->pos] << 8) | d->p[d->pos + 1]);
            d->pos += 2;
            result = PyFloat_FromDouble(decode_half(h));
            break;
          }
          case 26: {
            if (!need(d, 4)) break;
            uint32_t u = 0;
            for (int i = 0; i < 4; i++) u = (u << 8) | d->p[d->pos++];
            float f;
            memcpy(&f, &u, 4);
            result = PyFloat_FromDouble((double)f);
            break;
          }
          case 27: {
            if (!need(d, 8)) break;
            uint64_t u = 0;
            for (int i = 0; i < 8; i++) u = (u << 8) | d->p[d->pos++];
            double f;
            memcpy(&f, &u, 8);
            result = PyFloat_FromDouble(f);
            break;
          }
          default:
            PyErr_Format(PyExc_ValueError,
                         "CBOR: unsupported simple value info=%u", info);
        }
      }
    }
  }
done:
  d->depth--;
  return result;
}

static PyObject *py_decode_at(PyObject *, PyObject *args) {
  Py_buffer buf;
  Py_ssize_t pos;
  if (!PyArg_ParseTuple(args, "y*n", &buf, &pos)) return nullptr;
  if (pos < 0 || pos > buf.len) {
    PyBuffer_Release(&buf);
    return fail("CBOR: position out of range");
  }
  Dec d{(const unsigned char *)buf.buf, buf.len, pos, 0};
  PyObject *obj = decode(&d);
  PyBuffer_Release(&buf);
  if (!obj) return nullptr;
  PyObject *out = Py_BuildValue("(Nn)", obj, d.pos);
  return out;
}

static PyMethodDef Methods[] = {
    {"decode_at", py_decode_at, METH_VARARGS,
     "decode_at(data, pos) -> (value, new_pos)"},
    {nullptr, nullptr, 0, nullptr},
};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "sezkp_cbor_c", nullptr, -1, Methods,
    nullptr, nullptr, nullptr, nullptr,
};

PyMODINIT_FUNC PyInit_sezkp_cbor_c(void) {
  PyObject *m = PyModule_Create(&moduledef);
  if (!m) return nullptr;
  UnsupportedError =
      PyErr_NewException("sezkp_cbor_c.UnsupportedError", PyExc_ValueError, nullptr);
  if (!UnsupportedError || PyModule_AddObject(m, "UnsupportedError", UnsupportedError) < 0) {
    Py_XDECREF(UnsupportedError);
    Py_DECREF(m);
    return nullptr;
  }
  return m;
}
