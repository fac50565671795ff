// Native host-side runtime for lowbit_quant_fa2_paddle_tpu.
//
// The reference implements its performance-critical non-Python layer in
// CUDA/C++ (csrc/qattn, csrc/fused, the KIVI gemv extension). On TPU the
// device kernels are Pallas; the native layer that remains host-side is:
//
//   * bit pack/unpack + quantization for cache/checkpoint serialization and
//     weight preparation (role of csrc/fused quant kernels + new_pack.py's
//     host paths) — vectorizable tight loops over numpy buffers;
//   * a paged-KV page allocator (free-list block manager) for serving —
//     the runtime memory-management piece (role the external serving stack
//     plays for the reference's sglang decode kernel).
//
// Exposed via the raw CPython C API (no pybind11 in this image). The Python
// side (lowbit_quant_fa2_paddle_tpu/host/__init__.py) falls back to numpy
// when the extension is not built.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

// ---------------------------------------------------------------------------
// Buffer helpers
// ---------------------------------------------------------------------------

struct BufView {
  Py_buffer view;
  bool ok = false;
  ~BufView() {
    if (ok) PyBuffer_Release(&view);
  }
};

static bool get_contig(PyObject* obj, BufView* b, const char* fmt_expect,
                       int flags = PyBUF_C_CONTIGUOUS | PyBUF_FORMAT) {
  if (PyObject_GetBuffer(obj, &b->view, flags) != 0) return false;
  b->ok = true;
  if (fmt_expect && b->view.format && strcmp(b->view.format, fmt_expect) != 0) {
    PyErr_Format(PyExc_TypeError, "expected buffer of format '%s', got '%s'",
                 fmt_expect, b->view.format);
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// Packing: halves-of-D int4 / quarters-of-D int2 (matches ops/quant.py)
// ---------------------------------------------------------------------------

// codes int8 [rows, d] -> packed int8 [rows, d/2]
static PyObject* pack_int4(PyObject*, PyObject* args) {
  PyObject* src;
  if (!PyArg_ParseTuple(args, "O", &src)) return nullptr;
  BufView b;
  if (!get_contig(src, &b, "b")) return nullptr;
  if (b.view.ndim != 2) {
    PyErr_SetString(PyExc_ValueError, "expected 2-D codes");
    return nullptr;
  }
  Py_ssize_t rows = b.view.shape[0], d = b.view.shape[1];
  if (d % 2) {
    PyErr_SetString(PyExc_ValueError, "d must be even");
    return nullptr;
  }
  Py_ssize_t dp = d / 2;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, rows * dp);
  if (!out) return nullptr;
  auto* dst = reinterpret_cast<uint8_t*>(PyBytes_AS_STRING(out));
  auto* s = reinterpret_cast<const int8_t*>(b.view.buf);
  for (Py_ssize_t r = 0; r < rows; ++r) {
    const int8_t* row = s + r * d;
    uint8_t* orow = dst + r * dp;
    for (Py_ssize_t i = 0; i < dp; ++i) {
      orow[i] = static_cast<uint8_t>((row[i] & 0xF) | ((row[i + dp] & 0xF) << 4));
    }
  }
  return out;
}

// packed int8 [rows, d/2] -> codes int8 [rows, d] (bytes)
static PyObject* unpack_int4(PyObject*, PyObject* args) {
  PyObject* src;
  if (!PyArg_ParseTuple(args, "O", &src)) return nullptr;
  BufView b;
  if (!get_contig(src, &b, nullptr)) return nullptr;
  if (b.view.ndim != 2) {
    PyErr_SetString(PyExc_ValueError, "expected 2-D packed");
    return nullptr;
  }
  Py_ssize_t rows = b.view.shape[0], dp = b.view.shape[1];
  Py_ssize_t d = dp * 2;
  PyObject* out = PyBytes_FromStringAndSize(nullptr, rows * d);
  if (!out) return nullptr;
  auto* dst = reinterpret_cast<int8_t*>(PyBytes_AS_STRING(out));
  auto* s = reinterpret_cast<const uint8_t*>(b.view.buf);
  for (Py_ssize_t r = 0; r < rows; ++r) {
    const uint8_t* row = s + r * dp;
    int8_t* orow = dst + r * d;
    for (Py_ssize_t i = 0; i < dp; ++i) {
      orow[i] = static_cast<int8_t>(static_cast<int8_t>(row[i] << 4) >> 4);
      orow[i + dp] = static_cast<int8_t>(row[i]) >> 4;
    }
  }
  return out;
}

// float32 [rows, d] -> (codes int8 bytes [rows, d], scales float32 bytes [rows])
static PyObject* quant_int8_per_token(PyObject*, PyObject* args) {
  PyObject* src;
  if (!PyArg_ParseTuple(args, "O", &src)) return nullptr;
  BufView b;
  if (!get_contig(src, &b, "f")) return nullptr;
  if (b.view.ndim != 2) {
    PyErr_SetString(PyExc_ValueError, "expected 2-D float32");
    return nullptr;
  }
  Py_ssize_t rows = b.view.shape[0], d = b.view.shape[1];
  PyObject* codes = PyBytes_FromStringAndSize(nullptr, rows * d);
  PyObject* scales = PyBytes_FromStringAndSize(nullptr, rows * sizeof(float));
  if (!codes || !scales) {
    Py_XDECREF(codes);
    Py_XDECREF(scales);
    return nullptr;
  }
  auto* c = reinterpret_cast<int8_t*>(PyBytes_AS_STRING(codes));
  auto* sc = reinterpret_cast<float*>(PyBytes_AS_STRING(scales));
  auto* x = reinterpret_cast<const float*>(b.view.buf);
  for (Py_ssize_t r = 0; r < rows; ++r) {
    const float* row = x + r * d;
    float amax = 0.f;
    for (Py_ssize_t i = 0; i < d; ++i) amax = std::max(amax, std::fabs(row[i]));
    float scale = amax / 127.0f + 1e-7f;
    sc[r] = scale;
    float inv = 1.0f / scale;
    int8_t* crow = c + r * d;
    for (Py_ssize_t i = 0; i < d; ++i) {
      float v = row[i] * inv;
      // round half away from zero, matching ops/reference.py round_away
      float rv = v >= 0.f ? std::floor(v + 0.5f) : std::ceil(v - 0.5f);
      rv = std::max(-127.f, std::min(127.f, rv));
      crow[i] = static_cast<int8_t>(rv);
    }
  }
  return Py_BuildValue("(NN)", codes, scales);
}

// ---------------------------------------------------------------------------
// Paged-KV page allocator (free-list block manager)
// ---------------------------------------------------------------------------

struct PageAllocator {
  int64_t num_pages;
  std::vector<int32_t> free_list;                 // stack of free page ids
  std::vector<std::vector<int32_t>> seq_pages;    // per-seq page lists
  std::vector<int32_t> free_seq_slots;
};

static void allocator_destroy(PyObject* capsule) {
  delete reinterpret_cast<PageAllocator*>(
      PyCapsule_GetPointer(capsule, "lowbit.PageAllocator"));
}

static PageAllocator* get_alloc(PyObject* capsule) {
  return reinterpret_cast<PageAllocator*>(
      PyCapsule_GetPointer(capsule, "lowbit.PageAllocator"));
}

static PyObject* allocator_new(PyObject*, PyObject* args) {
  long long num_pages;
  if (!PyArg_ParseTuple(args, "L", &num_pages)) return nullptr;
  auto* a = new PageAllocator();
  a->num_pages = num_pages;
  a->free_list.reserve(num_pages);
  for (int64_t i = num_pages - 1; i >= 0; --i)
    a->free_list.push_back(static_cast<int32_t>(i));
  return PyCapsule_New(a, "lowbit.PageAllocator", allocator_destroy);
}

static PyObject* allocator_new_seq(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  auto* a = get_alloc(cap);
  if (!a) return nullptr;
  int32_t sid;
  if (!a->free_seq_slots.empty()) {
    sid = a->free_seq_slots.back();
    a->free_seq_slots.pop_back();
    a->seq_pages[sid].clear();
  } else {
    sid = static_cast<int32_t>(a->seq_pages.size());
    a->seq_pages.emplace_back();
  }
  return PyLong_FromLong(sid);
}

static PyObject* allocator_append_page(PyObject*, PyObject* args) {
  PyObject* cap;
  int sid;
  if (!PyArg_ParseTuple(args, "Oi", &cap, &sid)) return nullptr;
  auto* a = get_alloc(cap);
  if (!a) return nullptr;
  if (sid < 0 || static_cast<size_t>(sid) >= a->seq_pages.size()) {
    PyErr_SetString(PyExc_ValueError, "bad sequence id");
    return nullptr;
  }
  if (a->free_list.empty()) {
    PyErr_SetString(PyExc_MemoryError, "out of KV pages");
    return nullptr;
  }
  int32_t page = a->free_list.back();
  a->free_list.pop_back();
  a->seq_pages[sid].push_back(page);
  return PyLong_FromLong(page);
}

static PyObject* allocator_free_seq(PyObject*, PyObject* args) {
  PyObject* cap;
  int sid;
  if (!PyArg_ParseTuple(args, "Oi", &cap, &sid)) return nullptr;
  auto* a = get_alloc(cap);
  if (!a) return nullptr;
  if (sid < 0 || static_cast<size_t>(sid) >= a->seq_pages.size()) {
    PyErr_SetString(PyExc_ValueError, "bad sequence id");
    return nullptr;
  }
  for (int32_t p : a->seq_pages[sid]) a->free_list.push_back(p);
  a->seq_pages[sid].clear();
  a->free_seq_slots.push_back(sid);
  Py_RETURN_NONE;
}

static PyObject* allocator_seq_pages(PyObject*, PyObject* args) {
  PyObject* cap;
  int sid;
  if (!PyArg_ParseTuple(args, "Oi", &cap, &sid)) return nullptr;
  auto* a = get_alloc(cap);
  if (!a) return nullptr;
  if (sid < 0 || static_cast<size_t>(sid) >= a->seq_pages.size()) {
    PyErr_SetString(PyExc_ValueError, "bad sequence id");
    return nullptr;
  }
  const auto& pages = a->seq_pages[sid];
  PyObject* lst = PyList_New(pages.size());
  for (size_t i = 0; i < pages.size(); ++i)
    PyList_SET_ITEM(lst, i, PyLong_FromLong(pages[i]));
  return lst;
}

static PyObject* allocator_stats(PyObject*, PyObject* args) {
  PyObject* cap;
  if (!PyArg_ParseTuple(args, "O", &cap)) return nullptr;
  auto* a = get_alloc(cap);
  if (!a) return nullptr;
  return Py_BuildValue(
      "{s:L,s:n,s:n}", "num_pages", static_cast<long long>(a->num_pages),
      "free_pages", static_cast<Py_ssize_t>(a->free_list.size()),
      "num_seqs",
      static_cast<Py_ssize_t>(a->seq_pages.size() - a->free_seq_slots.size()));
}

// ---------------------------------------------------------------------------

static PyMethodDef Methods[] = {
    {"pack_int4", pack_int4, METH_VARARGS,
     "pack int8 codes [rows,d] into halves-of-D nibbles -> bytes [rows,d/2]"},
    {"unpack_int4", unpack_int4, METH_VARARGS,
     "unpack halves-of-D nibbles -> int8 codes bytes [rows,d]"},
    {"quant_int8_per_token", quant_int8_per_token, METH_VARARGS,
     "per-token symmetric int8 quant of float32 [rows,d] -> (codes, scales)"},
    {"allocator_new", allocator_new, METH_VARARGS, "create page allocator"},
    {"allocator_new_seq", allocator_new_seq, METH_VARARGS, "register sequence"},
    {"allocator_append_page", allocator_append_page, METH_VARARGS,
     "allocate one page to a sequence"},
    {"allocator_free_seq", allocator_free_seq, METH_VARARGS,
     "release a sequence's pages"},
    {"allocator_seq_pages", allocator_seq_pages, METH_VARARGS,
     "page table of a sequence"},
    {"allocator_stats", allocator_stats, METH_VARARGS, "allocator stats"},
    {nullptr, nullptr, 0, nullptr}};

static struct PyModuleDef moduledef = {
    PyModuleDef_HEAD_INIT, "_lowbit_host",
    "native host runtime: bit packing, quantization, KV page allocator",
    -1, Methods};

}  // namespace

PyMODINIT_FUNC PyInit__lowbit_host(void) { return PyModule_Create(&moduledef); }
