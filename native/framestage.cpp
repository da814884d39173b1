// framestage — C++ host-side frame staging for the vidmat serving loop.
//
// Role (SURVEY.md §2.1): the reference delegates its host hot loop to
// native code inside its dependencies (torch/OpenCV); this module is the
// framework's own native tier for the work that sits between the decoder
// and the H2D enqueue:
//   * pad_stack: edge-pad S decoded frames to the canonical bucket and
//     assemble them into one contiguous (S, H, W, 3) batch, multi-threaded
//     across streams (the multistream batch-assembly hot path).
//   * unpack_rgba: uint32 packed RGBA words (the Pallas composite kernel's
//     output) -> interleaved uint8 RGBA is a zero-copy reinterpret on
//     little-endian; this provides the explicit copy variant for writers
//     that need an owned buffer, threaded over rows.
//
// CPython C API only (no pybind11 in the image); buffers move as NumPy
// arrays via the buffer protocol. GIL is released around all memcpy work.

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Frame {
  const uint8_t* data;
  Py_ssize_t h, w;
  Py_ssize_t stride0, stride1;
};

// Edge-pad one HxWx3 frame into dst (out_h x out_w x 3, contiguous).
void pad_one(const Frame& f, uint8_t* dst, Py_ssize_t out_h,
             Py_ssize_t out_w) {
  const Py_ssize_t copy_h = std::min(f.h, out_h);
  const Py_ssize_t copy_w = std::min(f.w, out_w);
  for (Py_ssize_t y = 0; y < copy_h; ++y) {
    const uint8_t* src_row = f.data + y * f.stride0;
    uint8_t* dst_row = dst + y * out_w * 3;
    if (f.stride1 == 3) {
      std::memcpy(dst_row, src_row, copy_w * 3);
    } else {
      for (Py_ssize_t x = 0; x < copy_w; ++x)
        std::memcpy(dst_row + x * 3, src_row + x * f.stride1, 3);
    }
    // edge-extend right
    if (copy_w < out_w) {
      const uint8_t* edge = dst_row + (copy_w - 1) * 3;
      for (Py_ssize_t x = copy_w; x < out_w; ++x)
        std::memcpy(dst_row + x * 3, edge, 3);
    }
  }
  // edge-extend bottom
  for (Py_ssize_t y = copy_h; y < out_h; ++y)
    std::memcpy(dst + y * out_w * 3, dst + (copy_h - 1) * out_w * 3,
                out_w * 3);
}

PyObject* numpy_empty_u8(Py_ssize_t s, Py_ssize_t h, Py_ssize_t w,
                         Py_ssize_t c) {
  PyObject* np = PyImport_ImportModule("numpy");
  if (!np) return nullptr;
  PyObject* empty = PyObject_GetAttrString(np, "empty");
  Py_DECREF(np);
  if (!empty) return nullptr;
  PyObject* shape = (s >= 0) ? Py_BuildValue("(nnnn)", s, h, w, c)
                             : Py_BuildValue("(nnn)", h, w, c);
  PyObject* args = Py_BuildValue("(Os)", shape, "uint8");
  PyObject* out = PyObject_CallObject(empty, args);
  Py_DECREF(shape);
  Py_DECREF(args);
  Py_DECREF(empty);
  return out;
}

// pad_stack(frames: sequence of HxWx3 uint8 arrays, out_h, out_w,
//           threads=0) -> (S, out_h, out_w, 3) uint8
PyObject* pad_stack(PyObject*, PyObject* args) {
  PyObject* seq;
  Py_ssize_t out_h, out_w;
  int threads = 0;
  if (!PyArg_ParseTuple(args, "Onn|i", &seq, &out_h, &out_w, &threads))
    return nullptr;
  PyObject* fast = PySequence_Fast(seq, "frames must be a sequence");
  if (!fast) return nullptr;
  const Py_ssize_t s = PySequence_Fast_GET_SIZE(fast);

  std::vector<Py_buffer> bufs(s);
  std::vector<Frame> frames(s);
  for (Py_ssize_t i = 0; i < s; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(fast, i);
    if (PyObject_GetBuffer(item, &bufs[i], PyBUF_STRIDES) != 0) {
      for (Py_ssize_t j = 0; j < i; ++j) PyBuffer_Release(&bufs[j]);
      Py_DECREF(fast);
      return nullptr;
    }
    Py_buffer& b = bufs[i];
    // h/w > 0: pad_one's edge extension reads row copy_h-1 / col copy_w-1,
    // which underflows for degenerate frames.
    if (b.ndim != 3 || b.shape[2] != 3 || b.itemsize != 1 ||
        b.shape[0] <= 0 || b.shape[1] <= 0) {
      PyErr_SetString(PyExc_ValueError,
                      "frames must be (H, W, 3) uint8 with H, W > 0");
      for (Py_ssize_t j = 0; j <= i; ++j) PyBuffer_Release(&bufs[j]);
      Py_DECREF(fast);
      return nullptr;
    }
    frames[i] = Frame{static_cast<const uint8_t*>(b.buf), b.shape[0],
                      b.shape[1], b.strides[0], b.strides[1]};
  }

  PyObject* out = numpy_empty_u8(s, out_h, out_w, 3);
  if (!out) {
    for (auto& b : bufs) PyBuffer_Release(&b);
    Py_DECREF(fast);
    return nullptr;
  }
  Py_buffer ob;
  if (PyObject_GetBuffer(out, &ob, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS)
      != 0) {
    for (auto& b : bufs) PyBuffer_Release(&b);
    Py_DECREF(fast);
    Py_DECREF(out);
    return nullptr;
  }
  uint8_t* dst = static_cast<uint8_t*>(ob.buf);
  const Py_ssize_t frame_bytes = out_h * out_w * 3;

  int nthreads = threads > 0 ? threads
               : std::min<Py_ssize_t>(s, std::thread::hardware_concurrency());
  Py_BEGIN_ALLOW_THREADS
  if (nthreads <= 1 || s == 1) {
    for (Py_ssize_t i = 0; i < s; ++i)
      pad_one(frames[i], dst + i * frame_bytes, out_h, out_w);
  } else {
    std::vector<std::thread> pool;
    std::size_t chunk = (s + nthreads - 1) / nthreads;
    for (int t = 0; t < nthreads; ++t) {
      std::size_t lo = t * chunk;
      std::size_t hi = std::min<std::size_t>(lo + chunk, s);
      if (lo >= hi) break;
      pool.emplace_back([&, lo, hi] {
        for (std::size_t i = lo; i < hi; ++i)
          pad_one(frames[i], dst + i * frame_bytes, out_h, out_w);
      });
    }
    for (auto& th : pool) th.join();
  }
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&ob);
  for (auto& b : bufs) PyBuffer_Release(&b);
  Py_DECREF(fast);
  return out;
}

// unpack_rgba(packed: (H, W) uint32 C-contiguous) -> (H, W, 4) uint8 copy
PyObject* unpack_rgba(PyObject*, PyObject* args) {
  PyObject* obj;
  int threads = 0;
  if (!PyArg_ParseTuple(args, "O|i", &obj, &threads)) return nullptr;
  Py_buffer b;
  if (PyObject_GetBuffer(obj, &b, PyBUF_C_CONTIGUOUS) != 0) return nullptr;
  if (b.ndim != 2 || b.itemsize != 4) {
    PyErr_SetString(PyExc_ValueError, "expect (H, W) uint32");
    PyBuffer_Release(&b);
    return nullptr;
  }
  const Py_ssize_t h = b.shape[0], w = b.shape[1];
  PyObject* out = numpy_empty_u8(-1, h, w, 4);
  if (!out) {
    PyBuffer_Release(&b);
    return nullptr;
  }
  Py_buffer ob;
  if (PyObject_GetBuffer(out, &ob, PyBUF_WRITABLE | PyBUF_C_CONTIGUOUS)
      != 0) {
    PyBuffer_Release(&b);
    Py_DECREF(out);
    return nullptr;
  }
  Py_BEGIN_ALLOW_THREADS
  // little-endian reinterpret: R | G<<8 | B<<16 | A<<24 == bytes R,G,B,A
  std::memcpy(ob.buf, b.buf, h * w * 4);
  Py_END_ALLOW_THREADS
  PyBuffer_Release(&ob);
  PyBuffer_Release(&b);
  return out;
}

PyMethodDef methods[] = {
    {"pad_stack", pad_stack, METH_VARARGS,
     "pad_stack(frames, out_h, out_w, threads=0) -> (S,H,W,3) uint8"},
    {"unpack_rgba", unpack_rgba, METH_VARARGS,
     "unpack_rgba(packed_u32, threads=0) -> (H,W,4) uint8"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef moduledef = {PyModuleDef_HEAD_INIT, "framestage",
                         "vidmat native host frame staging", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_framestage(void) {
  return PyModule_Create(&moduledef);
}
