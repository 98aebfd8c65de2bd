// Native host-side hot ops for the threaded data loader.
//
// The loader (gkgnet_tpu/data/loader.py) is thread-based; numpy's
// normalize/stack ufuncs hold the GIL, which serializes the decode+augment
// workers. These C++ implementations release the GIL for the whole batch
// (Py_BEGIN_ALLOW_THREADS) and fan out over std::thread, so host image prep
// scales with cores — the TPU-native replacement for the reference's
// multi-process torch DataLoader workers (datasets/builder.py:94-161).
//
// Exposed via the CPython C API (no pybind11 in the image):
//   normalize_u8(src: uint8 C-contig (..., 3), mean: float[3], std: float[3],
//                out: float32 same shape) -> None
//   collate_normalize(srcs: list[uint8 (H, W, 3)], mean, std,
//                     out: float32 (B, H, W, 3)) -> None

#define PY_SSIZE_T_CLEAN
#include <Python.h>

#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct NormJob {
  const uint8_t* src;
  float* dst;
  Py_ssize_t n_pix;  // number of 3-channel pixels
  float mean[3];
  float inv_std[3];
};

void run_norm(const NormJob& job, Py_ssize_t begin, Py_ssize_t end) {
  const uint8_t* s = job.src + begin * 3;
  float* d = job.dst + begin * 3;
  const float m0 = job.mean[0], m1 = job.mean[1], m2 = job.mean[2];
  const float i0 = job.inv_std[0], i1 = job.inv_std[1], i2 = job.inv_std[2];
  for (Py_ssize_t p = begin; p < end; ++p) {
    d[0] = (static_cast<float>(s[0]) - m0) * i0;
    d[1] = (static_cast<float>(s[1]) - m1) * i1;
    d[2] = (static_cast<float>(s[2]) - m2) * i2;
    s += 3;
    d += 3;
  }
}

void run_norm_parallel(const NormJob& job, int max_threads) {
  const Py_ssize_t kMinPerThread = 1 << 16;
  int n_threads = static_cast<int>(
      std::min<Py_ssize_t>(max_threads, job.n_pix / kMinPerThread + 1));
  if (n_threads <= 1) {
    run_norm(job, 0, job.n_pix);
    return;
  }
  std::vector<std::thread> threads;
  Py_ssize_t chunk = (job.n_pix + n_threads - 1) / n_threads;
  for (int t = 0; t < n_threads; ++t) {
    Py_ssize_t b = t * chunk;
    Py_ssize_t e = std::min<Py_ssize_t>(b + chunk, job.n_pix);
    if (b >= e) break;
    threads.emplace_back(run_norm, std::cref(job), b, e);
  }
  for (auto& th : threads) th.join();
}

bool parse_vec3(PyObject* obj, float out[3]) {
  PyObject* seq = PySequence_Fast(obj, "expected a length-3 sequence");
  if (!seq) return false;
  if (PySequence_Fast_GET_SIZE(seq) != 3) {
    Py_DECREF(seq);
    PyErr_SetString(PyExc_ValueError, "expected length-3 sequence");
    return false;
  }
  for (int i = 0; i < 3; ++i) {
    out[i] = static_cast<float>(
        PyFloat_AsDouble(PySequence_Fast_GET_ITEM(seq, i)));
  }
  Py_DECREF(seq);
  return !PyErr_Occurred();
}

bool get_buffer(PyObject* obj, Py_buffer* view, int flags, const char* what) {
  if (PyObject_GetBuffer(obj, view, flags) != 0) {
    PyErr_Format(PyExc_TypeError, "%s: buffer protocol failed", what);
    return false;
  }
  return true;
}

PyObject* normalize_u8(PyObject*, PyObject* args) {
  PyObject *src_obj, *mean_obj, *std_obj, *out_obj;
  if (!PyArg_ParseTuple(args, "OOOO", &src_obj, &mean_obj, &std_obj, &out_obj))
    return nullptr;

  float mean[3], stdv[3];
  if (!parse_vec3(mean_obj, mean) || !parse_vec3(std_obj, stdv)) return nullptr;

  Py_buffer src, out;
  if (!get_buffer(src_obj, &src, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT, "src"))
    return nullptr;
  if (!get_buffer(out_obj, &out,
                  PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_FORMAT, "out")) {
    PyBuffer_Release(&src);
    return nullptr;
  }
  if (src.itemsize != 1 || out.itemsize != 4 ||
      src.len * 4 != out.len || src.len % 3 != 0) {
    PyBuffer_Release(&src);
    PyBuffer_Release(&out);
    PyErr_SetString(PyExc_ValueError,
                    "src must be uint8 (...,3), out float32 of same shape");
    return nullptr;
  }

  NormJob job;
  job.src = static_cast<const uint8_t*>(src.buf);
  job.dst = static_cast<float*>(out.buf);
  job.n_pix = src.len / 3;
  for (int i = 0; i < 3; ++i) {
    job.mean[i] = mean[i];
    job.inv_std[i] = 1.0f / stdv[i];
  }

  Py_BEGIN_ALLOW_THREADS
  run_norm_parallel(job, static_cast<int>(std::thread::hardware_concurrency()));
  Py_END_ALLOW_THREADS

  PyBuffer_Release(&src);
  PyBuffer_Release(&out);
  Py_RETURN_NONE;
}

PyObject* collate_normalize(PyObject*, PyObject* args) {
  PyObject *list_obj, *mean_obj, *std_obj, *out_obj;
  if (!PyArg_ParseTuple(args, "OOOO", &list_obj, &mean_obj, &std_obj,
                        &out_obj))
    return nullptr;

  float mean[3], stdv[3];
  if (!parse_vec3(mean_obj, mean) || !parse_vec3(std_obj, stdv)) return nullptr;

  PyObject* seq = PySequence_Fast(list_obj, "expected a list of arrays");
  if (!seq) return nullptr;
  Py_ssize_t batch = PySequence_Fast_GET_SIZE(seq);

  Py_buffer out;
  if (!get_buffer(out_obj, &out,
                  PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_FORMAT, "out")) {
    Py_DECREF(seq);
    return nullptr;
  }
  Py_ssize_t per_sample_bytes = batch ? out.len / batch : 0;
  Py_ssize_t per_sample_pix = per_sample_bytes / 4 / 3;

  std::vector<Py_buffer> views(batch);
  std::vector<NormJob> jobs(batch);
  bool ok = true;
  Py_ssize_t acquired = 0;
  for (Py_ssize_t b = 0; b < batch && ok; ++b) {
    PyObject* item = PySequence_Fast_GET_ITEM(seq, b);
    if (!get_buffer(item, &views[b], PyBUF_C_CONTIGUOUS | PyBUF_FORMAT,
                    "sample")) {
      ok = false;
      break;
    }
    ++acquired;
    if (views[b].itemsize != 1 || views[b].len != per_sample_pix * 3) {
      PyErr_SetString(PyExc_ValueError, "sample shape/dtype mismatch vs out");
      ok = false;
      break;
    }
    jobs[b].src = static_cast<const uint8_t*>(views[b].buf);
    jobs[b].dst = static_cast<float*>(out.buf) + b * per_sample_pix * 3;
    jobs[b].n_pix = per_sample_pix;
    for (int i = 0; i < 3; ++i) {
      jobs[b].mean[i] = mean[i];
      jobs[b].inv_std[i] = 1.0f / stdv[i];
    }
  }

  if (ok) {
    Py_BEGIN_ALLOW_THREADS
    int hw = static_cast<int>(std::thread::hardware_concurrency());
    int per_sample_threads = std::max(1, hw / std::max<int>(1, (int)batch));
    std::vector<std::thread> workers;
    for (Py_ssize_t b = 0; b < batch; ++b) {
      workers.emplace_back(
          [&jobs, b, per_sample_threads] {
            run_norm_parallel(jobs[b], per_sample_threads);
          });
    }
    for (auto& w : workers) w.join();
    Py_END_ALLOW_THREADS
  }

  for (Py_ssize_t b = 0; b < acquired; ++b) PyBuffer_Release(&views[b]);
  PyBuffer_Release(&out);
  Py_DECREF(seq);
  if (!ok) return nullptr;
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"normalize_u8", normalize_u8, METH_VARARGS,
     "GIL-free uint8 (...,3) -> normalized float32"},
    {"collate_normalize", collate_normalize, METH_VARARGS,
     "GIL-free fused stack+normalize of a list of HWC uint8 images"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fastops",
    "Native host-side batch prep (GIL-free, multithreaded)", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastops() { return PyModule_Create(&kModule); }
