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

// mix_chain: the CropMixup blend recursion in one GIL-free pass chain.
//
//   mix_chain(views: list[uint8 (H, W, 3) C-contig], plan: list[(lam,
//             perm_side, p0, p1, p2)], out: uint8 (H, W, 3)) -> None
//
// buf = float(views[0]); for each pass i (view = views[i+1]):
//   perm_side 0: buf = lam*buf + (1-lam)*view
//   perm_side 1: buf = lam*buf + (1-lam)*view[..., perm]
//   perm_side 2: buf = lam*buf[..., perm] + (1-lam)*view
// out = uint8(clip(buf, 0, 255))  (truncating cast, numpy semantics).
//
// Replaces the numpy chain in data/pipelines.py CropMixup, which paid a
// float32 /255 conversion per view plus 2-3 full-image numpy temporaries
// per blend pass under the GIL (measured 54% of the per-sample host cost;
// tools/profile_loader.py).
PyObject* mix_chain(PyObject*, PyObject* args) {
  PyObject *views_obj, *plan_obj, *out_obj;
  if (!PyArg_ParseTuple(args, "OOO", &views_obj, &plan_obj, &out_obj))
    return nullptr;

  PyObject* views = PySequence_Fast(views_obj, "views must be a sequence");
  if (!views) return nullptr;
  PyObject* plan = PySequence_Fast(plan_obj, "plan must be a sequence");
  if (!plan) {
    Py_DECREF(views);
    return nullptr;
  }
  Py_ssize_t n_views = PySequence_Fast_GET_SIZE(views);
  Py_ssize_t n_pass = PySequence_Fast_GET_SIZE(plan);
  bool ok = n_views >= 1 && n_pass == n_views - 1;
  if (!ok) PyErr_SetString(PyExc_ValueError, "need len(plan) == len(views)-1");

  struct Pass {
    float lam;
    int side;
    int perm[3];
  };
  std::vector<Pass> passes(ok ? n_pass : 0);
  for (Py_ssize_t i = 0; ok && i < n_pass; ++i) {
    PyObject* item = PySequence_Fast_GET_ITEM(plan, i);
    PyObject* t = PySequence_Fast(item, "plan entries must be sequences");
    if (!t || PySequence_Fast_GET_SIZE(t) != 5) {
      Py_XDECREF(t);
      PyErr_SetString(PyExc_ValueError, "plan entry must be length-5");
      ok = false;
      break;
    }
    passes[i].lam =
        static_cast<float>(PyFloat_AsDouble(PySequence_Fast_GET_ITEM(t, 0)));
    passes[i].side =
        static_cast<int>(PyLong_AsLong(PySequence_Fast_GET_ITEM(t, 1)));
    for (int c = 0; c < 3; ++c)
      passes[i].perm[c] =
          static_cast<int>(PyLong_AsLong(PySequence_Fast_GET_ITEM(t, 2 + c)));
    Py_DECREF(t);
    if (PyErr_Occurred()) ok = false;
  }

  Py_buffer out;
  out.buf = nullptr;
  std::vector<Py_buffer> vb(ok ? n_views : 0);
  Py_ssize_t acquired = 0;
  Py_ssize_t len = 0;
  if (ok && !get_buffer(out_obj, &out,
                        PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_FORMAT,
                        "out"))
    ok = false;
  if (ok) {
    len = out.len;
    for (Py_ssize_t i = 0; i < n_views && ok; ++i) {
      PyObject* item = PySequence_Fast_GET_ITEM(views, i);
      if (!get_buffer(item, &vb[i], PyBUF_C_CONTIGUOUS | PyBUF_FORMAT,
                      "view")) {
        ok = false;
        break;
      }
      ++acquired;
      if (vb[i].itemsize != 1 || vb[i].len != len || len % 3 != 0) {
        PyErr_SetString(PyExc_ValueError, "views must be uint8, same shape");
        ok = false;
      }
    }
  }

  if (ok) {
    Py_BEGIN_ALLOW_THREADS
    const Py_ssize_t n_pix = len / 3;
    std::vector<float> buf(static_cast<size_t>(len));
    {
      const uint8_t* s = static_cast<const uint8_t*>(vb[0].buf);
      for (Py_ssize_t j = 0; j < len; ++j) buf[j] = static_cast<float>(s[j]);
    }
    for (Py_ssize_t i = 0; i < n_pass; ++i) {
      const Pass& ps = passes[i];
      const uint8_t* v = static_cast<const uint8_t*>(vb[i + 1].buf);
      const float lam = ps.lam, inv = 1.0f - ps.lam;
      float* b = buf.data();
      if (ps.side == 0) {
        for (Py_ssize_t j = 0; j < len; ++j)
          b[j] = lam * b[j] + inv * static_cast<float>(v[j]);
      } else if (ps.side == 1) {
        const int p0 = ps.perm[0], p1 = ps.perm[1], p2 = ps.perm[2];
        const uint8_t* s = v;
        for (Py_ssize_t p = 0; p < n_pix; ++p, b += 3, s += 3) {
          b[0] = lam * b[0] + inv * static_cast<float>(s[p0]);
          b[1] = lam * b[1] + inv * static_cast<float>(s[p1]);
          b[2] = lam * b[2] + inv * static_cast<float>(s[p2]);
        }
      } else {
        const int p0 = ps.perm[0], p1 = ps.perm[1], p2 = ps.perm[2];
        const uint8_t* s = v;
        for (Py_ssize_t p = 0; p < n_pix; ++p, b += 3, s += 3) {
          const float b0 = b[p0], b1 = b[p1], b2 = b[p2];
          b[0] = lam * b0 + inv * static_cast<float>(s[0]);
          b[1] = lam * b1 + inv * static_cast<float>(s[1]);
          b[2] = lam * b2 + inv * static_cast<float>(s[2]);
        }
      }
    }
    uint8_t* d = static_cast<uint8_t*>(out.buf);
    const float* b = buf.data();
    for (Py_ssize_t j = 0; j < len; ++j) {
      float x = b[j];
      x = x < 0.0f ? 0.0f : (x > 255.0f ? 255.0f : x);
      d[j] = static_cast<uint8_t>(x);  // truncate: numpy astype semantics
    }
    Py_END_ALLOW_THREADS
  }

  for (Py_ssize_t i = 0; i < acquired; ++i) PyBuffer_Release(&vb[i]);
  if (out.buf) PyBuffer_Release(&out);
  Py_DECREF(plan);
  Py_DECREF(views);
  if (!ok) return nullptr;
  Py_RETURN_NONE;
}

// color_jitter: brightness/contrast/saturation enhance chain in one
// GIL-free float pass per op (no PIL Image round-trips, no uint8
// intermediates between ops).
//
//   color_jitter(img: uint8 (H, W, 3) C-contig, ops: list[(kind, factor)],
//                out: uint8 same shape) -> None
//   kind 0 = brightness (v *= f)
//   kind 1 = contrast   (v = f*v + (1-f)*mean(L))   [L of current state]
//   kind 2 = saturation (v = f*v + (1-f)*L(pixel))
//
// L = (299 R + 587 G + 114 B) / 1000 (ITU-R 601, PIL "L"). Values clip to
// [0, 255] after every op (mirroring uint8 storage between PIL enhances);
// the final store rounds to nearest. torchvision-style semantics — the
// upstream reference itself uses a third implementation (cv2 LUTs,
// mmcls pipelines/transforms.py ColorJitter), so exact PIL bit-parity is
// not a contract; determinism is (same input + factors -> same output
// on every host and worker mode).
PyObject* color_jitter(PyObject*, PyObject* args) {
  PyObject *img_obj, *ops_obj, *out_obj;
  if (!PyArg_ParseTuple(args, "OOO", &img_obj, &ops_obj, &out_obj))
    return nullptr;

  PyObject* ops = PySequence_Fast(ops_obj, "ops must be a sequence");
  if (!ops) return nullptr;
  Py_ssize_t n_ops = PySequence_Fast_GET_SIZE(ops);
  struct Op {
    int kind;
    float factor;
  };
  std::vector<Op> plan(n_ops);
  bool ok = true;
  for (Py_ssize_t i = 0; i < n_ops && ok; ++i) {
    PyObject* t = PySequence_Fast(PySequence_Fast_GET_ITEM(ops, i),
                                  "op must be (kind, factor)");
    if (!t || PySequence_Fast_GET_SIZE(t) != 2) {
      Py_XDECREF(t);
      PyErr_SetString(PyExc_ValueError, "op must be (kind, factor)");
      ok = false;
      break;
    }
    plan[i].kind = static_cast<int>(PyLong_AsLong(PySequence_Fast_GET_ITEM(t, 0)));
    plan[i].factor =
        static_cast<float>(PyFloat_AsDouble(PySequence_Fast_GET_ITEM(t, 1)));
    Py_DECREF(t);
    if (PyErr_Occurred()) ok = false;
  }

  Py_buffer img, out;
  img.buf = out.buf = nullptr;
  if (ok && !get_buffer(img_obj, &img, PyBUF_C_CONTIGUOUS | PyBUF_FORMAT,
                        "img"))
    ok = false;
  if (ok && !get_buffer(out_obj, &out,
                        PyBUF_C_CONTIGUOUS | PyBUF_WRITABLE | PyBUF_FORMAT,
                        "out")) {
    ok = false;
  }
  if (ok && (img.itemsize != 1 || out.itemsize != 1 || img.len != out.len ||
             img.len % 3 != 0)) {
    PyErr_SetString(PyExc_ValueError, "img/out must be uint8 (H, W, 3)");
    ok = false;
  }

  if (ok) {
    Py_BEGIN_ALLOW_THREADS
    const Py_ssize_t len = img.len;
    const Py_ssize_t n_pix = len / 3;
    const uint8_t* s = static_cast<const uint8_t*>(img.buf);
    std::vector<float> buf(static_cast<size_t>(len));
    for (Py_ssize_t j = 0; j < len; ++j) buf[j] = static_cast<float>(s[j]);
    auto clip = [](float x) {
      return x < 0.0f ? 0.0f : (x > 255.0f ? 255.0f : x);
    };
    for (const Op& op : plan) {
      const float f = op.factor, inv = 1.0f - op.factor;
      float* b = buf.data();
      if (op.kind == 0) {
        for (Py_ssize_t j = 0; j < len; ++j) b[j] = clip(b[j] * f);
      } else if (op.kind == 1) {
        double sum = 0.0;
        const float* p = buf.data();
        for (Py_ssize_t q = 0; q < n_pix; ++q, p += 3)
          sum += (299.0f * p[0] + 587.0f * p[1] + 114.0f * p[2]) * 1e-3f;
        const float mean = static_cast<float>(sum / n_pix);
        const float add = inv * mean;
        for (Py_ssize_t j = 0; j < len; ++j) b[j] = clip(f * b[j] + add);
      } else {
        for (Py_ssize_t q = 0; q < n_pix; ++q, b += 3) {
          const float L =
              (299.0f * b[0] + 587.0f * b[1] + 114.0f * b[2]) * 1e-3f;
          const float add = inv * L;
          b[0] = clip(f * b[0] + add);
          b[1] = clip(f * b[1] + add);
          b[2] = clip(f * b[2] + add);
        }
      }
    }
    uint8_t* d = static_cast<uint8_t*>(out.buf);
    const float* b = buf.data();
    for (Py_ssize_t j = 0; j < len; ++j)
      d[j] = static_cast<uint8_t>(clip(b[j]) + 0.5f);
    Py_END_ALLOW_THREADS
  }

  if (img.buf) PyBuffer_Release(&img);
  if (out.buf) PyBuffer_Release(&out);
  Py_DECREF(ops);
  if (!ok) return nullptr;
  Py_RETURN_NONE;
}

PyMethodDef kMethods[] = {
    {"normalize_u8", normalize_u8, METH_VARARGS,
     "GIL-free uint8 (...,3) -> normalized float32"},
    {"collate_normalize", collate_normalize, METH_VARARGS,
     "GIL-free fused stack+normalize of a list of HWC uint8 images"},
    {"mix_chain", mix_chain, METH_VARARGS,
     "GIL-free CropMixup blend chain over uint8 views"},
    {"color_jitter", color_jitter, METH_VARARGS,
     "GIL-free brightness/contrast/saturation enhance chain"},
    {nullptr, nullptr, 0, nullptr},
};

PyModuleDef kModule = {
    PyModuleDef_HEAD_INIT, "_fastops",
    "Native host-side batch prep (GIL-free, multithreaded)", -1, kMethods,
};

}  // namespace

PyMODINIT_FUNC PyInit__fastops() { return PyModule_Create(&kModule); }
