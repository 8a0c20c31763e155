// Native batch image decoder for the TPU input pipeline.
//
// The reference feeds its trainer through torchvision/PIL transforms inside
// HF-datasets `with_transform` (reference pdm/utils/data_utils.py:60-108) —
// single-threaded Python per worker. TPU hosts have many cores and one
// global interpreter lock; this extension decodes a whole batch of JPEGs in
// a C++ thread pool with the GIL released: libjpeg DCT-scaled decode →
// bilinear resize (shorter side = resolution) → crop (offsets chosen by the
// Python-side RNG, keeping augmentation reproducible) → optional hflip →
// float32 NHWC in [-1, 1].
//
// Python API (module `dpt_native`):
//   decode_batch(items: list[bytes], resolution: int,
//                fx: list[float], fy: list[float], flip: list[int],
//                num_threads: int) -> (batch: float32 ndarray (N,R,R,3),
//                                      ok:    uint8 ndarray (N,))
// Non-JPEG or corrupt entries get ok=0 and zeros (caller resamples).
#define PY_SSIZE_T_CLEAN
#include <Python.h>
#define NPY_NO_DEPRECATED_API NPY_1_7_API_VERSION
#include <numpy/arrayobject.h>

#include <atomic>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>

namespace {

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG into an RGB8 buffer, DCT-scaled so min(w,h) stays >= target
// (libjpeg can produce 1/2, 1/4, 1/8 scales nearly for free).
bool decode_jpeg(const uint8_t* data, size_t len, int target,
                 std::vector<uint8_t>* out, int* w, int* h) {
  if (len < 3 || data[0] != 0xFF || data[1] != 0xD8) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data), len);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  // pick the largest downscale that keeps the shorter side >= target
  int denom = 1;
  const int short_side = cinfo.image_width < cinfo.image_height
                             ? cinfo.image_width : cinfo.image_height;
  while (denom < 8 && short_side / (denom * 2) >= target) denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// Bilinear resize shorter-side->res, crop at (fx, fy), optional hflip,
// normalize to [-1, 1] float32.
void resize_crop_normalize(const uint8_t* src, int w, int h, int res,
                           double fx, double fy, bool flip, float* dst) {
  const double scale = static_cast<double>(res) / (w < h ? w : h);
  const int rw = w * scale < res ? res : static_cast<int>(w * scale + 0.5);
  const int rh = h * scale < res ? res : static_cast<int>(h * scale + 0.5);
  const int x0 = static_cast<int>(fx * (rw - res));
  const int y0 = static_cast<int>(fy * (rh - res));
  const double sx = static_cast<double>(w) / rw;
  const double sy = static_cast<double>(h) / rh;
  for (int y = 0; y < res; ++y) {
    const double syf = (y + y0 + 0.5) * sy - 0.5;
    int yi = static_cast<int>(syf);
    double wy = syf - yi;
    if (yi < 0) { yi = 0; wy = 0.0; }
    if (yi >= h - 1) { yi = h - 2 < 0 ? 0 : h - 2; wy = 1.0; }
    const int yi1 = yi + 1 < h ? yi + 1 : yi;
    for (int x = 0; x < res; ++x) {
      const double sxf = (x + x0 + 0.5) * sx - 0.5;
      int xi = static_cast<int>(sxf);
      double wx = sxf - xi;
      if (xi < 0) { xi = 0; wx = 0.0; }
      if (xi >= w - 1) { xi = w - 2 < 0 ? 0 : w - 2; wx = 1.0; }
      const int xi1 = xi + 1 < w ? xi + 1 : xi;
      const int ox = flip ? (res - 1 - x) : x;
      float* px = dst + (static_cast<size_t>(y) * res + ox) * 3;
      for (int c = 0; c < 3; ++c) {
        const double v00 = src[(static_cast<size_t>(yi) * w + xi) * 3 + c];
        const double v01 = src[(static_cast<size_t>(yi) * w + xi1) * 3 + c];
        const double v10 = src[(static_cast<size_t>(yi1) * w + xi) * 3 + c];
        const double v11 = src[(static_cast<size_t>(yi1) * w + xi1) * 3 + c];
        const double v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                         v10 * wy * (1 - wx) + v11 * wy * wx;
        px[c] = static_cast<float>(v / 127.5 - 1.0);
      }
    }
  }
}

struct Item {
  const uint8_t* data;
  size_t len;
  double fx, fy;
  bool flip;
};

PyObject* decode_batch(PyObject*, PyObject* args) {
  PyObject *list, *fx_list, *fy_list, *flip_list;
  int resolution, num_threads;
  if (!PyArg_ParseTuple(args, "O!iO!O!O!i", &PyList_Type, &list, &resolution,
                        &PyList_Type, &fx_list, &PyList_Type, &fy_list,
                        &PyList_Type, &flip_list, &num_threads))
    return nullptr;
  const Py_ssize_t n = PyList_Size(list);
  if (PyList_Size(fx_list) != n || PyList_Size(fy_list) != n ||
      PyList_Size(flip_list) != n) {
    PyErr_SetString(PyExc_ValueError, "length mismatch");
    return nullptr;
  }
  std::vector<Item> items(n);
  for (Py_ssize_t i = 0; i < n; ++i) {
    PyObject* b = PyList_GetItem(list, i);
    if (!PyBytes_Check(b)) {
      PyErr_SetString(PyExc_TypeError, "items must be bytes");
      return nullptr;
    }
    items[i].data = reinterpret_cast<const uint8_t*>(PyBytes_AsString(b));
    items[i].len = PyBytes_Size(b);
    items[i].fx = PyFloat_AsDouble(PyList_GetItem(fx_list, i));
    items[i].fy = PyFloat_AsDouble(PyList_GetItem(fy_list, i));
    items[i].flip = PyLong_AsLong(PyList_GetItem(flip_list, i)) != 0;
  }
  npy_intp dims[4] = {n, resolution, resolution, 3};
  PyObject* batch = PyArray_ZEROS(4, dims, NPY_FLOAT32, 0);
  npy_intp odims[1] = {n};
  PyObject* ok = PyArray_ZEROS(1, odims, NPY_UINT8, 0);
  if (!batch || !ok) return nullptr;
  float* out = static_cast<float*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(batch)));
  uint8_t* okp = static_cast<uint8_t*>(PyArray_DATA(reinterpret_cast<PyArrayObject*>(ok)));
  const size_t stride = static_cast<size_t>(resolution) * resolution * 3;

  Py_BEGIN_ALLOW_THREADS
  std::atomic<Py_ssize_t> next(0);
  const int nt = num_threads > 0 ? num_threads
                                 : static_cast<int>(std::thread::hardware_concurrency());
  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    for (;;) {
      const Py_ssize_t i = next.fetch_add(1);
      if (i >= n) break;
      int w = 0, h = 0;
      if (decode_jpeg(items[i].data, items[i].len, resolution, &rgb, &w, &h)) {
        resize_crop_normalize(rgb.data(), w, h, resolution, items[i].fx,
                              items[i].fy, items[i].flip, out + i * stride);
        okp[i] = 1;
      }
    }
  };
  std::vector<std::thread> threads;
  for (int t = 1; t < nt; ++t) threads.emplace_back(worker);
  worker();
  for (auto& t : threads) t.join();
  Py_END_ALLOW_THREADS

  return PyTuple_Pack(2, batch, ok);
}

PyMethodDef methods[] = {
    {"decode_batch", decode_batch, METH_VARARGS,
     "decode_batch(items, resolution, fx, fy, flip, num_threads) -> (batch, ok)"},
    {nullptr, nullptr, 0, nullptr}};

PyModuleDef module = {PyModuleDef_HEAD_INIT, "dpt_native",
                      "native batch image decoder", -1, methods};

}  // namespace

PyMODINIT_FUNC PyInit_dpt_native(void) {
  import_array();
  return PyModule_Create(&module);
}
