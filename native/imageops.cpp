// Native image ops for the host data pipeline: libjpeg decode +
// bilinear resize, exposed with a C ABI for ctypes.
//
// The reference's data loading leans on torchvision/PIL C extensions;
// this is the framework's own native decode path
// (utils/native_image.py wraps it, PIL remains the fallback), removing
// the Python-side decode cost from the prefetch workers.
//
// Build: g++ -O3 -shared -fPIC -o libimageops.so imageops.cpp -ljpeg

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

}  // namespace

extern "C" {

// Reads the dimensions of a JPEG in memory. Returns 0 on success.
int jpeg_dims(const uint8_t* data, int64_t len, int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  *w = cinfo.image_width;
  *h = cinfo.image_height;
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Decodes a JPEG in memory into a caller-provided RGB buffer
// (h * w * 3 bytes, row-major). Returns 0 on success, -1 on decode
// error, -2 if the output buffer described by (*w, *h) is too small.
int decode_jpeg(const uint8_t* data, int64_t len, uint8_t* out,
                int* w, int* h) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return -1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  if (static_cast<int>(cinfo.output_width) > *w ||
      static_cast<int>(cinfo.output_height) > *h) {
    jpeg_destroy_decompress(&cinfo);
    return -2;
  }
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  const int stride = cinfo.output_width * 3;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + (int64_t)cinfo.output_scanline * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

// Separable triangle-filter resize with adaptive support — the
// algorithm PIL's BILINEAR uses (antialiased when downscaling, plain
// bilinear when upscaling), so the native path is interchangeable with
// the PIL resize the transforms otherwise use.
namespace {

struct AxisTaps {
  int* bounds;    // [out] first source index per output element
  float* weights; // [out * ksize] normalized weights
  int ksize;
};

AxisTaps build_taps(int in_size, int out_size) {
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = scale < 1.0 ? 1.0 : scale;
  const double support = filterscale;  // triangle filter support = 1
  const int ksize = static_cast<int>(support) * 2 + 2;
  AxisTaps t;
  t.ksize = ksize;
  t.bounds = new int[out_size];
  t.weights = new float[(int64_t)out_size * ksize]();
  for (int i = 0; i < out_size; ++i) {
    const double center = (i + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    double total = 0.0;
    float* w = t.weights + (int64_t)i * ksize;
    for (int x = xmin; x < xmax; ++x) {
      double arg = (x - center + 0.5) / filterscale;
      if (arg < 0) arg = -arg;
      double val = arg < 1.0 ? 1.0 - arg : 0.0;
      w[x - xmin] = static_cast<float>(val);
      total += val;
    }
    if (total > 0) {
      for (int k = 0; k < xmax - xmin; ++k)
        w[k] = static_cast<float>(w[k] / total);
    }
    t.bounds[i] = xmin;
  }
  return t;
}

}  // namespace

void resize_bilinear_u8(const uint8_t* src, int sh, int sw, uint8_t* dst,
                        int dh, int dw) {
  AxisTaps tx = build_taps(sw, dw);
  AxisTaps ty = build_taps(sh, dh);
  // horizontal pass: [sh, dw, 3] float
  float* tmp = new float[(int64_t)sh * dw * 3];
  for (int y = 0; y < sh; ++y) {
    for (int x = 0; x < dw; ++x) {
      const float* w = tx.weights + (int64_t)x * tx.ksize;
      const int x0 = tx.bounds[x];
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < tx.ksize; ++k) {
        const int sxk = x0 + k;
        if (sxk >= sw || w[k] == 0.0f) continue;
        const uint8_t* p = src + ((int64_t)y * sw + sxk) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      float* q = tmp + ((int64_t)y * dw + x) * 3;
      q[0] = acc[0]; q[1] = acc[1]; q[2] = acc[2];
    }
  }
  // vertical pass
  for (int y = 0; y < dh; ++y) {
    const float* w = ty.weights + (int64_t)y * ty.ksize;
    const int y0 = ty.bounds[y];
    for (int x = 0; x < dw; ++x) {
      float acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.ksize; ++k) {
        const int syk = y0 + k;
        if (syk >= sh || w[k] == 0.0f) continue;
        const float* p = tmp + ((int64_t)syk * dw + x) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      uint8_t* q = dst + ((int64_t)y * dw + x) * 3;
      for (int c = 0; c < 3; ++c) {
        float v = acc[c] + 0.5f;
        q[c] = v <= 0 ? 0 : (v >= 255 ? 255 : (uint8_t)v);
      }
    }
  }
  delete[] tmp;
  delete[] tx.bounds;
  delete[] tx.weights;
  delete[] ty.bounds;
  delete[] ty.weights;
}

}  // extern "C"
