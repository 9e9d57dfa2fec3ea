// Native mask ops: run-length encode/decode, area, and IoU computed
// directly on runs (no mask materialization).
//
// This is the framework's native-runtime replacement for the C core of
// pycocotools that the reference evaluation stack depends on
// (reference: data/datasets/evaluation/coco/coco_eval.py RLE paths) and
// for the csrc/cpu helpers.  Exposed with a plain C ABI and loaded via
// ctypes (utils/native.py); the numpy implementation in utils/rle.py is
// the behavioral reference and fallback.
//
// Build: g++ -O3 -shared -fPIC -o libmaskops.so maskops.cpp

#include <cstdint>
#include <cstring>
#include <algorithm>

extern "C" {

// Total foreground area of an RLE (odd-index runs are 1-runs).
int64_t rle_area(const int64_t* counts, int64_t n) {
  int64_t area = 0;
  for (int64_t i = 1; i < n; i += 2) area += counts[i];
  return area;
}

// Decode runs into a column-major uint8 buffer of length `size`.
void rle_decode(const int64_t* counts, int64_t n, uint8_t* out,
                int64_t size) {
  int64_t pos = 0;
  uint8_t val = 0;
  for (int64_t i = 0; i < n && pos < size; ++i) {
    int64_t c = counts[i];
    if (c > size - pos) c = size - pos;
    if (val) memset(out + pos, 1, (size_t)c);
    else memset(out + pos, 0, (size_t)c);
    pos += c;
    val ^= 1;
  }
  if (pos < size) memset(out + pos, 0, (size_t)(size - pos));
}

// Encode a column-major binary buffer into runs; returns the run count
// or -1 if max_out is too small.
int64_t rle_encode(const uint8_t* mask, int64_t size, int64_t* out,
                   int64_t max_out) {
  int64_t n = 0;
  uint8_t cur = 0;
  int64_t run = 0;
  for (int64_t i = 0; i < size; ++i) {
    uint8_t v = mask[i] ? 1 : 0;
    if (v == cur) {
      ++run;
    } else {
      if (n >= max_out) return -1;
      out[n++] = run;
      cur = v;
      run = 1;
    }
  }
  if (n >= max_out) return -1;
  out[n++] = run;
  return n;
}

// Intersection of two run-length streams over the same domain,
// computed by merging runs — O(na + nb), never touching pixels.
static int64_t rle_intersection(const int64_t* a, int64_t na,
                                const int64_t* b, int64_t nb) {
  int64_t ia = 0, ib = 0;
  int64_t ra = na > 0 ? a[0] : 0;  // remaining in current a-run
  int64_t rb = nb > 0 ? b[0] : 0;
  uint8_t va = 0, vb = 0;  // run values (start with zeros-run)
  int64_t inter = 0;
  while (ia < na && ib < nb) {
    // advance past empty runs
    while (ia < na && ra == 0) {
      ++ia;
      va ^= 1;
      if (ia < na) ra = a[ia];
    }
    while (ib < nb && rb == 0) {
      ++ib;
      vb ^= 1;
      if (ib < nb) rb = b[ib];
    }
    if (ia >= na || ib >= nb) break;
    int64_t step = std::min(ra, rb);
    if (va && vb) inter += step;
    ra -= step;
    rb -= step;
  }
  return inter;
}

double rle_iou_pair(const int64_t* a, int64_t na, const int64_t* b,
                    int64_t nb, int32_t iscrowd) {
  int64_t inter = rle_intersection(a, na, b, nb);
  int64_t area_a = rle_area(a, na);
  int64_t area_b = rle_area(b, nb);
  double denom = iscrowd ? (double)area_a
                         : (double)(area_a + area_b - inter);
  if (denom < 1e-10) denom = 1e-10;
  return (double)inter / denom;
}

// IoU matrix between D detection RLEs and G ground-truth RLEs.
// Runs are packed into one flat array with offsets/lengths per entry.
void rle_iou_matrix(const int64_t* runs, const int64_t* d_off,
                    const int64_t* d_len, int64_t nd,
                    const int64_t* g_off, const int64_t* g_len, int64_t ng,
                    const int32_t* iscrowd, double* out) {
  for (int64_t j = 0; j < ng; ++j) {
    for (int64_t i = 0; i < nd; ++i) {
      out[i * ng + j] =
          rle_iou_pair(runs + d_off[i], d_len[i], runs + g_off[j],
                       g_len[j], iscrowd[j]);
    }
  }
}

// Greedy exact NMS on the host (CPU parity with csrc/cpu/nms_cpu.cpp:
// legacy +1 IoU, strict > threshold). boxes are pre-sorted by score
// descending; writes kept indices, returns count.
int64_t nms_cpu(const float* boxes, int64_t n, float iou_threshold,
                int64_t* keep_out, int64_t max_keep) {
  int64_t kept = 0;
  uint8_t* suppressed = new uint8_t[n]();
  for (int64_t i = 0; i < n && kept < max_keep; ++i) {
    if (suppressed[i]) continue;
    keep_out[kept++] = i;
    const float* bi = boxes + 4 * i;
    float area_i = (bi[2] - bi[0] + 1.f) * (bi[3] - bi[1] + 1.f);
    for (int64_t j = i + 1; j < n; ++j) {
      if (suppressed[j]) continue;
      const float* bj = boxes + 4 * j;
      float xx1 = std::max(bi[0], bj[0]);
      float yy1 = std::max(bi[1], bj[1]);
      float xx2 = std::min(bi[2], bj[2]);
      float yy2 = std::min(bi[3], bj[3]);
      float w = std::max(0.f, xx2 - xx1 + 1.f);
      float h = std::max(0.f, yy2 - yy1 + 1.f);
      float inter = w * h;
      float area_j = (bj[2] - bj[0] + 1.f) * (bj[3] - bj[1] + 1.f);
      float iou = inter / (area_i + area_j - inter);
      if (iou > iou_threshold) suppressed[j] = 1;
    }
  }
  delete[] suppressed;
  return kept;
}

}  // extern "C"
