// lhrs_host — native host-side data path for the TPU framework.
//
// Replaces the Python-side image preprocessing the reference runs in torch
// DataLoader workers (CLIPImageProcessor resize+crop on CPU): JPEG decode via
// libjpeg, PIL-parity bicubic shortest-edge resize, center crop, all in one pass per
// image, threaded across the batch. Output is uint8 HWC — normalization is
// fused into the device patch-embed kernel (ops/patch_embed.py), so this is
// the complete host half of the uint8-to-logits pipeline.
//
// C ABI only (consumed through ctypes; no pybind11 dependency).
//
// Build: make -C native   (g++ -O3 -fPIC -shared, links -ljpeg -lpthread)

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  auto* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Truncated JPEGs etc. emit warnings via output_message — swallow them
// (the caller gets the ok-mask; a 5M-sample stream must not spam stderr).
void jpeg_silent_output(j_common_ptr) {}

// Decode a JPEG buffer to RGB. Returns true on success.
bool decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  jerr.pub.output_message = jpeg_silent_output;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(data),
               static_cast<unsigned long>(size));
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  out->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) *
                                     stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ---- PIL-parity bicubic resampling -----------------------------------------
//
// The parity path (data/transforms.py:39) is PIL's Image.BICUBIC: a
// SEPARABLE convolution with the Catmull-Rom-style cubic kernel (a = -0.5,
// support = 2) whose footprint widens by the downscale factor (area-correct
// downsampling, unlike a naive 4-tap bicubic). Two passes (horizontal, then
// vertical) with uint8 rounding between passes, like PIL's ImagingResample —
// measured ≤1-2 LSB from PIL output on JPEG photos.

inline double cubic_filter(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// Per-output-pixel filter window over one source axis, composed with a crop
// offset: output index i samples resized coordinate (crop_off + i).
// Weights are Pillow-style int32 fixed point (PRECISION_BITS) so the hot
// loops are integer MACs, matching PIL output bit-for-bit in practice.
constexpr int kPrecisionBits = 32 - 8 - 2;

struct FilterTable {
  std::vector<int> xmin;              // first source index per output
  std::vector<int> count;             // taps per output
  std::vector<int32_t> weights;       // ksize taps per output (padded)
  int ksize = 0;
};

FilterTable make_filter(int in_size, int out_size, int crop_off,
                        int crop_size) {
  FilterTable ft;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = 2.0 * filterscale;  // bicubic support = 2
  ft.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  ft.xmin.resize(crop_size);
  ft.count.resize(crop_size);
  ft.weights.assign(static_cast<size_t>(crop_size) * ft.ksize, 0);
  std::vector<double> wbuf(ft.ksize);
  for (int i = 0; i < crop_size; ++i) {
    const double center = (crop_off + i + 0.5) * scale;
    int x0 = static_cast<int>(center - support + 0.5);
    int x1 = static_cast<int>(center + support + 0.5);
    x0 = std::max(x0, 0);
    x1 = std::min(x1, in_size);
    double total = 0.0;
    for (int x = x0; x < x1; ++x) {
      wbuf[x - x0] = cubic_filter((x - center + 0.5) / filterscale);
      total += wbuf[x - x0];
    }
    int32_t* w = &ft.weights[static_cast<size_t>(i) * ft.ksize];
    for (int x = 0; x < x1 - x0; ++x) {
      const double v = total != 0.0 ? wbuf[x] / total : 0.0;
      w[x] = static_cast<int32_t>(
          std::lround(v * (1 << kPrecisionBits)));
    }
    ft.xmin[i] = x0;
    ft.count[i] = x1 - x0;
  }
  return ft;
}

inline uint8_t clip8(int64_t v) {
  v >>= kPrecisionBits;
  return static_cast<uint8_t>(std::min<int64_t>(std::max<int64_t>(v, 0), 255));
}

// Shortest-edge bicubic resize to `size`, then center crop size x size
// (clip_preprocess_uint8 geometry). The horizontal pass only produces the
// cropped column window and only the source rows the vertical pass reads.
void resize_center_crop(const uint8_t* src, int w, int h, int size,
                        uint8_t* dst) {
  const double scale = static_cast<double>(size) / std::min(w, h);
  // nearbyint under the default FE_TONEAREST mode rounds half-to-even,
  // matching Python round() in transforms.py:38 — lround (half away from
  // zero) differs by 1 on exact halves, shifting resize/crop geometry
  const int new_w = static_cast<int>(std::nearbyint(w * scale));
  const int new_h = static_cast<int>(std::nearbyint(h * scale));
  const int left = (new_w - size) / 2;
  const int top = (new_h - size) / 2;

  const FilterTable fx = make_filter(w, new_w, left, size);
  const FilterTable fy = make_filter(h, new_h, top, size);

  // the vertical pass only reads source rows [row_lo, row_hi)
  int row_lo = h, row_hi = 0;
  for (int y = 0; y < size; ++y) {
    row_lo = std::min(row_lo, fy.xmin[y]);
    row_hi = std::max(row_hi, fy.xmin[y] + fy.count[y]);
  }
  const int rows = row_hi - row_lo;
  const int64_t half = 1LL << (kPrecisionBits - 1);

  // horizontal pass: (rows, w, 3) -> (rows, size, 3)
  std::vector<uint8_t> mid(static_cast<size_t>(rows) * size * 3);
  for (int y = 0; y < rows; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y + row_lo) * w * 3;
    uint8_t* orow = mid.data() + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size; ++x) {
      const int32_t* wts = &fx.weights[static_cast<size_t>(x) * fx.ksize];
      const uint8_t* px = row + static_cast<size_t>(fx.xmin[x]) * 3;
      int64_t a0 = half, a1 = half, a2 = half;
      for (int k = 0; k < fx.count[x]; ++k, px += 3) {
        a0 += static_cast<int64_t>(wts[k]) * px[0];
        a1 += static_cast<int64_t>(wts[k]) * px[1];
        a2 += static_cast<int64_t>(wts[k]) * px[2];
      }
      orow[x * 3 + 0] = clip8(a0);
      orow[x * 3 + 1] = clip8(a1);
      orow[x * 3 + 2] = clip8(a2);
    }
  }
  // vertical pass: (rows, size, 3) -> (size, size, 3)
  const int row_px = size * 3;
  std::vector<int64_t> acc(row_px);
  for (int y = 0; y < size; ++y) {
    const int32_t* wts = &fy.weights[static_cast<size_t>(y) * fy.ksize];
    const int y0 = fy.xmin[y] - row_lo;
    std::fill(acc.begin(), acc.end(), half);
    for (int k = 0; k < fy.count[y]; ++k) {
      const int64_t wk = wts[k];
      const uint8_t* mrow =
          mid.data() + static_cast<size_t>(y0 + k) * row_px;
      for (int j = 0; j < row_px; ++j) acc[j] += wk * mrow[j];
    }
    uint8_t* orow = dst + static_cast<size_t>(y) * row_px;
    for (int j = 0; j < row_px; ++j) orow[j] = clip8(acc[j]);
  }
}

}  // namespace

extern "C" {

// Decode + resize + crop a batch of JPEG buffers in parallel.
//   data:    concatenated JPEG bytes
//   offsets: n+1 offsets into data (image i = data[offsets[i]..offsets[i+1]])
//   out:     n * size * size * 3 uint8, preallocated by the caller
//   ok:      n bytes — 1 where decode succeeded, 0 for corrupt images
//            (corrupt slots are zero-filled; caller may drop them)
// Returns the number of successfully decoded images.
int lhrs_decode_resize_batch(const uint8_t* data, const int64_t* offsets,
                             int n, int size, uint8_t* out, uint8_t* ok,
                             int num_threads) {
  std::atomic<int> next(0);
  std::atomic<int> good(0);
  const size_t per = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    std::vector<uint8_t> rgb;
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      const uint8_t* ptr = data + offsets[i];
      const size_t len = static_cast<size_t>(offsets[i + 1] - offsets[i]);
      if (decode_jpeg(ptr, len, &rgb, &w, &h) && w > 0 && h > 0) {
        resize_center_crop(rgb.data(), w, h, size, out + per * i);
        ok[i] = 1;
        good.fetch_add(1);
      } else {
        std::memset(out + per * i, 0, per);
        ok[i] = 0;
      }
    }
  };
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = std::min(num_threads, n > 0 ? n : 1);
  std::vector<std::thread> pool;
  pool.reserve(num_threads);
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return good.load();
}

// Resize+crop already-decoded RGB images (uint8 HWC) in parallel.
//   srcs/offsets: concatenated images; dims: n pairs (h, w)
void lhrs_resize_batch(const uint8_t* srcs, const int64_t* offsets,
                       const int32_t* dims, int n, int size, uint8_t* out,
                       int num_threads) {
  std::atomic<int> next(0);
  const size_t per = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int h = dims[2 * i];
      const int w = dims[2 * i + 1];
      resize_center_crop(srcs + offsets[i], w, h, size, out + per * i);
    }
  };
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 1;
  }
  num_threads = std::min(num_threads, n > 0 ? n : 1);
  std::vector<std::thread> pool;
  for (int t = 0; t < num_threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
}

}  // extern "C"
