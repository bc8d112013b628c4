// lhrs_host — native host-side data path for the TPU framework.
//
// Replaces the Python-side image preprocessing the reference runs in torch
// DataLoader workers (CLIPImageProcessor resize+crop on CPU): JPEG decode via
// libjpeg, bilinear shortest-edge resize, center crop, all in one pass per
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

// Decode a JPEG buffer to RGB. Returns true on success.
bool decode_jpeg(const uint8_t* data, size_t size, std::vector<uint8_t>* out,
                 int* width, int* height) {
  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
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

// Bilinear sample from an RGB image at (fx, fy).
inline void sample_bilinear(const uint8_t* src, int w, int h, float fx,
                            float fy, uint8_t* out_px) {
  fx = std::min(std::max(fx, 0.0f), static_cast<float>(w - 1));
  fy = std::min(std::max(fy, 0.0f), static_cast<float>(h - 1));
  const int x0 = static_cast<int>(fx);
  const int y0 = static_cast<int>(fy);
  const int x1 = std::min(x0 + 1, w - 1);
  const int y1 = std::min(y0 + 1, h - 1);
  const float ax = fx - x0;
  const float ay = fy - y0;
  for (int c = 0; c < 3; ++c) {
    const float top = src[(static_cast<size_t>(y0) * w + x0) * 3 + c] *
                          (1.0f - ax) +
                      src[(static_cast<size_t>(y0) * w + x1) * 3 + c] * ax;
    const float bot = src[(static_cast<size_t>(y1) * w + x0) * 3 + c] *
                          (1.0f - ax) +
                      src[(static_cast<size_t>(y1) * w + x1) * 3 + c] * ax;
    const float v = top * (1.0f - ay) + bot * ay;
    out_px[c] = static_cast<uint8_t>(std::lround(
        std::min(std::max(v, 0.0f), 255.0f)));
  }
}

// Shortest-edge resize to `size`, then center crop size x size, writing into
// a (size, size, 3) uint8 buffer. One fused pass: for each output pixel,
// compute the source coordinate directly (resize+crop composed).
void resize_center_crop(const uint8_t* src, int w, int h, int size,
                        uint8_t* dst) {
  const float scale = static_cast<float>(size) / std::min(w, h);
  const float new_w = w * scale;
  const float new_h = h * scale;
  const float off_x = (new_w - size) * 0.5f;
  const float off_y = (new_h - size) * 0.5f;
  for (int y = 0; y < size; ++y) {
    const float fy = (y + off_y + 0.5f) / scale - 0.5f;
    for (int x = 0; x < size; ++x) {
      const float fx = (x + off_x + 0.5f) / scale - 0.5f;
      sample_bilinear(src, w, h, fx, fy,
                      dst + (static_cast<size_t>(y) * size + x) * 3);
    }
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
