// pfr_native: threaded JPEG decode + letterbox resize for the host data path.
//
// The reference's data loading decodes one image at a time with PIL inside
// DataLoader workers (data_loading/dataset.py:100-112). Feeding a TPU at
// >=5k crops/sec needs a native path: this library decodes a batch of JPEG
// files on a thread pool straight into one preallocated uint8 NHWC tensor,
// letterboxed to a fixed (H, W) with the same geometry as
// utils/collate.letterbox_image (aspect-preserving resize + centered pad),
// returning per-image scale/pad so annotations can be mapped.
//
// Fast paths: libjpeg's scale_denom DCT downscaling picks the largest 1/1,
// 1/2, 1/4, 1/8 factor that still covers the target, so a 4000px photo
// headed for 320px decodes ~8x cheaper before the bilinear pass.
//
// C ABI only (ctypes-friendly). Thread pool is created per call batch —
// decode dominates, pool setup is noise.

#include <cstddef>
#include <cstdio>

#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf setjmp_buffer;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->setjmp_buffer, 1);
}

// Decode one JPEG file to RGB. Returns true on success; the image buffer and
// its dimensions come back through the out params.
bool decode_jpeg_file(const char* path, int target_min_side,
                      std::vector<uint8_t>* pixels, int* width, int* height) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }

  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);

  // DCT-domain downscale: largest denom whose output still covers the target.
  if (target_min_side > 0) {
    const int full_min = std::min<int>(cinfo.image_width, cinfo.image_height);
    int denom = 1;
    while (denom < 8 && full_min / (denom * 2) >= target_min_side) denom *= 2;
    cinfo.scale_num = 1;
    cinfo.scale_denom = denom;
  }
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  *width = cinfo.output_width;
  *height = cinfo.output_height;
  const int stride = cinfo.output_width * cinfo.output_components;
  pixels->resize(static_cast<size_t>(stride) * cinfo.output_height);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels->data() +
                   static_cast<size_t>(cinfo.output_scanline) * stride;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

// Bilinear resize + centered letterbox into out (H, W, 3), zero-padded.
// Geometry matches utils/collate.letterbox_image: scale = min(H/h, W/w),
// new size = round(h*scale), round(w*scale), pad = (dim - new)/2 floor.
void letterbox_into(const uint8_t* src, int sw, int sh, uint8_t* out,
                    int out_w, int out_h, float* scale_out, float* pad_x_out,
                    float* pad_y_out) {
  const float scale = std::min(static_cast<float>(out_h) / sh,
                               static_cast<float>(out_w) / sw);
  const int nw = std::max(1, static_cast<int>(std::lround(sw * scale)));
  const int nh = std::max(1, static_cast<int>(std::lround(sh * scale)));
  const int pad_x = (out_w - nw) / 2;
  const int pad_y = (out_h - nh) / 2;
  *scale_out = scale;
  *pad_x_out = static_cast<float>(pad_x);
  *pad_y_out = static_cast<float>(pad_y);

  std::memset(out, 0, static_cast<size_t>(out_w) * out_h * 3);

  // cv2.INTER_LINEAR convention: src = (dst + 0.5) * (s / n) - 0.5
  const float fx = static_cast<float>(sw) / nw;
  const float fy = static_cast<float>(sh) / nh;
  for (int y = 0; y < nh; ++y) {
    float sy = (y + 0.5f) * fy - 0.5f;
    sy = std::max(0.0f, std::min(sy, static_cast<float>(sh - 1)));
    const int y0 = static_cast<int>(sy);
    const int y1 = std::min(y0 + 1, sh - 1);
    const float wy = sy - y0;
    uint8_t* dst_row = out + (static_cast<size_t>(y + pad_y) * out_w + pad_x) * 3;
    const uint8_t* row0 = src + static_cast<size_t>(y0) * sw * 3;
    const uint8_t* row1 = src + static_cast<size_t>(y1) * sw * 3;
    for (int x = 0; x < nw; ++x) {
      float sx = (x + 0.5f) * fx - 0.5f;
      sx = std::max(0.0f, std::min(sx, static_cast<float>(sw - 1)));
      const int x0 = static_cast<int>(sx);
      const int x1 = std::min(x0 + 1, sw - 1);
      const float wx = sx - x0;
      for (int c = 0; c < 3; ++c) {
        const float top = row0[x0 * 3 + c] * (1 - wx) + row0[x1 * 3 + c] * wx;
        const float bot = row1[x0 * 3 + c] * (1 - wx) + row1[x1 * 3 + c] * wx;
        dst_row[x * 3 + c] =
            static_cast<uint8_t>(std::lround(top * (1 - wy) + bot * wy));
      }
    }
  }
}

}  // namespace

extern "C" {

// Decode `n` JPEG files into `out` (n, out_h, out_w, 3) uint8 with letterbox.
// paths: array of n C strings. ok: n bytes, 1 = decoded. scales/pads: per-image
// geometry (n floats / n*2 floats). Returns number of successfully decoded
// images. Thread-parallel over images.
int pfr_decode_batch(const char** paths, int n, uint8_t* out, int out_w,
                     int out_h, uint8_t* ok, float* scales, float* pads,
                     int num_threads) {
  if (num_threads <= 0) {
    num_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (num_threads <= 0) num_threads = 4;
  }
  std::atomic<int> next(0);
  std::atomic<int> n_ok(0);
  const size_t img_bytes = static_cast<size_t>(out_w) * out_h * 3;
  const int target_min = std::min(out_w, out_h);

  auto worker = [&]() {
    std::vector<uint8_t> pixels;
    int w = 0, h = 0;
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      ok[i] = 0;
      scales[i] = 0.0f;
      pads[i * 2] = pads[i * 2 + 1] = 0.0f;
      if (!decode_jpeg_file(paths[i], target_min, &pixels, &w, &h)) {
        std::memset(out + i * img_bytes, 0, img_bytes);
        continue;
      }
      letterbox_into(pixels.data(), w, h, out + i * img_bytes, out_w, out_h,
                     &scales[i], &pads[i * 2], &pads[i * 2 + 1]);
      ok[i] = 1;
      n_ok.fetch_add(1);
    }
  };

  std::vector<std::thread> threads;
  const int pool = std::min(num_threads, n);
  threads.reserve(pool);
  for (int t = 0; t < pool; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return n_ok.load();
}

// Decode a single JPEG at full (or DCT-downscaled) resolution into a caller
// buffer; call with out == nullptr to query width/height first.
int pfr_decode_single(const char* path, uint8_t* out, int* width, int* height,
                      int target_min_side) {
  std::vector<uint8_t> pixels;
  int w = 0, h = 0;
  if (!decode_jpeg_file(path, target_min_side, &pixels, &w, &h)) return 0;
  *width = w;
  *height = h;
  if (out != nullptr) std::memcpy(out, pixels.data(), pixels.size());
  return 1;
}

}  // extern "C"
