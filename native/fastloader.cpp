// fastloader — native host-side JPEG decode pipeline for the embed stage.
//
// The device side of this framework embeds >170 ViT-L images/sec/chip; on a
// multi-chip host the Python/cv2 decode path becomes the bottleneck. This
// library decodes batches of JPEGs on a std::thread pool with two wins over
// the generic path:
//   * DCT-domain prescaling: when the image is much larger than the target
//     canvas, libjpeg decodes directly at 1/2, 1/4 or 1/8 scale — the inverse
//     DCT simply produces fewer pixels, so oversized images cost a fraction of
//     a full decode.
//   * zero-copy into the caller's pinned canvas batch: each image is area-
//     downscaled (exact box filter) to fit and written centered into its
//     [canvas, canvas, 3] slot; no intermediate Python objects.
//
// Non-JPEG or corrupt files return a nonzero status and the Python loader
// falls back to cv2/PIL for that file. Build: see data/native_loader.py.
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

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void on_error(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

void on_emit(j_common_ptr, int) {}  // silence warnings

// Per-axis box-filter weights: for each output index, the contiguous source
// span [start, start+len) and fractional weights (stored flat).
struct AxisFilter {
  std::vector<int> start;
  std::vector<int> len;
  std::vector<float> weights;  // ragged, indexed via offsets
  std::vector<int> offset;
};

AxisFilter make_axis_filter(int src, int dst) {
  AxisFilter f;
  const double ss = static_cast<double>(src) / dst;
  f.start.resize(dst);
  f.len.resize(dst);
  f.offset.resize(dst);
  for (int t = 0; t < dst; ++t) {
    const double x0 = t * ss, x1 = (t + 1) * ss;
    const int i0 = static_cast<int>(x0);
    const int i1 = std::min(src, static_cast<int>(std::ceil(x1 - 1e-9)));
    f.start[t] = i0;
    f.len[t] = std::max(1, i1 - i0);
    f.offset[t] = static_cast<int>(f.weights.size());
    double total = 0;
    for (int i = i0; i < i0 + f.len[t]; ++i) {
      const double w = std::min<double>(x1, i + 1) - std::max<double>(x0, i);
      f.weights.push_back(static_cast<float>(w));
      total += w;
    }
    const float inv = static_cast<float>(1.0 / total);
    for (int i = 0; i < f.len[t]; ++i) f.weights[f.offset[t] + i] *= inv;
  }
  return f;
}

// Exact box-filter area downscale, RGB u8 → RGB u8, separable two-pass.
void area_downscale(const uint8_t* src, int sw, int sh, uint8_t* dst, int tw,
                    int th) {
  const AxisFilter fx = make_axis_filter(sw, tw);
  const AxisFilter fy = make_axis_filter(sh, th);

  // horizontal pass: [sh, sw, 3] → [sh, tw, 3] float
  std::vector<float> mid(static_cast<size_t>(sh) * tw * 3);
  for (int y = 0; y < sh; ++y) {
    const uint8_t* row = src + static_cast<size_t>(y) * sw * 3;
    float* out = mid.data() + static_cast<size_t>(y) * tw * 3;
    for (int t = 0; t < tw; ++t) {
      float r = 0, g = 0, b = 0;
      const float* w = fx.weights.data() + fx.offset[t];
      const uint8_t* px = row + static_cast<size_t>(fx.start[t]) * 3;
      for (int i = 0; i < fx.len[t]; ++i, px += 3) {
        r += w[i] * px[0];
        g += w[i] * px[1];
        b += w[i] * px[2];
      }
      out[t * 3 + 0] = r;
      out[t * 3 + 1] = g;
      out[t * 3 + 2] = b;
    }
  }

  // vertical pass: [sh, tw, 3] → [th, tw, 3] u8
  std::vector<float> acc(static_cast<size_t>(tw) * 3);
  for (int t = 0; t < th; ++t) {
    std::fill(acc.begin(), acc.end(), 0.0f);
    const float* w = fy.weights.data() + fy.offset[t];
    for (int i = 0; i < fy.len[t]; ++i) {
      const float* row = mid.data() + static_cast<size_t>(fy.start[t] + i) * tw * 3;
      const float wi = w[i];
      for (int j = 0; j < tw * 3; ++j) acc[j] += wi * row[j];
    }
    uint8_t* out = dst + static_cast<size_t>(t) * tw * 3;
    for (int j = 0; j < tw * 3; ++j) {
      const float v = acc[j] + 0.5f;
      out[j] = static_cast<uint8_t>(v < 0 ? 0 : (v > 255 ? 255 : v));
    }
  }
}

}  // namespace

extern "C" {

// Decode one JPEG into the center of a zeroed [canvas, canvas, 3] buffer.
// Returns 0 on success; *out_w/*out_h get the placed image dimensions.
int decode_to_canvas(const char* path, int canvas_size, uint8_t* canvas,
                     int* out_w, int* out_h) {
  *out_w = 0;
  *out_h = 0;
  // slurp the file once and decode from memory (per-scanline stdio sources add
  // measurable per-byte overhead on the hot path)
  std::vector<uint8_t> filebuf;
  {
    FILE* f = fopen(path, "rb");
    if (!f) return 1;
    fseek(f, 0, SEEK_END);
    const long size = ftell(f);
    if (size <= 0) {
      fclose(f);
      return 1;
    }
    fseek(f, 0, SEEK_SET);
    filebuf.resize(static_cast<size_t>(size));
    const size_t got = fread(filebuf.data(), 1, filebuf.size(), f);
    fclose(f);
    if (got != filebuf.size()) return 1;
  }

  jpeg_decompress_struct cinfo;
  ErrorMgr err;
  cinfo.err = jpeg_std_error(&err.pub);
  err.pub.error_exit = on_error;
  err.pub.emit_message = on_emit;
  std::vector<uint8_t> pixels;
  if (setjmp(err.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return 2;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, filebuf.data(), filebuf.size());
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    return 3;
  }
  cinfo.out_color_space = JCS_RGB;

  // DCT prescale: smallest 1/2^k ≥ canvas along the longer edge.
  const unsigned longer = std::max(cinfo.image_width, cinfo.image_height);
  int denom = 1;
  while (denom < 8 && longer / (denom * 2) >= static_cast<unsigned>(canvas_size))
    denom *= 2;
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;

  jpeg_start_decompress(&cinfo);
  const int w = cinfo.output_width, h = cinfo.output_height;
  pixels.resize(static_cast<size_t>(w) * h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = pixels.data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);

  // fit to canvas (exact area filter)
  int fw = w, fh = h;
  const uint8_t* src = pixels.data();
  std::vector<uint8_t> scaled;
  if (std::max(w, h) > canvas_size) {
    const double scale = static_cast<double>(canvas_size) / std::max(w, h);
    fw = std::max(1, static_cast<int>(w * scale));
    fh = std::max(1, static_cast<int>(h * scale));
    scaled.resize(static_cast<size_t>(fw) * fh * 3);
    area_downscale(pixels.data(), w, h, scaled.data(), fw, fh);
    src = scaled.data();
  }

  const int ox = (canvas_size - fw) / 2, oy = (canvas_size - fh) / 2;
  for (int y = 0; y < fh; ++y) {
    std::memcpy(canvas + (static_cast<size_t>(oy + y) * canvas_size + ox) * 3,
                src + static_cast<size_t>(y) * fw * 3,
                static_cast<size_t>(fw) * 3);
  }
  *out_w = fw;
  *out_h = fh;
  return 0;
}

// Batch decode on a thread pool. canvases: [n, canvas, canvas, 3] (zeroed
// here); dims: [n, 2] (w, h) with w == 0 marking failures.
void decode_batch(const char** paths, int n, int canvas_size, uint8_t* canvases,
                  int* dims, int n_threads) {
  const size_t slot = static_cast<size_t>(canvas_size) * canvas_size * 3;
  std::memset(canvases, 0, slot * n);
  std::atomic<int> next(0);
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      int w = 0, h = 0;
      const int rc =
          decode_to_canvas(paths[i], canvas_size, canvases + slot * i, &w, &h);
      dims[i * 2 + 0] = rc == 0 ? w : 0;
      dims[i * 2 + 1] = rc == 0 ? h : 0;
    }
  };
  const int workers = std::max(1, std::min(n_threads, n));
  std::vector<std::thread> pool;
  pool.reserve(workers);
  for (int t = 0; t < workers; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
}

}  // extern "C"
