// Native host-side image preprocessing for the TPU detection framework.
//
// The reference outsources its host hot loop to native library code —
// cv2.resize + 5 forked dataloader workers (dataset/Pascal.py:255-276,
// SURVEY.md §3.1 "CPU hot loop").  This is the equivalent native layer for
// the rebuild: multithreaded bilinear resize / letterbox straight into the
// padded float32 NHWC batch the device consumes, exposed over a C ABI for
// ctypes (no pybind11 in this environment).
//
// Build: `make -C native` -> native/libpreproc.so

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Row-precomputed bilinear resize of an HxWx3 u8 image into a float32
// sub-rectangle (scaled 1/255).  cv2.INTER_LINEAR sampling convention.
void bilinear_rect(const uint8_t* src, int h, int w, float* dst,
                   int dst_stride, int outw, int outh) {
  std::vector<int> xi0(outw), xi1(outw);
  std::vector<float> wx(outw);
  const float sx = static_cast<float>(w) / outw;
  for (int x = 0; x < outw; ++x) {
    float fx = (x + 0.5f) * sx - 0.5f;
    fx = std::max(0.0f, std::min(fx, static_cast<float>(w - 1)));
    xi0[x] = static_cast<int>(fx);
    xi1[x] = std::min(xi0[x] + 1, w - 1);
    wx[x] = fx - xi0[x];
  }
  const float sy = static_cast<float>(h) / outh;
  constexpr float kInv255 = 1.0f / 255.0f;
  for (int y = 0; y < outh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    fy = std::max(0.0f, std::min(fy, static_cast<float>(h - 1)));
    const int y0 = static_cast<int>(fy);
    const int y1 = std::min(y0 + 1, h - 1);
    const float dy = fy - y0;
    const uint8_t* r0 = src + static_cast<size_t>(y0) * w * 3;
    const uint8_t* r1 = src + static_cast<size_t>(y1) * w * 3;
    float* out = dst + static_cast<size_t>(y) * dst_stride;
    for (int x = 0; x < outw; ++x) {
      const int a = xi0[x] * 3, b = xi1[x] * 3;
      const float dx = wx[x];
      for (int c = 0; c < 3; ++c) {
        const float top = r0[a + c] + (r0[b + c] - r0[a + c]) * dx;
        const float bot = r1[a + c] + (r1[b + c] - r1[a + c]) * dx;
        out[x * 3 + c] = (top + (bot - top) * dy) * kInv255;
      }
    }
  }
}

// Resize src (h x w x 3 u8) into dst (S x S x 3 f32, already scaled /255).
// With letterbox: aspect-preserving, centered, gray 114 padding; returns the
// scale and pads so the caller can transform boxes identically to the
// Python path (data/pipeline.py::_resize_letterbox).
void resize_one(const uint8_t* src, int h, int w, float* dst, int S,
                bool letterbox, float* scale_out, float* padx_out,
                float* pady_out) {
  if (!letterbox) {
    bilinear_rect(src, h, w, dst, S * 3, S, S);
    *scale_out = 1.0f;
    *padx_out = 0.0f;
    *pady_out = 0.0f;
    return;
  }

  const float scale = static_cast<float>(S) / std::max(h, w);
  const int nh = static_cast<int>(h * scale + 0.5f);
  const int nw = static_cast<int>(w * scale + 0.5f);
  const int pad_y = (S - nh) / 2;
  const int pad_x = (S - nw) / 2;
  const float gray = 114.0f / 255.0f;
  for (int i = 0; i < S * S * 3; ++i) dst[i] = gray;
  bilinear_rect(src, h, w, dst + (static_cast<size_t>(pad_y) * S + pad_x) * 3,
                S * 3, nw, nh);
  *scale_out = scale;
  *padx_out = static_cast<float>(pad_x);
  *pady_out = static_cast<float>(pad_y);
}

}  // namespace

extern "C" {

// Pack N variable-size u8 RGB images into a float32 NHWC batch [N, S, S, 3]
// in [0, 1], resizing (or letterboxing) each, using up to `threads` worker
// threads.  `srcs` are N image pointers; `hs`/`ws` their sizes.  Outputs
// per-image (scale, pad_x, pad_y) for box transforms.
void preproc_batch(const uint8_t** srcs, const int* hs, const int* ws, int n,
                   float* dst, int S, int letterbox, int threads,
                   float* scales, float* pad_xs, float* pad_ys) {
  const int nt = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([=]() {
      for (int i = t; i < n; i += nt) {
        resize_one(srcs[i], hs[i], ws[i], dst + static_cast<int64_t>(i) * S * S * 3,
                   S, letterbox != 0, &scales[i], &pad_xs[i], &pad_ys[i]);
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"

// ---------------------------------------------------------------------------
// Fused JPEG decode + resize + normalize + batch pack (libjpeg).
//
// The reference's data hot loop is cv2.imread + A.Resize inside 5 forked
// dataloader workers (SURVEY.md §3.1).  Here one C++ call takes N file paths
// and fills the padded float32 NHWC batch directly, using libjpeg's
// fractional DCT scaling (scale_num/8) to decode large sources near the
// target resolution — decoding a 4000px JPEG for a 640px target reads 8x
// fewer pixels.

#include <csetjmp>
#include <cstdio>

#include <jpeglib.h>

namespace {

struct JpegError {
  jpeg_error_mgr mgr;
  jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegError*>(cinfo->err)->jump, 1);
}

// Decode one JPEG file to tightly-packed RGB; chooses a DCT scale so the
// decoded size stays >= target. Returns false on failure.
bool decode_jpeg(const char* path, int target, std::vector<uint8_t>* out,
                 int* w, int* h, int* ow, int* oh) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegError jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  *ow = cinfo.image_width;
  *oh = cinfo.image_height;
  // largest denominator that keeps both dims >= target
  int denom = 1;
  while (denom < 8 &&
         (cinfo.image_width / (denom * 2) >= (unsigned)target) &&
         (cinfo.image_height / (denom * 2) >= (unsigned)target)) {
    denom *= 2;
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  out->resize(static_cast<size_t>(*w) * *h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * *w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  return true;
}

}  // namespace

extern "C" {

// Decode + preprocess N JPEG files into dst [N, S, S, 3] float32 in [0, 1].
// orig_ws/orig_hs receive the ORIGINAL image sizes (for box normalization);
// scales/pads describe the letterbox transform RELATIVE TO THE ORIGINAL.
// ok[i] = 1 on success, 0 on decode failure (dst row zeroed).
void decode_preproc_batch(const char** paths, int n, float* dst, int S,
                          int letterbox, int threads, int* orig_ws,
                          int* orig_hs, float* scales, float* pad_xs,
                          float* pad_ys, int* ok) {
  const int nt = std::max(1, std::min(threads, n));
  std::vector<std::thread> pool;
  pool.reserve(nt);
  for (int t = 0; t < nt; ++t) {
    pool.emplace_back([=]() {
      std::vector<uint8_t> buf;
      for (int i = t; i < n; i += nt) {
        int w = 0, h = 0, ow = 0, oh = 0;
        float* row = dst + static_cast<int64_t>(i) * S * S * 3;
        if (!decode_jpeg(paths[i], S, &buf, &w, &h, &ow, &oh)) {
          std::memset(row, 0, sizeof(float) * S * S * 3);
          ok[i] = 0;
          orig_ws[i] = orig_hs[i] = 0;
          scales[i] = 1.0f;
          pad_xs[i] = pad_ys[i] = 0.0f;
          continue;
        }
        resize_one(buf.data(), h, w, row, S, letterbox != 0, &scales[i],
                   &pad_xs[i], &pad_ys[i]);
        // letterbox scale is relative to the decoded size; rescale to the
        // original coordinate frame the annotations live in.
        if (letterbox) {
          scales[i] *= static_cast<float>(w) / ow;
        }
        orig_ws[i] = ow;
        orig_hs[i] = oh;
        ok[i] = 1;
      }
    });
  }
  for (auto& th : pool) th.join();
}

}  // extern "C"
