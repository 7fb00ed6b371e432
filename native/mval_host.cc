// Native host data path: JPEG decode + zero-fill crop + Lanczos-3 resize
// + BGR flip in one call, for the per-view image preparation pipeline.
//
// The reference prepares every view with PIL on dataloader CPU workers
// (reference: dataset/dataset.py:158-220).  This library collapses the
// decode -> crop -> resize chain into a single pass with two perf levers
// PIL cannot exploit in that pipeline:
//   * libjpeg scaled decode (1/2, 1/4, 1/8 IDCT) chosen from the crop/output
//     ratio, skipping most of the inverse DCT work for large frames;
//   * separable float Lanczos-3 with clamped accumulation, writing straight
//     into the caller's [out_h, out_w, 3] uint8 buffer (no intermediate
//     images, no Python object churn).
//
// Exposed via a tiny C ABI consumed with ctypes (no pybind11 dependency).

#include <cstddef>
#include <cstdio>
#include <jpeglib.h>

#include <algorithm>
#include <cmath>
#include <csetjmp>
#include <cstdint>
#include <cstdlib>
#include <cstring>
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

constexpr double kLanczosA = 3.0;

double lanczos(double x) {
  if (x <= -kLanczosA || x >= kLanczosA) return 0.0;
  if (x == 0.0) return 1.0;
  const double pix = M_PI * x;
  return kLanczosA * std::sin(pix) * std::sin(pix / kLanczosA) / (pix * pix);
}

// Precomputed filter taps for one output axis.
struct Taps {
  int support;                 // taps per output pixel
  std::vector<int> start;      // first source index per output pixel
  std::vector<double> weights; // [out_size * support]
};

Taps build_taps(int in_size, int out_size) {
  Taps taps;
  const double scale = static_cast<double>(in_size) / out_size;
  const double filterscale = std::max(scale, 1.0);
  const double support = kLanczosA * filterscale;
  taps.support = static_cast<int>(std::ceil(support)) * 2 + 1;
  taps.start.resize(out_size);
  taps.weights.assign(static_cast<size_t>(out_size) * taps.support, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    const double center = (xx + 0.5) * scale;
    int xmin = static_cast<int>(center - support + 0.5);
    if (xmin < 0) xmin = 0;
    int xmax = static_cast<int>(center + support + 0.5);
    if (xmax > in_size) xmax = in_size;
    taps.start[xx] = xmin;
    double total = 0.0;
    for (int x = xmin; x < xmax && x - xmin < taps.support; ++x) {
      const double w = lanczos((x - center + 0.5) / filterscale);
      taps.weights[static_cast<size_t>(xx) * taps.support + (x - xmin)] = w;
      total += w;
    }
    if (total != 0.0) {
      for (int k = 0; k < taps.support; ++k) {
        taps.weights[static_cast<size_t>(xx) * taps.support + k] /= total;
      }
    }
  }
  return taps;
}

inline uint8_t clamp_u8(double v) {
  return static_cast<uint8_t>(std::min(255.0, std::max(0.0, v + 0.5)));
}

}  // namespace

extern "C" {

// Decode `data` (JPEG), crop to the (left, top, right, bottom) box in
// original-image coordinates (zero fill out of bounds), Lanczos-resize the
// crop to [out_h, out_w], optionally flip RGB->BGR, and write uint8 HWC into
// `out`.  `fast_scale` != 0 permits libjpeg fractional decode when the crop
// is much larger than the output (throughput mode; bit-exactness with the
// full-resolution path is then not guaranteed).
// Returns 0 on success.
int decode_crop_resize(const uint8_t* data, int len, int left, int top,
                       int right, int bottom, int out_w, int out_h,
                       int bgr_flip, int fast_scale, uint8_t* out) {
  if (right <= left || bottom <= top || out_w <= 0 || out_h <= 0) return 2;

  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;

  // Scaled decode: decode at 1/2^k when the crop stays >= 2x the output.
  int denom = 1;
  if (fast_scale) {
    const int crop_w = right - left, crop_h = bottom - top;
    while (denom < 8 && crop_w / (denom * 2) >= 2 * out_w &&
           crop_h / (denom * 2) >= 2 * out_h) {
      denom *= 2;
    }
  }
  cinfo.scale_num = 1;
  cinfo.scale_denom = denom;
  jpeg_start_decompress(&cinfo);
  const int dw = cinfo.output_width;
  const int dh = cinfo.output_height;
  const int dc = cinfo.output_components;  // 3 for RGB
  // Early stop: rows below the crop's bottom are never touched, so abort
  // the decode there (classic libjpeg can't skip leading rows, but it can
  // stop early — worth ~(dh - bottom)/dh of the IDCT+Huffman work).
  const int stop_row = std::min(
      dh, std::max(0, (bottom + denom - 1) / denom));
  std::vector<uint8_t> decoded(static_cast<size_t>(dw) * dh * dc);
  while (cinfo.output_scanline < static_cast<JDIMENSION>(stop_row)) {
    uint8_t* row = decoded.data() + static_cast<size_t>(cinfo.output_scanline) * dw * dc;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  if (cinfo.output_scanline < cinfo.output_height) {
    jpeg_abort_decompress(&cinfo);
  } else {
    jpeg_finish_decompress(&cinfo);
  }
  jpeg_destroy_decompress(&cinfo);

  // Crop box in decoded coordinates.
  const int cl = left / denom, ct = top / denom;
  const int cr = (right + denom - 1) / denom, cb = (bottom + denom - 1) / denom;
  const int crop_w = cr - cl, crop_h = cb - ct;

  // Zero-filled crop (reference: utils/triangulation.py:77-93 semantics).
  std::vector<uint8_t> crop(static_cast<size_t>(crop_w) * crop_h * 3, 0);
  const int y0 = std::max(ct, 0), y1 = std::min(cb, dh);
  const int x0 = std::max(cl, 0), x1 = std::min(cr, dw);
  for (int y = y0; y < y1; ++y) {
    if (x1 > x0) {
      std::memcpy(crop.data() + (static_cast<size_t>(y - ct) * crop_w + (x0 - cl)) * 3,
                  decoded.data() + (static_cast<size_t>(y) * dw + x0) * dc,
                  static_cast<size_t>(x1 - x0) * 3);
    }
  }
  decoded.clear();
  decoded.shrink_to_fit();

  // Separable Lanczos: horizontal then vertical, float accumulation.
  const Taps tx = build_taps(crop_w, out_w);
  const Taps ty = build_taps(crop_h, out_h);
  std::vector<double> tmp(static_cast<size_t>(crop_h) * out_w * 3);
  for (int y = 0; y < crop_h; ++y) {
    const uint8_t* src_row = crop.data() + static_cast<size_t>(y) * crop_w * 3;
    double* dst_row = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int xx = 0; xx < out_w; ++xx) {
      double acc[3] = {0, 0, 0};
      const int s = tx.start[xx];
      const double* w = &tx.weights[static_cast<size_t>(xx) * tx.support];
      for (int k = 0; k < tx.support; ++k) {
        const int xi = s + k;
        if (xi >= crop_w || w[k] == 0.0) continue;
        const uint8_t* p = src_row + static_cast<size_t>(xi) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      dst_row[xx * 3 + 0] = acc[0];
      dst_row[xx * 3 + 1] = acc[1];
      dst_row[xx * 3 + 2] = acc[2];
    }
  }
  for (int yy = 0; yy < out_h; ++yy) {
    uint8_t* dst_row = out + static_cast<size_t>(yy) * out_w * 3;
    const int s = ty.start[yy];
    const double* w = &ty.weights[static_cast<size_t>(yy) * ty.support];
    for (int xx = 0; xx < out_w; ++xx) {
      double acc[3] = {0, 0, 0};
      for (int k = 0; k < ty.support; ++k) {
        const int yi = s + k;
        if (yi >= crop_h || w[k] == 0.0) continue;
        const double* p = tmp.data() + (static_cast<size_t>(yi) * out_w + xx) * 3;
        acc[0] += w[k] * p[0];
        acc[1] += w[k] * p[1];
        acc[2] += w[k] * p[2];
      }
      if (bgr_flip) {
        dst_row[xx * 3 + 0] = clamp_u8(acc[2]);
        dst_row[xx * 3 + 1] = clamp_u8(acc[1]);
        dst_row[xx * 3 + 2] = clamp_u8(acc[0]);
      } else {
        dst_row[xx * 3 + 0] = clamp_u8(acc[0]);
        dst_row[xx * 3 + 1] = clamp_u8(acc[1]);
        dst_row[xx * 3 + 2] = clamp_u8(acc[2]);
      }
    }
  }
  return 0;
}

// Plain decode into a caller-queried buffer: call with out == nullptr to get
// dimensions (returns 0, writes *w / *h), then again with the buffer.
int decode_jpeg(const uint8_t* data, int len, int* w, int* h, uint8_t* out) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.setjmp_buffer)) {
    jpeg_destroy_decompress(&cinfo);
    return 1;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, data, static_cast<unsigned long>(len));
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  if (out == nullptr) {
    *w = cinfo.image_width;
    *h = cinfo.image_height;
    jpeg_destroy_decompress(&cinfo);
    return 0;
  }
  jpeg_start_decompress(&cinfo);
  const int dw = cinfo.output_width;
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out + static_cast<size_t>(cinfo.output_scanline) * dw * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return 0;
}

}  // extern "C"
