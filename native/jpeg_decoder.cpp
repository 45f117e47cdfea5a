// grl_tpu native host-pipeline kernel: JPEG decode + bilinear resize.
//
// The reference decodes every frame with PIL inside torch DataLoader worker
// processes (reid/data/video_loader.py:130,146). Here decode+resize is a C
// routine on top of libjpeg, called through ctypes — ctypes releases the
// GIL for the duration of the call, so the loader's thread pool decodes
// frames truly concurrently without worker processes.
//
// Build: g++ -O3 -shared -fPIC jpeg_decoder.cpp -ljpeg -o libgrljpeg.so
//
// API (C linkage):
//   grl_decode_resize(buf, len, out_h, out_w, out_rgb) -> 0 on success
//   grl_decode_dims(buf, len, &h, &w)                  -> 0 on success

#include <csetjmp>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

#include <jpeglib.h>

namespace {

struct ErrorMgr {
  jpeg_error_mgr pub;
  jmp_buf jump;
};

void error_exit(j_common_ptr cinfo) {
  ErrorMgr* err = reinterpret_cast<ErrorMgr*>(cinfo->err);
  longjmp(err->jump, 1);
}

// Decode a JPEG buffer to tightly-packed RGB; returns empty on failure.
bool decode_rgb(const uint8_t* buf, size_t len, std::vector<uint8_t>* out,
                int* height, int* width) {
  jpeg_decompress_struct cinfo;
  ErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = error_exit;
  if (setjmp(jerr.jump)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_mem_src(&cinfo, const_cast<uint8_t*>(buf), len);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);

  const int h = cinfo.output_height;
  const int w = cinfo.output_width;
  out->resize(static_cast<size_t>(h) * w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data() + static_cast<size_t>(cinfo.output_scanline) * w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  *height = h;
  *width = w;
  return true;
}

// Bilinear resize matching PIL's convention (pixel-center aligned).
void resize_bilinear(const uint8_t* src, int sh, int sw, uint8_t* dst, int dh,
                     int dw) {
  const float sy = static_cast<float>(sh) / dh;
  const float sx = static_cast<float>(sw) / dw;
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : static_cast<int>(fy);
    if (y0 > sh - 1) y0 = sh - 1;
    int y1 = y0 + 1 > sh - 1 ? sh - 1 : y0 + 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : static_cast<int>(fx);
      if (x0 > sw - 1) x0 = sw - 1;
      int x1 = x0 + 1 > sw - 1 ? sw - 1 : x0 + 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      for (int c = 0; c < 3; ++c) {
        const float v00 = src[(static_cast<size_t>(y0) * sw + x0) * 3 + c];
        const float v01 = src[(static_cast<size_t>(y0) * sw + x1) * 3 + c];
        const float v10 = src[(static_cast<size_t>(y1) * sw + x0) * 3 + c];
        const float v11 = src[(static_cast<size_t>(y1) * sw + x1) * 3 + c];
        const float top = v00 + (v01 - v00) * wx;
        const float bot = v10 + (v11 - v10) * wx;
        float v = top + (bot - top) * wy;
        dst[(static_cast<size_t>(y) * dw + x) * 3 + c] =
            static_cast<uint8_t>(v + 0.5f);
      }
    }
  }
}

}  // namespace

extern "C" {

int grl_decode_dims(const uint8_t* buf, size_t len, int* h, int* w) {
  std::vector<uint8_t> rgb;
  return decode_rgb(buf, len, &rgb, h, w) ? 0 : 1;
}

// Decode `buf` and write (out_h, out_w, 3) RGB into out_rgb.
int grl_decode_resize(const uint8_t* buf, size_t len, int out_h, int out_w,
                      uint8_t* out_rgb) {
  std::vector<uint8_t> rgb;
  int h = 0, w = 0;
  if (!decode_rgb(buf, len, &rgb, &h, &w)) return 1;
  if (h == out_h && w == out_w) {
    std::memcpy(out_rgb, rgb.data(), rgb.size());
  } else {
    resize_bilinear(rgb.data(), h, w, out_rgb, out_h, out_w);
  }
  return 0;
}

}  // extern "C"
