// Native frame loader for gslam_tpu.
//
// TPU-native counterpart of the reference's per-frame host pipeline
// (/root/reference/gslam/data.py:167-207): PNG decode (libpng), bilinear
// undistortion remap, and float conversion run in C++ with the GIL released
// (ctypes drops the GIL for the duration of the call), so the sensor-stream
// thread overlaps fully with tracking dispatch. The reference instead pays
// PIL + cv2 + torch-copy costs inside a separate OS process.
//
// C ABI only; bound from Python via ctypes (pybind11 not available).

#include <png.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <vector>

extern "C" {

// Decode an 8-bit RGB(A) or 16-bit grayscale PNG.
// Returns 0 on success. Fills *w/*h/*channels/*bit_depth; if out != null,
// writes row-major packed samples (native endianness for 16-bit).
int gs_png_info(const char* path, int* w, int* h, int* channels,
                int* bit_depth);
int gs_png_decode(const char* path, uint8_t* out, int64_t out_bytes);

// Decode an 8-bit RGB PNG and bilinearly remap it with map_x/map_y
// (cv2.initUndistortRectifyMap convention), cropping to roi, writing
// float32 RGB in [0,1]. Returns 0 on success.
int gs_load_rgb_remap_f32(const char* path, const float* map_x,
                          const float* map_y, int src_w, int src_h,
                          int roi_x, int roi_y, int roi_w, int roi_h,
                          float* out);

// Decode a 16-bit depth PNG, crop to roi, scale by 1/depth_scale, write f32.
int gs_load_depth_f32(const char* path, int roi_x, int roi_y, int roi_w,
                      int roi_h, float depth_scale, float* out);

uint8_t gs_crc8(const uint8_t* data, int64_t n);
}

namespace {

struct PngImage {
  std::vector<uint8_t> data;
  int w = 0, h = 0, channels = 0, bit_depth = 0;
};

bool decode_png(const char* path, PngImage* img) {
  FILE* fp = fopen(path, "rb");
  if (!fp) return false;
  png_byte header[8];
  if (fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
    fclose(fp);
    return false;
  }
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png_create_info_struct(png);
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(fp);
    return false;
  }
  png_init_io(png, fp);
  png_set_sig_bytes(png, 8);
  png_read_info(png, info);

  int color = png_get_color_type(png, info);
  img->bit_depth = png_get_bit_depth(png, info);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && img->bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (img->bit_depth == 16) png_set_swap(png);  // little-endian samples
  png_read_update_info(png, info);

  img->w = png_get_image_width(png, info);
  img->h = png_get_image_height(png, info);
  img->channels = png_get_channels(png, info);
  img->bit_depth = png_get_bit_depth(png, info);
  size_t row_bytes = png_get_rowbytes(png, info);
  img->data.resize(row_bytes * img->h);
  std::vector<png_bytep> rows(img->h);
  for (int y = 0; y < img->h; ++y) rows[y] = img->data.data() + y * row_bytes;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(fp);
  return true;
}

}  // namespace

int gs_png_info(const char* path, int* w, int* h, int* channels,
                int* bit_depth) {
  PngImage img;
  if (!decode_png(path, &img)) return 1;
  *w = img.w;
  *h = img.h;
  *channels = img.channels;
  *bit_depth = img.bit_depth;
  return 0;
}

int gs_png_decode(const char* path, uint8_t* out, int64_t out_bytes) {
  PngImage img;
  if (!decode_png(path, &img)) return 1;
  if ((int64_t)img.data.size() > out_bytes) return 2;
  std::memcpy(out, img.data.data(), img.data.size());
  return 0;
}

int gs_load_rgb_remap_f32(const char* path, const float* map_x,
                          const float* map_y, int src_w, int src_h,
                          int roi_x, int roi_y, int roi_w, int roi_h,
                          float* out) {
  PngImage img;
  if (!decode_png(path, &img)) return 1;
  if (img.bit_depth != 8 || img.channels < 3) return 3;
  if (img.w != src_w || img.h != src_h) return 4;
  const int ch = img.channels;
  const uint8_t* src = img.data.data();
  constexpr float kInv255 = 1.0f / 255.0f;

  for (int y = 0; y < roi_h; ++y) {
    const int sy = y + roi_y;
    for (int x = 0; x < roi_w; ++x) {
      const int sx = x + roi_x;
      // map_x/map_y give, for each *undistorted* pixel, the source
      // coordinates in the distorted image (cv2.remap semantics).
      float fx = map_x[sy * src_w + sx];
      float fy = map_y[sy * src_w + sx];
      float r = 0, g = 0, b = 0;
      if (fx >= 0 && fy >= 0 && fx <= src_w - 1 && fy <= src_h - 1) {
        int x0 = (int)fx, y0 = (int)fy;
        int x1 = x0 + 1 < src_w ? x0 + 1 : x0;
        int y1 = y0 + 1 < src_h ? y0 + 1 : y0;
        float dx = fx - x0, dy = fy - y0;
        const float w00 = (1 - dx) * (1 - dy), w01 = dx * (1 - dy);
        const float w10 = (1 - dx) * dy, w11 = dx * dy;
        const uint8_t* p00 = src + (y0 * src_w + x0) * ch;
        const uint8_t* p01 = src + (y0 * src_w + x1) * ch;
        const uint8_t* p10 = src + (y1 * src_w + x0) * ch;
        const uint8_t* p11 = src + (y1 * src_w + x1) * ch;
        r = w00 * p00[0] + w01 * p01[0] + w10 * p10[0] + w11 * p11[0];
        g = w00 * p00[1] + w01 * p01[1] + w10 * p10[1] + w11 * p11[1];
        b = w00 * p00[2] + w01 * p01[2] + w10 * p10[2] + w11 * p11[2];
      }
      float* o = out + (y * roi_w + x) * 3;
      o[0] = r * kInv255;
      o[1] = g * kInv255;
      o[2] = b * kInv255;
    }
  }
  return 0;
}

int gs_load_depth_f32(const char* path, int roi_x, int roi_y, int roi_w,
                      int roi_h, float depth_scale, float* out) {
  PngImage img;
  if (!decode_png(path, &img)) return 1;
  if (img.bit_depth != 16 || img.channels != 1) return 3;
  const uint16_t* src = reinterpret_cast<const uint16_t*>(img.data.data());
  const float inv = 1.0f / depth_scale;
  for (int y = 0; y < roi_h; ++y) {
    const uint16_t* row = src + (y + roi_y) * img.w + roi_x;
    float* o = out + y * roi_w;
    for (int x = 0; x < roi_w; ++x) o[x] = row[x] * inv;
  }
  return 0;
}

// CRC-8 (poly 0x07, init 0x00) — the teleop packet checksum
// (the reference vendors a Python CRC-8; gslam/crc8.py).
uint8_t gs_crc8(const uint8_t* data, int64_t n) {
  uint8_t crc = 0;
  for (int64_t i = 0; i < n; ++i) {
    crc ^= data[i];
    for (int b = 0; b < 8; ++b)
      crc = (crc & 0x80) ? (uint8_t)((crc << 1) ^ 0x07) : (uint8_t)(crc << 1);
  }
  return crc;
}
