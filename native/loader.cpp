// pmf_tpu native data-loader core.
//
// Hot host-side path of the training pipeline: read KITTI-format
// .bin point clouds + .label files, decode (semantic = low 16 bits),
// map raw labels through a LUT, and pad into fixed-size buckets —
// for a whole batch in parallel (one thread per sample, file IO and
// memcpy release the GIL on the Python side via ctypes).
//
// The reference framework has no native code (its DataLoader workers do
// this in per-process numpy); this library removes the Python overhead
// and fork cost from the host loop that feeds the TPU.
//
// C ABI only — consumed with ctypes (no pybind11 in the image).

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <new>
#include <thread>
#include <vector>

#include <zlib.h>

#include <csetjmp>
extern "C" {
#include <jpeglib.h>
}

namespace {

// Read one scan into padded buffers. Returns number of points read
// (clamped to n_max), or -1 on error.
int64_t read_one(const char* pcd_path, const char* label_path,
                 const int32_t* label_lut, int64_t lut_size,
                 int64_t n_max, int64_t point_dim,
                 float* points_out,      // [n_max, point_dim] zeroed
                 int32_t* labels_out,    // [n_max] zeroed
                 uint8_t* valid_out) {   // [n_max] zeroed
  std::memset(points_out, 0, sizeof(float) * n_max * point_dim);
  std::memset(labels_out, 0, sizeof(int32_t) * n_max);
  std::memset(valid_out, 0, n_max);

  FILE* f = std::fopen(pcd_path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long bytes = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (bytes < 0) {  // ftell failure would otherwise wrap to huge n
    std::fclose(f);
    return -1;
  }
  int64_t n = bytes / (sizeof(float) * point_dim);
  if (n > n_max) n = n_max;
  const size_t got =
      std::fread(points_out, sizeof(float) * point_dim, n, f);
  std::fclose(f);
  if (static_cast<int64_t>(got) != n) return -1;

  if (label_path && label_path[0]) {
    FILE* lf = std::fopen(label_path, "rb");
    if (!lf) return -1;
    std::vector<int32_t> raw(n);
    const size_t lgot = std::fread(raw.data(), sizeof(int32_t), n, lf);
    std::fclose(lf);
    if (static_cast<int64_t>(lgot) != n) return -1;
    for (int64_t i = 0; i < n; ++i) {
      const int32_t sem = raw[i] & 0xFFFF;  // parser.py:170-174
      labels_out[i] = (sem >= 0 && sem < lut_size) ? label_lut[sem] : 0;
    }
  }
  std::memset(valid_out, 1, n);
  return n;
}

// ---------------------------------------------------------------- PNG
// Minimal PNG decoder for the camera images (8-bit gray/RGB/RGBA,
// non-interlaced — covers KITTI image_2 and nuScenes CAM_* frames).
// Replaces per-sample PIL decode in Python threads: PIL holds the GIL
// during filter reconstruction, so a Python thread pool decodes at
// ~1 image/core-task while this runs one real thread per sample.
// Output is written STRAIGHT into the padded float canvas /255
// (pmf_tpu.data.perspective_pipeline.pad_image semantics) — no uint8
// intermediate, no numpy pass.

inline uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

inline int paeth(int a, int b, int c) {
  const int p = a + b - c;
  const int pa = p > a ? p - a : a - p;
  const int pb = p > b ? p - b : b - p;
  const int pc = p > c ? p - c : c - p;
  if (pa <= pb && pa <= pc) return a;
  return (pb <= pc) ? b : c;
}

// Decode `path` into canvas_out [canvas_h, canvas_w, 3] float32
// (pre-zeroed by caller), image placed top-left, values /255.
// Returns 0 on success and sets (*img_h, *img_w); negative on error.
int decode_png_to_canvas(const char* path, float* canvas_out,
                         int64_t canvas_h, int64_t canvas_w,
                         int32_t* img_h, int32_t* img_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  const long fsize = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  if (fsize < 0) {  // ftell failure: -1 would wrap to a huge size_t
    std::fclose(f);
    return -1;
  }
  std::vector<uint8_t> buf(fsize);
  if (std::fread(buf.data(), 1, fsize, f) != size_t(fsize)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);

  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (fsize < 8 || std::memcmp(buf.data(), sig, 8) != 0) return -2;

  uint32_t W = 0, H = 0;
  int channels = 0;
  std::vector<uint8_t> idat;
  size_t off = 8;
  while (off + 8 <= size_t(fsize)) {
    const uint32_t len = be32(&buf[off]);
    const uint8_t* type = &buf[off + 4];
    const uint8_t* data = &buf[off + 8];
    if (off + 12 + len > size_t(fsize)) return -3;
    if (!std::memcmp(type, "IHDR", 4)) {
      if (len < 13) return -3;  // truncated IHDR: don't read past it
      W = be32(data);
      H = be32(data + 4);
      // sanity-bound the header before it sizes allocations: corrupt
      // W/H would throw bad_alloc across the ctypes boundary (fatal)
      // instead of the clean negative rc the PIL fallback expects.
      // Total-pixel bound: 65535×65535 RGBA alone is ~17 GB of raw
      // buffer; 1<<26 (67 Mpx) comfortably covers every supported
      // camera (nuScenes 1.4 Mpx, A2D2 2.3 Mpx, KITTI 0.5 Mpx).
      if (W == 0 || H == 0 || W > 65535 || H > 65535 ||
          uint64_t(W) * uint64_t(H) > (uint64_t(1) << 26))
        return -4;
      const int bit_depth = data[8], color = data[9], interlace = data[12];
      if (bit_depth != 8 || interlace != 0) return -4;  // uncommon
      switch (color) {
        case 0: channels = 1; break;   // gray
        case 2: channels = 3; break;   // RGB
        case 4: channels = 2; break;   // gray+alpha
        case 6: channels = 4; break;   // RGBA
        default: return -4;            // palette unsupported
      }
    } else if (!std::memcmp(type, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!std::memcmp(type, "IEND", 4)) {
      break;
    }
    off += 12 + len;
  }
  if (!W || !H || !channels || idat.empty()) return -5;

  const size_t stride = size_t(W) * channels;
  std::vector<uint8_t> raw(H * (stride + 1));
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size())
    return -6;

  // unfilter in place row by row, then write the float canvas
  const int64_t out_h = std::min<int64_t>(H, canvas_h);
  const int64_t out_w = std::min<int64_t>(W, canvas_w);
  std::vector<uint8_t> prev(stride, 0);
  std::vector<uint8_t> cur(stride);
  for (uint32_t y = 0; y < H; ++y) {
    const uint8_t* row = &raw[y * (stride + 1)];
    const int filter = row[0];
    const uint8_t* src = row + 1;
    switch (filter) {
      case 0:
        std::memcpy(cur.data(), src, stride);
        break;
      case 1:  // Sub
        for (size_t i = 0; i < stride; ++i)
          cur[i] = src[i] + (i >= size_t(channels) ? cur[i - channels] : 0);
        break;
      case 2:  // Up
        for (size_t i = 0; i < stride; ++i) cur[i] = src[i] + prev[i];
        break;
      case 3:  // Average
        for (size_t i = 0; i < stride; ++i) {
          const int a = i >= size_t(channels) ? cur[i - channels] : 0;
          cur[i] = src[i] + uint8_t((a + prev[i]) >> 1);
        }
        break;
      case 4:  // Paeth
        for (size_t i = 0; i < stride; ++i) {
          const int a = i >= size_t(channels) ? cur[i - channels] : 0;
          const int c = i >= size_t(channels) ? prev[i - channels] : 0;
          cur[i] = src[i] + uint8_t(paeth(a, prev[i], c));
        }
        break;
      default:
        return -7;
    }
    if (int64_t(y) < out_h) {
      float* dst = canvas_out + (int64_t(y) * canvas_w) * 3;
      if (channels >= 3) {
        for (int64_t x = 0; x < out_w; ++x) {
          const uint8_t* px = &cur[size_t(x) * channels];
          // divide (not multiply-by-reciprocal): bit-exact with the
          // numpy pad_image path so the two loaders are interchangeable
          dst[x * 3 + 0] = px[0] / 255.0f;
          dst[x * 3 + 1] = px[1] / 255.0f;
          dst[x * 3 + 2] = px[2] / 255.0f;
        }
      } else {  // grayscale → replicated
        for (int64_t x = 0; x < out_w; ++x) {
          const float v = cur[size_t(x) * channels] / 255.0f;
          dst[x * 3 + 0] = v;
          dst[x * 3 + 1] = v;
          dst[x * 3 + 2] = v;
        }
      }
    }
    std::swap(prev, cur);
  }
  *img_h = int32_t(std::min<int64_t>(H, canvas_h));
  *img_w = int32_t(std::min<int64_t>(W, canvas_w));
  return 0;
}

// ---------------------------------------------------------------- JPEG
// nuScenes CAM_* frames are JPEG (the PNG-only round-4 decoder left the
// flagship nuScenes train path decoding in PIL threads). libjpeg is in
// the base image; we use its error-manager longjmp protocol so a corrupt
// file returns a negative rc instead of calling exit().

struct JpegErrorMgr {
  jpeg_error_mgr pub;
  std::jmp_buf jump;
};

void jpeg_error_exit(j_common_ptr cinfo) {
  JpegErrorMgr* err = reinterpret_cast<JpegErrorMgr*>(cinfo->err);
  std::longjmp(err->jump, 1);
}

int decode_jpeg_to_canvas(const char* path, float* canvas_out,
                          int64_t canvas_h, int64_t canvas_w,
                          int32_t* img_h, int32_t* img_w) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  jpeg_decompress_struct cinfo;
  JpegErrorMgr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_exit;
  std::vector<uint8_t> row;
  if (setjmp(jerr.jump)) {  // any libjpeg fatal error lands here
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -8;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -8;
  }
  cinfo.out_color_space = JCS_RGB;  // gray/YCbCr/CMYK → RGB
  jpeg_start_decompress(&cinfo);
  const uint32_t W = cinfo.output_width, H = cinfo.output_height;
  if (W == 0 || H == 0 || uint64_t(W) * uint64_t(H) > (uint64_t(1) << 26) ||
      cinfo.output_components != 3) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(f);
    return -4;
  }
  row.resize(size_t(W) * 3);
  const int64_t out_h = std::min<int64_t>(H, canvas_h);
  const int64_t out_w = std::min<int64_t>(W, canvas_w);
  while (cinfo.output_scanline < H) {
    uint8_t* rows[1] = {row.data()};
    jpeg_read_scanlines(&cinfo, rows, 1);
    const int64_t y = int64_t(cinfo.output_scanline) - 1;
    if (y < out_h) {
      float* dst = canvas_out + (y * canvas_w) * 3;
      for (int64_t x = 0; x < out_w; ++x) {
        dst[x * 3 + 0] = row[size_t(x) * 3 + 0] / 255.0f;
        dst[x * 3 + 1] = row[size_t(x) * 3 + 1] / 255.0f;
        dst[x * 3 + 2] = row[size_t(x) * 3 + 2] / 255.0f;
      }
    }
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(f);
  *img_h = int32_t(out_h);
  *img_w = int32_t(out_w);
  return 0;
}

// Sniff the signature and dispatch PNG/JPEG; bad_alloc (e.g. from a
// header that passed the bounds but exceeds RAM) becomes a clean rc so
// the exception never crosses the ctypes boundary.
int decode_image_to_canvas(const char* path, float* canvas_out,
                           int64_t canvas_h, int64_t canvas_w,
                           int32_t* img_h, int32_t* img_w) {
  uint8_t magic[2] = {0, 0};
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  const size_t got = std::fread(magic, 1, 2, f);
  std::fclose(f);
  if (got != 2) return -1;
  try {
    if (magic[0] == 0xFF && magic[1] == 0xD8)
      return decode_jpeg_to_canvas(path, canvas_out, canvas_h, canvas_w,
                                   img_h, img_w);
    return decode_png_to_canvas(path, canvas_out, canvas_h, canvas_w,
                                img_h, img_w);
  } catch (const std::bad_alloc&) {
    return -9;
  }
}

}  // namespace

extern "C" {

// Parallel batch read. paths are arrays of B C-strings; outputs are
// contiguous [B, ...] buffers. Returns 0 on success, else the number of
// failed samples. counts_out[b] = points read for sample b (-1 error).
int read_scan_batch(const char** pcd_paths, const char** label_paths,
                    int64_t batch, const int32_t* label_lut,
                    int64_t lut_size, int64_t n_max, int64_t point_dim,
                    float* points_out, int32_t* labels_out,
                    uint8_t* valid_out, int64_t* counts_out) {
  std::atomic<int> failures{0};
  std::vector<std::thread> threads;
  threads.reserve(batch);
  for (int64_t b = 0; b < batch; ++b) {
    threads.emplace_back([&, b] {
      const int64_t n = read_one(
          pcd_paths[b], label_paths ? label_paths[b] : nullptr, label_lut,
          lut_size, n_max, point_dim, points_out + b * n_max * point_dim,
          labels_out + b * n_max, valid_out + b * n_max);
      counts_out[b] = n;
      if (n < 0) failures.fetch_add(1);
    });
  }
  for (auto& t : threads) t.join();
  return failures.load();
}

// Single-scan variant.
int64_t read_scan(const char* pcd_path, const char* label_path,
                  const int32_t* label_lut, int64_t lut_size, int64_t n_max,
                  int64_t point_dim, float* points_out, int32_t* labels_out,
                  uint8_t* valid_out) {
  return read_one(pcd_path, label_path, label_lut, lut_size, n_max,
                  point_dim, points_out, labels_out, valid_out);
}

// Decode one PNG or JPEG (signature-sniffed) onto a pre-zeroed float32
// canvas [canvas_h, canvas_w, 3], /255, image top-left (pad_image
// semantics). 0 on success.
int decode_image(const char* path, float* canvas_out, int64_t canvas_h,
                 int64_t canvas_w, int32_t* img_h, int32_t* img_w) {
  std::memset(canvas_out, 0, sizeof(float) * canvas_h * canvas_w * 3);
  return decode_image_to_canvas(path, canvas_out, canvas_h, canvas_w,
                                img_h, img_w);
}

// Back-compat alias (pre-JPEG builds exported decode_png only).
int decode_png(const char* path, float* canvas_out, int64_t canvas_h,
               int64_t canvas_w, int32_t* img_h, int32_t* img_w) {
  return decode_image(path, canvas_out, canvas_h, canvas_w, img_h, img_w);
}

// One full PV sample in one call (point cloud + labels + image), so the
// Python host loop is a single GIL-dropping ctypes call per sample.
int64_t read_scan_full(const char* pcd_path, const char* label_path,
                       const char* image_path, const int32_t* label_lut,
                       int64_t lut_size, int64_t n_max, int64_t point_dim,
                       float* points_out, int32_t* labels_out,
                       uint8_t* valid_out, float* canvas_out,
                       int64_t canvas_h, int64_t canvas_w, int32_t* img_h,
                       int32_t* img_w) {
  const int64_t n = read_one(pcd_path, label_path, label_lut, lut_size,
                             n_max, point_dim, points_out, labels_out,
                             valid_out);
  if (n < 0) return -1;
  std::memset(canvas_out, 0, sizeof(float) * canvas_h * canvas_w * 3);
  if (decode_image_to_canvas(image_path, canvas_out, canvas_h, canvas_w,
                             img_h, img_w))
    return -2;
  return n;
}

}  // extern "C"
