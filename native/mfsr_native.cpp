// Native data loader for multi_frame_super_resolution_tpu.
//
// The reference's host runtime is C++ (cv::imread burst loading,
// multi_frame_sr.cpp:167-174; TIFF pair loading, polar_defog.cpp:77-124).
// This library is its TPU-framework equivalent: libpng/libjpeg decoding
// with multi-threaded burst loads, exposed through a C ABI consumed via
// ctypes (multi_frame_super_resolution_tpu/data/native.py). Output is
// float32 RGB in [0, 1], HWC — the framework's canonical image format.
//
// Build: `make -C native` (produces libmfsr_native.so).

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <csetjmp>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

constexpr int kErrOpen = -1;
constexpr int kErrFormat = -2;
constexpr int kErrShape = -3;

struct ImageU16 {
  int h = 0, w = 0, c = 0;
  int bit_depth = 8;
  std::vector<uint16_t> data;  // interleaved, native channel count
};

bool has_suffix(const std::string& s, const char* suf) {
  std::string lower;
  lower.reserve(s.size());
  for (char ch : s) lower.push_back(static_cast<char>(::tolower(ch)));
  const std::string t(suf);
  return lower.size() >= t.size() &&
         lower.compare(lower.size() - t.size(), t.size(), t) == 0;
}

int decode_png(const char* path, ImageU16* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) {
    std::fclose(fp);
    return kErrFormat;
  }
  png_infop info = png_create_info_struct(png);
  if (!info || setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return kErrFormat;
  }
  png_init_io(png, fp);
  png_read_info(png, info);

  png_uint_32 w = png_get_image_width(png, info);
  png_uint_32 h = png_get_image_height(png, info);
  int bit_depth = png_get_bit_depth(png, info);
  int color_type = png_get_color_type(png, info);

  if (color_type == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color_type == PNG_COLOR_TYPE_GRAY && bit_depth < 8)
    png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (bit_depth == 16) png_set_swap(png);  // little-endian u16
  png_read_update_info(png, info);

  int channels = png_get_channels(png, info);
  bit_depth = png_get_bit_depth(png, info);
  img->h = static_cast<int>(h);
  img->w = static_cast<int>(w);
  img->c = channels;
  img->bit_depth = bit_depth;
  img->data.resize(static_cast<size_t>(h) * w * channels);

  std::vector<png_bytep> rows(h);
  std::vector<uint8_t> raw;
  if (bit_depth == 16) {
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = reinterpret_cast<png_bytep>(img->data.data() +
                                            static_cast<size_t>(y) * w * channels);
  } else {
    raw.resize(static_cast<size_t>(h) * w * channels);
    for (png_uint_32 y = 0; y < h; ++y)
      rows[y] = raw.data() + static_cast<size_t>(y) * w * channels;
  }
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  std::fclose(fp);

  if (bit_depth != 16) {
    for (size_t i = 0; i < raw.size(); ++i) img->data[i] = raw[i];
  }
  return 0;
}

struct JpegErr {
  jpeg_error_mgr mgr;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

int decode_jpeg(const char* path, ImageU16* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.mgr);
  jerr.mgr.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return kErrFormat;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, fp);
  jpeg_read_header(&cinfo, TRUE);
  jpeg_start_decompress(&cinfo);

  img->h = static_cast<int>(cinfo.output_height);
  img->w = static_cast<int>(cinfo.output_width);
  img->c = cinfo.output_components;
  img->bit_depth = 8;
  img->data.resize(static_cast<size_t>(img->h) * img->w * img->c);

  std::vector<uint8_t> row(static_cast<size_t>(img->w) * img->c);
  JSAMPROW rowp = row.data();
  while (cinfo.output_scanline < cinfo.output_height) {
    int y = static_cast<int>(cinfo.output_scanline);
    jpeg_read_scanlines(&cinfo, &rowp, 1);
    uint16_t* dst = img->data.data() + static_cast<size_t>(y) * img->w * img->c;
    for (size_t i = 0; i < row.size(); ++i) dst[i] = row[i];
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  std::fclose(fp);
  return 0;
}

// ---- baseline TIFF (strip-based, uncompressed, 8/16-bit, chunky) ----
// Covers the reference defog app's 16-bit TIFF pair inputs
// (polar_defog.cpp:80-81, read there with cv::IMREAD_ANYDEPTH).

struct TiffReader {
  std::vector<uint8_t> buf;
  bool little = true;

  uint16_t u16(size_t off) const {
    if (off + 2 > buf.size()) return 0;
    return little ? static_cast<uint16_t>(buf[off] | (buf[off + 1] << 8))
                  : static_cast<uint16_t>((buf[off] << 8) | buf[off + 1]);
  }
  uint32_t u32(size_t off) const {
    if (off + 4 > buf.size()) return 0;
    return little ? (static_cast<uint32_t>(buf[off]) |
                     (static_cast<uint32_t>(buf[off + 1]) << 8) |
                     (static_cast<uint32_t>(buf[off + 2]) << 16) |
                     (static_cast<uint32_t>(buf[off + 3]) << 24))
                  : ((static_cast<uint32_t>(buf[off]) << 24) |
                     (static_cast<uint32_t>(buf[off + 1]) << 16) |
                     (static_cast<uint32_t>(buf[off + 2]) << 8) |
                     static_cast<uint32_t>(buf[off + 3]));
  }
};

// read entry value(s): TIFF types 1=BYTE 3=SHORT 4=LONG; values inline
// when they fit in 4 bytes, else at the pointed offset
std::vector<uint32_t> tiff_values(const TiffReader& t, size_t entry) {
  const uint16_t type = t.u16(entry + 2);
  const uint32_t count = t.u32(entry + 4);
  const size_t unit = type == 3 ? 2 : (type == 4 ? 4 : 1);
  if (type != 1 && type != 3 && type != 4) return {};
  const size_t total = unit * count;
  size_t off = entry + 8;
  if (total > 4) off = t.u32(entry + 8);
  std::vector<uint32_t> vals;
  vals.reserve(count);
  for (uint32_t i = 0; i < count; ++i) {
    if (unit == 2)
      vals.push_back(t.u16(off + 2 * i));
    else if (unit == 4)
      vals.push_back(t.u32(off + 4 * i));
    else
      vals.push_back(off + i < t.buf.size() ? t.buf[off + i] : 0);
  }
  return vals;
}

int decode_tiff(const char* path, ImageU16* img) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  TiffReader t;
  std::fseek(fp, 0, SEEK_END);
  const long size = std::ftell(fp);
  std::fseek(fp, 0, SEEK_SET);
  if (size <= 8) {
    std::fclose(fp);
    return kErrFormat;
  }
  t.buf.resize(static_cast<size_t>(size));
  const size_t got = std::fread(t.buf.data(), 1, t.buf.size(), fp);
  std::fclose(fp);
  if (got != t.buf.size()) return kErrFormat;

  if (t.buf[0] == 'I' && t.buf[1] == 'I')
    t.little = true;
  else if (t.buf[0] == 'M' && t.buf[1] == 'M')
    t.little = false;
  else
    return kErrFormat;
  if (t.u16(2) != 42) return kErrFormat;

  const uint32_t ifd = t.u32(4);
  const uint16_t n_entries = t.u16(ifd);
  uint32_t width = 0, height = 0, bits = 8, compression = 1, spp = 1;
  uint32_t rows_per_strip = 0xFFFFFFFFu, planar = 1;
  std::vector<uint32_t> strip_offsets, strip_counts;
  for (uint16_t i = 0; i < n_entries; ++i) {
    const size_t e = ifd + 2 + 12 * static_cast<size_t>(i);
    const uint16_t tag = t.u16(e);
    const auto vals = tiff_values(t, e);
    if (vals.empty()) continue;
    switch (tag) {
      case 256: width = vals[0]; break;
      case 257: height = vals[0]; break;
      case 258: bits = vals[0]; break;
      case 259: compression = vals[0]; break;
      case 273: strip_offsets = vals; break;
      case 277: spp = vals[0]; break;
      case 278: rows_per_strip = vals[0]; break;
      case 279: strip_counts = vals; break;
      case 284: planar = vals[0]; break;
      default: break;
    }
  }
  if (!width || !height || strip_offsets.empty()) return kErrFormat;
  if (compression != 1 || planar != 1) return kErrFormat;  // baseline only
  if (bits != 8 && bits != 16) return kErrFormat;
  if (spp != 1 && spp != 3 && spp != 4) return kErrFormat;

  img->h = static_cast<int>(height);
  img->w = static_cast<int>(width);
  img->c = static_cast<int>(spp > 3 ? 3 : spp);
  img->bit_depth = static_cast<int>(bits);
  img->data.assign(static_cast<size_t>(height) * width * img->c, 0);

  const size_t bytes_per_px = (bits / 8) * spp;
  const size_t row_bytes = bytes_per_px * width;
  uint32_t row = 0;
  for (size_t s = 0; s < strip_offsets.size() && row < height; ++s) {
    size_t off = strip_offsets[s];
    const uint32_t rows_here =
        rows_per_strip == 0xFFFFFFFFu
            ? height
            : std::min<uint32_t>(rows_per_strip, height - row);
    if (s < strip_counts.size() &&
        strip_counts[s] < rows_here * row_bytes)
      return kErrFormat;
    for (uint32_t r = 0; r < rows_here && row < height; ++r, ++row) {
      if (off + row_bytes > t.buf.size()) return kErrFormat;
      uint16_t* dst =
          img->data.data() + static_cast<size_t>(row) * width * img->c;
      for (uint32_t x = 0; x < width; ++x) {
        for (int ch = 0; ch < img->c; ++ch) {
          const size_t po = off + x * bytes_per_px + ch * (bits / 8);
          dst[x * img->c + ch] =
              bits == 16 ? t.u16(po) : static_cast<uint16_t>(t.buf[po]);
        }
      }
      off += row_bytes;
    }
  }
  return 0;
}

int decode_any(const char* path, ImageU16* img) {
  const std::string p(path);
  if (has_suffix(p, ".png")) return decode_png(path, img);
  if (has_suffix(p, ".jpg") || has_suffix(p, ".jpeg")) return decode_jpeg(path, img);
  if (has_suffix(p, ".tif") || has_suffix(p, ".tiff")) return decode_tiff(path, img);
  // try by content
  if (decode_png(path, img) == 0) return 0;
  if (decode_tiff(path, img) == 0) return 0;
  return decode_jpeg(path, img);
}

// convert native channels to the requested count (1 = gray, 3 = RGB) and
// normalize to float [0, 1]
void to_float(const ImageU16& img, float* out, int want_c) {
  const float scale = img.bit_depth == 16 ? 1.0f / 65535.0f : 1.0f / 255.0f;
  const size_t n = static_cast<size_t>(img.h) * img.w;
  for (size_t i = 0; i < n; ++i) {
    const uint16_t* px = img.data.data() + i * img.c;
    float r, g, b;
    if (img.c >= 3) {
      r = px[0] * scale;
      g = px[1] * scale;
      b = px[2] * scale;
    } else {
      r = g = b = px[0] * scale;
    }
    if (want_c == 1) {
      // BT.601 luma, matching ops.color.rgb_to_gray
      out[i] = 0.299f * r + 0.587f * g + 0.114f * b;
    } else {
      out[i * 3 + 0] = r;
      out[i * 3 + 1] = g;
      out[i * 3 + 2] = b;
    }
  }
}

}  // namespace

extern "C" {

// Probe image dimensions from the header only (no pixel decode): fills
// h, w, channels, bit_depth. Returns 0 on success.
int mfsr_probe(const char* path, int* h, int* w, int* c, int* bit_depth) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  uint8_t sig[8] = {0};
  size_t got = std::fread(sig, 1, 8, fp);

  static const uint8_t png_sig[8] = {0x89, 'P', 'N', 'G', 0x0D, 0x0A, 0x1A, 0x0A};
  if (got == 8 && std::memcmp(sig, png_sig, 8) == 0) {
    // IHDR is always the first chunk: 4B length + "IHDR" + 13B data
    uint8_t hdr[25];
    if (std::fread(hdr, 1, 25, fp) != 25 || std::memcmp(hdr + 4, "IHDR", 4) != 0) {
      std::fclose(fp);
      return kErrFormat;
    }
    std::fclose(fp);
    auto be32 = [](const uint8_t* p) {
      return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
             (uint32_t(p[2]) << 8) | uint32_t(p[3]);
    };
    *w = static_cast<int>(be32(hdr + 8));
    *h = static_cast<int>(be32(hdr + 12));
    *bit_depth = hdr[16];
    switch (hdr[17]) {  // color type
      case 0: *c = 1; break;
      case 2: *c = 3; break;
      case 3: *c = 3; break;  // palette expands to RGB
      case 4: *c = 2; break;
      case 6: *c = 4; break;
      default: return kErrFormat;
    }
    return 0;
  }

  if (got >= 2 && sig[0] == 0xFF && sig[1] == 0xD8) {  // JPEG SOI
    std::rewind(fp);
    jpeg_decompress_struct cinfo;
    JpegErr jerr;
    cinfo.err = jpeg_std_error(&jerr.mgr);
    jerr.mgr.error_exit = jpeg_err_exit;
    if (setjmp(jerr.jb)) {
      jpeg_destroy_decompress(&cinfo);
      std::fclose(fp);
      return kErrFormat;
    }
    jpeg_create_decompress(&cinfo);
    jpeg_stdio_src(&cinfo, fp);
    jpeg_read_header(&cinfo, TRUE);
    *w = static_cast<int>(cinfo.image_width);
    *h = static_cast<int>(cinfo.image_height);
    *c = cinfo.num_components;
    *bit_depth = 8;
    jpeg_destroy_decompress(&cinfo);
    std::fclose(fp);
    return 0;
  }

  std::fclose(fp);

  // TIFF: the whole file is memory-read anyway; decode and report dims
  {
    ImageU16 img;
    if (decode_tiff(path, &img) == 0) {
      *h = img.h;
      *w = img.w;
      *c = img.c;
      *bit_depth = img.bit_depth;
      return 0;
    }
  }
  return kErrFormat;
}

// Decode one image into a caller-allocated float32 buffer of shape
// (h, w, want_c), values in [0, 1]. want_c: 1 (gray) or 3 (RGB).
int mfsr_read_image_f32(const char* path, float* out, int h, int w, int want_c) {
  ImageU16 img;
  int rc = decode_any(path, &img);
  if (rc != 0) return rc;
  if (img.h != h || img.w != w) return kErrShape;
  to_float(img, out, want_c);
  return 0;
}

// Threaded burst load: n same-shape frames into (n, h, w, want_c).
// Returns 0, or the first nonzero per-frame error.
int mfsr_read_burst_f32(const char** paths, int n, float* out, int h, int w,
                        int want_c) {
  std::vector<int> rcs(n, 0);
  std::vector<std::thread> threads;
  threads.reserve(n);
  const size_t frame = static_cast<size_t>(h) * w * want_c;
  for (int i = 0; i < n; ++i) {
    threads.emplace_back([&, i]() {
      rcs[i] = mfsr_read_image_f32(paths[i], out + frame * i, h, w, want_c);
    });
  }
  for (auto& t : threads) t.join();
  for (int rc : rcs)
    if (rc != 0) return rc;
  return 0;
}

// Generic packed 16-bit RAW reader (the reference's PEF byte-read stub,
// main.cpp:346-368, generalized): reads h*w little-endian u16 samples at
// `offset` bytes into a float buffer normalized by `max_val`.
int mfsr_read_raw_u16(const char* path, float* out, int h, int w, long offset,
                      float max_val) {
  FILE* fp = std::fopen(path, "rb");
  if (!fp) return kErrOpen;
  if (std::fseek(fp, offset, SEEK_SET) != 0) {
    std::fclose(fp);
    return kErrFormat;
  }
  const size_t n = static_cast<size_t>(h) * w;
  std::vector<uint16_t> buf(n);
  size_t got = std::fread(buf.data(), sizeof(uint16_t), n, fp);
  std::fclose(fp);
  if (got != n) return kErrShape;
  const float inv = 1.0f / max_val;
  for (size_t i = 0; i < n; ++i) out[i] = buf[i] * inv;
  return 0;
}

}  // extern "C"
