// Native data-loader hot path: threaded JPEG decode + crop/flip + .npy reads.
//
// Role (SURVEY.md §2.4 / reference dataset CPU workers): the reference's
// torch DataLoader worker pool decodes JPEGs and crops in Python/PIL; this
// C++ library does decode (libjpeg), short-side box upscale (bilinear),
// center/random crop, hflip, and float32 .npy loading with a std::thread
// pool, exposed over a C ABI consumed via ctypes
// (instarevive_tpu/data/native_loader.py). Falls back to the Python path
// when the shared library is absent.
//
// Build: python native/build.py   (g++ -O3 -shared -fPIC -ljpeg)

#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <cstdint>
#include <string>
#include <vector>
#include <thread>
#include <random>
#include <algorithm>

#include <jpeglib.h>
#include <csetjmp>

extern "C" {

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

static void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* err = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(err->jb, 1);
}

// Decode a JPEG file to RGB8. Returns malloc'd buffer (caller frees via
// fl_free) or nullptr on failure.
static unsigned char* decode_jpeg(const char* path, int* w, int* h) {
  FILE* f = fopen(path, "rb");
  if (!f) return nullptr;

  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  unsigned char* buf = nullptr;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    free(buf);
    return nullptr;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  *w = cinfo.output_width;
  *h = cinfo.output_height;
  buf = (unsigned char*)malloc((size_t)(*w) * (*h) * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row = buf + (size_t)cinfo.output_scanline * (*w) * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return buf;
}

void fl_free(void* p) { free(p); }

// Bilinear resize RGB8 (used for the short-side box upscale).
static void resize_bilinear(const unsigned char* src, int sw, int sh,
                            unsigned char* dst, int dw, int dh) {
  for (int y = 0; y < dh; ++y) {
    float fy = (y + 0.5f) * sh / dh - 0.5f;
    int y0 = std::max(0, std::min(sh - 1, (int)fy));
    int y1 = std::min(sh - 1, y0 + 1);
    float wy = std::max(0.0f, std::min(1.0f, fy - y0));
    for (int x = 0; x < dw; ++x) {
      float fx = (x + 0.5f) * sw / dw - 0.5f;
      int x0 = std::max(0, std::min(sw - 1, (int)fx));
      int x1 = std::min(sw - 1, x0 + 1);
      float wx = std::max(0.0f, std::min(1.0f, fx - x0));
      for (int c = 0; c < 3; ++c) {
        float v00 = src[((size_t)y0 * sw + x0) * 3 + c];
        float v01 = src[((size_t)y0 * sw + x1) * 3 + c];
        float v10 = src[((size_t)y1 * sw + x0) * 3 + c];
        float v11 = src[((size_t)y1 * sw + x1) * 3 + c];
        float v = v00 * (1 - wy) * (1 - wx) + v01 * (1 - wy) * wx +
                  v10 * wy * (1 - wx) + v11 * wy * wx;
        dst[((size_t)y * dw + x) * 3 + c] = (unsigned char)(v + 0.5f);
      }
    }
  }
}

// Decode one JPEG, box-upscale short side to >= out_size, crop (0=center,
// 1=random with `seed`), optional hflip; writes out_size*out_size*3 RGB8.
// Returns 0 on success.
int fl_decode_crop(const char* path, int out_size, int crop_mode,
                   unsigned long long seed, int hflip, unsigned char* out) {
  int w = 0, h = 0;
  unsigned char* img = decode_jpeg(path, &w, &h);
  if (!img) return 1;

  unsigned char* work = img;
  int ww = w, wh = h;
  std::vector<unsigned char> resized;
  int short_side = std::min(w, h);
  if (short_side < out_size) {
    float r = (float)out_size / short_side;
    int nw = (int)std::ceil(w * r), nh = (int)std::ceil(h * r);
    resized.resize((size_t)nw * nh * 3);
    resize_bilinear(img, w, h, resized.data(), nw, nh);
    work = resized.data();
    ww = nw;
    wh = nh;
  }

  std::mt19937_64 rng(seed);
  int max_x = ww - out_size, max_y = wh - out_size;
  int x0, y0;
  if (crop_mode == 1) {
    x0 = max_x > 0 ? (int)(rng() % (max_x + 1)) : 0;
    y0 = max_y > 0 ? (int)(rng() % (max_y + 1)) : 0;
  } else {
    x0 = max_x / 2;
    y0 = max_y / 2;
  }
  for (int y = 0; y < out_size; ++y) {
    const unsigned char* srow = work + ((size_t)(y0 + y) * ww + x0) * 3;
    unsigned char* drow = out + (size_t)y * out_size * 3;
    if (hflip) {
      for (int x = 0; x < out_size; ++x)
        memcpy(drow + (size_t)x * 3, srow + (size_t)(out_size - 1 - x) * 3, 3);
    } else {
      memcpy(drow, srow, (size_t)out_size * 3);
    }
  }
  free(img);
  return 0;
}

// Threaded batch decode: paths as \n-joined string; per-sample seeds/flips.
int fl_batch_decode(const char* joined_paths, int n, int out_size,
                    int crop_mode, const unsigned long long* seeds,
                    const int* hflips, unsigned char* out, int num_threads) {
  std::vector<std::string> paths;
  {
    const char* p = joined_paths;
    for (int i = 0; i < n; ++i) {
      const char* e = strchr(p, '\n');
      size_t len = e ? (size_t)(e - p) : strlen(p);
      paths.emplace_back(p, len);
      p += len + (e ? 1 : 0);
    }
  }
  std::vector<int> status(n, 0);
  std::vector<std::thread> workers;
  int nt = std::max(1, std::min(num_threads, n));
  size_t stride = (size_t)out_size * out_size * 3;
  for (int t = 0; t < nt; ++t) {
    workers.emplace_back([&, t]() {
      for (int i = t; i < n; i += nt) {
        status[i] = fl_decode_crop(paths[i].c_str(), out_size, crop_mode,
                                   seeds[i], hflips[i], out + stride * i);
      }
    });
  }
  for (auto& th : workers) th.join();
  for (int i = 0; i < n; ++i)
    if (status[i]) return status[i];
  return 0;
}

// Minimal .npy reader for C-contiguous little-endian float32 arrays.
// Writes up to max_elems floats; shape (up to 8 dims) into shape_out.
int fl_load_npy_f32(const char* path, float* out, long long max_elems,
                    long long* shape_out, int* ndim_out) {
  FILE* f = fopen(path, "rb");
  if (!f) return 1;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return 2;
  }
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    uint16_t h16;
    if (fread(&h16, 2, 1, f) != 1) { fclose(f); return 2; }
    hlen = h16;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) { fclose(f); return 2; }
  }
  std::string header(hlen, '\0');
  if (fread(header.data(), 1, hlen, f) != hlen) { fclose(f); return 2; }
  if (header.find("'<f4'") == std::string::npos &&
      header.find("\"<f4\"") == std::string::npos) {
    fclose(f);
    return 3;  // not float32 LE
  }
  if (header.find("'fortran_order': True") != std::string::npos) {
    fclose(f);
    return 4;
  }
  size_t sp = header.find("'shape':");
  if (sp == std::string::npos) { fclose(f); return 2; }
  sp = header.find('(', sp);
  size_t ep = header.find(')', sp);
  std::string dims = header.substr(sp + 1, ep - sp - 1);
  int nd = 0;
  long long total = 1;
  const char* dp = dims.c_str();
  while (*dp && nd < 8) {
    while (*dp == ' ' || *dp == ',') ++dp;
    if (!*dp) break;
    long long v = strtoll(dp, (char**)&dp, 10);
    shape_out[nd++] = v;
    total *= v;
  }
  *ndim_out = nd;
  if (total > max_elems) { fclose(f); return 5; }
  size_t got = fread(out, 4, (size_t)total, f);
  fclose(f);
  return got == (size_t)total ? 0 : 6;
}

}  // extern "C"
