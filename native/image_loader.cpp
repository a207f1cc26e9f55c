// Native batch image loader: JPEG/PNG decode -> PIL-compatible bicubic
// resize (smallest-max-size + center crop) -> float32 [-1, 1] NHWC.
//
// TPU-native replacement for the reference's OpenCV/PIL data path
// (/root/reference/rdm/data/base.py image loading): training hosts feed
// accelerators from tar/filelist storage, and Python-side decode+resize
// is the bottleneck on weak hosts. One call decodes a whole batch on a
// std::thread pool (no GIL), with the exact preprocessing semantics of
// rdm_tpu.data.base.load_image:
//   uint8 RGB -> resize shorter side to `size` (PIL BICUBIC incl. the
//   antialias support scaling Pillow applies when downscaling) ->
//   center crop size x size -> x / 127.5 - 1.
//
// C ABI (ctypes, see rdm_tpu/data/native_loader.py):
//   int il_load_batch(const char** paths, int n, int size,
//                     float* out, int* status, int n_threads);
//     out: [n, size, size, 3] float32. status[i]: 0 ok, nonzero errno.
//     Returns the number of failures (failed slots are zero-filled).
//
// Build: make -C native libimageloader.so  (links -ljpeg -lpng)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <csetjmp>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Img {
  int w = 0, h = 0;          // dimensions
  std::vector<unsigned char> rgb;  // HWC, 3 channels
};

// ------------------------------------------------------------------ JPEG

struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jb;
};

void jpeg_err_exit(j_common_ptr cinfo) {
  JpegErr* e = reinterpret_cast<JpegErr*>(cinfo->err);
  longjmp(e->jb, 1);
}

bool decode_jpeg(FILE* f, Img* im) {
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_err_exit;
  if (setjmp(jerr.jb)) {
    jpeg_destroy_decompress(&cinfo);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  im->w = cinfo.output_width;
  im->h = cinfo.output_height;
  im->rgb.resize(static_cast<size_t>(im->w) * im->h * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    unsigned char* row =
        im->rgb.data() + static_cast<size_t>(cinfo.output_scanline) * im->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  return true;
}

// ------------------------------------------------------------------- PNG

bool decode_png(FILE* f, Img* im) {
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  if (!png) return false;
  png_infop info = png_create_info_struct(png);
  if (!info) {
    png_destroy_read_struct(&png, nullptr, nullptr);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_uint_32 w, h;
  int depth, color;
  png_get_IHDR(png, info, &w, &h, &depth, &color, nullptr, nullptr, nullptr);
  // normalize everything to 8-bit RGB (PIL convert("RGB") semantics)
  if (depth == 16) png_set_strip_16(png);
  if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
  if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
  if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
  if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_set_strip_alpha(png);
  png_read_update_info(png, info);
  im->w = static_cast<int>(w);
  im->h = static_cast<int>(h);
  im->rgb.resize(static_cast<size_t>(w) * h * 3);
  std::vector<png_bytep> rows(h);
  for (png_uint_32 y = 0; y < h; ++y)
    rows[y] = im->rgb.data() + static_cast<size_t>(y) * w * 3;
  png_read_image(png, rows.data());
  png_read_end(png, nullptr);
  png_destroy_read_struct(&png, &info, nullptr);
  return true;
}

bool decode_file(const char* path, Img* im) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8] = {0};
  size_t got = std::fread(magic, 1, 8, f);
  std::rewind(f);
  bool ok = false;
  if (got >= 3 && magic[0] == 0xFF && magic[1] == 0xD8 && magic[2] == 0xFF) {
    ok = decode_jpeg(f, im);
  } else if (got >= 8 && png_sig_cmp(magic, 0, 8) == 0) {
    ok = decode_png(f, im);
  }
  std::fclose(f);
  return ok;
}

// ------------------------------------------------- PIL-style bicubic resize

// Pillow's bicubic kernel (a = -0.5), support 2.0 (Resample.c).
inline double bicubic(double x) {
  constexpr double a = -0.5;
  x = std::abs(x);
  if (x < 1.0) return ((a + 2.0) * x - (a + 3.0)) * x * x + 1.0;
  if (x < 2.0) return (((x - 5.0) * x + 8.0) * x - 4.0) * a;
  return 0.0;
}

// One-dimensional resample pass with Pillow's antialias support scaling:
// when downscaling, the filter support widens by the scale factor.
struct Pass {
  std::vector<int> xmin, xsize;
  std::vector<float> weights;  // per output pixel, up to ksize entries
  int ksize = 0;
};

Pass make_pass(int in_size, int out_size) {
  Pass p;
  double scale = static_cast<double>(in_size) / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 2.0 * filterscale;
  p.ksize = static_cast<int>(std::ceil(support)) * 2 + 1;
  p.xmin.resize(out_size);
  p.xsize.resize(out_size);
  p.weights.assign(static_cast<size_t>(out_size) * p.ksize, 0.0);
  for (int xx = 0; xx < out_size; ++xx) {
    double center = (xx + 0.5) * scale;
    int x0 = static_cast<int>(center - support + 0.5);
    if (x0 < 0) x0 = 0;
    int x1 = static_cast<int>(center + support + 0.5);
    if (x1 > in_size) x1 = in_size;
    float* w = &p.weights[static_cast<size_t>(xx) * p.ksize];
    double total = 0.0;
    for (int x = x0; x < x1; ++x) {
      double v = bicubic((x - center + 0.5) / filterscale);
      w[x - x0] = static_cast<float>(v);
      total += v;
    }
    if (total != 0.0)
      for (int x = 0; x < x1 - x0; ++x)
        w[x] = static_cast<float>(w[x] / total);
    p.xmin[xx] = x0;
    p.xsize[xx] = x1 - x0;
  }
  return p;
}

// resize uint8 HWC -> float HWC (values may overshoot [0,255]; Pillow
// clips on the u8 path, so clip after each pass for parity)
void resize_bicubic(const Img& in, int out_h, int out_w,
                    std::vector<float>* out) {
  Pass ph = make_pass(in.w, out_w);
  Pass pv = make_pass(in.h, out_h);
  // horizontal pass: [in.h, out_w, 3]
  std::vector<float> tmp(static_cast<size_t>(in.h) * out_w * 3);
  for (int y = 0; y < in.h; ++y) {
    const unsigned char* row =
        in.rgb.data() + static_cast<size_t>(y) * in.w * 3;
    float* trow = tmp.data() + static_cast<size_t>(y) * out_w * 3;
    for (int x = 0; x < out_w; ++x) {
      const float* w = &ph.weights[static_cast<size_t>(x) * ph.ksize];
      int x0 = ph.xmin[x], n = ph.xsize[x];
      float acc0 = 0, acc1 = 0, acc2 = 0;
      const unsigned char* px = row + static_cast<size_t>(x0) * 3;
      for (int k = 0; k < n; ++k, px += 3) {
        acc0 += w[k] * px[0];
        acc1 += w[k] * px[1];
        acc2 += w[k] * px[2];
      }
      trow[x * 3 + 0] = std::min(255.0f, std::max(0.0f, acc0));
      trow[x * 3 + 1] = std::min(255.0f, std::max(0.0f, acc1));
      trow[x * 3 + 2] = std::min(255.0f, std::max(0.0f, acc2));
    }
  }
  // vertical pass: [out_h, out_w, 3]
  out->resize(static_cast<size_t>(out_h) * out_w * 3);
  int row_len = out_w * 3;
  std::vector<float> acc(row_len);
  for (int y = 0; y < out_h; ++y) {
    const float* w = &pv.weights[static_cast<size_t>(y) * pv.ksize];
    int y0 = pv.xmin[y], n = pv.xsize[y];
    float* orow = out->data() + static_cast<size_t>(y) * row_len;
    std::memset(acc.data(), 0, sizeof(float) * row_len);
    for (int k = 0; k < n; ++k) {
      const float* trow = &tmp[static_cast<size_t>(y0 + k) * row_len];
      float wk = w[k];
      for (int x = 0; x < row_len; ++x) acc[x] += wk * trow[x];
    }
    for (int x = 0; x < row_len; ++x)
      orow[x] = std::min(255.0f, std::max(0.0f, acc[x]));
  }
}

int load_one(const char* path, int size, float* out) {
  Img im;
  if (!decode_file(path, &im)) return 1;
  if (im.w <= 0 || im.h <= 0) return 2;
  // smallest-max-size: shorter side -> size. Python round() is
  // half-to-even; std::nearbyint under the default FE_TONEAREST mode
  // matches it (std::lround is half-away-from-zero and diverged by 1px
  // on exact .5 products, shifting the center crop vs the PIL path).
  int nh = size, nw = size;
  if (im.h != im.w) {
    double scale = static_cast<double>(size) / std::min(im.h, im.w);
    nh = static_cast<int>(std::nearbyint(im.h * scale));
    nw = static_cast<int>(std::nearbyint(im.w * scale));
  }
  std::vector<float> resized;
  if (nh == im.h && nw == im.w) {
    resized.assign(im.rgb.begin(), im.rgb.end());
  } else {
    resize_bicubic(im, nh, nw, &resized);
  }
  // center crop to size x size, normalize to [-1, 1]
  int y0 = std::max((nh - size) / 2, 0);
  int x0 = std::max((nw - size) / 2, 0);
  for (int y = 0; y < size; ++y) {
    const float* src =
        resized.data() + (static_cast<size_t>(y0 + y) * nw + x0) * 3;
    float* dst = out + static_cast<size_t>(y) * size * 3;
    for (int x = 0; x < size * 3; ++x)
      dst[x] = src[x] * (1.0f / 127.5f) - 1.0f;
  }
  return 0;
}

}  // namespace

extern "C" int il_load_batch(const char** paths, int n, int size,
                             float* out, int* status, int n_threads) {
  if (n_threads <= 0)
    n_threads = std::max(1u, std::thread::hardware_concurrency());
  n_threads = std::min(n_threads, n > 0 ? n : 1);
  std::atomic<int> next(0), failures(0);
  size_t stride = static_cast<size_t>(size) * size * 3;
  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      int rc = load_one(paths[i], size, out + stride * i);
      status[i] = rc;
      if (rc) {
        std::memset(out + stride * i, 0, stride * sizeof(float));
        failures.fetch_add(1);
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < n_threads; ++t) pool.emplace_back(worker);
  for (auto& t : pool) t.join();
  return failures.load();
}
