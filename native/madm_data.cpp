// Native data-loading core for madm_tpu (C ABI, consumed via ctypes).
//
// The reference feeds its models through torch DataLoader worker processes
// whose decode path is PIL (reference data/dataset/cross_modality_dataset.py
// load_aug_data :352-415).  This library replaces that per-sample Python work
// with native code: PNG/JPEG decode, PIL-compatible separable triangle
// (BILINEAR) / nearest resampling, crop, horizontal flip, and a pthread pool
// for batch loading — so a single host core can keep a TPU fed.
//
// Build: see madm_tpu/data/native.py (g++ -O3 -shared -fPIC
//        madm_data.cpp -lpng -ljpeg -o libmadm_data.so)

#include <algorithm>
#include <atomic>
#include <cmath>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <functional>
#include <mutex>
#include <queue>
#include <string>
#include <thread>
#include <vector>

#include <jpeglib.h>
#include <png.h>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> data;  // HWC
};

// ------------------------------------------------------------------ decode
bool decode_png(const char* path, Image* out) {
  png_image img;
  memset(&img, 0, sizeof(img));
  img.version = PNG_IMAGE_VERSION;
  if (!png_image_begin_read_from_file(&img, path)) return false;
  int channels;
  // preserve channel count: gray stays gray (labels), color -> RGB
  if (img.format & PNG_FORMAT_FLAG_COLOR) {
    img.format = PNG_FORMAT_RGB;
    channels = 3;
  } else {
    img.format = PNG_FORMAT_GRAY;
    channels = 1;
  }
  out->w = img.width;
  out->h = img.height;
  out->c = channels;
  out->data.resize((size_t)img.width * img.height * channels);
  if (!png_image_finish_read(&img, nullptr, out->data.data(), 0, nullptr)) {
    png_image_free(&img);
    return false;
  }
  return true;
}

bool decode_jpeg(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  jpeg_error_mgr jerr;
  cinfo.err = jpeg_std_error(&jerr);
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  if (jpeg_read_header(&cinfo, TRUE) != JPEG_HEADER_OK) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  cinfo.out_color_space = cinfo.num_components == 1 ? JCS_GRAYSCALE : JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->w = cinfo.output_width;
  out->h = cinfo.output_height;
  out->c = cinfo.output_components;
  out->data.resize((size_t)out->w * out->h * out->c);
  while (cinfo.output_scanline < cinfo.output_height) {
    uint8_t* row = out->data.data() + (size_t)cinfo.output_scanline * out->w * out->c;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool decode(const char* path, Image* out) {
  size_t n = strlen(path);
  auto ends = [&](const char* suf) {
    size_t m = strlen(suf);
    if (n < m) return false;
    for (size_t i = 0; i < m; i++)
      if (tolower(path[n - m + i]) != suf[i]) return false;
    return true;
  };
  if (ends(".png")) return decode_png(path, out);
  if (ends(".jpg") || ends(".jpeg")) return decode_jpeg(path, out);
  // try png then jpeg
  if (decode_png(path, out)) return true;
  return decode_jpeg(path, out);
}

// -------------------------------------------------------------- resampling
// PIL-compatible separable resampling: triangle filter for BILINEAR with
// support scaled by the downscale ratio (Pillow's ImagingResample), plus
// center-based NEAREST.  Coefficients computed in double, accumulated in
// float, rounded — matches Pillow within +-1 LSB.
struct Weights {
  std::vector<int> bounds;   // [out, 2]: (start, size)
  std::vector<double> coef;  // [out, ksize]
  int ksize = 0;
};

Weights triangle_weights(int in_size, int out_size) {
  Weights w;
  double scale = (double)in_size / out_size;
  double filterscale = std::max(scale, 1.0);
  double support = 1.0 * filterscale;
  w.ksize = (int)ceil(support) * 2 + 1;
  w.bounds.resize(out_size * 2);
  w.coef.assign((size_t)out_size * w.ksize, 0.0);
  for (int xx = 0; xx < out_size; xx++) {
    double center = (xx + 0.5) * scale;
    int xmin = (int)std::max(center - support + 0.5, 0.0);
    int xmax = std::min((int)(center + support + 0.5), in_size);
    double ss = 0.0;
    int size = xmax - xmin;
    for (int x = 0; x < size; x++) {
      double arg = (x + xmin - center + 0.5) / filterscale;
      double val = arg < 0 ? 1.0 + arg : 1.0 - arg;  // triangle
      if (val < 0) val = 0;
      w.coef[(size_t)xx * w.ksize + x] = val;
      ss += val;
    }
    if (ss != 0)
      for (int x = 0; x < size; x++) w.coef[(size_t)xx * w.ksize + x] /= ss;
    w.bounds[xx * 2] = xmin;
    w.bounds[xx * 2 + 1] = size;
  }
  return w;
}

void resize_bilinear(const Image& src, int out_w, int out_h, Image* dst) {
  int c = src.c;
  Weights wx = triangle_weights(src.w, out_w);
  Weights wy = triangle_weights(src.h, out_h);
  // horizontal pass (double accumulate like Pillow's high-precision path)
  std::vector<float> tmp((size_t)src.h * out_w * c);
  for (int y = 0; y < src.h; y++) {
    const uint8_t* row = src.data.data() + (size_t)y * src.w * c;
    for (int x = 0; x < out_w; x++) {
      int xmin = wx.bounds[x * 2], size = wx.bounds[x * 2 + 1];
      const double* coef = &wx.coef[(size_t)x * wx.ksize];
      for (int ch = 0; ch < c; ch++) {
        double acc = 0;
        for (int k = 0; k < size; k++) acc += row[(xmin + k) * c + ch] * coef[k];
        tmp[((size_t)y * out_w + x) * c + ch] = (float)acc;
      }
    }
  }
  dst->w = out_w;
  dst->h = out_h;
  dst->c = c;
  dst->data.resize((size_t)out_w * out_h * c);
  for (int y = 0; y < out_h; y++) {
    int ymin = wy.bounds[y * 2], size = wy.bounds[y * 2 + 1];
    const double* coef = &wy.coef[(size_t)y * wy.ksize];
    for (int x = 0; x < out_w; x++) {
      for (int ch = 0; ch < c; ch++) {
        double acc = 0;
        for (int k = 0; k < size; k++)
          acc += tmp[((size_t)(ymin + k) * out_w + x) * c + ch] * coef[k];
        int v = (int)lround(acc);
        dst->data[((size_t)y * out_w + x) * c + ch] =
            (uint8_t)std::clamp(v, 0, 255);
      }
    }
  }
}

void resize_nearest(const Image& src, int out_w, int out_h, Image* dst) {
  int c = src.c;
  dst->w = out_w;
  dst->h = out_h;
  dst->c = c;
  dst->data.resize((size_t)out_w * out_h * c);
  // PIL nearest: affine mapping, sample at floor(center * scale)
  double sx = (double)src.w / out_w, sy = (double)src.h / out_h;
  for (int y = 0; y < out_h; y++) {
    int yy = std::min((int)((y + 0.5) * sy), src.h - 1);
    for (int x = 0; x < out_w; x++) {
      int xx = std::min((int)((x + 0.5) * sx), src.w - 1);
      memcpy(&dst->data[((size_t)y * out_w + x) * c],
             &src.data[((size_t)yy * src.w + xx) * c], c);
    }
  }
}

void crop_flip(const Image& src, int x0, int y0, int cw, int ch_, bool flip,
               Image* dst) {
  int c = src.c;
  dst->w = cw;
  dst->h = ch_;
  dst->c = c;
  dst->data.resize((size_t)cw * ch_ * c);
  for (int y = 0; y < ch_; y++) {
    const uint8_t* srow = src.data.data() + ((size_t)(y0 + y) * src.w + x0) * c;
    uint8_t* drow = dst->data.data() + (size_t)y * cw * c;
    if (!flip) {
      memcpy(drow, srow, (size_t)cw * c);
    } else {
      for (int x = 0; x < cw; x++)
        memcpy(drow + (size_t)x * c, srow + (size_t)(cw - 1 - x) * c, c);
    }
  }
}

// --------------------------------------------------------------- pipeline
// One sample op: decode -> optional resize -> optional crop(+flip) ->
// write into out buffer as HWC uint8 with `out_c` channels (gray replicated,
// RGBA truncated).
int load_one(const char* path, int resize_w, int resize_h, int crop_x,
             int crop_y, int crop_w, int crop_h, int flip, int nearest,
             uint8_t* out, int out_c) {
  Image img;
  if (!decode(path, &img)) return -1;
  Image resized;
  Image* cur = &img;
  if (resize_w > 0 && resize_h > 0 && (img.w != resize_w || img.h != resize_h)) {
    if (nearest)
      resize_nearest(img, resize_w, resize_h, &resized);
    else
      resize_bilinear(img, resize_w, resize_h, &resized);
    cur = &resized;
  }
  Image cropped;
  if (crop_w > 0 && crop_h > 0) {
    if (crop_x + crop_w > cur->w || crop_y + crop_h > cur->h) return -2;
    crop_flip(*cur, crop_x, crop_y, crop_w, crop_h, flip != 0, &cropped);
    cur = &cropped;
  } else if (flip) {
    crop_flip(*cur, 0, 0, cur->w, cur->h, true, &cropped);
    cur = &cropped;
  }
  // channel adapt
  size_t npix = (size_t)cur->w * cur->h;
  if (cur->c == out_c) {
    memcpy(out, cur->data.data(), npix * out_c);
  } else if (cur->c == 1 && out_c == 3) {
    for (size_t i = 0; i < npix; i++)
      out[i * 3] = out[i * 3 + 1] = out[i * 3 + 2] = cur->data[i];
  } else if (cur->c >= out_c) {
    for (size_t i = 0; i < npix; i++)
      for (int ch = 0; ch < out_c; ch++) out[i * out_c + ch] = cur->data[i * cur->c + ch];
  } else {
    return -3;
  }
  return cur->w * 0x10000 + cur->h;  // packed dims for no-resize callers
}

// ------------------------------------------------------------- thread pool
class Pool {
 public:
  explicit Pool(int n) {
    for (int i = 0; i < n; i++)
      workers_.emplace_back([this] { run(); });
  }
  ~Pool() {
    {
      std::lock_guard<std::mutex> lk(mu_);
      stop_ = true;
    }
    cv_.notify_all();
    for (auto& t : workers_) t.join();
  }
  void submit(std::function<void()> fn) {
    {
      std::lock_guard<std::mutex> lk(mu_);
      q_.push(std::move(fn));
      pending_++;
    }
    cv_.notify_one();
  }
  void wait() {
    std::unique_lock<std::mutex> lk(mu_);
    done_cv_.wait(lk, [this] { return pending_ == 0; });
  }

 private:
  void run() {
    for (;;) {
      std::function<void()> fn;
      {
        std::unique_lock<std::mutex> lk(mu_);
        cv_.wait(lk, [this] { return stop_ || !q_.empty(); });
        if (stop_ && q_.empty()) return;
        fn = std::move(q_.front());
        q_.pop();
      }
      fn();
      {
        std::lock_guard<std::mutex> lk(mu_);
        if (--pending_ == 0) done_cv_.notify_all();
      }
    }
  }
  std::vector<std::thread> workers_;
  std::queue<std::function<void()>> q_;
  std::mutex mu_;
  std::condition_variable cv_, done_cv_;
  int pending_ = 0;
  bool stop_ = false;
};

Pool* pool = nullptr;
std::mutex pool_mu;

}  // namespace

extern "C" {

// Probe an image's dimensions without full decode (decodes header-cheap for
// jpeg; full decode for png via the simplified API).
int madm_image_size(const char* path, int* w, int* h, int* c) {
  Image img;
  if (!decode(path, &img)) return -1;
  *w = img.w;
  *h = img.h;
  *c = img.c;
  return 0;
}

// Load one sample: see load_one.  Returns 0 on success.
int madm_load(const char* path, int resize_w, int resize_h, int crop_x,
              int crop_y, int crop_w, int crop_h, int flip, int nearest,
              uint8_t* out, int out_c) {
  int r = load_one(path, resize_w, resize_h, crop_x, crop_y, crop_w, crop_h,
                   flip, nearest, out, out_c);
  return r < 0 ? r : 0;
}

void madm_init_pool(int threads) {
  std::lock_guard<std::mutex> lk(pool_mu);
  if (!pool) pool = new Pool(threads > 0 ? threads : 2);
}

// Batch load: n samples, per-sample params arrays; each output slot is
// out + i * slot_stride.  Returns count of failures.
int madm_load_batch(int n, const char** paths, const int* resize_wh,
                    const int* crop_xywh, const int* flips, const int* nearest,
                    uint8_t* out, long slot_stride, int out_c) {
  madm_init_pool(0);
  std::atomic<int> failures{0};
  for (int i = 0; i < n; i++) {
    pool->submit([=, &failures] {
      int r = load_one(paths[i], resize_wh[i * 2], resize_wh[i * 2 + 1],
                       crop_xywh[i * 4], crop_xywh[i * 4 + 1],
                       crop_xywh[i * 4 + 2], crop_xywh[i * 4 + 3], flips[i],
                       nearest[i], out + (size_t)i * slot_stride, out_c);
      if (r < 0) failures.fetch_add(1);
    });
  }
  pool->wait();
  return failures.load();
}

}  // extern "C"
