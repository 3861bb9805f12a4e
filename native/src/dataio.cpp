// batrack_tpu native data runtime: decoders + threaded prefetch loader.
//
// The reference pipeline decodes and preprocesses every frame synchronously
// in Python (main/stream.py + cv2) on the critical path of the SLAM loop.
// This library moves that host-side runtime to C++: libpng/libjpeg decoding,
// Sintel .dpt/.cam and .npy binary readers, crop-to-16 preprocessing and
// depth clipping, all executed by a worker pool that stays ahead of the
// consumer and delivers frames in order through a bounded reorder queue.
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <png.h>
#include <jpeglib.h>

#include <algorithm>
#include <atomic>
#include <csetjmp>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <map>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

constexpr float kSintelTag = 202021.25f;

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> data;
};

// ---------------------------------------------------------------------------
// decoders
// ---------------------------------------------------------------------------

bool read_png_rgb(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  png_structp png =
      png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
  png_infop info = png ? png_create_info_struct(png) : nullptr;
  if (!png || !info) {
    if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
    fclose(f);
    return false;
  }
  if (setjmp(png_jmpbuf(png))) {
    png_destroy_read_struct(&png, &info, nullptr);
    fclose(f);
    return false;
  }
  png_init_io(png, f);
  png_read_info(png, info);
  png_set_strip_16(png);
  png_set_palette_to_rgb(png);
  png_set_expand_gray_1_2_4_to_8(png);
  png_set_strip_alpha(png);
  if (png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY ||
      png_get_color_type(png, info) == PNG_COLOR_TYPE_GRAY_ALPHA)
    png_set_gray_to_rgb(png);
  png_read_update_info(png, info);
  out->h = png_get_image_height(png, info);
  out->w = png_get_image_width(png, info);
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  std::vector<png_bytep> rows(out->h);
  for (int y = 0; y < out->h; ++y)
    rows[y] = out->data.data() + size_t(y) * out->w * 3;
  png_read_image(png, rows.data());
  png_destroy_read_struct(&png, &info, nullptr);
  fclose(f);
  return true;
}

// libjpeg's DEFAULT error manager calls exit() on any decode error; route
// errors through longjmp so a corrupt frame returns false instead of
// killing the whole SLAM process.
struct JpegErr {
  jpeg_error_mgr pub;
  jmp_buf jmp;
};

void jpeg_error_longjmp(j_common_ptr cinfo) {
  longjmp(reinterpret_cast<JpegErr*>(cinfo->err)->jmp, 1);
}

bool read_jpeg_rgb(const char* path, Image* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  jpeg_decompress_struct cinfo;
  JpegErr jerr;
  cinfo.err = jpeg_std_error(&jerr.pub);
  jerr.pub.error_exit = jpeg_error_longjmp;
  if (setjmp(jerr.jmp)) {
    jpeg_destroy_decompress(&cinfo);
    fclose(f);
    return false;
  }
  jpeg_create_decompress(&cinfo);
  jpeg_stdio_src(&cinfo, f);
  jpeg_read_header(&cinfo, TRUE);
  cinfo.out_color_space = JCS_RGB;
  jpeg_start_decompress(&cinfo);
  out->h = cinfo.output_height;
  out->w = cinfo.output_width;
  out->c = 3;
  out->data.resize(size_t(out->h) * out->w * 3);
  while (cinfo.output_scanline < cinfo.output_height) {
    JSAMPROW row = out->data.data() + size_t(cinfo.output_scanline) * out->w * 3;
    jpeg_read_scanlines(&cinfo, &row, 1);
  }
  jpeg_finish_decompress(&cinfo);
  jpeg_destroy_decompress(&cinfo);
  fclose(f);
  return true;
}

bool read_image_rgb(const std::string& path, Image* out) {
  auto dot = path.rfind('.');
  std::string ext = dot == std::string::npos ? "" : path.substr(dot);
  for (auto& ch : ext) ch = tolower(ch);
  if (ext == ".png") return read_png_rgb(path.c_str(), out);
  if (ext == ".jpg" || ext == ".jpeg") return read_jpeg_rgb(path.c_str(), out);
  return false;
}

// ---------------------------------------------------------------------------
// binary readers (.dpt / .cam / .npy)
// ---------------------------------------------------------------------------

bool read_dpt(const char* path, std::vector<float>* out, int* H, int* W) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  float tag;
  int32_t w, h;
  if (fread(&tag, 4, 1, f) != 1 || tag != kSintelTag ||
      fread(&w, 4, 1, f) != 1 || fread(&h, 4, 1, f) != 1) {
    fclose(f);
    return false;
  }
  // validate header dims: a corrupt file must return false, not throw
  // bad_alloc across the worker thread / C ABI
  if (h <= 0 || w <= 0 || int64_t(h) * w > (int64_t(1) << 28)) {
    fclose(f);
    return false;
  }
  out->resize(size_t(h) * w);
  bool ok = fread(out->data(), 4, out->size(), f) == out->size();
  fclose(f);
  *H = h;
  *W = w;
  return ok;
}

bool read_cam(const char* path, double* K9, double* E12) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  float tag;
  bool ok = fread(&tag, 4, 1, f) == 1 && tag == kSintelTag &&
            fread(K9, 8, 9, f) == 9 && fread(E12, 8, 12, f) == 12;
  fclose(f);
  return ok;
}

// minimal .npy v1/v2 reader for C-contiguous <f4/<f8 arrays
bool read_npy_f32(const char* path, std::vector<float>* out,
                  std::vector<int>* shape) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8 || memcmp(magic, "\x93NUMPY", 6) != 0) {
    fclose(f);
    return false;
  }
  uint32_t hlen = 0;
  if (magic[6] == 1) {
    uint16_t l;
    if (fread(&l, 2, 1, f) != 1) { fclose(f); return false; }
    hlen = l;
  } else {
    if (fread(&hlen, 4, 1, f) != 1) { fclose(f); return false; }
  }
  std::string header(hlen, '\0');
  if (fread(header.data(), 1, hlen, f) != hlen) { fclose(f); return false; }

  bool f8 = header.find("<f8") != std::string::npos;
  if (!f8 && header.find("<f4") == std::string::npos) { fclose(f); return false; }
  if (header.find("'fortran_order': True") != std::string::npos) {
    fclose(f);
    return false;
  }
  auto lp = header.find('(');
  auto rp = header.find(')', lp);
  if (lp == std::string::npos || rp == std::string::npos) {
    fclose(f);
    return false;
  }
  shape->clear();
  size_t total = 1;
  std::string dims = header.substr(lp + 1, rp - lp - 1);
  char* p = dims.data();
  while (*p) {
    while (*p == ' ' || *p == ',') ++p;
    if (!isdigit(*p)) break;
    int v = strtol(p, &p, 10);
    shape->push_back(v);
    total *= size_t(v);
  }
  if (shape->empty()) { shape->push_back(1); }
  // corrupt header dims must fail cleanly, not bad_alloc across the C ABI
  if (total == 0 || total > (size_t(1) << 28)) {
    fclose(f);
    return false;
  }
  out->resize(total);
  bool ok;
  if (f8) {
    std::vector<double> tmp(total);
    ok = fread(tmp.data(), 8, total, f) == total;
    for (size_t i = 0; i < total; ++i) (*out)[i] = float(tmp[i]);
  } else {
    ok = fread(out->data(), 4, total, f) == total;
  }
  fclose(f);
  return ok;
}

// ---------------------------------------------------------------------------
// prefetch loader
// ---------------------------------------------------------------------------

struct Frame {
  int idx = -1;
  bool ok = false;
  std::vector<uint8_t> image;  // (H, W, 3) cropped
  std::vector<float> depth;    // (H, W) cropped, clipped
};

struct Loader {
  std::vector<std::string> image_paths, depth_paths;
  int H = 0, W = 0;            // cropped dims
  float dmin = 1e-2f, dmax = 1e2f;
  int queue_cap = 8;

  std::vector<std::thread> workers;
  std::atomic<int> next_job{0};
  std::map<int, Frame> ready;
  int next_deliver = 0;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::atomic<bool> stop{false};

  bool load_frame(int idx, Frame* fr) {
    Image img;
    if (!read_image_rgb(image_paths[idx], &img)) return false;
    int ch = img.h - img.h % 16, cw = img.w - img.w % 16;
    if (H == 0) {
      // dims are pinned ONLY by the synchronous frame-0 load in start();
      // if that failed, H stays 0 — fail every frame instead of letting
      // worker threads race an unsynchronized H/W read-modify-write
      if (idx != 0) return false;
      H = ch;
      W = cw;
    }
    if (ch != H || cw != W) return false;

    fr->image.resize(size_t(H) * W * 3);
    for (int y = 0; y < H; ++y)
      memcpy(fr->image.data() + size_t(y) * W * 3,
             img.data.data() + size_t(y) * img.w * 3, size_t(W) * 3);

    std::vector<float> d;
    int dh = 0, dw = 0;
    const std::string& dp = depth_paths[idx];
    if (dp.size() >= 4 && dp.substr(dp.size() - 4) == ".dpt") {
      if (!read_dpt(dp.c_str(), &d, &dh, &dw)) return false;
    } else {
      std::vector<int> shape;
      if (!read_npy_f32(dp.c_str(), &d, &shape) || shape.size() < 2)
        return false;
      dh = shape[0];
      dw = shape[1];
    }
    if (dh < H || dw < W) return false;
    fr->depth.resize(size_t(H) * W);
    for (int y = 0; y < H; ++y)
      for (int x = 0; x < W; ++x) {
        float v = d[size_t(y) * dw + x];
        fr->depth[size_t(y) * W + x] = std::min(std::max(v, dmin), dmax);
      }
    return true;
  }

  void worker() {
    while (!stop.load()) {
      int idx = next_job.fetch_add(1);
      if (idx >= (int)image_paths.size()) return;
      Frame fr;
      fr.idx = idx;
      try {
        fr.ok = load_frame(idx, &fr);
      } catch (...) {
        fr.ok = false;  // never let an exception escape the worker thread
      }
      std::unique_lock<std::mutex> lk(mu);
      cv_space.wait(lk, [&] {
        return stop.load() || (int)ready.size() < queue_cap ||
               idx < next_deliver + queue_cap;
      });
      if (stop.load()) return;
      ready.emplace(idx, std::move(fr));
      cv_ready.notify_all();
    }
  }

  void start(int n_threads) {
    // frame 0 synchronously to pin dimensions
    Frame f0;
    f0.idx = 0;
    try {
      f0.ok = load_frame(0, &f0);
    } catch (...) {
      f0.ok = false;
    }
    {
      std::lock_guard<std::mutex> lk(mu);
      ready.emplace(0, std::move(f0));
    }
    next_job.store(1);
    for (int i = 0; i < n_threads; ++i)
      workers.emplace_back([this] { worker(); });
  }

  int next(uint8_t* img_out, float* depth_out) {
    std::unique_lock<std::mutex> lk(mu);
    if (next_deliver >= (int)image_paths.size()) return -1;
    cv_ready.wait(lk, [&] { return ready.count(next_deliver) > 0; });
    Frame fr = std::move(ready[next_deliver]);
    ready.erase(next_deliver);
    ++next_deliver;
    cv_space.notify_all();
    lk.unlock();
    if (!fr.ok) return -2;
    memcpy(img_out, fr.image.data(), fr.image.size());
    memcpy(depth_out, fr.depth.data(), fr.depth.size() * 4);
    return fr.idx;
  }

  ~Loader() {
    stop.store(true);
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : workers)
      if (t.joinable()) t.join();
  }
};

}  // namespace

extern "C" {

void* btk_loader_create(const char** image_paths, const char** depth_paths,
                        int n, int num_threads, int queue_cap, float dmin,
                        float dmax) {
  auto* l = new Loader();
  for (int i = 0; i < n; ++i) {
    l->image_paths.emplace_back(image_paths[i]);
    l->depth_paths.emplace_back(depth_paths[i]);
  }
  l->queue_cap = queue_cap;
  l->dmin = dmin;
  l->dmax = dmax;
  l->start(num_threads);
  return l;
}

void btk_loader_dims(void* h, int* H, int* W) {
  auto* l = static_cast<Loader*>(h);
  *H = l->H;
  *W = l->W;
}

int btk_loader_next(void* h, uint8_t* img_out, float* depth_out) {
  return static_cast<Loader*>(h)->next(img_out, depth_out);
}

void btk_loader_destroy(void* h) { delete static_cast<Loader*>(h); }

// every entry below catches everything: a C++ exception crossing the C ABI
// into ctypes is undefined behavior
int btk_read_dpt(const char* path, float* out, int* H, int* W) {
  try {
    std::vector<float> d;
    if (!read_dpt(path, &d, H, W)) return -1;
    if (out) memcpy(out, d.data(), d.size() * 4);
    return 0;
  } catch (...) {
    return -1;
  }
}

int btk_read_cam(const char* path, double* K9, double* E12) {
  return read_cam(path, K9, E12) ? 0 : -1;
}

int btk_read_npy_f32(const char* path, float* out, int* shape, int* ndim) {
  try {
    std::vector<float> d;
    std::vector<int> sh;
    if (!read_npy_f32(path, &d, &sh)) return -1;
    *ndim = (int)sh.size();
    for (size_t i = 0; i < sh.size() && i < 8; ++i) shape[i] = sh[i];
    if (out) memcpy(out, d.data(), d.size() * 4);
    return 0;
  } catch (...) {
    return -1;
  }
}

int btk_read_image(const char* path, uint8_t* out, int* H, int* W) {
  try {
    Image img;
    if (!read_image_rgb(path, &img)) return -1;
    *H = img.h;
    *W = img.w;
    if (out) memcpy(out, img.data.data(), img.data.size());
    return 0;
  } catch (...) {
    return -1;
  }
}

}  // extern "C"
