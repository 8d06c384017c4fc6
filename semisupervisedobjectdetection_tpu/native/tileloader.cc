// Native tile loader: multithreaded PNG decode + watermark crop + resize.
//
// The reference's data path leans on skimage/libpng through Python
// (`archaeological_georgia_biostyle_dataloader.py:59-69`); feeding a TPU
// requires the host side to keep up with the device, so this library does
// the hot host work natively: a dependency-free PNG decoder (zlib inflate +
// per-row unfiltering for 8-bit RGB/RGBA/gray, the formats the dataset
// uses), the bottom watermark-strip crop, alpha drop, bilinear resize to
// the fixed canvas, and a std::thread pool that fills whole uint8 batches
// in parallel. Exposed as a C ABI consumed via ctypes
// (`semisupervisedobjectdetection_tpu/data/native.py`).
//
// Build: make -C semisupervisedobjectdetection_tpu/native
//   (g++ -O3 -shared -fPIC tileloader.cc -lz -pthread)

#include <zlib.h>

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Image {
  int w = 0, h = 0, c = 0;
  std::vector<uint8_t> pix;  // row-major, interleaved
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c;
  int pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Minimal PNG decoder: 8-bit depth, color types 0 (gray), 2 (RGB),
// 6 (RGBA), no interlacing. Returns false on unsupported/corrupt input.
bool decode_png(const uint8_t* data, size_t len, Image* out) {
  static const uint8_t kSig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (len < 45 || memcmp(data, kSig, 8) != 0) return false;
  size_t pos = 8;
  int w = 0, h = 0, depth = 0, color = 0, interlace = 0;
  std::vector<uint8_t> idat;
  while (pos + 8 <= len) {
    uint32_t chunk_len = be32(data + pos);
    const uint8_t* type = data + pos + 4;
    const uint8_t* body = data + pos + 8;
    if (pos + 12 + chunk_len > len) return false;
    if (memcmp(type, "IHDR", 4) == 0) {
      w = be32(body);
      h = be32(body + 4);
      depth = body[8];
      color = body[9];
      interlace = body[12];
    } else if (memcmp(type, "IDAT", 4) == 0) {
      idat.insert(idat.end(), body, body + chunk_len);
    } else if (memcmp(type, "IEND", 4) == 0) {
      break;
    }
    pos += 12 + chunk_len;
  }
  if (w <= 0 || h <= 0 || depth != 8 || interlace != 0) return false;
  int nc;
  switch (color) {
    case 0: nc = 1; break;
    case 2: nc = 3; break;
    case 4: nc = 2; break;
    case 6: nc = 4; break;
    default: return false;  // palette unsupported
  }

  const size_t stride = size_t(w) * nc;
  std::vector<uint8_t> raw((stride + 1) * h);
  uLongf raw_len = raw.size();
  if (uncompress(raw.data(), &raw_len, idat.data(), idat.size()) != Z_OK ||
      raw_len != raw.size()) {
    return false;
  }

  out->w = w;
  out->h = h;
  out->c = nc;
  out->pix.resize(stride * h);
  std::vector<uint8_t> prev(stride, 0);
  for (int y = 0; y < h; ++y) {
    const uint8_t* src = raw.data() + size_t(y) * (stride + 1);
    uint8_t filter = src[0];
    const uint8_t* row_in = src + 1;
    uint8_t* row = out->pix.data() + size_t(y) * stride;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= size_t(nc) ? row[x - nc] : 0;
      int b = prev[x];
      int c = x >= size_t(nc) ? prev[x - nc] : 0;
      int v = row_in[x];
      switch (filter) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      row[x] = uint8_t(v);
    }
    memcpy(prev.data(), row, stride);
  }
  return true;
}

bool read_file(const char* path, std::vector<uint8_t>* buf) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  buf->resize(n);
  size_t got = fread(buf->data(), 1, n, f);
  fclose(f);
  return got == size_t(n);
}

// Bilinear resize (half-pixel centers) of an interleaved uint8 image,
// writing `out_c` channels (dropping extras, e.g. alpha).
void resize_bilinear(const Image& img, int crop_h, int out_h, int out_w,
                     int out_c, uint8_t* out) {
  const int in_h = crop_h, in_w = img.w, in_c = img.c;
  const float sy = float(in_h) / out_h, sx = float(in_w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    float fy = (oy + 0.5f) * sy - 0.5f;
    int y0 = fy < 0 ? 0 : int(fy);
    int y1 = y0 + 1 < in_h ? y0 + 1 : in_h - 1;
    float wy = fy - y0;
    if (wy < 0) wy = 0;
    for (int ox = 0; ox < out_w; ++ox) {
      float fx = (ox + 0.5f) * sx - 0.5f;
      int x0 = fx < 0 ? 0 : int(fx);
      int x1 = x0 + 1 < in_w ? x0 + 1 : in_w - 1;
      float wx = fx - x0;
      if (wx < 0) wx = 0;
      const uint8_t* p00 = &img.pix[(size_t(y0) * in_w + x0) * in_c];
      const uint8_t* p01 = &img.pix[(size_t(y0) * in_w + x1) * in_c];
      const uint8_t* p10 = &img.pix[(size_t(y1) * in_w + x0) * in_c];
      const uint8_t* p11 = &img.pix[(size_t(y1) * in_w + x1) * in_c];
      uint8_t* dst = out + (size_t(oy) * out_w + ox) * out_c;
      for (int ch = 0; ch < out_c; ++ch) {
        int src_ch = ch < in_c ? ch : in_c - 1;  // gray -> replicate
        float v = (1 - wy) * ((1 - wx) * p00[src_ch] + wx * p01[src_ch]) +
                  wy * ((1 - wx) * p10[src_ch] + wx * p11[src_ch]);
        dst[ch] = uint8_t(v + 0.5f);
      }
    }
  }
}

// Nearest resize for masks (matches albumentations' mask interpolation).
void resize_nearest(const Image& img, int crop_h, int out_h, int out_w,
                    uint8_t* out) {
  const float sy = float(crop_h) / out_h, sx = float(img.w) / out_w;
  for (int oy = 0; oy < out_h; ++oy) {
    int y = int((oy + 0.5f) * sy);
    if (y >= crop_h) y = crop_h - 1;
    for (int ox = 0; ox < out_w; ++ox) {
      int x = int((ox + 0.5f) * sx);
      if (x >= img.w) x = img.w - 1;
      out[size_t(oy) * out_w + ox] =
          img.pix[(size_t(y) * img.w + x) * img.c];  // channel 0
    }
  }
}

int decode_one(const char* path, int watermark_px, int canvas, int out_c,
               bool nearest, uint8_t* out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  Image img;
  if (!decode_png(buf.data(), buf.size(), &img)) return -2;
  int crop_h = img.h - watermark_px;
  if (crop_h <= 0) return -3;
  if (nearest) {
    resize_nearest(img, crop_h, canvas, canvas, out);
  } else {
    resize_bilinear(img, crop_h, canvas, canvas, out_c, out);
  }
  return 0;
}

}  // namespace

extern "C" {

// Decode one tile: watermark-crop + drop alpha + bilinear resize to
// (canvas, canvas, 3). Returns 0 on success.
int sso_decode_tile(const char* path, int watermark_px, int canvas,
                    uint8_t* out) {
  return decode_one(path, watermark_px, canvas, 3, false, out);
}

// Decode one mask: channel 0, watermark-crop, nearest resize to
// (canvas, canvas). Returns 0 on success.
int sso_decode_mask(const char* path, int watermark_px, int canvas,
                    uint8_t* out) {
  return decode_one(path, watermark_px, canvas, 1, true, out);
}

// Fill a uint8 batch (n, canvas, canvas, 3) [+ masks (n, canvas, canvas)]
// in parallel with `threads` workers. `mask_paths` may be null. Returns
// the number of failed items (0 == all good).
int sso_load_batch(const char** paths, const char** mask_paths, int n,
                   int watermark_px, int canvas, int threads,
                   uint8_t* images_out, uint8_t* masks_out) {
  std::atomic<int> next(0), failures(0);
  if (threads < 1) threads = 1;
  auto worker = [&]() {
    for (int i = next.fetch_add(1); i < n; i = next.fetch_add(1)) {
      uint8_t* img_dst = images_out + size_t(i) * canvas * canvas * 3;
      if (decode_one(paths[i], watermark_px, canvas, 3, false, img_dst)) {
        failures.fetch_add(1);
        continue;
      }
      if (mask_paths && masks_out) {
        uint8_t* m_dst = masks_out + size_t(i) * canvas * canvas;
        if (decode_one(mask_paths[i], watermark_px, canvas, 1, true,
                       m_dst)) {
          failures.fetch_add(1);
        }
      }
    }
  };
  std::vector<std::thread> pool;
  for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
  for (auto& th : pool) th.join();
  return failures.load();
}

}  // extern "C"
