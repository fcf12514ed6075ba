// oct_loader — native data-plane runtime for tcct_tpu.
//
// The reference's only native-code tier is onnxruntime's C++ CPU EP on the
// serving side (task1/onnx/onnx_infer.py:16); its training input pipeline
// is Python DataLoader workers doing cv2 decode + albumentations
// (task1/data/octgen.py:81-89).  Here the host-side data plane is native:
// a from-scratch PNG decoder (zlib inflate + unfilter), nearest-neighbour
// resize / centered pad to the static geometry bucket, label //divide
// decode, and a pthread pool that fills caller-provided arenas — Python
// (ctypes) only orchestrates and hands the uint8 arena to jax.device_put.
//
// Build:  g++ -O3 -shared -fPIC -o liboct_loader.so oct_loader.cpp -lz -lpthread
//
// Exported C API (see tcct_tpu/data/native.py):
//   int oct_png_info(path, int* h, int* w, int* channels)
//   int oct_decode_png(path, uint8_t* out, int h, int w, int channels)
//   int oct_load_batch(paths, n, out_img, out_lab, geometry..., n_threads)

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>
#include <atomic>
#include <zlib.h>

namespace {

struct Image {
  int h = 0, w = 0, c = 0;
  std::vector<uint8_t> pix;  // h*w*c, row-major
};

uint32_t be32(const uint8_t* p) {
  return (uint32_t(p[0]) << 24) | (uint32_t(p[1]) << 16) |
         (uint32_t(p[2]) << 8) | uint32_t(p[3]);
}

int paeth(int a, int b, int c) {
  int p = a + b - c, pa = abs(p - a), pb = abs(p - b), pc = abs(p - c);
  if (pa <= pb && pa <= pc) return a;
  if (pb <= pc) return b;
  return c;
}

// Minimal PNG decoder: 8-bit depth, color types 0 (gray), 2 (RGB),
// 3 (palette), 4 (gray+alpha), 6 (RGBA); no Adam7 interlace.
bool decode_png(const char* path, Image& im) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long size = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> buf(size);
  if (fread(buf.data(), 1, size, f) != (size_t)size) { fclose(f); return false; }
  fclose(f);
  static const uint8_t sig[8] = {137, 80, 78, 71, 13, 10, 26, 10};
  if (size < 8 || memcmp(buf.data(), sig, 8) != 0) return false;

  int W = 0, H = 0, depth = 0, ctype = 0, interlace = 0;
  std::vector<uint8_t> idat;
  std::vector<uint8_t> palette;  // rgb triples
  size_t pos = 8;
  while (pos + 8 <= (size_t)size) {
    uint32_t len = be32(&buf[pos]);
    const char* tag = (const char*)&buf[pos + 4];
    const uint8_t* data = &buf[pos + 8];
    if (pos + 12 + len > (size_t)size) return false;
    if (!memcmp(tag, "IHDR", 4)) {
      W = be32(data); H = be32(data + 4);
      depth = data[8]; ctype = data[9]; interlace = data[12];
    } else if (!memcmp(tag, "PLTE", 4)) {
      palette.assign(data, data + len);
    } else if (!memcmp(tag, "IDAT", 4)) {
      idat.insert(idat.end(), data, data + len);
    } else if (!memcmp(tag, "IEND", 4)) {
      break;
    }
    pos += 12 + len;
  }
  if (W <= 0 || H <= 0 || depth != 8 || interlace != 0) return false;
  int nch;
  switch (ctype) {
    case 0: nch = 1; break;
    case 2: nch = 3; break;
    case 3: nch = 1; break;
    case 4: nch = 2; break;
    case 6: nch = 4; break;
    default: return false;
  }

  size_t stride = (size_t)W * nch;
  std::vector<uint8_t> raw((stride + 1) * H);
  uLongf out_len = raw.size();
  if (uncompress(raw.data(), &out_len, idat.data(), idat.size()) != Z_OK)
    return false;
  // a truncated stream would leave uninitialized raster bytes
  if (out_len != (uLongf)raw.size()) return false;

  // unfilter
  std::vector<uint8_t> img(stride * H);
  int bpp = nch;
  for (int y = 0; y < H; ++y) {
    uint8_t ft = raw[y * (stride + 1)];
    const uint8_t* src = &raw[y * (stride + 1) + 1];
    uint8_t* dst = &img[y * stride];
    const uint8_t* up = y ? &img[(y - 1) * stride] : nullptr;
    for (size_t x = 0; x < stride; ++x) {
      int a = x >= (size_t)bpp ? dst[x - bpp] : 0;
      int b = up ? up[x] : 0;
      int c = (up && x >= (size_t)bpp) ? up[x - bpp] : 0;
      int v = src[x];
      switch (ft) {
        case 0: break;
        case 1: v += a; break;
        case 2: v += b; break;
        case 3: v += (a + b) / 2; break;
        case 4: v += paeth(a, b, c); break;
        default: return false;
      }
      dst[x] = (uint8_t)v;
    }
  }

  // expand palette / drop alpha to a plain gray or rgb image
  if (ctype == 3) {
    if (palette.empty()) return false;
    im.h = H; im.w = W; im.c = 3;
    im.pix.resize((size_t)H * W * 3);
    for (size_t i = 0; i < (size_t)H * W; ++i) {
      size_t idx = img[i];
      if (idx * 3 + 3 > palette.size()) return false;
      memcpy(&im.pix[i * 3], &palette[idx * 3], 3);
    }
  } else if (ctype == 4 || ctype == 6) {
    int keep = nch - 1;
    im.h = H; im.w = W; im.c = keep;
    im.pix.resize((size_t)H * W * keep);
    for (size_t i = 0; i < (size_t)H * W; ++i)
      memcpy(&im.pix[i * keep], &img[i * nch], keep);
  } else {
    im.h = H; im.w = W; im.c = nch;
    im.pix = std::move(img);
  }
  return true;
}

// Channel order is BGR to match cv2.imread exactly — the reference
// pipeline (and therefore the shipped checkpoints) consumed cv2-loaded
// BGR images (task1/data/octnpy.py:119).
void to_rgb(const Image& in, Image& out) {
  out.h = in.h; out.w = in.w; out.c = 3;
  out.pix.resize((size_t)in.h * in.w * 3);
  if (in.c >= 3) {
    for (size_t i = 0; i < (size_t)in.h * in.w; ++i) {
      out.pix[i * 3 + 0] = in.pix[i * in.c + 2];  // B
      out.pix[i * 3 + 1] = in.pix[i * in.c + 1];  // G
      out.pix[i * 3 + 2] = in.pix[i * in.c + 0];  // R
    }
    return;
  }
  for (size_t i = 0; i < (size_t)in.h * in.w; ++i) {
    uint8_t g = in.pix[i * in.c];
    out.pix[i * 3] = out.pix[i * 3 + 1] = out.pix[i * 3 + 2] = g;
  }
}

void to_gray(const Image& in, Image& out) {
  if (in.c == 1) { out = in; return; }
  out.h = in.h; out.w = in.w; out.c = 1;
  out.pix.resize((size_t)in.h * in.w);
  if (in.c >= 3) {
    // cv2 IMREAD_GRAYSCALE fixed-point luma: (R*4899 + G*9617 + B*1868 + 8192) >> 14
    for (size_t i = 0; i < (size_t)in.h * in.w; ++i) {
      int r = in.pix[i * in.c], g = in.pix[i * in.c + 1], b = in.pix[i * in.c + 2];
      out.pix[i] = (uint8_t)((r * 4899 + g * 9617 + b * 1868 + 8192) >> 14);
    }
  } else {
    for (size_t i = 0; i < (size_t)in.h * in.w; ++i)
      out.pix[i] = in.pix[i * in.c];
  }
}

// nearest-neighbour resize matching cv2.INTER_NEAREST / torch 'nearest':
// src = floor(i * in / out)
void resize_nearest(const Image& in, int H, int W, Image& out) {
  out.h = H; out.w = W; out.c = in.c;
  out.pix.resize((size_t)H * W * in.c);
  for (int y = 0; y < H; ++y) {
    int sy = (int)((int64_t)y * in.h / H);
    if (sy >= in.h) sy = in.h - 1;
    for (int x = 0; x < W; ++x) {
      int sx = (int)((int64_t)x * in.w / W);
      if (sx >= in.w) sx = in.w - 1;
      memcpy(&out.pix[((size_t)y * W + x) * in.c],
             &in.pix[((size_t)sy * in.w + sx) * in.c], in.c);
    }
  }
}

// centered pad (alb.PadIfNeeded) then top-left crop to exactly HxW
void pad_or_crop(const Image& in, int H, int W, bool reflect, Image& out) {
  out.h = H; out.w = W; out.c = in.c;
  out.pix.assign((size_t)H * W * in.c, 0);
  int ph = H > in.h ? H - in.h : 0;
  int pw = W > in.w ? W - in.w : 0;
  int top = ph / 2, left = pw / 2;
  for (int y = 0; y < H; ++y) {
    int sy = y - top;
    if (sy < 0 || sy >= in.h) {
      if (!reflect) continue;
      // cv2.BORDER_REFLECT (edge-including: -1 -> 0), the duke2 mode
      // (reference task1/data/octnpy.py:69); NOT REFLECT_101
      sy = sy < 0 ? -sy - 1 : 2 * in.h - sy - 1;
      if (sy < 0 || sy >= in.h) continue;
    }
    for (int x = 0; x < W; ++x) {
      int sx = x - left;
      if (sx < 0 || sx >= in.w) {
        if (!reflect) continue;
        sx = sx < 0 ? -sx - 1 : 2 * in.w - sx - 1;
        if (sx < 0 || sx >= in.w) continue;
      }
      memcpy(&out.pix[((size_t)y * W + x) * in.c],
             &in.pix[((size_t)sy * in.w + sx) * in.c], in.c);
    }
  }
}

}  // namespace

extern "C" {

int oct_png_info(const char* path, int* h, int* w, int* c) {
  Image im;
  if (!decode_png(path, im)) return -1;
  *h = im.h; *w = im.w; *c = im.c;
  return 0;
}

int oct_decode_png(const char* path, uint8_t* out, int h, int w, int channels) {
  Image im;
  if (!decode_png(path, im)) return -1;
  Image conv;
  if (channels == 3) to_rgb(im, conv); else to_gray(im, conv);
  if (conv.h != h || conv.w != w) return -2;
  memcpy(out, conv.pix.data(), (size_t)h * w * channels);
  return 0;
}

// Batch load with geometry prep (reference octnpy.py:58-129 semantics):
//   - crop rows [height_stt, height_end)
//   - prep_mode 0: centered pad to (H, W) (reflect if prep_reflect)
//     prep_mode 1: nearest resize to (H, W)
//   - image -> out_img (n,H,W,3); label path = img path with img->lab
//     substitution done by the caller (lab_paths), gray //divide -> out_lab
// Returns number of successfully loaded pairs; failed slots are zeroed.
int oct_load_batch(const char** img_paths, const char** lab_paths, int n,
                   uint8_t* out_img, uint8_t* out_lab, int H, int W,
                   int height_stt, int height_end, int prep_mode,
                   int prep_reflect, int divide, int n_threads) {
  std::atomic<int> next(0), ok(0);
  auto work = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      uint8_t* dst_img = out_img + (size_t)i * H * W * 3;
      uint8_t* dst_lab = out_lab ? out_lab + (size_t)i * H * W : nullptr;
      memset(dst_img, 0, (size_t)H * W * 3);
      if (dst_lab) memset(dst_lab, 0, (size_t)H * W);

      Image raw, img;
      if (!decode_png(img_paths[i], raw)) continue;
      to_rgb(raw, img);
      // crop band
      int stt = height_stt < img.h ? height_stt : img.h;
      int end = height_end < img.h ? height_end : img.h;
      if (end > stt) {
        Image band;
        band.h = end - stt; band.w = img.w; band.c = 3;
        band.pix.assign(img.pix.begin() + (size_t)stt * img.w * 3,
                        img.pix.begin() + (size_t)end * img.w * 3);
        img = std::move(band);
      }
      Image prepped;
      if (prep_mode == 1) resize_nearest(img, H, W, prepped);
      else pad_or_crop(img, H, W, prep_reflect != 0, prepped);
      memcpy(dst_img, prepped.pix.data(), (size_t)H * W * 3);

      if (dst_lab && lab_paths && lab_paths[i] && lab_paths[i][0]) {
        Image lraw, lab;
        if (decode_png(lab_paths[i], lraw)) {
          to_gray(lraw, lab);
          for (auto& v : lab.pix) v = (uint8_t)(v / (divide > 0 ? divide : 1));
          int ls = height_stt < lab.h ? height_stt : lab.h;
          int le = height_end < lab.h ? height_end : lab.h;
          if (le > ls) {
            Image band;
            band.h = le - ls; band.w = lab.w; band.c = 1;
            band.pix.assign(lab.pix.begin() + (size_t)ls * lab.w,
                            lab.pix.begin() + (size_t)le * lab.w);
            lab = std::move(band);
          }
          Image lp;
          if (prep_mode == 1) resize_nearest(lab, H, W, lp);
          else pad_or_crop(lab, H, W, prep_reflect != 0, lp);
          memcpy(dst_lab, lp.pix.data(), (size_t)H * W);
        }
      }
      ok.fetch_add(1);
    }
  };
  int nt = n_threads > 0 ? n_threads : (int)std::thread::hardware_concurrency();
  if (nt > n) nt = n > 0 ? n : 1;
  std::vector<std::thread> threads;
  for (int t = 0; t < nt; ++t) threads.emplace_back(work);
  for (auto& t : threads) t.join();
  return ok.load();
}

}  // extern "C"
