// Native batch loader for S2TSCzCrop-style npy patch archives.
//
// Replaces the Python hot path of S2TSCZCropDataset._load_raw + collate
// (crop2seg_tpu/data/s2tsczcrop.py:148-170, data/batcher.py:26-58) for the
// common no-augmentation case: parse .npy (T, C_in, H, W) float32/float16,
// reorder channels to the PASTIS order, standardize per channel, transpose
// to channels-last and write each sample into its padded (T_bucket, H, W,
// C_out) slot of the batch buffer, all off the GIL on a std::thread pool.
// The single-core host makes Python-side per-pixel work the training
// input bottleneck (reference equivalent: torch DataLoader workers, which
// the reference disables, /root/reference/train.py:353-354).
//
// Build: python scripts/build_native.py   (g++ -O3 -shared -fPIC)
#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

namespace {

enum NpyDtype { kF4, kF2, kU2, kI2, kU1 };

struct NpyInfo {
  int64_t shape[4] = {0, 0, 0, 0};
  int ndim = 0;
  NpyDtype dtype = kF4;
  size_t data_offset = 0;
};

inline size_t dtype_size(NpyDtype d) { return d == kF4 ? 4 : d == kU1 ? 1 : 2; }

// minimal .npy v1/v2 header parse; returns false on malformed files
bool parse_npy_header(FILE* f, NpyInfo* info) {
  unsigned char magic[8];
  if (fread(magic, 1, 8, f) != 8) return false;
  if (memcmp(magic, "\x93NUMPY", 6) != 0) return false;
  int major = magic[6];
  uint32_t hlen = 0;
  if (major == 1) {
    unsigned char b[2];
    if (fread(b, 1, 2, f) != 2) return false;
    hlen = b[0] | (b[1] << 8);
    info->data_offset = 10 + hlen;
  } else {
    unsigned char b[4];
    if (fread(b, 1, 4, f) != 4) return false;
    hlen = b[0] | (b[1] << 8) | (b[2] << 16) | (uint32_t(b[3]) << 24);
    info->data_offset = 12 + hlen;
  }
  std::string hdr(hlen, '\0');
  if (fread(&hdr[0], 1, hlen, f) != hlen) return false;
  if (hdr.find("'fortran_order': True") != std::string::npos) return false;
  // the reference dataset creator saves DATA_S2 patches as uint16
  // (sentinel2raster.py:396 profile dtype) and TARGETs can be uint8/int16;
  // its __getitem__ casts on load — we widen to float here instead.
  if (hdr.find("<f4") != std::string::npos) {
    info->dtype = kF4;
  } else if (hdr.find("<f2") != std::string::npos) {
    info->dtype = kF2;
  } else if (hdr.find("<u2") != std::string::npos) {
    info->dtype = kU2;
  } else if (hdr.find("<i2") != std::string::npos) {
    info->dtype = kI2;
  } else if (hdr.find("|u1") != std::string::npos) {
    info->dtype = kU1;
  } else {
    return false;
  }
  size_t sp = hdr.find("'shape':");
  if (sp == std::string::npos) return false;
  sp = hdr.find('(', sp);
  size_t ep = hdr.find(')', sp);
  if (sp == std::string::npos || ep == std::string::npos) return false;
  std::string dims = hdr.substr(sp + 1, ep - sp - 1);
  info->ndim = 0;
  const char* p = dims.c_str();
  while (*p && info->ndim < 4) {
    while (*p == ' ' || *p == ',') p++;
    if (!*p) break;
    info->shape[info->ndim++] = strtoll(p, const_cast<char**>(&p), 10);
  }
  return info->ndim >= 1;
}

inline float half_to_float(uint16_t h) {
  uint32_t sign = (h & 0x8000u) << 16;
  uint32_t exp = (h >> 10) & 0x1f;
  uint32_t frac = h & 0x3ffu;
  uint32_t bits;
  if (exp == 0) {
    if (frac == 0) {
      bits = sign;
    } else {  // subnormal
      exp = 127 - 15 + 1;
      while (!(frac & 0x400u)) { frac <<= 1; exp--; }
      frac &= 0x3ffu;
      bits = sign | (exp << 23) | (frac << 13);
    }
  } else if (exp == 0x1f) {
    bits = sign | 0x7f800000u | (frac << 13);
  } else {
    bits = sign | ((exp - 15 + 127) << 23) | (frac << 13);
  }
  float out;
  memcpy(&out, &bits, 4);
  return out;
}

// one sample: read, reorder, normalize, transpose, pad
int load_one(const char* path, int t_bucket, float pad_value,
             const float* mean, const float* stdv, const int* reorder,
             int c_out, int h, int w, float* out, unsigned char* mask,
             int* length) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  if (!parse_npy_header(f, &info) || info.ndim != 4) { fclose(f); return -2; }
  const int64_t T = info.shape[0], C_in = info.shape[1];
  if (info.shape[2] != h || info.shape[3] != w) { fclose(f); return -3; }
  const int64_t hw = int64_t(h) * w;
  const int t_use = int(T < t_bucket ? T : t_bucket);
  *length = t_use;
  const size_t esz = dtype_size(info.dtype);
  std::vector<unsigned char> frame(size_t(C_in) * hw * esz);

  if (fseek(f, long(info.data_offset), SEEK_SET) != 0) { fclose(f); return -4; }
  for (int t = 0; t < t_use; t++) {
    if (fread(frame.data(), 1, frame.size(), f) != frame.size()) {
      fclose(f);
      return -5;
    }
    float* dst_t = out + size_t(t) * hw * c_out;
    for (int ci = 0; ci < c_out; ci++) {
      const int cs = reorder ? reorder[ci] : ci;
      if (cs < 0 || cs >= C_in) { fclose(f); return -6; }
      const float m = mean ? mean[ci] : 0.0f;
      const float inv = stdv ? 1.0f / stdv[ci] : 1.0f;
      float* dst = dst_t + ci;
      switch (info.dtype) {
        case kF2: {
          const uint16_t* src =
              reinterpret_cast<const uint16_t*>(frame.data()) + size_t(cs) * hw;
          for (int64_t p = 0; p < hw; p++)
            dst[size_t(p) * c_out] = (half_to_float(src[p]) - m) * inv;
          break;
        }
        case kU2: {
          const uint16_t* src =
              reinterpret_cast<const uint16_t*>(frame.data()) + size_t(cs) * hw;
          for (int64_t p = 0; p < hw; p++)
            dst[size_t(p) * c_out] = (float(src[p]) - m) * inv;
          break;
        }
        case kI2: {
          const int16_t* src =
              reinterpret_cast<const int16_t*>(frame.data()) + size_t(cs) * hw;
          for (int64_t p = 0; p < hw; p++)
            dst[size_t(p) * c_out] = (float(src[p]) - m) * inv;
          break;
        }
        case kU1: {
          const uint8_t* src =
              reinterpret_cast<const uint8_t*>(frame.data()) + size_t(cs) * hw;
          for (int64_t p = 0; p < hw; p++)
            dst[size_t(p) * c_out] = (float(src[p]) - m) * inv;
          break;
        }
        default: {
          const float* src =
              reinterpret_cast<const float*>(frame.data()) + size_t(cs) * hw;
          for (int64_t p = 0; p < hw; p++)
            dst[size_t(p) * c_out] = (src[p] - m) * inv;
        }
      }
    }
    mask[t] = 0;
  }
  fclose(f);
  // pad frames
  for (int t = t_use; t < t_bucket; t++) {
    float* dst_t = out + size_t(t) * hw * c_out;
    for (int64_t i = 0; i < hw * c_out; i++) dst_t[i] = pad_value;
    mask[t] = 1;
  }
  return 0;
}

}  // namespace

extern "C" {

// Returns 0 on success; otherwise the first nonzero per-sample error code.
// out: (n, t_bucket, h, w, c_out) float32; mask: (n, t_bucket) uint8 (1=pad);
// lengths: (n,) int32. reorder maps output channel -> source channel.
int c2s_load_batch(const char** paths, int n, int t_bucket, float pad_value,
                   const float* mean, const float* stdv, const int* reorder,
                   int c_out, int h, int w, float* out, unsigned char* mask,
                   int* lengths, int n_threads) {
  std::atomic<int> next(0), err(0);
  const size_t sample_elems = size_t(t_bucket) * h * w * c_out;
  auto worker = [&]() {
    for (;;) {
      const int i = next.fetch_add(1);
      if (i >= n) return;
      const int rc =
          load_one(paths[i], t_bucket, pad_value, mean, stdv, reorder, c_out,
                   h, w, out + size_t(i) * sample_elems,
                   mask + size_t(i) * t_bucket, lengths + i);
      if (rc != 0) {
        int expected = 0;
        err.compare_exchange_strong(expected, rc);
      }
    }
  };
  if (n_threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    const int k = n_threads < n ? n_threads : n;
    for (int i = 0; i < k; i++) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
  return err.load();
}

// Parse just the (T, C, H, W) shape of an npy file (returns ndim or <0).
int c2s_npy_shape(const char* path, int64_t* shape4) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  NpyInfo info;
  const bool ok = parse_npy_header(f, &info);
  fclose(f);
  if (!ok) return -2;
  for (int i = 0; i < 4; i++) shape4[i] = info.shape[i];
  return info.ndim;
}

}  // extern "C"
