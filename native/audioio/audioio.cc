// audioio: native audio decode + resample for the host-side data pipeline.
//
// Replaces the reference's torchaudio C++ (sox/ffmpeg) decode and resample
// path (reference open_musiclm/data.py:11,17,120; utils.py:164). The Python
// environment here ships no audio decoder at all, so this library is the
// framework's actual decode path: RIFF/WAVE parsing (PCM 8/16/24/32,
// IEEE float32/64), mono mixdown, and a polyphase windowed-sinc resampler
// matching torchaudio's sinc_interp_hann kernel (width 6, rolloff 0.99) so
// host-side and on-device (ops/audio.py) resampling agree.
//
// Exposed as a C ABI for ctypes. All entry points release the GIL by nature
// (pure C calls), so a Python thread pool achieves true parallel decode.

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <numeric>
#include <vector>

namespace {

constexpr double kPi = 3.14159265358979323846;

struct WavData {
  std::vector<float> samples;  // interleaved
  int sample_rate = 0;
  int channels = 0;
};

uint32_t rd_u32(const uint8_t* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t rd_u16(const uint8_t* p) { return (uint16_t)p[0] | ((uint16_t)p[1] << 8); }

bool parse_wav(const uint8_t* buf, size_t len, WavData* out) {
  if (len < 12 || memcmp(buf, "RIFF", 4) != 0 || memcmp(buf + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  uint16_t fmt = 0, channels = 0, bits = 0;
  uint32_t sample_rate = 0;
  bool have_fmt = false;
  while (pos + 8 <= len) {
    const uint8_t* hdr = buf + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* data = hdr + 8;
    size_t avail = std::min<size_t>(chunk_len, len - pos - 8);
    if (memcmp(hdr, "fmt ", 4) == 0 && avail >= 16) {
      fmt = rd_u16(data);
      channels = rd_u16(data + 2);
      sample_rate = rd_u32(data + 4);
      bits = rd_u16(data + 14);
      if (fmt == 0xFFFE && avail >= 40) {  // WAVE_FORMAT_EXTENSIBLE
        fmt = rd_u16(data + 24);
      }
      have_fmt = true;
    } else if (memcmp(hdr, "data", 4) == 0) {
      if (!have_fmt || channels == 0 || sample_rate == 0) return false;
      size_t bytes_per = bits / 8;
      if (bytes_per == 0) return false;
      size_t n = avail / bytes_per;
      out->samples.resize(n);
      if (fmt == 1) {  // PCM
        if (bits == 16) {
          for (size_t i = 0; i < n; i++) {
            int16_t v = (int16_t)rd_u16(data + 2 * i);
            out->samples[i] = (float)v / 32768.0f;
          }
        } else if (bits == 24) {
          for (size_t i = 0; i < n; i++) {
            const uint8_t* p = data + 3 * i;
            int32_t v = (int32_t)((uint32_t)p[0] << 8 | (uint32_t)p[1] << 16 |
                                  (uint32_t)p[2] << 24) >> 8;
            out->samples[i] = (float)v / 8388608.0f;
          }
        } else if (bits == 32) {
          for (size_t i = 0; i < n; i++) {
            int32_t v = (int32_t)rd_u32(data + 4 * i);
            out->samples[i] = (float)((double)v / 2147483648.0);
          }
        } else if (bits == 8) {
          for (size_t i = 0; i < n; i++)
            out->samples[i] = ((float)data[i] - 128.0f) / 128.0f;
        } else {
          return false;
        }
      } else if (fmt == 3) {  // IEEE float
        if (bits == 32) {
          for (size_t i = 0; i < n; i++) {
            float v;
            memcpy(&v, data + 4 * i, 4);
            out->samples[i] = v;
          }
        } else if (bits == 64) {
          for (size_t i = 0; i < n; i++) {
            double v;
            memcpy(&v, data + 8 * i, 8);
            out->samples[i] = (float)v;
          }
        } else {
          return false;
        }
      } else {
        return false;
      }
      out->sample_rate = (int)sample_rate;
      out->channels = (int)channels;
      return true;
    }
    pos += 8 + chunk_len + (chunk_len & 1);
  }
  return false;
}

bool read_file(const char* path, std::vector<uint8_t>* out) {
  FILE* f = fopen(path, "rb");
  if (!f) return false;
  fseek(f, 0, SEEK_END);
  long len = ftell(f);
  fseek(f, 0, SEEK_SET);
  if (len <= 0) {
    fclose(f);
    return false;
  }
  out->resize((size_t)len);
  size_t got = fread(out->data(), 1, (size_t)len, f);
  fclose(f);
  return got == (size_t)len;
}

// torchaudio-compatible windowed-sinc polyphase resampler
// (sinc_interp_hann, lowpass_filter_width=6, rolloff=0.99)
void resample_sinc(const std::vector<float>& in, int orig_freq, int new_freq,
                   std::vector<float>* out) {
  if (orig_freq == new_freq) {
    *out = in;
    return;
  }
  int g = std::gcd(orig_freq, new_freq);
  int orig = orig_freq / g, nf = new_freq / g;
  const int lowpass_width = 6;
  const double rolloff = 0.99;
  double base_freq = std::min(orig, nf) * rolloff;
  int width = (int)std::ceil((double)lowpass_width * orig / base_freq);
  int klen = 2 * width + orig;

  // kernels[phase][tap]
  std::vector<std::vector<float>> kernels(nf, std::vector<float>(klen));
  for (int p = 0; p < nf; p++) {
    for (int t = 0; t < klen; t++) {
      double idx = (double)(t - width) / orig - (double)p / nf;
      double x = idx * base_freq;
      x = std::max(-(double)lowpass_width, std::min((double)lowpass_width, x));
      double w = std::cos(x * kPi / lowpass_width / 2.0);
      w = w * w;
      double xp = x * kPi;
      double sinc = (xp == 0.0) ? 1.0 : std::sin(xp) / xp;
      kernels[p][t] = (float)(sinc * w * base_freq / orig);
    }
  }

  long T = (long)in.size();
  long target = (long)std::ceil((double)nf * T / orig);
  out->assign(target, 0.0f);
  long frames = (T + orig - 1) / orig;  // one output group per `orig` inputs
  for (long f = 0; f < frames; f++) {
    long in_base = f * orig - width;
    for (int p = 0; p < nf; p++) {
      long oi = f * nf + p;
      if (oi >= target) break;
      double acc = 0.0;
      const std::vector<float>& k = kernels[p];
      long lo = std::max<long>(0, -in_base);
      long hi = std::min<long>(klen, T - in_base);
      for (long t = lo; t < hi; t++) acc += (double)in[in_base + t] * k[t];
      (*out)[oi] = (float)acc;
    }
  }
}

}  // namespace

extern "C" {

// Returns 0 on success.
int aio_wav_info(const char* path, int* sample_rate, int* channels, long* frames) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  WavData w;
  if (!parse_wav(buf.data(), buf.size(), &w)) return -2;
  *sample_rate = w.sample_rate;
  *channels = w.channels;
  *frames = (long)(w.samples.size() / w.channels);
  return 0;
}

// Decode to mono float32. If target_sr > 0 and != native rate, resample.
// Writes up to max_samples into out; returns the number of samples written,
// or negative on error. native_sr_out receives the file's native rate.
long aio_read_wav(const char* path, int target_sr, float* out, long max_samples,
                  int* native_sr_out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  WavData w;
  if (!parse_wav(buf.data(), buf.size(), &w)) return -2;
  if (native_sr_out) *native_sr_out = w.sample_rate;

  long frames = (long)(w.samples.size() / w.channels);
  std::vector<float> mono((size_t)frames);
  if (w.channels == 1) {
    mono.assign(w.samples.begin(), w.samples.end());
  } else {
    for (long i = 0; i < frames; i++) {
      double acc = 0.0;
      for (int c = 0; c < w.channels; c++) acc += w.samples[i * w.channels + c];
      mono[i] = (float)(acc / w.channels);
    }
  }

  std::vector<float> res;
  const std::vector<float>* src = &mono;
  if (target_sr > 0 && target_sr != w.sample_rate) {
    resample_sinc(mono, w.sample_rate, target_sr, &res);
    src = &res;
  }
  long n = std::min<long>((long)src->size(), max_samples);
  memcpy(out, src->data(), (size_t)n * sizeof(float));
  return n;
}

// Standalone resample utility (mono float32).
long aio_resample(const float* in, long n, int orig_sr, int new_sr, float* out,
                  long max_out) {
  std::vector<float> v(in, in + n), res;
  resample_sinc(v, orig_sr, new_sr, &res);
  long m = std::min<long>((long)res.size(), max_out);
  memcpy(out, res.data(), (size_t)m * sizeof(float));
  return m;
}

// Write a mono/multi-channel float WAV (PCM16) — for infer.py output.
int aio_write_wav(const char* path, const float* data, long frames, int channels,
                  int sample_rate) {
  FILE* f = fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_bytes = (uint32_t)(frames * channels * 2);
  uint32_t riff_len = 36 + data_bytes;
  uint16_t block_align = (uint16_t)(channels * 2);
  uint32_t byte_rate = (uint32_t)sample_rate * block_align;
  uint16_t fmt_pcm = 1, bits = 16, ch = (uint16_t)channels;
  fwrite("RIFF", 1, 4, f);
  fwrite(&riff_len, 4, 1, f);
  fwrite("WAVE", 1, 4, f);
  fwrite("fmt ", 1, 4, f);
  uint32_t fmt_len = 16;
  fwrite(&fmt_len, 4, 1, f);
  fwrite(&fmt_pcm, 2, 1, f);
  fwrite(&ch, 2, 1, f);
  uint32_t sr = (uint32_t)sample_rate;
  fwrite(&sr, 4, 1, f);
  fwrite(&byte_rate, 4, 1, f);
  fwrite(&block_align, 2, 1, f);
  fwrite(&bits, 2, 1, f);
  fwrite("data", 1, 4, f);
  fwrite(&data_bytes, 4, 1, f);
  std::vector<int16_t> pcm((size_t)frames * channels);
  for (size_t i = 0; i < pcm.size(); i++) {
    float v = std::max(-1.0f, std::min(1.0f, data[i]));
    pcm[i] = (int16_t)lrintf(v * 32767.0f);
  }
  fwrite(pcm.data(), 2, pcm.size(), f);
  fclose(f);
  return 0;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// MP3 decode via libmpg123 (dlopen'd — no headers/link-time dep needed).
// Covers the FMA dataset (reference data.py exts; FMA ships mp3).
// ---------------------------------------------------------------------------

#include <dlfcn.h>

namespace {

struct Mpg123Api {
  void* lib = nullptr;
  int (*init)() = nullptr;
  void* (*make)(const char*, int*) = nullptr;
  int (*open)(void*, const char*) = nullptr;
  int (*getformat)(void*, long*, int*, int*) = nullptr;
  int (*format_none)(void*) = nullptr;
  int (*format)(void*, long, int, int) = nullptr;
  int (*read)(void*, void*, size_t, size_t*) = nullptr;
  int (*close)(void*) = nullptr;
  void (*del)(void*) = nullptr;

  bool ok() const { return lib != nullptr; }
};

const Mpg123Api& mpg123() {
  static Mpg123Api api = [] {
    Mpg123Api a;
    void* h = dlopen("libmpg123.so.0", RTLD_NOW | RTLD_GLOBAL);
    if (!h) return a;
    a.init = (int (*)())dlsym(h, "mpg123_init");
    a.make = (void* (*)(const char*, int*))dlsym(h, "mpg123_new");
    a.open = (int (*)(void*, const char*))dlsym(h, "mpg123_open");
    a.getformat = (int (*)(void*, long*, int*, int*))dlsym(h, "mpg123_getformat");
    a.format_none = (int (*)(void*))dlsym(h, "mpg123_format_none");
    a.format = (int (*)(void*, long, int, int))dlsym(h, "mpg123_format");
    a.read = (int (*)(void*, void*, size_t, size_t*))dlsym(h, "mpg123_read");
    a.close = (int (*)(void*))dlsym(h, "mpg123_close");
    a.del = (void (*)(void*))dlsym(h, "mpg123_delete");
    if (a.make && a.open && a.getformat && a.format && a.read && a.close) {
      if (a.init) a.init();
      a.lib = h;
    }
    return a;
  }();
  return api;
}

constexpr int kEncFloat32 = 0x200;  // MPG123_ENC_FLOAT_32
constexpr int kMpgDone = -12;      // MPG123_DONE
constexpr int kMpgOk = 0;

}  // namespace

extern "C" {

int aio_have_mp3() { return mpg123().ok() ? 1 : 0; }

// Decode an MP3 to mono float32 (resampled if target_sr > 0).
// Returns samples written, or negative on error.
long aio_read_mp3(const char* path, int target_sr, float* out, long max_samples,
                  int* native_sr_out) {
  const Mpg123Api& m = mpg123();
  if (!m.ok()) return -10;
  int err = 0;
  void* h = m.make(nullptr, &err);
  if (!h) return -11;
  long rc = -12;
  std::vector<float> interleaved;
  long rate = 0;
  int channels = 0, enc = 0;
  do {
    // output format must be registered BEFORE open (format changes after the
    // stream has synced only apply from the next stream)
    static const long kRates[] = {8000,  11025, 12000, 16000, 22050,
                                  24000, 32000, 44100, 48000};
    m.format_none(h);
    for (long r : kRates) m.format(h, r, 3 /* mono|stereo */, kEncFloat32);
    if (m.open(h, path) != kMpgOk) break;
    if (m.getformat(h, &rate, &channels, &enc) != kMpgOk) break;
    bool is_float = (enc & kEncFloat32) != 0;
    std::vector<unsigned char> buf(1 << 16);
    size_t done = 0;
    int r;
    while (true) {
      r = m.read(h, buf.data(), buf.size(), &done);
      if (is_float) {
        size_t n = done / sizeof(float);
        const float* f = (const float*)buf.data();
        interleaved.insert(interleaved.end(), f, f + n);
      } else {  // fall back: signed 16-bit native output
        size_t n = done / sizeof(int16_t);
        const int16_t* q = (const int16_t*)buf.data();
        for (size_t i = 0; i < n; i++)
          interleaved.push_back((float)q[i] / 32768.0f);
      }
      if (r == kMpgDone) break;
      if (r != kMpgOk && r != -11 /* NEW_FORMAT */) break;
      if (r == -11) {  // format changed mid-stream: re-query
        m.getformat(h, &rate, &channels, &enc);
        is_float = (enc & kEncFloat32) != 0;
      }
    }
    rc = 0;
  } while (false);
  m.close(h);
  if (m.del) m.del(h);
  if (rc != 0) return rc;
  if (native_sr_out) *native_sr_out = (int)rate;

  long frames = (long)(interleaved.size() / std::max(channels, 1));
  std::vector<float> mono((size_t)frames);
  if (channels <= 1) {
    mono.assign(interleaved.begin(), interleaved.end());
  } else {
    for (long i = 0; i < frames; i++) {
      double acc = 0;
      for (int c = 0; c < channels; c++) acc += interleaved[i * channels + c];
      mono[i] = (float)(acc / channels);
    }
  }
  std::vector<float> res;
  const std::vector<float>* src = &mono;
  if (target_sr > 0 && target_sr != (int)rate) {
    resample_sinc(mono, (int)rate, target_sr, &res);
    src = &res;
  }
  long n = std::min<long>((long)src->size(), max_samples);
  memcpy(out, src->data(), (size_t)n * sizeof(float));
  return n;
}

}  // extern "C"

// ---------------------------------------------------------------------------
// FLAC decode — from scratch (no libFLAC in this image).
// Supports: 16/24-bit, constant/verbatim/fixed/LPC subframes, rice/rice2
// residuals, all stereo decorrelation modes. CRCs are parsed but not
// verified (decode-oriented).
// ---------------------------------------------------------------------------

namespace {

struct BitReader {
  const uint8_t* data;
  size_t len;
  size_t byte = 0;
  int bit = 0;  // bits consumed in current byte (0..7)

  bool eof() const { return byte >= len; }

  int read_bit() {
    if (byte >= len) return -1;
    int v = (data[byte] >> (7 - bit)) & 1;
    if (++bit == 8) {
      bit = 0;
      byte++;
    }
    return v;
  }

  // read up to 32 bits, MSB first; returns -1 on EOF via ok flag
  uint32_t read_bits(int n, bool* ok) {
    uint32_t v = 0;
    for (int i = 0; i < n; i++) {
      int b = read_bit();
      if (b < 0) {
        *ok = false;
        return 0;
      }
      v = (v << 1) | (uint32_t)b;
    }
    return v;
  }

  int64_t read_signed(int n, bool* ok) {
    uint32_t v = read_bits(n, ok);
    if (!*ok || n == 0) return 0;
    if (v & (1u << (n - 1))) return (int64_t)v - ((int64_t)1 << n);
    return (int64_t)v;
  }

  // unary: count zeros until a 1
  int64_t read_unary(bool* ok) {
    int64_t q = 0;
    while (true) {
      int b = read_bit();
      if (b < 0) {
        *ok = false;
        return 0;
      }
      if (b) return q;
      q++;
    }
  }

  void align() {
    if (bit) {
      bit = 0;
      byte++;
    }
  }
};

int64_t rice_decode(BitReader* br, int param, bool* ok) {
  int64_t q = br->read_unary(ok);
  if (!*ok) return 0;
  uint32_t r = param > 0 ? br->read_bits(param, ok) : 0;
  if (!*ok) return 0;
  uint64_t u = ((uint64_t)q << param) | r;
  // zigzag
  return (u & 1) ? -((int64_t)(u >> 1)) - 1 : (int64_t)(u >> 1);
}

bool decode_residual(BitReader* br, int blocksize, int order,
                     std::vector<int64_t>* out) {
  bool ok = true;
  uint32_t method = br->read_bits(2, &ok);
  if (!ok || method > 1) return false;
  int pbits = method == 0 ? 4 : 5;
  int escape = method == 0 ? 0xF : 0x1F;
  uint32_t porder = br->read_bits(4, &ok);
  if (!ok) return false;
  int partitions = 1 << porder;
  int samples_per = blocksize >> porder;
  if (samples_per <= 0) return false;
  for (int p = 0; p < partitions; p++) {
    int count = samples_per - (p == 0 ? order : 0);
    if (count < 0) return false;
    uint32_t param = br->read_bits(pbits, &ok);
    if (!ok) return false;
    if ((int)param == escape) {
      uint32_t raw = br->read_bits(5, &ok);
      if (!ok) return false;
      for (int i = 0; i < count; i++) {
        out->push_back(br->read_signed(raw, &ok));
        if (!ok) return false;
      }
    } else {
      for (int i = 0; i < count; i++) {
        out->push_back(rice_decode(br, (int)param, &ok));
        if (!ok) return false;
      }
    }
  }
  return true;
}

const int kFixedOrders[5][4] = {
    {}, {1}, {2, -1}, {3, -3, 1}, {4, -6, 4, -1}};

bool decode_subframe(BitReader* br, int blocksize, int bps,
                     std::vector<int64_t>* out) {
  bool ok = true;
  if (br->read_bits(1, &ok) != 0 || !ok) return false;  // padding bit
  uint32_t type = br->read_bits(6, &ok);
  if (!ok) return false;
  int wasted = 0;
  if (br->read_bit() == 1) {
    wasted = 1 + (int)br->read_unary(&ok);
    if (!ok) return false;
  }
  int ebps = bps - wasted;
  out->clear();
  out->reserve(blocksize);

  if (type == 0) {  // constant
    int64_t v = br->read_signed(ebps, &ok);
    if (!ok) return false;
    out->assign(blocksize, v);
  } else if (type == 1) {  // verbatim
    for (int i = 0; i < blocksize; i++) {
      out->push_back(br->read_signed(ebps, &ok));
      if (!ok) return false;
    }
  } else if (type >= 8 && type <= 12) {  // fixed, order 0-4
    int order = (int)type - 8;
    for (int i = 0; i < order; i++) {
      out->push_back(br->read_signed(ebps, &ok));
      if (!ok) return false;
    }
    std::vector<int64_t> resid;
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    size_t ri = 0;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      const int* coef = kFixedOrders[order];
      for (int j = 0; j < order; j++) pred += coef[j] * (*out)[i - 1 - j];
      out->push_back(pred + resid[ri++]);
    }
  } else if (type >= 32) {  // LPC, order 1-32
    int order = (int)type - 31;
    for (int i = 0; i < order; i++) {
      out->push_back(br->read_signed(ebps, &ok));
      if (!ok) return false;
    }
    uint32_t prec = br->read_bits(4, &ok) + 1;
    if (!ok || prec == 16) return false;  // 0b1111 invalid
    int64_t shift = br->read_signed(5, &ok);
    if (!ok || shift < 0) return false;
    std::vector<int64_t> coefs(order);
    for (int i = 0; i < order; i++) {
      coefs[i] = br->read_signed((int)prec, &ok);
      if (!ok) return false;
    }
    std::vector<int64_t> resid;
    if (!decode_residual(br, blocksize, order, &resid)) return false;
    size_t ri = 0;
    for (int i = order; i < blocksize; i++) {
      int64_t pred = 0;
      for (int j = 0; j < order; j++) pred += coefs[j] * (*out)[i - 1 - j];
      out->push_back((pred >> shift) + resid[ri++]);
    }
  } else {
    return false;
  }
  if (wasted) {
    for (auto& v : *out) v <<= wasted;
  }
  return true;
}

bool read_utf8_number(BitReader* br, uint64_t* out) {
  bool ok = true;
  uint32_t b0 = br->read_bits(8, &ok);
  if (!ok) return false;
  int extra = 0;
  uint64_t v = 0;
  if ((b0 & 0x80) == 0) {
    v = b0;
  } else {
    uint8_t mask = 0x40;
    while (b0 & mask) {
      extra++;
      mask >>= 1;
    }
    if (extra < 1 || extra > 6) return false;
    v = b0 & (0x3F >> extra);
  }
  for (int i = 0; i < extra; i++) {
    uint32_t b = br->read_bits(8, &ok);
    if (!ok || (b & 0xC0) != 0x80) return false;
    v = (v << 6) | (b & 0x3F);
  }
  *out = v;
  return true;
}

}  // namespace

extern "C" {

// Decode a FLAC file to mono float32 (resampled if target_sr > 0).
long aio_read_flac(const char* path, int target_sr, float* out, long max_samples,
                   int* native_sr_out) {
  std::vector<uint8_t> buf;
  if (!read_file(path, &buf)) return -1;
  if (buf.size() < 42 || memcmp(buf.data(), "fLaC", 4) != 0) return -2;

  size_t pos = 4;
  int sample_rate = 0, channels = 0, bps = 0;
  uint64_t total_samples = 0;
  bool last = false;
  // metadata blocks
  while (!last && pos + 4 <= buf.size()) {
    uint8_t hdr = buf[pos];
    last = (hdr & 0x80) != 0;
    int type = hdr & 0x7F;
    uint32_t blen = ((uint32_t)buf[pos + 1] << 16) | ((uint32_t)buf[pos + 2] << 8) |
                    buf[pos + 3];
    const uint8_t* d = buf.data() + pos + 4;
    if (type == 0 && blen >= 34) {  // STREAMINFO
      sample_rate = ((int)d[10] << 12) | ((int)d[11] << 4) | (d[12] >> 4);
      channels = ((d[12] >> 1) & 0x7) + 1;
      bps = (((d[12] & 1) << 4) | (d[13] >> 4)) + 1;
      total_samples = ((uint64_t)(d[13] & 0x0F) << 32) | ((uint64_t)d[14] << 24) |
                      ((uint64_t)d[15] << 16) | ((uint64_t)d[16] << 8) | d[17];
    }
    pos += 4 + blen;
  }
  if (sample_rate == 0 || channels == 0 || bps == 0) return -3;

  static const int kBlockSizes[16] = {0,   192,  576,  1152, 2304, 4608, -1, -2,
                                      256, 512,  1024, 2048, 4096, 8192, 16384, 32768};
  static const int kRates[16] = {0,     88200, 176400, 192000, 8000,  16000,
                                 22050, 24000, 32000,  44100,  48000, 96000,
                                 -1,    -2,    -3,     0};

  std::vector<std::vector<float>> chans((size_t)channels);
  BitReader br{buf.data(), buf.size(), pos, 0};

  while (true) {
    br.align();
    if (br.byte + 4 >= br.len) break;
    bool ok = true;
    uint32_t sync = br.read_bits(14, &ok);
    if (!ok) break;
    if (sync != 0x3FFE) break;
    br.read_bits(1, &ok);                      // reserved
    br.read_bits(1, &ok);                      // blocking strategy
    uint32_t bs_code = br.read_bits(4, &ok);
    uint32_t sr_code = br.read_bits(4, &ok);
    uint32_t ch_code = br.read_bits(4, &ok);
    uint32_t ss_code = br.read_bits(3, &ok);
    br.read_bits(1, &ok);  // reserved
    if (!ok) break;
    uint64_t frame_no;
    if (!read_utf8_number(&br, &frame_no)) break;

    int blocksize;
    if (bs_code == 6) blocksize = (int)br.read_bits(8, &ok) + 1;
    else if (bs_code == 7) blocksize = (int)br.read_bits(16, &ok) + 1;
    else blocksize = kBlockSizes[bs_code];
    if (!ok || blocksize <= 0) break;

    if (sr_code == 12) br.read_bits(8, &ok);
    else if (sr_code == 13 || sr_code == 14) br.read_bits(16, &ok);
    if (!ok) break;

    br.read_bits(8, &ok);  // CRC-8 (unverified)
    if (!ok) break;

    int sub_bps[8];
    int nch;
    if (ch_code < 8) {
      nch = (int)ch_code + 1;
      for (int c = 0; c < nch; c++) sub_bps[c] = bps;
    } else {
      nch = 2;
      sub_bps[0] = bps;
      sub_bps[1] = bps;
      if (ch_code == 8) sub_bps[1] = bps + 1;       // left/side
      else if (ch_code == 9) sub_bps[0] = bps + 1;  // right/side
      else if (ch_code == 10) sub_bps[1] = bps + 1; // mid/side
      else break;
    }
    (void)ss_code;

    std::vector<std::vector<int64_t>> sub((size_t)nch);
    bool frame_ok = true;
    for (int c = 0; c < nch; c++) {
      if (!decode_subframe(&br, blocksize, sub_bps[c], &sub[c])) {
        frame_ok = false;
        break;
      }
    }
    if (!frame_ok) break;
    br.align();
    br.read_bits(16, &ok);  // CRC-16 (unverified)

    // stereo decorrelation
    if (ch_code == 8) {  // left/side: right = left - side
      for (int i = 0; i < blocksize; i++) sub[1][i] = sub[0][i] - sub[1][i];
    } else if (ch_code == 9) {  // right/side: left = side + right
      for (int i = 0; i < blocksize; i++) sub[0][i] = sub[0][i] + sub[1][i];
    } else if (ch_code == 10) {  // mid/side
      for (int i = 0; i < blocksize; i++) {
        int64_t side = sub[1][i];
        int64_t m2 = (sub[0][i] << 1) | (side & 1);
        sub[0][i] = (m2 + side) >> 1;
        sub[1][i] = (m2 - side) >> 1;
      }
    }

    double scale = 1.0 / (double)((int64_t)1 << (bps - 1));
    for (int c = 0; c < std::min(nch, channels); c++) {
      for (int i = 0; i < blocksize; i++) {
        chans[c].push_back((float)(sub[c][i] * scale));
      }
    }
  }

  if (chans[0].empty()) return -4;
  long frames = (long)chans[0].size();
  if (total_samples > 0 && (long)total_samples < frames) frames = (long)total_samples;
  std::vector<float> mono((size_t)frames);
  for (long i = 0; i < frames; i++) {
    double acc = 0;
    for (int c = 0; c < channels; c++)
      acc += (i < (long)chans[c].size()) ? chans[c][i] : 0.0f;
    mono[i] = (float)(acc / channels);
  }
  if (native_sr_out) *native_sr_out = sample_rate;
  std::vector<float> res;
  const std::vector<float>* src = &mono;
  if (target_sr > 0 && target_sr != sample_rate) {
    resample_sinc(mono, sample_rate, target_sr, &res);
    src = &res;
  }
  long n = std::min<long>((long)src->size(), max_samples);
  memcpy(out, src->data(), (size_t)n * sizeof(float));
  return n;
}

}  // extern "C"
