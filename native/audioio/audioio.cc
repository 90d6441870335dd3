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
