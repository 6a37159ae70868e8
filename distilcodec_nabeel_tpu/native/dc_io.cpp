// Native data-loader core: audio decode (WAV natively; mp3/flac/ogg/... via
// dlopened ffmpeg libav) + polyphase resample + batched random crops,
// multithreaded.  The TPU-side framework feeds raw audio crops into
// the jitted train step (training/dataset.py); this library removes the
// Python/GIL per-item cost from that host path (reference data layer:
// distilcodec/models/meldataset.py:18-20, :190-301 — librosa/soundfile do
// the equivalent decode work there).
//
// Exact-decode contract (tested against the scipy path in
// tests/test_native_io.py): integer PCM -> float32 scaling uses the same
// constants as utils/audio_io.py (int16/32768, int32/2^31, uint8 offset);
// multi-channel is mono-meaned; resampling is scipy.signal.resample_poly's
// algorithm (kaiser(beta=5) firwin, filter scaled by `up`, centered
// polyphase evaluation) computed in float64 and cast to float32.
//
// Build: distilcodec_nabeel_tpu/native/build.py (g++ -O3 -shared -fPIC).

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <map>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

// Universal (mp3/flac/ogg/m4a/...) decode via ffmpeg's libav*, dlopened at
// runtime so the WAV fast path never depends on it.  The reference decodes
// non-WAV audio through librosa->audioread/ffmpeg (distil_codec.py:657-684,
// meldataset.py:18-20); this is the native twin.  Compiled out when the
// libav headers are absent.
#if defined(__has_include)
#if __has_include(<libavformat/avformat.h>) && __has_include(<dlfcn.h>)
#define DC_HAVE_FFMPEG 1
extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/avutil.h>
}
#include <dlfcn.h>
#endif
#endif

namespace {

// ----------------------------------------------------------------- wav read

struct Wav {
  std::vector<float> samples;  // mono
  int sample_rate = 0;
};

bool read_file(const char* path, std::vector<uint8_t>& out) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return false;
  std::fseek(f, 0, SEEK_END);
  long n = std::ftell(f);
  if (n <= 0) {
    std::fclose(f);
    return false;
  }
  std::fseek(f, 0, SEEK_SET);
  out.resize(static_cast<size_t>(n));
  size_t got = std::fread(out.data(), 1, out.size(), f);
  std::fclose(f);
  return got == out.size();
}

uint32_t rd_u32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd_u16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

// Parse RIFF/WAVE: PCM (1), IEEE float (3), or EXTENSIBLE (0xFFFE) wrapping
// either; 8/16/24/32-bit integer or 32/64-bit float; any channel count
// (mono-meaned).  Unknown chunks are skipped.
bool parse_wav(const std::vector<uint8_t>& buf, Wav& wav) {
  if (buf.size() < 44 || std::memcmp(buf.data(), "RIFF", 4) != 0 ||
      std::memcmp(buf.data() + 8, "WAVE", 4) != 0)
    return false;
  size_t pos = 12;
  int fmt = 0, channels = 0, bits = 0;
  const uint8_t* data = nullptr;
  size_t data_len = 0;
  while (pos + 8 <= buf.size()) {
    const uint8_t* hdr = buf.data() + pos;
    uint32_t chunk_len = rd_u32(hdr + 4);
    const uint8_t* body = hdr + 8;
    size_t avail = buf.size() - pos - 8;
    size_t len = std::min(static_cast<size_t>(chunk_len), avail);
    if (std::memcmp(hdr, "fmt ", 4) == 0 && len >= 16) {
      fmt = rd_u16(body);
      channels = rd_u16(body + 2);
      wav.sample_rate = static_cast<int>(rd_u32(body + 4));
      bits = rd_u16(body + 14);
      if (fmt == 0xFFFE && len >= 40) fmt = rd_u16(body + 24);  // subformat tag
    } else if (std::memcmp(hdr, "data", 4) == 0) {
      data = body;
      data_len = len;
    }
    pos += 8 + len + (len & 1);  // chunks are word-aligned
  }
  if (!data || channels <= 0 || wav.sample_rate <= 0 || bits <= 0)
    return false;

  size_t bytes_per = static_cast<size_t>(bits) / 8;
  if (bytes_per == 0) return false;
  size_t n_frames = data_len / (bytes_per * channels);
  if (n_frames == 0) return false;
  wav.samples.resize(n_frames);
  const double inv_ch = 1.0 / channels;

  for (size_t i = 0; i < n_frames; ++i) {
    // accumulate the channel mean in float32 like np.mean(axis=1) on the
    // decoded float32 matrix (utils/audio_io.py:34-35)
    float acc = 0.0f;
    const uint8_t* fr = data + i * bytes_per * channels;
    for (int c = 0; c < channels; ++c) {
      const uint8_t* s = fr + c * bytes_per;
      float v = 0.0f;
      if (fmt == 1) {  // integer PCM
        switch (bits) {
          case 8:
            v = (static_cast<float>(s[0]) - 128.0f) / 128.0f;
            break;
          case 16:
            v = static_cast<float>(static_cast<int16_t>(rd_u16(s))) /
                32768.0f;
            break;
          case 24: {
            int32_t x = static_cast<int32_t>(
                (static_cast<uint32_t>(s[0]) << 8) |
                (static_cast<uint32_t>(s[1]) << 16) |
                (static_cast<uint32_t>(s[2]) << 24));
            // scipy reads 24-bit into int32 (<<8) then we scale by 2^31
            v = static_cast<float>(x) / 2147483648.0f;
            break;
          }
          case 32:
            v = static_cast<float>(static_cast<int32_t>(rd_u32(s))) /
                2147483648.0f;
            break;
          default:
            return false;
        }
      } else if (fmt == 3) {  // IEEE float
        if (bits == 32) {
          uint32_t u = rd_u32(s);
          std::memcpy(&v, &u, 4);
        } else if (bits == 64) {
          uint64_t u = static_cast<uint64_t>(rd_u32(s)) |
                       (static_cast<uint64_t>(rd_u32(s + 4)) << 32);
          double d;
          std::memcpy(&d, &u, 8);
          v = static_cast<float>(d);
        } else {
          return false;
        }
      } else {
        return false;
      }
      acc += v;
    }
    wav.samples[i] =
        channels == 1 ? acc : static_cast<float>(acc * inv_ch);
  }
  return true;
}

// --------------------------------------------------------- ffmpeg decoding

#ifdef DC_HAVE_FFMPEG

struct AvApi {
  decltype(&avformat_open_input) open_input;
  decltype(&avformat_find_stream_info) find_stream_info;
  decltype(&avformat_close_input) close_input;
  decltype(&av_find_best_stream) find_best_stream;
  decltype(&avcodec_alloc_context3) alloc_context;
  decltype(&avcodec_parameters_to_context) params_to_context;
  decltype(&avcodec_open2) codec_open;
  decltype(&avcodec_free_context) free_context;
  decltype(&av_packet_alloc) packet_alloc;
  decltype(&av_packet_free) packet_free;
  decltype(&av_packet_unref) packet_unref;
  decltype(&av_frame_alloc) frame_alloc;
  decltype(&av_frame_free) frame_free;
  decltype(&av_frame_unref) frame_unref;
  decltype(&av_read_frame) read_frame;
  decltype(&avcodec_send_packet) send_packet;
  decltype(&avcodec_receive_frame) receive_frame;
  bool ok = false;
};

#define DC_STR2(x) #x
#define DC_STR(x) DC_STR2(x)

const AvApi& av_api() {
  static AvApi api = [] {
    AvApi a{};
    // sonames pinned to the header versions the file compiled against —
    // struct layouts (AVFrame etc.) must match the runtime library.
    void* u = dlopen("libavutil.so." DC_STR(LIBAVUTIL_VERSION_MAJOR),
                     RTLD_NOW | RTLD_GLOBAL);
    void* c = dlopen("libavcodec.so." DC_STR(LIBAVCODEC_VERSION_MAJOR),
                     RTLD_NOW | RTLD_GLOBAL);
    void* f = dlopen("libavformat.so." DC_STR(LIBAVFORMAT_VERSION_MAJOR),
                     RTLD_NOW | RTLD_GLOBAL);
    if (!u || !c || !f) return a;
    auto sym = [](void* h, const char* n) { return dlsym(h, n); };
    a.open_input = reinterpret_cast<decltype(a.open_input)>(
        sym(f, "avformat_open_input"));
    a.find_stream_info = reinterpret_cast<decltype(a.find_stream_info)>(
        sym(f, "avformat_find_stream_info"));
    a.close_input = reinterpret_cast<decltype(a.close_input)>(
        sym(f, "avformat_close_input"));
    a.find_best_stream = reinterpret_cast<decltype(a.find_best_stream)>(
        sym(f, "av_find_best_stream"));
    a.alloc_context = reinterpret_cast<decltype(a.alloc_context)>(
        sym(c, "avcodec_alloc_context3"));
    a.params_to_context = reinterpret_cast<decltype(a.params_to_context)>(
        sym(c, "avcodec_parameters_to_context"));
    a.codec_open =
        reinterpret_cast<decltype(a.codec_open)>(sym(c, "avcodec_open2"));
    a.free_context = reinterpret_cast<decltype(a.free_context)>(
        sym(c, "avcodec_free_context"));
    a.packet_alloc =
        reinterpret_cast<decltype(a.packet_alloc)>(sym(c, "av_packet_alloc"));
    a.packet_free =
        reinterpret_cast<decltype(a.packet_free)>(sym(c, "av_packet_free"));
    a.packet_unref =
        reinterpret_cast<decltype(a.packet_unref)>(sym(c, "av_packet_unref"));
    a.frame_alloc =
        reinterpret_cast<decltype(a.frame_alloc)>(sym(u, "av_frame_alloc"));
    a.frame_free =
        reinterpret_cast<decltype(a.frame_free)>(sym(u, "av_frame_free"));
    a.frame_unref =
        reinterpret_cast<decltype(a.frame_unref)>(sym(u, "av_frame_unref"));
    a.read_frame =
        reinterpret_cast<decltype(a.read_frame)>(sym(f, "av_read_frame"));
    a.send_packet = reinterpret_cast<decltype(a.send_packet)>(
        sym(c, "avcodec_send_packet"));
    a.receive_frame = reinterpret_cast<decltype(a.receive_frame)>(
        sym(c, "avcodec_receive_frame"));
    // silence per-file decoder chatter (timestamp warnings etc.)
    auto set_level =
        reinterpret_cast<void (*)(int)>(sym(u, "av_log_set_level"));
    if (set_level) set_level(AV_LOG_ERROR);
    a.ok = a.open_input && a.find_stream_info && a.close_input &&
           a.find_best_stream && a.alloc_context && a.params_to_context &&
           a.codec_open && a.free_context && a.packet_alloc && a.packet_free &&
           a.packet_unref && a.frame_alloc && a.frame_free && a.frame_unref &&
           a.read_frame && a.send_packet && a.receive_frame;
    return a;
  }();
  return api;
}

// one decoded sample -> float in [-1, 1): same scaling family as the WAV
// path / librosa float conversion
inline float av_sample_to_float(const uint8_t* p, int fmt_base) {
  switch (fmt_base) {
    case AV_SAMPLE_FMT_U8:
      return (static_cast<float>(*p) - 128.0f) / 128.0f;
    case AV_SAMPLE_FMT_S16: {
      int16_t v;
      std::memcpy(&v, p, 2);
      return static_cast<float>(v) / 32768.0f;
    }
    case AV_SAMPLE_FMT_S32: {
      int32_t v;
      std::memcpy(&v, p, 4);
      return static_cast<float>(v) / 2147483648.0f;
    }
    case AV_SAMPLE_FMT_S64: {
      int64_t v;
      std::memcpy(&v, p, 8);
      return static_cast<float>(static_cast<double>(v) / 9223372036854775808.0);
    }
    case AV_SAMPLE_FMT_FLT: {
      float v;
      std::memcpy(&v, p, 4);
      return v;
    }
    case AV_SAMPLE_FMT_DBL: {
      double v;
      std::memcpy(&v, p, 8);
      return static_cast<float>(v);
    }
    default:
      return 0.0f;
  }
}

// append a frame's samples, mono-meaned across channels (librosa mono=True)
bool append_frame(const AVFrame* fr, std::vector<float>& out) {
  int fmt = fr->format;
  bool planar = fmt >= AV_SAMPLE_FMT_U8P;
  int base = fmt;
  if (planar) {
    switch (fmt) {
      case AV_SAMPLE_FMT_U8P: base = AV_SAMPLE_FMT_U8; break;
      case AV_SAMPLE_FMT_S16P: base = AV_SAMPLE_FMT_S16; break;
      case AV_SAMPLE_FMT_S32P: base = AV_SAMPLE_FMT_S32; break;
      case AV_SAMPLE_FMT_S64P: base = AV_SAMPLE_FMT_S64; break;
      case AV_SAMPLE_FMT_FLTP: base = AV_SAMPLE_FMT_FLT; break;
      case AV_SAMPLE_FMT_DBLP: base = AV_SAMPLE_FMT_DBL; break;
      default: return false;
    }
  }
  size_t bytes_per;
  switch (base) {
    case AV_SAMPLE_FMT_U8: bytes_per = 1; break;
    case AV_SAMPLE_FMT_S16: bytes_per = 2; break;
    case AV_SAMPLE_FMT_S32: case AV_SAMPLE_FMT_FLT: bytes_per = 4; break;
    case AV_SAMPLE_FMT_S64: case AV_SAMPLE_FMT_DBL: bytes_per = 8; break;
    default: return false;
  }
  int ch = fr->ch_layout.nb_channels;
  if (ch <= 0) return false;
  float inv_ch = 1.0f / ch;
  for (int i = 0; i < fr->nb_samples; ++i) {
    float acc = 0.0f;
    for (int c = 0; c < ch; ++c) {
      const uint8_t* p =
          planar ? fr->extended_data[c] + i * bytes_per
                 : fr->extended_data[0] + (static_cast<size_t>(i) * ch + c) *
                                              bytes_per;
      acc += av_sample_to_float(p, base);
    }
    out.push_back(ch == 1 ? acc : acc * inv_ch);
  }
  return true;
}

bool decode_ffmpeg(const char* path, Wav& wav) {
  const AvApi& av = av_api();
  if (!av.ok) return false;
  AVFormatContext* fmt = nullptr;
  if (av.open_input(&fmt, path, nullptr, nullptr) < 0) return false;
  bool ok = false;
  AVCodecContext* cctx = nullptr;
  AVPacket* pkt = nullptr;
  AVFrame* frame = nullptr;
  do {
    if (av.find_stream_info(fmt, nullptr) < 0) break;
    const AVCodec* dec = nullptr;
    int si = av.find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (si < 0 || !dec) break;
    cctx = av.alloc_context(dec);
    if (!cctx) break;
    if (av.params_to_context(cctx, fmt->streams[si]->codecpar) < 0) break;
    if (av.codec_open(cctx, dec, nullptr) < 0) break;
    pkt = av.packet_alloc();
    frame = av.frame_alloc();
    if (!pkt || !frame) break;
    wav.samples.clear();
    bool bad = false;
    auto drain = [&]() {
      for (;;) {
        int r = av.receive_frame(cctx, frame);
        if (r < 0) return r;  // EAGAIN or EOF
        if (wav.sample_rate == 0) wav.sample_rate = frame->sample_rate;
        if (!append_frame(frame, wav.samples)) bad = true;
        av.frame_unref(frame);
        if (bad) return -1;
      }
    };
    wav.sample_rate = cctx->sample_rate;
    int err = 0;
    while (av.read_frame(fmt, pkt) >= 0) {
      if (pkt->stream_index == si) {
        if (av.send_packet(cctx, pkt) == 0) {
          err = drain();
          if (bad) break;
          (void)err;
        }
      }
      av.packet_unref(pkt);
    }
    if (!bad) {
      av.send_packet(cctx, nullptr);  // flush
      drain();
    }
    ok = !bad && wav.sample_rate > 0 && !wav.samples.empty();
  } while (false);
  if (frame) av.frame_free(&frame);
  if (pkt) av.packet_free(&pkt);
  if (cctx) av.free_context(&cctx);
  av.close_input(&fmt);
  return ok;
}

#endif  // DC_HAVE_FFMPEG

// WAV fast path first (bit-exact scipy.io.wavfile semantics), then ffmpeg
// for everything else.
bool decode_any(const char* path, Wav& wav) {
  std::vector<uint8_t> buf;
  if (read_file(path, buf) && parse_wav(buf, wav)) return true;
#ifdef DC_HAVE_FFMPEG
  wav = Wav{};
  return decode_ffmpeg(path, wav);
#else
  return false;
#endif
}

// ------------------------------------------------------------- resample_poly

double bessel_i0(double x) {
  // modified Bessel function of order 0, power series (converges fast for
  // the kaiser-beta range used here)
  double sum = 1.0, term = 1.0;
  double x2 = x * x / 4.0;
  for (int k = 1; k < 64; ++k) {
    term *= x2 / (static_cast<double>(k) * k);
    sum += term;
    if (term < 1e-16 * sum) break;
  }
  return sum;
}

double sinc(double x) {
  if (x == 0.0) return 1.0;
  double px = M_PI * x;
  return std::sin(px) / px;
}

struct Filter {
  std::vector<double> h;
  long half_len;
};

std::mutex g_filter_mu;
std::map<std::pair<int, int>, Filter> g_filters;

// scipy.signal.resample_poly's filter: firwin(2*half_len+1, f_c,
// window=('kaiser', 5.0)) * up, half_len = 10*max(up,down), f_c = 1/max
// (cutoff in Nyquist units), scaled so the unwindowed passband gain is 1
// (firwin scale=True normalizes sum(h * cos(pi*f_scale*k)) at band center 0
// -> sum(h) = 1).
const Filter& get_filter(int up, int down) {
  std::lock_guard<std::mutex> lock(g_filter_mu);
  auto key = std::make_pair(up, down);
  auto it = g_filters.find(key);
  if (it != g_filters.end()) return it->second;

  int max_rate = std::max(up, down);
  long half_len = 10L * max_rate;
  double f_c = 1.0 / max_rate;
  double beta = 5.0;
  long n = 2 * half_len + 1;
  Filter filt;
  filt.half_len = half_len;
  filt.h.resize(n);
  double i0b = bessel_i0(beta);
  double sum = 0.0;
  for (long k = 0; k < n; ++k) {
    double m = static_cast<double>(k) - half_len;
    double ratio = m / half_len;
    double w = bessel_i0(beta * std::sqrt(std::max(0.0, 1.0 - ratio * ratio))) / i0b;
    double v = f_c * sinc(f_c * m) * w;
    filt.h[k] = v;
    sum += v;
  }
  for (long k = 0; k < n; ++k) filt.h[k] = filt.h[k] / sum * up;
  return g_filters.emplace(key, std::move(filt)).first->second;
}

long gcd_long(long a, long b) { return b == 0 ? a : gcd_long(b, a % b); }

// y[m] = sum_j x[j] * h[half_len + m*down - j*up], m in [0, ceil(n*up/down))
// — resample_poly's centered upfirdn evaluation, accumulated in float64.
void resample(const std::vector<float>& x, int orig_sr, int target_sr,
              std::vector<float>& y) {
  if (orig_sr == target_sr) {
    y = x;
    return;
  }
  long g = gcd_long(orig_sr, target_sr);
  int up = static_cast<int>(target_sr / g);
  int down = static_cast<int>(orig_sr / g);
  const Filter& filt = get_filter(up, down);
  long n = static_cast<long>(x.size());
  long n_out = (n * up) / down + ((n * up) % down != 0 ? 1 : 0);
  y.resize(n_out);
  long hl = filt.half_len;
  for (long m = 0; m < n_out; ++m) {
    long center = m * static_cast<long>(down);
    long num = center - hl;  // ceil-div, numerator may be negative
    long j_lo = num >= 0 ? (num + up - 1) / up : -((-num) / up);
    long j_hi = (center + hl) / up;  // floor, numerator always >= 0 here
    j_lo = std::max(j_lo, 0L);
    j_hi = std::min(j_hi, n - 1);
    double acc = 0.0;
    for (long j = j_lo; j <= j_hi; ++j) {
      acc += static_cast<double>(x[j]) * filt.h[hl + center - j * up];
    }
    y[m] = static_cast<float>(acc);
  }
}

// ------------------------------------------------------------ RNG (PCG32)

struct Pcg32 {
  uint64_t state;
  explicit Pcg32(uint64_t seed) : state(seed * 6364136223846793005ULL + 1442695040888963407ULL) {}
  uint32_t next() {
    uint64_t old = state;
    state = old * 6364136223846793005ULL + 1442695040888963407ULL;
    uint32_t xorshifted = static_cast<uint32_t>(((old >> 18u) ^ old) >> 27u);
    uint32_t rot = static_cast<uint32_t>(old >> 59u);
    return (xorshifted >> rot) | (xorshifted << ((-rot) & 31));
  }
  double uniform() { return next() * (1.0 / 4294967296.0); }
};

void fill_noise(float* out, long n, uint64_t seed, float amp) {
  // Box-Muller pairs — the corrupted-file fallback is N(0,1)*amp
  // (meldataset.py:243-246)
  Pcg32 rng(seed);
  for (long i = 0; i < n; i += 2) {
    double u1 = std::max(rng.uniform(), 1e-12);
    double u2 = rng.uniform();
    double r = std::sqrt(-2.0 * std::log(u1));
    out[i] = static_cast<float>(r * std::cos(2.0 * M_PI * u2) * amp);
    if (i + 1 < n)
      out[i + 1] = static_cast<float>(r * std::sin(2.0 * M_PI * u2) * amp);
  }
}

bool load_resampled(const char* path, int target_sr, std::vector<float>& out) {
  Wav wav;
  if (!decode_any(path, wav)) return false;
  if (target_sr > 0 && wav.sample_rate != target_sr) {
    resample(wav.samples, wav.sample_rate, target_sr, out);
  } else {
    out = std::move(wav.samples);
  }
  return true;
}

}  // namespace

extern "C" {

// Decode + optional resample.  Returns a malloc'd float buffer via *out
// (caller frees with dc_free) and the frame count; *sr_out gets the original
// sample rate.  Returns -1 on failure.
long dc_load_wav(const char* path, int target_sr, float** out, int* sr_out) {
  Wav wav;
  if (!decode_any(path, wav)) return -1;
  if (sr_out) *sr_out = wav.sample_rate;
  std::vector<float> res;
  const std::vector<float>* src = &wav.samples;
  if (target_sr > 0 && wav.sample_rate != target_sr) {
    resample(wav.samples, wav.sample_rate, target_sr, res);
    src = &res;
  }
  float* mem = static_cast<float*>(std::malloc(src->size() * sizeof(float)));
  if (!mem) return -1;
  std::memcpy(mem, src->data(), src->size() * sizeof(float));
  *out = mem;
  return static_cast<long>(src->size());
}

void dc_free(void* p) { std::free(p); }

// 1 when non-WAV (mp3/flac/ogg/...) decoding is live on this host
int dc_has_ffmpeg() {
#ifdef DC_HAVE_FFMPEG
  return av_api().ok ? 1 : 0;
#else
  return 0;
#endif
}

// Batched random crops: decode+resample each path, take a random
// `segment`-sample crop (zero-pad short clips), write row i of out
// (n x segment, preallocated by the caller).  Corrupted files become 1 s of
// N(0,1)*0.05 noise before cropping (the reference's resilience semantics,
// meldataset.py:243-246).  Crop starts are deterministic in (seed, index).
// Returns the number of successfully decoded files.
int dc_batch_crops(const char** paths, int n, long segment, int target_sr,
                   uint64_t seed, int n_threads, float* out) {
  if (n_threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? static_cast<int>(hc) : 4;
  }
  n_threads = std::min(n_threads, n > 0 ? n : 1);
  std::atomic<int> next(0), ok(0);

  auto worker = [&]() {
    for (;;) {
      int i = next.fetch_add(1);
      if (i >= n) return;
      std::vector<float> audio;
      bool good = load_resampled(paths[i], target_sr, audio);
      if (good) {
        ok.fetch_add(1);
      } else {
        audio.resize(target_sr > 0 ? target_sr : 24000);
        fill_noise(audio.data(), static_cast<long>(audio.size()),
                   seed ^ (0x9e3779b97f4a7c15ULL * (i + 1)), 0.05f);
      }
      float* row = out + static_cast<long>(i) * segment;
      long len = static_cast<long>(audio.size());
      if (len >= segment) {
        Pcg32 rng(seed ^ (0xda942042e4dd58b5ULL * (i + 1)));
        long start = static_cast<long>(rng.uniform() * (len - segment + 1));
        if (start > len - segment) start = len - segment;
        std::memcpy(row, audio.data() + start, segment * sizeof(float));
      } else {
        std::memcpy(row, audio.data(), len * sizeof(float));
        std::memset(row + len, 0, (segment - len) * sizeof(float));
      }
    }
  };

  std::vector<std::thread> threads;
  for (int t = 0; t < n_threads; ++t) threads.emplace_back(worker);
  for (auto& t : threads) t.join();
  return ok.load();
}

// 16-bit PCM WAV writer (save_wav parity: clip to int16 range).
int dc_save_wav(const char* path, const float* audio, long n, int sr) {
  FILE* f = std::fopen(path, "wb");
  if (!f) return -1;
  uint32_t data_len = static_cast<uint32_t>(n * 2);
  uint8_t hdr[44] = {'R', 'I', 'F', 'F', 0, 0, 0, 0, 'W', 'A', 'V', 'E',
                     'f', 'm', 't', ' ', 16, 0, 0, 0, 1, 0, 1, 0};
  uint32_t riff_len = 36 + data_len;
  std::memcpy(hdr + 4, &riff_len, 4);
  std::memcpy(hdr + 24, &sr, 4);
  uint32_t byte_rate = static_cast<uint32_t>(sr) * 2;
  std::memcpy(hdr + 28, &byte_rate, 4);
  hdr[32] = 2;  // block align
  hdr[34] = 16;  // bits
  std::memcpy(hdr + 36, "data", 4);
  std::memcpy(hdr + 40, &data_len, 4);
  std::fwrite(hdr, 1, 44, f);
  std::vector<int16_t> pcm(n);
  for (long i = 0; i < n; ++i) {
    float v = audio[i] * 32768.0f;
    v = std::max(-32768.0f, std::min(32767.0f, v));
    pcm[i] = static_cast<int16_t>(v);
  }
  std::fwrite(pcm.data(), 2, pcm.size(), f);
  std::fclose(f);
  return 0;
}

}  // extern "C"
