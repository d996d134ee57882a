// Native WAV segment loader for music_mixing_style_transfer_tpu.
//
// TPU-native replacement for the reference's host data-loading parallelism
// (torch DataLoader(num_workers=...) over stdlib-`wave` reads,
// reference data_loader/loader_utils.py:47-70, style_transfer.py:67-71):
// a persistent "wav bank" parses every file header once, then serves random
// segment batches with pread() + a std::thread pool — no per-item Python,
// no worker processes, no re-opening files per segment.
//
// Decodes PCM 16/24/32-bit and IEEE float32 (incl. WAVE_FORMAT_EXTENSIBLE),
// duplicates mono to stereo, truncates >2ch to the first two, and zero-pads
// reads past EOF — matching data/wavio.py's conventions.
//
// Bound via ctypes (music_mixing_style_transfer_tpu/data/native_loader.py).

#include <cstdint>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include <fcntl.h>
#include <unistd.h>

namespace {

struct WavFile {
  std::string path;
  int64_t data_offset = 0;  // byte offset of first sample frame
  int64_t n_frames = 0;
  int32_t channels = 0;
  int32_t sample_rate = 0;
  int32_t bits = 0;    // 16 / 24 / 32
  int32_t fmt = 0;     // 1 = PCM int, 3 = IEEE float
  bool ok = false;
};

struct WavBank {
  std::vector<WavFile> files;
};

bool read_exact(int fd, void* buf, int64_t n, int64_t off) {
  int64_t done = 0;
  char* p = static_cast<char*>(buf);
  while (done < n) {
    ssize_t r = pread(fd, p + done, (size_t)(n - done), (off_t)(off + done));
    if (r <= 0) return false;
    done += r;
  }
  return true;
}

uint32_t le32(const unsigned char* p) {
  return (uint32_t)p[0] | ((uint32_t)p[1] << 8) | ((uint32_t)p[2] << 16) |
         ((uint32_t)p[3] << 24);
}
uint16_t le16(const unsigned char* p) {
  return (uint16_t)p[0] | ((uint16_t)p[1] << 8);
}

// Walk RIFF chunks for "fmt " and "data".
bool parse_header(const char* path, WavFile* out) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return false;
  unsigned char hdr[12];
  bool ok = read_exact(fd, hdr, 12, 0) && !memcmp(hdr, "RIFF", 4) &&
            !memcmp(hdr + 8, "WAVE", 4);
  int64_t off = 12;
  bool have_fmt = false, have_data = false;
  while (ok && !(have_fmt && have_data)) {
    unsigned char ch[8];
    if (!read_exact(fd, ch, 8, off)) break;
    uint32_t size = le32(ch + 4);
    if (!memcmp(ch, "fmt ", 4)) {
      unsigned char f[40];
      uint32_t take = size < 40 ? size : 40;
      if (take < 16 || !read_exact(fd, f, take, off + 8)) break;
      out->fmt = le16(f + 0);
      out->channels = le16(f + 2);
      out->sample_rate = (int32_t)le32(f + 4);
      out->bits = le16(f + 14);
      if (out->fmt == 0xFFFE && take >= 26) {
        // WAVE_FORMAT_EXTENSIBLE: sub-format GUID's first uint16
        out->fmt = le16(f + 24);
      }
      have_fmt = true;
    } else if (!memcmp(ch, "data", 4)) {
      out->data_offset = off + 8;
      if (have_fmt && out->channels > 0 && out->bits >= 8) {
        out->n_frames = (int64_t)size / (out->channels * (out->bits / 8));
      }
      have_data = true;
    }
    off += 8 + size + (size & 1);  // chunks are word-aligned
  }
  close(fd);
  ok = ok && have_fmt && have_data && out->channels > 0 &&
       ((out->fmt == 1 && (out->bits == 16 || out->bits == 24 || out->bits == 32)) ||
        (out->fmt == 3 && out->bits == 32));
  out->ok = ok;
  out->path = path;
  return ok;
}

// Decode `frames` frames from raw bytes into out[2][duration] (planar,
// stereo, float32), starting at output frame `o0`.
void decode_into(const WavFile& f, const unsigned char* raw, int64_t frames,
                 float* out, int64_t duration, int64_t o0) {
  const int c = f.channels;
  const int bytes = f.bits / 8;
  const int oc = c >= 2 ? 2 : 1;
  for (int64_t i = 0; i < frames; ++i) {
    const unsigned char* fr = raw + i * c * bytes;
    float v[2] = {0.f, 0.f};
    for (int ch = 0; ch < oc; ++ch) {
      const unsigned char* s = fr + ch * bytes;
      if (f.fmt == 3) {
        float x;
        memcpy(&x, s, 4);
        v[ch] = x;
      } else if (f.bits == 16) {
        v[ch] = (float)((int16_t)le16(s)) / 32768.f;
      } else if (f.bits == 24) {
        int32_t x = (int32_t)((uint32_t)s[0] << 8 | (uint32_t)s[1] << 16 |
                              (uint32_t)s[2] << 24) >> 8;
        v[ch] = (float)x / 8388608.f;
      } else {
        v[ch] = (float)((int32_t)le32(s)) / 2147483648.f;
      }
    }
    if (oc == 1) v[1] = v[0];  // mono -> stereo dup
    out[o0 + i] = v[0];
    out[duration + o0 + i] = v[1];
  }
}

// Read one segment [2, duration] (zero-padded past EOF) from file f.
bool read_segment(const WavFile& f, int64_t start, int64_t duration,
                  float* out, std::vector<unsigned char>* scratch) {
  memset(out, 0, sizeof(float) * 2 * (size_t)duration);
  if (!f.ok || start >= f.n_frames) return f.ok;
  int64_t frames = duration;
  if (start + frames > f.n_frames) frames = f.n_frames - start;
  const int64_t frame_bytes = (int64_t)f.channels * (f.bits / 8);
  scratch->resize((size_t)(frames * frame_bytes));
  int fd = open(f.path.c_str(), O_RDONLY);
  if (fd < 0) return false;
  bool ok = read_exact(fd, scratch->data(), frames * frame_bytes,
                       f.data_offset + start * frame_bytes);
  close(fd);
  if (!ok) return false;
  decode_into(f, scratch->data(), frames, out, duration, 0);
  return true;
}

}  // namespace

extern "C" {

// Parse all headers; returns an opaque bank handle (never null). Files that
// fail to parse read as silence; query mst_wavbank_ok per index.
void* mst_wavbank_create(const char* const* paths, int64_t n) {
  WavBank* bank = new WavBank();
  bank->files.resize((size_t)n);
  for (int64_t i = 0; i < n; ++i) parse_header(paths[i], &bank->files[i]);
  return bank;
}

int32_t mst_wavbank_ok(void* h, int64_t i) {
  return static_cast<WavBank*>(h)->files[(size_t)i].ok ? 1 : 0;
}
int64_t mst_wavbank_frames(void* h, int64_t i) {
  return static_cast<WavBank*>(h)->files[(size_t)i].n_frames;
}
int32_t mst_wavbank_rate(void* h, int64_t i) {
  return static_cast<WavBank*>(h)->files[(size_t)i].sample_rate;
}
int32_t mst_wavbank_channels(void* h, int64_t i) {
  return static_cast<WavBank*>(h)->files[(size_t)i].channels;
}

// Read n segments into out [n, 2, duration] float32, parallel across a
// thread pool (n_threads <= 0 -> hardware_concurrency). Returns the number
// of segments read successfully.
int64_t mst_wavbank_read_segments(void* h, const int64_t* file_idx,
                                  const int64_t* starts, int64_t n,
                                  int64_t duration, float* out,
                                  int32_t n_threads) {
  WavBank* bank = static_cast<WavBank*>(h);
  if (n_threads <= 0) {
    unsigned hc = std::thread::hardware_concurrency();
    n_threads = hc ? (int32_t)hc : 4;
  }
  if (n_threads > n) n_threads = (int32_t)n;
  std::vector<int64_t> ok_counts((size_t)(n_threads > 0 ? n_threads : 1), 0);
  auto work = [&](int32_t t) {
    std::vector<unsigned char> scratch;
    for (int64_t i = t; i < n; i += n_threads) {
      const WavFile& f = bank->files[(size_t)file_idx[i]];
      if (read_segment(f, starts[i], duration, out + i * 2 * duration,
                       &scratch)) {
        ++ok_counts[(size_t)t];
      }
    }
  };
  if (n_threads <= 1) {
    work(0);
  } else {
    std::vector<std::thread> pool;
    for (int32_t t = 0; t < n_threads; ++t) pool.emplace_back(work, t);
    for (auto& th : pool) th.join();
  }
  int64_t total = 0;
  for (int64_t c : ok_counts) total += c;
  return total;
}

void mst_wavbank_destroy(void* h) { delete static_cast<WavBank*>(h); }

}  // extern "C"
