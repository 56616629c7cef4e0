// Native wav IO for the data pipeline (L5).
//
// The reference's loader decodes wavs in torch DataLoader worker processes
// via scipy (data_utils.py:53-69, utils.py:133-135). Here decoding happens in
// loader threads, so the hot path -- RIFF parsing + int16 -> float32
// normalization -- is implemented in C++ and released from the GIL via
// ctypes. Mono PCM16 (the corpus format) is the fast path; the Python wrapper
// falls back to scipy for anything else.
//
// Build: make -C native   (g++ -O3 -shared -fPIC)

#include <cstdint>
#include <cstdio>
#include <cstring>

extern "C" {

struct WavInfo {
  int32_t sample_rate;
  int16_t channels;
  int16_t bits_per_sample;
  int64_t n_frames;       // samples per channel
  int64_t data_offset;    // byte offset of the data payload
  int16_t format;         // 1 = PCM, 3 = IEEE float
};

// Parse the RIFF/WAVE header. Returns 0 on success, negative error code:
//   -1 open failed, -2 not RIFF/WAVE, -3 missing fmt, -4 missing data.
int wavio_info(const char* path, WavInfo* info) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;

  char tag[4];
  uint32_t riff_size = 0;
  if (std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "RIFF", 4) != 0 ||
      std::fread(&riff_size, 4, 1, f) != 1 ||
      std::fread(tag, 1, 4, f) != 4 || std::memcmp(tag, "WAVE", 4) != 0) {
    std::fclose(f);
    return -2;
  }

  bool have_fmt = false;
  std::memset(info, 0, sizeof(*info));
  // Chunk walk: fmt must precede data per spec; tolerate extra chunks (LIST,
  // fact, ...) which real-world corpora contain.
  while (std::fread(tag, 1, 4, f) == 4) {
    uint32_t size = 0;
    if (std::fread(&size, 4, 1, f) != 1) break;
    if (std::memcmp(tag, "fmt ", 4) == 0) {
      struct {
        uint16_t format, channels;
        uint32_t sample_rate, byte_rate;
        uint16_t block_align, bits;
      } fmt;
      if (size < sizeof(fmt) || std::fread(&fmt, sizeof(fmt), 1, f) != 1) {
        std::fclose(f);
        return -3;
      }
      info->format = (int16_t)fmt.format;
      info->channels = (int16_t)fmt.channels;
      info->sample_rate = (int32_t)fmt.sample_rate;
      info->bits_per_sample = (int16_t)fmt.bits;
      have_fmt = true;
      if (size > sizeof(fmt)) std::fseek(f, (long)(size - sizeof(fmt)), SEEK_CUR);
    } else if (std::memcmp(tag, "data", 4) == 0) {
      if (!have_fmt) {
        std::fclose(f);
        return -3;
      }
      info->data_offset = std::ftell(f);
      int bytes_per_frame = info->channels * info->bits_per_sample / 8;
      if (bytes_per_frame <= 0) {
        std::fclose(f);
        return -3;
      }
      info->n_frames = (int64_t)size / bytes_per_frame;
      std::fclose(f);
      return 0;
    } else {
      std::fseek(f, (long)(size + (size & 1)), SEEK_CUR);  // chunks are word-aligned
    }
  }
  std::fclose(f);
  return -4;
}

// Read mono PCM16 samples as float32 scaled by 1/scale (e.g. 32768).
// out must hold n_frames floats. Returns frames read or negative error
// (-5 = unsupported format; use the Python fallback).
int64_t wavio_read_f32(const char* path, float* out, int64_t max_frames,
                       float scale) {
  WavInfo info;
  int rc = wavio_info(path, &info);
  if (rc != 0) return rc;
  if (info.format != 1 || info.channels != 1 || info.bits_per_sample != 16) {
    return -5;
  }
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, (long)info.data_offset, SEEK_SET);

  int64_t n = info.n_frames < max_frames ? info.n_frames : max_frames;
  const float inv = 1.0f / scale;
  const int64_t CHUNK = 1 << 16;
  int16_t buf[1 << 16];
  int64_t done = 0;
  while (done < n) {
    int64_t want = n - done < CHUNK ? n - done : CHUNK;
    size_t got = std::fread(buf, sizeof(int16_t), (size_t)want, f);
    if (got == 0) break;
    for (size_t i = 0; i < got; ++i) out[done + (int64_t)i] = buf[i] * inv;
    done += (int64_t)got;
  }
  std::fclose(f);
  return done;
}

}  // extern "C"
