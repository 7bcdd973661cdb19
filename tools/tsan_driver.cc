// TSan driver for the threaded native paths (build: `make tsan` in
// avrecode_tpu/host/, run: `tsan_driver <video.mp4>`).
//
// Exercises everything that spawns threads in libavtpu under
// -fsanitize=thread:
//   - avtpu_compress_mt     (parallel GOP compression, gop scope)
//   - avtpu_decompress_mt   (parallel GOP decompression)
//   - avtpu_xopen           (parallel GOP trace extraction)
// and byte-checks the roundtrip so a race that corrupts output (not just
// one TSan can see) also fails.  Exit 0 = clean; TSan reports make the
// process exit non-zero via TSAN_OPTIONS=exitcode (set by the test).
//
// The reference has no threads and no TSan (SURVEY §5: ASan only,
// Makefile:5); this covers the concurrency this framework added.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
size_t avtpu_compress_mt(const uint8_t*, size_t, int, int, uint8_t**);
size_t avtpu_decompress_mt(const uint8_t*, size_t, int, uint8_t**);
void* avtpu_xopen(const uint8_t*, size_t, int, int, int, const uint8_t**,
                  size_t*, size_t*);
void avtpu_xtrace(void*, size_t, const uint64_t**, size_t*, const uint8_t**,
                  const uint8_t**, size_t*);
void avtpu_xclose(void*);
void avtpu_free(uint8_t*);
}

static std::vector<uint8_t> slurp(const char* path) {
  FILE* f = fopen(path, "rb");
  if (!f) {
    perror(path);
    exit(2);
  }
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> b(n);
  if (fread(b.data(), 1, n, f) != (size_t)n) exit(2);
  fclose(f);
  return b;
}

int main(int argc, char** argv) {
  if (argc < 2) {
    fprintf(stderr, "usage: %s <video>\n", argv[0]);
    return 2;
  }
  std::vector<uint8_t> in = slurp(argv[1]);
  const int kScopeGop = 2, kThreads = 3;

  // threaded compress (gop scope) vs serial: must be byte-identical
  uint8_t *mt = nullptr, *ser = nullptr;
  size_t mt_n = avtpu_compress_mt(in.data(), in.size(), kScopeGop, kThreads, &mt);
  size_t ser_n = avtpu_compress_mt(in.data(), in.size(), kScopeGop, 1, &ser);
  if (mt_n != ser_n || memcmp(mt, ser, mt_n) != 0) {
    fprintf(stderr, "FAIL: mt compress != serial compress\n");
    return 1;
  }
  avtpu_free(ser);

  // threaded decompress: must reproduce the input bytes
  uint8_t* dec = nullptr;
  size_t dec_n = avtpu_decompress_mt(mt, mt_n, kThreads, &dec);
  if (dec_n != in.size() || memcmp(dec, in.data(), dec_n) != 0) {
    fprintf(stderr, "FAIL: mt decompress mismatch\n");
    return 1;
  }
  avtpu_free(dec);
  avtpu_free(mt);

  // threaded trace extraction: touch every trace buffer
  const uint8_t* meta = nullptr;
  size_t meta_len = 0, n_traces = 0;
  void* h = avtpu_xopen(in.data(), in.size(), kScopeGop, kThreads, 1, &meta,
                        &meta_len, &n_traces);
  if (!h) {
    fprintf(stderr, "FAIL: xopen returned null\n");
    return 1;
  }
  uint64_t sum = 0;
  for (size_t i = 0; i < n_traces; i++) {
    const uint64_t* recs = nullptr;
    const uint8_t *limits = nullptr, *cls = nullptr;
    size_t n = 0, n_slots = 0;
    avtpu_xtrace(h, i, &recs, &n, &limits, &cls, &n_slots);
    for (size_t j = 0; j < n; j++) sum += recs[j];
    for (size_t j = 0; j < n_slots; j++) sum += limits[j] + cls[j];
  }
  avtpu_xclose(h);
  printf("OK traces=%zu checksum=%016llx\n", n_traces,
         (unsigned long long)sum);
  return 0;
}
