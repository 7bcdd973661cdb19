// Fuzz harness for the native library: mutated containers + mutated video
// inputs through compress/decompress.  Built with ASan (make fuzz in
// avrecode_tpu/host) so memory violations abort; exceptions must be
// contained by the C API.  Usage: fuzz_harness <clip> <seed> <trials>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {
size_t avtpu_compress_mt(const uint8_t*, size_t, int, int, uint8_t**);
size_t avtpu_decompress_mt(const uint8_t*, size_t, int, uint8_t**);
void avtpu_free(uint8_t*);
}

static uint64_t rng_state;
static uint32_t xrnd() {
  rng_state ^= rng_state << 13;
  rng_state ^= rng_state >> 7;
  rng_state ^= rng_state << 17;
  return (uint32_t)(rng_state >> 32);
}

int main(int argc, char** argv) {
  if (argc < 4) return 2;
  FILE* f = fopen(argv[1], "rb");
  if (!f) return 2;
  fseek(f, 0, SEEK_END);
  long n = ftell(f);
  fseek(f, 0, SEEK_SET);
  std::vector<uint8_t> base(n);
  if (fread(base.data(), 1, n, f) != (size_t)n) return 2;
  fclose(f);
  rng_state = strtoull(argv[2], nullptr, 10) | 1;
  int trials = atoi(argv[3]);

  uint8_t* out;
  size_t cn = avtpu_compress_mt(base.data(), n, 2, 1, &out);
  std::vector<uint8_t> container(out, out + cn);
  avtpu_free(out);

  for (int t = 0; t < trials; t++) {
    std::vector<uint8_t> blob = container;
    switch (xrnd() % 3) {
      case 0:
        for (uint32_t k = 0, m = 1 + xrnd() % 8; k < m; k++)
          blob[xrnd() % blob.size()] ^= 1 << (xrnd() % 8);
        break;
      case 1:
        blob.resize(xrnd() % blob.size());
        break;
      default: {
        size_t i = xrnd() % blob.size();
        for (size_t k = i; k < blob.size() && k < i + 16; k++)
          blob[k] = (uint8_t)xrnd();
      }
    }
    uint8_t* o = nullptr;
    if (avtpu_decompress_mt(blob.data(), blob.size(), 1, &o)) avtpu_free(o);

    std::vector<uint8_t> vid = base;
    for (uint32_t k = 0, m = 1 + xrnd() % 8; k < m; k++)
      vid[xrnd() % vid.size()] ^= 1 << (xrnd() % 8);
    o = nullptr;
    size_t cm = avtpu_compress_mt(vid.data(), vid.size(), 2, 1, &o);
    if (cm) {
      // whatever compressed must decompress back to the mutated input
      uint8_t* d = nullptr;
      size_t dn = avtpu_decompress_mt(o, cm, 1, &d);
      if (dn != vid.size() || memcmp(d, vid.data(), dn) != 0) {
        fprintf(stderr, "ROUNDTRIP MISMATCH on mutated input, trial %d\n", t);
        return 1;
      }
      avtpu_free(d);
      avtpu_free(o);
    }
  }
  printf("FUZZ_OK\n");
  return 0;
}
