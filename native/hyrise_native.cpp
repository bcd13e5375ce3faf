// Native host-runtime kernels for hyrise_tpu.
//
// Role of the reference's C++ runtime on the HOST side of our TPU engine:
// the device data plane is XLA/Pallas, but ingest (parsing, dictionary
// prep, partition routing) is host CPU work — the paths Hyrise implements
// natively (utils/load_table.cpp, import_export/csv_parser.cpp,
// join_hash.cpp's murmur-based radix routing). Exposed via a C ABI for
// ctypes (no pybind11 in this image).
//
// Build: `make -C native` -> libhyrise_native.so; hyrise_tpu/native.py
// falls back to numpy when the library is absent.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Fibonacci hash -> shard id; MUST match
// hyrise_tpu/parallel/exchange.py::partition_hash.
void hash_partition_i64(const int64_t* keys, int64_t n, int64_t n_shards,
                        int32_t* out) {
  const uint64_t mult = 0x9E3779B97F4A7C15ull;
  for (int64_t i = 0; i < n; ++i) {
    uint64_t h = static_cast<uint64_t>(keys[i]) * mult;
    out[i] = static_cast<int32_t>((h >> 1) % static_cast<uint64_t>(n_shards));
  }
}

// Per-shard histogram of routing targets (the reference's radix histogram
// pass, join_hash.cpp:204-285).
void radix_histogram(const int32_t* targets, int64_t n, int32_t n_shards,
                     int64_t* hist) {
  memset(hist, 0, sizeof(int64_t) * n_shards);
  for (int64_t i = 0; i < n; ++i) hist[targets[i]]++;
}

// Stable scatter of row ids into per-shard contiguous regions given
// exclusive offsets (prefix sums of the histogram). Returns row order such
// that order[offsets[s]..offsets[s]+hist[s]) are the rows of shard s —
// the host twin of the device-side all_to_all send-buffer build.
void radix_scatter(const int32_t* targets, int64_t n, int32_t n_shards,
                   const int64_t* offsets, int64_t* order) {
  std::vector<int64_t> cursor(offsets, offsets + n_shards);
  for (int64_t i = 0; i < n; ++i) {
    order[cursor[targets[i]]++] = i;
  }
}

// Single-pass .tbl / CSV column extraction: pulls column `col_idx` out of a
// `sep`-separated text file, converting to int64 ('l') or double ('d').
// Rows are counted from `skip_rows`. Returns number of parsed rows, or -1
// on open failure, -2 on overflow of `cap`.
int64_t parse_text_column(const char* path, char sep, int32_t col_idx,
                          char type, int64_t skip_rows, void* out,
                          int64_t cap) {
  FILE* f = fopen(path, "rb");
  if (!f) return -1;
  int64_t row = 0, produced = 0;
  char* line = nullptr;
  size_t len = 0;
  ssize_t nread;
  int64_t* out_l = static_cast<int64_t*>(out);
  double* out_d = static_cast<double*>(out);
  while ((nread = getline(&line, &len, f)) != -1) {
    if (nread > 0 && line[nread - 1] == '\n') line[nread - 1] = '\0';
    if (row++ < skip_rows) continue;
    if (line[0] == '\0') continue;
    // find field col_idx
    char* p = line;
    for (int32_t c = 0; c < col_idx && p; ++c) {
      p = strchr(p, sep);
      if (p) ++p;
    }
    if (!p) continue;
    char* end = strchr(p, sep);
    if (end) *end = '\0';
    if (produced >= cap) {
      free(line);
      fclose(f);
      return -2;
    }
    if (type == 'l') {
      out_l[produced++] = strtoll(p, nullptr, 10);
    } else {
      out_d[produced++] = strtod(p, nullptr);
    }
  }
  free(line);
  fclose(f);
  return produced;
}

// Murmur2 64A — the reference's hash (utils/murmur_hash.hpp:12-18
// implements murmur2; we expose the 64-bit variant for host-side use).
uint64_t murmur_hash2_64a(const void* key, int32_t len, uint64_t seed) {
  const uint64_t m = 0xc6a4a7935bd1e995ull;
  const int r = 47;
  uint64_t h = seed ^ (static_cast<uint64_t>(len) * m);
  const uint64_t* data = static_cast<const uint64_t*>(key);
  const uint64_t* end = data + (len / 8);
  while (data != end) {
    uint64_t k;
    memcpy(&k, data++, 8);
    k *= m;
    k ^= k >> r;
    k *= m;
    h ^= k;
    h *= m;
  }
  const unsigned char* tail = reinterpret_cast<const unsigned char*>(data);
  switch (len & 7) {
    case 7: h ^= static_cast<uint64_t>(tail[6]) << 48; [[fallthrough]];
    case 6: h ^= static_cast<uint64_t>(tail[5]) << 40; [[fallthrough]];
    case 5: h ^= static_cast<uint64_t>(tail[4]) << 32; [[fallthrough]];
    case 4: h ^= static_cast<uint64_t>(tail[3]) << 24; [[fallthrough]];
    case 3: h ^= static_cast<uint64_t>(tail[2]) << 16; [[fallthrough]];
    case 2: h ^= static_cast<uint64_t>(tail[1]) << 8; [[fallthrough]];
    case 1: h ^= static_cast<uint64_t>(tail[0]); h *= m;
  }
  h ^= h >> r;
  h *= m;
  h ^= h >> r;
  return h;
}

}  // extern "C"
