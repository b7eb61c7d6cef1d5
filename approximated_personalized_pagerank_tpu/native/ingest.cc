// Native ingestion helpers for the TPU PPR framework.
//
// The reference is a C++ header library whose driver parses CSV edge lists
// with a per-line getline/stoi loop (src/main.cc:78-112).  At multi-GB edge
// list scale a Python (or even numpy-vectorized) parse is the bottleneck of
// graph prep, so the hot ingestion path lives here and is loaded via ctypes
// (utils/io.py); a numpy fallback covers builds without a toolchain.
//
// Build: make -C approximated_personalized_pagerank_tpu/native
//
// Exposed C ABI:
//   ppr_parse_edge_csv(path, out, cap) -> number of edges parsed, or -1 on
//     I/O error, -2 on overflow of the caller's buffer.  `out` receives
//     src,dst int64 pairs interleaved.  Accepts "a,b" lines with \r\n and
//     blank lines, mirroring importGraph's tolerance (src/main.cc:89-95).
//   ppr_bfs_bipartition(n, indptr, indices, cindptr, cindices, color) ->
//     BFS-level-parity 2-coloring over the undirected closure; semantics of
//     findPartitions (include/internal/pprInternal.h:30-99): per-component
//     root gets color 0, frontiers alternate.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

long long ppr_parse_edge_csv(const char* path, long long* out, long long cap) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(static_cast<size_t>(size) + 1);
  if (size > 0 && std::fread(buf.data(), 1, size, f) != static_cast<size_t>(size)) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';

  long long count = 0;
  const char* p = buf.data();
  const char* end = buf.data() + size;
  while (p < end) {
    // skip blank space / separators between records
    while (p < end && (*p == '\n' || *p == '\r' || *p == ' ' || *p == '\t'))
      ++p;
    if (p >= end) break;
    bool neg = false;
    if (*p == '-') { neg = true; ++p; }
    long long a = 0;
    while (p < end && *p >= '0' && *p <= '9') a = a * 10 + (*p++ - '0');
    if (neg) a = -a;
    while (p < end && (*p == ',' || *p == ' ' || *p == '\t')) ++p;
    neg = false;
    if (p < end && *p == '-') { neg = true; ++p; }
    long long b = 0;
    while (p < end && *p >= '0' && *p <= '9') b = b * 10 + (*p++ - '0');
    if (neg) b = -b;
    if (count >= cap) return -2;
    out[2 * count] = a;
    out[2 * count + 1] = b;
    ++count;
  }
  return count;
}

void ppr_bfs_bipartition(int64_t n, const int32_t* indptr,
                         const int32_t* indices, const int32_t* cindptr,
                         const int32_t* cindices, uint8_t* color) {
  std::memset(color, 255, static_cast<size_t>(n));
  std::vector<int32_t> queue;
  queue.reserve(1024);
  for (int64_t root = 0; root < n; ++root) {
    if (color[root] != 255) continue;
    color[root] = 0;
    queue.clear();
    queue.push_back(static_cast<int32_t>(root));
    size_t head = 0;
    while (head < queue.size()) {
      int32_t v = queue[head++];
      uint8_t next_color = color[v] ^ 1;
      for (int32_t e = indptr[v]; e < indptr[v + 1]; ++e) {
        int32_t s = indices[e];
        if (color[s] == 255) {
          color[s] = next_color;
          queue.push_back(s);
        }
      }
      for (int32_t e = cindptr[v]; e < cindptr[v + 1]; ++e) {
        int32_t s = cindices[e];
        if (color[s] == 255) {
          color[s] = next_color;
          queue.push_back(s);
        }
      }
    }
  }
}

}  // extern "C"
