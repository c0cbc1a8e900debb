// latice_tpu native runtime: host-side exact k-NN and angle-file parsing.
//
// The reference delegated its host-side hot paths to third-party C++ engines
// (FAISS IndexFlat — faiss_db.py:135-139 — and hnswlib via chromadb). This is
// the first-party equivalent for latice_tpu: a brute-force cosine top-k used
// as the accelerator-free fallback backend of the vector DB, and a fast
// whitespace-triple parser for dictionary angle files (data_module.py:87-116
// format). Exposed with a plain C ABI for ctypes binding (no pybind11).
//
// Build: g++ -O3 -march=native -shared -fPIC -std=c++17 -pthread \
//            latice_native.cpp -o liblatice_native.so

#include <algorithm>
#include <atomic>
#include <cctype>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

extern "C" {

// L2-normalize rows of an (n, dim) float32 matrix in place.
// Zero rows are left untouched (the faiss_db.py:109-113 guard).
void latice_l2_normalize(float* data, int64_t n, int64_t dim) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = data + i * dim;
    float sq = 0.f;
    for (int64_t d = 0; d < dim; ++d) sq += row[d] * row[d];
    if (sq > 0.f) {
      float inv = 1.0f / std::sqrt(sq);
      for (int64_t d = 0; d < dim; ++d) row[d] *= inv;
    }
  }
}

namespace {

struct ScoredIndex {
  float score;
  int64_t index;
};

// Exact top-k for one query row against the whole dictionary.
void topk_one(const float* query, const float* dict, int64_t n_dict,
              int64_t dim, int64_t k, float* out_scores, int64_t* out_idx) {
  // Min-heap of size k on score; heap[0] is the current worst kept score.
  std::vector<ScoredIndex> heap;
  heap.reserve(k);
  auto cmp = [](const ScoredIndex& a, const ScoredIndex& b) {
    return a.score > b.score;  // min-heap by score
  };
  for (int64_t j = 0; j < n_dict; ++j) {
    const float* row = dict + j * dim;
    float s = 0.f;
    for (int64_t d = 0; d < dim; ++d) s += query[d] * row[d];
    if ((int64_t)heap.size() < k) {
      heap.push_back({s, j});
      std::push_heap(heap.begin(), heap.end(), cmp);
    } else if (s > heap.front().score) {
      std::pop_heap(heap.begin(), heap.end(), cmp);
      heap.back() = {s, j};
      std::push_heap(heap.begin(), heap.end(), cmp);
    }
  }
  // sort_heap with a greater-than comparator leaves scores descending —
  // already the best-first output order.
  std::sort_heap(heap.begin(), heap.end(), cmp);
  int64_t found = (int64_t)heap.size();
  for (int64_t r = 0; r < found; ++r) {
    out_scores[r] = heap[r].score;
    out_idx[r] = heap[r].index;
  }
  for (int64_t r = found; r < k; ++r) {
    out_scores[r] = -1.0f;
    out_idx[r] = 0;
  }
}

}  // namespace

// Exact cosine top-k: queries (n_q, dim) x dict (n_d, dim) -> best-first
// (n_q, k) scores + indices. Inputs are normalized internally (copies).
// n_threads <= 0 selects hardware_concurrency.
void latice_cosine_topk(const float* queries, int64_t n_q, const float* dict,
                        int64_t n_d, int64_t dim, int64_t k,
                        float* out_scores, int64_t* out_indices,
                        int32_t n_threads) {
  if (k > n_d) k = n_d;
  std::vector<float> qn(queries, queries + n_q * dim);
  std::vector<float> dn(dict, dict + n_d * dim);
  latice_l2_normalize(qn.data(), n_q, dim);
  latice_l2_normalize(dn.data(), n_d, dim);

  int threads = n_threads > 0
                    ? n_threads
                    : (int)std::max(1u, std::thread::hardware_concurrency());
  threads = (int)std::min<int64_t>(threads, n_q);
  std::atomic<int64_t> next(0);
  auto worker = [&]() {
    int64_t i;
    while ((i = next.fetch_add(1)) < n_q) {
      topk_one(qn.data() + i * dim, dn.data(), n_d, dim, k,
               out_scores + i * k, out_indices + i * k);
    }
  };
  if (threads <= 1) {
    worker();
  } else {
    std::vector<std::thread> pool;
    for (int t = 0; t < threads; ++t) pool.emplace_back(worker);
    for (auto& th : pool) th.join();
  }
}

// Parse an angle file (two header lines, then whitespace-separated float
// triples) into out (max_rows x 3). Returns the number of rows parsed, or
// -1 on I/O error, -2 on malformed content.
int64_t latice_parse_angle_file(const char* path, double* out,
                                int64_t max_rows) {
  FILE* f = std::fopen(path, "rb");
  if (!f) return -1;
  std::fseek(f, 0, SEEK_END);
  long size = std::ftell(f);
  std::fseek(f, 0, SEEK_SET);
  std::vector<char> buf(size + 1);
  if (size > 0 && std::fread(buf.data(), 1, size, f) != (size_t)size) {
    std::fclose(f);
    return -1;
  }
  std::fclose(f);
  buf[size] = '\0';

  char* p = buf.data();
  char* end = buf.data() + size;
  // Skip two header lines.
  for (int line = 0; line < 2 && p < end; ++line) {
    while (p < end && *p != '\n') ++p;
    if (p < end) ++p;
  }
  int64_t rows = 0;
  int col = 0;
  while (p < end && rows < max_rows) {
    while (p < end && std::isspace((unsigned char)*p)) ++p;
    if (p >= end) break;
    char* after = nullptr;
    double v = std::strtod(p, &after);
    if (after == p) return -2;
    p = after;
    out[rows * 3 + col] = v;
    if (++col == 3) {
      col = 0;
      ++rows;
    }
  }
  if (col != 0) return -2;  // dangling values: not a multiple of 3
  return rows;
}

// Format .ang data rows (TSL/OIM layout, data/export.py write_ang) into
// out. The Python writer's f-string loop is the wall on 1M-pixel maps;
// snprintf produces byte-identical text (IEEE round-to-nearest-even decimal
// conversion in both runtimes). Returns bytes written, or -1 when cap is
// too small.
int64_t latice_format_ang_rows(const double* euler_rad, const double* x,
                               const double* y, const double* iq,
                               const double* ci, const int64_t* phase1,
                               const double* n_similar, int64_t n, char* out,
                               int64_t cap) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (cap - pos < 192) return -1;
    int wrote = std::snprintf(
        out + pos, (size_t)(cap - pos),
        "  %.5f  %.5f  %.5f  %.5f  %.5f  %.3f  %.3f  %lld  1.000  %.3f\n",
        euler_rad[i * 3], euler_rad[i * 3 + 1], euler_rad[i * 3 + 2], x[i],
        y[i], iq[i], ci[i], (long long)phase1[i], n_similar[i]);
    if (wrote < 0 || wrote >= cap - pos) return -1;
    pos += wrote;
  }
  return pos;
}

// Format .ctf data rows (Channel Text File layout, data/export.py
// write_ctf). Same contract as latice_format_ang_rows.
int64_t latice_format_ctf_rows(const int64_t* phase, const double* x,
                               const double* y, const int64_t* bands,
                               const int64_t* err, const double* euler_deg,
                               const double* mad, int64_t n, char* out,
                               int64_t cap) {
  int64_t pos = 0;
  for (int64_t i = 0; i < n; ++i) {
    if (cap - pos < 192) return -1;
    int wrote = std::snprintf(
        out + pos, (size_t)(cap - pos),
        "%lld\t%.4f\t%.4f\t%lld\t%lld\t%.4f\t%.4f\t%.4f\t%.4f\t255\t255\n",
        (long long)phase[i], x[i], y[i], (long long)bands[i],
        (long long)err[i], euler_deg[i * 3], euler_deg[i * 3 + 1],
        euler_deg[i * 3 + 2], mad[i]);
    if (wrote < 0 || wrote >= cap - pos) return -1;
    pos += wrote;
  }
  return pos;
}

int32_t latice_native_abi_version() { return 2; }

}  // extern "C"
