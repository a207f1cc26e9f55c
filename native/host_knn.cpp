// Host-side exact k-NN over float32 embedding tables.
//
// The native runtime piece of the retrieval engine: on TPU the search is a
// device matmul (rdm_tpu/retrieval/engine.py), but the offline pipeline
// (scripts/search_neighbors.py) and CPU-only hosts need a fast native
// searcher — the role ScaNN's C++/SIMD core plays for the reference
// (/root/reference/rdm/data/retrieval_dataset/dsetbuilder.py:534-619).
// Exact search (normalized dot-product scores, ties broken by lower id),
// multithreaded over queries, 8-wide manually unrolled inner loops that
// auto-vectorize under -O3 -march=native.
//
// C ABI (ctypes-consumed by rdm_tpu/retrieval/host_knn.py):
//   knn_search_f32(db, n, dim, queries, nq, k, n_threads,
//                  out_scores, out_ids)
// db and queries must be L2-normalized by the caller (matching the device
// engine's contract).

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

struct Cand {
  float score;
  int64_t id;
};

inline bool worse(const Cand& a, const Cand& b) {
  // min-heap by score; on equal score the HIGHER id is "worse" so that
  // ties resolve to lower ids, matching jax.lax.top_k order.
  if (a.score != b.score) return a.score > b.score;
  return a.id < b.id;
}

inline float dot(const float* __restrict a, const float* __restrict b,
                 int64_t dim) {
  float acc0 = 0.f, acc1 = 0.f, acc2 = 0.f, acc3 = 0.f;
  float acc4 = 0.f, acc5 = 0.f, acc6 = 0.f, acc7 = 0.f;
  int64_t i = 0;
  for (; i + 8 <= dim; i += 8) {
    acc0 += a[i + 0] * b[i + 0];
    acc1 += a[i + 1] * b[i + 1];
    acc2 += a[i + 2] * b[i + 2];
    acc3 += a[i + 3] * b[i + 3];
    acc4 += a[i + 4] * b[i + 4];
    acc5 += a[i + 5] * b[i + 5];
    acc6 += a[i + 6] * b[i + 6];
    acc7 += a[i + 7] * b[i + 7];
  }
  float acc = acc0 + acc1 + acc2 + acc3 + acc4 + acc5 + acc6 + acc7;
  for (; i < dim; ++i) acc += a[i] * b[i];
  return acc;
}

void search_queries(const float* db, int64_t n, int64_t dim,
                    const float* queries, int64_t q_begin, int64_t q_end,
                    int64_t k, float* out_scores, int64_t* out_ids) {
  std::vector<Cand> heap;
  heap.reserve(static_cast<size_t>(k));
  for (int64_t q = q_begin; q < q_end; ++q) {
    const float* qv = queries + q * dim;
    heap.clear();
    for (int64_t i = 0; i < n; ++i) {
      const float s = dot(qv, db + i * dim, dim);
      if (static_cast<int64_t>(heap.size()) < k) {
        heap.push_back({s, i});
        std::push_heap(heap.begin(), heap.end(), worse);
      } else if (worse({s, i}, heap.front())) {
        std::pop_heap(heap.begin(), heap.end(), worse);
        heap.back() = {s, i};
        std::push_heap(heap.begin(), heap.end(), worse);
      }
    }
    std::sort_heap(heap.begin(), heap.end(), worse);
    // sorted per `worse`: descending score, ascending id on ties —
    // heap[0] is the best neighbor.
    const int64_t found = static_cast<int64_t>(heap.size());
    for (int64_t j = 0; j < k; ++j) {
      const Cand& c = heap[std::min(j, found - 1)];
      out_scores[q * k + j] = c.score;
      out_ids[q * k + j] = c.id;
    }
  }
}

}  // namespace

extern "C" {

void knn_search_f32(const float* db, int64_t n, int64_t dim,
                    const float* queries, int64_t nq, int64_t k,
                    int64_t n_threads, float* out_scores,
                    int64_t* out_ids) {
  if (k > n) k = n;
  if (n_threads <= 0)
    n_threads = static_cast<int64_t>(std::thread::hardware_concurrency());
  n_threads = std::max<int64_t>(1, std::min(n_threads, nq));
  if (n_threads == 1) {
    search_queries(db, n, dim, queries, 0, nq, k, out_scores, out_ids);
    return;
  }
  std::vector<std::thread> workers;
  const int64_t per = (nq + n_threads - 1) / n_threads;
  for (int64_t t = 0; t < n_threads; ++t) {
    const int64_t b = t * per;
    const int64_t e = std::min(nq, b + per);
    if (b >= e) break;
    workers.emplace_back(search_queries, db, n, dim, queries, b, e, k,
                         out_scores, out_ids);
  }
  for (auto& w : workers) w.join();
}

// streaming embedding accumulator: L2-normalize rows in place
void l2_normalize_rows_f32(float* data, int64_t n, int64_t dim) {
  for (int64_t i = 0; i < n; ++i) {
    float* row = data + i * dim;
    float sq = 0.f;
    for (int64_t j = 0; j < dim; ++j) sq += row[j] * row[j];
    const float inv = sq > 1e-24f ? 1.0f / std::sqrt(sq) : 0.0f;
    for (int64_t j = 0; j < dim; ++j) row[j] *= inv;
  }
}

}  // extern "C"
