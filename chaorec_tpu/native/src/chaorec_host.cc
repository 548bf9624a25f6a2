// chaorec_host: native host-side runtime for the chaorec_tpu framework.
//
// The reference delegates its host-side data/graph work to third-party
// native code (scipy.sparse C routines for the ~20 copy-pasted
// get_norm_adj_mat builders, e.g. Model/DiffMM.py:116-156; torch DataLoader
// C++ workers for sampling, dataload.py:61-106; an O(U^2) pure-Python loop
// for the DualGNN user-graph precompute, dualgnn-gen-u-u-matrix.py:20-107).
// This library is the first-party replacement: the TPU does all training
// compute (JAX/XLA/Pallas); everything that must run on the host CPU —
// edge-list indexing, adjacency normalization, ragged->padded packing,
// co-interaction graph precompute — runs here, multithreaded, allocation
// free on the hot paths, behind a plain C ABI consumed via ctypes
// (chaorec_tpu/native/__init__.py).
//
// Build: g++ -O3 -std=c++17 -shared -fPIC (see native/build.py). No
// dependencies beyond the C++ standard library.

#include <algorithm>
#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstring>
#include <thread>
#include <vector>

namespace {

// Run fn(t) on n_threads workers. n_threads <= 0 means hardware count.
template <typename Fn>
void parallel_for_threads(int n_threads, Fn fn) {
  if (n_threads <= 0) {
    n_threads = static_cast<int>(std::thread::hardware_concurrency());
    if (n_threads <= 0) n_threads = 1;
  }
  if (n_threads == 1) {
    fn(0, 1);
    return;
  }
  std::vector<std::thread> pool;
  pool.reserve(n_threads);
  for (int t = 0; t < n_threads; ++t) {
    pool.emplace_back([&, t] { fn(t, n_threads); });
  }
  for (auto& th : pool) th.join();
}

}  // namespace

extern "C" {

// ---------------------------------------------------------------------------
// ch_build_adj: one pass over the (E, 2) edge list producing everything
// build_norm_adj (chaorec_tpu/graphs/norm_adj.py) needs:
//   du, di    — user/item degrees
//   w         — per-edge symmetric normalization 1/sqrt((du+eps)(di+eps))
//               (reference parity: Model/DiffMM.py:116-156 eps guard)
//   order_u   — stable permutation sorting edges by user (counting sort,
//               O(E + U) vs numpy argsort's O(E log E))
//   order_i   — stable permutation sorting edges by item
// Returns 0 on success, -1 on invalid ids (out-of-range user/item).
int32_t ch_build_adj(const int32_t* edges, int64_t num_edges, int32_t num_user,
                     int32_t num_item, float eps, int32_t* order_u,
                     int32_t* order_i, float* du, float* di, float* w) {
  std::memset(du, 0, sizeof(float) * num_user);
  std::memset(di, 0, sizeof(float) * num_item);
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t u = edges[2 * e];
    const int32_t i = edges[2 * e + 1];
    if (u < 0 || u >= num_user || i < 0 || i >= num_item) return -1;
    du[u] += 1.0f;
    di[i] += 1.0f;
  }
  for (int64_t e = 0; e < num_edges; ++e) {
    const int32_t u = edges[2 * e];
    const int32_t i = edges[2 * e + 1];
    w[e] = 1.0f / std::sqrt((du[u] + eps) * (di[i] + eps));
  }
  // Stable counting sorts: prefix-sum the degree histograms, then place
  // edge indices in encounter order.
  {
    std::vector<int64_t> pos(num_user + 1, 0);
    for (int64_t e = 0; e < num_edges; ++e) pos[edges[2 * e] + 1]++;
    for (int32_t u = 0; u < num_user; ++u) pos[u + 1] += pos[u];
    for (int64_t e = 0; e < num_edges; ++e)
      order_u[pos[edges[2 * e]]++] = static_cast<int32_t>(e);
  }
  {
    std::vector<int64_t> pos(num_item + 1, 0);
    for (int64_t e = 0; e < num_edges; ++e) pos[edges[2 * e + 1] + 1]++;
    for (int32_t i = 0; i < num_item; ++i) pos[i + 1] += pos[i];
    for (int64_t e = 0; e < num_edges; ++e)
      order_i[pos[edges[2 * e + 1]]++] = static_cast<int32_t>(e);
  }
  return 0;
}

// ---------------------------------------------------------------------------
// ch_fill_dense: scatter-add normalized edge weights into the dense (U, I)
// R matrix consumed by the MXU dense-propagation path. Parallel over edge
// ranges is unsafe (write conflicts), so parallelize over disjoint user row
// blocks using the by-user edge order from ch_build_adj.
void ch_fill_dense(const int32_t* edges, int64_t num_edges,
                   const int32_t* order_u, const float* w, int32_t num_user,
                   int32_t num_item, int32_t n_threads, float* r) {
  std::memset(r, 0, sizeof(float) * static_cast<int64_t>(num_user) * num_item);
  parallel_for_threads(n_threads, [&](int t, int nt) {
    // Edges sorted by user: thread t owns a contiguous slice of the order,
    // extended to user boundaries so no row is shared between threads.
    const int64_t chunk = (num_edges + nt - 1) / nt;
    int64_t lo = t * chunk, hi = std::min<int64_t>(num_edges, lo + chunk);
    if (lo >= num_edges) return;
    // Move lo forward to the first edge whose user differs from the
    // previous edge's user (thread t-1 finishes that user's run).
    while (lo > 0 && lo < num_edges &&
           edges[2 * order_u[lo]] == edges[2 * order_u[lo - 1]])
      ++lo;
    while (hi < num_edges &&
           edges[2 * order_u[hi]] == edges[2 * order_u[hi - 1]])
      ++hi;
    for (int64_t k = lo; k < hi; ++k) {
      const int32_t e = order_u[k];
      r[static_cast<int64_t>(edges[2 * e]) * num_item + edges[2 * e + 1]] +=
          w[e];
    }
  });
}

// ---------------------------------------------------------------------------
// ch_pad_ragged: CSR (indptr, values) -> (N, width) padded int32 matrix +
// per-row lengths. Rows longer than width are truncated. sort_rows sorts
// each output row ascending (the history table wants sorted rows so device
// membership tests can binary-search; loading.py:_pad_lists parity).
void ch_pad_ragged(const int64_t* indptr, const int32_t* values, int64_t n_rows,
                   int32_t width, int32_t fill, int32_t sort_rows,
                   int32_t n_threads, int32_t* out, int32_t* lens) {
  parallel_for_threads(n_threads, [&](int t, int nt) {
    const int64_t chunk = (n_rows + nt - 1) / nt;
    const int64_t lo = t * chunk, hi = std::min<int64_t>(n_rows, lo + chunk);
    for (int64_t r = lo; r < hi; ++r) {
      const int64_t beg = indptr[r], end = indptr[r + 1];
      const int32_t n = static_cast<int32_t>(
          std::min<int64_t>(end - beg, static_cast<int64_t>(width)));
      int32_t* row = out + r * width;
      std::memcpy(row, values + beg, sizeof(int32_t) * n);
      if (sort_rows) std::sort(row, row + n);
      std::fill(row + n, row + width, fill);
      lens[r] = n;
    }
  });
}

// ---------------------------------------------------------------------------
// ch_uu_topk: user-user co-interaction top-k — the native replacement for
// the DualGNN/DRAGON/COHESION precompute (dualgnn-gen-u-u-matrix.py:20-107,
// an O(U^2) Python loop over a dense U x U torch matrix).
//
// Sparse formulation: co[u, v] = |items(u) ∩ items(v)| accumulated by
// walking u's items and each item's user list (sum_i d_i^2 work, no U^2
// memory). Per-thread dense accumulator of U floats; top-k by
// nth_element. Self-pairs excluded (reference zeroes the diagonal).
// Weights match the reference's normalized co-occurrence option when
// weighted=1: co[u,v] / (d_u + d_v - co[u,v]) (Jaccard); raw counts when 0.
void ch_uu_topk(const int64_t* user_indptr, const int32_t* user_items,
                const int64_t* item_indptr, const int32_t* item_users,
                int32_t num_user, int32_t k, int32_t weighted,
                int32_t n_threads, int32_t* out_ids, float* out_w) {
  parallel_for_threads(n_threads, [&](int t, int nt) {
    std::vector<float> acc(num_user, 0.0f);
    std::vector<int32_t> touched;
    touched.reserve(4096);
    std::vector<int32_t> cand;
    const int64_t chunk = (num_user + nt - 1) / nt;
    const int64_t lo = t * chunk,
                  hi = std::min<int64_t>(num_user, lo + chunk);
    for (int64_t u = lo; u < hi; ++u) {
      touched.clear();
      for (int64_t p = user_indptr[u]; p < user_indptr[u + 1]; ++p) {
        const int32_t item = user_items[p];
        for (int64_t q = item_indptr[item]; q < item_indptr[item + 1]; ++q) {
          const int32_t v = item_users[q];
          if (acc[v] == 0.0f) touched.push_back(v);
          acc[v] += 1.0f;
        }
      }
      const float du =
          static_cast<float>(user_indptr[u + 1] - user_indptr[u]);
      cand.clear();
      for (const int32_t v : touched) {
        if (v != static_cast<int32_t>(u)) cand.push_back(v);
      }
      const int32_t n_take =
          std::min<int32_t>(k, static_cast<int32_t>(cand.size()));
      // Partial select by weight (stable tie-break on id for determinism).
      auto score = [&](int32_t v) -> float {
        const float co = acc[v];
        if (!weighted) return co;
        const float dv =
            static_cast<float>(user_indptr[v + 1] - user_indptr[v]);
        return co / (du + dv - co);
      };
      auto cmp = [&](int32_t a, int32_t b) {
        const float sa = score(a), sb = score(b);
        if (sa != sb) return sa > sb;
        return a < b;
      };
      if (n_take > 0 && n_take < static_cast<int32_t>(cand.size())) {
        std::nth_element(cand.begin(), cand.begin() + n_take - 1, cand.end(),
                         cmp);
      }
      std::sort(cand.begin(), cand.begin() + n_take, cmp);
      int32_t* ids_row = out_ids + u * k;
      float* w_row = out_w + u * k;
      for (int32_t j = 0; j < n_take; ++j) {
        ids_row[j] = cand[j];
        w_row[j] = score(cand[j]);
      }
      // Reference parity: users with fewer than k neighbors pad by sampling
      // with replacement (utils.py:154-178); the Python wrapper handles the
      // resampling RNG — here pad deterministically with -1.
      for (int32_t j = n_take; j < k; ++j) {
        ids_row[j] = -1;
        w_row[j] = 0.0f;
      }
      for (const int32_t v : touched) acc[v] = 0.0f;
    }
  });
}

// ---------------------------------------------------------------------------
// ch_sample_negatives: epoch-scale BPR negative sampling on the host as a
// fallback/throughput path for CPU-bound pipelines (the device path in
// data/sampling.py is the default). For each (user) draw: uniform item,
// rejection against the user's sorted history via binary search —
// semantics of dataload.py:76-79 with a bounded retry count.
void ch_sample_negatives(const int64_t* indptr, const int32_t* sorted_items,
                         const int32_t* users, int64_t n, int32_t num_item,
                         uint64_t seed, int32_t max_tries, int32_t n_threads,
                         int32_t* out) {
  parallel_for_threads(n_threads, [&](int t, int nt) {
    const int64_t chunk = (n + nt - 1) / nt;
    const int64_t lo = t * chunk, hi = std::min<int64_t>(n, lo + chunk);
    for (int64_t s = lo; s < hi; ++s) {
      // splitmix64 stream keyed by (seed, s): reproducible and
      // order-independent across thread counts.
      uint64_t x = seed + 0x9E3779B97F4A7C15ULL * (uint64_t)(s + 1);
      const int32_t u = users[s];
      const int32_t* beg = sorted_items + indptr[u];
      const int32_t* end = sorted_items + indptr[u + 1];
      int32_t cand = 0;
      for (int32_t trial = 0; trial < max_tries; ++trial) {
        x += 0x9E3779B97F4A7C15ULL;
        uint64_t z = x;
        z = (z ^ (z >> 30)) * 0xBF58476D1CE4E5B9ULL;
        z = (z ^ (z >> 27)) * 0x94D049BB133111EBULL;
        z = z ^ (z >> 31);
        cand = static_cast<int32_t>(z % static_cast<uint64_t>(num_item));
        if (!std::binary_search(beg, end, cand)) break;
      }
      out[s] = cand;
    }
  });
}

// ABI version tag so the Python loader can detect stale cached builds.
int32_t ch_abi_version() { return 3; }

}  // extern "C"
