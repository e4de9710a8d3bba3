// Native host-side data pipeline for rankfm_tpu.
//
// The reference's native layer is a Cython SGD loop plus malloc'd copies of
// the per-user item lists (/root/reference/rankfm/_rankfm.pyx:204-212). In
// this framework the compute path is XLA on TPU; the native layer instead
// accelerates the *host* stage that feeds the device: mapping raw int64 id
// pairs to dense int32 indices and building the CSR user-history structure.
// pandas Series.map + groupby cost minutes at 10^8 rows; this does one sort.
//
// Exposed as a C ABI consumed via ctypes (rankfm_tpu/native/__init__.py).

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <vector>

extern "C" {

// Sorted-unique of an int64 id column. Caller passes an output buffer of
// size n; returns the number of unique values written.
int64_t rfm_unique_sorted(const int64_t* ids, int64_t n, int64_t* out) {
    std::vector<int64_t> v(ids, ids + n);
    std::sort(v.begin(), v.end());
    auto end = std::unique(v.begin(), v.end());
    int64_t m = end - v.begin();
    std::memcpy(out, v.data(), m * sizeof(int64_t));
    return m;
}

// Map raw ids to dense indices by binary search over the sorted-unique id
// array; unknown ids map to -1.
void rfm_map_ids(const int64_t* raw, int64_t n,
                 const int64_t* sorted_unique, int64_t m,
                 int32_t* out_idx) {
    const int64_t* lo = sorted_unique;
    const int64_t* hi = sorted_unique + m;
    for (int64_t r = 0; r < n; ++r) {
        const int64_t* it = std::lower_bound(lo, hi, raw[r]);
        out_idx[r] = (it != hi && *it == raw[r])
                         ? static_cast<int32_t>(it - lo)
                         : -1;
    }
}

// Build the CSR user-history structure from mapped (user_idx, item_idx)
// pairs, deduplicating repeated pairs and sorting each row ascending (the
// device-side membership test binary-searches rows).
//
// offsets_out: int32[num_users + 1]; items_out: int32[n] (only the first
// `return value` entries are meaningful). Pairs with either index < 0 are
// skipped. Returns nnz.
int64_t rfm_build_csr(const int32_t* users, const int32_t* items, int64_t n,
                      int32_t num_users,
                      int32_t* offsets_out, int32_t* items_out) {
    std::vector<std::pair<int32_t, int32_t>> p;
    p.reserve(n);
    for (int64_t r = 0; r < n; ++r) {
        if (users[r] >= 0 && items[r] >= 0) p.emplace_back(users[r], items[r]);
    }
    std::sort(p.begin(), p.end());
    p.erase(std::unique(p.begin(), p.end()), p.end());

    std::memset(offsets_out, 0, (num_users + 1) * sizeof(int32_t));
    for (auto& pr : p) offsets_out[pr.first + 1]++;
    for (int32_t u = 0; u < num_users; ++u) offsets_out[u + 1] += offsets_out[u];
    int64_t nnz = static_cast<int64_t>(p.size());
    for (int64_t r = 0; r < nnz; ++r) items_out[r] = p[r].second;
    return nnz;
}

}  // extern "C"
