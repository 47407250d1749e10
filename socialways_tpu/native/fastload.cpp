// Native data-loading core for socialways_tpu.
//
// The reference loads annotation text line-by-line in Python
// (utils/parse_utils.py) — fine for ETH-scale files, but the framework's
// ingest path should not be the bottleneck when parsing millions of rows
// (SDD-scale or synthetic crowd logs).  This translation unit provides:
//
//   sw_parse_table   — whitespace/tab-delimited numeric table parser
//                      (mmap-free, single pass, strtod-based), returning a
//                      row-major [rows, cols] double buffer.  Rows with a
//                      different column count are skipped, matching the
//                      parsers' skip-short-rows behavior.
//   sw_window_count / sw_window_fill
//                    — the create_dataset sliding-window core: for each
//                      anchor t and agent with a full past+future at the
//                      given frame step, emit (agent, start-index) pairs.
//   sw_free          — release buffers allocated here.
//
// Exposed through a plain C ABI for ctypes (no pybind11 in this image).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

extern "C" {

// Parse a numeric text table.  delim==0 → any whitespace; otherwise the
// given single character (e.g. '\t').  Returns 0 on success.
int sw_parse_table(const char* path, char delim, double** out_data,
                   int64_t* out_rows, int64_t* out_cols) {
    FILE* f = std::fopen(path, "rb");
    if (!f) return -1;

    std::vector<double> data;
    data.reserve(1 << 20);
    int64_t rows = 0;
    int64_t cols = -1;

    char line[8192];
    std::vector<double> vals;
    while (std::fgets(line, sizeof line, f)) {
        vals.clear();
        char* p = line;
        while (*p) {
            // skip delimiters / whitespace
            if (delim ? (*p == delim || *p == '\n' || *p == '\r' || *p == ' ')
                      : (*p == ' ' || *p == '\t' || *p == '\n' || *p == '\r')) {
                ++p;
                continue;
            }
            char* end = nullptr;
            double v = std::strtod(p, &end);
            if (end == p) {  // non-numeric token → skip the row
                vals.clear();
                break;
            }
            vals.push_back(v);
            p = end;
        }
        if (vals.empty()) continue;
        if (cols < 0) cols = (int64_t)vals.size();
        if ((int64_t)vals.size() != cols) continue;  // ragged row → skip
        data.insert(data.end(), vals.begin(), vals.end());
        ++rows;
    }
    std::fclose(f);
    if (cols < 0) { cols = 0; }

    double* buf = (double*)std::malloc(sizeof(double) * data.size());
    if (!buf && !data.empty()) return -2;
    std::memcpy(buf, data.data(), sizeof(double) * data.size());
    *out_data = buf;
    *out_rows = rows;
    *out_cols = cols;
    return 0;
}

// Sliding-window enumeration (create_dataset semantics,
// utils/parse_utils.py:457-476): agents' timestamps are given as a flat
// int64 array with per-agent offsets [n_agents+1].  For each anchor
// t ∈ [t_start, t_stop) (stride 1) and each agent whose timestamp set
// contains t, t − step·n_past, and t + step·(n_next−1), one window is
// emitted.  Timestamps are assumed sorted and unique per agent (the
// parsers produce them in file order, which these formats keep sorted).
//
// Output (caller-owned after sw_window_fill): for each window,
// (agent_idx, past_start_idx, anchor_idx, future_end_idx, anchor_t).
struct WindowHit { int64_t agent, kp, k0, kf, t; };

static void enumerate_windows(const int64_t* times, const int64_t* offsets,
                              int64_t n_agents, int64_t t_start,
                              int64_t t_stop, int64_t step, int64_t n_past,
                              int64_t n_next,
                              std::vector<WindowHit>& hits) {
    for (int64_t t = t_start; t < t_stop; ++t) {
        for (int64_t a = 0; a < n_agents; ++a) {
            const int64_t* ts = times + offsets[a];
            int64_t n = offsets[a + 1] - offsets[a];
            if (n == 0) continue;
            // binary search for the three required timestamps
            auto find = [&](int64_t key) -> int64_t {
                int64_t lo = 0, hi = n - 1;
                while (lo <= hi) {
                    int64_t mid = (lo + hi) / 2;
                    if (ts[mid] == key) return mid;
                    if (ts[mid] < key) lo = mid + 1; else hi = mid - 1;
                }
                return -1;
            };
            int64_t k0 = find(t);
            if (k0 < 0) continue;
            int64_t kp = find(t - step * n_past);
            if (kp < 0) continue;
            int64_t kf = find(t + step * (n_next - 1));
            if (kf < 0) continue;
            hits.push_back({a, kp, k0, kf, t});
        }
    }
}

// Two-phase API so the caller owns all buffers: count, then fill.
int64_t sw_window_count(const int64_t* times, const int64_t* offsets,
                        int64_t n_agents, int64_t t_start, int64_t t_stop,
                        int64_t step, int64_t n_past, int64_t n_next) {
    std::vector<WindowHit> hits;
    enumerate_windows(times, offsets, n_agents, t_start, t_stop, step,
                      n_past, n_next, hits);
    return (int64_t)hits.size();
}

int sw_window_fill(const int64_t* times, const int64_t* offsets,
                   int64_t n_agents, int64_t t_start, int64_t t_stop,
                   int64_t step, int64_t n_past, int64_t n_next,
                   int64_t* out, int64_t capacity) {
    std::vector<WindowHit> hits;
    enumerate_windows(times, offsets, n_agents, t_start, t_stop, step,
                      n_past, n_next, hits);
    if ((int64_t)hits.size() > capacity) return -1;
    for (size_t i = 0; i < hits.size(); ++i) {
        out[i * 5 + 0] = hits[i].agent;
        out[i * 5 + 1] = hits[i].kp;
        out[i * 5 + 2] = hits[i].k0;
        out[i * 5 + 3] = hits[i].kf;
        out[i * 5 + 4] = hits[i].t;
    }
    return 0;
}

void sw_free(double* p) { std::free(p); }

}  // extern "C"
