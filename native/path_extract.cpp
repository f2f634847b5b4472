// PCRA relation-path extraction for PTransE — native fast path.
//
// Same algorithm as kb2e_tpu/data/paths.py (the defining Python
// implementation and test oracle): over the train graph augmented with
// inverse edges (relation id r+R), enumerate relation paths of length
// 2..max_len between every training pair (h, t), weighting each path by its
// path-constraint resource-allocation (PCRA) reliability — a unit resource
// at h split uniformly over each hop's targets.  Confidences are normalised
// per pair (R(p)/Z over ALL discovered paths), filtered at min_conf, sorted
// (confidence desc, then lexicographic path, shorter-prefix first — matching
// Python tuple ordering), and the top max_paths are written per TRIPLE.
//
// Exposed via a plain C ABI for ctypes (see kb2e_tpu/data/native_paths.py).
// The reference fork ships no PTransE code (survey §0.1); this subsystem is
// a from-scratch addition in the spirit of its README's PTransE results
// (README.md:26-29).

#include <algorithm>
#include <cstdint>
#include <cstdlib>
#include <cstring>
#include <unordered_map>
#include <vector>

namespace {

// A path of ≤3 hops packed into a u64: 21 bits per hop storing rel+1
// (0 = unused slot).  Supports doubled-relation vocabularies up to 2^21-2.
constexpr int kHopBits = 21;
constexpr uint64_t kHopMask = (1ull << kHopBits) - 1;

inline uint64_t path_append(uint64_t key, int32_t rel, int depth) {
  return key | (static_cast<uint64_t>(rel + 1) << (kHopBits * depth));
}

inline int path_unpack(uint64_t key, int32_t* hops) {
  int len = 0;
  for (int d = 0; d < 3; ++d) {
    uint64_t h = (key >> (kHopBits * d)) & kHopMask;
    if (h == 0) break;
    hops[len++] = static_cast<int32_t>(h - 1);
  }
  return len;
}

// Python-tuple ordering on packed paths (element-wise, shorter prefix first).
inline bool path_less(uint64_t a, uint64_t b) {
  int32_t ha[3], hb[3];
  int la = path_unpack(a, ha), lb = path_unpack(b, hb);
  int n = la < lb ? la : lb;
  for (int i = 0; i < n; ++i) {
    if (ha[i] != hb[i]) return ha[i] < hb[i];
  }
  return la < lb;
}

struct Entry {
  uint64_t path;
  int32_t node;
  double res;
};

}  // namespace

extern "C" {

// Returns 0 on success, -1 on invalid arguments.  The graph is
// (heads, tails, rels); paths are extracted for the (q_heads, q_tails) query
// pairs (pass the graph's own pairs for training stores, test pairs for
// evaluation-evidence stores).  Output arrays are caller-shaped:
// out_rels [n_queries * max_paths * max_len] (filled with -1),
// out_conf [n_queries * max_paths] (filled with 0).
int kb2e_extract_paths(const int32_t* heads, const int32_t* tails,
                       const int32_t* rels, int64_t n_triples,
                       const int32_t* q_heads, const int32_t* q_tails,
                       int64_t n_queries, int64_t n_entities,
                       int64_t n_relations, int max_len, double min_conf,
                       int max_paths, int max_branch, int32_t* out_rels,
                       float* out_conf) {
  if (max_len < 2 || max_len > 3 || max_paths < 1) return -1;
  if (2 * n_relations + 1 >= (1ll << kHopBits)) return -1;
  const int64_t n_nodes = n_entities;

  // Doubled edge list (forward + inverse), CSR-grouped by (src, rel, dst) so
  // each (src, rel) fan-out is one contiguous run.
  struct Edge {
    int32_t src, rel, dst;
  };
  std::vector<Edge> edges(2 * n_triples);
  for (int64_t i = 0; i < n_triples; ++i) {
    edges[2 * i] = {heads[i], rels[i], tails[i]};
    edges[2 * i + 1] = {tails[i], static_cast<int32_t>(rels[i] + n_relations),
                        heads[i]};
  }
  std::sort(edges.begin(), edges.end(), [](const Edge& a, const Edge& b) {
    if (a.src != b.src) return a.src < b.src;
    if (a.rel != b.rel) return a.rel < b.rel;
    return a.dst < b.dst;
  });
  std::vector<int64_t> node_start(n_nodes + 1, 0);
  for (const Edge& e : edges) ++node_start[e.src + 1];
  for (int64_t i = 0; i < n_nodes; ++i) node_start[i + 1] += node_start[i];

  // Per-head query lists: which output rows to fill for each (h, t) pair.
  std::vector<std::vector<int64_t>> queries_of_head(n_nodes);
  for (int64_t i = 0; i < n_queries; ++i)
    queries_of_head[q_heads[i]].push_back(i);

  std::fill(out_rels, out_rels + n_queries * max_paths * max_len, -1);
  std::fill(out_conf, out_conf + n_queries * max_paths, 0.0f);

  // Frontier entries per depth, aggregated by (path, node) via sort+merge —
  // deterministic and allocation-light.
  std::vector<Entry> frontier, next, found;
  std::vector<std::pair<uint64_t, double>> pair_paths;  // scratch per pair

  auto expand = [&](const std::vector<Entry>& src, std::vector<Entry>& dst,
                    int depth) {
    dst.clear();
    for (const Entry& e : src) {
      int64_t lo = node_start[e.node], hi = node_start[e.node + 1];
      while (lo < hi) {
        int32_t rel = edges[lo].rel;
        int64_t run = lo;
        while (run < hi && edges[run].rel == rel) ++run;
        int64_t fan = run - lo;
        if (!max_branch || fan <= max_branch) {
          double share = e.res / static_cast<double>(fan);
          uint64_t p = path_append(e.path, rel, depth);
          for (int64_t k = lo; k < run; ++k)
            dst.push_back({p, edges[k].dst, share});
        }
        lo = run;
      }
    }
    // Aggregate duplicates (same path, same node).
    std::sort(dst.begin(), dst.end(), [](const Entry& a, const Entry& b) {
      if (a.path != b.path) return a.path < b.path;
      return a.node < b.node;
    });
    size_t w = 0;
    for (size_t i = 0; i < dst.size();) {
      size_t j = i;
      double sum = 0;
      while (j < dst.size() && dst[j].path == dst[i].path &&
             dst[j].node == dst[i].node)
        sum += dst[j++].res;
      dst[w++] = {dst[i].path, dst[i].node, sum};
      i = j;
    }
    dst.resize(w);
  };

  for (int64_t h = 0; h < n_nodes; ++h) {
    if (queries_of_head[h].empty()) continue;

    frontier.assign({{0ull, static_cast<int32_t>(h), 1.0}});
    found.clear();
    for (int depth = 0; depth < max_len; ++depth) {
      expand(frontier, next, depth);
      frontier.swap(next);
      if (depth >= 1) {  // record length-(depth+1) ≥ 2 paths
        found.insert(found.end(), frontier.begin(), frontier.end());
      }
    }
    // Group found entries by node for per-pair lookup.
    std::sort(found.begin(), found.end(), [](const Entry& a, const Entry& b) {
      if (a.node != b.node) return a.node < b.node;
      return a.path < b.path;
    });

    for (int64_t ti : queries_of_head[h]) {
      int32_t t = q_tails[ti];
      auto lo = std::lower_bound(
          found.begin(), found.end(), t,
          [](const Entry& e, int32_t v) { return e.node < v; });
      pair_paths.clear();
      double z = 0;
      for (auto it = lo; it != found.end() && it->node == t; ++it) {
        pair_paths.emplace_back(it->path, it->res);
        z += it->res;
      }
      if (pair_paths.empty() || z <= 0) continue;
      for (auto& pr : pair_paths) pr.second /= z;
      // Keep ≥ min_conf, sort conf desc then Python-tuple path order.
      pair_paths.erase(
          std::remove_if(pair_paths.begin(), pair_paths.end(),
                         [&](const std::pair<uint64_t, double>& pr) {
                           return pr.second < min_conf;
                         }),
          pair_paths.end());
      std::sort(pair_paths.begin(), pair_paths.end(),
                [](const std::pair<uint64_t, double>& a,
                   const std::pair<uint64_t, double>& b) {
                  if (a.second != b.second) return a.second > b.second;
                  return path_less(a.first, b.first);
                });
      int n_keep = std::min<int64_t>(pair_paths.size(), max_paths);
      for (int p = 0; p < n_keep; ++p) {
        int32_t hops[3];
        int len = path_unpack(pair_paths[p].first, hops);
        for (int l = 0; l < len; ++l)
          out_rels[(ti * max_paths + p) * max_len + l] = hops[l];
        out_conf[ti * max_paths + p] = static_cast<float>(pair_paths[p].second);
      }
    }
  }
  return 0;
}

}  // extern "C"
