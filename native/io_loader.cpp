// Native data-plane loader for kb2e_tpu.
//
// TPU-native counterpart of the reference's C++ data layer
// (common/loader.cpp:15-62): parses id-map files and triple files into flat
// int32 struct-of-arrays buffers ready for zero-copy adoption by numpy.
// Unlike the reference it validates the "ids start at 0, no holes" contract
// (README.md:4, survey quirk B13) instead of trusting it, and it streams with
// a buffered reader instead of fscanf.
//
// Exposed via a C ABI consumed through ctypes (kb2e_tpu/data/native.py);
// unknown-id rows are warned to stderr and skipped, matching
// common/loader.cpp:40-57.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

bool load_id_map(const char* path, std::unordered_map<std::string, int32_t>* map) {
  FILE* f = std::fopen(path, "r");
  if (f == nullptr) {
    std::fprintf(stderr, "kb2e_io: cannot open id file: %s\n", path);
    return false;
  }
  char name[4096];
  long id;
  while (std::fscanf(f, "%4095s %ld", name, &id) == 2) {
    (*map)[name] = static_cast<int32_t>(id);
  }
  std::fclose(f);

  // Contract: ids are exactly 0..n-1 (quirk B13).
  std::vector<bool> seen(map->size(), false);
  for (const auto& kv : *map) {
    if (kv.second < 0 || kv.second >= static_cast<long>(map->size()) || seen[kv.second]) {
      std::fprintf(stderr, "kb2e_io: id contract violated in %s (id %d)\n", path, kv.second);
      return false;
    }
    seen[kv.second] = true;
  }
  return true;
}

}  // namespace

extern "C" {

// Parse a triple file (rows: head tail relation, whitespace separated string
// ids) against the id maps.  On success returns the number of valid triples
// and fills malloc'd arrays (caller frees with kb2e_free).  Returns -1 on
// I/O or contract failure.
long kb2e_load_triples(const char* entity_id_path, const char* relation_id_path,
                       const char* triple_path, int32_t** heads, int32_t** tails,
                       int32_t** rels, long* n_entities, long* n_relations) {
  std::unordered_map<std::string, int32_t> e2i, r2i;
  if (!load_id_map(entity_id_path, &e2i) || !load_id_map(relation_id_path, &r2i)) {
    return -1;
  }
  *n_entities = static_cast<long>(e2i.size());
  *n_relations = static_cast<long>(r2i.size());

  FILE* f = std::fopen(triple_path, "r");
  if (f == nullptr) {
    std::fprintf(stderr, "kb2e_io: cannot open triple file: %s\n", triple_path);
    return -1;
  }

  std::vector<int32_t> h, t, r;
  h.reserve(1 << 20);
  t.reserve(1 << 20);
  r.reserve(1 << 20);
  char hs[4096], ts[4096], rs[4096];
  while (std::fscanf(f, "%4095s %4095s %4095s", hs, ts, rs) == 3) {
    auto hi = e2i.find(hs);
    auto ti = e2i.find(ts);
    auto ri = r2i.find(rs);
    bool fail = false;
    if (hi == e2i.end()) {
      std::fprintf(stderr,
                   "Head entity found in triple file that was not found in the "
                   "identity file: %s\n", hs);
      fail = true;
    }
    if (ti == e2i.end()) {
      std::fprintf(stderr,
                   "Tail entity found in triple file that was not found in the "
                   "identity file: %s\n", ts);
      fail = true;
    }
    if (ri == r2i.end()) {
      std::fprintf(stderr,
                   "Relation found in triple file that was not found in the "
                   "identity file: %s\n", rs);
      fail = true;
    }
    if (fail) continue;
    h.push_back(hi->second);
    t.push_back(ti->second);
    r.push_back(ri->second);
  }
  std::fclose(f);

  const long n = static_cast<long>(h.size());
  *heads = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * n));
  *tails = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * n));
  *rels = static_cast<int32_t*>(std::malloc(sizeof(int32_t) * n));
  if (n > 0) {
    std::memcpy(*heads, h.data(), sizeof(int32_t) * n);
    std::memcpy(*tails, t.data(), sizeof(int32_t) * n);
    std::memcpy(*rels, r.data(), sizeof(int32_t) * n);
  }
  return n;
}

void kb2e_free(void* p) { std::free(p); }

}  // extern "C"
