// Caption inverted index — C++ engine for swat_tpu.retrieval.stringmatch.
//
// Replaces the reference's SQLite FTS5 caption tables
// (reference retrieval/laion_parser.py:67-79,157-167) with an in-memory
// inverted index over a newline-separated caption corpus.  Tokenization is
// lowercase [0-9a-z]+ runs (ASCII subset of FTS5 unicode61), matching the
// python engine exactly so both produce identical retrieved pools.
//
// C ABI (ctypes):
//   void*   idx_build_file(const char* path)         // newline-separated
//   void*   idx_build_buffer(const char* buf, long n)
//   long    idx_num_captions(void* h)
//   long    idx_query(void* h, const char* query, int phrase,
//                     long* out, long cap)            // AND of tokens
//   void    idx_free(void* h)
//
// Build: make -C swat_tpu/retrieval/indexer

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <sstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Index {
  std::vector<std::vector<int32_t>> caption_tokens;  // token ids per caption
  std::unordered_map<std::string, int32_t> vocab;
  std::vector<std::vector<int64_t>> postings;  // token id -> caption ids
};

inline void tokenize(const std::string& text, std::vector<std::string>* out) {
  std::string cur;
  for (unsigned char c : text) {
    if (std::isalnum(c)) {
      cur.push_back(static_cast<char>(std::tolower(c)));
    } else if (!cur.empty()) {
      out->push_back(cur);
      cur.clear();
    }
  }
  if (!cur.empty()) out->push_back(cur);
}

// caption normalization: quotes removed, '-'/'_' -> space (the tokenizer
// already splits on them, and quote removal merges "don't" -> "dont" the
// same way the python engine's normalize_caption + tokenize does)
inline std::string normalize(const std::string& text) {
  std::string out;
  out.reserve(text.size());
  for (char c : text) {
    if (c == '"' || c == '\'') continue;
    if (c == '-' || c == '_') { out.push_back(' '); continue; }
    out.push_back(c);
  }
  return out;
}

Index* build(std::istream& in) {
  auto* idx = new Index();
  std::string line;
  std::vector<std::string> toks;
  while (std::getline(in, line)) {
    toks.clear();
    tokenize(normalize(line), &toks);
    std::vector<int32_t> ids;
    ids.reserve(toks.size());
    const int64_t cap_id = static_cast<int64_t>(idx->caption_tokens.size());
    for (const auto& t : toks) {
      auto it = idx->vocab.find(t);
      int32_t tid;
      if (it == idx->vocab.end()) {
        tid = static_cast<int32_t>(idx->vocab.size());
        idx->vocab.emplace(t, tid);
        idx->postings.emplace_back();
      } else {
        tid = it->second;
      }
      ids.push_back(tid);
      auto& plist = idx->postings[tid];
      if (plist.empty() || plist.back() != cap_id) plist.push_back(cap_id);
    }
    idx->caption_tokens.push_back(std::move(ids));
  }
  return idx;
}

bool contains_phrase(const std::vector<int32_t>& hay,
                     const std::vector<int32_t>& needle) {
  if (needle.size() > hay.size()) return false;
  for (size_t i = 0; i + needle.size() <= hay.size(); ++i) {
    bool ok = true;
    for (size_t j = 0; j < needle.size(); ++j) {
      if (hay[i + j] != needle[j]) { ok = false; break; }
    }
    if (ok) return true;
  }
  return false;
}

}  // namespace

extern "C" {

void* idx_build_file(const char* path) {
  std::ifstream in(path);
  if (!in.good()) return nullptr;
  return build(in);
}

void* idx_build_buffer(const char* buf, long n) {
  std::string s(buf, static_cast<size_t>(n));
  std::istringstream in(s);
  return build(in);
}

long idx_num_captions(void* h) {
  return static_cast<long>(static_cast<Index*>(h)->caption_tokens.size());
}

long idx_query(void* h, const char* query, int phrase, long* out, long cap) {
  auto* idx = static_cast<Index*>(h);
  std::vector<std::string> toks;
  tokenize(normalize(query), &toks);
  if (toks.empty()) return 0;

  std::vector<int32_t> tids;
  std::vector<const std::vector<int64_t>*> lists;
  for (const auto& t : toks) {
    auto it = idx->vocab.find(t);
    if (it == idx->vocab.end()) return 0;
    tids.push_back(it->second);
    lists.push_back(&idx->postings[it->second]);
  }
  // intersect starting from the rarest list
  std::sort(lists.begin(), lists.end(),
            [](const auto* a, const auto* b) { return a->size() < b->size(); });
  std::vector<int64_t> result(*lists[0]);
  std::vector<int64_t> tmp;
  for (size_t i = 1; i < lists.size() && !result.empty(); ++i) {
    tmp.clear();
    std::set_intersection(result.begin(), result.end(), lists[i]->begin(),
                          lists[i]->end(), std::back_inserter(tmp));
    result.swap(tmp);
  }
  long n = 0;
  for (int64_t cid : result) {
    if (phrase && toks.size() > 1 &&
        !contains_phrase(idx->caption_tokens[cid], tids)) {
      continue;
    }
    if (n < cap) out[n] = cid;
    ++n;
  }
  return n;
}

void idx_free(void* h) { delete static_cast<Index*>(h); }

// --- persistence: build once over a corpus, reload instantly -------------
// binary format: magic | n_captions | n_tokens | per-caption token lists |
// vocab strings (id order) | postings lists

static constexpr uint64_t kMagic = 0x53574154494458ULL;  // "SWATIDX"

long idx_save(void* h, const char* path) {
  auto* idx = static_cast<Index*>(h);
  std::ofstream out(path, std::ios::binary);
  if (!out.good()) return -1;
  auto put64 = [&](uint64_t v) { out.write(reinterpret_cast<char*>(&v), 8); };
  put64(kMagic);
  put64(idx->caption_tokens.size());
  put64(idx->vocab.size());
  for (const auto& toks : idx->caption_tokens) {
    put64(toks.size());
    out.write(reinterpret_cast<const char*>(toks.data()),
              toks.size() * sizeof(int32_t));
  }
  std::vector<const std::string*> by_id(idx->vocab.size());
  for (const auto& kv : idx->vocab) by_id[kv.second] = &kv.first;
  for (const auto* s : by_id) {
    put64(s->size());
    out.write(s->data(), s->size());
  }
  for (const auto& plist : idx->postings) {
    put64(plist.size());
    out.write(reinterpret_cast<const char*>(plist.data()),
              plist.size() * sizeof(int64_t));
  }
  return out.good() ? 0 : -1;
}

void* idx_load(const char* path) {
  std::ifstream in(path, std::ios::binary);
  if (!in.good()) return nullptr;
  auto get64 = [&]() {
    uint64_t v = 0;
    in.read(reinterpret_cast<char*>(&v), 8);
    return v;
  };
  if (get64() != kMagic) return nullptr;
  auto* idx = new Index();
  const uint64_t n_cap = get64();
  const uint64_t n_tok = get64();
  idx->caption_tokens.resize(n_cap);
  for (auto& toks : idx->caption_tokens) {
    toks.resize(get64());
    in.read(reinterpret_cast<char*>(toks.data()),
            toks.size() * sizeof(int32_t));
  }
  idx->postings.resize(n_tok);
  for (uint64_t t = 0; t < n_tok; ++t) {
    std::string s(get64(), '\0');
    in.read(s.data(), s.size());
    idx->vocab.emplace(std::move(s), static_cast<int32_t>(t));
  }
  for (auto& plist : idx->postings) {
    plist.resize(get64());
    in.read(reinterpret_cast<char*>(plist.data()),
            plist.size() * sizeof(int64_t));
  }
  if (!in.good()) {
    delete idx;
    return nullptr;
  }
  return idx;
}

}  // extern "C"
