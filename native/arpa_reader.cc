// Native ARPA n-gram file reader.
//
// The reference fuses a KenLM word-level 4-gram ("4gram_big.arpa.gz",
// .MISSING_LARGE_BLOBS:1) through pyctcdecode's C++ runtime
// (wav2vec2/tedlium/run.py:127-133).  This repo's device-side fusion
// (lm/ngram.py, lm/word_fusion.py) consumes ARPA tables as flat arrays;
// parsing a multi-hundred-MB ARPA line-by-line in Python is the bottleneck,
// so this file is the TPU build's equivalent of KenLM's native loader:
// a C shared library (ctypes-bound from lm/arpa_native.py, no pybind11 in
// the image) that
//   - reads plain or gzip ARPA via zlib (gzopen transparently handles both),
//   - interns token strings into an integer vocabulary,
//   - returns, per order k, flat [n_k * k] int32 token-id rows plus float32
//     log10 probabilities and backoffs.
// Python maps interned vocab strings -> tokenizer ids once (vocab-sized, not
// ngram-sized) and hashes rows with vectorized numpy.
//
// Field grammar matches lm/ngram.py::_iter_arpa: a data row is
//   logp tok_1 ... tok_k [backoff]
// split on arbitrary whitespace; the field count disambiguates the optional
// trailing backoff.  Sections are "\k-grams:" headers; "\end\" terminates.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

#include <zlib.h>

namespace {

struct ArpaFile {
  int order = 0;
  std::vector<std::string> vocab;
  std::unordered_map<std::string, int32_t> intern;
  // 1-indexed by order; [0] unused
  std::vector<std::vector<int32_t>> ids;
  std::vector<std::vector<float>> logp;
  std::vector<std::vector<float>> backoff;
  std::string error;
};

bool read_all(const char* path, std::string* out) {
  gzFile f = gzopen(path, "rb");
  if (!f) return false;
  gzbuffer(f, 1 << 20);
  const size_t kChunk = 1 << 22;
  size_t n = 0;
  for (;;) {
    out->resize(n + kChunk);
    int got = gzread(f, &(*out)[n], static_cast<unsigned>(kChunk));
    if (got < 0) {
      gzclose(f);
      return false;
    }
    n += static_cast<size_t>(got);
    if (static_cast<size_t>(got) < kChunk) break;
  }
  out->resize(n);
  gzclose(f);
  return true;
}

int32_t intern_tok(ArpaFile* a, const char* s, size_t len) {
  std::string key(s, len);
  auto it = a->intern.find(key);
  if (it != a->intern.end()) return it->second;
  int32_t id = static_cast<int32_t>(a->vocab.size());
  a->vocab.push_back(key);
  a->intern.emplace(std::move(key), id);
  return id;
}

struct Field {
  const char* p;
  size_t len;
};

}  // namespace

extern "C" {

ArpaFile* arpa_parse(const char* path, int max_order) {
  auto* a = new ArpaFile();
  std::string buf;
  if (!read_all(path, &buf)) {
    a->error = "cannot read file";
    return a;  // caller checks arpa_error
  }

  a->ids.resize(1);
  a->logp.resize(1);
  a->backoff.resize(1);

  int cur = 0;  // 0 = outside any n-gram section
  std::vector<Field> fields;
  fields.reserve(16);

  const char* p = buf.data();
  const char* end = p + buf.size();
  while (p < end) {
    const char* nl = static_cast<const char*>(memchr(p, '\n', end - p));
    const char* line_end = nl ? nl : end;
    // trim \r and surrounding spaces
    const char* s = p;
    const char* e = line_end;
    while (s < e && (*s == ' ' || *s == '\t' || *s == '\r')) ++s;
    while (e > s && (e[-1] == ' ' || e[-1] == '\t' || e[-1] == '\r')) --e;
    p = nl ? nl + 1 : end;
    if (s == e) continue;

    if (*s == '\\') {
      // "\k-grams:" or "\end\" or "\data\"
      if (e - s >= 5 && memcmp(s, "\\end\\", 5) == 0) break;
      const char* dash = static_cast<const char*>(memchr(s, '-', e - s));
      if (dash && e - dash >= 6 && memcmp(dash, "-grams", 6) == 0) {
        cur = atoi(s + 1);
        if (max_order > 0 && cur > max_order) cur = 0;
        if (cur > 0) {
          if (cur > a->order) a->order = cur;
          if (static_cast<size_t>(cur) >= a->ids.size()) {
            a->ids.resize(cur + 1);
            a->logp.resize(cur + 1);
            a->backoff.resize(cur + 1);
          }
        }
      }
      continue;
    }
    if (cur == 0) continue;  // header counts ("ngram 1=...") or skipped order

    // split into whitespace-separated fields
    fields.clear();
    const char* q = s;
    while (q < e) {
      while (q < e && (*q == ' ' || *q == '\t')) ++q;
      const char* t0 = q;
      while (q < e && *q != ' ' && *q != '\t') ++q;
      if (q > t0) fields.push_back({t0, static_cast<size_t>(q - t0)});
    }
    if (fields.size() < static_cast<size_t>(cur) + 1) continue;

    // parse in place: fields point into the NUL-terminated file buffer and
    // are bounded by whitespace/newline, all of which stop strtof — no
    // fixed-size copy that could silently truncate a long numeric field
    float lp = strtof(fields[0].p, nullptr);

    float bo = 0.0f;
    if (fields.size() >= static_cast<size_t>(cur) + 2) {
      bo = strtof(fields[cur + 1].p, nullptr);
    }

    auto& ids = a->ids[cur];
    for (int j = 1; j <= cur; ++j) {
      ids.push_back(intern_tok(a, fields[j].p, fields[j].len));
    }
    a->logp[cur].push_back(lp);
    a->backoff[cur].push_back(bo);
  }
  return a;
}

const char* arpa_error(ArpaFile* a) {
  return a->error.empty() ? nullptr : a->error.c_str();
}

int arpa_order(ArpaFile* a) { return a->order; }

int64_t arpa_num_rows(ArpaFile* a, int k) {
  if (k <= 0 || static_cast<size_t>(k) >= a->logp.size()) return 0;
  return static_cast<int64_t>(a->logp[k].size());
}

int64_t arpa_vocab_size(ArpaFile* a) {
  return static_cast<int64_t>(a->vocab.size());
}

// total bytes of all vocab words joined by '\n' (no trailing newline)
int64_t arpa_vocab_bytes(ArpaFile* a) {
  int64_t n = 0;
  for (const auto& w : a->vocab) n += static_cast<int64_t>(w.size()) + 1;
  return n > 0 ? n - 1 : 0;
}

void arpa_copy_vocab(ArpaFile* a, char* out) {
  char* q = out;
  for (size_t i = 0; i < a->vocab.size(); ++i) {
    if (i) *q++ = '\n';
    memcpy(q, a->vocab[i].data(), a->vocab[i].size());
    q += a->vocab[i].size();
  }
}

void arpa_copy_rows(ArpaFile* a, int k, int32_t* ids, float* logp,
                    float* backoff) {
  if (k <= 0 || static_cast<size_t>(k) >= a->logp.size()) return;
  memcpy(ids, a->ids[k].data(), a->ids[k].size() * sizeof(int32_t));
  memcpy(logp, a->logp[k].data(), a->logp[k].size() * sizeof(float));
  memcpy(backoff, a->backoff[k].data(), a->backoff[k].size() * sizeof(float));
}

void arpa_free(ArpaFile* a) { delete a; }

}  // extern "C"
