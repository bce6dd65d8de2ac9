// Fast WordPiece tokenizer — native host-side runtime component.
//
// Implements the same algorithm as bpx/data/tokenization.py (BERT basic
// tokenization + greedy longest-match-first WordPiece) for the ASCII fast
// path; the Python layer dispatches non-ASCII strings to its own
// implementation.  Exposed via a plain C ABI consumed through ctypes
// (no pybind11 dependency).
//
// The reference tokenizes with HF's Python BertTokenizer inside 12 forked
// DataLoader workers (ref: data/helpers.py:142-147, 187-194); on a TPU host
// the input pipeline shares cores with the runtime, so tokenization speed is
// real training-throughput budget.

#include <algorithm>
#include <cctype>
#include <cstdint>
#include <cstring>
#include <fstream>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct Vocab {
    std::unordered_map<std::string, int32_t> stoi;
    int32_t unk_id = 1;
    int32_t cls_id = 2;
    size_t max_chars_per_word = 100;
};

bool is_punct(unsigned char c) {
    return (c >= 33 && c <= 47) || (c >= 58 && c <= 64) ||
           (c >= 91 && c <= 96) || (c >= 123 && c <= 126);
}

// Greedy longest-match WordPiece of one lowercase word into ids.
void wordpiece(const Vocab& v, const std::string& word,
               std::vector<int32_t>* out) {
    if (word.size() > v.max_chars_per_word) {
        out->push_back(v.unk_id);
        return;
    }
    size_t start = 0;
    std::vector<int32_t> pieces;
    std::string sub;
    while (start < word.size()) {
        size_t end = word.size();
        int32_t cur = -1;
        while (start < end) {
            sub.assign(word, start, end - start);
            if (start > 0) sub = "##" + sub;
            auto it = v.stoi.find(sub);
            if (it != v.stoi.end()) {
                cur = it->second;
                break;
            }
            --end;
        }
        if (cur < 0) {
            out->push_back(v.unk_id);
            return;
        }
        pieces.push_back(cur);
        start = end;
    }
    out->insert(out->end(), pieces.begin(), pieces.end());
}

}  // namespace

extern "C" {

// Returns an opaque vocab handle or nullptr.
void* wp_load_vocab(const char* path) {
    std::ifstream f(path);
    if (!f.good()) return nullptr;
    auto* v = new Vocab();
    std::string line;
    int32_t idx = 0;
    while (std::getline(f, line)) {
        if (!line.empty() && line.back() == '\r') line.pop_back();
        if (line.empty()) continue;
        v->stoi.emplace(line, idx++);
    }
    auto unk = v->stoi.find("[UNK]");
    auto cls = v->stoi.find("[CLS]");
    if (unk != v->stoi.end()) v->unk_id = unk->second;
    if (cls != v->stoi.end()) v->cls_id = cls->second;
    return v;
}

void wp_free_vocab(void* handle) { delete static_cast<Vocab*>(handle); }

int32_t wp_vocab_size(void* handle) {
    return static_cast<int32_t>(static_cast<Vocab*>(handle)->stoi.size());
}

// Encode ASCII text: [CLS] + wordpieces, truncated to max_len.
// Returns the number of ids written into out (capacity must be >= max_len).
// Returns -1 if the text contains non-ASCII bytes (caller falls back).
int32_t wp_encode(void* handle, const char* text, int32_t max_len,
                  int32_t* out) {
    const Vocab& v = *static_cast<Vocab*>(handle);
    std::vector<int32_t> ids;
    ids.reserve(max_len);

    std::string word;
    std::vector<int32_t> tmp;
    auto flush_word = [&]() {
        if (!word.empty()) {
            tmp.clear();
            wordpiece(v, word, &tmp);
            ids.insert(ids.end(), tmp.begin(), tmp.end());
            word.clear();
        }
    };

    for (const char* p = text; *p; ++p) {
        unsigned char c = static_cast<unsigned char>(*p);
        if (c >= 0x80) return -1;   // non-ASCII -> python fallback
        if (c == ' ' || c == '\t' || c == '\n' || c == '\r') {
            flush_word();
        } else if (c < 0x20 || c == 0x7f) {
            // other control chars (incl. \v, \f) are DELETED, joining
            // their neighbours — byte-for-byte what the python
            // BasicTokenizer does (_is_control: category Cc except
            // \t\n\r); treating them as separators would tokenize
            // "don\x01t" as "don"+"t" here but "dont" in the fallback
            continue;
        } else if (is_punct(c)) {
            flush_word();
            std::string punct(1, static_cast<char>(c));
            auto it = v.stoi.find(punct);
            ids.push_back(it != v.stoi.end() ? it->second : v.unk_id);
        } else {
            word.push_back(static_cast<char>(std::tolower(c)));
        }
        if (static_cast<int32_t>(ids.size()) >= max_len) break;
    }
    flush_word();

    int32_t n = std::min<int32_t>(static_cast<int32_t>(ids.size()),
                                  max_len - 1);
    out[0] = v.cls_id;
    std::memcpy(out + 1, ids.data(), n * sizeof(int32_t));
    return n + 1;
}

}  // extern "C"
