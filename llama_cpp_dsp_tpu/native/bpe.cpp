// Native BPE merge core — the host-side tokenizer hot loop.
//
// C++ twin of tokenizer/bpe.py's merge loop (itself faithful to reference
// src/llama-vocab.cpp llm_tokenizer_bpe :540-640): symbols are UTF-8
// codepoints of the byte-encoded word, bigrams merge lowest-rank-first with
// ties broken by lower left index, stale queue entries are skipped by
// comparing concatenated text, and unmatched symbols fall back to per-char
// token lookup. Pre-tokenization (regex split) and the gpt2 byte-encoding
// stay in Python; this core runs once per word.
//
// C ABI (ctypes): bpe_create / bpe_free / bpe_encode_word.

#include <cstdint>
#include <cstring>
#include <queue>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct BpeVocab {
    std::unordered_map<std::string, int32_t> token_map;
    std::unordered_map<std::string, int32_t> rank_map;  // len-prefixed pair key
};

std::string pair_key(const std::string &l, const std::string &r) {
    std::string k;
    uint32_t n = (uint32_t)l.size();
    k.append((const char *)&n, 4);
    k += l;
    k += r;
    return k;
}

struct Bigram {
    int32_t rank;
    int32_t left;
    int32_t right;
    std::string text;
};

struct BigramCmp {  // min-heap: lowest rank, then lowest left index
    bool operator()(const Bigram &a, const Bigram &b) const {
        if (a.rank != b.rank) return a.rank > b.rank;
        if (a.left != b.left) return a.left > b.left;
        if (a.right != b.right) return a.right > b.right;
        return a.text > b.text;
    }
};

int cp_len(uint8_t c) {
    if (c < 0x80) return 1;
    if ((c & 0xE0) == 0xC0) return 2;
    if ((c & 0xF0) == 0xE0) return 3;
    if ((c & 0xF8) == 0xF0) return 4;
    return 1;  // invalid byte: treat as single symbol
}

}  // namespace

extern "C" {

// token_blob/token_offs: n_tokens+1 offsets into blob (token text table).
// merge_blob/merge_offs: 2*n_merges+1 offsets (left0,right0,left1,right1,…);
// rank of merge i is i (reference llama_vocab bpe_ranks).
void *bpe_create(const uint8_t *token_blob, const int64_t *token_offs,
                 int32_t n_tokens, const uint8_t *merge_blob,
                 const int64_t *merge_offs, int32_t n_merges) {
    auto *v = new BpeVocab();
    v->token_map.reserve((size_t)n_tokens * 2);
    for (int32_t i = 0; i < n_tokens; ++i) {
        std::string t((const char *)token_blob + token_offs[i],
                      (size_t)(token_offs[i + 1] - token_offs[i]));
        v->token_map.emplace(std::move(t), i);
    }
    v->rank_map.reserve((size_t)n_merges * 2);
    for (int32_t i = 0; i < n_merges; ++i) {
        std::string l((const char *)merge_blob + merge_offs[2 * i],
                      (size_t)(merge_offs[2 * i + 1] - merge_offs[2 * i]));
        std::string r((const char *)merge_blob + merge_offs[2 * i + 1],
                      (size_t)(merge_offs[2 * i + 2] - merge_offs[2 * i + 1]));
        v->rank_map.emplace(pair_key(l, r), i);
    }
    return v;
}

void bpe_free(void *h) { delete (BpeVocab *)h; }

// word: UTF-8 bytes (already gpt2-byte-encoded). Returns count of token ids
// written to out (≤ max_out; symbols with no token and no per-char fallback
// are dropped, matching the Python twin).
int32_t bpe_encode_word(void *h, const uint8_t *word, int32_t n_bytes,
                        int32_t *out, int32_t max_out) {
    const BpeVocab *v = (const BpeVocab *)h;

    std::vector<std::string> texts;
    texts.reserve((size_t)n_bytes);
    for (int32_t i = 0; i < n_bytes;) {
        int l = cp_len(word[i]);
        if (i + l > n_bytes) l = 1;
        texts.emplace_back((const char *)word + i, (size_t)l);
        i += l;
    }
    const int32_t n = (int32_t)texts.size();
    if (n == 0) return 0;

    std::vector<int32_t> size(n), prev(n), next(n);
    for (int32_t i = 0; i < n; ++i) {
        size[i] = (int32_t)texts[i].size();
        prev[i] = i - 1;
        next[i] = (i + 1 < n) ? i + 1 : -1;
    }

    std::priority_queue<Bigram, std::vector<Bigram>, BigramCmp> heap;
    auto add_bigram = [&](int32_t left, int32_t right) {
        if (left < 0 || right < 0) return;
        auto it = v->rank_map.find(pair_key(texts[left], texts[right]));
        if (it == v->rank_map.end()) return;
        heap.push(Bigram{it->second, left, right, texts[left] + texts[right]});
    };
    for (int32_t i = 1; i < n; ++i) add_bigram(i - 1, i);

    while (!heap.empty()) {
        Bigram bg = heap.top();
        heap.pop();
        const int32_t left = bg.left, right = bg.right;
        if (size[left] == 0 || size[right] == 0) continue;
        if (texts[left].size() + texts[right].size() != bg.text.size() ||
            bg.text.compare(0, texts[left].size(), texts[left]) != 0 ||
            bg.text.compare(texts[left].size(), std::string::npos,
                            texts[right]) != 0)
            continue;  // outdated entry
        texts[left] = std::move(bg.text);
        size[left] += size[right];
        size[right] = 0;
        next[left] = next[right];
        if (next[right] >= 0) prev[next[right]] = left;
        add_bigram(prev[left], left);
        add_bigram(left, next[left]);
    }

    int32_t n_out = 0;
    for (int32_t i = 0; i != -1 && i < n; i = next[i]) {
        if (size[i] == 0) continue;
        auto it = v->token_map.find(texts[i]);
        if (it != v->token_map.end()) {
            if (n_out < max_out) out[n_out++] = it->second;
            continue;
        }
        // per-codepoint fallback (missing chars dropped)
        const std::string &t = texts[i];
        for (size_t j = 0; j < t.size();) {
            int l = cp_len((uint8_t)t[j]);
            if (j + (size_t)l > t.size()) l = 1;
            auto ci = v->token_map.find(t.substr(j, (size_t)l));
            if (ci != v->token_map.end() && n_out < max_out)
                out[n_out++] = ci->second;
            j += (size_t)l;
        }
    }
    return n_out;
}

// Batched entry: words as a blob with n_words+1 offsets; token ids are
// appended across words (one ctypes crossing per tokenize call).
int32_t bpe_encode_words(void *h, const uint8_t *blob, const int64_t *offs,
                         int32_t n_words, int32_t *out, int32_t max_out) {
    int32_t n_out = 0;
    for (int32_t w = 0; w < n_words; ++w) {
        n_out += bpe_encode_word(h, blob + offs[w],
                                 (int32_t)(offs[w + 1] - offs[w]),
                                 out + n_out, max_out - n_out);
    }
    return n_out;
}

}  // extern "C"
