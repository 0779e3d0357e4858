// Native BPE core: merge-rank byte-pair encoding over raw bytes.
//
// The reference's tokenizer is native code (Zig + POSIX regex, bpe.zig); this
// is the framework's host-native equivalent: the O(n^2) merge loop — the hot
// part of encoding — in C++, exposed through a C ABI consumed via ctypes
// (zig_gpt2_tpu/native/__init__.py). Pre-tokenization (the \p{L}/\p{N}
// unicode regex) stays in Python where the `regex` module implements OpenAI's
// exact pattern — splitting the work this way keeps byte-exact parity with
// the pure-Python encoder (tests/test_native.py) while removing the
// per-word merge loop from the interpreter.
//
// Everything operates on BYTE-space token strings: Python maps the GPT-2
// unicode-space vocab (encoder.json) back through the byte<->unicode table
// (download_weights.py:68-90 in the reference) before initialization, so no
// unicode handling exists here at all.
//
// Build: make -C native   (g++ -O2 -shared; no external dependencies)

#include <cstdint>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

namespace {

struct PairHash {
    size_t operator()(const std::pair<std::string, std::string>& p) const {
        std::hash<std::string> h;
        size_t a = h(p.first), b = h(p.second);
        return a ^ (b + 0x9e3779b97f4a7c15ULL + (a << 6) + (a >> 2));
    }
};

struct Encoder {
    std::unordered_map<std::string, int32_t> vocab;           // bytes -> id
    std::vector<std::string> id_to_token;                     // id -> bytes
    std::unordered_map<std::pair<std::string, std::string>, int32_t, PairHash>
        ranks;                                                // merge ranks
};

// Apply the lowest-rank merge repeatedly: the standard BPE loop
// (reference quirk note: bpe.zig:81-92 uses greedy longest-prefix instead;
// this implements the true merge-rank algorithm, like tiktoken).
void bpe_word(const Encoder& enc, const uint8_t* data, size_t len,
              std::vector<std::string>& parts) {
    parts.clear();
    parts.reserve(len);
    for (size_t i = 0; i < len; ++i)
        parts.emplace_back(1, static_cast<char>(data[i]));
    while (parts.size() > 1) {
        int32_t best_rank = INT32_MAX;
        size_t best_i = 0;
        for (size_t i = 0; i + 1 < parts.size(); ++i) {
            auto it = enc.ranks.find({parts[i], parts[i + 1]});
            if (it != enc.ranks.end() && it->second < best_rank) {
                best_rank = it->second;
                best_i = i;
            }
        }
        if (best_rank == INT32_MAX) break;
        // Merge ALL occurrences of the best pair left-to-right (matches the
        // reference Python algorithm's behavior of fusing every adjacent
        // occurrence in one pass).
        std::vector<std::string> merged;
        merged.reserve(parts.size());
        const std::string& l = parts[best_i];
        const std::string& r = parts[best_i + 1];
        for (size_t i = 0; i < parts.size();) {
            if (i + 1 < parts.size() && parts[i] == l && parts[i + 1] == r) {
                merged.push_back(l + r);
                i += 2;
            } else {
                merged.push_back(parts[i]);
                i += 1;
            }
        }
        parts.swap(merged);
    }
}

}  // namespace

extern "C" {

// vocab: n_tokens byte strings, concatenated in `tok_bytes` with exclusive
// end offsets `tok_offsets[i]`; token i's id is its index.
// merges: n_merges pairs, each side likewise offset-indexed into mrg_bytes
// (2*n_merges offsets, alternating left end / right end).
void* zg2_bpe_create(const uint8_t* tok_bytes, const int64_t* tok_offsets,
                     int64_t n_tokens, const uint8_t* mrg_bytes,
                     const int64_t* mrg_offsets, int64_t n_merges) {
    auto* enc = new Encoder();
    enc->id_to_token.reserve(n_tokens);
    int64_t start = 0;
    for (int64_t i = 0; i < n_tokens; ++i) {
        std::string tok(reinterpret_cast<const char*>(tok_bytes) + start,
                        tok_offsets[i] - start);
        enc->vocab.emplace(tok, static_cast<int32_t>(i));
        enc->id_to_token.push_back(std::move(tok));
        start = tok_offsets[i];
    }
    start = 0;
    for (int64_t i = 0; i < n_merges; ++i) {
        std::string l(reinterpret_cast<const char*>(mrg_bytes) + start,
                      mrg_offsets[2 * i] - start);
        std::string r(reinterpret_cast<const char*>(mrg_bytes) + mrg_offsets[2 * i],
                      mrg_offsets[2 * i + 1] - mrg_offsets[2 * i]);
        enc->ranks.emplace(std::make_pair(std::move(l), std::move(r)),
                           static_cast<int32_t>(i));
        start = mrg_offsets[2 * i + 1];
    }
    return enc;
}

void zg2_bpe_destroy(void* handle) { delete static_cast<Encoder*>(handle); }

// Encode pre-tokenized words (byte spans). out_ids must hold the worst case
// (total input bytes); returns the number of ids written, or -1 if any piece
// is missing from the vocab (caller falls back to Python for that input).
int64_t zg2_bpe_encode_words(void* handle, const uint8_t* words_bytes,
                             const int64_t* word_offsets, int64_t n_words,
                             int32_t* out_ids) {
    auto* enc = static_cast<Encoder*>(handle);
    std::vector<std::string> parts;
    int64_t out = 0, start = 0;
    for (int64_t w = 0; w < n_words; ++w) {
        int64_t end = word_offsets[w];
        bpe_word(*enc, words_bytes + start, static_cast<size_t>(end - start), parts);
        for (const auto& p : parts) {
            auto it = enc->vocab.find(p);
            if (it == enc->vocab.end()) return -1;
            out_ids[out++] = it->second;
        }
        start = end;
    }
    return out;
}

// Decode ids to bytes. Returns bytes written, or -1 if out_cap is too small
// or an id is out of range (caller retries with a bigger buffer / falls
// back).
int64_t zg2_bpe_decode(void* handle, const int32_t* ids, int64_t n_ids,
                       uint8_t* out_bytes, int64_t out_cap) {
    auto* enc = static_cast<Encoder*>(handle);
    int64_t out = 0;
    for (int64_t i = 0; i < n_ids; ++i) {
        if (ids[i] < 0 ||
            static_cast<size_t>(ids[i]) >= enc->id_to_token.size())
            return -1;
        const std::string& tok = enc->id_to_token[ids[i]];
        if (out + static_cast<int64_t>(tok.size()) > out_cap) return -1;
        std::memcpy(out_bytes + out, tok.data(), tok.size());
        out += tok.size();
    }
    return out;
}

}  // extern "C"
