// Native GBNF grammar engine — C++ implementation of the pushdown-automaton
// token filter, the host-side hot loop of grammar-constrained sampling.
//
// Capability mirror of reference src/llama-grammar.cpp (which is C++ for the
// same reason): llama_grammar_advance_stack (:688), llama_grammar_accept
// (:826), llama_grammar_reject_candidates_for_stack (:851),
// llama_grammar_match_partial_char (:637). The Python engine in
// grammar/gbnf.py is the semantics oracle; this module must match it
// bit-for-bit (tests/test_native_grammar.py cross-checks).
//
// C ABI (ctypes): rules are shipped as flat int32 (type, value) pairs.

#include <cstdint>
#include <cstring>
#include <vector>
#include <set>
#include <algorithm>

namespace {

enum EType : int32_t {
    END = 0, ALT = 1, RULE_REF = 2, CHAR = 3, CHAR_NOT = 4,
    CHAR_RNG_UPPER = 5, CHAR_ALT = 6, CHAR_ANY = 7,
};

struct Element { int32_t type, value; };
struct Pos { int32_t rule, idx; };
inline bool operator<(const Pos &a, const Pos &b) {
    return a.rule != b.rule ? a.rule < b.rule : a.idx < b.idx;
}
inline bool operator==(const Pos &a, const Pos &b) {
    return a.rule == b.rule && a.idx == b.idx;
}

using Stack = std::vector<Pos>;

struct Grammar {
    std::vector<std::vector<Element>> rules;
    int32_t root = 0;
    std::vector<Stack> stacks;
    uint32_t partial_value = 0;
    int32_t partial_remain = 0;
};

inline const Element &el(const Grammar &g, Pos p) { return g.rules[p.rule][p.idx]; }
inline bool is_end(const Element &e) { return e.type == END || e.type == ALT; }

void push_unique(std::vector<Stack> &out, Stack &&s) {
    if (std::find(out.begin(), out.end(), s) == out.end()) out.push_back(std::move(s));
}

// llama_grammar_advance_stack (:688)
void advance_stack(const Grammar &g, const Stack &stack, std::vector<Stack> &out) {
    if (stack.empty()) { push_unique(out, Stack(stack)); return; }
    Pos pos = stack.back();
    const Element &e = el(g, pos);
    if (e.type == RULE_REF) {
        const auto &rule = g.rules[e.value];
        size_t i = 0;
        for (;;) {
            Stack ns(stack.begin(), stack.end() - 1);
            Pos nxt{pos.rule, pos.idx + 1};
            if (!is_end(el(g, nxt))) ns.push_back(nxt);
            if (!is_end(rule[i])) ns.push_back(Pos{e.value, (int32_t)i});
            advance_stack(g, ns, out);
            while (!is_end(rule[i])) i++;
            if (rule[i].type == ALT) i++; else break;
        }
    } else {
        // CHAR / CHAR_NOT / CHAR_ANY terminate descent
        push_unique(out, Stack(stack));
    }
}

// llama_grammar_match_char (:600)
bool match_char(const Grammar &g, Pos pos, uint32_t chr, Pos *after) {
    const auto &rule = g.rules[pos.rule];
    int32_t i = pos.idx;
    bool is_positive = rule[i].type == CHAR || rule[i].type == CHAR_ANY;
    bool found = false;
    for (;;) {
        const Element &e = rule[i];
        if ((size_t)(i + 1) < rule.size() && rule[i + 1].type == CHAR_RNG_UPPER) {
            if ((uint32_t)e.value <= chr && chr <= (uint32_t)rule[i + 1].value) found = true;
            i += 2;
        } else if (e.type == CHAR_ANY) {
            found = true; i += 1;
        } else {
            if ((uint32_t)e.value == chr) found = true;
            i += 1;
        }
        if (rule[i].type != CHAR_ALT) break;
    }
    if (after) *after = Pos{pos.rule, i};
    return found == is_positive;
}

// llama_grammar_match_partial_char (:637)
bool match_partial_char(const Grammar &g, Pos pos, uint32_t value, int32_t n_remain) {
    const auto &rule = g.rules[pos.rule];
    int32_t i = pos.idx;
    bool is_positive = rule[i].type == CHAR || rule[i].type == CHAR_ANY;
    if (n_remain < 0 || (n_remain == 1 && value < 2)) return false;
    uint64_t low = (uint64_t)value << (n_remain * 6);
    uint64_t high = low | (((uint64_t)1 << (n_remain * 6)) - 1);
    if (low == 0) {
        if (n_remain == 2) low = 1u << 11;
        else if (n_remain == 3) low = 1u << 16;
    }
    for (;;) {
        const Element &e = rule[i];
        if ((size_t)(i + 1) < rule.size() && rule[i + 1].type == CHAR_RNG_UPPER) {
            if ((uint64_t)(uint32_t)e.value <= high && low <= (uint64_t)(uint32_t)rule[i + 1].value)
                return is_positive;
            i += 2;
        } else if (e.type == CHAR_ANY) {
            return true;
        } else {
            if (low <= (uint64_t)(uint32_t)e.value && (uint64_t)(uint32_t)e.value <= high)
                return is_positive;
            i += 1;
        }
        if (rule[i].type != CHAR_ALT) return !is_positive;
    }
}

// llama_grammar_accept (:826)
void accept_char(Grammar &g, uint32_t chr) {
    std::vector<Stack> new_stacks;
    for (const auto &stack : g.stacks) {
        if (stack.empty()) continue;
        Pos after;
        if (match_char(g, stack.back(), chr, &after)) {
            Stack ns(stack.begin(), stack.end() - 1);
            if (!is_end(el(g, after))) ns.push_back(after);
            advance_stack(g, ns, new_stacks);
        }
    }
    g.stacks = std::move(new_stacks);
}

// decode_utf8 with partial carry (llama_decode_utf8 equivalent)
void decode_utf8(const uint8_t *p, size_t n, uint32_t &pv, int32_t &pr,
                 std::vector<uint32_t> &out) {
    uint32_t value = pv;
    int32_t remain = pr;
    for (size_t k = 0; k < n; k++) {
        uint8_t b = p[k];
        if (remain > 0) {
            value = (value << 6) | (b & 0x3F);
            if (--remain == 0) out.push_back(value);
        } else if ((b & 0x80) == 0) {
            out.push_back(b);
        } else if ((b & 0xE0) == 0xC0) { value = b & 0x1F; remain = 1; }
        else if ((b & 0xF0) == 0xE0) { value = b & 0x0F; remain = 2; }
        else if ((b & 0xF8) == 0xF0) { value = b & 0x07; remain = 3; }
        else { out.push_back(0xFFFD); }
    }
    pv = remain ? value : 0;
    pr = remain;
}

struct Candidate {
    int32_t idx;
    const uint32_t *cps; // full codepoint array
    int32_t off, n;
    uint32_t pv; int32_t pr;
};

// llama_grammar_reject_candidates_for_stack (:851)
void reject_for_stack(const Grammar &g, const Stack &stack,
                      const std::vector<Candidate> &candidates,
                      std::vector<Candidate> &rejects) {
    if (stack.empty()) {
        for (const auto &c : candidates)
            if (c.off < c.n || c.pr != 0) rejects.push_back(c);
        return;
    }
    Pos sp = stack.back();
    std::vector<Candidate> next;
    for (const auto &c : candidates) {
        if (c.off >= c.n) {
            if (c.pr != 0 && !match_partial_char(g, sp, c.pv, c.pr))
                rejects.push_back(c);
        } else if (match_char(g, sp, c.cps[c.off], nullptr)) {
            Candidate nc = c; nc.off += 1; next.push_back(nc);
        } else {
            rejects.push_back(c);
        }
    }
    Pos after;
    match_char(g, sp, 0, &after);
    Stack stack_after(stack.begin(), stack.end() - 1);
    if (!is_end(el(g, after))) stack_after.push_back(after);
    std::vector<Stack> next_stacks;
    advance_stack(g, stack_after, next_stacks);

    // reject over next_stacks (llama_grammar_reject_candidates :887)
    if (!next.empty()) {
        std::vector<Candidate> r;
        reject_for_stack(g, next_stacks.empty() ? Stack{} : next_stacks[0], next, r);
        for (size_t s = 1; s < next_stacks.size(); s++) {
            std::vector<Candidate> r2;
            reject_for_stack(g, next_stacks[s], r, r2);
            r = std::move(r2);
        }
        for (auto c : r) { c.off -= 1; rejects.push_back(c); }
    }
}

} // namespace

extern "C" {

// rules_flat: concatenated (type, value) int32 pairs; offsets[nr+1] in pairs
void *gm_create(const int32_t *rules_flat, const int32_t *offsets,
                int32_t n_rules, int32_t root) {
    auto *g = new Grammar();
    g->root = root;
    g->rules.resize(n_rules);
    for (int32_t r = 0; r < n_rules; r++) {
        int32_t a = offsets[r], b = offsets[r + 1];
        g->rules[r].reserve(b - a);
        for (int32_t i = a; i < b; i++)
            g->rules[r].push_back(Element{rules_flat[2 * i], rules_flat[2 * i + 1]});
    }
    // init stacks (llama_grammar_init_impl)
    const auto &rule = g->rules[root];
    size_t i = 0;
    for (;;) {
        Stack stack;
        if (!is_end(rule[i])) stack.push_back(Pos{root, (int32_t)i});
        advance_stack(*g, stack, g->stacks);
        while (!is_end(rule[i])) i++;
        if (rule[i].type == ALT) i++; else break;
    }
    return g;
}

void gm_free(void *h) { delete (Grammar *)h; }

void *gm_clone(void *h) { return new Grammar(*(Grammar *)h); }

int32_t gm_n_stacks(void *h) { return (int32_t)((Grammar *)h)->stacks.size(); }

void gm_accept_piece(void *h, const uint8_t *piece, int32_t n) {
    auto *g = (Grammar *)h;
    std::vector<uint32_t> cps;
    decode_utf8(piece, n, g->partial_value, g->partial_remain, cps);
    for (uint32_t cp : cps) accept_char(*g, cp);
}

// pieces: concatenated candidate byte strings; piece_offsets[n+1];
// out_reject: uint8[n] set to 1 for rejected candidates.
void gm_reject_candidates(void *h, const uint8_t *pieces,
                          const int32_t *piece_offsets, int32_t n,
                          uint8_t *out_reject) {
    auto *g = (Grammar *)h;
    memset(out_reject, 0, n);
    if (g->stacks.empty()) { memset(out_reject, 1, n); return; }

    // decode every candidate once (shared across stacks)
    std::vector<std::vector<uint32_t>> cp_store(n);
    std::vector<Candidate> candidates;
    candidates.reserve(n);
    for (int32_t i = 0; i < n; i++) {
        int32_t a = piece_offsets[i], b = piece_offsets[i + 1];
        if (a == b) continue;  // empty pieces are never rejected here
        uint32_t pv = g->partial_value; int32_t pr = g->partial_remain;
        decode_utf8(pieces + a, b - a, pv, pr, cp_store[i]);
        Candidate c{i, cp_store[i].data(), 0, (int32_t)cp_store[i].size(), pv, pr};
        candidates.push_back(c);
    }
    std::vector<Candidate> rejects;
    reject_for_stack(*g, g->stacks[0], candidates, rejects);
    for (size_t s = 1; s < g->stacks.size(); s++) {
        std::vector<Candidate> r2;
        reject_for_stack(*g, g->stacks[s], rejects, r2);
        rejects = std::move(r2);
    }
    for (const auto &c : rejects) out_reject[c.idx] = 1;
}

} // extern "C"
