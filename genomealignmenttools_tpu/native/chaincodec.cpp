// Fast chain-format codec (parse + serialize) for genomealignmenttools_tpu.
//
// The chain text format (kent chainFormat.doc) is the toolkit's highest
// -volume I/O: whole-genome chain files reach hundreds of MB with millions
// of delta-encoded block lines.  This native codec parses a whole buffer
// into structure-of-arrays form (header numerics + name table + absolute
// block coordinates) and serializes back byte-identically to kent's
// chainWrite (%1.0f score, size\tdt\tdq rows, trailing blank line).
//
// C ABI, used from Python via ctypes (no pybind11 in this environment).

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <unordered_map>
#include <vector>

extern "C" {

struct ChainArrays {
    // per chain
    int64_t n_chains;
    double* scores;
    int64_t* header_nums;   // [tSize,tStart,tEnd,qSize,qStart,qEnd,id] x n
    uint8_t* q_strands;     // '+' or '-'
    int64_t* name_offsets;  // 2*n+1 offsets into name_blob (tName,qName)
    char* name_blob;
    // blocks, all chains concatenated
    int64_t n_blocks;
    int64_t* block_offsets; // n+1: chain i owns blocks [off[i], off[i+1])
    int64_t* blocks;        // [tStart,tEnd,qStart,qEnd] x n_blocks
    // factorized names: per-chain indices into a deduplicated name table
    // (chain files repeat a handful of chrom names; downstream SoA paths
    // need the factorization anyway, so it is built during the parse)
    int32_t* t_name_ids;    // n
    int32_t* q_name_ids;    // n
    int64_t n_uniq_names;
    int64_t* uniq_name_off; // n_uniq+1 offsets into uniq_name_blob
    char* uniq_name_blob;
    // error reporting
    char error[256];
};

static void set_error(ChainArrays* out, const char* msg, int64_t line) {
    snprintf(out->error, sizeof(out->error), "%s (line %lld)", msg,
             (long long)line);
}

ChainArrays* gat_chain_parse(const char* buf, int64_t len) {
    ChainArrays* out = (ChainArrays*)calloc(1, sizeof(ChainArrays));
    std::vector<double> scores;
    std::vector<int64_t> header_nums;
    std::vector<uint8_t> strands;
    std::vector<int64_t> name_offsets;
    std::string name_blob;
    std::vector<int64_t> block_offsets;
    std::vector<int64_t> blocks;
    std::vector<int32_t> t_name_ids, q_name_ids;
    std::unordered_map<std::string, int32_t> name_id;
    std::vector<std::string> uniq_names;
    auto intern = [&](const char* s, size_t n) -> int32_t {
        std::string key(s, n);
        auto it = name_id.find(key);
        if (it != name_id.end()) return it->second;
        int32_t id = (int32_t)uniq_names.size();
        name_id.emplace(std::move(key), id);
        uniq_names.push_back(std::string(s, n));
        return id;
    };
    block_offsets.push_back(0);

    const char* p = buf;
    const char* end = buf + len;
    int64_t line_no = 0;
    int64_t cur_t = 0, cur_q = 0, expect_t_end = 0, expect_q_end = 0;
    bool in_chain = false;
    int64_t next_id = 1;

    auto skip_ws = [&](const char*& s) {
        while (s < end && (*s == ' ' || *s == '\t')) s++;
    };
    auto parse_int = [&](const char*& s, int64_t& v) -> bool {
        skip_ws(s);
        bool neg = false;
        if (s < end && (*s == '-' || *s == '+')) { neg = (*s == '-'); s++; }
        if (s >= end || *s < '0' || *s > '9') return false;
        int64_t x = 0;
        while (s < end && *s >= '0' && *s <= '9') x = x * 10 + (*s++ - '0');
        v = neg ? -x : x;
        return true;
    };

    while (p < end) {
        line_no++;
        const char* eol = (const char*)memchr(p, '\n', end - p);
        if (!eol) eol = end;
        const char* s = p;
        // skip blank / comment lines
        skip_ws(s);
        if (s >= eol || *s == '#') { p = eol + 1; continue; }
        if (eol - s >= 5 && memcmp(s, "chain", 5) == 0 &&
            (s + 5 == eol || s[5] == ' ' || s[5] == '\t')) {
            if (in_chain && blocks.size() / 4 ==
                    (size_t)block_offsets.back()) {
                set_error(out, "chain with no blocks", line_no);
                return out;
            }
            s += 5;
            // score
            skip_ws(s);
            char* send = nullptr;
            double score = strtod(s, &send);
            if (send == s) { set_error(out, "bad score", line_no); return out; }
            s = send;
            // tName
            skip_ws(s);
            const char* tn = s;
            while (s < eol && *s != ' ' && *s != '\t') s++;
            name_offsets.push_back((int64_t)name_blob.size());
            name_blob.append(tn, s - tn);
            t_name_ids.push_back(intern(tn, s - tn));
            int64_t t_size, t_start, t_end, q_size, q_start, q_end, cid = 0;
            if (!parse_int(s, t_size)) { set_error(out, "bad tSize", line_no); return out; }
            // tStrand
            skip_ws(s);
            if (s >= eol || *s != '+') { set_error(out, "tStrand not +", line_no); return out; }
            s++;
            if (!parse_int(s, t_start) || !parse_int(s, t_end)) {
                set_error(out, "bad t range", line_no); return out;
            }
            // qName
            skip_ws(s);
            const char* qn = s;
            while (s < eol && *s != ' ' && *s != '\t') s++;
            name_offsets.push_back((int64_t)name_blob.size());
            name_blob.append(qn, s - qn);
            q_name_ids.push_back(intern(qn, s - qn));
            if (!parse_int(s, q_size)) { set_error(out, "bad qSize", line_no); return out; }
            skip_ws(s);
            if (s >= eol || (*s != '+' && *s != '-')) {
                set_error(out, "bad qStrand", line_no); return out;
            }
            uint8_t strand = (uint8_t)*s++;
            if (!parse_int(s, q_start) || !parse_int(s, q_end)) {
                set_error(out, "bad q range", line_no); return out;
            }
            if (!parse_int(s, cid)) cid = next_id++;
            if (q_start >= q_end || t_start >= t_end) {
                set_error(out, "end before start", line_no); return out;
            }
            if (q_start < 0 || t_start < 0 || q_end > q_size || t_end > t_size) {
                set_error(out, "coords out of range", line_no); return out;
            }
            scores.push_back(score);
            int64_t h[7] = {t_size, t_start, t_end, q_size, q_start, q_end, cid};
            header_nums.insert(header_nums.end(), h, h + 7);
            strands.push_back(strand);
            if (in_chain) block_offsets.push_back((int64_t)(blocks.size() / 4));
            in_chain = true;
            cur_t = t_start;
            cur_q = q_start;
            expect_t_end = t_end;
            expect_q_end = q_end;
        } else {
            if (!in_chain) { set_error(out, "block outside chain", line_no); return out; }
            int64_t size, dt = -1, dq = -1;
            const char* s2 = s;
            if (!parse_int(s2, size)) { set_error(out, "bad block size", line_no); return out; }
            bool has_gaps = parse_int(s2, dt);
            if (has_gaps && !parse_int(s2, dq)) {
                set_error(out, "expecting 1 or 3 words", line_no); return out;
            }
            blocks.push_back(cur_t);
            blocks.push_back(cur_t + size);
            blocks.push_back(cur_q);
            blocks.push_back(cur_q + size);
            cur_t += size;
            cur_q += size;
            if (has_gaps) {
                cur_t += dt;
                cur_q += dq;
            } else {
                if (cur_t != expect_t_end || cur_q != expect_q_end) {
                    set_error(out, "t/q end mismatch", line_no); return out;
                }
            }
        }
        p = eol + 1;
    }
    if (in_chain) block_offsets.push_back((int64_t)(blocks.size() / 4));
    name_offsets.push_back((int64_t)name_blob.size());

    // move into malloc'd arrays
    out->n_chains = (int64_t)scores.size();
    out->n_blocks = (int64_t)(blocks.size() / 4);
#define COPY(field, vec, type) \
    out->field = (type*)malloc(sizeof(type) * (vec.size() ? vec.size() : 1)); \
    memcpy(out->field, vec.data(), sizeof(type) * vec.size());
    COPY(scores, scores, double);
    COPY(header_nums, header_nums, int64_t);
    COPY(q_strands, strands, uint8_t);
    COPY(name_offsets, name_offsets, int64_t);
    COPY(block_offsets, block_offsets, int64_t);
    COPY(blocks, blocks, int64_t);
    COPY(t_name_ids, t_name_ids, int32_t);
    COPY(q_name_ids, q_name_ids, int32_t);
#undef COPY
    out->name_blob = (char*)malloc(name_blob.size() + 1);
    memcpy(out->name_blob, name_blob.data(), name_blob.size());
    out->name_blob[name_blob.size()] = 0;
    out->n_uniq_names = (int64_t)uniq_names.size();
    out->uniq_name_off =
        (int64_t*)malloc(sizeof(int64_t) * (uniq_names.size() + 1));
    size_t ub = 0;
    for (size_t i = 0; i < uniq_names.size(); ++i) {
        out->uniq_name_off[i] = (int64_t)ub;
        ub += uniq_names[i].size();
    }
    out->uniq_name_off[uniq_names.size()] = (int64_t)ub;
    out->uniq_name_blob = (char*)malloc(ub + 1);
    ub = 0;
    for (size_t i = 0; i < uniq_names.size(); ++i) {
        memcpy(out->uniq_name_blob + ub, uniq_names[i].data(),
               uniq_names[i].size());
        ub += uniq_names[i].size();
    }
    out->uniq_name_blob[ub] = 0;
    return out;
}

void gat_chain_free(ChainArrays* a) {
    if (!a) return;
    free(a->scores);
    free(a->header_nums);
    free(a->q_strands);
    free(a->name_offsets);
    free(a->name_blob);
    free(a->block_offsets);
    free(a->blocks);
    free(a->t_name_ids);
    free(a->q_name_ids);
    free(a->uniq_name_off);
    free(a->uniq_name_blob);
    free(a);
}

// ---------------------------------------------------------------------------
// serialization (chainWrite-exact)
// ---------------------------------------------------------------------------

struct Buffer {
    char* data;
    int64_t len;
    int64_t cap;
};

static void buf_grow(Buffer* b, int64_t extra) {
    if (b->len + extra > b->cap) {
        while (b->len + extra > b->cap) b->cap *= 2;
        b->data = (char*)realloc(b->data, b->cap);
    }
}

static inline void put_int(Buffer* b, int64_t v) {
    buf_grow(b, 24);
    b->len += snprintf(b->data + b->len, 24, "%lld", (long long)v);
}

static inline void put_ch(Buffer* b, char c) {
    buf_grow(b, 1);
    b->data[b->len++] = c;
}

// order: optional permutation (length n_chains) giving the emit order of
// chain records (chainSort without materializing python objects); NULL =
// input order.
char* gat_chain_serialize_ord(
    int64_t n_chains, const double* scores, const int64_t* header_nums,
    const uint8_t* q_strands, const int64_t* name_offsets,
    const char* name_blob, const int64_t* block_offsets,
    const int64_t* blocks, const int64_t* order, int64_t* out_len) {
    Buffer b;
    b.cap = 1 << 20;
    b.len = 0;
    b.data = (char*)malloc(b.cap);
    for (int64_t k = 0; k < n_chains; ++k) {
        int64_t i = order ? order[k] : k;
        const int64_t* h = header_nums + i * 7;
        char head[512];
        int64_t tn_off = name_offsets[2 * i], tn_end = name_offsets[2 * i + 1];
        int64_t qn_off = name_offsets[2 * i + 1], qn_end = name_offsets[2 * i + 2];
        int n = snprintf(head, sizeof(head),
                         "chain %1.0f %.*s %lld + %lld %lld %.*s %lld %c %lld %lld %lld\n",
                         scores[i],
                         (int)(tn_end - tn_off), name_blob + tn_off,
                         (long long)h[0], (long long)h[1], (long long)h[2],
                         (int)(qn_end - qn_off), name_blob + qn_off,
                         (long long)h[3], (char)q_strands[i],
                         (long long)h[4], (long long)h[5], (long long)h[6]);
        buf_grow(&b, n);
        memcpy(b.data + b.len, head, n);
        b.len += n;
        int64_t lo = block_offsets[i], hi = block_offsets[i + 1];
        for (int64_t j = lo; j < hi; ++j) {
            const int64_t* blk = blocks + j * 4;
            put_int(&b, blk[1] - blk[0]);
            if (j + 1 < hi) {
                const int64_t* nxt = blocks + (j + 1) * 4;
                put_ch(&b, '\t');
                put_int(&b, nxt[0] - blk[1]);
                put_ch(&b, '\t');
                put_int(&b, nxt[2] - blk[3]);
            }
            put_ch(&b, '\n');
        }
        put_ch(&b, '\n');
    }
    *out_len = b.len;
    return b.data;
}

char* gat_chain_serialize(
    int64_t n_chains, const double* scores, const int64_t* header_nums,
    const uint8_t* q_strands, const int64_t* name_offsets,
    const char* name_blob, const int64_t* block_offsets,
    const int64_t* blocks, int64_t* out_len) {
    return gat_chain_serialize_ord(n_chains, scores, header_nums, q_strands,
                                   name_offsets, name_blob, block_offsets,
                                   blocks, nullptr, out_len);
}

void gat_free_buffer(char* p) { free(p); }

}  // extern "C"
