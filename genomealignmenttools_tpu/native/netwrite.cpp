// Native net-format writer for the native sweep's node arrays.
//
// Replaces the python walk in engines/chain_net.py NativeNetTree
// .output_side (rOutputFill/fillOut/rOutputGap, src/chainNet/chainNet.c:
// 858-896 + subchainInfo 795-843): per-fill subSize/subScore arithmetic,
// min-score subtree pruning, and text formatting all happen here.  The
// python layer passes an optional per-node score override (the batched
// -rescore results); everything else (fake subset score ratio
// chain.c:552-555, full-cover pass-through) is computed in place.

#include <cmath>
#include <cstdarg>
#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>

namespace {

struct Buf {
    char* p = nullptr;
    int64_t len = 0, cap = 0;
    void ensure(int64_t extra) {
        if (len + extra <= cap) return;
        int64_t ncap = cap ? cap * 2 : (1 << 20);
        while (ncap < len + extra) ncap *= 2;
        p = (char*)realloc(p, ncap);
        cap = ncap;
    }
    void add(const char* s, int64_t n) {
        ensure(n);
        std::memcpy(p + len, s, n);
        len += n;
    }
    void addf(const char* fmt, ...) {
        ensure(256);
        va_list ap;
        va_start(ap, fmt);
        len += vsnprintf(p + len, 256, fmt, ap);
        va_end(ap);
    }
    void indent(int64_t depth) {
        ensure(depth);
        std::memset(p + len, ' ', depth);
        len += depth;
    }
};

}  // namespace

extern "C" {

// Serialize one net side.  Returns a malloc'd buffer (caller frees via
// gat_free_buffer) and sets *out_len.
//
//   nodes   (n_nodes, 7) int64 [is_gap, depth, s, e, os, oe, cidx]
//   segs    (n_segs, 3) int64 [chrom_idx, lo, hi]
//   chrom_blob/chrom_off (n_segs+1-offset style): this side's chrom names
//   chrom_sizes          per chrom
//   oname_blob/oname_off other-side chrom name per chain
//   strands  'q strand' char per chain; ids, scores per chain
//   headers  (n_chains, 5) int64 [t_start, t_end, q_start, q_end, q_size]
//   blocks   (n_blocks, 4) int64; chain_off (n_chains+1)
//   score_override  per NODE double, NaN = compute here (rescore hook)
char* gat_net_write(
    const int64_t* nodes, int64_t n_nodes,
    const int64_t* segs, int64_t n_segs,
    const char* chrom_blob, const int64_t* chrom_off,
    const int64_t* chrom_sizes,
    const char* oname_blob, const int64_t* oname_off,
    const uint8_t* strands, const int64_t* ids, const double* scores,
    const int64_t* headers,
    const int64_t* blocks, const int64_t* chain_off, int64_t n_chains,
    const double* score_override,
    double min_score, int64_t min_fill, int is_q,
    int64_t* out_len) {
    (void)n_nodes;
    Buf buf;
    // per-chain prefix aligned-length sums (t and q block lengths are
    // identical - gapless blocks), lazily shared across fills
    int64_t total_blocks = chain_off[n_chains];
    int64_t* pref = (int64_t*)malloc((total_blocks + n_chains + 1) * 8);
    // pref laid out per chain with a leading 0: pref_base[ci] = chain_off[ci]+ci
    for (int64_t ci = 0; ci < n_chains; ++ci) {
        int64_t* pp = pref + chain_off[ci] + ci;
        pp[0] = 0;
        const int64_t* b = blocks + chain_off[ci] * 4;
        int64_t nb = chain_off[ci + 1] - chain_off[ci];
        for (int64_t j = 0; j < nb; ++j)
            pp[j + 1] = pp[j] + (b[j * 4 + 1] - b[j * 4]);
    }

    for (int64_t si = 0; si < n_segs; ++si) {
        int64_t ci_chrom = segs[si * 3 + 0];
        int64_t lo = segs[si * 3 + 1], hi = segs[si * 3 + 2];
        buf.addf("net ");
        buf.add(chrom_blob + chrom_off[ci_chrom],
                chrom_off[ci_chrom + 1] - chrom_off[ci_chrom]);
        buf.addf(" %lld\n", (long long)chrom_sizes[ci_chrom]);
        int64_t i = lo;
        while (i < hi) {
            const int64_t* nd = nodes + i * 7;
            int64_t is_gap = nd[0], depth = nd[1], s = nd[2], e = nd[3];
            int64_t os = nd[4], oe = nd[5], cidx = nd[6];
            const char* on = oname_blob + oname_off[cidx];
            int64_t on_len = oname_off[cidx + 1] - oname_off[cidx];
            char strand = (char)strands[cidx];
            if (is_gap) {
                buf.indent(depth);
                buf.addf("gap %lld %lld ", (long long)s, (long long)(e - s));
                buf.add(on, on_len);
                buf.addf(" %c %lld %lld\n", strand, (long long)os,
                         (long long)(oe - os));
                ++i;
                continue;
            }
            // subchainInfo (chainNet.c:795-843)
            const int64_t* h = headers + cidx * 5;
            const int64_t* b = blocks + chain_off[cidx] * 4;
            const int64_t* pp = pref + chain_off[cidx] + cidx;
            int64_t nb = chain_off[cidx + 1] - chain_off[cidx];
            int64_t full_size = pp[nb];
            int64_t fs = s, fe = e;
            int col;  // block start column for this side
            int64_t c_lo, c_hi;
            if (is_q) {
                if (strand == '-') {
                    fs = h[4] - e;
                    fe = h[4] - s;
                }
                c_lo = h[2];
                c_hi = h[3];
                col = 2;
            } else {
                c_lo = h[0];
                c_hi = h[1];
                col = 0;
            }
            int64_t sub_size;
            double sub_score;
            if (fs <= c_lo && fe >= c_hi) {
                sub_size = full_size;
                sub_score = scores[cidx];
            } else {
                // blocks overlapping [fs, fe): first with end > fs,
                // first with start >= fe (cols ascending, disjoint)
                int64_t j1 = 0, j2 = nb, lo_b = 0, hi_b = nb;
                while (lo_b < hi_b) {
                    int64_t mid = (lo_b + hi_b) >> 1;
                    if (b[mid * 4 + col + 1] > fs) hi_b = mid;
                    else lo_b = mid + 1;
                }
                j1 = lo_b;
                lo_b = j1; hi_b = nb;
                while (lo_b < hi_b) {
                    int64_t mid = (lo_b + hi_b) >> 1;
                    if (b[mid * 4 + col] >= fe) hi_b = mid;
                    else lo_b = mid + 1;
                }
                j2 = lo_b;
                sub_size = pp[j2] - pp[j1];
                if (j2 > j1) {
                    if (b[j1 * 4 + col] < fs)
                        sub_size -= fs - b[j1 * 4 + col];
                    if (b[(j2 - 1) * 4 + col + 1] > fe)
                        sub_size -= b[(j2 - 1) * 4 + col + 1] - fe;
                }
                double ov = score_override ? score_override[i] : NAN;
                if (!std::isnan(ov)) {
                    sub_score = ov <= 0 ? 1.0 : ov;
                } else {
                    sub_score = scores[cidx] * (double)sub_size
                                / (double)full_size;
                }
            }
            if (sub_score >= min_score && sub_size >= min_fill) {
                buf.indent(depth);
                buf.addf("fill %lld %lld ", (long long)s, (long long)(e - s));
                buf.add(on, on_len);
                buf.addf(" %c %lld %lld id %lld score %.0f ali %lld\n",
                         strand, (long long)os, (long long)(oe - os),
                         (long long)ids[cidx], sub_score,
                         (long long)sub_size);
                ++i;
            } else {
                int64_t j = i + 1;
                while (j < hi && nodes[j * 7 + 1] > depth) ++j;
                i = j;
            }
        }
    }
    free(pref);
    *out_len = buf.len;
    return buf.p;
}

}  // extern "C"
