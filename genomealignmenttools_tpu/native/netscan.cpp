// Fast net-text scan for chainCleaner's break finding.
//
// Tokenizes a net file (hg/lib/chainNet.c cnFillRead:152-185 line format:
// depth = leading spaces, "fill|gap tStart tSize qName qStrand qStart
// qSize [tag value]...") into flat arrays of just the fields the cleaner
// needs (chainCleaner.c parseFill:786-860 reads depth/tStart/tSize/
// chainId only).  The full Python parser (formats/net.py) stays for tools
// that need every tag.
//
// Output per node: depth, t_start, t_size, chain_id (0 = gap), net_idx.
// Net headers are returned as a name blob + offsets.

#include <cstdint>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <vector>

namespace {

inline int64_t parse_int(const char*& p) {
  while (*p == ' ') ++p;
  bool neg = *p == '-';
  if (neg) ++p;
  int64_t v = 0;
  while (*p >= '0' && *p <= '9') v = v * 10 + (*p++ - '0');
  return neg ? -v : v;
}

inline void skip_word(const char*& p) {
  while (*p == ' ') ++p;
  while (*p && *p != ' ' && *p != '\n') ++p;
}

}  // namespace

extern "C" {

struct GatNetScan {
  int64_t n_nodes;
  const int64_t* nodes;  // (n_nodes, 5): depth, t_start, t_size, id, net
  int64_t n_nets;
  const char* name_blob;
  const int64_t* name_off;  // n_nets+1
  char error[256];
  void* state;
};

struct NetScanState {
  std::vector<int64_t> nodes;
  std::vector<char> names;
  std::vector<int64_t> name_off;
};

GatNetScan* gat_net_scan(const char* buf, int64_t len) {
  auto* res = new GatNetScan();
  std::memset(res->error, 0, sizeof(res->error));
  auto* st = new NetScanState();
  res->state = st;
  st->name_off.push_back(0);

  const char* p = buf;
  const char* end = buf + len;
  int64_t net_idx = -1;
  while (p < end) {
    const char* line_end = static_cast<const char*>(
        std::memchr(p, '\n', end - p));
    if (!line_end) line_end = end;
    if (p == line_end || *p == '#') {  // blank / meta
      p = line_end + 1;
      continue;
    }
    if (*p != ' ') {
      // "net NAME SIZE"
      if (std::strncmp(p, "net ", 4) != 0) {
        std::snprintf(res->error, sizeof(res->error),
                      "expecting net line");
        return res;
      }
      const char* q = p + 4;
      const char* name_start = q;
      while (q < line_end && *q != ' ') ++q;
      st->names.insert(st->names.end(), name_start, q);
      st->name_off.push_back((int64_t)st->names.size());
      ++net_idx;
      p = line_end + 1;
      continue;
    }
    int64_t depth = 0;
    while (*p == ' ') { ++depth; ++p; }
    bool is_fill = p[0] == 'f';  // "fill" vs "gap"
    skip_word(p);                // kind
    int64_t t_start = parse_int(p);
    int64_t t_size = parse_int(p);
    skip_word(p);  // qName
    skip_word(p);  // qStrand
    parse_int(p);  // qStart
    parse_int(p);  // qSize
    int64_t id = 0;
    if (is_fill) {
      // scan tag/value pairs for "id"; a fill without an id cannot be
      // used for break finding - flag it (-1) so the caller can error
      // instead of silently treating it as a gap
      id = -1;
      while (p < line_end) {
        while (*p == ' ') ++p;
        if (p >= line_end) break;
        if (p[0] == 'i' && p[1] == 'd' && p[2] == ' ') {
          p += 3;
          id = parse_int(p);
          break;
        }
        skip_word(p);  // tag
        skip_word(p);  // value
      }
    }
    st->nodes.insert(st->nodes.end(),
                     {depth, t_start, t_size, id, net_idx});
    p = line_end + 1;
  }
  res->n_nodes = (int64_t)st->nodes.size() / 5;
  res->nodes = st->nodes.data();
  res->n_nets = (int64_t)st->name_off.size() - 1;
  res->name_blob = st->names.data();
  res->name_off = st->name_off.data();
  return res;
}

void gat_net_scan_free(GatNetScan* res) {
  if (!res) return;
  delete static_cast<NetScanState*>(res->state);
  delete res;
}

}  // extern "C"
