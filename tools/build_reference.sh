#!/usr/bin/env bash
# Build the reference C binaries (hillerlab GenomeAlignmentTools + the
# trimmed kent tree it vendors) from /root/reference into
# /root/repo/.ref_build, without touching the read-only reference mirror.
#
# Produces:
#   .ref_build/bin/        chainCleaner chainNet scoreChain (hillerlab src/)
#                          + symlinked perl/python drivers
#   .ref_build/kent/bin/   the stock kent mouseStuff tools (chainSort, ...)
#
# The build environment has no openssl headers/static libs, no libnsl and
# no static libc, so we: (a) drop in minimal openssl stub headers (the only
# users are lib/https.c, lib/hmac.c, lib/udc.c, none of which are on any
# chain/net code path); (b) provide empty stub archives for -lssl -lcrypto
# -lnsl -lcrypt; (c) strip -static; (d) compile with -fcommon (gcc>=10
# defaults to -fno-common, old kent code has duplicate tentative defs).
set -euo pipefail

REF=${REF:-/root/reference}
OUT=${OUT:-/root/repo/.ref_build}
JOBS=${JOBS:-$(nproc)}
SRC=$OUT/srccopy

mkdir -p "$OUT"

# ---------------------------------------------------------------- sources
if [ ! -d "$SRC/kent" ]; then
  echo ">> copying reference sources"
  mkdir -p "$SRC"
  cp -r "$REF/kent" "$SRC/kent"
  cp -r "$REF/src" "$SRC/src"
  chmod -R u+w "$SRC"
fi

# ------------------------------------------------------- openssl stubs
STUB=$OUT/sslstub
mkdir -p "$STUB/openssl" "$OUT/stublib"
cat > "$STUB/openssl/stub_common.h" <<'EOF'
/* Minimal openssl stand-ins so the kent tree compiles without openssl
   headers.  Only lib/https.c, lib/hmac.c and lib/udc.c include these;
   none of the chain/net tools exercise those paths at runtime. */
#ifndef GAT_SSL_STUB_H
#define GAT_SSL_STUB_H
#include <stdio.h>
#include <string.h>
#define OPENSSL_VERSION_NUMBER 0x1010100fL
typedef struct gat_stub_ssl SSL;
typedef struct gat_stub_ssl_ctx SSL_CTX;
typedef struct gat_stub_ssl_method SSL_METHOD;
typedef struct gat_stub_bio BIO;
typedef struct gat_stub_evp_md EVP_MD;
#define SSL_MODE_AUTO_RETRY 0
#define BIO_NOCLOSE 0
#define SHA_DIGEST_LENGTH 20
static inline int SSL_library_init(void) { return 1; }
static inline void ERR_load_crypto_strings(void) {}
static inline void ERR_load_SSL_strings(void) {}
static inline void OpenSSL_add_all_algorithms(void) {}
static inline void SSL_add_all_algorithms(void) {}
static inline const SSL_METHOD *SSLv23_client_method(void) { return 0; }
static inline SSL_CTX *SSL_CTX_new(const SSL_METHOD *m) { (void)m; return 0; }
static inline int SSL_CTX_load_verify_locations(SSL_CTX *c, const char *f,
                                                const char *p)
{ (void)c; (void)f; (void)p; return 0; }
static inline void SSL_CTX_set_verify_depth(SSL_CTX *c, int d)
{ (void)c; (void)d; }
static inline long SSL_set_mode(SSL *s, long m) { (void)s; return m; }
static inline long SSL_set_tlsext_host_name(SSL *s, const char *n)
{ (void)s; (void)n; return 0; }
static inline BIO *BIO_new_socket(int fd, int flag)
{ (void)fd; (void)flag; return 0; }
static inline BIO *BIO_new_ssl(SSL_CTX *c, int client)
{ (void)c; (void)client; return 0; }
static inline BIO *BIO_push(BIO *a, BIO *b) { (void)b; return a; }
static inline long BIO_get_ssl(BIO *b, SSL **sslp)
{ (void)b; if (sslp) *sslp = 0; return 0; }
static inline long BIO_set_nbio(BIO *b, int on) { (void)b; (void)on; return 0; }
static inline long BIO_do_handshake(BIO *b) { (void)b; return -1; }
static inline int BIO_should_retry(BIO *b) { (void)b; return 0; }
static inline int BIO_should_read(BIO *b) { (void)b; return 0; }
static inline int BIO_should_write(BIO *b) { (void)b; return 0; }
static inline int BIO_should_io_special(BIO *b) { (void)b; return 0; }
static inline int BIO_get_fd(BIO *b, int *fdp)
{ (void)b; if (fdp) *fdp = -1; return -1; }
static inline int BIO_read(BIO *b, void *buf, int n)
{ (void)b; (void)buf; (void)n; return -1; }
static inline int BIO_write(BIO *b, const void *buf, int n)
{ (void)b; (void)buf; (void)n; return -1; }
static inline void BIO_free_all(BIO *b) { (void)b; }
static inline unsigned long ERR_get_error(void) { return 0; }
static inline const char *ERR_reason_error_string(unsigned long e)
{ (void)e; return "openssl stubbed out"; }
static inline void ERR_print_errors_fp(FILE *fp) { (void)fp; }
#define CRYPTO_LOCK 1
static inline int CRYPTO_num_locks(void) { return 1; }
static inline void CRYPTO_set_id_callback(unsigned long (*f)(void)) { (void)f; }
static inline void CRYPTO_set_locking_callback(
    void (*f)(int, int, const char *, int)) { (void)f; }
static inline const EVP_MD *EVP_sha1(void) { return 0; }
static inline const EVP_MD *EVP_md5(void) { return 0; }
static inline const EVP_MD *EVP_sha224(void) { return 0; }
static inline const EVP_MD *EVP_sha512(void) { return 0; }
static inline unsigned char *HMAC(const EVP_MD *md, const void *key,
                                  int keylen, const unsigned char *data,
                                  size_t datalen, unsigned char *out,
                                  unsigned int *outlen)
{ (void)md; (void)key; (void)keylen; (void)data; (void)datalen;
  (void)outlen;
  static unsigned char zeros[64];
  return out ? (memset(out, 0, 20), out) : zeros; }
static inline unsigned char *SHA1(const unsigned char *d, size_t n,
                                  unsigned char *md)
{ /* djb2 repeated: NOT cryptographic, only used for udc cache names */
  static unsigned char buf[SHA_DIGEST_LENGTH];
  unsigned char *o = md ? md : buf;
  unsigned long h = 5381; size_t i;
  for (i = 0; i < n; i++) h = ((h << 5) + h) ^ d[i];
  for (i = 0; i < SHA_DIGEST_LENGTH; i++)
    { h = ((h << 5) + h) ^ (i + 1); o[i] = (unsigned char)(h >> (i % 24)); }
  return o; }
#endif
EOF
for h in ssl.h err.h hmac.h evp.h sha.h bio.h crypto.h; do
  printf '#include "openssl/stub_common.h"\n' > "$STUB/openssl/$h"
done
mkdir -p "$STUB/uuid"
cat > "$STUB/uuid/uuid.h" <<'EOF'
/* libuuid stub: pseudo-random (rand()-seeded) uuids, only used by kent's
   makeUuidString which no chain/net tool calls. */
#ifndef GAT_UUID_STUB_H
#define GAT_UUID_STUB_H
#include <stdlib.h>
#include <stdio.h>
typedef unsigned char uuid_t[16];
static inline void uuid_generate(uuid_t out)
{ int i; for (i = 0; i < 16; i++) out[i] = (unsigned char)(rand() & 0xff); }
static inline void uuid_unparse_lower(const uuid_t u, char *s)
{ sprintf(s,
    "%02x%02x%02x%02x-%02x%02x-%02x%02x-%02x%02x-%02x%02x%02x%02x%02x%02x",
    u[0],u[1],u[2],u[3],u[4],u[5],u[6],u[7],
    u[8],u[9],u[10],u[11],u[12],u[13],u[14],u[15]); }
#endif
EOF

# empty archives satisfy -lssl -lcrypto -lnsl -lcrypt (nothing on the
# chain/net paths calls into them once the stub headers inline everything)
for l in ssl crypto nsl crypt; do
  [ -f "$OUT/stublib/lib$l.a" ] || ar rcs "$OUT/stublib/lib$l.a"
done

# ---------------------------------------------------------------- patches
# hillerlab makefiles: no -static, -O2, stub lib dir
for mk in "$SRC"/src/chainCleaner/makefile "$SRC"/src/chainNet/makefile \
          "$SRC"/src/scoreChain/makefile; do
  [ -f "$mk" ] || continue
  sed -i -e 's/-static //' -e 's/-O4/-O2 -fcommon/' \
      -e "s|^LIBS =|LIBS = -L$OUT/stublib|" "$mk"
done

# NOTE: do NOT export make variable L here - common.mk does
# `L += $(kentSrc)/htslib/libhts.a` with a *relative* path, and an exported
# L would carry the parent directory's expansion into recursive sub-makes.
# COPT rides the link line of userApp.mk, so the stub -L goes there.
export MACHTYPE=x86_64
export COPT="-O2 -fcommon -Wno-error -L$OUT/stublib"
export CFLAGS="-I$STUB -fcommon -Wno-format-security -Wno-error"
export BINDIR=$OUT/kent/bin
mkdir -p "$BINDIR" "$OUT/bin"

# ------------------------------------------------------------ kent build
echo ">> building kent libs"
( cd "$SRC/kent/src" && make topLibs -j"$JOBS" >/dev/null )
( cd "$SRC/kent/src" && make hgLib -j"$JOBS" >/dev/null )
echo ">> building kent mouseStuff tools"
( cd "$SRC/kent/src/hg/mouseStuff" && make -j"$JOBS" >/dev/null )
# stock chainNet + chainOverlap are not in the mouseStuff UTILS_APPLIST
for extra in chainNet chainOverlap; do
  if [ -d "$SRC/kent/src/hg/mouseStuff/$extra" ]; then
    ( cd "$SRC/kent/src/hg/mouseStuff/$extra" && make -j"$JOBS" >/dev/null ) || true
  fi
done

# -------------------------------------------------------- hillerlab build
echo ">> building hillerlab tools"
export KENTSRC_DIR=$SRC/kent/src
mkdir -p "$SRC/bin"
( cd "$SRC/src" && make >/dev/null )
cp -f "$SRC"/bin/* "$OUT/bin/" 2>/dev/null || true
# the src/ makefile drops binaries in srccopy/bin (BIN=../../bin)
for t in chainCleaner chainNet scoreChain; do
  for cand in "$SRC/bin/$t" "$SRC/src/$t/$t"; do
    [ -f "$cand" ] && cp -f "$cand" "$OUT/bin/$t"
  done
done
# drivers run in place via PATH
for s in "$REF"/src/*.perl "$REF"/src/*.py; do
  ln -sf "$s" "$OUT/bin/$(basename "$s")"
done

echo ">> done"
ls "$OUT/bin" "$OUT/kent/bin" | head -50
