#!/bin/bash
# Build the stock and the sanitized reference abPOA binaries used for the
# golden outputs (see docs/REFERENCE_UB.md).
#
# Stock:     upstream source, `make` (x86, no SIMDe).
# Sanitized: + qi always included in DP arena sizing (fixes local-mode heap
#            overflow), + optional CANARY_BYTE env clearing the arena at the
#            start of every alignment call (makes outputs deterministic).
set -e
REF=${1:-/root/reference}
BUILD=${2:-/root/repo/.refbuild}

mkdir -p "$BUILD"
cp -r "$REF/src" "$REF/include" "$REF/Makefile" "$BUILD/"
cp -r "$REF/test_data" "$BUILD/" 2>/dev/null || true
cd "$BUILD"
sed -i 's/^EXTRA_FLAGS = .*/EXTRA_FLAGS = -Wno-unused-function -Wno-misleading-indentation/' Makefile

# stock build
make >/dev/null
mkdir -p bin_stock && cp bin/abpoa bin_stock/

# sanitized patches
python3 - <<'EOF'
src = open('src/simd_abpoa_align.c').read()
old = """    if (abpt->wb >= 0 || abpt->align_mode == ABPOA_EXTEND_MODE) // qi
        s_msize += sn * size;"""
new = """    // SANITIZED: qi is written/read in LOCAL mode too (heap overflow in
    // upstream abPOA when wb<0); always include it
    s_msize += sn * size;"""
if old in src:
    src = src.replace(old, new, 1)
marker = "    if (bits == 16) {"
canary = '''    { char *_cenv = getenv("CANARY_BYTE");
      if (_cenv) memset(ab->abm->s_mem, (int)strtol(_cenv, 0, 0), ab->abm->s_msize); }
'''
if canary not in src:
    src = src.replace(marker, canary + marker, 1)
if '#include <string.h>' not in src:
    src = src.replace('#include <stdlib.h>', '#include <stdlib.h>\n#include <string.h>', 1)
open('src/simd_abpoa_align.c','w').write(src)
EOF
make >/dev/null
echo "stock:     $BUILD/bin_stock/abpoa"
echo "sanitized: $BUILD/bin/abpoa   (set CANARY_BYTE=0x00 for per-call-cleared arena)"

# malloc fill interposer for the UB repro
cat > fillmalloc.c <<'EOF'
#define _GNU_SOURCE
#include <dlfcn.h>
#include <string.h>
#include <stdlib.h>
static unsigned char FILL = 0xcc;
static void *(*real_malloc)(size_t) = 0;
static int init_done = 0;
static void init(void) {
    real_malloc = dlsym(RTLD_NEXT, "malloc");
    char *e = getenv("FILL_BYTE");
    if (e) FILL = (unsigned char)strtol(e, 0, 0);
    init_done = 1;
}
void *malloc(size_t n) {
    if (!init_done) init();
    void *p = real_malloc(n);
    if (p) memset(p, FILL, n);
    return p;
}
void *aligned_alloc(size_t a, size_t n) {
    if (!init_done) init();
    void *p; if (posix_memalign(&p, a, n)) return 0;
    memset(p, FILL, n);
    return p;
}
EOF
gcc -O2 -shared -fPIC fillmalloc.c -o fillmalloc.so -ldl
