#!/bin/bash
# Build the reference bs_call C binary against the htslib shim, for
# benchmarking (the BASELINE.md denominator). The reference tree is
# copied to a scratch dir first ($BUILD_DIR, default /tmp/bsref) so the
# read-only original is never touched.
#
# Usage: tools/htslib_shim/build_ref.sh [ref_tree] [build_dir]
# Produces: $BUILD_DIR/bin/bs_call (and bin/dbSNP_idx)
set -euo pipefail

REF=${1:-/root/reference}
BUILD=${2:-/tmp/bsref}
SHIM=$(cd "$(dirname "$0")" && pwd)

rm -rf "$BUILD"
mkdir -p "$BUILD"
cp -r "$REF"/. "$BUILD"/
chmod -R u+w "$BUILD"

# gt (gemtools) — self-contained, needs only zlib
sed -e 's/@CC@/gcc/' -e 's/@HAVE_ZLIB@/1/' -e 's/@HAVE_BZLIB@/0/' \
    "$BUILD/gt/Makefile.mk.in" > "$BUILD/gt/Makefile.mk"
make -C "$BUILD/gt" -j"$(nproc)" >/dev/null

# shim objects
mkdir -p "$BUILD/shim"
for f in bgzf sam faidx vcf; do
    gcc -O3 -fPIC -Wall -I"$SHIM" -c "$SHIM/$f.c" -o "$BUILD/shim/$f.o"
done

# bs_call + dbSNP_idx
sed -e 's/@CC@/gcc/' -e 's/@HAVE_ZLIB@/1/' -e 's/@HAVE_BZLIB@/0/' \
    -e "s|@HTSINC@|-I$SHIM|" \
    -e "s|@HTSLIBS@|$BUILD/shim/bgzf.o $BUILD/shim/sam.o $BUILD/shim/faidx.o $BUILD/shim/vcf.o -lz|" \
    "$BUILD/src/Makefile.mk.in" > "$BUILD/src/Makefile.mk"
make -C "$BUILD/src" -j"$(nproc)"

echo "built: $BUILD/bin/bs_call"
