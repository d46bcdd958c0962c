#!/bin/bash
# Build the reference Canu v1.6 binaries out-of-tree for the differential
# harness (tests/test_reference_diff.py).
#
# Two trivial fixes for modern glibc/gcc are applied to the COPY (the
# reference tree itself is read-only and never modified):
#   1. AS_UTL/AS_UTL_alloc.C includes <sys/sysctl.h>, removed from glibc
#      2.32+; dropping the include falls back to the sysconf() path.
#   2. AS_UTL/stddev.H returns &vector from a vector& function (rejected
#      by modern g++); drop the '&'.
#
# Usage: scripts/build_reference.sh [dest=/tmp/refbuild]
# Result: $dest/Linux-amd64/bin/{gatekeeperCreate,meryl,overlapInCore,...}
set -euo pipefail
DEST="${1:-/tmp/refbuild}"
SRC="${CANU_REFERENCE:-/root/reference}/src"
mkdir -p "$DEST"
if [ ! -d "$DEST/src" ]; then
  cp -r "$SRC" "$DEST/src"
  sed -i 's|#include <sys/sysctl.h>|// removed: glibc 2.32+ (sysconf path used)|' \
      "$DEST/src/AS_UTL/AS_UTL_alloc.C"
  sed -i 's|return(&_histogram);|return(_histogram);|; s|return(&_Nstatistics);|return(_Nstatistics);|' \
      "$DEST/src/AS_UTL/stddev.H"
fi
make -C "$DEST/src" -j"$(nproc)"
echo "reference binaries: $DEST/Linux-amd64/bin"
