#!/bin/sh
# Build the reference C++ library's `runner` and `tests` binaries from the
# UNMODIFIED sources at $REF (default /root/reference), out-of-tree, using
# the POSIX-mmap shim in ./shim for the absent Boost.Iostreams dependency.
#
# Usage: build_reference.sh [out_dir]   (default /tmp/refbuild)
set -e
REF=${REF:-/root/reference}
HERE=$(cd "$(dirname "$0")" && pwd)
OUT=${1:-/tmp/refbuild}
mkdir -p "$OUT"

# -I order matters: the shim boost/ comes first; "src/..." includes in the
# harness resolve against the reference root.
CXXFLAGS="-O2 -std=c++17 -I$HERE/shim -I$REF -pthread"

g++ $CXXFLAGS -c "$REF/src/fast.cpp" -o "$OUT/fast.o"
g++ $CXXFLAGS -c "$REF/src/linear.cpp" -o "$OUT/linear.o"
g++ $CXXFLAGS -c "$REF/src/utils.cpp" -o "$OUT/utils.o"
g++ $CXXFLAGS -c "$REF/src/third_party/utf8.cpp" -o "$OUT/utf8.o"
gcc -O2 -c "$REF/src/third_party/libsais.c" -o "$OUT/libsais.o"
g++ $CXXFLAGS "$REF/tests/runner.cpp" "$OUT/fast.o" "$OUT/linear.o" \
    "$OUT/utils.o" "$OUT/utf8.o" "$OUT/libsais.o" -o "$OUT/runner"
g++ $CXXFLAGS "$REF/tests/tests.cpp" "$OUT/fast.o" "$OUT/linear.o" \
    "$OUT/utils.o" "$OUT/utf8.o" "$OUT/libsais.o" -o "$OUT/tests"
echo "built: $OUT/runner $OUT/tests"
